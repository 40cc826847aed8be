package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact integer covariance-moment state as a typed [[Aggregator]] —
  * the bounded-state form of the spectrum queries' pair-moment
  * aggregate ([[graft.textops.Similarity]] `momentAgg`).
  *
  * The explode formulation materializes d(d+1)/2 struct rows PER
  * VECTOR through nested CodegenFallback lambdas (2 080 rows/vector at
  * d = 64 — 416 M operator rows at the 200 k tier) before a hash agg
  * collapses them to 2 080 groups. But the groups' statistics are all
  * derivable from one mergeable state: the vector count n, the per-dim
  * sums S[d], and the upper-triangle pair-product sums P[d(d+1)/2] —
  * for group (i, j): sxy = P[i,j], sxi = n-weighted S[i] is just S[i],
  * sxj = S[j]. This Aggregator carries exactly that state as one flat
  * long array `[n, d, S..., P...]`: `reduce` is one d²/2 multiply-add
  * loop per vector (no row materialization), `merge` element-wise
  * addition — both order-independent integer math, so the finished
  * table is bit-identical to the explode form and to the DuckDB oracle
  * replay (pinned by AnalyticsSpec's spectrum tests staying hash-green
  * and a PropertySpec equivalence).
  *
  * State is O(d²) longs (2 082 at d = 64 — ~16 KB), map-side partial,
  * one state per partition reaches the driver-side finish: the 100 TB
  * shape is a single narrow scan with a 16 KB reduce tree, versus
  * pushing ~2 000× the corpus row count through explode.
  */
class MomentAgg extends Aggregator[Seq[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf0: Array[Long], m: Seq[Long]): Array[Long] = {
    require(m != null, "moment vector must not be null")
    val d = m.size
    val buf =
      if (buf0.nonEmpty) buf0
      else new Array[Long](2 + d + d * (d + 1) / 2)
    // length check, not just the d marker: a first EMPTY vector (d=0)
    // allocates a 2-slot buffer with marker 0, which a bare
    // `buf(1) == 0L` guard would let a later d>0 vector write past
    require((buf(1) == 0L || buf(1) == d.toLong) &&
        buf.length == 2 + d + d * (d + 1) / 2,
      s"moment state dim ${buf(1)}/len ${buf.length} incompatible with vector dimension $d")
    // IndexedSeq access: the encoder materializes ArraySeq (O(1) apply)
    val v = m.toIndexedSeq
    buf(0) += 1L
    buf(1) = d.toLong
    var i = 0
    while (i < d) { buf(2 + i) += v(i); i += 1 }
    var idx = 2 + d
    i = 0
    while (i < d) {
      val xi = v(i)
      var j = i
      while (j < d) { buf(idx) += xi * v(j); idx += 1; j += 1 }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    require(a.length == b.length && a(1) == b(1),
      s"moment state shape mismatch: ${a.length}/${a(1)} vs ${b.length}/${b(1)}")
    val d = a(1)
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a(1) = d // the dimension marker is a constant, not a sum
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object MomentAggregator {
  /** `moments(m)` → flat `[n, d, S[d], P[d(d+1)/2]]` integer moment
    * state for an `array<bigint>` vector column (upper triangle,
    * row-major). */
  def moments(m: Column): Column =
    udaf(new MomentAgg, ExpressionEncoder[Seq[Long]]()).apply(m)
}
