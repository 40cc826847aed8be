package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact per-dimension micro-unit vector sum as a typed [[Aggregator]]
  * — the bounded-state form of the Lloyd re-center aggregation
  * ([[graft.textops.Similarity]] `trainedCentroids`).
  *
  * The explode formulation shuffles n·d `(cell, dim, micro)` rows per
  * training round into a (cell, dim) hash aggregate (12.8 M rows per
  * round at the 200 k-vector tier) and then re-assembles each cell's
  * mean vector through a collect_list + array_sort. But the per-cell
  * statistic is one mergeable state: the member count n and the
  * per-dim sums of `floor(x·10⁶)` BIGINT micro-units — the same
  * integer quantization the engine-exact training contract already
  * uses (order-independent integer addition, so DuckDB's Lloyd replay
  * stays bit-for-bit). This Aggregator carries exactly that as one
  * flat long array `[n, S₀…S_{d−1}]`: `reduce` is one d-wide
  * floor-multiply-add per vector, `merge` element-wise addition. The
  * per-cell mean divides in the one fixed order
  * `cast(S as double) / n / 10⁶` — the identical arithmetic the
  * exploded form applied per (cell, dim) row, so trained centroids
  * are bit-identical (PropertySpec pins the equivalence; every
  * trained-index DuckDB oracle replays unchanged).
  *
  * State is O(d) longs (65 at d = 64 — ~520 B), map-side partial:
  * the 100 TB shape is C·partitions tiny states through the exchange
  * instead of n·d rows.
  */
class VecMicroSumAgg extends Aggregator[Seq[Double], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf0: Array[Long], v: Seq[Double]): Array[Long] = {
    require(v != null, "micro-sum vector must not be null")
    val d = v.size
    val buf =
      if (buf0.nonEmpty) buf0
      else new Array[Long](1 + d)
    // length check, not a marker: a first EMPTY vector allocates a
    // 1-slot buffer a later d>0 vector must not write past (the
    // MomentAgg guard)
    require(buf.length == 1 + d,
      s"micro-sum state len ${buf.length} incompatible with vector dimension $d")
    // IndexedSeq access: the encoder materializes ArraySeq (O(1) apply)
    val x = v.toIndexedSeq
    buf(0) += 1L
    var i = 0
    while (i < d) {
      // identical to SQL floor(x * 1000000) cast to BIGINT
      buf(1 + i) += math.floor(x(i) * 1000000.0).toLong
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    require(a.length == b.length,
      s"micro-sum state shape mismatch: ${a.length} vs ${b.length}")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object VecMicroSumAggregator {
  /** `vecMicroSum(v)` → flat `[n, S₀…S_{d−1}]` micro-unit sum state
    * for an `array<double>` vector column. */
  def vecMicroSum(v: Column): Column =
    udaf(new VecMicroSumAgg, ExpressionEncoder[Seq[Double]]()).apply(v)
}
