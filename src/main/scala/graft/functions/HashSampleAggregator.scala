package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-state uniform value sample as a typed [[Aggregator]] — the
  * quantile member of the sketch family (KMV = distinct, Count-Min =
  * frequency, this = order statistics): keep the (hash, value) pairs
  * with the K smallest hashes. Because the hash (a salted P-ranged
  * poly_hash of the row id) is uniform and independent of the value,
  * the kept values are a uniform-without-replacement sample of the
  * group, and empirical type-7 quantiles over them estimate the true
  * quantiles — with ≤ K·16 bytes of aggregation state per group, vs
  * an exact percentile's whole-group sort. That bounded buffer is
  * what makes group quantiles maintainable as STREAMING aggregation
  * state.
  *
  * Determinism: the K-min set of a multiset doesn't depend on arrival
  * or partition order; equal hashes (rare cross-row collisions) keep
  * the MINIMUM value, which is also order-independent — so the sample,
  * and therefore every quantile derived from it, is bit-identical to
  * the relational rank formulation and its DuckDB replay, batch or
  * streaming.
  */
class HashSampleAgg(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  override def zero: Seq[(Long, Double)] = Vector.empty

  override def reduce(buf: Seq[(Long, Double)],
                      in: (Long, Double)): Seq[(Long, Double)] = {
    val (h, v) = in
    val ins = buf.indexWhere(_._1 >= h)
    if (ins < 0) { // larger than everything present
      if (buf.length >= k) buf else buf :+ ((h, v))
    } else if (buf(ins)._1 == h) {
      if (v < buf(ins)._2) buf.updated(ins, (h, v)) else buf
    } else {
      val grown = (buf.take(ins) :+ ((h, v))) ++ buf.drop(ins)
      if (grown.length > k) grown.take(k) else grown
    }
  }

  override def merge(a: Seq[(Long, Double)],
                     b: Seq[(Long, Double)]): Seq[(Long, Double)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = Vector.newBuilder[(Long, Double)]
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && a(i)._1 < b(j)._1)) {
        out += a(i); i += 1; n += 1
      } else if (i >= a.length || b(j)._1 < a(i)._1) {
        out += b(j); j += 1; n += 1
      } else { // equal hash: keep the minimum value, consume both
        out += ((a(i)._1, math.min(a(i)._2, b(j)._2))); i += 1; j += 1; n += 1
      }
    }
    out.result()
  }

  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}

object HashSampleAggregator {
  /** `hash_sample(h, v)` → the ≤ K (hash, value) pairs with the
    * smallest hashes, sorted by hash. Derive quantiles by exploding
    * the values and applying `percentile` — shared with the oracle's
    * rank replay. */
  def hashSample(h: Column, v: Column, k: Int = 256): Column =
    udaf(new HashSampleAgg(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)).apply(h, v)
}
