package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** K-minimum-values distinct sketch as a typed [[Aggregator]] — the
  * BOUNDED-STATE form of `UserBehaviorAnalytics.kmvFrom`'s relational
  * two-level rank, and the piece that makes the sketch usable as
  * STREAMING aggregation state: a streaming `groupBy(window).agg(...)`
  * carries exactly this buffer per window (≤ K longs), where an exact
  * `countDistinct` would carry the whole distinct set and the
  * relational rank form isn't incrementalizable at all.
  *
  * The buffer is the sorted array of the K smallest DISTINCT hashes
  * seen so far; `reduce` is an insert-if-absent bounded by K, `merge`
  * a deduplicating sorted merge cut to K. Both are order-independent
  * (the K-min distinct set of a multiset doesn't depend on arrival or
  * partition order), so the finished (cnt, kth) pair — and therefore
  * the (K−1)·P/h_(K) estimate — is bit-identical to the relational
  * query and to the DuckDB oracle replay, batch or streaming.
  *
  * Input hashes must be the P-ranged salted poly_hash the batch query
  * uses (see the salting note on `uvApproxKmv`).
  */
class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (ins >= k) buf // larger than the current k-th smallest
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  // the finished sketch IS the buffer — callers derive (cnt, kth, est)
  // relationally so the estimate expression stays shared with the
  // batch query and its oracle
  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object KmvAggregator {
  /** `kmv_sketch(hashCol)` → sorted array of the K smallest distinct
    * hash values — apply `UserBehaviorAnalytics.kmvEstimate` columns
    * (cnt = size, kth = last element) on top.
    */
  def kmvSketch(h: Column, k: Int = 256): Column =
    udaf(new KmvAgg(k), Encoders.scalaLong).apply(h)
}
