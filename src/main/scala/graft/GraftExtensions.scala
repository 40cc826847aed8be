package graft

import graft.functions.GraftExpressions
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Library packaging for the engine's native functions: injecting via
  * `SparkSessionExtensions` makes them first-class session functions —
  * present in every session derived from the builder (clones, Connect
  * planning, `spark.sql(...)` text) without the per-session
  * temp-registry call:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)           // programmatic
  * // or spark.sql.extensions=graft.GraftExtensions  (config-driven)
  * }}}
  *
  * `Tables.load` still performs the temp-function registration as a
  * fallback so query builders work on sessions created without the
  * extension (e.g. the driver's own Verify/Bench sessions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExpressions._

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions.GraftExpressions", null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoin.AsOfJoinStrategy)
    e.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two double arrays (left fold)"),
      (es: Seq[Expression]) => VecDot(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("poly_hash"),
      info("poly_hash", "poly_hash(s) - polynomial char-fold hash mod 1e9+7"),
      (es: Seq[Expression]) => PolyHash(es.head)))
    e.injectFunction((FunctionIdentifier("poly_hash37"),
      info("poly_hash37", "poly_hash37(s) - independent char-fold hash (mult 37)"),
      (es: Seq[Expression]) => PolyHash(es.head, 37)))
    e.injectFunction((FunctionIdentifier("rolling_min_hash"),
      info("rolling_min_hash", "rolling_min_hash(s, w) - min over all w-char window hashes"),
      (es: Seq[Expression]) => RollingMinHash(es(0), es(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => other.eval().asInstanceOf[Int]
      })))
    e.injectFunction((FunctionIdentifier("simhash60"),
      info("simhash60", "simhash60(arr) - 60-bit SimHash of a token-hash array"),
      (es: Seq[Expression]) => SimHash60(es.head)))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(arr) - K-minima MinHash signature array"),
      (es: Seq[Expression]) => MinHashSig(es.head)))
    e.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count", "sorted_intersect_count(a, b) - |A n B| of sorted int arrays"),
      (es: Seq[Expression]) => SortedIntersectCount(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, n) - distinct whitespace n-gram shingles"),
      (es: Seq[Expression]) => WordShingles(es(0), es(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => other.eval().asInstanceOf[Int]
      })))
    e.injectFunction((FunctionIdentifier("token_hashes60"),
      info("token_hashes60", "token_hashes60(text) - packed 60-bit hash per whitespace token"),
      (es: Seq[Expression]) => TokenHashes60(es.head)))
    e.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(text) - 3-gram shingle hashes over token poly hashes"),
      (es: Seq[Expression]) => ShingleHashes(es.head)))
  }
}
