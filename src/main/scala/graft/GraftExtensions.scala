package graft

import graft.functions.GraftExpressions
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

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
  *
  * The function list is NOT duplicated here: both this injection and
  * the temp registry iterate `GraftExpressions.registrations`, so the
  * two surfaces cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private val usage = Map(
    "vec_dot" -> "vec_dot(a, b) - dot product of two double arrays (left fold)",
    "poly_hash" -> "poly_hash(s) - polynomial char-fold hash mod 1e9+7",
    "poly_hash37" -> "poly_hash37(s) - independent char-fold hash (mult 37)",
    "rolling_min_hash" -> "rolling_min_hash(s, w) - min over all w-char window hashes",
    "simhash60" -> "simhash60(arr) - 60-bit SimHash of a token-hash array",
    "minhash_sig" -> "minhash_sig(arr) - K-minima MinHash signature array",
    "sorted_intersect_count" -> "sorted_intersect_count(a, b) - |A n B| of sorted int arrays",
    "word_shingles" -> "word_shingles(text, n) - distinct whitespace n-gram shingles",
    "token_hashes60" -> "token_hashes60(text) - packed 60-bit hash per whitespace token",
    "shingle_hashes" -> "shingle_hashes(text) - 3-gram shingle hashes over token poly hashes")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoin.AsOfJoinStrategy)
    GraftExpressions.registrations.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftExpressions", null, name,
          usage.getOrElse(name, name), ""),
        builder))
    }
  }
}
