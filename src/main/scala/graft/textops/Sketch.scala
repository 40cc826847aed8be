package graft.textops

import graft.Tables
import graft.textops.TextHash._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches over the token stream.
  *
  * Count-Min (Cormode & Muthukrishnan, J. Algorithms '05) is the
  * canonical bounded-memory frequency estimator a 100 TB corpus scan
  * carries: K×B counters, update = +1 at one bucket per row per
  * row-hash, point estimate = min over the K rows — never an
  * undercount, overcount ≤ εN with ε = e/B. The sketch is a SUM by
  * (row, bucket), i.e. partial-aggregatable map-side and mergeable
  * across partitions/days by elementwise addition — the property that
  * makes it work as a distributed accumulator where an exact
  * vocabulary count would shuffle the full token stream.
  *
  * Determinism: the K row-hashes are affine rehashes of the portable
  * poly_hash ((a_k·h + b_k) mod P mod B, the MinHash family's own a/b
  * constants), so the ENTIRE sketch — not just the query results —
  * replays bit-for-bit in the DuckDB oracle, and the estimate≥exact /
  * overcount-bound invariants are asserted on real collisions
  * (B = 64 against this corpus's vocabulary forces them) rather than
  * on a collision-free toy.
  */
object Sketch {

  private def k: Int = MinhashA.length min 4

  private def rowBucket(b: Int)(i: Int): String =
    s"(${MinhashA(i)} * h + ${MinhashB(i)}) % $P % $b"

  /** The K×B sketch itself, buildable on any frame with a `text`
    * column — BATCH OR STREAMING: the update is a narrow explode +
    * hash map followed by one bounded groupBy-count, which is exactly
    * the aggregation shape Structured Streaming maintains natively
    * (state = K·B counters, update-mode increments — the sketch IS its
    * own streaming state, no custom processor needed). Merging two
    * sketches (days, partitions, streams) is elementwise addition of
    * the `c` column; the parity test pins stream == batch.
    */
  def cmsSketchFrom(texts: DataFrame, b: Int = 64): DataFrame =
    texts.selectExpr(s"explode($tokensSpark) as token")
      .selectExpr("poly_hash(token) as h")
      .selectExpr(s"posexplode(array(${(0 until k).map(rowBucket(b)).mkString(", ")})) as (r, bkt)")
      .groupBy(col("r"), col("bkt")).agg(count(lit(1)).as("c"))

  /** Count-Min sketch accuracy check on the corpus's own heavy
    * hitters: build the K×B sketch over all tokens, take the true
    * top-`hh` tokens (exact counts — the vocab_topv cut), and report
    * the sketch estimate next to the truth.
    *
    * Output: rank, token, exact_cnt, est_cnt, overcount (= est − exact ≥ 0).
    *
    * Scale shape: the sketch is one groupBy over K·B bounded keys
    * (map-side partials carry ≤ K·B rows per task); the exact side is
    * the vocab_topv TakeOrderedAndProject cut — present here as the QA
    * yardstick, at 100 TB the sketch REPLACES it. Probing joins the
    * hh-row panel against the K·B-row sketch — both broadcastable.
    */
  def tokenCms(spark: SparkSession, sfDir: String,
               b: Int = 64, hh: Int = 20): DataFrame = {
    import spark.implicits._
    val cms = cmsSketchFrom(
      Tables.documents(spark, sfDir).select($"text"), b)
    val top = Tables.documents(spark, sfDir)
      .selectExpr(s"explode($tokensSpark) as token")
      .selectExpr("token", "poly_hash(token) as h")
      .groupBy($"token", $"h").agg(count(lit(1)).as("exact_cnt"))
      .orderBy($"exact_cnt".desc, $"token".asc).limit(hh)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"exact_cnt".desc, $"token".asc)).cast("int"))
    top
      .selectExpr("rank", "token", "exact_cnt",
        s"posexplode(array(${(0 until k).map(rowBucket(b)).mkString(", ")})) as (r, bkt)")
      .join(broadcast(cms), Seq("r", "bkt"))
      .groupBy($"rank", $"token", $"exact_cnt")
      .agg(min($"c").as("est_cnt"))
      .selectExpr("rank", "token", "exact_cnt", "est_cnt",
        "est_cnt - exact_cnt as overcount")
      .orderBy($"rank")
  }

  def tokenCmsOracle(b: Int = 64, hh: Int = 20): String = {
    val k = MinhashA.length min 4
    val rowBucket = (i: Int) =>
      s"(${MinhashA(i)} * h + ${MinhashB(i)}) % $P % $b"
    val rows = (0 until k)
      .map(i => s"SELECT token, h, $i AS r, ${rowBucket(i)} AS bkt FROM toks")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH toks AS (
       |  SELECT token, ${phDuck("token", "cm")} AS h FROM (
       |    SELECT unnest($tokensDuck) AS token FROM documents
       |  )
       |), cells AS (
       |  $rows
       |), cms AS (
       |  SELECT r, bkt, CAST(count(*) AS BIGINT) AS c
       |  FROM cells GROUP BY 1, 2
       |), top AS (
       |  SELECT token, h, CAST(count(*) AS BIGINT) AS exact_cnt
       |  FROM toks GROUP BY 1, 2
       |  ORDER BY exact_cnt DESC, token LIMIT $hh
       |), ranked AS (
       |  SELECT CAST(row_number() OVER (ORDER BY exact_cnt DESC, token) AS INT)
       |           AS rank,
       |         token, h, exact_cnt
       |  FROM top
       |), probes AS (
       |  ${(0 until k).map(i =>
            s"SELECT rank, token, exact_cnt, $i AS r, ${rowBucket(i)} AS bkt FROM ranked")
           .mkString("\n  UNION ALL\n  ")}
       |)
       |SELECT p.rank, p.token, p.exact_cnt,
       |       CAST(min(c.c) AS BIGINT) AS est_cnt,
       |       CAST(min(c.c) - p.exact_cnt AS BIGINT) AS overcount
       |FROM probes p JOIN cms c ON p.r = c.r AND p.bkt = c.bkt
       |GROUP BY 1, 2, 3 ORDER BY p.rank""".stripMargin
  }
}
