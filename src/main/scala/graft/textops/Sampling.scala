package graft.textops

import graft.Tables
import graft.textops.TextHash._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus splitting + stratified quota sampling — the
  * data-mixing stage of a training pipeline (no analog in the
  * reference; part of the LLM-pipeline surface the build brief adds).
  *
  * Split assignment is the industry-standard content-hash bucket:
  * `poly_hash(doc_id) % 100` → train/val/test at 90/5/5. Hash-based
  * (not random) so the split is reproducible across runs, engines and
  * cluster sizes, and stable under corpus growth — a new document
  * never moves an old one between splits. The same portable hash the
  * dedup tiers use makes it replayable in the DuckDB oracle.
  *
  * The per-(lang, split) quota keeps the `quota` docs with the
  * smallest hash — deterministic uniform-without-replacement
  * subsampling (the hash is uniform over documents, so "smallest h"
  * is a random-but-reproducible choice).
  *
  * Scale note: the quota is a rank over (lang, split) partitions —
  * bounded key cardinality, so at 100 TB the few-languages case makes
  * single partitions big. The upgrade path (same results) is
  * threshold sampling: take the quota-th smallest h per group via the
  * two-level top-K used by uv_approx_kmv, then keep h below it —
  * every stage partial-aggregatable, no single-task window.
  */
object Sampling {

  def corpusSample(spark: SparkSession, sfDir: String, quota: Int = 50): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "lang",
        "poly_hash(cast(doc_id as string)) as h")
      .withColumn("split",
        expr("case when h % 100 < 90 then 'train' " +
          "when h % 100 < 95 then 'val' else 'test' end"))
      .withColumn("smp_rank", row_number().over(
        Window.partitionBy($"lang", $"split").orderBy($"h".asc, $"doc_id".asc)))
      .where($"smp_rank" <= quota)
      .select($"doc_id", $"lang", $"split", $"smp_rank".cast("int").as("smp_rank"))
      .orderBy($"doc_id")
  }

  /** End-to-end training-corpus preparation — the pipeline the other
    * textops are stages of, composed in one query:
    *   keep a document iff it is (a) its near-dup cluster's canonical
    *   keeper ([[Dedup.dedupClusters]]), (b) above the quality floor
    *   ([[TextStats.textStats]]'s score), and (c) hash-bucketed into
    *   the train split ([[corpusSample]]'s split rule).
    * Output is the training corpus with its per-doc token counts —
    * what a tokenizer run would consume next.
    *
    * Every stage is the already-verified operator; the oracle composes
    * the same three CTE chains, so the composite is hash-gated
    * end-to-end, not just per-stage.
    */
  def corpusPrep(spark: SparkSession, sfDir: String,
                 minQuality: Double = 0.5): DataFrame = {
    import spark.implicits._
    val stats = TextStats.textStats(spark, sfDir)
      .select($"doc_id", $"lang", $"n_tokens", $"quality")
    val keepers = Dedup.dedupClusters(spark, sfDir)
      .where($"is_keeper").select($"doc_id")
    stats.join(keepers, "doc_id")
      .withColumn("h", expr("poly_hash(cast(doc_id as string))"))
      .where($"quality" >= minQuality && expr("h % 100 < 90"))
      .select($"doc_id", $"lang", $"n_tokens", $"quality")
      .orderBy($"doc_id")
  }

  val corpusPrepOracle: String =
    s"""WITH RECURSIVE ${Dedup.clusterCtes}, ${TextStats.textStatsCtes}
       |SELECT q.doc_id, q.lang, q.n_tokens, q.quality
       |FROM qual q JOIN cc ON q.doc_id = cc.doc AND cc.doc = cc.cluster_id
       |WHERE q.quality >= 0.5
       |  AND ${phDuck("CAST(q.doc_id AS VARCHAR)", "hh")} % 100 < 90
       |ORDER BY q.doc_id""".stripMargin

  val corpusSampleOracle: String =
    s"""WITH hashed AS (
       |  SELECT doc_id, lang,
       |         ${phDuck("CAST(doc_id AS VARCHAR)", "hh")} AS h
       |  FROM documents
       |), tagged AS (
       |  SELECT doc_id, lang, h,
       |         CASE WHEN h % 100 < 90 THEN 'train'
       |              WHEN h % 100 < 95 THEN 'val' ELSE 'test' END AS split
       |  FROM hashed
       |), ranked AS (
       |  SELECT doc_id, lang, split,
       |         row_number() OVER (PARTITION BY lang, split
       |                            ORDER BY h ASC, doc_id ASC) AS smp_rank
       |  FROM tagged
       |)
       |SELECT doc_id, lang, split, CAST(smp_rank AS INT) AS smp_rank
       |FROM ranked WHERE smp_rank <= 50 ORDER BY doc_id""".stripMargin
}
