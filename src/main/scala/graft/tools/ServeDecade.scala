package graft.tools

import graft.{Session, Tables}
import graft.analytics.TimeSeriesAnalytics
import graft.textops.Pipelines
import org.apache.spark.sql.functions._

/** Decade law of the STORED-SERVING paths — the production shape of
  * the self-similarity tiers the sf10 full-surface sweep excluded
  * (their corpus-as-queries form is quadratic BY WORKLOAD; a real
  * deployment serves per-batch queries against a materialized
  * snapshot). For each tier dir: build the ANN (full-vector IVF), PQ
  * (codes) and TS (series) snapshots, then time a FIXED query panel
  * (default 256 queries — constant across tiers, so row-to-row growth
  * isolates the per-query corpus law) against each snapshot, median of
  * `reps` with the untimed warm pass and inter-rep scrub of the Bench
  * convention. Prints one SERVEDEC row per (tier, path) plus the
  * snapshot build seconds — the numbers BASELINE's decade table cites
  * instead of excluding the tiers.
  *
  * Usage: `tools/run.sh graft.tools.ServeDecade <sfDir> [<sfDir>...]
  * [panel=256] [reps=3]` — snapshots land under
  * `target/servedec-<basename(tier)>` and are rebuilt each run (build
  * time is part of the story: it is the one-time cost the serving
  * path amortizes).
  */
object ServeDecade {
  def main(args: Array[String]): Unit = {
    val (opts, dirs) = args.partition(a => a.contains("="))
    require(dirs.nonEmpty, "usage: ServeDecade <sfDir> [...] [panel=N] [reps=N]")
    def opt(k: String, d: Int) = opts.find(_.startsWith(k + "="))
      .map(_.stripPrefix(k + "=").toInt).getOrElse(d)
    val panel = opt("panel", 256)
    val reps = opt("reps", 3)
    val spark = Session.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def scrub(): Unit = Session.scrubBlocks(spark)

    def med(f: => Long): Double = {
      f; scrub() // untimed warm pass
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f
        val dt = (System.nanoTime() - t0) / 1e9
        scrub(); dt
      }.sorted.apply(reps / 2)
    }

    for (dir <- dirs) {
      val snap = s"target/servedec-${new java.io.File(dir).getName}"
      val n = Tables.embeddings(spark, dir).count()
      val t0 = System.nanoTime()
      Pipelines.materializeAnn(spark, dir, snap)
      Pipelines.materializePq(spark, dir, snap)
      TimeSeriesAnalytics.materializeSeries(spark, dir, snap)
      val buildS = (System.nanoTime() - t0) / 1e9
      scrub()
      // fixed panel: every 97th vector id, capped at `panel` — spread,
      // deterministic, and constant-size across tiers by construction.
      // Collected to the driver and re-created as local frames, NOT
      // localCheckpoint'd: the inter-rep scrub releases checkpoint
      // blocks (the AnnServeProbe defs-not-vals pitfall)
      val qVec = Tables.embeddings(spark, dir)
        .selectExpr("vec_id", "cast(embedding as array<double>) as v")
        .where($"vec_id" % 97 === 0).orderBy($"vec_id").limit(panel)
        .as[(Long, Seq[Double])].collect().toSeq
        .toDF("vec_id", "v")
      val qTs = spark.read.parquet(s"$snap/ts_series")
        .selectExpr("user_id as query_id", "arr")
        .where($"query_id" % 97 === 0).orderBy($"query_id").limit(panel)
        .as[(Long, Seq[Long])].collect().toSeq
        .toDF("query_id", "arr")
      val annS = med(Pipelines.annSearchFrom(spark, snap, qVec,
        excludeSelfId = true).count())
      val pqS = med(Pipelines.annSearchPqFrom(spark, snap, qVec,
        excludeSelfId = true).count())
      val tsS = med(TimeSeriesAnalytics.tsSearchFrom(spark, snap, qTs,
        excludeSelfId = true).count())
      println(f"SERVEDEC $dir%-22s n=$n%-8d build_s=$buildS%.1f " +
        f"ann_s=$annS%.2f pq_s=$pqS%.2f ts_s=$tsS%.2f (panel=$panel)")
      scrub()
    }
    spark.stop()
  }
}
