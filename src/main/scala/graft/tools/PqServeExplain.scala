package graft.tools

import graft.{Session, Tables}
import graft.textops.Pipelines

/** Executed-plan reader for the stored-PQ serve: runs
  * [[Pipelines.annSearchPqFrom]] against an EXISTING snapshot and
  * reports the post-AQE shuffle/join composition (skew-split and
  * coalesce markers, join strategies) next to the wall time — the
  * check behind BASELINE's "K=64 reproducibly faster at the clustered
  * decade" note (hypothesis: the 4× wider probe rows push the skewed
  * cell-join partitions over AQE's skew-split threshold).
  * Usage: `runMain graft.tools.PqServeExplain <snapshotDir> <sfDir>`
  */
object PqServeExplain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val sfDir = args(1)
    val spark = Session.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
    val df = Pipelines.annSearchPqFrom(spark, dir, queries,
      excludeSelfId = true)
    val t0 = System.nanoTime()
    df.collect()
    val dt = (System.nanoTime() - t0) / 1e9
    val p = df.queryExecution.executedPlan.toString
    def n(re: String): Int = re.r.findAllIn(p).size
    println(f"pq_serve_explain dir=$dir serve_s=$dt%.2f " +
      s"aqeReads=${n("AQEShuffleRead")} skewed=${n("(?i)skew")} " +
      s"coalesced=${n("coalesced")} smj=${n("SortMergeJoin")} " +
      s"bhj=${n("BroadcastHashJoin")} shj=${n("ShuffledHashJoin")}")
    // tie-density diagnostic on a 1% query panel: the fraction of
    // DISTINCT ADC scores among a query's candidates — the
    // comparator-fall-through suspect for why heavily tied codebooks
    // serve slower (every sort compare on equal doubles falls through
    // to the tiebreaker column)
    import org.apache.spark.sql.functions.{avg, count, countDistinct, expr, lit}
    val panel = queries.where(expr("vec_id % 100 = 0"))
    val ties = Pipelines.annSearchPqFrom(spark, dir, panel,
        k = Int.MaxValue, excludeSelfId = true)
      .groupBy("query_id")
      .agg(countDistinct("approx_cosine").as("d"), count(lit(1)).as("n"))
      .agg(avg(expr("d / n")).as("df"), avg("n").as("an")).head()
    println(f"pq_serve_explain ties dir=$dir " +
      f"distinct_frac=${ties.getDouble(0)}%.4f avg_cand=${ties.getDouble(1)}%.1f")
    // the decisive tie-comparator experiment (round 12): identical
    // serve, but the rank sort's first key is made (near-)unique by a
    // deterministic jitter so comparisons resolve at the first key.
    // If the slow K=16 serve is comparator fall-through on tied ADC
    // scores, the jittered serve should close the K=16/K=64 gap; if
    // the gap persists, the hypothesis is refuted and the cause is
    // elsewhere in execution.
    val reps = if (args.length > 2) args(2).toInt else 3
    def scrub(): Unit = Session.scrubBlocks(spark)
    def timeServe(jit: Boolean): Double = {
      Pipelines.annSearchPqFrom(spark, dir, queries,
        excludeSelfId = true, jitterRankKey = jit).count()
      scrub() // untimed warm pass
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        Pipelines.annSearchPqFrom(spark, dir, queries,
          excludeSelfId = true, jitterRankKey = jit).count()
        val t = (System.nanoTime() - t0) / 1e9
        scrub(); t
      }.sorted.apply(reps / 2)
    }
    val plainS = timeServe(jit = false)
    val jitS = timeServe(jit = true)
    println(f"pq_serve_explain tiebreak dir=$dir plain_s=$plainS%.2f " +
      f"jittered_s=$jitS%.2f")
    // stage decomposition (round 13, after the tiebreak A/B refuted
    // the comparator hypothesis): column pruning makes each timing
    // exact — `count()` on the scored frame prunes the unused
    // approx_cosine column (pure probe+candidate join), the max-agg
    // adds the ADC scan, the full serve adds the rank window. The
    // inter-stage deltas locate the K=16/K=64 inversion.
    def timeStage(label: String)(f: => Unit): Unit = {
      f; scrub()
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f
        val dt = (System.nanoTime() - t0) / 1e9
        scrub(); dt
      }.sorted.apply(reps / 2)
      println(f"pq_serve_explain stage dir=$dir $label%-6s s=$t%.2f")
    }
    timeStage("cand") {
      Pipelines.pqScoredCandidates(spark, dir, queries,
        excludeSelfId = true).count(); ()
    }
    timeStage("scored") {
      Pipelines.pqScoredCandidates(spark, dir, queries,
          excludeSelfId = true)
        .agg(org.apache.spark.sql.functions.max("approx_cosine"))
        .collect(); ()
    }
    timeStage("full") {
      Pipelines.annSearchPqFrom(spark, dir, queries,
        excludeSelfId = true).count(); ()
    }
    spark.stop()
  }
}
