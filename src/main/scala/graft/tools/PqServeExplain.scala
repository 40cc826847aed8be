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
    spark.stop()
  }
}
