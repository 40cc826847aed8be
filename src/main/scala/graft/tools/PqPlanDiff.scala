package graft.tools

import graft.{Session, Tables}
import graft.textops.Pipelines

/** Static-plan differ for the stored-PQ serve: prints the FORMATTED
  * physical plan of [[Pipelines.annSearchPqFrom]] against each given
  * snapshot WITHOUT executing it — cheap enough to diff node-by-node.
  * Built for the K=16/K=64 serve-time inversion hunt after the
  * stage decomposition showed the gap lives in the score+window
  * stages on identical candidates (checks e.g. whether the
  * WindowGroupLimit rank-limit pushdown applied to both).
  * Usage: `PqPlanDiff <sfDir> <snapshotDir> [snapshotDir2 ...]`
  */
object PqPlanDiff {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = Session.harnessBuilder(defaultCpus = "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val queries = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
    for (dir <- args.drop(1)) {
      println(s"\n========== $dir ==========")
      Pipelines.annSearchPqFrom(spark, dir, queries, excludeSelfId = true)
        .explain("formatted")
    }
    spark.stop()
  }
}
