package graft.tools

import graft.{Session, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Runs named SparkEntry queries at a tier and prints their rows —
  * the ops way to read the telemetry queries (`similarity_lsh_stats`,
  * `similarity_cell_stats`, `dedup_candidate_stats`, …) off a corpus
  * before trusting the cost models they measure.
  * Usage: `runMain graft.tools.ShowQuery <sfDir> <q1,q2,...> [maxRows=50]`
  */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',')
    val maxRows = if (args.length > 2) args(2).toInt else 50
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      println(s"\n========== $name @ $sfDir ==========")
      SparkEntry.queries(name)(spark, sfDir).show(maxRows, truncate = false)
    }
    spark.stop()
  }
}
