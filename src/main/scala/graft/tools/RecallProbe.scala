package graft.tools

import graft.Session
import graft.textops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints recall@5 for the seeded vs k-means-trained IVF index at a
  * tier, optionally sweeping nProbe, plus the IVF serving time at each
  * probe width (the recall query itself is dominated by its exact
  * ground-truth scan, so serving cost is timed separately).
  * Usage: `runMain graft.tools.RecallProbe <sfDir> [np1,np2,...]`
  * (nProbe −1 = the scale-adaptive default, autoNProbe ≈ 0.2·C)
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val probes: Seq[Int] =
      if (args.length > 1) args(1).split(',').map(_.trim.toInt).toSeq
      else Seq(-1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    for (trained <- Seq(false, true); np <- probes) {
      val r = Similarity.similarityRecall(spark, sfDir, nProbe = np,
          trained = trained)
        .agg(avg($"recall")).head().getDouble(0)
      val serve = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        (if (trained) Similarity.similarityIvfTrained(spark, sfDir, nProbe = np)
         else Similarity.similarityIvf(spark, sfDir, nProbe = np)).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
      println(f"RECALL trained=$trained%-5s nProbe=$np%-3d avg_recall=$r%.3f serve_s=$serve%.2f")
    }
    spark.stop()
  }
}
