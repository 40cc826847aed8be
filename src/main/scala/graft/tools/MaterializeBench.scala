package graft.tools

import graft.Session
import graft.textops.{Dedup, Pipelines, Sampling}
import org.apache.spark.sql.SparkSession

/** Measures what [[graft.textops.Pipelines.materialize]] buys: the
  * one-time snapshot cost, then served-vs-recomputed wall time for the
  * cluster/corpus-prep consumers. Usage:
  * `runMain graft.tools.MaterializeBench <sfDir> <outDir>`
  */
object MaterializeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Session.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String, reps: Int)(f: => A): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"MATBENCH $label%-28s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }

    // warm the session (codegen/JIT) on the live pipeline once
    Dedup.dedupClusters(spark, sfDir).count()

    time("materialize(once)", 1) { Pipelines.materialize(spark, sfDir, outDir) }
    time("served:clusters_multi", 3) { Pipelines.clustersMulti(spark, outDir).count() }
    time("live:dedup_clusters_multi", 3) { Dedup.dedupClustersMulti(spark, sfDir).count() }
    time("served:clusters_multi_capped", 3) { Pipelines.clustersMultiCapped(spark, outDir).count() }
    time("live:dedup_clusters_multi_capped", 3) { Dedup.dedupClustersMultiCapped(spark, sfDir).count() }
    time("served:corpus_prep", 3) { Pipelines.corpusPrepFrom(spark, sfDir, outDir).count() }
    time("live:corpus_prep", 3) { Sampling.corpusPrep(spark, sfDir).count() }
    spark.stop()
  }
}
