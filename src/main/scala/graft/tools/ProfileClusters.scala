package graft.tools

import graft.Tables
import graft.textops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for the clustering pipeline (dev tool, not part
  * of the query surface): pair-generation cost per evidence tier vs
  * the connected-components loop, plus the loop's round count.
  */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Session.tune(
        SparkSession.builder().master("local[32]"), 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    Dedup.dedupClustersMulti(spark, sfDir).count()
    for (_ <- 1 to 2) {
      val mh = time("minhash pairs") {
        Dedup.minhashLsh(spark, sfDir).select("doc1", "doc2").localCheckpoint()
      }
      val sh = time("simhash pairs") {
        Dedup.simhashDedup(spark, sfDir).select("doc1", "doc2").localCheckpoint()
      }
      val pairs = time("union+distinct") {
        mh.union(sh).distinct().localCheckpoint()
      }
      println(s"  pairs=${pairs.count()}")
      val docs = Tables.documents(spark, sfDir).select(col("doc_id"))
      time("cc loop") { Dedup.connectedComponents(docs, pairs).count() }
      time("full query") { Dedup.dedupClustersMulti(spark, sfDir).count() }
    }
    spark.stop()
  }
}
