package graft.tools

import graft.{Session, Tables}
import graft.textops.TextHash._
import org.apache.spark.sql.functions._

/** Scratch profiler for the ngramJaccard stages (not part of the
  * driver contract; run via tools/bench.sh with BENCH_MAIN).
  */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.builder(32, Some("local[32]"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    Tables.documents(spark, sfDir).count() // warm
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val threshold = 0.2
    val shingled = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "word_shingles(text, 3) as shingles")
      .where("size(shingles) >= 1")
    val inv = shingled.selectExpr("doc_id", "explode(shingles) as sh")
    time("inv count")(println(inv.count()))
    val ranked = inv.groupBy($"sh").agg(count(lit(1)).as("freq"))
      .withColumn("rid", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"freq".asc, $"sh".asc)))
      .select($"sh", $"rid")
    time("ranked count")(println(ranked.count()))
    val enc = time("enc localCheckpoint")(
      inv.join(broadcast(ranked), "sh")
        .groupBy($"doc_id")
        .agg(sort_array(collect_list($"rid")).as("ids"))
        .localCheckpoint())
    val pref = enc.selectExpr("doc_id", "size(ids) as n",
      s"posexplode(slice(ids, 1, cast(floor((1.0 - $threshold) * size(ids)) as int) + 1)) as (ppos, pid)")
    time("pref count")(println(pref.count()))
    val rawPairs = pref.as("x")
      .join(pref.as("y"),
        col("x.pid") === col("y.pid") && col("x.doc_id") < col("y.doc_id"))
    time("raw join matches")(println(rawPairs.count()))
    val pairs = pref.as("x")
      .join(pref.as("y"),
        col("x.pid") === col("y.pid") && col("x.doc_id") < col("y.doc_id") &&
          expr(s"least(x.n, y.n) >= $threshold * greatest(x.n, y.n) - 1e-9") &&
          expr(s"least(x.n - x.ppos, y.n - y.ppos) * (1.0 + $threshold)" +
            s" >= $threshold * (x.n + y.n) - 1e-9"))
      .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"))
      .distinct()
    time("filtered distinct pairs")(println(pairs.count()))
    val verified = pairs
      .join(broadcast(enc.select($"doc_id".as("doc1"), $"ids".as("ids1"))), "doc1")
      .join(broadcast(enc.select($"doc_id".as("doc2"), $"ids".as("ids2"))), "doc2")
      .selectExpr("doc1", "doc2",
        "sorted_intersect_count(ids1, ids2) as inter_cnt",
        "size(ids1) as n1", "size(ids2) as n2")
      .withColumn("jaccard",
        expr("cast(inter_cnt as double) / (n1 + n2 - inter_cnt)"))
      .where($"jaccard" >= threshold)
    time("verify")(println(verified.count()))
    spark.stop()
  }
}
