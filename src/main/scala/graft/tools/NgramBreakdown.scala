package graft.tools

import graft.{Session, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-17 optimization probe: phase timings for the CURRENT
  * ngramJaccardCapped pipeline (mirrors `Dedup.shingleEncoded` +
  * `ngramCandidates` + verify structure — the private originals can't
  * be called piecewise from here). Usage: `NgramBreakdown <sfDir> [reps]`.
  */
object NgramBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = Session.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    val threshold = 0.2
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"NGB $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rep <- 0 to reps) {
      if (rep > 0) println(s"--- rep $rep ---")
      val shingled = Tables.documents(spark, sfDir)
        .selectExpr("doc_id", "word_shingles(text, 3) as shingles")
        .where("size(shingles) >= 1")
      val inv = time("inv(checkpoint)") {
        shingled.selectExpr("doc_id", "explode(shingles) as sh")
          .localCheckpoint()
      }
      val freqs = inv.groupBy($"sh").agg(count(lit(1)).as("freq"))
      val ranked = time("ranked(toDF)") {
        val parts = math.max(freqs.rdd.getNumPartitions, 1)
        val sortedRdd = freqs
          .repartitionByRange(parts, $"freq".asc, $"sh".asc)
          .sortWithinPartitions($"freq".asc, $"sh".asc)
          .select($"sh").rdd
        sortedRdd.zipWithIndex()
          .map { case (r, i) => (r.getString(0), (i + 1).toInt) }
          .toDF("sh", "rid")
      }
      val enc = time("enc(checkpoint)") {
        inv.join(broadcast(ranked), "sh")
          .groupBy($"doc_id")
          .agg(sort_array(collect_list($"rid")).as("ids"))
          .localCheckpoint()
      }
      val pref0 = enc.selectExpr("doc_id", "size(ids) as n",
        s"posexplode(slice(ids, 1, cast(floor((1.0 - $threshold) * size(ids)) as int) + 1)) as (ppos, pid)")
      val w = Window.partitionBy(col("pid"))
      val pref = pref0
        .withColumn("nmin", min(col("n")).over(w))
        .withColumn("gcnt", count(lit(1)).over(w))
        .where(col("gcnt") >= 2 && col("gcnt") <= 10 &&
          expr(s"(1.0 + $threshold) * (n - ppos) >= $threshold * (n + nmin) - 1e-9"))
        .drop("nmin", "gcnt")
      val cand = pref.as("x")
        .join(pref.as("y"),
          col("x.pid") === col("y.pid") && col("x.doc_id") < col("y.doc_id") &&
            expr(s"least(x.n, y.n) >= $threshold * greatest(x.n, y.n) - 1e-9") &&
            expr(s"least(x.n - x.ppos, y.n - y.ppos) * (1.0 + $threshold)" +
              s" >= $threshold * (x.n + y.n) - 1e-9"))
        .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"))
        .distinct()
      time("candidates(count)") { cand.count() }
      val e1 = enc.select($"doc_id".as("doc1"), $"ids".as("ids1"))
      val e2 = enc.select($"doc_id".as("doc2"), $"ids".as("ids2"))
      val out = cand
        .join(broadcast(e1), "doc1").join(broadcast(e2), "doc2")
        .selectExpr("doc1", "doc2",
          "sorted_intersect_count(ids1, ids2) as inter_cnt",
          "size(ids1) as n1", "size(ids2) as n2")
        .where(expr(s"cast(inter_cnt as double) / (n1 + n2 - inter_cnt) >= $threshold"))
      time("verify(count)") { out.count() }
      Session.scrubBlocks(spark)
    }
    spark.stop()
  }
}
