package graft

import graft.sources.ParquetSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sink layer's scale claims, verified on the plans themselves:
  * partition pruning actually prunes, bucketed joins actually skip the
  * exchange.
  */
class ParquetSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val sf = SparkTestBase.sf

  import spark.implicits._

  test("date-partitioned write: filters prune partitions at plan time") {
    val dir = java.nio.file.Files.createTempDirectory("graftsink").toString
    val events = Tables.events(spark, sf).withColumn("day", to_date($"ts"))
    ParquetSink.writePartitioned(events, dir, Seq("day"))
    val back = spark.read.parquet(dir)
    assert(back.count() == events.count())
    val oneDay = back.where($"day" === "2024-01-05")
    // partition filter must reach the scan (directory pruning), not a
    // post-scan Filter
    val scan = oneDay.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("2024-01-05"),
      s"partition filter not pushed:\n$scan")
    assert(oneDay.count() ==
      events.where($"day" === "2024-01-05").count())
  }

  test("bucketed tables join with no exchange on either side") {
    val wh = java.nio.file.Files.createTempDirectory("graftwh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_sink_test LOCATION '$wh'")
    try {
      val orders = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val lineitem = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity")
      ParquetSink.writeBucketed(orders, "graft_sink_test.orders_b", "o_orderkey", 8)
      ParquetSink.writeBucketed(lineitem, "graft_sink_test.lineitem_b", "l_orderkey", 8)
      // force the shuffle-join path (at sf0.001 the planner would
      // broadcast instead — which also avoids a shuffle, but the claim
      // under test is the bucket co-location)
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = spark.table("graft_sink_test.orders_b")
          .join(spark.table("graft_sink_test.lineitem_b"),
            $"o_orderkey" === $"l_orderkey")
        val plan = j.queryExecution.executedPlan.toString
        // shuffle exchanges print as "Exchange hashpartitioning(...)" —
        // ShuffleExchangeExec.nodeName is the bare "Exchange", so match
        // the full spelling (BroadcastExchange would not match either way)
        assert(plan.contains("SortMergeJoin") && !plan.contains("Exchange hashpartitioning"),
          s"bucketed join still shuffles:\n$plan")
        val want = Tables.orders(spark, sf)
          .join(Tables.lineitem(spark, sf), $"o_orderkey" === $"l_orderkey")
          .count()
        assert(j.count() == want)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_sink_test CASCADE")
    }
  }

  test("z-ordered write: per-file ranges are narrow on BOTH keys") {
    val dir = java.nio.file.Files.createTempDirectory("graftz").toString
    val events = Tables.events(spark, sf)
      .select($"event_id", $"user_id",
        datediff(to_date($"ts"), lit("2024-01-01")).as("day"))
    ParquetSink.writeZOrdered(events, s"$dir/z", "user_id", "day",
      bits = 8, parts = 8)
    val back = spark.read.parquet(s"$dir/z")
    assert(back.count() == events.count(), "z-ordered write lost rows")
    assert(back.columns.toSet == Set("event_id", "user_id", "day"),
      "helper columns leaked into the files")
    // per-file min/max spans: with z-ordering, EVERY file covers a
    // small rectangle of the (user, day) space; a plain
    // sort-by-user layout would leave day spans at full width
    def spans(path: String): (Double, Double) = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      assert(files.length >= 4, "too few files to measure clustering")
      val perFile = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max($"user_id") - min($"user_id"),
            max($"day") - min($"day"))
          .as[(Long, Int)].collect().head
        (r._1.toDouble, r._2.toDouble)
      }
      (perFile.map(_._1).sum / perFile.length,
        perFile.map(_._2).sum / perFile.length)
    }
    val (uSpan, dSpan) = spans(s"$dir/z")
    val Array((uGlob, dGlob)) = events
      .agg((max($"user_id") - min($"user_id")).cast("double"),
        (max($"day") - min($"day")).cast("double"))
      .as[(Double, Double)].collect()
    assert(uSpan <= 0.6 * uGlob,
      s"user span $uSpan not clustered vs global $uGlob")
    assert(dSpan <= 0.6 * dGlob,
      s"day span $dSpan not clustered vs global $dGlob")
    // contrast: single-column sort leaves the OTHER key at full width
    events.repartitionByRange(8, $"user_id")
      .sortWithinPartitions($"user_id")
      .write.parquet(s"$dir/u")
    val (_, dSpanU) = spans(s"$dir/u")
    assert(dSpanU >= 0.9 * dGlob,
      "sorted-by-user baseline unexpectedly clustered on day too")
    assert(dSpan < 0.7 * dSpanU,
      s"z-order day span $dSpan not better than sort-by-user $dSpanU")
  }
}
