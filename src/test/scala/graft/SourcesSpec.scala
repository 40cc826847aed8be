package graft

import graft.sources.CsvSources
import graft.streaming.StreamingAnalytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** S1 CSV-source coverage (reference record layouts) + the foreachBatch
  * streaming Top-N sink.
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def tmpCsv(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graftcsv")
    val f = dir.resolve(name)
    Files.write(f, String.join("\n", lines: _*).getBytes)
    f.toString
  }

  test("userBehavior csv parses reference layout") {
    val p = tmpCsv("UserBehavior.csv", Seq(
      "543462,1715,1464116,pv,1511658000",
      "662867,2244074,1575622,buy,1511658060"))
    val ds = CsvSources.userBehavior(spark, p).collect().sortBy(_.userId)
    assert(ds.length == 2)
    assert(ds.head == CsvSources.UserBehavior(543462L, 1715L, 1464116, "pv", 1511658000L))
  }

  test("apache.log parses dd/MM/yyyy:HH:mm:ss into epoch millis") {
    val p = tmpCsv("apache.log", Seq(
      "83.149.9.216 - 17/05/2015:10:05:03 GET /presentations/logstash/",
      "83.149.9.216 - 17/05/2015:10:05:43 GET /style2.css"))
    val ds = CsvSources.apacheLog(spark, p).collect().sortBy(_.eventTime)
    assert(ds.length == 2)
    // 2015-05-17T10:05:03 UTC = 1431857103000 ms
    assert(ds.head.eventTime == 1431857103000L)
    assert(ds.head.method == "GET")
    assert(ds.last.url == "/style2.css")
  }

  test("order/receipt/login/adclick csvs parse") {
    val o = CsvSources.orderLog(spark, tmpCsv("OrderLog.csv",
      Seq("34729,create,,1558430842", "34730,pay,sd76f87d6,1558430844")))
    assert(o.count() == 2 && o.filter($"eventType" === "pay").count() == 1)
    val r = CsvSources.receiptLog(spark, tmpCsv("ReceiptLog.csv",
      Seq("ewr342as4,wechat,1558430845")))
    assert(r.head().payChannel == "wechat")
    val l = CsvSources.loginLog(spark, tmpCsv("LoginLog.csv",
      Seq("5402,83.149.11.115,success,1558430815", "23064,66.249.3.15,fail,1558430826")))
    assert(l.filter($"eventType" === "fail").count() == 1)
    val a = CsvSources.adClickLog(spark, tmpCsv("AdClickLog.csv",
      Seq("543462,1715,beijing,beijing,1511658000")))
    assert(a.head().province == "beijing")
  }

  test("hot items over the reference's own UserBehavior layout") {
    // 3 pv's for item 1, 1 pv for item 2, one buy (filtered) in one hour
    val base = 1511658000L
    val rows = Seq(
      s"1,1,10,pv,$base", s"2,1,10,pv,${base + 60}", s"3,1,10,pv,${base + 120}",
      s"4,2,10,pv,${base + 60}", s"5,2,10,buy,${base + 90}")
    val ds = CsvSources.userBehavior(spark, tmpCsv("UserBehavior.csv", rows))
    val top = CsvSources.hotItemsFromBehaviors(ds, 1)
      .where($"rnk" === 1).select($"item_id").distinct().as[Long].collect()
    assert(top.toSeq == Seq(1L))
  }

  test("hot pages over apache.log layout: GET + static-resource regex filter") {
    val p = tmpCsv("apache.log", Seq(
      "1.1.1.1 - 17/05/2015:10:01:00 GET /a",
      "1.1.1.1 - 17/05/2015:10:02:00 GET /a",
      "1.1.1.2 - 17/05/2015:10:03:00 GET /b",
      "1.1.1.2 - 17/05/2015:10:03:30 GET /style.css", // excluded: static
      "1.1.1.3 - 17/05/2015:10:04:00 POST /a"))       // excluded: not GET
    val top = CsvSources.hotPagesFromApacheLog(CsvSources.apacheLog(spark, p), 1)
    import org.apache.spark.sql.functions.col
    // in the window ending 10:04 all three GET page hits are present:
    // /a (2) must outrank /b (1)
    val w = top.where(col("rnk") === 1 &&
      col("window_end") === java.sql.Timestamp.valueOf("2015-05-17 10:04:00"))
      .select(col("url")).as[String].collect().toSeq
    assert(w == Seq("/a"))
    assert(top.where(col("url").isin("/style.css")).isEmpty) // static excluded
    // POST never counted: /a's max count anywhere is 2
    assert(top.where(col("url") === "/a" && col("cnt") > 2).isEmpty)
  }

  // ---- Kafka wiring (S2/S4): no broker/connector in this container, so
  // the reader is exercised up to source resolution and the value
  // parse/encode stages run on synthesized Kafka-shaped frames.

  /** A DataFrame shaped like Kafka's output schema for the given
    * record values (binary key/value + metadata columns).
    */
  private def kafkaShaped(values: Seq[String]) =
    values.toDF("v").select(
      lit(null).cast("binary").as("key"),
      $"v".cast("binary").as("value"),
      lit("t").as("topic"), lit(0).as("partition"),
      monotonically_increasing_id().as("offset"),
      current_timestamp().as("timestamp"),
      lit(0).as("timestampType"))

  test("kafka reader: format wired (resolution fails only on missing connector)") {
    val ex = intercept[Exception] {
      sources.KafkaSources.reader(spark, "broker:9092", "behaviors").load()
    }
    // proves .format("kafka") + options reached source resolution —
    // the one failure a connector-less container must produce
    assert(ex.getMessage.toLowerCase.contains("kafka"))
  }

  test("kafka value parse: UserBehavior/OrderLog layouts round-trip") {
    val b = sources.KafkaSources.parseUserBehavior(kafkaShaped(Seq(
      "543462,1715,1464116,pv,1511658000")))
      .collect()
    assert(b.head == CsvSources.UserBehavior(543462L, 1715L, 1464116, "pv", 1511658000L))
    val o = sources.KafkaSources.parseOrderLog(kafkaShaped(Seq(
      "34729,create,,1558430842"))).head()
    assert(o == CsvSources.OrderEvent(34729L, "create", null, 1558430842L))
  }

  test("kafka apache.log layout: space-separated value parse") {
    val a = sources.KafkaSources.parseApacheLog(kafkaShaped(Seq(
      "83.149.9.216 - 17/05/2015:10:05:03 GET /presentations/logstash/"))).head()
    assert(a.eventTime == 1431857103000L && a.method == "GET")
  }

  test("kafka encode: typed rows -> keyed csv value -> parse round-trips") {
    val rows = Seq(
      CsvSources.AdClickLog(543462L, 1715L, "beijing", "beijing", 1511658000L),
      CsvSources.AdClickLog(662867L, 2244074L, "shanghai", "shanghai", 1511658060L))
    val enc = sources.KafkaSources.encodeCsv(rows.toDF(), keyCol = Some("userId"))
    assert(enc.columns.toSeq == Seq("key", "value"))
    assert(enc.select($"key").as[String].collect().sorted.toSeq ==
      Seq("543462", "662867"))
    val back = sources.KafkaSources.parseAdClickLog(
      kafkaShaped(enc.select($"value").as[String].collect().toSeq))
      .collect().sortBy(_.userId).toSeq
    assert(back == rows.sortBy(_.userId))
    // null field must keep its comma slot (concat_ws alone would skip
    // it and shift every later column)
    val createRow = Seq(CsvSources.OrderEvent(34729L, "create", null, 1558430842L))
    val encNull = sources.KafkaSources.encodeCsv(createRow.toDF())
      .select($"value").as[String].head()
    assert(encNull == "34729,create,,1558430842")
    assert(sources.KafkaSources.parseOrderLog(kafkaShaped(Seq(encNull))).head()
      == createRow.head)
  }

  test("kafka loopback e2e: encode -> simulated topic -> streaming parse+agg -> re-encode") {
    // No broker or connector jar exists in this container (zero egress),
    // so the network hop is the ONE stage that cannot run. This test
    // closes everything around it: the producer projection (encodeCsv,
    // keyed), a simulated topic that enforces Kafka's delivery contract
    // (key -> one partition via murmur-style hash, per-partition
    // monotone offsets, per-key order preserved), the consumer parse
    // (parseUserBehavior over the EXACT kafka output schema), a
    // windowed streaming aggregation, and the writer re-encode whose
    // output parses back to the same rows. A deployment with the
    // connector jar swaps only the hop: reader(...).load() / writer().
    implicit val ctx = spark.sqlContext
    val behaviors = (0 until 300).map { i =>
      CsvSources.UserBehavior(1000L + i % 17, 100L + i % 7, i % 5,
        if (i % 4 == 0) "buy" else "pv", 1511658000L + i * 60)
    }
    // producer side: the writer's own projection, keyed by itemId
    val enc = sources.KafkaSources.encodeCsv(behaviors.toDF(),
      keyCol = Some("itemId"))
    assert(enc.columns.toSeq == Seq("key", "value"))
    val produced = enc.as[(String, String)].collect().toSeq
    // simulated topic: Kafka's contract, driver-side
    val nPart = 3
    var offsets = Map.empty[Int, Long].withDefaultValue(0L)
    val topic = produced.map { case (k, v) =>
      val p = math.floorMod(k.hashCode, nPart)
      val off = offsets(p); offsets += p -> (off + 1)
      (k.getBytes("UTF-8"), v.getBytes("UTF-8"), "behaviors", p, off,
        new java.sql.Timestamp(System.currentTimeMillis()), 0)
    }
    // contract assertions: a key maps to exactly one partition; offsets
    // are dense and monotone per partition (so per-key order survives)
    assert(topic.groupBy(r => new String(r._1)).forall(_._2.map(_._4).distinct.size == 1))
    topic.groupBy(_._4).foreach { case (_, rs) =>
      assert(rs.map(_._5) == (0L until rs.size).toSeq) }
    // consumer side: kafka-schema MemoryStream -> parse -> windowed agg
    val ms = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long,
      java.sql.Timestamp, Int)]
    val kafkaDf = ms.toDF().toDF("key", "value", "topic", "partition",
      "offset", "timestamp", "timestampType")
    val counts = sources.KafkaSources.parseUserBehavior(kafkaDf)
      .where($"behavior" === "pv")
      .groupBy(window(timestamp_seconds($"timestamp"), "1 hour"), $"itemId")
      .count()
      .select($"window.end".as("window_end"), $"itemId", $"count".as("cnt"))
    val q = counts.writeStream.format("memory").queryName("kafka_loopback")
      .outputMode("complete").start()
    try {
      // feed partition-by-partition in offset order, as a consumer would
      topic.groupBy(_._4).toSeq.sortBy(_._1)
        .foreach { case (_, rs) => ms.addData(rs.sortBy(_._5)) }
      q.processAllAvailable()
      val got = spark.table("kafka_loopback")
        .as[(java.sql.Timestamp, Long, Long)].collect().toSet
      val want = behaviors.toDF().where($"behavior" === "pv")
        .groupBy(window(timestamp_seconds($"timestamp"), "1 hour"), $"itemId")
        .count()
        .select($"window.end", $"itemId", $"count")
        .as[(java.sql.Timestamp, Long, Long)].collect().toSet
      assert(want.nonEmpty && got == want,
        "kafka-loopback streaming counts diverged from batch on the same rows")
      // writer side: re-encode the result and parse it back (the egress
      // half of the loop — KafkaProducerUtil analog)
      val out = spark.table("kafka_loopback")
        .select(unix_micros($"window_end").as("we"), $"itemId", $"cnt")
      val reenc = sources.KafkaSources.encodeCsv(out, keyCol = Some("itemId"))
        .select($"value").as[String].collect().toSeq
      val back = kafkaShaped(reenc).select(from_csv($"value".cast("string"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "we LONG, itemId LONG, cnt LONG"),
          Map.empty[String, String]).as("r")).select("r.*")
        .as[(Long, Long, Long)].collect().toSet
      assert(back == out.as[(Long, Long, Long)].collect().toSet,
        "writer re-encode did not parse back to the emitted rows")
    } finally q.stop()
  }

  test("foreachBatch streaming top-N == batch rank on final state") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[EvFull]
    val rows = Tables.events(spark, SparkTestBase.sf)
      .select($"event_id", unix_micros($"ts").as("ts_us"), $"user_id",
        $"event_type", $"props")
      .as[EvFull].collect().toSeq
    ms.addData(rows)
    val got = new java.util.concurrent.atomic.AtomicReference[Set[(java.sql.Timestamp, Long, Long, Int)]](Set.empty)
    val q = StreamingAnalytics.hotItemsTopNForeachBatch(
        ms.toDF().withColumn("ts", expr("timestamp_micros(ts_us)")), 5) { ranked =>
        got.set(ranked.select($"window_end", $"item_id", $"cnt", $"rnk")
          .as[(java.sql.Timestamp, Long, Long, Int)].collect().toSet)
      }.start()
    try {
      q.processAllAvailable()
      val want = analytics.UserBehaviorAnalytics.hotItemsTopN(spark, SparkTestBase.sf)
        .select($"window_end", $"item_id", $"cnt", $"rnk")
        .as[(java.sql.Timestamp, Long, Long, Int)].collect().toSet
      assert(got.get() == want)
    } finally q.stop()
  }

  test("JSONL: documents round-trip losslessly; corrupt lines side-output") {
    val dir = java.nio.file.Files.createTempDirectory("graftjsonl").toString
    val docs = Tables.documents(spark, SparkTestBase.sf)
    sources.JsonlSources.write(docs, s"$dir/docs")
    val back = sources.JsonlSources.documents(spark, s"$dir/docs/*.txt")
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      docs.schema.map(f => (f.name, f.dataType)))
    assert(back.collect().toSet == docs.collect().toSet)
    // inject a malformed line next to valid ones
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/docs/zz_bad.txt"),
      "{not json\n".getBytes("UTF-8"))
    val all = sources.JsonlSources.documents(spark, s"$dir/docs/*.txt")
    val bad = sources.JsonlSources.corruptLines(spark, s"$dir/docs/*.txt")
    assert(all.count() == docs.count())
    assert(bad.as[String].collect().toSeq == Seq("{not json"))
  }

  test("JSONL drop-dir stream: sharded ingest through corpusPrepStream == batch") {
    val dir = java.nio.file.Files.createTempDirectory("graftjdrop").toString
    // shards written in doc_id order with ordered names/mtimes so the
    // file source's (mtime, path) ordering matches arrival order
    val docs = Tables.documents(spark, SparkTestBase.sf)
      .orderBy($"doc_id")
      .select(to_json(struct(
        $"doc_id", $"text", $"lang", $"source", $"n_chars"))).as[String]
      .collect()
    docs.grouped(math.max(docs.length / 3, 1)).zipWithIndex.foreach {
      case (lines, i) =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(f"$dir/shard_$i%03d.jsonl"),
          (lines.mkString("\n") + "\n").getBytes("UTF-8"))
        Thread.sleep(5) // distinct mtimes keep shard order stable
    }
    val stream = sources.JsonlSources
      .documentsStream(spark, s"$dir/*.jsonl", maxFilesPerTrigger = Some(1))
      .withColumn("ts", expr("timestamp_micros((doc_id + 1) * 1000000)"))
    val q = streaming.StreamingAnalytics.corpusPrepStream(stream)
      .writeStream.format("memory").queryName("jsonl_prep")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // sentinel shard with far-future doc_id -> far-future ts:
      // advances the watermark and drains dedup state
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/zz_flush.jsonl"),
        (s"""{"doc_id":10000000,"text":"FLUSH-SENTINEL","lang":"en","source":"s","n_chars":14}""" + "\n")
          .getBytes("UTF-8"))
      q.processAllAvailable()
      val got = spark.table("jsonl_prep").where($"doc_id" =!= 10000000L)
        .select($"doc_id", $"lang", $"n_tokens", $"quality")
        .as[(Long, String, Long, Double)].collect().toSet
      val keepers = textops.Dedup.dedupExact(spark, SparkTestBase.sf)
        .select($"keep_id".as("doc_id"))
      val want = textops.TextStats.textStats(spark, SparkTestBase.sf)
        .join(keepers, "doc_id")
        .where($"quality" >= 0.5 &&
          expr("poly_hash(cast(doc_id as string)) % 100 < 90"))
        .select($"doc_id", $"lang", $"n_tokens", $"quality")
        .as[(Long, String, Long, Double)].collect().toSet
      assert(want.nonEmpty && got == want)
      // maxFilesPerTrigger=1 must have produced one batch per shard
      assert(q.recentProgress.count(_.numInputRows > 0) >= 4)
    } finally q.stop()
  }

  test("Tables.createViews: whole surface reachable from spark.sql") {
    Tables.createViews(spark, SparkTestBase.sf)
    val r = spark.sql(
      """SELECT (SELECT count(*) FROM lineitem) AS l,
        |       (SELECT count(*) FROM events WHERE event_type = 'view') AS v,
        |       (SELECT count(*) FROM documents) AS d""".stripMargin).head
    assert(r.getLong(0) > 0 && r.getLong(1) > 0 && r.getLong(2) > 0)
  }
}
