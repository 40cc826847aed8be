package graft

import graft.streaming.StreamingAnalytics
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once recovery: a watermarked streaming aggregation stopped
  * mid-stream and restarted from its checkpoint must produce the same
  * final result as the batch query over all the data — state (window
  * counts, watermark) restores from the checkpoint, and the file
  * source replays nothing it already committed.
  */
class StreamingRecoverySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val sf = SparkTestBase.sf

  import spark.implicits._

  /** Run a query with session confs temporarily overridden; restores
    * prior values (or unsets) afterwards.
    */
  private def withConfs[T](confs: Seq[(String, String)])(body: => T): T = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Shared body: windowed agg stopped mid-stream and restarted from
    * its checkpoint == batch, under whatever state store provider the
    * session currently has.
    */
  private def runWindowedAggRecovery(): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graftrecov").toString
    val inDir = s"$root/in"; val outDir = s"$root/out"; val ck = s"$root/ck"
    new java.io.File(inDir).mkdirs()

    val all = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type")
      .orderBy($"ts").collect()
    val (h1, h2) = all.splitAt(all.length / 2)
    def writeChunk(rows: Array[org.apache.spark.sql.Row], name: String): Unit =
      spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toSeq, 1),
          StructType(Seq(StructField("event_id", LongType),
            StructField("ts", TimestampType), StructField("user_id", LongType),
            StructField("event_type", StringType))))
        .write.parquet(s"$inDir/$name")

    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts", TimestampType), StructField("user_id", LongType),
      StructField("event_type", StringType)))
    def start() = StreamingAnalytics.uniqueVisitorsStream(
        spark.readStream.schema(schema)
          .option("recursiveFileLookup", "true").parquet(inDir))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ck)
      .outputMode("append").start()

    // phase 1: first half, then hard stop (simulated failure/redeploy)
    writeChunk(h1, "chunk1")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // phase 2: restart from the checkpoint, deliver the rest + a
    // far-future sentinel to advance the watermark past every window
    writeChunk(h2, "chunk2")
    val sentinel = org.apache.spark.sql.Row(-1L,
      new java.sql.Timestamp(all.map(_.getTimestamp(1).getTime).max
        + 40L * 86400 * 1000), -1L, "view")
    writeChunk(Array(sentinel), "chunk3")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val want = analytics.UserBehaviorAnalytics.uniqueVisitors(spark, sf)
      .as[(java.sql.Timestamp, Long)].collect().toSet
    val maxEnd = want.map(_._1.getTime).max
    val got = spark.read.parquet(outDir)
      .select($"window_end", $"uv")
      .as[(java.sql.Timestamp, Long)].collect().toSet
      .filter(_._1.getTime <= maxEnd) // drop the sentinel's own window
    assert(got == want)
  }

  test("windowed agg restarts from checkpoint: file source, stop/restart, == batch") {
    runWindowedAggRecovery() // session default: RocksDB (SparkTestBase)
  }

  test("same recovery on the HDFS-backed state store (provider matrix)") {
    // the session default is RocksDB (the 100×-state deployment
    // config: state on executor disk + changelog checkpoints); the
    // windowed agg must recover identically on the heap+snapshot
    // HDFS provider — same query code, either backend
    withConfs(Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        "false"))(runWindowedAggRecovery())
  }

  test("transformWithState Top-N restarts from checkpoint: RocksDB state + timers survive") {
    val root = java.nio.file.Files.createTempDirectory("grafttws").toString
    val inDir = s"$root/in"; val outDir = s"$root/out"; val ck = s"$root/ck"
    new java.io.File(inDir).mkdirs()

    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts", TimestampType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("props", StringType)))
    val all = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"props")
      .orderBy($"ts").collect()
    def writeChunk(rows: Array[org.apache.spark.sql.Row], name: String): Unit =
      spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toSeq, 1), schema)
        .write.parquet(s"$inDir/$name")

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val ss = spark
      // maxFilesPerTrigger=1: each chunk is its own micro-batch, so the
      // sentinel chain drives watermark advances batch by batch (a timer
      // registered in batch N fires in a later batch)
      def start() = StreamingAnalytics.hotItemsTopNStream(
          spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true").parquet(inDir))
        .toDF()
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ck)
        .outputMode("append").start()

      val (h1, h2) = all.splitAt(all.length / 2)
      writeChunk(h1, "chunk1")
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()

      writeChunk(h2, "chunk2")
      val maxTs = all.map(_.getTimestamp(1).getTime).max
      // sentinels carry a PARSEABLE item (a {} props row would be
      // filtered below the watermark node and never advance it)
      for (d <- 1 to 3)
        writeChunk(Array(org.apache.spark.sql.Row(-1L,
          new java.sql.Timestamp(maxTs + d * 40L * 86400 * 1000), -1L,
          "view", "{\"k\": 999999}")), s"sent$d")
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()

      val want = analytics.UserBehaviorAnalytics.hotItemsTopN(spark, sf)
        .select($"window_end", $"item_id", $"cnt", $"rnk")
        .as[(java.sql.Timestamp, Long, Long, Int)].collect().toSet
      val maxEnd = want.map(_._1.getTime).max
      val got = spark.read.parquet(outDir)
        .select($"window_end", $"item_id", $"cnt", $"rnk")
        .as[(java.sql.Timestamp, Long, Long, Int)].collect().toSet
        .filter(_._1.getTime <= maxEnd) // drop the sentinels' own windows
      assert(got == want,
        s"sizes got=${got.size} want=${want.size} " +
          s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("consecutiveRunsStream restarts from checkpoint: open runs + buffer survive") {
    import graft.cep.{Pattern, PatternEv, Step}
    implicit val ss = spark
    val root = java.nio.file.Files.createTempDirectory("graftkleene").toString
    val inDir = s"$root/in"; val outDir = s"$root/out"; val ck = s"$root/ck"
    new java.io.File(inDir).mkdirs()

    val p = Pattern(Seq(Step("err", $"event_type" === "error")),
      withinUs = 24L * 3600 * 1000000)
    val rows = p.toPatternEvents(Tables.events(spark, sf),
        $"user_id", unix_micros($"ts"), $"event_id")
      .collect().toSeq.sortBy(e => (e.ts_us, e.ord))
    val maxUs = rows.map(_.ts_us).max
    def writeChunk(evs: Seq[PatternEv], name: String): Unit =
      spark.createDataset(evs).repartition(1).write.parquet(s"$inDir/$name")

    val schema = org.apache.spark.sql.Encoders.product[PatternEv].schema
    def start() = Pattern.consecutiveRunsStream(
        spark.readStream.schema(schema)
          .option("recursiveFileLookup", "true").parquet(inDir).as[PatternEv],
        minTimes = 2, withinUs = 24L * 3600 * 1000000)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ck)
      .outputMode("append").start()

    // phase 1: half the stream, hard stop — open runs and the event
    // buffer must persist in the state store
    val (h1, h2) = rows.splitAt(rows.size / 2)
    writeChunk(h1, "chunk1")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // phase 2: restart, rest of the stream + per-key closers + sentinel
    val closers = rows.map(_.key).distinct
      .map(k => PatternEv(k, maxUs + 3600L * 1000000, -900L - k, 0L))
    writeChunk(h2, "chunk2")
    writeChunk(closers, "chunk3")
    writeChunk(Seq(PatternEv(-1L, maxUs + 40L * 86400 * 1000000, -1L, 0L)), "chunk4")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(outDir)
      .where($"key" =!= -1L)
      .select($"key", $"start_ord", $"end_ord")
      .as[(Long, Long, Long)].collect().toSet
    val want = analytics.DetectionAnalytics.cepBursts(spark, sf)
      .select($"user_id", $"start_event", $"end_event")
      .as[(Long, Long, Long)].collect().toSet
    assert(want.nonEmpty && got == want)
  }

  test("compileStream NFA restarts from checkpoint: event buffer + live partials survive") {
    import graft.cep.{Pattern, PatternEv}
    implicit val ss = spark
    val root = java.nio.file.Files.createTempDirectory("graftnfa").toString
    val inDir = s"$root/in"; val outDir = s"$root/out"; val ck = s"$root/ck"
    new java.io.File(inDir).mkdirs()

    // the strict view→click→purchase funnel (cep_funnel's pattern):
    // splitting the stream mid-corpus leaves funnels straddling the
    // stop — only checkpointed partials can complete them after restart
    val p = analytics.DetectionAnalytics.funnelPattern
    val rows = p.toPatternEvents(Tables.events(spark, sf),
        $"user_id", unix_micros($"ts"), $"event_id")
      .collect().toSeq.sortBy(e => (e.ts_us, e.ord))
    val maxUs = rows.map(_.ts_us).max
    def writeChunk(evs: Seq[PatternEv], name: String): Unit =
      spark.createDataset(evs).repartition(1).write.parquet(s"$inDir/$name")

    val schema = org.apache.spark.sql.Encoders.product[PatternEv].schema
    def start() = p.compileStream(
        spark.readStream.schema(schema)
          .option("recursiveFileLookup", "true").parquet(inDir).as[PatternEv])
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ck)
      .outputMode("append").start()

    val (h1, h2) = rows.splitAt(rows.size / 2)
    writeChunk(h1, "chunk1")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // restart from the checkpoint, rest of the stream + a sentinel far
    // enough out that the watermark finalizes every buffered event
    writeChunk(h2, "chunk2")
    writeChunk(Seq(PatternEv(-1L, maxUs + 40L * 86400 * 1000000, -1L, 0L)),
      "chunk3")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(outDir)
      .where($"key" =!= -1L)
      .select($"key", $"start_ord", $"end_ord")
      .as[(Long, Long, Long)].collect().toSet
    val want = analytics.DetectionAnalytics.cepFunnel(spark, sf)
      .select($"user_id", $"start_event", $"end_event")
      .as[(Long, Long, Long)].collect().toSet
    assert(want.nonEmpty && got == want,
      s"sizes got=${got.size} want=${want.size} " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("compileStreamAbsence restarts from checkpoint: open A-candidates survive to fire") {
    import graft.cep.{Pattern, PatternEv}
    implicit val ss = spark
    val root = java.nio.file.Files.createTempDirectory("graftabs").toString
    val inDir = s"$root/in"; val outDir = s"$root/out"; val ck = s"$root/ck"
    new java.io.File(inDir).mkdirs()

    // signup→(no purchase within 24h): signups arriving pre-restart
    // whose deadlines expire post-restart can only fire if the open
    // candidate list survives in the state store
    val p = analytics.DetectionAnalytics.absencePattern
    val rows = p.toPatternEvents(Tables.events(spark, sf),
        $"user_id", unix_micros($"ts"), $"event_id")
      .collect().toSeq.sortBy(e => (e.ts_us, e.ord))
    val maxUs = rows.map(_.ts_us).max
    def writeChunk(evs: Seq[PatternEv], name: String): Unit =
      spark.createDataset(evs).repartition(1).write.parquet(s"$inDir/$name")

    val schema = org.apache.spark.sql.Encoders.product[PatternEv].schema
    def start() = p.compileStreamAbsence(
        spark.readStream.schema(schema)
          .option("recursiveFileLookup", "true").parquet(inDir).as[PatternEv])
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ck)
      .outputMode("append").start()

    val (h1, h2) = rows.splitAt(rows.size / 2)
    writeChunk(h1, "chunk1")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    writeChunk(h2, "chunk2")
    writeChunk(Seq(PatternEv(-1L, maxUs + 40L * 86400 * 1000000, -1L, 0L)),
      "chunk3")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(outDir)
      .where($"key" =!= -1L)
      .select($"key", $"start_ord")
      .as[(Long, Long)].collect().toSet
    val want = analytics.DetectionAnalytics.cepAbsence(spark, sf)
      .select($"user_id", $"event")
      .as[(Long, Long)].collect().toSet
    assert(want.nonEmpty && got == want,
      s"sizes got=${got.size} want=${want.size} " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("Trigger.AvailableNow: drain everything then stop (A9 custom-trigger analog)") {
    // the reference's FIRE_AND_PURGE custom trigger controls WHEN
    // results emit; Spark's trigger surface is the analog — AvailableNow
    // processes all pending input and terminates on its own
    val root = java.nio.file.Files.createTempDirectory("graftanow").toString
    val inDir = s"$root/in"
    new java.io.File(inDir).mkdirs()
    Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type")
      .write.parquet(s"$inDir/chunk1")
    val schema = spark.read.parquet(s"$inDir/chunk1").schema
    implicit val ctx = spark.sqlContext
    val q = StreamingAnalytics.pageViewsStream(
        spark.readStream.schema(schema)
          .option("recursiveFileLookup", "true").parquet(inDir))
      .writeStream.format("memory").queryName("anow_stream")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
      val got = spark.table("anow_stream").select($"window_end", $"pv")
        .as[(java.sql.Timestamp, Long)].collect().toSet
      val want = analytics.UserBehaviorAnalytics.pageViews(spark, sf)
        .as[(java.sql.Timestamp, Long)].collect().toSet
      assert(got == want)
    } finally q.stop()
  }

  test("docDedupStream restarts from checkpoint: dedup state survives, twin still dropped") {
    val root = java.nio.file.Files.createTempDirectory("graftddr").toString
    val inDir = s"$root/in"; val outDir = s"$root/out"; val ck = s"$root/ck"
    new java.io.File(inDir).mkdirs()
    def shard(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$inDir/$name"),
        (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    def doc(id: Long, text: String) =
      s"""{"doc_id":$id,"text":"$text","lang":"en","source":"s","n_chars":${text.length}}"""
    def start() = StreamingAnalytics.docDedupStream(
        sources.JsonlSources.documentsStream(spark, s"$inDir/*.jsonl")
          .withColumn("ts", expr("timestamp_micros((doc_id + 1) * 1000000)")))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ck)
      .outputMode("append").start()

    // phase 1: originals, then hard stop
    shard("a_one.jsonl", Seq(doc(1, "alpha beta gamma"), doc(2, "unique one")))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // phase 2: restart; the twin of doc 1 arrives within the watermark
    // delay — only checkpointed dedup state can know to drop it
    shard("b_two.jsonl", Seq(doc(3, "alpha beta gamma"), doc(4, "unique two")))
    shard("c_flush.jsonl", Seq(doc(10000000, "FLUSH-SENTINEL")))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(outDir)
      .where($"doc_id" =!= 10000000L)
      .select($"doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 4L), s"expected twin 3 dropped, got $got")
  }

  test("complete-mode agg (oovRateFrom) restarts from checkpoint: pre-restart docs still scored") {
    val root = java.nio.file.Files.createTempDirectory("graftoovr").toString
    val inDir = s"$root/in"; val ck = s"$root/ck"
    new java.io.File(inDir).mkdirs()
    def shard(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$inDir/$name"),
        (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    def doc(id: Long, text: String) =
      s"""{"doc_id":$id,"text":"$text","lang":"en","source":"s","n_chars":${text.length}}"""
    val vocab = Seq("alpha", "beta").toDF("token")
      .withColumn("in_vocab", lit(1L)).cache()
    def start(table: String) = graft.textops.TextStats.oovRateFrom(
        sources.JsonlSources.documentsStream(spark, s"$inDir/*.jsonl"), vocab)
      .writeStream.format("memory").queryName(table)
      .option("checkpointLocation", ck)
      .outputMode("complete").start()

    // phase 1: two docs, hard stop
    shard("a.jsonl", Seq(doc(1, "alpha beta gamma"), doc(2, "beta beta")))
    val q1 = start("oov_recov1")
    try q1.processAllAvailable() finally q1.stop()
    // phase 2: restart from the checkpoint; one more doc arrives. The
    // complete-mode output must still carry docs 1-2 — only restored
    // aggregation state can produce them (their file is already
    // committed and never replayed)
    shard("b.jsonl", Seq(doc(3, "delta delta alpha")))
    val q2 = start("oov_recov2")
    try {
      q2.processAllAvailable()
      val got = spark.table("oov_recov2")
        .select($"doc_id", $"n_tokens", $"n_oov")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 3L, 1L), (2L, 2L, 0L), (3L, 3L, 2L)),
        s"state not restored: $got")
    } finally { q2.stop(); vocab.unpersist() }
  }

  // ---- complete-mode aggregation-state streams on RocksDB (VERDICT r9
  // #6): the late-round-9 dashboard streams hold their entire report
  // state in the complete-mode aggregation — a restart must restore it
  // from the checkpoint (the committed first half is never replayed)
  // and the final overwritten report must equal the batch query over
  // ALL rows, bit-for-bit, with state on RocksDB + changelog.

  /** Two-phase restart harness: write half the rows as a parquet file
    * source, run the query to a hard stop, write the rest, restart
    * from the same checkpoint. `mkQuery(streamDf, ck, root)` builds
    * the started query; returns `root` so callers read the report.
    */
  private def runCompleteRecovery(src: org.apache.spark.sql.DataFrame)(
      mkQuery: (org.apache.spark.sql.DataFrame, String, String) =>
        org.apache.spark.sql.streaming.StreamingQuery): String = {
    val root = java.nio.file.Files.createTempDirectory("graftcmrec").toString
    val inDir = s"$root/in"; val ck = s"$root/ck"
    new java.io.File(inDir).mkdirs()
    val schema = src.schema
    val rows = src.collect()
    val (h1, h2) = rows.splitAt(rows.length / 2)
    def writeChunk(rs: Array[org.apache.spark.sql.Row], name: String): Unit =
      spark.createDataFrame(spark.sparkContext.parallelize(rs.toSeq, 1), schema)
        .write.parquet(s"$inDir/$name")
    def streamDf = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(inDir)
    writeChunk(h1, "chunk1")
    val q1 = mkQuery(streamDf, ck, root)
    try q1.processAllAvailable() finally q1.stop()
    writeChunk(h2, "chunk2")
    val q2 = mkQuery(streamDf, ck, root)
    try q2.processAllAvailable() finally q2.stop()
    root
  }

  test("corpusDriftStream restarts from checkpoint on RocksDB: (source, token) counts survive") {
    withConfs(Session.RocksDbStateStore) {
      import graft.textops.TextStats
      val docs = Tables.documents(spark, sf).select($"source", $"text")
      val root = runCompleteRecovery(docs) { (in, ck, root) =>
        TextStats.corpusDriftStream(in, s"$root/drift")
          .option("checkpointLocation", ck).start()
      }
      val got = spark.read.parquet(s"$root/drift")
        .as[(String, String, Long, Long, Long, Long)].collect().toSet
      val want = TextStats.corpusDrift(spark, sf)
        .as[(String, String, Long, Long, Long, Long)].collect().toSet
      assert(want.nonEmpty && got == want,
        "post-restart drift report diverged from batch — state not restored")
    }
  }

  test("mixturePlanStream restarts from checkpoint on RocksDB: source ledgers survive") {
    withConfs(Session.RocksDbStateStore) {
      import graft.textops.Sampling
      val docs = Tables.documents(spark, sf).select($"source", $"text")
      val root = runCompleteRecovery(docs) { (in, ck, root) =>
        Sampling.mixturePlanStream(in, s"$root/plan")
          .option("checkpointLocation", ck).start()
      }
      val cols = Seq("source", "n_docs", "src_tokens", "w_share", "epochs",
        "capped", "deficit_tokens")
      val got = spark.read.parquet(s"$root/plan").selectExpr(cols: _*)
        .as[(String, Long, Long, Double, Double, Boolean, Double)]
        .collect().toSet
      val want = Sampling.mixturePlan(spark, sf).selectExpr(cols: _*)
        .as[(String, Long, Long, Double, Double, Boolean, Double)]
        .collect().toSet
      assert(want.nonEmpty && got == want,
        "post-restart mixture ledger diverged from batch — state not restored")
    }
  }

  test("valueQuantilesStream restarts from checkpoint on RocksDB: bounded samples survive") {
    withConfs(Session.RocksDbStateStore) {
      import graft.analytics.RelationalAnalytics
      val evs = Tables.events(spark, sf)
        .select($"event_id", $"event_type", $"value")
      val root = runCompleteRecovery(evs) { (in, ck, root) =>
        RelationalAnalytics.valueQuantilesStream(in, s"$root/quantiles")
          .option("checkpointLocation", ck).start()
      }
      val cols = Seq("event_type", "n_sample", "p50", "p90")
      val got = spark.read.parquet(s"$root/quantiles").selectExpr(cols: _*)
        .as[(String, Long, Double, Double)].collect().toSet
      val want = RelationalAnalytics.valueQuantilesSketch(spark, sf)
        .selectExpr(cols: _*)
        .as[(String, Long, Double, Double)].collect().toSet
      assert(want.nonEmpty && got == want,
        "post-restart quantile report diverged from batch — state not restored")
    }
  }

  test("retentionKmvStream restarts from checkpoint on RocksDB: day sketches survive") {
    withConfs(Session.RocksDbStateStore) {
      import graft.analytics.UserBehaviorAnalytics
      val evs = Tables.events(spark, sf).select($"ts", $"user_id")
      val root = runCompleteRecovery(evs) { (in, ck, root) =>
        StreamingAnalytics.retentionKmvStream(in)
          .writeStream.outputMode("complete")
          .foreachBatch { (snap: org.apache.spark.sql.DataFrame, _: Long) =>
            UserBehaviorAnalytics.retentionKmvFinish(snap)
              .write.mode("overwrite").parquet(s"$root/retention")
          }
          .option("checkpointLocation", ck).start()
      }
      val cols = Seq("day", "day_next", "uv_a", "uv_b", "uv_union",
        "jaccard", "est_retained")
      val got = spark.read.parquet(s"$root/retention").selectExpr(cols: _*)
        .collect().toSeq.map(_.toSeq).toSet
      val want = UserBehaviorAnalytics.retentionKmv(spark, sf)
        .selectExpr(cols: _*).collect().toSeq.map(_.toSeq).toSet
      assert(want.nonEmpty && got == want,
        "post-restart retention report diverged from batch — sketches not restored")
    }
  }

  test("outlierGateStream replays an uncommitted batch idempotently after restart") {
    import graft.textops.{Pipelines, Similarity}
    val root = java.nio.file.Files.createTempDirectory("graftgrecov").toString
    val inDir = s"$root/in"; val ck = s"$root/ck"
    val resultDir = s"$root/results"; val protoDir = s"$root/protos"
    new java.io.File(inDir).mkdirs()
    Pipelines.materializeProtos(spark, sf, protoDir)
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "label", "cast(embedding as array<double>) as v")
      .cache()
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("label", IntegerType),
      StructField("v", ArrayType(DoubleType))))
    def start() = Pipelines.outlierGateStream(
        spark.readStream.schema(schema)
          .option("recursiveFileLookup", "true").parquet(inDir),
        protoDir, resultDir)
      .option("checkpointLocation", ck).start()

    // phase 1: half the corpus, process, hard stop
    vecs.where($"vec_id" % 2 === 0).write.parquet(s"$inDir/c1")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // simulate a crash AFTER the sink wrote batch 0 but BEFORE the
    // commit marker landed: drop the newest commit. On restart Spark
    // re-executes batch 0 over the same offsets with the same
    // batch_id — the dynamic partition overwrite must replace, not
    // duplicate, its output (the replay-idempotency contract every
    // foreachBatch serving stream in Pipelines claims)
    val commits = new java.io.File(s"$ck/commits").listFiles()
      .filter(_.getName.forall(_.isDigit))
    val newest = commits.sortBy(_.getName.toInt).last
    // the local-FS checksum shadow must go too, or the re-commit's
    // rename trips over it
    new java.io.File(newest.getParent, s".${newest.getName}.crc").delete()
    newest.delete()
    // phase 2: the other half arrives; restart replays batch 0 then
    // processes the new files
    vecs.where($"vec_id" % 2 === 1).write.parquet(s"$inDir/c2")
    val q2 = start()
    try q2.processAllAvailable() finally { q2.stop(); vecs.unpersist() }

    val got = spark.read.parquet(resultDir)
      .select($"vec_id", $"label", $"is_outlier")
    // no duplicated verdicts despite the replay…
    assert(got.count() === got.select($"vec_id").distinct().count())
    // …and the full-corpus verdict set matches the batch query
    val want = Similarity.embeddingOutliers(spark, sf)
      .select($"vec_id", $"label", $"is_outlier")
    assert(got.as[(Long, Int, Boolean)].collect().toSet ==
      want.as[(Long, Int, Boolean)].collect().toSet)
  }

  test("semanticDecontaminateStream replays an uncommitted batch idempotently after restart") {
    import graft.textops.{Pipelines, Similarity}
    val root = java.nio.file.Files.createTempDirectory("graftsdrecov").toString
    val inDir = s"$root/in"; val ck = s"$root/ck"
    val resultDir = s"$root/results"; val evalDir = s"$root/eval"
    new java.io.File(inDir).mkdirs()
    Pipelines.materializeEvalVecs(spark, sf, evalDir)
    val mod = Similarity.autoSampleMod(Tables.embeddings(spark, sf).count())
    val train = Tables.embeddings(spark, sf)
      .where(expr(s"vec_id % $mod <> 0"))
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .cache()
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("v", ArrayType(DoubleType))))
    def start() = Pipelines.semanticDecontaminateStream(
        spark.readStream.schema(schema)
          .option("recursiveFileLookup", "true").parquet(inDir),
        evalDir, resultDir)
      .option("checkpointLocation", ck).start()

    // phase 1: half the train side, process, crash before the commit
    train.where($"vec_id" % 2 === 0).write.parquet(s"$inDir/c1")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val commits = new java.io.File(s"$ck/commits").listFiles()
      .filter(_.getName.forall(_.isDigit))
    val newest = commits.sortBy(_.getName.toInt).last
    new java.io.File(newest.getParent, s".${newest.getName}.crc").delete()
    newest.delete()
    // phase 2: restart replays batch 0 (same batch_id → dynamic
    // partition overwrite replaces, not duplicates) then the new files
    train.where($"vec_id" % 2 === 1).write.parquet(s"$inDir/c2")
    val q2 = start()
    try q2.processAllAvailable() finally { q2.stop(); train.unpersist() }

    val got = spark.read.parquet(resultDir)
      .select($"train_id", $"eval_id", $"contaminated")
    assert(got.count() === got.select($"train_id").distinct().count())
    val want = Similarity.embeddingDecontamination(spark, sf)
      .select($"train_id", $"eval_id", $"contaminated")
    assert(got.as[(Long, Long, Boolean)].collect().toSet ==
      want.as[(Long, Long, Boolean)].collect().toSet)
  }

  test("LateCapture restarts from checkpoint: carried watermark restores from storage") {
    val root = java.nio.file.Files.createTempDirectory("graftlcr").toString
    val inDir = s"$root/in"
    new java.io.File(inDir).mkdirs()

    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts", TimestampType), StructField("user_id", LongType),
      StructField("event_type", StringType)))
    // ARRIVAL order (jitter applied), the order a real delivery feeds
    // the stream; chunk files = micro-batches via maxFilesPerTrigger=1
    val all = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type")
      .withColumn("arr",
        analytics.LateDataAnalytics.arrivalUs($"event_id", $"ts"))
      .orderBy($"arr", $"event_id").drop("arr").collect()
    def writeChunk(rows: Array[org.apache.spark.sql.Row], name: String): Unit =
      spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toSeq, 1), schema)
        .write.parquet(s"$inDir/$name")
    // a fresh LateCapture per start(): driver memory is empty after a
    // restart, so the carried max MUST come back from root/wm
    def start() = analytics.LateDataAnalytics.lateCaptureWriter(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .option("recursiveFileLookup", "true").parquet(inDir),
        s"$root/cap").start()

    val chunks = all.grouped(all.length / 4 + 1).toSeq
    // phase 1: two arrival segments, then hard stop
    writeChunk(chunks(0), "c0"); writeChunk(chunks(1), "c1")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // phase 2: restart (new capture instance), rest of the stream
    chunks.drop(2).zipWithIndex.foreach { case (c, i) => writeChunk(c, s"c${i + 2}") }
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val want = analytics.LateDataAnalytics.lateEvents(spark, sf)
      .select($"event_id", $"watermark")
      .as[(Long, java.sql.Timestamp)].collect().toSet
    val got = spark.read.parquet(s"$root/cap/late")
      .select($"event_id", $"watermark")
      .as[(Long, java.sql.Timestamp)].collect().toSet
    assert(got == want,
      "late capture across a restart must equal the batch side output")
    assert(spark.read.parquet(s"$root/cap/ontime").count() + got.size == all.length)
  }

  test("spanDedupStream restarts from checkpoint: stored span index carries the crawl forward") {
    // day-zero start, hard stop between micro-batches, restart from
    // the checkpoint: the second run's batches must judge against the
    // index rows the first run ingested, and the union must equal the
    // one-shot span_dedup (same arrival-order equivalence the parity
    // spec pins, now across a process-restart boundary).
    import graft.textops.{Dedup, Pipelines}
    val root = java.nio.file.Files.createTempDirectory("graftspanrecov").toString
    val inDir = s"$root/in"; val ck = s"$root/ck"
    new java.io.File(inDir).mkdirs()
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").orderBy($"doc_id").collect()
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def writeChunk(rows: Array[org.apache.spark.sql.Row], name: String): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), schema)
        .write.parquet(s"$inDir/$name")
    def start() = Pipelines.spanDedupStream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .option("recursiveFileLookup", "true").parquet(inDir),
        s"$root/idx", s"$root/clean")
      .option("checkpointLocation", ck).start()
    val chunks = docs.grouped(docs.length / 3 + 1).toSeq
    writeChunk(chunks(0), "c0"); writeChunk(chunks(1), "c1")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    chunks.drop(2).zipWithIndex.foreach { case (c, i) => writeChunk(c, s"c${i + 2}") }
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(s"$root/clean")
      .select($"doc_id", $"clean_text", $"n_spans", $"n_dropped")
      .as[(Long, String, Long, Long)].collect().toSet
    val want = Dedup.spanDedup(spark, sf)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(want.nonEmpty && got == want,
      "span crawl across a restart must equal the one-shot dedup")
  }

  // ---- BufferedEventProcessor state-machine paths on RocksDB
  // (VERDICT r8 #6, migrated to transformWithState in r13): the
  // windowed-agg / Top-N / LateCapture recovery above covers the
  // built-in stateful operators; these drive the custom state
  // machines (buffered out-of-order events + live NFA partials /
  // pending orders / day counters in ListState/ValueState, plus the
  // registered wake timers) through a mid-stream hard stop with state
  // on RocksDB + changelog checkpoints, then require the restarted
  // run to equal batch.

  /** Event rows in arrival order with a far-future flush sentinel of
    * the given kind (advances the watermark so buffered state drains
    * and event-time timers fire after the restart). */
  private lazy val evRows: Seq[(Long, Long, Long, String, String)] =
    Tables.events(spark, sf)
      .select($"event_id", unix_micros($"ts").as("ts_us"), $"user_id",
        $"event_type", $"props")
      .as[(Long, Long, Long, String, String)].collect().toSeq
      .sortBy(e => (e._2, e._1))

  private def runNfaRecovery[R](
      mkStream: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[R],
      rows: Seq[org.apache.spark.sql.Row], schema: StructType,
      flushRows: Seq[org.apache.spark.sql.Row]): org.apache.spark.sql.DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graftnfarecov").toString
    val inDir = s"$root/in"; val outDir = s"$root/out"; val ck = s"$root/ck"
    new java.io.File(inDir).mkdirs()
    def writeChunk(rs: Seq[org.apache.spark.sql.Row], name: String): Unit =
      spark.createDataFrame(spark.sparkContext.parallelize(rs, 1), schema)
        .write.parquet(s"$inDir/$name")
    def start() = mkStream(
        spark.readStream.schema(schema)
          .option("recursiveFileLookup", "true").parquet(inDir))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ck)
      .outputMode("append").start()
    // phase 1: first half, hard stop mid-stream (buffers + partials in
    // RocksDB state are all the restarted run gets)
    val (h1, h2) = rows.splitAt(rows.length / 2)
    writeChunk(h1, "chunk1")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // phase 2: restart from the checkpoint, rest + watermark flush
    writeChunk(h2, "chunk2")
    writeChunk(flushRows, "chunk3")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    spark.read.parquet(outDir)
  }

  test("loginFailPairs NFA restarts from checkpoint on RocksDB: == batch pairs") {
    implicit val ss = spark
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts_us", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType)))
    val rows = evRows.map(e =>
      org.apache.spark.sql.Row(e._1, e._2, e._3, e._4))
    val flushUs = evRows.map(_._2).max + 30L * 86400 * 1000000
    val out = withConfs(Session.RocksDbStateStore)(runNfaRecovery(
      (df: org.apache.spark.sql.DataFrame) =>
        StreamingAnalytics.loginFailPairs(df.as[StreamingAnalytics.Ev]),
      rows, schema,
      Seq(org.apache.spark.sql.Row(-1L, flushUs, -1L, "error"))))
    val got = out.where($"user_id" =!= -1L)
      .select($"user_id", $"first_fail_us", $"last_fail_us")
      .as[(Long, Long, Long)].collect().toSet
    val want = analytics.DetectionAnalytics.loginFailDetect(spark, sf)
      .select($"user_id", unix_micros($"first_fail"), unix_micros($"last_fail"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("rangeJoinStream stream-stream join state restarts on RocksDB: == batch range_join") {
    // the recovery matrix's last state class: symmetric stream-stream
    // JOIN state (both sides buffered in the state store). Pairs that
    // straddle the mid-stream hard stop can only come from the
    // restored RocksDB join buffers.
    implicit val ss = spark
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("event_type", StringType), StructField("ts_us", LongType)))
    val rows = evRows.sortBy(e => (e._2, e._1))
      .map(e => org.apache.spark.sql.Row(e._1, e._4, e._2))
    val flushUs = evRows.map(_._2).max + 30L * 86400 * 1000000
    val out = withConfs(Session.RocksDbStateStore)(runNfaRecovery(
      (df: org.apache.spark.sql.DataFrame) =>
        StreamingAnalytics.rangeJoinStream(
          df.withColumn("ts", expr("timestamp_micros(ts_us)"))),
      rows, schema,
      // a non-error far-future row advances both watermarks without
      // joining anything (event_type 'view' never builds a window and
      // sits 30 days from every probe bucket)
      Seq(org.apache.spark.sql.Row(-1L, "view", flushUs))))
    val got = out.where($"event_id" =!= -1L)
      .select($"err_id", $"event_id", $"offset_us")
      .as[(Long, Long, Long)].collect().toSet
    val want = analytics.DetectionAnalytics.rangeJoin(spark, sf)
      .select($"err_id", $"event_id", $"offset_us")
      .as[(Long, Long, Long)].collect().toSet
    assert(want.nonEmpty && got == want,
      "restored join state lost or duplicated cross-restart pairs")
  }

  test("orderTimeoutStream NFA restarts from checkpoint on RocksDB: == batch join") {
    implicit val ss = spark
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts_us", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType)))
    val rows = evRows.map(e =>
      org.apache.spark.sql.Row(e._1, e._2, e._3, e._4))
    val flushUs = evRows.map(_._2).max + 30L * 86400 * 1000000
    val out = withConfs(Session.RocksDbStateStore)(runNfaRecovery(
      (df: org.apache.spark.sql.DataFrame) =>
        StreamingAnalytics.orderTimeoutStream(df.as[StreamingAnalytics.Ev]),
      rows, schema,
      Seq(org.apache.spark.sql.Row(-1L, flushUs, -1L, "purchase"))))
    val got = out.where($"user_id" =!= -1L)
      .select($"order_id", $"user_id", $"create_us",
        coalesce($"pay_us", lit(-1L)), $"status")
      .as[(Long, Long, Long, Long, String)].collect().toSet
    val want = analytics.DetectionAnalytics.orderTimeout(spark, sf)
      .select($"order_id", $"user_id", unix_micros($"create_ts"),
        coalesce(unix_micros($"pay_ts"), lit(-1L)), $"status")
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(got == want)
  }

  test("blacklistStream NFA restarts from checkpoint on RocksDB: == batch warnings") {
    implicit val ss = spark
    def jsonK(props: String): Long =
      """"k":\s*(\d+)""".r.findFirstMatchIn(props)
        .map(_.group(1).toLong).getOrElse(0L)
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts_us", LongType), StructField("user_id", LongType),
      StructField("ad_id", IntegerType)))
    val clickRows = evRows.filter(_._4 == "click").map(e =>
      org.apache.spark.sql.Row(e._1, e._2, e._3, (jsonK(e._5) % 10).toInt))
    val flushUs = evRows.map(_._2).max + 30L * 86400 * 1000000
    val out = withConfs(Session.RocksDbStateStore)(runNfaRecovery(
      (df: org.apache.spark.sql.DataFrame) =>
        StreamingAnalytics.blacklistStream(df.as[StreamingAnalytics.ClickEv]),
      clickRows, schema,
      Seq(org.apache.spark.sql.Row(-1L, flushUs, -1L, 0))))
    val got = out.where($"user_id" =!= -1L)
      .select($"user_id", $"ad_id", (col("day_us") / 1000000).cast("long"))
      .as[(Long, Int, Long)].collect().toSet
    val want = analytics.MarketingAnalytics.blacklistUsers(spark, sf)
      .select($"user_id", $"ad_id",
        (unix_micros($"day".cast("timestamp")) / 1000000).cast("long"))
      .as[(Long, Int, Long)].collect().toSet
    assert(got == want)
  }
}
