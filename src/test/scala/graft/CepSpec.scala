package graft

import graft.analytics.DetectionAnalytics
import graft.cep.{Pattern, PatternEv, Step}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Generic CEP pattern compiler (graft.cep.Pattern): strict-next NFA
  * semantics pinned three ways — against the hand-written lag query it
  * generalizes, on a tiny hand-checked sequence, and stream == batch
  * parity for the 3-step funnel.
  */
class CepSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val sf = SparkTestBase.sf

  import spark.implicits._

  /** Far-future zero-mask event: advances the watermark so the NFA's
    * event-time buffer drains (the Flink-CEP ordering semantics — see
    * Pattern.compileStream); mask 0 starts nothing, key −1 is filtered.
    */
  private def flushEv(afterUs: Long) =
    PatternEv(-1L, afterUs + 40L * 86400 * 1000000, -1L, 0L)

  test("times(2) quantifier over error stream == loginFailDetect lag pairs") {
    // Flink's begin("fail").times(2): one quantified step, expanded to 2
    val p = Pattern(Seq(Step("fail", lit(true), times = 2)),
      withinUs = 30L * 60 * 1000000)
    val errors = Tables.events(spark, sf).filter($"event_type" === "error")
    val got = p.compileBatch(errors, $"user_id", $"ts", $"event_id")
      .select($"key", $"start_ts", $"end_ts")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
    val want = DetectionAnalytics.loginFailDetect(spark, sf)
      .select($"user_id", $"first_fail", $"last_fail")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
    assert(got == want)
  }

  test("strict contiguity on a hand-checked sequence (batch and stream agree)") {
    // key 1: err(t=1) err(2) view(3) err(4) err(5)  → matches (1,2), (4,5)
    //        — (2,·) killed by the view, overlap (1,2)/(2,·) allowed
    // key 2: err(10) err(90) with within=60s       → killed by the bound
    val us = 1000000L
    val evs = Seq(
      (1L, 1 * us, 101L, "error"), (1L, 2 * us, 102L, "error"),
      (1L, 3 * us, 103L, "view"), (1L, 4 * us, 104L, "error"),
      (1L, 5 * us, 105L, "error"),
      (2L, 10 * us, 201L, "error"), (2L, 90 * us, 202L, "error"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
    val p = Pattern(Seq(
      Step("a", $"event_type" === "error"),
      Step("b", $"event_type" === "error")), withinUs = 60 * us)
    val got = p.compileBatch(evs, $"user_id", $"ts", $"event_id")
      .select($"key", $"start_event", $"end_event")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 101L, 102L), (1L, 104L, 105L)))

    implicit val ss = spark
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[PatternEv]
    val q = p.compileStream(ms.toDS(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("cep_tiny")
      .outputMode("append").start()
    try {
      ms.addData(p.toPatternEvents(evs, $"user_id", $"ts_us", $"event_id").collect().toSeq)
      q.processAllAvailable()
      ms.addData(flushEv(90 * us)); q.processAllAvailable()
      val sgot = spark.table("cep_tiny")
        .select($"key", $"start_ord", $"end_ord")
        .as[(Long, Long, Long)].collect().toSet
      assert(sgot == Set((1L, 101L, 102L), (1L, 104L, 105L)))
    } finally q.stop()
  }

  test("relaxed (followedBy) on a hand-checked sequence: skips non-matches, binds earliest, honors within") {
    val us = 1000000L
    // key 1: s(1) x(2) p(3) p(4) x(5) c(6) → one match (1,6): binds the
    //        EARLIEST p (t=3), skips x's; second p never starts a chain step
    // key 2: s(10) p(20) c(90) with within=60 → c too late, no match
    val evs = Seq(
      (1L, 1 * us, 101L, "signup"), (1L, 2 * us, 102L, "view"),
      (1L, 3 * us, 103L, "purchase"), (1L, 4 * us, 104L, "purchase"),
      (1L, 5 * us, 105L, "view"), (1L, 6 * us, 106L, "click"),
      (2L, 10 * us, 201L, "signup"), (2L, 20 * us, 202L, "purchase"),
      (2L, 90 * us, 203L, "click"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
    val p = graft.cep.Pattern(Seq(
      Step("s", $"event_type" === "signup"),
      Step("p", $"event_type" === "purchase"),
      Step("c", $"event_type" === "click")), withinUs = 60 * us, strict = false)
    val got = p.compileBatch(evs, $"user_id", $"ts", $"event_id")
      .select($"key", $"start_event", $"end_event")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 101L, 106L)))

    implicit val ss = spark
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[PatternEv]
    val q = p.compileStream(ms.toDS(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("cep_relaxed_tiny")
      .outputMode("append").start()
    try {
      ms.addData(p.toPatternEvents(evs, $"user_id", $"ts_us", $"event_id").collect().toSeq)
      q.processAllAvailable()
      ms.addData(flushEv(90 * us)); q.processAllAvailable()
      val sgot = spark.table("cep_relaxed_tiny")
        .select($"key", $"start_ord", $"end_ord")
        .as[(Long, Long, Long)].collect().toSet
      assert(sgot == Set((1L, 101L, 106L)))
    } finally q.stop()
  }

  test("relaxed funnel NFA stream == asof-chain batch on sf0.001") {
    implicit val ss = spark
    implicit val ctx = spark.sqlContext
    val p = DetectionAnalytics.relaxedFunnelPattern
    val rows = p.toPatternEvents(Tables.events(spark, sf),
        $"user_id", unix_micros($"ts"), $"event_id")
      .collect().toSeq.sortBy(e => (e.ts_us, e.ord))
    val ms = MemoryStream[PatternEv]
    val q = p.compileStream(ms.toDS())
      .writeStream.format("memory").queryName("cep_relaxed_stream")
      .outputMode("append").start()
    try {
      val (b1, b2) = rows.splitAt(rows.size / 2)
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      ms.addData(flushEv(rows.map(_.ts_us).max)); q.processAllAvailable()
      val got = spark.table("cep_relaxed_stream")
        .where($"key" =!= -1L)
        .select($"key", $"start_ord", $"end_ord")
        .as[(Long, Long, Long)].collect().toSet
      val want = DetectionAnalytics.cepFunnelRelaxed(spark, sf)
        .select($"user_id", $"start_event", $"end_event")
        .as[(Long, Long, Long)].collect().toSet
      assert(want.nonEmpty && got == want)
    } finally q.stop()
  }

  test("funnel NFA stream == compiled batch on sf0.001 (split across micro-batches)") {
    implicit val ss = spark
    implicit val ctx = spark.sqlContext
    val p = DetectionAnalytics.funnelPattern
    val rows = p.toPatternEvents(Tables.events(spark, sf),
        $"user_id", unix_micros($"ts"), $"event_id")
      .collect().toSeq.sortBy(e => (e.ts_us, e.ord))
    val ms = MemoryStream[PatternEv]
    val q = p.compileStream(ms.toDS())
      .writeStream.format("memory").queryName("cep_funnel_stream")
      .outputMode("append").start()
    try {
      // two micro-batches: partial matches must survive the batch boundary
      val (b1, b2) = rows.splitAt(rows.size / 2)
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      ms.addData(flushEv(rows.map(_.ts_us).max)); q.processAllAvailable()
      val got = spark.table("cep_funnel_stream")
        .where($"key" =!= -1L)
        .select($"key", $"start_ord", $"end_ord")
        .as[(Long, Long, Long)].collect().toSet
      val want = DetectionAnalytics.cepFunnel(spark, sf)
        .select($"user_id", $"start_event", $"end_event")
        .as[(Long, Long, Long)].collect().toSet
      assert(want.nonEmpty && got == want)
    } finally q.stop()
  }

  test("absence (notFollowedBy) stream == batch forward-asof on sf0.001") {
    implicit val ss = spark
    implicit val ctx = spark.sqlContext
    val p = DetectionAnalytics.absencePattern
    val rows = p.toPatternEvents(Tables.events(spark, sf),
        $"user_id", unix_micros($"ts"), $"event_id")
      .collect().toSeq.sortBy(e => (e.ts_us, e.ord))
    val ms = MemoryStream[PatternEv]
    val q = p.compileStreamAbsence(ms.toDS())
      .writeStream.format("memory").queryName("cep_absence_stream")
      .outputMode("append").start()
    try {
      val (b1, b2) = rows.splitAt(rows.size / 2)
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      ms.addData(flushEv(rows.map(_.ts_us).max)); q.processAllAvailable()
      val got = spark.table("cep_absence_stream")
        .where($"key" =!= -1L)
        .select($"key", $"start_ord")
        .as[(Long, Long)].collect().toSet
      val want = DetectionAnalytics.cepAbsence(spark, sf)
        .select($"user_id", $"event")
        .as[(Long, Long)].collect().toSet
      assert(want.nonEmpty && got == want)
    } finally q.stop()
  }

  test("NFA buffers out-of-order arrivals: shuffled micro-batches == batch compile") {
    implicit val ss = spark
    implicit val ctx = spark.sqlContext
    val p = DetectionAnalytics.funnelPattern
    val rows = p.toPatternEvents(Tables.events(spark, sf),
        $"user_id", unix_micros($"ts"), $"event_id")
      .collect().toSeq
    // deterministic shuffle WITHIN each batch (arrival order ≠ event
    // time); batches still advance in time so the 1 h watermark admits
    // every row (bounded out-of-orderness, like a multi-partition
    // ingest)
    val sorted = rows.sortBy(e => (e.ts_us, e.ord))
    val batches = sorted.grouped(math.max(sorted.size / 5, 1)).toSeq
      .map(b => new scala.util.Random(42).shuffle(b))
    val ms = MemoryStream[PatternEv]
    val q = p.compileStream(ms.toDS())
      .writeStream.format("memory").queryName("cep_ooo_stream")
      .outputMode("append").start()
    try {
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      ms.addData(flushEv(rows.map(_.ts_us).max)); q.processAllAvailable()
      val got = spark.table("cep_ooo_stream")
        .where($"key" =!= -1L)
        .select($"key", $"start_ord", $"end_ord")
        .as[(Long, Long, Long)].collect().toSet
      val want = DetectionAnalytics.cepFunnel(spark, sf)
        .select($"user_id", $"start_event", $"end_event")
        .as[(Long, Long, Long)].collect().toSet
      assert(want.nonEmpty && got == want)
    } finally q.stop()
  }

  test("consecutiveRunsStream: event-closed runs == batch cep_bursts") {
    implicit val s = spark
    implicit val ctx = spark.sqlContext
    val p = Pattern(Seq(Step("err", $"event_type" === "error")),
      withinUs = 24L * 3600 * 1000000)
    val rows = p.toPatternEvents(Tables.events(spark, sf),
      $"user_id", unix_micros($"ts"), $"event_id").collect().toSeq
      .sortBy(e => (e.ts_us, e.ord))
    val maxUs = rows.map(_.ts_us).max
    // one non-matching event per key AFTER the data closes every open
    // run by EVENT (batch semantics); the far-future flush then drains
    val closers = rows.map(_.key).distinct
      .map(k => PatternEv(k, maxUs + 3600L * 1000000, -900L - k, 0L))
    val ms = MemoryStream[PatternEv]
    val q = Pattern.consecutiveRunsStream(ms.toDS(), minTimes = 2,
        withinUs = 24L * 3600 * 1000000)
      .writeStream.format("memory").queryName("runs_stream")
      .outputMode("append").start()
    try {
      val (b1, b2) = rows.splitAt(rows.size / 2)
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      ms.addData(closers); q.processAllAvailable()
      ms.addData(flushEv(maxUs)); q.processAllAvailable()
      val got = spark.table("runs_stream")
        .where($"key" =!= -1L)
        .select($"key", $"start_ord", $"end_ord")
        .as[(Long, Long, Long)].collect().toSet
      val want = DetectionAnalytics.cepBursts(spark, sf)
        .select($"user_id", $"start_event", $"end_event")
        .as[(Long, Long, Long)].collect().toSet
      assert(want.nonEmpty && got == want)
    } finally q.stop()
  }

  test("consecutiveRunsStream: silence timeout closes and emits an open run") {
    implicit val s = spark
    implicit val ctx = spark.sqlContext
    val us = 1000000L
    val ms = MemoryStream[PatternEv]
    val q = Pattern.consecutiveRunsStream(ms.toDS(), minTimes = 2,
        withinUs = 60 * us, watermark = "0 seconds")
      .writeStream.format("memory").queryName("runs_timeout")
      .outputMode("append").start()
    try {
      ms.addData(Seq(PatternEv(1L, 1 * us, 101L, 1L),
        PatternEv(1L, 2 * us, 102L, 1L)))
      q.processAllAvailable()
      // no closing event for key 1 — only the watermark moves on
      ms.addData(flushEv(2 * us)); q.processAllAvailable()
      ms.addData(flushEv(50L * 86400 * 1000000)); q.processAllAvailable()
      val got = spark.table("runs_timeout")
        .where($"key" === 1L)
        .select($"start_ord", $"end_ord").as[(Long, Long)].collect().toSet
      assert(got == Set((101L, 102L)))
    } finally q.stop()
  }

  test("consecutiveRunsStream: over-span island emits only its prefix, never later segments") {
    // errors at 0 and 1h, silence, errors at 30h and 31h, break at 32h.
    // Batch: ONE island spanning 31h > within(24h) → nothing. Stream:
    // the documented prefix (0, 1h) at silence-close; the dead-island
    // mark must swallow the 30h/31h continuation (no second row).
    implicit val s = spark
    implicit val ctx = spark.sqlContext
    val h = 3600L * 1000000
    val ms = MemoryStream[PatternEv]
    val q = Pattern.consecutiveRunsStream(ms.toDS(), minTimes = 2,
        withinUs = 24 * h, watermark = "0 seconds")
      .writeStream.format("memory").queryName("runs_dead")
      .outputMode("append").start()
    try {
      // start at 1h, not 0: an event AT the initial watermark (ts=0)
      // is dropped by the strict late filter
      ms.addData(Seq(PatternEv(1L, 1 * h, 101L, 1L), PatternEv(1L, 2 * h, 102L, 1L)))
      q.processAllAvailable()
      // advance wm past 2h+24h → silence-close fires, island marked dead
      ms.addData(flushEv(3 * h)); q.processAllAvailable()
      ms.addData(Seq(PatternEv(1L, 31 * h, 103L, 1L), PatternEv(1L, 32 * h, 104L, 1L),
        PatternEv(1L, 33 * h, 105L, 0L)))
      q.processAllAvailable()
      ms.addData(flushEv(80L * 86400 * 1000000)); q.processAllAvailable()
      val got = spark.table("runs_dead")
        .where($"key" === 1L)
        .select($"start_ord", $"end_ord").as[(Long, Long)].collect().toSet
      assert(got == Set((101L, 102L)), s"expected prefix only, got $got")
    } finally q.stop()
  }

  test("consecutiveRuns: bursts are maximal and internally all-matching") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sf)
    val bursts = DetectionAnalytics.cepBursts(spark, sf).cache()
    assert(bursts.count() > 0)
    // neighbors just outside each burst must be non-error (maximality):
    // tag every event with its prev/next event_type in the key's stream
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val tagged = ev.select($"user_id", $"event_id", $"ts", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .withColumn("next_type", lead($"event_type", 1).over(w))
    val startViolations = bursts.join(tagged,
        bursts("user_id") === tagged("user_id") &&
          bursts("start_event") === tagged("event_id"))
      .where($"prev_type" === "error").count()
    val endViolations = bursts.join(tagged,
        bursts("user_id") === tagged("user_id") &&
          bursts("end_event") === tagged("event_id"))
      .where($"next_type" === "error").count()
    assert(startViolations == 0 && endViolations == 0)
    // every burst's span holds >= `times` error events and no others
    val spans = bursts.as("b").join(ev.as("e"),
        col("b.user_id") === col("e.user_id") &&
          col("e.ts") >= col("b.start_ts") && col("e.ts") <= col("b.end_ts"))
      .groupBy(col("b.user_id"), col("b.start_event"), col("b.times"))
      .agg(count(when(col("e.event_type") === "error", 1)).as("errs"),
        count(when(col("e.event_type") =!= "error", 1)).as("others"))
    assert(spans.where($"errs" =!= $"times" || $"others" =!= 0L).isEmpty)
    bursts.unpersist()
  }
}
