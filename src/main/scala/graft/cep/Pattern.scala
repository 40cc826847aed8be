package graft.cep

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One pattern step: a name and a Catalyst predicate over the event row. */
case class Step(name: String, pred: Column)

/** A typed event for the streaming NFA: `mask` bit i = step i's
  * predicate held on this event (predicates are evaluated by Catalyst
  * BEFORE the state machine, so the NFA itself is engine-codegen-free
  * boolean logic).
  */
case class PatternEv(key: Long, ts_us: Long, ord: Long, mask: Long)

case class PatternMatch(key: Long, start_us: Long, start_ord: Long,
                        end_us: Long, end_ord: Long)

/** Generic CEP surface — the reusable form of the reference's
  * `Pattern.begin(...).next(...).within(...)` (REF:
  * LoginFailWithCep.scala § Pattern.begin("firstFail").next("secondFail")
  * .within(Time.seconds(2)); OrderTimeout.scala § begin("create")
  * .followedBy("pay") — reconstructed, SURVEY.md §0). Strict contiguity
  * (Flink `next`): step i+1 must match the key's IMMEDIATELY next
  * event; a non-matching event kills the partial match, exactly like
  * Flink's strict NFA edge. Matches may overlap (every event can start
  * a new partial), matching Flink's default after-match skip.
  *
  * Two compilers, one semantics:
  *   - [[compileBatch]]: per-key lag windows — k-1 lagged step flags +
  *     a lagged start timestamp, filtered in one pass. Partitioned by
  *     key, so the plan is a single per-key sort — no driver loop, no
  *     state, scales with key cardinality.
  *   - [[compileStream]]: `flatMapGroupsWithState` NFA holding the live
  *     partial matches per key, GC'd by event-time timeout once the
  *     watermark passes `start + within` (the reference's pattern
  *     timeout timer).
  *
  * The login-fail (L3) and order-timeout (O1) queries are 2-step
  * instances; `cep_funnel` in SparkEntry is the 3-step
  * view→click→purchase instance, hash-verified against a DuckDB lag
  * oracle.
  */
case class Pattern(steps: Seq[Step], withinUs: Long) {
  require(steps.nonEmpty, "pattern needs at least one step")
  private val k = steps.size

  /** Batch compile: events + (key, ts, ord) → one row per complete
    * match with columns (key, start_event, start_ts, end_event, end_ts).
    * `ord` breaks event-time ties deterministically (event id).
    */
  def compileBatch(events: DataFrame, key: Column, ts: Column, ord: Column): DataFrame = {
    val base = events.select(
      (Seq(key.as("key"), ts.as("ts"), ord.as("ord")) ++
        steps.zipWithIndex.map { case (s, i) => s.pred.cast("boolean").as(s"_m$i") }): _*)
    val w = Window.partitionBy(col("key")).orderBy(col("ts"), col("ord"))
    // anchor at the LAST event of the candidate match; lag each earlier
    // step's flag into place (all lags share one window spec → a single
    // per-key sort in the plan)
    var df = base
    for (i <- 0 until k - 1)
      df = df.withColumn(s"_l$i", lag(col(s"_m$i"), k - 1 - i).over(w))
    df = df
      .withColumn("start_ts", if (k == 1) col("ts") else lag(col("ts"), k - 1).over(w))
      .withColumn("start_ord", if (k == 1) col("ord") else lag(col("ord"), k - 1).over(w))
    val cond = (0 until k - 1).map(i => col(s"_l$i"))
      .foldLeft(col(s"_m${k - 1}"))(_ && _)
    df.filter(cond &&
        unix_micros(col("ts")) - unix_micros(col("start_ts")) <= withinUs)
      .select(col("key"), col("start_ord").as("start_event"), col("start_ts"),
        col("ord").as("end_event"), col("ts").as("end_ts"))
  }

  /** Evaluate the step predicates into the [[PatternEv]] mask (Catalyst
    * does the predicate work; the NFA sees only booleans).
    */
  def toPatternEvents(events: DataFrame, key: Column, tsUs: Column, ord: Column)
                     (implicit spark: SparkSession): Dataset[PatternEv] = {
    import spark.implicits._
    val mask = steps.zipWithIndex
      .map { case (s, i) => when(s.pred, lit(1L << i)).otherwise(lit(0L)) }
      .reduce(_ + _)
    events.select(key.cast("long").as("key"), tsUs.cast("long").as("ts_us"),
      ord.cast("long").as("ord"), mask.as("mask")).as[PatternEv]
  }

  /** Streaming compile: the per-key NFA. Partial matches carry
    * (step reached, start ts, start ord); strict contiguity means every
    * event either advances or kills each partial. State is bounded by
    * the event-time timeout at the earliest `start + within`.
    */
  def compileStream(events: Dataset[PatternEv], watermark: String = "1 hour")
                   (implicit spark: SparkSession): Dataset[PatternMatch] = {
    import spark.implicits._
    val kk = k
    val win = withinUs
    events
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withWatermark("ts", watermark)
      .as[(Long, Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[(Int, Long, Long)], PatternMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state: GroupState[List[(Int, Long, Long)]]) =>
          if (state.hasTimedOut) {
            // only partials past their deadline are dead; keep the rest
            val wmUs = state.getCurrentWatermarkMs() * 1000
            val live = state.getOption.getOrElse(Nil)
              .filter { case (_, s, _) => s + win >= wmUs }
            if (live.isEmpty) state.remove()
            else {
              state.update(live)
              state.setTimeoutTimestamp((live.map(_._2).min + win) / 1000 + 1)
            }
            Iterator.empty
          } else {
            var partials = state.getOption.getOrElse(Nil)
            val out = scala.collection.mutable.ListBuffer.empty[PatternMatch]
            for (e <- it.toSeq.sortBy(x => (x._2, x._3))) {
              val (ts, ord, mask) = (e._2, e._3, e._4)
              def bit(i: Int) = ((mask >> i) & 1L) == 1L
              val advanced = partials.flatMap { case (j, s, so) =>
                if (bit(j + 1) && ts - s <= win) {
                  if (j + 2 == kk) { out += PatternMatch(key, s, so, ts, ord); None }
                  else Some((j + 1, s, so))
                } else None // strict contiguity: non-match kills the partial
              }
              val started =
                if (!bit(0)) Nil
                else if (kk == 1) { out += PatternMatch(key, ts, ord, ts, ord); Nil }
                else List((0, ts, ord))
              partials = advanced ++ started
            }
            if (partials.isEmpty) state.remove()
            else {
              state.update(partials)
              state.setTimeoutTimestamp((partials.map(_._2).min + win) / 1000 + 1)
            }
            out.iterator
          }
      }
  }
}
