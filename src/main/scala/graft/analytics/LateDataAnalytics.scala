package graft.analytics

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Late-data surface — the batch-exact form of Flink's
  * `allowedLateness` / `sideOutputLateData` (T3/T4).
  *
  * REF: NetworkFlow.scala § main —
  * `.assignTimestampsAndWatermarks(BoundedOutOfOrdernessTimestampExtractor)`
  * `.allowedLateness(Time.minutes(1)).sideOutputLateData(OutputTag("late"))`
  * (reconstructed, SURVEY.md §0/§2.4). Flink re-fires windows for rows
  * that arrive after the watermark but within the lateness bound, and
  * diverts rows beyond it to a side output.
  *
  * Structured Streaming has no re-fire-with-side-output; the batch
  * re-expression makes the semantics EXACT instead: replay the arrival
  * order, carry the running watermark, and split every row into
  * on-time vs late against it.
  *
  * Arrival model (the data is stored in event-time order, so arrival
  * order must be modeled): each event's delivery is delayed by a
  * deterministic per-event network jitter,
  * `arrival = ts + (event_id * 2654435761) % 600 seconds`
  * (Knuth multiplicative hash — portable arithmetic, identical in
  * DuckDB). This is exactly the bounded-out-of-orderness model the
  * reference's `BoundedOutOfOrdernessTimestampExtractor(Time.seconds(1))`
  * assumes: jitter ≤ 10 min, watermark trails max-seen-ts by
  * [[Lateness]].
  *
  * Scale shape: the running max over arrival order is a prefix
  * aggregate — inherently sequential if computed in one window. It is
  * computed two-level instead: per arrival-day block, a running max
  * partitioned BY block (parallel across blocks), combined with the
  * cumulative max of prior blocks (computed on the tiny per-block
  * aggregate — one row per day, broadcast back). At 100 TB the block
  * granularity drops to an hour; the per-block aggregate stays
  * thousands of rows.
  */
object LateDataAnalytics {

  /** Knuth multiplicative hash constant — jitter = (id * Mult) % ModSec. */
  private val JitterMult = 2654435761L
  private val JitterModSec = 600L
  private val BlockUs = 86400L * 1000000 // 1 arrival-day blocks
  val Lateness = "5 minutes"

  /** Events + `wm` (the running watermark max-ts over all PRIOR
    * arrivals, before subtracting the lateness bound) + `late` flag.
    */
  def withArrivalWatermark(events: DataFrame, lateness: String = Lateness): DataFrame = {
    val arr = events.withColumn("arrival_us",
      expr(s"unix_micros(ts) + ((event_id * $JitterMult) % $JitterModSec) * 1000000"))
      // integer div — epoch-µs exceeds double's exact-int range (Tables)
      .withColumn("blk", expr(s"arrival_us div $BlockUs"))
    // level 1: running max within each arrival-day block (parallel)
    val inBlock = Window.partitionBy(col("blk"))
      .orderBy(col("arrival_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // level 2: cumulative max across the tiny per-block aggregate
    val perBlock = arr.groupBy(col("blk")).agg(max(col("ts")).as("bmax"))
      .withColumn("prev_bmax", max(col("bmax")).over(
        Window.orderBy(col("blk")).rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("blk"), col("prev_bmax"))
    arr
      .withColumn("in_blk_max", max(col("ts")).over(inBlock))
      .join(broadcast(perBlock), Seq("blk"))
      .withColumn("wm", greatest(col("in_blk_max"), col("prev_bmax")))
      .withColumn("late",
        coalesce(col("ts") < col("wm") - expr(s"interval $lateness"), lit(false)))
      .drop("arrival_us", "blk", "in_blk_max", "prev_bmax")
  }

  /** T4: the late side output itself — rows whose event time is more
    * than [[Lateness]] behind the watermark at their arrival.
    */
  def lateEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    withArrivalWatermark(Tables.events(spark, sfDir))
      .filter($"late")
      .select($"event_id", $"user_id", $"event_type", $"ts", $"wm".as("watermark"))
      .orderBy($"event_id")
  }

  /** T3: hot-pages counts split on-time vs late per tumbling window —
    * `cnt_late` is exactly what an `allowedLateness` re-fire would have
    * added to each window after its first emission.
    */
  def hotPagesLateSplit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    withArrivalWatermark(Tables.events(spark, sfDir))
      .filter($"event_type" === "click")
      .select(UserBehaviorAnalytics.pageUrl($"props").as("url"), $"ts", $"late")
      .groupBy(window($"ts", "10 minutes").getField("end").as("window_end"), $"url")
      .agg(count(when(!$"late", 1)).as("cnt_ontime"),
        count(when($"late", 1)).as("cnt_late"))
      .orderBy($"window_end", $"url")
  }

  /** Shared oracle CTE: arrival jitter + single-window running max
    * (the oracle replays sequentially; only the Spark side needs the
    * two-level parallel form).
    */
  private val oracleRm =
    s"""arr AS (
       |  SELECT event_id, user_id, event_type, ts, props,
       |         epoch_us(ts) + ((event_id * $JitterMult) % $JitterModSec) * 1000000 AS arrival_us
       |  FROM events
       |), rm AS (
       |  SELECT *, max(ts) OVER (ORDER BY arrival_us, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
       |  FROM arr
       |)""".stripMargin

  val lateEventsOracle: String =
    s"""WITH $oracleRm
       |SELECT event_id, user_id, event_type, ts, wm AS watermark
       |FROM rm WHERE ts < wm - INTERVAL 5 MINUTE
       |ORDER BY event_id""".stripMargin

  val hotPagesLateSplitOracle: String =
    s"""WITH $oracleRm, clicks AS (
       |  SELECT '/page/' || json_extract_string(props, '$$.k') AS url, ts,
       |         coalesce(ts < wm - INTERVAL 5 MINUTE, false) AS late
       |  FROM rm WHERE event_type = 'click'
       |)
       |SELECT time_bucket(INTERVAL 10 MINUTE, ts) + INTERVAL 10 MINUTE AS window_end,
       |       url,
       |       count(*) FILTER (WHERE NOT late) AS cnt_ontime,
       |       count(*) FILTER (WHERE late) AS cnt_late
       |FROM clicks GROUP BY 1, 2 ORDER BY window_end, url""".stripMargin
}
