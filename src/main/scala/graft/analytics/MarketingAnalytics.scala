package graft.analytics

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Marketing analytics over the `events` table.
  *
  * Re-expresses the reference's MarketAnalysis module (REF:
  * MarketAnalysis/src/main/scala/AppMarketingByChannel.scala
  * § MarketingCountByChannel, AppMarketing.scala § main,
  * AdStatisticsByGeo.scala § AdCountAgg/FilterBlackListUser —
  * reconstructed, see SURVEY.md §0).
  *
  * Proxies (SURVEY.md §7.1): channel := deterministic user-hash bucket
  * (the reference's SimulatedEventSource draws a random channel; our
  * testdata has none, so `'ch_' || user_id % 4` plays that column);
  * province := nation name joined on `user_id % 25` — a genuinely
  * broadcast-able dimension join (nation = 25 rows), which is the shape
  * the reference's per-province `keyBy` cannot express.
  */
object MarketingAnalytics {

  /** App-marketing counts by (channel, behavior) per sliding day window.
    * REF: AppMarketingByChannel.scala — 1-day windows (reference slides
    * 5 s; widened to 6 h so the grid is sane over a 30-day stream),
    * UNINSTALL filtered out (here: `event_type != 'error'`).
    * The reference counts with a non-incremental ProcessWindowFunction
    * buffering every element; Spark's HashAggregate is always
    * partial→final — strictly better at scale.
    */
  def marketingByChannel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .filter($"event_type" =!= "error")
      .select(
        concat(lit("ch_"), ($"user_id" % 4).cast("string")).as("channel"),
        $"event_type".as("behavior"), $"ts")
      .groupBy(window($"ts", "1 day", "6 hours").as("w"), $"channel", $"behavior")
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        $"channel", $"behavior", $"cnt")
      .orderBy($"window_end", $"channel", $"behavior")
  }

  /** Ad clicks by province per sliding hour window.
    * REF: AdStatisticsByGeo.scala § AdCountAgg/AdCountResult — 1-hour
    * windows sliding 15 min (reference slides 5 s). Province comes from
    * the 25-row `nation` dim via broadcast hash join (no shuffle of the
    * fact side; Catalyst auto-broadcasts under the 10 MB threshold).
    */
  def adStatsByProvince(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val clicks = Tables.events(spark, sfDir)
      .filter($"event_type" === "click")
      .select(($"user_id" % 25).cast("int").as("nk"), $"ts")
    val nation = Tables.nation(spark, sfDir)
      .select($"n_nationkey".as("nk"), $"n_name".as("province"))
    clicks.join(broadcast(nation), "nk")
      .groupBy(window($"ts", "1 hour", "15 minutes").as("w"), $"province")
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.end").as("window_end"), $"province", $"cnt")
      .orderBy($"window_end", $"province")
  }

  /** Click-fraud blacklist: users whose clicks on one ad exceed a daily
    * threshold. REF: AdStatisticsByGeo.scala § FilterBlackListUser —
    * ValueState counter + midnight-reset timer per (user, ad). In batch
    * the midnight reset is just `date_trunc('day', ts)` in the grouping
    * key; the warning side-output becomes a HAVING filter. Threshold 2
    * (reference: 100) sized to the synthetic data's click density.
    */
  def blacklistUsers(spark: SparkSession, sfDir: String, threshold: Long = 2): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .filter($"event_type" === "click")
      .select($"user_id",
        (get_json_object($"props", "$.k").cast("int") % 10).as("ad_id"),
        to_date($"ts").as("day"))
      .groupBy($"user_id", $"ad_id", $"day")
      .agg(count(lit(1)).as("click_cnt"))
      .filter($"click_cnt" >= threshold)
      .withColumn("msg", concat(lit("click over "), lit(threshold), lit(" times today")))
      .select($"user_id", $"ad_id", $"day", $"click_cnt", $"msg")
      .orderBy($"user_id", $"ad_id", $"day")
  }

  /** The clean click stream with blacklisted (user, ad, day) triples
    * removed — the reference's main output after the filter; expressed
    * as a left_anti join back onto the warning set (SURVEY.md §2.7).
    */
  def blacklistFilteredClicks(spark: SparkSession, sfDir: String, threshold: Long = 2): DataFrame = {
    import spark.implicits._
    val clicks = Tables.events(spark, sfDir)
      .filter($"event_type" === "click")
      .select($"event_id", $"user_id",
        (get_json_object($"props", "$.k").cast("int") % 10).as("ad_id"),
        to_date($"ts").as("day"))
    val black = blacklistUsers(spark, sfDir, threshold)
      .select($"user_id", $"ad_id", $"day")
    clicks.join(black, Seq("user_id", "ad_id", "day"), "left_anti")
      .select($"event_id", $"user_id", $"ad_id")
      .orderBy($"event_id")
  }
}
