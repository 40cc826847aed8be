package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed CSV sources for the reference's six input datasets (S1).
  *
  * The reference reads each file with `env.readTextFile(path)` +
  * hand-written `split(",")/trim/toLong` maps (REF: HotItems.scala,
  * NetworkFlow.scala, AdStatisticsByGeo.scala, LoginFail.scala,
  * OrderTimeout.scala, TxMatch.scala § main — reconstructed,
  * SURVEY.md §0/§5.1). Here each is `spark.read.schema(...).csv` —
  * schema-on-read with explicit types, so malformed rows become nulls
  * (PERMISSIVE) instead of task-killing exceptions, and the parse is
  * codegen'd column casts instead of per-record string splits.
  *
  * A user of the reference can point these at the original
  * UserBehavior.csv / apache.log / AdClickLog.csv / LoginLog.csv /
  * OrderLog.csv / ReceiptLog.csv files unchanged.
  */
object CsvSources {

  // reference record types, verbatim field shapes (SURVEY.md §1.2)
  case class UserBehavior(userId: Long, itemId: Long, categoryId: Int,
                          behavior: String, timestamp: Long)
  case class ApacheLogEvent(ip: String, userId: String, eventTime: Long,
                            method: String, url: String)
  case class AdClickLog(userId: Long, adId: Long, province: String,
                        city: String, timestamp: Long)
  case class LoginEvent(userId: Long, ip: String, eventType: String,
                        eventTime: Long)
  case class OrderEvent(orderId: Long, eventType: String, txId: String,
                        eventTime: Long)
  case class ReceiptEvent(txId: String, payChannel: String, timestamp: Long)

  def userBehavior(spark: SparkSession, path: String): Dataset[UserBehavior] = {
    import spark.implicits._
    spark.read.schema(
        "userId LONG, itemId LONG, categoryId INT, behavior STRING, timestamp LONG")
      .csv(path).as[UserBehavior]
  }

  /** apache.log: space-separated, event time as dd/MM/yyyy:HH:mm:ss
    * (REF: NetworkFlow.scala § main uses SimpleDateFormat; here
    * `to_timestamp` + epoch-millis cast — same value).
    */
  def apacheLog(spark: SparkSession, path: String): Dataset[ApacheLogEvent] = {
    import spark.implicits._
    spark.read.option("sep", " ")
      .schema("ip STRING, userId STRING, rawTime STRING, method STRING, url STRING")
      .csv(path)
      .select($"ip", $"userId",
        (unix_millis(to_timestamp($"rawTime", "dd/MM/yyyy:HH:mm:ss"))).as("eventTime"),
        $"method", $"url")
      .as[ApacheLogEvent]
  }

  def adClickLog(spark: SparkSession, path: String): Dataset[AdClickLog] = {
    import spark.implicits._
    spark.read.schema(
        "userId LONG, adId LONG, province STRING, city STRING, timestamp LONG")
      .csv(path).as[AdClickLog]
  }

  def loginLog(spark: SparkSession, path: String): Dataset[LoginEvent] = {
    import spark.implicits._
    spark.read.schema("userId LONG, ip STRING, eventType STRING, eventTime LONG")
      .csv(path).as[LoginEvent]
  }

  def orderLog(spark: SparkSession, path: String): Dataset[OrderEvent] = {
    import spark.implicits._
    spark.read.schema("orderId LONG, eventType STRING, txId STRING, eventTime LONG")
      .csv(path).as[OrderEvent]
  }

  def receiptLog(spark: SparkSession, path: String): Dataset[ReceiptEvent] = {
    import spark.implicits._
    spark.read.schema("txId STRING, payChannel STRING, timestamp LONG")
      .csv(path).as[ReceiptEvent]
  }

  /** The reference's NetworkFlow job end-to-end over its own log
    * layout (REF: NetworkFlow.scala § main — reconstructed): GET only,
    * static resources (css/js/png/ico) excluded by regex (P3), 10-min
    * windows sliding 1 min, top-N urls per window.
    */
  def hotPagesFromApacheLog(logs: Dataset[ApacheLogEvent], n: Int = 3) = {
    val spark = logs.sparkSession
    import spark.implicits._
    val counts = logs
      .filter($"method" === "GET" && !$"url".rlike("""\.(css|js|png|ico)$"""))
      .select($"url", timestamp_millis($"eventTime").as("ts"))
      .groupBy(window($"ts", "10 minutes", "1 minute").as("w"), $"url")
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.end").as("window_end"), $"url".as("item_id"), $"cnt")
    graft.analytics.UserBehaviorAnalytics.rankTopN(counts, n)
      .withColumnRenamed("item_id", "url")
      .orderBy($"window_end", $"rnk")
  }

  /** The reference's flagship over its own record layout: hot items
    * top-N from a UserBehavior dataset (REF: HotItems.scala end-to-end)
    * — proof the engine runs the original data shape, not only the
    * testdata proxy.
    */
  def hotItemsFromBehaviors(behaviors: Dataset[UserBehavior], n: Int = 5) = {
    val spark = behaviors.sparkSession
    import spark.implicits._
    val counts = behaviors
      .filter($"behavior" === "pv")
      .select($"itemId".as("item_id"), timestamp_seconds($"timestamp").as("ts"))
      .groupBy(window($"ts", "1 hour", "5 minutes").as("w"), $"item_id")
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.end").as("window_end"), $"item_id", $"cnt")
    graft.analytics.UserBehaviorAnalytics.rankTopN(counts, n)
      .orderBy($"window_end", $"rnk")
  }
}
