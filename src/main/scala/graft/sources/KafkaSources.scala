package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader

/** Kafka ingress/egress wiring (S2/S4).
  *
  * The reference's production source is a FlinkKafkaConsumer over the
  * same CSV lines as the files, and its producer util writes those
  * lines back (REF: HotItems.scala § main alternate source,
  * KafkaProducerUtil § writeToKafka — reconstructed, SURVEY.md §0/§2.0).
  * Spark-first that is `readStream.format("kafka")` + `from_csv` on the
  * record value, and `to_csv`-shaped values on the write side — the
  * parse/encode is Catalyst expressions, not per-record string splits.
  *
  * This container ships no Kafka broker OR spark-sql-kafka connector
  * jar (zero egress), so `.load()` cannot resolve here; the split below
  * keeps everything else testable:
  *   - [[reader]] returns the fully-configured `DataStreamReader`
  *     (option plumbing under test),
  *   - `parse*` take ANY Kafka-shaped DataFrame (binary `key`/`value`,
  *     `topic`, `partition`, `offset`, `timestamp`) and produce the
  *     same typed Datasets as [[CsvSources]] (parse logic under test
  *     against synthesized frames),
  *   - [[encodeCsv]] builds the (key, value) pair for the write side.
  * A deployment with the connector on the classpath composes:
  * `parseUserBehavior(reader(spark, servers, topic).load())`.
  */
object KafkaSources {
  import CsvSources._

  /** Configured Kafka stream reader (S2). `startingOffsets=earliest`
    * mirrors the reference consumer's `auto.offset.reset`.
    */
  def reader(spark: SparkSession, bootstrapServers: String, topic: String,
             startingOffsets: String = "earliest",
             maxOffsetsPerTrigger: Option[Long] = None): DataStreamReader = {
    val r = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      // at 100 TB of backlog, bound each micro-batch instead of
      // swallowing the whole topic in batch 0
    maxOffsetsPerTrigger.fold(r)(n => r.option("maxOffsetsPerTrigger", n.toString))
  }

  /** Batch read of a bounded offset range (Kafka as a table). */
  def batchReader(spark: SparkSession, bootstrapServers: String, topic: String) =
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("endingOffsets", "latest")

  /** value bytes → columns via from_csv with the layout's schema —
    * the streaming analog of `CsvSources`' schema-on-read (PERMISSIVE:
    * malformed records become null columns, they don't kill tasks).
    */
  private def parsed(kafka: DataFrame, ddl: String): DataFrame =
    kafka.select(from_csv(col("value").cast("string"),
      org.apache.spark.sql.types.StructType.fromDDL(ddl),
      Map.empty[String, String]).as("r")).select("r.*")

  def parseUserBehavior(kafka: DataFrame): Dataset[UserBehavior] = {
    val spark = kafka.sparkSession; import spark.implicits._
    parsed(kafka,
      "userId LONG, itemId LONG, categoryId INT, behavior STRING, timestamp LONG")
      .as[UserBehavior]
  }

  def parseApacheLog(kafka: DataFrame): Dataset[ApacheLogEvent] = {
    val spark = kafka.sparkSession; import spark.implicits._
    // space-separated like the file layout; csv sep is configurable
    kafka.select(from_csv(col("value").cast("string"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "ip STRING, userId STRING, rawTime STRING, method STRING, url STRING"),
        Map("sep" -> " ")).as("r"))
      .select(col("r.ip"), col("r.userId"),
        unix_millis(to_timestamp(col("r.rawTime"), "dd/MM/yyyy:HH:mm:ss"))
          .as("eventTime"),
        col("r.method"), col("r.url"))
      .as[ApacheLogEvent]
  }

  def parseAdClickLog(kafka: DataFrame): Dataset[AdClickLog] = {
    val spark = kafka.sparkSession; import spark.implicits._
    parsed(kafka,
      "userId LONG, adId LONG, province STRING, city STRING, timestamp LONG")
      .as[AdClickLog]
  }

  def parseLoginLog(kafka: DataFrame): Dataset[LoginEvent] = {
    val spark = kafka.sparkSession; import spark.implicits._
    parsed(kafka, "userId LONG, ip STRING, eventType STRING, eventTime LONG")
      .as[LoginEvent]
  }

  def parseOrderLog(kafka: DataFrame): Dataset[OrderEvent] = {
    val spark = kafka.sparkSession; import spark.implicits._
    parsed(kafka, "orderId LONG, eventType STRING, txId STRING, eventTime LONG")
      .as[OrderEvent]
  }

  def parseReceiptLog(kafka: DataFrame): Dataset[ReceiptEvent] = {
    val spark = kafka.sparkSession; import spark.implicits._
    parsed(kafka, "txId STRING, payChannel STRING, timestamp LONG")
      .as[ReceiptEvent]
  }

  /** Producer encode (S4): all columns CSV-joined into `value`,
    * `keyCol` (if any) as the partitioning key — keyed records keep
    * per-key order across Kafka partitions, the property the
    * reference's keyed streams rely on downstream.
    */
  def encodeCsv(df: DataFrame, keyCol: Option[String] = None): DataFrame = {
    // coalesce each field: concat_ws SKIPS nulls, which would drop the
    // field entirely and shift every later column on re-parse (the
    // OrderLog layout legitimately has an empty txId on 'create' rows)
    val value = concat_ws(",",
      df.columns.toIndexedSeq.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    keyCol match {
      case Some(k) => df.select(col(k).cast("string").as("key"), value.as("value"))
      case None => df.select(value.as("value"))
    }
  }

  /** Wire-format encoder for the apache.log layout — the one layout
    * whose wire form is NOT the typed row (space-separated, timestamp
    * as `dd/MM/yyyy:HH:mm:ss` text). Inverse of [[parseApacheLog]] up
    * to the wire format's 1-second timestamp resolution.
    */
  def encodeApacheLog(df: DataFrame, keyCol: Option[String] = None): DataFrame = {
    val value = concat_ws(" ",
      col("ip"), col("userId"),
      date_format(timestamp_millis(col("eventTime")), "dd/MM/yyyy:HH:mm:ss"),
      col("method"), col("url"))
    keyCol match {
      case Some(k) => df.select(col(k).cast("string").as("key"), value.as("value"))
      case None => df.select(value.as("value"))
    }
  }

  /** Configured streaming writer (S4 — the KafkaProducerUtil analog).
    * Caller picks the trigger/checkpoint and calls `.start()`.
    */
  def writer(df: DataFrame, bootstrapServers: String, topic: String,
             keyCol: Option[String] = None, checkpointLocation: String = "") = {
    val w = encodeCsv(df, keyCol).writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
    if (checkpointLocation.nonEmpty) w.option("checkpointLocation", checkpointLocation)
    else w
  }

  /** Batch writer: replay a table into a topic. */
  def batchWriter(df: DataFrame, bootstrapServers: String, topic: String,
                  keyCol: Option[String] = None) =
    encodeCsv(df, keyCol).write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
}
