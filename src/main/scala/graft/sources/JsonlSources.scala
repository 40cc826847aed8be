package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JSONL corpus interchange (no analog in the reference — part of the
  * LLM-pipeline surface the build brief adds): one JSON object per
  * line is the lingua franca of document corpora (The Pile, C4,
  * RedPajama dumps all ship this way), so the engine can ingest and
  * emit it without a conversion step.
  *
  * Read side: `spark.read.schema(...).json` — an EXPLICIT schema, so
  * Spark never runs the schema-inference pre-pass (a full extra scan
  * of 100 TB before the first real job), unparseable lines are
  * dropped instead of killing tasks (DROPMALFORMED; [[corruptLines]]
  * recovers them), and lexing is the codegen'd Jackson path, not a
  * UDF. Splittability
  * caveat for scale: plain-text or zstd/bzip2 JSONL splits per-line
  * across tasks; a single gzip member does NOT split — one 100 GB
  * .json.gz becomes one task, so big dumps must arrive pre-sharded
  * (the convention every public corpus follows).
  *
  * Write side: `text` of a `to_json(struct(...))` projection —
  * shard count = partition count, driver never touches rows.
  */
object JsonlSources {

  /** documents-table schema (FIXTURES.md): doc_id, text, lang,
    * source, n_chars. DROPMALFORMED: unparseable lines vanish from
    * the clean frame (recover them via [[corruptLines]]) — filtering
    * a PERMISSIVE `_corrupt_record` instead is disallowed once column
    * pruning leaves the corrupt column as the scan's only reference.
    */
  val documentsSchema =
    "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"

  def documents(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(documentsSchema)
      .option("mode", "DROPMALFORMED")
      .json(path)

  /** Malformed-line side output — the T4 pattern applied to ingest.
    * Spark refuses a query that references ONLY `_corrupt_record`
    * from a json SCAN (it would require caching the raw rows), so
    * this goes the other way: a text scan + `from_json` carrying the
    * corrupt-record field inside its struct (where no such
    * restriction exists) — same single pass, no cache, any scale.
    */
  def corruptLines(spark: SparkSession, path: String): DataFrame = {
    val parsed = from_json(col("value"),
      org.apache.spark.sql.types.StructType.fromDDL(
        documentsSchema + ", _corrupt_record STRING"),
      Map("columnNameOfCorruptRecord" -> "_corrupt_record"))
    spark.read.text(path)
      .where(parsed.getField("_corrupt_record").isNotNull)
      .select(col("value").as("raw_line"))
  }

  /** Streaming ingest of a JSONL drop directory — the file-source
    * form of S2: each new shard landed in `path` becomes (part of) a
    * micro-batch, tracked exactly-once in the checkpoint's file log.
    * `maxFilesPerTrigger` bounds batch size the way
    * `maxOffsetsPerTrigger` does for Kafka, so a 100 TB backlog
    * drains in bounded batches instead of one giant batch 0.
    * Composes with the ingest pipeline once an event-time column is
    * attached (the JSONL schema carries none, and the dedup stage
    * watermarks on `ts`):
    * `corpusPrepStream(documentsStream(spark, dir).withColumn("ts", …))`.
    */
  def documentsStream(spark: SparkSession, path: String,
                      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream
      .schema(documentsSchema)
      .option("mode", "DROPMALFORMED")
    maxFilesPerTrigger.fold(r)(n => r.option("maxFilesPerTrigger", n.toString))
      .json(path)
  }

  /** Emit any frame as JSONL, one shard per partition. Column order
    * in each object follows the frame's schema (deterministic for a
    * given plan, so round-trips are stable).
    */
  def write(df: DataFrame, path: String): Unit =
    df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))
      .write.mode("overwrite").text(path)
}
