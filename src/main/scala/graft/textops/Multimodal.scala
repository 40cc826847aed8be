package graft.textops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, and a per-partition decode/feature
  * stage.
  *
  * The container has no image/audio codecs, so — per the build brief —
  * the DECODE ITSELF IS A DETERMINISTIC STUB (arithmetic over the byte
  * payload standing in for `decode(bytes).width` etc.). Everything
  * around it is real Spark plumbing and is what's under test:
  *   - binary column materialization (`encode(text, 'utf-8')` plays the
  *     role of a media blob),
  *   - a typed `Dataset[MediaFile].mapPartitions` decode stage — the
  *     exact shape a real codec UDF takes (per-partition batch init,
  *     e.g. one decoder instance per partition, streamed iterator, no
  *     collect) — partition-parallel and shuffle-free,
  *   - stable output schema for downstream relational ops.
  *
  * The stub arithmetic is mirrored in the DuckDB oracle, so even the
  * mapPartitions path is hash-verified, not just row-counted.
  */
object Multimodal {

  case class MediaFile(doc_id: Long, content: Array[Byte], source: String)
  case class MediaFeatures(doc_id: Long, source: String, n_bytes: Int,
                           width: Int, height: Int, n_frames: Int, checksum: Long)

  /** STUB decoder: stands in for an image/video codec. Deterministic
    * arithmetic over the payload; a real deployment swaps only this
    * function body for e.g. a JNI codec call.
    */
  private def decodeStub(m: MediaFile): MediaFeatures = {
    val n = m.content.length
    // rolling checksum identical to TextHash.P polynomial fold
    var acc = 0L
    var i = 0
    while (i < n) { acc = (acc * 31 + (m.content(i) & 0xff)) % TextHash.P; i += 1 }
    MediaFeatures(m.doc_id, m.source, n,
      width = n % 640, height = (n * 7) % 480, n_frames = n % 30 + 1,
      checksum = acc)
  }

  /** Typed per-partition decode over binary payloads. */
  def multimodalDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, sfDir)
      .select($"doc_id", encode($"text", "utf-8").as("content"), $"source")
      .as[MediaFile]
    media
      .mapPartitions { it =>
        // per-partition init site (real codec: allocate decoder once here)
        it.map(decodeStub)
      }
      .toDF()
      .orderBy($"doc_id")
  }

  /** Oracle replays the stub arithmetic relationally (texts are ASCII,
    * so byte-fold ≡ char-fold).
    */
  val multimodalDecodeOracle: String =
    s"""WITH b AS (
       |  SELECT doc_id, source, octet_length(encode(text)) AS n_bytes,
       |         ${TextHash.phDuck("text", "c")} AS checksum
       |  FROM documents
       |)
       |SELECT doc_id, source, CAST(n_bytes AS INT) AS n_bytes,
       |       CAST(n_bytes % 640 AS INT) AS width,
       |       CAST((n_bytes * 7) % 480 AS INT) AS height,
       |       CAST(n_bytes % 30 + 1 AS INT) AS n_frames,
       |       checksum
       |FROM b ORDER BY doc_id""".stripMargin

  /** Resize stage: fit the (stub) frame into a 224×224 box preserving
    * aspect ratio — pure integer arithmetic on the decoded metadata,
    * the planning shape of a real resize (the pixel work would live in
    * the decode stage's partition iterator). Zero-dimension stubs are
    * clamped to 1 first, as a real decoder would reject them.
    */
  def multimodalResize(spark: SparkSession, sfDir: String, box: Int = 224): DataFrame = {
    import spark.implicits._
    multimodalDecode(spark, sfDir)
      .selectExpr("doc_id", "greatest(width, 1) as w", "greatest(height, 1) as h")
      .selectExpr("doc_id", "w", "h",
        s"cast(greatest(w * $box div greatest(w, h), 1) as int) as out_w",
        s"cast(greatest(h * $box div greatest(w, h), 1) as int) as out_h")
      .orderBy($"doc_id")
  }

  val multimodalResizeOracle: String =
    """WITH b AS (
      |  SELECT doc_id,
      |         greatest(octet_length(encode(text)) % 640, 1) AS w,
      |         greatest((octet_length(encode(text)) * 7) % 480, 1) AS h
      |  FROM documents
      |)
      |SELECT doc_id, CAST(w AS INT) AS w, CAST(h AS INT) AS h,
      |       CAST(greatest(w * 224 // greatest(w, h), 1) AS INT) AS out_w,
      |       CAST(greatest(h * 224 // greatest(w, h), 1) AS INT) AS out_h
      |FROM b ORDER BY doc_id""".stripMargin

  /** Frame-sampling stage: k evenly-spaced frame indices per media
    * file (one input row → ≤ k output rows, the real frame-sample
    * fan-out shape, expressed as a codegen'd posexplode — no UDF), with
    * a per-frame stub feature derived from the payload checksum.
    */
  def multimodalFrameSample(spark: SparkSession, sfDir: String, k: Int = 4): DataFrame = {
    import spark.implicits._
    multimodalDecode(spark, sfDir)
      .selectExpr("doc_id", "n_frames", "checksum",
        s"least(n_frames, $k) as kk")
      .selectExpr("doc_id", "n_frames", "checksum",
        "posexplode(sequence(0, kk - 1)) as (sample_no, j)")
      .selectExpr("doc_id", "sample_no",
        s"cast(j * n_frames div least(n_frames, $k) as int) as frame_idx",
        s"(checksum * 31 + j * n_frames div least(n_frames, $k)) % ${TextHash.P} as frame_hash")
      .orderBy($"doc_id", $"sample_no")
  }

  val multimodalFrameSampleOracle: String =
    s"""WITH b AS (
       |  SELECT doc_id,
       |         octet_length(encode(text)) % 30 + 1 AS n_frames,
       |         ${TextHash.phDuck("text", "c")} AS checksum
       |  FROM documents
       |), s AS (
       |  SELECT doc_id, n_frames, checksum,
       |         unnest(range(least(n_frames, 4))) AS j
       |  FROM b
       |)
       |SELECT doc_id, CAST(j AS INT) AS sample_no,
       |       CAST(j * n_frames // least(n_frames, 4) AS INT) AS frame_idx,
       |       (checksum * 31 + j * n_frames // least(n_frames, 4)) % ${TextHash.P} AS frame_hash
       |FROM s ORDER BY doc_id, sample_no""".stripMargin

  /** JSON props extraction — the dynamic-payload column surface
    * (`get_json_object` over the events `props` JSON). REF analog:
    * none (the reference hand-splits CSVs); this is the schema-on-read
    * path a pipeline needs for heterogeneous metadata.
    */
  def propsExtract(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"event_type",
        get_json_object($"props", "$.k").cast("bigint").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("cnt"),
        min($"k").as("min_k"), max($"k").as("max_k"),
        sum($"k").as("sum_k"))
      .orderBy($"event_type")
  }

  val propsExtractOracle: String =
    """SELECT event_type, count(*) AS cnt,
      |       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
}
