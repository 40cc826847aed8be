package graft.textops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection + redaction over `documents` — the scrub pass every
  * training-corpus pipeline runs before tokenization (emails, phone
  * numbers, IP addresses → typed placeholder tokens).
  *
  * Determinism across engines: the three patterns use only the regex
  * subset Java's engine and DuckDB's RE2 agree on (ASCII classes,
  * bounded repetition, `\b`), and the stages CHAIN — each pattern
  * counts and redacts on the PREVIOUS stage's output — so a span can
  * only ever be claimed by one category (a dotted phone number like
  * `123.456.7890` is also a syntactic IPv4 match; the fixed
  * email → phone → IP order resolves it identically in both engines).
  * Both engines replace non-overlapping matches left-to-right.
  *
  * Scale shape: one narrow map over the corpus — three regex passes
  * per row, no shuffle except the presentation sort; the counts
  * aggregate map-side if a caller drops the per-doc grain.
  */
object Scrub {

  private[graft] val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PhonePat = "\\b\\d{3}[-.]\\d{3,4}[-.]\\d{4}\\b"
  private[graft] val Ipv4Pat =
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  private def countPat(c: Column, pat: String): Column =
    size(regexp_extract_all(c, lit(pat), lit(0)))

  /** Stream-safe core (narrow per-row transforms only). */
  def piiScrubFrom(docs: DataFrame): DataFrame = {
    docs
      .withColumn("n_emails", countPat(col("text"), EmailPat))
      .withColumn("t1", regexp_replace(col("text"), EmailPat, "<EMAIL>"))
      .withColumn("n_phones", countPat(col("t1"), PhonePat))
      .withColumn("t2", regexp_replace(col("t1"), PhonePat, "<PHONE>"))
      .withColumn("n_ips", countPat(col("t2"), Ipv4Pat))
      .withColumn("scrubbed", regexp_replace(col("t2"), Ipv4Pat, "<IP>"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
        (col("n_emails") + col("n_phones") + col("n_ips")).as("pii_total"),
        col("scrubbed"))
  }

  def piiScrub(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    piiScrubFrom(Tables.documents(spark, sfDir)).orderBy($"doc_id")
  }

  val piiScrubOracle: String =
    s"""WITH s1 AS (
       |  SELECT doc_id,
       |         len(regexp_extract_all(text, '$EmailPat')) AS n_emails,
       |         regexp_replace(text, '$EmailPat', '<EMAIL>', 'g') AS t1
       |  FROM documents
       |), s2 AS (
       |  SELECT doc_id, n_emails,
       |         len(regexp_extract_all(t1, '$PhonePat')) AS n_phones,
       |         regexp_replace(t1, '$PhonePat', '<PHONE>', 'g') AS t2
       |  FROM s1
       |), s3 AS (
       |  SELECT doc_id, n_emails, n_phones,
       |         len(regexp_extract_all(t2, '$Ipv4Pat')) AS n_ips,
       |         regexp_replace(t2, '$Ipv4Pat', '<IP>', 'g') AS scrubbed
       |  FROM s2
       |)
       |SELECT doc_id, n_emails, n_phones, n_ips,
       |       n_emails + n_phones + n_ips AS pii_total, scrubbed
       |FROM s3 ORDER BY doc_id""".stripMargin
}
