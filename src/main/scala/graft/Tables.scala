package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central table loaders for the driver-generated testdata
  * (`/root/testdata/sf{0.001,0.01,0.1}/<name>.parquet`, see TESTDATA.md).
  *
  * Every analytic is a pure function `(SparkSession, sfDir) => DataFrame`
  * reading only through these loaders, so the scan layer (format,
  * pushdown, pruning) is controlled in one place. Parquet scans get
  * predicate pushdown + column pruning from Catalyst automatically; at
  * cluster scale these would be partitioned/bucketed tables behind the
  * same interface.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // every query path goes through here: make sure the session has the
    // engine's native expressions (idempotent)
    graft.functions.GraftExpressions.register(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events.parquet` has shipped `ts` in two encodings across data
    * generations; the loader normalizes both to a session-tz TIMESTAMP:
    *
    *  - parquet TIMESTAMP(NANOS): the Spark vectorized reader rejects
    *    it outright ([PARQUET_TYPE_ILLEGAL]); read nanos as Long
    *    (legacy conf) and convert with *integer* division — epoch-nanos
    *    ≈ 1.7e18 exceeds double's 2^53 exact-integer range, so `/ 1000`
    *    via doubles would corrupt low bits. The data is µs-exact
    *    (verified: 0 rows with ns%1000 != 0).
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) → Spark
    *    TIMESTAMP_NTZ: cast to TIMESTAMP under the UTC session tz —
    *    identical wall-clock instants, matching DuckDB's naive
    *    TIMESTAMP view bit-for-bit.
    */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet encoding $other")
    }
  }

  /** Register every table as a temp view so the whole surface is
    * reachable from `spark.sql(...)` (the oracle SQL in SparkEntry runs
    * near-verbatim this way — DuckDB↔Spark SQL differences are mostly
    * `time_bucket`/`json_extract_string` spellings).
    */
  def createViews(spark: SparkSession, sfDir: String): Unit = {
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
    events(spark, sfDir).createOrReplaceTempView("events")
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = loadEvents(s, d)
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
