package graft.sources

import org.apache.spark.sql.DataFrame

/** Parquet write layer — the K1 result-sink analog for batch outputs
  * (REF: every job prints or writes to Redis/Kafka; the warehouse-shaped
  * Spark sink is partitioned/bucketed parquet — reconstructed,
  * SURVEY.md §2.2).
  *
  * The two layouts are the 100 TB storage design:
  *   - **date-partitioned**: one directory per partition value; any
  *     filter on the partition column prunes whole directories at plan
  *     time (`PartitionFilters` in the scan, zero I/O for pruned days).
  *   - **bucketed**: rows hash-clustered on a join key into a fixed
  *     bucket count; two tables bucketed the same way join with NO
  *     exchange on either side — the shuffle happened once at write
  *     time instead of on every query.
  */
object ParquetSink {

  /** Append/overwrite a date-partitioned parquet dataset. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: String = "overwrite"): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Write a bucketed+sorted table (bucketing requires the table
    * catalog — `saveAsTable`, not a bare path). Joins and aggregations
    * on `bucketCol` between tables with matching bucket counts skip
    * their shuffles; the in-bucket sort makes merge joins exchange- and
    * sort-free.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
