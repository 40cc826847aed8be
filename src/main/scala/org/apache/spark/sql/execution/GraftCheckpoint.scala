package org.apache.spark.sql.execution

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, PartitioningCollection}
import org.apache.spark.sql.classic

/** `localCheckpoint` with SANE, FRESH statistics — the fix for the
  * iterative-self-join stats explosion found by the round-13 sf10
  * full-surface sweep.
  *
  * `Dataset.localCheckpoint()` seeds the resulting `LogicalRDD` with
  * the PARENT PLAN's estimated statistics. Inside an iterative loop
  * whose step SELF-JOINS the previous round's checkpoint (label
  * propagation's pointer jump: `stepped ⋈ stepped`), size-only
  * estimation multiplies the two children — so the inherited
  * `sizeInBytes` SQUARES every round: digits double per iteration,
  * and after ~20 rounds Catalyst's `BigInt.product` over
  * million-digit integers (Toom-Cook multiplies) pins the driver for
  * hours computing statistics nobody needs (measured: the sf10 sweep
  * stalled 20+ min single-core inside
  * `SizeInBytesOnlyStatsPlanVisitor` during
  * `dedup_clusters_multi_capped`'s warm pass; at sf0.1 the same
  * compounding stays under ~10 k digits and is invisible — a pure
  * scale cliff).
  *
  * This variant materializes the plan exactly like an eager
  * `localCheckpoint` (internal-row RDD, `localCheckpoint()` +
  * `count()`), then wraps it in a `LogicalRDD` with UNKNOWN origin
  * statistics — the leaf defaults to `spark.sql.defaultSizeInBytes`
  * (Long.MaxValue), bounded digits by construction. Deliberately NOT
  * the materialized true size: accurate (small) stats flip the
  * loop-carried joins from sort-merge to a fresh BROADCAST of the
  * labels frame every round, measured ~30 % slower at sf0.1 on the
  * CC queries; the inherited astronomical estimate never broadcast
  * either, so the unknown default reproduces the established plan
  * shapes exactly — minus the compounding.
  *
  * Lives under `org.apache.spark.sql.execution` because
  * `Dataset.ofRows` is `private[sql]` — the same access route Spark's
  * own execution nodes use; no Spark internals are modified.
  */
object GraftCheckpoint {

  /** Eagerly localCheckpoint `df`; the returned frame reads the
    * materialized blocks and carries fresh size stats (rows ×
    * default row width). Interchangeable with
    * `df.localCheckpoint()` for loop-carried frames.
    */
  def localCheckpointFreshStats(df: DataFrame): DataFrame =
    localCheckpointFreshStatsWithLongSum(df, -1)._1

  /** [[localCheckpointFreshStats]] that additionally returns the sum of
    * BIGINT column `sumColIdx` (-1: skip), computed IN the eager
    * materialization pass — an iterative caller that needs a per-round
    * convergence scalar (label propagation's labelSum) gets it for free
    * instead of paying a second aggregation job over the checkpoint
    * every round (round 17; wrapping overflow semantics match the SQL
    * `sum(bigint)` it replaces).
    */
  def localCheckpointFreshStatsWithLongSum(
      df: DataFrame, sumColIdx: Int): (DataFrame, Long) = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val spark = ds.sparkSession
    // same materialization as Dataset.checkpoint: copy the unsafe rows
    // (operators reuse row buffers) and pin the blocks on executors
    val physical = ds.queryExecution.executedPlan
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    // eager, like localCheckpoint()'s default count(); the same pass
    // folds the requested column sum so no second job is needed
    val colSum =
      if (sumColIdx < 0) { rdd.count(); 0L }
      else rdd.mapPartitions { it =>
        var s = 0L
        while (it.hasNext) s += it.next().getLong(sumColIdx)
        Iterator.single(s)
      }.fold(0L)(_ + _)
    // register with any open BlockHygiene bracket, exactly like a
    // plain checkpointTracked — a bracketed streaming caller must have
    // these blocks swept per micro-batch too (batch callers manage
    // unpersist themselves, as before)
    graft.streaming.BlockHygiene.trackPersisted(rdd.id)
    // preserve the physical partitioning/ordering like
    // Dataset.localCheckpoint means to (a PartitioningCollection
    // reports its first leaf — same rule as Spark's own checkpoint):
    // ONLY the statistics are deliberately fresh; dropping the
    // partitioning too would re-shuffle the checkpointed frame in
    // every downstream join even though the materialized data is
    // already hash-partitioned. Under AQE the top-level
    // AdaptiveSparkPlanExec reports UnknownPartitioning FOREVER (even
    // after execution), so unwrap to its finalized inner plan — the
    // count() above forced plan finalization
    def firstLeaf(p: Partitioning): Partitioning = p match {
      case c: PartitioningCollection => firstLeaf(c.partitionings.head)
      case other => other
    }
    val resolved = physical match {
      case a: adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    (classic.Dataset.ofRows(spark,
      new LogicalRDD(ds.queryExecution.analyzed.output, rdd,
        firstLeaf(resolved.outputPartitioning),
        resolved.outputOrdering, false, None)(spark, None, None)),
      colSum)
  }
}
