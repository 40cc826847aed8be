package graft

import org.apache.spark.sql.SparkSession

/** Production session factory: one place that encodes how this engine
  * wants Spark configured, local or cluster.
  *
  * Usage: `graft.Session.builder(parallelism = 32).getOrCreate()`, or
  * start from your own builder and call `Session.tune(b)`.
  */
object Session {

  /** Recommended settings, sized by target parallelism (local: number
    * of cores; cluster: ~2-3× total executor cores).
    *
    *  - shuffle.partitions = parallelism, not the 200 default — at
    *    cluster scale raise with the data (or let AQE coalesce down
    *    from a high ceiling).
    *  - AQE on: runtime join-strategy switching, skew-join splitting,
    *    partition coalescing — the engine's answer to the reference's
    *    hand-salting (SURVEY.md §2.3 P6).
    *  - UTC session timezone (oracle parity and sanity).
    *  - GraftExtensions: native functions + the as-of join strategy.
    */
  def tune(b: SparkSession.Builder, parallelism: Int = 4): SparkSession.Builder = b
    .config("spark.sql.shuffle.partitions", parallelism.toString)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .withExtensions(new GraftExtensions)

  def builder(parallelism: Int = 4, master: Option[String] = None): SparkSession.Builder = {
    val b = SparkSession.builder().appName("graft")
    tune(master.fold(b)(b.master), parallelism)
  }
}
