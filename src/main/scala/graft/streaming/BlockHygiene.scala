package graft.streaming

import org.apache.spark.sql.SparkSession

/** Per-micro-batch storage hygiene for `foreachBatch` sinks.
  *
  * Several streaming finishes reuse batch report math that
  * `localCheckpoint()`s an intermediate (the (source, token) counts in
  * corpus drift, the band table in the incremental dedup loop, the
  * span table in span dedup). `localCheckpoint` persists RDD blocks
  * that nothing unpersists — in the BATCH harness, Bench drops
  * leftovers after every invocation (Bench.scala), but a long-running
  * STREAM would otherwise leak one persisted RDD per micro-batch
  * without bound: exactly the spill/GC-pressure class the v20 bench
  * block-hygiene fix measured (21 s vs 7.5 s on graph_triangles).
  *
  * [[releasingNewPersists]] brackets a foreachBatch body: it diffs the
  * driver's persistent-RDD registry before/after and unpersists only
  * what the body itself persisted, so blocks owned by other queries
  * (or a concurrent batch run in the same session) are never touched.
  */
object BlockHygiene {
  def releasingNewPersists[A](spark: SparkSession)(body: => A): A = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    try body
    finally sc.getPersistentRDDs
      .filter { case (id, _) => !before(id) }
      .values.foreach(_.unpersist(blocking = false))
  }
}
