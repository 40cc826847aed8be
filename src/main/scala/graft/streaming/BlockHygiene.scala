package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

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
  * [[releasingNewPersists]] brackets a foreachBatch body and, on exit,
  * unpersists exactly the RDDs the body registered through
  * [[checkpointTracked]] — NOT a before/after diff of the driver's
  * whole persistent-RDD registry. The distinction matters in a shared
  * session: a registry diff would sweep anything persisted during the
  * bracket window, including an RDD a concurrently-running query just
  * `localCheckpoint`'d, and unpersisting someone else's checkpoint
  * destroys its only copy (lineage is truncated). The tracked set is
  * held in a plain [[ThreadLocal]] — deliberately NOT Scala's
  * `DynamicVariable`, whose InheritableThreadLocal backing would make
  * any thread spawned inside a bracket (a `writeStream.start()`, a
  * parallel collection) inherit the buffer forever: its post-bracket
  * `checkpointTracked` calls would register into a set nothing will
  * ever sweep (a silent re-leak) and mutate it unsynchronized.
  * Concurrent foreachBatch bodies on different streams each release
  * only their own blocks; a spawned thread sees no bracket and
  * degrades to plain `localCheckpoint()` as the contract states.
  *
  * Contract: inside a bracketed body, materialize with
  * [[checkpointTracked]] instead of bare `localCheckpoint()`. Outside
  * a bracket, [[checkpointTracked]] degrades to a plain
  * `localCheckpoint()` — batch callers (Bench, Verify) need no
  * changes and keep their own leftover-block sweep.
  */
object BlockHygiene {
  private val active = new ThreadLocal[Option[mutable.Set[Int]]] {
    override def initialValue(): Option[mutable.Set[Int]] = None
  }

  /** `df.localCheckpoint()` whose persisted RDD is registered with the
    * innermost [[releasingNewPersists]] bracket on this thread (no-op
    * registration outside a bracket). The persisted RDD id is read off
    * the checkpointed frame's own [[LogicalRDD]] leaf — exact
    * ownership, no registry diffing, no race with concurrent queries.
    */
  def checkpointTracked(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    for (buf <- active.get(); id <- persistedRddId(ck)) buf += id
    ck
  }

  private def persistedRddId(ck: DataFrame): Option[Int] =
    ck.queryExecution.analyzed.collectFirst { case l: LogicalRDD => l.rdd.id }

  def releasingNewPersists[A](spark: SparkSession)(body: => A): A = {
    val buf = mutable.Set.empty[Int]
    val saved = active.get()
    active.set(Some(buf))
    try body
    finally {
      active.set(saved)
      val registry = spark.sparkContext.getPersistentRDDs
      buf.foreach(id =>
        registry.get(id).foreach(_.unpersist(blocking = false)))
    }
  }
}
