package graft.tools

import graft.{Session, SparkEntry}

/** Perf loop: `runMain graft.tools.TimeQuery <sfDir> <query> [reps]` —
  * times one SparkEntry query repeatedly in a warm session (steady-state
  * numbers, JIT/codegen warm-up excluded per BASELINE.md methodology).
  *
  * Scratch hygiene between reps: shuffle files are only deleted when the
  * ContextCleaner notices the ShuffleDependency was garbage-collected —
  * with a large driver heap that can be NEVER, so a query that spills
  * tens of GB per invocation (sf10 graph_triangles) exhausts local disk
  * across warm+reps long before any single invocation would. After each
  * rep we drop leftover persisted RDDs (localCheckpoint blocks) and
  * force a driver GC so the cleaner reclaims dead shuffles before the
  * next rep starts ([[graft.Session.scrubBlocks]]). SPARK_GRAFT_CONF
  * ("k=v;k=v") overrides session conf for perf experiments (e.g.
  * io.compression.codec=zstd at big SF) via
  * [[graft.Session.harnessBuilder]].
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Session.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def scrub(): Unit = Session.scrubBlocks(spark)
    SparkEntry.entry(spark).count() // warm-up
    scrub()
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'; known: " +
          SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        scrub()
        dt
      }
      println(f"TIMEQ $name%-24s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
