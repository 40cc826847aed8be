package graft.tools

import graft.Session
import graft.analytics.GraphAnalytics

/** Times [[GraphAnalytics.graphTriangles]] at a tier for a list of
  * dst-hash bucket counts (1 = the single-pass serving form) — the
  * measurement behind the round-11 sf10 peak-shuffle cap.
  * Usage: `TriProbe <sfDir> [buckets1,buckets2,...] [reps]`
  * (`reps=0` runs the warm-up pass only — the big-SF mode where one
  * invocation already costs minutes. [[graft.Session.scrubBlocks]]
  * hygiene between reps so sf10 spill is reclaimed; SPARK_GRAFT_CONF
  * overrides apply via [[graft.Session.harnessBuilder]].)
  */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val bucketCounts: Seq[Int] =
      if (args.length > 1) args(1).split(',').map(_.trim.toInt).toSeq
      else Seq(1, 8)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = Session.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def scrub(): Unit = Session.scrubBlocks(spark)
    for (b <- bucketCounts) {
      // rep 0 carries codegen/JIT warm-up — printed but excluded from
      // the steady figure (BASELINE methodology)
      val times = (0 to reps).map { r =>
        val t0 = System.nanoTime()
        val n = GraphAnalytics.graphTriangles(spark, sfDir, buckets = b).count()
        val dt = (System.nanoTime() - t0) / 1e9
        scrub()
        println(f"TRI buckets=$b%-3d rows=$n%d t=$dt%.1f s${if (r == 0) " (warm-up)" else ""}")
        dt
      }.drop(1).sorted
      if (times.nonEmpty)
        println(f"TRI buckets=$b%-3d steady_median=${times(times.size / 2)}%.1f s")
    }
    spark.stop()
  }
}
