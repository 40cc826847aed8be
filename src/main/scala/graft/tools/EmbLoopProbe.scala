package graft.tools

import graft.Session
import graft.textops.{Pipelines, Similarity}

/** Decade probe for the embedding crawl loop — the stored-serving form
  * of `dedup_embedding_incremental`. For each tier dir: build the
  * snapshot (`materializeEmbDedup`, timed — the one-time cost the loop
  * amortizes), then time the served judge
  * (`embDedupIncrementalFrom`, median of `reps` with an untimed warm
  * pass and the Bench inter-rep scrub) against the LIVE query on the
  * same tier, asserting row-count agreement (full row-identity is
  * PipelinesSpec's job; at scale the count cross-check guards the
  * measurement without a second collect).
  *
  * Usage: `tools/run.sh graft.tools.EmbLoopProbe <sfDir> [<sfDir>...]
  * [reps=3]` — snapshots land under `target/embloop-<basename(tier)>`
  * and are rebuilt each run.
  */
object EmbLoopProbe {
  def main(args: Array[String]): Unit = {
    val (opts, dirs) = args.partition(_.contains("="))
    require(dirs.nonEmpty, "usage: EmbLoopProbe <sfDir> [...] [reps=N]")
    val reps = opts.find(_.startsWith("reps="))
      .map(_.stripPrefix("reps=").toInt).getOrElse(3)
    val spark = Session.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def scrub(): Unit = Session.scrubBlocks(spark)

    def med(f: => Long): Double = {
      f; scrub() // untimed warm pass
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f
        val dt = (System.nanoTime() - t0) / 1e9
        scrub(); dt
      }.sorted.apply(reps / 2)
    }

    for (dir <- dirs) {
      val snap = s"target/embloop-${new java.io.File(dir).getName}"
      val t0 = System.nanoTime()
      Pipelines.materializeEmbDedup(spark, dir, snap)
      val buildS = (System.nanoTime() - t0) / 1e9
      scrub()
      // the warm passes double as the count cross-check — no extra runs
      var servedN = -1L
      var liveN = -2L
      val servedS = med {
        val n = Pipelines.embDedupIncrementalFrom(spark, dir, snap).count()
        servedN = n; n
      }
      val liveS = med {
        val n = Similarity.dedupEmbeddingIncremental(spark, dir).count()
        liveN = n; n
      }
      scrub()
      require(servedN == liveN,
        s"served/live verdict count diverged: $servedN vs $liveN")
      println(f"EMBLOOP $dir%-22s n_verdicts=$servedN%-8d " +
        f"build_s=$buildS%.1f served_s=$servedS%.2f live_s=$liveS%.2f")
    }
    spark.stop()
  }
}
