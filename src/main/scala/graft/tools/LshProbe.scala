package graft.tools

import graft.Session
import graft.textops.Similarity
import org.apache.spark.sql.functions._

/** Prints recall@5 + serving time for the SRP-LSH tiers (exact-bucket
  * and multiprobe) at a tier — the measurement behind the T = b probe
  * law in [[Similarity]] (round-11 fix for the fixed-T=8 decade decay:
  * recall 0.34→0.24 with cost ×9.6 per 10× data).
  * Usage: `LshProbe <sfDir> [reps=3] [mp|exact]`
  *
  * `reps=0` measures recall ONLY (the query-panel gate — its panel
  * filter pushes through the rank window and the bucket join, so it
  * never materializes the full self-kNN): the mode for tiers past the
  * single-node disk cliff, where the n×topk SERVE is the bench
  * artifact, not the production shape (batches of queries probe the
  * stored index). A trailing `mp`/`exact` restricts to one tier.
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val only = if (args.length > 2) Some(args(2)) else None
    // fail-fast like TimeQuery/ShowQuery: a typo ("multiprobe") must
    // not silently fall through to "run both tiers" and double the run
    require(only.forall(Set("mp", "exact")),
      s"unknown tier filter '${only.getOrElse("")}' — expected mp|exact")
    // harnessBuilder: same SPARK_GRAFT_CPUS/CONF surface as Bench, so
    // anchors recorded here reproduce under the same conf overrides
    val spark = Session.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def scrub(): Unit = Session.scrubBlocks(spark)
    val tiers = Seq(false, true).filter(mp => only.forall(o => (o == "mp") == mp))
    for (mp <- tiers) {
      val r = Similarity.similarityRecallLsh(spark, sfDir, multiprobe = mp)
        .agg(avg($"recall")).head().getDouble(0)
      scrub()
      val serve =
        if (reps == 0) -1.0
        else (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          (if (mp) Similarity.similarityLshMultiprobe(spark, sfDir)
           else Similarity.similarityLsh(spark, sfDir)).count()
          val dt = (System.nanoTime() - t0) / 1e9
          scrub()
          dt
        }.sorted.apply(reps / 2)
      println(f"LSH multiprobe=$mp%-5s avg_recall=$r%.3f serve_s=$serve%.2f")
    }
    spark.stop()
  }
}
