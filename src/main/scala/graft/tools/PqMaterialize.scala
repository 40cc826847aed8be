package graft.tools

import graft.Session
import graft.textops.Pipelines

/** Builds ONE stored-PQ snapshot variant — the setup step for
  * [[PqServeExplain]]'s timed A/B, which reads snapshots that already
  * exist (the round-11 four-way built its variants inside
  * [[AnnServeProbe]]'s temp dirs, so re-running a single experiment
  * previously meant re-running the whole probe).
  *
  * Usage: `PqMaterialize <sfDir> <outDir> [trainRounds=0] [codebookK=-1] [residual]`
  *   - defaults build the seeded oracle-replayable PqK=16 tier
  *   - `codebookK` overrides per-subspace codebook capacity (e.g. 64)
  *   - literal `residual` as the 5th arg builds the IVFADC form
  */
object PqMaterialize {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val trainRounds = if (args.length > 2) args(2).toInt else 0
    val codebookK = if (args.length > 3) args(3).toInt else -1
    val residual = args.length > 4 && args(4) == "residual"
    val spark = Session.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    Pipelines.materializePq(spark, sfDir, outDir,
      trainRounds = trainRounds, codebookK = codebookK,
      residual = residual)
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"pq_materialize out=$outDir trainRounds=$trainRounds " +
      f"codebookK=$codebookK residual=$residual build_s=$dt%.1f")
    spark.stop()
  }
}
