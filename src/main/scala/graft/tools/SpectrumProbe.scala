package graft.tools

import graft.Session
import graft.textops.Similarity

/** Corpus-spectrum decision probe — runs [[Similarity.spectrumTopShares]]
  * (the `embedding_spectrum` moment query + the driver-side 64×64
  * Jacobi pass) over one or more embedding tiers and prints
  * share(top-k) of the covariance trace for k = 1, 2, 4, 8, plus the
  * deployment verdict the round-13 separating-geometry law ends with:
  * if the top-4 share is well above the isotropic floor (4/d), a
  * residual-trained IVFADC index pays; otherwise spend the same budget
  * on a wider re-rank pool.
  *
  * Usage: `tools/run.sh graft.tools.SpectrumProbe <sfDir> [<sfDir>...]`
  * — e.g. over `target/sf1emb target/sf1aniso target/sf1ganiso
  * target/sf10` to reproduce the BASELINE separation table.
  */
object SpectrumProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SpectrumProbe <sfDir> [<sfDir>...]")
    val spark = Session.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the isotropic floor: k of d equal eigenvalues
    val d = 64
    println(f"${"tier"}%-24s top1    top2    top4    top8   verdict (floor top4 = ${4.0 / d}%.3f)")
    for (dir <- args) {
      val t0 = System.nanoTime()
      val s = Similarity.spectrumTopShares(spark, dir)
      val dt = (System.nanoTime() - t0) / 1e9
      val verdict =
        if (s(4) >= 2.5 * 4.0 / d) "globally-aligned: build trained/residual IVFADC"
        else "no global low-rank structure: widen the re-rank pool"
      println(f"$dir%-24s ${s(1)}%.4f  ${s(2)}%.4f  ${s(4)}%.4f  ${s(8)}%.4f  $verdict  (${dt}%.1f s)")
      Session.scrubBlocks(spark)
    }
    spark.stop()
  }
}
