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
    // the isotropic floor: k of d equal eigenvalues. The verdict keys
    // on the RESIDUAL spectrum — the raw corpus spectrum conflates
    // cluster-center geometry with the within-cell noise the PQ
    // codebook actually quantizes (see embeddingSpectrumResidual)
    val d = 64
    println(f"${"tier"}%-24s raw: top1/top4      residual: top1/top4   " +
      f"verdict (floor top4 = ${4.0 / d}%.3f)")
    for (dir <- args) {
      val t0 = System.nanoTime()
      val raw = Similarity.spectrumTopShares(spark, dir)
      val res = Similarity.spectrumTopShares(spark, dir, residual = true)
      val dt = (System.nanoTime() - t0) / 1e9
      // decision boundary 0.35, anchored between the measured tier
      // populations (sf1, trained-assignment residual share(top4)):
      // ganiso 0.540 — the geometry where residual PQ separates (r13:
      // pool-100 agree 0.937) — vs clustered 0.209 / per-cluster-aniso
      // 0.185 / uniform 0.071, where every PQ variant converges. A
      // 2-round Lloyd assignment never fully recovers the true
      // clusters, so clustered corpora keep a center-geometry floor
      // near ~0.2 — the boundary must sit above it, not at the
      // isotropic 2.5×floor
      val verdict =
        if (res(4) >= 0.35)
          "globally-aligned residual: build trained/residual IVFADC"
        else "residual ~isotropic/center-bound: widen the re-rank pool"
      println(f"$dir%-24s ${raw(1)}%.4f/${raw(4)}%.4f      " +
        f"${res(1)}%.4f/${res(4)}%.4f        $verdict  (${dt}%.1f s)")
      Session.scrubBlocks(spark)
    }
    spark.stop()
  }
}
