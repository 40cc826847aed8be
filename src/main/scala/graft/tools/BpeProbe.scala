package graft.tools

import graft.{Session, Tables}
import graft.textops.{Bpe, TextHash}
import org.apache.spark.sql.functions._

/** Merge-round scaling law for the distributed BPE trainer — the
  * measurement behind the BASELINE "BPE merge rounds" row (VERDICT
  * r11 ask #5). The serving `bpe_train` unrolls R = 4 rounds
  * (oracle-replayable in DuckDB); a real tokenizer build runs
  * thousands, and the distributed cost model is the known pain: ONE
  * job round per merge, pair stats RE-AGGREGATED over the whole
  * vocabulary every round. This probe drives [[Bpe.round]] R times
  * and prints, per round:
  *
  *   - `sec` — the round's wall time (pair agg + argmax + merge apply
  *     + eager vocab checkpoint): the re-aggregation cost model.
  *   - `affected` / `vocab` — how many words actually CONTAIN the
  *     merged pair (computed off the pre-merge vocabulary, untimed):
  *     the work an incremental pair-stat cache (only re-scan words
  *     touched by the last merge, as single-node trainers do) would
  *     pay instead. affected/vocab is therefore the per-round speedup
  *     bound for pair-stat caching: caching pays from the first round
  *     where affected_frac ≪ 1 and its advantage grows as merges get
  *     rarer — but it turns the vocabulary into mutable keyed state
  *     (a shuffle per round on the affected slice + a merge back),
  *     which is why the unrolled re-aggregation form stays the
  *     shipped trainer at R = 4.
  *
  * Usage: `BpeProbe <sfDir> [rounds=16]`
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 16
    require(rounds >= 1 && rounds <= 4096, s"unreasonable rounds $rounds")
    val spark = Session.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val words = Tables.documents(spark, sfDir)
      .selectExpr(s"explode(${TextHash.tokensSpark}) as word")
      .groupBy("word").agg(count(lit(1)).cast("long").as("freq"))
    var seqs = words
      .selectExpr("word", "freq",
        "transform(sequence(1, length(word)), ci -> substring(word, ci, 1)) as seq")
      .localCheckpoint()
    val vocab = seqs.count()
    println(s"bpe_probe sf=$sfDir vocab_words=$vocab rounds=$rounds")
    var total = 0.0
    for (r <- 1 to rounds) {
      val t0 = System.nanoTime()
      val (best, applied, _) = Bpe.round(spark, seqs, r)
      val sec = (System.nanoTime() - t0) / 1e9
      total += sec
      // untimed: the incremental-cache work bound — words containing
      // the merged pair, counted on the PRE-merge vocabulary
      val b = best.head()
      val (lft, rgt, pc) =
        (b.getString(1), b.getString(2), b.getLong(3))
      // typed Column predicate — merge symbols go in via lit(), never
      // SQL-interpolated (Spark SQL has no ''-doubling escape: adjacent
      // string literals CONCATENATE, and backslashes pass through raw,
      // so a quote/backslash-bearing merge would miscount or misparse)
      val affected = seqs.where(exists(
        when(size(col("seq")) < 2, array().cast("array<int>"))
          .otherwise(sequence(lit(1), size(col("seq")) - 1)),
        i => element_at(col("seq"), i) === lit(lft) &&
          element_at(col("seq"), i + lit(1)) === lit(rgt))).count()
      Bpe.unpersistCk(seqs)
      seqs = applied
      println(f"bpe_probe round=$r%-3d sec=$sec%.2f merge='$lft$rgt' " +
        f"pair_count=$pc%d affected=$affected%d " +
        f"affected_frac=${affected.toDouble / vocab}%.4f")
    }
    println(f"bpe_probe total rounds=$rounds total_s=$total%.1f " +
      f"sec_per_round=${total / rounds}%.2f")
    spark.stop()
  }
}
