package graft.tools

import graft.Session
import graft.analytics.TimeSeriesAnalytics
import org.apache.spark.sql.functions._

/** PAA funnel probe for the big scale tiers —
  * `runMain graft.tools.PaaProbe <sfDir> [cap]`.
  *
  * Prints the occupancy geometry (occ agg only — NO uncapped pair
  * join, so it is safe at the ×1000 flood tier where
  * `ts_paa_candidate_stats`' diagnostic pair pass would expand ~18 G
  * rows) plus the live counts of the two bounded serving forms: the
  * capped pair tier's output and pair-covered user set, and the star
  * tier's member rows (one per covered member by construction — the
  * coverage number the round-17 keeper form exists to restore).
  */
object PaaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cap = if (args.length > 1) args(1).toInt else -1
    val spark = Session.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val ranked = TimeSeriesAnalytics.paaRankedFor(spark, sfDir)
      .localCheckpoint()
    val n = ranked.count()
    val c = if (cap > 0) cap else TimeSeriesAnalytics.autoSigCap(n)
    val occ = ranked.groupBy($"sig").agg(count(lit(1)).as("occ"))
    val row = occ.agg(
      count(lit(1)).as("n_sigs"),
      max($"occ").as("occ_max"),
      sum(expr("occ * (occ - 1) div 2")).as("cand_full"),
      sum(expr(s"least(occ, $c) * (least(occ, $c) - 1) div 2"))
        .as("cand_capped"),
      sum(expr(s"least(occ, $c) * (least(occ, $c) - 1) div 2" +
        s" + (occ - least(occ, $c)) * least(occ, $c)")).as("cand_star"))
      .head()
    println(s"PAAPROBE users=$n cap=$c n_sigs=${row.getLong(0)} " +
      s"occ_max=${row.getLong(1)} cand_full=${row.getLong(2)} " +
      s"cand_capped=${row.getLong(3)} cand_star=${row.getLong(4)}")
    Session.scrubBlocks(spark)
    val pairs = TimeSeriesAnalytics.tsSimilarityPaaCapped(spark, sfDir,
      cap = c).localCheckpoint()
    val np = pairs.count()
    val pairUsers = pairs.select($"u1".as("u"))
      .unionAll(pairs.select($"u2".as("u"))).distinct().count()
    Session.scrubBlocks(spark)
    val members = TimeSeriesAnalytics.tsPaaMembers(spark, sfDir,
      cap = c).count()
    println(s"PAAPROBE pairs_capped=$np pair_covered_users=$pairUsers " +
      s"member_rows=$members")
    spark.stop()
  }
}
