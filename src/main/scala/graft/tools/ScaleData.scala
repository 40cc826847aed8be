package graft.tools

import graft.Session
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal generator: replicates an existing testdata tier
  * `factor`× into key-disjoint copies, so the engine can be exercised
  * at 10× (sf1) on this host — converting the 100 TB plan-shape
  * arguments into executed evidence (VERDICT r6 top-next item).
  *
  * Usage: `ScaleData <inSfDir> <outDir> <factor>
  * [skew|clustered|aniso|ganiso|tsnear|tsflood] [fixedvocab]
  * [tables=a,b]` (driver
  * testdata is read-only; write under target/, e.g. `target/sf1`).
  * With `skew`, the same tier is generated under a power-law key
  * distribution (one hot item key, corpus-wide boilerplate text) for
  * the hot-key rehearsal — see the flag comment in `main`.
  *
  * Design — each copy c gets its keys offset by c·10⁹ so copies are
  * referentially consistent but disjoint, which keeps the scale-up
  * LINEAR by construction (join/dedup selectivity per copy is identical
  * to the source tier; cross-copy matches are engineered away). That is
  * the property a scaling rehearsal needs: if a query's runtime grows
  * super-linearly on linearly-grown input, the plan — not the data — is
  * at fault.
  *
  * - `region`/`nation` stay fixed (TPC-H semantics: dims don't scale);
  *   nationkey references remain valid because they are never offset.
  * - `documents` copies (c>0) get a per-token `x<c>` suffix: per-doc
  *   stats (lengths, repetition, within-copy dup structure) are
  *   preserved while shingles/vocab become copy-disjoint — without
  *   this, every doc would gain 9 cross-copy near-clones and pair
  *   outputs would grow quadratically BY INPUT, drowning the engine
  *   signal. n_chars is recomputed to stay consistent.
  * - `embeddings` copies get a per-copy orthogonal transform (dim
  *   rotation by 7c + deterministic sign flips): norms and ALL
  *   within-copy pairwise cosines are exactly preserved, while
  *   cross-copy vectors decorrelate (near-uniform vectors under
  *   different orthogonal maps) — same rationale as documents.
  * - `events.ts` is kept as raw int64 nanoseconds (read with
  *   nanosAsLong): `Tables.loadEvents`' `ts div 1000` conversion works
  *   identically on the plain BIGINT column.
  */
object ScaleData {

  /** Corpus-wide boilerplate injected in skew mode: identical across
    * copies ON PURPOSE, so its shingles become globally-hot posting
    * lists — the df-cap / bucket-size stress the dedup tiers claim to
    * survive.
    */
  private val Boilerplate: String =
    ("all rights reserved this document is provided as is without " +
      "warranty of any kind either express or implied including but " +
      "not limited to the implied warranties of merchantability and " +
      "fitness for a particular purpose see the license text for " +
      "complete details and governing terms").trim

  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, factorS) = args.take(3)
    val factor = factorS.toInt
    // `skew` 4th arg: power-law rehearsal — 30% of event traffic lands
    // on ONE item key (vs 1% uniform), 20% of documents share one
    // corpus-wide boilerplate prefix. Linear-by-construction replication
    // stays intact; only the KEY distribution changes, so a query's
    // skew-vs-uniform ratio isolates hot-key handling (AQE skew join,
    // salting, df caps) from data volume.
    val skew = args.length > 3 && args(3) == "skew"
    // `clustered` 4th arg: mixture-of-Gaussians embeddings — the
    // REALISTIC ANN rehearsal. The uniform tier's embeddings are
    // structure-free (IVF's documented worst case: recall tracks the
    // probed fraction, so stable-recall ANN is linear per query); real
    // corpora cluster, and clustering is where IVF's sublinearity
    // comes from. This tier replaces the embedding payload with
    // 100 deterministic Gaussian clusters (hash-seeded Box–Muller:
    // center ~ N(0,1) per dim, within-cluster noise 0.4·N(0,1);
    // cluster id = hash(vec_id) so it is independent of the vec_id %
    // mod query-panel gate). Keys/row counts stay identical to the
    // uniform tier, so recall/cost deltas isolate DATA STRUCTURE.
    val clustered = args.length > 3 && args(3) == "clustered"
    // `aniso` 4th arg: clustered embeddings with ANISOTROPIC
    // within-cluster noise — per-cluster low-rank covariance (r = 4
    // dominant directions with decaying weights + a small isotropic
    // floor) instead of `clustered`'s isotropic 0.4·N(0,1). This is
    // the geometry where residual (IVFADC) / trained PQ earn their
    // published wins: after the coarse IVF assignment the residual
    // concentrates near a 4-dim subspace of the 64, so a trained
    // codebook can spend its entries on structure a seeded one
    // can't see. The round-11 four-way PQ conclusion ("all variants
    // converge") was measured on the isotropic tier, whose residual
    // has NO low-rank signal for any quantizer — this mode exists to
    // re-measure that claim on the geometry real text embeddings
    // actually have. Total within-cluster std ≈ 0.49 (λ² sum + ε²),
    // matching `clustered`'s 0.4 closely enough that serve-cost
    // comparisons stay apples-to-apples.
    // `ganiso` 4th arg: GLOBALLY-aligned anisotropy — same low-rank
    // model as `aniso` but the 4 dominant directions are drawn ONCE
    // for the whole corpus instead of per cluster. The round-13 aniso
    // four-way measured that per-cluster-random directions aggregate
    // to isotropy across clusters (the shared codebook quantizes the
    // superposition of 100 different 4-dim subspaces — no exploitable
    // structure), so this is the geometry where trained / residual PQ
    // can actually separate: a corpus-wide shared low-rank spectrum,
    // the PCA-decay shape real text embeddings exhibit.
    val ganiso = args.length > 3 && args(3) == "ganiso"
    val aniso = ganiso || (args.length > 3 && args(3) == "aniso")
    // `tsnear` 4th arg: planted-structure TIME-SERIES tier — the TS
    // twin of `clustered` (round 13's sf1emb precedent). The uniform
    // generator's series are structure-free AND threshold-degenerate
    // (ts_paa_recall r15: max pair dist² 404 vs threshold 1936 — every
    // pair qualifies, so PAA recall == collided fraction and the
    // quantizer knob cannot be justified by measurement). This mode
    // re-days every event so each user's series concentrates on TWO
    // template-derived active days (per-day ≈ n/2 ≈ 33 counts):
    // different-template pairs sit at dist² ≈ 4·33² ≈ 4356 — ABOVE the
    // 16·step² = 1936 threshold (step stays 11: same totals, same
    // users) — while twin pairs (u, u+1) at u ≡ 0 (mod 20) share a
    // template (a NEGATIVE group id, disjoint from the unique positive
    // per-user templates) and differ only by multinomial noise,
    // dist² ≈ 10²-10³ ≪ 1936. Ground truth becomes SPARSE (≈1 twin
    // per panel user + the near-threshold tail of single-shared-day
    // pairs), so signature recall finally measures selectivity, not
    // the collided fraction. Twin structure survives key offsetting
    // (10⁹ ≡ 0 mod 20) and panel gating (panel ids are multiples of
    // 100c mod the panel modulus — all ≡ 0 mod 20, i.e. twin lower
    // members). Events only (`tables=events` recommended).
    val tsnear = args.length > 3 && args(3) == "tsnear"
    // `tsflood` 4th arg: identical-series-pattern flood — the TS skew
    // rehearsal (the boilerplate case the PAA cap exists for, the
    // round-9 LSH `skew` twin). 20 % of users (hash-gated) get their
    // events re-dayed uniformly by event-id hash: every flood user's
    // series is ≈ flat n/30-per-day, all segment sums quantize to the
    // same signature, and the collision bucket carries Θ(0.2·n) users
    // — the O(occ²) input the uncapped self-join must not survive and
    // the capped tier must.
    val tsflood = args.length > 3 && args(3) == "tsflood"
    // `fixedvocab` arg (composes with `tables=`): documents replicate
    // WITHOUT the per-token copy suffix, so the corpus grows ×factor
    // while the token/n-gram VOCABULARY stays exactly the source
    // tier's. This is the control for the decade-table attribution
    // claim that `ngram_diversity` (27×/decade) and `lang_id_eval`
    // (22.5×) are agg-state-growth artifacts of the suffixing
    // generator, not plan defects: under fixed vocab their agg state
    // is constant, so a linear re-measure proves the claim and a
    // still-superlinear one exposes a real plan problem. NOT valid
    // for dedup/pair tiers — every doc gains factor−1 exact
    // cross-copy clones by construction (that's the point of the
    // suffix this mode removes).
    val fixedVocab = args.drop(3).contains("fixedvocab")
    // optional 5th arg `tables=a,b,c`: generate only the named tables
    // (e.g. `tables=documents` for the sf10 dedup rehearsal — 100×
    // lineitem/events would cost minutes and GBs the rehearsal never
    // reads). Default: all tables.
    val onlyTables: Option[Set[String]] = args.drop(3)
      .find(_.startsWith("tables="))
      .map(_.stripPrefix("tables=").split(',').map(_.trim).toSet)
    def wanted(name: String): Boolean = onlyTables.forall(_.contains(name))
    require(factor >= 1 && factor <= 1000, s"unreasonable factor $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Session.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val Off = 1000000000L // key stride between copies; max source key << 10^9
    val copies = broadcast(
      spark.range(factor).select(col("id").as("c")))
    def read(name: String): DataFrame =
      spark.read.parquet(s"$inDir/$name.parquet")
    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")

    /** Replicate ×factor, offset `keyCols` per copy, apply `extra`
      * perturbations, restore the source column order. */
    def rep(name: String, keyCols: Seq[String], parts: Int,
            extra: DataFrame => DataFrame = identity): Unit = {
      if (!wanted(name)) return
      val src = read(name)
      var df = src.crossJoin(copies)
      for (k <- keyCols) df = df.withColumn(k, col(k) + col("c") * Off)
      write(extra(df).select(src.columns.map(col).toIndexedSeq: _*),
        name, parts)
      println(s"[scale] $name x$factor done")
    }

    if (wanted("region")) write(read("region"), "region", 1)
    if (wanted("nation")) write(read("nation"), "nation", 1)
    rep("customer", Seq("c_custkey"), 2)
    rep("supplier", Seq("s_suppkey"), 1)
    rep("part", Seq("p_partkey"), 2)
    rep("orders", Seq("o_orderkey", "o_custkey"), 8)
    // skew: 5 % of line items rewritten to ONE hot part per copy — a
    // celebrity hub that ends up co-purchased with essentially every
    // part in its copy (degree ≈ |parts| vs ~120 uniform). This is the
    // input that makes any unoriented wedge enumeration explode by the
    // hub's deg² term; the degree-oriented edge-iterator must absorb it
    // (hub edges all point INTO the hub → zero wedges from the hub).
    rep("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"), 16, df =>
      if (!skew) df
      else df.withColumn("l_partkey",
        when(pmod(hash(col("l_orderkey") * 7 + col("l_linenumber")),
          lit(100)) < 5, col("c") * Off + 1L)
          .otherwise(col("l_partkey"))))
    // re-day an event while preserving its time-of-day and the
    // TIMESTAMP_NTZ type (timestampadd keeps the operand type)
    def reDay(dayExpr: String): String =
      s"timestampadd(DAY, ($dayExpr) " +
        "- datediff(to_date(ts), date'2024-01-01'), ts)"
    rep("events", Seq("event_id", "user_id"), 8, df =>
      if (tsnear)
        // twins share a negative template id (disjoint from the unique
        // positive per-user ids, so no accidental active-day sharing);
        // each event lands on one of the template's two hash-drawn
        // active days, chosen by its own id hash
        df.withColumn("tmpl", expr(
            "case when user_id % 20 < 2 then -(user_id div 20) - 1 " +
              "else user_id end"))
          .withColumn("ts", expr(reDay(
            "pmod(hash(tmpl, pmod(hash(event_id), 2), 'tsnear'), 30)")))
          .drop("tmpl")
      else if (tsflood)
        df.withColumn("ts", expr(
          "case when pmod(hash(user_id, 'flood'), 100) < 20 then " +
            reDay("pmod(hash(event_id), 30)") + " else ts end"))
      else if (!skew) df
      else df.withColumn("props",
        when(pmod(hash(col("event_id")), lit(100)) < 30,
          lit("""{"k": 7}""")).otherwise(col("props"))))
    rep("documents", Seq("doc_id"), 8, df => {
      val suffixed = if (fixedVocab) df else df.withColumn("text",
        when(col("c") === 0, col("text")).otherwise(
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit("x"), col("c"))), " ")))
      val maybeHot =
        if (!skew) suffixed
        else suffixed.withColumn("text",
          when(pmod(hash(col("doc_id")), lit(100)) < 20,
            concat(lit(Boilerplate + " "), col("text")))
            .otherwise(col("text")))
      maybeHot.withColumn("n_chars", length(col("text")).cast("long"))
    })
    // deterministic standard normal from hash seeds (Box–Muller over
    // two hash-derived uniforms in (0,1)); `seed` must be distinct
    // per use site or the draws correlate
    def gauss(seedA: String, seed: Int): String =
      s"""(sqrt(-2.0 * ln((pmod(hash($seedA, i, $seed), 1048576) + 0.5) / 1048576.0))
         | * cos(6.283185307179586
         |       * (pmod(hash($seedA, i, ${seed + 1}), 1048576) + 0.5) / 1048576.0))""".stripMargin
    // per-vector scalar draw (no dim dependence) — the z_j mixture
    // weights of the low-rank noise model; distinct seed pairs per use
    def gaussNoI(seedA: String, seed: Int): String =
      s"""(sqrt(-2.0 * ln((pmod(hash($seedA, $seed), 1048576) + 0.5) / 1048576.0))
         | * cos(6.283185307179586
         |       * (pmod(hash($seedA, ${seed + 1}), 1048576) + 0.5) / 1048576.0))""".stripMargin
    rep("embeddings", Seq("vec_id"), 4, df =>
      if (aniso) {
        // v = center(g) + Σ_j λ_j·z_j(vec)·d_j(g) + ε·iso(vec):
        // d_j are 4 hash-drawn directions PER CLUSTER (per-dim unit
        // variance, so λ_j² is each rank's per-dim noise variance);
        // z_j are per-vector N(0,1) scalars. λ = (.35,.25,.18,.12),
        // ε = .08 ⇒ 97 % of within-cluster variance lives in a 4-dim
        // subspace of the 64 — the low-rank residual signal the PQ
        // four-way re-measurement needs. cluster id = hash(vec_id),
        // independent of the vec_id % mod query-panel gate (same as
        // `clustered`).
        val g = "pmod(hash(vec_id), 100)"
        // direction seed: per-cluster (aniso) or one corpus-wide
        // constant (ganiso — globally aligned low-rank spectrum)
        val dirSeed = if (ganiso) "777" else g
        val lowRank = Seq(0.35, 0.25, 0.18, 0.12).zipWithIndex
          .map { case (l, j) =>
            s"$l * ${gaussNoI("vec_id", 201 + 2 * j)} * ${gauss(dirSeed, 101 + 2 * j)}" }
          .mkString("\n  + ")
        df.withColumn("embedding", expr(
          s"""transform(sequence(0, 63), i -> cast(
             |  ${gauss(g, 11)}
             |  + $lowRank
             |  + 0.08 * ${gauss("vec_id", 17)} as float))""".stripMargin))
      }
      else if (clustered)
        // cluster(vec_id) center + 0.4 × per-vector noise, all dims
        df.withColumn("embedding", expr(
          s"""transform(sequence(0, 63), i -> cast(
             |  ${gauss("pmod(hash(vec_id), 100)", 11)}
             |  + 0.4 * ${gauss("vec_id", 17)} as float))""".stripMargin))
      else df.withColumn("embedding",
        when(col("c") === 0, col("embedding")).otherwise(expr(
          // orthogonal per-copy map: sign-flip × dim-rotation (0-based
          // Spark array indexing); float arithmetic on float inputs
          """transform(sequence(0, 63), i ->
            |  (case when pmod(hash(c, i), 2) = 0
            |        then cast(1.0 as float) else cast(-1.0 as float) end)
            |  * embedding[pmod(i + c * 7, 64)])""".stripMargin))))
    spark.stop()
  }
}
