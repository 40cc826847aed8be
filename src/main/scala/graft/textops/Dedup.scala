package graft.textops

import graft.Tables
import graft.textops.TextHash._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines, over `documents`.
  *
  * Four tiers, all deterministic and DuckDB-oracled:
  *   - exact: hash-groupBy on full text
  *   - MinHash+LSH: shingle → K minhashes → banded bucket-join — the
  *     classic near-dup pipeline (Broder '97); candidate generation is
  *     an equi-join on (band, hash), NEVER an O(n²) cross join, so the
  *     plan scales: at 100 TB the band join shuffles each doc's 4 band
  *     rows, not n² pairs.
  *   - SimHash: 32-bit weighted-bit fingerprint + pigeonhole byte-block
  *     candidate join (hamming ≤ 3 ⇒ some 8-bit block equal ⇒ exact,
  *     not approximate, candidate recall).
  *   - n-gram Jaccard: inverted-index equi-join on shingle strings with
  *     exact set-overlap arithmetic.
  *
  * The reference has no dedup surface; its nearest analog is the
  * UvWithBloom membership sketch (REF: NetworkFlowAnalysis/…/
  * UvWithBloom.scala § Bloom — reconstructed, SURVEY.md §0); these are
  * the LLM-pipeline generalization the build brief calls for.
  */
object Dedup {

  /** Exact dedup: one row per distinct text, keeper = min doc_id. */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .groupBy($"text")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("dup_cnt"))
      .select($"keep_id", $"dup_cnt")
      .orderBy($"keep_id")
  }

  val dedupExactOracle: String =
    """SELECT min(doc_id) AS keep_id, count(*) AS dup_cnt
      |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin

  // ---------------------------------------------------------------- minhash

  private val SH = 1000003L // shingle-combine multiplier

  /** doc_id + K minhash signature columns s0..s{K-1}. */
  private def minhashSig(spark: SparkSession, sfDir: String): DataFrame = {
    val sigCols = (0 until K).map(j =>
      s"array_min(transform(sh, v$j -> (v$j * ${MinhashA(j)} + ${MinhashB(j)}) % $P)) as s$j")
    Tables.documents(spark, sfDir)
      .selectExpr("doc_id", s"$tokensSpark as tokens")
      .where("size(tokens) >= 3")
      .selectExpr("doc_id", s"transform(tokens, tk -> ${phSpark("tk", "h")}) as th")
      .selectExpr("doc_id",
        s"""transform(sequence(0, size(th) - 3), sj ->
           |  ((element_at(th, sj + 1) * $SH + element_at(th, sj + 2)) % $P
           |   * $SH + element_at(th, sj + 3)) % $P) as sh""".stripMargin)
      .selectExpr(("doc_id" +: sigCols): _*)
  }

  /** Near-dup pairs via banded MinHash LSH (bands of 2, K/2 bands),
    * estimated Jaccard = matching-signature fraction ≥ threshold.
    */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sig = minhashSig(spark, sfDir).cache()
    val bands = (0 until K / 2).map { b =>
      sig.selectExpr("doc_id", s"$b as band_idx",
        s"(s${2 * b} * $SH + s${2 * b + 1}) % $P as band_hash")
    }.reduce(_.union(_))
    val pairs = bands.as("x")
      .join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"))
      .distinct()
    val a = sig.select(col("doc_id").as("doc1") +: (0 until K).map(j => col(s"s$j").as(s"a$j")): _*)
    val b = sig.select(col("doc_id").as("doc2") +: (0 until K).map(j => col(s"s$j").as(s"b$j")): _*)
    val simExpr = (0 until K)
      .map(j => s"(case when a$j = b$j then 1 else 0 end)").mkString(" + ")
    pairs.join(a, "doc1").join(b, "doc2")
      .withColumn("sim", expr(s"($simExpr) / ${K}.0"))
      .where($"sim" >= 0.5)
      .select($"doc1", $"doc2", $"sim")
      .orderBy($"doc1", $"doc2")
  }

  val minhashLshOracle: String = {
    val sigCols = (0 until K).map(j =>
      s"list_min(list_transform(sh, v$j -> (v$j * ${MinhashA(j)} + ${MinhashB(j)}) % $P)) AS s$j")
      .mkString(",\n         ")
    val bandSelects = (0 until K / 2).map(b =>
      s"SELECT doc_id, $b AS band_idx, (s${2 * b} * $SH + s${2 * b + 1}) % $P AS band_hash FROM sig")
      .mkString("\n  UNION ALL ")
    val simExpr = (0 until K)
      .map(j => s"(CASE WHEN a.s$j = b.s$j THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, $tokensDuck AS tokens FROM documents
       |), th AS (
       |  SELECT doc_id, list_transform(tokens, tk -> ${phDuck("tk", "h")}) AS tharr
       |  FROM toks WHERE len(tokens) >= 3
       |), sh AS (
       |  SELECT doc_id, list_transform(range(0, len(tharr) - 2), sj ->
       |    ((tharr[sj + 1] * $SH + tharr[sj + 2]) % $P
       |     * $SH + tharr[sj + 3]) % $P) AS sh FROM th
       |), sig AS (
       |  SELECT doc_id, $sigCols FROM sh
       |), bands AS (
       |  $bandSelects
       |), pairs AS (
       |  SELECT DISTINCT x.doc_id AS doc1, y.doc_id AS doc2
       |  FROM bands x JOIN bands y ON x.band_idx = y.band_idx
       |    AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
       |)
       |SELECT p.doc1, p.doc2, ($simExpr) / ${K}.0 AS sim
       |FROM pairs p JOIN sig a ON p.doc1 = a.doc_id JOIN sig b ON p.doc2 = b.doc_id
       |WHERE ($simExpr) / ${K}.0 >= 0.5
       |ORDER BY doc1, doc2""".stripMargin
  }

  // ---------------------------------------------------------------- simhash

  /** doc_id + 32-bit simhash fingerprint from token-hash bit weights. */
  private def simhashSig(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .selectExpr("doc_id", s"$tokensSpark as tokens")
      .where("size(tokens) >= 1")
      .selectExpr("doc_id", s"transform(tokens, tk -> ${phSpark("tk", "h")}) as th")
      .selectExpr("doc_id",
        """aggregate(transform(sequence(0, 31), bi ->
          |  case when aggregate(th, cast(0 as bigint),
          |         (ab, hb) -> ab + ((shiftright(hb, bi) & 1) * 2 - 1)) > 0
          |  then shiftleft(cast(1 as bigint), bi) else cast(0 as bigint) end),
          |  cast(0 as bigint), (sa, sx) -> sa + sx) as simhash""".stripMargin)
  }

  /** Near-dup pairs with hamming(simhash) ≤ 3 via 4×8-bit block
    * pigeonhole candidates (≤3 flipped bits over 4 blocks ⇒ at least
    * one block identical — candidate set provably complete).
    */
  def simhashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sig = simhashSig(spark, sfDir).cache()
    val blocks = (0 until 4).map { blk =>
      sig.selectExpr("doc_id", s"$blk as pos",
        s"(shiftright(simhash, ${8 * blk}) & 255) as byte_val")
    }.reduce(_.union(_))
    val pairs = blocks.as("x")
      .join(blocks.as("y"),
        col("x.pos") === col("y.pos") &&
          col("x.byte_val") === col("y.byte_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"))
      .distinct()
    pairs
      .join(sig.select($"doc_id".as("doc1"), $"simhash".as("sh1")), "doc1")
      .join(sig.select($"doc_id".as("doc2"), $"simhash".as("sh2")), "doc2")
      .withColumn("hamming", expr("bit_count(sh1 ^ sh2)"))
      .where($"hamming" <= 3)
      .select($"doc1", $"doc2", $"hamming")
      .orderBy($"doc1", $"doc2")
  }

  val simhashDedupOracle: String = {
    val blockSelects = (0 until 4).map(blk =>
      s"SELECT doc_id, $blk AS pos, (simhash >> ${8 * blk}) & 255 AS byte_val FROM sig")
      .mkString("\n  UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id, $tokensDuck AS tokens FROM documents
       |), th AS (
       |  SELECT doc_id, list_transform(tokens, tk -> ${phDuck("tk", "h")}) AS tharr
       |  FROM toks WHERE len(tokens) >= 1
       |), sig AS (
       |  SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(range(0, 32), bi ->
       |      CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
       |             list_transform(tharr, hb -> ((hb >> bi) & 1) * 2 - 1)),
       |             (ab, xb) -> ab + xb) > 0
       |      THEN (CAST(1 AS BIGINT) << bi) ELSE CAST(0 AS BIGINT) END)),
       |    (sa, sx) -> sa + sx) AS simhash FROM th
       |), blocks AS (
       |  $blockSelects
       |), pairs AS (
       |  SELECT DISTINCT x.doc_id AS doc1, y.doc_id AS doc2
       |  FROM blocks x JOIN blocks y ON x.pos = y.pos
       |    AND x.byte_val = y.byte_val AND x.doc_id < y.doc_id
       |)
       |SELECT p.doc1, p.doc2, bit_count(xor(a.simhash, b.simhash)) AS hamming
       |FROM pairs p JOIN sig a ON p.doc1 = a.doc_id JOIN sig b ON p.doc2 = b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       |ORDER BY doc1, doc2""".stripMargin
  }

  // ------------------------------------------------------------- 3-gram jaccard

  /** Exact n-gram Jaccard near-dup via inverted-index join: explode
    * distinct token 3-grams, equi-join on the shingle, exact
    * |A∩B| / (|A|+|B|−|A∩B|) ≥ threshold. No cross join anywhere.
    */
  def ngramJaccard(spark: SparkSession, sfDir: String, threshold: Double = 0.2): DataFrame = {
    import spark.implicits._
    val shingled = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", s"$tokensSpark as tokens")
      .where("size(tokens) >= 3")
      .selectExpr("doc_id",
        """array_distinct(transform(sequence(0, size(tokens) - 3), gi ->
          |  concat_ws(' ', slice(tokens, gi + 1, 3)))) as shingles""".stripMargin)
      .cache()
    val sizes = shingled.selectExpr("doc_id", "size(shingles) as n_sh")
    val inv = shingled.selectExpr("doc_id", "explode(shingles) as sh")
    val inter = inv.as("x").join(inv.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"))
      .agg(count(lit(1)).as("inter_cnt"))
    inter
      .join(sizes.select($"doc_id".as("doc1"), $"n_sh".as("n1")), "doc1")
      .join(sizes.select($"doc_id".as("doc2"), $"n_sh".as("n2")), "doc2")
      .withColumn("jaccard",
        expr("cast(inter_cnt as double) / (n1 + n2 - inter_cnt)"))
      .where($"jaccard" >= threshold)
      .select($"doc1", $"doc2", $"inter_cnt", $"jaccard")
      .orderBy($"doc1", $"doc2")
  }

  val ngramJaccardOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, $tokensDuck AS tokens FROM documents
       |), shingled AS (
       |  SELECT doc_id, list_distinct(list_transform(range(0, len(tokens) - 2), gi ->
       |    array_to_string(tokens[gi + 1 : gi + 3], ' '))) AS shingles
       |  FROM toks WHERE len(tokens) >= 3
       |), sizes AS (
       |  SELECT doc_id, len(shingles) AS n_sh FROM shingled
       |), inv AS (
       |  SELECT doc_id, unnest(shingles) AS sh FROM shingled
       |), inter AS (
       |  SELECT x.doc_id AS doc1, y.doc_id AS doc2, count(*) AS inter_cnt
       |  FROM inv x JOIN inv y ON x.sh = y.sh AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT i.doc1, i.doc2, i.inter_cnt,
       |       CAST(i.inter_cnt AS DOUBLE) / (s1.n_sh + s2.n_sh - i.inter_cnt) AS jaccard
       |FROM inter i
       |JOIN sizes s1 ON i.doc1 = s1.doc_id
       |JOIN sizes s2 ON i.doc2 = s2.doc_id
       |WHERE CAST(i.inter_cnt AS DOUBLE) / (s1.n_sh + s2.n_sh - i.inter_cnt) >= 0.2
       |ORDER BY doc1, doc2""".stripMargin
}
