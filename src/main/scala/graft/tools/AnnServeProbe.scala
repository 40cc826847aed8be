package graft.tools

import graft.{Session, Tables}
import graft.textops.Pipelines
import org.apache.spark.sql.functions._

/** Sizes and times the two STORED ANN serving tiers against one
  * snapshot directory: the full-vector IVF scan (`ann_assign`,
  * 512 B/vector of raw doubles) vs the PQ ADC scan (`pq_codes`,
  * 8 codes + a norm per vector) — the footprint-vs-compute trade the
  * in-memory bench can't show (similarity_pq is diagnostic-tier
  * precisely because a codegen'd 64-wide re-dot beats LUT adds when
  * the vectors are already in memory; the stored index is where the
  * codes' smaller scan pays). Prints, per tier: on-disk index bytes,
  * median serve seconds for the full corpus-as-queries batch, and the
  * PQ tier's top-k agreement with the full-vector serve (the ADC
  * ranking loss — candidates are identical by construction, so any
  * disagreement is quantization, not pruning).
  * Usage: `AnnServeProbe <sfDir> [reps=3] [outDir=tmp]`
  */
object AnnServeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val dir = if (args.length > 2) args(2)
              else java.nio.file.Files.createTempDirectory("graftannserve").toString
    val spark = Session.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def scrub(): Unit = Session.scrubBlocks(spark)

    Pipelines.materializeAnn(spark, sfDir, dir)
    Pipelines.materializePq(spark, sfDir, dir)
    scrub()

    def duBytes(p: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try s.filter(f => java.nio.file.Files.isRegularFile(f))
        .mapToLong(f => java.nio.file.Files.size(f)).sum()
      finally s.close()
    }
    val queries = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")

    def timeIt(f: => Long): Double = {
      f; scrub() // untimed warm pass (codegen/JIT — the Bench convention)
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        scrub(); dt
      }.sorted.apply(reps / 2)
    }
    val fullB = duBytes(s"$dir/ann_assign")
    val pqB = duBytes(s"$dir/pq_codes") + duBytes(s"$dir/pq_codebook")
    val fullS = timeIt(
      Pipelines.annSearchFrom(spark, dir, queries, excludeSelfId = true).count())
    val pqS = timeIt(
      Pipelines.annSearchPqFrom(spark, dir, queries, excludeSelfId = true).count())
    // rank-agreement of the ADC serve with the full-precision serve on
    // the same stored candidates: |top-k ∩ top-k| / |top-k|. defs, not
    // vals: the inter-measurement scrub releases localCheckpoint
    // blocks, so a frame built before a scrub cannot be reused after
    def fullTop = Pipelines.annSearchFrom(spark, dir, queries,
      excludeSelfId = true).select($"query_id", $"neighbor_id")
    def pqTop = Pipelines.annSearchPqFrom(spark, dir, queries,
      excludeSelfId = true).select($"query_id", $"neighbor_id")
    val agree = pqTop.join(fullTop, Seq("query_id", "neighbor_id"))
      .count().toDouble / math.max(fullTop.count(), 1L)
    scrub()
    println(f"ann_serve full_vec bytes=$fullB%d serve_s=$fullS%.2f")
    println(f"ann_serve pq_codes bytes=$pqB%d serve_s=$pqS%.2f " +
      f"bytes_ratio=${fullB.toDouble / pqB}%.1f topk_agree=$agree%.3f")
    // the standard remedy, measured: widen the ADC pool and exact-
    // re-rank the survivors with a pool-per-query id-join against the
    // full-precision store — recovers agreement at a bounded extra
    // cost (the scan is still codes-only; full vectors are read for
    // pool rows per query, not per candidate)
    val vecs = spark.read.parquet(s"$dir/ann_assign")
      .select($"vec_id".as("neighbor_id"), $"v".as("nv"), $"nrm".as("nn"))
    val qside = queries
      .selectExpr("vec_id as query_id", "v as qv", "sqrt(vec_dot(v, v)) as qn")
    def rerank(d: String, pool: Int) = Pipelines
      .annSearchPqFrom(spark, d, queries, k = pool, excludeSelfId = true)
      .join(vecs, "neighbor_id").join(qside, "query_id")
      .withColumn("cosine", expr("vec_dot(qv, nv) / (qn * nn)"))
      .withColumn("rrk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
          .orderBy($"cosine".desc, $"neighbor_id".asc)))
      .where($"rrk" <= 5)
      .select($"query_id", $"neighbor_id")
    for (pool <- Seq(25, 100)) {
      val rrS = timeIt(rerank(dir, pool).count())
      val agreeRr = rerank(dir, pool)
        .join(fullTop, Seq("query_id", "neighbor_id"))
        .count().toDouble / math.max(fullTop.count(), 1L)
      scrub()
      println(f"ann_serve pq_rerank pool=$pool%d serve_s=$rrS%.2f " +
        f"topk_agree=$agreeRr%.3f")
    }
    // Lloyd-trained codebook tier: same snapshot layout, trained PqK
    // entries per subspace — the build-side fix for the seeded
    // codebook's in-cluster discrimination collapse
    val tdir = s"$dir-trained"
    Pipelines.materializePq(spark, sfDir, tdir, trainRounds = 2)
    scrub()
    val pqTS = timeIt(Pipelines.annSearchPqFrom(spark, tdir, queries,
      excludeSelfId = true).count())
    val agreeT = Pipelines.annSearchPqFrom(spark, tdir, queries,
        excludeSelfId = true).select($"query_id", $"neighbor_id")
      .join(fullTop, Seq("query_id", "neighbor_id"))
      .count().toDouble / math.max(fullTop.count(), 1L)
    scrub()
    println(f"ann_serve pq_trained serve_s=$pqTS%.2f topk_agree=$agreeT%.3f")
    for (pool <- Seq(25, 100)) {
      val agreeRr = rerank(tdir, pool)
        .join(fullTop, Seq("query_id", "neighbor_id"))
        .count().toDouble / math.max(fullTop.count(), 1L)
      scrub()
      println(f"ann_serve pq_trained_rerank pool=$pool%d topk_agree=$agreeRr%.3f")
    }
    // capacity tier: 64 seeded entries per subspace (4× the live
    // tier's PqK=16) — the hypothesis that codebook CAPACITY, not
    // training, binds in-cluster discrimination
    val kdir = s"$dir-k64"
    Pipelines.materializePq(spark, sfDir, kdir, codebookK = 64)
    scrub()
    val kB = duBytes(s"$kdir/pq_codes") + duBytes(s"$kdir/pq_codebook")
    val pqKS = timeIt(Pipelines.annSearchPqFrom(spark, kdir, queries,
      excludeSelfId = true).count())
    val agreeK = Pipelines.annSearchPqFrom(spark, kdir, queries,
        excludeSelfId = true).select($"query_id", $"neighbor_id")
      .join(fullTop, Seq("query_id", "neighbor_id"))
      .count().toDouble / math.max(fullTop.count(), 1L)
    scrub()
    println(f"ann_serve pq_k64 bytes=$kB%d serve_s=$pqKS%.2f topk_agree=$agreeK%.3f")
    for (pool <- Seq(25)) {
      val agreeRr = rerank(kdir, pool)
        .join(fullTop, Seq("query_id", "neighbor_id"))
        .count().toDouble / math.max(fullTop.count(), 1L)
      scrub()
      println(f"ann_serve pq_k64_rerank pool=$pool%d topk_agree=$agreeRr%.3f")
    }
    // residual tier (IVFADC): codes quantize r = v − cell centroid —
    // the published fix for the in-cluster collapse the raw tiers
    // measure above; trained 2 rounds on the residuals
    val rdir = s"$dir-residual"
    Pipelines.materializePq(spark, sfDir, rdir, trainRounds = 2,
      residual = true)
    scrub()
    val pqRS = timeIt(Pipelines.annSearchPqFrom(spark, rdir, queries,
      excludeSelfId = true).count())
    val agreeR = Pipelines.annSearchPqFrom(spark, rdir, queries,
        excludeSelfId = true).select($"query_id", $"neighbor_id")
      .join(fullTop, Seq("query_id", "neighbor_id"))
      .count().toDouble / math.max(fullTop.count(), 1L)
    scrub()
    println(f"ann_serve pq_residual serve_s=$pqRS%.2f topk_agree=$agreeR%.3f")
    for (pool <- Seq(25)) {
      val agreeRr = rerank(rdir, pool)
        .join(fullTop, Seq("query_id", "neighbor_id"))
        .count().toDouble / math.max(fullTop.count(), 1L)
      scrub()
      println(f"ann_serve pq_residual_rerank pool=$pool%d topk_agree=$agreeRr%.3f")
    }
    spark.stop()
  }
}
