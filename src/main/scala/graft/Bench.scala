package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Session.tune: AQE + coalesce + skew-join + UTC + GraftExtensions —
    // the library's recommended config, same knobs a cluster deploy sets.
    // SPARK_GRAFT_CONF ("k=v;k=v") lets perf experiments override
    // without recompiling.
    var b = Session.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
    for (kv <- sys.env.getOrElse("SPARK_GRAFT_CONF", "").split(';')
         if kv.contains('=')) {
      val Array(k, v) = kv.split("=", 2)
      b = b.config(k, v)
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state methodology (matches BASELINE.md): one untimed warm
    // pass over EVERY query first — each query's first execution pays
    // one-time codegen/JIT compilation (~0.5-1 s per distinct operator
    // shape) that says nothing about the operator and everything about
    // the Janino/C2 compile queue, which is also the most
    // host-contention-sensitive cost. Then 3 timed reps per query,
    // reported as the per-query median.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // SPARK_GRAFT_ONLY="q1,q2" restricts the run for local perf loops;
    // unset (the driver's invocation) benches the full surface
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names unknown queries: ${unknown.mkString(", ")}")
    }
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    for ((_, fn) <- sorted)
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
    val results = sorted.map { case (name, fn) =>
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case _: Throwable => false }
        // a crash must read as a failure (-1), never as a fast timing
        if (ok) (System.nanoTime() - t0) / 1e9 else Double.NaN
      }.sorted
      name -> (if (reps.exists(_.isNaN)) -1.0 else reps(1)) // median of 3
    }
    // 4 decimal places (0.1 ms) is ample for wall-clock medians and keeps
    // the one-line JSON under the driver's log-tail capture window — full
    // 17-digit doubles pushed the 104-query line past it, truncating the
    // alphabetically-first keys every round (parsed: null in BENCH_r*).
    def fmt(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // lossless artifact: the driver scrapes the log tail, which has
    // truncated the (multi-KB, 80-query) JSON line before — persist the
    // full record to a file too, so the bench result never depends on
    // how much of the log survives
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
    Option(outPath.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(outPath, json.getBytes("UTF-8"))
    // print the line twice: once now (survives if the capture window is
    // large), and once after spark.stop() so the final occurrence has only
    // sbt's own 2-line epilogue after it in the log tail
    println(json)
    spark.stop()
    println(json)
    System.out.flush()
  }
}
