package graft.tools

import graft.{Session, SparkEntry}

/** Plan auditor: prints the formatted physical plan for the named
  * queries (or all). Usage: runMain graft.tools.Explain [sfDir] [q...]
  *
  * Round 17: builds its session through [[Session.harnessBuilder]] so
  * the printed plans carry the SAME config surface Bench measures
  * (AQE, coalescing, windowGroupLimitThreshold, SPARK_GRAFT_CONF
  * overrides) — the old local[4]/shuffle=4 ad-hoc session silently
  * dropped the 8192 WindowGroupLimit gate, so cap-window plans printed
  * WITHOUT the rewrite Bench actually runs with.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = Session.harnessBuilder(defaultCpus = "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // queries that use a graft function BEFORE their first Tables.load
    // (e.g. a selectExpr built at plan-construction time) need the
    // registry up front — Tables.load registers lazily otherwise
    graft.functions.GraftExpressions.register(spark)
    // SPARK_GRAFT_EXPLAIN_RUN=1: execute each query first, then print —
    // with AQE the pre-execution plan is the INITIAL one
    // (isFinalPlan=false); after an action the same Dataset prints the
    // final re-optimized plan (AQEShuffleRead coalescing, runtime join
    // rewrites), which is what the bench actually ran.
    val run = sys.env.get("SPARK_GRAFT_EXPLAIN_RUN").contains("1")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      // df.count() would wrap the plan in a NEW aggregate execution and
      // leave the df's own AdaptiveSparkPlan un-finalized; executing the
      // df's own queryExecution is what flips isFinalPlan to true.
      if (run) df.queryExecution.toRdd.count()
      df.explain("formatted")
      Session.scrubBlocks(spark)
    }
    spark.stop()
  }
}
