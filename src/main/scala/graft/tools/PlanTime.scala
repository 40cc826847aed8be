package graft.tools

import graft.{Session, SparkEntry}

/** Round-17 optimization probe: per-query Catalyst planning cost —
  * time from query construction to a materialized executedPlan,
  * WITHOUT running it (AQE keeps isFinalPlan=false; this is the
  * analysis+optimization+physical-planning latency every bench rep
  * pays before its first task). Usage: `PlanTime <sfDir> [q...]`.
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = Session.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExpressions.register(spark)
    // warm the analyzer/optimizer rule pipeline once
    SparkEntry.queries("pricing_summary")(spark, sfDir).queryExecution.executedPlan
    val rows = names.map { n =>
      val t0 = System.nanoTime()
      // NOTE: construction itself may run eager jobs (localCheckpoint
      // fronts) — those queries report build+plan, flagged by '*'
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      Session.scrubBlocks(spark)
      (n, (t1 - t0) / 1e9, (t2 - t1) / 1e9)
    }
    rows.sortBy(-_._3).foreach { case (n, build, plan) =>
      println(f"PLANT $n%-34s build=$build%6.3f plan=$plan%6.3f")
    }
    spark.stop()
  }
}
