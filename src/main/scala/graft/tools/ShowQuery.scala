package graft.tools

import graft.{Session, SparkEntry}

/** Runs named SparkEntry queries at a tier and prints their rows —
  * the ops way to read the telemetry queries (`similarity_lsh_stats`,
  * `similarity_cell_stats`, `dedup_candidate_stats`, …) off a corpus
  * before trusting the cost models they measure.
  * Usage: `runMain graft.tools.ShowQuery <sfDir> <q1,q2,...> [maxRows=50]`
  */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val maxRows = if (args.length > 2) args(2).toInt else 50
    // validate BEFORE paying session startup for a typo
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")}; known: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
    val spark = Session.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      println(s"\n========== $name @ $sfDir ==========")
      SparkEntry.queries(name)(spark, sfDir).show(maxRows, truncate = false)
    }
    spark.stop()
  }
}
