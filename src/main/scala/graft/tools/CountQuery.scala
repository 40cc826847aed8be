package graft.tools

import graft.{Session, SparkEntry}

/** Row count of one registered query on one tier — the cheapest
  * grounding for a decade-law claim ("how big is the evidence this
  * wall-clock is paying for"). Counts avoid the collect/return-path
  * cost TimeQuery's timed reps deliberately keep.
  *
  * Usage: `tools/run.sh graft.tools.CountQuery <sfDir> <q1[,q2,...]>`
  */
object CountQuery {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: CountQuery <sfDir> <q1[,q2,...]>")
    val spark = Session.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- args(1).split(",").toSeq) {
      val f = SparkEntry.queries.getOrElse(q,
        sys.error(s"unknown query '$q'"))
      val n = f(spark, args(0)).count()
      println(s"COUNTQ $q ${args(0)} rows=$n")
      Session.scrubBlocks(spark)
    }
    spark.stop()
  }
}
