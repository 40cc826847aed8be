package graft.tools

import graft.{Session, Tables}
import org.apache.spark.sql.functions._

/** Stage-wise decomposition of [[graft.analytics.GraphAnalytics.graphTriangles]]
  * (round-17 optimization probe): times, separately, (a) the edge
  * build (self-join + distinct), (b) degree + orientation, (c) the
  * adjacency collect_list + localCheckpoint, and (d) the probe
  * explode + dst join + intersect + count — so an optimization knows
  * which of the four phases to aim at before touching the plan.
  * Usage: `TriBreakdown <sfDir> [reps]`.
  */
object TriBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Session.harnessBuilder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"TRIB $tag%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rep <- 0 to reps) {
      if (rep > 0) println(s"--- rep $rep ---")
      val li = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_partkey")
      val und = li.as("a")
        .join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
      time("edges(count)") { und.count() }
      val deg = und.select($"u".as("n")).union(und.select($"v".as("n")))
        .groupBy($"n").agg(count(lit(1)).as("d"))
      val oriented = und
        .join(deg.select($"n".as("u"), $"d".as("du")), "u")
        .join(deg.select($"n".as("v"), $"d".as("dv")), "v")
        .selectExpr(
          "case when du < dv or (du = dv and u < v) then u else v end as src",
          "case when du < dv or (du = dv and u < v) then v else u end as dst")
      time("oriented(count)") { oriented.count() }
      val adj = time("adj(checkpoint)") {
        oriented.groupBy($"src")
          .agg(sort_array(collect_list($"dst")).as("nbrs"))
          .localCheckpoint()
      }
      val probe = adj.select($"src", $"nbrs".as("nu"), explode($"nbrs").as("dst"))
      val withNbrs = probe
        .join(adj.select($"src".as("dst"), $"nbrs".as("nv")), Seq("dst"), "left")
        .withColumn("ws", expr("array_intersect(nu, coalesce(nv, array()))"))
        .where(size($"ws") > 0)
        .select($"src", $"dst", $"ws", size($"ws").cast("long").as("ntri"))
      val counts = withNbrs.select(explode(concat(
          array(struct($"src".as("part_id"), $"ntri".as("n")),
                struct($"dst".as("part_id"), $"ntri".as("n"))),
          transform($"ws", w => struct(w.as("part_id"), lit(1L).as("n")))
        )).as("c"))
        .select($"c.part_id".as("part_id"), $"c.n".as("ntri"))
        .groupBy($"part_id")
        .agg(sum($"ntri").as("n_triangles"))
      time("probe+count") { counts.count() }
      Session.scrubBlocks(spark)
    }
    spark.stop()
  }
}
