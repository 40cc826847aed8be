package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Session.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // LOUD tier guard: the similarity_* DuckDB oracles hardwire the
    // n = 500 index geometry (C=16, b=8, mod=10) that the Scala side's
    // scale-adaptive defaults resolve to at the correctness tier
    // (sf0.001/sf0.01). At any other corpus size the Scala side scales
    // its geometry and those oracles are NOT definitions of correct
    // output — a hash mismatch there is the tier coupling, not a bug.
    locally {
      import graft.textops.Similarity.{autoBits, autoCentroids, autoSampleMod}
      val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
      if (autoCentroids(n) != 16 || autoBits(n) != 8 || autoSampleMod(n) != 10)
        System.err.println(
          s"[verify] WARNING: $sfDir has $n embeddings -> resolved geometry " +
            s"(C=${autoCentroids(n)}, b=${autoBits(n)}, mod=${autoSampleMod(n)}) " +
            "differs from the oracle constants (C=16, b=8, mod=10); " +
            "similarity_* oracle parity is only defined at the n=500 tier " +
            "(see Similarity.scala autoCentroids/autoBits/autoSampleMod scaladoc).")
    }
    // SPARK_GRAFT_ONLY="a,b" restricts the dump for local check loops;
    // unset (the driver's invocation) dumps the full surface
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
