package graft

import org.scalatest.funsuite.AnyFunSuite

/** The shared test session is built `.withExtensions(new
  * GraftExtensions)` (SparkTestBase), so every suite resolves the
  * native functions through the injected-function path; this spec
  * pins the SQL-text surface explicitly.
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("extension-injected native functions resolve from SQL text") {
    val row = spark.sql(
      """SELECT poly_hash('hello') AS ph,
        |       vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS vd,
        |       rolling_min_hash('hello world rolling', 16) AS rmh,
        |       simhash60(array(7L, 9L)) AS sh,
        |       size(minhash_sig(array(42L, 77L))) AS mk""".stripMargin).head()
    assert(row.getLong(0) == 99162322L) // matches the DuckDB char fold
    assert(row.getDouble(1) == 11.0)
    assert(row.getLong(2) > 0)
    assert(row.getInt(4) == graft.textops.TextHash.K)
  }

  test("sorted_intersect_count rejects non-int arrays at analysis, not silently") {
    // int arrays: fine
    assert(spark.sql(
      "SELECT sorted_intersect_count(array(1, 3, 5), array(3, 5, 9)) AS c")
      .head().getInt(0) == 2)
    // long arrays would be read as garbage bytes by the int merge —
    // must fail at analysis time
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT sorted_intersect_count(array(1L, 3L), array(3L, 5L))").head()
    }
    assert(ex.getMessage.contains("sorted_intersect_count"))
  }
}
