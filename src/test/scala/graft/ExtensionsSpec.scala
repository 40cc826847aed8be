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

  // exceptions raised inside generated code arrive wrapped in
  // SparkException layers — search the whole cause chain for the guard text
  private def messages(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("srp family rejects a planes matrix that is not a multiple of the dimension") {
    for (fn <- Seq("srp_sig(array(1.0d, 2.0d), array(1.0d, 2.0d, 3.0d))",
                   "srp_probes(array(1.0d, 2.0d), array(1.0d, 2.0d, 3.0d), 2)")) {
      val ex = intercept[Throwable] { spark.sql(s"SELECT $fn").head() }
      assert(messages(ex).contains("not a multiple of the vector dimension"),
        s"$fn: ${messages(ex)}")
    }
  }

  test("srp family rejects > 31 planes (Int shift would alias bit 32 onto bit 0)") {
    // d = 1, 32 planes → bits = 32
    val planes = (1 to 32).map(i => s"cast($i as double)").mkString("array(", ",", ")")
    val ex = intercept[Throwable] {
      spark.sql(s"SELECT srp_sig(array(1.0d), $planes)").head()
    }
    assert(messages(ex).contains("31-bit signature width"), messages(ex))
  }

  test("srp_probes survives an all-NaN vector (margins undefined) deterministically") {
    // NaN dot on every plane: sign test is false (sig = 0) and every
    // margin is NaN — used to AIOOBE on used(-1); now flips planes in
    // index order: [base=0, flip bit 0 -> 1, flip bit 1 -> 2]
    val row = spark.sql(
      "SELECT srp_probes(array(cast('NaN' as double)), array(1.0d, -1.0d), 2) AS ps")
      .head().getSeq[Int](0)
    assert(row == Seq(0, 1, 2), s"got $row")
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
