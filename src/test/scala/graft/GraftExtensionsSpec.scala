package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The library installs into a vanilla session via spark.sql.extensions —
  * after that the native functions are plain SQL surface. */
class GraftExtensionsSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {

  // `spark.sql.extensions` is a STATIC conf — it only takes effect on the
  // SparkContext that boots with it (spark-submit --conf), not on a reused
  // test context. The programmatic twin withExtensions() exercises the same
  // GraftExtensions installer here; clear the shared default session so a
  // fresh SparkSession is actually constructed.
  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    super.afterAll()
  }

  test("non-literal sketch-geometry args raise a clear analysis error") {
    spark.range(3).selectExpr("CAST(id AS STRING) AS s", "CAST(id AS INT) AS k")
      .createOrReplaceTempView("ext_args_v")
    // non-foldable k
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_agg(s, k) FROM ext_args_v").collect()
    }
    assert(e1.getMessage.contains("minhash_agg") && e1.getMessage.contains("foldable"),
      e1.getMessage)
    // non-integral literal
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT band_hashes(array(1L, 2L), 'x', 4)").collect()
    }
    assert(e2.getMessage.contains("band_hashes"), e2.getMessage)
  }

  test("vec_cosine / vec_dot usable from SQL after extension install") {
    val r = spark.sql(
      """SELECT vec_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
        |       vec_dot(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS d""".stripMargin)
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 6.0)
  }

  test("vec_dot rejects non-float arrays at analysis; band_hashes guards signature length") {
    // array<double> into vec_dot must FAIL ANALYSIS, not silently reinterpret bytes
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_dot(array(1.0D), array(2.0D))").collect()
    }
    assert(e.getMessage.contains("vec_dot") || e.getMessage.contains("DATATYPE"), e.getMessage)
    // a signature shorter than bands*rowsPerBand must raise, not read garbage
    val e2 = intercept[Exception] {
      spark.sql("SELECT band_hashes(array(1L, 2L), 4, 4)").collect()
    }
    val msg2 = e2.getMessage + Option(e2.getCause).map(_.getMessage).getOrElse("")
    assert(msg2.contains("needs bands*rowsPerBand"), msg2)
  }

  test("zarr_decode usable from SQL after extension install") {
    // 2 little-endian int32s, uncompressed
    val r = spark.sql(
      """SELECT zarr_decode(concat(unhex('07000000'), unhex('F9FFFFFF')), '<i4', '') AS v,
        |       zarr_decode(unhex('00'), '|S1', '') AS s""".stripMargin).collect()(0)
    assert(r.getSeq[Double](0) == Seq(7.0, -7.0))
    assert(r.isNullAt(1)) // non-numeric dtype → null
  }

  test("minhash_agg / simhash_agg / band_hashes usable from SQL") {
    spark.sql("SELECT * FROM VALUES (1, 'a'), (1, 'b'), (2, 'a') AS t(id, sh)")
      .createOrReplaceTempView("sh_rows")
    val sigs = spark.sql(
      "SELECT id, minhash_agg(sh, 8) AS sig, simhash_agg(sh) AS fp FROM sh_rows GROUP BY id")
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1).length == 8 && sigs(2).length == 8)
    // group 2's single-element minima are >= group 1's (min over a superset)
    assert(sigs(1).zip(sigs(2)).forall { case (a, b) => a <= b })
    val bands = spark.sql(
      "SELECT band_hashes(minhash_agg(sh, 8), 2, 4) AS b FROM sh_rows GROUP BY id")
      .collect().map(_.getSeq[Long](0))
    assert(bands.forall(_.length == 2))
  }
}
