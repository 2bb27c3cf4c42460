package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.NetcdfCollection

/** Multi-file (glob) netCDF opens: nested concat along the record dim
  * (source.py:102-107; the reference's own two-file CMIP5 glob,
  * tests/test_source.py:41,71). */
class NetcdfCollectionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val tasmaxDir = "/root/reference/tests/sample_data/cmip/cmip5/output1/NIMR-KMA/" +
    "HadGEM2-AO/rcp85/mon/atmos/Amon/r1i1p1/v20130815/tasmax"

  test("isGlob matches the reference's '*' trigger, not tar urls") {
    assert(NetcdfCollection.isGlob(s"$tasmaxDir/*.nc"))
    assert(!NetcdfCollection.isGlob(s"$tasmaxDir/plain.nc"))
    assert(!NetcdfCollection.isGlob("tar://member*.nc::/a/b.tar"))
  }

  test("expand returns sorted matches; empty glob fails loudly") {
    val files = NetcdfCollection.expand(spark, s"$tasmaxDir/*.nc")
    assert(files.size === 2)
    assert(files === files.sorted)
    val e = intercept[IllegalArgumentException] {
      NetcdfCollection.expand(spark, s"$tasmaxDir/*.zarr")
    }
    assert(e.getMessage.contains("matched no files"))
  }

  test("openCoords nested-concatenates the record dim; static vars come once") {
    val files = NetcdfCollection.expand(spark, s"$tasmaxDir/*.nc")
    val df = NetcdfCollection.openCoords(spark, files).cache()
    try {
      // time = 2 + 2 records, shifted contiguously
      val times = df.filter(col("variable") === "time")
        .select(element_at(col("coords"), 1)).collect().map(_.getLong(0)).sorted
      assert(times === Array(0L, 1L, 2L, 3L))
      // tasmax covers the full 4x5x5 grid exactly once
      assert(df.filter(col("variable") === "tasmax").count() === 100L)
      assert(df.filter(col("variable") === "tasmax").select("coords").distinct().count() === 100L)
      // lat has no record dim: file 1's five values only, not ten
      assert(df.filter(col("variable") === "lat").count() === 5L)
    } finally df.unpersist()
  }

  test("an explicit concat_dim option overrides inference and agrees here") {
    val files = NetcdfCollection.expand(spark, s"$tasmaxDir/*.nc")
    val inferred = NetcdfCollection.openCoords(spark, files)
      .select("variable", "dims", "coords", "value").collect().map(_.toString).sorted
    val explicit = NetcdfCollection.openCoords(spark, files,
        Map("graft.mfdataset.concat_dim" -> "time"))
      .select("variable", "dims", "coords", "value").collect().map(_.toString).sorted
    assert(inferred === explicit)
  }

  test("typed decode mode on a glob refuses with guidance") {
    val src = graft.catalog.EsmDataSource("g", Nil, "path", None, Nil,
      storageOptions = Map("graft.kerchunk.decode" -> "typed"))
    val e = intercept[UnsupportedOperationException] {
      src.openAsset(spark, s"$tasmaxDir/*.nc", "netcdf")
    }
    assert(e.getMessage.contains("coords"))
  }

  test("entries mode yields a url-stamped inventory of every file") {
    val src = graft.catalog.EsmDataSource("g", Nil, "path", None, Nil)
    val inv = src.openAsset(spark, s"$tasmaxDir/*.nc", "netcdf")
    assert(inv.filter(col("url").isNull).count() === 0L)
    assert(inv.select("url").distinct().count() === 2L)
  }
}
