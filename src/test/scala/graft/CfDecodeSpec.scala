package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CF-convention decode layer ([[graft.sources.CfDecode]]): mask/scale/
  * time semantics against the hand-encoded CDF-1 fixture, plus the loud
  * refusals (non-standard calendar, unparseable time units).
  *
  * The expected values for the fixture path are PINNED literals computed
  * independently in python (scripts/cf_check.py re-derives them every
  * run) — not re-derived here from the same Scala formulas the fixture
  * encoder uses. */
class CfDecodeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def openCf() = {
    val nc = SparkEntry.ensureCfFixture()
    graft.catalog.EsmCatalog // touch nothing; keep import shape simple
    graft.catalog.EsmDataSource("cf", Nil, "path", None, Nil,
        storageOptions = Map("graft.kerchunk.decode" -> "cf"))
      .openAsset(spark, nc, "netcdf")
  }

  test("packed int16 unpacks via scale/offset and _FillValue masks to null") {
    val tas = openCf().filter(col("variable") === "tas")
      .select(array_join(col("coords").cast("array<string>"), ".").as("k"), col("value"))
      .collect().map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(tas.size == 12)
    // python: -150*0.01+250.0 = 248.5 ; 170*0.01+250.0 = 251.7
    assert(tas("0.0") === Some(248.5))
    assert(tas("3.2") === Some(251.7))
    assert(tas("1.1") === None) // raw -999 = _FillValue
  }

  test("missing_value masks the float variable; identity otherwise") {
    val rh = openCf().filter(col("variable") === "rh")
      .select(array_join(col("coords").cast("array<string>"), ".").as("k"), col("value"))
      .collect().map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(rh("2.0") === None)       // raw 1e20f = missing_value
    assert(rh("1.2") === Some(2.0))  // 1 + 2*0.5, no scale/offset attrs
  }

  test("standard-calendar time units decode to timestamps (pre-1970 epoch)") {
    val t = openCf().filter(col("variable") === "time")
      .select(col("coords")(0).as("i"),
        date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("ts"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // python: datetime(1850,1,16,12) + timedelta(days=d)
    assert(t(0L) == "1850-01-16 12:00:00")
    assert(t(1L) == "1850-02-16 12:00:00") // +31 days
    assert(t(3L) == "1850-04-16 12:00:00") // +90 days
    // non-time variables carry a null time column
    val latTimes = openCf().filter(col("variable") === "lat" && col("time").isNotNull).count()
    assert(latTimes == 0)
  }

  // synthesized single-variable entry plane for the refusal paths: one
  // inline chunk (two big-endian int32s) + configurable .zattrs
  private def entriesWith(attrs: String) = {
    import spark.implicits._
    val payload = java.util.Base64.getEncoder.encodeToString(
      Array[Byte](0, 0, 0, 1, 0, 0, 0, 2))
    Seq(
      ("t/.zarray", "t", ".zarray", "meta", null: String, None: Option[Long], None: Option[Long],
        Some("""{"zarr_format":2,"dtype":">i4","shape":[2],"chunks":[2],"compressor":null,"filters":null,"order":"C"}""")),
      ("t/.zattrs", "t", ".zattrs", "meta", null: String, None: Option[Long], None: Option[Long],
        Some(attrs)),
      ("t/0", "t", "0", "inline", null: String, None: Option[Long], None: Option[Long],
        Some("base64:" + payload)),
    ).toDF("key", "variable", "member", "kind", "url", "offset", "length", "inline_value")
  }

  private def decodeAll(attrs: String) = {
    val e = entriesWith(attrs)
    graft.sources.CfDecode.decodeCf(
      graft.sources.KerchunkIndex.materializeChunks(e),
      graft.sources.KerchunkIndex.arrayMeta(e),
      graft.sources.KerchunkIndex.attrDims(e),
      graft.sources.CfDecode.cfAttrs(e)).collect()
  }

  test("non-standard calendar refuses loudly instead of shifting dates") {
    val ex = intercept[Exception](decodeAll(
      """{"units":"days since 1850-01-01","calendar":"noleap","_ARRAY_DIMENSIONS":["t"]}"""))
    assert(ex.getMessage != null && ex.getMessage.contains("noleap"), ex.getMessage)
  }

  test("unparseable time unit word refuses loudly") {
    val ex = intercept[Exception](decodeAll(
      """{"units":"fortnights since 1850-01-01","_ARRAY_DIMENSIONS":["t"]}"""))
    assert(ex.getMessage != null && ex.getMessage.contains("did not parse"), ex.getMessage)
  }

  test("plain units decode as identity with null time") {
    val rows = decodeAll("""{"units":"K","_ARRAY_DIMENSIONS":["t"]}""")
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Double]("value")).sorted.toSeq == Seq(1.0, 2.0))
    assert(rows.forall(_.getAs[java.sql.Timestamp]("time") == null))
  }
}
