package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip gate for the zarr v2 writer: everything written must read
  * back bit-exactly through the engine's OWN zarr reader + decode plane
  * (and scripts/zarr_check.py re-reads the gate's store with an
  * independent pure-python parse). */
class ZarrWriterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def decode(store: String) = {
    val entries = graft.sources.ZarrDirectoryIndex.read(spark, store)
    graft.sources.KerchunkIndex.decodeCoords(
      graft.sources.KerchunkIndex.materializeChunks(entries),
      graft.sources.KerchunkIndex.arrayMeta(entries),
      graft.sources.KerchunkIndex.attrDims(entries))
  }

  private def tidy(rows: Seq[(String, Seq[String], Seq[Long], Double)]) =
    rows.toDF("variable", "dims", "coords", "value")

  test("round trip: 1-D and 2-D variables, multi-chunk banding, compression") {
    val rows =
      (0L until 10L).map(i => ("t", Seq("time"), Seq(i), i * 1.5)) ++
        (for (i <- 0L until 6L; j <- 0L until 4L)
          yield ("grid", Seq("time", "x"), Seq(i, j), i * 10.0 + j))
    val dir = java.nio.file.Files.createTempDirectory("graft_zw").toString
    // 64-byte budget → 8 doubles per chunk: t bands into 2 chunks,
    // grid (rowElems 4) bands 2 rows per chunk → 3 chunks
    graft.sources.ZarrWriter.write(tidy(rows), dir, maxChunkBytes = 64)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "t", "1")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "grid", "2.0")))
    val got = decode(dir)
      .select(col("variable"), array_join(col("dims"), ".").as("d"),
        array_join(transform(col("coords"), c => c.cast("string")), ".").as("ck"),
        col("value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
      .toSet
    val want = rows.map { case (v, d, c, x) =>
      (v, d.mkString("."), c.mkString("."), x) }.toSet
    assert(got === want)
  }

  test("round trip: uncompressed store and a 3-D variable") {
    val rows = for (i <- 0L until 4L; j <- 0L until 3L; k <- 0L until 2L)
      yield ("cube", Seq("a", "b", "c"), Seq(i, j, k), i * 100.0 + j * 10.0 + k)
    val dir = java.nio.file.Files.createTempDirectory("graft_zw3").toString
    graft.sources.ZarrWriter.write(tidy(rows), dir, maxChunkBytes = 128,
      compress = false)
    val got = decode(dir).select("value").as[Double].collect().sorted
    assert(got.toSeq == rows.map(_._4).sorted)
    // raw chunk: 12 doubles little-endian (2 band rows x 3 x 2), verify
    // values byte-for-byte
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "cube", "0.0.0"))
    assert(bytes.length == 12 * 8)
    val first = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getDouble(0)
    assert(first == 0.0)
    val v101 = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getDouble((1 * 3 * 2 + 0 * 2 + 1) * 8)
    assert(v101 == 101.0, v101.toString)
  }

  test("edge chunks pad with fill_value and the decode plane drops the padding") {
    // shape [5] with band 2 → chunks 0,1,2; chunk 2 holds coord 4 + one pad
    val rows = (0L until 5L).map(i => ("v", Seq("x"), Seq(i), i + 0.25))
    val dir = java.nio.file.Files.createTempDirectory("graft_zwp").toString
    graft.sources.ZarrWriter.write(tidy(rows), dir, maxChunkBytes = 16,
      compress = false)
    val edge = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "v", "2"))
    assert(edge.length == 2 * 8, "edge chunk stored PADDED to full chunk shape")
    assert(java.nio.ByteBuffer.wrap(edge).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .getDouble(8) == 0.0, "pad cell carries fill_value")
    val got = decode(dir).select("value").as[Double].collect().sorted
    assert(got.toSeq == rows.map(_._4), got.mkString(","))
  }

  test("guards: duplicate cells, ragged coords, non-double values refuse") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zwg").toString
    val dup = tidy(Seq(("v", Seq("x"), Seq(0L), 1.0), ("v", Seq("x"), Seq(0L), 2.0)))
    assert(intercept[Exception] {
      graft.sources.ZarrWriter.write(dup, dir)
    }.getMessage.contains("duplicate"))
    val ragged = tidy(Seq(("v", Seq("x"), Seq(0L), 1.0), ("v", Seq("x"), Seq(0L, 1L), 2.0)))
    assert(intercept[Exception] {
      graft.sources.ZarrWriter.write(ragged, dir)
    }.getMessage.toLowerCase.contains("ragged"))
    val ints = Seq(("v", Seq("x"), Seq(0L), 1L)).toDF("variable", "dims", "coords", "value")
    assert(intercept[Exception] {
      graft.sources.ZarrWriter.write(ints, dir)
    }.getMessage.contains("double"))
  }

  test("v3 round trip: default key encoding, gzip codec, dimension_names") {
    val rows =
      (0L until 10L).map(i => ("t", Seq("time"), Seq(i), i * 1.5)) ++
        (for (i <- 0L until 6L; j <- 0L until 4L)
          yield ("grid", Seq("time", "x"), Seq(i, j), i * 10.0 + j))
    val dir = java.nio.file.Files.createTempDirectory("graft_zw3v").toString
    graft.sources.ZarrWriter.writeV3(tidy(rows), dir, maxChunkBytes = 64)
    // v3 layout facts: per-node zarr.json, c/-prefixed "/"-separated keys
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "zarr.json")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "t", "zarr.json")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "t", "c", "1")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "grid", "c", "2", "0")))
    val got = decode(dir)
      .select(col("variable"), array_join(col("dims"), ".").as("d"),
        array_join(transform(col("coords"), c => c.cast("string")), ".").as("ck"),
        col("value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
      .toSet
    val want = rows.map { case (v, d, c, x) =>
      (v, d.mkString("."), c.mkString("."), x) }.toSet
    assert(got === want)
  }

  test("v3 blosc arm: frame round-trips through the engine reader; metadata pins lz4+shuffle (r14)") {
    val rows =
      (0L until 10L).map(i => ("t", Seq("time"), Seq(i), i * 1.5)) ++
        (for (i <- 0L until 6L; j <- 0L until 4L)
          yield ("grid", Seq("time", "x"), Seq(i, j), i * 10.0 + j))
    val dir = java.nio.file.Files.createTempDirectory("graft_zw3b").toString
    graft.sources.ZarrWriter.writeV3(tidy(rows), dir, maxChunkBytes = 64,
      codec = "blosc")
    val zj = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "t", "zarr.json")), "UTF-8")
    assert(zj.contains("\"name\": \"blosc\""), zj)
    assert(zj.contains("\"cname\": \"lz4\""), zj)
    assert(zj.contains("\"shuffle\": \"shuffle\""), zj) // f8 → typesize 8
    assert(zj.contains("\"typesize\": 8"), zj)
    // the chunk object IS a blosc1 frame (version byte 2, typesize 8)
    val chunk = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "t", "c", "0"))
    assert(chunk(0) == 2 && (chunk(3) & 0xff) == 8, chunk.take(4).toSeq.toString)
    val got = decode(dir)
      .select(col("variable"),
        array_join(transform(col("coords"), c => c.cast("string")), ".").as("ck"),
        col("value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === rows.map { case (v, _, c, x) => (v, c.mkString("."), x) }.toSet)
    assert(intercept[IllegalArgumentException] {
      graft.sources.ZarrWriter.writeV3(tidy(rows), dir, codec = "lzma")
    }.getMessage.contains("gzip, zstd, or blosc"))
  }

  test("v3 sharded round trip: index layout, absent slots, edge shards") {
    // shape [8], band 1 (8-byte budget), 4 inner chunks per shard →
    // shards c/0 (bands 0-3) and c/1 (bands 4-7); band 2 never written
    val rows = Seq(0L, 1L, 3L, 4L).map(i => ("v", Seq("x"), Seq(i), i + 0.5))
    val dir = java.nio.file.Files.createTempDirectory("graft_zw3s").toString
    graft.sources.ZarrWriter.writeV3(tidy(rows), dir, maxChunkBytes = 8,
      compress = false, shardInnerChunks = 4)
    val shard0 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "v", "c", "0"))
    // 3 present 8-byte inner chunks + 64-byte index + 4-byte crc32c
    assert(shard0.length == 3 * 8 + 16 * 4 + 4, shard0.length.toString)
    val idx = java.nio.ByteBuffer.wrap(shard0, 24, 68)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(idx.getLong(24 + 0) == 0L && idx.getLong(24 + 8) == 8L)   // slot 0
    assert(idx.getLong(24 + 16) == 8L && idx.getLong(24 + 24) == 8L) // slot 1
    assert(idx.getLong(24 + 32) == -1L && idx.getLong(24 + 40) == -1L) // absent slot 2
    assert(idx.getLong(24 + 48) == 16L)                              // slot 3
    val crc = new java.util.zip.CRC32C()
    crc.update(shard0, 24, 64)
    assert((java.nio.ByteBuffer.wrap(shard0, 24 + 64, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt() & 0xffffffffL) == crc.getValue)
    // round trip through the engine's own v3 + sharding reader: exactly
    // the written cells come back (absent slots and bands are fill)
    val got = decode(dir).select("value").as[Double].collect().sorted
    assert(got.toSeq == rows.map(_._4), got.mkString(","))
    // gzip'd multi-dim sharded variant round-trips too
    val rows2 = for (i <- 0L until 6L; j <- 0L until 3L)
      yield ("g", Seq("a", "b"), Seq(i, j), i * 10.0 + j)
    val dir2 = java.nio.file.Files.createTempDirectory("graft_zw3s2").toString
    graft.sources.ZarrWriter.writeV3(tidy(rows2.toSeq), dir2, maxChunkBytes = 48,
      shardInnerChunks = 2)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir2, "g", "c", "0", "0")))
    val got2 = decode(dir2).select("value").as[Double].collect().sorted
    assert(got2.toSeq == rows2.map(_._4).sorted)
  }

  // ------------------------------------------------------- r12 dtype breadth

  private def decodeLabels(store: String) = {
    val entries = graft.sources.ZarrDirectoryIndex.read(spark, store)
    graft.sources.KerchunkIndex.decodeLabelCoords(
      graft.sources.KerchunkIndex.materializeChunks(entries),
      graft.sources.KerchunkIndex.arrayMeta(entries),
      graft.sources.KerchunkIndex.attrDims(entries))
  }

  test("dtype breadth v2: i4/i8 values and |S/<U labels round-trip; widths auto-size") {
    val rows = Seq(
      ("cnt", Seq("x"), Seq(0L), Some(-3.0), None), ("cnt", Seq("x"), Seq(1L), Some(2147483647.0), None),
      ("big", Seq("x"), Seq(0L), Some(1.0e10), None), ("big", Seq("x"), Seq(1L), Some(-9.007199254740992e15), None),
      ("tag", Seq("x"), Seq(0L), None, Some("ab")), ("tag", Seq("x"), Seq(1L), None, Some("cdé")),
      ("uni", Seq("x"), Seq(0L), None, Some("héllo")), ("uni", Seq("x"), Seq(1L), None, Some("日本")))
      .toDF("variable", "dims", "coords", "value", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft_zwd").toString
    graft.sources.ZarrWriter.write(rows, dir,
      dtypes = Map("cnt" -> "<i4", "big" -> "<i8", "tag" -> "|S", "uni" -> "<U"))
    // declared dtypes: |S auto-sizes to the longest UTF-8 byte length (cdé = 4)
    val tagZ = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "tag", ".zarray")), "UTF-8")
    assert(tagZ.contains("\"|S4\""), tagZ)
    val uniZ = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "uni", ".zarray")), "UTF-8")
    assert(uniZ.contains("\"<U5\""), uniZ)
    val nums = decode(dir).select("variable", "value").as[(String, Double)].collect().toSet
    assert(nums == Set(("cnt", -3.0), ("cnt", 2147483647.0),
      ("big", 1.0e10), ("big", -9.007199254740992e15)))
    val labels = decodeLabels(dir).select("variable", "label").as[(String, String)].collect().toSet
    assert(labels == Set(("tag", "ab"), ("tag", "cdé"), ("uni", "héllo"), ("uni", "日本")))
  }

  test("dtype breadth v3: int32/int64 core types, |S over raw bits, zstd codec") {
    val rows = Seq(
      ("cnt", Seq("x"), Seq(0L), Some(7.0), None), ("cnt", Seq("x"), Seq(1L), Some(-40.0), None),
      ("big", Seq("x"), Seq(0L), Some(1.0e10), None), ("big", Seq("x"), Seq(1L), Some(11.0), None),
      ("tag", Seq("x"), Seq(0L), None, Some("aa")), ("tag", Seq("x"), Seq(1L), None, Some("bcd")))
      .toDF("variable", "dims", "coords", "value", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft_zw3d").toString
    graft.sources.ZarrWriter.writeV3(rows, dir,
      dtypes = Map("cnt" -> "<i4", "big" -> "<i8", "tag" -> "|S"), codec = "zstd")
    val tagJ = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "tag", "zarr.json")), "UTF-8")
    assert(tagJ.contains("\"r24\"") && tagJ.contains("\"zstd\""), tagJ)
    val nums = decode(dir).select("variable", "value").as[(String, Double)].collect().toSet
    assert(nums == Set(("cnt", 7.0), ("cnt", -40.0), ("big", 1.0e10), ("big", 11.0)))
    val labels = decodeLabels(dir).select("variable", "label").as[(String, String)].collect().toSet
    assert(labels == Set(("tag", "aa"), ("tag", "bcd")))
  }

  test("dtype guards: non-integral, out-of-range, past-2^53, over-width, NUL, v3 <U refuse") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zwdg").toString
    def one(v: Double, dt: String): org.apache.spark.sql.DataFrame =
      tidy(Seq(("v", Seq("x"), Seq(0L), v)))
    def lab(s: String): org.apache.spark.sql.DataFrame =
      Seq(("v", Seq("x"), Seq(0L), Option.empty[Double], Some(s)))
        .toDF("variable", "dims", "coords", "value", "label")
    assert(intercept[Exception] {
      graft.sources.ZarrWriter.write(one(1.5, "<i4"), dir, dtypes = Map("v" -> "<i4"))
    }.getMessage.contains("integral"))
    assert(intercept[Exception] {
      graft.sources.ZarrWriter.write(one(3.0e9, "<i4"), dir, dtypes = Map("v" -> "<i4"))
    }.getMessage.contains("integral"))
    assert(intercept[Exception] { // 2^53 + 2 is a representable double OUTSIDE the exact range
      graft.sources.ZarrWriter.write(one(9.007199254740994e15, "<i8"), dir,
        dtypes = Map("v" -> "<i8"))
    }.getMessage.contains("integral"))
    assert(intercept[Exception] {
      graft.sources.ZarrWriter.write(lab("toolong"), dir, dtypes = Map("v" -> "|S3"))
    }.getMessage.contains("over"))
    assert(intercept[Exception] {
      graft.sources.ZarrWriter.write(lab("a\u0000b"), dir, dtypes = Map("v" -> "|S"))
    }.getMessage.contains("NUL"))
    assert(intercept[Exception] {
      graft.sources.ZarrWriter.writeV3(lab("ab"), dir, dtypes = Map("v" -> "<U"))
    }.getMessage.contains("UCS-4"))
    // a numeric variable with null values points the caller at the label plane
    assert(intercept[Exception] {
      graft.sources.ZarrWriter.write(lab("ab"), dir) // default <f8, but only labels given
    }.getMessage.contains("null values"))
  }

  test("dtype parity r13: f4/i2/i1/u1/u2/u4 round-trip through both sinks; lossy values refuse") {
    // one variable per new width, values at the edges where a wrong
    // signed/width encode corrupts: u2 beyond i2's max, u4 beyond i4's
    // max, u1/i1 full-range, f4 half-steps (exact float32)
    val rows = Seq(
      ("f", Seq(0L), 2.5), ("f", Seq(1L), -0.25),
      ("s2", Seq(0L), -32768.0), ("s2", Seq(1L), 32767.0),
      ("s1", Seq(0L), -128.0), ("s1", Seq(1L), 127.0),
      ("b1", Seq(0L), 0.0), ("b1", Seq(1L), 255.0),
      ("w2", Seq(0L), 65535.0), ("w2", Seq(1L), 40000.0),
      ("w4", Seq(0L), 4294967295.0), ("w4", Seq(1L), 3000000000.0))
      .map { case (v, c, x) => (v, Seq("x"), c, x) }
    val dts = Map("f" -> "<f4", "s2" -> "<i2", "s1" -> "|i1",
      "b1" -> "|u1", "w2" -> "<u2", "w4" -> "<u4")
    val want = rows.map { case (v, _, c, x) => (v, c.head, x) }.toSet
    for (v3 <- Seq(false, true)) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_zwp$v3").toString
      if (v3) graft.sources.ZarrWriter.writeV3(tidy(rows), dir, dtypes = dts, codec = "zstd")
      else graft.sources.ZarrWriter.write(tidy(rows), dir, dtypes = dts)
      val got = decode(dir)
        .select(col("variable"), element_at(col("coords"), 1), col("value"))
        .as[(String, Long, Double)].collect().toSet
      assert(got == want, s"v3=$v3\n$got")
    }
    // declared dtype strings land in the store metadata
    val dir2 = java.nio.file.Files.createTempDirectory("graft_zwp2").toString
    graft.sources.ZarrWriter.write(tidy(rows), dir2, dtypes = dts)
    def za(v: String) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir2, v, ".zarray")), "UTF-8")
    dts.foreach { case (v, dt) => assert(za(v).contains("\"" + dt + "\""), za(v)) }
    // lossy encodes refuse loudly: not-exactly-float32, range breaches
    def one(v: Double) = tidy(Seq(("v", Seq("x"), Seq(0L), v)))
    val dir3 = java.nio.file.Files.createTempDirectory("graft_zwp3").toString
    assert(intercept[Exception] { // 0.1 is not a float32
      graft.sources.ZarrWriter.write(one(0.1), dir3, dtypes = Map("v" -> "<f4"))
    }.getMessage.contains("float32"))
    assert(intercept[Exception] { // negative into unsigned
      graft.sources.ZarrWriter.write(one(-1.0), dir3, dtypes = Map("v" -> "|u1"))
    }.getMessage.contains("integral"))
    assert(intercept[Exception] { // over u2
      graft.sources.ZarrWriter.write(one(65536.0), dir3, dtypes = Map("v" -> "<u2"))
    }.getMessage.contains("integral"))
    assert(intercept[Exception] { // over i2
      graft.sources.ZarrWriter.write(one(32768.0), dir3, dtypes = Map("v" -> "<i2"))
    }.getMessage.contains("integral"))
    // NaN is a legal f4 (self-inequality must not trip the exactness check)
    val dir4 = java.nio.file.Files.createTempDirectory("graft_zwp4").toString
    graft.sources.ZarrWriter.write(one(Double.NaN), dir4, dtypes = Map("v" -> "<f4"))
    val back = decode(dir4).select("value").as[Double].collect()
    assert(back.length == 1 && back(0).isNaN, back.toSeq.toString)
  }

  test("v2 filters: delta+shuffle+fletcher32 round-trip bit-exactly; chain in metadata; refusals (r13)") {
    val rows = (0 until 25).map(i => ("m", Seq("x"), Seq(i.toLong), 1000000.0 + i * 3)) ++
      (0 until 25).map(i => ("w", Seq("x"), Seq(i.toLong), i * 1000.0 - 9000.0))
    val dts = Map("m" -> "<i8", "w" -> "<i4")
    val chains = Map("m" -> Seq("delta", "shuffle", "fletcher32"), "w" -> Seq("shuffle"))
    val dirF = java.nio.file.Files.createTempDirectory("graft_zwfilt").toString
    val dirP = java.nio.file.Files.createTempDirectory("graft_zwplain").toString
    // 64-byte budget → multi-chunk banding; compress=false so the on-disk
    // transform is directly inspectable
    graft.sources.ZarrWriter.write(tidy(rows), dirF, maxChunkBytes = 64,
      compress = false, dtypes = dts, filters = chains)
    graft.sources.ZarrWriter.write(tidy(rows), dirP, maxChunkBytes = 64,
      compress = false, dtypes = dts)
    def cells(d: String) = decode(d).select("variable", "coords", "value").collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).head, r.getDouble(2))).toSet
    assert(cells(dirF) == cells(dirP), "the filter chain must be invisible to values")
    assert(cells(dirF).size == 50)
    // the declared chain lands in .zarray…
    val za = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dirF, "m", ".zarray")), "UTF-8")
    assert(za.contains("\"id\": \"delta\"") && za.contains("\"id\": \"shuffle\"") &&
      za.contains("\"id\": \"fletcher32\"") && za.contains("\"elementsize\": 8"), za)
    // …and actually transformed the bytes: same length + 4 checksum bytes,
    // different content (a no-op chain would silently lie in the metadata)
    val fB = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dirF, "m", "0"))
    val pB = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dirP, "m", "0"))
    assert(fB.length == pB.length + 4, s"${fB.length} vs ${pB.length}")
    assert(!java.util.Arrays.equals(java.util.Arrays.copyOf(fB, pB.length), pB))
    // refusals: float delta, delta not first, filters on strings, unknown
    // id, filters for an absent variable
    def one = tidy(Seq(("v", Seq("x"), Seq(0L), 1.0)))
    val d3 = java.nio.file.Files.createTempDirectory("graft_zwfr").toString
    assert(intercept[Exception] {
      graft.sources.ZarrWriter.write(one, d3, filters = Map("v" -> Seq("delta")))
    }.getMessage.contains("integer dtypes only"))
    assert(intercept[Exception] {
      graft.sources.ZarrWriter.write(one, d3, dtypes = Map("v" -> "<i4"),
        filters = Map("v" -> Seq("shuffle", "delta")))
    }.getMessage.contains("FIRST"))
    assert(intercept[Exception] {
      graft.sources.ZarrWriter.write(
        Seq(("v", Seq("x"), Seq(0L), Option.empty[Double], Option("ab")))
          .toDF("variable", "dims", "coords", "value", "label"),
        d3, dtypes = Map("v" -> "|S"), filters = Map("v" -> Seq("shuffle")))
    }.getMessage.contains("no filters"))
    assert(intercept[Exception] {
      graft.sources.ZarrWriter.write(one, d3, filters = Map("v" -> Seq("lz77")))
    }.getMessage.contains("unknown filter"))
    assert(intercept[Exception] {
      graft.sources.ZarrWriter.write(one, d3, filters = Map("ghost" -> Seq("shuffle")))
    }.getMessage.contains("not in the input"))
  }

  test("v3 fill_value: raw-bits byte-array form for r*, scalar for numerics (r14)") {
    val rows = Seq(
      ("num", Seq("x"), Seq(0L), Option(1.0), Option.empty[String]),
      ("lbl", Seq("x"), Seq(0L), Option.empty[Double], Option("ab")))
      .toDF("variable", "dims", "coords", "value", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft_zwfv").toString
    graft.sources.ZarrWriter.writeV3(rows, dir, dtypes = Map("lbl" -> "|S"))
    def zj(v: String) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, v, "zarr.json")), "UTF-8")
    assert(zj("num").contains("\"fill_value\": 0.0"), zj("num"))
    // fill_value is REQUIRED in v3 core metadata; r* carries the spec's
    // raw-bits form — an array of N/8 byte integers ("ab" → |S2 → r16)
    assert(zj("lbl").contains("\"fill_value\": [0, 0]"), zj("lbl"))
  }

  test("r19 fused geometry: a write is TWO SQL executions (geometry + chunk write)") {
    // the r18 geometry ran two full-input aggregation jobs (per-variable
    // meta + per-dimension extents); r19 fuses them under a sentinel
    // posexplode into ONE, so the whole write path is geometry + the
    // chunk-grouping write. Round-trip/refusal semantics are pinned by
    // every other test in this suite (all now run THROUGH the fused
    // aggregation); this pins the job fusion itself, for both sinks.
    val rows =
      (0L until 10L).map(i => ("t", Seq("time"), Seq(i), i * 1.5)) ++
        (for (i <- 0L until 6L; j <- 0L until 4L)
          yield ("grid", Seq("time", "x"), Seq(i, j), i * 10.0 + j))
    val execs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(event: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        event match {
          case _: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execs.incrementAndGet(); ()
          case _ => ()
        }
    }
    val df = tidy(rows)
    val dir2 = java.nio.file.Files.createTempDirectory("graft_zw_census2").toString
    val dir3 = java.nio.file.Files.createTempDirectory("graft_zw_census3").toString
    spark.sparkContext.addSparkListener(listener)
    try {
      graft.sources.ZarrWriter.write(df, dir2, maxChunkBytes = 64)
      Thread.sleep(500) // listener bus is async
      assert(execs.get == 2, s"v2 write: expected 2 SQL executions, saw ${execs.get}")
      execs.set(0)
      graft.sources.ZarrWriter.writeV3(df, dir3, maxChunkBytes = 64)
      Thread.sleep(500)
      assert(execs.get == 2, s"v3 write: expected 2 SQL executions, saw ${execs.get}")
    } finally spark.sparkContext.removeSparkListener(listener)
    // and the fused pass still reads back exactly
    val got = decode(dir2).select(col("variable"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(got === rows.map { case (v, _, _, x) => (v, x) }.toSet)
  }
}
