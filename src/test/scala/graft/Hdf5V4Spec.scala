package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.harness.Hdf5V4Fixture
import graft.harness.Hdf5V4Fixture._

/** HDF5 data-layout v4 (1.10+ "latest format") chunk indexes, decoded
  * through the shared chunk-map plane. The fixtures are hand-encoded from
  * the public HDF5 File Format Specification v3.0 (III.F extensible
  * arrays, III.G fixed arrays, III.A.2 v2 b-trees, IV.A.2.i layout
  * message v4) — no HDF5 library exists in this environment, so every
  * structure is written field by field with the spec offsets cited in
  * [[Hdf5V4Fixture]]; the values then round-trip through the REAL parser
  * and the zarr decode plane, and the structural constants (entry sizes,
  * super-block geometry) are additionally asserted against the spec's own
  * derivations inside the builder rather than shared with the parser. */
class Hdf5V4Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import Hdf5V4Fixture._

  private def decodeAll(path: String): Map[(String, String), Double] = {
    val entries = graft.sources.Hdf5Index.read(spark, path)
    graft.sources.KerchunkIndex.decodeCoords(
      graft.sources.KerchunkIndex.materializeChunks(entries),
      graft.sources.KerchunkIndex.arrayMeta(entries),
      graft.sources.KerchunkIndex.attrDims(entries)).collect()
      .map(r => (r.getAs[String]("variable"),
        r.getAs[scala.collection.Seq[Long]]("coords").mkString(".")) -> r.getAs[Double]("value"))
      .toMap
  }

  private def writeTmp(bytes: Array[Byte]): String = {
    val f = java.nio.file.Files.createTempFile("graft_h5v4", ".nc")
    java.nio.file.Files.write(f, bytes)
    f.toString
  }

  test("v4 single-chunk, implicit, and fixed-array indexes decode") {
    val bytes = file { s =>
      // sc: [2,3] single chunk — one ref covering the whole dataset
      val scData = s.pos; s.bytes(i32(0, 1, 2, 10, 11, 12))
      val sc = ohdr(s, Seq(
        0x01 -> dataspace2(Seq(2, 3)), 0x03 -> dtInt32,
        0x08 -> layoutV4(Seq(2, 3), 1, scData)))
      // im: [4,2] chunks [2,2] → grid 2×1, chunks at addr + i·16
      val imData = s.pos; s.bytes(i32(1, 2, 3, 4, 5, 6, 7, 8))
      val im = ohdr(s, Seq(
        0x01 -> dataspace2(Seq(4, 2)), 0x03 -> dtInt32,
        0x08 -> layoutV4(Seq(2, 2), 2, imData)))
      // fa: [6] chunks [2] → 3 entries in an unpaged fixed array
      val c0 = s.pos; s.bytes(i32(100, 101))
      val c1 = s.pos; s.bytes(i32(102, 103))
      val c2 = s.pos; s.bytes(i32(104, 105))
      val faHdr = fixedArray(s, clientId = 0, entrySize = 8, pageBits = 10,
        Seq((c0, 0L), (c1, 0L), (c2, 0L)))
      val fa = ohdr(s, Seq(
        0x01 -> dataspace2(Seq(6)), 0x03 -> dtInt32,
        0x08 -> layoutV4(Seq(2), 3, faHdr)))
      Seq("sc" -> sc, "im" -> im, "fa" -> fa)
    }
    val path = writeTmp(bytes)
    val v = decodeAll(path)
    for (i <- 0 until 2; j <- 0 until 3) assert(v(("sc", s"$i.$j")) == i * 10 + j)
    for (i <- 0 until 4; j <- 0 until 2) assert(v(("im", s"$i.$j")) == i * 2 + j + 1)
    for (i <- 0 until 6) assert(v(("fa", s"$i")) == 100 + i)
    java.nio.file.Files.delete(java.nio.file.Paths.get(path))
  }

  test("v4 filtered single chunk and filtered fixed array (deflate) decode") {
    val bytes = file { s =>
      val scPlain = i32(7, 8, 9, 10)
      val scComp = deflate(scPlain)
      val scData = s.pos; s.bytes(scComp)
      val sc = ohdr(s, Seq(
        0x01 -> dataspace2(Seq(4)), 0x03 -> dtInt32,
        0x0B -> pipelineDeflate,
        0x08 -> layoutV4(Seq(4), 1, scData, flags = 0x02,
          singleFilteredSize = scComp.length.toLong)))
      // faf: [4] chunks [2], client-1 entries (addr + 4-byte size + mask)
      val ch0 = deflate(i32(20, 21)); val ch1 = deflate(i32(22, 23))
      val a0 = s.pos; s.bytes(ch0)
      val a1 = s.pos; s.bytes(ch1)
      val fafHdr = fixedArray(s, clientId = 1, entrySize = 16, pageBits = 10,
        Seq((a0, ch0.length.toLong), (a1, ch1.length.toLong)))
      val faf = ohdr(s, Seq(
        0x01 -> dataspace2(Seq(4)), 0x03 -> dtInt32,
        0x0B -> pipelineDeflate,
        0x08 -> layoutV4(Seq(2), 3, fafHdr)))
      Seq("sc" -> sc, "faf" -> faf)
    }
    val path = writeTmp(bytes)
    val v = decodeAll(path)
    for (i <- 0 until 4) assert(v(("sc", s"$i")) == 7 + i)
    for (i <- 0 until 4) assert(v(("faf", s"$i")) == 20 + i)
    java.nio.file.Files.delete(java.nio.file.Paths.get(path))
  }

  test("v4 paged fixed array: clear bitmap page = unwritten chunks (fill)") {
    val bytes = file { s =>
      // [10] chunks [2] → 5 entries; pageBits 1 → 3 pages; page 1 absent
      val c0 = s.pos; s.bytes(i32(0, 1))
      val c1 = s.pos; s.bytes(i32(2, 3))
      val c4 = s.pos; s.bytes(i32(8, 9))
      val hdr = fixedArray(s, clientId = 0, entrySize = 8, pageBits = 1,
        Seq((c0, 0L), (c1, 0L), (UNDEF_ADDR, 0L), (UNDEF_ADDR, 0L), (c4, 0L)),
        pagesPresent = Seq(true, false, true))
      val fap = ohdr(s, Seq(
        0x01 -> dataspace2(Seq(10)), 0x03 -> dtInt32,
        0x08 -> layoutV4(Seq(2), 3, hdr)))
      Seq("fap" -> fap)
    }
    val path = writeTmp(bytes)
    val v = decodeAll(path)
    assert(v.size == 6, v.toString) // chunks 2,3 (page 1) are fill-absent
    for (i <- Seq(0, 1, 2, 3, 8, 9)) assert(v(("fap", s"$i")) == i)
    java.nio.file.Files.delete(java.nio.file.Paths.get(path))
  }
  private val UNDEF_ADDR = -1L

  test("v4 v2-btree chunk index: plain and filtered records decode") {
    val bytes = file { s =>
      // bt: [4,4] chunks [2,2] → 4 records type 10 (addr + scaled offsets)
      val chunkAddrs = (0 until 4).map { k =>
        val at = s.pos
        val base = k * 100
        s.bytes(i32(base, base + 1, base + 2, base + 3)); at
      }
      val recs10 = (0 until 4).map { k =>
        val t = new Sink
        t.u64(chunkAddrs(k)); t.u64(k / 2); t.u64(k % 2)
        t.result()
      }
      val btHdr = btree2(s, recordType = 10, recSize = 24, recs10)
      val bt = ohdr(s, Seq(
        0x01 -> dataspace2(Seq(4, 4)), 0x03 -> dtInt32,
        0x08 -> layoutV4(Seq(2, 2), 5, btHdr)))
      // btf: [4] chunks [2], records type 11 (addr + size(4) + mask + offsets)
      val f0 = deflate(i32(50, 51)); val f1 = deflate(i32(52, 53))
      val fa0 = s.pos; s.bytes(f0)
      val fa1 = s.pos; s.bytes(f1)
      val recs11 = Seq((fa0, f0.length, 0L), (fa1, f1.length, 1L)).map { case (a, sz, off) =>
        val t = new Sink
        t.u64(a); t.u32(sz.toLong); t.u32(0); t.u64(off)
        t.result()
      }
      val btfHdr = btree2(s, recordType = 11, recSize = 24, recs11)
      val btf = ohdr(s, Seq(
        0x01 -> dataspace2(Seq(4)), 0x03 -> dtInt32,
        0x0B -> pipelineDeflate,
        0x08 -> layoutV4(Seq(2), 5, btfHdr)))
      Seq("bt" -> bt, "btf" -> btf)
    }
    val path = writeTmp(bytes)
    val v = decodeAll(path)
    for (k <- 0 until 4; i <- 0 until 2; j <- 0 until 2)
      assert(v(("bt", s"${(k / 2) * 2 + i}.${(k % 2) * 2 + j}")) == k * 100 + i * 2 + j)
    for (i <- 0 until 4) assert(v(("btf", s"$i")) == 50 + i)
    java.nio.file.Files.delete(java.nio.file.Paths.get(path))
  }

  test("v4 depth-1 v2-btree chunk index: internal node + leaves walk correctly") {
    // [16] chunks [2] → 8 records type 10 split over 3 leaves with 2
    // promoted internal records — the shape a many-chunk dataset's index
    // takes once the root leaf splits
    val bytes = file { s =>
      val chunkAddrs = (0 until 8).map { k =>
        val at = s.pos; s.bytes(i32(k * 2 + 100, k * 2 + 101)); at
      }
      val recs = (0 until 8).map { k =>
        val t = new Sink
        t.u64(chunkAddrs(k)); t.u64(k.toLong)
        t.result()
      }
      val hdr = btree2Depth1(s, recordType = 10, recSize = 16,
        Seq(recs.slice(0, 3), recs.slice(3, 6), recs.slice(6, 8)))
      val bt = ohdr(s, Seq(
        0x01 -> dataspace2(Seq(16)), 0x03 -> dtInt32,
        0x08 -> layoutV4(Seq(2), 5, hdr)))
      Seq("bt" -> bt)
    }
    val path = writeTmp(bytes)
    val v = decodeAll(path)
    assert(v.size == 16, v.toString)
    for (i <- 0 until 16) assert(v(("bt", s"$i")) == 100 + i)
    java.nio.file.Files.delete(java.nio.file.Paths.get(path))
  }

  test("v4 extensible array: inline, direct, and super-block elements decode") {
    // [18] chunks [2] → 9 array elements; cparams maxBits=4 idxElmts=2
    // minPtrs=2 minElmts=2 pageBits=3 → super blocks (ndblks, dblkNelmts):
    // u0 (1,2) u1 (1,4) u2 (2,4) u3 (2,8); index block: 2 inline elements,
    // 2 direct data-block pointers (u0+u1), super pointers for u2, u3.
    // Element 8 lands in super block u2's first data block.
    val bytes = file { s =>
      val chunkAddrs = (0 until 9).map { k =>
        val at = s.pos; s.bytes(i32(k * 2, k * 2 + 1)); at
      }
      val eaHdr = extensibleArray(s, maxBits = 4, idxElmts = 2, minPtrs = 2,
        minElmts = 2, pageBits = 3, elems = chunkAddrs)
      val ea = ohdr(s, Seq(
        0x01 -> dataspace2(Seq(18), maxDims = Seq(-1L)), 0x03 -> dtInt32,
        0x08 -> layoutV4(Seq(2), 4, eaHdr, eaCfg = (4, 2, 2, 2, 3))))
      Seq("ea" -> ea)
    }
    val path = writeTmp(bytes)
    val v = decodeAll(path)
    assert(v.size == 18, v.toString)
    for (i <- 0 until 18) assert(v(("ea", s"$i")) == i)
    java.nio.file.Files.delete(java.nio.file.Paths.get(path))
  }

  test("v4 refusals: virtual layout and unknown index types fail loudly") {
    val bytes = file { s =>
      val body = { // layout v4 class 3 (virtual storage) — refused
        val t = new Sink
        t.u8(4); t.u8(3); t.u64(0); t.u32(0)
        t.result()
      }
      val vds = ohdr(s, Seq(
        0x01 -> dataspace2(Seq(2)), 0x03 -> dtInt32, 0x08 -> body))
      Seq("vds" -> vds)
    }
    val path = writeTmp(bytes)
    val e = intercept[Exception] {
      graft.sources.Hdf5Index.read(spark, path).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("v4 data layout class 3"), msg)
    java.nio.file.Files.delete(java.nio.file.Paths.get(path))
  }

  test("soft links: dataset alias (absolute, relative, chain) decodes") {
    val bytes = fileMsgs { s =>
      val data = s.pos; s.bytes(i32(0, 1, 2, 10, 11, 12))
      val temp = ohdr(s, Seq(
        0x01 -> dataspace2(Seq(2, 3)), 0x03 -> dtInt32,
        0x08 -> layoutV4(Seq(2, 3), 1, data)))
      Seq(
        0x06 -> link("temp", temp),
        0x06 -> softLink("alias", "/temp"),
        0x06 -> softLink("rel", "temp"),
        0x06 -> softLink("chain", "/alias"))
    }
    val path = writeTmp(bytes)
    val v = decodeAll(path)
    for (name <- Seq("temp", "alias", "rel", "chain");
         i <- 0 until 2; j <- 0 until 3)
      assert(v((name, s"$i.$j")) == i * 10 + j, s"$name $i.$j")
    java.nio.file.Files.delete(java.nio.file.Paths.get(path))
  }

  test("soft links: group-subtree alias surfaces children under the alias") {
    val bytes = fileMsgs { s =>
      val data = s.pos; s.bytes(i32(7, 8))
      val x = ohdr(s, Seq(
        0x01 -> dataspace2(Seq(2)), 0x03 -> dtInt32,
        0x08 -> layoutV4(Seq(2), 1, data)))
      val g = ohdr(s, Seq(0x06 -> link("x", x)))
      Seq(0x06 -> link("g", g), 0x06 -> softLink("galias", "/g"))
    }
    val path = writeTmp(bytes)
    val v = decodeAll(path)
    assert(v(("g/x", "0")) == 7 && v(("g/x", "1")) == 8)
    assert(v(("galias/x", "0")) == 7 && v(("galias/x", "1")) == 8)
    java.nio.file.Files.delete(java.nio.file.Paths.get(path))
  }

  test("soft links: a target inside a resolved alias subtree resolves (chained rounds)") {
    val bytes = fileMsgs { s =>
      val data = s.pos; s.bytes(i32(5, 6))
      val x = ohdr(s, Seq(
        0x01 -> dataspace2(Seq(2)), 0x03 -> dtInt32,
        0x08 -> layoutV4(Seq(2), 1, data)))
      val g = ohdr(s, Seq(0x06 -> link("x", x)))
      Seq(0x06 -> link("g", g),
        0x06 -> softLink("galias", "/g"),
        // resolvable only AFTER galias surfaces its children
        0x06 -> softLink("y", "/galias/x"))
    }
    val path = writeTmp(bytes)
    val v = decodeAll(path)
    assert(v(("y", "0")) == 5 && v(("y", "1")) == 6)
    java.nio.file.Files.delete(java.nio.file.Paths.get(path))
  }

  test("soft links: cycles, dangling targets, external links refuse loudly") {
    def refuse(bytes: Array[Byte], needle: String): Unit = {
      val path = writeTmp(bytes)
      val e = intercept[Exception] {
        graft.sources.Hdf5Index.read(spark, path).collect()
      }
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains(needle), msg)
      java.nio.file.Files.delete(java.nio.file.Paths.get(path))
    }
    refuse(fileMsgs { _ => Seq(
      0x06 -> softLink("c1", "/c2"), 0x06 -> softLink("c2", "/c1")) },
      "unresolvable soft links")
    refuse(fileMsgs { _ => Seq(0x06 -> softLink("d", "/nope")) },
      "unresolvable soft links")
    // a malformed external-link blob and a user link type both refuse
    refuse(fileMsgs { _ => Seq(
      0x06 -> typedLink("ext", 64, Array[Byte](0, 0))) },
      "malformed value blob")
    refuse(fileMsgs { _ => Seq(
      0x06 -> typedLink("usr", 65, Array[Byte](0, 0))) },
      "type 65")
  }

  /** A target file: /temp dataset (2x3) and a /g/x dataset (2 values). */
  private def writeExtTarget(): String = writeTmp(fileMsgs { s =>
    val data = s.pos; s.bytes(i32(0, 1, 2, 10, 11, 12))
    val temp = ohdr(s, Seq(
      0x01 -> dataspace2(Seq(2, 3)), 0x03 -> dtInt32,
      0x08 -> layoutV4(Seq(2, 3), 1, data)))
    val xd = s.pos; s.bytes(i32(7, 8))
    val x = ohdr(s, Seq(
      0x01 -> dataspace2(Seq(2)), 0x03 -> dtInt32,
      0x08 -> layoutV4(Seq(2), 1, xd)))
    val g = ohdr(s, Seq(0x06 -> link("x", x)))
    Seq(0x06 -> link("temp", temp), 0x06 -> link("g", g))
  })

  test("external links: dataset and group-subtree aliases decode across files") {
    val target = writeExtTarget()
    val targetName = java.nio.file.Paths.get(target).getFileName.toString
    val bytes = fileMsgs { s =>
      val own = s.pos; s.bytes(i32(42, 43))
      val local = ohdr(s, Seq(
        0x01 -> dataspace2(Seq(2)), 0x03 -> dtInt32,
        0x08 -> layoutV4(Seq(2), 1, own)))
      Seq(
        0x06 -> link("local", local),
        0x06 -> externalLink("ext", target, "/temp"),        // absolute file
        0x06 -> externalLink("extg", targetName, "/g"))      // sibling-relative
    }
    val path = writeTmp(bytes)
    val v = decodeAll(path)
    assert(v(("local", "0")) == 42 && v(("local", "1")) == 43)
    for (i <- 0 until 2; j <- 0 until 3)
      assert(v(("ext", s"$i.$j")) == i * 10 + j, s"ext $i.$j")
    assert(v(("extg/x", "0")) == 7 && v(("extg/x", "1")) == 8)
    java.nio.file.Files.delete(java.nio.file.Paths.get(path))
    java.nio.file.Files.delete(java.nio.file.Paths.get(target))
  }

  test("external links: missing file, missing object, chained hops refuse") {
    def refuse(bytes: Array[Byte], needle: String): Unit = {
      val path = writeTmp(bytes)
      val e = intercept[Exception] {
        graft.sources.Hdf5Index.read(spark, path).collect()
      }
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains(needle), msg)
      java.nio.file.Files.delete(java.nio.file.Paths.get(path))
    }
    refuse(fileMsgs { _ =>
      Seq(0x06 -> externalLink("e", "/definitely/not/there.nc", "/temp")) },
      "not found at")
    val target = writeExtTarget()
    refuse(fileMsgs { _ =>
      Seq(0x06 -> externalLink("e", target, "/absent")) },
      "not found in")
    // a target subtree that itself contains an external link refuses
    val hop = writeTmp(fileMsgs { s =>
      val d = s.pos; s.bytes(i32(1, 2))
      val ds = ohdr(s, Seq(
        0x01 -> dataspace2(Seq(2)), 0x03 -> dtInt32,
        0x08 -> layoutV4(Seq(2), 1, d)))
      val g = ohdr(s, Seq(
        0x06 -> link("inner", ds),
        0x06 -> externalLink("hop", target, "/temp")))
      Seq(0x06 -> link("grp", g))
    })
    refuse(fileMsgs { _ => Seq(0x06 -> externalLink("e", hop, "/grp")) },
      "chained cross-file links")
    // truncated value blob: declared length overruns the message — the
    // zero padding must NOT pass for the object path's terminating NUL
    refuse(fileMsgs { _ => Seq(
      0x06 -> typedLink("e", 64, Array[Byte](0, 120, 0, 47, 97))) }, // len=30776 > msg
      "overruns its message")
    java.nio.file.Files.delete(java.nio.file.Paths.get(hop))
    java.nio.file.Files.delete(java.nio.file.Paths.get(target))
  }

  test("external links: an existing empty group resolves to nothing; tar members refuse") {
    // target with an empty, attribute-less group: the link resolves (h5py
    // would hand back an empty group) and surfaces no entries
    val target = writeTmp(fileMsgs { s =>
      val g = ohdr(s, Seq.empty)
      Seq(0x06 -> link("empty", g))
    })
    val path = writeTmp(fileMsgs { s =>
      val d = s.pos; s.bytes(i32(1, 2))
      val ds = ohdr(s, Seq(
        0x01 -> dataspace2(Seq(2)), 0x03 -> dtInt32,
        0x08 -> layoutV4(Seq(2), 1, d)))
      Seq(0x06 -> link("v", ds), 0x06 -> externalLink("e", target, "/empty"))
    })
    val v = decodeAll(path)
    assert(v.keySet.map(_._1) == Set("v"), v.keySet.toString)
    // the same linking file as a tar member refuses: member-relative file
    // resolution is not defined (it would resolve against the ARCHIVE dir)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val tarFile = java.nio.file.Files.createTempFile("graft_h5ext", ".tar")
    val bos = new java.io.ByteArrayOutputStream()
    val hdr = new Array[Byte](512)
    def put(off: Int, str: String): Unit = {
      val b = str.getBytes("US-ASCII"); System.arraycopy(b, 0, hdr, off, b.length)
    }
    put(0, "m.nc"); put(100, "0000644\u0000"); put(108, "0000000\u0000")
    put(116, "0000000\u0000"); put(124, f"${bytes.length}%011o" + "\u0000")
    put(136, "00000000000\u0000"); put(148, "        "); hdr(156) = '0'
    put(257, "ustar\u0000"); put(263, "00")
    put(148, f"${hdr.map(_ & 0xff).sum}%06o" + "\u0000 ")
    bos.write(hdr); bos.write(bytes)
    bos.write(new Array[Byte]((512 - bytes.length % 512) % 512))
    bos.write(new Array[Byte](1024))
    java.nio.file.Files.write(tarFile, bos.toByteArray)
    val e = intercept[Exception] {
      graft.sources.Hdf5Index.read(spark, s"tar://m.nc::$tarFile").collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("from a tar member"), msg)
    Seq(path, target, tarFile.toString).foreach(p =>
      java.nio.file.Files.delete(java.nio.file.Paths.get(p)))
  }
}
