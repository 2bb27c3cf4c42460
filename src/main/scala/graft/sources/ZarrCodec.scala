package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Zarr v2 chunk decoding: raw chunk bytes → typed numeric values.
  *
  * The reference opens kerchunk indexes through xarray's zarr engine, which
  * decompresses each chunk and reinterprets the bytes per the `.zarray`
  * dtype (intake_esm/source.py:82-96). [[KerchunkIndex.materializeChunks]]
  * recovers the bytes; this codec takes the next step for the codecs that
  * need no external library:
  *
  *  - compressors `null` (raw), `zlib`, `gzip` — `java.util.zip` is part of
  *    the JDK — `zstd` (zarr v3's default compressor) via the zstd-jni that
  *    ships inside every Spark distribution, and `blosc` with the
  *    lz4/zstd/zlib/snappy/stored inner codecs ([[BloscCodec]]; snappy via
  *    Spark's bundled snappy-java), blosclz pure-JVM; byte- AND bit-shuffle
  *    invert. Unknown blosc codec ids stay behind the
  *    connector boundary and raise.
  *  - numpy dtype strings `<i1..i8`, `<u1..u8`, `<f4/f8`, `|b1` bool (and
  *    their `>` big-endian / `|` single-byte forms), widened to DOUBLE — one numeric
  *    output type keeps the relational surface simple, and every listed
  *    dtype except u8/i8 above 2^53 widens exactly. Non-numeric dtypes
  *    (`|S*`, `|U*`, `|O`) return null; callers filter or route them to a
  *    bytes-level path.
  *
  * Zarr v2 chunks are whole-chunk codecs over a C/F-order flattening — the
  * decoded element order IS the stored order, so the flat index is exact;
  * multi-dim coordinates derive from it with the chunk shape when needed.
  *
  * Zarr v2 FILTERS (numcodecs codecs applied before the compressor on
  * write, inverted in reverse order on read) are supported for the two
  * pure-byte/arithmetic ones: `shuffle` (byte transpose, any chain
  * position) and `delta` (stored first value + differences; must be the
  * FIRST filter, i.e. the one applied directly to the typed data, which is
  * the only place numcodecs puts it). Integer delta cumsum wraps at the
  * storage width exactly like numpy's wraparound add; f4 accumulates in
  * Float so rounding matches a float32 reader. Any other filter id refuses
  * loudly.
  */
object ZarrCodec {

  /** One parsed `.zarray` filter config (numcodecs codec config). */
  private final case class FilterSpec(id: String, elementSize: Int, astype: Option[String],
                                      dtype: Option[String])

  /** Fletcher-32 checksum over `len` bytes, the HDF5 H5_checksum_fletcher32
    * variant numcodecs copied: big-endian 16-bit words, deferred modulo
    * every 360 words, an odd trailing byte as `b << 8`, sums folded to 16
    * bits — PUBLIC algorithm (HDF5 spec / numcodecs docs). Exposed for the
    * encoder side of fixtures and tests. */
  def fletcher32(data: Array[Byte], len: Int): Long = {
    var sum1 = 0L; var sum2 = 0L
    var idx  = 0
    var words = len / 2
    while (words > 0) {
      var tlen = math.min(words, 360)
      words -= tlen
      while (tlen > 0) {
        sum1 += ((data(idx) & 0xffL) << 8) | (data(idx + 1) & 0xffL)
        sum2 += sum1
        idx += 2; tlen -= 1
      }
      sum1 = (sum1 & 0xffff) + (sum1 >> 16)
      sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    }
    if (len % 2 == 1) {
      sum1 += (data(len - 1) & 0xffL) << 8
      sum2 += sum1
      sum1 = (sum1 & 0xffff) + (sum1 >> 16)
      sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    }
    sum1 = (sum1 & 0xffff) + (sum1 >> 16)
    sum2 = (sum2 & 0xffff) + (sum2 >> 16)
    (sum2 << 16) | sum1
  }

  /** Parse the `.zarray` `filters` JSON: null / "null" / [] → no filters. */
  private def parseFilters(filters: UTF8String): List[FilterSpec] = {
    val s = if (filters == null) "" else filters.toString.trim
    if (s.isEmpty || s == "null" || s.replaceAll("\\s", "") == "[]") return Nil
    import org.json4s._
    org.json4s.jackson.JsonMethods.parse(s) match {
      case JArray(items) => items.map {
        case obj: JObject =>
          val m = obj.obj.toMap
          def str(k: String): Option[String] = m.get(k).collect { case JString(v) => v }
          def int(k: String): Option[Int] = m.get(k).collect {
            case JInt(v) => v.toInt
            case JLong(v) => v.toInt
          }
          FilterSpec(str("id").getOrElse(
              throw new IllegalArgumentException(s"zarr filter config without an id: $obj")),
            int("elementsize").getOrElse(4), str("astype"), str("dtype"))
        case other => throw new IllegalArgumentException(s"malformed zarr filter entry: $other")
      }
      case other => throw new IllegalArgumentException(s"malformed zarr filters list: $other")
    }
  }

  /** Inflate per the zarr compressor id ("" or null = stored raw). */
  def decompress(data: Array[Byte], compressor: String): Array[Byte] =
    compressor match {
      case null | "" => data
      case "zlib" =>
        val inf = new java.util.zip.Inflater()
        inf.setInput(data)
        val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
        val buf = new Array[Byte](8192)
        try {
          while (!inf.finished()) {
            val n = inf.inflate(buf)
            if (n == 0 && inf.needsDictionary())
              throw new java.util.zip.DataFormatException(
                "zlib stream requires a preset dictionary (FDICT) — unsupported")
            if (n == 0 && inf.needsInput())
              throw new java.util.zip.DataFormatException("truncated zlib stream")
            out.write(buf, 0, n)
          }
        } finally inf.end()
        out.toByteArray
      case "gzip" =>
        // close() releases the wrapped Inflater's NATIVE zlib memory now —
        // per-chunk finalizer-freed leaks add up across millions of chunks
        val in  = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(data))
        val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
        try {
          val buf = new Array[Byte](8192)
          var n   = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        } finally in.close()
        out.toByteArray
      case "zstd" => BloscCodec.zstdDecompress(data, 0, data.length, -1)
      case "blosc" => BloscCodec.decompress(data) // blosclz/lz4/zstd/zlib/snappy + (bit)shuffle
      case s if s == "crc32c" || s.endsWith("+crc32c") =>
        // zarr v3 crc32c bytes→bytes codec (zarr-specs v3 crc32c): the last
        // 4 stored bytes are the little-endian CRC32C of everything before
        // them. Verify, strip, and hand the payload to the inner codec.
        if (data.length < 4)
          throw new IllegalArgumentException(
            s"crc32c-coded chunk of ${data.length} bytes is shorter than its checksum")
        val crc = new java.util.zip.CRC32C()
        crc.update(data, 0, data.length - 4)
        val stored = java.nio.ByteBuffer.wrap(data, data.length - 4, 4)
          .order(ByteOrder.LITTLE_ENDIAN).getInt() & 0xffffffffL
        if (stored != crc.getValue)
          throw new IllegalArgumentException(
            f"crc32c mismatch on chunk: stored 0x$stored%08x, computed 0x${crc.getValue}%08x")
        decompress(java.util.Arrays.copyOf(data, data.length - 4),
          s.stripSuffix("crc32c").stripSuffix("+"))
      case other =>
        throw new UnsupportedOperationException(
          s"zarr compressor '$other' needs an external codec library — " +
            "behind the connector boundary (raw/zlib/gzip/zstd/blosc decode here)")
    }

  /** Decoded chunk as doubles, or null for non-numeric dtypes. Called from
    * both interpreted eval and generated code. Three-arg form: no filters. */
  def decode(data: Array[Byte], dtype: UTF8String, compressor: UTF8String): GenericArrayData =
    decode(data, dtype, compressor, null)

  def decode(data: Array[Byte], dtype: UTF8String, compressor: UTF8String,
             filters: UTF8String): GenericArrayData = {
    val dt  = dtype.toString
    require(dt.length >= 2, s"malformed numpy dtype '$dt'")
    val kind  = dt.charAt(1)
    if (kind != 'i' && kind != 'u' && kind != 'f' && kind != 'b') return null
    val width = dt.substring(2).toInt
    var raw   = decompress(data, if (compressor == null) "" else compressor.toString)
    // invert the filter chain in reverse write order: shuffles are byte
    // transposes applied here; a delta (typed-array level) must sit at
    // chain position 0 and is applied AFTER element decode below
    var delta: Option[FilterSpec] = None
    parseFilters(filters).zipWithIndex.reverse.foreach { case (f, pos) =>
      f.id match {
        case "shuffle" =>
          require(f.elementSize >= 1, s"zarr shuffle filter elementsize ${f.elementSize}")
          raw = BloscCodec.unshuffle(raw, f.elementSize)
        case "delta" =>
          if (pos != 0) throw new UnsupportedOperationException(
            "zarr delta filter at a non-first chain position — behind the connector boundary")
          if (f.astype.exists(a => f.dtype.forall(_ != a) || a != dt))
            throw new UnsupportedOperationException(
              s"zarr delta filter with astype ${f.astype.get} != dtype $dt — " +
                "behind the connector boundary")
          delta = Some(f)
        case "fletcher32" =>
          // verify-and-strip: 4-byte LE checksum suffix over the preceding
          // bytes (numcodecs and HDF5 share the H5_checksum_fletcher32
          // algorithm); like HDF5, also accept the byte-reversed stored
          // form its pre-1.6.3 writers emitted
          require(raw.length >= 4, "fletcher32-filtered chunk shorter than its 4-byte checksum")
          val stored = ((raw(raw.length - 1) & 0xffL) << 24) |
            ((raw(raw.length - 2) & 0xffL) << 16) |
            ((raw(raw.length - 3) & 0xffL) << 8) | (raw(raw.length - 4) & 0xffL)
          val reversed = ((stored & 0xffL) << 24) | ((stored & 0xff00L) << 8) |
            ((stored >> 8) & 0xff00L) | ((stored >> 24) & 0xffL)
          val computed = fletcher32(raw, raw.length - 4)
          require(computed == stored || computed == reversed,
            s"fletcher32 checksum mismatch: stored $stored, computed $computed — corrupt chunk")
          raw = java.util.Arrays.copyOf(raw, raw.length - 4)
        case other => throw new UnsupportedOperationException(
          s"zarr v2 filter '$other' needs an external codec library — behind the " +
            "connector boundary (only shuffle/delta/fletcher32 invert here)")
      }
    }
    require(raw.length % width == 0,
      s"chunk of ${raw.length} bytes is not a multiple of $dtype width $width")
    val order = dt.charAt(0) match {
      case '<' | '|' => ByteOrder.LITTLE_ENDIAN // '|' = single-byte, order moot
      case '>'       => ByteOrder.BIG_ENDIAN
      case c         => throw new IllegalArgumentException(s"unknown byte order '$c' in dtype '$dt'")
    }
    val buf = ByteBuffer.wrap(raw).order(order)
    val n   = raw.length / width
    val out = new Array[Double](n)
    var i   = 0
    while (i < n) {
      out(i) = (kind, width) match {
        case ('f', 4) => buf.getFloat(i * 4).toDouble
        case ('f', 8) => buf.getDouble(i * 8)
        case ('i', 1) => buf.get(i).toDouble
        case ('i', 2) => buf.getShort(i * 2).toDouble
        case ('i', 4) => buf.getInt(i * 4).toDouble
        case ('i', 8) => buf.getLong(i * 8).toDouble
        case ('u', 1) => (buf.get(i) & 0xff).toDouble
        case ('b', 1) => if (buf.get(i) != 0) 1.0 else 0.0 // numpy bool |b1
        case ('u', 2) => (buf.getShort(i * 2) & 0xffff).toDouble
        case ('u', 4) => (buf.getInt(i * 4) & 0xffffffffL).toDouble
        case ('u', 8) =>
          val v = buf.getLong(i * 8)
          if (v >= 0) v.toDouble else v.toDouble + 1.8446744073709552e19 // + 2^64
        case _ => throw new IllegalArgumentException(s"unsupported numeric dtype '$dt'")
      }
      i += 1
    }
    if (delta.isDefined && n > 0) {
      if (kind == 'f') {
        if (width == 4) {
          // accumulate in Float: a float32 reader (numpy cumsum over an f4
          // view) rounds each partial sum — double accumulation would drift
          var acc = buf.getFloat(0)
          var i = 1
          while (i < n) { acc = acc + buf.getFloat(i * 4); out(i) = acc.toDouble; i += 1 }
        } else {
          var i = 1
          while (i < n) { out(i) += out(i - 1); i += 1 }
        }
      } else {
        // integer cumsum wraps at the storage width (numpy wraparound add);
        // accumulate on the RAW stored integers, not the widened doubles
        def readLong(i: Int): Long = (kind, width) match {
          case ('i', 1)            => buf.get(i).toLong
          case ('i', 2)            => buf.getShort(i * 2).toLong
          case ('i', 4)            => buf.getInt(i * 4).toLong
          case ('u', 1) | ('b', 1) => (buf.get(i) & 0xff).toLong
          case ('u', 2)            => (buf.getShort(i * 2) & 0xffff).toLong
          case ('u', 4)            => buf.getInt(i * 4) & 0xffffffffL
          case (_, 8)              => buf.getLong(i * 8)
          case _ => throw new IllegalArgumentException(s"unsupported dtype '$dt' for delta")
        }
        def wrap(a: Long): Long = (kind, width) match {
          case (_, 8)   => a
          case ('i', w) => (a << (64 - 8 * w)) >> (64 - 8 * w)
          case (_, w)   => a & ((1L << (8 * w)) - 1)
        }
        def widen(a: Long): Double = (kind, width) match {
          case ('u', 8) => if (a >= 0) a.toDouble else a.toDouble + 1.8446744073709552e19
          case ('b', _) => if (a != 0) 1.0 else 0.0
          case _        => a.toDouble
        }
        var acc = 0L
        var i = 0
        while (i < n) { acc = wrap(acc + readLong(i)); out(i) = widen(acc); i += 1 }
      }
    }
    new GenericArrayData(out)
  }

  /** Decoded chunk as STRINGS for the fixed-width string dtypes — `|S<n>`
    * (byte strings: UTF-8 bytes, trailing NULs trimmed — numpy's own
    * convention) and `<U<n>`/`>U<n>` (UCS-4 code points, NUL-trimmed) — or
    * null for every other dtype: the LABEL plane twin of [[decode]]
    * (coordinate labels — station/region names — are first-class on real
    * stores; the numeric plane documented-drops them). Compressors invert
    * exactly like the numeric path; the only filters defined on string
    * payloads here are none (delta/shuffle are numeric-typed transforms —
    * a string chunk declaring them refuses loudly). */
  def decodeLabels(data: Array[Byte], dtype: UTF8String, compressor: UTF8String,
                   filters: UTF8String): GenericArrayData = {
    val dt = dtype.toString
    require(dt.length >= 2, s"malformed numpy dtype '$dt'")
    val kind = dt.charAt(1)
    if (kind != 'S' && kind != 'U') return null
    require(parseFilters(filters).isEmpty,
      s"zarr filters on a string chunk (dtype '$dt') — behind the connector boundary")
    val n = dt.substring(2).toInt
    require(n > 0, s"string dtype '$dt' with non-positive width")
    val raw = decompress(data, if (compressor == null) "" else compressor.toString)
    val width = if (kind == 'S') n else 4 * n
    require(raw.length % width == 0,
      s"chunk of ${raw.length} bytes is not a multiple of $dtype width $width")
    val order = dt.charAt(0) match {
      case '<' | '|' => ByteOrder.LITTLE_ENDIAN
      case '>'       => ByteOrder.BIG_ENDIAN
      case c         => throw new IllegalArgumentException(s"unknown byte order '$c' in dtype '$dt'")
    }
    val count = raw.length / width
    val out = new Array[UTF8String](count)
    var i = 0
    while (i < count) {
      if (kind == 'S') {
        var end = (i + 1) * width
        while (end > i * width && raw(end - 1) == 0) end -= 1
        out(i) = UTF8String.fromBytes(java.util.Arrays.copyOfRange(raw, i * width, end))
      } else {
        val buf = ByteBuffer.wrap(raw, i * width, width).order(order)
        val sb = new java.lang.StringBuilder(n)
        var j = 0
        var done = false
        while (j < n && !done) {
          val cp = buf.getInt(i * width + 4 * j)
          if (cp == 0) done = true // numpy U pads with NUL code points
          else { sb.appendCodePoint(cp); j += 1 }
        }
        out(i) = UTF8String.fromString(sb.toString)
      }
      i += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[AnyRef]])
  }

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** `zarr_decode_labels(data, dtype, compressor, filters)` → array<string>
    * (null for non-string dtypes) — the label plane. Same null-safe-eval
    * coalesce caveat as [[zarr_decode]]. */
  def zarr_decode_labels(data: Column, dtype: Column, compressor: Column,
                         filters: Column): Column =
    column(ZarrChunkDecodeLabels(expression(data), expression(dtype),
      expression(compressor), expression(filters)))

  /** `zarr_decode(data, dtype, compressor[, filters])` → array<double>
    * (null for non-numeric dtypes). Pass `coalesce(compressor, '')` /
    * `coalesce(filters, 'null')` — a SQL NULL argument would null the whole
    * row under null-safe eval. */
  def zarr_decode(data: Column, dtype: Column, compressor: Column): Column =
    zarr_decode(data, dtype, compressor, org.apache.spark.sql.functions.lit("null"))

  def zarr_decode(data: Column, dtype: Column, compressor: Column, filters: Column): Column =
    column(ZarrChunkDecode(expression(data), expression(dtype),
      expression(compressor), expression(filters)))
}

/** Native expression form of [[ZarrCodec.decode]]: the decode loop runs as
  * one static call inside whole-stage codegen, so a scan → decode → explode
  * pipeline stays a single generated stage. */
case class ZarrChunkDecode(first: Expression, second: Expression, third: Expression,
                           fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean  = true // non-numeric dtype → null

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (BinaryType, StringType, StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"zarr_decode expects (binary, string, string, string), got $other")
    }

  override def nullSafeEval(data: Any, dtype: Any, compressor: Any, filters: Any): Any =
    ZarrCodec.decode(data.asInstanceOf[Array[Byte]],
      dtype.asInstanceOf[UTF8String], compressor.asInstanceOf[UTF8String],
      filters.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, t, c, f) => {
      s"""
         |${ev.value} = graft.sources.ZarrCodec.decode($d, $t, $c, $f);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

/** Native expression form of [[ZarrCodec.decodeLabels]] — the label plane's
  * twin of [[ZarrChunkDecode]], same single-generated-stage shape. */
case class ZarrChunkDecodeLabels(first: Expression, second: Expression, third: Expression,
                                 fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean  = true // non-string dtype → null

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (BinaryType, StringType, StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"zarr_decode_labels expects (binary, string, string, string), got $other")
    }

  override def nullSafeEval(data: Any, dtype: Any, compressor: Any, filters: Any): Any =
    ZarrCodec.decodeLabels(data.asInstanceOf[Array[Byte]],
      dtype.asInstanceOf[UTF8String], compressor.asInstanceOf[UTF8String],
      filters.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, t, c, f) => {
      s"""
         |${ev.value} = graft.sources.ZarrCodec.decodeLabels($d, $t, $c, $f);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}
