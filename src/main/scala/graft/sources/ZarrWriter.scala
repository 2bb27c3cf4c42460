package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** zarr v2 DIRECTORY-store writer — the sink half of the container plane
  * (the engine reads zarr v2/v3, netCDF-3/4, kerchunk, DAP2; this closes
  * the round trip: anything the tidy decode plane produces can be
  * written back as a store any zarr reader — including our own — opens).
  * Format per the public zarr v2 spec: `.zgroup` at the root, per-variable
  * `.zarray`/`.zattrs`, C-order chunk files named `i.j.k`, little-endian
  * payloads, optional zlib compressor, optional per-variable numcodecs
  * FILTER chains (r13 — `delta`/`shuffle`/`fletcher32`, the write half of
  * ZarrCodec's inversion; see [[validateFilters]] for the rules), edge
  * chunks PADDED to full chunk shape with the declared `fill_value` (the
  * convention every writer follows and our decodeCoords relies on).
  *
  * Input: the tidy decode-plane shape — (variable: string, dims:
  * array&lt;string&gt;, coords: array&lt;long&gt;, value: double) plus an
  * optional `label: string` column for string-dtyped variables (the
  * label plane's shape, [[KerchunkIndex.decodeLabelCoords]]).
  *
  * Per-variable dtypes (the read-side dtype table in reverse; default
  * `<f8`): `<f8`, `<f4`, `<i8`, `<i4`, `<i2`, `|i1`, `|u1`, `<u2`, `<u4`
  * encode from `value` — non-integral, out-of-range, beyond-2^53 (i8:
  * doubles carry integers exactly only to 2^53), or not-exactly-float32
  * (f4) values refuse loudly rather than silently rounding; `|S<n>`
  * (UTF-8 bytes, NUL-padded) and `<U<n>` (UCS-4 LE, NUL-padded) encode
  * from `label` — a bare `|S`/`<U` auto-sizes the width to the longest
  * label; labels over an explicit width, or containing NUL (the padding
  * character — it cannot round-trip), refuse loudly.
  *
  * Spark-first scale shape:
  *  - per-variable geometry (dims, shape = max coord + 1, a chunk band
  *    along the FIRST dimension sized to `maxChunkBytes`) derives from
  *    one metadata aggregation that also carries the duplicate-cell
  *    guard (countDistinct(coords) — a duplicate refuses loudly;
  *    last-writer-wins would be silent data loss) and the per-plane
  *    null guards; the input persists once for the metadata and write
  *    passes; a pre-existing store at the target path is cleared first
  *    (the reader walks the directory, so stale chunks would silently
  *    corrupt reads);
  *  - every row maps to (chunk file, in-chunk C-order offset) by pure
  *    arithmetic against a broadcast geometry table; ONE shuffle groups
  *    rows by chunk file; each task assembles and writes its chunks
  *    through the Hadoop FileSystem API (local, HDFS, or any connector
  *    FS) — embarrassingly parallel, chunk-sized memory;
  *  - cells absent from the input read back as `fill_value` (0 / "") —
  *    the writer is for DENSE planes; sparsity is the caller's contract.
  */
object ZarrWriter {

  private final case class Geo(variable: String, dims: Seq[String], shape: Seq[Long],
                               chunks: Seq[Long], nBands: Long, dtype: String)

  /** Bytes per element of a supported write dtype. */
  private def widthOf(dtype: String): Int = dtype match {
    case "<f8" => 8
    case "<f4" => 4
    case "<i8" => 8
    case "<i4" => 4
    case "<i2" => 2
    case "|i1" => 1
    case "|u1" => 1
    case "<u2" => 2
    case "<u4" => 4
    case s if s.startsWith("|S") => s.drop(2).toInt
    case u if u.startsWith("<U") => 4 * u.drop(2).toInt
  }

  private def isString(dtype: String): Boolean =
    dtype.startsWith("|S") || dtype.startsWith("<U")

  private def isInteger(dtype: String): Boolean =
    dtype == "<i8" || dtype == "<i4" || dtype == "<i2" || dtype == "|i1" ||
      dtype == "|u1" || dtype == "<u2" || dtype == "<u4"

  /** Validate a per-variable v2 FILTER chain against its resolved dtype
    * (r13 — the write half of ZarrCodec's filter inversion): `delta`
    * (integer dtypes only — float delta does not round-trip bit-exactly,
    * so this writer refuses to create one even though the reader decodes
    * foreign float-delta stores; must be FIRST, where numcodecs puts it),
    * `shuffle` (byte transpose at the dtype width), `fletcher32`
    * (trailing 4-byte LE checksum). String dtypes take no filters (the
    * reader's label plane refuses them). */
  private def validateFilters(v: String, dtype: String, chain: Seq[String]): Unit = {
    require(!isString(dtype) || chain.isEmpty,
      s"ZarrWriter: variable '$v' ($dtype) requests filters ${chain.mkString(",")} — " +
        "string dtypes take no filters (the reader refuses them)")
    chain.zipWithIndex.foreach {
      case ("delta", i) =>
        require(i == 0,
          s"ZarrWriter: variable '$v' puts delta at chain position $i — numcodecs " +
            "applies delta to the typed data, so it must be FIRST")
        require(isInteger(dtype),
          s"ZarrWriter: variable '$v' requests delta on $dtype — float deltas do not " +
            "round-trip bit-exactly; integer dtypes only")
      case ("shuffle", _) | ("fletcher32", _) => ()
      case (other, _) => throw new IllegalArgumentException(
        s"ZarrWriter: variable '$v' requests unknown filter '$other' — " +
          "supported: delta, shuffle, fletcher32")
    }
  }

  /** numcodecs config JSON for a validated chain. */
  private def filtersJson(dtype: String, chain: Seq[String]): String =
    if (chain.isEmpty) "null"
    else chain.map {
      case "delta" => s"""{"id": "delta", "dtype": "$dtype", "astype": "$dtype"}"""
      case "shuffle" => s"""{"id": "shuffle", "elementsize": ${widthOf(dtype)}}"""
      case "fletcher32" => """{"id": "fletcher32"}"""
    }.mkString("[", ", ", "]")

  /** Apply a validated chain to one chunk's raw bytes, in chain order
    * (the compressor runs after). Delta subtracts in two's complement —
    * exactly the wraparound the reader's cumsum undoes at every width. */
  private def applyFilters(raw0: Array[Byte], dtype: String, chain: Seq[String]): Array[Byte] = {
    var raw = raw0
    chain.foreach {
      case "delta" =>
        val width = widthOf(dtype)
        val buf = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val n = raw.length / width
        val out = java.nio.ByteBuffer.allocate(raw.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var prev = 0L
        var i = 0
        while (i < n) {
          val cur = width match {
            case 1 => buf.get(i).toLong
            case 2 => buf.getShort(i * 2).toLong
            case 4 => buf.getInt(i * 4).toLong
            case _ => buf.getLong(i * 8)
          }
          val d = if (i == 0) cur else cur - prev // wraps like numpy diff
          width match {
            case 1 => out.put(i, d.toByte)
            case 2 => out.putShort(i * 2, d.toShort)
            case 4 => out.putInt(i * 4, d.toInt)
            case _ => out.putLong(i * 8, d)
          }
          prev = cur
          i += 1
        }
        raw = out.array()
      case "shuffle" => raw = BloscCodec.shuffle(raw, widthOf(dtype))
      case "fletcher32" =>
        val sum = ZarrCodec.fletcher32(raw, raw.length)
        val out = java.util.Arrays.copyOf(raw, raw.length + 4)
        out(raw.length) = (sum & 0xff).toByte
        out(raw.length + 1) = ((sum >> 8) & 0xff).toByte
        out(raw.length + 2) = ((sum >> 16) & 0xff).toByte
        out(raw.length + 3) = ((sum >> 24) & 0xff).toByte
        raw = out
    }
    raw
  }

  // r13: full parity with the READ side's numeric table (ZarrCodec widens
  // every one of these exactly to double, so each round-trips through the
  // tidy plane) — a plane read from an f4/u2/... store can now write back
  // without a dtype change
  private val DtypePattern =
    "^(<f8|<f4|<i8|<i4|<i2|\\|i1|\\|u1|<u2|<u4|\\|S[0-9]*|<U[0-9]*)$".r

  /** Per-variable geometry + input guards, shared by the v2 and v3
    * writers: ONE aggregation JOB (r19 — the per-variable meta grain and
    * the per-dimension extent grain fuse under a sentinel posexplode)
    * carrying the duplicate-cell check (countDistinct(coords) — a
    * duplicate refuses loudly), the per-plane null guards, the string
    * auto-width, and every dimension's max/min extent; then a chunk band
    * along the FIRST dimension sized to the byte budget.
    *
    * The fusion (guide §1.2 — remove passes): every input row explodes
    * over `[-1] ++ coords` — slot pos = 0 is the META plane (exactly one
    * row per input row, every original column), slot pos = p ≥ 1 is
    * dimension p-1's EXTENT plane (`col` = that coordinate) — and one
    * `groupBy(variable, pos)` computes both grains where r18 ran two
    * full-input aggregation jobs (meta + extents) over the persisted
    * plane. The meta aggregates are gated to the sentinel group
    * (`when(pos = 0, …)`), so the distinct/width work is not repeated
    * per dimension; null `coords` coalesce to the bare sentinel so such
    * rows still hit the meta plane and refuse on the cell-count
    * mismatch exactly as before. Answers and refusal order are
    * unchanged (ZarrWriterSpec pins the refusals). */
  private def geometry(df: DataFrame, maxChunkBytes: Long,
                       dtypes: Map[String, String]): Array[Geo] = {
    dtypes.foreach { case (v, dt) =>
      require(DtypePattern.matches(dt),
        s"ZarrWriter: variable '$v' requests unsupported dtype '$dt' — " +
          "supported: <f8, <f4, <i8, <i4, <i2, |i1, |u1, <u2, <u4, |S[n], <U[n]")
    }
    def metaAt(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(col("pos") === 0, c)
    val fused = df
      .select(col("variable"), col("dims"), col("coords"), col("value"), col("label"),
        posexplode(concat(array(lit(-1L)),
          coalesce(col("coords"), array().cast("array<long>")))))
      .groupBy("variable", "pos")
      .agg(max(col("col")).as("mx"),
        min(col("col")).as("mn"),
        count(metaAt(lit(1))).as("n"),
        countDistinct(metaAt(col("dims"))).as("nd"),
        first(metaAt(col("dims"))).as("dims"),
        max(metaAt(size(col("coords")))).as("rankMax"),
        min(metaAt(size(col("coords")))).as("rankMin"),
        countDistinct(metaAt(col("coords"))).as("ncells"),
        count(metaAt(col("value"))).as("nvals"),
        count(metaAt(col("label"))).as("nlabels"),
        coalesce(max(metaAt(octet_length(col("label")))), lit(0)).as("maxBytes"),
        coalesce(max(metaAt(length(col("label")))), lit(0)).as("maxChars"))
      .collect()
    val metaRows = fused.filter(_.getAs[Int]("pos") == 0)
    require(metaRows.nonEmpty, "ZarrWriter: empty input")
    val present = metaRows.map(_.getAs[String]("variable")).toSet
    dtypes.keys.foreach(v => require(present.contains(v),
      s"ZarrWriter: dtype given for variable '$v', which is not in the input"))
    metaRows.foreach { r =>
      val v = r.getAs[String]("variable")
      require(r.getAs[Long]("nd") == 1L, s"ZarrWriter: variable '$v' carries inconsistent dims")
      require(r.getAs[Int]("rankMax") == r.getAs[Int]("rankMin") && r.getAs[Int]("rankMax") >= 1,
        s"ZarrWriter: variable '$v' has ragged coords")
      require(r.getAs[scala.collection.Seq[String]]("dims").length == r.getAs[Int]("rankMax"),
        s"ZarrWriter: variable '$v' dims/coords rank mismatch")
      require(r.getAs[Long]("ncells") == r.getAs[Long]("n"),
        s"ZarrWriter: variable '$v' has " +
          s"${r.getAs[Long]("n") - r.getAs[Long]("ncells")} duplicate coordinate cells — refusing " +
          "(silent last-writer-wins would lose data)")
      val dt = dtypes.getOrElse(v, "<f8")
      if (isString(dt))
        require(r.getAs[Long]("nlabels") == r.getAs[Long]("n"),
          s"ZarrWriter: string variable '$v' ($dt) has null labels — " +
            "string dtypes encode the 'label' column")
      else
        require(r.getAs[Long]("nvals") == r.getAs[Long]("n"),
          s"ZarrWriter: numeric variable '$v' ($dt) has null values — " +
            "did you mean a string dtype over the 'label' column?")
    }
    val shapes = fused.filter(_.getAs[Int]("pos") >= 1)
      .groupBy(_.getAs[String]("variable"))
      .map { case (v, rows) =>
        rows.foreach(r => require(r.getAs[Long]("mn") >= 0L,
          s"ZarrWriter: variable '$v' has negative coordinates"))
        v -> rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Long]("mx") + 1L)
      }
    metaRows.map { r =>
      val v = r.getAs[String]("variable")
      val dims = r.getAs[scala.collection.Seq[String]]("dims").toSeq
      val shape = shapes(v).toSeq
      val maxBytes = r.getAs[Int]("maxBytes")
      val maxChars = r.getAs[Int]("maxChars")
      // bare |S / <U auto-size to the data; explicit widths must FIT
      val dtype = dtypes.getOrElse(v, "<f8") match {
        case "|S" => "|S" + math.max(1, maxBytes)
        case "<U" => "<U" + math.max(1, maxChars)
        case s if s.startsWith("|S") =>
          require(maxBytes <= s.drop(2).toInt,
            s"ZarrWriter: variable '$v' has a $maxBytes-byte label, over its declared $s")
          s
        case u if u.startsWith("<U") =>
          require(maxChars <= u.drop(2).toInt,
            s"ZarrWriter: variable '$v' has a $maxChars-char label, over its declared $u")
          u
        case num => num
      }
      require(widthOf(dtype) > 0,
        s"ZarrWriter: variable '$v' resolves to zero-width dtype '$dtype'")
      val width = widthOf(dtype).toLong
      val rowElems = shape.drop(1).product
      val band = math.max(1L,
        math.min(shape.head, maxChunkBytes / width / math.max(1L, rowElems)))
      val nBands = (shape.head + band - 1) / band
      Geo(v, dims, shape, band +: shape.drop(1), nBands, dtype)
    }
  }

  /** Normalize the tidy input: `value` (double) and `label` (string) are
    * each optional — a missing one is added as null — but at least one
    * must exist, and present ones must carry the contract types. */
  private def normalize(df0: DataFrame): DataFrame = {
    val hasValue = df0.columns.contains("value")
    val hasLabel = df0.columns.contains("label")
    require(hasValue || hasLabel,
      "ZarrWriter: input needs a 'value' (double) or 'label' (string) column")
    if (hasValue) require(df0.schema("value").dataType == DoubleType,
      s"ZarrWriter: value column must be double, got ${df0.schema("value").dataType}")
    if (hasLabel) require(df0.schema("label").dataType == StringType,
      s"ZarrWriter: label column must be string, got ${df0.schema("label").dataType}")
    val withValue = if (hasValue) df0 else df0.withColumn("value", lit(null).cast(DoubleType))
    if (hasLabel) withValue else withValue.withColumn("label", lit(null).cast(StringType))
  }

  /** Assemble one chunk's raw (pre-compression) bytes: zeroed buffer =
    * fill (0 / ""), cells written at their C-order offsets, per-dtype
    * range/integrality/width refusals. */
  private def encodeCells(dtype: String, nElems: Int,
                          cells: Seq[(Long, Option[Double], Option[String])],
                          where: String): Array[Byte] = {
    val width = widthOf(dtype)
    val buf = java.nio.ByteBuffer.allocate(nElems * width)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def num(v: Option[Double], off: Long): Double =
      v.getOrElse(throw new IllegalArgumentException(
        s"ZarrWriter: null value at offset $off of $where"))
    def str(s: Option[String], off: Long): String =
      s.getOrElse(throw new IllegalArgumentException(
        s"ZarrWriter: null label at offset $off of $where"))
    def integral(v: Double, lo: Double, hi: Double): Long = {
      require(v == math.rint(v) && v >= lo && v <= hi,
        s"ZarrWriter: value $v is not an integral $dtype in [$lo, $hi] for $where — " +
          "refusing (silent rounding/truncation would corrupt the store)")
      v.toLong
    }
    cells.foreach { case (off, v, s) =>
      require(off >= 0 && off < nElems,
        s"ZarrWriter: offset $off out of chunk range $nElems for $where")
      val at = off.toInt * width
      dtype match {
        case "<f8" => buf.putDouble(at, num(v, off))
        case "<f4" =>
          val d = num(v, off)
          // refuse a lossy narrow: every float32 widens to double exactly,
          // so a tidy plane READ from an f4 store always passes; NaN is
          // legal (self-inequality breaks the == check, test it apart)
          require(d.isNaN || d.toFloat.toDouble == d,
            s"ZarrWriter: value $d is not exactly representable as <f4 for $where — " +
              "refusing (silent float32 rounding would corrupt the store)")
          buf.putFloat(at, d.toFloat)
        case "<i4" => buf.putInt(at, integral(num(v, off), Int.MinValue, Int.MaxValue).toInt)
        // 2^53: the largest range a double-carried integer survives exactly
        case "<i8" => buf.putLong(at, integral(num(v, off), -9007199254740992.0, 9007199254740992.0))
        case "<i2" => buf.putShort(at, integral(num(v, off), Short.MinValue, Short.MaxValue).toShort)
        case "|i1" => buf.put(at, integral(num(v, off), Byte.MinValue, Byte.MaxValue).toByte)
        case "|u1" => buf.put(at, integral(num(v, off), 0.0, 255.0).toByte)
        case "<u2" => buf.putShort(at, integral(num(v, off), 0.0, 65535.0).toShort)
        case "<u4" => buf.putInt(at, integral(num(v, off), 0.0, 4294967295.0).toInt)
        case t if t.startsWith("|S") =>
          val text = str(s, off)
          require(!text.contains('\u0000'),
            s"ZarrWriter: label at offset $off of $where contains NUL — " +
              "the |S padding character cannot round-trip")
          val bytes = text.getBytes("UTF-8")
          require(bytes.length <= width,
            s"ZarrWriter: ${bytes.length}-byte label at offset $off of $where over $dtype")
          buf.put(at, bytes)
        case u if u.startsWith("<U") =>
          val text = str(s, off)
          val cps = text.codePoints().toArray
          require(!cps.contains(0),
            s"ZarrWriter: label at offset $off of $where contains NUL — " +
              "the <U padding code point cannot round-trip")
          require(cps.length * 4 <= width,
            s"ZarrWriter: ${cps.length}-code-point label at offset $off of $where over $dtype")
          cps.zipWithIndex.foreach { case (cp, j) => buf.putInt(at + 4 * j, cp) }
      }
    }
    buf.array()
  }

  private def clearStore(storePath: String,
                         conf: org.apache.hadoop.conf.Configuration): Unit = {
    // clear any pre-existing store FIRST: readers discover chunks by
    // walking the directory, so stale chunk files from an earlier write
    // with different geometry would silently corrupt reads
    val root = new org.apache.hadoop.fs.Path(storePath)
    val fs = root.getFileSystem(conf)
    if (fs.exists(root)) fs.delete(root, true)
  }

  private def putFile(storePath: String, rel: String, bytes: Array[Byte],
                      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = new org.apache.hadoop.fs.Path(storePath, rel)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  /** v2 `.zarray` fill_value JSON per dtype: floats 0.0, ints 0, strings
    * "" — matching the zeroed chunk buffers [[encodeCells]] fills. */
  private def fillJson(dtype: String): String =
    if (dtype == "<f8" || dtype == "<f4") "0.0"
    else if (isString(dtype)) "\"\"" else "0"

  def write(df0: DataFrame, storePath: String,
            maxChunkBytes: Long = 4L << 20,
            compress: Boolean = true,
            dtypes: Map[String, String] = Map.empty,
            filters: Map[String, Seq[String]] = Map.empty): Unit = {
    val spark = df0.sparkSession
    // the input feeds two actions (fused geometry, chunk write) —
    // persist once so an expensive upstream plan computes once, not 2×
    val df = normalize(df0).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try writeCached(df, spark, storePath, maxChunkBytes, compress, dtypes, filters)
    finally df.unpersist(false)
  }

  private def writeCached(df: DataFrame, spark: org.apache.spark.sql.SparkSession,
                          storePath: String, maxChunkBytes: Long,
                          compress: Boolean, dtypes: Map[String, String],
                          filters: Map[String, Seq[String]]): Unit = {
    // chain-vs-dtype rules are decidable from the declared dtypes alone
    // (a bare |S/<U is still a string dtype), so refuse BEFORE geometry
    // runs its full-input aggregation job
    filters.foreach { case (v, chain) =>
      validateFilters(v, dtypes.getOrElse(v, "<f8"), chain) }
    val geos = geometry(df, maxChunkBytes, dtypes)
    val present = geos.map(_.variable).toSet
    filters.keys.foreach(v => require(present.contains(v),
      s"ZarrWriter: filters given for variable '$v', which is not in the input"))

    // ---- driver-side metadata documents
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    clearStore(storePath, conf.value)
    def writeFile(rel: String, bytes: Array[Byte]): Unit =
      putFile(storePath, rel, bytes, conf.value)
    def jarr(xs: Seq[Long]): String = xs.mkString("[", ", ", "]")
    writeFile(".zgroup", """{"zarr_format": 2}""".getBytes("UTF-8"))
    geos.foreach { g =>
      val comp = if (compress) """{"id": "zlib", "level": 6}""" else "null"
      val fjson = filtersJson(g.dtype, filters.getOrElse(g.variable, Nil))
      writeFile(s"${g.variable}/.zarray",
        (s"""{"zarr_format": 2, "dtype": "${g.dtype}", """ +
          s""""shape": ${jarr(g.shape)}, """ +
          s""""chunks": ${jarr(g.chunks)}, "compressor": $comp, "filters": $fjson, """ +
          s""""order": "C", "fill_value": ${fillJson(g.dtype)}}""").getBytes("UTF-8"))
      writeFile(s"${g.variable}/.zattrs",
        ("""{"_ARRAY_DIMENSIONS": """ +
          g.dims.map(d => "\"" + d + "\"").mkString("[", ", ", "]") + "}")
          .getBytes("UTF-8"))
    }

    // ---- data: map rows to (chunk file, offset), one shuffle, write
    import spark.implicits._
    val geoDf = broadcast(geos.toSeq.map(g =>
        (g.variable, g.chunks.head,
          // C-order strides over the CHUNK shape
          g.chunks.indices.map(d => g.chunks.drop(d + 1).product)))
      .toDF("variable", "band", "__strides"))
    val keyed = df
      .join(geoDf, Seq("variable"))
      .withColumn("__member", concat_ws(".",
        (call_function("div", element_at(col("coords"), 1), col("band")).cast("string")
          +: (1 until geos.map(_.chunks.size).max).map(d =>
            when(size(col("coords")) > d, lit("0")).otherwise(lit(null)))): _*))
      .withColumn("__off",
        aggregate(
          zip_with(
            concat(array(element_at(col("coords"), 1) % col("band")),
              slice(col("coords"), lit(2), size(col("coords")) - 1)),
            col("__strides"), (c, s) => c * s),
          lit(0L), (a, x) => a + x))
      .select(col("variable"), col("__member"), col("__off"), col("value"), col("label"))

    val nChunksTotal = geos.map(_.nBands).sum
    val zlib = compress
    val byVar = geos.map(g => g.variable ->
      ((g.chunks.product.toInt, g.dtype, filters.getOrElse(g.variable, Nil)))).toMap
    keyed
      .groupBy("variable", "__member")
      .agg(collect_list(struct(col("__off"), col("value"), col("label"))).as("cells"))
      .repartition(math.max(1, math.min(nChunksTotal,
        spark.sparkContext.defaultParallelism.toLong)).toInt)
      .select(col("variable"), col("__member"), col("cells"))
      .as[(String, String, Seq[(Long, Option[Double], Option[String])])]
      .foreachPartition { it: Iterator[(String, String, Seq[(Long, Option[Double], Option[String])])] =>
        it.foreach { case (variable, member, cells) =>
          val (n, dtype, chain) = byVar(variable)
          val raw = applyFilters(
            encodeCells(dtype, n, cells, s"$variable/$member"), dtype, chain)
          val bytes =
            if (!zlib) raw
            else {
              val d = new java.util.zip.Deflater(6)
              d.setInput(raw); d.finish()
              val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
              val tmp = new Array[Byte](8192)
              while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
              d.end()
              out.toByteArray
            }
          val p = new org.apache.hadoop.fs.Path(storePath, s"$variable/$member")
          val fs = p.getFileSystem(conf.value)
          val os = fs.create(p, true)
          try os.write(bytes) finally os.close()
        }
      }
  }

  // ------------------------------------------------------------------ v3

  /** zarr v3 directory-store writer — same tidy input contract and scale
    * shape as [[write]], emitting the v3 layout our own
    * [[ZarrDirectoryIndex]] (and any v3 reader) opens: one `zarr.json`
    * per node, core data types (`float64`/`int32`/`int64`; `|S<n>` labels
    * ride the core RAW BITS type `r{8n}` since core v3 defines no
    * fixed-width string — our reader translates them back, other readers
    * see spec-legal opaque bytes; `<U` refuses in v3 mode, use `|S`), the
    * `bytes` (little-endian) codec optionally chained with `gzip`,
    * `zstd`, or a blosc chain (v3 stores in the wild increasingly
    * default to zstd; r* arrays carry the core spec's raw-bits
    * fill_value form — an array of N/8 zero bytes — since the member is
    * spec-mandatory; our reader never consults it), default chunk-key
    * encoding (`c/i/j…`), and first-class `dimension_names`.
    *
    * `shardInnerChunks >= 2` switches on `sharding_indexed` — v3's
    * many-chunks-per-object layout and the reason v3 matters at 100 TB:
    * each stored object packs that many dim-0 chunk bands plus a
    * trailing index (16 B/slot u64 offset+nbytes little-endian, absent
    * slot = all-ones = fill, crc32c suffix — the spec defaults), cutting
    * object-store file count (and listing/request pressure) by the
    * factor while keeping chunk-granular reads through the index. One
    * task writes one shard: inner chunks encode independently and
    * concatenate, so memory stays shard-sized. */
  def writeV3(df0: DataFrame, storePath: String,
              maxChunkBytes: Long = 4L << 20,
              compress: Boolean = true,
              shardInnerChunks: Int = 0,
              dtypes: Map[String, String] = Map.empty,
              codec: String = "gzip"): Unit = {
    val spark = df0.sparkSession
    require(shardInnerChunks == 0 || shardInnerChunks >= 2,
      s"ZarrWriter: shardInnerChunks must be 0 (unsharded) or >= 2, got $shardInnerChunks")
    require(codec == "gzip" || codec == "zstd" || codec == "blosc",
      s"ZarrWriter: v3 codec must be gzip, zstd, or blosc, got '$codec'")
    dtypes.foreach { case (v, dt) =>
      require(!dt.startsWith("<U"),
        s"ZarrWriter: variable '$v' requests '$dt' in v3 mode — core v3 has no " +
          "UCS-4 fixed-width string; use |S (UTF-8 bytes over raw bits)")
    }
    val df = normalize(df0).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try writeV3Cached(df, spark, storePath, maxChunkBytes, compress, shardInnerChunks,
      dtypes, codec)
    finally df.unpersist(false)
  }

  private def gzipBytes(raw: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos) { `def`.setLevel(6) }
    gz.write(raw); gz.close()
    bos.toByteArray
  }

  /** v3 `data_type` name for a write dtype (see [[writeV3]] on r*). */
  private def v3DataType(dtype: String): String = dtype match {
    case "<f8" => "float64"
    case "<f4" => "float32"
    case "<i8" => "int64"
    case "<i4" => "int32"
    case "<i2" => "int16"
    case "|i1" => "int8"
    case "|u1" => "uint8"
    case "<u2" => "uint16"
    case "<u4" => "uint32"
    case s if s.startsWith("|S") => "r" + (8 * s.drop(2).toInt)
  }

  private def writeV3Cached(df: DataFrame, spark: org.apache.spark.sql.SparkSession,
                            storePath: String, maxChunkBytes: Long,
                            compress: Boolean, shardInnerChunks: Int,
                            dtypes: Map[String, String], codec: String): Unit = {
    val geos = geometry(df, maxChunkBytes, dtypes)
    val sharded = shardInnerChunks >= 2
    val sl = if (sharded) shardInnerChunks.toLong else 1L
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    clearStore(storePath, conf.value)

    // ---- metadata: one zarr.json per node
    def jarr(xs: Seq[Long]): String = xs.mkString("[", ", ", "]")
    def jstrs(xs: Seq[String]): String =
      xs.map("\"" + _ + "\"").mkString("[", ", ", "]")
    putFile(storePath, "zarr.json",
      """{"zarr_format": 3, "node_type": "group"}""".getBytes("UTF-8"), conf.value)
    // blosc (r14) writes the reader's own blosc1-lz4 frame so v3 stores
    // can target blosc-preferring consumers; the config members mirror
    // what BloscCodec.compress emits (lz4, byte-shuffle when the element
    // width is 2..255 — the frame's own encoder rule)
    def bloscTs(g: Geo): Int = {
      val w = widthOf(g.dtype)
      if (w > 255) 1 else w // c-blosc can't represent typesize > 255
    }
    def compCodecFor(g: Geo): String = codec match {
      case "gzip" => """{"name": "gzip", "configuration": {"level": 6}}"""
      case "zstd" => """{"name": "zstd", "configuration": {"level": 3, "checksum": false}}"""
      case "blosc" =>
        val ts = bloscTs(g)
        val shuf = if (ts > 1) "shuffle" else "noshuffle"
        s"""{"name": "blosc", "configuration": {"cname": "lz4", "clevel": 5, """ +
          s""""shuffle": "$shuf", "typesize": $ts, "blocksize": 0}}"""
    }
    def innerCodecsFor(g: Geo): String =
      if (compress)
        s"""[{"name": "bytes", "configuration": {"endian": "little"}}, ${compCodecFor(g)}]"""
      else """[{"name": "bytes", "configuration": {"endian": "little"}}]"""
    geos.foreach { g =>
      val gridChunks =
        if (sharded) (g.chunks.head * sl) +: g.chunks.drop(1) else g.chunks
      val innerCodecs = innerCodecsFor(g)
      val codecs =
        if (!sharded) innerCodecs
        else
          s"""[{"name": "sharding_indexed", "configuration": {""" +
            s""""chunk_shape": ${jarr(g.chunks)}, "codecs": $innerCodecs, """ +
            """"index_codecs": [{"name": "bytes", "configuration": {"endian": "little"}}, """ +
            """{"name": "crc32c"}], "index_location": "end"}}]"""
      // fill_value is a REQUIRED member of v3 core array metadata. r*
      // (|S labels) arrays carry the core spec's raw-bits form — an array
      // of N/8 byte integers (all zero: our pad byte) — so conforming
      // third-party readers accept them (r13 omitted the member, which
      // was spec-invalid; our own reader treats absent chunks as fill
      // without consulting it either way). Numerics carry 0 / 0.0.
      val fill =
        if (isString(g.dtype))
          s""""fill_value": ${Seq.fill(g.dtype.drop(2).toInt)(0).mkString("[", ", ", "]")}, """
        else if (g.dtype == "<f8" || g.dtype == "<f4") """"fill_value": 0.0, """
        else """"fill_value": 0, """
      putFile(storePath, s"${g.variable}/zarr.json",
        (s"""{"zarr_format": 3, "node_type": "array", "shape": ${jarr(g.shape)}, """ +
          s""""data_type": "${v3DataType(g.dtype)}", "chunk_grid": {"name": "regular", """ +
          s""""configuration": {"chunk_shape": ${jarr(gridChunks)}}}, """ +
          """"chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}}, """ +
          s"""$fill"codecs": $codecs, """ +
          s""""dimension_names": ${jstrs(g.dims)}}""").getBytes("UTF-8"), conf.value)
    }

    // ---- data: row → (stored object, inner slot, in-chunk offset);
    // ONE shuffle groups rows by stored object (= shard when sharding)
    import spark.implicits._
    val geoDf = broadcast(geos.toSeq.map(g =>
        (g.variable, g.chunks.head,
          g.chunks.indices.map(d => g.chunks.drop(d + 1).product)))
      .toDF("variable", "band", "__strides"))
    val maxRank = geos.map(_.chunks.size).max
    val keyed = df
      .join(geoDf, Seq("variable"))
      .withColumn("__bandIdx",
        call_function("div", element_at(col("coords"), 1), col("band")))
      .withColumn("__member", concat_ws("/",
        (lit("c") +: call_function("div", col("__bandIdx"), lit(sl)).cast("string")
          +: (1 until maxRank).map(d =>
            when(size(col("coords")) > d, lit("0")).otherwise(lit(null)))): _*))
      .withColumn("__slot", (col("__bandIdx") % lit(sl)).cast("int"))
      .withColumn("__off",
        aggregate(
          zip_with(
            concat(array(element_at(col("coords"), 1) % col("band")),
              slice(col("coords"), lit(2), size(col("coords")) - 1)),
            col("__strides"), (c, s) => c * s),
          lit(0L), (a, x) => a + x))
      .select(col("variable"), col("__member"), col("__slot"), col("__off"),
        col("value"), col("label"))

    val nObjects = geos.map(g => (g.nBands + sl - 1) / sl).sum
    val zip = compress
    val zstd = codec == "zstd"
    val blosc = codec == "blosc"
    val tsByVar = geos.map(g => g.variable -> bloscTs(g)).toMap
    val byVar = geos.map(g => g.variable -> ((g.chunks.product.toInt, g.dtype))).toMap
    val slots = sl.toInt
    keyed
      .groupBy("variable", "__member")
      .agg(collect_list(struct(col("__slot"), col("__off"), col("value"), col("label")))
        .as("cells"))
      .repartition(math.max(1, math.min(nObjects,
        spark.sparkContext.defaultParallelism.toLong)).toInt)
      .select(col("variable"), col("__member"), col("cells"))
      .as[(String, String, Seq[(Int, Long, Option[Double], Option[String])])]
      .foreachPartition { it: Iterator[(String, String, Seq[(Int, Long, Option[Double], Option[String])])] =>
        it.foreach { case (variable, member, cells) =>
          val (n, dtype) = byVar(variable)
          def encodeChunk(slotCells: Seq[(Int, Long, Option[Double], Option[String])]): Array[Byte] = {
            val raw = encodeCells(dtype, n,
              slotCells.map { case (_, off, v, s) => (off, v, s) }, s"$variable/$member")
            if (!zip) raw
            else if (blosc) BloscCodec.compress(raw, tsByVar(variable))
            else if (zstd) com.github.luben.zstd.Zstd.compress(raw, 3)
            else gzipBytes(raw)
          }
          val bytes =
            if (slots == 1) encodeChunk(cells) // plain v3 chunk object
            else {
              // shard: present inner chunks concatenated + trailing index
              val bySlot = cells.groupBy(_._1)
              val out = new java.io.ByteArrayOutputStream()
              val index = java.nio.ByteBuffer.allocate(16 * slots + 4)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              (0 until slots).foreach { slot =>
                bySlot.get(slot) match {
                  case Some(sc) =>
                    val enc = encodeChunk(sc)
                    index.putLong(out.size.toLong); index.putLong(enc.length.toLong)
                    out.write(enc)
                  case None => // absent inner chunk = fill (all-ones sentinel)
                    index.putLong(-1L); index.putLong(-1L)
                }
              }
              val crc = new java.util.zip.CRC32C()
              crc.update(index.array(), 0, 16 * slots)
              index.putInt(crc.getValue.toInt)
              out.write(index.array())
              out.toByteArray
            }
          putFile(storePath, s"$variable/$member", bytes, conf.value)
        }
      }
  }
}
