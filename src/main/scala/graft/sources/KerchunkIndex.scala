package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Catalog-plane reader for kerchunk `reference://` indexes
  * (fsspec reference filesystem, kerchunk v1 JSON).
  *
  * The reference opens these through xarray's zarr engine with
  * `storage_options.fo = urlpath` (intake_esm/source.py:82-86, enum
  * cat.py:56-64). The INDEX itself is pure JSON — no codec involved — so the
  * chunk map is fully enumerable here; only the byte-range decode of the
  * chunks stays behind the engine's connector boundary
  * (EsmDataSource.openAsset).
  *
  * A v1 index is `{"version": 1, "refs": {key: inline-string | [url] |
  * [url, offset, length], ...}}` where keys are zarr paths
  * (`variable/chunk.coords` or `.../.zarray|.zattrs|.zgroup` metadata).
  * The values are HETEROGENEOUS (string or array), so the shred uses
  * Spark 4's VariantType — `parse_json` + `variant_explode` — in an
  * executor task (not the driver), and everything DOWNSTREAM of the shred
  * (the per-entry rows) is fully distributed. The parse itself is
  * single-task: a v1 index is one JSON document (wholetext), bounded by
  * the JVM's 2 GB string limit — far beyond the reference's sample
  * indexes, but an index that big should be kerchunk parquet refs, a
  * different reader.
  */
object KerchunkIndex {

  /** One row per reference entry:
    * (key, variable, member, kind ∈ meta|inline|ref, url, offset, length,
    * inline_value). `variable` is "" for root-level keys; inline values keep
    * their `base64:` prefix when binary.
    */
  def read(spark: SparkSession, rawPath: String,
           storageOptions: Map[String, String] = Map.empty): DataFrame = {
    // kerchunk reference documents are routinely HOSTED over https (the
    // fsspec `reference://` chain the reference uses, source.py:82-96);
    // the index json is the small catalog plane, so it rides the cached
    // whole-file http fetch. The chunk byte-ranges it points at keep
    // refusing http at the connector boundary (no seekable FS).
    val path = if (HttpFetch.isHttp(rawPath))
      HttpFetch.fetchCached(rawPath, HttpFetch.maxBytesFrom(storageOptions))
    else rawPath
    val raw = spark.read.option("wholetext", "true").options(storageOptions).text(path)
    // variant_explode is a table-valued function — LATERAL over a scoped
    // temp view; the view entry can drop once the plan is analyzed
    val view = "graft_kerchunk_" + java.util.UUID.randomUUID().toString.replace("-", "")
    raw.createOrReplaceTempView(view)
    val entries =
      try spark.sql(
        s"""SELECT e.key AS key, e.value AS value
           | FROM $view AS t,
           | LATERAL variant_explode(variant_get(parse_json(t.value), '$$.refs', 'variant')) AS e
           |""".stripMargin)
      finally spark.catalog.dropTempView(view)
    val member = substring_index(col("key"), "/", -1)
    entries.select(
      col("key"),
      when(col("key").contains("/"),
        expr("substring(key, 1, length(key) - length(substring_index(key, '/', -1)) - 1)"))
        .otherwise(lit("")).as("variable"),
      member.as("member"),
      when(member.startsWith("."), lit("meta"))
        .when(expr("schema_of_variant(value)").startsWith("ARRAY"), lit("ref"))
        .otherwise(lit("inline")).as("kind"),
      expr("try_variant_get(value, '$[0]', 'string')").as("url"),
      expr("try_variant_get(value, '$[1]', 'long')").as("offset"),
      expr("try_variant_get(value, '$[2]', 'long')").as("length"),
      expr("try_variant_get(value, '$', 'string')").as("inline_value"),
    )
  }

  /** Materialize the BYTES each reference entry points at — one level deeper
    * than the chunk map, matching the reference's zarr open of the same
    * index (source.py:82-86) for the storage schemes available here:
    *
    *  - `inline`/`meta` entries: the value itself is the chunk — UTF-8
    *    bytes, or base64-decoded when `base64:`-prefixed (kerchunk v1 spec);
    *  - `ref` entries with a url: a POSITIONED read of exactly
    *    (offset, length) — never the whole file — through the Hadoop
    *    `FileSystem` API, so `file://` (and bare paths) and `hdfs://` share
    *    one code path and object-store schemes need only their connector
    *    jar (`s3a://` + hadoop-aws, ...), not a code change. Rows are
    *    repartitioned by (url, offset band) and range-sorted inside each
    *    partition, so each task reads its ranges in ascending order AND one
    *    physical file with thousands of chunks (the kerchunk-over-netCDF
    *    shape) spreads across ~fileBytes/bytesPerTask tasks instead of
    *    serializing into one;
    *  - `ref` entries whose scheme has no installed Hadoop FileSystem
    *    (s3:// without a connector), or an http(s):// url (Hadoop's http FS
    *    cannot seek, so positioned range reads are impossible): raise
    *    `UnsupportedOperationException` — the engine's connector boundary
    *    (same posture as EsmDataSource.openAsset).
    *
    * Output: (key, variable, member, kind, url, offset, length, data:binary).
    *
    * `maxChunkBytes` bounds a single positioned read (default 256 MiB): a
    * corrupt index with a pathological length must fail loudly, not OOM an
    * executor. `bytesPerTask` is the offset-band width of the partition key
    * (default 256 MiB): smaller values spread one file across more tasks.
    */
  def materializeChunks(entries: DataFrame,
                        maxChunkBytes: Long = 256L << 20,
                        bytesPerTask: Long = 256L << 20,
                        storageOptions: Map[String, String] = Map.empty): DataFrame = {
    require(bytesPerTask > 0, s"bytesPerTask must be positive, got $bytesPerTask")
    val spark = entries.sparkSession
    import spark.implicits._
    val cols = Seq("key", "variable", "member", "kind", "url", "offset", "length", "data")

    // NOTE: `inline_value` is non-null even for ARRAY entries (variant '$'
    // as string yields the JSON text), so branching must use kind + url:
    // a metadata entry (.zattrs etc.) stored as a byte-range ref has
    // kind='meta' but a non-null url — it belongs to the positioned-read
    // branch, not silently dropped (nor decoded as its own JSON text)
    val inline = entries
      .filter(col("kind") =!= "ref" && col("url").isNull && col("inline_value").isNotNull)
      .withColumn("data",
        when(col("inline_value").startsWith("base64:"),
          unbase64(expr("substring(inline_value, 8)")))
          .otherwise(col("inline_value").cast(org.apache.spark.sql.types.BinaryType)))
      .select(cols.map(col): _*)

    val hconf = new org.apache.spark.util.SerializableConfiguration(
      FsPaths.confWith(spark.sparkContext.hadoopConfiguration, storageOptions))
    val withBand = entries.filter(col("kind") === "ref" || col("url").isNotNull)
      .select($"key", $"variable", $"member", $"kind", $"url", $"offset", $"length",
        floor(coalesce($"offset", lit(0L)) / lit(bytesPerTask)).as("__band"))
      // persisted: the band count below is an EAGER job, and without the
      // persist it would recompute the whole upstream entries plan (for
      // kerchunk, the wholetext JSON parse + variant shred) once for the
      // count and again for the refs read — ref METADATA is ~100 B/row, so
      // the persist is small; Spark's LRU reclaims it
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // (url, offset band), NOT url alone: all chunks of one physical file on
    // one key would serialize a 1000-chunk netCDF into a single task —
    // banding bounds per-task byte volume while the within-partition sort
    // below keeps each task's reads sequential-ascending per file. The
    // partition count is pinned to the distinct band count (one tiny
    // metadata-only job over the persisted band frame): left to AQE,
    // coalescing would size on the SHUFFLED bytes — ref metadata —
    // underestimating by orders of magnitude the positioned-read volume
    // each row fans out into.
    val nTasks = {
      val bands = withBand.select("url", "__band").distinct().count()
      math.max(1L, math.min(bands, 1L << 20)).toInt
    }
    val refs = withBand
      .repartition(nTasks, col("url"), col("__band"))
      .sortWithinPartitions("url", "offset")
      .drop("__band")
      .as[(String, String, String, String, String, Option[Long], Option[Long])]
      .mapPartitions { it =>
        val conf = hconf.value
        var openUrl: String = null
        var openPath: org.apache.hadoop.fs.Path = null
        var fs: org.apache.hadoop.fs.FileSystem = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        var fileLen = -1L // lazy: only stat'd when a ref omits its length
        def hadoopPath(url: String): org.apache.hadoop.fs.Path = {
          val scheme = if (url.contains("://")) url.takeWhile(_ != ':').toLowerCase else ""
          // Hadoop's http(s) FileSystem cannot seek — positioned range
          // reads are impossible over it, so refuse rather than stream
          // whole objects
          if (scheme == "http" || scheme == "https") FsPaths.connectorRefusal(url, null)
          FsPaths.hadoopPath(url)
        }
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => if (in != null) in.close()))
        it.map { case (key, variable, member, kind, url, offsetOpt, lengthOpt) =>
          // null BEFORE the open-url comparison: null urls sort first, so
          // `null != openUrl(=null)` is false and the open would be skipped,
          // turning the malformed-ref diagnostic into an NPE downstream
          if (url == null) throw new IllegalArgumentException(
            s"kerchunk entry '$key': malformed ref (empty array — no url)")
          if (url != openUrl) {
            if (in != null) { in.close(); in = null }
            openPath = hadoopPath(url)
            try {
              fs = FsPaths.fileSystemFor(openPath, conf)
              in = fs.open(openPath)
            } catch {
              case e: java.io.IOException if FsPaths.isNoFilesystem(e) =>
                FsPaths.connectorRefusal(url, e)
            }
            fileLen = -1L
            openUrl = url
          }
          // a bare `[url]` ref (no offset/length) is the whole file per the
          // kerchunk v1 spec
          val offset = offsetOpt.getOrElse(0L)
          val length = lengthOpt.getOrElse {
            if (fileLen < 0) fileLen = fs.getFileStatus(openPath).getLen
            fileLen - offset
          }
          require(length >= 0 && length <= maxChunkBytes,
            s"kerchunk chunk $key: length $length outside [0, $maxChunkBytes]")
          val buf = new Array[Byte](length.toInt)
          // PositionedReadable pread: no seek-state churn between the
          // interleaved ranges of different bands of the same file
          try in.readFully(offset, buf, 0, length.toInt)
          catch {
            case e: java.io.EOFException => throw new IllegalArgumentException(
              s"kerchunk chunk $key: EOF reading [$offset, ${offset + length}) of $url", e)
          }
          (key, variable, member, kind, url, offset, length, buf)
        }
      }
      .toDF("key", "variable", "member", "kind", "url", "offset", "length", "data")
      .select(cols.map(col): _*)

    inline.unionByName(refs)
  }

  /** Zarr array metadata per variable, parsed from the `.zarray` entries:
    * (variable, dtype, shape, chunks, compressor, filters). These
    * sub-documents have a fixed schema, so plain JSON functions suffice. */
  def arrayMeta(entries: DataFrame): DataFrame =
    entries.filter(col("member") === ".zarray")
      .select(
        col("variable"),
        get_json_object(col("inline_value"), "$.dtype").as("dtype"),
        from_json(get_json_object(col("inline_value"), "$.shape"), ArrayType(LongType)).as("shape"),
        from_json(get_json_object(col("inline_value"), "$.chunks"), ArrayType(LongType)).as("chunks"),
        get_json_object(col("inline_value"), "$.compressor.id").as("compressor"),
        get_json_object(col("inline_value"), "$.filters").as("filters"),
        // in-chunk element order: "C" (row-major, the default) or "F" —
        // absent means C (kerchunk refs often omit it)
        coalesce(get_json_object(col("inline_value"), "$.order"), lit("C")).as("order"),
        // stored-axis permutation for a zarr v3 transpose codec that is
        // neither identity nor full reversal (ZarrDirectoryIndex embeds
        // it); null for every plain C/F array
        from_json(get_json_object(col("inline_value"), "$._graft_perm"),
          ArrayType(LongType)).as("perm"),
      )

  /** Dimension names per variable from the `.zattrs` `_ARRAY_DIMENSIONS`
    * attribute — the zarr v2 / xarray convention the reference's open
    * consumes (source.py:82-96). Variables without the attribute are absent
    * (callers left-join and fall back to positional `dim<i>` names). */
  def attrDims(entries: DataFrame): DataFrame =
    entries.filter(col("member") === ".zattrs")
      .select(
        col("variable"),
        from_json(get_json_object(col("inline_value"), "$._ARRAY_DIMENSIONS"),
          ArrayType(org.apache.spark.sql.types.StringType)).as("dims"))
      .filter(col("dims").isNotNull)

  /** [[decodeTyped]] plus LABELED COORDINATES: each value's flat in-chunk
    * position is mapped to its per-dimension GLOBAL indices — what an ESM
    * user actually addresses (time/lat/lon), mirroring the reference's
    * dimension-labeled xarray open (source.py:82-96) one step further than
    * the flat `idx`.
    *
    * Pure integer math from the `.zarray` geometry: the chunk key "r.c"
    * gives the chunk's grid position, C-order strides over `chunks` give the
    * local coords, `global_d = grid_d * chunks_d + local_d`. Zarr v2 stores
    * EDGE chunks padded to the full chunk shape, so any element whose
    * global coordinate exceeds `shape` is write-padding, not data — dropped
    * here (values land exactly once, never duplicated).
    *
    * Output: (variable, chunk, idx, value, dims: array&lt;string&gt;,
    * coords: array&lt;long&gt;) — `dims` from `_ARRAY_DIMENSIONS` when
    * declared, else `dim0..dimN`. Everything is per-row projection over the
    * decoded rows plus two broadcast joins of per-variable metadata: no
    * shuffle, embarrassingly parallel at 100 TB.
    */
  def decodeCoords(chunks: DataFrame, meta: DataFrame, dims: DataFrame): DataFrame = {
    val grid = transform(split(col("chunk"), "[.]"), s => s.cast("long"))
    // in-chunk stride per the declared element order: C (row-major,
    // stride_d = prod(chunks[d+1..]), every mainstream writer's default)
    // or F (column-major, stride_d = prod(chunks[..d-1]) — v2 order:"F",
    // or a v3 full-reversal transpose codec translated to it). Any other
    // declared order asserts loudly below rather than mis-addressing.
    val coordsExpr = transform(sequence(lit(0), size(col("chunks")) - 1), d => {
      val strideC = aggregate(
        slice(col("chunks"), d + lit(2), size(col("chunks"))), lit(1L), (a, x) => a * x)
      val strideF = aggregate(
        slice(col("chunks"), lit(1), d), lit(1L), (a, x) => a * x)
      // general stored-axis permutation (a v3 transpose that is neither
      // identity nor reversal): stored axis k holds logical dim perm[k],
      // so the stored chunk shape is perm-gathered and logical dim d
      // reads stored axis k = position of d in perm, with C strides over
      // the STORED shape
      val storedChunks = transform(col("perm"), p => get(col("chunks"), p.cast("int")))
      val k = (array_position(col("perm"), d.cast("long")) - 1).cast("int")
      val strideP = aggregate(
        slice(storedChunks, k + lit(2), size(storedChunks)), lit(1L), (a, x) => a * x)
      val stride = when(col("perm").isNotNull, strideP)
        .when(col("order") === "F", strideF).otherwise(strideC)
      val local = call_function("div", col("idx").cast("long"), stride) % get(col("chunks"), d)
      get(grid, d) * get(col("chunks"), d) + local
    })
    val named = coalesce(col("dims"),
      transform(sequence(lit(0), size(col("chunks")) - 1), d => concat(lit("dim"), d)))
    decodeTyped(chunks, meta)
      .join(broadcast(meta.select(col("variable"), col("shape"), col("chunks"),
        coalesce(col("order"), lit("C")).as("order"), col("perm"))), Seq("variable"))
      .join(broadcast(dims), Seq("variable"), "left")
      .filter(coalesce(assert_true(col("order").isin("C", "F"),
        concat(lit("zarr variable '"), col("variable"), lit("' declares order '"),
          col("order"), lit("' — only C and F address correctly"))), lit(true)))
      // 0-d (scalar) arrays: zarr stores shape [] / chunks [] with chunk
      // key "0" — normalize both to [1] so the grid math yields coord [0];
      // un-normalized, sequence(0, -1) makes coords null and the padding
      // filter silently drops the value
      .withColumn("shape", when(size(col("shape")) === 0, array(lit(1L))).otherwise(col("shape")))
      .withColumn("chunks", when(size(col("chunks")) === 0, array(lit(1L))).otherwise(col("chunks")))
      // coords staged into its own projection: referenced by the padding
      // filter AND the output — inlining would re-evaluate the whole
      // transform per reference
      .select(col("variable"), col("chunk"), col("idx"), col("value"),
        col("shape"), named.as("dims"), coordsExpr.as("coords"))
      .filter(forall(zip_with(col("coords"), col("shape"), (g, s) => g < s), b => b))
      .drop("shape")
  }

  /** Decode materialized DATA chunks into typed values — the full depth of
    * the reference's zarr open (source.py:82-96) for the codecs the JDK
    * carries (raw/zlib/gzip; see [[ZarrCodec]]).
    *
    * Each chunk row joins its variable's `.zarray` metadata — a broadcast
    * (one tiny row per variable) — then decompresses, splits elements and
    * widens to double inside ONE generated stage, exploding to
    * (variable, chunk, idx, value) rows. `idx` is the element's flat
    * position in the chunk's stored order (C-order row-major for every
    * writer that matters). At 100 TB the work is embarrassingly parallel:
    * per-chunk decode, no shuffle until whatever aggregation follows.
    *
    * Rows whose dtype is non-numeric are dropped (the codec returns null).
    * Declared v2 filters are inverted for shuffle/delta ([[ZarrCodec]]);
    * any other filter id raises — silently wrong values would be worse
    * than a loud connector-boundary error.
    */
  def decodeTyped(chunks: DataFrame, meta: DataFrame): DataFrame = {
    val dataChunk = chunks.filter(col("member").rlike("^[0-9]+([.][0-9]+)*$"))
      // LEFT join so a data chunk whose variable has NO .zarray row (or a
      // .zarray stored as a byte-range ref, which arrayMeta cannot parse —
      // dtype comes back null either way) is still present to fail the
      // dtype assertion below; an inner join would silently drop its data
      .join(broadcast(meta), Seq("variable"), "left")
      // assert_true returns NULL on pass (coalesce → keep row) and raises on
      // the guarded condition — evaluated per row, inside the scan stage
      .filter(coalesce(assert_true(col("dtype").isNotNull,
        concat(lit("zarr variable '"), col("variable"),
          lit("' has no inline .zarray metadata (missing, or stored as a " +
            "byte-range ref) — cannot decode its chunks"))),
        lit(true)))
    dataChunk
      .select(col("variable"), col("member").as("chunk"),
        posexplode(ZarrCodec.zarr_decode(col("data"), col("dtype"),
          coalesce(col("compressor"), lit("")), coalesce(col("filters"), lit("null")))))
      .select(col("variable"), col("chunk"), col("pos").as("idx"), col("col").as("value"))
  }
}
