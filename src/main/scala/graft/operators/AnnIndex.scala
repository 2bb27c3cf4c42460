package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftColumnBridge

/** Persisted IVF-PQ VECTOR-INDEX store — the maintenance path that makes
  * similarity search affordable over a GROWING corpus, the embedding-plane
  * twin of [[KeywordSearch]]'s BM25 posting index: [[Similarity.pqTopK]]
  * re-trains and re-encodes the whole corpus per battery (right for
  * one-shot searches), while a production deployment indexes once and
  * appends deltas — zero corpus re-scans and zero re-trainings per search.
  *
  * Layout (the engine's store conventions: batch-dir data, metadata LAST):
  *
  *   <dir>/meta.json            {"format":"graft-ann-index","version":1,
  *                               "batches":B,"n":N,"dim":D,"m":M}
  *   <dir>/model.json           frozen coarse centroids + PQ codebooks,
  *                              floats as raw IEEE-754 bits (bit-exact
  *                              across the JSON round trip — decimal text
  *                              would drift the last ulp and break the
  *                              bit-identical-to-in-flight contract)
  *   <dir>/vectors/b<i>/cell=<c>/part-….parquet
  *                              (id, codes array<int>, vnorm double,
  *                               vec array<float>), hive-partitioned by
  *                              coarse cell
  *
  * Why this layout carries to 100 TB:
  *  - probes PRUNE PARTITIONS: a query touches `nProbe` of `nCells`
  *    `cell=` directories — the scan's PartitionFilters skip the rest of
  *    the store without opening a file (pinned in PlanAuditSpec);
  *  - the candidate scan is COLUMN-PRUNED: ADC scoring reads only
  *    (id, codes, vnorm) — M ints + a double per vector; the raw `vec`
  *    bytes are read only for the `k·refine` short-list re-rank;
  *  - TRAIN ON A SAMPLE: `train` lets the k-means/codebook fit run over a
  *    sample while the full corpus encodes under the fitted model — the
  *    standard IVF-PQ workflow (nobody Lloyd-iterates 100 TB);
  *  - APPEND NEVER RETRAINS: deltas encode under the frozen build-time
  *    model (batch files are immutable; only meta.json moves). That is the
  *    textbook IVF contract — and its caveat: if the delta distribution
  *    drifts far from the training sample, quantization error grows until
  *    a rebuild refreshes the model. The index stores exact norms and
  *    re-ranks with exact cosines, so drift degrades RECALL, never the
  *    correctness of returned scores.
  *
  * Crash/concurrency posture (the kerchunk/bm25-index conventions):
  * `meta.json` writes LAST and atomically (staged hidden sibling +
  * `FileContext` rename), so a reader mid-append sees the old consistent
  * snapshot and a crashed append leaves only an orphan batch dir that the
  * next append's overwrite-mode write clobbers. Appends are SINGLE-WRITER;
  * the optimistic meta recheck turns the common interleaving into a loud
  * refusal.
  *
  * Search results are BIT-IDENTICAL to [[Similarity.pqTopK]] run with the
  * same parameters over the same corpus (same NearestCells/PqEncode/
  * PqAdcDot kernels, same driver-side probe order and ADC tables, same
  * two-stage deterministic top-k; floats round-trip parquet exactly) —
  * which is what the `ann_index_search` gate pins.
  */
object AnnIndex {

  import graft.functions.VectorFunctions.{nearest_cells, vec_cosine, vec_dot}

  /** Build an index at `dir`: fit the coarse quantizer and PQ codebooks on
    * `train` (default: the corpus itself), then encode the whole corpus
    * under the fitted model as batch 0. Rows with a null vector are
    * dropped (they belong to no cell and can never be returned). */
  def annIndexBuild(corpus: DataFrame, idCol: String, vecCol: String,
                    dir: String, nCells: Int = 16, m: Int = 8,
                    nCentroids: Int = 16, kmeansIters: Int = 2,
                    train: Option[DataFrame] = None,
                    overwrite: Boolean = false): Unit = {
    val spark = corpus.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val root = graft.sources.FsPaths.hadoopPath(dir)
    val fs = graft.sources.FsPaths.fileSystemFor(root, conf)
    val metaPath = new org.apache.hadoop.fs.Path(root, "meta.json")
    if (fs.exists(metaPath)) {
      require(overwrite,
        s"annIndexBuild: '$dir' already holds an index — pass overwrite = true " +
          "to rebuild, or annIndexAppend to grow it")
      fs.delete(root, true)
    }
    val trainDf = train.getOrElse(corpus)
    val probe = trainDf.select(col(vecCol)).filter(col(vecCol).isNotNull).limit(1).collect()
    require(probe.nonEmpty, "annIndexBuild: training set has no vectors")
    val dim = probe(0).getAs[scala.collection.Seq[Float]](0).length
    require(m > 0 && dim % m == 0,
      s"annIndexBuild: vector dim $dim not divisible by m = $m subspaces")
    val (_, cents) =
      Similarity.kmeansCentroidArrays(trainDf, idCol, vecCol, nCells, kmeansIters)
    val books =
      Similarity.pqCodebooks(trainDf, idCol, vecCol, dim, m, nCentroids, kmeansIters)
    writeModel(fs, root, cents, books)
    val n = writeBatch(corpus, idCol, vecCol, dir, batch = 0, dim, cents, books)
    writeMeta(fs, metaPath, batches = 1, n = n, dim = dim, m = m)
  }

  /** Append a vector delta: only the DELTA is scanned and encoded (under
    * the frozen build-time model); existing batch files never rewrite. */
  def annIndexAppend(spark: SparkSession, dir: String,
                     delta: DataFrame, idCol: String, vecCol: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = graft.sources.FsPaths.hadoopPath(dir)
    val fs = graft.sources.FsPaths.fileSystemFor(root, conf)
    val metaPath = new org.apache.hadoop.fs.Path(root, "meta.json")
    val (batches, n0, dim, m) = readMeta(fs, metaPath, dir)
    val (cents, books) = readModel(fs, root, dir)
    require(books.length == m, // model/meta cross-check: a mixed-up store refuses
      s"annIndexAppend: '$dir' model holds ${books.length} codebooks but meta says m = $m")
    // id-collision guard vs the store: a delta-sized semi-join against the
    // store's one pruned id column — never a vector-volume read
    val old = readBatches(spark, dir, batches).select("id")
    val clash = delta.select(col(idCol).as("id"))
      .join(old, Seq("id"), "left_semi").limit(1).count()
    require(clash == 0L,
      s"annIndexAppend: delta re-uses ids already in '$dir' — index semantics " +
        "are per-vector; assign fresh ids or rebuild")
    val dn = writeBatch(delta, idCol, vecCol, dir, batch = batches, dim, cents, books)
    // optimistic single-writer check (the bm25-index convention): another
    // append committing mid-flight means both targeted the SAME batch
    // number — refuse loudly rather than commit disagreeing stats
    val (batchesNow, _, _, _) = readMeta(fs, metaPath, dir)
    require(batchesNow == batches,
      s"annIndexAppend: concurrent append detected on '$dir' (batches " +
        s"advanced $batches → $batchesNow mid-append) — appends are " +
        "single-writer; retry this delta")
    writeMeta(fs, metaPath, batches + 1, n0 + dn, dim, m)
  }

  /** Search the index: zero corpus scans, zero training — probed cells
    * become PartitionFilters on the store, ADC scores the column-pruned
    * candidates, and the `k·refine` short list re-ranks with exact
    * cosines. Output columns and the deterministic (cosine desc,
    * neighbor_id asc) tie rule match [[Similarity.pqTopK]] exactly.
    * `queries` must be a driver-sized battery (vectors are collected to
    * build the per-query ADC tables, exactly as in pqTopK). */
  def annSearchIndexed(spark: SparkSession, dir: String,
                       queries: DataFrame, qidCol: String, qvecCol: String,
                       k: Int = 10, nProbe: Int = 8, refine: Int = 4): DataFrame = {
    require(k >= 1 && nProbe >= 1 && refine >= 1,
      s"annSearchIndexed: k, nProbe, refine must be >= 1 (got $k, $nProbe, $refine)")
    val conf = spark.sparkContext.hadoopConfiguration
    val root = graft.sources.FsPaths.hadoopPath(dir)
    val fs = graft.sources.FsPaths.fileSystemFor(root, conf)
    val (batches, n, dim, _) = readMeta(fs,
      new org.apache.hadoop.fs.Path(root, "meta.json"), dir)
    require(n > 0, s"annSearchIndexed: index at '$dir' holds no vectors")
    val (cents, books) = readModel(fs, root, dir)
    val qRows = queries.select(col(qidCol).as("query_id"), col(qvecCol).as("__qv"))
      .filter(col("__qv").isNotNull).collect()
    require(qRows.nonEmpty, "annSearchIndexed: empty query battery")
    qRows.foreach { r =>
      val d = r.getAs[scala.collection.Seq[Float]](1).length
      require(d == dim,
        s"annSearchIndexed: query '${r.get(0)}' has dim $d, index at '$dir' holds dim $dim")
    }
    val store = readBatches(spark, dir, batches)

    val perQuery = qRows.map { r =>
      val qid = r.get(0)
      val qv = r.getAs[scala.collection.Seq[Float]](1).toArray
      // probe order and ADC table: the same driver math as pqTopK —
      // cosine-desc probe rule (matching the corpus's NearestCells
      // assignment metric), deterministic tie on cell index
      var qn0 = 0.0
      qv.foreach(x => qn0 += x.toDouble * x.toDouble)
      val qNorm = math.sqrt(qn0)
      val probed: Seq[Int] = cents.indices
        .sortBy { c =>
          var dot = 0.0; var cn = 0.0; var i = 0
          while (i < dim) {
            dot += qv(i).toDouble * cents(c)(i).toDouble
            cn += cents(c)(i).toDouble * cents(c)(i).toDouble
            i += 1
          }
          val cos = if (qNorm == 0.0 || cn == 0.0) -2.0 else dot / (qNorm * math.sqrt(cn))
          (-cos, c)
        }(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int))
        .take(nProbe)
      val table: Array[Array[Double]] = {
        var off = 0
        books.map { book =>
          val sd = book.head.length
          val t = book.map { cent =>
            var s = 0.0; var i = 0
            while (i < sd) { s += qv(off + i).toDouble * cent(i).toDouble; i += 1 }
            s
          }
          off += sd
          t
        }
      }
      val adc = GraftColumnBridge.column(graft.functions.PqAdcDot(
        GraftColumnBridge.expression(col("codes")), table))
      store
        .filter(col("cell").isin(probed.map(Int.box): _*))
        .select(typedLit(qid).as("query_id"), col("id").as("neighbor_id"),
          (adc / (lit(qNorm) * col("vnorm"))).as("__approx"))
    }.reduce(_ unionByName _)

    // short list by approximate cosine, then exact re-rank from the
    // store's vec column (read only for the k·refine survivors)
    val shortList = Similarity.twoStageTopK(perQuery, "query_id",
        Seq(col("__approx").desc, col("neighbor_id").asc), k * refine, "__ar")
      .select("query_id", "neighbor_id")
    val cVec = store.select(col("id").as("neighbor_id"), col("vec"))
    val qVec = broadcast(queries
      .select(col(qidCol).as("query_id"), col(qvecCol).as("__qv"))
      .filter(col("__qv").isNotNull))
    val rescored = shortList.join(cVec, "neighbor_id").join(qVec, "query_id")
      .withColumn("cosine", vec_cosine(col("vec"), col("__qv")))
    Similarity.twoStageTopK(rescored, "query_id",
        Seq(col("cosine").desc, col("neighbor_id").asc), k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Each batch root is hive-partitioned by `cell`; reading roots one by
    * one (and unioning) keeps per-root partition discovery — a multi-path
    * read would have to guess a common basePath across batch dirs. */
  private def readBatches(spark: SparkSession, dir: String, batches: Int): DataFrame =
    (0 until batches).map(i => spark.read.parquet(s"$dir/vectors/b$i"))
      .reduce(_ unionByName _)

  /** One delta ENCODE → a `vectors/b<i>` batch (overwrite mode, so an
    * orphan dir from a crashed append clobbers): pre-flight stats (row
    * count, id uniqueness, dim bounds) come from ONE small aggregate over
    * the delta — a wrong-dim or duplicate-id delta refuses before any
    * bytes land. One shuffle clusters rows by coarse cell so each `cell=`
    * directory holds contiguous files. Returns the delta's row count. */
  private def writeBatch(docs: DataFrame, idCol: String, vecCol: String,
                         dir: String, batch: Int, dim: Int,
                         cents: Array[Array[Float]],
                         books: Array[Array[Array[Float]]]): Long = {
    val rows = docs.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .filter(col("__v").isNotNull)
    val st = rows.agg(count(lit(1)), countDistinct(col("id")),
      min(size(col("__v"))), max(size(col("__v")))).collect()(0)
    val dn = st.getLong(0)
    require(dn > 0L,
      s"annIndex: delta holds no non-null vectors — nothing would grow in '$dir'")
    require(st.getLong(1) == dn,
      s"annIndex: delta has ${dn - st.getLong(1)} duplicate ids — index " +
        "semantics are per-vector; dedupe ids first")
    require(st.getInt(2) == dim && st.getInt(3) == dim,
      s"annIndex: delta vector dims span [${st.getInt(2)}, ${st.getInt(3)}] " +
        s"but the index at '$dir' holds dim $dim")
    val codes = GraftColumnBridge.column(graft.functions.PqEncode(
      GraftColumnBridge.expression(col("__v")), books))
    rows
      .select(col("id"),
        element_at(nearest_cells(col("__v"), cents, 1), 1).as("cell"),
        codes.as("codes"),
        sqrt(vec_dot(col("__v"), col("__v"))).as("vnorm"),
        col("__v").as("vec"))
      .repartition(col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$dir/vectors/b$batch")
    dn
  }

  // ------------------------------------------------------------- metadata

  /** Atomic meta commit — staged hidden sibling + `FileContext` rename
    * (the kerchunk/bm25 convention): a crash mid-write leaves the OLD
    * meta readable; a truncate-in-place create would brick the store. */
  private def writeMeta(fs: org.apache.hadoop.fs.FileSystem,
                        metaPath: org.apache.hadoop.fs.Path,
                        batches: Int, n: Long, dim: Int, m: Int): Unit = {
    val json = s"""{"format": "graft-ann-index", "version": 1, """ +
      s""""batches": $batches, "n": $n, "dim": $dim, "m": $m}"""
    atomicWrite(fs, metaPath, json)
  }

  private def readMeta(fs: org.apache.hadoop.fs.FileSystem,
                       metaPath: org.apache.hadoop.fs.Path,
                       dir: String): (Int, Long, Int, Int) = {
    require(fs.exists(metaPath),
      s"'$dir' is not an ann index (no meta.json — build one with annIndexBuild)")
    val j = parseJsonFile(fs, metaPath)
    import org.json4s._
    (j \ "format") match {
      case JString("graft-ann-index") => ()
      case other => throw new IllegalArgumentException(
        s"'$dir' meta.json format is $other, not graft-ann-index")
    }
    def long(field: String): Long = (j \ field) match {
      case JInt(v) => v.longValue
      case other => throw new IllegalArgumentException(
        s"'$dir' meta.json '$field' is ${other.getClass.getSimpleName}")
    }
    // an unknown layout version must refuse loudly, not be misread
    require(long("version") == 1L,
      s"'$dir' is a graft-ann-index layout version ${long("version")} — " +
        "this engine reads version 1")
    (long("batches").toInt, long("n"), long("dim").toInt, long("m").toInt)
  }

  /** The frozen model, floats as raw bits: centroids nCells×dim, codebooks
    * m×K×(dim/m). Written once at build; appends and searches only read. */
  private def writeModel(fs: org.apache.hadoop.fs.FileSystem,
                         root: org.apache.hadoop.fs.Path,
                         cents: Array[Array[Float]],
                         books: Array[Array[Array[Float]]]): Unit = {
    def bits(v: Array[Float]): String =
      v.map(java.lang.Float.floatToRawIntBits).mkString("[", ",", "]")
    def matrix(mat: Array[Array[Float]]): String =
      mat.map(bits).mkString("[", ",", "]")
    val json = s"""{"format": "graft-ann-model", "version": 1, """ +
      s""""cents": ${matrix(cents)}, """ +
      s""""books": ${books.map(matrix).mkString("[", ",", "]")}}"""
    atomicWrite(fs, new org.apache.hadoop.fs.Path(root, "model.json"), json)
  }

  private def readModel(fs: org.apache.hadoop.fs.FileSystem,
                        root: org.apache.hadoop.fs.Path, dir: String)
      : (Array[Array[Float]], Array[Array[Array[Float]]]) = {
    val path = new org.apache.hadoop.fs.Path(root, "model.json")
    require(fs.exists(path),
      s"'$dir' has no model.json — the store is incomplete (crashed build?)")
    val j = parseJsonFile(fs, path)
    import org.json4s._
    (j \ "format") match {
      case JString("graft-ann-model") => ()
      case other => throw new IllegalArgumentException(
        s"'$dir' model.json format is $other, not graft-ann-model")
    }
    def floats(v: JValue): Array[Float] = v match {
      case JArray(xs) => xs.map {
        case JInt(b) => java.lang.Float.intBitsToFloat(b.intValue)
        case other => throw new IllegalArgumentException(
          s"'$dir' model.json holds a non-int float-bits entry: $other")
      }.toArray
      case other => throw new IllegalArgumentException(
        s"'$dir' model.json holds a non-array vector: $other")
    }
    def matrix(v: JValue): Array[Array[Float]] = v match {
      case JArray(rows) => rows.map(floats).toArray
      case other => throw new IllegalArgumentException(
        s"'$dir' model.json holds a non-array matrix: $other")
    }
    val books = (j \ "books") match {
      case JArray(bs) => bs.map(matrix).toArray
      case other => throw new IllegalArgumentException(
        s"'$dir' model.json 'books' is not an array: $other")
    }
    (matrix(j \ "cents"), books)
  }

  private def atomicWrite(fs: org.apache.hadoop.fs.FileSystem,
                          path: org.apache.hadoop.fs.Path, json: String): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(
      path.getParent, s".${path.getName}.inprogress")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, fs.getConf)
    fc.rename(fc.makeQualified(tmp), fc.makeQualified(path),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def parseJsonFile(fs: org.apache.hadoop.fs.FileSystem,
                            path: org.apache.hadoop.fs.Path): org.json4s.JValue = {
    val in = fs.open(path)
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    org.json4s.jackson.JsonMethods.parse(text)
  }
}
