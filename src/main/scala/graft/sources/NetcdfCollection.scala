package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-file netCDF opens — the reference's `xr.open_mfdataset` branch,
  * taken whenever an asset urlpath contains `*` (`intake_esm/source.py:
  * 102-107`; its own test globs two time-split CMIP5 files into one
  * time-concatenated dataset, `tests/test_source.py:41,71`).
  *
  * Semantics: nested concatenation along the collection's RECORD dimension
  * in sorted-path order — per file, every variable carrying the record dim
  * has that coordinate shifted by the records of the preceding files;
  * variables WITHOUT it (static grids, scalars) are taken from the first
  * file, the way xarray's combine merges identical non-concat variables.
  *
  * The record dimension resolves, in order:
  *  1. the `graft.mfdataset.concat_dim` storage option (explicit override);
  *  2. the `_graft_unlimited_dims` root marker both container parsers emit
  *     when the file declares an UNLIMITED dimension;
  *  3. the leading dimension of the highest-rank variable of the first
  *     file — time-split collections (the format's dominant layout) always
  *     lead their record variables with the record dim. No candidate →
  *     fail with the option named.
  *
  * Scale: per file this builds one metadata-sized header parse plus the
  * shared banded positioned-read plan; the union composes N such subplans.
  * The one driver materialization is the per-file variable METADATA
  * (#files × #variables rows) used to compute the record offsets — plan
  * constants, not data. For collections past ~1000 files, partition the
  * catalog so each asset row globs a bounded slice.
  */
object NetcdfCollection {

  /** The reference's trigger is exactly `'*' in url` (source.py:103). */
  def isGlob(path: String): Boolean = path != null && path.contains('*') && !TarMember.isTarUrl(path)

  /** Glob expansion in SORTED order — the deterministic file order that
    * defines nested-concat positions (fsspec sorts its glob results too). */
  def expand(spark: SparkSession, pattern: String,
             storageOptions: Map[String, String] = Map.empty): Seq[String] = {
    val conf  = FsPaths.confWith(spark.sparkContext.hadoopConfiguration, storageOptions)
    val hPath = FsPaths.hadoopPath(pattern)
    val matched =
      try {
        val fs = FsPaths.fileSystemFor(hPath, conf)
        Option(fs.globStatus(hPath)).map(_.toSeq).getOrElse(Nil)
      } catch {
        case e: java.io.IOException if FsPaths.isNoFilesystem(e) =>
          FsPaths.connectorRefusal(pattern, e)
      }
    val files = matched.filter(_.isFile).map(_.getPath.toString).sorted
    require(files.nonEmpty, s"netcdf glob '$pattern' matched no files")
    files
  }

  private def readOne(spark: SparkSession, path: String,
                      storageOptions: Map[String, String]): DataFrame =
    NetCDF3Index.sniff(spark, path, storageOptions) match {
      case "cdf"  => NetCDF3Index.read(spark, path, storageOptions)
      case "hdf5" => Hdf5Index.read(spark, path, storageOptions)
      case other  => throw new IllegalArgumentException(
        s"glob member '$path' carries no CDF/HDF5 magic (sniffed: $other)")
    }

  /** Chunk-map inventory of every matched file: per-file entries unioned,
    * with each file's rows stamped with its url (meta rows are emitted
    * url-null by the single-file readers) so refs and metadata stay
    * attributable. Inventory only — feed ONE file's entries at a time to
    * the decode plane (its per-variable metadata join is single-store). */
  def readEntries(spark: SparkSession, paths: Seq[String],
                  storageOptions: Map[String, String] = Map.empty): DataFrame =
    paths.map { p =>
      readOne(spark, p, storageOptions)
        .withColumn("url", coalesce(col("url"), lit(p)))
    }.reduce(_ unionByName _)

  /** Decoded, dimension-labeled values of the whole collection under
    * nested-concat semantics (see object doc). Output schema matches
    * [[KerchunkIndex.decodeCoords]]. */
  def openCoords(spark: SparkSession, paths: Seq[String],
                 storageOptions: Map[String, String] = Map.empty): DataFrame = {
    val perFile = paths.map(p => p -> readOne(spark, p, storageOptions))

    // ONE metadata-sized job: per-file variable geometry for offset math
    // (plan constants) — plus file 0's root attrs for the marker lookup
    val metaAll: Array[(Int, String, Seq[String], Seq[Long])] = perFile.zipWithIndex.map {
      case ((_, e), i) =>
        KerchunkIndex.arrayMeta(e)
          .join(KerchunkIndex.attrDims(e), Seq("variable"), "left")
          .select(lit(i).as("file_ord"), col("variable"), col("dims"), col("shape"))
    }.reduce(_ unionByName _).collect().map { r =>
      (r.getInt(0), r.getString(1),
        Option(r.getSeq[String](2)).getOrElse(Nil), r.getSeq[Long](3).toSeq)
    }

    val recordDim: String = storageOptions.get("graft.mfdataset.concat_dim").orElse {
      val marker = perFile.head._2
        .filter(col("key") === ".zattrs" && col("variable") === "")
        .select(get_json_object(col("inline_value"), "$._graft_unlimited_dims[0]"))
        .collect().headOption.flatMap(r => Option(r.getString(0)))
      marker.orElse {
        // leading dim of the highest-rank variable of file 0
        metaAll.filter(m => m._1 == 0 && m._3.nonEmpty)
          .sortBy(-_._4.length).headOption.map(_._3.head)
      }
    }.getOrElse(throw new IllegalArgumentException(
      s"cannot infer the concat dimension for glob collection (${paths.head}, ...): " +
        "no UNLIMITED dim declared and no dimension-labeled variables — " +
        "pass storage option graft.mfdataset.concat_dim"))

    // per-file record extent -> exclusive prefix-sum offsets
    val extents = perFile.indices.map { i =>
      metaAll.collect {
        case (ord, _, dims, shape) if ord == i && dims.contains(recordDim) =>
          shape(dims.indexOf(recordDim))
      } match {
        case Array() => 0L
        case xs      => xs.max
      }
    }
    val offsets = extents.scanLeft(0L)(_ + _)

    perFile.zipWithIndex.map { case ((_, e), i) =>
      val decoded = KerchunkIndex.decodeCoords(
        KerchunkIndex.materializeChunks(e, storageOptions = storageOptions),
        KerchunkIndex.arrayMeta(e),
        KerchunkIndex.attrDims(e))
      if (i == 0) decoded // first file also contributes the non-record variables
      else decoded
        .filter(array_contains(col("dims"), recordDim))
        .withColumn("coords", zip_with(col("coords"), col("dims"),
          (c, d) => when(d === recordDim, c + lit(offsets(i))).otherwise(c)))
    }.reduce(_ unionByName _)
  }
}
