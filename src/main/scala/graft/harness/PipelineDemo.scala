package graft.harness

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.catalog._

/** Builds a real on-disk ESM catalog over the harness testdata so the full
  * descriptor → scan → search → group → materialize pipeline can run
  * end-to-end (SURVEY.md §7 "minimum end-to-end slice").
  *
  * Shape mirrors cesm1-lens (reference tests/sample-catalogs/
  * cesm1-lens-netcdf.json): orders rows become "assets" partitioned by
  *   - groupby attr   `status`  (o_orderstatus),
  *   - join_new dim   `member`  (o_orderpriority, 2 values),
  *   - join_existing  `year`    (order year, 2 values; dim present in data),
  *   - union variable `variable` ∈ {totalprice, custkey}.
  * Assets are parquet leaf dirs written once per sf dir (idempotent marker).
  */
object PipelineDemo {

  private val vars = Seq("totalprice", "custkey")

  private def baseDir(sfDir: String): String = {
    val token = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    s"/tmp/graft_esm/$token"
  }

  /** Write assets + catalog json/csv once; return the descriptor path. */
  def ensureCatalog(spark: SparkSession, sfDir: String): String = synchronized {
    val base   = baseDir(sfDir)
    val marker = Paths.get(base, "_READY")
    val json   = s"$base/graft-demo.json"
    if (Files.exists(marker)) return json

    val orders = spark.read
      .parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
        year(col("o_orderdate")).between(1995, 1996))
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast(IntegerType).as("year"),
        col("o_orderstatus").as("status"),
        col("o_orderpriority").as("member"),
        col("o_totalprice").as("totalprice"),
        col("o_custkey").as("custkey"),
      )

    // one distributed write per variable; leaf dirs are the assets.
    // repartition on the partition columns → one file per leaf dir instead
    // of one per (task × dir) — small-file hygiene.
    vars.foreach { v =>
      orders
        .select(col("o_orderkey"), col("year"), col("status"), col("member"), col(v))
        .withColumn("yr", col("year"))
        .repartition(col("status"), col("member"), col("yr"))
        .write.mode("overwrite")
        .partitionBy("status", "member", "yr")
        .parquet(s"$base/assets/var=$v")
    }

    val combos = orders.select("status", "member", "year").distinct().collect()
    val rows = for {
      r <- combos.toSeq
      v <- vars
    } yield {
      val (s, m, y) = (r.getString(0), r.getString(1), r.getInt(2))
      Map[String, Any](
        "status"   -> s,
        "member"   -> m,
        "year"     -> y.toString,
        "variable" -> v,
        "path"     -> s"$base/assets/var=$v/status=$s/member=$m/yr=$y",
      )
    }

    val model = EsmCatalogModel(
      esmcatVersion = "0.2.0",
      id = Some("graft-demo"),
      description = Some("synthetic ESM-style catalog over harness testdata"),
      assets = Assets(columnName = "path", format = Some("parquet")),
      aggregationControl = Some(AggregationControl(
        variableColumnName = "variable",
        groupbyAttrs = List("status"),
        aggregations = List(
          Aggregation(AggregationType.JoinNew, "member"),
          Aggregation(AggregationType.JoinExisting, "year", Map("dim" -> "year")),
          Aggregation(AggregationType.Union, "variable"),
        ),
      )),
      catalogDict = None,
      catalogFile = None,
    )

    val table = CatalogReader.LoadedTable(CatalogReader.fromDict(spark, rows), Set.empty, Map.empty)
    val cat   = EsmCatalog.fromTable(spark, model, table)
    CatalogWriter.save(cat, "graft-demo", base, catalogType = "file")
    Files.createFile(marker)
    json
  }

  val coords: Seq[String] = Seq("o_orderkey", "year", "member")

  def open(spark: SparkSession, sfDir: String): EsmCatalog =
    EsmCatalog.open(spark, ensureCatalog(spark, sfDir))

  /** search → to_dataset_dict → stack groups back with their key column. */
  def datasetDictAsFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val cat    = open(spark, sfDir).search(Map("status" -> Seq("O", "F")))
    val dsets  = cat.toDatasetDict(coords)
    dsets.toSeq.sortBy(_._1)
      .map { case (k, d) => d.withColumn("key", lit(k)) }
      .reduce(_ unionByName _)
      .select("key", "o_orderkey", "year", "member", "totalprice", "custkey")
      .orderBy("key", "o_orderkey")
  }
}
