package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.harness.PipelineDemo

/** The DataSourceV2 `format("esmcat")` surface: descriptor + asset index as
  * one relation, iterable columns decoded. */
class EsmCatalogSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("format(esmcat) reads a csv-backed catalog, same rows as EsmCatalog.open") {
    val json = PipelineDemo.ensureCatalog(spark, "/root/testdata/sf0.001")
    val dsv2 = spark.read.format("esmcat").load(json)
    val api  = graft.catalog.EsmCatalog.open(spark, json).df
    assert(dsv2.schema == api.schema)
    assert(dsv2.count() == api.count())
    assert(dsv2.exceptAll(api).isEmpty && api.exceptAll(dsv2).isEmpty)
  }

  test("format(esmcat) decodes tuple-literal iterable columns from the reference fixture") {
    val df = spark.read.format("esmcat")
      .load("/root/reference/tests/sample-catalogs/multi-variable-catalog.json")
    import org.apache.spark.sql.types._
    assert(df.schema("variable").dataType == ArrayType(StringType))
    val first = df.orderBy("time_range").select("variable").limit(1)
      .collect()(0).getAs[scala.collection.Seq[String]](0)
    assert(first.contains("SHF") && first.contains("O2"))
    assert(df.count() == 5)
  }

  test("format(esmcat) sql-queryable with predicate over decoded arrays") {
    val json = PipelineDemo.ensureCatalog(spark, "/root/testdata/sf0.001")
    spark.read.format("esmcat").load(json).createOrReplaceTempView("esm_assets")
    val n = spark.sql("SELECT COUNT(*) FROM esm_assets WHERE status = 'O' AND variable = 'totalprice'")
      .collect()(0).getLong(0)
    assert(n > 0)
  }

  test("format(esmcat) pushes scalar predicates into the reader, same answer as post-filter") {
    val json = PipelineDemo.ensureCatalog(spark, "/root/testdata/sf0.001")
    val df = spark.read.format("esmcat").load(json)
      .filter(col("status") === "O" && col("member").isNotNull)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("esmcat PushedFilters: [") && scan.contains("EqualTo(status,O)"),
      scan.take(1500))
    // defense-in-depth: pushed rows are also re-checked by Spark's residual
    // Filter, so the answer must equal the unpushed (post-materialize) filter
    val unpushed = spark.read.format("esmcat").load(json).cache()
    try {
      val expected = unpushed.filter(col("status") === "O" && col("member").isNotNull)
      assert(df.count() == expected.count() && df.count() > 0)
      assert(df.exceptAll(expected).isEmpty && expected.exceptAll(df).isEmpty)
    } finally { unpushed.unpersist(); () }
  }

  test("format(esmcat) declines array-column predicates (residual-only, still correct)") {
    val df = spark.read.format("esmcat")
      .load("/root/reference/tests/sample-catalogs/multi-variable-catalog.json")
      .filter(array_contains(col("variable"), "SHF"))
    val plan = df.queryExecution.executedPlan.toString
    val pushedList = "esmcat PushedFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1))
    // the array predicate (and its derived IsNotNull) must NOT be pushed —
    // supported() declines array-column references
    assert(pushedList.exists(!_.contains("variable")), plan.take(1200))
    assert(df.count() > 0)
  }

  test("format(esmcat) pushes global count/min/max/count-distinct, same answers as raw rows") {
    val json = PipelineDemo.ensureCatalog(spark, "/root/testdata/sf0.001")
    val agg = spark.read.format("esmcat").load(json)
      .agg(count(lit(1)).as("n"), min("status").as("lo"), max("status").as("hi"),
        countDistinct("member").as("nd"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: [COUNT(*)"), plan.take(1500))
    assert(plan.contains("MIN(status)") && plan.contains("MAX(status)") &&
      plan.contains("COUNT(DISTINCT member)"), plan.take(1500))
    // ground truth from the ordinary (row-returning) API path
    val raw = graft.catalog.EsmCatalog.open(spark, json).df
    val expected = raw.agg(count(lit(1)), min("status"), max("status"), countDistinct("member")).head()
    assert(agg.head() == expected)
  }

  test("format(esmcat) pushes aggregates past HANDLED filters and through GROUP BY") {
    val json = PipelineDemo.ensureCatalog(spark, "/root/testdata/sf0.001")
    val base = spark.read.format("esmcat").load(json)
    // supported filters are handled (not residual), so the aggregate also
    // pushes: the reader filters rows, then folds the count — one scan, no
    // rows surfaced to Spark at all
    val filtered = base.filter(col("status") === "O").agg(count(lit(1)).as("n"))
    val fPlan = filtered.queryExecution.executedPlan.toString
    assert(fPlan.contains("PushedAggregates: [COUNT(*)]"), fPlan.take(1500))
    assert(fPlan.contains("EqualTo(status,O)"), fPlan.take(1500))
    val raw = graft.catalog.EsmCatalog.open(spark, json).df
    assert(filtered.head().getLong(0) == raw.filter(col("status") === "O").count())
    // grouped aggregation pushes completely too: one row per group computed
    // in the reader, grouping columns first per the DSv2 contract
    val grouped = base.groupBy("status").agg(count(lit(1)).as("n"), max("member").as("m"))
    val gPlan = grouped.queryExecution.executedPlan.toString
    assert(gPlan.contains("PushedAggregates: [COUNT(*), MAX(member)]") &&
      gPlan.contains("PushedGroupBy: [status]"), gPlan.take(1500))
    val got = grouped.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val want = raw.groupBy("status").agg(count(lit(1)), max("member"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got == want && got.nonEmpty)
    // grouped + handled filter: filter applies before the in-reader fold
    val gf = base.filter(col("member").isNotNull).groupBy("status").agg(count(lit(1)).as("n"))
    val gfPlan = gf.queryExecution.executedPlan.toString
    assert(gfPlan.contains("PushedGroupBy: [status]") &&
      gfPlan.contains("IsNotNull(member)"), gfPlan.take(1500))
    val gotF = gf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wantF = raw.filter(col("member").isNotNull).groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotF == wantF)
    // grouping by an ARRAY column stays declined (still correct via Spark)
    val arrCat = spark.read.format("esmcat")
      .load("/root/reference/tests/sample-catalogs/multi-variable-catalog.json")
    val byArr = arrCat.groupBy("variable").agg(count(lit(1)).as("n"))
    val aPlan = byArr.queryExecution.executedPlan.toString
    assert(!aPlan.contains("PushedGroupBy: [variable]"), aPlan.take(1500))
    assert(byArr.count() > 0)
  }

  test("format(esmcat) aggregate pushdown on a dict catalog incl. non-string scalars") {
    val agg = spark.read.format("esmcat")
      .load("/root/reference/tests/sample-catalogs/noaa-pathfinder-opendap.json")
      .agg(count(lit(1)).as("n"), min("scode").as("lo"), max("scode").as("hi"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: [COUNT(*), MIN(scode), MAX(scode)]"), plan.take(1500))
    val raw = graft.catalog.EsmCatalog.open(spark,
      "/root/reference/tests/sample-catalogs/noaa-pathfinder-opendap.json").df
    assert(agg.head() == raw.agg(count(lit(1)), min("scode"), max("scode")).head())
  }

  test("mixed int/float dict column widens to double; pushed min/max stays correct") {
    // the schema unifies Long+Double -> DoubleType (same rule as
    // CatalogReader.fromDict), so both the pushed aggregate and the raw
    // row path see doubles and agree — no lexical comparison, no CCE
    val dir  = java.nio.file.Files.createTempDirectory("graft_mixcat")
    val json = dir.resolve("mix.json")
    java.nio.file.Files.writeString(json,
      """{"esmcat_version": "0.2.0", "id": "mix",
        |"assets": {"column_name": "path", "format": "parquet"},
        |"catalog_dict": [{"path": "a", "v": 9}, {"path": "b", "v": 10.5}]}""".stripMargin)
    val df = spark.read.format("esmcat").load(json.toString)
    assert(df.schema("v").dataType == org.apache.spark.sql.types.DoubleType)
    val agg = df.agg(min("v"), max("v"))
    assert(agg.queryExecution.executedPlan.toString.contains("PushedAggregates: [MIN(v), MAX(v)]"))
    assert(agg.head() == org.apache.spark.sql.Row(9.0, 10.5))
    // and the unpushed row path reads the same widened values
    assert(df.select("v").collect().map(_.getDouble(0)).sorted.toSeq == Seq(9.0, 10.5))
    java.nio.file.Files.deleteIfExists(json); java.nio.file.Files.deleteIfExists(dir)
  }

  test("handled filters keep SQL three-valued logic: NOT/IN over NULLs drop rows") {
    val dir  = java.nio.file.Files.createTempDirectory("graft_nullcat")
    val json = dir.resolve("nulls.json")
    java.nio.file.Files.writeString(json,
      """{"esmcat_version": "0.2.0", "id": "nulls",
        |"assets": {"column_name": "path", "format": "parquet"},
        |"catalog_dict": [{"path": "a", "m": "x"}, {"path": "b", "m": null},
        |                 {"path": "c", "m": "y"}]}""".stripMargin)
    val df  = spark.read.format("esmcat").load(json.toString)
    val raw = graft.catalog.EsmCatalog.open(spark, json.toString).df
    // NOT (m = 'x'): NULL m is UNKNOWN -> dropped; a two-valued evaluator
    // would keep row b. No residual re-check saves us now — the reader's
    // evaluator must get this right by itself.
    def paths(d: org.apache.spark.sql.DataFrame) =
      d.select("path").collect().map(_.getString(0)).toSet
    assert(paths(df.filter(!(col("m") === "x"))) == Set("c"))
    assert(paths(df.filter(!(col("m") === "x"))) == paths(raw.filter(!(col("m") === "x"))))
    assert(paths(df.filter(col("m").isin("x", "zz"))) == Set("a"))
    assert(paths(df.filter(col("m").isNull)) == Set("b"))
    // and the pushed aggregate over the same handled filter agrees with raw
    val agg = df.filter(!(col("m") === "x")).agg(count(lit(1)).as("n"))
    assert(agg.head().getLong(0) == 1L)
    java.nio.file.Files.deleteIfExists(json); java.nio.file.Files.deleteIfExists(dir)
  }

  test("pushed COUNT(DISTINCT) coerces to the widened type: 9 and 9.0 are ONE value") {
    val dir  = java.nio.file.Files.createTempDirectory("graft_distcat")
    val json = dir.resolve("dist.json")
    java.nio.file.Files.writeString(json,
      """{"esmcat_version": "0.2.0", "id": "dist",
        |"assets": {"column_name": "path", "format": "parquet"},
        |"catalog_dict": [{"path": "a", "v": 9}, {"path": "b", "v": 9.0},
        |                 {"path": "c", "v": 10.5}]}""".stripMargin)
    val df  = spark.read.format("esmcat").load(json.toString)
    val agg = df.agg(countDistinct("v").as("nd"))
    assert(agg.queryExecution.executedPlan.toString.contains("COUNT(DISTINCT v)"))
    assert(agg.head().getLong(0) == 2L) // {9.0, 10.5}, not {Integer(9), 9.0, 10.5}
    // the unpushed row path widens identically
    val raw = graft.catalog.EsmCatalog.open(spark, json.toString).df
    assert(raw.agg(countDistinct("v")).head().getLong(0) == 2L)
    java.nio.file.Files.deleteIfExists(json); java.nio.file.Files.deleteIfExists(dir)
  }

  test("multi-file-saved catalog (directory catalog_file) loads via format(esmcat)") {
    val json = PipelineDemo.ensureCatalog(spark, "/root/testdata/sf0.001")
    val cat  = graft.catalog.EsmCatalog.open(spark, json)
    val dir  = java.nio.file.Files.createTempDirectory("graft_dircat").toString
    val saved = graft.catalog.CatalogWriter.save(cat, "dircat", dir, singleFile = false)
    // the API path reads the part-file directory natively; the DSv2 path
    // must concatenate the parts (one header) instead of throwing on the dir
    val viaApi  = graft.catalog.EsmCatalog.open(spark, saved).df
    val viaDsv2 = spark.read.format("esmcat").load(saved)
    assert(viaDsv2.count() == cat.df.count() && viaDsv2.count() == viaApi.count())
    assert(viaDsv2.columns.sorted.toSeq == viaApi.columns.sorted.toSeq)
    assert(viaDsv2.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaDsv2).isEmpty)
  }

  test("dict column mixing arrays and scalars degrades to literal strings, both paths agree") {
    val dir  = java.nio.file.Files.createTempDirectory("graft_mixarr")
    val json = dir.resolve("mixarr.json")
    java.nio.file.Files.writeString(json,
      """{"esmcat_version": "0.2.0", "id": "mixarr",
        |"assets": {"column_name": "path", "format": "parquet"},
        |"catalog_dict": [{"path": "a", "v": ["x", "y"]}, {"path": "b", "v": "z"}]}""".stripMargin)
    val api = graft.catalog.EsmCatalog.open(spark, json.toString).df
    assert(api.schema("v").dataType == org.apache.spark.sql.types.StringType)
    val apiVals = api.select("v").collect().map(_.getString(0)).toSet
    assert(apiVals == Set("['x', 'y']", "z")) // literal render, no CCE
    val dsv2 = spark.read.format("esmcat").load(json.toString)
    assert(dsv2.schema("v").dataType == org.apache.spark.sql.types.StringType)
    assert(dsv2.select("v").collect().map(_.getString(0)).toSet == apiVals)
    java.nio.file.Files.deleteIfExists(json); java.nio.file.Files.deleteIfExists(dir)
  }

  test("format(esmcat) prunes unprojected columns at the scan") {
    val json = PipelineDemo.ensureCatalog(spark, "/root/testdata/sf0.001")
    val df   = spark.read.format("esmcat").load(json).select("status", "member")
    // DSv2 BatchScan prints its (pruned) output attribute list
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    val cols = scan.output.map(_.name).toSet
    assert(cols == Set("status", "member"), scan.toString.take(800))
    assert(df.distinct().count() > 0)
  }
}
