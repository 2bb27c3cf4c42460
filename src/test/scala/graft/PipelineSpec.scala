package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.harness.PipelineDemo

/** End-to-end descriptor → scan → search → group → materialize over real
  * parquet assets (SURVEY.md §7 minimum slice; mirrors the shape of
  * reference test_core.py:251-296). */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("entry produces rows and matches a direct relational computation") {
    val out = SparkEntry.entry(spark)
    val n   = out.count()
    assert(n > 0)
    val expected = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderstatus").isin("O", "F") &&
        col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
        year(col("o_orderdate")).between(1995, 1996))
      .count()
    assert(n == expected)
  }

  test("catalog opens, groups by status, keys are sep-joined") {
    val cat = PipelineDemo.open(spark, sfDir)
    assert(cat.keys.toSet == Set("O", "F", "P"))
    assert(cat.length == 3)
    assert(cat.containsKey("O") && !cat.containsKey("XX"))
  }

  test("getEntry returns the group's asset records") {
    val cat = PipelineDemo.open(spark, sfDir)
    val src = cat.getEntry("O")
    assert(src.records.nonEmpty)
    assert(src.records.forall(_("status") == "O"))
    assert(src.records.forall(_.contains("_data_format_")))
  }

  test("search narrows the catalog; to_dask demands exactly one group") {
    val cat = PipelineDemo.open(spark, sfDir).search(Map("status" -> Seq("P")))
    val ds  = cat.toDask(PipelineDemo.coords)
    assert(ds.columns.contains("totalprice") && ds.columns.contains("custkey"))
    intercept[IllegalArgumentException] {
      PipelineDemo.open(spark, sfDir).toDask(PipelineDemo.coords) // 3 groups
    }
  }

  test("materialized dataset carries both variables merged on coords") {
    val cat = PipelineDemo.open(spark, sfDir).search(Map("status" -> Seq("F")))
    val d   = cat.toDatasetDict(PipelineDemo.coords)("F")
    assert(d.columns.sorted.toSeq == Seq("custkey", "member", "o_orderkey", "totalprice", "year"))
    assert(d.filter(col("totalprice").isNull || col("custkey").isNull).count() == 0)
  }

  test("to_datatree paths use slash-joined keys") {
    val tree = PipelineDemo.open(spark, sfDir).toDatatree(PipelineDemo.coords, levels = Some(Seq("status")))
    assert(tree.keySet == Set("/O", "/F", "/P"))
  }

  test("regex search over the catalog plane") {
    val cat = PipelineDemo.open(spark, sfDir).search(Map("member" -> Seq("^1-.*")))
    val members = cat.df.select("member").distinct().collect().map(_.getString(0)).toSet
    assert(members == Set("1-URGENT"))
  }
}
