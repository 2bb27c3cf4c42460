package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{CatalogReader, EsmCatalog}

/** The engine against the REFERENCE'S OWN test catalogs and expected
  * numbers (reference: tests/test_core.py:243-281, tests/utils.py paths).
  * The catalog/query plane must reproduce the reference's counts exactly;
  * asset materialization is not exercised (netCDF/zarr need connectors).
  */
class ReferenceFidelitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val base = "/root/reference/tests/sample-catalogs"

  test("cesm1-lens: key membership (test_catalog_contains)") {
    val cat = EsmCatalog.open(spark, s"$base/cesm1-lens-netcdf.json")
    assert(cat.containsKey("ocn.20C.pop.h"))
    assert(cat.containsKey("ocn.CTRL.pop.h"))
    assert(cat.containsKey("ocn.RCP85.pop.h"))
    assert(!cat.containsKey("foo"))
  }

  test("cesm1-lens: search sizes (test_catalog_search expected_size table)") {
    val cat = EsmCatalog.open(spark, s"$base/cesm1-lens-netcdf.json")
    assert(cat.search(Map("experiment" -> "CTRL")).length == 1L)
    assert(cat.search(Map("experiment" -> Seq("CTRL", "20C"))).length == 2L)
    assert(cat.search(Map.empty).length == 0L)
    assert(cat.search(Map("variable" -> "SHF", "time_range" -> Seq("200601-210012"))).length == 1L)
  }

  test("access catalogs: gz csv + container dtypes + membership search (test_catalog_search_columns_with_iterables)") {
    for ((file, ct) <- Seq(
        "access-columns-with-lists.json"  -> CatalogReader.ContainerType.ListT,
        "access-columns-with-tuples.json" -> CatalogReader.ContainerType.TupleT)) {
      val cat = EsmCatalog.open(spark, s"$base/$file")
      assert(cat.iterableDtypes.get("variable").contains(ct), s"$file dtype")
      assert(cat.columnsWithIterables.contains("variable"))
      assert(cat.search(Map("variable" -> Seq("aice_m"))).length == 1L, s"$file search")
    }
  }

  test("single-item iterables decode (access-single-item-iterables)") {
    val cat = EsmCatalog.open(spark, s"$base/access-single-item-iterables.json")
    assert(cat.columnsWithIterables.contains("variable"))
    val sizes = cat.df.select(size(col("variable"))).collect().map(_.getInt(0))
    assert(sizes.forall(_ >= 1))
  }

  test("noaa opendap dict catalog: non-string scalar equality search (_search.py:54)") {
    val cat = EsmCatalog.open(spark, s"$base/noaa-pathfinder-opendap.json")
    assert(cat.df.schema("scode").dataType == org.apache.spark.sql.types.LongType)
    val expected = cat.df.filter(col("scode") === 482).count()
    assert(expected > 0)
    assert(cat.search(Map("scode" -> 482)).df.count() == expected)
  }

  test("cmip6: all-null dcpp_init_year pruned from groupby attrs (cat.py:26-45)") {
    val cat = EsmCatalog.open(spark, s"$base/cmip6-netcdf.json")
    assert(cat.model.groupbyAttrs.contains("dcpp_init_year") ||
      cat.df.columns.contains("dcpp_init_year"))
    assert(!cat.effectiveGroupbyAttrs.contains("dcpp_init_year"))
    assert(cat.length > 0)
  }

  test("catalog-dict-records: inline zarr records group and search") {
    val cat = EsmCatalog.open(spark, s"$base/catalog-dict-records.json")
    assert(cat.length > 0)
    val sub = cat.search(Map("variable" -> "FLNS"))
    assert(sub.df.count() > 0)
  }

  test("multi-variable catalog: flattened uniques") {
    val cat = EsmCatalog.open(spark, s"$base/multi-variable-catalog.json")
    val u   = cat.uniqueValues("variable").toSet
    assert(Set("SHF", "REGION_MASK", "NO2", "O2").subsetOf(u))
    assert(cat.length == 1L && cat.df.count() == 5L)
  }
}
