package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketing

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = java.nio.file.Paths.get(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), name)
    if (java.nio.file.Files.exists(loc))
      java.nio.file.Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
  }

  test("bucketed join is shuffle-free and matches the plain join") {
    dropTable("graft_bl"); dropTable("graft_br")
    val left  = (1 to 1000).map(i => (i.toLong % 50, s"l$i")).toDF("k", "lv")
    val right = (1 to 400).map(i => (i.toLong % 50, i)).toDF("k", "rv")
    Bucketing.writeBucketed(left, "graft_bl", buckets = 8, keys = Seq("k"))
    Bucketing.writeBucketed(right, "graft_br", buckets = 8, keys = Seq("k"))

    val bucketed = Bucketing.bucketedJoin(spark, "graft_bl", "graft_br", Seq("k"))
    assert(!Bucketing.hasShuffle(bucketed), "bucketed join should plan without a shuffle:\n"
      + bucketed.queryExecution.executedPlan.toString.take(2000))

    val plain = left.join(right, Seq("k"))
    assert(bucketed.count() == plain.count())
    assert(plain.exceptAll(bucketed).isEmpty && bucketed.exceptAll(plain).isEmpty)

    // a plain (unbucketed) sort-merge join of the same data DOES shuffle
    // (hint forces SMJ — tiny tables would otherwise broadcast)
    assert(Bucketing.hasShuffle(left.hint("merge").join(right, Seq("k"))))

    dropTable("graft_bl"); dropTable("graft_br")
  }

  test("partitioned layout: filter prunes partitions at the scan, one file per leaf") {
    import org.apache.spark.sql.functions._
    val path = "/tmp/graft_part_test"
    val df = (1 to 3000).map(i => (i.toLong, s"s${i % 3}", i % 10)).toDF("id", "status", "v")
    Bucketing.writePartitioned(df, path, Seq("status"))

    // one data file per leaf dir (repartition-by-partition-cols hygiene)
    val leaf = java.nio.file.Paths.get(path, "status=s1")
    val files = java.nio.file.Files.list(leaf).toArray.map(_.toString)
      .filter(f => f.endsWith(".parquet"))
    assert(files.length == 1, files.mkString(","))

    val read = spark.read.parquet(path).filter(col("status") === "s1")
    val plan = read.queryExecution.executedPlan.toString
    // partition filter reaches the scan: only the matching directory is read
    assert(plan.contains("PartitionFilters: [isnotnull(status"), plan.take(1500))
    assert(read.count() == 1000)

    java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
  }
}
