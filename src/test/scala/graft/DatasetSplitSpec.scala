package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DatasetSplit

class DatasetSplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("split proportions land near the requested percentages") {
    val counts = DatasetSplit.assignSplits(docs, "doc_id", trainPct = 80, valPct = 10)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val total = counts.values.sum.toDouble
    assert(math.abs(counts("train") / total - 0.80) < 0.06, counts.toString)
    assert(math.abs(counts("val") / total - 0.10) < 0.06, counts.toString)
    assert(math.abs(counts("test") / total - 0.10) < 0.06, counts.toString)
  }

  test("assignment is stable across repartitionings (not layout-dependent)") {
    val a = DatasetSplit.assignSplits(docs, "doc_id").select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val b = DatasetSplit.assignSplits(docs.repartition(17), "doc_id").select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("shuffleShards: shards in range, pos contiguous, stable across layouts") {
    val rows = DatasetSplit.shuffleShards(docs.select("doc_id"), "doc_id", shards = 8)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, s, _) => s >= 0 && s < 8 })
    rows.groupBy(_._2).foreach { case (s, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq,
        s"shard $s positions not contiguous")
    }
    val relaid = DatasetSplit.shuffleShards(
        docs.repartition(17).select("doc_id"), "doc_id", shards = 8)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(rows.sortBy(_._1).toSeq == relaid.sortBy(_._1).toSeq)
  }

  test("shuffleShards: the order is shuffled, not the input order") {
    val order = DatasetSplit.shuffleShards(docs.select("doc_id"), "doc_id", shards = 1)
      .orderBy("pos").select("doc_id").as[Long].collect().toSeq
    assert(order != order.sorted)
    assert(order.toSet == order.sorted.toSet) // a permutation: nothing lost
  }

  test("stratified split covers every stratum with train rows") {
    val perStratum = DatasetSplit.assignStratifiedSplits(docs, "doc_id", "lang")
      .groupBy("lang", "split").count()
      .filter(col("split") === "train")
      .select("lang").as[String].collect().toSet
    val langs = docs.select("lang").distinct().as[String].collect().toSet
    assert(perStratum == langs)
  }

  test("curriculum shards: per-shard positions walk buckets in ascending difficulty") {
    val docs = (1L to 200L).map(i => (i, i % 3)).toDF("id", "bucket")
    val out = DatasetSplit.curriculumShards(docs, "id", "bucket", shards = 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 200)
    // within each shard, bucket must be non-decreasing in pos order, and
    // positions must be contiguous from 1
    out.groupBy(_._3).foreach { case (_, rows) =>
      val byPos = rows.sortBy(_._4)
      assert(byPos.map(_._4).toSeq == (1L to rows.length).toSeq)
      assert(byPos.map(_._2).toSeq == byPos.map(_._2).sorted.toSeq)
    }
    // every bucket reaches every shard (md5 spread, 200 rows over 4 shards)
    val cover = out.groupBy(_._3).view.mapValues(_.map(_._2).toSet)
    cover.foreach { case (_, bs) => assert(bs == Set(0L, 1L, 2L)) }
  }

  test("snapshot delta classifies added, removed, changed, unchanged") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val newSnap = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("id", "text")
    val out = DatasetSplit.snapshotDelta(oldSnap, newSnap, "id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }
}
