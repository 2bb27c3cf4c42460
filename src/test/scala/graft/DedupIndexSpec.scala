package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Precomputed-signature entry points for the incremental dedup family:
  * the standing corpus becomes a persisted artifact (built once, reloaded
  * per batch), and the per-increment queries touch only that artifact —
  * never the corpus text. */
class DedupIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.operators.Dedup

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("crossNearDupWithIndex over a parquet round-tripped index matches crossNearDup") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ndidx_").toString
    val corpusPath = s"$tmp/corpus.parquet"
    val indexPath  = s"$tmp/index.parquet"
    docs.filter(col("doc_id") < 250).write.parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    val batch  = docs.filter(col("doc_id") >= 250)

    // build once, persist as the real artifact, reload
    Dedup.buildNearDupIndex(corpus, "text", "doc_id", n = 3, threshold = 0.3)
      .write.parquet(indexPath)
    val index = spark.read.parquet(indexPath)

    val viaIndex = Dedup.crossNearDupWithIndex(batch, index, "text", "doc_id",
        n = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val recompute = Dedup.crossNearDup(batch, corpus, "text", "doc_id",
        n = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaIndex == recompute)
    assert(viaIndex.nonEmpty, "fixture should contain cross-side near-dups")

    // the second-batch plan reads the index artifact, NEVER the corpus
    // file: its scan list must contain the index path and not the corpus
    // path (this is the "text scanned zero times per batch" contract)
    val plan = Dedup.crossNearDupWithIndex(batch, index, "text", "doc_id",
      n = 3, threshold = 0.3).queryExecution.executedPlan.toString
    assert(plan.contains("index.parquet"), plan.take(2000))
    assert(!plan.contains("corpus.parquet"), plan.take(2000))
  }

  test("index built at a different threshold is refused, not silently banded") {
    val corpus = docs.filter(col("doc_id") < 100)
    val batch  = docs.filter(col("doc_id") >= 400)
    // threshold 0.3 → auto (b, r) with b*r != 128; querying at 0.5 (32×4)
    // must trip the per-row signature-width guard
    val index = Dedup.buildNearDupIndex(corpus, "text", "doc_id", n = 3, threshold = 0.3)
    val ex = intercept[Exception] {
      Dedup.crossNearDupWithIndex(batch, index, "text", "doc_id",
        n = 3, threshold = 0.5).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("different threshold"),
      ex.getMessage)
  }

  test("incrementalExactWithIndex over a round-tripped ExactIndex matches incrementalExact") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_exidx_").toString
    val corpus = docs.filter(col("doc_id") < 250)
    val batch  = docs.filter(col("doc_id") >= 250)
    val built = Dedup.buildExactIndex(corpus, "text")
    assert(built.blooms.length == 1, "small corpus should build a single shard")
    // round-trip both artifact halves the way a real loop persists them
    built.texts.write.parquet(s"$tmp/texts.parquet")
    built.blooms.zipWithIndex.foreach { case (b, i) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$tmp/bloom_$i.bin"), b) }
    val reloaded = Dedup.ExactIndex(
      spark.read.parquet(s"$tmp/texts.parquet"),
      built.blooms.indices.map(i =>
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$tmp/bloom_$i.bin"))))

    val viaIndex = Dedup.incrementalExactWithIndex(batch, reloaded, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val recompute = Dedup.incrementalExact(batch, corpus, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaIndex == recompute)
    assert(viaIndex.nonEmpty)
  }

  test("exact index shards by hash when one filter would breach the size bound") {
    val corpus = docs.filter(col("doc_id") < 250)
    val batch  = docs.filter(col("doc_id") >= 250)
    // force fan-out: a bound small enough that the fixture corpus needs
    // several filters (the real default is 64 MB; at 10^10 distinct texts
    // and fpp 0.01 the monolith would be ~11 GB — the case the shards fix)
    val bound = 64L
    val sharded = Dedup.buildExactIndex(corpus, "text", fpp = 0.01,
      maxFilterBytes = bound)
    assert(sharded.blooms.length > 1, s"expected fan-out, got ${sharded.blooms.length}")
    sharded.blooms.foreach(b => assert(b.length <= bound + 4096))
    // sharding must not change the output: the probe routes by the same
    // pmod the build used, and the anti-join keeps exactness regardless
    val viaSharded = Dedup.incrementalExactWithIndex(batch, sharded, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val recompute = Dedup.incrementalExact(batch, corpus, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaSharded == recompute)
    assert(viaSharded.nonEmpty)
  }
}
