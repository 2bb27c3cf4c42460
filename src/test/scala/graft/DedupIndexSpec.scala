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

  test("incrementalSemanticWithIndex: parquet round-trip, hand-computed flags, refusal") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_semidx_").toString
    def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat)
    // nCells=2, kmeansIters=0 seeds centroids from docs 1 (+x) and 2 (+y);
    // 3 and 11 are near-dups of them, so the greedy prune keeps exactly
    // {1, 2} — the index must hold survivors only
    val corpus = Seq(
      (1L, v(1.0, 0.0)), (2L, v(0.0, 1.0)),
      (3L, v(1.0, 0.02)), (11L, v(0.02, 1.0)),
    ).toDF("vec_id", "embedding")
    val t = 0.99
    val built = Dedup.buildSemanticIndex(corpus, "vec_id", "embedding", threshold = t,
      nCells = 2, kmeansIters = 0)
    assert(built.kept.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // round-trip both halves the way a recrawl loop persists them
    built.centroids.write.parquet(s"$tmp/centroids.parquet")
    built.kept.write.parquet(s"$tmp/kept.parquet")
    val reloaded = Dedup.SemanticIndex(
      spark.read.parquet(s"$tmp/centroids.parquet"),
      spark.read.parquet(s"$tmp/kept.parquet"))

    val batch = Seq(
      (100L, v(1.0, 0.01)),  // dup of kept 1 (+x)
      (101L, v(-1.0, 0.0)),  // lands in SOME cell but cosine vs kept is <= 0 -> keep
      (102L, v(0.01, 1.0)),  // dup of kept 2 (+y)
    ).toDF("vec_id", "embedding")
    val out = Dedup.incrementalSemanticWithIndex(batch, reloaded, "vec_id", "embedding", t)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(out(100L) == ((false, Some(1L))), out.toString)
    assert(out(101L) == ((true, None)), out.toString)
    assert(out(102L) == ((false, Some(2L))), out.toString)
    assert(out.size == 3)

    // an index built at a different threshold refuses, never silently
    // changes recall
    val ex = intercept[Exception] {
      Dedup.incrementalSemanticWithIndex(batch, reloaded, "vec_id", "embedding", 0.5)
        .collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("rebuild the index"),
      ex.getMessage)
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

    // plan size must be O(1) in index bytes: the sharded probe carries NO
    // binary literals at all (blobs ride one broadcast variable); only the
    // single-shard path may embed its one blob
    val probe = Dedup.incrementalExactWithIndex(batch, sharded, "text")
      .queryExecution.analyzed
    val binaryLiteralBytes = probe
      .collect { case n => n }.flatMap(_.expressions)
      .flatMap(_.collect {
        case l: org.apache.spark.sql.catalyst.expressions.Literal
            if l.dataType == org.apache.spark.sql.types.BinaryType &&
              l.value != null =>
          l.value.asInstanceOf[Array[Byte]].length.toLong
      }).sum
    assert(binaryLiteralBytes == 0L,
      s"sharded probe plan embeds $binaryLiteralBytes B of blobs as literals")
    // and the broadcast is per-INDEX, not per-batch: two independently
    // constructed probe plans must reference the SAME broadcast id (a
    // regression to a broadcast-per-probe would pass a mere handle-equality
    // check, so compare what the plans actually carry)
    def broadcastIds(df: org.apache.spark.sql.DataFrame): Seq[Long] = df
      .queryExecution.analyzed
      .collect { case n => n }.flatMap(_.expressions)
      .flatMap(_.collect {
        case e: graft.functions.ShardedBloomMightContain => e.shards.id
      })
    val ids1 = broadcastIds(Dedup.incrementalExactWithIndex(batch, sharded, "text"))
    val ids2 = broadcastIds(Dedup.incrementalExactWithIndex(batch, sharded, "text"))
    assert(ids1.nonEmpty && ids1.distinct.size == 1, ids1.toString)
    assert(ids1.distinct == ids2.distinct, s"$ids1 vs $ids2")
  }
}
