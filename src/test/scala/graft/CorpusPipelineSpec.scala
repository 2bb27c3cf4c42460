package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusPipeline

class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dup clusters: chain a-b-c collapses to one label") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = CorpusPipeline.dupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(3L) == 1L)
    assert(labels(10L) == 10L && labels(11L) == 10L)
  }

  test("dup clusters: distributed propagation path matches driver union-find") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L), (12L, 11L))
      .toDF("id_a", "id_b")
    val driver = CorpusPipeline.dupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = CorpusPipeline.dupClusters(pairs, maxRounds = 10, maxDriverPairs = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(driver == dist)
    assert(driver(5L) == 1L && driver(12L) == 10L)
  }

  test("full clean keeps one survivor per dup cluster and drops junk") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base),                             // survivor
      (2L, base),                             // exact dup of 1
      (3L, base.replace("dog", "cat")),       // near dup of 1
      (4L, "!!!! ???? 1234 5678 @@@@ #### $$$$ %%%% ^^^^ &&&&"), // fails alpha gate
      (5L, "short text"),                     // fails min tokens
      (6L, "completely different words about catalyst optimizer physical plans and shuffles"),
    ).toDF("doc_id", "text")
    val r = CorpusPipeline.clean(docs, minTokens = 5, minAlphaRatio = 0.5,
      nearDupThreshold = 0.5)
    val kept = r.cleaned.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 6L), s"kept=$kept stats=${r.stats}")
    assert(r.stats.toMap.apply("input") == 6L)
    assert(r.stats.toMap.apply("quality") == 4L)     // 4 and 5 gated out
    assert(r.stats.toMap.apply("exact_dedup") == 3L) // 2 collapses into 1
    assert(r.stats.toMap.apply("near_dedup") == 2L)  // 3 collapses into 1

  }

  test("clean(normalize = true) unifies byte-different renderings before dedup") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base),
      // same words, different bytes: a CRLF where doc 1 has a space, a
      // trailing tab run, and (docs 3/4) a decomposed accent NFC composes.
      // Contract (normalizeText scaladoc): CRLF→LF, controls stripped,
      // runs collapsed, edges trimmed — but an interior newline is NOT a
      // space (it is paragraph structure), so doc 2 still differs from
      // doc 1 byte-wise after normalization and is the NEAR-dup stage's
      // catch (identical token streams), while the NFC pair is exact's.
      (2L, base.replace(" dog ", " dog\r\n") + "\t "),
      (3L, "café menu lists twelve seasonal dishes and several regional wines tonight"),
      (4L, "café menu lists twelve seasonal dishes and several regional wines tonight"),
    ).toDF("doc_id", "text")
    val raw = CorpusPipeline.clean(docs, minTokens = 5, nearDupThreshold = 0.95)
    assert(raw.stats.toMap.apply("exact_dedup") == 4L,
      s"raw bytes must NOT collapse: ${raw.stats}")
    val norm = CorpusPipeline.clean(docs, minTokens = 5, nearDupThreshold = 0.95,
      normalize = true)
    // NFC pair (3,4) collapses at the exact stage; newline-vs-space doc 2
    // collapses at the near-dup stage, per the settled whitespace contract
    assert(norm.stats.toMap.apply("exact_dedup") == 3L, norm.stats.toString)
    assert(norm.stats.toMap.apply("near_dedup") == 2L, norm.stats.toString)
    val kept = norm.cleaned.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L), kept.toString)
    // the cleaned output carries the NORMALIZED rendering: no CR/tab, no
    // edge whitespace
    val texts = norm.cleaned.select("text").as[String].collect().toSet
    assert(texts.forall(t => !t.contains("\r") && !t.contains("\t") && t == t.trim),
      texts.toString)
  }
}
