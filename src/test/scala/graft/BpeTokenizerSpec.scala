package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTokenizer

class BpeTokenizerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // scripts/bpe_check.py's fixture dict — goldens below are that script's
  // output (an INDEPENDENT python implementation that also encodes by a
  // different algorithm: rank-ordered full replacement vs the engine's
  // lowest-rank adjacent scan)
  private val dict = Array(
    ("lower", 5L), ("lowest", 3L), ("newer", 6L), ("wider", 2L), ("new", 4L))

  test("learned merges match the independent python reference") {
    val model = BpeTokenizer.learnFromDict(dict, 8)
    assert(model.merges == Seq(("w", "e"), ("r", "</w>"), ("we", "r</w>"),
      ("n", "e"), ("l", "o"), ("ne", "wer</w>"), ("lo", "wer</w>"), ("ne", "w")),
      model.merges.toString)
    // sorted-symbol vocab ids, 0 reserved for UNK
    assert(model.vocab("lower</w>") == 7 && model.vocab("</w>") == 1 &&
      model.vocab("wer</w>") == 19, model.vocab.toString)
  }

  test("encodings and ids match the python goldens; decode round-trips") {
    val model = BpeTokenizer.learnFromDict(dict, 8)
    val docs = Seq(
      (1L, "lower lowest"),
      (2L, "newer wider new"),
      (3L, ""),
      (4L, null.asInstanceOf[String]),
    ).toDF("doc_id", "text")
    val enc = BpeTokenizer.encode(docs, "text", "doc_id", model)
    val out = enc.collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getLong(2)))).toMap
    assert(out(1L) == ((Seq(7, 6, 18, 15, 16, 1), 6L)), out(1L).toString)
    assert(out(2L) == ((Seq(11, 17, 4, 2, 3, 14, 10, 1), 8L)), out(2L).toString)
    assert(out(3L) == ((Seq(), 0L)) && out(4L) == ((Seq(), 0L)))
    val rt = enc.select(col("id"), BpeTokenizer.decode(col("token_ids"), model))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rt(1L) == "lower lowest" && rt(2L) == "newer wider new" && rt(3L) == "")
  }

  test("unseen character maps to UNK 0 and decode shows it loudly") {
    val model = BpeTokenizer.learnFromDict(dict, 8)
    val docs = Seq((1L, "zebra")).toDF("doc_id", "text") // z/b/a unseen
    val enc = BpeTokenizer.encode(docs, "text", "doc_id", model)
    val ids = enc.select("token_ids").head().getSeq[Int](0)
    assert(ids.contains(0), ids.toString)
    val rt = enc.select(BpeTokenizer.decode(col("token_ids"), model)).head().getString(0)
    assert(rt.contains("�"), rt)
  }

  test("no repeated pair -> zero merges, pure character vocab") {
    val model = BpeTokenizer.learnFromDict(Array(("ab", 1L), ("cd", 1L)), 10)
    assert(model.merges.isEmpty)
    assert(model.vocab.keySet == Set("a", "b", "c", "d", "</w>"))
  }

  test("learnVocab's distributed dict agg equals the explicit dict path") {
    // the corpus spelled as documents must train the same model as the
    // hand-counted dict (freq desc, word asc capping is deterministic)
    val docs = dict.zipWithIndex.flatMap { case ((w, f), i) =>
      Seq((i.toLong, (w + " ") * f.toInt))
    }.toSeq.toDF("doc_id", "text")
    val a = BpeTokenizer.learnVocab(docs, "text", nMerges = 8)
    val b = BpeTokenizer.learnFromDict(dict, 8)
    assert(a.merges == b.merges && a.vocab == b.vocab)
  }

  test("code-point symbols: astral chars never split into lone surrogates") {
    val docs = Seq((1L, "go 😀😀 go"), (2L, "😀x 😀x"))
      .toDF("doc_id", "text")
    val model = BpeTokenizer.learnVocab(docs, "text", nMerges = 4)
    // every vocab symbol must be a well-formed code-point sequence
    model.vocab.keys.foreach { s =>
      var i = 0
      while (i < s.length) {
        if (Character.isHighSurrogate(s(i))) {
          assert(i + 1 < s.length && Character.isLowSurrogate(s(i + 1)),
            s"lone high surrogate in symbol ${s.toSeq}")
          i += 2
        } else {
          assert(!Character.isLowSurrogate(s(i)), s"lone low surrogate in ${s.toSeq}")
          i += 1
        }
      }
    }
    val enc = BpeTokenizer.encode(docs, "text", "doc_id", model)
    // the gate's token bound counts CODE POINTS (Spark length()) — must
    // hold for emoji: n_words <= n_tokens <= n_chars + n_words
    val bad = enc.join(docs.select(col("doc_id").as("id"),
        graft.operators.Dedup.tokens(col("text")).as("t")), Seq("id"))
      .select(col("n_tokens"), size(col("t")).cast("long").as("nw"),
        length(array_join(col("t"), "")).cast("long").as("nc"))
      .filter(col("n_tokens") > col("nc") + col("nw") || col("n_tokens") < col("nw"))
      .count()
    assert(bad == 0L)
    val rt = enc.select(col("id"), BpeTokenizer.decode(col("token_ids"), model))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rt(1L) == "go 😀😀 go" && rt(2L) == "😀x 😀x")
  }

  test("dict frequency cap cannot make UNK reachable (base-char closure)") {
    // 'ñ' and 'z' appear only in the rarest word, which maxDictWords = 2
    // drops from the merge dict — the base alphabet must still cover them
    val docs = Seq((1L, "aa aa aa aa"), (2L, "bb bb bb"), (3L, "cc cc"), (4L, "ñz"))
      .toDF("doc_id", "text")
    val model = BpeTokenizer.learnVocab(docs, "text", nMerges = 4, maxDictWords = 2)
    assert(model.vocab.contains("ñ") && model.vocab.contains("z") &&
      model.vocab.contains("c"), model.vocab.keySet.toString)
    val enc = BpeTokenizer.encode(docs, "text", "doc_id", model)
    assert(enc.select(explode(col("token_ids")).as("tid"))
      .filter(col("tid") === 0).count() == 0L)
    val rt = enc.filter(col("id") === 4L)
      .select(BpeTokenizer.decode(col("token_ids"), model)).head().getString(0)
    assert(rt == "ñz")
  }

  test("unsegmented blob past the merge cap encodes O(len), losslessly") {
    val blob = "ab" * 3000 // 6000 code points > BpeEncode.MaxMergeWordLen
    val docs = Seq((1L, s"$blob normal words"), (2L, "normal words ab"))
      .toDF("doc_id", "text")
    val model = BpeTokenizer.learnVocab(docs, "text", nMerges = 8)
    val enc = BpeTokenizer.encode(docs, "text", "doc_id", model)
    val row = enc.filter(col("id") === 1L).head()
    // base-symbol fallback: the blob word contributes len+1 ids, none UNK
    assert(row.getLong(2) >= 6001L, row.getLong(2).toString)
    assert(!row.getSeq[Int](1).contains(0))
    val rt = enc.select(col("id"), BpeTokenizer.decode(col("token_ids"), model))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rt(1L) == s"$blob normal words" && rt(2L) == "normal words ab")
  }

  test("literal '</w>' in corpus text cannot spoof the end-of-word marker") {
    // Text containing the marker's own characters would, un-guarded, train
    // merges like "a</w" + ">" whose product ends with "</w>" mid-word —
    // decode would strip it and insert a phantom word boundary. The
    // marker-integrity guard skips exactly those merges, so the round
    // trip stays lossless and every vocab symbol ending with the marker
    // chars is genuinely word-final.
    val docs = Seq(
      (1L, "a</w>b a</w>b a</w>b a</w>b a</w>b"),
      (2L, "</w> </w> </w> </w>"),
      (3L, "x</w x</w x</w w> w> w>"),
      (4L, "plain words plain words"),
    ).toDF("doc_id", "text")
    val model = BpeTokenizer.learnVocab(docs, "text", nMerges = 40)
    // no learned merge product may spell the marker out of literal text:
    // a product ending with "</w>" must come from a word-final right side
    model.merges.foreach { case (a, b) =>
      assert(!((a + b).endsWith("</w>") && !b.endsWith("</w>")),
        s"marker-spoofing merge ($a, $b) survived")
    }
    val enc = BpeTokenizer.encode(docs, "text", "doc_id", model)
    val rt = enc.select(col("id"), BpeTokenizer.decode(col("token_ids"), model))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rt(1L) == "a</w>b a</w>b a</w>b a</w>b a</w>b", rt(1L))
    assert(rt(2L) == "</w> </w> </w> </w>", rt(2L))
    assert(rt(3L) == "x</w x</w x</w w> w> w>", rt(3L))
    assert(rt(4L) == "plain words plain words", rt(4L))
    // UNK never fires: the corpus trains its own base alphabet
    assert(enc.select(explode(col("token_ids")).as("tid"))
      .filter(col("tid") === 0).count() == 0L)
  }

  test("corpus-scale lossless round-trip (sf0.001 documents)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = BpeTokenizer.learnVocab(docs, "text", nMerges = 60)
    val enc = BpeTokenizer.encode(docs, "text", "doc_id", model)
    val bad = enc.join(docs.select(col("doc_id").as("id"),
        array_join(coalesce(graft.operators.Dedup.tokens(col("text")),
          array().cast("array<string>")), " ").as("norm")), Seq("id"))
      .filter(BpeTokenizer.decode(col("token_ids"), model) =!= col("norm"))
      .count()
    assert(bad == 0L)
    // merges actually compress: fewer tokens than raw symbols
    val toks = enc.agg(sum("n_tokens")).head().getLong(0)
    val syms = docs.select(
        graft.operators.Dedup.tokens(col("text")).as("t"))
      .agg(sum(length(array_join(col("t"), "")) + size(col("t")))).head().getLong(0)
    assert(toks < syms, s"$toks vs $syms")
  }
}
