package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** DSIR importance resampling ([[Dsir]]) — hashed-gram buckets, log-ratio
  * weights, top-k selection. */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side mirror of the kernel's bucket rule: value of the first 3
    * hex chars of md5(gram) — computed via the hex STRING, independent of
    * the kernel's first-12-bits shortcut. */
  private def bucket(gram: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(gram.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Integer.parseInt(hex.substring(0, 3), 16)
  }

  private def grams(text: String): Seq[String] = {
    val t = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    if (t.isEmpty) Seq.empty
    else t.head +: (1 until t.size).flatMap(i => Seq(t(i), s"${t(i - 1)} ${t(i)}"))
  }

  test("gramBuckets: md5 first-3-hex buckets in the interleaved walk order") {
    val text = "The quick  Brown fox"
    val out = Seq(Tuple1(text)).toDF("text")
      .select(Dsir.gramBuckets(col("text")).as("b"))
      .head().getSeq[Int](0)
    assert(out == grams(text).map(bucket))
    // empty and whitespace-only texts yield zero grams
    val empty = Seq(Tuple1(""), Tuple1("   ")).toDF("text")
      .select(Dsir.gramBuckets(col("text")).as("b"))
      .collect().map(_.getSeq[Int](0))
    assert(empty.forall(_.isEmpty))
  }

  test("bucketHistogram counts every gram once; totals match") {
    val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val (counts, total) = Dsir.bucketHistogram(docs, "text")
    val expected = (grams("a b a") ++ grams("b c")).groupBy(bucket)
      .map { case (b, gs) => b -> gs.size.toLong }
    assert(total == 8L) // 3 + 2 unigrams, 2 + 1 bigrams
    expected.foreach { case (b, c) => assert(counts(b) == c, s"bucket $b") }
    assert(counts.sum == total)
  }

  test("importanceWeights: target-heavy buckets positive, raw-heavy negative") {
    val t = new Array[Long](Dsir.Buckets); t(7) = 100L
    val r = new Array[Long](Dsir.Buckets); r(9) = 100L
    val w = Dsir.importanceWeights((t, 100L), (r, 100L))
    assert(w(7) > 0 && w(9) < 0)
    // an unseen bucket's weight reflects only the smoothing ratio
    val neutral = math.log(1.0 / (100 + 4096)) - math.log(1.0 / (100 + 4096))
    assert(w(0) == neutral)
  }

  test("selectTopK: target-like docs rank first; k rows, rank 1..k, id tie rule") {
    val target = (0L until 8L).map(i => (i, "climate model output grid")).toDF("doc_id", "text")
    val raw = Seq(
      (100L, "climate model output grid"),    // exact target language
      (101L, "climate model mesh"),           // partial overlap
      (102L, "xylophone zebra quartz"),       // none
      (103L, "climate model output grid"),    // duplicate of 100 -> id tie
    ).toDF("doc_id", "text")
    val out = Dsir.selectTopK(raw, target, "text", "doc_id", k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 3)
    assert(out.map(_._1).toSeq == Seq(1, 2, 3))
    // identical scores tie-break by ascending id; the no-overlap doc is out
    assert(out(0)._2 == 100L && out(1)._2 == 103L && out(2)._2 == 101L)
    assert(out(0)._3 == 7L) // 4 unigrams + 3 bigrams
  }

  test("gumbelKey: pure function of (seed, id), mirrors the md5 derivation") {
    val ids = Seq(1L, 2L, 999L).toDF("id")
    val out = ids.select(col("id"), Dsir.gumbelKey(col("id"), 42).as("g"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def mirror(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"gumbel|42|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val v4 = Integer.parseInt(hex.substring(0, 4), 16)
      -math.log(-math.log((v4 + 0.5) / 65536.0))
    }
    Seq(1L, 2L, 999L).foreach(id => assert(out(id) == mirror(id), s"id=$id"))
    // different seed, different noise
    val other = ids.select(Dsir.gumbelKey(col("id"), 7).as("g"))
      .collect().map(_.getDouble(0)).toSet
    assert(other != out.values.toSet)
  }

  test("selectGumbelTopK: k rows, reproducible, noise can reorder near-ties") {
    val target = (0L until 6L).map(i => (i, "alpha beta gamma")).toDF("doc_id", "text")
    val raw = (100L until 140L)
      .map(i => (i, if (i % 2 == 0) "alpha beta gamma" else "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val a = Dsir.selectGumbelTopK(raw, target, "text", "doc_id", k = 10, seed = 42)
      .orderBy("rank").collect().map(r => (r.getInt(0), r.getLong(1)))
    val b = Dsir.selectGumbelTopK(raw, target, "text", "doc_id", k = 10, seed = 42)
      .orderBy("rank").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(a.length == 10 && a.toSeq == b.toSeq) // deterministic given the seed
    assert(a.map(_._1).toSeq == (1 to 10))
    // among equal-score docs the seeded noise, not the id, orders them
    val evens = a.filter(_._2 % 2 == 0).map(_._2)
    assert(evens.nonEmpty && evens.toSeq != evens.sorted.toSeq)
  }

  test("scored: zero-gram docs score exactly 0.0 with n_grams 0") {
    val w = Dsir.importanceWeights(
      (new Array[Long](Dsir.Buckets), 0L), (new Array[Long](Dsir.Buckets), 0L))
    val out = Dsir.scored(Seq((1L, ""), (2L, "word")).toDF("doc_id", "text"),
        "text", "doc_id", w)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) == ((0L, 0.0)))
    assert(out(2L)._1 == 1L)
  }
}
