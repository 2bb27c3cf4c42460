package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, SkewJoin}
import graft.search.QueryCompiler

/** Property-style laws over driver-side logic and small Spark plans,
  * using scalacheck generators with fixed seeds (no scalatestplus bridge
  * in the dependency set — sampling is explicit and deterministic).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("isPattern: escaping every wildcard makes any string a non-pattern") {
    samples(Gen.asciiPrintableStr, 200).foreach { s =>
      val escaped = s.flatMap {
        case c @ ('*' | '?' | '$' | '^') => "\\" + c
        case c                           => c.toString
      }
      assert(!QueryCompiler.isPattern(escaped), s"escaped of ${s.take(30)}")
    }
  }

  test("isPattern: appending an unescaped wildcard always makes a pattern") {
    // (a trailing backslash would escape the appended wildcard — same in the
    // reference's is_pattern, _search.py:19-29)
    val gen = Gen.zip(Gen.asciiPrintableStr.suchThat(s => s.isEmpty || s.last != '\\'),
      Gen.oneOf('*', '?', '$', '^'))
    samples(gen, 200).foreach { case (s, w) =>
      assert(QueryCompiler.isPattern(s + w), s"'$s' + '$w'")
    }
  }

  test("query normalization wraps scalars and preserves lists") {
    val gen = Gen.zip(Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.listOf(Gen.alphaNumStr))
    samples(gen, 100).foreach { case (scalar, list) =>
      val (norm, _) = QueryCompiler.normalize(Map("a" -> scalar, "b" -> list), Seq("a", "b"), None)
      assert(norm("a") == Seq(scalar))
      assert(norm("b") == list)
    }
  }

  test("salted join equals plain join on random small tables") {
    val gen = for {
      l <- Gen.listOfN(30, Gen.zip(Gen.choose(0, 5), Gen.alphaStr.map(_.take(3))))
      r <- Gen.listOfN(20, Gen.zip(Gen.choose(0, 5), Gen.choose(0, 100)))
      f <- Gen.choose(1, 6)
    } yield (l, r, f)
    samples(gen, 5).foreach { case (l, r, f) =>
      val left  = l.toDF("k", "lv")
      val right = r.toDF("k", "rv")
      val plain = left.join(right, Seq("k")).groupBy("k").count()
        .collect().map(x => (x.getInt(0), x.getLong(1))).toSet
      val salted = SkewJoin.saltedJoin(left, right, Seq("k"), f).groupBy("k").count()
        .collect().map(x => (x.getInt(0), x.getLong(1))).toSet
      assert(salted == plain, s"saltFactor=$f")
    }
  }

  test("chunking reconstructs the document: strides partition tokens, overlaps agree") {
    val gen = Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, Gen.identifier.map(_.take(5))))
    val docs = samples(gen, 30).zipWithIndex.map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
    val df = docs.toDF("doc_id", "text")
    val chunkTokens = 7; val overlap = 3; val stride = chunkTokens - overlap
    val chunks = graft.operators.Chunking
      .chunkDocuments(df, "doc_id", "text", chunkTokens, overlap)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
      val got  = chunks(id)
      // taking the first `stride` tokens of each chunk + the tail of the last
      // chunk reconstructs the document exactly
      val rebuilt = (got.init.flatMap(_.split(" ").filter(_.nonEmpty).take(stride)) ++
        got.last.split(" ").filter(_.nonEmpty)).toSeq
      assert(rebuilt == toks, s"doc $id")
    }
  }

  test("minhash signature is distinct-invariant (multiset == set)") {
    val docs = Seq(
      (1L, "a b c a b c a b c d e f"),
      (2L, "a b c d e f"),
    ).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id", shingleWords = 1, k = 32)
      .orderBy("id").drop("id").collect()
    assert(sigs(0).toSeq == sigs(1).toSeq)
  }

  test("url canonicalization is idempotent on generated crawl urls") {
    // canonical output must be a fixed point: canon(canon(u)) == canon(u)
    val seg   = Gen.identifier.map(_.take(6))
    val param = for { k <- seg; v <- seg } yield s"$k=$v"
    val urlGen = for {
      scheme <- Gen.oneOf("http", "https", "HTTP")
      host   <- seg.map(h => s"$h.Example.COM")
      port   <- Gen.oneOf("", ":80", ":443", ":8080")
      path   <- Gen.listOfN(2, seg).map(_.mkString("/", "/", ""))
      slash  <- Gen.oneOf("", "/", "//")
      ps     <- Gen.chooseNum(0, 3).flatMap(n => Gen.listOfN(n, param))
      track  <- Gen.oneOf("", "&utm_source=x", "&gclid=1")
      frag   <- Gen.oneOf("", "#sec", "#a?b=1")
    } yield s"$scheme://$host$port$path$slash" +
      (if (ps.nonEmpty || track.nonEmpty) s"?${ps.mkString("&")}$track" else "") + frag
    val urls = samples(urlGen, 150)
    val once = urls.toDF("url")
      .select(graft.operators.UrlCanon.canonicalizeUrl(col("url")).as("c1"))
      .withColumn("c2", graft.operators.UrlCanon.canonicalizeUrl(col("c1")))
      .collect().map(r => (r.getString(0), r.getString(1)))
    once.foreach { case (c1, c2) => assert(c1 == c2, s"not a fixed point: '$c1' -> '$c2'") }
  }
}
