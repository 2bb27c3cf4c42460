package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.UrlCanon

class UrlCanonSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(UrlCanon.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect().toSeq

  test("canonical form: fragment, case, tracking params, param order, trailing slash") {
    val Seq(a, b) = canon(
      "http://Example.COM/Page/?b=2&a=1&utm_source=x&fbclid=y#frag",
      "http://example.com/Page?a=1&b=2")
    assert(a == "http://example.com/Page?a=1&b=2")
    assert(a == b)
    // path case is preserved (case-significant on most servers)
    assert(canon("http://h/CaseSensitive").head == "http://h/CaseSensitive")
  }

  test("valueless tracking params are stripped too") {
    // '?utm_source' with no '=' is the same alias as the bare page
    assert(canon("https://x.com/p?utm_source").head == canon("https://x.com/p").head)
    assert(canon("https://x.com/p?a=1&ref").head == "https://x.com/p?a=1")
    // ...but a key merely PREFIXED by a tracking key is a real param
    assert(canon("https://x.com/p?refresh=1").head == "https://x.com/p?refresh=1")
  }

  test("default-port strip is scheme-conditional") {
    // :80 default for http, :443 for https — those pairs collapse
    assert(canon("http://h:80/x").head == canon("http://h/x").head)
    assert(canon("https://h:443/x").head == canon("https://h/x").head)
    // cross-scheme ports are NOT defaults: distinct resources stay distinct
    assert(canon("http://h:443/x").head != canon("http://h/x").head)
    assert(canon("https://h:80/x").head != canon("https://h/x").head)
  }

  test("query splits on the FIRST '?' only — later '?' chars stay in the query") {
    val Seq(c) = canon("http://h/p?a=1?x&b=2")
    assert(c == "http://h/p?a=1?x&b=2")
    // and a tracking param after the literal '?' is still filtered
    assert(canon("http://h/p?a=1?x&gclid=z").head == "http://h/p?a=1?x")
  }

  test("dedupByCanonicalUrl: null and empty URLs pass through as singletons") {
    val df = Seq(
      (1L, "http://h/x"),
      (2L, "http://h/x/"),          // collapses with 1
      (3L, null.asInstanceOf[String]),
      (4L, null.asInstanceOf[String]),
      (5L, ""),                     // empty string — another 'missing' spelling
      (6L, "")
    ).toDF("doc_id", "url")
    val out = UrlCanon.dedupByCanonicalUrl(df, "url", "doc_id")
    // 1 collapsed group + 4 singletons (two nulls + two empties), NOT
    // one shared null group and one shared "" group
    assert(out.count() == 5)
    val survivors = out.select("survivor_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 3L, 4L, 5L, 6L))
    val collapsed = out.filter(col("survivor_id") === 1L).head()
    assert(collapsed.getAs[Long]("n_dups") == 2L)
  }

  test("dedupByCanonicalUrl collapses all surface forms of one page") {
    val df = Seq(
      (10L, "http://Example.COM/page/?b=2&a=1&utm_source=x#frag"),
      (11L, "http://example.com:80/page?a=1&b=2"),
      (12L, "http://example.com/page?b=2&a=1&gclid=zz"),
      (13L, "http://example.com/other")
    ).toDF("doc_id", "url")
    val out = UrlCanon.dedupByCanonicalUrl(df, "url", "doc_id")
    assert(out.count() == 2)
    assert(out.filter(col("survivor_id") === 10L).head().getAs[Long]("n_dups") == 3L)
  }
}
