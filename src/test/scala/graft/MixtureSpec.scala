package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mixture

class MixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  val weights = Map("en" -> 0.40, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "zh" -> 0.15)

  test("kept corpus matches the target mixture within sampling tolerance") {
    val kept = Mixture.sampleToMixture(docs, "doc_id", "lang", weights)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = kept.values.sum.toDouble
    assert(total > 0)
    weights.foreach { case (lang, w) =>
      val achieved = kept.getOrElse(lang, 0L) / total
      // ±O(1/sqrt(n)) ratio-sampling noise at n≈500
      assert(math.abs(achieved - w) < 0.08, s"$lang: achieved $achieved vs target $w ($kept)")
    }
  }

  test("the binding domain is kept (nearly) whole; others are thinned") {
    // fr has the smallest n/w (64/0.15) so it binds: acceptance ~1.0
    val perLang = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = Mixture.sampleToMixture(docs, "doc_id", "lang", weights)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept("fr") >= perLang("fr") - 1) // floor boundary may shave one bucket
    assert(kept("en") < perLang("en"))      // en is oversupplied at 40%
  }

  test("membership is stable across repartitionings and excludes unweighted domains") {
    val a = Mixture.sampleToMixture(docs, "doc_id", "lang", weights)
      .select("doc_id").as[Long].collect().toSet
    val b = Mixture.sampleToMixture(docs.repartition(17), "doc_id", "lang", weights)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    val noZh = Mixture.sampleToMixture(docs, "doc_id", "lang", weights - "zh")
    assert(noZh.filter(col("lang") === "zh").count() == 0)
  }

  test("invalid weights are rejected") {
    intercept[IllegalArgumentException] {
      Mixture.sampleToMixture(docs, "doc_id", "lang", Map.empty[String, Double])
    }
    intercept[IllegalArgumentException] {
      Mixture.sampleToMixture(docs, "doc_id", "lang", Map("en" -> 0.0))
    }
  }
}
