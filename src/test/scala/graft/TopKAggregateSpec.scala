package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r18 bounded-heap top-k ([[graft.functions.TopKRows]] through
  * `Similarity.twoStageTopK`) must be BIT-IDENTICAL to the two-window
  * form it replaced: same rows, same ranks, under the shared
  * (score DESC NULLS LAST, id ASC NULLS FIRST) order. The reference here
  * IS that window form, inlined. */
class TopKAggregateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The pre-r18 two-window reference, verbatim. */
  private def windowTopK(df: org.apache.spark.sql.DataFrame, keyCol: String,
                         ord: Seq[org.apache.spark.sql.Column], k: Int,
                         rankCol: String = "rank"): org.apache.spark.sql.DataFrame = {
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol), col("__pid")).orderBy(ord: _*)
    val wGlobal = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(ord: _*)
    df.withColumn("__pid", spark_partition_id())
      .withColumn("__lr", row_number().over(wLocal))
      .filter(col("__lr") <= k)
      .withColumn(rankCol, row_number().over(wGlobal))
      .filter(col(rankCol) <= k)
      .drop("__pid", "__lr")
  }

  private def heapTopK(df: org.apache.spark.sql.DataFrame, keyCol: String,
                       scoreCol: org.apache.spark.sql.Column,
                       idCol: org.apache.spark.sql.Column,
                       k: Int): org.apache.spark.sql.DataFrame = {
    // mirror of Similarity.twoStageTopK (private[operators]) — same
    // packing, same aggregate, same unpack
    import org.apache.spark.sql.GraftColumnBridge
    val payload = struct(df.columns.map(col): _*)
    val packed = struct(scoreCol.cast("double").as("__sc"),
      idCol.as("__id"), payload.as("__pl"))
    val agg = GraftColumnBridge.column(graft.functions.TopKRows(
      GraftColumnBridge.expression(packed), k))
    df.groupBy(col(keyCol)).agg(agg.as("__tk"))
      .select(posexplode(col("__tk")).as(Seq("__tkpos", "__tkrow")))
      .select(df.columns.map(c => col(s"__tkrow.__pl.$c")) :+
        (col("__tkpos") + lit(1)).cast("int").as("rank"): _*)
  }

  /** NaN-safe row comparison: doubles compare by bits (Scala == on a Seq
    * would read NaN != NaN). */
  private def bits(s: Seq[Any]): Seq[Any] = s.map {
    case d: Double => java.lang.Double.doubleToLongBits(d)
    case v => v
  }

  /** Seeded scored frame: hash-derived doubles (ties across groups, none
    * within a (key, id) pair), string payload that would expose
    * buffer-aliasing copies, 7 partitions so partial heaps really merge. */
  private def scored = spark.range(0, 2000, 1, 7)
    .select((col("id") % 13).as("qid"), col("id").as("doc_id"),
      (pmod(xxhash64(col("id")), lit(97)).cast("double") / 97.0).as("score"),
      concat(lit("payload_"), col("id")).as("tag"),
      (col("id") % 5).as("dl"))

  test("heap top-k rows and ranks are bit-identical to the window form") {
    for (k <- Seq(1, 3, 10, 40)) {
      val want = windowTopK(scored, "qid",
          Seq(col("score").desc, col("doc_id").asc), k)
        .orderBy("qid", "rank").collect().map(r => bits(r.toSeq))
      val got = heapTopK(scored, "qid", col("score"), col("doc_id"), k)
        .orderBy("qid", "rank").collect().map(r => bits(r.toSeq))
      assert(got.length == want.length, s"k=$k row counts differ")
      got.zip(want).foreach { case (g, w) => assert(g == w, s"k=$k") }
    }
  }

  test("groups smaller than k emit every row, ranked") {
    val tiny = scored.filter(col("doc_id") < 20) // ≤ 2 rows per qid
    val want = windowTopK(tiny, "qid",
        Seq(col("score").desc, col("doc_id").asc), 10)
      .orderBy("qid", "rank").collect().map(r => bits(r.toSeq))
    val got = heapTopK(tiny, "qid", col("score"), col("doc_id"), 10)
      .orderBy("qid", "rank").collect().map(r => bits(r.toSeq))
    assert(got.toSeq == want.toSeq)
  }

  test("null scores rank last (desc nulls last), matching the window form") {
    val withNulls = scored.withColumn("score",
      when(col("doc_id") % 7 === 0, lit(null).cast("double"))
        .otherwise(col("score")))
    val want = windowTopK(withNulls, "qid",
        Seq(col("score").desc, col("doc_id").asc), 5)
      .orderBy("qid", "rank").collect().map(r => bits(r.toSeq))
    val got = heapTopK(withNulls, "qid", col("score"), col("doc_id"), 5)
      .orderBy("qid", "rank").collect().map(r => bits(r.toSeq))
    assert(got.toSeq == want.toSeq)
  }

  test("string ids order like the window form (interpreted ordering path)") {
    val strIds = scored.select(col("qid"),
      concat(lit("d"), lpad(col("doc_id").cast("string"), 5, "0")).as("doc_id"),
      col("score"), col("tag"))
    val want = windowTopK(strIds, "qid",
        Seq(col("score").desc, col("doc_id").asc), 8)
      .orderBy("qid", "rank").collect().map(r => bits(r.toSeq))
    val got = heapTopK(strIds, "qid", col("score"), col("doc_id"), 8)
      .orderBy("qid", "rank").collect().map(r => bits(r.toSeq))
    assert(got.toSeq == want.toSeq)
  }

  test("NaN scores sort as the largest double, matching Spark SQL order") {
    val withNaN = scored.withColumn("score",
      when(col("doc_id") % 11 === 0, lit(Double.NaN)).otherwise(col("score")))
    val want = windowTopK(withNaN, "qid",
        Seq(col("score").desc, col("doc_id").asc), 5)
      .orderBy("qid", "rank").collect().map(r => bits(r.toSeq))
    val got = heapTopK(withNaN, "qid", col("score"), col("doc_id"), 5)
      .orderBy("qid", "rank").collect().map(r => bits(r.toSeq))
    assert(got.toSeq == want.toSeq)
  }
}
