package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.NgramLm

class NgramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // hand-computable corpus: uni the:3 cat:2 sat:2 dog:1 ran:1, N = 9;
  // bi "the cat":2 "cat sat":1 "cat ran":1 "the dog":1 "dog sat":1;
  // tri "the cat sat":1 "the cat ran":1 "the dog sat":1
  private def corpus = Seq(
    (1L, "The cat sat"), (2L, "the cat ran"), (3L, "the dog sat"))
    .toDF("doc_id", "text")

  test("backoff levels and logscore match hand computation") {
    val model = NgramLm.train(corpus, "text")
    assert(model.totalTokens == 9L && model.uni("the") == 3L &&
      model.bi("the cat") == 2L && model.tri("the dog sat") == 1L)
    val docs = Seq(
      (1L, "the cat sat"),   // uni, bi, tri — no backoff anywhere
      (4L, "the dog ran"),   // 'ran' backs off tri→bi→uni (s = 2)
      (5L, "qq the"),        // unk start, then bi-miss → uni with s = 1
      (6L, ""), (7L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = NgramLm.score(docs, "text", "doc_id", model).collect()
      .map(r => r.getLong(0) -> r).toMap
    def stats(id: Long) = {
      val r = out(id)
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    }
    assert(stats(1L) == ((3L, 1L, 1L, 1L, 0L)), stats(1L).toString)
    assert(stats(4L) == ((3L, 0L, 1L, 2L, 0L)), stats(4L).toString)
    assert(stats(5L) == ((2L, 0L, 0L, 1L, 1L)), stats(5L).toString)
    assert(stats(6L) == ((0L, 0L, 0L, 0L, 0L)) && stats(7L) == ((0L, 0L, 0L, 0L, 0L)))
    val a = math.log10(0.4)
    val exp1 = math.log10(3.0 / 9.0) + math.log10(2.0 / 3.0) + math.log10(1.0 / 2.0)
    val exp4 = math.log10(3.0 / 9.0) + math.log10(1.0 / 3.0) +
      (math.log10(1.0 / 9.0) + 2 * a)
    val exp5 = math.log10(1.0 / 10.0) + (math.log10(3.0 / 9.0) + a)
    assert(math.abs(out(1L).getDouble(6) - exp1) < 1e-12, out(1L).getDouble(6).toString)
    assert(math.abs(out(4L).getDouble(6) - exp4) < 1e-12)
    assert(math.abs(out(5L).getDouble(6) - exp5) < 1e-12)
    // empty doc: logscore 0, perplexity null
    assert(out(6L).getDouble(6) == 0.0 && out(6L).isNullAt(7))
    // perplexity = 10^(−logscore/n)
    assert(math.abs(out(1L).getDouble(7) - math.pow(10.0, -exp1 / 3.0)) < 1e-12)
  }

  test("frequency caps bind deterministically and closure forces backoff") {
    // uni cap 2 keeps the:3 then the (count desc, gram asc) tie-break
    // picks cat over sat; bi cap 1 keeps only "the cat"; all tris kept
    val model = NgramLm.train(corpus, "text",
      maxUnigrams = 2, maxBigrams = 1, maxTrigrams = 5)
    assert(model.uni.size == 2 && model.uni("the") == 3L && model.uni("cat") == 2L
      && model.uni("sat") == 0L && model.uni("dog") == 0L)
    assert(model.bi.size == 1 && model.bi("the cat") == 2L && model.bi("cat sat") == 0L)
    assert(model.tri.size == 3)
    val docs = Seq((1L, "the cat sat"), (2L, "the dog sat")).toDF("doc_id", "text")
    val out = NgramLm.score(docs, "text", "doc_id", model).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // "the cat sat": tri survives (its context bigram was kept)
    assert(out(1L) == ((1L, 1L, 1L, 0L)), out(1L).toString)
    // "the dog sat": the kept trigram's context bigram was CAPPED AWAY,
    // so the closure check forces backoff all the way to unk
    assert(out(2L) == ((0L, 0L, 1L, 2L)), out(2L).toString)
  }

  test("self-trained corpus: no unk, levels partition, garbage worse (sf0.001)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = NgramLm.train(docs, "text")
    val sc = NgramLm.score(docs, "text", "doc_id", model)
    val st = sc.agg(
      sum(when(col("tri_hits") + col("bi_hits") + col("uni_hits") + col("unk")
        =!= col("n_pos"), 1L).otherwise(0L)).as("part_bad"),
      sum(col("unk")).as("unk_tot"),
      sum(when(col("logscore") > 0.0, 1L).otherwise(0L)).as("pos_bad"),
      max(col("perplexity")).as("max_perp")).head()
    assert(st.getLong(0) == 0L && st.getLong(1) == 0L && st.getLong(2) == 0L)
    val garbage = Seq((1L, (1 to 20).map(i => s"zzunseen$i").mkString(" ")))
      .toDF("doc_id", "text")
    val gp = NgramLm.score(garbage, "text", "doc_id", model)
      .head().getAs[Double]("perplexity")
    assert(gp > st.getAs[Double]("max_perp"), s"$gp vs ${st.getAs[Double]("max_perp")}")
  }

  test("plan shape: scoring is one scan, no joins, no shuffle") {
    val model = NgramLm.LmModel(graft.functions.GramTable.fromMap(Map("a" -> 1L)),
      graft.functions.GramTable.empty, graft.functions.GramTable.empty, 1L)
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val p = NgramLm.score(docs, "text", "doc_id", model)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join") && !p.contains("Exchange"), p.take(2000))
  }

  test("r19 fused train: ONE SQL execution (heap pulls + total), no TakeOrdered actions") {
    // the r18 form ran FOUR driver actions over a persisted counts frame
    // (three TakeOrderedAndProject pulls + the total sum); the fused form
    // is one groupBy(ord) aggregation collected once. Census the SQL
    // executions train() launches — the pin is the fusion itself; the
    // model equality is pinned by the hand-count tests above (incl. the
    // cap-boundary (count desc, gram asc) tie) which now run THROUGH the
    // heap path.
    val execs = new java.util.concurrent.atomic.AtomicInteger
    val takeOrdered = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(event: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        event match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execs.incrementAndGet()
            if (s.physicalPlanDescription.contains("TakeOrderedAndProject"))
              takeOrdered.incrementAndGet()
            ()
          case _ => ()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val model =
      try {
        val m = NgramLm.train(corpus, "text",
          maxUnigrams = 2, maxBigrams = 1, maxTrigrams = 5)
        Thread.sleep(500) // listener bus is async
        m
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(execs.get == 1, s"expected ONE SQL execution from train(), saw ${execs.get}")
    assert(takeOrdered.get == 0, "a TakeOrderedAndProject pull survived the fusion")
    // same capped model the 4-action form built (the hand-count pins)
    assert(model.totalTokens == 9L && model.uni.size == 2 &&
      model.uni("the") == 3L && model.uni("cat") == 2L && model.uni("sat") == 0L &&
      model.bi.size == 1 && model.bi("the cat") == 2L && model.tri.size == 3)
  }
}
