package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data decontamination: remove training documents that share word
  * n-grams with an evaluation/benchmark set.
  *
  * The standard LLM-pipeline guard against test-set leakage (the reference
  * engine stops at catalog analytics; this extends the corpus-pipeline
  * surface the same way Dedup/Chunking do): a training document is
  * contaminated when at least `minHits` DISTINCT evaluation n-grams occur
  * in it.
  *
  * Scale shape: an eval set is benchmark-sized (thousands of documents),
  * so its distinct n-gram table is broadcast — the 100 TB train side
  * streams through a map-side hash join with NO shuffle; the only
  * shuffles are the per-doc hit count (groupBy id) and the final anti
  * join. Nothing here is quadratic and no driver collect touches data.
  */
object Decontaminate {

  /** Per-contaminated-doc report: (id, hits = distinct eval n-grams seen).
    * Only docs with hits >= minHits appear. */
  def contaminationReport(train: DataFrame, eval: DataFrame, textCol: String,
                          idCol: String, n: Int = 3, minHits: Int = 1): DataFrame = {
    val evalGrams = eval
      .select(explode(Dedup.wordShingles(col(textCol), n)).as("g"))
      .distinct()
    val trainGrams = train
      .select(col(idCol).as("id"), explode(Dedup.wordShingles(col(textCol), n)).as("g"))
    trainGrams
      .join(broadcast(evalGrams), "g") // map-side: eval grams are benchmark-sized
      .groupBy("id")
      .agg(count(lit(1)).as("hits")) // grams already distinct per doc (wordShingles)
      .filter(col("hits") >= minHits)
  }

  /** Training rows with contaminated documents removed. */
  def decontaminate(train: DataFrame, eval: DataFrame, textCol: String,
                    idCol: String, n: Int = 3, minHits: Int = 1): DataFrame = {
    val bad = contaminationReport(train, eval, textCol, idCol, n, minHits)
    train.join(bad, train(idCol) === bad("id"), "left_anti")
  }

  /** Streaming twin: filter a training-document STREAM against a static
    * eval set. The eval n-grams are collected once (DriverGuard-bounded —
    * eval sets are benchmark-sized) and broadcast; each arriving doc is
    * scored by pure set membership. Stateless per-row work — no watermark,
    * no state store, append-mode safe — because the static side is fixed at
    * query start, exactly like the reference side of a stream-static join.
    * Returns the KEPT stream; pass `invert = true` for the flagged stream
    * (with a `hits` column). */
  def decontaminateStream(trainStream: DataFrame, eval: DataFrame, textCol: String,
                          n: Int = 3, minHits: Int = 1, invert: Boolean = false): DataFrame = {
    val spark = eval.sparkSession
    val grams = graft.catalog.DriverGuard.boundedCollect(
      eval.select(explode(Dedup.wordShingles(col(textCol), n)).as("g")).distinct(),
      "decontaminateStream(eval n-grams)").map(_.getString(0)).toSet
    val bc = spark.sparkContext.broadcast(grams)
    // a udf over the broadcast set: set membership over ~benchmark-sized
    // gram tables has no expression form that doesn't inline the table
    // into the plan; the udf evaluates once per row on grams built by the
    // same (codegen-friendly) wordShingles as the batch path
    val hitsUdf = udf { shings: Seq[String] =>
      if (shings == null) 0 else shings.count(bc.value.contains)
    }
    // collision-proof internal names: the kept path must return the input
    // schema EXACTLY (batch parity — the batch twin's anti join preserves
    // every train column, including any user column named "hits")
    val gramsCol = "__graft_decon_grams"
    val hitsCol  = "__graft_decon_hits"
    val scored = trainStream
      .withColumn(gramsCol, Dedup.wordShingles(col(textCol), n))
      .withColumn(hitsCol, hitsUdf(col(gramsCol)))
      .drop(gramsCol)
    if (invert) {
      require(!trainStream.columns.contains("hits"),
        "decontaminateStream(invert = true) emits a 'hits' column but the input already has one")
      scored.filter(col(hitsCol) >= minHits).withColumnRenamed(hitsCol, "hits")
    } else scored.filter(col(hitsCol) < minHits).drop(hitsCol)
  }
}
