package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus cleaning: the composition a 100 TB pretraining
  * pipeline runs, built entirely from the engine's operators.
  *
  * Stages (C4/Gopher-shaped):
  *   1. quality gate   — structural features (TextAnalysis.qualityFeatures)
  *   2. language gate  — heuristic lang-id agreement or allow-list
  *   3. exact dedup    — content-hash groupBy, deterministic survivor
  *   4. near dedup     — MinHash-LSH pairs → connected components via
  *                       iterated min-neighbor propagation → keep cluster min
  *
  * Every stage is a lazy plan; `clean` returns the cleaned corpus plus a
  * per-stage row-count audit (forced once at the end — one pass per stage,
  * no driver loops). The near-dup component step iterates a bounded number
  * of label-propagation rounds (diameter of dup clusters is tiny in
  * practice; each round is one shuffle).
  */
object CorpusPipeline {

  final case class CleanResult(cleaned: DataFrame, stats: Seq[(String, Long)])

  /** Connected components over near-dup pairs via min-label propagation:
    * every doc starts as its own label; each round adopts the smallest label
    * among itself and its neighbors. Converges in O(cluster diameter)
    * rounds — near-dup clusters are shallow, so `maxRounds` = 5 default.
    */
  def dupClusters(pairs: DataFrame, maxRounds: Int = 5): DataFrame = {
    // Iterated joins double the lineage every round — without truncation the
    // upstream (minhash) would recompute 2^rounds times. localCheckpoint
    // materializes each round's small label table and cuts the plan.
    // lazy checkpoints: the immediately-following action materializes them,
    // so no separate eager job; lineage is still truncated from then on
    val edges = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .unionByName(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
      .localCheckpoint(false)
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(false)
    var round   = 0
    var changed = 1L
    // Early-exit on convergence: near-dup clusters are usually diameter ≤ 2,
    // so most corpora stop after round 2 instead of paying all maxRounds
    // shuffles. The per-round changed-count is a cheap count on the already
    // materialized label table.
    while (round < maxRounds && changed > 0L) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "b").withColumnRenamed("label", "nl"), "b")
        .groupBy(col("a").as("id")).agg(min(col("nl")).as("nmin"))
      val next = labels.withColumnRenamed("label", "__old")
        .join(neighborMin, Seq("id"), "left")
        .withColumn("label", least(col("__old"), coalesce(col("nmin"), col("__old"))))
        .select(col("id"), col("label"), (col("label") < col("__old")).as("__chg"))
        .localCheckpoint(false)
      changed = next.filter(col("__chg")).count()
      labels = next.select("id", "label")
      round += 1
    }
    labels
  }

  def clean(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minTokens: Int = 10,
      minAlphaRatio: Double = 0.5,
      allowedLangs: Seq[String] = Nil,
      nearDupThreshold: Double = 0.8,
  ): CleanResult = {
    // 1. structural quality gate; input + surviving counts in ONE pass
    val qualityCond = col("n_tokens") >= minTokens && col("alpha_ratio") >= minAlphaRatio
    val counts = TextAnalysis.qualityFeatures(docs, textCol)
      .agg(count(lit(1)).as("n0"),
        sum(when(qualityCond, 1L).otherwise(0L)).as("n1")).head()
    val n0 = counts.getLong(0)
    val n1 = counts.getLong(1)
    val quality = TextAnalysis.qualityFeatures(docs, textCol)
      .filter(qualityCond)
      .select(docs.columns.map(col): _*)

    // 2. language gate (count only paid when the gate is active)
    val langed =
      if (allowedLangs.isEmpty) quality
      else quality.filter(TextAnalysis.langId(col(textCol)).isin(allowedLangs: _*))
    val n2 = if (allowedLangs.isEmpty) n1 else langed.count()

    // 3. exact dedup (deterministic survivor = min id); materialized once —
    // it feeds the count, the LSH pass, and the final anti-join
    val exact = Dedup.exact(langed, Seq(textCol), idCol).localCheckpoint(false)
    val n3 = exact.count()

    // 4. near dedup: LSH candidates verified by EXACT n-gram jaccard →
    // components → keep each cluster's min id. The exact verify makes the
    // stage independent of the minhash estimator (and oracle-checkable);
    // candidate generation is still the near-linear LSH equality join.
    val pairs = Dedup.ngramJaccard(exact, textCol, idCol, threshold = nearDupThreshold)
    val clusters = dupClusters(pairs)
    val losers = clusters.filter(col("id") =!= col("label")).select(col("id").as(idCol))
    val cleaned = exact.join(losers, Seq(idCol), "left_anti")
    val n4 = cleaned.count()

    CleanResult(cleaned, Seq(
      "input" -> n0, "quality" -> n1, "lang" -> n2, "exact_dedup" -> n3, "near_dedup" -> n4))
  }
}
