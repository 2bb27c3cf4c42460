package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** DSIR-style data selection with importance resampling (Xie, Santurkar,
  * Ma, Liang — "Data Selection for Language Models via Importance
  * Resampling", arXiv:2302.03169): select raw-corpus documents whose
  * hashed-n-gram distribution looks like a TARGET corpus.
  *
  * The published recipe, re-expressed relationally:
  *  1. featurize both corpora as hashed unigram+bigram bucket counts
  *     ([[graft.functions.DsirBuckets]] — md5 first-12-bits buckets, 4096
  *     of them, the oracle-portable hash);
  *  2. fit two bag-of-grams models by bucket histogram (add-1 smoothing);
  *  3. score every raw doc with the log importance weight
  *     log p_target(doc) − log p_raw(doc) = Σ_grams w[bucket], where
  *     w[b] = ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B));
  *  4. keep the top-k by weight (the paper resamples with Gumbel noise;
  *     the deterministic top-k variant keeps the gate reproducible and is
  *     the common production simplification).
  *
  * Scale shape: training is ONE scan per corpus — the per-doc bucket
  * array explodes into int rows that partial-aggregate map-side to ≤4096
  * rows per partition before the only shuffle; the driver pulls exactly
  * the ≤4096-row histograms (documented cap, the classifier-gradient
  * convention). Scoring is one raw-corpus scan with a codegen'd kernel
  * (32 KB of weights riding the plan) and zero shuffle; selection is the
  * shared two-stage top-k, so the corpus-volume shuffle spreads over
  * partitions and only ≤ k·partitions survivor rows reach the global
  * rank. No all-pairs shape, no driver loop over data rows.
  *
  * The reference ships nothing comparable (its scope ends at catalog
  * queries); this is the data-selection stage a 100 TB pretraining
  * pipeline runs between quality filtering and dedup. */
object Dsir {
  val Buckets: Int = graft.functions.DsirHash.Buckets

  /** Per-doc gram bucket ids (interleaved unigram/bigram walk order) over
    * the house tokenizer's output. */
  def gramBuckets(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.DsirBuckets(
      GraftColumnBridge.expression(Dedup.tokens(text))))
  }

  /** Hashed-gram histogram of a corpus: counts[bucket], plus the total
    * gram count. One scan; the driver pull is ≤ [[Buckets]] rows. */
  def bucketHistogram(df: DataFrame, textCol: String): (Array[Long], Long) = {
    val counts = new Array[Long](Buckets)
    df.select(explode(gramBuckets(col(textCol))).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
      .collect()
      .foreach(r => counts(r.getInt(0)) = r.getLong(1))
    (counts, counts.sum)
  }

  /** Per-bucket log importance weights from target and raw histograms —
    * w[b] = ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B)), the add-1-smoothed
    * log-ratio of the two bag-of-grams models. Every input is an exact
    * integer and the divisions/logs are the same double ops the DuckDB
    * oracle runs, so weights (and the ordered score sums built from
    * them) are bit-identical cross-engine. */
  def importanceWeights(
      target: (Array[Long], Long), raw: (Array[Long], Long)): Array[Double] = {
    val (t, tTot) = target
    val (r, rTot) = raw
    Array.tabulate(Buckets) { b =>
      math.log((t(b) + 1).toDouble / (tTot + Buckets).toDouble) -
        math.log((r(b) + 1).toDouble / (rTot + Buckets).toDouble)
    }
  }

  /** The (n_grams, score) struct column for a text column under a fitted
    * weight table — THE one construction of the scoring expression, shared
    * by [[scored]], the gates, and [[CorpusPipeline.dsirCondition]] (so
    * the clean() stage and the oracle-pinned gates cannot drift apart). */
  def scoreStruct(text: Column, weights: Array[Double]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.DsirScore(
      GraftColumnBridge.expression(Dedup.tokens(text)), weights))
  }

  /** Score a corpus with a fitted weight table: (idCol, n_grams, score) —
    * one codegen'd scan, zero shuffle. */
  def scored(df: DataFrame, textCol: String, idCol: String,
             weights: Array[Double]): DataFrame = {
    val s = scoreStruct(col(textCol), weights)
    df.select(col(idCol).as("id"), s.as("__s"))
      .select(col("id"), col("__s").getField("n_grams").as("n_grams"),
        col("__s").getField("score").as("score"))
  }

  /** End-to-end selection: fit on `target` vs `raw`, keep raw's top-k by
    * importance weight (score desc, id asc — deterministic tie rule).
    * Returns (rank, id, n_grams, score). */
  def selectTopK(raw: DataFrame, target: DataFrame, textCol: String,
                 idCol: String, k: Int): DataFrame = {
    val w = importanceWeights(
      bucketHistogram(target, textCol), bucketHistogram(raw, textCol))
    // global top-k = the shared bounded-heap prune under one constant key:
    // partial heaps keep k per input partition, the final merge ranks the
    // ≤ k·partitions survivors
    Similarity.twoStageTopK(
        scored(raw, textCol, idCol, w).withColumn("__k", lit(1)),
        "__k", col("score"), col("id"), k)
      .select(col("rank"), col("id"), col("n_grams"), col("score"))
  }

  /** Deterministic per-doc Gumbel noise for the paper's actual sampler —
    * seeded md5 uniform (the portable-bucket convention: first 4 hex
    * chars → u = (v+0.5)/65536, strictly inside (0,1)) fed through the
    * standard inverse transform g = −ln(−ln u). A pure function of
    * (seed, id): reproducible across reruns, layouts, and engines —
    * unlike rand(), and exactly re-derivable by the DuckDB oracle. */
  def gumbelKey(id: Column, seed: Int): Column = {
    val v4 = conv(substring(md5(concat_ws("|",
        lit("gumbel"), lit(seed.toString), id.cast(org.apache.spark.sql.types.StringType))),
      1, 4), 16, 10).cast(LongType).cast(org.apache.spark.sql.types.DoubleType)
    -log(-log((v4 + lit(0.5)) / lit(65536.0)))
  }

  /** The paper's Gumbel-top-k resampling (§2 of arXiv:2302.03169): sample
    * k docs WITHOUT replacement ∝ their importance weights by ranking on
    * log-weight + Gumbel noise — the noisy variant trades the determinism
    * of [[selectTopK]]'s argmax for the diversity the paper argues
    * matters at scale, while staying bit-reproducible via the seeded
    * noise. Same one-scan + two-stage-prune shape. */
  def selectGumbelTopK(raw: DataFrame, target: DataFrame, textCol: String,
                       idCol: String, k: Int, seed: Int = 42): DataFrame = {
    val w = importanceWeights(
      bucketHistogram(target, textCol), bucketHistogram(raw, textCol))
    val keyed = scored(raw, textCol, idCol, w)
      .withColumn("key", col("score") + gumbelKey(col("id"), seed))
    Similarity.twoStageTopK(keyed.withColumn("__k", lit(1)),
        "__k", col("key"), col("id"), k)
      .select(col("rank"), col("id"), col("n_grams"), col("score"), col("key"))
  }
}
