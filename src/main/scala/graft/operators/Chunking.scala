package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Training-sequence shaping: the two ops between a clean corpus and a
  * tokenizer-ready dataset.
  *
  *  - [[chunkDocuments]]: split each document into overlapping token
  *    windows (context-length chunks). Pure per-row expressions (sequence →
  *    posexplode → slice → array_join): no shuffle at all — the chunker
  *    runs inside the scan at any scale.
  *  - [[packSequences]]: assign documents to fixed token-budget bins
  *    (sequence packing). Deterministic first-come packing = running token
  *    total divided by the budget, windowed PER STRATUM (e.g. language or
  *    shard): each stratum packs independently, so the window never needs a
  *    global order — the 100 TB answer to packing's inherent sequentiality.
  */
object Chunking {

  /** Overlapping token-window chunks. Starts advance by
    * `chunkTokens - overlap`; every start < n_tokens emits a chunk, so short
    * docs yield exactly one. Output: (idCol, chunk_idx, chunk_text,
    * chunk_tokens).
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int = 64, overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap / $chunkTokens")
    val stride = chunkTokens - overlap
    val toks   = TextAnalysis.tokens(col(textCol))
    val n      = size(toks)
    // number of stride-starts strictly below n (at least 1)
    val nChunks = greatest(ceil(n.cast(DoubleType) / stride).cast(LongType), lit(1L))
    df.select(col(idCol), toks.as("__toks"), nChunks.as("__nc"))
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0L), col("__nc") - 1L)))
      .select(col(idCol), col("pos").as("chunk_idx"),
        slice(col("__toks"), col("pos").cast("int") * stride + 1, lit(chunkTokens)).as("__chunk"))
      .select(col(idCol), col("chunk_idx"),
        array_join(col("__chunk"), " ").as("chunk_text"),
        size(col("__chunk")).as("chunk_tokens"))
  }

  /** Sequence packing: deterministic in-order bin assignment per stratum.
    * A document whose running total (inclusive) has crossed into the next
    * `budget` multiple starts/continues that bin: bin = floor((cum - n) /
    * budget) — i.e. each doc packs into the bin its cumulative start falls
    * in (docs longer than the budget own consecutive bins' worth of
    * tokens; they are not split). Output: input cols + n_tokens, bin.
    *
    * Parallelism: packing is sequential WITHIN a window, so with a handful
    * of strata (e.g. 4 languages) the window collapses onto that many
    * reducers no matter the cluster size. `subShards > 1` salts every
    * stratum into that many deterministic hash sub-streams, each packed
    * independently (bins are namespaced by sub-shard, so ids stay unique).
    * Packing density is unchanged in expectation — only cross-sub-shard
    * "last partial bin" fragmentation is added, ≤ subShards·budget wasted
    * tokens per stratum — and parallelism multiplies by `subShards`. Default
    * 1 keeps the exact legacy assignment (and the SQL oracle's).
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    stratumCol: String, budget: Int = 512,
                    subShards: Int = 1): DataFrame =
    packByTokenCount(
      df.withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)).cast(LongType)),
      idCol, "n_tokens", stratumCol, budget, subShards)

  /** Core packing over a PRECOMPUTED token-count column — the unit can be
    * whitespace tokens ([[packSequences]]) or real tokenizer output (BPE
    * ids via [[BpeTokenizer.encode]]'s `n_tokens` — the unit an LLM
    * actually trains on). Same deterministic cumulative-start assignment
    * and sub-shard salting as [[packSequences]].
    *
    * Feed this the PROJECTED (id, count, stratum) columns when the frame
    * also carries the token-id arrays: the window sorts its partition, and
    * an array column riding through it pays the array's serialization per
    * row (the r9 semdedup seed-window lesson) — join the ids back by the
    * unique id afterwards instead. */
  def packByTokenCount(df: DataFrame, idCol: String, nTokensCol: String,
                       stratumCol: String, budget: Int = 512,
                       subShards: Int = 1): DataFrame = {
    require(subShards >= 1, s"subShards must be >= 1, got $subShards")
    val shard = if (subShards == 1) lit(0L) else pmod(xxhash64(col(idCol)), lit(subShards.toLong))
    val w = Window.partitionBy(col(stratumCol), shard).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("__cum", sum(col(nTokensCol)).over(w))
      // integer div, not double / — epoch-scale cumulative sums lose
      // precision in double division right at bin boundaries (the same
      // rule RangeJoin documents); values are non-negative so div == floor
      .withColumn("__localbin",
        call_function("div", col("__cum") - col(nTokensCol), lit(budget.toLong)))
      // namespace bins by sub-shard so (stratum, bin) stays a unique key
      .withColumn("bin", col("__localbin") * subShards + shard)
      .drop("__cum", "__localbin")
  }
}
