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
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    stratumCol: String, budget: Int = 512): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)).cast(LongType))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", floor((col("__cum") - col("n_tokens")) / lit(budget.toDouble)).cast(LongType))
      .drop("__cum")
  }
}
