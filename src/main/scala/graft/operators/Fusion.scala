package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009 — the
  * standard way modern retrieval stacks merge a lexical and a semantic
  * ranking without score calibration):
  *
  *   rrf(d, q) = Σ_sources 1 / (k_rrf + rank_source(d, q))
  *
  * with `k_rrf = 60` (the paper's constant). A document absent from a
  * source contributes 0 for it. Ties break on doc id ascending, like
  * every ranking operator here.
  *
  * Spark-first shape: each input ranking is already top-k-bounded
  * ((query_id, doc_id, rank) — [[KeywordSearch.bm25TopK]]/[[bm25Batch]],
  * [[Similarity]]'s top-k family), so the fusion is a chain of
  * full-outer joins over AT MOST k·|sources| rows per query — survivor
  * volume, never corpus volume — followed by the shared two-stage
  * deterministic top-k. The score is a FIXED-ORDER sum of coalesced
  * per-source terms (source order = argument order), so it is
  * bit-deterministic and an engine-portable oracle can re-derive it
  * exactly.
  *
  * Output: (query_id, rank, doc_id, rrf_score, rank_0 … rank_{n-1}) —
  * the per-source ranks ride along (null where the source missed the
  * document) so a fused result is auditable back to its sources.
  */
object Fusion {

  def rrfFuse(rankings: Seq[DataFrame], k: Int = 10, kRrf: Int = 60): DataFrame = {
    require(rankings.size >= 2, s"rrfFuse: need at least two rankings, got ${rankings.size}")
    require(kRrf > 0, s"rrfFuse: k_rrf must be positive, got $kRrf")
    val renamed = rankings.zipWithIndex.map { case (df, i) =>
      Seq("query_id", "doc_id", "rank").foreach(c => require(df.columns.contains(c),
        s"rrfFuse: ranking $i lacks column '$c' (needs query_id, doc_id, rank)"))
      df.select(col("query_id"), col("doc_id"), col("rank").cast("long").as(s"rank_$i"))
    }
    val joined = renamed.reduce((a, b) => a.join(b, Seq("query_id", "doc_id"), "full_outer"))
    // fixed-order sum: source 0's term first, then 1, … — never an
    // unordered aggregate, so the float is the same bits in any engine
    val score = rankings.indices.map(i =>
      coalesce(lit(1.0) / (lit(kRrf.toDouble) + col(s"rank_$i").cast("double")), lit(0.0)))
      .reduce(_ + _)
    val rankCols = rankings.indices.map(i => col(s"rank_$i"))
    Similarity.twoStageTopK(joined.withColumn("rrf_score", score), "query_id",
        col("rrf_score"), col("doc_id"), k)
      .select(col("query_id") +: col("rank") +: col("doc_id") +: col("rrf_score") +:
        rankCols: _*)
  }
}
