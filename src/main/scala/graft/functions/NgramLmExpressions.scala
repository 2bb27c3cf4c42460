package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Stupid-backoff n-gram language-model scoring kernel (Brants et al.
  * 2007, arXiv — "Large Language Models in Machine Translation": the
  * backoff score that replaced Kneser-Ney smoothing at web scale because
  * it needs only raw counts). The CCNet/fineweb-style pipelines filter
  * documents on LM perplexity against a clean reference corpus; this is
  * that filter's scoring half as a pure scan expression.
  *
  * Per token position `i` (tokens are [[graft.operators.Dedup.tokens]]'
  * lowercased whitespace words), with `a b` the two preceding tokens:
  *
  *   tri:  i ≥ 2 ∧ c(a b w) > 0 ∧ c(a b) > 0   → S = c(abw)/c(ab)
  *   bi:   i ≥ 1 ∧ c(b w) > 0 ∧ c(b) > 0       → S = α^s · c(bw)/c(b)
  *   uni:  c(w) > 0                            → S = α^s · c(w)/N
  *   unk:  otherwise                           → S = α^s · 1/(N+1)
  *
  * where `s` counts the levels actually backed off given the AVAILABLE
  * context (the first token of a document starts at the unigram level
  * with s = 0) and α = 0.4 (Brants' constant). The closure checks
  * (`c(ab) > 0`, `c(b) > 0`) matter because the model's per-order
  * frequency caps are independent: a kept trigram whose context bigram
  * was capped away backs off instead of dividing by a count the model no
  * longer carries — deterministic and mirrorable in SQL.
  *
  * Output struct per document:
  *   (n_pos, tri_hits, bi_hits, uni_hits, unk, logscore)
  * The four level counters are INTEGER facts about the capped count
  * tables — the hash-exact part a DuckDB oracle re-derives. `logscore`
  * (Σ log10 S, ≤ 0) feeds perplexity = 10^(−logscore/n_pos); transcendental,
  * so gates pin its PROPERTIES and specs pin exact values against a
  * driver-side mirror.
  *
  * The model rides a Spark BROADCAST variable, not plan literals (the
  * [[ShardedBloomMightContain]] lesson): the default caps admit millions
  * of grams — hundreds of MB as reference objects would grow the
  * analyzed plan and per-stage task binary linearly with model size,
  * while the broadcast keeps the plan at an O(1) handle and ships the
  * tables to each executor once via torrent broadcast. Scoring a 100 TB
  * corpus is one shuffle-free scan; model size is bounded by the
  * training caps ([[graft.operators.NgramLm.train]]), never by corpus
  * size.
  *
  * r11: counts live in primitive [[GramTable]]s (open-addressed
  * xxhash64→long; size and collision bounds in its scaladoc). The hot
  * loop hashes each token once from its UTF8String bytes and derives
  * every gram key by long-mixing — no gram string is ever built, no
  * String hashing, no boxing; the census stays bit-identical to the
  * string-keyed form it replaced.
  */
case class NgramLmScore(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    bModel: org.apache.spark.broadcast.Broadcast[graft.operators.NgramLm.LmModel])
  extends UnaryExpression {

  // Broadcast.value resolves to the executor's single cached block — a
  // shared reference, not a copy, so no JVM-global cache is needed here
  @transient private lazy val model: graft.operators.NgramLm.LmModel = bModel.value

  override def dataType: DataType = NgramLmScore.schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_lm_score expects array<string> tokens, got $other")
    }

  def score(tokens: ArrayData): InternalRow = {
    val n = tokens.numElements()
    // hash each token ONCE (straight off the UTF8String bytes — no java
    // String materializes); every gram key below is a long-mix of these
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      // tokenizer output never contains nulls; defend as empty word
      val u = if (tokens.isNullAt(i)) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
              else tokens.getUTF8String(i)
      hs(i) = GramTable.hashToken(u)
      i += 1
    }
    var tri = 0L; var bi = 0L; var uni = 0L; var unk = 0L
    var logscore = 0.0
    // pairH = hash of the bigram (t(i-1), t(i)) — doubles as the NEXT
    // position's trigram context, so each pair mixes exactly once
    var prevPairH = 0L
    i = 0
    while (i < n) {
      var s = 0 // levels backed off from the longest available context
      var p = -1.0
      val pairH = if (i >= 1) GramTable.combine(hs(i - 1), hs(i)) else 0L
      if (i >= 2) {
        val c3 = model.tri.get(GramTable.combine(prevPairH, hs(i)))
        if (c3 > 0L) {
          val c2 = model.bi.get(prevPairH)
          if (c2 > 0L) { p = c3.toDouble / c2.toDouble; tri += 1L }
        }
        if (p < 0.0) s += 1
      }
      if (p < 0.0 && i >= 1) {
        val c2 = model.bi.get(pairH)
        if (c2 > 0L) {
          val c1 = model.uni.get(hs(i - 1))
          if (c1 > 0L) { p = c2.toDouble / c1.toDouble; bi += 1L }
        }
        if (p < 0.0) s += 1
      }
      if (p < 0.0) {
        val c1 = model.uni.get(hs(i))
        if (c1 > 0L) { p = c1.toDouble / model.totalTokens.toDouble; uni += 1L }
        else { p = 1.0 / (model.totalTokens.toDouble + 1.0); unk += 1L }
      }
      logscore += math.log10(p) + s * NgramLmScore.Log10Alpha
      prevPairH = pairH
      i += 1
    }
    InternalRow(n.toLong, tri, bi, uni, unk, logscore)
  }

  override def nullSafeEval(v: Any): Any = score(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramLm", this, classOf[NgramLmScore].getName)
    nullSafeCodeGen(ctx, ev, toks => s"${ev.value} = $ref.score($toks);")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}

object NgramLmScore {
  /** Brants et al.'s backoff multiplier α = 0.4, applied in log space. */
  val Alpha = 0.4
  val Log10Alpha: Double = math.log10(Alpha)

  val schema: StructType = StructType(Seq(
    StructField("n_pos", LongType, nullable = false),
    StructField("tri_hits", LongType, nullable = false),
    StructField("bi_hits", LongType, nullable = false),
    StructField("uni_hits", LongType, nullable = false),
    StructField("unk", LongType, nullable = false),
    StructField("logscore", DoubleType, nullable = false)))
}
