package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native scoring kernel for the fastText-style linear classifier
  * ([[graft.operators.TextClassifier]], arXiv:1607.01759).
  *
  * Semantically IDENTICAL to the declarative formulation it replaced
  * (`aggregate(grams, bias, acc + element_at(w, fid+1))` with
  * fid = `conv(substring(md5(gram),1,4),16,10) % dim`): the first 4 hex
  * digits of an md5 are exactly the first 2 digest BYTES big-endian, the
  * accumulator is the same exact integer sum (order-free), and grams are
  * the same unigrams + space-joined bigrams over the tokenizer's output —
  * so every output bit, and therefore every DuckDB oracle hash, is
  * unchanged.
  *
  * Why native: Catalyst evaluates higher-order-function lambdas by
  * interpretation — per gram that meant an interpreted md5-to-hex, a
  * base-16 `conv` string parse and boxed arithmetic, ~100 µs/gram in the
  * bench (60 s for the sf0.1 corpus scan). This kernel hashes the gram's
  * UTF-8 bytes directly (bigrams as `update(prev); update(' ');
  * update(cur)` — no concatenated string either) inside whole-stage
  * codegen: the same scan runs in well under a second. At 100 TB the
  * difference is the filter being a real one-pass scan versus the
  * cluster burning ~100× the cores on hex strings.
  *
  * Output struct: (n_features, logit, label) — [[graft.operators
  * .TextClassifier.scoreStruct]]'s shape. The weight vector lives in the
  * expression (≤ 65,536 ints = 256 KB by the MaxDim contract — far below
  * any plan-size concern, unlike the LM maps).
  */
case class HashedLinearScore(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    weights: Array[Int],
    biasNum: Int,
    addBigrams: Boolean)
  extends UnaryExpression {

  override def dataType: DataType = HashedLinearScore.schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hashed_linear_score expects array<string> tokens, got $other")
    }

  private def fid(md: MessageDigest): Int = {
    val d = md.digest()
    (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % weights.length
  }

  def score(tokens: ArrayData): InternalRow = {
    val md = HashedLinearScore.digests.get()
    val n = tokens.numElements()
    var num: Long = biasNum.toLong
    var feats: Long = 0L
    var prev: Array[Byte] = null
    var i = 0
    while (i < n) {
      // tokenizer output never contains nulls; defend as empty bytes
      val cur =
        if (tokens.isNullAt(i)) Array.emptyByteArray
        else tokens.getUTF8String(i).getBytes
      md.reset()
      md.update(cur)
      num += weights(fid(md))
      feats += 1L
      if (addBigrams && prev != null) {
        md.reset()
        md.update(prev)
        md.update(' '.toByte)
        md.update(cur)
        num += weights(fid(md))
        feats += 1L
      }
      prev = cur
      i += 1
    }
    InternalRow(feats, num.toDouble / 128.0, num > 0L)
  }

  override def nullSafeEval(v: Any): Any = score(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashedLinear", this, classOf[HashedLinearScore].getName)
    nullSafeCodeGen(ctx, ev, toks => s"${ev.value} = $ref.score($toks);")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}

object HashedLinearScore {
  /** MessageDigest is stateful and not thread-safe; one per task thread. */
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  val schema: StructType = StructType(Seq(
    StructField("n_features", LongType, nullable = false),
    StructField("logit", DoubleType, nullable = false),
    StructField("label", BooleanType, nullable = false)))
}
