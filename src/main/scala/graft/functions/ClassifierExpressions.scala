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

  private[functions] def digest(): MessageDigest = digests.get()

  val schema: StructType = StructType(Seq(
    StructField("n_features", LongType, nullable = false),
    StructField("logit", DoubleType, nullable = false),
    StructField("label", BooleanType, nullable = false)))
}

/** Character n-grams of a string, by CHARACTER (code point) — the fastText
  * language-id feature family (Joulin et al. 2016; the CCNet recipe runs
  * langid on char n-grams before quality filtering). A text shorter than
  * `n` yields itself as one gram (it is still evidence); empty yields no
  * grams. Normalization (lowercase, whitespace collapse) stays DECLARATIVE
  * in the caller so the DuckDB oracle mirrors it; this kernel is the pure
  * window walk — native because Catalyst interprets higher-order-function
  * lambdas (a transform/substr fold costs ~100× in a corpus scan). */
case class CharGrams(child: org.apache.spark.sql.catalyst.expressions.Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1, s"char_grams: n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_grams expects a string, got $other")
    }

  def grams(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val len = s.numChars()
    if (len == 0)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    else if (len < n)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](s))
    else {
      val out = new Array[Any](len - n + 1)
      var i = 0
      while (i <= len - n) { out(i) = s.substring(i, i + n); i += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override def nullSafeEval(v: Any): Any =
    grams(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charGrams", this, classOf[CharGrams].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.grams($s);")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}

/** K linear models scored in ONE pass over a gram array: each gram hashes
  * ONCE (the md5-hex4 feature contract of [[HashedLinearScore]], same
  * digest-byte form), then indexes every class's weight table — the
  * one-vs-rest language-id scorer's kernel, where hashing K times for K
  * classes would multiply the dominant cost. Output: array<double> of K
  * logits, each the exact dyadic `(Σ w_k + bias_k)/128`, so downstream
  * argmax decisions are bit-deterministic in any engine. Unigram features
  * only (char-gram callers build the windows upstream). */
case class HashedLinearScoreMulti(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    weights: Array[Array[Int]],
    biasNums: Array[Int])
  extends UnaryExpression {

  require(weights.nonEmpty && weights.length == biasNums.length,
    s"hashed_linear_score_multi: ${weights.length} weight tables, ${biasNums.length} biases")
  require(weights.forall(_.length == weights.head.length),
    "hashed_linear_score_multi: weight tables must share one dimension")
  require(weights.head.length > 0 && weights.head.length <= 65536,
    s"hashed_linear_score_multi: dim ${weights.head.length} outside (0, 65536] — " +
      "4 md5 hex digits address at most 65,536 features (and % 0 would crash per row)")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hashed_linear_score_multi expects array<string> grams, got $other")
    }

  def score(tokens: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val md = HashedLinearScore.digest()
    val k = weights.length
    val dim = weights.head.length
    val nums = new Array[Long](k)
    var c = 0
    while (c < k) { nums(c) = biasNums(c).toLong; c += 1 }
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val cur =
        if (tokens.isNullAt(i)) Array.emptyByteArray
        else tokens.getUTF8String(i).getBytes
      md.reset()
      md.update(cur)
      val d = md.digest()
      val fid = (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % dim
      c = 0
      while (c < k) { nums(c) += weights(c)(fid); c += 1 }
      i += 1
    }
    val out = new Array[Double](k)
    c = 0
    while (c < k) { out(c) = nums(c).toDouble / 128.0; c += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = score(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("multiScore", this, classOf[HashedLinearScoreMulti].getName)
    nullSafeCodeGen(ctx, ev, toks => s"${ev.value} = $ref.score($toks);")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}
