package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native kernels for DSIR-style importance resampling
  * ([[graft.operators.Dsir]], arXiv:2302.03169): hashed unigram+bigram
  * bucket features over the house tokenizer's output.
  *
  * Both kernels hash each gram's UTF-8 bytes with md5 and take the FIRST
  * 12 BITS of the digest as the bucket — exactly the value of the first
  * three hex characters of `md5(gram)`, so a DuckDB oracle reproduces
  * every bucket with `ascii`-arithmetic on `substring(md5(g), 1, 3)`
  * (the [[HashedLinearScore]] / portable-md5-bucket convention; xxhash64
  * would be faster but is not computable in the oracle engine). Gram
  * order is the classifier's interleaved walk: u₁, u₂, b₁₂, u₃, b₂₃, … —
  * the order the score's float sum runs in, which the oracle mirrors as
  * an ordered `list_reduce` fold (left-to-right per-term sums are the
  * only cross-engine-deterministic float sums).
  *
  * Why native: a declarative explode + md5 + conv formulation is
  * interpreted per gram in the scoring scan (the classifier's ~90×
  * lesson); these kernels hash gram bytes directly (bigrams as
  * `update(prev); update(' '); update(cur)` — no concatenated string)
  * inside whole-stage codegen. */
object DsirHash {
  /** MessageDigest is stateful and not thread-safe; one per task thread. */
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Fixed bucket count: 4096 = the value space of md5's first 3 hex
    * chars, so no modulo is needed on either engine. */
  val Buckets = 4096

  def digest(): MessageDigest = digests.get()

  /** First 12 bits of the digest = value of the first 3 hex chars. */
  def bucket(md: MessageDigest): Int = {
    val d = md.digest()
    ((d(0) & 0xff) << 4) | ((d(1) & 0xff) >>> 4)
  }
}

/** Per-doc gram bucket ids in the interleaved walk order — the training
  * side: `explode` + count by bucket gives the corpus's hashed-feature
  * histogram with ONE scan and a ≤4096-row-per-partition shuffle. */
case class DsirBuckets(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dsir_buckets expects array<string> tokens, got $other")
    }

  def compute(tokens: ArrayData): ArrayData = {
    val md = DsirHash.digest()
    val n = tokens.numElements()
    val out = new Array[Int](if (n == 0) 0 else 2 * n - 1)
    var k = 0
    var prev: Array[Byte] = null
    var i = 0
    while (i < n) {
      val cur =
        if (tokens.isNullAt(i)) Array.emptyByteArray
        else tokens.getUTF8String(i).getBytes
      md.reset(); md.update(cur)
      out(k) = DsirHash.bucket(md); k += 1
      if (prev != null) {
        md.reset(); md.update(prev); md.update(' '.toByte); md.update(cur)
        out(k) = DsirHash.bucket(md); k += 1
      }
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirBuckets", this, classOf[DsirBuckets].getName)
    nullSafeCodeGen(ctx, ev, toks => s"${ev.value} = $ref.compute($toks);")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}

/** Per-doc importance score: the left-to-right sum of per-bucket log-ratio
  * weights over the interleaved gram walk (bit-reproducible by an ordered
  * fold on the oracle side), plus the integer gram count. The weight
  * table lives in the expression — 4096 doubles = 32 KB, far below any
  * plan-size concern (unlike the LM maps that moved to a broadcast). */
case class DsirScore(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    weights: Array[Double])
  extends UnaryExpression {

  require(weights.length == DsirHash.Buckets,
    s"dsir_score expects ${DsirHash.Buckets} bucket weights, got ${weights.length}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dsir_score expects array<string> tokens, got $other")
    }

  def compute(tokens: ArrayData): InternalRow = {
    val md = DsirHash.digest()
    val n = tokens.numElements()
    var sum = 0.0
    var grams = 0L
    var prev: Array[Byte] = null
    var i = 0
    while (i < n) {
      val cur =
        if (tokens.isNullAt(i)) Array.emptyByteArray
        else tokens.getUTF8String(i).getBytes
      md.reset(); md.update(cur)
      sum += weights(DsirHash.bucket(md)); grams += 1L
      if (prev != null) {
        md.reset(); md.update(prev); md.update(' '.toByte); md.update(cur)
        sum += weights(DsirHash.bucket(md)); grams += 1L
      }
      prev = cur
      i += 1
    }
    InternalRow(grams, sum)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirScore", this, classOf[DsirScore].getName)
    nullSafeCodeGen(ctx, ev, toks => s"${ev.value} = $ref.compute($toks);")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}
