package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row term-frequency vector: token array → `array<int>` of occurrence
  * counts for a FIXED term list (the query vocabulary of a BM25 batch —
  * [[graft.operators.KeywordSearch]]). One pass over the row's tokens,
  * UTF8String byte comparison against the term table (query vocabularies
  * are a handful of terms, so a linear probe beats hash overhead), zero
  * shuffle, codegen'd via the shared reference-object pattern.
  *
  * A higher-order `transform(terms, t -> size(filter(tokens, ...)))` would
  * compute the same vector but interpreted AND with a full tokens pass per
  * term — the classifier-kernel lesson (r10: ~90× on the corpus scan). */
case class TermCounts(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    terms: Seq[String])
  extends UnaryExpression {

  require(terms.nonEmpty, "term_counts: empty term list")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"term_counts expects array<string> tokens, got $other")
    }

  @transient private lazy val termBytes: Array[UTF8String] =
    terms.map(UTF8String.fromString).toArray

  def count(tokens: ArrayData): GenericArrayData = {
    val out = new Array[Int](termBytes.length)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        var j = 0
        while (j < termBytes.length) {
          if (termBytes(j).equals(t)) out(j) += 1
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = count(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("termCounts", this, classOf[TermCounts].getName)
    nullSafeCodeGen(ctx, ev, toks => s"${ev.value} = $ref.count($toks);")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}
