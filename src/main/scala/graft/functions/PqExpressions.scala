package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou, Douze, Schmid 2011 — "Product
  * Quantization for Nearest Neighbor Search", IEEE TPAMI 33(1)): the
  * compression plane that makes billion-vector ANN feasible. A D-dim
  * float vector (D·4 bytes) becomes M sub-space centroid codes (M small
  * ints — 32× smaller at the 64-dim/8-subspace/16-centroid defaults), and
  * query-time scoring is M table lookups instead of D multiplies.
  *
  * Both kernels are pure per-row scan expressions with the
  * codebooks/tables riding as reference objects (codebooks are
  * M·K·(D/M) floats — KBs): encoding a 100 TB corpus and ADC-scoring its
  * candidate slices are shuffle-free maps.
  */

/** vec (array&lt;float&gt;, dim = M·subDim) → array&lt;int&gt; of M codes:
  * per subspace, the L2-nearest codebook centroid (ties → lowest code,
  * deterministic). Null vector → null; a dimension mismatch refuses
  * loudly (silent truncation would corrupt every downstream distance). */
case class PqEncode(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    codebooks: Array[Array[Array[Float]]])
  extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_encode: empty codebooks")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode expects array<float>, got $other")
    }

  @transient private lazy val subDims: Array[Int] = codebooks.map(_.head.length)
  @transient private lazy val dim: Int = subDims.sum

  def encode(vec: ArrayData): GenericArrayData = {
    val n = vec.numElements()
    require(n == dim,
      s"pq_encode: vector of dim $n does not match codebook dim $dim")
    val out = new Array[Int](codebooks.length)
    var off = 0
    var m = 0
    while (m < codebooks.length) {
      val book = codebooks(m)
      val sd = subDims(m)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var i = 0
        while (i < sd) {
          val diff = vec.getFloat(off + i) - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c } // strict <: ties keep lowest
        c += 1
      }
      out(m) = best
      off += sd
      m += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, vec => s"${ev.value} = $ref.encode($vec);")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}

/** codes (array&lt;int&gt;, length M) → the asymmetric-distance-computation
  * inner product Σₘ table(m)(code): `table(m)(c)` holds the query
  * sub-vector's dot product with codebook centroid c of subspace m,
  * precomputed once per query on the driver. Summation runs in subspace
  * order — deterministic. An out-of-range code refuses loudly (it means
  * codes and codebooks are from different trainings). */
case class PqAdcDot(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    table: Array[Array[Double]])
  extends UnaryExpression {

  require(table.nonEmpty, "pq_adc: empty table")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc expects array<int> codes, got $other")
    }

  def score(codes: ArrayData): Double = {
    require(codes.numElements() == table.length,
      s"pq_adc: ${codes.numElements()} codes for ${table.length} subspaces")
    var s = 0.0
    var m = 0
    while (m < table.length) {
      val c = codes.getInt(m)
      require(c >= 0 && c < table(m).length,
        s"pq_adc: code $c out of range for subspace $m (${table(m).length} centroids)")
      s += table(m)(c)
      m += 1
    }
    s
  }

  override def nullSafeEval(v: Any): Any = score(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcDot].getName)
    defineCodeGen(ctx, ev, codes => s"$ref.score($codes)")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}

/** (codes array&lt;int&gt;, query array&lt;float&gt;) → the ADC inner product
  * computed DIRECTLY from the codebooks: Σₘ dot(book(m)(code(m)),
  * q_slice(m)) — the battery-as-data twin of [[PqAdcDot]], whose
  * per-query driver-built table is only affordable for driver-sized
  * batteries. Per-subspace dots accumulate in index order and sum in
  * subspace order, exactly how the driver builds each table entry and
  * [[PqAdcDot]] folds them — the two forms are bit-identical. A query
  * whose dim does not match the codebooks, or an out-of-range code
  * (codes and codebooks from different trainings), refuses loudly. */
case class PqAdcDirect(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression,
    codebooks: Array[Array[Array[Float]]])
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_adc_direct: empty codebooks")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc_direct expects (array<int> codes, array<float> query), got $other")
    }

  @transient private lazy val subDims: Array[Int] = codebooks.map(_.head.length)
  @transient private lazy val dim: Int = subDims.sum

  def score(codes: ArrayData, q: ArrayData): Double = {
    require(codes.numElements() == codebooks.length,
      s"pq_adc_direct: ${codes.numElements()} codes for ${codebooks.length} subspaces")
    require(q.numElements() == dim,
      s"pq_adc_direct: query of dim ${q.numElements()} does not match codebook dim $dim")
    var s = 0.0
    var off = 0
    var m = 0
    while (m < codebooks.length) {
      val book = codebooks(m)
      val sd = subDims(m)
      val c = codes.getInt(m)
      require(c >= 0 && c < book.length,
        s"pq_adc_direct: code $c out of range for subspace $m (${book.length} centroids)")
      val cent = book(c)
      var t = 0.0
      var i = 0
      while (i < sd) { t += q.getFloat(off + i).toDouble * cent(i).toDouble; i += 1 }
      s += t
      off += sd
      m += 1
    }
    s
  }

  override def nullSafeEval(codes: Any, q: Any): Any =
    score(codes.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcDirect", this, classOf[PqAdcDirect].getName)
    defineCodeGen(ctx, ev, (codes, q) => s"$ref.score($codes, $q)")
  }

  override protected def withNewChildrenInternal(
      newLeft: org.apache.spark.sql.catalyst.expressions.Expression,
      newRight: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(left = newLeft, right = newRight)
}
