package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math.
  *
  * Spark's lambda route (`aggregate(zip_with(...))`) evaluates interpreted —
  * outside whole-stage codegen — which dominates brute-force similarity
  * scans. These expressions generate a tight primitive loop instead: one
  * pass, three accumulators, no per-element boxing. Fold order is ascending
  * index, bit-identical to the sequential `aggregate` fold they replace (and
  * to the DuckDB `list_reduce` oracle).
  */
case class FloatVecCosine(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_cosine expects (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var xy = 0.0; var xx = 0.0; var yy = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      xy += xi * yi; xx += xi * xi; yy += yi * yi
      i += 1
    }
    xy / (math.sqrt(xx) * math.sqrt(yy))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i  = ctx.freshName("i")
      val n  = ctx.freshName("n")
      val xy = ctx.freshName("xy")
      val xx = ctx.freshName("xx")
      val yy = ctx.freshName("yy")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $xy = 0.0; double $xx = 0.0; double $yy = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $xy += $xi * $yi; $xx += $xi * $xi; $yy += $yi * $yi;
         |}
         |${ev.value} = $xy / (java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product only — same codegen shape. */
case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  // same contract as FloatVecCosine — without it, array<double> input
  // passes analysis and getFloat() reinterprets half of each 8-byte slot:
  // silently garbage dot products
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var xy = 0.0; var i = 0
    while (i < n) { xy += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    xy
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Indices of the `nProbe` nearest centroids (cosine, descending; index
  * ascending on ties) for one vector — the shuffle-free IVF assignment
  * kernel. The centroid matrix rides along as a plan-embedded reference
  * object (the task-binary broadcast every literal uses), so assignment is a
  * per-row argmax *inside the scan*: no crossJoin row multiplication, no
  * corpus-wide window shuffle. Cosines are computed with exactly the
  * [[FloatVecCosine]] accumulation order, so for non-null vectors the
  * assignments are bit-identical to the join-based formulation this
  * replaces; NaN ordering matches Spark's sort (NaN greatest) via
  * `Double.compare`. Null-vector rows yield a null result (callers drop
  * them — the old join form assigned such rows an arbitrary first cell,
  * which was noise, not signal).
  *
  * Callers sort centroids before constructing this, so "index ascending"
  * reproduces the previous `ORDER BY sim DESC, cell ASC` tie-break.
  */
case class NearestCells(child: Expression, cents: Array[Array[Float]], nProbe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(cents.nonEmpty, "NearestCells needs at least one centroid")
  require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cells expects array<float>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v  = input.asInstanceOf[ArrayData]
    val n  = v.numElements()
    val nc = cents.length
    val sims = new Array[Double](nc)
    var c = 0
    while (c < nc) {
      val cent = cents(c)
      val m = math.min(n, cent.length)
      var xy = 0.0; var xx = 0.0; var yy = 0.0
      var j = 0
      while (j < m) {
        val xj = v.getFloat(j).toDouble
        val yj = cent(j).toDouble
        xy += xj * yj; xx += xj * xj; yy += yj * yj
        j += 1
      }
      val s = xy / (math.sqrt(xx) * math.sqrt(yy))
      // a zero-norm vector or centroid has NO cosine (0/0 = NaN), and
      // Double.compare ranks NaN GREATEST — which would probe/assign the
      // degenerate cell FIRST. Rank it last (ties on -Inf keep the lowest
      // index, matching the driver-side probe loops' sentinel ordering).
      sims(c) = if (java.lang.Double.isNaN(s)) Double.NegativeInfinity else s
      c += 1
    }
    val k      = math.min(nProbe, nc)
    val chosen = new Array[Int](k)
    val used   = new Array[Boolean](nc)
    var p = 0
    while (p < k) {
      var best = -1
      var i = 0
      while (i < nc) {
        if (!used(i) && (best < 0 || java.lang.Double.compare(sims(i), sims(best)) > 0)) best = i
        i += 1
      }
      used(best) = true; chosen(p) = best
      p += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(chosen)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "float[][]")
    val nc       = cents.length
    val k        = math.min(nProbe, nc)
    // per-row scratch buffers hoisted to operator state: no per-row allocation
    val sims = ctx.addMutableState("double[]", "ncSims", v => s"$v = new double[$nc];")
    val used = ctx.addMutableState("boolean[]", "ncUsed", v => s"$v = new boolean[$nc];")
    nullSafeCodeGen(ctx, ev, a => {
      val n      = ctx.freshName("n")
      val c      = ctx.freshName("c")
      val cent   = ctx.freshName("cent")
      val m      = ctx.freshName("m")
      val j      = ctx.freshName("j")
      val xy     = ctx.freshName("xy")
      val xx     = ctx.freshName("xx")
      val yy     = ctx.freshName("yy")
      val xj     = ctx.freshName("xj")
      val yj     = ctx.freshName("yj")
      val p      = ctx.freshName("p")
      val i      = ctx.freshName("i")
      val best   = ctx.freshName("best")
      val chosen = ctx.freshName("chosen")
      s"""
         |int $n = $a.numElements();
         |for (int $c = 0; $c < $nc; $c++) {
         |  float[] $cent = $centsRef[$c];
         |  int $m = java.lang.Math.min($n, $cent.length);
         |  double $xy = 0.0; double $xx = 0.0; double $yy = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    double $xj = (double) $a.getFloat($j);
         |    double $yj = (double) $cent[$j];
         |    $xy += $xj * $yj; $xx += $xj * $xj; $yy += $yj * $yj;
         |  }
         |  double ${c}_s = $xy / (java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy));
         |  // zero-norm => NaN cosine: rank LAST, not first (NaN compares greatest)
         |  $sims[$c] = java.lang.Double.isNaN(${c}_s) ? java.lang.Double.NEGATIVE_INFINITY : ${c}_s;
         |}
         |java.util.Arrays.fill($used, false);
         |int[] $chosen = new int[$k];
         |for (int $p = 0; $p < $k; $p++) {
         |  int $best = -1;
         |  for (int $i = 0; $i < $nc; $i++) {
         |    if (!$used[$i] && ($best < 0 ||
         |        java.lang.Double.compare($sims[$i], $sims[$best]) > 0)) $best = $i;
         |  }
         |  $used[$best] = true; $chosen[$p] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($chosen);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Fused cosine similarity over two `array<float>` columns. */
  def vec_cosine(a: Column, b: Column): Column = column(FloatVecCosine(expression(a), expression(b)))

  /** Dot product over two `array<float>` columns. */
  def vec_dot(a: Column, b: Column): Column = column(FloatVecDot(expression(a), expression(b)))

  /** Top-`nProbe` nearest-centroid indices for an `array<float>` column;
    * `cents` rides to executors as a plan reference object. */
  def nearest_cells(vec: Column, cents: Array[Array[Float]], nProbe: Int): Column =
    column(NearestCells(expression(vec), cents, nProbe))

  /** Register for SQL use: `SELECT vec_cosine(a, b) FROM ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine", exprs => FloatVecCosine(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => FloatVecDot(exprs(0), exprs(1)), "scala_udf")
  }
}
