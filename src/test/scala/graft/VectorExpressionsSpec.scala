package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._
import graft.operators.Similarity

class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val df = Seq(
    (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
  ).toDF("a", "b")

  test("vec_dot matches the lambda fold bit-for-bit") {
    val rows = df.select(vec_dot(col("a"), col("b")).as("native"),
      Similarity.dot(col("a"), col("b")).as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows(0).getDouble(0) == 32.0)
    assert(rows(1).getDouble(0) == 0.0)
  }

  test("vec_cosine matches the lambda formulation bit-for-bit") {
    val rows = df.select(vec_cosine(col("a"), col("b")).as("native"),
      Similarity.cosine(col("a"), col("b")).as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows(1).getDouble(0) == 0.0)
  }

  test("registered for SQL") {
    register(spark)
    df.createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT vec_dot(a, b) FROM vecs ORDER BY 1 DESC LIMIT 1").collect()(0)
    assert(r.getDouble(0) == 32.0)
  }

  test("null inputs are null, real embeddings sane") {
    val withNull = Seq((Seq(1.0f), null.asInstanceOf[Seq[Float]])).toDF("a", "b")
    assert(withNull.select(vec_cosine(col("a"), col("b"))).collect()(0).isNullAt(0))
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(10)
    val self = e.select(vec_cosine(col("embedding"), col("embedding"))).as[Double].collect()
    self.foreach(v => assert(math.abs(v - 1.0) < 1e-6))
  }
  test("nearest_cells ranks degenerate (zero-norm) cells last, not first (r14)") {
    // a zero-norm centroid's cosine is 0/0 = NaN; Double.compare ranks
    // NaN GREATEST, so an unguarded argmax would probe the degenerate
    // cell before every real one. The kernel maps NaN to -Inf: real
    // cells first (cosine desc), degenerate cells last (ties on index) —
    // eval and codegen agree, and a zero-norm QUERY (all cells NaN)
    // degrades to index order.
    val cents = Array(
      Array(0.0f, 0.0f),   // degenerate cell 0
      Array(1.0f, 0.0f),   // cell 1
      Array(0.0f, 1.0f))   // cell 2
    val vecs = Seq(Seq(1.0f, 0.1f), Seq(0.0f, 0.0f)).toDF("v")
    val got = vecs.select(nearest_cells(col("v"), cents, 3).as("c"))
      .collect().map(_.getAs[scala.collection.Seq[Int]](0).toList).toList
    assert(got == List(List(1, 2, 0), List(0, 1, 2)), got)
    // interpreted eval agrees with the codegen'd path
    val lit1 = graft.functions.NearestCells(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0f, 0.1f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)), cents, 3)
    val evald = lit1.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray().toList
    assert(evald == List(1, 2, 0), evald)
  }
}
