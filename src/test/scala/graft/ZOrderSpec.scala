package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side reference Morton interleave: bit b of col i → bit b*k+i. */
  private def zRef(vals: Seq[Long], bits: Int): Long =
    (for { (v, i) <- vals.zipWithIndex; b <- 0 until bits }
      yield ((v >> b) & 1L) << (b * vals.size + i)).reduce(_ | _)

  test("interleaveBits matches the reference Morton curve") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (170L, 85L), (3L, 200L))
    val got = rows.toDF("x", "y")
      .select(ZOrder.interleaveBits(Seq(col("x"), col("y")), 8).as("z"))
      .as[Long].collect().toSeq
    assert(got == rows.map { case (x, y) => zRef(Seq(x, y), 8) })
    // 3 dimensions too
    val got3 = Seq((5L, 9L, 2L)).toDF("a", "b", "c")
      .select(ZOrder.interleaveBits(Seq(col("a"), col("b"), col("c")), 4).as("z"))
      .as[Long].head()
    assert(got3 == zRef(Seq(5L, 9L, 2L), 4))
  }

  test("gridCell is exact integer math with clamping") {
    val got = Seq(-5L, 0L, 1023L, 1024L, 262143L, 999999999L).toDF("x")
      .select(ZOrder.gridCell(col("x"), 0L, 262143L, 8).as("c"))
      .as[Long].collect().toSeq
    // cell = x * 256 div 262144 = x div 1024, clamped to [0, 255]
    assert(got == Seq(0L, 0L, 0L, 1L, 255L, 255L))
  }

  test("gridCell refuses overflow-prone fixed bounds; layout pre-shifts wide ranges") {
    // (hi-lo)*2^bits must fit a long — fixed-bounds callers get a loud error
    val e = intercept[IllegalArgumentException] {
      ZOrder.gridCell(col("x"), Long.MinValue, Long.MaxValue - 1, 16)
    }
    assert(e.getMessage.contains("overflows"), e.getMessage)
    // normalizeToGrid handles the same range itself: z-ordering hashed ids
    // spanning the full long domain must produce in-range cells, not garbage
    val hashed = (1 to 512).map(i => (i.toLong, s"k$i")).toDF("id", "k")
      .select(col("id"), xxhash64(col("k")).as("h1"), xxhash64(col("k"), lit(7)).as("h2"))
    val (withCells, gridCols) = ZOrder.normalizeToGrid(hashed, Seq("h1", "h2"), bits = 8)
    val cells = withCells.select(gridCols: _*).collect()
    assert(cells.length == 512)
    cells.foreach { r =>
      (0 until 2).foreach { i =>
        val c = r.getLong(i); assert(c >= 0 && c < 256, s"cell $c out of grid")
      }
    }
    // and cells actually spread across the grid (not collapsed by the shift)
    val distinct0 = cells.map(_.getLong(0)).distinct.length
    assert(distinct0 > 100, s"only $distinct0 distinct cells")
    // full layout over the hashed dims runs end to end
    assert(ZOrder.layout(hashed, Seq("h1", "h2"), bits = 8, numPartitions = 4)
      .count() == 512)
  }

  test("empty or all-null input takes the degenerate grid branch, no silent 0-unboxing") {
    // empty: min/max are NULL — must short-circuit, not unbox null to 0L
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ZOrder.layout(empty, Seq("a", "b"), bits = 8).count() == 0)
    // all-null column alongside a live one: null dims collapse to cell 0,
    // the row still flows through layout
    val nulls = spark.sql("SELECT * FROM VALUES (CAST(NULL AS LONG), 1L), (NULL, 5L) AS t(a, b)")
    val laid = ZOrder.layout(nulls, Seq("a", "b"), bits = 8)
    assert(laid.count() == 2)
  }

  test("layout clusters both dimensions: per-partition spread shrinks, one range shuffle") {
    val l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val laid = ZOrder.layout(l, Seq("l_partkey", "l_suppkey"), bits = 8, numPartitions = 8)
    // the layout's only shuffle is the range partitioning on the curve key
    val plan = laid.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange rangepartitioning"), plan.take(2000))
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
    // scaffolding columns are gone
    assert(laid.columns.toSeq == l.columns.toSeq)

    val spread = laid
      .groupBy(spark_partition_id().as("p"))
      .agg((max("l_partkey") - min("l_partkey")).as("sp"),
        (max("l_suppkey") - min("l_suppkey")).as("ss"),
        count(lit(1)).as("n"))
      .collect()
    assert(spread.length == 8)
    val bounds = l.agg((max("l_partkey") - min("l_partkey")).as("gp"),
      (max("l_suppkey") - min("l_suppkey")).as("gs")).head()
    val (gp, gs) = (bounds.getLong(0).toDouble, bounds.getLong(1).toDouble)
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    val mp = mean(spread.map(_.getAs[Long]("sp").toDouble).toSeq)
    val ms = mean(spread.map(_.getAs[Long]("ss").toDouble).toSeq)
    // a single-column sort would leave one dimension at ~full spread in
    // every partition; the curve must shrink BOTH on average
    assert(mp < gp * 0.75, s"partkey mean spread $mp vs global $gp")
    assert(ms < gs * 0.75, s"suppkey mean spread $ms vs global $gs")
  }
}
