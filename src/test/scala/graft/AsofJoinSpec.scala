package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsofJoin, SkewJoin}

class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("as-of join carries the latest right row at or before each left time") {
    val trades = Seq(
      ("A", 10L, "t1"), ("A", 20L, "t2"), ("A", 5L, "t0"),
      ("B", 15L, "t3"),
    ).toDF("sym", "ts", "trade")
    val quotes = Seq(
      ("A", 8L, 1.0), ("A", 10L, 2.0), ("A", 18L, 3.0),
      ("B", 99L, 9.0),
    ).toDF("sym", "ts", "px")
    val out = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "ts", "ts",
      Seq("px" -> "px", "ts" -> "quote_ts"))
      .orderBy("sym", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("A", 5L, null),      // no quote at or before 5
      ("A", 10L, 2.0),      // exact-time quote wins (<=)
      ("A", 20L, 3.0),      // latest of {8,10,18}
      ("B", 15L, null),     // B's only quote is later
    ))
  }

  test("salted join is row-identical to the plain join") {
    val left = Seq((1, "x"), (1, "y"), (2, "z"), (3, "w")).toDF("k", "lv")
    val right = Seq((1, 10), (1, 11), (2, 20)).toDF("k", "rv")
    val plain  = left.join(right, Seq("k")).orderBy("k", "lv", "rv").collect().toSeq
    val salted = SkewJoin.saltedJoin(left, right, Seq("k"), saltFactor = 4)
      .orderBy("k", "lv", "rv").collect().toSeq
    assert(salted == plain)
    // left_outer preserves unmatched rows too
    val plainL  = left.join(right, Seq("k"), "left_outer").orderBy("k", "lv", "rv").collect().toSeq
    val saltedL = SkewJoin.saltedJoin(left, right, Seq("k"), 4, "left_outer")
      .orderBy("k", "lv", "rv").collect().toSeq
    assert(saltedL == plainL)
  }
}
