package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binned interval join equals the naive non-equi join") {
    val intervals = Seq((1L, 10L, 25L), (2L, 30L, 31L), (3L, 0L, 100L))
      .toDF("iid", "s", "e")
    val points = (0L until 100L by 3L).map(p => (p, s"p$p")).toDF("p", "tag")
    for (width <- Seq(1L, 7L, 64L)) {
      val binned = RangeJoin.binnedIntervalJoin(intervals, points, "s", "e", "p", width)
        .select("iid", "p").orderBy("iid", "p").collect().map(r => (r.getLong(0), r.getLong(1)))
      val naive = intervals.join(points, $"p" >= $"s" && $"p" < $"e")
        .select("iid", "p").orderBy("iid", "p").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(binned.toSeq == naive.toSeq, s"binWidth=$width")
    }
  }

  test("bin boundaries are exact at epoch-micros scale (div, not double division)") {
    val day = 86400L * 1000000L
    val t0  = 1704067200000000L // 2024-01-01 in µs — beyond double's exact int range /7d
    val intervals = Seq((1L, t0, t0 + 7 * day)).toDF("iid", "s", "e")
    val points = Seq(
      (t0 - 1, "before"), (t0, "at_start"), (t0 + 7 * day - 1, "last_in"),
      (t0 + 7 * day, "at_end"),
    ).toDF("p", "tag")
    val got = RangeJoin.binnedIntervalJoin(intervals, points, "s", "e", "p", 7 * day)
      .select("tag").as[String].collect().toSet
    assert(got == Set("at_start", "last_in"))
  }

  test("equality keys tighten the candidate bins") {
    val intervals = Seq(("a", 1L, 0L, 10L), ("b", 2L, 0L, 10L)).toDF("k", "iid", "s", "e")
    val points    = Seq(("a", 5L), ("b", 6L), ("c", 7L)).toDF("k", "p")
    val out = RangeJoin.binnedIntervalJoin(intervals, points, "s", "e", "p", 4L, keys = Seq("k"))
      .select("iid", "p").orderBy("iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 5L), (2L, 6L)))
  }
}
