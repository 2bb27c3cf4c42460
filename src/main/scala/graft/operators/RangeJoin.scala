package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable interval/range join: points joined into intervals.
  *
  * Spark plans a pure non-equi join as a broadcast-nested-loop — quadratic
  * and driver-killing at scale. The standard distributed shape is binning:
  * explode each interval into the fixed-width bins it covers, map each
  * point to its bin, equality-join on the bin, then filter exact
  * containment. Cost: |intervals|·(span/binWidth) + |points| rows through
  * one hash join — linear, shuffle on small keys, AQE-skew-safe.
  *
  * Pick `binWidth` near the typical interval span: too small explodes the
  * interval side, too large inflates candidate pairs.
  */
object RangeJoin {

  /** Join `points` (with `pointCol`) into `intervals` [startCol, endCol)
    * half-open. Optional shared equality keys tighten the bins.
    * All three columns must be numeric (cast timestamps to epoch first).
    */
  def binnedIntervalJoin(
      intervals: DataFrame,
      points: DataFrame,
      startCol: String,
      endCol: String,
      pointCol: String,
      binWidth: Long,
      keys: Seq[String] = Nil,
  ): DataFrame = {
    // integer `div`, not double `/` — epoch-scale longs lose precision in
    // double division right at bin boundaries
    val binned = intervals.withColumn("__bin",
      explode(sequence(
        expr(s"$startCol div $binWidth"),
        expr(s"($endCol - 1) div $binWidth"))))
    val binnedPoints = points.withColumn("__bin", expr(s"$pointCol div $binWidth"))
    binned
      .join(binnedPoints, keys :+ "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }
}
