package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (point-in-time lookup): for each left row, the
  * latest right row with `rightTime <= leftTime` within the same key group.
  *
  * Spark has no native as-of join; the classic cross/range formulation
  * explodes. This implementation is the scalable union-and-carry shape:
  * tag both sides, union, ONE shuffle+sort on (keys, time, tag), then a
  * running `last(..., ignoreNulls)` window carries the most recent right
  * payload forward onto left rows. Cost = one sort-shuffle of |L|+|R| —
  * no row multiplication, survives 100 TB where a range join won't.
  *
  * Right side must be unique per (keys, rightTime) — pre-aggregate ties
  * (the tie rows would otherwise carry nondeterministically).
  */
object AsofJoin {

  /** @param rightValues (rightColumn, outputName) pairs carried onto left rows */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValues: Seq[(String, String)],
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload  = rightValues.map { case (src, out) => (src, s"__rv_$out", out) }

    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__tag")) ++
        payload.map { case (src, tmp, _) => col(src).as(tmp) } ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*)

    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__tag")) ++
        payload.map { case (_, tmp, _) => lit(null).as(tmp) } ++
        leftCols.filterNot(keys.contains).map(col): _*)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)

    val carried = payload.foldLeft(taggedRight.unionByName(taggedLeft)) {
      case (df, (_, tmp, out)) => df.withColumn(out, last(col(tmp), ignoreNulls = true).over(w))
    }

    carried
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) ++ payload.map { case (_, _, out) => col(out) }: _*)
  }
}

/** Skew-handling equality join via key salting.
  *
  * The hot-key problem: a shuffled join on a skewed key sends one key's
  * rows to one reducer. Salting splits each left row across `saltFactor`
  * sub-keys deterministically (hash of the full row, no RNG — replayable),
  * and replicates each right row to all `saltFactor` sub-keys, so the hot
  * key's work spreads over `saltFactor` reducers. Result is row-for-row
  * identical to the plain join (each left row matches its right rows under
  * exactly one salt value).
  *
  * Use when AQE's skew-join splitting isn't available (e.g. non-AQE plans,
  * aggregations after the join needing a stable partitioning).
  */
object SkewJoin {

  private val saltableJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti")

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltFactor: Int = 8,
      joinType: String = "inner",
  ): DataFrame = {
    // Right/full outer would emit each unmatched right row once per salt
    // (the right side is replicated saltFactor times); only join types whose
    // output rows are driven by the left side preserve plain-join semantics.
    require(saltableJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left join types only, got '$joinType' " +
        "(right/full outer would duplicate unmatched right rows per salt)")
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(saltFactor)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft
      .join(saltedRight, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
