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

  /** @param rightValues (rightColumn, outputName) pairs carried onto left rows
    *
    * The right payload travels as ONE struct and the running
    * `last(ignoreNulls)` carries that struct — never the columns
    * individually. Per-column carries would (a) resurrect an OLDER row's
    * value wherever the latest right row holds a genuine NULL (ignoreNulls
    * can't tell a null payload from the left-side filler nulls) and
    * (b) tear the payload across different right rows. The struct is null
    * exactly on left rows, so ignoreNulls skips only fillers, and the
    * carried value is always one intact right row. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValues: Seq[(String, String)],
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val rpay     = struct(rightValues.map { case (src, out) => col(src).as(out) }: _*)
    val rpayType = right.select(rpay.as("__rpay")).schema("__rpay").dataType

    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__tag"), rpay.as("__rpay")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)): _*)

    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__tag"),
          lit(null).cast(rpayType).as("__rpay")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)

    taggedRight.unionByName(taggedLeft)
      .withColumn("__carried", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        rightValues.map { case (_, out) => col(s"__carried.$out").as(out) }: _*)
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
    // hash() rejects MapType columns — salt from the hashable ones only.
    // NOTE: byte-identical duplicate left rows necessarily share a salt
    // (any deterministic function of the row does that; a random salt in a
    // shuffle key breaks task-retry idempotence) — pre-dedup exact copies
    // if the hot key's rows are literal duplicates.
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val saltSrc = left.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    val saltedLeft = left.withColumn("__salt",
      pmod(hash((if (saltSrc.nonEmpty) saltSrc else Array(lit(0))).toIndexedSeq: _*),
        lit(saltFactor)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft
      .join(saltedRight, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
