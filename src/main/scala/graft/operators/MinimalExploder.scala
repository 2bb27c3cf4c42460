package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Minimal multi-column explode (reference: intake_esm/utils.py:187-268).
  *
  * Array columns whose per-row length patterns are identical explode together
  * in ONE pass (zip semantics); columns with different patterns explode in
  * sequence (Cartesian). Polars `explode(a, b)` zips same-length lists — the
  * Spark equivalent is `explode(arrays_zip(a, b))` then field unpacking.
  *
  * Pattern-equality detection is a single distributed aggregate
  * (`bool_and(size(a) <=> size(b))` for each column pair) — O(k²) booleans in
  * one scan, no collect of the data itself. Grouping uses union-find on the
  * driver (pattern equality is an equivalence relation). At 100 TB this is
  * one pass over two ints per row per pair; the explodes themselves are
  * narrow (no shuffle).
  */
object MinimalExploder {

  def listColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect { case StructField(n, _: ArrayType, _, _) => n }.toSeq

  /** Columns grouped by identical per-row length pattern (utils.py:237-245).
    * Order of groups follows first appearance, like the reference's
    * insertion-ordered defaultdict.
    */
  def explodableGroups(df: DataFrame): Seq[Seq[String]] = {
    val cols = listColumns(df)
    if (cols.size <= 1) return cols.map(Seq(_))
    val pairs = cols.combinations(2).toSeq
    val aggs: Seq[Column] = pairs.map { case Seq(a, b) =>
      // 1 iff every row has size(a) == size(b) (null-safe); empty df → 1
      coalesce(min(when(size(col(a)) <=> size(col(b)), lit(1)).otherwise(lit(0))), lit(1))
    }
    // one distributed pass; result is |pairs| flags
    val row    = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val parent = scala.collection.mutable.Map(cols.map(c => c -> c): _*)
    def find(c: String): String = if (parent(c) == c) c else { val r = find(parent(c)); parent(c) = r; r }
    pairs.zipWithIndex.foreach { case (Seq(a, b), i) =>
      if (!row.isNullAt(i) && row.getInt(i) == 1) parent(find(a)) = find(b)
    }
    cols.groupBy(find).values.toSeq.sortBy(g => cols.indexOf(g.head)).map(_.sortBy(cols.indexOf))
  }

  /** Explode one same-pattern group in a single pass via arrays_zip.
    * `explode_outer` keeps empty/null-array rows as nulls — matching
    * polars/pandas explode, which emit a null row for empty lists.
    */
  private def explodeGroup(df: DataFrame, group: Seq[String]): DataFrame =
    if (group.size == 1) df.withColumn(group.head, explode_outer(col(group.head)))
    else {
      val zipped = df.withColumn("__graft_zip", explode_outer(arrays_zip(group.map(col): _*)))
      group
        .foldLeft(zipped)((d, c) => d.withColumn(c, col(s"__graft_zip.$c")))
        .drop("__graft_zip")
    }

  /** Perform the minimal explosion (utils.py:259-268). */
  def apply(df: DataFrame): DataFrame =
    explodableGroups(df).foldLeft(df)(explodeGroup)

  /** Analysis summary (utils.py:250-258). */
  def summary(df: DataFrame): Map[String, Any] = {
    val groups = explodableGroups(df)
    Map(
      "total_columns"               -> df.columns.length,
      "list_columns"                -> listColumns(df).size,
      "explodable_groups"           -> groups.size,
      "explosion_operations_needed" -> groups.size,
      "groups"                      -> groups,
    )
  }
}
