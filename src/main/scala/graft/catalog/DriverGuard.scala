package graft.catalog

import org.apache.spark.sql.{DataFrame, Row}

/** Guard rail for the few deliberate driver-side materializations in the
  * catalog plane (group records in [[EsmCatalog.getEntry]], the dict-inline
  * save in [[CatalogWriter]]). Each is bounded *by construction* — catalog
  * groups are metadata-sized — but at 100 TB "by construction" deserves a
  * tripwire: a mis-grouped catalog (e.g. groupby attrs that don't actually
  * partition the asset rows) would otherwise OOM the driver with no useful
  * message.
  *
  * The cap is read from the session conf (`spark.graft.driverCollect.maxRows`,
  * default 100k rows) so an operator who KNOWS a big dict catalog is fine can
  * raise it per session without a code change. The check costs nothing extra:
  * we collect `limit(max + 1)` — one row beyond the cap proves the overflow
  * without counting the full result.
  */
object DriverGuard {

  val confKey = "spark.graft.driverCollect.maxRows"
  val defaultMaxRows = 100000

  /** Collect `df` to the driver, failing fast (with the configured cap and
    * the offending context in the message) if it exceeds the cap. */
  def boundedCollect(df: DataFrame, what: String): Array[Row] = {
    val max  = df.sparkSession.conf.get(confKey, defaultMaxRows.toString).toInt
    val rows = df.limit(max + 1).collect()
    require(rows.length <= max,
      s"$what would materialize more than $max rows on the driver " +
        s"(cap '$confKey' = $max). This usually means the catalog grouping " +
        "does not bound the set as expected; fix the grouping or raise the cap.")
    rows
  }

  /** Assert `df` has at most the capped number of rows WITHOUT collecting
    * it — for collects whose driver volume hides inside nested structures
    * (e.g. collect_list'ed group records), where capping the outer row
    * count alone would let the payload through. `limit(max+1).count()`
    * early-exits the scan. */
  def assertBounded(df: DataFrame, what: String): Unit = {
    val max = df.sparkSession.conf.get(confKey, defaultMaxRows.toString).toInt
    require(df.limit(max + 1).count() <= max,
      s"$what exceeds $max rows (cap '$confKey' = $max); " +
        "fix the catalog bound or raise the cap.")
  }
}
