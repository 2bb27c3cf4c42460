package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * `randomSplit` is seed-dependent AND partitioning-dependent — rerun the
  * pipeline with different file splits and rows change splits. Hash-based
  * assignment is a pure function of the row key: stable across reruns,
  * cluster sizes, and data layout, and needs no shuffle at all (the split
  * column is computed inside the scan's codegen stage).
  */
object DatasetSplit {

  /** Split bucket in [0, 100) from a stable key column. */
  def splitBucket(key: Column, seed: Int = 42): Column =
    pmod(xxhash64(key, lit(seed)), lit(100L))

  /** Add a `split` column: train/val/test by hash-percent thresholds. */
  def assignSplits(df: DataFrame, keyCol: String,
                   trainPct: Int = 90, valPct: Int = 5, seed: Int = 42): DataFrame = {
    val b = splitBucket(col(keyCol), seed)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Stratified variant: hash within (stratum, key) so each stratum gets
    * its own ~pct split regardless of stratum skew. */
  def assignStratifiedSplits(df: DataFrame, keyCol: String, stratumCol: String,
                             trainPct: Int = 90, valPct: Int = 5, seed: Int = 42): DataFrame = {
    val b = pmod(xxhash64(col(stratumCol), col(keyCol), lit(seed)), lit(100L))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Engine-portable split bucket: md5 of a canonical `a|b|seed` string, first
    * 4 hex digits mod 100. Slower than the xxhash64 path but reproducible in
    * ANY engine with md5 (DuckDB, Trino, Postgres…) — the property that
    * matters when train/val membership must survive an engine migration.
    * Still a pure per-row expression: no shuffle, computed inside the scan. */
  def portableBucket(parts: Seq[Column], seed: Int = 42): Column = {
    val h = md5(concat_ws("|", parts.map(_.cast(org.apache.spark.sql.types.StringType)) :+ lit(seed.toString): _*))
    pmod(conv(substring(h, 1, 4), 16, 10).cast(org.apache.spark.sql.types.LongType), lit(100L))
  }

  /** Stratified split on the portable md5 bucket (see [[portableBucket]]). */
  def portableStratifiedSplits(df: DataFrame, keyCol: String, stratumCol: String,
                               trainPct: Int = 90, valPct: Int = 5, seed: Int = 42): DataFrame = {
    val b = portableBucket(Seq(col(stratumCol), col(keyCol)), seed)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }
}
