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
  def portableBucket(parts: Seq[Column], seed: Int = 42): Column =
    portableHexMod(
      concat_ws("|", parts.map(_.cast(org.apache.spark.sql.types.StringType)) :+ lit(seed.toString): _*),
      100)

  /** The engine-portable hash core shared by the split buckets, mixture
    * sampling and the classifier feature ids: first 4 hex digits of
    * md5(`s`) mod `m` — bit-exact in any engine with md5. ONE definition,
    * because the value is a cross-engine contract. `m` must be in
    * (0, 65536]: 4 hex digits address 2^16 values. */
  def portableHexMod(s: Column, m: Int): Column = {
    require(m > 0 && m <= 65536, s"portableHexMod: modulus $m outside (0, 65536]")
    pmod(conv(substring(md5(s), 1, 4), 16, 10).cast(org.apache.spark.sql.types.LongType), lit(m.toLong))
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

  /** Deterministic shuffle-and-shard for training order: every row gets a
    * `shard` (its output file) and a `pos` within that shard, both pure
    * functions of (id, seed) — reruns, repartitions, and engine changes
    * reproduce the same order, unlike rand().
    *
    * Scale shape: the md5 key IS the random order, and sharding comes from
    * its prefix, so the only exchange is the hash partition by shard that a
    * sharded writer needs anyway; positions are a per-shard window sort —
    * no global sort of the corpus at any size. A tie on the full md5 breaks
    * by id, keeping the order total and deterministic. */
  def shuffleShards(df: DataFrame, idCol: String, shards: Int, seed: Int = 42): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val keyCol = "__graft_shuffle_key"
    val withKey = df
      .withColumn(keyCol,
        md5(concat_ws("|", col(idCol).cast(org.apache.spark.sql.types.StringType),
          lit(seed.toString))))
      .withColumn("shard",
        pmod(conv(substring(col(keyCol), 1, 4), 16, 10)
          .cast(org.apache.spark.sql.types.LongType), lit(shards.toLong)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col(keyCol), col(idCol))
    withKey
      .withColumn("pos", row_number().over(w).cast(org.apache.spark.sql.types.LongType))
      .drop(keyCol)
  }

  /** Curriculum sharding: deterministic training order that is
    * easy-to-hard ACROSS each shard and shuffled WITHIN a difficulty
    * bucket — the curriculum-learning counterpart of [[shuffleShards]].
    * `bucketCol` is any precomputed integer difficulty (e.g. the floor of
    * [[TextAnalysis.zipfSurprisal]]'s mean_bits); shard assignment stays
    * the md5-prefix hash (every bucket spreads over every shard), and
    * `pos` ranks (bucket, md5, id) per shard — a reader walking a shard
    * in pos order sees buckets in ascending difficulty, random inside.
    * One exchange (the per-shard partition a sharded writer needs
    * anyway), never a global sort. */
  def curriculumShards(df: DataFrame, idCol: String, bucketCol: String,
                       shards: Int, seed: Int = 42): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val keyCol = "__graft_curr_key"
    val withKey = df
      .withColumn(keyCol,
        md5(concat_ws("|", col(idCol).cast(org.apache.spark.sql.types.StringType),
          lit(seed.toString))))
      .withColumn("shard",
        pmod(conv(substring(col(keyCol), 1, 4), 16, 10)
          .cast(org.apache.spark.sql.types.LongType), lit(shards.toLong)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col(bucketCol), col(keyCol), col(idCol))
    withKey
      .withColumn("pos", row_number().over(w).cast(org.apache.spark.sql.types.LongType))
      .drop(keyCol)
  }

  /** Snapshot delta between two corpus versions — the ingest-pipeline
    * primitive behind incremental recrawls and dataset versioning: per
    * document id, `added` (only in the new snapshot), `removed` (only in
    * the old), `changed` (content hash differs), or `unchanged`.
    *
    * Scale shape: both sides project to (id, md5(content)) BEFORE the
    * full outer join, so the one shuffle per side carries ~50 bytes a
    * row instead of the document text — at 100 TB the delta costs two
    * hash-projected scans plus a join on the id, never a text move. */
  def snapshotDelta(oldDf: DataFrame, newDf: DataFrame,
                    idCol: String, contentCol: String): DataFrame = {
    def hashed(df: DataFrame, h: String) =
      df.select(col(idCol).cast(org.apache.spark.sql.types.LongType).as("id"),
        md5(col(contentCol)).as(h))
    hashed(oldDf, "__old_h").join(hashed(newDf, "__new_h"), Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__old_h").isNull, "added")
          .when(col("__new_h").isNull, "removed")
          .when(col("__old_h") =!= col("__new_h"), "changed")
          .otherwise("unchanged").as("status"))
  }
}
