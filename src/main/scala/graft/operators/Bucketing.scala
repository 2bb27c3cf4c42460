package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for co-located joins.
  *
  * At 100 TB the dominant cost of a fact-fact join is the shuffle. Writing
  * both sides bucketed (+ sorted) on the join key lets Spark plan a
  * sort-merge join with NO Exchange on either side — each task reads
  * matching bucket files directly. This is the standing-layout answer to a
  * recurring join key (the reference has no equivalent; its data always fit
  * one process).
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket keys. With matching bucket
    * counts the physical plan has no shuffle — assert via
    * [[hasShuffle]] in tests/audits. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)

  /** Does the executed plan contain a shuffle exchange? Walks the plan for
    * ShuffleExchangeLike nodes (string-matching "Exchange hashpartitioning"
    * would miss range/single-partition exchanges — a plan can shuffle in
    * ways a hash-only probe green-lights), recursing through the AQE
    * wrappers (AdaptiveSparkPlanExec / query stages), whose inner plans a
    * plain `collect` never visits. Broadcast exchanges are not shuffles and
    * do not count. */
  def hasShuffle(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def walk(p: SparkPlan): Boolean = p match {
      case _: ShuffleExchangeLike   => true
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec        => walk(q.plan)
      case other                    => other.children.exists(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  /** Write `df` hive-partitioned on `partitionCols` — the standing layout
    * for predicates that always filter on those columns (date, status,
    * shard): the scan prunes whole directories instead of reading and
    * filtering. `repartition` on the partition columns first so each leaf
    * directory gets one file, not one per task (small-file hygiene — at
    * 100 TB a task-crossed partitionBy writes task×partition tiny files).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
