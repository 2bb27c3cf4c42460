package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Deterministic domain-mixture resampling for training corpora.
  *
  * Given target mixture weights per domain (language, source, quality
  * band…), downsample each domain so the kept corpus matches the target
  * proportions at the largest feasible size: the binding domain (the one
  * whose supply runs out first, `T = min_d n_d / w_d`) is kept whole and
  * every other domain is thinned to `w_d * T` rows in expectation.
  *
  * Row selection is the engine-portable md5 bucket (see
  * [[DatasetSplit.portableBucket]]): a row is kept iff the first 4 hex
  * digits of `md5(id|seed)` fall under the domain's acceptance threshold.
  * Membership is a pure function of (id, domain counts, weights, seed) —
  * reruns, repartitions, and engine migrations keep the same rows.
  *
  * Scale shape: ONE tiny aggregate (per-domain counts, map-side partial),
  * a global-min window over that domain-cardinality-sized frame, and a
  * broadcast join of the thresholds back onto the corpus — the selection
  * itself is a per-row filter evaluated inside the scan. No per-domain
  * window over data rows (that shape serializes each domain into a single
  * task — unusable skew at 100 TB). Ratio sampling makes per-domain kept
  * counts approximate (±O(√n)), which is the right trade at corpus scale.
  *
  * Domains with no weight (or a null domain) are dropped; weighted domains
  * absent from the data are ignored — they cannot constrain the total.
  */
object Mixture {

  /** Add nothing, remove rows: the kept subset matching `weights`. */
  def sampleToMixture(df: DataFrame, idCol: String, domainCol: String,
                      weights: Map[String, Double], seed: Int = 42): DataFrame = {
    require(weights.nonEmpty, "weights must not be empty")
    weights.foreach { case (d, w) =>
      require(w > 0 && !w.isNaN && !w.isInfinite, s"weight for '$d' must be finite and > 0, got $w")
    }
    val spark = df.sparkSession
    import spark.implicits._

    val wDf = weights.toSeq.toDF(domainCol, "__w")
    // per-domain supply; inner join drops unweighted domains up front
    val counts = df.groupBy(domainCol).count().join(wDf, domainCol)
    // largest feasible total T = min(n/w); threshold in 16^4 bucket space.
    // The window frame is domain-cardinality-sized — one tiny task.
    val t = min(col("count") / col("__w")).over(Window.partitionBy())
    val thresholds = counts.select(
      col(domainCol),
      floor(col("__w") * t / col("count") * 65536).cast(LongType).as("__thr"))

    val bucket = conv(substring(
      md5(concat_ws("|", col(idCol).cast(StringType), lit(seed.toString))), 1, 4), 16, 10)
      .cast(LongType)
    df.join(broadcast(thresholds), domainCol)
      .filter(bucket < col("__thr"))
      .drop("__thr")
  }
}
