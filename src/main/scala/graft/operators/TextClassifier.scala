package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** fastText-style LINEAR text-classifier inference over hashed word n-gram
  * features (Joulin et al. 2016, arXiv:1607.01759 — the model family behind
  * the public quality/language filters in CCNet, DCLM and the
  * fineweb-edu-style pipelines; the reference engine has no classifier
  * plane, this is part of the 100 TB training-data surface).
  *
  * Inference only: training such a classifier is a solved single-node
  * problem; at corpus scale the job is SCORING billions of documents, a
  * pure scan:
  *
  *   features(doc) = unigrams ++ bigrams of the lowercased tokens
  *   fid(g)        = first 4 hex digits of md5(g) mod dim   (portable —
  *                   [[DatasetSplit.portableBucket]]'s trick, bit-exact in
  *                   any engine with md5)
  *   logit(doc)    = Σ_g weights(fid(g)) / 128
  *   label(doc)    = logit > 0
  *
  * Scale shape: the weight vector rides the plan as ONE array literal
  * (≤ 65,536 doubles = 512 KB — always below broadcast/literal comfort),
  * indexed per gram inside a codegen'd `aggregate` fold — zero joins,
  * zero shuffle, zero UDFs; a 100 TB corpus scores in exactly one scan.
  *
  * Exactness contract (what makes the DuckDB oracle hash-green instead of
  * approximately-equal): weights are DYADIC rationals `k / 128` with
  * integer `k` — the fold accumulates the integer numerator and divides
  * ONCE at the end, so the sum is exact in any fold order and the final
  * double is the same bit pattern in every engine. [[quantize]] converts
  * arbitrary trained weights to this grid (±1/256 per feature, far below
  * any classifier's decision noise). No transcendentals in the scored
  * output: the sigmoid is monotone, so thresholding the logit IS
  * thresholding the probability.
  */
object TextClassifier {

  /** Max supported feature-space dimension (4 hex digits of md5). */
  val MaxDim: Int = 65536

  /** Portable hashed feature id in [0, dim): first 4 md5 hex digits mod
    * dim. Pure codegen'd expressions. */
  def featureId(gram: Column, dim: Int): Column =
    pmod(conv(substring(md5(gram), 1, 4), 16, 10).cast(LongType), lit(dim.toLong))

  /** Quantize trained weights onto the exact dyadic grid: k = round(w·128),
    * clamped to ±16,256 (127·128) so a single feature can never overflow
    * the long numerator even at 10^12 grams/doc. */
  def quantize(weights: Array[Double]): Array[Int] =
    weights.map(w => math.max(-16256, math.min(16256, math.round(w * 128.0))).toInt)

  /** Score every document with a linear model over hashed unigram+bigram
    * features. `weightNumerators(fid)` is the INTEGER numerator of the
    * weight `k/128` (see [[quantize]]).
    *
    * Output per row: (id, n_features, logit double, label boolean). A
    * null/empty text scores 0 features, logit 0.0, label false — a gate
    * downstream drops it explicitly rather than this operator guessing. */
  def scoreLinear(df: DataFrame, textCol: String, idCol: String,
                  weightNumerators: Array[Int],
                  addBigrams: Boolean = true): DataFrame = {
    val dim = weightNumerators.length
    require(dim > 0 && dim <= MaxDim,
      s"scoreLinear: weight vector length $dim outside (0, $MaxDim] — 4 md5 hex " +
        "digits address at most 65,536 features")
    val wLit = lit(weightNumerators.map(_.toLong))
    val toks = coalesce(Dedup.tokens(col(textCol)), array().cast("array<string>"))
    val bi =
      if (!addBigrams) array().cast("array<string>")
      else when(size(col("__t")) >= 2,
        transform(sequence(lit(0), size(col("__t")) - 2),
          i => concat_ws(" ", element_at(col("__t"), i + 1), element_at(col("__t"), i + 2))))
        .otherwise(array().cast("array<string>"))
    df.select(col(idCol).as("id"), toks.as("__t"))
      .select(col("id"), concat(col("__t"), bi).as("__g"))
      .select(col("id"),
        size(col("__g")).cast(LongType).as("n_features"),
        aggregate(col("__g"), lit(0L), (acc, g) =>
          acc + element_at(wLit, featureId(g, dim).cast(IntegerType) + 1)).as("__num"))
      .select(col("id"), col("n_features"),
        (col("__num").cast(DoubleType) / 128.0).as("logit"),
        (col("__num") > 0L).as("label"))
  }

  /** [[scoreLinear]] with the model as a (feature_id, weight_num) TABLE —
    * the shape a training job or a model registry hands over. The table is
    * dim-bounded by contract, so collecting it to the one array literal
    * the scan path needs is a metadata pull, not a data pull. Missing ids
    * weigh 0; out-of-range ids refuse. */
  def scoreLinearTable(df: DataFrame, textCol: String, idCol: String,
                       weights: DataFrame, dim: Int,
                       addBigrams: Boolean = true): DataFrame = {
    require(dim > 0 && dim <= MaxDim, s"scoreLinearTable: dim $dim outside (0, $MaxDim]")
    val rows = weights.select(col("feature_id").cast(LongType),
      col("weight_num").cast(LongType)).collect()
    val arr = new Array[Int](dim)
    rows.foreach { r =>
      val fid = r.getLong(0)
      require(fid >= 0 && fid < dim,
        s"scoreLinearTable: feature_id $fid outside [0, $dim)")
      arr(fid.toInt) = r.getLong(1).toInt
    }
    scoreLinear(df, textCol, idCol, arr, addBigrams)
  }
}
