package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** In-plan property-oracle checks for the approximate dedup sketches.
  *
  * The pair set of an LSH sketch is seed-deterministic but not
  * SQL-reproducible, so these queries cross-validate the sketch against
  * EXACT ground truth computed in the same plan and emit pinned booleans a
  * SQL oracle can assert TRUE (the `ann_recall_check` pattern).
  *
  * Ground truth is bounded to a PROBE prefix (`id < probeMax`, both sides):
  * at the sf0.01 correctness gate the probe IS the full corpus (500 docs),
  * so the gate checks complete ground truth; at bench/production scale the
  * cost stays O(probe²·overlap), independent of corpus size — the property
  * keeps being exercised without the verification dominating the operator
  * it verifies. The probe bound is INTENTIONALLY weaker than an unbounded
  * check at sf > 0.01 (a high-sim pair straddling the probe boundary is not
  * verified there); the oracle's pinned TRUE expectations are derived at the
  * sf0.01 gate, where probe == corpus and the check is complete.
  *
  * These are library operators (not harness-only code) because a production
  * pipeline wants the same shape: continuous sketch-vs-exact validation
  * over a bounded probe slice of each ingest batch.
  */
object DedupChecks {

  /** MinHash-LSH cross-validation over `docs`. Emits three pinned booleans:
    *
    *  - `found_pairs`        — the sketch finds a non-empty pair set;
    *  - `est_within_margin`  — max |est_jaccard − exact_jaccard| over the
    *    returned pairs ≤ `estMargin` (k = bands·rowsPerBand hashes put the
    *    estimator within 0.15 at ~4σ for k = 128; measured max 0.08 here);
    *  - `recall_high_sim_probes` — every probe pair with exact Jaccard
    *    ≥ `recallAt` is in the LSH pair set (banding detection at 0.7 with
    *    32×4 is 1−(1−0.7⁴)³² ≈ 99.97% per pair).
    *
    * Exact probe Jaccard comes from an inverted-index join (shingle →
    * co-occurrence counts) — never a cross join; with both sides bounded to
    * the probe prefix its cost is independent of corpus size.
    */
  def minhashProperties(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleWords: Int = 3,
      bands: Int = 32,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5,
      probeMax: Long = 500,
      estMargin: Double = 0.15,
      recallAt: Double = 0.7,
  ): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // The sketch runs the PRODUCTION pipeline (minhashLsh → fused
    // row-local signatures) so a regression in the path every real caller
    // executes is visible here, not hidden behind a verification-only
    // signature build. The exploded shingle rows below exist purely for
    // the GROUND TRUTH (exact jaccard of returned pairs + probe recall);
    // sharing them with the sketch used to save one shingling pass, but
    // the fused kernel computes its shingles in-scan at a fraction of the
    // exploded pass's cost, so the sharing saved nothing worth coupling
    // the paths for. The truth rows stay a MULTISET (the estimator check
    // collect_set()s; only the bounded probe slice needs true sets) at
    // DISK_ONLY — |doc|-proportional, keep it off the heap.
    val shRows = Dedup.shingleRows(docs, textCol, idCol, shingleWords)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val pairs = Dedup.minhashLsh(docs, textCol, idCol, shingleWords, bands, rowsPerBand,
        threshold)
      .localCheckpoint(false)
    // materialize the checkpoint behind ONE action before three branches
    // consume it — a lazy checkpoint first touched inside a multi-branch
    // plan can race its own block writes
    val found = pairs.count() > 0
    // estimator accuracy: exact jaccard for the RETURNED pairs (pair-touched
    // docs only — bounded by the pair count, not the corpus)
    val pairIds = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id"))).distinct()
    val shSets = shRows.join(pairIds, Seq("id"), "left_semi")
      .groupBy("id").agg(collect_set(col("sh")).as("sh")) // collect_set dedups
      // EAGER: its first action would otherwise be the two-branch
      // (sh_a / sh_b) join below — the lazy-checkpoint block-write race
      .localCheckpoint(true)
    val estDevDf = pairs
      .join(shSets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shSets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("exact", size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType)
        / size(array_union(col("sh_a"), col("sh_b"))))
      .agg(max(abs(col("est_jaccard") - col("exact"))).as("max_dev"))
    // recall ground truth: inverted-index exact jaccard over probe×probe —
    // shingle join keys fan out as Σ_sh df(sh)², so the probe bound (both
    // sides) is what keeps the check linear-ish as the corpus grows. The
    // inverted index counts co-occurrences, so THIS slice needs true sets —
    // distinct on the probe prefix only (cost independent of corpus size).
    val shProbe = shRows.filter(col("id") < probeMax).distinct()
    val sizes = shProbe.groupBy("id").agg(count(lit(1)).as("sz"))
    val exactProbePairs = shProbe.select(col("id").as("id_b"), col("sh"))
      .join(shProbe.select(col("id").as("id_a"), col("sh")), "sh")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      // no broadcast hint on sizes: AQE broadcasts it when (and only when)
      // it is small — a hint here would be a cardinality bet
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sza")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("szb")), "id_b")
      .withColumn("j", col("inter").cast(DoubleType)
        / (col("sza") + col("szb") - col("inter")))
      .filter(col("j") >= recallAt)
      .select("id_a", "id_b")
    // one action for both checks: 1-row est-deviation agg × 1-row
    // missed-pair count
    val missedDf = exactProbePairs.join(pairs, Seq("id_a", "id_b"), "left_anti")
      .agg(count(lit(1)).as("n_missed"))
    val checks = estDevDf.crossJoin(missedDf).head()
    val estOk = found && !checks.isNullAt(0) && checks.getDouble(0) <= estMargin
    val recallOk = checks.getLong(1) == 0L
    shRows.unpersist(false)
    Seq(("est_within_margin", estOk), ("found_pairs", found),
      ("recall_high_sim_probes", recallOk))
      .toDF("prop", "ok").orderBy("prop")
  }

  /** SimHash-blocking cross-validation over `docs`. Emits three pinned
    * booleans:
    *
    *  - `found_pairs`          — the blocked join finds a non-empty pair set;
    *  - `pigeonhole_exact_le3` — completeness at hamming ≤ blocks−1 = 3 is a
    *    pigeonhole THEOREM (some 16-bit chunk must be untouched), so
    *    brute-forced probe pairs at ≤ 3 must ALL be found;
    *  - `recall_le10_probes`   — beyond the guarantee the 4-block layout
    *    finds ~23% of radius-10 pairs (floor pinned at `minRecall10`) — the
    *    documented price of equality-join blocking at radius > blocks−1.
    *
    * Brute-force ground truth is probe×corpus: the probe fingerprint table
    * broadcasts (64-bit longs, tiny), so the check is one map-side pass over
    * the corpus fingerprints — no shuffle grows with the corpus.
    */
  def simhashProperties(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxHamming: Int = 10,
      probeMax: Long = 500,
      minRecall10: Double = 0.15,
  ): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // ONE tokenize+simhash pass serves the blocked join and its brute-force
    // ground truth — the fingerprint table is (id, long), tiny to checkpoint.
    // EAGER: the very first action over it (the pair self-join) already reads
    // it through two plan branches, the shape where a lazy checkpoint races
    // its own block writes.
    val fps = Dedup.simhashFingerprints(docs, textCol, idCol).localCheckpoint(true)
    val pairs = Dedup.simhashPairsFromFingerprints(fps, maxHamming = maxHamming)
      .select("id_a", "id_b").localCheckpoint(false)
    val found = pairs.count() > 0
    val bf = fps.select(col("id").as("id_b"), col("fp").as("fp_b"))
      .join(broadcast(fps.filter(col("id") < probeMax)
        .select(col("id").as("id_a"), col("fp").as("fp_a"))),
        col("id_a") =!= col("id_b"))
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("hamming"))
      .distinct().localCheckpoint(false)
    // all three brute-force comparisons in ONE action: outer-join the
    // ground truth against the blocked result and aggregate the flags
    val stats = bf
      .join(pairs.withColumn("__hit", lit(1)), Seq("id_a", "id_b"), "left_outer")
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("__hit"), lit(0))).as("n_found"),
        sum(when(col("hamming") <= 3 && col("__hit").isNull, 1L).otherwise(0L))
          .as("le3_missed"))
      .head()
    // empty ground truth → the sums are NULL, not 0 — guard before getLong
    val bfN      = stats.getLong(0)
    val pigeonOk = bfN == 0 || stats.getLong(2) == 0L
    val recall10 = if (bfN == 0) 1.0 else stats.getLong(1).toDouble / bfN
    Seq(("found_pairs", found), ("pigeonhole_exact_le3", pigeonOk),
      ("recall_le10_probes", recall10 >= minRecall10))
      .toDF("prop", "ok").orderBy("prop")
  }
}
