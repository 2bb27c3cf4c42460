package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Batch keyword retrieval over the corpus: Okapi BM25 top-k per query —
  * the lexical sibling of [[Similarity]]'s embedding search, and the shape
  * a training-data pipeline actually runs (score the WHOLE corpus against
  * a fixed query battery: topic probes, contamination probes, eval-set
  * look-alikes), not an online serving index.
  *
  * Scale shape:
  *  - ONE corpus scan computes each doc's term-frequency vector over the
  *    union of all query vocabularies ([[graft.functions.TermCounts]] —
  *    a codegen'd kernel, zero shuffle) plus its length; that PROJECTED
  *    (id, tf, dl) frame — ints only, no text — is persisted and feeds
  *    both the stats pass and the scoring pass, so corpus bytes are read
  *    once no matter how many queries run;
  *  - corpus statistics (N, avgdl, per-term document frequencies) are one
  *    map-side-combined aggregation over the projection → a driver-side
  *    idf table baked into the scoring expressions as literals (a few
  *    doubles — never a join);
  *  - scoring is pure per-row arithmetic; docs matching NO query term are
  *    filtered before any exchange, so the top-k windows see only the
  *    posting-bearing slice (at web scale: the tiny fraction containing a
  *    query term), then the two-stage (partition-local prune → global
  *    rank) top-k bounds the final shuffle at k·partitions rows per query
  *    — the [[Similarity]] topKPerQuery design.
  *
  * Scoring (Robertson et al., TREC-3 Okapi; the Lucene-default variant):
  *   idf(t)      = ln(1 + (N − df + 0.5)/(df + 0.5))
  *   score(d, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  * Per-term contributions add in QUERY TERM ORDER (row-local, fixed),
  * so scores are bit-deterministic; ranks tie-break on doc id asc.
  *
  * Query strings tokenize with the corpus tokenizer's contract
  * (lowercased whitespace words); duplicate terms in one query contribute
  * once per occurrence, as BM25's tf-in-query weighting degenerates to
  * with short queries.
  */
object KeywordSearch {

  /** Vocabulary threshold for [[bm25Batch]]'s IN-SCAN posting build
    * (the sparse [[graft.functions.TermPostings]] kernel, r15 — binary
    * search over the sorted term table, O(tokens·log V) per row): past
    * it, the build falls back to the full-corpus token explode +
    * semi-join. The cap bounds the driver-side vocabulary collect and
    * the term table riding each task binary (65,536 terms ≈ 1 MB — the
    * ivfAssign centroid-cap scale), NOT kernel arithmetic: measured at
    * sf0.1 the kernel path still beats the explode at 128k terms, so
    * the cap is a memory/plan-size bound, not a perf crossover. (r13/r14
    * capped this at 1,024 because the dense TermCounts kernel paid
    * O(V) per row to materialize + posexplode the count vector.) */
  private[operators] val KernelVocabCap = 65536

  /** Vocabulary threshold for [[bm25SearchIndexed]]'s posting-store
    * pruning: at or below it the battery vocabulary collects (bounded)
    * and pushes into the posting scan as a `term IN (…)` filter —
    * row-group min/max skipping over the term-sorted layout; past it the
    * vocabulary stays data (semi-join). Deliberately SMALLER than
    * [[KernelVocabCap]]: parquet converts an IN past
    * `spark.sql.parquet.pushdown.inFilterThreshold` into a min/max range
    * whose skipping power decays with battery spread, while the sparse
    * kernel's cost does not grow with V at all — the two branches
    * optimize different resources and earn different caps (r15; they
    * shared one 1,024 cap through r14). */
  private[operators] val SmallVocabCap = 1024

  /** Driver-side idf — the ONE copy of the formula (bm25ModelFromIndex
    * and statsOf both call it; [[retrieve]] mirrors it as the in-plan
    * expression). StrictMath, NOT math.log: Spark's in-plan `log`
    * evaluates StrictMath.log, and the JIT's Math.log intrinsic differs
    * by 1 ulp on ~10% of idf arguments (probed r14) — this is what
    * keeps all execution forms' scores bit-identical on real corpora,
    * not just synthetic ones. */
  private def idfOf(n: Long, df: Double): Double =
    StrictMath.log(1.0 + (n.toDouble - df + 0.5) / (df + 0.5))

  /** Frozen corpus statistics + query battery for BM25 scoring — what a
    * deployment computes ONCE on a reference corpus and then applies to
    * any batch or stream ([[bm25Score]]). `idf` indexes [[terms]]
    * (sorted-distinct union of all query vocabularies). */
  final case class Bm25Model(
      k1: Double, b: Double, avgdl: Double,
      terms: Seq[String], idf: Array[Double],
      queries: Seq[(String, Seq[String])])

  /** driver-side mirror of Dedup.tokens' contract — regex `\s` trim, NOT
    * String.trim (which also strips control chars <= U+0020 that the
    * corpus tokenizer keeps attached; the two forms must tokenize a
    * battery identically or the bm25TopK/bm25Batch bit-parity breaks on
    * control-character probes) */
  private def qTokens(s: String): Seq[String] =
    s.toLowerCase.replaceAll("^\\s+|\\s+$", "").split("\\s+").filter(_.nonEmpty).toSeq

  private def parseBattery(queries: Seq[(String, String)]): Seq[(String, Seq[String])] = {
    require(queries.nonEmpty, "bm25: empty query battery")
    val perQuery = queries.map { case (qid, qtext) => (qid, qTokens(qtext)) }
    perQuery.foreach { case (qid, ts) =>
      require(ts.nonEmpty, s"bm25: query '$qid' has no terms") }
    perQuery
  }

  /** Build a [[Bm25Model]] from a reference corpus: one scan computes the
    * tf/dl projection, one aggregation derives N / avgdl / per-term df. */
  def bm25Model(corpus: DataFrame, textCol: String,
                queries: Seq[(String, String)],
                k1: Double = 1.2, b: Double = 0.75): Bm25Model = {
    val perQuery = parseBattery(queries)
    val allTerms = perQuery.flatMap(_._2).distinct.sorted
    import org.apache.spark.sql.GraftColumnBridge
    val toks = coalesce(Dedup.tokens(col(textCol)), array().cast("array<string>"))
    val tf = GraftColumnBridge.column(graft.functions.TermCounts(
      GraftColumnBridge.expression(toks), allTerms))
    val projected = corpus.select(tf.as("__tf"), size(toks).cast(LongType).as("dl"))
    val (n, avgdl, idf) = statsOf(projected, allTerms.size)
    Bm25Model(k1, b, avgdl, allTerms, idf, perQuery)
  }

  private def statsOf(projected: DataFrame, nTerms: Int): (Long, Double, Array[Double]) = {
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n"), sum(col("dl")).as("sumdl")) ++
        (0 until nTerms).map(i =>
          sum(when(element_at(col("__tf"), i + 1) > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val statsRow = projected.agg(aggs.head, aggs.tail: _*).head()
    val n = statsRow.getLong(0)
    require(n > 0, "bm25: empty corpus")
    val avgdl = statsRow.getLong(1).toDouble / n.toDouble
    val idf = (0 until nTerms).map { i =>
      idfOf(n, statsRow.getLong(2 + i).toDouble)
    }.toArray
    (n, avgdl, idf)
  }

  /** Per-term contribution sum in QUERY TERM ORDER over a `__tf`/`dl`
    * projection — shared verbatim by the batch top-k and the streaming
    * scorer, so their scores are bit-identical. */
  private def scoreOf(terms: Seq[String], termIdx: Map[String, Int],
                      idf: Array[Double], k1: Double, norm: Column): Column =
    terms.map { t =>
      val i = termIdx(t)
      val tfc = element_at(col("__tf"), i + 1).cast(DoubleType)
      lit(idf(i)) * tfc * lit(k1 + 1.0) / (tfc + norm)
    }.reduce(_ + _)

  private def tfTotalOf(terms: Seq[String], termIdx: Map[String, Int]): Column =
    terms.distinct.map(t => element_at(col("__tf"), termIdx(t) + 1).cast(LongType))
      .reduce(_ + _)

  /** Score a document frame — batch OR `readStream` — against a frozen
    * [[Bm25Model]]: (query_id, doc_id, score, dl, tf_total) rows for
    * docs carrying at least one query term. STATELESS (one codegen'd tf
    * kernel + literal arithmetic per row; the model rides the plan), so
    * the same call is the streaming twin with byte-identical scores —
    * no state store, no watermark (the qualityFilter precedent). Top-k
    * ranking needs ordering and is the BATCH operator's job; a stream
    * consumer windows the scored rows downstream. */
  def bm25Score(docs: DataFrame, textCol: String, idCol: String,
                model: Bm25Model): DataFrame = {
    val termIdx = model.terms.zipWithIndex.toMap
    import org.apache.spark.sql.GraftColumnBridge
    val toks = coalesce(Dedup.tokens(col(textCol)), array().cast("array<string>"))
    val tf = GraftColumnBridge.column(graft.functions.TermCounts(
      GraftColumnBridge.expression(toks), model.terms))
    val base = docs.select(col(idCol).as("doc_id"), tf.as("__tf"),
      size(toks).cast(LongType).as("dl"))
    val norm = lit(model.k1 * (1 - model.b)) +
      lit(model.k1 * model.b / model.avgdl) * col("dl").cast(DoubleType)
    model.queries.map { case (qid, ts) =>
      base
        .withColumn("__s", scoreOf(ts, termIdx, model.idf, model.k1, norm))
        .filter(col("__s") > 0.0)
        .select(lit(qid).as("query_id"), col("doc_id"), col("__s").as("score"),
          col("dl"), tfTotalOf(ts, termIdx).as("tf_total"))
    }.reduce(_ unionByName _)
  }

  /** Top-k BM25 hits per query: (query_id, rank, doc_id, score, dl,
    * tf_total). `queries` is a driver-side battery (id → text) — query
    * vocabularies ride the plan as expression literals, so the battery
    * must be human-sized (hundreds of terms, not millions; past that,
    * use [[bm25Batch]] — the inverted-index join form whose battery is
    * data, with bit-identical scores). */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
               queries: Seq[(String, String)], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75,
               scope: CacheScope = CacheScope.untracked): DataFrame = {
    val perQuery = parseBattery(queries)
    val allTerms: Seq[String] =
      perQuery.flatMap(_._2).distinct.sorted // deterministic kernel layout
    val termIdx: Map[String, Int] = allTerms.zipWithIndex.toMap

    import org.apache.spark.sql.GraftColumnBridge
    val toks = coalesce(Dedup.tokens(col(textCol)), array().cast("array<string>"))
    val tf = GraftColumnBridge.column(graft.functions.TermCounts(
      GraftColumnBridge.expression(toks), allTerms))
    // persisted: the int projection feeds BOTH the stats aggregation and
    // every query's scoring branch — the corpus text is read exactly once
    // no matter the battery size (bm25Score by contrast recomputes tf
    // inline: it serves streams, which cannot persist)
    val projected = scope.persisted(
      docs.select(col(idCol).as("doc_id"), tf.as("__tf"),
        size(toks).cast(LongType).as("dl")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (_, avgdl, idf) = statsOf(projected, allTerms.size)

    // per-row length normalization, shared by every term of every query
    val norm = lit(k1 * (1 - b)) + lit(k1 * b / avgdl) * col("dl").cast(DoubleType)
    val scored = perQuery.map { case (qid, ts) =>
      projected
        .withColumn("__s", scoreOf(ts, termIdx, idf, k1, norm))
        // zero-score docs carry no query term: pruned before any exchange
        .filter(col("__s") > 0.0)
        .select(lit(qid).as("query_id"), col("doc_id"), col("__s").as("score"),
          col("dl"), tfTotalOf(ts, termIdx).as("tf_total"))
    }.reduce(_ unionByName _)

    // shared bounded-heap deterministic top-k (Similarity.twoStageTopK):
    // partial heaps prune map-side; the final merge sees ≤ k·partitions
    // survivors per query
    Similarity.twoStageTopK(scored, "query_id",
        col("score"), col("doc_id"), k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"),
        col("dl"), col("tf_total"))
  }

  /** INVERTED-INDEX BM25 top-k — [[bm25TopK]]'s scale sibling for
    * batteries beyond the literal-plan contract. The battery is a
    * DATAFRAME of (query id, query text): a contamination-probe battery
    * of 10⁴–10⁶ queries (the realistic eval-decontamination shape) is
    * data, not plan — the plan is ONE fixed shape regardless of battery
    * size, where [[bm25TopK]] plans a union branch and an O(|terms|)
    * aggregate row per query and hits Janino/plan-size cliffs first.
    *
    * Relational form of the classic posting traversal:
    *  - battery → (query_id, ord, term) occurrence rows (duplicate terms
    *    contribute once per occurrence — the literal form's semantics;
    *    `ord` is the term's position, `first_occ` marks one row per
    *    distinct term for the integer tf_total);
    *  - corpus → POSTING table: one sparse in-scan kernel
    *    ([[graft.functions.TermPostings]] — binary-search probe, emits
    *    only matched (term, cnt) pairs) for vocabularies up to
    *    [[KernelVocabCap]]; past it, explode tokens + vocabulary
    *    semi-join + one map-side-combinable groupBy (vocabulary stays
    *    data). Either way the persisted postings are ints + matched
    *    terms only — corpus text is read twice (stats, postings), but
    *    never shuffled;
    *  - per-term df → in-plan idf (same doubles as the literal path: the
    *    identical formula through the same JVM `ln`);
    *  - the RETRIEVAL JOIN: occurrences ⋈ postings on term — its output
    *    is Σ_t |q_t|·df_t, the true posting-traversal cost (a stop-word
    *    probe term is the classic skew key; AQE's skew-join split
    *    handles it), then groupBy (query_id, doc_id) folds contributions
    *    in QUERY TERM ORDER (sort_array over (ord, contrib) structs →
    *    left-to-right `aggregate`), making scores BIT-IDENTICAL to
    *    [[bm25TopK]]'s ordered literal sums: a term absent from a doc
    *    contributes exactly +0.0 there, which preserves float bits.
    *
    * Output and tie rule match [[bm25TopK]] exactly. Queries with no
    * tokens (or no corpus-matching term) simply rank nothing — a
    * million-probe battery must not abort on one blank probe, where the
    * literal form refuses its whole driver-side battery. */
  def bm25Batch(docs: DataFrame, textCol: String, idCol: String,
                queries: DataFrame, qidCol: String, qtextCol: String,
                k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
                scope: CacheScope = CacheScope.untracked,
                kernelVocabCap: Int = KernelVocabCap): DataFrame = {
    val toks = coalesce(Dedup.tokens(col(textCol)), array().cast("array<string>"))

    // persisted: occurrence rows feed the vocabulary AND the retrieval join
    val qTerms = batteryTerms(queries, qidCol, qtextCol, scope)
    val vocab = qTerms.select("term").distinct()

    // ONE probe action computes the corpus statistics (N, avgdl) AND the
    // battery geometry (max ord, distinct-term count) as a two-row union
    // — r12 ran these as three separate pre-jobs per call. Zero-token
    // docs count in N/avgdl even though they never reach the posting
    // table. The id-uniqueness guard rides the same aggregation: on
    // duplicate ids the two posting-build paths below diverge (the
    // explode form merges duplicate rows into one posting, the kernel
    // form keeps one per row) and the per-ord uniqueness the reduction
    // relies on breaks — refuse loudly. The union also materializes the
    // qTerms persist before the retrieval join reuses it.
    val docStats = docs
      .select(col(idCol).as("__id"), size(toks).cast(LongType).as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"),
        countDistinct(col("__id")).as("nid"))
      .select(col("n"), col("sumdl"), col("nid"),
        lit(null).cast("int").as("max_ord"), lit(null).cast("long").as("n_terms"))
    val qStats = qTerms
      .agg(max(col("ord")).as("max_ord"), countDistinct(col("term")).as("n_terms"))
      .select(lit(null).cast("long").as("n"), lit(null).cast("long").as("sumdl"),
        lit(null).cast("long").as("nid"), col("max_ord"), col("n_terms"))
    val probe = docStats.unionByName(qStats).collect()
    require(probe.length == 2, s"bm25: probe union returned ${probe.length} rows")
    val (dRow, qRow) = if (probe(0).isNullAt(0)) (probe(1), probe(0)) else (probe(0), probe(1))
    val n = dRow.getLong(0)
    require(n > 0, "bm25: empty corpus")
    require(dRow.getLong(2) == n,
      s"bm25: corpus has ${n - dRow.getLong(2)} duplicate '$idCol' rows — " +
        "posting semantics are per-document; dedupe ids first")
    val avgdl = dRow.getLong(1).toDouble / n.toDouble
    val maxOrd = if (qRow.isNullAt(3)) -1 else qRow.getInt(3)
    val nTerms = if (qRow.isNullAt(4)) 0L else qRow.getLong(4)

    // ADAPTIVE posting build (both paths emit identical rows):
    //  - vocabulary within the kernel cap (every realistic battery —
    //    10⁵ distinct probe terms covers a 10⁴–10⁶-probe
    //    decontamination sweep, whose probes share terms heavily): ONE
    //    codegen'd sparse TermPostings scan — binary-search probe, no
    //    token explode, no corpus-volume shuffle, per-row output only
    //    the matched (term, cnt) pairs (the r13 dense-kernel path paid
    //    O(|vocab|) per row to materialize + posexplode the count
    //    vector, which is why its cap sat at 1,024);
    //  - beyond the cap (vocabulary too large to collect / ride tasks):
    //    explode + vocabulary semi-join + map-side-combined groupBy —
    //    vocabulary stays DATA, the plan stays constant-size.
    // the probe already counted distinct terms, so the term pull itself
    // runs ONLY in the small case — a cap-bounded collect over the
    // persisted occurrence rows; a million-term battery never collects
    val smallVocab: Option[Seq[String]] =
      if (nTerms > 0 && nTerms <= kernelVocabCap)
        Some(vocab.collect().map(_.getString(0)).sorted.toSeq)
      else None
    val postingRows = smallVocab match {
      case Some(terms) =>
        import org.apache.spark.sql.GraftColumnBridge
        val tc = GraftColumnBridge.column(graft.functions.TermPostings(
          GraftColumnBridge.expression(toks), terms))
        docs.select(col(idCol).as("doc_id"), size(toks).cast(LongType).as("dl"),
            explode(tc).as("tc"))
          .select(col("tc.term").as("term"), col("doc_id"),
            col("tc.cnt").cast(LongType).as("tf"), col("dl"))
          // spread the postings: the retrieval join builds on the (tiny,
          // broadcast) battery and STREAMS this side, fanning each posting
          // out by its matching query occurrences — left at the corpus
          // scan's few input partitions, a 19M-row fan-out plus its partial
          // aggregation ran on two cores (measured ~2× this whole query).
          // r18: spread by doc_id ALONE — hashpartitioning(doc_id)
          // satisfies the downstream (query_id, doc_id) reduction's
          // ClusteredDistribution, so when the battery broadcasts, the
          // per-(query, doc) pivot aggregation runs WITHOUT its own
          // Exchange of the contribution-volume rows (4.9M rows at the
          // sf0.1 1k battery; measured the largest single stage of this
          // query). Same even spread (doc_id hashes uniformly); a huge
          // battery that shuffle-joins instead re-partitions by term
          // anyway, exactly as before.
          .repartition(col("doc_id"))
      case None =>
        docs.select(col(idCol).as("doc_id"), size(toks).cast(LongType).as("dl"),
            explode(toks).as("term"))
          .join(vocab, Seq("term"), "left_semi")
          .groupBy("term", "doc_id")
          .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
          .select(col("term"), col("doc_id"), col("tf"), col("dl"))
          // r18: posting-volume re-spread by doc_id so the downstream
          // (query_id, doc_id) pivot reduction is exchange-free under a
          // broadcast battery (see the kernel branch's note) — postings
          // are ints, orders of magnitude fewer bytes than the
          // contribution rows that exchange would carry
          .repartition(col("doc_id"))
    }
    val postings = scope.persisted(postingRows,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the posting cache BEFORE planning the retrieval (r18):
    // a cold cache hides its hashpartitioning(doc_id) behind an
    // unfinished AQE subplan, so the planner re-inserts the
    // (query_id, doc_id) Exchange of the CONTRIBUTION-volume rows the
    // doc_id spread exists to avoid; a materialized cache reports its
    // partitioning and the pivot reduction plans exchange-free. Same
    // total compute — the cache is built once either way.
    postings.count()
    retrieve(qTerms, postings, n, avgdl, maxOrd, k1, b, k)
  }

  /** Battery → persisted (query_id, ord, term, first_occ) occurrence
    * rows — the shared front half of [[bm25Batch]] and
    * [[bm25SearchIndexed]]. */
  private def batteryTerms(queries: DataFrame, qidCol: String, qtextCol: String,
                           scope: CacheScope): DataFrame = {
    val qToks = coalesce(Dedup.tokens(col(qtextCol)), array().cast("array<string>"))
    val wFirst = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id", "term").orderBy("ord")
    scope.persisted(
      queries.select(col(qidCol).as("query_id"), posexplode(qToks))
        .withColumnRenamed("pos", "ord").withColumnRenamed("col", "term")
        .withColumn("first_occ", row_number().over(wFirst) === 1),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** The RETRIEVAL tail shared by [[bm25Batch]] and [[bm25SearchIndexed]]:
    * postings → in-plan idf → occurrence⋈posting contributions → the
    * ord-ordered per-(query, doc) reduction → two-stage top-k. `postings`
    * must be unique per (term, doc_id) and carry (term, doc_id, tf, dl). */
  private def retrieve(qTerms: DataFrame, postings: DataFrame, n: Long,
                       avgdl: Double, maxOrd: Int, k1: Double, b: Double,
                       k: Int): DataFrame = {
    // per-term document frequency → idf (postings are unique per
    // (term, doc), so df is a plain count); same expression shape as the
    // driver-side idf of the literal path
    val termStats = postings.groupBy("term").agg(count(lit(1)).as("df"))
      .select(col("term"), log(lit(1.0) +
        (lit(n.toDouble) - col("df").cast(DoubleType) + lit(0.5)) /
          (col("df").cast(DoubleType) + lit(0.5))).as("idf"))

    val norm = lit(k1 * (1 - b)) + lit(k1 * b / avgdl) * col("dl").cast(DoubleType)
    val tfc  = col("tf").cast(DoubleType)
    val contrib = qTerms
      .join(postings, Seq("term"))
      .join(termStats, Seq("term"))
      .withColumn("__c", col("idf") * tfc * lit(k1 + 1.0) / (tfc + norm))

    // The per-(query, doc) reduction must add contributions in ORD order
    // (the bit-parity contract with the literal form). Each ord occurs at
    // most once per group (qTerms has one row per (query, ord); ≤1
    // posting joins it per doc), which licenses TWO bit-identical shapes:
    //  - SHORT queries (maxOrd < 32 — every realistic probe battery):
    //    a plain column-pivoted HashAggregate — `sum(when(ord = i, c))`
    //    isolates each position's single contribution exactly, and the
    //    final score re-adds the coalesced columns in ord order. Fully
    //    codegen'd, map-side-combinable, no object aggregation: the
    //    collect_list form measured ~6× slower on a 19M-contribution
    //    battery (object agg + per-group sort);
    //  - anything longer: collect_list + the native OrderedContribSum
    //    fold (itself bit-identical to aggregate(array_sort(...))).
    import org.apache.spark.sql.GraftColumnBridge
    val dlAndTf = Seq(max(col("dl")).as("dl"),
      sum(when(col("first_occ"), col("tf")).otherwise(0L)).as("tf_total"))
    val scored =
      if (maxOrd >= 0 && maxOrd < 32) {
        val sums = (0 to maxOrd).map(i => sum(when(col("ord") === i, col("__c"))).as(s"__s$i"))
        val aggs = sums ++ dlAndTf
        contrib.groupBy("query_id", "doc_id")
          .agg(aggs.head, aggs.tail: _*)
          .withColumn("score",
            (0 to maxOrd).map(i => coalesce(col(s"__s$i"), lit(0.0))).reduce(_ + _))
          .select("query_id", "doc_id", "score", "dl", "tf_total")
      } else {
        val aggs = GraftColumnBridge.column(graft.functions.OrderedContribSum(
          GraftColumnBridge.expression(
            collect_list(struct(col("ord").cast("int"), col("__c")))))).as("score") +: dlAndTf
        contrib.groupBy("query_id", "doc_id").agg(aggs.head, aggs.tail: _*)
      }
    Similarity.twoStageTopK(scored, "query_id",
        col("score"), col("doc_id"), k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"),
        col("dl"), col("tf_total"))
  }

  // ---------------------------------------------------------------- index

  /** BM25 POSTING-INDEX store (r14) — the maintenance path that makes
    * retrieval affordable over a GROWING corpus: [[bm25Batch]] re-scans
    * the whole corpus per battery (right for one-shot batteries), while
    * a production deployment indexes once and appends deltas — zero
    * corpus re-scans per search, the incremental-dedup-index doctrine on
    * the lexical plane. Layout (the engine's store conventions: batch-dir
    * data, metadata LAST):
    *
    *   <dir>/meta.json                    {"format":"graft-bm25-index",
    *                                       "version":1,"batches":B,
    *                                       "n":N,"sumdl":S}
    *   <dir>/postings/b<i>/part-….parquet   (term, doc_id, tf, dl)
    *   <dir>/docs/b<i>/part-….parquet       (doc_id, dl)
    *   <dir>/tombstones/b<i>/part-….parquet (doc_id) — deleted docs
    *                                        (r15); readers anti-join,
    *                                        compaction drops physically
    *
    * Postings carry the FULL vocabulary (unlike bm25Batch's
    * battery-filtered build): the delta projects to (id, dl, tokens)
    * ONCE (persisted), feeding both planes' writes. `meta.json` writes
    * LAST and ATOMICALLY (staged sibling + `FileContext` rename — the
    * kerchunk convention), so a reader mid-append sees the old
    * consistent snapshot: batch dirs beyond `batches` are invisible, a
    * crashed append leaves only an orphan dir the next append's
    * overwrite-mode write clobbers, and a crash mid-meta-write can
    * never leave a truncated meta that bricks the store. A REBUILD
    * (`bm25IndexBuild(overwrite = true)`) stages the whole new store in
    * a hidden sibling dir and swaps it in only after the staged meta
    * commits (r15) — a failed rebuild leaves the old index byte-intact.
    * [[bm25SearchIndexed]] reads exactly the meta'd batches, prunes the
    * postings by the battery vocabulary, and runs the SAME retrieval
    * tail as bm25Batch — scores bit-identical to [[bm25TopK]] over the
    * equivalent corpus, which is what the gate pins. Duplicate doc ids
    * (within a delta or vs the store) refuse loudly: posting semantics
    * are per-document. Appends are SINGLE-WRITER (like the kerchunk
    * store): two concurrent appends would race the same batch number's
    * dirs — the optimistic meta recheck before commit turns the common
    * interleaving into a loud refusal, but it is a guard, not a lock. */
  def bm25IndexBuild(docs: DataFrame, textCol: String, idCol: String,
                     dir: String, overwrite: Boolean = false,
                     positions: Boolean = false): Unit = {
    val spark = docs.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val root = graft.sources.FsPaths.hadoopPath(dir)
    val fs = graft.sources.FsPaths.fileSystemFor(root, conf)
    // r16: all mutations run under the store's writer LEASE — the
    // single-writer contract is checked at acquisition, not just by the
    // optimistic meta recheck (which stays behind it as defense in depth)
    graft.sources.StoreMeta.withWriterLock(fs, root, "bm25IndexBuild") {
      // heal a crashed swap BEFORE deciding what's here (r17 — without
      // this, a fresh build saw the crashed swap's empty root as 'nothing
      // here', deleted the staged sibling as stale, and swapped away the
      // parked .old: both recoverable copies destroyed without the
      // overwrite opt-in the healed live store correctly demands below)
      graft.sources.StoreMeta.recoverCrashedSwap(fs, root)
      val metaPath = new org.apache.hadoop.fs.Path(root, "meta.json")
      if (fs.exists(metaPath))
        require(overwrite,
          s"bm25IndexBuild: '$dir' already holds an index — pass overwrite = true " +
            "to rebuild, or bm25IndexAppend to grow it")
      else if (fs.exists(root) && fs.listStatus(root).nonEmpty)
        // a non-empty dir that is NOT a store holds someone else's bytes —
        // the swap below replaces the root, so clobbering it needs the same
        // explicit opt-in a store rebuild does (an empty placeholder dir —
        // the createTempDirectory pattern — replaces silently)
        require(overwrite,
          s"bm25IndexBuild: '$dir' exists, is not a bm25 index, and is not " +
            "empty — pass overwrite = true to replace it")
      // r15: the whole store builds into a hidden STAGED sibling and swaps
      // into place only after the staged meta commits — an encode/write
      // failure mid-rebuild (duplicate ids, executor loss) can no longer
      // destroy the existing index (the r14 delete-then-write window).
      val staged = graft.sources.StoreMeta.stagedSibling(root)
      if (fs.exists(staged)) fs.delete(staged, true) // stale crashed rebuild
      val (n, sumdl) = writeIndexBatch(docs, textCol, idCol, staged.toString,
        batch = 0, positions = positions)
      writeIndexMeta(fs, new org.apache.hadoop.fs.Path(staged, "meta.json"),
        IndexMeta(batches = 1, n = n, sumdl = sumdl, tombBatches = 0,
          positions = positions))
      graft.sources.StoreMeta.swapInto(fs, staged, root)
    }
  }

  /** Append a document delta to an existing index — only the DELTA is
    * scanned; existing batch files never rewrite (the concat dim of a
    * posting store is the document set, so append is pure accretion). */
  def bm25IndexAppend(spark: org.apache.spark.sql.SparkSession, dir: String,
                      newDocs: DataFrame, textCol: String, idCol: String,
                      lockWaitMs: Long = 0L): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = graft.sources.FsPaths.hadoopPath(dir)
    val fs = graft.sources.FsPaths.fileSystemFor(root, conf)
    graft.sources.StoreMeta.withWriterLock(fs, root, "bm25IndexAppend",
        waitMs = lockWaitMs) {
      val metaPath = new org.apache.hadoop.fs.Path(root, "meta.json")
      val meta = readIndexMeta(fs, metaPath, dir)
      // id-collision guard vs the store: a delta-sized semi-join against
      // the docs plane's one pruned column — never a posting-volume scan.
      // Deliberately UNFILTERED by tombstones: re-appending a DELETED id
      // would resurrect it only until the tombstone anti-join killed both
      // its old and new postings — refuse; compaction reclaims the id.
      val oldDocs = readPlane(spark, dir, "docs", meta.batches)
      val clash = newDocs.select(col(idCol).as("doc_id"))
        .join(oldDocs.select("doc_id"), Seq("doc_id"), "left_semi").limit(1).count()
      require(clash == 0L,
        s"bm25IndexAppend: delta re-uses doc ids already in (or deleted " +
          s"from) '$dir' — posting semantics are per-document; assign fresh " +
          "ids, or compact to reclaim deleted ids")
      // the delta inherits the store's positions setting: a positional
      // store's planes must stay aligned batch-for-batch
      val (dn, dsum) = writeIndexBatch(newDocs, textCol, idCol, dir,
        batch = meta.batches, positions = meta.positions)
      // optimistic single-writer recheck BEHIND the lease (defense in
      // depth — it also catches a lease-bypassing legacy writer): if
      // another writer committed while this one wrote its batch dirs,
      // both targeted the SAME batch number — refuse rather than commit
      // a meta whose stats disagree with the interleaved dir contents.
      val now = readIndexMeta(fs, metaPath, dir)
      require(now.batches == meta.batches && now.tombBatches == meta.tombBatches,
        s"bm25IndexAppend: concurrent writer detected on '$dir' (batches " +
          s"${meta.batches} → ${now.batches}, tombstone batches " +
          s"${meta.tombBatches} → ${now.tombBatches} mid-append) — the " +
          "store is single-writer; retry this delta")
      writeIndexMeta(fs, metaPath, meta.copy(batches = meta.batches + 1,
        n = meta.n + dn, sumdl = meta.sumdl + dsum))
    }
  }

  /** DELETE documents from the index (r15) — the takedown/dedup-prune
    * maintenance a production posting store runs daily, WITHOUT the
    * full-corpus rebuild that was the only removal path before: a
    * tombstone batch appends under the store's crash posture (batch dir
    * first, meta LAST and atomic), every reader anti-joins the tombstone
    * plane, and [[bm25IndexCompact]] physically drops the rows and
    * resets the plane. The meta's n/sumdl subtract the deleted docs'
    * stats at commit time, so idf/avgdl — and therefore every score —
    * are BIT-IDENTICAL to a from-scratch rebuild without the deleted
    * rows (the gate's pin). `ids` must be distinct, present, and not
    * already deleted — a double delete would subtract stats twice, so
    * it refuses loudly. Deleted ids stay reserved until a compact
    * (append refuses them — resurrection would race the anti-join). */
  def bm25IndexDelete(spark: org.apache.spark.sql.SparkSession, dir: String,
                      ids: DataFrame, idCol: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = graft.sources.FsPaths.hadoopPath(dir)
    val fs = graft.sources.FsPaths.fileSystemFor(root, conf)
    graft.sources.StoreMeta.withWriterLock(fs, root, "bm25IndexDelete") {
      val metaPath = new org.apache.hadoop.fs.Path(root, "meta.json")
      val meta = readIndexMeta(fs, metaPath, dir)
      // write to a STAGING sibling first, validate from the WRITTEN bytes
      // (the writeBatch convention — a pre-flight validation of a
      // non-deterministic `ids` frame would be TOCTOU), and rename into
      // the live b<tomb> slot only after every check passes (r16; through
      // r15 this wrote b<tomb> directly in overwrite mode, which could
      // clobber a COMMITTED tombstone batch if a concurrent delete had
      // won the race — the lease now forecloses that race, and the
      // staged rename closes it even against a lease-bypassing legacy
      // writer). On any refusal, meta is untouched and the
      // staging dir is an orphan the next delete clobbers.
      val staging = s"$dir/tombstones/b${meta.tombBatches}.staging"
      val delProj = ids.select(col(idCol).as("doc_id"))
      delProj.write.mode("overwrite").parquet(staging)
      // explicit schema so a zero-row write (no part files to infer from)
      // still reads back as an empty frame and refuses below
      val written = spark.read.schema(delProj.schema).parquet(staging)
      // one validation pass: count + distinct + liveness + the Σdl the meta
      // commit needs. The docs plane joins column-pruned (doc_id, dl);
      // already-tombstoned ids read as not-live (their dl row anti-joins
      // away), folding the double-delete case into the liveness refusal.
      val liveDocs = dropTombstoned(spark,
        readPlane(spark, dir, "docs", meta.batches), dir, meta.tombBatches)
      val st = written.join(liveDocs, Seq("doc_id"), "left")
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("nd"),
          sum(when(col("dl").isNotNull, 1L).otherwise(0L)).as("live"),
          coalesce(sum(col("dl")), lit(0L)).as("dsum")).head()
      val dn = st.getLong(0)
      require(dn > 0L, s"bm25IndexDelete: empty id set — nothing to delete in '$dir'")
      require(st.getLong(1) == dn,
        s"bm25IndexDelete: id set has ${dn - st.getLong(1)} duplicates — a " +
          "double delete would subtract corpus stats twice; dedupe ids first")
      require(st.getLong(2) == dn,
        s"bm25IndexDelete: ${dn - st.getLong(2)} ids are not live in '$dir' " +
          "(absent or already deleted) — deletes must name existing documents")
      // the accumulated-tombstone cap (r16): past it, dropTombstoned's
      // broadcast — not this delete — would be the thing that fails, at
      // read time, for every reader; refuse HERE instead and point at
      // compaction, which drops the backlog physically
      require(meta.tombRows + dn <= graft.sources.StoreMeta.TombstoneRowCap,
        s"bm25IndexDelete: '$dir' would hold ${meta.tombRows + dn} tombstone " +
          s"rows, past the ${graft.sources.StoreMeta.TombstoneRowCap} broadcast " +
          "cap — run bm25IndexCompact to reclaim deleted rows first")
      val now = readIndexMeta(fs, metaPath, dir)
      require(now.batches == meta.batches && now.tombBatches == meta.tombBatches,
        s"bm25IndexDelete: concurrent writer detected on '$dir' (batches " +
          s"${meta.batches} → ${now.batches}, tombstone batches " +
          s"${meta.tombBatches} → ${now.tombBatches} mid-delete) — the " +
          "store is single-writer; retry")
      val slot = new org.apache.hadoop.fs.Path(root,
        s"tombstones/b${meta.tombBatches}")
      if (fs.exists(slot)) fs.delete(slot, true) // orphan of a crashed delete
      require(fs.rename(graft.sources.FsPaths.hadoopPath(staging), slot),
        s"bm25IndexDelete: rename '$staging' -> '$slot' failed — meta is " +
          "untouched; the staging dir is an orphan the next delete clobbers")
      writeIndexMeta(fs, metaPath, meta.copy(n = meta.n - dn,
        sumdl = meta.sumdl - st.getLong(3), tombBatches = meta.tombBatches + 1,
        tombRows = meta.tombRows + dn))
    }
  }

  /** Search the index: zero corpus scans — the battery's vocabulary
    * semi-joins the meta'd posting batches and the shared retrieval tail
    * scores them. Output and tie rule match [[bm25TopK]] exactly. */
  def bm25SearchIndexed(spark: org.apache.spark.sql.SparkSession, dir: String,
                        queries: DataFrame, qidCol: String, qtextCol: String,
                        k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
                        scope: CacheScope = CacheScope.untracked): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = graft.sources.FsPaths.hadoopPath(dir)
    val fs = graft.sources.FsPaths.fileSystemFor(root, conf)
    val meta = readIndexMeta(fs,
      new org.apache.hadoop.fs.Path(root, "meta.json"), dir)
    import meta.{batches, n, sumdl, tombBatches => tomb}
    require(n > 0, s"bm25SearchIndexed: index at '$dir' holds no documents")
    val avgdl = sumdl.toDouble / n.toDouble
    val qTerms = batteryTerms(queries, qidCol, qtextCol, scope)
    // battery geometry only — corpus facts come from the meta, so the
    // pre-job cost is ONE tiny action over the persisted occurrences
    val g = qTerms.agg(max(col("ord")), countDistinct(col("term"))).collect()(0)
    val maxOrd = if (g.isNullAt(0)) -1 else g.getInt(0)
    val nTerms = g.getLong(1)
    val postings = readPlane(spark, dir, "postings", batches)
    // ADAPTIVE vocabulary pruning against the term-sorted store:
    //  - human-sized battery (≤1024 distinct terms): a bounded collect
    //    turns the vocabulary into a pushed `term IN (…)` scan filter —
    //    parquet row-group min/max over the sorted layout skip every
    //    posting slice the battery never asks for;
    //  - million-probe battery: the vocabulary stays DATA — semi-join,
    //    full posting scan (the honest cost of a corpus-scale battery).
    // The term pull is a SECOND small action deliberately: folding it
    // into the geometry agg would need a collect_set over the full
    // occurrence stream, whose per-partition set is unbounded exactly
    // when the battery is large — the collect below runs only under the
    // ≤SmallVocabCap guard, so it is bounded by construction.
    val pruned =
      if (nTerms > 0 && nTerms <= SmallVocabCap) {
        val terms = qTerms.select("term").distinct()
          .collect().map(_.getString(0)).sorted.toSeq
        postings.filter(col("term").isin(terms: _*))
      } else
        postings.join(qTerms.select("term").distinct(), Seq("term"), "left_semi")
    // tombstones anti-join AFTER the vocabulary pruning (delta-sized
    // broadcast against the battery's posting slice, not the store) and
    // BEFORE retrieve's df aggregation — per-term df must equal the
    // rebuild-without-deleted-rows value, like meta's n/avgdl already do
    val live = dropTombstoned(spark, pruned, dir, tomb)
    // spread the survivors before the retrieval join (the broadcast-
    // battery fan-out inherits this partitioning — the two-core trap);
    // r18: by doc_id alone, so the (query_id, doc_id) pivot reduction
    // downstream needs no Exchange of the contribution rows (the
    // bm25Batch co-partitioning note)
    val filtered = scope.persisted(
      live.repartition(col("doc_id")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize before planning the retrieval so the cache reports its
    // doc_id partitioning — the bm25Batch exchange-elision note
    filtered.count()
    retrieve(qTerms, filtered, n, avgdl, maxOrd, k1, b, k)
  }

  /** QUOTED-PHRASE BM25 top-k over a POSITIONAL index (r15) — the
    * standard production-retrieval ask the tf plane cannot answer: a
    * phrase matches where its tokens occur CONSECUTIVELY, verified from
    * the stored positions, never from the corpus text (zero corpus
    * scans, the store doctrine).
    *
    * Relational adjacency: each occurrence of phrase term `t` at
    * position `p` with phrase ordinal `ord` votes for start `p − ord`;
    * a start where ALL `L` ordinals voted is a phrase occurrence (each
    * (doc, start, ord) pair occurs at most once — a term's positions
    * are distinct — so one map-side-combinable count per (doc, start)
    * decides). The per-doc occurrence count is the phrase's tf, and the
    * phrase scores as ONE Okapi pseudo-term: df = docs containing it,
    * idf/norm from the meta's live n/avgdl, the shared (score desc,
    * doc_id asc) tie rule. The positions scan prunes by pushed
    * `term IN (…)` over the term-sorted layout exactly like the tf
    * plane; tombstoned docs are anti-joined out of both planes.
    * `phrases` is a driver-sized battery (id → phrase text, tokenized
    * with the corpus tokenizer's contract). PLAN SIZE grows linearly in
    * battery size (one positions-scan branch per phrase — unlike the
    * battery-as-data tf forms), which is the right trade for the
    * documented driver-sized batteries (tens of phrases: each branch
    * prunes to ITS terms' posting slices, where a shared scan would read
    * the union); past a few hundred phrases, prefer batching calls —
    * the per-branch plan cost, not the kernel, is what degrades.
    *
    * `slop` (r16) relaxes adjacency to BANDED PROXIMITY — the NEAR-k
    * query, the other standard positional form: phrase ordinal `i` may
    * sit anywhere in `[start + i, start + i + slop]` instead of exactly
    * at `start + i`, and tf counts the distinct matching starts. slop = 0
    * is exact adjacency (bit-identical to the phrase path — same votes,
    * same scoring). Like Lucene's sloppy phrase, small slops permit
    * insertions between terms; transposed neighbors begin to match at
    * slop ≥ 2 (each displaced within its band). The vote generalizes,
    * never a new plane: term `t` at position `p` with ordinal `i` votes
    * starts `p − i − slop … p − i`, and a start with ALL ordinals voting
    * (counted DISTINCT — at slop > 0 two occurrences of one term can
    * vote the same (start, ordinal)) is a match. Known repeat quirk,
    * shared with classic sloppy-phrase scorers: at slop > 0 a SINGLE
    * occurrence of a repeated term can satisfy several of its ordinals
    * when their bands overlap (one "batch" matches "batch batch"~1) —
    * the ordinals vote independently, not injectively over positions;
    * the gate's oracle re-derives exactly this rule. */
  def bm25PhraseTopK(spark: org.apache.spark.sql.SparkSession, dir: String,
                     phrases: Seq[(String, String)], k: Int = 10,
                     k1: Double = 1.2, b: Double = 0.75,
                     scope: CacheScope = CacheScope.untracked,
                     slop: Int = 0): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = graft.sources.FsPaths.hadoopPath(dir)
    val fs = graft.sources.FsPaths.fileSystemFor(root, conf)
    val meta = readIndexMeta(fs,
      new org.apache.hadoop.fs.Path(root, "meta.json"), dir)
    require(slop >= 0, s"bm25PhraseTopK: slop must be >= 0, got $slop")
    require(meta.positions,
      s"bm25PhraseTopK: index at '$dir' was built without the positions " +
        "plane — rebuild or compact from a build with positions = true")
    require(meta.n > 0, s"bm25PhraseTopK: index at '$dir' holds no documents")
    val perPhrase = parseBattery(phrases)
    val plane = dropTombstoned(spark,
      readPlane(spark, dir, "positions", meta.batches), dir, meta.tombBatches)
    // persisted: the matched (query, doc, tf) rows feed BOTH the df
    // aggregation and the scoring join — without the cache the whole
    // positions scan + double explode + adjacency count re-runs for the
    // second consumer (the batteryTerms/filtered-postings precedent)
    val occurrences = scope.persisted(phraseOccurrences(plane, perPhrase, slop),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    phraseScoreTail(spark, dir, meta, occurrences, k, k1, b)
  }

  /** The Okapi pseudo-term scoring tail shared by [[bm25PhraseTopK]] and
    * [[bm25PhraseBatch]] — ONE copy of the float expression shapes, so
    * the two forms' scores are bit-identical structurally, not by
    * parallel maintenance: per-phrase df as an aggregate + broadcast-back
    * (ONE row per phrase — a window over query_id would funnel a common
    * phrase's full match set through one reducer), then idf/norm from the
    * meta's live n/avgdl and the shared (score desc, doc_id asc) tie
    * rule. `occurrences` carries (query_id, doc_id, tf). */
  private def phraseScoreTail(spark: org.apache.spark.sql.SparkSession,
                              dir: String, meta: IndexMeta,
                              occurrences: DataFrame, k: Int,
                              k1: Double, b: Double): DataFrame = {
    val avgdl = meta.sumdl.toDouble / meta.n.toDouble
    val dfTab = occurrences.groupBy("query_id")
      .agg(count(lit(1)).cast(DoubleType).as("__df"))
    val docsPlane = dropTombstoned(spark,
      readPlane(spark, dir, "docs", meta.batches), dir, meta.tombBatches)
    val norm = lit(k1 * (1 - b)) +
      lit(k1 * b / avgdl) * col("dl").cast(DoubleType)
    val tfc = col("tf").cast(DoubleType)
    val scored = occurrences
      .join(broadcast(dfTab), Seq("query_id"))
      .join(docsPlane, Seq("doc_id"))
      .withColumn("__idf", log(lit(1.0) +
        (lit(meta.n.toDouble) - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))))
      .withColumn("score", col("__idf") * tfc * lit(k1 + 1.0) / (tfc + norm))
    Similarity.twoStageTopK(
        scored.select("query_id", "doc_id", "score", "dl", "tf"), "query_id",
        col("score"), col("doc_id"), k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"),
        col("dl"), col("tf"))
  }

  /** BATTERY-AS-DATA phrase/NEAR retrieval (r17) — [[bm25PhraseTopK]]'s
    * scale sibling, completing the [[bm25Batch]] doctrine on the
    * POSITIONS plane: the battery is a DATAFRAME of (phrase id, phrase
    * text), and the plan is ONE fixed shape — one positions scan, one
    * occurrence join — regardless of battery size, where the per-phrase
    * form plans a positions-scan branch PER PHRASE and degrades on plan
    * size past a few hundred phrases (its documented bound). This is the
    * decontamination shape: thousands-to-millions of eval-set phrase
    * probes swept against the indexed corpus in one job.
    *
    * Identical semantics, relationally: the battery tokenizes IN-PLAN
    * (same [[Dedup.tokens]] contract as the corpus and as the per-phrase
    * form's driver mirror — the bm25TopK/bm25Batch parity precedent) into
    * (query_id, ord, term) occurrence rows; each position `p` of term `t`
    * joined to an ordinal `ord` votes starts `p − ord − slop … p − ord`;
    * a (query, doc, start) with ALL the phrase's ordinals voting (counted
    * DISTINCT at slop > 0, plain at slop = 0 where votes are unique) is a
    * match, and the per-doc match count is the phrase tf. Phrase length
    * rides the occurrence rows as max(ord)+1 per query. Scores are
    * BIT-IDENTICAL to [[bm25PhraseTopK]] over the same battery (integer
    * tf/df into the SHARED [[phraseScoreTail]]) — the gate's pin.
    *
    * Differences owed to battery-as-data (the bm25Batch conventions): a
    * zero-token phrase ranks nothing instead of refusing the whole
    * battery (a million-probe sweep must not abort on one blank probe),
    * and the vocabulary prunes ADAPTIVELY — ≤ [[SmallVocabCap]] distinct
    * terms collect into a pushed `term IN (…)` over the term-sorted
    * layout (row-group skipping); past it the vocabulary stays data and
    * semi-joins (the honest full-plane cost of a corpus-scale battery). */
  def bm25PhraseBatch(spark: org.apache.spark.sql.SparkSession, dir: String,
                      phrases: DataFrame, qidCol: String, qtextCol: String,
                      k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
                      scope: CacheScope = CacheScope.untracked,
                      slop: Int = 0): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = graft.sources.FsPaths.hadoopPath(dir)
    val fs = graft.sources.FsPaths.fileSystemFor(root, conf)
    val meta = readIndexMeta(fs,
      new org.apache.hadoop.fs.Path(root, "meta.json"), dir)
    require(slop >= 0, s"bm25PhraseBatch: slop must be >= 0, got $slop")
    require(meta.positions,
      s"bm25PhraseBatch: index at '$dir' was built without the positions " +
        "plane — rebuild or compact from a build with positions = true")
    require(meta.n > 0, s"bm25PhraseBatch: index at '$dir' holds no documents")
    // battery → persisted (query_id, ord, term) occurrence rows (the
    // bm25Batch front half); one tiny geometry action decides the
    // vocabulary-pruning branch, exactly like bm25SearchIndexed (r19:
    // the battery row count rides the same action — it pre-filters the
    // vote-volume size gate below)
    val qTerms = batteryTerms(phrases, qidCol, qtextCol, scope)
    val qGeo = qTerms.agg(countDistinct(col("term")), count(lit(1))).collect()(0)
    val nTerms = qGeo.getLong(0)
    val batteryRows = qGeo.getLong(1)
    val smallVocab: Option[Seq[String]] =
      if (nTerms > 0 && nTerms <= SmallVocabCap)
        Some(qTerms.select("term").distinct()
          .collect().map(_.getString(0)).sorted.toSeq)
      else None
    def prunedPlane(name: String): DataFrame = {
      val plane = dropTombstoned(spark,
        readPlane(spark, dir, name, meta.batches), dir, meta.tombBatches)
      smallVocab match {
        case Some(terms) => plane.filter(col("term").isin(terms: _*))
        case None => plane.join(qTerms.select("term").distinct(),
          Seq("term"), "left_semi")
      }
    }
    // RAREST-TERM candidate pruning (the classic posting-list
    // intersection order, relationally): a doc can match a phrase only
    // if it holds ALL the phrase's terms, so only docs holding the
    // phrase's LOWEST-df term need their positions inspected. df comes
    // from the TF plane (one row per (term, doc) — no position arrays,
    // no explode), candidates are an equality join on that one term per
    // query, and only candidate (term, doc) position ARRAYS explode.
    // Without this, a battery probe containing a stop word explodes that
    // word's every corpus position times its battery multiplicity —
    // measured 27 s for a 1k-probe battery at sf0.1, vs ~3 s pruned.
    // A query with a corpus-absent term drops out entirely (df = 0 ⇒ no
    // doc can match — both forms emit nothing for it).
    //
    // r18: the battery's posting slice is persisted — it feeds BOTH the
    // df aggregation and the candidate join, so the cache turns two
    // store reads into one (on an object store, two full slice GET
    // sweeps into one). An eager doc_id co-partitioning of this slice
    // (to elide the downstream vote reductions' exchanges) was measured
    // and REJECTED unconditionally: the extra materialization job cost
    // ~+0.5 s at sf0.1 (3×-interleaved A/B, min 4.47-4.61 s vs
    // 4.01-4.33 s persist-only) against exchange savings the fixture
    // keeps in memory anyway. r19 lands it SIZE-GATED (below): the slice
    // carries tf so the vote volume is estimable from its own stats.
    val postPruned = scope.persisted(
      prunedPlane("postings").select("term", "doc_id", "tf"),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // __ctf (the term's total corpus positions among the slice) rides the
    // df aggregation for the size gate's estimate — same shuffle, one
    // extra long per term
    val termDf = postPruned.groupBy("term")
      .agg(count(lit(1)).as("__tdf"), sum(col("tf")).as("__ctf"))
    // per-query rarest term: min over (df, term) — the term tie-break
    // keeps the choice deterministic; an inner join drops absent terms,
    // and the len recheck below drops queries that lost any term to it
    val qDistinct = qTerms.select("query_id", "term").distinct()
    val qLen = qTerms.groupBy("query_id")
      .agg((max(col("ord")) + lit(1)).cast(LongType).as("__len"),
        countDistinct(col("term")).as("__nt"))
    val qRare = qDistinct.join(termDf, Seq("term"))
      .groupBy("query_id")
      .agg(min(struct(col("__tdf"), col("term"))).as("__m"),
        count(lit(1)).as("__present"))
      .join(qLen, Seq("query_id"))
      .filter(col("__present") === col("__nt")) // every term in the corpus
      .select(col("query_id"), col("__m.term").as("term"), col("__len"))
    // r19 SIZE GATE (the r18 rejected lever, fired only when the vote
    // exchange would actually dominate): a battery (query, ord, term)
    // row can emit at most ctf(term) votes — the term's positions over
    // its candidate docs are a subset of its positions over ALL docs —
    // so U = Σ_term mult(term) · ctf(term) × (slop+1) bounds the vote
    // volume from above. Above the threshold, the slice re-spreads by
    // doc_id and materializes so BOTH downstream vote reductions
    // ((query,doc,start) and (query,doc)) plan exchange-free under
    // broadcast battery/positions joins (hashpartitioning(doc_id)
    // satisfies both ClusteredDistributions; a positions slice too big
    // to broadcast shuffle-joins as before and simply forfeits the win).
    // Below it, the r18-shipped persist-only shape runs unchanged. The
    // bound is ONE battery-vocabulary-sized aggregation over the cached
    // slice (its materialization is reused by the main action), run only
    // when the free driver-side bound battery×sumdl×(slop+1) (votes can
    // never exceed it either) clears the threshold; a per-query
    // rarest-df refinement (×df_rarest/df) was measured WORTHLESS on the
    // fixture (26.9M vs U = 27.1M vs 24.3M true — candidate docs hold
    // most postings of a phrase's terms) and needs the whole front half
    // ahead of the main action, so U it is. Default: 2e8 vote rows ≈
    // 8 GB exchanged — the sf0.1 1k battery (U = 27.1M, and measured
    // FASTER without co-partitioning) stays 7× under, while any
    // corpus-scale battery clears it; production tunes
    // spark.graft.phraseVoteCopartitionRows to taste (≤ 0 disables).
    val voteGate = spark.conf.getOption("spark.graft.phraseVoteCopartitionRows")
      .map(_.toLong).getOrElse(200000000L)
    val voteBound = batteryRows.toDouble * meta.sumdl.toDouble * (slop + 1).toDouble
    val estVotes =
      if (voteGate <= 0 || voteBound <= voteGate.toDouble) 0.0
      else qTerms.groupBy("term").agg(count(lit(1)).as("__mult"))
        .join(termDf, Seq("term"))
        .agg(coalesce(sum(col("__mult").cast(DoubleType) * col("__ctf").cast(DoubleType)),
          lit(0.0)))
        .head().getDouble(0) * (slop + 1).toDouble
    val voteSlice =
      if (voteGate > 0 && estVotes > voteGate.toDouble) {
        val spread = scope.persisted(
          postPruned.select("term", "doc_id").repartition(col("doc_id")),
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        spread.count() // materialize: a cold cache hides its partitioning
        spread         // behind an unfinished AQE subplan (the r18 lesson)
      } else postPruned
    val candidates = qRare.join(voteSlice, Seq("term"))
      .select("query_id", "doc_id", "__len")
    // expected occurrences per candidate doc: |candidates| × phrase len —
    // then ONE positions join keyed (term, doc_id) pulls exactly the
    // arrays the vote needs; explode runs per candidate row, never per
    // corpus position of a battery term
    val expected = candidates.join(qTerms.select("query_id", "ord", "term"),
      Seq("query_id"))
    val votes = expected.join(prunedPlane("positions"), Seq("term", "doc_id"))
      .select(col("query_id"), col("doc_id"), col("ord"), col("__len"),
        explode(col("positions")).as("p"))
    val starts =
      if (slop == 0) votes.select(col("query_id"), col("doc_id"),
        (col("p") - col("ord")).as("start"), col("ord"), col("__len"))
      else votes.select(col("query_id"), col("doc_id"),
        explode(sequence(col("p") - col("ord") - lit(slop),
          col("p") - col("ord"))).as("start"), col("ord"), col("__len"))
    // slop = 0 votes are unique per (query, doc, start, ord) — a term's
    // positions are distinct and each (term, ord) pairing is one battery
    // row — so the plain count IS the distinct count (the
    // phraseOccurrences rule, same reasoning)
    val nOrd = if (slop == 0) count(lit(1)) else count_distinct(col("ord"))
    val occurrences = scope.persisted(
      starts.filter(col("start") >= 0)
        .groupBy("query_id", "doc_id", "start")
        .agg(nOrd.as("__nOrd"), max(col("__len")).as("__l"))
        .filter(col("__nOrd") === col("__l"))
        .groupBy("query_id", "doc_id").agg(count(lit(1)).as("tf")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    phraseScoreTail(spark, dir, meta, occurrences, k, k1, b)
  }

  /** Matched (query_id, doc_id, tf) rows for a phrase battery over the
    * positions plane — the relational adjacency/proximity vote shared by
    * [[bm25PhraseTopK]] and [[bm25PhraseModelFromIndex]] (one copy of
    * the start-band / all-ordinals-present rule). At `slop = 0` each
    * (doc, start, ord) vote is unique (a term's positions are distinct),
    * so the count IS the distinct-ordinal count; at `slop > 0` a term's
    * two occurrences can vote the same (start, ord) band — votes dedupe
    * before the all-ordinals test, keeping the rule one-per-ordinal. */
  private def phraseOccurrences(plane: DataFrame,
                                perPhrase: Seq[(String, Seq[String])],
                                slop: Int = 0): DataFrame =
    perPhrase.map { case (qid, ts) =>
      val terms = ts.distinct
      // ordinal list per term — a REPEATED phrase term shifts by each of
      // its ordinals, so "the the" still demands two distinct votes
      val ordsOf: Map[String, Seq[Int]] =
        ts.zipWithIndex.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val ordArr = terms.map(t =>
          when(col("term") === t, array(ordsOf(t).map(lit): _*)))
        .reduce((a, b) => coalesce(a, b))
      val votes = plane.filter(col("term").isin(terms: _*))
        .select(col("doc_id"), col("term"), explode(col("positions")).as("p"))
        .select(col("doc_id"), col("p"), explode(ordArr).as("ord"))
      val starts =
        if (slop == 0) votes.select(col("doc_id"), (col("p") - col("ord")).as("start"),
          col("ord"))
        else votes.select(col("doc_id"),
          explode(sequence(col("p") - col("ord") - lit(slop),
            col("p") - col("ord"))).as("start"), col("ord"))
      // at slop = 0 each (doc, start, ord) vote is unique (a term's
      // positions are distinct), so the plain count IS the distinct
      // count — keep the exact-phrase hot path free of the distinct
      // aggregate's extra expand
      val nOrd = if (slop == 0) count(lit(1)) else count_distinct(col("ord"))
      starts.filter(col("start") >= 0)
        .groupBy("doc_id", "start").agg(nOrd.as("__nOrd"))
        .filter(col("__nOrd") === ts.length)
        .groupBy("doc_id").agg(count(lit(1)).as("tf"))
        .select(lit(qid).as("query_id"), col("doc_id"), col("tf"))
    }.reduce(_ unionByName _)

  /** Frozen phrase statistics for a battery — what a deployment derives
    * ONCE from a positional index and then applies to any batch or
    * stream ([[bm25PhraseScore]]): per-phrase idf (df = documents
    * containing the phrase, from the positions plane — zero corpus
    * scans) plus the corpus N/avgdl from the meta, and the `slop` the
    * battery was derived at (r16 — df and the scorer's row-local tf
    * must use ONE proximity rule or the score bits drift). The
    * [[bm25ModelFromIndex]] sibling on the phrase plane. */
  final case class PhraseModel(k1: Double, b: Double, n: Long, avgdl: Double,
                               phrases: Seq[(String, Seq[String])],
                               idf: Array[Double], slop: Int = 0)

  def bm25PhraseModelFromIndex(spark: org.apache.spark.sql.SparkSession,
                               dir: String, phrases: Seq[(String, String)],
                               k1: Double = 1.2, b: Double = 0.75,
                               slop: Int = 0): PhraseModel = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = graft.sources.FsPaths.hadoopPath(dir)
    val fs = graft.sources.FsPaths.fileSystemFor(root, conf)
    val meta = readIndexMeta(fs,
      new org.apache.hadoop.fs.Path(root, "meta.json"), dir)
    require(slop >= 0, s"bm25PhraseModelFromIndex: slop must be >= 0, got $slop")
    require(meta.positions,
      s"bm25PhraseModelFromIndex: index at '$dir' was built without the " +
        "positions plane — rebuild or compact from a build with positions = true")
    require(meta.n > 0, s"bm25PhraseModelFromIndex: index at '$dir' holds no documents")
    val perPhrase = parseBattery(phrases)
    val plane = dropTombstoned(spark,
      readPlane(spark, dir, "positions", meta.batches), dir, meta.tombBatches)
    // one bounded collect: ONE row per phrase (battery is driver-sized)
    val dfByPhrase: Map[String, Long] = phraseOccurrences(plane, perPhrase, slop)
      .groupBy("query_id").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the SAME idf arithmetic bm25PhraseTopK runs in-plan (StrictMath
    // through Spark's log; zero-match phrases get the df = 0 idf, the
    // bm25ModelFromIndex convention) — scores stay bit-identical
    val idf = perPhrase.map { case (qid, _) =>
      idfOf(meta.n, dfByPhrase.getOrElse(qid, 0L).toDouble)
    }.toArray
    PhraseModel(k1, b, meta.n, meta.sumdl.toDouble / meta.n.toDouble, perPhrase,
      idf, slop)
  }

  /** Score a document frame — batch OR `readStream` — against a frozen
    * [[PhraseModel]]: (query_id, doc_id, score, dl, tf) rows for docs
    * containing the phrase at least once, tf computed ROW-LOCALLY from
    * the doc's own tokens (the codegen'd
    * [[graft.functions.PhraseCount]] adjacency kernel at the model's
    * `slop` — same banded-proximity, overlap, and repeated-term
    * semantics as the positional index's vote, exact at slop = 0).
    * STATELESS, so the same call is the streaming twin with
    * byte-identical scores (the [[bm25Score]] precedent); and over the
    * indexed corpus itself the rows are BIT-IDENTICAL to
    * [[bm25PhraseTopK]]'s scored surface minus the ranking (same
    * tokens → same tf; same df/N/avgdl through the same StrictMath
    * idf; same expression shapes — spec-pinned). */
  def bm25PhraseScore(docs: DataFrame, textCol: String, idCol: String,
                      model: PhraseModel): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val toks = coalesce(Dedup.tokens(col(textCol)), array().cast("array<string>"))
    val base = docs.select(col(idCol).as("doc_id"), toks.as("__toks"),
      size(toks).cast(LongType).as("dl"))
    val norm = lit(model.k1 * (1 - model.b)) +
      lit(model.k1 * model.b / model.avgdl) * col("dl").cast(DoubleType)
    model.phrases.zipWithIndex.map { case ((qid, ts), i) =>
      val tf = GraftColumnBridge.column(graft.functions.PhraseCount(
        GraftColumnBridge.expression(col("__toks")), ts, model.slop))
      base.withColumn("tf", tf.cast(LongType))
        .filter(col("tf") > 0)
        .withColumn("score", lit(model.idf(i)) * col("tf").cast(DoubleType) *
          lit(model.k1 + 1.0) / (col("tf").cast(DoubleType) + norm))
        .select(lit(qid).as("query_id"), col("doc_id"), col("score"),
          col("dl"), col("tf"))
    }.reduce(_ unionByName _)
  }

  /** BATTERY-AS-DATA twin of [[bm25PhraseScore]] (r17), completing the
    * doctrine on the SCORER plane: [[bm25PhraseScore]] plans one
    * [[graft.functions.PhraseCount]] branch + one corpus pass PER
    * phrase, so a decontamination-sized battery (thousands of eval
    * n-gram probes) degrades on plan size exactly like the pre-r17
    * positional retrieval did. Here the whole battery rides INSIDE one
    * [[graft.functions.PhraseCountBatch]] expression (first-token-gated
    * candidate pruning — the row-local mirror of bm25PhraseBatch's
    * rarest-term join), and the phrase ids / idf table ride as two
    * array LITERALS indexed in-plan — ONE corpus pass, constant plan
    * shape at any battery size. Same (query_id, doc_id, score, dl, tf)
    * surface, STATELESS (the same call is the streaming twin), and
    * rows are BIT-IDENTICAL to [[bm25PhraseScore]] on the same model:
    * one shared adjacency kernel ([[graft.functions.PhraseKernel]])
    * and the same float expression shapes with the scalar idf literal
    * replaced by an array-literal extraction of the same double.
    * One battery-as-data divergence: an EMPTY phrase scores nothing
    * instead of refusing the sweep (the bm25Batch blank-probe rule;
    * the per-phrase form's [[graft.functions.PhraseCount]] refuses). */
  def bm25PhraseScoreBatch(docs: DataFrame, textCol: String, idCol: String,
                           model: PhraseModel): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val toks = coalesce(Dedup.tokens(col(textCol)), array().cast("array<string>"))
    val hitsExpr = GraftColumnBridge.column(graft.functions.PhraseCountBatch(
      GraftColumnBridge.expression(toks), model.phrases.map(_._2), model.slop))
    val norm = lit(model.k1 * (1 - model.b)) +
      lit(model.k1 * model.b / model.avgdl) * col("dl").cast(DoubleType)
    val qidLit = typedLit(model.phrases.map(_._1))
    val idfLit = typedLit(model.idf.toSeq)
    docs.select(col(idCol).as("doc_id"),
        size(toks).cast(LongType).as("dl"), hitsExpr.as("__hits"))
      .select(col("doc_id"), col("dl"), explode(col("__hits")).as("__h"))
      .withColumn("tf", col("__h.tf").cast(LongType))
      .withColumn("score", idfLit.getItem(col("__h.phrase")) *
        col("tf").cast(DoubleType) * lit(model.k1 + 1.0) /
        (col("tf").cast(DoubleType) + norm))
      .select(qidLit.getItem(col("__h.phrase")).as("query_id"),
        col("doc_id"), col("score"), col("dl"), col("tf"))
  }

  /** Derive a frozen [[Bm25Model]] from the index — ZERO corpus scans
    * (df per battery term from a vocabulary-pruned posting read; N and
    * avgdl from the meta), so [[bm25Score]] can score a STREAM against
    * an indexed corpus's statistics. idf bits equal [[bm25Model]]'s
    * corpus-scan build exactly (same StrictMath.log, same integers). */
  def bm25ModelFromIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                         queries: Seq[(String, String)],
                         k1: Double = 1.2, b: Double = 0.75): Bm25Model = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = graft.sources.FsPaths.hadoopPath(dir)
    val fs = graft.sources.FsPaths.fileSystemFor(root, conf)
    val meta = readIndexMeta(fs,
      new org.apache.hadoop.fs.Path(root, "meta.json"), dir)
    require(meta.n > 0, s"bm25ModelFromIndex: index at '$dir' holds no documents")
    val perQuery = parseBattery(queries)
    val allTerms = perQuery.flatMap(_._2).distinct.sorted
    val dfByTerm: Map[String, Long] = dropTombstoned(spark,
        readPlane(spark, dir, "postings", meta.batches)
          .filter(col("term").isin(allTerms: _*)), dir, meta.tombBatches)
      .groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val idf = allTerms.map(t => idfOf(meta.n, dfByTerm.getOrElse(t, 0L).toDouble)).toArray
    Bm25Model(k1, b, meta.sumdl.toDouble / meta.n.toDouble, allTerms, idf, perQuery)
  }

  /** One delta TOKENIZATION → docs + postings batch dirs (overwrite
    * mode, so an orphan dir from a crashed append clobbers): the
    * (id, dl, tokens) projection persists once and feeds both planes'
    * writes — the delta text tokenizes exactly once per build/append.
    * Returns (rows, Σdl) of the delta, computed from the WRITTEN docs
    * files (validating the write). Refuses duplicate ids within the
    * delta. */
  private def writeIndexBatch(docs: DataFrame, textCol: String, idCol: String,
                              dir: String, batch: Int,
                              positions: Boolean): (Long, Long) = {
    val spark = docs.sparkSession
    val toks = coalesce(Dedup.tokens(col(textCol)), array().cast("array<string>"))
    val projected = docs
      .select(col(idCol).as("doc_id"), size(toks).cast(LongType).as("dl"),
        toks.as("__toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      projected.select(col("doc_id"), col("dl"))
        .write.mode("overwrite").parquet(s"$dir/docs/b$batch")
      projected.select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
        .groupBy("term", "doc_id")
        .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
        .select(col("term"), col("doc_id"), col("tf"), col("dl"))
        // TERM-SORTED layout: co-locate each term's postings and sort
        // within files, so parquet row-group min/max statistics make a
        // pushed `term IN (…)` scan skip everything a selective battery
        // does not ask for — the difference between reading a battery's
        // slice and reading the whole store at 100 TB
        .repartition(col("term"))
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite").parquet(s"$dir/postings/b$batch")
      if (positions)
        // the POSITIONS plane (r15, opt-in): (term, doc_id, positions
        // sorted ascending) — what quoted-phrase retrieval needs and the
        // tf plane cannot answer. Same term-sorted layout, so a phrase's
        // `term IN (…)` scan prunes identically; token order ships as
        // 0-based posexplode ordinals of the SAME tokenization the
        // postings came from (one shared persisted projection).
        projected.select(col("doc_id"), posexplode(col("__toks")))
          .select(col("doc_id"), col("col").as("term"), col("pos"))
          .groupBy("term", "doc_id")
          .agg(sort_array(collect_list(col("pos"))).as("positions"))
          .repartition(col("term"))
          .sortWithinPartitions("term", "doc_id")
          .write.mode("overwrite").parquet(s"$dir/positions/b$batch")
    } finally projected.unpersist(false)
    val st = spark.read.parquet(s"$dir/docs/b$batch")
      .agg(count(lit(1)), sum(col("dl")), countDistinct(col("doc_id"))).collect()(0)
    val dn = st.getLong(0)
    require(dn == 0L || st.getLong(2) == dn,
      s"bm25 index: delta has ${dn - st.getLong(2)} duplicate doc ids — " +
        "posting semantics are per-document; dedupe ids first")
    (dn, if (st.isNullAt(1)) 0L else st.getLong(1))
  }

  /** Compact a many-batch posting index into a fresh single-batch store
    * at `dstDir` — the small-files maintenance of an append-heavy store
    * (each append adds a batch dir; a thousand appends later every search
    * opens a thousand footers AND loses cross-batch row-group pruning).
    * Postings rewrite GLOBALLY term-sorted (the per-batch layout only
    * sorts within each batch, so a selective battery's `term IN (…)` scan
    * skips row groups per batch; after compaction it skips across the
    * whole store). Tokenization never re-runs — the rows are already
    * postings; N/sumdl carry over from the source meta and the rewrite is
    * validated against it before the destination meta commits (LAST). The
    * source store is never touched: compact-to-sibling + caller swap is
    * the crash-safe shape. */
  def bm25IndexCompact(spark: org.apache.spark.sql.SparkSession,
                       srcDir: String, dstDir: String,
                       overwrite: Boolean = false,
                       lockWaitMs: Long = 0L): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcRoot = graft.sources.FsPaths.hadoopPath(srcDir)
    val srcFs = graft.sources.FsPaths.fileSystemFor(srcRoot, conf)
    val srcMetaPath = new org.apache.hadoop.fs.Path(srcRoot, "meta.json")
    val srcMeta = readIndexMeta(srcFs, srcMetaPath, srcDir)
    import srcMeta.{batches, n, sumdl, tombBatches => tomb}
    val dstRoot = graft.sources.FsPaths.hadoopPath(dstDir)
    val dstFs = graft.sources.FsPaths.fileSystemFor(dstRoot, conf)
    // a same-path "compact" with overwrite would DELETE the source before
    // reading it — the one way this maintenance op could lose the store
    require(srcFs.makeQualified(srcRoot) != dstFs.makeQualified(dstRoot),
      s"bm25IndexCompact: source and destination are the same store " +
        s"('$srcDir') — compact to a sibling and swap")
    val dstMeta = new org.apache.hadoop.fs.Path(dstRoot, "meta.json")
    graft.sources.StoreMeta.withWriterLock(dstFs, dstRoot, "bm25IndexCompact",
        waitMs = lockWaitMs) {
      if (dstFs.exists(dstMeta)) {
        require(overwrite,
          s"bm25IndexCompact: '$dstDir' already holds an index — pass overwrite = true")
        dstFs.delete(dstRoot, true)
      } else if (dstFs.exists(dstRoot) && dstFs.listStatus(dstRoot).nonEmpty)
        // the r15 build-side rule applies here too: writing store planes
        // among someone else's bytes turns their dir into a "store" a later
        // overwrite would delete wholesale — refuse unless told to clobber
        require(overwrite,
          s"bm25IndexCompact: '$dstDir' exists, is not a bm25 index, and is " +
            "not empty — pass overwrite = true to replace it")
      // tombstoned docs DROP PHYSICALLY here (the reclamation path): both
      // planes rewrite through the anti-join, and the destination resets
      // tombBatches to 0 — after a compact the deleted ids are free again
      dropTombstoned(spark, readPlane(spark, srcDir, "docs", batches), srcDir, tomb)
        .write.mode("overwrite").parquet(s"$dstDir/docs/b0")
      dropTombstoned(spark, readPlane(spark, srcDir, "postings", batches), srcDir, tomb)
        // RANGE partition + in-file sort = truly term-sorted across the
        // whole plane (file ordinals cover disjoint term ranges), so
        // row-group min/max skipping is as tight as the layout allows
        .repartitionByRange(col("term"), col("doc_id"))
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite").parquet(s"$dstDir/postings/b0")
      // validate BOTH planes before committing: docs against the source
      // meta's stats (which are live-row stats — the delete already
      // subtracted, so this equality also validates the tombstone drop),
      // postings by row count against the source's live read
      val st = spark.read.parquet(s"$dstDir/docs/b0")
        .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).collect()(0)
      require(st.getLong(0) == n && st.getLong(1) == sumdl,
        s"bm25IndexCompact: rewrote ${st.getLong(0)} docs / Σdl ${st.getLong(1)} " +
          s"but '$srcDir' meta says $n / $sumdl — source torn or write " +
          "incomplete; not committing")
      val srcPostings = dropTombstoned(spark,
        readPlane(spark, srcDir, "postings", batches), srcDir, tomb).count()
      val dstPostings = spark.read.parquet(s"$dstDir/postings/b0").count()
      require(srcPostings == dstPostings,
        s"bm25IndexCompact: rewrote $dstPostings postings of $srcPostings — " +
          "write incomplete; not committing")
      // the positions plane (if present) compacts alongside, same layout
      // discipline and the same count validation
      if (srcMeta.positions) {
        dropTombstoned(spark, readPlane(spark, srcDir, "positions", batches),
            srcDir, tomb)
          .repartitionByRange(col("term"), col("doc_id"))
          .sortWithinPartitions("term", "doc_id")
          .write.mode("overwrite").parquet(s"$dstDir/positions/b0")
        val srcPos = dropTombstoned(spark,
          readPlane(spark, srcDir, "positions", batches), srcDir, tomb).count()
        val dstPos = spark.read.parquet(s"$dstDir/positions/b0").count()
        require(srcPos == dstPos,
          s"bm25IndexCompact: rewrote $dstPos position rows of $srcPos — " +
            "write incomplete; not committing")
      }
      // optimistic recheck (the append convention): an append or delete
      // landing on the source mid-compact would otherwise vanish at the
      // caller's swap
      val now = readIndexMeta(srcFs, srcMetaPath, srcDir)
      require(now.batches == batches && now.tombBatches == tomb,
        s"bm25IndexCompact: '$srcDir' moved ($batches → ${now.batches} " +
          s"batches, $tomb → ${now.tombBatches} tombstone batches) " +
          "mid-compact — re-run to include the new writes")
      // tombRows resets with the plane: the destination holds zero
      // tombstones, so the broadcast-cap ledger restarts from a clean slate
      writeIndexMeta(dstFs, dstMeta, srcMeta.copy(batches = 1, tombBatches = 0,
        tombRows = 0L))
    }
  }

  /** One-row OPERATIONAL snapshot of a posting store (r17) — the
    * inspection op that completes the lifecycle (build / append / delete
    * / compact / search / STATS): live corpus stats straight from the
    * meta (`docs`, `sumdl`, `avgdl` — delete-adjusted, so they equal a
    * from-scratch rebuild without the deleted rows), EXACT vocabulary and
    * posting-row counts from a tombstone-dropped scan of the postings
    * plane (`terms`, `postings` — exact, not sketched, so the numbers are
    * oracle-checkable against the raw corpus; one full postings-plane
    * scan + one distinct shuffle is the honest, explicitly-invoked cost
    * of exact stats at any scale), and the maintenance gauges a deployment
    * watches (`batches`, `tomb_batches`, `tomb_rows` — the
    * [[graft.sources.StoreMeta.TombstoneRowCap]] backlog — and the
    * `positions` capability flag). Read-only: no lease taken; a crashed
    * swap heals on the meta read like every other reader. */
  def bm25IndexStats(spark: org.apache.spark.sql.SparkSession,
                     dir: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = graft.sources.FsPaths.hadoopPath(dir)
    val fs = graft.sources.FsPaths.fileSystemFor(root, conf)
    val meta = readIndexMeta(fs, new org.apache.hadoop.fs.Path(root, "meta.json"), dir)
    dropTombstoned(spark, readPlane(spark, dir, "postings", meta.batches),
        dir, meta.tombBatches)
      .agg(countDistinct(col("term")).as("terms"),
        count(lit(1)).as("postings"))
      .select(lit(meta.n).as("docs"), lit(meta.sumdl).as("sumdl"),
        // a fully-deleted store (n = 0, legal: stats must still report)
        // shows avgdl as NULL, never NaN
        (if (meta.n > 0) lit(meta.sumdl.toDouble / meta.n.toDouble)
         else lit(null).cast(DoubleType)).as("avgdl"),
        col("terms"), col("postings"),
        lit(meta.batches).as("batches"),
        lit(meta.tombBatches).as("tomb_batches"),
        lit(meta.tombRows).as("tomb_rows"),
        lit(meta.positions).as("positions"))
  }

  /** One plane's batch dirs (`<dir>/<plane>/b0..b<batches-1>`) as one
    * frame — the store layout expression, in one place. */
  private def readPlane(spark: org.apache.spark.sql.SparkSession, dir: String,
                        plane: String, batches: Int): DataFrame =
    spark.read.parquet((0 until batches).map(i => s"$dir/$plane/b$i"): _*)

  /** Atomic meta commit via [[graft.sources.StoreMeta]] (the kerchunk
    * convention): a crash mid-write leaves the OLD meta readable; a
    * truncate-in-place create would brick the store (empty meta =
    * unparseable forever AND 'already holds an index' on rebuild). */
  /** The store's self-description: batch/tombstone-batch counts, live
    * corpus stats, accumulated tombstone rows (r16 — the
    * [[graft.sources.StoreMeta.TombstoneRowCap]] guard's ledger), and
    * whether the positions plane exists. */
  private final case class IndexMeta(batches: Int, n: Long, sumdl: Long,
                                     tombBatches: Int, positions: Boolean,
                                     tombRows: Long = 0L)

  private def writeIndexMeta(fs: org.apache.hadoop.fs.FileSystem,
                             metaPath: org.apache.hadoop.fs.Path,
                             meta: IndexMeta): Unit =
    graft.sources.StoreMeta.atomicWriteJson(fs, metaPath,
      s"""{"format": "graft-bm25-index", "version": 1, """ +
        s""""batches": ${meta.batches}, "n": ${meta.n}, """ +
        s""""sumdl": ${meta.sumdl}, "tombBatches": ${meta.tombBatches}, """ +
        s""""tombRows": ${meta.tombRows}, "positions": ${meta.positions}}""")

  /** `n`/`sumdl` are the LIVE corpus stats — [[bm25IndexDelete]] subtracts
    * the deleted docs' count and Σdl when it commits a tombstone batch, so
    * idf/avgdl always equal a from-scratch rebuild without the deleted
    * rows. `tombBatches` (0), `tombRows` (0), and `positions` (false) are
    * absent in pre-r16 stores — fully readable. Before reading, a crashed
    * rebuild swap auto-completes ([[graft.sources.StoreMeta
    * .recoverCrashedSwap]] — staged meta committed ⇒ the rebuilt store is
    * authoritative), so any reader or writer heals the store. */
  private def readIndexMeta(fs: org.apache.hadoop.fs.FileSystem,
                            metaPath: org.apache.hadoop.fs.Path,
                            dir: String): IndexMeta = {
    graft.sources.StoreMeta.recoverCrashedSwap(fs, metaPath.getParent)
    // a LIVE writer mid-swap is the one transient state left: wait out
    // the two-rename window (bounded) instead of refusing (r17)
    graft.sources.StoreMeta.awaitSwapWindow(fs, metaPath.getParent)
    require(fs.exists(metaPath),
      s"'$dir' is not a bm25 index (no meta.json — build one with bm25IndexBuild)")
    // an unknown layout version refuses loudly inside parseChecked —
    // batches/n/sumdl could mean something else under a future layout
    val j = graft.sources.StoreMeta.parseChecked(fs, metaPath, dir,
      "graft-bm25-index", version = 1L)
    def long(field: String): Long = graft.sources.StoreMeta.longField(j, field, dir)
    IndexMeta(long("batches").toInt, long("n"), long("sumdl"),
      graft.sources.StoreMeta.longFieldOr(j, "tombBatches", dir, 0L).toInt,
      graft.sources.StoreMeta.boolFieldOr(j, "positions", dir, default = false),
      graft.sources.StoreMeta.longFieldOr(j, "tombRows", dir, 0L))
  }

  /** Live view of a plane keyed by `doc_id` — the shared
    * [[graft.sources.StoreMeta.dropTombstoned]] convention over this
    * store's tombstone plane layout. */
  private def dropTombstoned(spark: org.apache.spark.sql.SparkSession,
                             df: DataFrame, dir: String,
                             tombBatches: Int): DataFrame =
    graft.sources.StoreMeta.dropTombstoned(df, "doc_id",
      if (tombBatches == 0) None
      else Some(readPlane(spark, dir, "tombstones", tombBatches)))
}
