package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Stupid-backoff n-gram language model for perplexity filtering — the
  * CCNet-recipe companion to the [[TextClassifier]] quality plane (CCNet
  * filters on LM perplexity against a clean reference corpus; fineweb-edu
  * adds the classifier; a complete training-data pipeline needs both).
  * Scoring semantics live in [[graft.functions.NgramLmScore]] (Brants et
  * al. 2007's stupid backoff, α = 0.4).
  *
  * Scale shape (same split as [[BpeTokenizer]]):
  *  - TRAINING is one corpus scan: every document emits its uni/bi/tri
  *    grams into ONE exploded column, one map-side-combined
  *    `groupBy(gram)` shuffle counts them, and the aggregated counts
  *    frame (distinct grams — orders of magnitude smaller than the
  *    corpus) is persisted for the three capped pulls + the total-token
  *    sum, then dropped. Nothing else grows with corpus size.
  *  - the MODEL is frequency-capped per order (count desc, gram asc —
  *    deterministic in any engine): the caps bound driver memory and
  *    plan size; a capped-away gram simply backs off, costing score
  *    accuracy on the rarest grams, never correctness. A real filter
  *    trains on a curated reference corpus (CCNet uses Wikipedia), so
  *    the caps rarely bind.
  *  - SCORING is a pure scan expression — zero joins, zero shuffle,
  *    zero UDFs; the 100 TB pass is embarrassingly parallel.
  */
object NgramLm {

  /** Capped n-gram count tables + the pre-cap total token count.
    *
    * r11: the tables are primitive open-addressed xxhash64→count maps
    * ([[graft.functions.GramTable]] — collision story and broadcast-size
    * numbers there), not boxed `Map[String, Long]`: at the default caps
    * the broadcast shrank from ~0.5-1 GB of java object graph to ≤
    * 320 MB of long arrays, and the scoring hot loop does primitive
    * probes on per-position token hashes instead of building and
    * String-hashing a gram string three times per token. The census is
    * bit-identical (same counts → same integer hits and log-scores). */
  final case class LmModel(uni: graft.functions.GramTable, bi: graft.functions.GramTable,
                           tri: graft.functions.GramTable, totalTokens: Long)

  /** Count uni/bi/trigrams over the corpus in ONE scan and build the
    * frequency-capped model. Caps pick the top-k grams per order by
    * (count desc, gram asc) — deterministic, SQL-mirrorable.
    *
    * r19: the capped pulls and the total-token sum are ONE distributed
    * job — a per-order bounded-heap top-k ([[graft.functions.TopKRows]],
    * the r18 retrieval-tail aggregate) and `sum(n)` ride the same
    * `groupBy(ord)` — where the r18 form persisted the counts frame and
    * ran FOUR driver actions over it (three TakeOrderedAndProject pulls
    * + the total sum). Same single corpus scan, 4 job rounds → 1, and
    * the distinct-gram counts frame no longer occupies executor storage
    * at all (at corpus scale the pre-cap gram set is the big object
    * here; the caps bound only the pulled model). The heap's
    * (count desc, gram asc) order is the pulls' exact order — count
    * rides the heap as a double, exact for counts below 2^53 (a corpus
    * with 9e15 occurrences of one gram is ~450 PB of text), and the
    * tie-break compares the gram string itself; the pulled (gram, n)
    * pairs carry the ORIGINAL long count in the heap payload, so the
    * model's tables are bit-identical to the TakeOrdered form's
    * (NgramLmSpec pins fused-vs-unfused equality incl. cap-boundary
    * count ties). */
  def train(df: DataFrame, textCol: String,
            maxUnigrams: Int = 1000000,
            maxBigrams: Int = 2000000,
            maxTrigrams: Int = 2000000): LmModel = {
    require(maxUnigrams > 0 && maxBigrams > 0 && maxTrigrams > 0,
      "NgramLm.train: caps must be positive")
    val toks = coalesce(Dedup.tokens(col(textCol)), array().cast("array<string>"))
    def grams(order: Int) =
      when(size(col("__t")) >= order,
        transform(sequence(lit(0), size(col("__t")) - order), i =>
          concat_ws(" ", (0 until order).map(k => element_at(col("__t"), i + k + 1)): _*)))
        .otherwise(array().cast("array<string>"))
    val counts = df
      .select(toks.as("__t"))
      .select(explode(concat(col("__t"), grams(2), grams(3))).as("g"))
      .groupBy("g").agg(count(lit(1)).as("n"))
      // a token never contains whitespace, so the space count IS the order
      .withColumn("ord", size(split(col("g"), " ")))
    import org.apache.spark.sql.GraftColumnBridge
    val kMax = math.max(maxUnigrams, math.max(maxBigrams, maxTrigrams))
    val packed = struct(col("n").cast(DoubleType).as("__sc"),
      col("g").as("__id"), struct(col("n")).as("__pl"))
    val topk = GraftColumnBridge.column(graft.functions.TopKRows(
      GraftColumnBridge.expression(packed), kMax))
    // one action: per-order top-kMax heaps (trimmed to each order's cap
    // at the driver — a sorted heap prefix IS the TakeOrdered result)
    // + the pre-cap total, collected as ≤ 3 rows
    val byOrd = counts.groupBy("ord")
      .agg(topk.as("__tk"), sum("n").as("__tot"))
      .collect().map(r => r.getInt(0) -> r).toMap
    def table(ord: Int, cap: Int): graft.functions.GramTable =
      graft.functions.GramTable.build(
        byOrd.get(ord) match {
          case Some(r) => r.getSeq[org.apache.spark.sql.Row](1).take(cap)
            .map(e => e.getString(1) -> e.getStruct(2).getLong(0)).toArray
          case None => Array.empty[(String, Long)]
        })
    val total = byOrd.get(1).map(_.getLong(2)).getOrElse(0L)
    require(total > 0L, "NgramLm.train: corpus has no tokens")
    LmModel(table(1, maxUnigrams), table(2, maxBigrams), table(3, maxTrigrams), total)
  }

  /** Score every document: (id, n_pos, tri_hits, bi_hits, uni_hits, unk,
    * logscore, perplexity). The level counters are integer facts about
    * the capped count tables (the hash-exact gate surface); perplexity =
    * 10^(−logscore/n_pos), null for a tokenless doc. One scan, zero
    * shuffle. */
  def score(df: DataFrame, textCol: String, idCol: String, model: LmModel): DataFrame = {
    // broadcast, don't plan-embed: the capped model can still be 100s of
    // MB; the plan carries an O(1) handle (see NgramLmScore's scaladoc)
    val bModel = df.sparkSession.sparkContext.broadcast(model)
    df.select(col(idCol).as("id"), scoreStruct(col(textCol), bModel).as("__s"))
      .select(col("id"),
        col("__s.n_pos").as("n_pos"), col("__s.tri_hits").as("tri_hits"),
        col("__s.bi_hits").as("bi_hits"), col("__s.uni_hits").as("uni_hits"),
        col("__s.unk").as("unk"), col("__s.logscore").as("logscore"))
      .withColumn("perplexity",
        when(col("n_pos") > 0L,
          pow(lit(10.0), -col("logscore") / col("n_pos").cast(DoubleType)))
          .otherwise(lit(null).cast(DoubleType)))
  }

  /** The raw scoring struct (n_pos, tri_hits, bi_hits, uni_hits, unk,
    * logscore) as ONE column over the raw text — the column-level form
    * [[score]] flattens, exposed so a composed quality gate can run
    * every filter plane in a single scan. The caller owns the broadcast
    * (one `sparkContext.broadcast(model)` per model, reusable across
    * queries). */
  def scoreStruct(text: org.apache.spark.sql.Column,
                  bModel: org.apache.spark.broadcast.Broadcast[LmModel])
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnBridge
    val toks = coalesce(Dedup.tokens(text), array().cast("array<string>"))
    GraftColumnBridge.column(graft.functions.NgramLmScore(
      GraftColumnBridge.expression(toks), bModel))
  }
}
