package graft.harness

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler: times named sub-plans of the expensive bench
  * queries so optimization targets are measured, not guessed. Not part of
  * the driver contract; run with
  * `sbt "runMain graft.harness.Profile [names...]"`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators._

    def t(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r  = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name%-46s $dt%8.2f s  ($r)")
      spark.sharedState.cacheManager.clearCache()
    }
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // warm
    spark.range(100000L).selectExpr("sum(id)").collect()
    docs.count()

    val want = if (args.isEmpty) Set("all") else args.toSet
    def on(k: String) = want("all") || want(k)

    if (on("ngram")) {
      println("== dedup_ngram_jaccard (threshold 0.3) ==")
      t("shingleRows count") {
        Dedup.shingleRows(docs, "text", "doc_id", 3).count()
      }
      t("autoParams for 0.3") { Dedup.lshAutoParams(0.3) }
      t("lsh candidates (42,2) est>=0.1") {
        val sh = Dedup.shingleRows(docs, "text", "doc_id", 3)
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        val n = Dedup.minhashLshFromShingleRows(sh, 42, 2, 0.1).count()
        sh.unpersist(false); n
      }
      t("lsh candidates (32,4) est>=0.1") {
        val sh = Dedup.shingleRows(docs, "text", "doc_id", 3)
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        val n = Dedup.minhashLshFromShingleRows(sh, 32, 4, 0.1).count()
        sh.unpersist(false); n
      }
      t("full ngramJaccard 0.3") {
        Dedup.ngramJaccard(docs, "text", "doc_id", n = 3, threshold = 0.3).count()
      }
      t("full ngramJaccard 0.8 (clean shape)") {
        Dedup.ngramJaccard(docs, "text", "doc_id", n = 3, threshold = 0.8).count()
      }
    }

    if (on("minhash")) {
      println("== dedup_minhash_lsh property query ==")
      t("raw minhashLsh pairs t=0.5") {
        Dedup.minhashLsh(docs, "text", "doc_id", threshold = 0.5).count()
      }
      t("shingle distinct persist") {
        Dedup.shingleRows(docs, "text", "doc_id", 3).distinct().count()
      }
      t("inverted-index probes<500 vs ALL") {
        val shD = Dedup.shingleRows(docs, "text", "doc_id", 3).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        shD.count()
        val sizes = shD.groupBy("id").agg(count(lit(1)).as("sz"))
        val n = shD.select(col("id").as("id_b"), col("sh"))
          .join(shD.filter(col("id") < 500).select(col("id").as("id_a"), col("sh")), "sh")
          .filter(col("id_a") =!= col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
          .join(sizes.select(col("id").as("id_a"), col("sz").as("sza")), "id_a")
          .join(sizes.select(col("id").as("id_b"), col("sz").as("szb")), "id_b")
          .withColumn("j", col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
          .filter(col("j") >= 0.7).count()
        shD.unpersist(false); n
      }
      t("inverted-index probes<500 BOTH sides") {
        val shD = Dedup.shingleRows(docs.filter(col("doc_id") < 500), "text", "doc_id", 3)
          .distinct().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        shD.count()
        val sizes = shD.groupBy("id").agg(count(lit(1)).as("sz"))
        val n = shD.select(col("id").as("id_b"), col("sh"))
          .join(shD.select(col("id").as("id_a"), col("sh")), "sh")
          .filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
          .join(sizes.select(col("id").as("id_a"), col("sz").as("sza")), "id_a")
          .join(sizes.select(col("id").as("id_b"), col("sz").as("szb")), "id_b")
          .withColumn("j", col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
          .filter(col("j") >= 0.7).count()
        shD.unpersist(false); n
      }
      t("FULL property query (SparkEntry)") {
        graft.SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir).count()
      }
    }

    if (on("simhash")) {
      println("== dedup_simhash property query ==")
      t("raw simhashPairs h<=10") {
        Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 10).count()
      }
      t("raw simhashPairs h<=3") {
        Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3).count()
      }
      t("fingerprints only") {
        Dedup.simhashFingerprints(docs, "text", "doc_id").count()
      }
      t("FULL property query (SparkEntry)") {
        graft.SparkEntry.queries("dedup_simhash")(spark, sfDir).count()
      }
    }

    if (on("minhash2")) {
      println("== dedup_minhash_lsh internals, per action ==")
      val t0 = System.nanoTime()
      def lap(name: String): Unit =
        println(f"[profile]   lap $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      val shD = Dedup.shingleRows(docs, "text", "doc_id", 3).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      shD.count(); lap("shD persist count")
      val pairs = Dedup.minhashLshFromShingleRows(shD, bands = 32, rowsPerBand = 4,
          threshold = 0.5)
        .localCheckpoint(false)
      val found = pairs.count() > 0
      lap("pairs count")
      val pairIds = pairs.select(col("id_a").as("id"))
        .unionByName(pairs.select(col("id_b").as("id"))).distinct()
      val shSets = shD.join(pairIds, Seq("id"), "left_semi")
        .groupBy("id").agg(collect_set(col("sh")).as("sh"))
        .localCheckpoint(false)
      val estDevDf = pairs
        .join(shSets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(shSets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .withColumn("exact", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(array_union(col("sh_a"), col("sh_b"))))
        .agg(max(abs(col("est_jaccard") - col("exact"))).as("max_dev"))
      estDevDf.count(); lap("estDev alone")
      val sizes = shD.groupBy("id").agg(count(lit(1)).as("sz"))
      val probeJoin = shD.select(col("id").as("id_b"), col("sh"))
        .join(shD.filter(col("id") < 500).select(col("id").as("id_a"), col("sh")), "sh")
        .filter(col("id_a") =!= col("id_b"))
      println(s"[profile]   probe join rows: ${probeJoin.count()}"); lap("probe join count")
      val exactProbePairs = probeJoin
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("id").as("id_a"), col("sz").as("sza")), "id_a")
        .join(sizes.select(col("id").as("id_b"), col("sz").as("szb")), "id_b")
        .withColumn("j", col("inter").cast("double")
          / (col("sza") + col("szb") - col("inter")))
        .filter(col("j") >= 0.7)
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"))
        .distinct()
      val missedDf = exactProbePairs.join(pairs, Seq("id_a", "id_b"), "left_anti")
        .agg(count(lit(1)).as("n_missed"))
      missedDf.count(); lap("missed alone")
      val checks = estDevDf.crossJoin(missedDf).head()
      lap("combined checks head")
      shD.unpersist(false)
      println(s"[profile]   found=$found checks=$checks")
    }

    if (on("props")) {
      println("== property-query values at this sf ==")
      for (q <- Seq("dedup_minhash_lsh", "dedup_simhash", "ann_recall_check")) {
        val rows = graft.SparkEntry.queries(q)(spark, sfDir).collect()
        println(s"[propcheck] $q -> ${rows.mkString(", ")}")
      }
    }

    if (on("twice")) {
      println("== property queries twice in one session ==")
      t("minhash property run 1") {
        graft.SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir).count()
      }
      t("minhash property run 2") {
        graft.SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir).count()
      }
      t("simhash property run 1") {
        graft.SparkEntry.queries("dedup_simhash")(spark, sfDir).count()
      }
      t("simhash property run 2") {
        graft.SparkEntry.queries("dedup_simhash")(spark, sfDir).count()
      }
      t("clean run 1") {
        graft.SparkEntry.queries("pipeline_clean_corpus")(spark, sfDir).count()
      }
      t("clean run 2") {
        graft.SparkEntry.queries("pipeline_clean_corpus")(spark, sfDir).count()
      }
    }

    if (on("clean")) {
      println("== pipeline_clean_corpus ==")
      t("qualityFeatures+persist+counts") {
        val f = TextAnalysis.qualityFeatures(docs, "text")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = f.count(); f.unpersist(false); n
      }
      t("exact dedup checkpoint") {
        Dedup.exact(docs, Seq("text"), "doc_id").localCheckpoint(false).count()
      }
      t("ngramJaccard 0.8 on deduped") {
        val e = Dedup.exact(docs, Seq("text"), "doc_id").localCheckpoint(false)
        Dedup.ngramJaccard(e, "text", "doc_id", threshold = 0.8).count()
      }
      t("FULL clean (SparkEntry query)") {
        graft.SparkEntry.queries("pipeline_clean_corpus")(spark, sfDir).count()
      }
    }

    if (on("misc")) {
      println("== other heavies ==")
      t("embed_cosine_topk") {
        graft.SparkEntry.queries("embed_cosine_topk")(spark, sfDir).count()
      }
      t("ann_ivf_topk") {
        graft.SparkEntry.queries("ann_ivf_topk")(spark, sfDir).count()
      }
      t("text_repetition") {
        graft.SparkEntry.queries("text_repetition")(spark, sfDir).count()
      }
      t("q_sketch_stats") {
        graft.SparkEntry.queries("q_sketch_stats")(spark, sfDir).count()
      }
      t("q_salted_join") {
        graft.SparkEntry.queries("q_salted_join")(spark, sfDir).count()
      }
      t("q3_top_orders") {
        graft.SparkEntry.queries("q3_top_orders")(spark, sfDir).count()
      }
      t("to_dataset_dict") {
        graft.harness.PipelineDemo.ensureCatalog(spark, sfDir)
        graft.SparkEntry.queries("to_dataset_dict")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
