package graft.harness

import org.apache.spark.sql.SparkSession

/** Dev-only A/B runner for adjudication pairs: times named bench rows
  * (SparkEntry.queries ∪ Bench.extras) and/or the bench's streaming lanes
  * with the bench's own methodology, from a plain `java -cp <snapshot>`
  * launch so two class snapshots can alternate in one calm window.
  * Args: row names, plus the literal `streaming` to run the streaming
  * lane block (via reflection — the block is private to Bench by design;
  * this harness is not part of the driver contract).
  */
object Rowtime {
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
    import org.apache.spark.sql.functions._

    // minimal JIT warmup (the bench's shapes, abbreviated)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    val runnable = graft.SparkEntry.queries ++ graft.Bench.extras
    val rows = args.filter(runnable.contains).toSeq
    if (rows.nonEmpty) {
      graft.harness.PipelineDemo.ensureCatalog(spark, sfDir)
      graft.SparkEntry.ensureCsvFixture(spark, sfDir)
      if (rows.contains("search_bm25_phrase_batch_1k"))
        graft.operators.KeywordSearch.bm25IndexBuild(
          spark.read.parquet(s"$sfDir/documents.parquet"), "text", "doc_id",
          s"/tmp/graft_bench_posidx_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}",
          overwrite = true, positions = true)
      rows.foreach { name =>
        val samples = (1 to 4).map { _ =>
          val t0 = System.nanoTime()
          runnable(name)(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
          val dt = (System.nanoTime() - t0) / 1e9
          spark.sharedState.cacheManager.clearCache()
          dt
        }
        println(f"[rowtime] $name%-36s min=${samples.tail.min}%7.3f s  " +
          s"samples=${samples.map(s => f"$s%.3f").mkString(",")}")
      }
    }

    if (args.contains("streaming")) {
      val n = sys.env.get("GRAFT_STREAM_REPS").map(_.toInt).getOrElse(2)
      val m = graft.Bench.getClass.getDeclaredMethod("streamingThroughput",
        classOf[SparkSession], classOf[String])
      m.setAccessible(true)
      for (i <- 1 to n) {
        val json = m.invoke(graft.Bench, spark, sfDir).asInstanceOf[String]
        println(s"[stream $i] $json")
      }
    }
    spark.stop()
  }
}
