package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r18 fused IVF+PQ trainer must return BIT-EQUAL models to the
  * unfused pair (kmeansCentroidArrays + pqCodebooks): annIndexBuild and
  * pqTopK both ride it, and the ann_index_search gate pins the store
  * form bit-identical to the in-flight form — a float that drifts here
  * surfaces as neighbor-set churn downstream.
  *
  * LOCAL-MODE assumption (ADVICE r18): the bit-equality contract relies
  * on identical float-summation merge order inside avg() — per-group
  * partial sums match per map partition, but reduce-side fetch/merge
  * order is not guaranteed deterministic on a multi-executor cluster.
  * This suite runs (and the engine's bench/gates run) in local mode,
  * where the order is stable; if the suite ever runs distributed and
  * flakes here, relax the centroid/codebook comparisons to a 1-ulp
  * tolerance — the downstream gates pin the STORE form against the
  * in-flight form computed from the same model, which stays exact. */
class FusedTrainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def assertEqualModels(
      df: org.apache.spark.sql.DataFrame, idCol: String, vecCol: String,
      nCells: Int, m: Int, nCentroids: Int, iters: Int, dim: Int): Unit = {
    val (ids, cents, books) = graft.operators.Similarity.trainIvfPq(
      df, idCol, vecCol, nCells, m, nCentroids, iters)
    val (uIds, uCents) = graft.operators.Similarity.kmeansCentroidArrays(
      df, idCol, vecCol, nCells, iters)
    val uBooks = graft.operators.Similarity.pqCodebooks(
      df, idCol, vecCol, dim, m, nCentroids, iters)
    assert(ids.toSeq == uIds.toSeq, "cell ids diverge")
    assert(cents.length == uCents.length)
    cents.zip(uCents).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.toSeq == b.toSeq, s"centroid $i diverges") }
    assert(books.length == uBooks.length)
    books.zip(uBooks).zipWithIndex.foreach { case ((ba, bb), s) =>
      assert(ba.length == bb.length, s"subspace $s centroid count diverges")
      ba.zip(bb).zipWithIndex.foreach { case ((a, b), c) =>
        assert(a.toSeq == b.toSeq, s"codebook ($s,$c) diverges") }
    }
  }

  test("fused trainer == unfused pair on fixture embeddings (2 iters)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assertEqualModels(emb, "vec_id", "embedding",
      nCells = 16, m = 8, nCentroids = 16, iters = 2, dim = 64)
  }

  test("fused trainer == unfused pair with nCells != nCentroids and 0 iters") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assertEqualModels(emb, "vec_id", "embedding",
      nCells = 8, m = 4, nCentroids = 12, iters = 0, dim = 64)
    assertEqualModels(emb, "vec_id", "embedding",
      nCells = 12, m = 4, nCentroids = 8, iters = 1, dim = 64)
  }

  test("fused trainer == unfused pair under null vectors and empty cells") {
    // 3 tight clusters of 8-dim vectors + null rows: nulls must be
    // invisible to both fits (the unfused forms filter them), and
    // nCells = 8 over 3 clusters leaves empty cells to drop out
    val vecs = (0L until 60L).map { i =>
      val base = (i % 3).toInt
      val v = Array.tabulate(8)(d =>
        (base * 10 + d).toFloat + (i / 3).toFloat * 0.01f)
      (i, v)
    }.toDF("vec_id", "embedding")
      .unionByName(Seq((100L, null.asInstanceOf[Array[Float]]))
        .toDF("vec_id", "embedding"))
    assertEqualModels(vecs, "vec_id", "embedding",
      nCells = 8, m = 2, nCentroids = 4, iters = 2, dim = 8)
  }

  test("fused trainer refuses an indivisible dim and an empty training set") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.Similarity.trainIvfPq(emb, "vec_id", "embedding",
        nCells = 4, m = 7, nCentroids = 4, kmeansIters = 1)
    }
    assert(e1.getMessage.contains("not divisible"))
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Similarity.trainIvfPq(
        emb.filter(col("vec_id") < 0), "vec_id", "embedding",
        nCells = 4, m = 8, nCentroids = 4, kmeansIters = 1)
    }
    assert(e2.getMessage.contains("no vectors") ||
      e2.getMessage.contains("training set"))
  }
}
