package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Row-local sketch expressions ([[graft.functions.MinHashSig]],
  * [[graft.functions.WindowHashes]]): parity with the formulations they
  * replace — the aggregate hash family and the joined-string hash. */
class SketchExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.functions.SketchFunctions

  test("minhash_sig equals minhash_agg over the same exploded set") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(50)
    val viaExpr = docs
      .select(col("doc_id"),
        graft.operators.Dedup.wordShingles(col("text"), 3).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(col("doc_id"), SketchFunctions.minhash_sig(col("__sh"), 64).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    // the aggregate path shingles via explode + collect; wordShingles
    // array_distincts, and minhash is distinct-invariant, so both match
    val viaAgg = docs
      .select(col("doc_id"), explode(graft.operators.Dedup.wordShingles(col("text"), 3)).as("sh"))
      .groupBy("doc_id").agg(SketchFunctions.minhash_agg(col("sh"), 64).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaExpr.nonEmpty && viaExpr.keySet == viaAgg.keySet)
    viaExpr.foreach { case (id, sig) => assert(sig == viaAgg(id), s"doc $id") }
  }

  test("minhash_sig_windows equals the explode + lead-window + MinHashAgg pipeline") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(80)
    val rowLocal = graft.operators.Dedup
      .minhashSignaturesRowLocal(docs, "text", "doc_id", shingleWords = 3, k = 128)
      .as[(Long, Seq[Long])].collect().toMap
    val viaAgg = graft.operators.Dedup
      .minhashSignatures(docs, "text", "doc_id", shingleWords = 3, k = 128)
      .as[(Long, Seq[Long])].collect().toMap
    assert(rowLocal.nonEmpty && rowLocal.keySet == viaAgg.keySet)
    rowLocal.foreach { case (id, sig) => assert(sig == viaAgg(id), s"doc $id") }
    // short docs absent from both
    val short = Seq((1L, "just two")).toDF("doc_id", "text")
    assert(graft.operators.Dedup
      .minhashSignaturesRowLocal(short, "text", "doc_id", 3, 8).count() == 0)
  }

  test("simhash_sig equals the explode + SimHashAgg path on real docs") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(80)
    val rowLocal = graft.operators.Dedup.simhashFingerprints(docs, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    val viaAgg = docs
      .select(col("doc_id").as("id"),
        explode(graft.operators.Dedup.tokens(col("text"))).as("t"))
      .groupBy("id").agg(SketchFunctions.simhash_agg(col("t")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(rowLocal.nonEmpty && rowLocal == viaAgg)
  }

  test("minhash_sig of an empty set is the MaxValue identity; nulls skipped") {
    import spark.implicits._
    val rows = Seq((1L, Seq.empty[String]), (2L, Seq("a", null, "b")))
      .toDF("id", "sh")
      .select(col("id"), SketchFunctions.minhash_sig(col("sh"), 8).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(rows(1L).forall(_ == Long.MaxValue))
    val direct = Seq((3L, Seq("a", "b"))).toDF("id", "sh")
      .select(col("id"), SketchFunctions.minhash_sig(col("sh"), 8).as("sig"))
      .as[(Long, Seq[Long])].collect().head._2
    assert(rows(2L) == direct, "null element must not contribute")
  }

  test("window_hashes equals xxhash64 of the space-joined window strings") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(30)
    val trimmed = regexp_replace(col("text"), "^\\s+|\\s+$", "")
    val toks = when(length(trimmed) === 0, array().cast("array<string>"))
      .otherwise(split(trimmed, "\\s+"))
    val L = 8
    val viaExpr = docs.select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), posexplode(SketchFunctions.window_hashes(col("t"), L)))
      .select(col("doc_id"), col("pos"), col("col").as("h"))
      .as[(Long, Int, Long)].collect().toSet
    val viaStrings = docs.select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= L) // sequence(0, negative) would descend
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), size(col("t")) - L),
          i => xxhash64(array_join(slice(col("t"), i + 1, lit(L)), " ")))))
      .select(col("doc_id"), col("pos"), col("col").as("h"))
      .as[(Long, Int, Long)].collect().toSet
    assert(viaExpr.nonEmpty)
    assert(viaExpr == viaStrings)
  }

  test("window_hashes output length is max(0, n - L + 1)") {
    import spark.implicits._
    val rows = Seq((1L, (1 to 10).map(i => s"t$i")), (2L, Seq("a", "b")), (3L, Seq.empty[String]))
      .toDF("id", "t")
      .select(col("id"), size(SketchFunctions.window_hashes(col("t"), 3)).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(rows == Map(1L -> 8, 2L -> 0, 3L -> 0))
  }
}
