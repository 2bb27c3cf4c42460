package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BandHashes, FloatVecCosine, FloatVecDot, MinHashAgg, SimHashAgg}

/** Session-extension installer for the engine's native expressions — the
  * idiomatic way to ship custom Catalyst functions with a library:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions()(_))
  * }}}
  *
  * After installation the functions are plain SQL surface:
  * `SELECT vec_cosine(a, b)`, `SELECT minhash_agg(sh, 128) … GROUP BY id`.
  * (`VectorFunctions.register` remains for per-session temp registration.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** Resolve a function argument that MUST be an integer literal (signature
    * geometry is baked into the generated code). A non-foldable or
    * non-integral argument used to surface as an opaque ClassCastException /
    * NPE from `eval()` at resolution; now it's the same analysis error Spark
    * raises for its own foldable-parameter functions. */
  private def literalInt(funcName: String, paramName: String, args: Seq[Expression], i: Int): Int = {
    def fail() = throw new org.apache.spark.sql.AnalysisException(
      "NON_FOLDABLE_ARGUMENT",
      Map("funcName" -> s"`$funcName`", "paramName" -> s"`$paramName`", "paramType" -> "\"INT\""))
    val e = args(i)
    if (!e.foldable) fail()
    e.eval() match {
      case n: java.lang.Number => n.intValue()
      case _                   => fail()
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two float arrays"),
      (args: Seq[Expression]) => FloatVecCosine(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float arrays"),
      (args: Seq[Expression]) => FloatVecDot(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("minhash_agg"),
      info("minhash_agg", "minhash_agg(str, k) - k-long MinHash signature aggregate"),
      (args: Seq[Expression]) => MinHashAgg(args(0),
        literalInt("minhash_agg", "k", args, 1)).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("simhash_agg"),
      info("simhash_agg", "simhash_agg(str) - 64-bit SimHash fingerprint aggregate"),
      (args: Seq[Expression]) => SimHashAgg(args(0)).toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("band_hashes"),
      info("band_hashes", "band_hashes(sig, bands, rows) - LSH band bucket keys"),
      (args: Seq[Expression]) => BandHashes(args(0),
        literalInt("band_hashes", "bands", args, 1),
        literalInt("band_hashes", "rows", args, 2))))
    ext.injectFunction((FunctionIdentifier("zarr_decode"),
      info("zarr_decode",
        "zarr_decode(data, dtype, compressor[, filters]) - zarr v2 chunk bytes to array<double>"),
      (args: Seq[Expression]) => graft.sources.ZarrChunkDecode(args(0), args(1), args(2),
        args.lift(3).getOrElse(
          org.apache.spark.sql.catalyst.expressions.Literal("null")))))
  }
}
