package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization kernels (Sennrich et al. 2016,
  * arXiv:1508.07909 — the algorithm under GPT-2/LLaMA-family tokenizers,
  * here in its original character-level formulation with the `</w>`
  * end-of-word symbol).
  *
  * Encoding a document is a pure per-row function of the trained model
  * (merge ranks + symbol vocabulary), so it lives as a scan expression:
  * the model rides the expression as reference objects (`addReferenceObj`,
  * the ShardedBloomMightContain pattern), the per-word greedy
  * lowest-rank-first merge loop runs in JVM code, and a 100 TB corpus
  * tokenizes in one shuffle-free scan. Per-task symbol interning and a
  * per-expression-instance word cache (`LinkedHashMap`, LRU 65,536) make
  * repeated words — the overwhelming majority of a natural corpus — a
  * hash lookup instead of a merge loop.
  *
  * Symbols are Unicode CODE POINTS, never UTF-16 units
  * ([[BpeEncode.codePointSymbols]], shared with the trainer): a lone
  * surrogate is not encodable UTF-8, and the gate's token bound counts
  * code points. Words longer than [[BpeEncode.MaxMergeWordLen]] code
  * points (unsegmented URL/base64/CJK blobs — whitespace tokenization's
  * pathology) skip the O(len²) merge loop and emit base symbols directly:
  * same losslessness, same token bound, O(len).
  *
  * [[BpeEncode]]: array&lt;string&gt; words → array&lt;int&gt; token ids.
  * A character never seen at training time has no symbol id; it maps to
  * the reserved UNK id 0 (real tokenizers' byte-fallback analogue —
  * [[graft.operators.BpeTokenizer.learnVocab]] closes the base-character
  * set over the FULL word set before its frequency cap, so training on
  * the corpus you encode makes UNK structurally impossible; the id-0
  * reservation keeps any remaining failure visible instead of silently
  * dropping text).
  *
  * [[BpeDecode]]: array&lt;int&gt; ids → the reconstructed (lowercased,
  * single-spaced) text — `</w>` becomes the word boundary. Unknown ids
  * (incl. UNK 0) render as the Unicode replacement char, so a lossy
  * round-trip can never LOOK lossless.
  */
case class BpeEncode(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    merges: Map[(String, String), Int],
    vocab: Map[String, Int])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_encode expects array<string> words, got $other")
    }

  @transient private lazy val wordCache =
    new java.util.LinkedHashMap[String, Array[Int]](1024, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, Array[Int]]) =
        size() > 65536
    }

  def encodeWord(word: String): Array[Int] = {
    // access-ordered LinkedHashMap mutates on get — guard against any
    // shared-instance evaluation (driver-side interpreted eval, local mode)
    val cached = wordCache.synchronized(wordCache.get(word))
    if (cached != null) return cached
    val base = BpeEncode.codePointSymbols(word)
    val ids: Array[Int] =
      if (base.length > BpeEncode.MaxMergeWordLen) {
        val out = new Array[Int](base.length + 1)
        var i = 0
        while (i < base.length) {
          out(i) = vocab.getOrElse(base(i), BpeEncode.UnkId); i += 1
        }
        out(base.length) = vocab.getOrElse(BpeEncode.EndOfWord, BpeEncode.UnkId)
        out
      } else {
        val syms = scala.collection.mutable.ArrayBuffer.from(base)
        syms += BpeEncode.EndOfWord
        var done = false
        while (!done && syms.length > 1) {
          // lowest-rank adjacent pair merges first (ties impossible: ranks
          // are unique); scan is O(len) per round, len shrinks every round
          var bestRank = Int.MaxValue
          var bestAt = -1
          var i = 0
          while (i < syms.length - 1) {
            val r = merges.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
            if (r < bestRank) { bestRank = r; bestAt = i }
            i += 1
          }
          if (bestAt < 0) done = true
          else {
            syms(bestAt) = syms(bestAt) + syms(bestAt + 1)
            syms.remove(bestAt + 1)
          }
        }
        syms.map(s => vocab.getOrElse(s, BpeEncode.UnkId)).toArray
      }
    wordCache.synchronized(wordCache.put(word, ids))
    ids
  }

  def encode(words: ArrayData): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    val n = words.numElements()
    while (i < n) {
      // null elements cannot arise from the tokenizer (split never yields
      // null); treat one defensively as an empty word — encodes to </w>
      val w = if (words.isNullAt(i)) "" else words.getUTF8String(i).toString
      out ++= encodeWord(w)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(v: Any): Any = encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, words => s"${ev.value} = $ref.encode($words);")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}

object BpeEncode {
  val EndOfWord = "</w>"
  val UnkId = 0

  /** Past this many code points a word skips the O(len²) merge loop and
    * encodes as base symbols (production encoders cap for the same
    * reason: one pathological blob must not stall a scan task). */
  val MaxMergeWordLen = 1024

  /** Split a word into per-CODE-POINT symbols — the single definition of
    * the base-symbol alphabet, shared by trainer and encoder so the
    * contract cannot drift. */
  def codePointSymbols(word: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out.result()
  }
}

case class BpeDecode(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    inverseVocab: Map[Int, String])
  extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_decode expects array<int> token ids, got $other")
    }

  def decode(ids: ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder()
    var i = 0
    val n = ids.numElements()
    while (i < n) {
      val sym = inverseVocab.getOrElse(ids.getInt(i), "�")
      // the endsWith branch also covers the bare </w> symbol (zero-length
      // prefix append + the word-boundary space)
      if (sym.endsWith(BpeEncode.EndOfWord)) {
        sb.append(sym, 0, sym.length - BpeEncode.EndOfWord.length)
        if (i < n - 1) sb.append(' ')
      } else sb.append(sym)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(v: Any): Any = decode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeDecode", this, classOf[BpeDecode].getName)
    nullSafeCodeGen(ctx, ev, ids => s"${ev.value} = $ref.decode($ids);")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}
