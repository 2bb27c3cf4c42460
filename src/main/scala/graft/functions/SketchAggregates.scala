package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sketch aggregates for the dedup pipeline.
  *
  * The declarative formulation (`k` separate `min(xxhash64(sh, i))`
  * aggregates, 64 separate bit-count sums) is correct but generates a plan
  * whose whole-stage code is huge — Janino pays seconds compiling it, and
  * every row evaluates `k` independent full hashes. These
  * `TypedImperativeAggregate`s replace that with ONE expression each:
  *
  *  - [[MinHashAgg]]: an `Array[Long](k)` buffer; per input string two
  *    xxhash64 evaluations (h1, h2) extended to k hash functions via the
  *    Kirsch–Mitzenmacher construction g_i = h1 + i·h2 (standard for
  *    LSH/Bloom families; preserves the minhash collision property). ~64×
  *    less hashing per row and a constant-size generated plan.
  *  - [[SimHashAgg]]: a 65-slot count buffer (64 bit-counts + n), one
  *    xxhash64 per token, majority vote at eval.
  *
  * Both run under ObjectHashAggregateExec with partial aggregation
  * (map-side combine), so the shuffle carries one small buffer per
  * (partition, id) — the same scale shape as the flat-aggregate plan.
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[Array[Long]] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s  = v.asInstanceOf[UTF8String]
      val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 0L)
      val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 1L)
      var i = 0
      var g = h1
      while (i < k) {
        if (g < buf(i)) buf(i) = g
        g += h2
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (other(i) < buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    var i = 0
    while (i < k) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb  = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](k)
    var i = 0
    while (i < k) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** 64-bit SimHash: bit i of the result is set iff a majority of the group's
  * token hashes have bit i set. Buffer = 64 bit-counts + token count.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[Array[Long]] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil

  override def createAggregationBuffer(): Array[Long] = new Array[Long](65)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      var i = 0
      while (i < 64) { buf(i) += (h >>> i) & 1L; i += 1 }
      buf(64) += 1L
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 65) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val n  = buf(64)
    var fp = 0L
    var i  = 0
    while (i < 64) { if (buf(i) * 2 > n) fp |= (1L << i); i += 1 }
    fp
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * 65)
    var i = 0
    while (i < 65) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb  = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](65)
    var i = 0
    while (i < 65) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** LSH band keys from a minhash signature in one expression: band b's key is
  * an xxhash64 chain over the band's `rowsPerBand` signature slots. Replaces
  * a `bands`-wide `hash(slice(sig, …))` projection whose generated code grew
  * with the band count (and cost Janino a visible compile) with a tiny
  * constant-size loop, both interpreted and codegen'd.
  */
case class BandHashes(child: org.apache.spark.sql.catalyst.expressions.Expression,
                      bands: Int, rowsPerBand: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // SQL users reach this via band_hashes(...) — a wrong-typed or wrong-
  // length signature must fail analysis / fail loudly, not read out of
  // bounds (UnsafeArrayData.getLong past numElements returns garbage, i.e.
  // silently wrong LSH buckets)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"band_hashes expects array<bigint> (a minhash signature), got $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val sig = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    BandHashes.checkLength(sig.numElements(), bands, rowsPerBand)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var r = 0
      while (r < rowsPerBand) { h = XXH64.hashLong(sig.getLong(b * rowsPerBand + r), h); r += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode,
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, sig => {
      val out = ctx.freshName("out")
      val b   = ctx.freshName("b")
      val r   = ctx.freshName("r")
      val h   = ctx.freshName("h")
      s"""
         |graft.functions.BandHashes.checkLength($sig.numElements(), $bands, $rowsPerBand);
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $h = 42L;
         |  for (int $r = 0; $r < $rowsPerBand; $r++) {
         |    $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(
         |      $sig.getLong($b * $rowsPerBand + $r), $h);
         |  }
         |  $out[$b] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): Expression =
    copy(child = newChild)
}

object BandHashes {
  /** Static guard, callable from generated code. */
  def checkLength(n: Int, bands: Int, rowsPerBand: Int): Unit =
    if (n < bands * rowsPerBand)
      throw new IllegalArgumentException(
        s"band_hashes: signature has $n slots, needs bands*rowsPerBand = ${bands * rowsPerBand}")
}

/** Row-local MinHash signature of an `array<string>` — the non-aggregate
  * twin of [[MinHashAgg]], same Kirsch–Mitzenmacher hash family (g_i =
  * h1 + i·h2 over xxhash64 seeds 0/1), so a signature computed per row
  * here equals the one [[MinHashAgg]] accumulates over the same exploded
  * set. One expression node replacing the k-branch
  * `array(array_min(transform(...)))` formulation: the streaming twin's
  * incremental planner re-optimizes the tree EVERY micro-batch, and the
  * higher-order-function form is interpreted per row — both costs scale
  * with k there and are constant here. Null elements are skipped; an
  * empty array yields the Long.MaxValue identity signature. */
case class MinHashSig(child: Expression, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string> (a shingle set), got $other")
    }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(MinHashSig.compute(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode,
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.MinHashSig.compute($arr, $k));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** Static kernel, shared by interpreted and generated code. */
  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData, k: Int): Array[Long] = {
    val buf = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s  = arr.getUTF8String(j)
        val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 0L)
        val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 1L)
        var i = 0
        var g = h1
        while (i < k) {
          if (g < buf(i)) buf(i) = g
          g += h2
          i += 1
        }
      }
      j += 1
    }
    buf
  }
}

/** Row-local 64-bit hashes of every L-token window of a token array —
  * the expression the streaming substring-dedup twin keys state on and
  * the batch operator builds its shuffle keys from (two independent
  * seeds → a 128-bit key, no corpus-wide lead()-window shuffle).
  * Window w's hash is xxhash64(`seed`) of the tokens joined by single
  * spaces (seed 42 = identical bytes and value to
  * `xxhash64(concat_ws(" ", …))` — for NULL-FREE token arrays only:
  * concat_ws skips nulls while this kernel hashes a null element as ""
  * plus its separator; every caller feeds split() output, which never
  * contains nulls), computed in one native loop instead of an
  * interpreted L-deep zip_with chain whose tree the incremental
  * planner re-optimizes every micro-batch. Output length is
  * max(0, n - L + 1). */
case class WindowHashes(child: Expression, windowTokens: Int, seed: Long = 42L)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"window_hashes expects array<string> (tokens), got $other")
    }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(WindowHashes.compute(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], windowTokens, seed))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode,
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.WindowHashes.compute($arr, $windowTokens, ${seed}L));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowHashes {
  /** Static kernel, shared by interpreted and generated code. */
  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData, l: Int,
              seed: Long): Array[Long] = {
    val n = arr.numElements()
    val m = math.max(0, n - l + 1)
    val out = new Array[Long](m)
    if (m == 0) return out
    // token bytes gathered once; each window joins with single spaces into
    // one buffer and hashes — identical bytes to xxhash64 of the joined
    // window string
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) Array.emptyByteArray else arr.getUTF8String(i).getBytes
      i += 1
    }
    var w = 0
    while (w < m) {
      var len = l - 1
      var j = 0
      while (j < l) { len += toks(w + j).length; j += 1 }
      val buf = new Array[Byte](len)
      var at = 0
      j = 0
      while (j < l) {
        if (j > 0) { buf(at) = ' '; at += 1 }
        val t = toks(w + j)
        System.arraycopy(t, 0, buf, at, t.length)
        at += t.length
        j += 1
      }
      out(w) = XXH64.hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        len, seed)
      w += 1
    }
    out
  }
}

/** MinHash signature of a token array's n-token word shingles in ONE
  * per-row pass — shingle construction and Kirsch–Mitzenmacher minhash
  * fused, no explode, no per-doc window shuffle, no aggregate. Bit-equal
  * to [[MinHashAgg]] over the same doc's exploded shingle rows (XXH64
  * seeds 0/1 of the space-joined window bytes, g_i = h1 + i·h2), so the
  * bulk pipelines can swap the explode + lead-window + groupBy signature
  * stage — at 100 TB a full corpus-tokens exchange — for a scan
  * expression with identical output. Null for docs with fewer than n
  * tokens (the agg path emits no row for them). */
case class MinHashSigWindows(child: Expression, n: Int, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig_windows expects array<string> (tokens), got $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val out = MinHashSigWindows.compute(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n, k)
    if (out == null) null else new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode,
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val raw = ctx.freshName("raw")
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |long[] $raw = graft.functions.MinHashSigWindows.compute($arr, $n, $k);
         |if ($raw == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($raw);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigWindows {
  /** Static kernel, shared by interpreted and generated code. Returns null
    * when the doc has no n-token window. */
  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData, n: Int,
              k: Int): Array[Long] = {
    val cnt = arr.numElements()
    val m = cnt - n + 1
    if (m <= 0) return null
    val toks = new Array[Array[Byte]](cnt)
    var i = 0
    while (i < cnt) {
      toks(i) = if (arr.isNullAt(i)) Array.emptyByteArray else arr.getUTF8String(i).getBytes
      i += 1
    }
    val buf = Array.fill(k)(Long.MaxValue)
    var w = 0
    while (w < m) {
      var len = n - 1
      var j = 0
      while (j < n) { len += toks(w + j).length; j += 1 }
      val bytes = new Array[Byte](len)
      var at = 0
      j = 0
      while (j < n) {
        if (j > 0) { bytes(at) = ' '; at += 1 }
        val t = toks(w + j)
        System.arraycopy(t, 0, bytes, at, t.length)
        at += t.length
        j += 1
      }
      val off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
      val h1 = XXH64.hashUnsafeBytes(bytes, off, len, 0L)
      val h2 = XXH64.hashUnsafeBytes(bytes, off, len, 1L)
      var g = h1
      var s = 0
      while (s < k) {
        if (g < buf(s)) buf(s) = g
        g += h2
        s += 1
      }
      w += 1
    }
    buf
  }
}

/** Row-local 64-bit SimHash of a token array — the non-aggregate twin of
  * [[SimHashAgg]] (same per-token xxhash64 seed 42, same majority vote),
  * so fingerprints computed per row equal the exploded-aggregate path's
  * bit for bit, with no exchange at all. 0L for an empty array (the agg
  * emits no row; callers filter on token count when absence semantics
  * matter). */
case class SimHashSig(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_sig expects array<string> (tokens), got $other")
    }

  override def nullSafeEval(v: Any): Any =
    SimHashSig.compute(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode,
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = graft.functions.SimHashSig.compute($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSig {
  /** Static kernel, shared by interpreted and generated code. */
  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val cnt = arr.numElements()
    val bits = new Array[Long](64)
    var n = 0L
    var i = 0
    while (i < cnt) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var b = 0
        while (b < 64) { bits(b) += (h >>> b) & 1L; b += 1 }
        n += 1L
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (bits(b) * 2 > n) fp |= (1L << b); b += 1 }
    fp
  }
}

/** DISTINCT n-token window strings of a token array, per row — the
  * shingle SET the jaccard verifiers compare, without the exploded
  * (id, sh) relation the former pipeline persisted at corpus × words
  * size and re-aggregated with collect_set. First-seen order (set
  * semantics downstream: array_intersect/array_union are
  * order-insensitive). Empty array below n tokens. */
case class WindowStrings(child: Expression, n: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"window_strings expects array<string> (tokens), got $other")
    }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(WindowStrings.compute(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode,
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.WindowStrings.compute($arr, $n));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowStrings {
  /** Static kernel, shared by interpreted and generated code. */
  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData,
              n: Int): Array[Any] = {
    val cnt = arr.numElements()
    val m = cnt - n + 1
    if (m <= 0) return Array.empty[Any]
    val toks = new Array[String](cnt)
    var i = 0
    while (i < cnt) {
      toks(i) = if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
      i += 1
    }
    val seen = new java.util.LinkedHashSet[String]()
    var w = 0
    while (w < m) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(w + j))
        j += 1
      }
      seen.add(sb.toString)
      w += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    i = 0
    while (it.hasNext) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      i += 1
    }
    out
  }
}

object SketchFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** MinHash signature aggregate: `array<long>` of length k per group. */
  def minhash_agg(c: Column, k: Int): Column =
    column(MinHashAgg(expression(c), k).toAggregateExpression())

  /** Row-local MinHash signature of an array<string> (same hash family as
    * [[minhash_agg]]). */
  def minhash_sig(c: Column, k: Int): Column =
    column(MinHashSig(expression(c), k))

  /** Fused shingle-and-minhash over a token array: the signature
    * [[minhash_agg]] would produce over the doc's exploded n-token
    * shingles, in one scan expression (null below n tokens). */
  def minhash_sig_windows(tokens: Column, n: Int, k: Int): Column =
    column(MinHashSigWindows(expression(tokens), n, k))

  /** Distinct n-token window strings (the shingle SET) per row. */
  def window_strings(tokens: Column, n: Int): Column =
    column(WindowStrings(expression(tokens), n))

  /** Row-local 64-bit SimHash of a token array (same hash + vote as
    * [[simhash_agg]]). */
  def simhash_sig(tokens: Column): Column =
    column(SimHashSig(expression(tokens)))

  /** 64-bit hashes of every `windowTokens`-token window of a token array
    * (seed 42 matches `xxhash64(concat_ws(" ", window))`; pass another
    * seed for an independent lane). */
  def window_hashes(c: Column, windowTokens: Int, seed: Long = 42L): Column =
    column(WindowHashes(expression(c), windowTokens, seed))

  /** 64-bit SimHash fingerprint aggregate over the group's tokens. */
  def simhash_agg(c: Column): Column =
    column(SimHashAgg(expression(c)).toAggregateExpression())

  /** Per-band LSH bucket keys of a minhash signature (array of length bands). */
  def band_hashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    column(BandHashes(expression(sig), bands, rowsPerBand))
}
