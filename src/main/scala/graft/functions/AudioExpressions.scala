package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** True audio container metadata parsed from the payload header — the
  * audio sibling of [[ImageDims]] (which did the same for images in r10):
  * pure-JVM, public-spec offsets, no codec dependency, no sample decode.
  * Upgrades the stubbed `duration_ms` in the multimodal metadata plane to
  * a real header fact for the two containers whose headers are trivially
  * public:
  *
  *  - WAV (RIFF, the Microsoft/IBM spec mirrored by every reference):
  *    `RIFF`+size+`WAVE`, then a chunk walk — `fmt ` carries
  *    audio-format/channels/sample-rate/block-align/bits (LE u16/u32 at
  *    fixed offsets), `data` carries the payload size; frames =
  *    dataSize / blockAlign; duration = frames·1000 / rate. Only PCM
  *    (format 1) and IEEE-float (3) parse — compressed WAV variants have
  *    data sizes that are not frame counts and refuse via null.
  *  - FLAC (xiph.org format spec): `fLaC`, then metadata blocks — the
  *    FIRST block is mandatorily STREAMINFO (type 0, 34 bytes): sample
  *    rate 20 bits, channels−1 3 bits, bits−1 5 bits, total samples 36
  *    bits, big-endian packed at byte 10 of the block body.
  *
  * Output: struct(format, sample_rate, channels, bits, n_frames,
  * duration_ms), or NULL for a payload that is neither container (or is
  * truncated / structurally invalid) — callers that must refuse loudly
  * gate on the null (`Multimodal.audioMeta(strict = true)`).
  * Scan-stage expression — per-row, zero shuffle, codegen'd via the
  * shared static kernel. */
case class AudioMeta(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"audio_meta expects binary payload, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    AudioMeta.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      s"""
         |${ev.value} = graft.functions.AudioMeta.parse($bytes);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}

object AudioMeta {
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def be24(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 16) | ((b(i + 1) & 0xff) << 8) | (b(i + 2) & 0xff)

  private def row(fmt: String, rate: Long, ch: Int, bits: Int, frames: Long): InternalRow =
    // rate bounded to Int range BEFORE the .toInt: a 32-bit header field
    // above Int.MaxValue must refuse, not truncate to a negative rate
    if (rate <= 0 || rate > Int.MaxValue || ch <= 0 || bits <= 0 || frames < 0) null
    else InternalRow(UTF8String.fromString(fmt), rate.toInt, ch, bits, frames,
      frames * 1000L / rate)

  /** Static kernel shared by interpreted and generated code; null for a
    * payload that is neither container or is truncated/invalid. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    // WAV: RIFF container, WAVE form, fmt + data chunk walk
    if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      // LONG walk position: a 32-bit chunk size is unsigned, so .toInt
      // arithmetic could advance by zero or negative amounts on corrupt
      // payloads — an infinite loop or a crash where the contract is a
      // null refusal. Every declared chunk must also FIT the payload
      // (minus an optionally-missing final pad byte): a truncated clip
      // must refuse, not report its declared duration as fact.
      var pos = 12L
      var rate = -1L; var ch = -1; var bits = -1; var blockAlign = -1
      var dataSize = -1L
      while (pos + 8 <= b.length && (rate < 0 || dataSize < 0)) {
        val p = pos.toInt
        val id = new String(b, p, 4, "US-ASCII")
        val sz = le32(b, p + 4) // unsigned 32-bit, always >= 0 as Long
        if (pos + 8 + sz > b.length) return null // truncated chunk body
        if (id == "fmt ") {
          if (sz < 16) return null
          val audioFormat = le16(b, p + 8)
          // PCM (1) and IEEE float (3) only: compressed formats' data
          // sizes are not frame counts
          if (audioFormat != 1 && audioFormat != 3) return null
          ch = le16(b, p + 10)
          rate = le32(b, p + 12)
          blockAlign = le16(b, p + 20)
          bits = le16(b, p + 22)
        } else if (id == "data") {
          dataSize = sz
        }
        // chunks pad to even length (RIFF rule); advance is always >= 8
        pos += 8L + sz + (sz & 1L)
      }
      if (rate < 0 || dataSize < 0 || blockAlign <= 0) return null
      return row("wav", rate, ch, bits, dataSize / blockAlign)
    }
    // FLAC: fLaC marker, then the mandatory-first STREAMINFO block
    if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C') {
      if (b.length < 8) return null
      val btype = b(4) & 0x7f
      val blen = be24(b, 5)
      if (btype != 0 || blen != 34 || b.length < 8 + 34) return null
      val o = 8 + 10 // skip block sizes (2+2) and frame sizes (3+3)
      // 8 bytes big-endian packed: rate(20) | channels-1(3) | bits-1(5) |
      // total-samples(36)
      var packed = 0L
      var i = 0
      while (i < 8) { packed = (packed << 8) | (b(o + i) & 0xffL); i += 1 }
      val rate = packed >>> 44
      val ch = ((packed >>> 41) & 0x7L).toInt + 1
      val bits = ((packed >>> 36) & 0x1fL).toInt + 1
      val total = packed & 0xfffffffffL
      return row("flac", rate, ch, bits, total)
    }
    null
  }
}
