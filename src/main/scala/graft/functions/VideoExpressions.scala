package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** True video container metadata parsed from the payload header — the
  * video sibling of [[ImageDims]] (r10) and [[AudioMeta]] (r11): pure-JVM,
  * public-spec offsets (ISO/IEC 14496-12, the ISO base media file format
  * behind .mp4/.m4a/.mov-BMFF), no codec dependency, no sample decode.
  *
  * Box walk: every box is u32 big-endian size + 4cc type; size 1 means a
  * u64 largesize follows (the >4 GiB form); size 0 means the box extends
  * to the end of its container (legal only for the LAST box — typically a
  * trailing mdat). The payload must LEAD with `ftyp` (the spec requires it
  * as early as possible and every real muxer writes it first — it is the
  * container's magic). Parsed facts:
  *
  *  - `ftyp`: major brand (4 ASCII chars);
  *  - `moov`/`mvhd` (version 0 and 1): movie timescale + duration →
  *    `duration_ms` = duration·1000 / timescale (integer division);
  *    the spec's all-ones "duration unknown" sentinel yields a null
  *    duration_ms, not a fantasy number;
  *  - each `trak`: `mdia`/`hdlr` handler_type classifies the track
  *    (`vide` / `soun`); the FIRST video track's `tkhd` carries
  *    presentation width/height as 16.16 fixed-point — the integer part
  *    is reported (an audio-only file reports null width/height).
  *
  * Output: struct(brand, timescale, duration_ms, n_tracks, video_tracks,
  * audio_tracks, width, height), or NULL for a payload that is not BMFF
  * or is truncated / structurally invalid (a declared box overrunning the
  * payload, a missing moov/mvhd, a zero timescale, a trak without
  * tkhd+hdlr) — callers that must refuse loudly gate on the null
  * (`Multimodal.videoMeta(strict = true)`). Scan-stage expression —
  * per-row, zero shuffle, codegen'd via the shared static kernel. */
case class Mp4Meta(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("brand", StringType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = true),
    StructField("n_tracks", IntegerType, nullable = false),
    StructField("video_tracks", IntegerType, nullable = false),
    StructField("audio_tracks", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mp4_meta expects binary payload, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    Mp4Meta.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      s"""
         |${ev.value} = graft.functions.Mp4Meta.parse($bytes);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}

object Mp4Meta {
  private def be32(b: Array[Byte], i: Long): Long = {
    val p = i.toInt
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
  }
  private def be64(b: Array[Byte], i: Long): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def fourcc(b: Array[Byte], i: Long): String =
    new String(b, i.toInt, 4, "US-ASCII")

  /** One parsed child box: [payload start, payload end) within `b`, or
    * null on a malformed header / an extent past `end`. Long positions
    * throughout: u32 box sizes are unsigned, and Int arithmetic on a
    * corrupt size could advance by zero or negative — an infinite loop or
    * a crash where the contract is a null refusal. */
  private final class Walk(b: Array[Byte], var pos: Long, val end: Long) {
    var bad: Boolean      = false
    var boxType: String   = ""
    var payStart: Long    = 0L
    var payEnd: Long      = 0L
    def hasNext: Boolean  = !bad && pos < end
    /** Advance to the next box; false at a clean container end. */
    def next(): Boolean = {
      if (!hasNext) return false
      if (pos + 8 > end) { bad = true; return false }
      val declared = be32(b, pos)
      boxType = fourcc(b, pos + 4)
      var hdr = 8L
      val boxEnd =
        if (declared == 0L) end // "to end of container": legal for a last box
        else if (declared == 1L) {
          if (pos + 16 > end) { bad = true; return false }
          hdr = 16L
          pos + be64(b, pos + 8)
        } else pos + declared
      if (boxEnd < pos + hdr || boxEnd > end) { bad = true; return false }
      payStart = pos + hdr
      payEnd = boxEnd
      pos = boxEnd
      true
    }
  }

  private val UnknownDurV0 = 0xffffffffL

  /** Static kernel shared by interpreted and generated code; null for a
    * payload that is not ISO BMFF or is truncated/structurally invalid. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 16) return null
    // magic: the file must lead with a well-formed ftyp box
    if (fourcc(b, 4) != "ftyp") return null
    val top = new Walk(b, 0L, b.length.toLong)
    var brand: String   = null
    var timescale       = -1L
    var durUnits        = -1L
    var durKnown        = true
    var nTracks         = 0
    var videoTracks     = 0
    var audioTracks     = 0
    var width           = -1L
    var height          = -1L
    while (top.next()) {
      if (top.boxType == "ftyp") {
        if (top.payEnd - top.payStart < 8) return null // brand + minor version
        brand = fourcc(b, top.payStart)
      } else if (top.boxType == "moov") {
        val moov = new Walk(b, top.payStart, top.payEnd)
        while (moov.next()) {
          if (moov.boxType == "mvhd") {
            val p = moov.payStart; val len = moov.payEnd - p
            if (len < 4) return null
            val version = b(p.toInt) & 0xff
            if (version == 0) {
              // version/flags(4) creation(4) modification(4) ts(4) dur(4)
              if (len < 20) return null
              timescale = be32(b, p + 12)
              durUnits = be32(b, p + 16)
              if (durUnits == UnknownDurV0) durKnown = false
            } else if (version == 1) {
              // version/flags(4) creation(8) modification(8) ts(4) dur(8)
              if (len < 32) return null
              timescale = be32(b, p + 20)
              durUnits = be64(b, p + 24)
              if (durUnits == -1L) durKnown = false
            } else return null
          } else if (moov.boxType == "trak") {
            nTracks += 1
            val trak = new Walk(b, moov.payStart, moov.payEnd)
            var w = -1L; var h = -1L; var handler: String = null
            while (trak.next()) {
              if (trak.boxType == "tkhd") {
                val p = trak.payStart; val len = trak.payEnd - p
                if (len < 4) return null
                val version = b(p.toInt) & 0xff
                // width/height are the LAST 8 payload bytes in both
                // versions (…matrix(36), width(4), height(4)); v0 payload
                // is 84 bytes, v1 is 96 — 16.16 fixed point
                val need = if (version == 0) 84L else if (version == 1) 96L else -1L
                if (need < 0 || len < need) return null
                w = be32(b, p + need - 8) >>> 16
                h = be32(b, p + need - 4) >>> 16
              } else if (trak.boxType == "mdia") {
                val mdia = new Walk(b, trak.payStart, trak.payEnd)
                while (mdia.next()) {
                  if (mdia.boxType == "hdlr") {
                    val p = mdia.payStart
                    // version/flags(4) pre_defined(4) handler_type(4)
                    if (mdia.payEnd - p < 12) return null
                    handler = fourcc(b, p + 8)
                  }
                }
                if (mdia.bad) return null
              }
            }
            if (trak.bad) return null
            if (w < 0 || handler == null) return null // tkhd + hdlr mandatory
            if (handler == "vide") {
              videoTracks += 1
              if (width < 0) { width = w; height = h } // first video track
            } else if (handler == "soun") audioTracks += 1
          }
        }
        if (moov.bad) return null
      }
      // other top-level boxes (free, mdat, udta, …) are skipped by the walk
    }
    if (top.bad || brand == null || timescale <= 0 || timescale > Int.MaxValue ||
        nTracks == 0) return null
    // v1 durations are u64: a value whose ·1000 overflows Long must refuse
    // (a garbage/negative duration_ms would defeat the strict contract);
    // the bound still admits ~292 million years at timescale 1
    val durationMs: Any =
      if (!durKnown) null
      else if (durUnits < 0 || durUnits > Long.MaxValue / 1000L) return null
      else durUnits * 1000L / timescale
    InternalRow(UTF8String.fromString(brand), timescale.toInt, durationMs,
      nTracks, videoTracks, audioTracks,
      if (width < 0) null else width.toInt,
      if (height < 0) null else height.toInt)
  }
}
