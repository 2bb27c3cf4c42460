package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** True image container dimensions parsed from the payload header — a
  * pure-JVM, ~100-line parse of the four container formats whose headers
  * are trivially public (PNG, JPEG/JFIF, GIF, BMP), replacing the r8/r9
  * hash-derived stub dims for `multimodal_meta`. No codec dependency, no
  * pixel decode: only the header fields every spec puts at a fixed offset
  * (PNG IHDR; JPEG SOFn marker walk; GIF logical screen descriptor; BMP
  * BITMAPINFOHEADER). Scan-stage expression — per-row, zero shuffle,
  * codegen'd via the shared static kernel.
  *
  * Output: struct(format string, width int, height int, channels int),
  * or NULL for a payload that is none of the four containers (or is
  * truncated mid-header) — callers that must refuse loudly gate on the
  * null (see `Multimodal.imageMeta(strict = true)`).
  *
  * Format notes (all offsets from the public container specs):
  *  - PNG (ISO 15948 §5.6/§11.2.2): 8-byte signature, then the IHDR chunk
  *    is mandatory-first → width/height are big-endian u32 at offsets
  *    16/20, color type at 25 maps to channels 0→1, 2→3, 3→1, 4→2, 6→4.
  *  - JPEG (ITU T.81 §B.2.2): marker walk from SOI; any SOFn (C0-CF minus
  *    C4/C8/CC) carries height/width as big-endian u16 at +5/+7 and the
  *    component count at +9. Stops cold at SOS/EOI (dims must precede
  *    entropy-coded data).
  *  - GIF (GIF89a spec §18): logical screen width/height, little-endian
  *    u16 at 6/8; palette entries are RGB → 3 channels.
  *  - BMP (BITMAPINFOHEADER): width little-endian i32 at 18, height i32
  *    at 22 (negative = top-down → abs), bits-per-pixel u16 at 28 →
  *    channels = bpp/8 (palette bpp ≤ 8 → 1).
  */
case class ImageDims(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"image_dims expects binary payload, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    ImageDims.parse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      s"""
         |${ev.value} = graft.functions.ImageDims.parse($bytes);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}

object ImageDims {
  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def row(fmt: String, w: Int, h: Int, c: Int): InternalRow =
    if (w <= 0 || h <= 0 || c <= 0) null
    else InternalRow(UTF8String.fromString(fmt), w, h, c)

  /** Static kernel shared by interpreted and generated code; null for a
    * payload that is none of the four containers or truncated mid-header. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 2) return null
    // PNG: signature + mandatory-first IHDR
    if (b.length >= 26 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
        (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a) {
      if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return null
      val channels = (b(25) & 0xff) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => return null
      }
      return row("png", be32(b, 16), be32(b, 20), channels)
    }
    // JPEG: SOI then marker walk to the first SOFn
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var pos = 2
      while (pos + 1 < b.length) {
        if ((b(pos) & 0xff) != 0xff) return null // desynced marker stream
        var m = b(pos + 1) & 0xff
        while (m == 0xff && pos + 2 < b.length) { pos += 1; m = b(pos + 1) & 0xff } // fill bytes
        if (m == 0xd9 || m == 0xda) return null  // EOI / SOS before any SOF
        if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) { pos += 2 }  // standalone
        else {
          if (pos + 3 >= b.length) return null
          val len = be16(b, pos + 2)
          if (len < 2) return null
          val sof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (sof) {
            if (pos + 9 >= b.length) return null
            return row("jpeg", be16(b, pos + 7), be16(b, pos + 5), b(pos + 9) & 0xff)
          }
          pos += 2 + len
        }
      }
      return null
    }
    // GIF: logical screen descriptor
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", le16(b, 6), le16(b, 8), 3)
    // BMP: BITMAPINFOHEADER (header size >= 40 at offset 14). 'BM' alone
    // is far too weak a magic (any text starting "BM…" matches) — the
    // spec's reserved words at offsets 6-9 MUST be zero, and the header
    // size field takes only a handful of defined values; both are checked
    // so a non-image payload cannot parse into silent garbage dimensions.
    if (b.length >= 30 && b(0) == 'B' && b(1) == 'M' &&
        b(6) == 0 && b(7) == 0 && b(8) == 0 && b(9) == 0) {
      val hdr = le32(b, 14)
      if (hdr == 40 || hdr == 52 || hdr == 56 || hdr == 64 || hdr == 108 || hdr == 124) {
        val bpp = le16(b, 28)
        return row("bmp", le32(b, 18), math.abs(le32(b, 22)), math.max(1, bpp / 8))
      }
      return null
    }
    null
  }
}

/** Pixel-plane perceptual average-hash (aHash) — the REAL decode path the
  * payload-byte stub in `Multimodal.averageHash` approximates. Decodes the
  * payload with the JDK's own `javax.imageio.ImageIO` (PNG / JPEG / GIF /
  * BMP readers ship in every JVM — no new dependency), folds the pixels
  * into an 8×8 integer-luma thumbnail, and thresholds each cell against
  * the thumbnail mean. Every step is EXACT integer arithmetic so an
  * independent engine (the DuckDB oracle, over the fixture's known pixel
  * function) reproduces the bit string bit-for-bit on lossless formats:
  *
  *  - luma(x,y) = 299·r + 587·g + 114·b (BT.601 weights ×1000 — kept
  *    un-divided: only ratios matter downstream);
  *  - pixel (x,y) belongs to thumbnail cell (x·8 div w, y·8 div h);
  *  - cell value t = (Σ luma) div (cell pixel count)  [floor division];
  *  - bit i (row-major, MSB first) set iff 64·tᵢ > Σt — the same
  *    division-free compare the byte-plane stub uses.
  *
  * Output: struct(bits string[64], hash long) or NULL when ImageIO has no
  * reader for the payload (not an image / truncated / exotic container)
  * or the decoded image is smaller than 8×8 (no meaningful thumbnail) —
  * callers that must refuse loudly gate on the null
  * (`Multimodal.pixelAverageHash(strict = true)`).
  *
  * Scan-stage expression: per-row decode, zero shuffle. The decode IS the
  * dominant cost (as on any real image pipeline); at 100 TB this is the
  * operator you give the whole cluster to, and it scales embarrassingly —
  * no exchange, no state, pure map. */
case class ImageAHash(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("bits", StringType, nullable = false),
    StructField("hash", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"image_ahash expects binary payload, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    ImageAHash.hash(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      s"""
         |${ev.value} = graft.functions.ImageAHash.hash($bytes);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}

object ImageAHash {
  /** Static kernel shared by interpreted and generated code; null when the
    * payload doesn't decode or is smaller than the 8×8 thumbnail. */
  def hash(payload: Array[Byte]): InternalRow = {
    if (payload == null || payload.length == 0) return null
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    if (w < 8 || h < 8) return null
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y) // sRGB, alpha ignored
        val luma = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)
        val cell = cy * 8 + x * 8 / w
        sums(cell) += luma
        cnts(cell) += 1
        x += 1
      }
      y += 1
    }
    val t = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < 64) { t(i) = sums(i) / cnts(i); total += t(i); i += 1 }
    val sb = new java.lang.StringBuilder(64)
    var packed = 0L
    i = 0
    while (i < 64) {
      val bit = 64L * t(i) > total
      sb.append(if (bit) '1' else '0')
      packed = (packed << 1) | (if (bit) 1L else 0L)
      i += 1
    }
    InternalRow(UTF8String.fromString(sb.toString), packed)
  }
}

/** REAL decode→featurize kernel (r13 — graduates the former
  * `fakeDecodeFeatures` stub): JDK ImageIO decodes the payload
  * (PNG/JPEG/GIF/BMP) and the feature vector is 8 EXACT pixel statistics
  *
  *   [width, height, mean_r, mean_g, mean_b,
  *    mean_luma1000, luma1000_range, bright_fraction]
  *
  * where luma1000 = 299·r + 587·g + 114·b (BT.601 ×1000, integer) and
  * bright_fraction counts pixels with l·n > Σl (division-free threshold —
  * the [[ImageAHash]] convention). Every sum stays an exact integer below
  * 2^53 for any real image, and each mean is ONE IEEE division of two
  * exactly-representable integers — so any engine (the DuckDB oracle
  * re-deriving pixels from the fixture formula included) reproduces the
  * doubles bit-for-bit. Null when the payload does not decode. */
object ImageFeatures {
  val dim = 8

  def features(payload: Array[Byte]): Array[Double] = {
    if (payload == null || payload.length == 0) return null
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var minL = Long.MaxValue; var maxL = Long.MinValue
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y) // sRGB, alpha ignored
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        sr += r; sg += g; sb += b
        val l = 299L * r + 587L * g + 114L * b
        if (l < minL) minL = l
        if (l > maxL) maxL = l
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    val sl = 299L * sr + 587L * sg + 114L * sb
    // second pass: brightness fraction via the division-free threshold
    // (l·n > Σl ⇔ l > mean, exactly); l·n ≤ 255000·n stays far under 2^63
    var bright = 0L
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val l = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)
        if (l * n > sl) bright += 1
        x += 1
      }
      y += 1
    }
    Array(w.toDouble, h.toDouble,
      sr.toDouble / n.toDouble, sg.toDouble / n.toDouble, sb.toDouble / n.toDouble,
      sl.toDouble / n.toDouble, (maxL - minL).toDouble, bright.toDouble / n.toDouble)
  }
}
