package graft.harness

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

/** Deterministic REAL-container image fixture encoder for the
  * `multimodal_image_meta` gate: every doc_id becomes an actual PNG / JPEG
  * / GIF / BMP file (JDK `javax.imageio` writers — no new dependency)
  * whose dimensions and channel count derive from doc_id arithmetic the
  * DuckDB oracle mirrors in SQL. The engine-side
  * [[graft.functions.ImageDims]] header parse must recover exactly these
  * values from the encoded BYTES — an encoder/parser disagreement on any
  * header offset fails the gate.
  *
  * Format cycle (doc_id % 4): png, jpeg, gif, bmp. The channel
  * sub-variant keys on (doc_id / 4) % 2 — NOT doc_id % 2, which is fully
  * determined by doc_id % 4 and would leave half the branches dead:
  *  - png: sub-variant 0 TYPE_3BYTE_BGR (color type 2 → 3 channels),
  *    sub-variant 1 TYPE_INT_ARGB (type 6 → 4);
  *  - jpeg: sub-variant 0 TYPE_3BYTE_BGR (3 components), else
  *    TYPE_BYTE_GRAY (1);
  *  - gif / bmp: palette RGB → 3; 24bpp → 3.
  * Dims: width = (doc_id·7) % 120 + 16, height = (doc_id·13) % 90 + 16.
  */
object ImageFixture {
  def width(id: Long): Int  = ((id * 7) % 120 + 16).toInt
  def height(id: Long): Int = ((id * 13) % 90 + 16).toInt

  private def sub(id: Long): Long = (id / 4) % 2

  def formatName(id: Long): String = (id % 4) match {
    case 0 => "png"; case 1 => "jpeg"; case 2 => "gif"; case _ => "bmp"
  }

  def channels(id: Long): Int = (id % 4) match {
    case 0 => if (sub(id) == 0) 3 else 4
    case 1 => if (sub(id) == 0) 3 else 1
    case _ => 3
  }

  def encode(id: Long): Array[Byte] = {
    val w = width(id); val h = height(id)
    val imgType = (id % 4) match {
      case 0 => if (sub(id) == 0) BufferedImage.TYPE_3BYTE_BGR else BufferedImage.TYPE_INT_ARGB
      case 1 => if (sub(id) == 0) BufferedImage.TYPE_3BYTE_BGR else BufferedImage.TYPE_BYTE_GRAY
      // gif: pre-indexed so the JDK writer never has to quantize
      case 2 => BufferedImage.TYPE_BYTE_INDEXED
      case _ => BufferedImage.TYPE_3BYTE_BGR
    }
    val img = new BufferedImage(w, h, imgType)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((x * 31 + y * 17 + id.toInt) & 0xffffff) | 0xff000000)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    val writerFmt = if (id % 4 == 1) "jpg" else formatName(id)
    require(javax.imageio.ImageIO.write(img, writerFmt, out),
      s"ImageFixture: no $writerFmt writer in this JVM")
    out.toByteArray
  }
}
