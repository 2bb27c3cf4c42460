package graft.harness

import java.io.{ByteArrayOutputStream, DataOutputStream}

/** Deterministic REAL-container video fixture encoder for the
  * `multimodal_video_meta` gate — the video sibling of [[ImageFixture]] /
  * [[AudioFixture]]. Every doc_id becomes an actual ISO BMFF (MP4) payload
  * whose box facts derive from doc_id arithmetic the DuckDB oracle mirrors
  * in SQL; the engine-side [[graft.functions.Mp4Meta]] box walk must
  * recover exactly these values from the encoded BYTES.
  *
  * No MP4 muxer ships in the JVM, so the boxes are hand-encoded field by
  * field from the public ISO/IEC 14496-12 layout (the same independence
  * story as [[AudioFixture]]'s FLAC half and the tar fixture: the encoder
  * writes spec structures top-down with `DataOutputStream` big-endian
  * primitives and shares no code with the parser's offset walk, and the
  * spec pins golden bytes so an encoder/parser bug pair cannot cancel).
  *
  * Layout: ftyp(brand, minor 0x200, 2 compatible brands) · free ·
  * moov( mvhd(v0) · trak(tkhd(v0, 16.16 w/h) · mdia(mdhd(v0) ·
  * hdlr('vide'))) · [trak(… hdlr('soun')) when id % 3 == 0] ) ·
  * mdat(16 deterministic bytes). Every third id exercises the v1
  * (64-bit-times) mvhd/tkhd form.
  *
  * Facts: brand = isom (even id) / mp42 (odd), timescale = 600+(id%5)·100,
  * duration units = id%500+120, duration_ms = units·1000/timescale
  * (integer division), width = (id·7)%320+16, height = (id·13)%240+16,
  * tracks = 1 video (+1 audio iff id%3==0).
  */
object VideoFixture {
  def brand(id: Long): String    = if (id % 2 == 0) "isom" else "mp42"
  def timescale(id: Long): Int   = (600 + (id % 5) * 100).toInt
  def durUnits(id: Long): Long   = id % 500 + 120
  def durationMs(id: Long): Long = durUnits(id) * 1000L / timescale(id)
  def width(id: Long): Int       = ((id * 7) % 320 + 16).toInt
  def height(id: Long): Int      = ((id * 13) % 240 + 16).toInt
  def hasAudio(id: Long): Boolean = id % 3 == 0

  private def box(tpe: String)(body: DataOutputStream => Unit): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val d = new DataOutputStream(bos)
    body(d); d.flush()
    val payload = bos.toByteArray
    val out = new ByteArrayOutputStream()
    val h = new DataOutputStream(out)
    h.writeInt(payload.length + 8)
    h.write(tpe.getBytes("US-ASCII"))
    h.write(payload); h.flush()
    out.toByteArray
  }

  private def fullBoxHead(d: DataOutputStream, version: Int): Unit =
    d.writeInt(version << 24) // version byte + 24 zero flag bits

  def encode(id: Long): Array[Byte] = {
    val v1 = id % 3 == 1 // exercise the 64-bit-times box version too
    val ftyp = box("ftyp") { d =>
      d.write(brand(id).getBytes("US-ASCII"))
      d.writeInt(0x200)
      d.write("isom".getBytes("US-ASCII"))
      d.write("iso2".getBytes("US-ASCII"))
    }
    val free = box("free") { d => d.write(new Array[Byte](4)) }
    val mvhd = box("mvhd") { d =>
      if (!v1) {
        fullBoxHead(d, 0)
        d.writeInt(0); d.writeInt(0)            // creation, modification
        d.writeInt(timescale(id))
        d.writeInt(durUnits(id).toInt)
      } else {
        fullBoxHead(d, 1)
        d.writeLong(0L); d.writeLong(0L)
        d.writeInt(timescale(id))
        d.writeLong(durUnits(id))
      }
      d.writeInt(0x00010000)                    // rate 1.0
      d.writeShort(0x0100); d.writeShort(0)     // volume 1.0, reserved
      d.writeLong(0L)                           // reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(d.writeInt)
      (0 until 6).foreach(_ => d.writeInt(0))   // pre_defined
      d.writeInt(3)                             // next_track_ID
    }
    def tkhd(trackId: Int, w: Int, h: Int): Array[Byte] = box("tkhd") { d =>
      if (!v1) {
        fullBoxHead(d, 0)
        d.writeInt(0); d.writeInt(0)            // creation, modification
        d.writeInt(trackId); d.writeInt(0)      // track_ID, reserved
        d.writeInt(durUnits(id).toInt)
      } else {
        fullBoxHead(d, 1)
        d.writeLong(0L); d.writeLong(0L)
        d.writeInt(trackId); d.writeInt(0)
        d.writeLong(durUnits(id))
      }
      d.writeLong(0L)                           // reserved
      d.writeShort(0); d.writeShort(0)          // layer, alternate_group
      d.writeShort(0); d.writeShort(0)          // volume, reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(d.writeInt)
      d.writeInt(w << 16); d.writeInt(h << 16)  // 16.16 fixed
    }
    def mdhd: Array[Byte] = box("mdhd") { d =>
      fullBoxHead(d, 0)
      d.writeInt(0); d.writeInt(0)
      d.writeInt(timescale(id)); d.writeInt(durUnits(id).toInt)
      d.writeShort(0x55c4); d.writeShort(0)     // language 'und', pre_defined
    }
    def hdlr(handler: String, name: String): Array[Byte] = box("hdlr") { d =>
      fullBoxHead(d, 0)
      d.writeInt(0)                             // pre_defined
      d.write(handler.getBytes("US-ASCII"))
      (0 until 3).foreach(_ => d.writeInt(0))   // reserved
      d.write(name.getBytes("US-ASCII")); d.write(0)
    }
    def trak(trackId: Int, handler: String, w: Int, h: Int, name: String): Array[Byte] =
      box("trak") { d =>
        d.write(tkhd(trackId, w, h))
        d.write(box("mdia") { m => m.write(mdhd); m.write(hdlr(handler, name)) })
      }
    val moov = box("moov") { d =>
      d.write(mvhd)
      d.write(trak(1, "vide", width(id), height(id), "VideoHandler"))
      if (hasAudio(id)) d.write(trak(2, "soun", 0, 0, "SoundHandler"))
    }
    val mdat = box("mdat") { d =>
      var i = 0
      while (i < 16) { d.write(((i * 7 + id) & 0xff).toInt); i += 1 }
    }
    val out = new ByteArrayOutputStream()
    out.write(ftyp); out.write(free); out.write(moov); out.write(mdat)
    out.toByteArray
  }
}
