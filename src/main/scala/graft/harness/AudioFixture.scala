package graft.harness

/** Deterministic REAL-container audio fixture encoder for the
  * `multimodal_audio_meta` gate — the audio sibling of [[ImageFixture]].
  * Every doc_id becomes an actual WAV or FLAC payload whose header facts
  * derive from doc_id arithmetic the DuckDB oracle mirrors in SQL; the
  * engine-side [[graft.functions.AudioMeta]] header parse must recover
  * exactly these values from the encoded BYTES.
  *
  *  - even ids → WAV, written by the JDK's OWN encoder
  *    (`javax.sound.sampled.AudioSystem.write` — a real writer sharing no
  *    code with the parser), 16-bit PCM;
  *  - odd ids → FLAC STREAMINFO, hand-encoded field by field from the
  *    xiph.org format spec (no FLAC encoder ships in the JVM; the 34-byte
  *    block layout is written independently of the parser, and the spec
  *    pins golden bytes so an encoder/parser bug pair cannot cancel).
  *
  * Facts: sample_rate = 8000 + (id % 4)·4000, channels = (id / 2) % 2 + 1,
  * bits = 16, n_frames = id % 100 + 50,
  * duration_ms = n_frames·1000 / sample_rate (integer division).
  */
object AudioFixture {
  def sampleRate(id: Long): Int = (8000 + (id % 4) * 4000).toInt
  def channels(id: Long): Int   = ((id / 2) % 2 + 1).toInt
  def nFrames(id: Long): Long   = id % 100 + 50
  def formatName(id: Long): String = if (id % 2 == 0) "wav" else "flac"
  def durationMs(id: Long): Long = nFrames(id) * 1000L / sampleRate(id)

  def encode(id: Long): Array[Byte] =
    if (id % 2 == 0) wav(id) else flac(id)

  private def wav(id: Long): Array[Byte] = {
    import javax.sound.sampled._
    val rate = sampleRate(id); val ch = channels(id); val frames = nFrames(id)
    val fmt = new AudioFormat(rate.toFloat, 16, ch, true, false)
    // deterministic PCM payload (a sawtooth keyed on id) — content is
    // irrelevant to the header parse but must be frame-exact
    val pcm = new Array[Byte](frames.toInt * fmt.getFrameSize)
    var i = 0
    while (i < pcm.length) { pcm(i) = ((i * 7 + id) & 0xff).toByte; i += 1 }
    val stream = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private def flac(id: Long): Array[Byte] = {
    val rate = sampleRate(id); val ch = channels(id); val frames = nFrames(id)
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(0x80) // last-block flag + type 0 (STREAMINFO)
    out.write(0); out.write(0); out.write(34) // block length, u24 BE
    // min/max block size (u16 BE ×2), min/max frame size (u24 BE ×2)
    out.write(Array[Byte](0x10, 0, 0x10, 0, 0, 0, 0, 0, 0, 0))
    // 8 bytes BE packed: rate(20) | channels-1(3) | bits-1(5) | samples(36)
    val packed = (rate.toLong << 44) | ((ch - 1).toLong << 41) |
      (15L << 36) | frames // bits-1 = 15
    var i = 7
    while (i >= 0) { out.write(((packed >>> (i * 8)) & 0xff).toInt); i -= 1 }
    // md5 of the (absent) audio stream: zeros
    out.write(new Array[Byte](16))
    out.toByteArray
  }
}
