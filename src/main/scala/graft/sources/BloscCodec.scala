package graft.sources

/** Pure-JVM blosc1 (the chunk format of c-blosc 1.x) with the LZ4 block
  * codec — the single most common compressor configuration of real-world
  * zarr v2 stores (numcodecs' default compressor is blosc). Implemented
  * from the PUBLIC c-blosc chunk-format and LZ4 block-format
  * specifications; no native libraries. This closes the deepest remaining
  * decode gap behind the reference's zarr open (intake_esm/source.py:82-96)
  * that needs no external connector.
  *
  * Chunk layout (c-blosc1):
  *  - 16-byte header: version, versionlz, flags (bit0 byte-shuffle, bit1
  *    memcpy/stored, bit2 bit-shuffle, bits5-7 codec id: 0 blosclz, 1 lz4,
  *    2 snappy, 3 zlib, 4 zstd), typesize byte, then uint32-LE
  *    nbytes / blocksize / cbytes (cbytes = whole chunk incl. header).
  *  - memcpy chunks (flags bit1): the raw buffer follows the header.
  *  - else: one uint32-LE start offset per block, then per block its
  *    compressed streams, each `[uint32-LE csize][stream bytes]`, where
  *    csize == neblock marks a stored (incompressible) stream. A block is
  *    byte-SHUFFLED before being SPLIT into one stream per byte plane;
  *    nsplits = typesize when `typesize <= 16 && blocksize/typesize >= 128`
  *    and the block is not the trailing partial block (c-blosc's
  *    forward-compatible split rule for blosclz/lz4), else 1.
  *
  * Scope: blosclz (pure JVM, from the public blosclz.c/FastLZ format) and
  * lz4 (pure JVM, from the public LZ4 block spec), zstd and snappy (via
  * the zstd-jni / snappy-java that ship inside every Spark distribution —
  * no new dependency), zlib (JDK Inflater) and stored/memcpy decode, with
  * BOTH byte-shuffle and bit-shuffle filters inverted, plus a compliant
  * encoder for fixtures and round-trip tests. c-blosc's block-split rule
  * applies only to blosclz/lz4 (`split_block` in blosc.c), so
  * zstd/zlib/snappy blocks always carry exactly one stream. Unknown codec
  * ids refuse loudly with the connector-boundary message — silently wrong
  * values would be worse.
  */
object BloscCodec {

  private val MaxSplits     = 16  // c-blosc MAX_SPLITS
  private val MinBufferSize = 128 // c-blosc MIN_BUFFERSIZE

  private def le32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)

  private def putLe32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff); o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff)
  }

  private val CodecBloscLz = 0
  private val CodecLz4     = 1

  private def nsplitsFor(codec: Int, typesize: Int, blocksize: Int, leftover: Boolean): Int =
    if ((codec == CodecBloscLz || codec == CodecLz4) && typesize > 1 && typesize <= MaxSplits &&
        blocksize / typesize >= MinBufferSize && !leftover)
      typesize
    else 1

  /** Byte-shuffle inverse: shuffled layout is plane-major (byte p of every
    * element, then byte p+1, ...); any trailing `n % typesize` bytes are
    * carried unshuffled, like c-blosc. Also the inverse of numcodecs'
    * standalone `shuffle` FILTER (same transform, used by [[ZarrCodec]]). */
  def unshuffle(src: Array[Byte], typesize: Int): Array[Byte] = {
    val n        = src.length
    val elements = n / typesize
    val out      = new Array[Byte](n)
    var p = 0
    while (p < typesize) {
      var e = 0
      while (e < elements) {
        out(e * typesize + p) = src(p * elements + e)
        e += 1
      }
      p += 1
    }
    var t = elements * typesize
    while (t < n) { out(t) = src(t); t += 1 }
    out
  }

  /** Byte-shuffle forward transform (encoder side; also numcodecs'
    * standalone `shuffle` filter — used by fixtures/tests). */
  def shuffle(src: Array[Byte], typesize: Int): Array[Byte] = {
    val n        = src.length
    val elements = n / typesize
    val out      = new Array[Byte](n)
    var p = 0
    while (p < typesize) {
      var e = 0
      while (e < elements) {
        out(p * elements + e) = src(e * typesize + p)
        e += 1
      }
      p += 1
    }
    var t = elements * typesize
    while (t < n) { out(t) = src(t); t += 1 }
    out
  }

  /** Bit-shuffle inverse (c-blosc flags bit2, the bitshuffle library's
    * `trans_bit_elem` layout): bit-plane p — bytes MSB-first, byte order
    * within the element ascending — of every element is packed
    * contiguously (elements MSB-first within each packed byte), for the
    * first `n - n%8` elements; the remaining elements' bytes are carried
    * verbatim at the end, exactly c-blosc's leftover rule. Layout derived
    * from the PUBLIC bitshuffle reference semantics
    * (numpy unpackbits → transpose → packbits). */
  def bitUnshuffle(src: Array[Byte], typesize: Int): Array[Byte] = {
    val n  = src.length / typesize
    val n8 = n - n % 8
    val out = new Array[Byte](src.length)
    val nbits = typesize * 8
    val rowBytes = n8 / 8
    var p = 0
    while (p < nbits) {
      val b     = p >>> 3      // destination byte within the element
      val shift = 7 - (p & 7)  // MSB-first within that byte
      var e = 0
      while (e < n8) {
        val bit = (src(p * rowBytes + (e >>> 3)) >>> (7 - (e & 7))) & 1
        if (bit != 0) out(e * typesize + b) = (out(e * typesize + b) | (1 << shift)).toByte
        e += 1
      }
      p += 1
    }
    var t = n8 * typesize
    while (t < src.length) { out(t) = src(t); t += 1 }
    out
  }

  /** Bit-shuffle forward transform (encoder side, for fixtures/round-trip
    * tests) — the exact inverse of [[bitUnshuffle]]. */
  def bitShuffle(src: Array[Byte], typesize: Int): Array[Byte] = {
    val n  = src.length / typesize
    val n8 = n - n % 8
    val out = new Array[Byte](src.length)
    val nbits = typesize * 8
    val rowBytes = n8 / 8
    var p = 0
    while (p < nbits) {
      val b     = p >>> 3
      val shift = 7 - (p & 7)
      var e = 0
      while (e < n8) {
        val bit = (src(e * typesize + b) >>> shift) & 1
        if (bit != 0)
          out(p * rowBytes + (e >>> 3)) =
            (out(p * rowBytes + (e >>> 3)) | (1 << (7 - (e & 7)))).toByte
        e += 1
      }
      p += 1
    }
    var t = n8 * typesize
    while (t < src.length) { out(t) = src(t); t += 1 }
    out
  }

  // -------------------------------------------------------------- blosclz

  /** blosclz block decompress (c-blosc1's native codec, a FastLZ
    * descendant, from the PUBLIC blosclz.c format): each control byte is a
    * literal run (< 32, length ctrl+1) or a match with a 3-bit length code
    * (7 ⇒ 255-chained extension bytes), a 13-bit distance (5 high bits in
    * the control byte + one low byte), and a 16-bit far-distance escape
    * (low byte 255 with all 5 high bits set ⇒ two extra bytes + 8191).
    * Distance-1 matches express RLE; the first control byte is always a
    * literal run. */
  def blosclzDecompress(src: Array[Byte], srcOff: Int, srcLen: Int, destLen: Int): Array[Byte] = {
    require(srcLen > 0, "blosclz: empty stream")
    val dest = new Array[Byte](destLen)
    val end  = srcOff + srcLen
    var s = srcOff
    var d = 0
    var ctrl = src(s) & 31; s += 1
    var loop = true
    while (loop) {
      if (ctrl >= 32) {
        var len = (ctrl >>> 5) - 1
        var ref = d - ((ctrl & 31) << 8)
        if (len == 6) { // extended match length
          var code = 0
          do { require(s < end, "blosclz: truncated length extension")
               code = src(s) & 0xff; s += 1; len += code } while (code == 255)
        }
        require(s < end, "blosclz: truncated distance byte")
        val code = src(s) & 0xff; s += 1
        ref -= code
        if (code == 255 && (ctrl & 31) == 31) { // 16-bit far distance
          require(s + 1 < end, "blosclz: truncated far distance")
          ref = d - ((((src(s) & 0xff) << 8) | (src(s + 1) & 0xff)) + 8191)
          s += 2
        }
        require(d + len + 3 <= destLen, s"blosclz: match overruns output at $d")
        require(ref - 1 >= 0, s"blosclz: match reaches before output start at $d")
        if (s < end) { ctrl = src(s) & 0xff; s += 1 } else loop = false
        ref -= 1
        var k = len + 3 // byte-wise: overlapping matches (RLE) must replicate
        while (k > 0) { dest(d) = dest(ref); d += 1; ref += 1; k -= 1 }
      } else {
        val lit = ctrl + 1
        require(d + lit <= destLen, s"blosclz: literal run overruns output at $d")
        require(s + lit <= end, "blosclz: truncated literal run")
        System.arraycopy(src, s, dest, d, lit); s += lit; d += lit
        if (s < end) { ctrl = src(s) & 0xff; s += 1 } else loop = false
      }
    }
    require(d == destLen, s"blosclz: decoded $d bytes, expected $destLen")
    dest
  }

  /** blosclz encoder (fixture/test infrastructure): greedy distance-1
    * matches (RLE) plus literal runs — a strictly valid stream that any
    * blosclz decoder accepts, compressing repetitive fixture data well;
    * real c-blosc output additionally uses longer distances, which the
    * decoder above covers (spec-pinned far-distance stream test). */
  def blosclzCompress(src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val n = src.length
    var litStart = 0
    def flushLits(until: Int): Unit = {
      var p = litStart
      while (p < until) {
        val run = math.min(32, until - p)
        out.write(run - 1)
        out.write(src, p, run)
        p += run
      }
      litStart = until
    }
    var i = math.min(1, n) // the stream must open with a literal run
    while (i < n) {
      var r = 0
      while (i + r < n && src(i + r) == src(i - 1)) r += 1
      if (r >= 3) {
        flushLits(i)
        var rem = r
        while (rem >= 3) {
          var take = math.min(rem, 263) // single-extension cap: len 6+254, +3
          if (rem - take > 0 && rem - take < 3) take = rem - 3
          if (take <= 8) out.write((take - 2) << 5)
          else { out.write(7 << 5); out.write(take - 9) }
          out.write(0) // distance-1: high bits 0, low byte 0
          rem -= take
        }
        i += r - rem
        litStart = i
      } else i += 1
    }
    flushLits(n)
    out.toByteArray
  }

  // ------------------------------------------------------------------ LZ4

  /** LZ4 BLOCK decompress (not the frame format — blosc carries bare
    * blocks): token → literals → (offset, matchlen) sequences, with
    * byte-wise match copy so overlapping matches (offset < len, the RLE
    * shape) expand correctly. */
  def lz4Decompress(src: Array[Byte], srcOff: Int, srcLen: Int, destLen: Int): Array[Byte] = {
    val dest = new Array[Byte](destLen)
    val end  = srcOff + srcLen
    var s = srcOff
    var d = 0
    while (s < end) {
      val token = src(s) & 0xff; s += 1
      var lit = token >>> 4
      if (lit == 15) {
        var b = 0
        // bounds INSIDE the extension loop: blosc packs several lz4 streams
        // back to back in one chunk, so an unchecked overrun reads the NEXT
        // split's bytes and mis-decodes silently instead of failing loudly
        do { require(s < end, "lz4: truncated literal-length extension")
             b = src(s) & 0xff; s += 1; lit += b } while (b == 255)
      }
      require(d + lit <= destLen && s + lit <= end, s"lz4: literal run past buffer at $s")
      System.arraycopy(src, s, dest, d, lit); s += lit; d += lit
      if (s < end) { // a match follows unless this was the closing literal run
        require(s + 2 <= end, "lz4: truncated match offset")
        val offset = (src(s) & 0xff) | ((src(s + 1) & 0xff) << 8); s += 2
        require(offset > 0 && offset <= d, s"lz4: match offset $offset at output position $d")
        var mlen = token & 0xf
        if (mlen == 15) {
          var b = 0
          do { require(s < end, "lz4: truncated match-length extension")
               b = src(s) & 0xff; s += 1; mlen += b } while (b == 255)
        }
        mlen += 4
        require(d + mlen <= destLen, s"lz4: match run past buffer ($d + $mlen > $destLen)")
        var m = d - offset
        var k = 0
        while (k < mlen) { dest(d) = dest(m); d += 1; m += 1; k += 1 }
      }
    }
    require(d == destLen, s"lz4: decoded $d bytes, expected $destLen")
    dest
  }

  /** Greedy single-pass LZ4 block encoder (hash of 4-byte windows), honoring
    * the spec's end restrictions: the last match starts >= 12 bytes before
    * the end and the block closes with a literals-only sequence. Used by the
    * blosc encoder below — compression ratio is irrelevant, validity is not. */
  def lz4Compress(src: Array[Byte]): Array[Byte] = {
    val n   = src.length
    val out = new java.io.ByteArrayOutputStream(n + n / 255 + 16)
    def writeLen(len: Int): Unit = { // extension bytes for a length >= 15
      var rest = len - 15
      while (rest >= 255) { out.write(255); rest -= 255 }
      out.write(rest)
    }
    def emit(litFrom: Int, litLen: Int, offset: Int, matchLen: Int): Unit = {
      val litTok   = math.min(litLen, 15)
      val matchTok = if (matchLen < 0) 0 else math.min(matchLen - 4, 15)
      out.write((litTok << 4) | matchTok)
      if (litLen >= 15) writeLen(litLen)
      out.write(src, litFrom, litLen)
      if (matchLen >= 0) {
        out.write(offset & 0xff); out.write((offset >>> 8) & 0xff)
        if (matchLen - 4 >= 15) writeLen(matchLen - 4)
      }
    }
    def read32(p: Int): Int = le32(src, p)
    val table  = new java.util.HashMap[Integer, Integer]()
    val mfEnd  = n - 12 // last match must start before here
    var anchor = 0
    var i      = 0
    while (i < mfEnd) {
      val h    = read32(i)
      val cand = table.put(h, i)
      if (cand != null && i - cand <= 0xffff && read32(cand) == h) {
        var len = 4
        while (i + len < n - 5 && src(cand + len) == src(i + len)) len += 1
        emit(anchor, i - anchor, i - cand, len)
        i += len
        anchor = i
      } else i += 1
    }
    emit(anchor, n - anchor, 0, -1) // closing literals-only sequence
    out.toByteArray
  }

  // ------------------------------------------------------- zstd/zlib/snappy

  /** zstd frame decompress via Spark's bundled zstd-jni. Streaming read —
    * robust to frames without a content-size field. `expected < 0` skips
    * the exact-size check (bare zarr `zstd` chunks, where the caller only
    * learns the size from the dtype math afterwards). */
  def zstdDecompress(src: Array[Byte], off: Int, len: Int, expected: Int): Array[Byte] = {
    val in = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
      new java.io.ByteArrayInputStream(src, off, len))
    val out = new java.io.ByteArrayOutputStream(if (expected > 0) expected else math.max(64, len * 4))
    try {
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } finally in.close() // frees the native ZSTD_DStream now, not at GC time
    val res = out.toByteArray
    require(expected < 0 || res.length == expected,
      s"zstd: decoded ${res.length} bytes, expected $expected")
    res
  }

  private def zlibDecompress(src: Array[Byte], off: Int, len: Int, expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(src, off, len)
    val dest = new Array[Byte](expected)
    try {
      var d = 0
      while (d < expected && !inf.finished()) {
        val n = inf.inflate(dest, d, expected - d)
        if (n == 0) throw new IllegalArgumentException("zlib: truncated or dictionary stream")
        d += n
      }
      require(d == expected, s"zlib: decoded $d bytes, expected $expected")
    } finally inf.end()
    dest
  }

  private def snappyDecompress(src: Array[Byte], off: Int, len: Int, expected: Int): Array[Byte] = {
    val slice = java.util.Arrays.copyOfRange(src, off, off + len)
    val res = org.xerial.snappy.Snappy.uncompress(slice)
    require(res.length == expected, s"snappy: decoded ${res.length} bytes, expected $expected")
    res
  }

  // ---------------------------------------------------------------- blosc

  private def refuse(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"blosc chunk uses $what — behind the connector boundary " +
        "(blosclz/lz4/zstd/zlib/snappy/stored blosc1 chunks decode here)")

  /** Decompress one blosc1 chunk to its original bytes. */
  def decompress(data: Array[Byte]): Array[Byte] = {
    require(data.length >= 16, s"blosc chunk of ${data.length} bytes has no 16-byte header")
    val flags    = data(2) & 0xff
    val typesize = data(3) & 0xff
    val nbytes   = le32(data, 4)
    val blocksize = le32(data, 8)
    val cbytes   = le32(data, 12)
    require(cbytes == data.length,
      s"blosc header declares $cbytes chunk bytes but ${data.length} arrived")
    require(nbytes >= 0 && blocksize > 0, s"blosc header nbytes=$nbytes blocksize=$blocksize")
    val codec = (flags >>> 5) & 0x7
    val memcpyed = (flags & 0x2) != 0
    if (memcpyed) {
      // stored verbatim — no shuffle, no codec
      require(data.length >= 16 + nbytes, "blosc memcpy chunk shorter than nbytes")
      return java.util.Arrays.copyOfRange(data, 16, 16 + nbytes)
    }
    val decodeStream: (Array[Byte], Int, Int, Int) => Array[Byte] = codec match {
      case 0 => blosclzDecompress
      case 1 => lz4Decompress      // lz4 / lz4hc share the block format
      case 2 => snappyDecompress
      case 3 => zlibDecompress
      case 4 => zstdDecompress
      case other => refuse(s"codec id $other")
    }
    val out     = new Array[Byte](nbytes)
    val nblocks = (nbytes + blocksize - 1) / blocksize
    require(data.length >= 16 + 4 * nblocks,
      s"blosc chunk truncated: ${data.length} bytes cannot hold $nblocks block offsets")
    var j = 0
    while (j < nblocks) {
      val bsize    = math.min(blocksize, nbytes - j * blocksize)
      val leftover = bsize != blocksize
      val nsplits  = nsplitsFor(codec, typesize, blocksize, leftover)
      val neblock  = bsize / nsplits
      val block    = new Array[Byte](bsize)
      var s = le32(data, 16 + 4 * j)
      var split = 0
      while (split < nsplits) {
        val csize = le32(data, s); s += 4
        require(csize >= 0 && s + csize <= data.length,
          s"blosc block $j split $split: stream of $csize bytes overruns the chunk")
        if (csize == neblock) System.arraycopy(data, s, block, split * neblock, neblock)
        else System.arraycopy(
          decodeStream(data, s, csize, neblock), 0, block, split * neblock, neblock)
        s += csize
        split += 1
      }
      val plain =
        if ((flags & 0x1) != 0) unshuffle(block, math.max(typesize, 1))
        else if ((flags & 0x4) != 0) bitUnshuffle(block, math.max(typesize, 1))
        else block
      System.arraycopy(plain, 0, out, j * blocksize, bsize)
      j += 1
    }
    out
  }

  /** Encode bytes as a blosc1 chunk (shuffle on when typesize > 1) —
    * fixture/test infrastructure for the decoder above; falls back to a
    * memcpy chunk when compression does not pay, like c-blosc. `codec`
    * selects the inner block codec (1 lz4 default, 2 snappy, 3 zlib,
    * 4 zstd); non-lz4 codecs never split, per c-blosc's split rule. */
  def compress(src: Array[Byte], typesize: Int): Array[Byte] =
    compress(src, typesize, CodecLz4)

  def compress(src: Array[Byte], typesize: Int, codec: Int): Array[Byte] =
    compress(src, typesize, codec, bitShuffleMode = false)

  def compress(src: Array[Byte], typesize: Int, codec: Int,
               bitShuffleMode: Boolean): Array[Byte] = {
    require(typesize >= 1 && typesize <= 255, s"typesize $typesize outside [1, 255]")
    val encodeStream: Array[Byte] => Array[Byte] = codec match {
      case 0 => plane => blosclzCompress(plane)
      case 1 => lz4Compress
      case 2 => org.xerial.snappy.Snappy.compress
      case 3 => plane => {
        val d = new java.util.zip.Deflater()
        d.setInput(plane); d.finish()
        val out = new java.io.ByteArrayOutputStream(plane.length)
        val buf = new Array[Byte](8192)
        try { while (!d.finished()) out.write(buf, 0, d.deflate(buf)) } finally d.end()
        out.toByteArray
      }
      case 4 => plane => com.github.luben.zstd.Zstd.compress(plane, 3)
      case other => throw new IllegalArgumentException(s"blosc encoder codec id $other")
    }
    val nbytes = src.length
    val blocksize = {
      // one block up to 64 KiB, kept a multiple of typesize so shuffle
      // planes stay aligned
      val cap = math.min(math.max(nbytes, typesize), 64 * 1024)
      math.max(cap - cap % typesize, typesize)
    }
    val doShuffle = typesize > 1 && !bitShuffleMode
    val nblocks = math.max(1, (nbytes + blocksize - 1) / blocksize)
    val streams = new java.io.ByteArrayOutputStream()
    val bstarts = new Array[Int](nblocks)
    val headerAndStarts = 16 + 4 * nblocks
    var j = 0
    while (j < nblocks) {
      bstarts(j) = headerAndStarts + streams.size()
      val bsize    = math.min(blocksize, nbytes - j * blocksize)
      val leftover = bsize != blocksize
      val nsplits  = nsplitsFor(codec, typesize, blocksize, leftover)
      val neblock  = bsize / nsplits
      val raw      = java.util.Arrays.copyOfRange(src, j * blocksize, j * blocksize + bsize)
      val block    = if (doShuffle) shuffle(raw, typesize)
                     else if (bitShuffleMode) bitShuffle(raw, typesize)
                     else raw
      var split = 0
      while (split < nsplits) {
        val plane = java.util.Arrays.copyOfRange(block, split * neblock, (split + 1) * neblock)
        val packed = encodeStream(plane)
        if (packed.length < neblock) { putLe32(streams, packed.length); streams.write(packed, 0, packed.length) }
        else { putLe32(streams, neblock); streams.write(plane, 0, neblock) } // stored split
        split += 1
      }
      j += 1
    }
    val body = streams.toByteArray
    if (headerAndStarts + body.length >= 16 + nbytes) {
      // incompressible: memcpy chunk (flags bit1, no shuffle, no bstarts)
      val o = new java.io.ByteArrayOutputStream(16 + nbytes)
      o.write(2); o.write(1); o.write(0x2 | (codec << 5)); o.write(typesize)
      putLe32(o, nbytes); putLe32(o, blocksize); putLe32(o, 16 + nbytes)
      o.write(src, 0, nbytes)
      o.toByteArray
    } else {
      val o = new java.io.ByteArrayOutputStream(headerAndStarts + body.length)
      o.write(2); o.write(1)
      o.write((if (doShuffle) 0x1 else if (bitShuffleMode) 0x4 else 0x0) | (codec << 5))
      o.write(typesize)
      putLe32(o, nbytes); putLe32(o, blocksize); putLe32(o, headerAndStarts + body.length)
      bstarts.foreach(putLe32(o, _))
      o.write(body, 0, body.length)
      o.toByteArray
    }
  }
}
