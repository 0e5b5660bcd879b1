package graft.operators

/**
 * Pure-JVM codecs for the multimodal column family (SURVEY.md §2.12):
 * uncompressed formats a 100 TB pipeline can decode without native
 * libraries, chosen so the decode step is REAL (header parse, row
 * stride, bottom-up flip, channel order, sample width) while staying
 * byte-exact reproducible across engines.
 *
 *  - BMP: 24-bit BI_RGB (Windows BITMAPINFOHEADER), bottom-up rows,
 *    4-byte row padding, B-G-R byte order — the canonical
 *    "uncompressed image" interchange format.
 *  - WAV: RIFF PCM, 16-bit signed little-endian mono — the canonical
 *    uncompressed audio format.
 *  - GVID: a minimal length-prefixed frame container (magic "GVID",
 *    u32 LE frame count, then per frame u32 LE length + one full BMP)
 *    standing in for a video container; frame addressing parses the
 *    real index, never assumes fixed stride.
 *
 * Everything is integer arithmetic; luma is carried ×1000
 * (r·299 + g·587 + b·114, the ITU-R BT.601 per-mille weights) so
 * downstream comparisons stay in exact integers — no floating point
 * anywhere in the decode path, hence no cross-engine rounding.
 */
object MediaCodec {

  // ---------------------------------------------------------------- util

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >>> 8) & 0xff).toByte
  }
  private def putU32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >>> 8) & 0xff).toByte
    b(off + 2) = ((v >>> 16) & 0xff).toByte
    b(off + 3) = ((v >>> 24) & 0xff).toByte
  }
  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  // ---------------------------------------------------------------- BMP

  /** Bytes per BMP pixel row including the 4-byte alignment padding. */
  def bmpStride(w: Int): Int = ((w * 3 + 3) / 4) * 4

  /** Total file size of a 24-bit BMP: 14-byte file header + 40-byte
    * BITMAPINFOHEADER + h padded rows. */
  def bmpSize(w: Int, h: Int): Int = 54 + h * bmpStride(w)

  /** Decoded image: luma ×1000 per pixel, row-major TOP-DOWN
    * (y = 0 is the top row — the decoder undoes BMP's bottom-up
    * storage). lumaMilli(y * width + x) = r·299 + g·587 + b·114. */
  final case class Image(width: Int, height: Int, lumaMilli: Array[Int])

  /** Encode a 24-bit BI_RGB BMP. `rgb(x, y)` returns (r, g, b) for the
    * pixel at column x, row y counted from the TOP (the encoder writes
    * rows bottom-up as the format requires). Each channel masked to
    * 0..255. */
  def encodeBmp(w: Int, h: Int, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0, s"BMP dims must be positive, got ${w}x$h")
    val stride = bmpStride(w)
    val size = bmpSize(w, h)
    val b = new Array[Byte](size) // zero-filled => padding bytes are 0
    b(0) = 'B'; b(1) = 'M'
    putU32(b, 2, size)
    putU32(b, 10, 54) // pixel-data offset
    putU32(b, 14, 40) // BITMAPINFOHEADER size
    putU32(b, 18, w)
    putU32(b, 22, h) // positive height = bottom-up
    putU16(b, 26, 1) // planes
    putU16(b, 28, 24) // bits per pixel
    putU32(b, 30, 0) // BI_RGB (uncompressed)
    putU32(b, 34, h * stride)
    putU32(b, 38, 2835); putU32(b, 42, 2835) // 72 dpi
    var y = 0
    while (y < h) {
      val base = 54 + (h - 1 - y) * stride // file stores rows bottom-up
      var x = 0
      while (x < w) {
        val (r, g, bl) = rgb(x, y)
        val o = base + x * 3
        b(o) = (bl & 0xff).toByte // B-G-R order
        b(o + 1) = (g & 0xff).toByte
        b(o + 2) = (r & 0xff).toByte
        x += 1
      }
      y += 1
    }
    b
  }

  /** Parse a 24-bit BI_RGB BMP into a top-down luma grid. Validates
    * magic, bit depth, and compression; honors the header's pixel-data
    * offset and the row stride, and reads channels in the format's
    * B-G-R order. Both row orders are accepted: positive biHeight =
    * bottom-up storage (rows flipped on read — the common case),
    * negative biHeight = top-down storage (|h| rows read in file
    * order) per the BITMAPINFOHEADER contract. */
  def decodeBmp(bytes: Array[Byte]): Image = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP: bad magic or truncated header")
    val off = u32(bytes, 10)
    val w = u32(bytes, 18)
    val hRaw = u32(bytes, 22) // signed: negative = top-down row order
    val topDown = hRaw < 0
    val h = if (topDown) -hRaw else hRaw
    require(u16(bytes, 28) == 24, s"only 24-bit BMP supported, got ${u16(bytes, 28)}")
    require(u32(bytes, 30) == 0, "only BI_RGB (uncompressed) BMP supported")
    require(w > 0 && h > 0, s"unsupported BMP dims ${w}x$hRaw")
    val stride = bmpStride(w)
    require(bytes.length >= off + h * stride, "BMP pixel data truncated")
    val luma = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val base = off + (if (topDown) y else h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val o = base + x * 3
        val bl = bytes(o) & 0xff
        val g = bytes(o + 1) & 0xff
        val r = bytes(o + 2) & 0xff
        luma(y * w + x) = r * 299 + g * 587 + bl * 114
        x += 1
      }
      y += 1
    }
    Image(w, h, luma)
  }

  // ---------------------------------------------------------------- WAV

  /** Total file size of a canonical PCM16 mono WAV: 44-byte header +
    * 2 bytes per sample. */
  def wavSize(nSamples: Int): Int = 44 + 2 * nSamples

  final case class Audio(sampleRate: Int, samples: Array[Short])

  /** Encode canonical RIFF/WAVE, PCM (format 1), mono, 16-bit LE. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val b = new Array[Byte](44 + dataLen)
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    putU32(b, 4, 36 + dataLen)
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
    putU32(b, 16, 16) // fmt chunk size
    putU16(b, 20, 1) // PCM
    putU16(b, 22, 1) // mono
    putU32(b, 24, sampleRate)
    putU32(b, 28, sampleRate * 2) // byte rate
    putU16(b, 32, 2) // block align
    putU16(b, 34, 16) // bits per sample
    b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
    putU32(b, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      putU16(b, 44 + i * 2, samples(i) & 0xffff)
      i += 1
    }
    b
  }

  /** Parse a PCM16 mono WAV by WALKING THE RIFF CHUNK CHAIN: `fmt `
    * and `data` are located by id wherever they sit, so real-world
    * files carrying LIST/INFO/fact/cue chunks (metadata most encoders
    * emit) decode instead of hard-failing the pipeline row. Chunk
    * sizes honor RIFF's word alignment (odd-sized chunks carry one
    * pad byte). Sample semantics are unchanged — 16-bit signed LE
    * integers, byte-exact. */
  def decodeWav(bytes: Array[Byte]): Audio = {
    require(bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
      "not a RIFF/WAVE file")
    var fmtOff = -1
    var fmtLen = -1
    var dataOff = -1
    var dataLen = -1
    var off = 12
    while (off + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
      val id = new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = u32(bytes, off + 4)
      // compare in the subtraction form: `off + 8 + len` overflows Int
      // for a crafted multi-GB declared size and would bypass the guard
      require(len >= 0 && len <= bytes.length - off - 8, s"WAV chunk '$id' truncated")
      if (id == "fmt " && fmtOff < 0) { fmtOff = off + 8; fmtLen = len }
      else if (id == "data" && dataOff < 0) { dataOff = off + 8; dataLen = len }
      off += 8 + len + (len & 1) // RIFF word alignment: odd chunks pad 1
    }
    require(fmtOff >= 0, "WAV has no fmt chunk")
    require(dataOff >= 0, "WAV has no data chunk")
    // the chunk's OWN declared size must cover the 16 PCM fields — a
    // fmt chunk declaring len < 16 would otherwise read its
    // format/channels/rate/width fields from the NEXT chunk's header
    // bytes in-bounds: a silent misparse instead of a loud reject
    require(fmtLen >= 16, s"WAV fmt chunk truncated: declared size $fmtLen < 16")
    require(u16(bytes, fmtOff) == 1 && u16(bytes, fmtOff + 2) == 1 &&
      u16(bytes, fmtOff + 14) == 16,
      "only PCM16 mono WAV supported")
    val rate = u32(bytes, fmtOff + 4)
    require(dataLen % 2 == 0, "WAV data truncated")
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) { samples(i) = u16(bytes, dataOff + i * 2).toShort; i += 1 }
    Audio(rate, samples)
  }

  // ---------------------------------------------------------------- GVID

  /** Total container size: 8-byte header + per frame 4-byte length
    * prefix + the frame payload. */
  def gvidSize(frameSizes: Seq[Int]): Int = 8 + frameSizes.map(_ + 4).sum

  /** Encode the frame container: "GVID", u32 LE count, then per frame
    * u32 LE length + frame bytes (each frame a full BMP). */
  def encodeGvid(frames: Seq[Array[Byte]]): Array[Byte] = {
    val size = gvidSize(frames.map(_.length))
    val b = new Array[Byte](size)
    b(0) = 'G'; b(1) = 'V'; b(2) = 'I'; b(3) = 'D'
    putU32(b, 4, frames.length)
    var off = 8
    frames.foreach { f =>
      putU32(b, off, f.length)
      System.arraycopy(f, 0, b, off + 4, f.length)
      off += 4 + f.length
    }
    b
  }

  /** Parse the container's frame index: (byteOffset, byteLength) of
    * each frame payload inside the blob, walking the real
    * length-prefix chain (no fixed-stride assumption). */
  def gvidFrameIndex(bytes: Array[Byte]): IndexedSeq[(Long, Int)] = {
    require(bytes.length >= 8 &&
      bytes(0) == 'G' && bytes(1) == 'V' && bytes(2) == 'I' && bytes(3) == 'D',
      "not a GVID container")
    val n = u32(bytes, 4)
    val out = new scala.collection.mutable.ArrayBuffer[(Long, Int)](n)
    var off = 8
    var i = 0
    while (i < n) {
      require(bytes.length >= off + 4, "GVID frame index truncated")
      val len = u32(bytes, off)
      // subtraction form: `off + 4 + len` overflows Int for a crafted
      // multi-GB declared length and would bypass the guard (the
      // decodeWav chunk-walk discipline)
      require(len >= 0 && len <= bytes.length - off - 4, "GVID frame payload truncated")
      out += ((off + 4L, len))
      off += 4 + len
      i += 1
    }
    out.toIndexedSeq
  }

  /** Decode every frame of a GVID container into luma grids. */
  def decodeGvid(bytes: Array[Byte]): IndexedSeq[Image] =
    gvidFrameIndex(bytes).map { case (off, len) =>
      decodeBmp(java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + len))
    }
}
