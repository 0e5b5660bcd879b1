package graft

import graft.operators.{MediaCodec, Multimodal}

/**
 * Byte-level codec specs: golden byte arrays constructed BY HAND from
 * the published format layouts (BMP BITMAPINFOHEADER, canonical RIFF
 * WAVE) — not via the encoder — so an encoder+decoder bug pair that
 * cancels in roundtrip tests still fails here.
 */
class MultimodalSpec extends SparkSpecBase {

  private def u32le(v: Int): Seq[Byte] =
    Seq((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte, ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
  private def u16le(v: Int): Seq[Byte] = Seq((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)

  /** Hand-built 2x2 24-bit BMP. Pixels (top-down, r,g,b):
    *   (0,0)=(255,0,0) (1,0)=(0,255,0)
    *   (0,1)=(0,0,255) (1,1)=(10,20,30)
    * stride = ((2*3+3)/4)*4 = 8, so each row carries 2 padding bytes;
    * the FILE stores the BOTTOM row first, channels in B-G-R order.
    */
  private val goldenBmp: Array[Byte] = (
    Seq('B'.toByte, 'M'.toByte) ++ u32le(70) ++ u32le(0) ++ u32le(54) ++
      u32le(40) ++ u32le(2) ++ u32le(2) ++ u16le(1) ++ u16le(24) ++ u32le(0) ++
      u32le(16) ++ u32le(2835) ++ u32le(2835) ++ u32le(0) ++ u32le(0) ++
      // bottom row first: (0,1)=(0,0,255) -> B=255,G=0,R=0 ; (1,1)=(10,20,30) -> B=30,G=20,R=10 ; pad
      Seq(255, 0, 0, 30, 20, 10, 0, 0).map(_.toByte) ++
      // top row: (0,0)=(255,0,0) -> B=0,G=0,R=255 ; (1,0)=(0,255,0) -> B=0,G=255,R=0 ; pad
      Seq(0, 0, 255, 0, 255, 0, 0, 0).map(_.toByte)
    ).toArray

  test("BMP decode: golden hand-built bytes yield the spec'd top-down luma grid") {
    val im = MediaCodec.decodeBmp(goldenBmp)
    assert(im.width == 2 && im.height == 2)
    // luma*1000 = r*299 + g*587 + b*114
    assert(im.lumaMilli.toSeq == Seq(
      255 * 299, 255 * 587, // top row: red, green
      255 * 114, 10 * 299 + 20 * 587 + 30 * 114)) // bottom row: blue, mixed
  }

  test("BMP encode: encoder reproduces the golden bytes exactly") {
    val px = Map((0, 0) -> (255, 0, 0), (1, 0) -> (0, 255, 0), (0, 1) -> (0, 0, 255), (1, 1) -> (10, 20, 30))
    val enc = MediaCodec.encodeBmp(2, 2, (x, y) => px((x, y)))
    assert(enc.toSeq == goldenBmp.toSeq)
  }

  test("BMP decode: top-down (negative biHeight) rows read in file order") {
    // same four pixels as goldenBmp but stored TOP-DOWN: biHeight = -2
    // and the file carries the top row first, no flip on read
    val topDown: Array[Byte] = (
      Seq('B'.toByte, 'M'.toByte) ++ u32le(70) ++ u32le(0) ++ u32le(54) ++
        u32le(40) ++ u32le(2) ++ u32le(-2) ++ u16le(1) ++ u16le(24) ++ u32le(0) ++
        u32le(16) ++ u32le(2835) ++ u32le(2835) ++ u32le(0) ++ u32le(0) ++
        // top row first: (0,0)=(255,0,0) -> B-G-R 0,0,255 ; (1,0)=(0,255,0)
        Seq(0, 0, 255, 0, 255, 0, 0, 0).map(_.toByte) ++
        // bottom row: (0,1)=(0,0,255) ; (1,1)=(10,20,30)
        Seq(255, 0, 0, 30, 20, 10, 0, 0).map(_.toByte)
      ).toArray
    val im = MediaCodec.decodeBmp(topDown)
    assert(im.width == 2 && im.height == 2)
    // identical luma grid to the bottom-up golden file
    assert(im.lumaMilli.toSeq == MediaCodec.decodeBmp(goldenBmp).lumaMilli.toSeq)
  }

  test("BMP decode rejects malformed payloads") {
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(Array[Byte](1, 2, 3)))
    val bad = goldenBmp.clone(); bad(28) = 8 // 8-bit depth
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(bad))
    val rle = goldenBmp.clone(); rle(30) = 1 // BI_RLE8
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(rle))
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(goldenBmp.take(60))) // truncated pixels
  }

  /** Hand-built canonical WAV: 8000 Hz mono PCM16, samples (+1000, -2). */
  private val goldenWav: Array[Byte] = (
    Seq('R', 'I', 'F', 'F').map(_.toByte) ++ u32le(40) ++ Seq('W', 'A', 'V', 'E').map(_.toByte) ++
      Seq('f', 'm', 't', ' ').map(_.toByte) ++ u32le(16) ++ u16le(1) ++ u16le(1) ++
      u32le(8000) ++ u32le(16000) ++ u16le(2) ++ u16le(16) ++
      Seq('d', 'a', 't', 'a').map(_.toByte) ++ u32le(4) ++
      u16le(1000) ++ u16le(0x10000 - 2) // -2 as two's-complement u16
    ).toArray

  test("WAV decode: golden hand-built bytes yield rate + signed samples") {
    val a = MediaCodec.decodeWav(goldenWav)
    assert(a.sampleRate == 8000)
    assert(a.samples.toSeq == Seq[Short](1000, -2))
  }

  test("WAV encode: encoder reproduces the golden bytes exactly") {
    assert(MediaCodec.encodeWav(8000, Array[Short](1000, -2)).toSeq == goldenWav.toSeq)
  }

  test("WAV decode: chunk walk finds fmt/data past LIST metadata and honors odd-chunk padding") {
    // real-world layout: a LIST/INFO chunk (odd-sized payload → one pad
    // byte, exercising RIFF word alignment) and a fact chunk sit
    // BETWEEN fmt and data; the decoder must locate both by id
    val listPayload = Seq('I', 'N', 'F', 'O', 'x', 'y', 'z').map(_.toByte) // 7 bytes: odd
    val withMeta: Array[Byte] = (
      Seq('R', 'I', 'F', 'F').map(_.toByte) ++ u32le(40 + 8 + 8 + 12 + 4) ++
        Seq('W', 'A', 'V', 'E').map(_.toByte) ++
        Seq('f', 'm', 't', ' ').map(_.toByte) ++ u32le(16) ++ u16le(1) ++ u16le(1) ++
        u32le(8000) ++ u32le(16000) ++ u16le(2) ++ u16le(16) ++
        Seq('L', 'I', 'S', 'T').map(_.toByte) ++ u32le(7) ++ listPayload ++ Seq(0.toByte) ++ // pad
        Seq('f', 'a', 'c', 't').map(_.toByte) ++ u32le(4) ++ u32le(2) ++
        Seq('d', 'a', 't', 'a').map(_.toByte) ++ u32le(4) ++
        u16le(1000) ++ u16le(0x10000 - 2)
      ).toArray
    val a = MediaCodec.decodeWav(withMeta)
    assert(a.sampleRate == 8000)
    assert(a.samples.toSeq == Seq[Short](1000, -2))
    // identical result to the canonical-layout golden file
    assert(a.samples.toSeq == MediaCodec.decodeWav(goldenWav).samples.toSeq)
    // still loud on files that genuinely lack the chunks
    val noData = withMeta.take(withMeta.length - 12) // strip the data chunk
    val e = intercept[IllegalArgumentException](MediaCodec.decodeWav(noData))
    assert(e.getMessage.contains("no data chunk"))
    // a crafted chunk size near Int.MaxValue must hit the truncation
    // guard, not overflow past it into an allocation/index crash
    val crafted = goldenWav.clone()
    crafted(40) = 0xF0.toByte; crafted(41) = 0xFF.toByte
    crafted(42) = 0xFF.toByte; crafted(43) = 0x7F.toByte // data len = 0x7FFFFFF0
    val o = intercept[IllegalArgumentException](MediaCodec.decodeWav(crafted))
    assert(o.getMessage.contains("truncated"), o.getMessage)
  }

  test("GVID: parsed frame index walks the real length-prefix chain") {
    val f1 = Array.tabulate(10)(_.toByte)
    val f2 = Array.tabulate(3)(i => (i + 50).toByte)
    val blob = MediaCodec.encodeGvid(Seq(f1, f2))
    assert(blob.length == MediaCodec.gvidSize(Seq(10, 3)))
    val idx = MediaCodec.gvidFrameIndex(blob)
    assert(idx == IndexedSeq((12L, 10), (26L, 3)))
    assert(java.util.Arrays.copyOfRange(blob, 12, 22).toSeq == f1.toSeq)
    assert(java.util.Arrays.copyOfRange(blob, 26, 29).toSeq == f2.toSeq)
    intercept[IllegalArgumentException](MediaCodec.gvidFrameIndex(blob.take(20)))
  }

  test("video decode: GVID of BMPs roundtrips every frame's pixels") {
    val d = 7L
    val (w, h, nf) = (Multimodal.imgW(d), Multimodal.imgH(d), Multimodal.nFrames(d))
    val blob = MediaCodec.encodeGvid(
      (0 until nf).map(t => MediaCodec.encodeBmp(w, h, (x, y) => Multimodal.pixel(d, t, x, y))))
    val frames = MediaCodec.decodeGvid(blob)
    assert(frames.length == nf)
    for (t <- 0 until nf; y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = Multimodal.pixel(d, t, x, y)
      assert(frames(t).lumaMilli(y * w + x) == r * 299 + g * 587 + b * 114, s"frame $t pixel ($x,$y)")
    }
  }

  test("aHash requires a decodable BMP of at least 8x8") {
    import spark.implicits._
    val tiny = MediaCodec.encodeBmp(4, 4, (_, _) => (1, 2, 3))
    val media = Seq((1L, "img", tiny)).toDF("doc_id", "fmt", "payload").as[Multimodal.MediaRow]
    val e = intercept[org.apache.spark.SparkException](Multimodal.aHash(spark, media).collect())
    assert(e.getMessage != null)
  }

  test("rendered near-dup image (few-pixel perturbation) is caught by phashPairs") {
    import spark.implicits._
    // a: strong left-dark / right-bright split -> decisive bits
    def base(x: Int, y: Int): (Int, Int, Int) = {
      val v = if (x >= 16) 220 else 15
      (v, v, v)
    }
    val a = MediaCodec.encodeBmp(32, 32, base)
    // b: same image with a 2x2 pixel blemish — a true near-dup, hamming 0
    val b = MediaCodec.encodeBmp(32, 32, (x, y) =>
      if (x < 2 && y < 2) (40, 40, 40) else base(x, y))
    // c: the mirror image — every bit flips, far
    val c = MediaCodec.encodeBmp(32, 32, (x, y) => base(31 - x, y))
    val media = Seq((1L, "img", a), (2L, "img", b), (3L, "img", c))
      .toDF("doc_id", "fmt", "payload").as[Multimodal.MediaRow]
    val hashes = Multimodal.aHash(spark, media).toDF()
    val pairs = Multimodal.phashPairs(hashes, radius = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.exists { case (x, y, _) => x == 1L && y == 2L }, s"near-dup pair missing: $pairs")
    assert(!pairs.exists { case (x, y, _) => y == 3L || x == 3L }, s"mirror image must not pair: $pairs")
  }

  test("resizeLuma: hand-computed box averages, floor division, poster frame, audio excluded") {
    import spark.implicits._
    // 4x2 grayscale -> 2x1: cell 0 = x{0,1}, cell 1 = x{2,3}
    val img = MediaCodec.encodeBmp(4, 2, (x, y) => {
      val v = Map((0, 0) -> 10, (1, 0) -> 20, (0, 1) -> 30, (1, 1) -> 40,
        (2, 0) -> 100, (3, 0) -> 101, (2, 1) -> 102, (3, 1) -> 103)((x, y))
      (v, v, v)
    })
    // 5x2 -> 2x1: cell 0 gets SIX pixels summing 10000 luma-milli ->
    // floor(10000/6) = 1666 — pins floor (not round) division
    val odd = MediaCodec.encodeBmp(5, 2, (x, y) =>
      if (x <= 2) { val v = Seq(1, 2, 2)(x); (v, v, v) } else (8, 8, 8))
    // video: poster frame (t=0) all-50, second frame all-200 — the
    // resize must read frame 0 through the container index
    val vid = MediaCodec.encodeGvid(Seq(
      MediaCodec.encodeBmp(4, 2, (_, _) => (50, 50, 50)),
      MediaCodec.encodeBmp(4, 2, (_, _) => (200, 200, 200))))
    val wav = MediaCodec.encodeWav(8000, Array[Short](1, 2, 3))
    val media = Seq((1L, "img", img), (2L, "img", odd), (3L, "video", vid), (4L, "audio", wav))
      .toDF("doc_id", "fmt", "payload").as[Multimodal.MediaRow]
    val out = Multimodal.resizeLuma(spark, media, outW = 2, outH = 1)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L), "audio row must be excluded")
    assert(out(1L).thumb.toSeq == Seq(25000L, 101500L))
    assert(out(1L).thumb_sum == 126500L && out(1L).thumb_digest == 1L * 25000 + 2L * 101500)
    assert(out(2L).thumb.toSeq == Seq(1666L, 8000L)) // floor, not round
    assert(out(3L).thumb.toSeq == Seq(50000L, 50000L), "poster frame, not frame 1")
    assert(out(1L).out_w == 2 && out(1L).out_h == 1 && out(1L).width == 4 && out(1L).height == 2)
  }

  test("WAV decode rejects a fmt chunk whose declared size is < 16") {
    // fmt declares len 4: the PCM fields would be read in-bounds from
    // the NEXT chunk's header bytes — a silent misparse unless the
    // chunk's OWN declared size is validated
    val crafted: Array[Byte] = (
      Seq('R', 'I', 'F', 'F').map(_.toByte) ++ u32le(4 + 8 + 4 + 8 + 4) ++
        Seq('W', 'A', 'V', 'E').map(_.toByte) ++
        Seq('f', 'm', 't', ' ').map(_.toByte) ++ u32le(4) ++ u16le(1) ++ u16le(1) ++
        Seq('d', 'a', 't', 'a').map(_.toByte) ++ u32le(4) ++
        u16le(1000) ++ u16le(0x10000 - 2)
      ).toArray
    val e = intercept[IllegalArgumentException](MediaCodec.decodeWav(crafted))
    assert(e.getMessage.contains("fmt chunk truncated"), e.getMessage)
  }

  test("GVID frame length near Int.MaxValue hits the truncation guard, not an overflow") {
    val blob = MediaCodec.encodeGvid(Seq(Array.tabulate(10)(_.toByte)))
    // first frame's length prefix (offset 8) -> 0x7FFFFFF0: `off+4+len`
    // overflows Int and would slip past an addition-form bounds check
    blob(8) = 0xF0.toByte; blob(9) = 0xFF.toByte
    blob(10) = 0xFF.toByte; blob(11) = 0x7F.toByte
    val e = intercept[IllegalArgumentException](MediaCodec.gvidFrameIndex(blob))
    assert(e.getMessage.contains("truncated"), e.getMessage)
  }

  test("lenient decode: corrupt payloads flag rows, good rows beside them decode exactly") {
    import spark.implicits._
    val goodImg = MediaCodec.encodeBmp(8, 8, (x, y) => (x * 10, y * 10, 40))
    val goodWav = MediaCodec.encodeWav(8000, Array[Short](5, -7, 11))
    val truncImg = goodImg.take(goodImg.length - 10) // pixel data cut short
    val garbage = Array.tabulate(32)(i => (i * 37).toByte) // no magic at all
    val media = Seq(
      Multimodal.MediaRow(1L, "img", goodImg),
      Multimodal.MediaRow(2L, "audio", goodWav),
      Multimodal.MediaRow(3L, "img", truncImg),
      Multimodal.MediaRow(4L, "audio", garbage),
      Multimodal.MediaRow(5L, "weird", goodImg), // unknown format tag
      Multimodal.MediaRow(6L, "img", null) // null payload (nullable binary column)
    ).toDS()
    val out = Multimodal.decodeFeaturesLenient(spark, media)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out.size == 6, "every input row must survive, flagged or not")
    // good rows carry exactly the strict decode's features
    val strict = Multimodal.decodeFeatures(spark, media.filter((r: Multimodal.MediaRow) => r.doc_id <= 2))
      .collect().map(m => m.doc_id -> m).toMap
    for (id <- Seq(1L, 2L)) {
      val (l, s) = (out(id), strict(id))
      assert(l.decode_error.isEmpty)
      assert(l.width.contains(s.width) && l.height.contains(s.height) &&
        l.frame_count.contains(s.frame_count) && l.content_sum.contains(s.content_sum))
    }
    // corrupt rows: null features, populated bounded error (6 = null
    // payload — the error row must not NPE computing its own byte_len)
    for (id <- Seq(3L, 4L, 5L, 6L)) {
      val l = out(id)
      assert(l.width.isEmpty && l.height.isEmpty && l.frame_count.isEmpty && l.content_sum.isEmpty)
      assert(l.decode_error.exists(m => m.nonEmpty && m.length <= 256), s"row $id: ${l.decode_error}")
    }
    assert(out(3L).decode_error.get.contains("truncated"))
    assert(out(5L).decode_error.get.contains("unknown media format"))
    // the strict mode stays loud on the same mixed batch (gates depend on it)
    val thrown = intercept[org.apache.spark.SparkException](
      Multimodal.decodeFeatures(spark, media).collect())
    assert(thrown.getMessage != null)
  }
}
