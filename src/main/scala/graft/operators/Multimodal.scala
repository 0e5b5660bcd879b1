package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column handling (SURVEY.md §2.12): media payloads ride as
 * opaque `binary` columns with typed metadata; decode / feature-extract
 * runs as a batched per-partition pass (the Scala analogue of
 * `mapInPandas` — one buffer of rows at a time, so a real codec can
 * amortize per-batch setup). Payloads never shuffle: every operator
 * here is a narrow map (or flatMap fan-out) whose output is a handful
 * of numeric columns, which is the only shape that survives 100 TB —
 * the binary column stays in its input partition and is dropped the
 * moment features are extracted.
 *
 * The decode is REAL (since r11): [[MediaCodec]] parses uncompressed
 * BMP (header offset, 4-byte row stride, bottom-up flip, B-G-R order),
 * canonical PCM16 WAV, and a length-prefixed frame container. The
 * container has no JPEG/MP3 native libs, so the test harness RENDERS
 * deterministic synthetic payloads in those formats ([[renderMedia]])
 * from the documents table; the decoder never peeks at the generator —
 * it parses bytes only — and the DuckDB oracle re-derives pixels and
 * samples from the documented generator arithmetic, so any encoder or
 * decoder disagreement (stride, row order, channel order, sample
 * width) breaks the byte-exact gate.
 */
object Multimodal {

  /** Typed media row: payload + metadata, the cross-modality envelope. */
  case class MediaRow(doc_id: Long, fmt: String, payload: Array[Byte])

  // ------------------------------------------------------------------
  // Deterministic synthetic-media generator (the test-harness source;
  // production payloads arrive in the binary column from ingest).
  // The DuckDB oracle mirrors this arithmetic EXACTLY — change both
  // together (OracleSql q_multimodal_*).
  // ------------------------------------------------------------------

  /** Image width: 8 + (d·5 + 1) mod 17 → 8..24. Mostly not a multiple
    * of 4, so BMP row padding is exercised. */
  def imgW(d: Long): Int = (8 + Math.floorMod(d * 5 + 1, 17)).toInt

  /** Image height: 8 + (d·3 + 2) mod 13 → 8..20. */
  def imgH(d: Long): Int = (8 + Math.floorMod(d * 3 + 2, 13)).toInt

  /** Audio sample count: 64 + d mod 193. */
  def nSamples(d: Long): Int = (64 + Math.floorMod(d, 193)).toInt

  /** Video frame count: 1 + d mod 4 → 1..4. */
  def nFrames(d: Long): Int = (1 + Math.floorMod(d, 4)).toInt

  /** Pixel color at column x, row y (top-down) of frame t: three
    * DIFFERENT channel formulas, each asymmetric in x and y, so a
    * channel-order or row/column-flip bug in encode or decode changes
    * the luma grid and fails the gate. */
  def pixel(d: Long, t: Int, x: Int, y: Int): (Int, Int, Int) = (
    Math.floorMod(d * 3 + x * 7L + y * 13L + t * 29L, 256).toInt,
    Math.floorMod(d * 5 + x * 11L + y * 3L + t * 31L, 256).toInt,
    Math.floorMod(d * 7 + x * 5L + y * 17L + t * 37L, 256).toInt)

  /** Audio sample i: (d·31 + i·17) mod 65536 − 32768 (full i16 range). */
  def sample(d: Long, i: Int): Short =
    (Math.floorMod(d * 31 + i * 17L, 65536) - 32768).toShort

  /** Render the media table from document ids: fmt round-robins
    * img/audio/video (pmod, so signed-hash ids stay in range), payload
    * is a real encoded BMP / WAV / GVID container. Narrow map — each
    * payload is built where its id lives. */
  def renderMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { d =>
      Math.floorMod(d, 3) match {
        case 0 =>
          MediaRow(d, "img", MediaCodec.encodeBmp(imgW(d), imgH(d), (x, y) => pixel(d, 0, x, y)))
        case 1 =>
          MediaRow(d, "audio", MediaCodec.encodeWav(8000, Array.tabulate(nSamples(d))(i => sample(d, i))))
        case _ =>
          val (w, h) = (imgW(d), imgH(d))
          MediaRow(d, "video", MediaCodec.encodeGvid(
            (0 until nFrames(d)).map(t => MediaCodec.encodeBmp(w, h, (x, y) => pixel(d, t, x, y)))))
      }
    }
  }

  // ------------------------------------------------------------------
  // Decode / feature extraction (format-dispatched, REAL parse)
  // ------------------------------------------------------------------

  /** Decoded per-media features. `content_sum` is the exact-integer
    * content digest that proves the decode: Σ lumaMilli over every
    * decoded pixel (img/video frames), Σ (sample + 32768) over every
    * decoded sample (audio) — wrong stride/flip/channel-order/sample
    * parse changes it. width/height are 0 for audio. */
  case class MediaMeta(doc_id: Long, fmt: String, byte_len: Long,
                       width: Int, height: Int, frame_count: Long, content_sum: Long)

  private def metaOf(r: MediaRow): MediaMeta = r.fmt match {
    case "img" =>
      val im = MediaCodec.decodeBmp(r.payload)
      var s = 0L; var i = 0
      while (i < im.lumaMilli.length) { s += im.lumaMilli(i); i += 1 }
      MediaMeta(r.doc_id, r.fmt, r.payload.length.toLong, im.width, im.height, 1L, s)
    case "audio" =>
      val a = MediaCodec.decodeWav(r.payload)
      var s = 0L; var i = 0
      while (i < a.samples.length) { s += a.samples(i) + 32768L; i += 1 }
      MediaMeta(r.doc_id, r.fmt, r.payload.length.toLong, 0, 0, a.samples.length.toLong, s)
    case "video" =>
      val frames = MediaCodec.decodeGvid(r.payload)
      var s = 0L
      frames.foreach { im => var i = 0; while (i < im.lumaMilli.length) { s += im.lumaMilli(i); i += 1 } }
      val (w, h) = if (frames.isEmpty) (0, 0) else (frames.head.width, frames.head.height)
      MediaMeta(r.doc_id, r.fmt, r.payload.length.toLong, w, h, frames.length.toLong, s)
    case other => throw new IllegalArgumentException(s"unknown media format: $other")
  }

  /**
   * Batched decode pass: partition-local, processes rows in fixed-size
   * buffers (the `mapInPandas` batch shape) so a real codec can
   * amortize per-batch setup. No shuffle — width-preserving map that
   * REPLACES the payload with 5 numeric columns.
   */
  def decodeFeatures(spark: SparkSession, media: Dataset[MediaRow], batchSize: Int = 512): Dataset[MediaMeta] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch codec init would happen here
        batch.iterator.map(metaOf)
      }
    }
  }

  /** Lenient decode row: the [[MediaMeta]] fields nullable, plus a
    * `decode_error` column. Exactly one of (feature fields,
    * decode_error) is populated per row. */
  case class MediaMetaLenient(doc_id: Long, fmt: String, byte_len: Long,
                              width: Option[Int], height: Option[Int],
                              frame_count: Option[Long], content_sum: Option[Long],
                              decode_error: Option[String])

  /**
   * LENIENT batched decode: the production mode for a 100 TB corpus,
   * where one corrupt payload must flag a row, not fail the job. Each
   * row's decode runs under Try — a malformed payload (bad magic,
   * truncated pixel data, unsupported bit depth, unknown fmt tag …)
   * yields null feature columns and the exception's message in
   * `decode_error`, while every other row in the partition decodes
   * normally. The strict [[decodeFeatures]] stays the gate/test mode:
   * there a decode failure is a bug and must be loud. Error text is
   * capped at 256 chars so a pathological message cannot bloat the
   * output (the messages are human triage keys, not data).
   */
  def decodeFeaturesLenient(
      spark: SparkSession, media: Dataset[MediaRow], batchSize: Int = 512): Dataset[MediaMetaLenient] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          scala.util.Try(metaOf(r)) match {
            case scala.util.Success(m) =>
              MediaMetaLenient(m.doc_id, m.fmt, m.byte_len,
                Some(m.width), Some(m.height), Some(m.frame_count), Some(m.content_sum), None)
            case scala.util.Failure(e) =>
              val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"
              // payload may itself be null (a nullable binary column is
              // exactly the corrupt-row class this mode survives) — the
              // error row must not NPE computing its own byte_len
              val len = Option(r.payload).map(_.length.toLong).getOrElse(0L)
              MediaMetaLenient(r.doc_id, r.fmt, len,
                None, None, None, None, Some(msg.take(256)))
          }
        }
      }
    }
  }

  /** One frame of a media payload. For video, (byte_offset,
    * frame_bytes) address the frame's BMP inside the blob as parsed
    * from the container's real length-prefix index; img/audio are a
    * single whole-payload frame. */
  case class Frame(doc_id: Long, fmt: String, frame_idx: Long, byte_offset: Long, frame_bytes: Long)

  /**
   * Frame sampling: the one-to-many decode shape (a video row explodes
   * into frame rows) over the REAL container index. flatMap streams
   * frames out — output cardinality is data-dependent and must never
   * buffer whole groups.
   */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow]): Dataset[Frame] = {
    import spark.implicits._
    media.flatMap { r =>
      r.fmt match {
        case "video" =>
          MediaCodec.gvidFrameIndex(r.payload).iterator.zipWithIndex.map {
            case ((off, len), i) => Frame(r.doc_id, r.fmt, i.toLong, off, len.toLong)
          }
        case _ =>
          Iterator(Frame(r.doc_id, r.fmt, 0L, 0L, r.payload.length.toLong))
      }
    }
  }

  /** Per-media average-hash: 64-bit perceptual fingerprint carried as
    * two 32-bit halves — a single BIGINT cannot hold bit 63 portably
    * (DuckDB's 1::BIGINT << 63 overflows), and hamming over two halves
    * is the same two xor+bit_count terms. */
  case class PHash(doc_id: Long, fmt: String, byte_len: Long, phash_hi: Long, phash_lo: Long)

  /**
   * Average-hash (aHash) perceptual fingerprint over REAL decoded
   * pixels — the image near-dup primitive. The payload is BMP-decoded
   * to a top-down luma grid ([[MediaCodec.decodeBmp]]); pixel (x, y)
   * lands in grid cell (⌊8y/h⌋, ⌊8x/w⌋) — an exact integer box
   * downsample to 8×8 (requires w ≥ 8 and h ≥ 8 so every cell is
   * non-empty); bit_i = 1 iff the cell's luma mean exceeds the global
   * mean, compared in exact integers (cs_i·N > total·cn_i — no
   * division, so no rounding divergence between engines; luma ≤
   * 255 000 keeps the products far inside Long for any image whose
   * grid fits in memory). Bit 0 is the MSB of phash_hi (cell row 0,
   * col 0), bit 63 the LSB of phash_lo. Partition-local narrow map:
   * payloads never shuffle, the output is 4 numeric columns.
   */
  def aHash(spark: SparkSession, media: Dataset[MediaRow]): Dataset[PHash] = {
    import spark.implicits._
    media.map { r =>
      val im = MediaCodec.decodeBmp(r.payload)
      val (w, h) = (im.width, im.height)
      require(w >= 8 && h >= 8, s"aHash needs >= 8x8 pixels, got ${w}x$h")
      val cs = new Array[Long](64)
      val cn = new Array[Long](64)
      var y = 0
      while (y < h) {
        val ry = (y * 8 / h) * 8
        var x = 0
        while (x < w) {
          val ci = ry + x * 8 / w
          cs(ci) += im.lumaMilli(y * w + x)
          cn(ci) += 1L
          x += 1
        }
        y += 1
      }
      val total = cs.sum
      val n = w.toLong * h
      var hi = 0L
      var lo = 0L
      var i = 0
      while (i < 64) {
        if (cs(i) * n > total * cn(i)) {
          if (i < 32) hi |= 1L << (31 - i) else lo |= 1L << (63 - i)
        }
        i += 1
      }
      PHash(r.doc_id, r.fmt, r.payload.length.toLong, hi, lo)
    }
  }

  /** Resized image: exact-integer box-average luma thumbnail. `thumb`
    * is the row-major out_h×out_w grid of cell values (luma·1000,
    * floor-averaged); `thumb_digest` position-weights the cells so a
    * transposed/flipped/mis-strided resize cannot cancel in the sum. */
  case class Resized(doc_id: Long, width: Int, height: Int,
                     out_w: Int, out_h: Int, thumb: Array[Long],
                     thumb_sum: Long, thumb_digest: Long)

  /**
   * Image RESIZE — the remaining decode-family verb (decode /
   * feature-extract / frame-sample live above): box-average downsample
   * of the REAL decoded luma grid to outW×outH in exact integers.
   * Pixel (x, y) lands in cell (⌊outH·y/h⌋, ⌊outW·x/w⌋) — the aHash
   * grid generalized to any output shape (requires w ≥ outW, h ≥ outH
   * so no cell is empty) — and the cell's value is
   * floor(Σ lumaMilli / pixelCount): one exact integer division, so
   * both engines (and any engine) compute the identical thumbnail.
   * Partition-local narrow map; payloads never shuffle; output is the
   * outW·outH-long thumb plus digest columns. Video resizes its FIRST
   * frame (the poster-frame convention); audio rows are excluded.
   */
  def resizeLuma(
      spark: SparkSession, media: Dataset[MediaRow],
      outW: Int = 4, outH: Int = 4): Dataset[Resized] = {
    import spark.implicits._
    require(outW >= 1 && outH >= 1, s"output dims must be positive, got ${outW}x$outH")
    media.filter((r: MediaRow) => r.fmt != "audio").map { r =>
      val im = r.fmt match {
        case "img" => MediaCodec.decodeBmp(r.payload)
        case _ =>
          val (off, len) = MediaCodec.gvidFrameIndex(r.payload).head
          MediaCodec.decodeBmp(java.util.Arrays.copyOfRange(r.payload, off.toInt, off.toInt + len))
      }
      val (w, h) = (im.width, im.height)
      require(w >= outW && h >= outH,
        s"resize to ${outW}x$outH needs at least that many pixels, got ${w}x$h")
      val cs = new Array[Long](outW * outH)
      val cn = new Array[Long](outW * outH)
      var y = 0
      while (y < h) {
        val ry = (y * outH / h) * outW
        var x = 0
        while (x < w) {
          val ci = ry + x * outW / w
          cs(ci) += im.lumaMilli(y * w + x)
          cn(ci) += 1L
          x += 1
        }
        y += 1
      }
      val thumb = Array.tabulate(outW * outH)(i => cs(i) / cn(i))
      var sum = 0L
      var dig = 0L
      var i = 0
      while (i < thumb.length) { sum += thumb(i); dig += (i + 1L) * thumb(i); i += 1 }
      Resized(r.doc_id, w, h, outW, outH, thumb, sum, dig)
    }
  }

  /**
   * Near-duplicate media pairs by hamming distance over [[aHash]]:
   * candidates from the 8×8-bit block pigeonhole — two hashes within
   * hamming ≤ 7 MUST agree on at least one of the 8 byte-blocks (7
   * errors cannot touch all 8), so recall is complete for
   * radius ≤ 7 (enforced) — then the exact xor+bit_count verify.
   * Scale: the self-join moves (id, hash, block) rows only — never a
   * payload; hot block values (all-zero/all-one bytes are common in
   * aHash) are the skew dial — cap or salt them at corpus scale, the
   * [[Dedup]] simhash-block discipline.
   */
  def phashPairs(hashes: DataFrame, radius: Int): DataFrame = {
    require(radius >= 0 && radius <= 7,
      s"8-block pigeonhole recall is complete only to radius 7, got $radius")
    val blocks = hashes.select(
      col("doc_id"), col("phash_hi"), col("phash_lo"),
      explode(expr(
        "transform(sequence(0, 7), i -> struct(i AS blk, CASE WHEN i < 4" +
          " THEN shiftrightunsigned(phash_hi, (3 - i) * 8) % 256" +
          " ELSE shiftrightunsigned(phash_lo, (7 - i) * 8) % 256 END AS v))")).as("b"))
      .select(col("doc_id"), col("phash_hi"), col("phash_lo"),
        col("b.blk").as("blk"), col("b.v").as("v"))
    val cand = blocks.as("a")
      .join(blocks.as("b").hint("shuffle_hash"),
        col("a.blk") === col("b.blk") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.phash_hi").as("ha"), col("a.phash_lo").as("la"),
        col("b.phash_hi").as("hb"), col("b.phash_lo").as("lb"))
      .distinct()
    cand
      .withColumn("hamming",
        (bit_count(col("ha").bitwiseXOR(col("hb"))) +
          bit_count(col("la").bitwiseXOR(col("lb")))).cast("int"))
      .filter(col("hamming") <= radius)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
