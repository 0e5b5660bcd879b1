package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column handling (SURVEY.md §2.12): media payloads ride as
 * opaque `binary` columns with typed metadata; decode / feature-extract
 * runs as a batched per-partition pass (the Scala analogue of
 * `mapInPandas` — one buffer of rows at a time, vectorizable).
 *
 * The actual codec call is STUBBED (no image/audio libs in this
 * container): `decodeStub` derives deterministic fake features from the
 * payload bytes. The Spark-side plumbing — schema, batch shape,
 * partition-local processing, no shuffle — is real and is what matters
 * at 100 TB: payloads never leave their input partition, and metadata
 * extraction is a narrow map.
 */
object Multimodal {

  /** Typed media row: payload + metadata, the cross-modality envelope. */
  case class MediaRow(doc_id: Long, fmt: String, payload: Array[Byte])

  /** Extracted features (deterministic stub of the real decoder). */
  case class MediaFeatures(doc_id: Long, fmt: String, byte_len: Long, frame_count: Long, checksum: Long)

  /**
   * REAL DECODER GOES HERE. In production this calls the codec
   * (JPEG/PNG decode, audio resample, video frame-sample) on each
   * batch. Stubbed: features derived from payload length/content only.
   */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val len = r.payload.length.toLong
    // fake "frame count": one frame per STARTED 256-byte block — ceil,
    // not len/256+1, which emitted a phantom zero-byte frame for every
    // payload whose length is an exact multiple of 256
    val frames = (len + 255L) / 256L
    // cheap rolling checksum standing in for decoded-content features
    var cs = 0L
    var i = 0
    while (i < r.payload.length) { cs = (cs * 131L + (r.payload(i) & 0xffL)) % 2147483647L; i += 1 }
    MediaFeatures(r.doc_id, r.fmt, len, frames, cs)
  }

  /**
   * Wrap a text corpus as a media table: payload = utf-8 bytes, format
   * assigned round-robin — the harness for the plumbing until real
   * binary corpora are wired in.
   */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      // pmod, not %: a negative doc_id (signed-hash ids) makes % yield
      // 0/-1/-2 — index 0 is a runtime error and negatives silently
      // select from the array TAIL
      element_at(array(lit("img"), lit("audio"), lit("video")), (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("fmt"),
      encode(col("text"), "UTF-8").as("payload")
    )

  /** One sampled frame of a media payload (decode stub: fixed-stride offsets). */
  case class Frame(doc_id: Long, fmt: String, frame_idx: Long, byte_offset: Long, frame_bytes: Long)

  /**
   * Frame sampling: the one-to-many decode shape (a video row explodes
   * into frame rows). The real frame grab is stubbed (fixed 256-byte
   * stride); the Spark-side plumbing — flatMap fan-out, partition-local
   * decode, deterministic frame addressing — is real. At scale this is
   * a narrow map whose output cardinality is data-dependent, which is
   * why it must NOT buffer whole groups (flatMap streams frames out).
   */
  def sampleFrames(spark: SparkSession, media: DataFrame): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val len = r.payload.length.toLong
      val frames = (len + 255L) / 256L // ceil — see decodeStub
      (0L until frames).iterator.map { i =>
        val off = i * 256L
        Frame(r.doc_id, r.fmt, i, off, math.min(256L, len - off))
      }
    }
  }

  /**
   * Batched decode pass: partition-local, processes rows in fixed-size
   * buffers (the `mapInPandas` batch shape) so a real codec can
   * amortize per-batch setup. No shuffle — width-preserving map.
   */
  def extractFeatures(spark: SparkSession, media: DataFrame, batchSize: Int = 512): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch codec init would happen here
        batch.iterator.map(decodeStub)
      }
    }
  }

  /** Per-media average-hash: 64-bit perceptual fingerprint carried as
    * two 32-bit halves — a single BIGINT cannot hold bit 63 portably
    * (DuckDB's 1::BIGINT << 63 overflows), and hamming over two halves
    * is the same two xor+bit_count terms. */
  case class PHash(doc_id: Long, fmt: String, byte_len: Long, phash_hi: Long, phash_lo: Long)

  /**
   * Average-hash (aHash) perceptual fingerprint — the image near-dup
   * primitive. REAL DECODER GOES HERE: production decodes the payload
   * and downsamples luma to an 8×8 grid; the STUB downsamples the raw
   * byte stream instead (cell i = the bytes in
   * [⌊i·len/64⌋, ⌊(i+1)·len/64⌋) — a true fixed-grid downsample, so
   * everything downstream — integer-exact bit derivation, block
   * pigeonhole, hamming verify — is the real mechanism over fake
   * pixels. bit_i = 1 iff the cell mean exceeds the global mean,
   * compared in exact integers (cs_i·len > total·cn_i — no division,
   * so no rounding divergence between engines; empty cells of a
   * sub-64-byte payload compare 0 > 0 = unset). Partition-local narrow
   * map: payloads never shuffle, the output is 4 numeric columns.
   * A zero-length payload hashes to (0, 0) — callers screening real
   * corpora should drop empties first (the gate query filters them).
   */
  def aHash(spark: SparkSession, media: DataFrame): Dataset[PHash] = {
    import spark.implicits._
    media.as[MediaRow].map { r =>
      val len = r.payload.length.toLong
      if (len == 0L) PHash(r.doc_id, r.fmt, 0L, 0L, 0L)
      else {
        val cs = new Array[Long](64)
        val cn = new Array[Long](64)
        var i = 0
        while (i < 64) {
          val from = (i * len / 64).toInt
          val until = ((i + 1) * len / 64).toInt
          var o = from
          var s = 0L
          while (o < until) { s += (r.payload(o) & 0xffL); o += 1 }
          cs(i) = s; cn(i) = (until - from).toLong; i += 1
        }
        val total = cs.sum
        // cs·len and total·cn are ≤ ~4·len², past Long for multi-GB
        // payloads (len > ~1.5e9) — wraparound would invert bits that
        // DuckDB's HUGEINT-promoted oracle gets right. Exact big-int
        // compare on that cold path; plain longs below it.
        val big = len > 1000000000L
        var hi = 0L
        var lo = 0L
        i = 0
        while (i < 64) {
          val bit =
            if (big) BigInt(cs(i)) * BigInt(len) > BigInt(total) * BigInt(cn(i))
            else cs(i) * len > total * cn(i)
          if (bit) {
            if (i < 32) hi |= 1L << (31 - i) else lo |= 1L << (63 - i)
          }
          i += 1
        }
        PHash(r.doc_id, r.fmt, len, hi, lo)
      }
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
