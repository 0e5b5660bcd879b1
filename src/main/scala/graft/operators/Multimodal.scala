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
}
