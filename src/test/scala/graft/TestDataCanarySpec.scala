package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Canary over the driver-generated testdata contract. The generator has
 * changed the `events.ts` physical encoding between rounds (TIMESTAMP(NANOS)
 * read as BIGINT under nanosAsLong, then TIMESTAMP(MICROS) read as
 * TIMESTAMP_NTZ); when it changes again, this spec fails with a readable
 * message instead of scattering DATATYPE_MISMATCH errors across the suite.
 */
class TestDataCanarySpec extends SparkSpecBase {

  test("events.ts is one of the two known encodings and normalizeTs canonicalizes it") {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val tsType = raw.schema("ts").dataType
    assert(
      tsType == LongType || tsType == TimestampNTZType || tsType == TimestampType,
      s"events.ts arrived as $tsType — a new driver-side encoding; " +
        "extend graft.sources.EventTime.normalizeTs and re-run the suite")
    val norm = graft.sources.EventTime.normalizeTs(raw)
    assert(norm.schema("ts").dataType == TimestampType)
    // Values must land in a sane epoch range (2015-2035), i.e. the unit
    // conversion is right — a ms-vs-µs-vs-ns mix-up lands centuries away.
    val (lo, hi) = ("2015-01-01", "2035-01-01")
    val outOfRange = norm
      .filter(col("ts") < lit(lo).cast("timestamp") || col("ts") >= lit(hi).cast("timestamp"))
      .count()
    assert(outOfRange == 0L, s"$outOfRange events.ts values outside [$lo,$hi) — unit conversion drifted")
  }

  test("core table schemas match the columns the suite depends on") {
    def cols(t: String): Set[String] =
      spark.read.parquet(s"$sfDir/$t.parquet").schema.fieldNames.toSet
    assert(Set("event_id", "ts", "user_id", "event_type", "value", "props").subsetOf(cols("events")))
    assert(Set("doc_id", "text", "lang", "source", "n_chars").subsetOf(cols("documents")))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").schema
    assert(Set("vec_id", "embedding", "label").subsetOf(emb.fieldNames.toSet))
    assert(emb("embedding").dataType.isInstanceOf[ArrayType],
      s"embeddings.embedding arrived as ${emb("embedding").dataType}")
    assert(Set("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_returnflag")
      .subsetOf(cols("lineitem")))
  }

  // The q_filter_range / q_sql_agg daily gates hash actual rows only if
  // their fixed time windows intersect the generator's shipdate span
  // (1995-01-02..2001-11-04 at every SF). These pins fail loudly if the
  // generator's date range ever moves, instead of the gates silently
  // going back to proving schema-equality-on-empty (the r12 finding).
  test("the q_filter_range and q_sql_agg gate windows are non-empty in the testdata") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val frRows = li
      .filter(col("l_shipdate") >= lit("1995-06-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-06-01").cast("timestamp") &&
        col("l_returnflag") === "R")
      .count()
    assert(frRows > 0L,
      "q_filter_range window (1995-06-01..1996-06-01, returnflag=R) matches no testdata rows — " +
        "the generator's shipdate span moved; re-derive the gate window in SparkEntry.qFilterRange")
    val saRows = li
      .filter(col("l_shipdate") >= lit("1995-06-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-06-01").cast("timestamp"))
      .count()
    assert(saRows > 0L,
      "q_sql_agg window (1995-06-01..1997-06-01) matches no testdata rows — " +
        "the generator's shipdate span moved; re-derive the gate window in SparkEntry.qSqlAgg")
  }

  // The streaming-gate windows must stay non-empty at every SF, or the
  // gates quietly degrade to hashing empty results (the exact failure
  // class the r12 vacuous-gate finding named). Each pin names the gate
  // whose window it protects.
  test("the streaming-gate windows are non-empty in the testdata") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    assert(docs.filter(col("doc_id") < 400).count() > 0L, "q_stream_dedup window empty")
    assert(docs.filter(col("doc_id") < 150).count() > 0L, "q_stream_keep_best window empty")
    // q_stream_dsir_update: the base fit AND both streamed slices must
    // each carry docs, or the gate stops exercising the update fold
    for (r <- 0L to 2L)
      assert(docs.filter(col("doc_id") < 1200 && pmod(col("doc_id"), lit(3)) === r).count() > 0L,
        s"q_stream_dsir_update doc_id%3==$r slice empty")
    assert(docs.filter(col("doc_id") < 2000 &&
        !coalesce(col("source") === "src0", lit(false))).count() > 0L,
      "q_stream_dsir raw-pool window empty")
    assert(emb.filter(col("vec_id") < 200).count() > 0L, "q_stream_semdedup window empty")
    // q_stream_vector_admit: base build, streamed remainder, and the
    // query set are three separate emptiness cliffs
    assert(emb.filter(col("vec_id") < 100).count() > 0L, "q_stream_vector_admit base empty")
    assert(emb.filter(col("vec_id") >= 100 && col("vec_id") < 400).count() > 0L,
      "q_stream_vector_admit streamed remainder empty")
    assert(emb.filter(col("vec_id") < 8).count() > 0L, "q_stream_vector_admit query set empty")
    assert(events.filter(col("event_id") < 20000).count() > 0L,
      "q_stream_{funnel,retention,anomaly,dedup_exact} events window empty")
  }
}
