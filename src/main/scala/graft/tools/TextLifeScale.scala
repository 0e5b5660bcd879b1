package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev tool: the ≥2M-doc evidence point for the TEXT-INDEX lifecycle
  * (r15 — the vector side got its 2.2M point in r14; this is the text
  * twin). Against a [[TextScale]] corpus it measures, at full corpus
  * size, the wall of every fold surface and pins PROBE INVARIANCE
  * across them:
  *   build → admit (novelty decision) → compact → [bucketed] build →
  *   admit → promote,
  * asserting the same probe returns the IDENTICAL pair set before and
  * after each fold, and that the bucketed path's probe equals the
  * parquet path's. Args: <dir> [scratch]. */
object TextLifeScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_text2m")
    val scratch = if (args.length > 1) args(1) else s"${dir}_lifecycle"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", s"$scratch/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // machine-stretch anchor per STAGE (the Bench C0/C discipline —
    // this host oscillates; an un-anchored scale wall is uninterpretable
    // across rounds): fixed 100M-xxhash 32-core probe, near-idle
    // ~200-330 ms, printed beside every stage wall
    def calibrate(): Long = {
      val t0 = System.nanoTime()
      spark.range(0L, 100000000L, 1L, 32)
        .select(pmod(xxhash64(col("id")), lit(1000000L)).as("h")).agg(sum(col("h"))).head()
      math.round((System.nanoTime() - t0) / 1e6).max(1L)
    }
    calibrate()
    println(s"[textlife] C0=${calibrate()} ms")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[textlife] $label: $wall%.1f s (C=${calibrate()} ms)")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val n = docs.count()
    println(s"[textlife] corpus n=$n")

    // probe shard: 2500 near-dups of base docs (one appended token — the
    // index must REJECT) + 2500 heavily-mutated novels (must ADMIT).
    // Offsets are 5/6/7·10^11 — far past mult·10^9 for any plausible
    // mult, so probe ids can NEVER collide with TextScale replica ids
    // (a collision would put two texts under one id in the ref frame
    // and pollute the exact-verify join)
    val baseSample = docs.filter(col("doc_id") < 2500)
    val nearDup = baseSample.select(
      (col("doc_id") + 500000000000L).as("doc_id"),
      concat(col("text"), lit(" probeterm")).as("text"))
    val novel = baseSample.select(
      (col("doc_id") + 600000000000L).as("doc_id"),
      regexp_replace(col("text"), lit(" "),
        concat(lit(" zq"), pmod(xxhash64(col("doc_id")), lit(100000L)).cast("string"), lit(" ")))
        .as("text"))
    val shard = nearDup.unionByName(novel).localCheckpoint(true)

    // ---- parquet index lifecycle ----
    val idx = s"$scratch/idx"
    timed(s"buildTextIndex($n docs)")(
      Dedup.buildTextIndex(docs, "doc_id", "text", idx))
    val admitted = timed("admitShard(5000-doc delta)")(
      Dedup.admitShard(shard, idx, docs, "doc_id", "text", "delta1").localCheckpoint(true))
    val nAdmitted = admitted.count()
    println(s"[textlife] admitted=$nAdmitted of 5000 (expect ~2500: near-dups rejected)")

    // probe invariance across compaction: same probe, identical pairs
    val probe2 = docs.filter(col("doc_id") >= 2500 && col("doc_id") < 3000)
      .select((col("doc_id") + 700000000000L).as("doc_id"),
        concat(col("text"), lit(" probeterm2")).as("text"))
      .localCheckpoint(true)
    val ref = docs.unionByName(admitted)
    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p1 = timed("probe (pre-compact)")(pairSet(
      Dedup.crossJaccardPairsIndexed(probe2, idx, ref, "doc_id", "text")))
    timed("compactTextIndex")(Dedup.compactTextIndex(spark, idx))
    val p2 = timed("probe (post-compact)")(pairSet(
      Dedup.crossJaccardPairsIndexed(probe2, idx, ref, "doc_id", "text")))
    println(s"[textlife] compaction probe-invariant: ${p1 == p2} (pairs=${p1.size})")

    // ---- bucketed lifecycle ----
    val tbl = "textlife_idx"
    timed(s"buildTextIndexBucketed($n docs)")(
      Dedup.buildTextIndexBucketed(docs, "doc_id", "text", tbl))
    val delta = s"$scratch/delta"
    val admitted2 = timed("admitShardBucketed(5000-doc delta)")(
      Dedup.admitShardBucketed(shard, tbl, delta, docs, "doc_id", "text", "delta1")
        .localCheckpoint(true))
    println(s"[textlife] bucketed admitted=${admitted2.count()} (expect == $nAdmitted)")
    timed("promoteTextIndexDelta")(Dedup.promoteTextIndexDelta(spark, tbl, delta))
    val p3 = timed("probe (bucketed, post-promote)")(pairSet(
      Dedup.crossJaccardPairsBucketedIndexed(probe2, tbl, ref, "doc_id", "text")))
    println(s"[textlife] bucketed-promoted probe == parquet probe: ${p3 == p1}")
    spark.stop()
  }
}
