package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Cross-corpus admission stress (SURVEY §5): a `mult`× replicated
 * reference corpus vs a 1× probe shard, measuring what the persisted
 * text index buys at scale — the per-shard cost of
 * `crossJaccardPairsIndexed` (probe-side signature pass + band join
 * against STORED signatures) against the no-index
 * `crossJaccardPairs` (which pays the reference corpus's full
 * signature pass on every shard). The gap is the amortization claim:
 * the reference pass runs once at build, not once per shard.
 *
 * Replicas carry a per-replica suffix token so texts are distinct
 * (real corpora are not bit-identical), and every probe doc near-dups
 * its replica family — candidate volume is dup-bound, the worst
 * realistic shape for a probe.
 */
object AdmitStress {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    // ref corpus: `mult` distinct-id, suffix-perturbed replicas per doc
    // (the probe's dup families) PLUS `mult`× that much UNRELATED
    // filler — synthetic word soup sharing no shingles with the
    // families. The filler is the part of a real reference corpus a
    // probe shard is NOT near; growing it must not grow per-shard cost.
    val fam = docs
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select(
        (col("doc_id") * mult + col("rep")).as("doc_id"),
        concat(col("text"), lit(" replica token r"), col("rep")).as("text"))
    val filler = spark.range(n * mult).select(
      (col("id") + 500000000L).as("doc_id"),
      expr("array_join(transform(sequence(1, 80), j -> " +
        "concat('w', pmod(xxhash64(concat(cast(id as string), '_', cast(j as string))), 50000))), ' ')")
        .as("text"))
    val ref = fam.unionByName(filler)
    // probe shard: the original docs with their own suffix — near-dup
    // of every replica in its family, novel against other families
    val probe = docs.select(
      (col("doc_id") + lit(100000000L)).as("doc_id"),
      concat(col("text"), lit(" replica token probe")).as("text"))

    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[admitstress] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val idx = "/tmp/graft_admitstress_idx"
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idx), true)
    println(s"[admitstress] ref=${n * mult * 2} docs ($mult x $n family + ${n * mult} filler), probe shard=$n docs")

    time("buildTextIndex (one-time corpus pass)") {
      graft.operators.Dedup.buildTextIndex(ref, "doc_id", "text", idx, threshold = 0.5)
    }
    // interleaved reps: the first query in a JVM pays session/codegen
    // warm-up, so a single ordered pair mis-attributes it to whichever
    // path runs first
    var indexed = 0L
    var direct = 0L
    for (rep <- 1 to 3) {
      indexed = time(s"indexed probe rep$rep (per-shard cost WITH index)") {
        graft.operators.Dedup
          .crossJaccardPairsIndexed(probe, idx, ref, "doc_id", "text").count()
      }
      direct = time(s"direct probe rep$rep (per-shard cost WITHOUT index)") {
        graft.operators.Dedup
          .crossJaccardPairs(probe, ref, "doc_id", "text", threshold = 0.5).count()
      }
    }
    println(s"[admitstress] pairs: indexed=$indexed direct=$direct (must be equal)")

    val tbl = "admitstress_bucketed"
    Seq(tbl, s"${tbl}_meta").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    time("buildTextIndexBucketed (one-time corpus pass)") {
      graft.operators.Dedup.buildTextIndexBucketed(ref, "doc_id", "text", tbl, threshold = 0.5)
    }
    var bucketed = 0L
    for (rep <- 1 to 3)
      bucketed = time(s"bucketed probe rep$rep (per-shard cost, bucket-local join)") {
        graft.operators.Dedup
          .crossJaccardPairsBucketedIndexed(probe, tbl, ref, "doc_id", "text").count()
      }
    println(s"[admitstress] pairs: bucketed=$bucketed (must equal indexed)")

    // base+delta serving cycle at the same scale: admit a DISTINCT
    // daily shard into the delta (per-shard admission cost against the
    // bucketed base), probe base+delta (the serving cost while
    // admissions accumulate), then promote (the maintenance fold —
    // signature-only, must beat rebuilding the table from text).
    val delta = "/tmp/graft_admitstress_delta"
    fs.delete(new org.apache.hadoop.fs.Path(delta), true)
    val day1 = docs.select(
      (col("doc_id") + lit(200000000L)).as("doc_id"),
      expr("array_join(transform(sequence(1, 60), j -> " +
        "concat('d', pmod(xxhash64(concat(cast(doc_id as string), '~', cast(j as string))), 40000))), ' ')")
        .as("text"))
    time("admitShardBucketed day1 (novel shard -> delta)") {
      graft.operators.Dedup
        .admitShardBucketed(day1, tbl, delta, ref, "doc_id", "text", "day1").count()
    }
    var withDelta = 0L
    for (rep <- 1 to 3)
      withDelta = time(s"base+delta probe rep$rep (serving cost with a populated delta)") {
        graft.operators.Dedup.crossJaccardPairsBucketedDelta(
          probe, tbl, delta, ref.unionByName(day1), "doc_id", "text").count()
      }
    println(s"[admitstress] pairs: base+delta=$withDelta (must equal bucketed: probe is novel vs day1)")
    time("promoteTextIndexDelta (signature-only fold + re-bucket)") {
      graft.operators.Dedup.promoteTextIndexDelta(spark, tbl, delta)
    }
    spark.stop()
  }
}
