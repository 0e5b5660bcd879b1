package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Vector admission stress (SURVEY §5): a `mult`× replicated embedding
 * corpus, measuring what the persisted IVF index's admission lifecycle
 * buys at scale — the per-shard cost of `appendToIvfIndex` (one narrow
 * assignment pass over the NEW vectors) against rebuilding the index
 * (`buildIvfIndex` — the full-corpus pass admission exists to avoid),
 * the probe-limited serving cost with and without a populated delta,
 * and the promotion fold. Replicas are deterministically perturbed so
 * cells spread realistically rather than collapsing onto `mult`
 * identical points.
 */
object VecAdmitStress {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val ref = emb
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select(
        (col("vec_id") * mult + col("rep")).as("vec_id"),
        expr("transform(embedding, (x, i) -> cast(x + pmod(xxhash64(concat(cast(vec_id as string), '_', cast(rep as string), '_', cast(i as string))), 200) / 1000.0 as float))")
          .as("embedding"))
    // the daily shard: a 1x batch of novel perturbed vectors
    val shard = emb.select(
      (col("vec_id") + lit(900000000L)).as("vec_id"),
      expr("transform(embedding, (x, i) -> cast(x + pmod(xxhash64(concat('s', cast(vec_id as string), '_', cast(i as string))), 200) / 1000.0 as float))")
        .as("embedding"))
    val queries = emb.filter(col("vec_id") < 8)

    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[vecadmitstress] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val idx = "/tmp/graft_vecadmitstress_idx"
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idx), true)
    val cells = math.max(16, (n * mult / 2048L).toInt)
    println(s"[vecadmitstress] ref=${n * mult} vectors ($mult x $n), shard=$n, cells=$cells")

    time("buildIvfIndex (one-time corpus pass: train + assign + stats)") {
      graft.operators.Ann.buildIvfIndex(spark, ref, idx, numCells = cells)
    }
    var served = 0L
    for (rep <- 1 to 3)
      served = time(s"searchIvfIndex rep$rep base-only (probe-limited serving)") {
        graft.operators.Ann.searchIvfIndex(spark, idx, queries, k = 5, probes = 4).count()
      }
    for (rep <- 1 to 3)
      time(s"appendToIvfIndex rep$rep (per-shard admission: narrow assignment pass)") {
        graft.operators.Ann.appendToIvfIndex(shard, idx, "day1")
      }
    time("drift probe (narrow pass over the shard only)") {
      println(f"[vecadmitstress]   drift=${graft.operators.Ann.ivfDriftFraction(spark, idx, shard)}%.3f")
    }
    var servedDelta = 0L
    for (rep <- 1 to 3)
      servedDelta = time(s"searchIvfIndex rep$rep base+delta (serving with a populated delta)") {
        graft.operators.Ann.searchIvfIndex(spark, idx, queries, k = 5, probes = 4).count()
      }
    println(s"[vecadmitstress] rows: base-only=$served base+delta=$servedDelta")
    time("promoteIvfDelta (assignment-row fold, no re-quantization)") {
      graft.operators.Ann.promoteIvfDelta(spark, idx)
    }
    time("rebuild-for-comparison (what admission avoids paying per shard)") {
      graft.operators.Ann.buildIvfIndex(spark,
        ref.unionByName(shard), idx, numCells = cells)
    }
    spark.stop()
  }
}
