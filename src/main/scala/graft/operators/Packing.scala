package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Token-budget shard packing: assign each document to a training shard
 * so that shards hold ~`budget` tokens of consecutive documents in a
 * deterministic global order (training-data pipelines write fixed-size
 * token shards; beyond the reference's surface).
 *
 * The naive formulation is `SUM(w) OVER (ORDER BY key)` — a single
 * global window, i.e. every row through ONE partition: correct at test
 * scale, dead at 100 TB. This is the scalable exact equivalent:
 *
 *  1. assign every row an ORDER-PRESERVING VALUE-DERIVED bucket (a
 *     prefix of the order key): bucket boundaries are a pure function
 *     of row values, never of the physical partitioning — so no
 *     cross-job consistency assumption on partition ids survives AQE
 *     coalescing or recomputation;
 *  2. one per-bucket weight sum → numBuckets rows collected,
 *     exclusive-prefixed on the driver in bucket order (bounded
 *     metadata);
 *  3. broadcast the per-bucket base offsets back and add a
 *     WITHIN-bucket running sum (window partitioned by bucket — never
 *     a global window).
 *
 * cum = base(bucket) + running-sum-within-bucket equals the global
 * running sum in (orderCol, idCol) order because the bucket is a
 * monotone coarsening of orderCol.
 */
object Packing {

  /**
   * @param orderCol deterministic global pack order (e.g. md5 of the id
   *                 for a shuffled-but-reproducible curriculum)
   * @param bucketOf order-preserving coarsening of `orderCol` (must be
   *                 monotone: a ≤ b ⇒ bucketOf(a) ≤ bucketOf(b)). The
   *                 default takes the first 2 chars — 256 balanced
   *                 buckets for a hex order key; pass a longer prefix
   *                 for bigger clusters.
   * @return one row per doc: cum (inclusive running weight), shard_id
   *         (floor((cum-w)/budget) — the shard the doc STARTS in),
   *         shard_offset (weight offset within that shard)
   */
  def packShards(
      docs: DataFrame,
      idCol: String,
      weightCol: String,
      budget: Long,
      orderCol: Column,
      bucketOf: Column => Column = c => substring(c, 1, 2)
  ): DataFrame = {
    val keyed = docs
      .select(col(idCol).as("doc_id"), col(weightCol).cast("long").as("w"), orderCol.as("ok"))
      .withColumn("bk", bucketOf(col("ok")).cast("string"))

    // per-bucket totals: bounded driver metadata (numBuckets rows);
    // exclusive prefix in bucket order = each bucket's base offset.
    // The bound is the CALLER's bucketOf contract (256 for the default
    // 2-hex-char prefix) — enforce it loudly: a too-fine coarsening
    // (e.g. an 8-char prefix = 4G buckets) would silently turn this
    // into a corpus-sized driver collect, the Dsir.MaxBuckets class
    // of failure. The collect goes through limit(cap+1) so the driver
    // holds at most cap+1 rows even when the guard fires — when the
    // bucket count is within the cap, limit(cap+1) returns every row,
    // so the base table is complete.
    val bucketCap = 1 << 20
    val totals = keyed.groupBy(col("bk")).agg(sum(col("w")).as("bsum"))
      .limit(bucketCap + 1).collect()
    require(totals.length <= bucketCap,
      s"bucketOf produced more than $bucketCap buckets — the per-bucket base table is " +
        "driver-collected and must stay bounded; coarsen the order-key prefix")
    val bases = totals
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
      .scanLeft(("", 0L, 0L)) { case ((_, _, acc), (bk, bsum)) => (bk, acc, acc + bsum) }
      .drop(1)
      .map { case (bk, base, _) => (bk, base) }
    val spark = docs.sparkSession
    import spark.implicits._
    val baseDf = bases.toSeq.toDF("bk", "base")

    val wWithin = Window
      .partitionBy(col("bk"))
      .orderBy(col("ok"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    keyed
      .join(broadcast(baseDf), "bk")
      .withColumn("cum", col("base") + sum(col("w")).over(wWithin))
      .withColumn("shard_id", expr(s"(cum - w) div ${budget}L"))
      .withColumn("shard_offset", col("cum") - col("w") - col("shard_id") * lit(budget))
      .select(col("doc_id"), col("w"), col("cum"), col("shard_id"), col("shard_offset"))
  }
}
