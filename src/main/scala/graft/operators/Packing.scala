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
 *  1. range-repartition by the global order key (so partition i holds
 *     a contiguous key range, all of it < partition i+1's range);
 *  2. one per-partition weight sum → numPartitions rows collected,
 *     exclusive-prefixed on the driver (bounded metadata);
 *  3. broadcast the per-partition base offsets back and add a
 *     WITHIN-partition running sum (window partitioned by the range
 *     partition id — never a global window).
 *
 * The result — cum = base(partition) + running-sum-within — equals the
 * global running sum in (orderCol, idCol) order whatever boundaries the
 * range partitioner sampled, so the output is deterministic even though
 * the partitioning isn't.
 */
object Packing {

  /**
   * @param orderCol deterministic global pack order (e.g. md5 of the id
   *                 for a shuffled-but-reproducible curriculum)
   * @return one row per doc: cum (inclusive running weight), shard_id
   *         (floor((cum-w)/budget) — the shard the doc STARTS in),
   *         shard_offset (weight offset within that shard)
   */
  def packShards(
      docs: DataFrame,
      idCol: String,
      weightCol: String,
      budget: Long,
      orderCol: Column
  ): DataFrame = {
    val keyed = docs
      .select(col(idCol).as("doc_id"), col(weightCol).cast("long").as("w"), orderCol.as("ok"))
      .repartitionByRange(col("ok"), col("doc_id"))
      .withColumn("pid", spark_partition_id())

    // per-partition totals: bounded driver metadata (numPartitions rows)
    val totals = keyed.groupBy(col("pid")).agg(sum(col("w")).as("psum")).collect()
    val bases = totals
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
      .scanLeft((Int.MinValue, 0L, 0L)) { case ((_, _, acc), (pid, psum)) => (pid, acc, acc + psum) }
      .drop(1)
      .map { case (pid, base, _) => (pid, base) }
    val spark = docs.sparkSession
    import spark.implicits._
    val baseDf = bases.toSeq.toDF("pid", "base")

    val wWithin = Window
      .partitionBy(col("pid"))
      .orderBy(col("ok"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    keyed
      .join(broadcast(baseDf), "pid")
      .withColumn("cum", col("base") + sum(col("w")).over(wWithin))
      .withColumn("shard_id", expr(s"(cum - w) div ${budget}L"))
      .withColumn("shard_offset", col("cum") - col("w") - col("shard_id") * lit(budget))
      .select(col("doc_id"), col("w"), col("cum"), col("shard_id"), col("shard_offset"))
  }
}
