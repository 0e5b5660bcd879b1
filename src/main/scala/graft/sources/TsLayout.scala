package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.GTable

/**
 * Time-partitioned table layout — the storage side of the reference's
 * HBase row-key design (yupana-api Table.rowTimeSpan: rows are keyed by
 * (baseTime bucket, dims, restTime), so a time-range scan touches only
 * the buckets in range; see yupana-hbase HBaseUtils key layout).
 *
 * On Spark the same property comes from directory partitioning: data is
 * written under `ts_bucket=YYYY-MM/` (or finer, per rowTimeSpan) and a
 * time-range predicate prunes partitions before any IO. Within each
 * partition files are sorted by the dimension sequence so min/max
 * row-group stats prune dimension filters too (the reference's
 * dimension-prefix scan ranges).
 *
 * At 100 TB / 1000 executors this is the difference between a full scan
 * and touching only the queried months; `maxRecordsPerFile` plus
 * `sortWithinPartitions` keeps files row-group-pruned and right-sized.
 */
object TsLayout {

  /** Write a fact table into the time-bucketed layout. */
  def write(df: DataFrame, table: GTable, path: String): Unit = {
    val bucketed = df.withColumn("ts_bucket", date_format(col(table.timeColumn), "yyyy-MM"))
    bucketed
      .repartition(col("ts_bucket"))
      .sortWithinPartitions(table.dimensionNames.map(col): _*)
      .write
      .mode("overwrite")
      .partitionBy("ts_bucket")
      .parquet(path)
  }

  /** Read the layout back; time filters on `timeColumn` prune via ts_bucket. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("ts_bucket")

  /**
   * Bucketed variant for fact tables that join each other (e.g.
   * orders ⋈ lineitem on the order key): both sides bucketed and
   * sorted by the join key into the same bucket count join WITHOUT a
   * shuffle — at 100 TB that's the difference between moving both
   * fact tables across the network per query and a local merge join.
   * Bucketing requires the table catalog (saveAsTable).
   */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String, numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName)
}
