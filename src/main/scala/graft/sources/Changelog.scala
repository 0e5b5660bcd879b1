package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Changelog of invalidated rollup buckets, re-expressing the
 * reference's rollup-recalculation bookkeeping (yupana-hbase
 * ChangelogDaoHBase: ingest writes `UpdateInterval`s; rollup jobs read
 * the intervals updated since their last run and recompute only those;
 * surfaced as SHOW UPDATES_INTERVALS via QueryEngineRouter.scala:106).
 *
 * Spark realization: two tiny append-only parquet logs under one
 * directory — `pending/` (bucket, seq) appended by ingest when a batch
 * touches a bucket, and `done/` (bucket, seq) appended by the rollup
 * after recomputing. A bucket is dirty iff its max pending seq exceeds
 * its max done seq. The log is bounded metadata (one row per touched
 * bucket per batch — time buckets, not data), so collecting the dirty
 * set to the driver is the same bounded-metadata class as broadcast
 * planning, NOT a data-scale collect.
 */
object Changelog {

  /** Canonical key for rows whose bucket expression is NULL (e.g. a
    * null timestamp). A raw NULL key would break the pending⋈done
    * equi-join (SQL NULL never equals NULL), so the bucket could be
    * marked clean forever without ever MATCHING clean — every
    * subsequent run would see it dirty, recompute, re-mark, and loop;
    * meanwhile an isin(keys) source filter (NULL for null rows) would
    * never actually rescan those rows. Canonicalizing at the edges
    * keeps the whole cycle null-safe.
    *
    * The sentinel starts with U+0000, which no genuine bucket value
    * reaches: buckets are cast-to-string timestamps/dates/numbers
    * (never contain NUL), and even a pathological string-typed bucket
    * column would need an embedded NUL prefix to collide — unlike the
    * old bare "__null__", which a string bucket could legitimately
    * equal and silently share a dirty/clean lifecycle with null rows. */
  val NullBucket = "\u0000null"

  /** Pre-U+0000-sentinel logs used this value; normalized on read so an
    * upgraded deployment's old null-bucket entries keep cycling
    * dirty→clean instead of being stranded under a key nothing writes. */
  private val LegacyNullBucket = "__null__"

  private def readLog(spark: SparkSession, dir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path))
      spark.read.parquet(dir).withColumn("bucket",
        when(col("bucket") === LegacyNullBucket, lit(NullBucket)).otherwise(col("bucket")))
    else spark.emptyDataFrame.select(lit("").as("bucket"), lit(0L).as("seq")).limit(0)
  }

  /**
   * Next sequence number: strictly above both every recorded seq and
   * the wall clock in millis. The clock component makes concurrent
   * same-seq collisions require two writers inside the same
   * millisecond — but the read-then-append is still not atomic, so the
   * changelog contract is ONE ingest writer per changelog directory
   * (the reference gets atomicity from HBase increments; plain
   * filesystems offer none). Multiple tables → one changelog dir each.
   */
  def nextSeq(spark: SparkSession, changelogDir: String): Long = {
    val m = readLog(spark, s"$changelogDir/pending")
      .unionByName(readLog(spark, s"$changelogDir/done"))
      .agg(max(col("seq"))).head()
    val recorded = if (m.isNullAt(0)) 0L else m.getLong(0)
    math.max(recorded, System.currentTimeMillis()) + 1L
  }

  /**
   * Record the distinct buckets a batch touched as invalidated
   * (reference: ETL ingest emitting UpdateIntervals). `bucketExpr`
   * maps a batch row to its bucket key (use the fact layout's
   * partition scheme, e.g. `date_format(ts, "yyyy-MM")`).
   */
  def markDirty(batch: DataFrame, bucketExpr: org.apache.spark.sql.Column, changelogDir: String): Long = {
    val seq = nextSeq(batch.sparkSession, changelogDir)
    batch
      .select(coalesce(bucketExpr.cast("string"), lit(NullBucket)).as("bucket")).distinct()
      .withColumn("seq", lit(seq))
      .coalesce(1)
      .write.mode("append").parquet(s"$changelogDir/pending")
    seq
  }

  /** Buckets whose pending seq exceeds their done seq, with the seq
    * watermark to pass to [[markClean]] once recomputed. */
  def dirtyBuckets(spark: SparkSession, changelogDir: String): Seq[(String, Long)] = {
    val pending = readLog(spark, s"$changelogDir/pending")
      .groupBy(col("bucket")).agg(max(col("seq")).as("pseq"))
    val done = readLog(spark, s"$changelogDir/done")
      .groupBy(col("bucket")).agg(max(col("seq")).as("dseq"))
    pending
      .join(done, Seq("bucket"), "left")
      .filter(col("dseq").isNull || col("pseq") > col("dseq"))
      .select(col("bucket"), col("pseq"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
  }

  /** Mark buckets recomputed through the given seq watermarks. */
  def markClean(spark: SparkSession, changelogDir: String, buckets: Seq[(String, Long)]): Unit =
    if (buckets.nonEmpty) {
      import spark.implicits._
      buckets.toDF("bucket", "seq").coalesce(1).write.mode("append").parquet(s"$changelogDir/done")
    }
}
