package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Rollup: pre-aggregation of a fact table into a coarser-time-grain
 * table, re-expressing the reference's TsdbRollup
 * (yupana-api/src/main/scala/org/yupana/api/schema/Rollup.scala:46,
 * executed by yupana-spark/CustomRollup.scala). The reference runs
 * rollups as periodic Spark ETL jobs writing back to HBase; graft runs
 * them as an aggregation job materialized to parquet, after which
 * queries hit the (orders-of-magnitude smaller) rollup table.
 *
 * The aggregation is a plain groupBy → map-side partial aggregation +
 * one shuffle on (timeExpr, dims); at 100 TB the rollup output is what
 * dashboards query, so the expensive scan happens once per period, not
 * per query — exactly the reference's receiptByDay/ItemRollups design
 * (yupana-schema ReceiptRollups.scala).
 */
trait RollupBase {

  /** Compute the rollup DataFrame from the source fact table. Must
    * emit a `rollup_time` column (the incremental path buckets on it). */
  def apply(fact: DataFrame): DataFrame

  /** Materialize to parquet at `path` (the persistent rollup table). */
  def materialize(fact: DataFrame, path: String): Unit =
    apply(fact).write.mode("overwrite").parquet(path)

  /** Multi-output materialize (reference Rollup.toTables,
    * yupana-api schema/Rollup.scala:28: one rollup feeding several
    * destination tables): compute once, write each. */
  def materializeAll(fact: DataFrame, paths: Seq[String]): Unit = {
    val out = apply(fact)
    out.persist()
    try paths.foreach(p => out.write.mode("overwrite").parquet(p))
    finally out.unpersist()
  }

  /**
   * Incremental recomputation (reference ChangelogDaoHBase flow: ingest
   * records invalidated intervals; the rollup recomputes ONLY those).
   * At 100 TB re-materializing all history per run is untenable — this
   * recomputes just the dirty time buckets:
   *
   *  1. read the dirty bucket set from the [[Changelog]] (bounded
   *     metadata — time buckets, not data);
   *  2. scan only those buckets of the fact (`sourceBucket` is the fact
   *     layout's partition scheme, so the filter prunes files before
   *     IO — asserted via the returned `inputFiles`);
   *  3. overwrite only the matching output partitions (dynamic
   *     partition overwrite on `p_bucket`, derived from `rollup_time`
   *     with `outputBucket` — must be the same bucketing function, so
   *     every output row lands in its source's bucket);
   *  4. mark the buckets clean at the seq watermark read in (1) — a
   *     concurrent ingest stays pending for the next run.
   *
   * @return the recomputed bucket keys and the fact files actually read
   */
  def materializeIncremental(
      fact: DataFrame,
      path: String,
      changelogDir: String,
      sourceBucket: Column,
      outputBucket: Column => Column
  ): RollupRun = {
    val spark = fact.sparkSession
    val dirty = Changelog.dirtyBuckets(spark, changelogDir)
    if (dirty.isEmpty) RollupRun(Nil, Nil)
    else {
      val keys = dirty.map(_._1)
      val src = fact.filter(sourceBucket.cast("string").isin(keys: _*))
      apply(src)
        .withColumn("p_bucket", outputBucket(col("rollup_time")).cast("string"))
        .write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("p_bucket")
        .parquet(path)
      Changelog.markClean(spark, changelogDir, dirty)
      RollupRun(keys, Rollup.scannedFiles(src))
    }
  }
}

/** Declarative rollup: filter → groupBy(time, dims) → aggregates. */
final case class Rollup(
    name: String,
    timeExpr: Column,
    groupBy: Seq[Column],
    aggregates: Seq[Column],
    filter: Option[Column] = None
) extends RollupBase {

  def apply(fact: DataFrame): DataFrame = {
    val src = filter.map(fact.filter).getOrElse(fact)
    src
      .groupBy((timeExpr.as("rollup_time") +: groupBy): _*)
      .agg(aggregates.head, aggregates.tail: _*)
  }
}

/**
 * Arbitrary-computation rollup (reference yupana-spark
 * CustomRollup.scala:29 — `doRollup` runs whatever queries it needs):
 * the caller supplies the whole fact→rollup transformation; the
 * one-shot, multi-output, and incremental dirty-bucket mechanics are
 * inherited unchanged. `compute` must emit `rollup_time`, and for
 * incremental use it must be TIME-BUCKET-LOCAL (its result for a bucket
 * depends only on that bucket's fact rows — the same contract the
 * reference's interval-recompute flow imposes on its rollups).
 */
final case class CustomRollup(name: String, compute: DataFrame => DataFrame) extends RollupBase {
  def apply(fact: DataFrame): DataFrame = compute(fact)
}

object Rollup {
  /** Files the query would actually scan AFTER partition pruning
    * (`DataFrame.inputFiles` lists the whole relation, pre-pruning). */
  private[sources] def scannedFiles(df: DataFrame): Seq[String] =
    df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location
          .listFiles(s.partitionFilters, s.dataFilters)
          .flatMap(_.files.map(_.fileStatus.getPath.toString))
    }.flatten
}

/** Result of an incremental rollup run: which buckets were recomputed
  * and which fact files were actually scanned (pruning evidence). */
final case class RollupRun(recomputed: Seq[String], inputFiles: Seq[String])
