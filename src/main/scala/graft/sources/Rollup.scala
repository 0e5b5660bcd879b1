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
      // coalesce to the changelog's null sentinel on BOTH sides: rows
      // with a null bucket (null ts) are marked dirty as
      // Changelog.NullBucket, and a plain isin would be NULL for them —
      // never rescanned, permanently stale (partition pruning still
      // applies: coalesce of a partition column is a deterministic
      // partition predicate)
      val src = fact.filter(
        coalesce(sourceBucket.cast("string"), lit(Changelog.NullBucket)).isin(keys: _*))
      apply(src)
        .withColumn("p_bucket",
          coalesce(outputBucket(col("rollup_time")).cast("string"), lit(Changelog.NullBucket)))
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

  /**
   * Derive the [[graft.sql.RollupRoute]] this rollup can answer, read
   * off the ANALYZED aggregate expressions themselves — so the
   * metric→column mapping, the exact sum casts, and the sketch
   * precision can never drift from what was actually materialized
   * (hand-declared routes can silently disagree with the table).
   * Recognized per output column: sum(m) / sum(cast(m as T)),
   * count(1), count(m), min(m), max(m), hll_sketch_agg(m, lgK); other
   * aggregates are simply not declared (queries using them stay on the
   * fact). Returns None when the rollup cannot answer unrestricted
   * queries at all: a row filter, or a non-date_trunc time expression.
   */
  def deriveRoute(fact: DataFrame, factPathContains: String, rollupPath: String): Option[graft.sql.RollupRoute] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.expressions.aggregate._
    import org.apache.spark.unsafe.types.UTF8String
    if (filter.nonEmpty) return None // a filtered rollup misses rows
    val aggNode = apply(fact).queryExecution.analyzed.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    aggNode.flatMap { a =>
      var time: Option[(String, String)] = None // (fact time col, grain)
      val dims = scala.collection.mutable.ListBuffer.empty[String]
      var countCol: Option[String] = None
      val sums = scala.collection.mutable.LinkedHashMap.empty[String, String]
      val mins = scala.collection.mutable.LinkedHashMap.empty[String, String]
      val maxs = scala.collection.mutable.LinkedHashMap.empty[String, String]
      val counts = scala.collection.mutable.LinkedHashMap.empty[String, String]
      val sketches = scala.collection.mutable.LinkedHashMap.empty[String, String]
      val sumCasts = scala.collection.mutable.LinkedHashMap.empty[String, org.apache.spark.sql.types.DataType]
      val sketchLgK = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      a.aggregateExpressions.foreach {
        case Alias(TruncTimestamp(Literal(fmt: UTF8String, _), attr: AttributeReference, _), "rollup_time") =>
          time = Some((attr.name, fmt.toString.toLowerCase))
        case attr: AttributeReference => dims += attr.name
        case Alias(ae: AggregateExpression, outName)
            if ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty =>
          ae.aggregateFunction match {
            case s: Sum =>
              s.child match {
                case attr: AttributeReference => sums(attr.name) = outName
                case Cast(attr: AttributeReference, t, _, _) =>
                  sums(attr.name) = outName; sumCasts(attr.name) = t
                case _ => ()
              }
            case c: Count if c.children.sizeIs == 1 =>
              c.children.head match {
                case _: Literal => countCol = countCol.orElse(Some(outName))
                case attr: AttributeReference => counts(attr.name) = outName
                case _ => ()
              }
            case m: Min =>
              m.child match { case attr: AttributeReference => mins(attr.name) = outName; case _ => () }
            case m: Max =>
              m.child match { case attr: AttributeReference => maxs(attr.name) = outName; case _ => () }
            case h: HllSketchAgg =>
              (h.left, h.right) match {
                case (attr: AttributeReference, Literal(k: Int, org.apache.spark.sql.types.IntegerType)) =>
                  sketches(attr.name) = outName; sketchLgK(attr.name) = k
                case _ => ()
              }
            case _ => () // not re-aggregable from partials: not declared
          }
        case _ => () // computed output: queries over it stay on the fact
      }
      time.map { case (tc, grain) =>
        graft.sql.RollupRoute(
          factPathContains = factPathContains, rollupPath = rollupPath,
          timeCol = tc, grain = grain, dims = dims.toList,
          sums = sums.toMap, countCol = countCol,
          mins = mins.toMap, maxs = maxs.toMap,
          counts = counts.toMap, sumCasts = sumCasts.toMap,
          sketches = sketches.toMap, sketchLgK = sketchLgK.toMap,
          // date_trunc buckets are tz-dependent: stamp the session tz
          // the rollup materializes under so routing can fence on it
          timeZone = Some(fact.sparkSession.sessionState.conf.sessionLocalTimeZone))
      }
    }
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
