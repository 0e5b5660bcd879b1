package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.schema.GSchema

/**
 * Metadata surface: the reference's SHOW TABLES / SHOW COLUMNS /
 * SHOW FUNCTIONS statements (yupana-core QueryEngineRouter + sql
 * parser Show* AST) over the graft schema registry.
 */
object Catalog {

  def showTables(spark: SparkSession, schema: GSchema): DataFrame = {
    import spark.implicits._
    schema.tables
      .map(t => (t.name, t.timeColumn, t.dimensions.size, t.metrics.size, t.rowTimeSpan))
      .toDF("table_name", "time_column", "n_dimensions", "n_metrics", "row_time_span_ms")
  }

  def showColumns(spark: SparkSession, schema: GSchema, table: String): DataFrame = {
    import spark.implicits._
    val t = schema.table(table)
    val rows =
      Seq((t.timeColumn, "time", "timestamp")) ++
        t.dimensions.map(d => (d.name, "dimension", d.dataType.simpleString)) ++
        t.metrics.map(m => (m.name, "metric", m.dataType.simpleString))
    rows.toDF("column_name", "kind", "data_type")
  }

  def showFunctions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    GraftFunctions.builders.map(_._1).sorted.toDF("function_name")
  }

  /**
   * SHOW QUERY METRICS (reference QueryEngineRouter.scala:91
   * `ShowQueryMetrics(filter, limit)` over TsdbQueryMetricsDao): the
   * recorded per-query durations/row counts as a queryable DataFrame,
   * most recent first.
   */
  def showQueryMetrics(
      spark: SparkSession,
      metrics: graft.core.QueryMetrics,
      limit: Int = 100,
      // Matches the recorded ACTION name ('collect', 'save', …) — the
      // identifier QueryMetrics.Record carries. NOTE this is not the
      // job-group id KILL QUERY takes: Spark's QueryExecutionListener
      // fires on the listener bus thread, where the submitting thread's
      // job-group local property is not visible, so a per-query id
      // cannot be recovered here. The admin doc states both contracts.
      queryId: Option[String] = None, // reference MetricsFilter.queryId
      state: Option[String] = None    // reference MetricsFilter.state
  ): DataFrame = {
    import spark.implicits._
    // store-bound session (graft.sql.metricsStore.path, reference
    // TsdbQueryMetricsDao): flush this session's records into the
    // snapshot and serve from it — metrics survive the session
    val rows = metricsStorePath(spark) match {
      case Some(path) =>
        val fresh = metrics.snapshot()
        val all = graft.core.MetricsStore.flushAndRead(spark, path, fresh)
        // drain exactly the flushed prefix — a record the listener
        // appended DURING the flush stays queued for the next one
        metrics.drainFirst(fresh.length)
        all
      case None => metrics.snapshot()
    }
    rows
      .filter(r => queryId.forall(_ == r.funcName))
      .filter(r => state.forall(_.equalsIgnoreCase(if (r.failed) "FAILED" else "FINISHED")))
      .map(r => (r.funcName, r.durationNs / 1e6, r.outputRows, if (r.failed) "FAILED" else "FINISHED"))
      .takeRight(limit)
      .reverse
      .toDF("query", "duration_ms", "output_rows", "state")
  }

  private def metricsStorePath(spark: SparkSession): Option[String] =
    spark.conf.getOption(graft.core.QueryMetrics.StorePathKey).map(_.trim).filter(_.nonEmpty)

  /** DELETE QUERY METRICS (reference `DeleteQueryMetrics(filter)`):
    * clears the matching records (all, when no filter), returning how
    * many were dropped — from the bound metrics store when one is
    * named, else from session memory. */
  def deleteQueryMetrics(
      spark: SparkSession,
      metrics: graft.core.QueryMetrics,
      queryId: Option[String] = None,
      state: Option[String] = None
  ): DataFrame = {
    import spark.implicits._
    def matches(r: graft.core.QueryMetrics.Record): Boolean =
      queryId.forall(_ == r.funcName) &&
        state.forall(_.equalsIgnoreCase(if (r.failed) "FAILED" else "FINISHED"))
    val n = metricsStorePath(spark) match {
      case Some(path) =>
        val fresh = metrics.snapshot()
        val removed = graft.core.MetricsStore.flushAndRemove(spark, path, fresh, matches)
        metrics.drainFirst(fresh.length)
        removed
      case None => metrics.removeWhere(matches)
    }
    Seq(n).toDF("deleted")
  }

  /**
   * KILL QUERY (reference QueryEngineRouter.scala:96 `KillQuery`):
   * queries run under a job group (`SparkContext.setJobGroup`); killing
   * the group cancels every running Spark job in it. Returns one status
   * row, mirroring the reference's "1" response.
   */
  def killQuery(spark: SparkSession, jobGroup: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.cancelJobGroup(jobGroup)
    Seq((jobGroup, "CANCELLED")).toDF("job_group", "status")
  }

  /** SHOW UPDATES_INTERVALS (reference QueryEngineRouter.scala:106):
    * the rollup changelog's invalidated-and-not-yet-recomputed buckets. */
  def showUpdatesIntervals(spark: SparkSession, changelogDir: String): DataFrame = {
    import spark.implicits._
    graft.sources.Changelog
      .dirtyBuckets(spark, changelogDir)
      .toDF("bucket", "pending_seq")
  }

  /** Registered query-over-rollup routes (RollupRewriteRule targets):
    * which fact each rollup answers for, at what grain, and the
    * aggregate columns it can substitute. */
  def showRollupRoutes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    RollupRoutes.all
      .map(r => (
        r.factPathContains, r.rollupPath, r.timeCol, r.grain,
        r.dims.mkString(","),
        r.sums.map { case (m, c) => s"$m->$c" }.mkString(","),
        r.countCol.getOrElse(""),
        r.counts.map { case (m, c) => s"$m->$c" }.mkString(",")))
      .toDF("fact", "rollup", "time_col", "grain", "dims", "sums", "count_col", "metric_counts")
  }
}
