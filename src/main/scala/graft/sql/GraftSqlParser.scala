package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructType}

/**
 * SQL statement surface for the admin commands, injected via
 * `SparkSessionExtensions.injectParser` — the reference exposes these
 * as first-class statements in its own SQL dialect (yupana-core
 * sql/parser: ShowQueryMetrics / DeleteQueryMetrics / KillQuery /
 * ShowUpdatesIntervals, routed by QueryEngineRouter.scala:91-106).
 * graft recognizes exactly those statements and delegates every other
 * string to Spark's parser, so the full Spark SQL language is
 * untouched.
 *
 * Grammar (case-insensitive):
 *   SHOW QUERY METRICS [LIMIT n]
 *   DELETE QUERY METRICS
 *   KILL QUERY '<job-group>'
 *   SHOW UPDATES_INTERVALS '<changelog-dir>'
 *   SHOW ROLLUP ROUTES
 */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = {
    val t = sqlText.trim
    t match {
      case ShowMetricsRe(limit) =>
        ShowQueryMetricsCommand(Option(limit).map(_.toInt).getOrElse(100))
      case DeleteMetricsRe() => DeleteQueryMetricsCommand()
      case KillQueryRe(group) => KillQueryCommand(group)
      case ShowUpdatesRe(dir) => ShowUpdatesIntervalsCommand(dir)
      case ShowRoutesRe() => ShowRollupRoutesCommand()
      case _ => delegate.parsePlan(sqlText)
    }
  }

  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier = delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier = delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] = delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  private val ShowMetricsRe = """(?is)SHOW\s+QUERY\s+METRICS(?:\s+LIMIT\s+(\d+))?\s*;?""".r
  private val DeleteMetricsRe = """(?is)DELETE\s+QUERY\s+METRICS\s*;?""".r
  private val KillQueryRe = """(?is)KILL\s+QUERY\s+'([^']+)'\s*;?""".r
  private val ShowUpdatesRe = """(?is)SHOW\s+UPDATES_INTERVALS\s+'([^']+)'\s*;?""".r
  private val ShowRoutesRe = """(?is)SHOW\s+ROLLUP\s+ROUTES\s*;?""".r

  private[sql] def attr(name: String, dt: DataType): Attribute = AttributeReference(name, dt, nullable = true)()
}

// The commands delegate to the graft.sql.Catalog helpers (the
// programmatic admin surface) so the SQL statements and the Scala API
// cannot drift apart — one row-shaping implementation each.

/** SHOW QUERY METRICS [LIMIT n] — recorded query durations/rows/state. */
case class ShowQueryMetricsCommand(limit: Int) extends LeafRunnableCommand {
  import GraftSqlParser.attr
  override val output: Seq[Attribute] =
    Seq(attr("query", StringType), attr("duration_ms", DoubleType), attr("output_rows", LongType), attr("state", StringType))
  override def run(spark: SparkSession): Seq[Row] =
    Catalog.showQueryMetrics(spark, graft.core.QueryMetrics.forSession(spark), limit).collect().toSeq
}

/** DELETE QUERY METRICS — clear the recorded metrics. */
case class DeleteQueryMetricsCommand() extends LeafRunnableCommand {
  import GraftSqlParser.attr
  override val output: Seq[Attribute] = Seq(attr("deleted", LongType))
  override def run(spark: SparkSession): Seq[Row] =
    Catalog.deleteQueryMetrics(spark, graft.core.QueryMetrics.forSession(spark)).collect().toSeq
}

/** KILL QUERY '<job-group>' — cancel all running jobs in the group. */
case class KillQueryCommand(jobGroup: String) extends LeafRunnableCommand {
  import GraftSqlParser.attr
  override val output: Seq[Attribute] = Seq(attr("job_group", StringType), attr("status", StringType))
  override def run(spark: SparkSession): Seq[Row] =
    Catalog.killQuery(spark, jobGroup).collect().toSeq
}

/** SHOW UPDATES_INTERVALS '<changelog-dir>' — dirty rollup buckets. */
case class ShowUpdatesIntervalsCommand(changelogDir: String) extends LeafRunnableCommand {
  import GraftSqlParser.attr
  override val output: Seq[Attribute] = Seq(attr("bucket", StringType), attr("pending_seq", LongType))
  override def run(spark: SparkSession): Seq[Row] =
    Catalog.showUpdatesIntervals(spark, changelogDir).collect().toSeq
}

/** SHOW ROLLUP ROUTES — the registered query-over-rollup rewrites. */
case class ShowRollupRoutesCommand() extends LeafRunnableCommand {
  import GraftSqlParser.attr
  override val output: Seq[Attribute] = Seq(
    attr("fact", StringType), attr("rollup", StringType), attr("time_col", StringType),
    attr("grain", StringType), attr("dims", StringType), attr("sums", StringType),
    attr("count_col", StringType), attr("metric_counts", StringType))
  override def run(spark: SparkSession): Seq[Row] =
    Catalog.showRollupRoutes(spark).collect().toSeq
}
