package graft.core

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/**
 * Query execution metrics, re-expressing the reference's query metric
 * collection (yupana-core dao/TsdbQueryMetricsDao.scala + metrics in
 * TsdbBase): per-query wall time, row counts and state, persisted for
 * operational analysis.
 *
 * graft hooks Spark's QueryExecutionListener: every successful/failed
 * action is recorded with its duration and the physical plan's row
 * metric. Records accumulate in memory and can be dumped as a
 * DataFrame for persistence via TsLayout (the reference writes them to
 * a metrics table).
 */
final class QueryMetrics private (spark: SparkSession) {

  final case class Record(funcName: String, durationNs: Long, outputRows: Long, failed: Boolean)

  private val records = new ConcurrentLinkedQueue[Record]()

  private val listener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      // the ROOT node under AQE is AdaptiveSparkPlanExec (and otherwise
      // often WholeStageCodegenExec), neither of which carries
      // numOutputRows — walk into the executed tree and take the
      // topmost node that has the metric, else the record is -1 for
      // virtually every query
      def rowsOf(p: org.apache.spark.sql.execution.SparkPlan): Option[Long] = {
        val tree = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
          case other => other
        }
        tree.collectFirst {
          case n if n.metrics.contains("numOutputRows") => n.metrics("numOutputRows").value
        }
      }
      val rows = rowsOf(qe.executedPlan).getOrElse(-1L)
      records.add(Record(funcName, durationNs, rows, failed = false))
    }
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      records.add(Record(funcName, -1L, -1L, failed = true))
  }

  spark.listenerManager.register(listener)

  def snapshot(): Seq[Record] = records.asScala.toSeq

  def clear(): Unit = records.clear()

  /** Remove the records matching the predicate, returning how many —
    * the reference's filtered DELETE QUERY METRICS (MetricsFilter). */
  def removeWhere(p: Record => Boolean): Long = {
    var n = 0L
    val it = records.iterator()
    while (it.hasNext) if (p(it.next())) { it.remove(); n += 1 }
    n
  }

  def close(): Unit = spark.listenerManager.unregister(listener)
}

object QueryMetrics {
  def attach(spark: SparkSession): QueryMetrics = new QueryMetrics(spark)

  private val bySession =
    java.util.Collections.synchronizedMap(new java.util.WeakHashMap[SparkSession, QueryMetrics]())

  /** Session-scoped metrics instance (attached on first use) — the
    * store behind the SHOW/DELETE QUERY METRICS SQL statements. */
  def forSession(spark: SparkSession): QueryMetrics =
    bySession.synchronized {
      Option(bySession.get(spark)).getOrElse {
        val m = attach(spark)
        bySession.put(spark, m)
        m
      }
    }
}
