package graft.core

import org.apache.spark.sql.SparkSession

/**
 * Job labeling (optimization-guide §1.5): every Spark job fired inside
 * `desc(s, "label") { ... }` carries `label` as its job description, so
 * a listener/UI profile of a many-jobs lifecycle gate attributes each
 * job to the operator step that issued it instead of the opaque
 * foreachBatch call site. Thread-local save/restore: safe under
 * concurrent driver threads and nested labels (inner wins, outer
 * restored).
 */
object Jobs {
  def desc[T](s: SparkSession, d: String)(f: => T): T = {
    val sc = s.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(d)
    try f finally sc.setJobDescription(prev)
  }
}
