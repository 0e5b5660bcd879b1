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

  /** Run `write` with a count Observation attached to `df` and return
    * the written row count — a sizing count (bloom expectedNumItems,
    * bucket counts) rides the write job instead of a separate count
    * job or a footer pass. */
  def observedWrite(
      df: org.apache.spark.sql.DataFrame)(
      write: org.apache.spark.sql.DataFrame => Unit): Long = {
    val obs = org.apache.spark.sql.Observation()
    write(df.observe(obs,
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n")))
    obs.get("n").asInstanceOf[Long]
  }

  /**
   * Run INDEPENDENT Spark actions concurrently from driver threads
   * (optimization-guide §2.6): actions only serialize because the
   * driver calls them sequentially, so a trigger's sink writes that
   * share no lineage can back-fill each other's stage tails. Each
   * thunk runs in its own named thread under its own job description
   * (local properties are InheritableThreadLocal — children see the
   * caller's session state). Joins ALL threads, then rethrows the
   * first failure — a failed write must fail the trigger exactly as
   * the sequential form did. Cached inputs shared across thunks are
   * safe: block-level cache locks make concurrent first-use compute
   * a partition once.
   */
  def par(s: SparkSession)(work: (String, () => Unit)*): Unit = {
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = work.map { case (d, f) =>
      val t = new Thread(
        { () => try desc(s, d)(f()) catch { case e: Throwable => errs.add(e) } }: Runnable,
        s"graft-par-$d")
      t.setDaemon(true)
      t.start()
      t
    }
    ts.foreach(_.join())
    if (!errs.isEmpty) {
      // every sibling failure rides along as suppressed — a multi-sink
      // trigger failure must not lose the other stack traces
      val first = errs.poll()
      var e = errs.poll()
      while (e != null) { if (e ne first) first.addSuppressed(e); e = errs.poll() }
      throw first
    }
  }
}
