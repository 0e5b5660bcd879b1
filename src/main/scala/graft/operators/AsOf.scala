package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join: for each left row, the latest right row
 * with right.time <= left.time in the same partition key — the classic
 * attribution / last-known-value operator.
 *
 * Formulation: tag and union both sides, one window pass carries the
 * last right-side time forward, then a unique equi-join retrieves the
 * right row. ONE shuffle on (key) for the window plus one equi-join —
 * versus the naive theta-join (left ⋈ right on key AND time<=, then
 * rank) whose intermediate is |left|×|matching rights| and explodes on
 * active keys. The window formulation's intermediate is |left|+|right|
 * regardless of time density, which is what survives 100 TB of events.
 *
 * The right side must be unique per (key, time) — pre-aggregate
 * (`dedupRight`) makes the retrieval join key-unique, which also pins
 * deterministic semantics for ties.
 */
object AsOf {

  /** Deduplicate the right side to one row per (key, time): lowest id wins. */
  def dedupRight(right: DataFrame, keyCol: String, timeCol: String, idCol: String): DataFrame =
    right.groupBy(col(keyCol), col(timeCol)).agg(min(col(idCol)).as(s"asof_$idCol"))

  /**
   * @param left      probe rows (e.g. purchases)
   * @param right     deduped right rows: (key, time, asof_id)
   * @param tolerance max lookback in seconds (None = unbounded)
   */
  def join(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      tolerance: Option[Long] = None
  ): DataFrame = {
    val l = left.withColumn("__side", lit(1))
    val r = right.withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // rights sort before lefts at equal time => "<=" semantics
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__last_right_time", max(when(col("__side") === 0, col(timeCol))).over(w))
      .filter(col("__side") === 1)
      .select((left.columns.toIndexedSeq.map(col) :+ col("__last_right_time")): _*)
    val bounded = tolerance match {
      case Some(sec) =>
        carried.withColumn(
          "__last_right_time",
          when(
            unix_micros(col(timeCol)) - unix_micros(col("__last_right_time")) <= sec * 1000000L,
            col("__last_right_time")
          )
        )
      case None => carried
    }
    bounded
      .join(
        right.withColumnRenamed(timeCol, "__rt").withColumnRenamed(keyCol, "__rk"),
        col(keyCol) === col("__rk") && col("__last_right_time") === col("__rt"),
        "left"
      )
      .drop("__rk", "__rt", "__last_right_time")
  }
}
