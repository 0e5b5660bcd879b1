package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.F

/**
 * Ordered event-sequence (conversion funnel) analytics over a stream
 * table — the per-user "did A happen, then B strictly after it, then
 * C…" question a time-series OLAP platform answers about its events
 * (beyond the reference's aggregate surface; its event model is the
 * same DataPoint stream, yupana-api TSDB model).
 *
 * Construction: cascaded RUNNING conditional minima over ONE
 * user-ordered window — step i's running column is the earliest
 * event of type `steps(i)` that falls strictly after the
 * then-earliest qualified step i−1 time; because each running column
 * is monotone non-increasing along the partition, the per-user
 * global minimum (the rollup) equals its final value, and the whole
 * funnel is three narrow columns instead of per-user event
 * collection or an N-way self-join. Ties at the same timestamp do
 * not chain (strict `>`): simultaneous view+click counts the click
 * toward a LATER view only.
 *
 * Scale shape: a single user-key exchange feeds every Window pass
 * and the final per-user aggregate (same partitioning — zero
 * additional shuffles, plan-audited in PLANS.md); a user with 10^6
 * events costs one sort, never a quadratic sequence match.
 */
object Funnel {

  /**
   * @param steps ordered event types of the funnel; output has one
   *              nullable `ts_step<i>` per step (1-based) plus
   *              `steps_completed` = the deepest step reached.
   * @param tieCol deterministic order within equal timestamps (an
   *               event id) — affects WHICH same-ts event anchors a
   *               step, not whether chaining occurs (strict `>` on ts).
   */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      tieCol: String,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window
      .partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = steps.zipWithIndex.foldLeft(
      events.select(col(userCol), col(tsCol), col(typeCol), col(tieCol))) {
      case (df, (step, i)) =>
        val qualifies =
          if (i == 0) col(typeCol) === step
          else col(typeCol) === step && col(tsCol) > col(s"__v${i - 1}")
        df.withColumn(s"__v$i", min(when(qualifies, col(tsCol))).over(w))
    }
    val stepAggs = steps.indices.map(i => min(col(s"__v$i")).as(s"ts_step${i + 1}"))
    // fold shallow→deep so the DEEPEST reached step is the outermost
    // when (the last wrap wins the conditional chain)
    val completed = steps.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"ts_step${i + 1}").isNotNull, i + 1).otherwise(acc)
    }
    staged
      .groupBy(col(userCol))
      .agg(stepAggs.head, stepAggs.tail: _*)
      .withColumn("steps_completed", completed.cast("int"))
  }

  /**
   * Top event paths — the third of the classic event-stream trio
   * (funnel / retention / paths): the most common length-`n`
   * consecutive event-type sequences across users, with how many
   * distinct users walked each. One user-key exchange: the window
   * builds each position's n-gram via lead(), the rollup counts
   * occurrences and distinct users per path — never a per-user
   * sequence collect.
   */
  def topPaths(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      tieCol: String,
      n: Int = 3,
      topK: Int = 10
  ): DataFrame = {
    require(n >= 2, "a path needs at least two steps")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val withPath = (1 until n)
      .foldLeft(events.select(col(userCol), col(tsCol), col(typeCol), col(tieCol))) {
        (df, i) => df.withColumn(s"__s$i", lead(col(typeCol), i).over(w))
      }
      // a complete n-gram exists only where the head AND all lookaheads
      // are filled: a null-typed event invalidates every n-gram through
      // it (a null at position i>=1 nulls some row's lookahead; a null
      // HEAD needs its own filter — without it concat_ws would silently
      // drop the null and emit a shorter path colliding with genuine
      // (n-1)-step paths, diverging from the SQL oracle's NULL ||-chain)
      .filter(col(typeCol).isNotNull && (1 until n).map(i => col(s"__s$i").isNotNull).reduce(_ && _))
      .withColumn("path",
        concat_ws(" > ", (col(typeCol) +: (1 until n).map(i => col(s"__s$i"))): _*))
    withPath
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_occurrences"), count_distinct(col(userCol)).as("n_users"))
      .orderBy(col("n_occurrences").desc, col("path").asc)
      .limit(topK)
  }

  /**
   * Trailing-window anomaly detection over per-period series counts —
   * the monitoring analytic an event store serves daily. Input: any
   * frame of (seriesCol, periodCol, cnt) rows (one per series ×
   * period). Each count z-scores against the `lookback` PRECEDING
   * OBSERVED rows of its series (a ROWS frame over whatever periods
   * the input carries — for wall-clock semantics and outage detection
   * feed a DENSE grid: [[densifyDaily]] zero-fills missing days, so a
   * gap cannot silently stretch the baseline window and a
   * zero-count outage day is scored like any other); the current
   * period never contaminates its own baseline, and a flat baseline
   * (std = 0) flags ANY deviation. All window aggregates are exact
   * integers; mean/std/z derive from them through one scalar double
   * formula, so the result is engine-exact (the q_agg_stats
   * discipline on a window). Scale: the input is
   * series-period-bounded (not event-sized) and the one exchange is
   * the series key.
   */
  /**
   * Zero-fill a daily count series onto its dense day grid: per
   * series, every calendar day between the series' first and last
   * observed day gets a row (missing days at cnt = 0). The monitoring
   * prerequisite for [[anomalies]] — without it a day with NO events
   * (the canonical anomaly: a pipeline outage) is simply absent and
   * can never be scored.
   *
   * Form: each observed row explodes the gap to its NEXT observed day
   * (lead() + sequence(); position 0 keeps the count, generated
   * positions are the zeros) — a min/max-grid LEFT JOIN is the
   * obvious alternative, but Catalyst re-derives the per-series
   * bounds from the frame's SOURCE (min-over-groups collapses to
   * min-over-rows), and when `counts` is an aggregate over an event
   * table that means a SECOND event-sized scan; the gap-fill window
   * stays strictly on the days×series-bounded rollup, contributes no
   * join, and its (series, day) sort is the very sort [[anomalies]]'s
   * window needs — one exchange serves both.
   */
  def densifyDaily(
      counts: DataFrame,
      seriesCol: String,
      dayCol: String,
      cntCol: String
  ): DataFrame = {
    val w = Window.partitionBy(col(seriesCol)).orderBy(col(dayCol))
    counts
      .withColumn("__next", lead(col(dayCol), 1).over(w))
      .select(col(seriesCol), col(cntCol),
        posexplode(sequence(
          col(dayCol),
          coalesce(col("__next") - expr("interval 1 day"), col(dayCol)),
          expr("interval 1 day"))).as(Seq("__pos", dayCol)))
      .select(col(seriesCol), col(dayCol),
        when(col("__pos") === 0, col(cntCol)).otherwise(lit(0L)).as(cntCol))
  }

  def anomalies(
      counts: DataFrame,
      seriesCol: String,
      periodCol: String,
      cntCol: String,
      lookback: Int = 7,
      zThreshold: Double = 3.0
  ): DataFrame = {
    require(lookback >= 2, "a baseline needs at least two prior periods")
    val tw = Window.partitionBy(col(seriesCol)).orderBy(col(periodCol))
      .rowsBetween(-lookback, -1)
    val nd = col("n_prev").cast("double")
    val sd = col("sum_prev").cast("double")
    val ssd = col("sumsq_prev").cast("double")
    val mean = sd / nd
    val std = sqrt((ssd - sd * sd / nd) / (nd - 1))
    counts
      .withColumn("n_prev", count(lit(1)).over(tw))
      .withColumn("sum_prev", sum(col(cntCol)).over(tw))
      .withColumn("sumsq_prev", sum(col(cntCol) * col(cntCol)).over(tw))
      .filter(col("n_prev") > 1) // a baseline needs at least two prior periods
      .select(
        col(periodCol), col(seriesCol), col(cntCol),
        mean.as("mean_prev"),
        when(std > 0.0, (col(cntCol) - mean) / std).as("z"),
        coalesce(when(std > 0.0, abs((col(cntCol) - mean) / std) > zThreshold),
          col(cntCol).cast("double") =!= mean).as("is_anomaly"))
  }

  /**
   * Cohort retention matrix — the second classic event-stream
   * analytic: users cohorted by the period of their FIRST
   * `anchorType` event; for each (cohort, periods-since-anchor) cell,
   * how many of the cohort were active (any event at or after their
   * anchor). retention = n_active / n_cohort.
   *
   * Period arithmetic runs on floor-to-second epochs (Spark's
   * timestamp→long cast ≡ DuckDB floor(epoch(ts)) — mirrored in the
   * oracle), so the cell boundaries are engine-exact; retention is
   * one IEEE division of exact counts.
   *
   * Scale shape: the anchor table is user-cardinality (map-side
   * combined min) and joins into the single events pass on the user
   * key WITHOUT a forced broadcast — AQE broadcasts it while it fits
   * and falls back to a shuffle join past that, so total user count
   * never becomes a hard ceiling; the (user, cohort, period) distinct
   * and the cell rollup share the aggregation discipline — nothing
   * event-cardinality is ever collected or re-scanned. The tiny
   * cohort-sizes table (one row per cohort period) does broadcast.
   *
   * @param cohortTrunc `date_trunc` unit for the cohort label — keep
   *                    it aligned with `periodSeconds` (week/604800 by
   *                    default; pass "day"/86400 for daily retention),
   *                    or cells of one granularity land on cohort
   *                    labels of another.
   */
  def retention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      anchorType: String = "signup",
      periodSeconds: Long = 7L * 24 * 3600,
      cohortTrunc: String = "week"
  ): DataFrame = {
    require(periodSeconds > 0, "periodSeconds must be positive")
    // narrow to the referenced columns (the funnel discipline): an
    // events frame carrying its own `cohort`/`__t0` column must not
    // make the post-join references ambiguous
    val ev = events.select(col(userCol), col(tsCol), col(typeCol))
    val anchors = ev
      .filter(col(typeCol) === anchorType)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("__t0"))
      .withColumn("cohort",
        if (cohortTrunc == "week") F.truncWeek(col("__t0")) else date_trunc(cohortTrunc, col("__t0")))
    val active = ev
      .join(anchors, Seq(userCol))
      .filter(col(tsCol) >= col("__t0"))
      .select(col(userCol), col("cohort"),
        floor((col(tsCol).cast("long") - col("__t0").cast("long")).cast("double") / lit(periodSeconds.toDouble))
          .cast("int").as("period_n"))
      .distinct()
    val cohortSizes = anchors
      .groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_cohort"))
    active
      .groupBy(col("cohort"), col("period_n"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(cohortSizes), Seq("cohort"))
      .withColumn("retention", col("n_active").cast("double") / col("n_cohort").cast("double"))
      .select(col("cohort"), col("period_n"), col("n_cohort"), col("n_active"), col("retention"))
  }
}
