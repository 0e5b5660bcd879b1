package graft

import org.apache.spark.sql.functions._
import graft.core.{QueryBuilder, QueryMetrics}
import graft.schema.TestSchema
import graft.sources.TsLayout

class PlatformSpec extends SparkSpecBase {

  private def load(name: String) = spark.read.parquet(s"$sfDir/$name.parquet")

  test("QueryBuilder surfaces unknown columns with the table schema (QueryValidator parity)") {
    val e = intercept[IllegalArgumentException] {
      QueryBuilder(spark, TestSchema.schema, load, "lineitem")
        .where(col("no_such_column") === 1)
        .select(col("l_orderkey"))
        .build()
        .collect()
    }
    assert(e.getMessage.contains("lineitem") && e.getMessage.contains("l_quantity"))
  }

  test("QueryMetrics records duration and row counts per action") {
    val m = QueryMetrics.attach(spark)
    try {
      m.clear()
      load("region").count()
      // listener callbacks are async; poll briefly
      val deadline = System.currentTimeMillis() + 5000
      while (m.snapshot().isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      val recs = m.snapshot()
      assert(recs.nonEmpty)
      assert(recs.forall(!_.failed))
      assert(recs.exists(_.durationNs > 0))
    } finally m.close()
  }

  test("Rollup.materialize persists the pre-aggregate and queries over it match the source") {
    import spark.implicits._
    import graft.sources.Rollup
    import graft.functions.F
    val events = graft.sources.EventTime.normalizeTs(
      spark.read.parquet(s"$sfDir/events.parquet"))
    val roll = Rollup(
      name = "events_by_day",
      timeExpr = F.truncDay(col("ts")),
      groupBy = Seq(col("event_type")),
      aggregates = Seq(count(lit(1)).as("c"), sum(col("value").cast("decimal(18,4)")).as("v"))
    )
    val path = "/tmp/graft_rollup_spec/events_by_day"
    roll.materialize(events, path)
    val fromRollup = spark.read.parquet(path)
      .groupBy("event_type").agg(sum("c").as("n")).as[(String, Long)].collect().toMap
    val fromSource = events.groupBy("event_type").count().as[(String, Long)].collect().toMap
    assert(fromRollup == fromSource)
  }

  test("catalog metadata surface: SHOW TABLES / COLUMNS / FUNCTIONS") {
    import graft.sql.Catalog
    val tables = Catalog.showTables(spark, TestSchema.schema).collect().map(_.getString(0)).toSet
    assert(tables == Set("lineitem", "events"))
    val cols = Catalog.showColumns(spark, TestSchema.schema, "events").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(cols("ts") == "time" && cols("event_type") == "dimension" && cols("value") == "metric")
    val fns = Catalog.showFunctions(spark).collect().map(_.getString(0)).toSet
    assert(fns.contains("graft_cosine") && fns.contains("graft_text_minhash"))
  }

  test("admin surface: SHOW/DELETE QUERY METRICS, KILL QUERY, SHOW UPDATES_INTERVALS") {
    import graft.sql.Catalog
    val m = QueryMetrics.attach(spark)
    try {
      m.clear()
      load("region").count()
      val deadline = System.currentTimeMillis() + 5000
      while (m.snapshot().isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)

      val shown = Catalog.showQueryMetrics(spark, m)
      assert(shown.columns.toSeq === Seq("query", "duration_ms", "output_rows", "state"))
      assert(shown.count() >= 1)
      assert(shown.collect().forall(_.getString(3) == "FINISHED"))

      // (no isEmpty check after delete: the delete's own .head() action
      // lands in the listener queue asynchronously)
      val deleted = Catalog.deleteQueryMetrics(spark, m).head().getLong(0)
      assert(deleted >= 1)

      // KILL QUERY: cancel a slow query running under a job group
      @volatile var failure: Option[Throwable] = None
      val t = new Thread(() => {
        try {
          spark.sparkContext.setJobGroup("victim", "slow query", interruptOnCancel = true)
          spark.range(Long.MaxValue / 4).selectExpr("sum(id * id)").collect()
        } catch { case e: Throwable => failure = Some(e) }
        finally spark.sparkContext.clearJobGroup()
      })
      t.start()
      val jobDeadline = System.currentTimeMillis() + 15000
      while (spark.sparkContext.statusTracker.getJobIdsForGroup("victim").isEmpty &&
        System.currentTimeMillis() < jobDeadline) Thread.sleep(50)
      val killed = Catalog.killQuery(spark, "victim").head()
      assert(killed.getString(1) == "CANCELLED")
      t.join(30000)
      assert(!t.isAlive, "victim query should have been cancelled")
      assert(failure.exists(_.getMessage.toLowerCase.contains("cancel")), s"got: $failure")

      // SHOW UPDATES_INTERVALS over the rollup changelog
      import graft.sources.Changelog
      val cl = "/tmp/graft_admin_cl"
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(cl), true)
      Changelog.markDirty(load("region").limit(1).select(lit("2024-01").as("b")), col("b"), cl)
      val intervals = Catalog.showUpdatesIntervals(spark, cl).collect()
      assert(intervals.map(_.getString(0)).toSeq === Seq("2024-01"))
    } finally m.close()
  }

  test("registry completeness: now/database/id functions") {
    val r = spark.sql(
      "SELECT graft_now() AS t, graft_database() AS db, graft_id('region_A') AS id1, graft_id('region_A') AS id2").head()
    assert(r.getAs[java.sql.Timestamp]("t") != null)
    assert(r.getAs[String]("db") == "graft")
    assert(r.getAs[Long]("id1") == r.getAs[Long]("id2"))
  }

  test("bucketed fact tables join without an exchange (co-located join)") {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    // clear any orphaned managed-table locations from prior runs
    Seq("orders_b", "lineitem_b").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"/tmp/graft_warehouse/$t"))
    }
    TsLayout.writeBucketed(load("orders"), "orders_b", "o_orderkey", 8)
    TsLayout.writeBucketed(
      load("lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b",
      "o_orderkey",
      8
    )
    // force the merge join (tiny test tables would broadcast); at fact
    // scale SMJ is what the planner picks and bucketing must feed it
    // without a shuffle or sort
    val joined = spark.table("orders_b").hint("merge").join(spark.table("lineitem_b"), "o_orderkey")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n${plan.take(3000)}")
  }

  test("upsert picks a deterministic winner for duplicate keys within one batch") {
    import spark.implicits._
    import graft.sources.Upsert
    val base = Seq((1L, "old")).toDF("key", "v")
    // two updates for key 1 arrive in the SAME batch (same __prio/__seq):
    // the content-hash tie-break must pick the same row on every run
    // and under any partitioning — not whichever the shuffle delivered first
    val updates = Seq((1L, "a"), (1L, "b"), (2L, "x")).toDF("key", "v")
    val winners = (1 to 3).map { i =>
      Upsert(base, updates.repartition(i), Seq("key"))
        .orderBy("key").as[(Long, String)].collect().toSeq
    }
    assert(winners.distinct.size == 1, s"nondeterministic upsert winners: $winners")
    assert(winners.head.map(_._1) == Seq(1L, 2L))
    assert(winners.head.head._2 != "old", "an update must win over base")
  }

  test("changelog: a null bucket key cycles dirty -> clean instead of looping forever") {
    import graft.sources.Changelog
    import spark.implicits._
    val dir = "/tmp/graft_nullbucket_spec"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val batch = Seq(
      (Some(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")), 1.0),
      (Option.empty[java.sql.Timestamp], 2.0) // null ts -> null bucket
    ).toDF("ts", "value")
    Changelog.markDirty(batch, date_format(col("ts"), "yyyy-MM"), s"$dir/changelog")
    val dirty = Changelog.dirtyBuckets(spark, s"$dir/changelog")
    assert(dirty.map(_._1).toSet == Set("2024-01", Changelog.NullBucket),
      s"null key must surface as the sentinel: $dirty")
    Changelog.markClean(spark, s"$dir/changelog", dirty)
    assert(Changelog.dirtyBuckets(spark, s"$dir/changelog").isEmpty,
      "a cleaned null bucket must not stay dirty forever")
  }
}
