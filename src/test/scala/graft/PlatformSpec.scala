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
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
}
