package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopKPerKeyStrategy

class TopKPerKeySpec extends SparkSpecBase {
  import spark.implicits._

  private def withStrategy[T](f: => T): T = {
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ TopKPerKeyStrategy(spark)
    try f
    finally spark.experimental.extraStrategies =
      spark.experimental.extraStrategies.filterNot(_.isInstanceOf[TopKPerKeyStrategy])
  }

  private def topkQuery() = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
    graft.sources.EventTime.normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("user_id"), col("event_id"), col("value"), col("rank"))
  }

  test("TopKPerKeyExec replaces the window top-k pattern and matches its result exactly") {
    val expected = topkQuery()
      .as[(Long, Long, Double, Int)].collect().toSeq.sorted
    val (planStr, got) = withStrategy {
      val df = topkQuery()
      (df.queryExecution.executedPlan.toString, df.as[(Long, Long, Double, Int)].collect().toSeq.sorted)
    }
    assert(planStr.contains("TopKPerKey"), planStr.take(2000))
    assert(!planStr.contains("Sort "), "no sort anywhere — the heap subsumes it:\n" + planStr.take(2000))
    assert(!planStr.contains("WindowGroupLimit"), planStr.take(2000))
    assert(got == expected)
  }

  test("TopKPerKeyExec spills past the configured row bound and stays exact") {
    val expected = topkQuery()
      .as[(Long, Long, Double, Int)].collect().toSeq.sorted
    spark.conf.set(graft.plans.TopKPerKeyExec.ConfKey, "8") // 15 users, 4 partitions: ~4 keys x k=3 rows each
    spark.conf.set("spark.sql.adaptive.enabled", "false") // keep the exec findable for metrics
    try {
      withStrategy {
        val df = topkQuery()
        // collect from df itself (.as[...] would re-plan → fresh, unexecuted metrics)
        val got = df.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq.sorted
        assert(got == expected)
        val exec = df.queryExecution.executedPlan.collectFirst {
          case e: graft.plans.TopKPerKeyExec => e
        }
        assert(exec.isDefined, df.queryExecution.executedPlan.toString.take(2000))
        assert(exec.get.metrics("numSpills").value > 0,
          "expected heap spills with an 8-row bound")
      }
    } finally {
      spark.conf.unset(graft.plans.TopKPerKeyExec.ConfKey)
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("strategy does not fire for patterns it cannot serve (rank > constant)") {
    withStrategy {
      val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc)
      val df = graft.sources.EventTime.normalizeTs(
          spark.read.parquet(s"$sfDir/events.parquet"))
        .withColumn("rank", rank().over(w)) // rank(), not row_number
        .filter(col("rank") <= 3)
      assert(!df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(df.count() > 0)
    }
  }
}
