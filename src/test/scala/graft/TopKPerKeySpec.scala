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
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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

  test("strategy does not fire for patterns it cannot serve (rank > constant)") {
    withStrategy {
      val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc)
      val df = spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .withColumn("rank", rank().over(w)) // rank(), not row_number
        .filter(col("rank") <= 3)
      assert(!df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(df.count() > 0)
    }
  }
}
