package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopKPerKeyStrategy

/** Measure window top-k vs the TopKPerKeyExec heap operator (dev tool). */
object ProfileTopK {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // 50M rows, 100k keys — big enough that the per-partition sort matters
    val df = spark.range(50000000L).select(
      (col("id") % 100000).as("k"),
      (col("id") * 2654435761L % 1000003L).as("v"),
      col("id")
    )
    val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("id"))
    def q() = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
    time("warm")(df.groupBy("k").count().count())
    time("window topk run1")(q().count())
    time("window topk run2")(q().count())
    spark.experimental.extraStrategies = Seq(TopKPerKeyStrategy(spark))
    time("heap topk run1")(q().count())
    time("heap topk run2")(q().count())
    spark.stop()
  }
}
