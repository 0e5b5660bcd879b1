package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: time DirCache.parquetRowCount vs a Spark count() on a
  * freshly written small dir — the bloom-sizing path's driver gap. */
object FooterBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = s"/tmp/graft_footerbench/${java.util.UUID.randomUUID()}"
    spark.range(200).select(col("id"), transform(sequence(lit(0), lit(63)),
      i => xxhash64(col("id"), i)).as("sig"))
      .repartition(8).write.parquet(dir)
    for (r <- 1 to 3) {
      var t0 = System.nanoTime()
      val n1 = graft.core.DirCache.parquetRowCount(spark, dir)
      val tFooter = (System.nanoTime() - t0) / 1e6
      t0 = System.nanoTime()
      val n2 = spark.read.parquet(dir).count()
      val tCount = (System.nanoTime() - t0) / 1e6
      println(f"[footerbench] rep $r footer=$n1 in $tFooter%.1f ms | count()=$n2 in $tCount%.1f ms")
    }
    spark.stop()
  }
}
