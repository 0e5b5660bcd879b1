package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: the Bench C-anchor on its own — one 100M-xxhash 32-core
  * probe (near-idle ~200-330 ms at local[32]) to classify the host's
  * current stretch before/after a scale measurement. Usage:
  * `Calib [cpus] [reps]`. */
object Calib {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0) else "32"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(): Long = {
      val t0 = System.nanoTime()
      spark.range(0L, 100000000L, 1L, cpus.toInt)
        .select(pmod(xxhash64(col("id")), lit(1000000L)).as("h")).agg(sum(col("h"))).head()
      math.round((System.nanoTime() - t0) / 1e6)
    }
    once() // JIT
    println(s"[calib] cpus=$cpus ms=${(1 to reps).map(_ => once()).mkString(",")}")
    spark.stop()
  }
}
