package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev tool: print the banded PPJoin candidate plan on a tiny corpus
  * and its pair count — a fast smoke for join-strategy regressions
  * (the banded join must stay an equi shuffle-hash join, never a
  * nested-loop fallback). */
object PpjPlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.range(200).select(
      col("id").as("doc_id"),
      concat(lit("shared header text here "),
        concat_ws(" ", (0 until 6).map(k =>
          concat(lit("w"), pmod(xxhash64(col("id"), lit(k)), lit(997)).cast("string"))): _*)).as("text"),
      lit("en").as("lang"), lit("s0").as("source"))
    val out = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", Seq("lang", "source"))
    out.explain("formatted")
    println("rows=" + out.count())
    spark.stop()
  }
}
