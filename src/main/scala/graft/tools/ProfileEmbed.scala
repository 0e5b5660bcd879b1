package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Timing check for the threshold-sized embedding LSH (dev tool). */
object ProfileEmbed {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    println("[t] banding t=0.5: " + Dedup.signBanding(0.5))
    println("[t] banding t=0.9: " + Dedup.signBanding(0.9))
    println("[t] banding t=0.97: " + Dedup.signBanding(0.97))
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    time("warm")(emb.count())
    time("embeddingPairs t=0.5 run1")(Dedup.embeddingPairs(emb, "vec_id", "embedding", threshold = 0.5).count())
    time("embeddingPairs t=0.5 run2")(Dedup.embeddingPairs(emb, "vec_id", "embedding", threshold = 0.5).count())
    time("semanticDedup t=0.5")(Dedup.semanticDedup(emb, "vec_id", "embedding", threshold = 0.5).count())
    spark.stop()
  }
}
