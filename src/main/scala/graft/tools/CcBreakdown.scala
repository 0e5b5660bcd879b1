package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev tool: stage split of semanticDedup at a given dir — pair
  * generation vs connected components vs the final join-back — the
  * numbers behind any CC tuning. */
object CcBreakdown {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf7")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.GraftFunctions.register(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccb] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val pairs = time("pairs (count)") {
      val p = Dedup.embeddingPairs(emb, "vec_id", "embedding", threshold = 0.5)
        .select(col("id_a"), col("id_b")).localCheckpoint(true)
      println(s"[ccb] n_pairs=${p.count()}")
      p
    }
    val cc = time("connectedComponents") {
      val c = Dedup.connectedComponents(pairs).localCheckpoint(true)
      println(s"[ccb] n_nodes=${c.count()}")
      c
    }
    time("semanticDedup end-to-end") {
      println(s"[ccb] out=${Dedup.semanticDedup(emb, "vec_id", "embedding", 0.5).count()}")
    }
    spark.stop()
  }
}
