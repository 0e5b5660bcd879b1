package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Parameter sweep behind q_ann_pq's (m, K, rerank) choices: recall@5
  * of the rerank-limited PQ search vs brute force on the synthetic
  * embeddings (near-uniform vectors — the HARD case for PQ, since
  * there is no cluster structure for the codebooks to exploit; real
  * embedding corpora sit on low-dimensional manifolds where the same
  * geometry recalls far better). Cited in SURVEY §5. */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 8)
    val brute = Ann.bruteForceTopK(emb, queries, 5)
      .select("query_id", "item_id").as[(Long, Long)].collect().toSet
    for (m <- Seq(8, 16); kk <- Seq(16, 32)) {
      // codebooks depend only on (m, K) — train once per pair, not per rerank
      val cb = Ann.pqTrain(spark, emb, m = m, codebookSize = kk)
      for (rerank <- Seq(20, 40)) {
        val got = Ann.pqTopK(emb, queries, cb, 5, rerank = rerank)
          .select("query_id", "item_id").as[(Long, Long)].collect().toSet
        val recall = (brute intersect got).size.toDouble / brute.size
        println(f"[pqsweep] m=$m%2d K=$kk%2d rerank=$rerank%3d -> recall@5 $recall%.3f")
      }
    }
    spark.stop()
  }
}
