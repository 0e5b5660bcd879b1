package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Dev tool: recall@k and wall time of knnJoinIvf under different
  * vectors-per-cell sizings — the measurements that moved knnJoin's
  * auto-sizing from n/2048 to n/512 in r13 (the pairs path sits at
  * ~256/cell). Recall is measured against brute force on a
  * deterministic query sample (lowest multiplicative id hash), so the
  * brute side stays sample × corpus. Args: <dir> [nQueries] [k]. */
object KnnCellSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_vec140k")
    val nQ = if (args.length > 1) args(1).toInt else 100
    val k = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint(true)
    val n = emb.count()
    val qIds = emb
      .select(col("vec_id"), pmod(pmod(col("vec_id"), lit(1048576L)) * 2654435761L, lit(4294967296L)).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(nQ).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    val queries = emb.filter(col("vec_id").isInCollection(qIds))
    val brute = Ann.bruteForceTopK(
        emb.select(col("vec_id"), col("embedding")), queries, k)
      .select(col("query_id"), col("item_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[knncell] n=$n queries=${qIds.size} bruteEdges=${brute.size}")
    for (perCell <- Seq(2048, 1024, 512, 256)) {
      val cells = math.max(16L, n / perCell).toInt
      val t0 = System.nanoTime()
      // materialize the FULL self-join before sampling — a filter on
      // query_id would push below the join and measure only the
      // (cells-proportional) assignment pass, not the candidates
      val full = Ann.knnJoinIvf(emb, "vec_id", "embedding", k, numCells = cells)
        .localCheckpoint(true)
      val secs = (System.nanoTime() - t0) / 1e9
      val got = full.filter(col("query_id").isInCollection(qIds))
        .select(col("query_id"), col("item_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = brute.intersect(got).size.toDouble / brute.size
      println(f"[knncell] perCell=$perCell cells=$cells recall@$k=$recall%.3f wall=$secs%.1f s (full join)")
    }
    spark.stop()
  }
}
