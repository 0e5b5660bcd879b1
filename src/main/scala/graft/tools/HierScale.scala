package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Dev tool: the ≥2M-vector evidence point for the TWO-LEVEL quantizer
  * (r14) — knnJoinIvf under DEFAULT dispatch (numCells = 0, so past
  * wanted > 4096 the hier branch engages: √wanted coarse × √wanted
  * fine, distributed fine-level training, broadcast centroid tables).
  * Measures the trainer wall on its own, the full self-join wall, and
  * recall@k against brute force on a deterministic query sample
  * (lowest multiplicative id hash — brute stays sample × corpus).
  * Feed it a VecScale-built dir, e.g.
  * `runMain graft.tools.VecScale 1100 /tmp/graft_vec2m` (2.2M vectors
  * at sf0.1's 2000-row base — past the 2^21-ish hier flip at 512/cell).
  * Args: <dir> [nQueries] [k]. */
object HierScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_vec2m")
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
    val wanted = math.max(16L, n / 512L)
    val side = math.ceil(math.sqrt(wanted.toDouble)).toInt
    println(s"[hierscale] n=$n wanted=$wanted side=$side " +
      s"(hier engages: ${wanted > 4096L})")

    // trainer wall, measured alone (the join below re-trains — the cost
    // is reported separately so the candidate-join share is attributable)
    val t0 = System.nanoTime()
    val (l1, l2) = Ann.ivfTrainHier(spark,
      emb.select(xxhash64(col("vec_id")).as("vec_id"), col("embedding")),
      side, side, knownCount = n)
    val trainSecs = (System.nanoTime() - t0) / 1e9
    val fineNonZero = l2.map(_.count(_.exists(_ != 0.0f))).sum
    println(f"[hierscale] ivfTrainHier($side x $side): $trainSecs%.1f s, " +
      s"fine centroids non-zero: $fineNonZero/${side * side}")

    val qIds = emb
      .select(col("vec_id"), pmod(pmod(col("vec_id"), lit(1048576L)) * 2654435761L, lit(4294967296L)).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(nQ).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    val queries = emb.filter(col("vec_id").isInCollection(qIds))
    val tb = System.nanoTime()
    val brute = Ann.bruteForceTopK(
        emb.select(col("vec_id"), col("embedding")), queries, k)
      .select(col("query_id"), col("item_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"[hierscale] brute(sample x corpus): ${(System.nanoTime() - tb) / 1e9}%.1f s, " +
      s"edges=${brute.size}")

    // the FULL self-join through default dispatch (materialized before
    // sampling — a query_id filter would push below the join and measure
    // only the assignment pass)
    val t1 = System.nanoTime()
    val full = Ann.knnJoinIvf(emb, "vec_id", "embedding", k, knownCount = n)
      .localCheckpoint(true)
    val joinSecs = (System.nanoTime() - t1) / 1e9
    val got = full.filter(col("query_id").isInCollection(qIds))
      .select(col("query_id"), col("item_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = if (brute.isEmpty) 1.0 else brute.intersect(got).size.toDouble / brute.size
    println(f"[hierscale] knnJoinIvf FULL self-join (hier, default dispatch): " +
      f"$joinSecs%.1f s, recall@$k=$recall%.3f on ${qIds.size} sampled queries")
    spark.stop()
  }
}
