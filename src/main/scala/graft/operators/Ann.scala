package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.F

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (SURVEY.md §2.10, beyond the reference's surface).
 *
 * Scale design: the query set is broadcast (queries << corpus); the
 * corpus is scanned once. Brute force is the exact baseline; IVF
 * restricts each query to `probes` coarse cells so the per-query
 * candidate set shrinks by ~numCells/probes, which is what makes top-k
 * tractable when the corpus is 100 TB: cell assignment is a narrow
 * per-row computation, and the only wide operation is the final
 * per-query top-k (a partial top-k under AQE on (query) keys).
 */
object Ann {

  /** Exact cosine top-k: every query vector against the whole corpus.
    * Norms are precomputed per side so the per-candidate work is one dot
    * product (same IEEE result as inline cosine: identical op order). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.sql.GraftFunctions.register(corpus.sparkSession)
    val joined = corpus
      .select(col("vec_id").as("item_id"), col("embedding").as("item_vec"))
      .crossJoin(broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))))
      .filter(col("query_id") =!= col("item_id"))
      .withColumn("cos", call_function("graft_cosine", col("query_vec"), col("item_vec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("item_id").asc)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("item_id"), col("cos"), col("rank"))
  }

  /**
   * IVF-lite: deterministic coarse quantizer (centroids = mean of
   * hash-bucketed vectors, one Lloyd refinement), probe-limited search.
   * Centroid table is tiny (numCells rows) and broadcast everywhere.
   */
  def ivfTopK(
      spark: SparkSession,
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      numCells: Int = 16,
      probes: Int = 4
  ): DataFrame = {
    import spark.implicits._

    val base = corpus.select(col("vec_id").as("item_id"), col("embedding").as("item_vec"))

    // Deterministic seed centroids: mean vector of each hash bucket.
    def meanVec(df: DataFrame, keyCol: String, vecCol: String): DataFrame =
      df.select(col(keyCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy(col(keyCol), col("pos"))
        .agg(avg(col("v")).as("mv"))
        .groupBy(col(keyCol))
        .agg(array_sort(collect_list(struct(col("pos"), col("mv")))).as("pairs"))
        .select(col(keyCol), transform(col("pairs"), p => p.getField("mv").cast("float")).as("centroid"))

    val seeded = base.withColumn("cell", pmod(xxhash64(col("item_id")), lit(numCells)).cast("int"))
    var centroids = meanVec(seeded, "cell", "item_vec")

    // One Lloyd iteration: re-assign to nearest seed centroid, re-average.
    val assignW = Window.partitionBy(col("item_id")).orderBy(col("d2").asc, col("cell").asc)
    val reassigned = base
      .crossJoin(broadcast(centroids))
      .withColumn(
        "d2",
        aggregate(zip_with(col("item_vec"), col("centroid"), (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)
      )
      .withColumn("rn", row_number().over(assignW))
      .filter(col("rn") === 1)
      .select(col("item_id"), col("item_vec"), col("cell"))
    centroids = meanVec(reassigned, "cell", "item_vec")

    // Final cell assignment for corpus and probe list for queries.
    val assigned = base
      .crossJoin(broadcast(centroids))
      .withColumn(
        "d2",
        aggregate(zip_with(col("item_vec"), col("centroid"), (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)
      )
      .withColumn("rn", row_number().over(assignW))
      .filter(col("rn") === 1)
      .select(col("item_id"), col("item_vec"), col("cell"))

    val probeW = Window.partitionBy(col("query_id")).orderBy(col("d2").asc, col("cell").asc)
    val queryProbes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      .crossJoin(broadcast(centroids))
      .withColumn(
        "d2",
        aggregate(zip_with(col("query_vec"), col("centroid"), (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)
      )
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= probes)
      .select(col("query_id"), col("query_vec"), col("cell"))

    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("item_id").asc)
    assigned
      .join(broadcast(queryProbes), Seq("cell"))
      .filter(col("query_id") =!= col("item_id"))
      .withColumn("cos", F.cosine(col("query_vec"), col("item_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("item_id"), col("cos"), col("rank"))
  }
}
