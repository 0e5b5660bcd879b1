package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (SURVEY.md §2.10, beyond the reference's surface).
 *
 * Scale design: the query set is broadcast (queries << corpus); the
 * corpus is scanned once. Brute force is the exact baseline; IVF
 * restricts each query to `probes` coarse cells, shrinking the
 * candidate set by ~numCells/probes. The centroid table is bounded
 * metadata (numCells × dim floats): it is computed with exact-decimal
 * means (deterministic across partition orders), collected once, and
 * shipped inside a native expression — cell assignment is a narrow map,
 * never a crossJoin, so the only wide operations are the final
 * per-query top-k and the (tiny) mean aggregations.
 */
object Ann {

  /** Exact cosine top-k: every query vector against the whole corpus.
    * Per-candidate work is one fused codegen'd cosine (graft_cosine). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.sql.GraftFunctions.register(corpus.sparkSession)
    // deliberate physical-plan choice: per-query key cardinality is the
    // (bounded) query set, so the heap operator is strictly better than
    // the sort-based window — and it spills past the configured bound.
    graft.sql.GraftFunctions.installTopKStrategy(corpus.sparkSession)
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
   * Per-cell mean vectors, collected as the centroid table.
   *
   * Determinism across partition orders is what matters (the quantizer
   * must train identically on every run), not exactness: components
   * are fixed-point-scaled to LONG and summed — integer addition is
   * associative, so the sum is partition-order-independent, at ~2^-20
   * quantization (irrelevant to cluster geometry) and a fraction of
   * the Decimal-sum cost. One shuffle; the numCells × dim (cell, pos,
   * sum, n) rows are bounded metadata assembled on the driver.
   */
  private val MeanScale = 1L << 20

  private def centroidTable(assigned: DataFrame, numCells: Int, vecCol: String): Array[Array[Float]] = {
    val rows: Array[Row] = assigned
      .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg(
        sum((col("v").cast("double") * lit(MeanScale.toDouble)).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .collect()
    val dim = if (rows.isEmpty) 0 else rows.iterator.map(_.getInt(1)).max + 1
    // dense table in cell order; empty cells (possible at tiny SF) keep a zero vector
    val table = Array.fill(numCells)(Array.fill(dim)(0.0f))
    rows.foreach { r =>
      val mean = r.getLong(2).toDouble / MeanScale.toDouble / r.getLong(3).toDouble
      table(r.getInt(0))(r.getInt(1)) = mean.toFloat
    }
    table
  }

  private def centroidsLit(cents: Array[Array[Float]]) =
    typedlit[Seq[Seq[Float]]](cents.map(_.toSeq).toSeq)

  /**
   * IVF-lite: deterministic coarse quantizer (hash-bucket seed means +
   * Lloyd refinement under a fixed iteration budget), probe-limited
   * search.
   *
   * `lloydIters` is the training budget. Training runs on a BOUNDED
   * DETERMINISTIC SAMPLE (hash-filtered — partition-order-independent,
   * no RNG state), persisted for the rounds, so the FULL corpus is
   * scanned exactly once for the final assignment no matter the
   * budget — the production IVF shape (train on sample, assign all).
   * Each round is one narrow assignment pass over the sample plus a
   * numCells×dim exact-decimal mean (bounded metadata, deterministic
   * across partition orders); the loop short-circuits when centroids
   * stop moving. Recall@k vs brute force is asserted (and reported) in
   * OperatorSpec.
   */
  def ivfTopK(
      spark: SparkSession,
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      numCells: Int = 16,
      probes: Int = 4,
      lloydIters: Int = 5,
      trainSample: Long = 20000L
  ): DataFrame =
    ivfSearch(corpus, queries, ivfTrain(spark, corpus, numCells, lloydIters, trainSample), k, probes)

  /** Train the coarse quantizer (see [[ivfTopK]]) and return the
    * centroid table — bounded metadata (numCells × dim floats) the
    * caller can reuse across searches, exactly like a persisted index. */
  def ivfTrain(
      spark: SparkSession,
      corpus: DataFrame,
      numCells: Int = 16,
      lloydIters: Int = 5,
      trainSample: Long = 20000L
  ): Array[Array[Float]] = {
    graft.sql.GraftFunctions.register(spark)
    val base = corpus.select(col("vec_id").as("item_id"), col("embedding").as("item_vec"))

    // bounded training set: hash-filter to ~trainSample vectors
    val n = base.count()
    val train =
      if (n <= trainSample) base
      else {
        val permille = math.max(1L, 10000L * trainSample / n)
        base.filter(pmod(xxhash64(col("item_id"), lit(7)), lit(10000L)) < lit(permille))
      }
    train.persist()
    try {
      // seed centroids: means of hash buckets; Lloyd rounds to refine
      val seeded = train.withColumn("cell", pmod(xxhash64(col("item_id")), lit(numCells)).cast("int"))
      var cents = centroidTable(seeded, numCells, "item_vec")
      var iter = 0
      var converged = false
      while (iter < lloydIters && !converged) {
        val reassigned =
          train.withColumn("cell", call_function("graft_nearest_centroid", col("item_vec"), centroidsLit(cents)))
        val next = centroidTable(reassigned, numCells, "item_vec")
        converged = java.util.Arrays.deepEquals(
          cents.asInstanceOf[Array[AnyRef]], next.asInstanceOf[Array[AnyRef]])
        cents = next
        iter += 1
      }
      cents
    } finally train.unpersist()
  }

  /** Probe-limited search against a trained centroid table: one full
    * corpus assignment pass + per-query candidate top-k. */
  def ivfSearch(
      corpus: DataFrame,
      queries: DataFrame,
      cents: Array[Array[Float]],
      k: Int,
      probes: Int
  ): DataFrame = {
    graft.sql.GraftFunctions.register(corpus.sparkSession)
    graft.sql.GraftFunctions.installTopKStrategy(corpus.sparkSession)
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("item_id").asc)
    probedCandidates(corpus, queries, cents, probes)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("item_id"), col("cos"), col("rank"))
  }

  /**
   * Exact top-k over the SAME probed-cell candidate set, computed
   * through a deliberately different physical path (agg-side
   * array_sort/slice instead of the ranked-window / TopKPerKeyExec
   * plan). `ivfSearch` ≡ `ivfProbedTruth` row-for-row is the
   * mechanism-correctness property the driver gate hashes for
   * q_ann_ivf — it cross-checks the heap operator against a sort, on
   * every run, with no dependence on data-specific recall.
   */
  def ivfProbedTruth(
      corpus: DataFrame,
      queries: DataFrame,
      cents: Array[Array[Float]],
      k: Int,
      probes: Int
  ): DataFrame = {
    graft.sql.GraftFunctions.register(corpus.sparkSession)
    probedCandidates(corpus, queries, cents, probes)
      .groupBy(col("query_id"))
      .agg(slice(array_sort(collect_list(struct(negate(col("cos")), col("item_id"), col("cos")))), 1, k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "t")))
      .select(
        col("query_id"),
        col("t.item_id").as("item_id"),
        col("t.cos").as("cos"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Shared candidate generation: assign corpus cells, broadcast the
    * per-query probe list, score candidates with the fused cosine. */
  private def probedCandidates(
      corpus: DataFrame,
      queries: DataFrame,
      cents: Array[Array[Float]],
      probes: Int
  ): DataFrame = {
    val base = corpus.select(col("vec_id").as("item_id"), col("embedding").as("item_vec"))
    val assigned = base.withColumn("cell", call_function("graft_nearest_centroid", col("item_vec"), centroidsLit(cents)))
    val queryProbes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      .withColumn("cell", explode(call_function("graft_nearest_centroids", col("query_vec"), centroidsLit(cents), lit(probes))))
    assigned
      .join(broadcast(queryProbes), Seq("cell"))
      .filter(col("query_id") =!= col("item_id"))
      .withColumn("cos", call_function("graft_cosine", col("query_vec"), col("item_vec")))
  }
}
