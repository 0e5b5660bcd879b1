package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Two-level IVF cell-occupancy histogram (SURVEY §5): the evidence
 * gate for whether a THIRD quantization level (recursive
 * re-quantization of oversized cells) is ever needed. Trains the
 * two-level quantizer exactly as `embeddingPairsIvfHier` does on a
 * multiplied corpus — both the benign perturbed replicas and a
 * deliberately CLUSTERED corpus (all replicas collapsed near a few
 * directions, the adversarial case for cell balance) — assigns every
 * vector to its single nearest cell, and prints the occupancy
 * distribution. The within-cell pair stage does |cell|² work, so the
 * number that matters is the MAX cell vs the ~2048-target mean.
 */
object CellHistogram {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

    def corpusPerturbed = (0 until mult).map { i =>
      emb0.select(
        (col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
        expr(s"transform(embedding, x -> CAST(x + ${0.003 * (i + 1)} AS FLOAT))").as("embedding"))
    }.reduce(_ unionByName _)

    // adversarial: collapse the corpus toward 4 directions (replica r
    // keeps direction r%4 plus noise) — most mass lands in few regions,
    // the worst realistic shape for quantizer balance
    def corpusClustered = (0 until mult).map { i =>
      val d = i % 4
      emb0.select(
        (col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
        expr(s"transform(embedding, (x, j) -> CAST(x * 0.05 + IF(j % 4 = $d, 10.0, 0.0) AS FLOAT))")
          .as("embedding"))
    }.reduce(_ unionByName _)

    for ((name, corpus) <- Seq("perturbed" -> corpusPerturbed, "clustered" -> corpusClustered)) {
      val vecs = corpus.cache()
      val n = vecs.count()
      // the embeddingPairsIvfHier sizing at this corpus: cells = n/512
      // (the ScaleStress growth-probe convention keeps cell count
      // corpus-proportional at local scale), split √×√ two-level
      val wanted = math.max(16L, n / 512L)
      val side = math.ceil(math.sqrt(wanted.toDouble)).toInt
      val (l1, l2) = graft.operators.Ann.ivfTrainHier(
        spark, vecs.select(xxhash64(col("vec_id")).as("vec_id"), col("embedding")),
        side, side)
      val occ = vecs
        .select(element_at(call_function("graft_nearest_cells_hier",
          col("embedding"), graft.operators.Ann.centroidsLit(l1),
          graft.operators.Ann.centroidsLit3(l2), lit(1), lit(1)), 1).as("cell"))
        .groupBy(col("cell")).agg(count(lit(1)).as("sz"))
        .cache()
      val stats = occ.agg(
        count(lit(1)).as("non_empty_cells"),
        max(col("sz")).as("max"),
        expr("percentile(sz, 0.99)").as("p99"),
        expr("percentile(sz, 0.5)").as("p50"),
        avg(col("sz")).as("mean")).head()
      val target = n.toDouble / (side.toLong * side)
      println(f"[cells] $name: n=$n cells=${side}x$side (${side * side} total, " +
        f"${stats.getLong(0)} non-empty) mean=${stats.getDouble(4)}%.0f " +
        f"p50=${stats.getDouble(3)}%.0f p99=${stats.getDouble(2)}%.0f max=${stats.getLong(1)} " +
        f"target=${target}%.0f maxOverTarget=${stats.getLong(1) / math.max(target, 1.0)}%.1fx")
      occ.unpersist(); vecs.unpersist()
    }
    spark.stop()
  }
}
