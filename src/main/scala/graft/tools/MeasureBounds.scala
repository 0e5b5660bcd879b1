package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Ann, Dedup}

/**
 * Scratch: measure the actual approximation errors of the
 * approximate operators (HLL, IVF recall, minhash-union Jaccard) at a
 * given sf, to pick the driver-gate accuracy bounds with evidence.
 */
object MeasureBounds {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.GraftFunctions.register(spark)

    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    println("== HLL relative error per group ==")
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("nd"),
        approx_count_distinct(col("l_partkey"), 0.02).as("hll"))
      .select(col("l_returnflag"), col("nd"), col("hll"),
        (abs(col("hll") - col("nd")).cast("double") / col("nd")).as("rel_err"))
      .orderBy(col("rel_err").desc)
      .show(10, false)

    println("== IVF per-query recall@5 ==")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 8)
    val ivf = Ann.ivfTopK(spark, emb, queries, k = 5, numCells = 16, probes = 4)
      .select(col("query_id"), col("item_id"))
    val bf = Ann.bruteForceTopK(emb, queries, k = 5)
      .select(col("query_id"), col("item_id"))
    ivf.join(bf, Seq("query_id", "item_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
      .join(queries.select(col("vec_id").as("query_id")), Seq("query_id"), "right")
      .select(col("query_id"), coalesce(col("hits"), lit(0)).as("hits"))
      .orderBy(col("hits"))
      .show(10, false)

    println("== minhash-union vs exact source Jaccard ==")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bySource = Dedup
      .minhashSigs(docs, "doc_id", "text", 64, 3)
      .join(docs.select(col("doc_id").as("id"), col("source")), "id")
      .groupBy(col("source"))
      .agg(call_function("graft_minhash_union", col("sig"), lit(64)).as("sig"))
    val est = bySource.as("a").join(bySource.as("b"), col("a.source") < col("b.source"))
      .select(
        col("a.source").as("source_a"), col("b.source").as("source_b"),
        (aggregate(zip_with(col("a.sig"), col("b.sig"), (x, y) => when(x === y, 1).otherwise(0)), lit(0), _ + _)
          .cast("double") / lit(64.0)).as("est_jaccard"))
    val sh = docs
      .select(col("source"), explode(Dedup.shingles(col("text"), 3)).as("shingle"))
      .distinct()
    val counts = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
      .agg(count(lit(1)).as("i"))
    val exact = counts.as("ca").join(counts.as("cb"), col("ca.source") < col("cb.source"))
      .join(inter,
        col("ca.source") === inter("source_a") && col("cb.source") === inter("source_b"), "left")
      .select(
        col("ca.source").as("sa"), col("cb.source").as("sb"),
        (coalesce(col("i"), lit(0L)).cast("double") /
          (col("ca.n") + col("cb.n") - coalesce(col("i"), lit(0L))).cast("double")).as("exact_jaccard"))
    est.join(exact, est("source_a") === exact("sa") && est("source_b") === exact("sb"))
      .select(col("source_a"), col("source_b"), col("est_jaccard"), col("exact_jaccard"),
        abs(col("est_jaccard") - col("exact_jaccard")).as("abs_err"))
      .orderBy(col("abs_err").desc)
      .show(10, false)

    spark.stop()
  }
}
