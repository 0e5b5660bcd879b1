package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level attribution for the gate-scale kNN queries: partition
  * counts and per-phase timings of the brute self-join, so a bench
  * delta can be split into scan / join-compute / rank / graph work. */
object KnnBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.GraftFunctions.register(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[knn] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"[knn] corpus rows=${emb.count()} scanPartitions=${emb.rdd.getNumPartitions}")
    val items = emb.select(col("vec_id").as("item_id"), col("embedding").as("item_vec"))
    val queries = emb.select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val joined = items.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("item_id"))
      .withColumn("cos", call_function("graft_cosine", col("query_vec"), col("item_vec")))
      .filter(col("cos").isNotNull)
    println(s"[knn] joinPartitions=${joined.rdd.getNumPartitions}")
    // deliberately UNSPREAD (the pre-fix single-partition shape): kept
    // as the pathology demonstration Ann.spread() exists to prevent —
    // compare against "full knnJoin", which runs the spread plan
    time("cosine-only count (unspread 1-partition shape)")(joined.count())
    time("full knnJoin")(graft.operators.Ann.knnJoin(emb, "vec_id", "embedding", k = 3).count())
    time("full mutualKnnClusters")(
      graft.operators.Ann.mutualKnnClusters(emb, "vec_id", "embedding", k = 3).count())
    spark.stop()
  }
}
