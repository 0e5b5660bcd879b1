package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: replicate ONLY the embeddings table with deterministic
  * PSEUDO-RANDOM per-component perturbations (not ScaleData's
  * +0.003·replica constant shift, which at high multipliers adds the
  * same constant-direction component to every high-replica vector and
  * aligns them ACROSS bases — at ×70 the t=0.5 pair graph degenerates
  * to ~all-pairs, 165M found edges, and every cosine operator's cost
  * becomes output-sized rather than index-sized). Each replica keeps
  * its base's neighborhood structure (±1% noise) so near-dup pair
  * counts grow linearly with the corpus, which is the realistic shape
  * for measuring the IVF/two-level quantizer's own cost past its
  * dispatch flips. Other tables are copied as-is for TimeQuery
  * compatibility. Args: <mult> <outDir> [srcDir]. */
object VecScale {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(70)
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_vecscale"
    val srcDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val reps = spark.range(mult).select(col("id").cast("int").as("rep"))
    val out = emb.crossJoin(reps)
      .select(
        (col("vec_id") + col("rep").cast("long") * 1000000000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(col("rep") === 0, x).otherwise(
            (x + (pmod(xxhash64(col("vec_id"), col("rep"), i), lit(2001L)) - lit(1000L))
              .cast("float") / lit(100000.0f)).cast("float"))).as("embedding"),
        col("label"))
    out.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents"))
      spark.read.parquet(s"$srcDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    println(s"[vecscale] wrote ${mult}x embeddings (${emb.count() * mult} rows) to $outDir")
    spark.stop()
  }
}
