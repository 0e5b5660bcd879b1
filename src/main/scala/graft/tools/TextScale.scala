package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: replicate ONLY the documents table to a ≥2M-doc corpus for
  * text-index lifecycle measurement (the VecScale discipline, §text).
  * Per base doc and replica `rep`:
  *  - rep 0 keeps the original text;
  *  - rep % 10 == 1 appends one token — a NEAR-DUP of its base (high
  *    shingle-Jaccard), so ~10% of the corpus forms realistic near-dup
  *    families the banding has to absorb;
  *  - every other rep inserts a per-(doc, rep) token between every
  *    word — every shingle changes, so the doc is DISTINCT and pair
  *    counts stay linear in the corpus rather than replica-quadratic.
  * Ids offset by rep·10^9 (the VecScale id scheme). Args:
  * <mult> <outDir> [srcDir]. */
object TextScale {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(400)
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_text2m"
    val srcDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val reps = spark.range(mult).select(col("id").cast("int").as("rep"))
    val text = when(col("rep") === 0, col("text"))
      .when(pmod(col("rep"), lit(10)) === 1,
        concat(col("text"), lit(" nd"), col("rep").cast("string")))
      .otherwise(regexp_replace(col("text"), lit(" "),
        concat(lit(" t"),
          pmod(xxhash64(col("doc_id"), col("rep")), lit(100000L)).cast("string"), lit(" "))))
    docs.crossJoin(reps)
      .select(
        (col("doc_id") + col("rep").cast("long") * 1000000000L).as("doc_id"),
        text.as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    println(s"[textscale] wrote ${mult}x documents (${docs.count() * mult} rows) to $outDir")
    spark.stop()
  }
}
