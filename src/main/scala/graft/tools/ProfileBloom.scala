package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.F
import graft.operators.TextAnalysis

/**
 * Measurement harness behind the contaminationScreenBloom plan-shape
 * rule (keep the gram pipeline inside the Generate, never an aliased
 * array column): CollapseProject inlines a projected wordNgrams alias
 * into every one of the lambda's per-gram token references, so the
 * "materialize the gram array, then filter/explode it" shapes (B, D)
 * re-tokenize per reference while the explode-direct Generate shape
 * (A) evaluates once. Measured at sf0.1 (warm): A 0.45s, B 5.7s,
 * C 0.12s (count() prunes the projection entirely), D 6.1s — the 13×
 * that made the first cut of q_contamination_bloom 6.7s against
 * q_contamination's 0.6s. Cited in SURVEY §5 and the operator scaladoc.
 */
object ProfileBloom {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (_ <- 1 to 2) {
      val corpus = docs.filter(col("doc_id") % 97 =!= 0)
      t("A: explode-direct gram count")(
        corpus.select(col("doc_id"), F.tokens(col("text")).as("tk"))
          .select(col("doc_id"), explode(TextAnalysis.wordNgrams(col("tk"), 5)).as("gram"))
          .count())
      t("B: grams array then size-filter count")(
        corpus.select(col("doc_id"), F.tokens(col("text")).as("tk"))
          .select(col("doc_id"), TextAnalysis.wordNgrams(col("tk"), 5).as("grams"))
          .filter(size(col("grams")) > 0)
          .count())
      t("C: grams array, size only (count() prunes it)")(
        corpus.select(col("doc_id"), F.tokens(col("text")).as("tk"))
          .select(col("doc_id"), TextAnalysis.wordNgrams(col("tk"), 5).as("grams"))
          .select(col("doc_id"), size(col("grams")).as("n"))
          .count())
      t("D: explode from grams-array column")(
        corpus.select(col("doc_id"), F.tokens(col("text")).as("tk"))
          .select(col("doc_id"), TextAnalysis.wordNgrams(col("tk"), 5).as("grams"))
          .select(col("doc_id"), explode(col("grams")).as("gram"))
          .count())
      t("operator: contaminationScreenBloom")(
        TextAnalysis.contaminationScreenBloom(
          corpus, docs.filter(col("doc_id") % 97 === 0), "doc_id", "text").count())
      t("operator: exact q_contamination")(
        graft.SparkEntry.queries("q_contamination")(spark, dir).count())
    }
    spark.stop()
  }
}
