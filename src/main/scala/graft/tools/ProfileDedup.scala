package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Ad-hoc stage profiler for the dedup pipeline (dev tool, not part of the driver contract). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    time("shingles only")(docs.select(explode(Dedup.shingles(col("text"), 3))).count())
    time("minhash sigs")(Dedup.minhashSigs(docs, "doc_id", "text", 64, 3).count())
    time("simhash sigs")(Dedup.simhashSigs(docs, "doc_id", "text", 3).count())
    val sigs = time("sigs cached") {
      val s = Dedup.minhashSigs(docs, "doc_id", "text", 64, 3).cache(); s.count(); s
    }
    val banded = sigs
      .select(col("id"), col("sig"), explode(graft.functions.F.lshBandKeys(col("sig"), 16, 4)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band"), col("bk.bh"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
    println(s"candidate rows (pre-dedup): ${time("cand count")(cand.count())}")
    println(s"distinct candidate pairs: ${time("dedup count")(cand.dropDuplicates("id_a", "id_b").count())}")
    time("full minhashPairs")(Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.3).count())

    // ngram jaccard stage breakdown
    graft.sql.GraftFunctions.register(spark)
    val withGrams = docs.select(col("doc_id").as("id"),
      call_function("graft_char_ngrams", lower(col("text")), lit(4)).as("grams"), col("lang"), col("source"))
    val ex = withGrams.select(col("id"), size(col("grams")).as("sz"), explode(col("grams")).as("gram"), col("lang"), col("source")).cache()
    println(s"exploded gram rows: ${time("ngram explode")(ex.count())}")
    val joined = ex.as("a").join(ex.as("b").hint("shuffle_hash"),
      col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
      col("a.gram") === col("b.gram") && col("a.id") < col("b.id"))
    println(s"join rows: ${time("ngram join count")(joined.count())}")
    val agg = joined.groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"), col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .agg(count(lit(1)).as("inter"))
    println(s"pairs: ${time("ngram join+agg")(agg.count())}")
    time("full ngramJaccardPairs")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", Seq("lang", "source")).count())
    spark.stop()
  }
}
