package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Isolate q_dedup_ngram_jaccard cold/warm behavior (dev tool). */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val w = spark.range(2000000).select(col("id"), (col("id") % 1000).as("k"), (col("id") % 7).as("v"))
    time("warmup join")(w.as("a").join(w.as("b"), col("a.k") === col("b.k") && col("a.id") < col("b.id")).count())
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("collapsed run 1")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", Seq("lang", "source")).count())
    time("collapsed run 2")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", Seq("lang", "source")).count())
    time("raw run 1")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", Seq("lang", "source"),
      collapseExact = false).count())
    time("raw run 2")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", Seq("lang", "source"),
      collapseExact = false).count())
    time("prefix run 1")(Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", Seq("lang", "source")).count())
    time("prefix run 2")(Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", Seq("lang", "source")).count())
    spark.stop()
  }
}
