package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Stop-gram stress (dev tool): a corpus where every doc shares a
  * boilerplate header — the heavy-tailed shape the PPJoin route
  * exists for. Dense's hottest (group, gram) posting list is
  * corpus-sized (Σgf² ~ n²); the rarity-ordered prefixes exclude the
  * header grams, so the PPJoin candidate join stays near-linear.
  * Prints the dispatcher's routing and head-to-head wall times. */
object NgramHotStress {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(30000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // every doc: one shared 60-char boilerplate header + a unique tail
    // (deterministic pseudo-words) — hottest gram frequency = nDocs
    val docs = spark.range(nDocs).select(
      col("id").as("doc_id"),
      concat(
        lit("breaking news network all rights reserved navigation menu "),
        concat_ws(" ", (0 until 12).map(k =>
          concat(lit("w"), pmod(xxhash64(col("id"), lit(k)), lit(99991)).cast("string"))): _*)
      ).as("text"),
      lit("en").as("lang"), lit("s0").as("source"))
      .localCheckpoint(true)
    println(s"docs=$nDocs")
    val ex = graft.operators.Dedup.gramPostings(docs, "doc_id", "text", Seq("lang", "source"), 4)
    val st = ex.groupBy("gram").agg(count(lit(1)).as("gf"))
      .agg(sum(col("gf")), sum(col("gf") * col("gf")), max(col("gf"))).head()
    println(s"postings=${st.getLong(0)} denseRows=${st.getLong(1)} maxgf=${st.getLong(2)}")
    time("dispatch 1")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", Seq("lang", "source")).count())
    time("dispatch 2")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", Seq("lang", "source")).count())
    time("prefix 1")(Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", Seq("lang", "source")).count())
    time("prefix 2")(Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", Seq("lang", "source")).count())
    // the dense route on this shape is the melt case — run it LAST and
    // only at small n so the tool stays usable
    if (nDocs <= 20000)
      time("dense 1")(Dedup.ngramJaccardPairsDense(docs, "doc_id", "text", Seq("lang", "source")).count())
    spark.stop()
  }
}
