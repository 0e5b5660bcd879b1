package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.F
import graft.operators.Dedup

/** One-off: LSH-pair exactness vs Spark-computed brute force at a
  * larger SF than the driver's gate (dev tool — the DuckDB oracle is
  * O(n²) and intractable at sf0.1, Spark's parallel brute force isn't). */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val lsh = Dedup.embeddingPairs(emb, "vec_id", "embedding", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val brute = a.crossJoin(b).filter(col("ia") < col("ib"))
      .withColumn("cos", F.cosine(col("va"), col("vb")))
      .filter(col("cos") >= 0.5).select("ia", "ib").as[(Long, Long)].collect().toSet
    println(s"[recall] embed: lsh=${lsh.size} brute=${brute.size} " +
      s"missed=${(brute -- lsh).size} falsePos=${(lsh -- brute).size}")

    // the scale path for low thresholds: IVF cell decomposition —
    // approximate at cell boundaries, so its recall is the number the
    // dispatch bound trades on. falsePos must always be 0 (exact verify).
    for (probes <- Seq(2, 3, 4)) {
      val ivf = Dedup.embeddingPairsIvf(emb, "vec_id", "embedding", threshold = 0.5, probes = probes)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val recall = if (brute.isEmpty) 1.0 else (brute & ivf).size.toDouble / brute.size
      println(f"[recall] embed-ivf(probes=$probes): ivf=${ivf.size} brute=${brute.size} " +
        s"missed=${(brute -- ivf).size} falsePos=${(ivf -- brute).size} " +
        f"recall=$recall%.3f")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val mh = Dedup.minhashJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
    val bruteJ = sh.as("x").crossJoin(sh.as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .withColumn("jac", F.jaccard(col("x.sh"), col("y.sh")))
      .filter(col("jac") >= 0.5)
      .select(col("x.doc_id"), col("y.doc_id")).as[(Long, Long)].collect().toSet
    println(s"[recall] minhash: lsh=${mh.size} brute=${bruteJ.size} " +
      s"missed=${(bruteJ -- mh).size} falsePos=${(mh -- bruteJ).size}")
    spark.stop()
  }
}
