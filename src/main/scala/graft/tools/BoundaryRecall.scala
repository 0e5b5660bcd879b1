package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev tool: IVF-pairs recall vs brute force at a >2^14 corpus — the
  * dispatch-boundary evidence RecallCheck can't produce in reasonable
  * time (its hand-rolled crossJoin brute lacks Ann.spread, so it runs
  * on a handful of cores; this uses the library's own spread brute
  * via bruteBound = Long.MaxValue). */
object BoundaryRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1.0")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    println(s"[boundary] vectors=${emb.count()}")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[boundary] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val brute = t("brute")(
      Dedup.embeddingPairs(emb, "vec_id", "embedding", threshold = 0.5,
          bruteBound = Long.MaxValue)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet)
    for (probes <- Seq(2, 3, 4)) {
      val ivf = t(s"ivf(probes=$probes)")(
        Dedup.embeddingPairsIvf(emb, "vec_id", "embedding", threshold = 0.5, probes = probes)
          .select("id_a", "id_b").as[(Long, Long)].collect().toSet)
      val recall = if (brute.isEmpty) 1.0 else (brute & ivf).size.toDouble / brute.size
      println(f"[boundary] probes=$probes ivf=${ivf.size} brute=${brute.size} " +
        s"missed=${(brute -- ivf).size} falsePos=${(ivf -- brute).size} " +
        f"recall=$recall%.3f")
    }
    spark.stop()
  }
}
