package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](n: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"[ivf] $n: ${(System.nanoTime()-t0)/1e9}%.3f s"); r }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 8)
    for (i <- 1 to 2) {
      val cents = time(s"train$i")(graft.operators.Ann.ivfTrain(spark, emb, 16, 5))
      time(s"search$i")(graft.operators.Ann.ivfSearch(emb, q, cents, 5, 4).count())
      time(s"truth$i")(graft.operators.Ann.ivfProbedTruth(emb, q, cents, 5, 4).count())
      time(s"bf$i")(graft.operators.Ann.bruteForceTopK(emb, q, 5).count())
      time(s"full$i")(graft.SparkEntry.queries("q_ann_ivf")(spark, sfDir).count())
    }
    spark.stop()
  }
}
