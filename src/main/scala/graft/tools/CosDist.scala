package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.F

object CosDist {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
      val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"))
      val cos = a.crossJoin(b).filter(col("ia") < col("ib"))
        .withColumn("cos", F.cosine(col("va"), col("vb")))
      val top = cos.orderBy(col("cos").desc).limit(25).select("cos").collect().map(_.getDouble(0))
      println(s"[cos] $sf top25: " + top.map(c => f"$c%.3f").mkString(" "))
    }
    spark.stop()
  }
}
