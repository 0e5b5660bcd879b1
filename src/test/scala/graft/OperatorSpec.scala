package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, Multimodal}

class OperatorSpec extends SparkSpecBase {
  import spark.implicits._

  test("IVF top-k recalls most of the brute-force neighbors") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 8)
    val brute = Ann
      .bruteForceTopK(emb, queries, 5)
      .select("query_id", "item_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    val ivf = Ann
      .ivfTopK(spark, emb, queries, 5, numCells = 16, probes = 8)
      .select("query_id", "item_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }

  test("IVF output is deterministic across runs (exact-decimal centroids)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 4)
    def run() = Ann.ivfTopK(spark, emb, q, 3).select("query_id", "item_id", "rank")
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(run() == run())
  }

  test("multimodal feature extraction: checksum matches plain-Scala reference") {
    val media = Multimodal.asMediaTable(spark.read.parquet(s"$sfDir/documents.parquet"))
    val feats = Multimodal.extractFeatures(spark, media, batchSize = 64)
    val one = feats.filter(col("doc_id") === 0).collect().head
    val text = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") === 0).select("text").as[String].head()
    val bytes = text.getBytes("UTF-8")
    val expected = bytes.foldLeft(0L)((cs, b) => (cs * 131L + (b & 0xffL)) % 2147483647L)
    assert(one.byte_len == bytes.length.toLong)
    assert(one.frame_count == bytes.length / 256L + 1L)
    assert(one.checksum == expected)
    assert(one.fmt == "img") // doc_id 0 % 3 == 0
  }

  test("multimodal batching covers every row exactly once") {
    val media = Multimodal.asMediaTable(spark.read.parquet(s"$sfDir/documents.parquet"))
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(Multimodal.extractFeatures(spark, media, batchSize = 7).count() == n)
  }
}
