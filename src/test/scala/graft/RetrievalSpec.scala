package graft

import org.apache.spark.sql.functions._
import graft.operators.{Packing, Retrieval}

/** BM25 retrieval + shard packing (round-3 operators). */
class RetrievalSpec extends SparkSpecBase {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("BM25 ranks a doc saturated with the query term above one that mentions it once") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "hash hash hash hash hash join"),
      (2L, "hash table scan filter merge sort window batch"),
      (3L, "scan scan scan scan scan scan scan scan scan scan")
    ).toDF("doc_id", "text")
    val out = Retrieval
      .bm25TopK(spark, corpus, "doc_id", "text", Seq("q" -> Seq("hash")), k = 3)
      .orderBy(col("rank"))
      .collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L)) // doc 3 has no 'hash' at all
    assert(out(0).getDouble(2) > out(1).getDouble(2))
  }

  test("BM25 scores every query, fills k slots, and is deterministic across runs") {
    val a = Retrieval.bm25TopK(spark, docs, "doc_id", "text", k = 10).collect()
    val b = Retrieval.bm25TopK(spark, docs, "doc_id", "text", k = 10).collect()
    assert(a.toSeq == b.toSeq)
    val perQuery = a.groupBy(_.getString(0)).map { case (_, rs) => rs.length }
    assert(perQuery.forall(_ == 10))
    // scores are positive and ranks are dense 1..k per query
    assert(a.forall(_.getDouble(2) > 0.0))
    a.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to 10).toSeq)
    }
  }

  test("BM25 over a persisted postings table equals the ad-hoc form row for row") {
    // the build-once index discipline: tokenPostings persisted to
    // parquet, then ranked from storage — no re-tokenize, same result
    val path = "/tmp/graft_bm25_postings_" + System.nanoTime()
    Retrieval.tokenPostings(docs, "doc_id", "text").write.parquet(path)
    val fromIndex = Retrieval.bm25TopKFromPostings(spark, spark.read.parquet(path))
      .orderBy("query_id", "rank").collect().toSeq
    val adHoc = Retrieval.bm25TopK(spark, docs, "doc_id", "text")
      .orderBy("query_id", "rank").collect().toSeq
    assert(fromIndex == adHoc)
  }

  test("packShards matches the single-partition global window formulation exactly") {
    import org.apache.spark.sql.expressions.Window
    val d = docs.select(col("doc_id"), size(graft.functions.F.tokens(col("text"))).cast("long").as("w"))
    val packed = Packing
      .packShards(d, "doc_id", "w", budget = 256L, orderCol = md5(col("doc_id").cast("string").cast("binary")))
      .select("doc_id", "cum", "shard_id")
    val naive = d
      .withColumn("ok", md5(col("doc_id").cast("string").cast("binary")))
      .withColumn("cum",
        sum(col("w")).over(Window.orderBy(col("ok"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("shard_id", expr("(cum - w) div 256L"))
      .select("doc_id", "cum", "shard_id")
    assert(packed.exceptAll(naive).isEmpty && naive.exceptAll(packed).isEmpty)
  }

  test("packShards shard sizes respect the budget for docs smaller than it") {
    val d = docs.select(col("doc_id"), size(graft.functions.F.tokens(col("text"))).cast("long").as("w"))
    // numeric pack order: bucketize via a zero-padded prefix (monotone for non-negative longs)
    val packed = Packing.packShards(d, "doc_id", "w", budget = 512L,
      orderCol = format_string("%020d", col("doc_id")),
      bucketOf = c => substring(c, 1, 18))
    // every doc starts inside its shard's budget window
    assert(packed.filter(col("shard_offset") >= 512L || col("shard_offset") < 0L).isEmpty)
    // cum is strictly increasing in pack order => shard ids are monotone
    val shards = packed.orderBy(col("cum")).select("shard_id").collect().map(_.getLong(0))
    assert(shards.sameElements(shards.sorted))
  }
}
