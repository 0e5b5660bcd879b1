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

  test("tfidf leg scores are the exact integer dot products of milli-nat idf weights") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "hash join hash"), // tf(hash)=2, tf(join)=1
      (2L, "hash scan"),
      (3L, "merge sort")
    ).toDF("doc_id", "text")
    val out = Retrieval
      .tfidfTopKFromPostings(
        spark, Retrieval.tokenPostings(corpus, "doc_id", "text"),
        Seq("q" -> Seq("hash", "join")), k = 3)
      .orderBy(col("rank")).collect()
    // N=3 tokenized docs; df(hash)=2, df(join)=1
    val idfHash = math.floor(math.log(4.0 / 3.0) * 1e3).toLong
    val idfJoin = math.floor(math.log(4.0 / 2.0) * 1e3).toLong
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq(
      1L -> (2 * idfHash * idfHash + 1 * idfJoin * idfJoin),
      2L -> (1 * idfHash * idfHash)))
  }

  test("hybrid RRF fuses both legs' ranks and keeps single-leg docs with one contribution") {
    import spark.implicits._
    // doc 1: high tf of a rare term -> top of tfidf; short doc -> also high bm25
    // doc 4: only matches 'scan' which doc 5 saturates
    val corpus = Seq(
      (1L, "vector vector vector data"),
      (2L, "vector data data batch merge"),
      (3L, "data batch merge sort window filter group"),
      (4L, "scan batch"),
      (5L, "scan scan scan scan scan scan")
    ).toDF("doc_id", "text")
    val qs = Seq("qv" -> Seq("vector", "data"))
    val fused = Retrieval.hybridTopK(spark, corpus, "doc_id", "text", qs, kPerLeg = 3, k = 5)
    val rows = fused.orderBy(col("rank")).collect()
    val leg1 = Retrieval
      .bm25TopKFromPostings(spark, Retrieval.tokenPostings(corpus, "doc_id", "text"), qs, 3)
      .collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    val leg2 = Retrieval
      .tfidfTopKFromPostings(spark, Retrieval.tokenPostings(corpus, "doc_id", "text"), qs, 3)
      .collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    rows.foreach { r =>
      val (doc, rrf) = (r.getLong(1), r.getDouble(4))
      val expected =
        leg1.get(doc).map(rk => 1.0 / (60.0 + rk)).getOrElse(0.0) +
          leg2.get(doc).map(rk => 1.0 / (60.0 + rk)).getOrElse(0.0)
      assert(rrf == expected, s"doc $doc")
      assert(!r.isNullAt(2) || !r.isNullAt(3)) // at least one leg surfaced it
    }
    // rrf is non-increasing in rank
    val rrfs = rows.map(_.getDouble(4)).toSeq
    assert(rrfs.zip(rrfs.drop(1)).forall { case (a, b) => a >= b })
  }

  test("chunk->pack composition covers every chunk token exactly once, budget-bounded") {
    import spark.implicits._
    val corpus = Seq(
      (1L, ("tok " * 100).trim), // 100 tokens -> chunks of 64/48: 3 chunks
      (2L, "a b c"),             // sub-chunk doc -> one 3-token chunk
      (3L, "")                   // zero tokens -> nothing to pack
    ).toDF("doc_id", "text")
    val chunks = graft.operators.TextAnalysis
      .chunkDocs(corpus, "doc_id", "text", chunk = 64, stride = 48)
      .filter(col("chunk_idx").isNotNull)
      .select(concat_ws(":", col("doc_id"), col("chunk_idx")).as("chunk_id"), col("n_tokens"))
    val packed = Packing.packShards(chunks, "chunk_id", "n_tokens", budget = 128L,
      orderCol = md5(col("chunk_id").cast("binary")))
    val rows = packed.collect()
    // every chunk packed exactly once; zero-token doc contributes none
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("1:0", "1:1", "1:2", "2:0"))
    // total cum = total chunk tokens (starts 0/48/96 -> 64 + 52 + 4 tail, + 3)
    assert(rows.map(_.getAs[Long]("cum")).max == 64L + 52L + 4L + 3L)
    // every chunk STARTS inside its shard's budget window
    assert(rows.forall { r =>
      val off = r.getAs[Long]("shard_offset"); off >= 0L && off < 128L
    })
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
