package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.F

/**
 * BM25 ranked retrieval over the token postings table — the ranking
 * layer on top of [[InvertedIndex]] (reference ItemsInvertedIndex
 * resolves boolean phrase containment, yupana-schema/externallinks/
 * ItemsInvertedIndex.scala; training-data pipelines additionally need
 * scored retrieval for quality filtering and query-based curation).
 *
 * Scale design: the query set is tiny and broadcast; everything per-doc
 * is computed with ONE token explode + map-side-combined (doc, term)
 * counts, the document-frequency table is |vocab|-bounded, and the
 * final top-k per query runs through the rank-window pattern that
 * TopKPerKeyStrategy rewrites to a bounded heap (no per-query sort).
 * Corpus constants (N, total token length) are DERIVED from the
 * postings table — N = count of tokenized docs, L = Σ tf — and ride
 * along as a lazy 1-row broadcast instead of a blocking
 * `lens.agg(...).head()` pass over a second tokenize subtree.
 * Consequence: documents with zero tokens do not count toward N or
 * avgdl — they can never be retrieved, so defining the stats over the
 * retrievable corpus is the honest choice (mirrored in the oracle).
 * Single-tokenize at scale: build [[Retrieval.tokenPostings]] once per
 * corpus version, persist it, and query via [[Retrieval.bm25TopKFromPostings]]
 * — the consumers then share the stored postings instead of each
 * pruning its own tokenize subtree out of the inline plan.
 *
 * Cross-engine determinism (SURVEY.md §6): with k1 = 1.2, b = 0.75 the
 * BM25 term factor is exactly rational —
 *
 *   tf·(k1+1) / (tf + k1·(1 − b + b·len/avgdl))
 *     = (22·L·tf) / (10·L·tf + 3·L + 9·N·len),  avgdl = L/N
 *
 * so it is integer products and ONE IEEE division. The IDF
 * ln((N − df + ½)/(df + ½) + 1) is quantized to integer micro-nats
 * (floor(·1e6)) so a sub-ulp ln() difference between engines cannot
 * move the score, and each per-term contribution is quantized to an
 * exact integer (floor(·1e8 + ½) — floor is rounding-mode-neutral,
 * unlike a double→DECIMAL cast, which ties HALF_UP in Spark vs
 * HALF_EVEN in DuckDB and a dyadic term factor like j/512 CAN tie)
 * before an exact integer sum, making the total independent of both
 * engine and aggregation order.
 */
object Retrieval {

  /** Default benchmark query set (terms from the corpus vocabulary). */
  val defaultQueries: Seq[(String, Seq[String])] = Seq(
    "q_hash_join"   -> Seq("hash", "join"),
    "q_fast_scan"   -> Seq("scan", "filter", "fast"),
    "q_vector_data" -> Seq("vector", "data")
  )

  /**
   * Token postings (doc_id, term, tf, len) — the BM25 index table. One
   * tokenize + explode + map-side-combined aggregate over the corpus.
   * At scale this is built ONCE per corpus version and persisted (the
   * inverted-index discipline): every downstream consumer — tf lookup,
   * document frequencies, corpus stats — then reads the postings table
   * instead of re-tokenizing text. [[bm25TopKFromPostings]] consumes it
   * directly; the ad-hoc [[bm25TopK]] derives it inline (where Catalyst
   * column-pruning specializes each consumer's subtree — the inline
   * form re-tokenizes per consumer, which is exactly why the persisted
   * form exists).
   */
  def tokenPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), F.tokens(col(textCol)).as("tk"))
      // len rides along through the explode (constant per doc) so the
      // per-(doc, term) aggregate already carries it — no |docs| join later
      .select(col("doc_id"), size(col("tk")).cast("long").as("len"), explode(col("tk")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("len")).as("len"))

  /** Ad-hoc BM25 over raw text: derives [[tokenPostings]] inline. */
  def bm25TopK(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(String, Seq[String])] = defaultQueries,
      k: Int = 10
  ): DataFrame =
    bm25TopKFromPostings(spark, tokenPostings(docs, idCol, textCol), queries, k)

  /**
   * BM25 top-k against a (possibly persisted) postings table — see
   * [[tokenPostings]] for the schema and the build-once discipline.
   */
  def bm25TopKFromPostings(
      spark: SparkSession,
      tf: DataFrame,
      queries: Seq[(String, Seq[String])] = defaultQueries,
      k: Int = 10
  ): DataFrame = {
    graft.sql.GraftFunctions.register(spark)
    graft.sql.GraftFunctions.installTopKStrategy(spark)
    import spark.implicits._

    // corpus constants derived from the postings themselves — NOT a
    // separate tokenize pass: Σ tf over a doc's terms is its token
    // count, so N and L fall out of a per-doc re-aggregate. 1-row
    // broadcast, lazy (no head() blocking the driver). Consequence:
    // N counts tokenized docs only (a zero-token doc can never be
    // retrieved), mirrored in the oracle.
    val stats = tf
      .groupBy(col("doc_id")).agg(sum(col("tf")).as("len"))
      .agg(
        count(lit(1)).cast("double").as("n_docs"),
        coalesce(sum(col("len")), lit(0L)).cast("double").as("tot_len"))
    val queryTerms = queries
      .flatMap { case (qid, terms) => terms.distinct.map(t => (qid, t)) }
      .toDF("query_id", "term")
    // document frequencies only for the query terms: |vocab| is unbounded
    // on a real corpus, so never broadcast the full table
    val dfreq = tf
      .join(broadcast(queryTerms.select(col("term")).distinct()), "term")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"))

    // idf in integer micro-nats; ln argument is one division of exact ints
    val idfMicro = floor(
      log((lit(2.0) * col("n_docs") - lit(2.0) * col("df") + lit(1.0)) / (lit(2.0) * col("df") + lit(1.0)) + lit(1.0)) *
        lit(1e6)).cast("long")
    // rational BM25 term factor: integer products, one IEEE division
    val tfPart =
      (lit(22.0) * col("tot_len") * col("tf")) /
        (lit(10.0) * col("tot_len") * col("tf") + lit(3.0) * col("tot_len") +
          lit(9.0) * col("n_docs") * col("len"))

    val scored = broadcast(queryTerms)
      .join(tf, "term")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("contrib", idfMicro.cast("double") * tfPart)
      .groupBy(col("query_id"), col("doc_id"))
      .agg((sum(floor(col("contrib") * lit(1e8) + lit(0.5)).cast("decimal(38,0)")).cast("double") / lit(1e8))
        .as("score"))

    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
  }

  /**
   * TF-IDF dot-product top-k — the second retrieval leg for
   * [[hybridTopK]]. Score = Σ over shared terms of
   * tf(term, doc) · idf(term)², i.e. the dot product of the standard
   * tf·idf document vector with the query's idf vector (query tf = 1).
   * Cosine's norm is deliberately omitted: the fusion layer consumes
   * RANKS only (RRF), and an integer dot product is exactly computable
   * in both engines — idf is quantized to integer milli-nats
   * (floor(ln((N+1)/(df+1))·1e3)), every contribution is an integer
   * product, and the per-(query, doc) sum is an exact integer — no
   * float summation order anywhere, so Spark and DuckDB rank
   * bit-identically.
   *
   * Scale shape mirrors [[bm25TopKFromPostings]]: query terms
   * broadcast, document frequencies computed only for the query terms
   * (never the full vocab), corpus constants as a lazy 1-row
   * broadcast, top-k through the rank-window pattern the TopK strategy
   * rewrites to a bounded heap.
   */
  def tfidfTopKFromPostings(
      spark: SparkSession,
      tf: DataFrame,
      queries: Seq[(String, Seq[String])] = defaultQueries,
      k: Int = 10
  ): DataFrame = {
    graft.sql.GraftFunctions.register(spark)
    graft.sql.GraftFunctions.installTopKStrategy(spark)
    import spark.implicits._

    // N = tokenized docs (the bm25 stats' definition), as a lazy 1-row
    // broadcast — only the distinct-doc count, no per-doc carry-along
    val stats = tf
      .select(col("doc_id")).distinct()
      .agg(count(lit(1)).cast("double").as("n_docs"))
    val queryTerms = queries
      .flatMap { case (qid, terms) => terms.distinct.map(t => (qid, t)) }
      .toDF("query_id", "term")
    val dfreq = tf
      .join(broadcast(queryTerms.select(col("term")).distinct()), "term")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"))

    // idf in integer milli-nats: ln of ONE division of exact doubles,
    // then floor — granular enough to separate distinct df values,
    // small enough that tf · idf² stays far inside long range
    // (idf ≤ ~21e3 at N = 1e9 ⇒ contribution ≤ tf · 4.4e8)
    val idfMilli = floor(
      log((col("n_docs") + lit(1.0)) / (col("df").cast("double") + lit(1.0))) * lit(1e3))
      .cast("long")

    val scored = broadcast(queryTerms)
      .join(tf, "term")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("contrib", col("tf") * idfMilli * idfMilli)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("score"))

    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
  }

  /**
   * Hybrid retrieval: BM25 and TF-IDF-dot-product legs fused with
   * reciprocal-rank fusion (Cormack et al. 2009) —
   * rrf(d) = Σ_legs 1/(rrfK + rank_leg(d)), the standard way a
   * curation pipeline combines a lexical and a second scorer without
   * calibrating score scales (ranks only, so the legs' score units
   * never meet). Documents surfaced by a single leg keep that leg's
   * contribution alone; both per-leg ranks ride along (null when the
   * leg missed the doc) so the caller can audit the fusion.
   *
   * Determinism: each leg's ranks are exact-integer-ranked ([[
   * bm25TopKFromPostings]] quantized contributions, [[
   * tfidfTopKFromPostings]] integer dot products); the rrf score is
   * two exactly-rounded IEEE divisions added in a FIXED order (bm25
   * leg + tfidf leg — the oracle mirrors it), so the fused ordering is
   * engine-independent, with doc_id as the final tiebreak.
   *
   * Scale: each leg ends at kPerLeg rows per query, so the fusion —
   * one full-outer join on (query_id, doc_id) and a rank window —
   * touches ≤ 2·kPerLeg·|queries| rows regardless of corpus size; the
   * legs dominate, and they are the audited broadcast-join shapes.
   */
  def hybridTopK(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(String, Seq[String])] = defaultQueries,
      kPerLeg: Int = 10,
      k: Int = 5,
      rrfK: Int = 60
  ): DataFrame = {
    val postings = tokenPostings(docs, idCol, textCol)
    val lexical = bm25TopKFromPostings(spark, postings, queries, kPerLeg)
      .select(col("query_id"), col("doc_id"), col("rank").as("bm25_rank"))
    val dense = tfidfTopKFromPostings(spark, postings, queries, kPerLeg)
      .select(col("query_id"), col("doc_id"), col("rank").as("tfidf_rank"))
    val fused = lexical
      .join(dense, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("bm25_rank").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("tfidf_rank").cast("double")), lit(0.0)))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rrf").desc, col("doc_id").asc)
    fused
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("bm25_rank"), col("tfidf_rank"),
        col("rrf"), col("rank"))
  }
}
