package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.F

/**
 * Corpus-level statistical operators over the token stream
 * (SURVEY.md §2.11, beyond the reference's surface): collocation
 * mining and a corpus-trained language-model quality filter — the
 * n-gram statistics layer of a training-data pipeline.
 *
 * Cross-engine determinism: scores stay in (+, ×, /) over exact
 * integers — IEEE-correctly-rounded on every engine — except the
 * logarithms of the LM surprisal, which ride the BM25 discipline:
 * ln is quantized to an exact BIGINT (floor(ln·10^6)) the moment it
 * is computed, all aggregation happens on exact integers, and the
 * single final division is IEEE-deterministic.
 */
object CorpusStats {

  /**
   * Collocations: adjacent token pairs ranked by lift — the log-free
   * monotone transform of PMI,
   *
   *   lift(x,y) = P(x,y)/(P(x)·P(y)) = c_xy · n / (c_x · c_y)
   *
   * (PMI = ln lift; ln is monotone, so ranking by lift IS ranking by
   * PMI while staying in IEEE mul/div — deterministic across engines,
   * where ln would not be). `minCount` drops hapax noise, the classic
   * collocation-mining guard.
   *
   * Denominator convention: the joint probability uses the TOKEN total
   * n, not the bigram total (n minus one per document, the textbook
   * P(x,y) normalizer). The two differ by a corpus-wide constant
   * factor, so every ranking and ratio between pairs is identical;
   * only the absolute lift values are inflated by ~n/(n - n_docs). The
   * oracle mirrors the same convention. If absolute lift is ever
   * surfaced as a calibrated statistic, derive the bigram total from
   * this same pairCounts aggregate (Σ of non-null-w2 counts) — no
   * extra scan needed.
   *
   * Scale shape: ONE tokenize pass. Every token position becomes a
   * (w1, w2) row — w2 NULL for the last token of a document — and the
   * per-(w1, w2) count aggregate is the single corpus-wide shuffle.
   * Unigram counts DERIVE from that table (every occurrence appears
   * exactly once as w1, so c_w = Σ_w2 c_(w, w2)): an aggregate over
   * the aggregate, and because both consumers hang off the same
   * (w1, w2) exchange, ReuseExchange computes the scan + tokenize
   * once — where separate bigram/unigram aggregates would shuffle on
   * different keys and re-scan. The unigram table is vocab-sized, NOT
   * assumed broadcastable — pairs join it by word key. The total-token
   * count rides as a 1-row broadcast. Final top-k is a global
   * TakeOrdered, never a full sort.
   */
  def collocations(
      df: DataFrame,
      textCol: String,
      minCount: Long = 5L,
      topK: Int = 20
  ): DataFrame = {
    graft.sql.GraftFunctions.register(df.sparkSession)
    val pairCounts = df
      .select(F.tokens(col(textCol)).as("tk"))
      .select(posexplode(col("tk")).as(Seq("i", "w1")), col("tk"))
      .select(col("w1"),
        when(col("i") < size(col("tk")) - 1, element_at(col("tk"), col("i") + 2)).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
    val pairs = pairCounts
      .filter(col("w2").isNotNull && col("c_xy") >= minCount)
    val uni = pairCounts
      .groupBy(col("w1")).agg(sum(col("c_xy")).as("c_w"))
      .select(col("w1").as("w"), col("c_w"))
    val total = uni.agg(coalesce(sum(col("c_w")), lit(0L)).as("n_tokens"))
    pairs
      .join(uni.select(col("w").as("w1"), col("c_w").as("c_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("c_w").as("c_y")), "w2")
      .crossJoin(broadcast(total))
      // doubles BEFORE multiplying: the int64 products overflow at
      // corpus scale (c_xy·n at 10^12 tokens); double mul/div is
      // IEEE-correctly-rounded, so both engines agree bit-for-bit
      .withColumn("lift",
        (col("c_xy").cast("double") * col("n_tokens").cast("double")) /
          (col("c_x").cast("double") * col("c_y").cast("double")))
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"), col("lift"))
      .orderBy(col("lift").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
  }

  /** floor(ln(x)·10^6) as an exact BIGINT — the quantized-log
    * discipline BM25 scoring established (Retrieval.scala): quantize
    * at the leaf, aggregate exactly, divide once. */
  private def qlog(c: org.apache.spark.sql.Column) =
    floor(log(c.cast("double")) * lit(1000000.0)).cast("long")

  /**
   * Unigram language-model quality filter (the CCNet/Gopher
   * perplexity-gate shape, with the LM trained on the corpus itself):
   * per document, the mean add-one-smoothed unigram surprisal
   *
   *   nll(d) = (1/|d|) Σ_w  ln((n + V) / (c_w + 1))
   *
   * in quantized-log nats. High nll = tokens rare in the corpus =
   * off-distribution or noisy text; `keep` thresholds on it. A
   * production pipeline trains the LM on a held-out reference corpus
   * — pass one as `train` — and scores against it; scoring docs whose
   * tokens the LM has never seen works the same way (c_w = 0 rows
   * survive the left join, add-one smoothing prices them).
   *
   * Scale shape: ONE tokenize pass per corpus (train and score sides
   * each); per-(doc, token) counts combine map-side before the join
   * with the vocab-sized count table (shuffle on token keys — never a
   * vocab broadcast); (n, V) ride as a 1-row broadcast. Docs with no
   * tokens keep their row (left join from the corpus): nll null,
   * keep false.
   */
  def lmPerplexity(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxNll: Double,
      train: Option[DataFrame] = None
  ): DataFrame = {
    graft.sql.GraftFunctions.register(df.sparkSession)
    val docTf = df
      .select(col(idCol), explode(F.tokens(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("tf"))
    // self-train derives the vocab counts FROM the per-doc aggregate:
    // the (doc, token) exchange is reused, so the corpus tokenizes once
    val counts = train match {
      case Some(tr) => tr.select(explode(F.tokens(col(textCol))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c_w"))
      case None => docTf.groupBy(col("w")).agg(sum(col("tf")).as("c_w"))
    }
    val stats = counts.agg(
      coalesce(sum(col("c_w")), lit(0L)).as("n_tokens"),
      count(lit(1)).as("vocab"))
    val scored = docTf
      .join(counts, Seq("w"), "left") // unseen tokens: c_w = 0 via coalesce
      .crossJoin(broadcast(stats))
      .withColumn("surprisal",
        qlog(col("n_tokens") + col("vocab")) - qlog(coalesce(col("c_w"), lit(0L)) + lit(1L)))
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).as("doc_tokens"),
        sum(col("tf") * col("surprisal")).as("nll_q"))
      .withColumn("nll",
        col("nll_q").cast("double") / (col("doc_tokens") * lit(1000000L)).cast("double"))
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("doc_tokens"), lit(0L)).as("doc_tokens"),
        col("nll"),
        coalesce(col("nll") <= lit(maxNll), lit(false)).as("keep"))
  }
}
