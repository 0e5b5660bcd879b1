package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.F

/**
 * Multinomial Naive Bayes document classifier over hashed-unigram
 * features — the domain/source tagger of a training-data pipeline
 * (label web documents with the corpus domain that best explains
 * them, the signal mixture weighting and per-domain capping consume;
 * the fastText-classifier role in CCNet-style pipelines, in closed
 * form). The reference engine has no classification surface; this
 * belongs to the training-data mandate, beside [[Dsir]] (whose
 * 2-class importance ratio is the K=2 special case of this score,
 * up to the prior).
 *
 * Model (add-1 smoothed, all integer evidence):
 *   score(d, k) = ln(d_k / D) + Σ_{t ∈ tokens(d)} ln((c_k(b(t)) + 1) / (n_k + B))
 * where b(·) is [[Dsir.bucket]]'s 24-bit md5 feature bucket, c_k(b)
 * the class's train-token count in the bucket, n_k its total train
 * tokens, d_k/D the doc-count prior. Prediction = argmax_k, ties by
 * label ascending.
 *
 * Cross-engine determinism (SURVEY.md §6): every leaf is
 * floor(1e6 · ln(q)) of ONE exactly-rounded IEEE division of exact
 * integers < 2^53 (the [[Dsir]] ratio discipline); per-(doc, class)
 * scores are exact BIGINT sums of tf · leaf, so the argmax — and the
 * DuckDB hash gate — is engine- and order-independent.
 *
 * Scale shape (100 TB): ONE tokenize of train and test each, both
 * aggregated map-side to narrow bucket rows before any exchange (text
 * never shuffles). The model is bounded — ≤ K·B class-bucket counts
 * plus a K-row class table — and broadcasts into the scoring join.
 * The ×K class expansion happens AFTER the per-(doc, bucket)
 * aggregate (bucket-level rows, never token-level), and the
 * per-(doc, class) sum combines map-side because the expansion
 * preserves the feature aggregate's doc-clustered layout. The argmax
 * is a window over K rows per doc. Nothing corpus-sized is ever
 * broadcast, collected, or shuffled wider than (doc, bucket, tf).
 */
object NaiveBayes {

  /**
   * Train on `isTrain` rows, classify the rest:
   * (doc_id, pred, score_q, score, n_tokens), one row per non-train
   * doc (zero-token docs classify by prior alone). Null labels and
   * null train flags are excluded from training (a pipeline's
   * unlabeled backfill must not become a phantom class).
   */
  def classify(
      docs: DataFrame, idCol: String, textCol: String, labelCol: String,
      isTrain: Column, buckets: Int = 4096): DataFrame = {
    val spark = docs.sparkSession
    graft.sql.GraftFunctions.register(spark)
    val base = docs.select(
      col(idCol).as("doc_id"), col(labelCol).as("label"),
      coalesce(isTrain, lit(false)).as("is_train"), col(textCol).as("text"))

    // class-bucket train counts: ≤ K·B rows — the broadcastable model
    val classCounts = base
      .filter(col("is_train") && col("label").isNotNull)
      .select(col("label"), explode(F.tokens(col("text"))).as("w"))
      .select(col("label"), Dsir.bucket(col("w"), buckets).as("bucket"))
      .groupBy(col("label"), col("bucket")).agg(count(lit(1)).as("c"))

    // K-row class table: token totals, doc priors (quantized at the leaf)
    val classDocs = base.filter(col("is_train") && col("label").isNotNull)
      .groupBy(col("label")).agg(count(lit(1)).as("dk"))
    val totalDocs = classDocs.agg(sum(col("dk")).as("d"))
    val classTable = classDocs
      .join(classCounts.groupBy(col("label")).agg(sum(col("c")).as("nk")), Seq("label"), "left")
      .na.fill(0L, Seq("nk"))
      .crossJoin(broadcast(totalDocs))
      .select(col("label"), col("nk"),
        floor(log(col("dk").cast("double") / col("d").cast("double")) * lit(1000000.0))
          .cast("long").as("prior_q"))

    // test features: (doc, bucket, tf) — map-side combined, text never shuffles
    val testFeat = base.filter(!col("is_train"))
      .select(col("doc_id"), explode(F.tokens(col("text"))).as("w"))
      .select(col("doc_id"), Dsir.bucket(col("w"), buckets).as("bucket"))
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("tf"))

    // per-(doc, class) token evidence: expand classes on BUCKET rows,
    // left-join the broadcast model (absent (class, bucket) → c = 0)
    val tokenScores = testFeat
      .crossJoin(broadcast(classTable))
      .join(broadcast(classCounts), Seq("label", "bucket"), "left")
      .na.fill(0L, Seq("c"))
      .groupBy(col("doc_id"), col("label"))
      .agg(
        sum(col("tf") *
          floor(log((col("c") + lit(1L)).cast("double") /
            (col("nk") + lit(buckets.toLong)).cast("double")) * lit(1000000.0)).cast("long"))
          .as("tok_q"),
        sum(col("tf")).as("n_tokens"))

    // every test doc × every class (zero-token docs score prior-only),
    // then argmax by quantized score, ties by label ascending
    base.filter(!col("is_train")).select(col("doc_id"))
      .crossJoin(broadcast(classTable.select(col("label"), col("prior_q"))))
      .join(tokenScores, Seq("doc_id", "label"), "left")
      .select(col("doc_id"), col("label"),
        (col("prior_q") + coalesce(col("tok_q"), lit(0L))).as("score_q"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
      .withColumn("rn",
        row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("score_q").desc, col("label").asc)))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("label").as("pred"), col("score_q"),
        (col("score_q").cast("double") / lit(1000000.0)).as("score"), col("n_tokens"))
  }
}
