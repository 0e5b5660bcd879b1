package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.F

/**
 * Data Selection via Importance Resampling (DSIR — Xie et al., "Data
 * Selection for Language Models via Importance Resampling", NeurIPS
 * 2023): pick raw-pool documents that look like a small high-quality
 * TARGET corpus by importance weight under hashed-unigram bag-of-words
 * models,
 *
 *   log w(d) = Σ_{t ∈ tokens(d)} ln p̂_target(b(t)) − ln p̂_raw(b(t)),
 *
 * where b(·) hashes terms into `buckets` feature buckets and both
 * distributions are add-1 smoothed over the bucket space. The
 * reference engine has no corpus-selection surface (ItemsInvertedIndex
 * stops at boolean retrieval — yupana-schema/externallinks/
 * ItemsInvertedIndex.scala); this operator belongs to the
 * training-data mandate, in the [[Curation]] /
 * [[CorpusStats.lmPerplexity]] family.
 *
 * Cross-engine determinism (SURVEY.md §6): the feature bucket is the
 * first 24 bits of md5(term) (hex prefix → integer — bit-equal in
 * DuckDB via CAST(CONCAT('0x', substr(md5(w),1,6)) AS BIGINT)), and
 * the per-bucket log ratio ln(((ct+1)(Nr+B)) / ((cr+1)(Nt+B))) is ONE
 * natural log of ONE exactly-rounded IEEE division of exact integer
 * products (< 2^53), quantized to integer micro-nats at the leaf
 * (floor ·1e6, the BM25 discipline) — per-doc scores are exact BIGINT
 * sums, engine- and aggregation-order-independent; the final `logw`
 * double is one division.
 *
 * Scale shape (100 TB): [[featureCounts]] is ONE tokenize + explode
 * with a map-side-combined (doc, bucket) aggregate — the exchange
 * carries four narrow columns, never text; [[ratioTable]]
 * re-aggregates it to ≤ `buckets` rows (broadcast); [[scores]] joins
 * the broadcast table and partially aggregates per doc — one
 * |docs|-row exchange; [[select]]'s orderBy+limit executes as
 * TakeOrderedAndProject (bounded per-partition heaps, no global
 * sort). Between corpus versions, [[fit]] persists the model (ratio
 * table + totals + geometry, meta written LAST — the index-family
 * crash-marker discipline) and [[scoreWithModel]] serves any batch
 * with a broadcast join only; the streaming twin
 * [[graft.streaming.StreamingDsir]] runs the identical kernel per
 * micro-batch.
 */
object Dsir {

  /** 24-bit md5 feature bucket (hex prefix → integer). */
  def bucket(term: Column, buckets: Int): Column =
    conv(substring(md5(term.cast("binary")), 1, 6), 16, 10).cast("long") % buckets

  /**
   * The corpus feature table (doc_id, is_target, bucket, tf): one
   * tokenize + explode, aggregated map-side to hashed-unigram counts.
   * Null target flags count as raw pool.
   */
  def featureCounts(
      docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int): DataFrame = {
    graft.sql.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col(idCol).as("doc_id"), coalesce(isTarget, lit(false)).as("is_target"),
        explode(F.tokens(col(textCol))).as("w"))
      .select(col("doc_id"), col("is_target"), bucket(col("w"), buckets).as("bucket"))
      .groupBy(col("doc_id"), col("is_target"), col("bucket"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Per-bucket occurrence counts of both corpora: (bucket, ct, cr),
    * ≤ `buckets` rows. */
  private def bucketCounts(feat: DataFrame): DataFrame =
    feat.groupBy(col("bucket")).agg(
      sum(when(col("is_target"), col("tf")).otherwise(lit(0L))).as("ct"),
      sum(when(col("is_target"), lit(0L)).otherwise(col("tf"))).as("cr"))

  /** floor(1e6 · ln(((ct+1)(nr+B)) / ((cr+1)(nt+B)))) as exact BIGINT. */
  private def ratioQ(ct: Column, cr: Column, nt: Column, nr: Column, buckets: Int): Column =
    floor(log(
      ((ct + lit(1L)).cast("double") * (nr + lit(buckets.toLong)).cast("double")) /
        ((cr + lit(1L)).cast("double") * (nt + lit(buckets.toLong)).cast("double"))) *
      lit(1000000.0)).cast("long")

  /** The smoothed log-ratio of a bucket NEITHER corpus touched — what
    * [[scoreWithModel]] substitutes for buckets absent from the stored
    * table (same Math.log the column expression compiles to). */
  private def defaultRatioQ(nt: Long, nr: Long, buckets: Int): Long =
    math.floor(math.log(
      (1.0 * (nr + buckets).toDouble) / (1.0 * (nt + buckets).toDouble)) * 1000000.0).toLong

  /**
   * The quantized importance-ratio table (bucket, ratio_q) for every
   * bucket either corpus touched — ≤ `buckets` rows, the broadcastable
   * model.
   */
  def ratioTable(feat: DataFrame, buckets: Int): DataFrame = {
    val bc = bucketCounts(feat)
    val tot = bc.agg(
      coalesce(sum(col("ct")), lit(0L)).as("nt"),
      coalesce(sum(col("cr")), lit(0L)).as("nr"))
    bc.crossJoin(broadcast(tot))
      .select(col("bucket"),
        ratioQ(col("ct"), col("cr"), col("nt"), col("nr"), buckets).as("ratio_q"))
  }

  /** Per-doc importance scores for the raw pool:
    * (doc_id, doc_tokens, logw_q). Inner join is exact here — every
    * raw-pool token's bucket has cr ≥ 1, so it is in the table. */
  def scores(feat: DataFrame, ratios: DataFrame): DataFrame =
    feat.filter(!col("is_target"))
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("doc_tokens"),
        sum(col("tf") * col("ratio_q")).as("logw_q"))

  /**
   * Top-k most-target-like raw-pool documents:
   * (doc_id, doc_tokens, logw_q, logw, rank), rank 1..k by quantized
   * weight descending, doc_id ascending. (The paper's sampled variant
   * adds Gumbel noise before the top-k; the deterministic top-k is its
   * zero-temperature limit and the form an exact gate can pin.)
   */
  def select(
      docs: DataFrame, idCol: String, textCol: String, isTarget: Column,
      buckets: Int = 4096, k: Int = 100): DataFrame = {
    val feat = featureCounts(docs, idCol, textCol, isTarget, buckets)
    val sc = scores(feat, ratioTable(feat, buckets))
    sc.orderBy(col("logw_q").desc, col("doc_id").asc).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("logw_q").desc, col("doc_id").asc)))
      .withColumn("logw", col("logw_q").cast("double") / lit(1000000.0))
      .select(col("doc_id"), col("doc_tokens"), col("logw_q"), col("logw"), col("rank"))
  }

  private def fsOf(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /**
   * Fit and persist the model: ratio table under `<path>/ratios`, then
   * ONE meta row (buckets, nt, nr, default_q) LAST — its presence
   * certifies a complete fit (meta deleted first on rewrite, so a
   * crashed fit refuses to serve rather than serving half a model).
   * ONE corpus pass: the bucket-count table is ≤ `buckets` narrow
   * rows, so it is collected once and totals + ratios derive
   * driver-side — a second action would re-run the corpus tokenize.
   */
  def fit(
      docs: DataFrame, idCol: String, textCol: String, isTarget: Column,
      buckets: Int, path: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fs = fsOf(spark, path)
    Seq("meta", "ratios")
      .foreach(d => fs.delete(new org.apache.hadoop.fs.Path(s"$path/$d"), true))
    val bcRows = bucketCounts(featureCounts(docs, idCol, textCol, isTarget, buckets))
      .collect() // ≤ buckets (bucket, ct, cr) rows — bounded
    val nt = bcRows.iterator.map(_.getAs[Long]("ct")).sum
    val nr = bcRows.iterator.map(_.getAs[Long]("cr")).sum
    bcRows.map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("ct"), r.getAs[Long]("cr")))
      .toSeq.toDF("bucket", "ct", "cr")
      // the same ratioQ Column expression as the inline path — the
      // stored quantized values are bit-identical to ratioTable's
      .select(col("bucket"),
        ratioQ(col("ct"), col("cr"), lit(nt), lit(nr), buckets).as("ratio_q"))
      .coalesce(1) // ≤ buckets narrow rows — one file serves broadcast reads
      .write.mode("overwrite").parquet(s"$path/ratios")
    Seq((buckets, nt, nr, defaultRatioQ(nt, nr, buckets)))
      .toDF("buckets", "nt", "nr", "default_q")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Whether a complete model exists at the path (meta written LAST
    * certifies the fit). */
  def modelExists(spark: SparkSession, modelPath: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$modelPath/meta/_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The persisted model's geometry (buckets, nt, nr, default_q) —
    * the ONE meta reader every consumer (serving, streaming twin, SQL
    * SHOW/FIT) shares; refuses a meta-less crashed fit. */
  private[graft] def readMeta(spark: SparkSession, modelPath: String): (Int, Long, Long, Long) = {
    require(modelExists(spark, modelPath),
      s"no complete DSIR model at $modelPath (meta missing — fit crashed or never ran)")
    val m = spark.read.parquet(s"$modelPath/meta").head()
    (m.getAs[Int]("buckets"), m.getAs[Long]("nt"), m.getAs[Long]("nr"), m.getAs[Long]("default_q"))
  }

  /**
   * The serving kernel over an ALREADY-LOADED ratio table: one narrow
   * tokenize pass over the batch, a broadcast join (buckets unseen at
   * fit time fall back to the smoothed default), nothing corpus-sized.
   * Emits (doc_id, doc_tokens, logw_q, logw); zero-token docs carry no
   * evidence and score logw_q = 0 rather than dropping out. The
   * streaming twin preloads the frozen model ONCE and calls this per
   * micro-batch; [[scoreWithModel]] is the load-and-score convenience.
   */
  def scoreWithRatios(
      docs: DataFrame, idCol: String, textCol: String,
      ratios: DataFrame, buckets: Int, defaultQ: Long): DataFrame = {
    graft.sql.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col(idCol).as("doc_id"), explode_outer(F.tokens(col(textCol))).as("w"))
      .select(col("doc_id"), when(col("w").isNotNull, bucket(col("w"), buckets)).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(col("bucket")).as("tf")) // null bucket (zero-token doc): tf = 0
      .join(broadcast(ratios), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("doc_tokens"),
        coalesce(sum(col("tf") * coalesce(col("ratio_q"), lit(defaultQ))), lit(0L)).as("logw_q"))
      .withColumn("logw", col("logw_q").cast("double") / lit(1000000.0))
  }

  /** Serve per-doc scores from a persisted model ([[fit]]): loads the
    * geometry + ratio table, then runs [[scoreWithRatios]]. */
  def scoreWithModel(
      docs: DataFrame, idCol: String, textCol: String, modelPath: String): DataFrame = {
    val spark = docs.sparkSession
    val (b, _, _, defQ) = readMeta(spark, modelPath)
    scoreWithRatios(docs, idCol, textCol,
      spark.read.parquet(s"$modelPath/ratios"), b, defQ)
  }
}
