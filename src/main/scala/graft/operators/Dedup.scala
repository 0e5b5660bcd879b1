package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.F

/**
 * Deduplication operators for large-scale corpus curation (beyond the
 * reference's surface — SURVEY.md §2.9).
 *
 * Scale design: every near-dup variant generates candidates through a
 * bucket equi-join (LSH band, simhash band, or a bounded group key) —
 * never a corpus-wide cross join. At 100 TB the shuffles are on
 * (band, hash) keys whose cardinality grows with the data, so they
 * spread across executors; pairwise verification runs only inside
 * buckets.
 */
object Dedup {

  /** Exact dedup: canonical row per identical text + duplicate count. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
      .select(col("keep_id"), col("dup_count"))

  /** Word n-gram shingles of a text column (token sequence n-grams). */
  def shingles(textCol: Column, n: Int): Column = {
    val toks = F.tokens(textCol)
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(n)))
      )
    )
  }

  /**
   * MinHash signatures via explode → 64 partial-aggregated `min`s.
   *
   * NOT the nested-transform formulation (`transform(0..k, i =>
   * array_min(transform(shingles, hash)))`): there the shingle
   * expression sits inside the outer lambda and is re-evaluated k
   * times per row (tokenize ×64 — measured 70s on 500 docs). Explode
   * tokenizes once per row, and the k `min` aggregates get map-side
   * partial combine, so the shuffle carries one row per (partition,
   * doc) — the shape that survives 100 TB.
   */
  def minhashSigs(df: DataFrame, idCol: String, textCol: String, numHashes: Int, shingleSize: Int): DataFrame = {
    // Hash the shingle string ONCE, then derive the k-member hash family
    // by re-hashing the fixed-width 8-byte value (k string hashes per
    // shingle measured 17s at sf0.1; rehashing the long is ~3x cheaper,
    // and multiply-mix tricks are out under ANSI overflow checking).
    val ex = df
      .select(col(idCol).as("id"), explode(shingles(col(textCol), shingleSize)).as("sh"))
      .select(col("id"), xxhash64(col("sh")).as("h"))
    val aggs = (0 until numHashes).map(i => min(xxhash64(col("h"), lit(i))).as(s"h$i"))
    ex.groupBy(col("id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /**
   * MinHash + LSH near-duplicate pairs.
   * shingle → k-minima signature → band keys → explode → self-join on
   * (band, bandHash) → distinct (a<b) pairs → verify estimated Jaccard
   * (fraction of equal minima) >= threshold.
   */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      threshold: Double = 0.5
  ): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sigs = minhashSigs(df, idCol, textCol, numHashes, shingleSize)
    val banded = sigs
      .select(col("id"), col("sig"), explode(F.lshBandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band"), col("bk.bh"))
    val a = banded.as("a")
    val b = banded.as("b")
    val cand = a
      .join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .withColumn(
        "est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)), lit(0), _ + _)
          .cast("double") / lit(numHashes.toDouble)
      )
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /**
   * SimHash near-duplicate pairs: 64-bit signature, candidates share at
   * least one of four 16-bit sub-bands (guarantees recall for hamming
   * distance <= 3), verified with exact hamming <= maxHamming.
   */
  /** SimHash signatures, same explode/partial-agg shape as [[minhashSigs]]. */
  def simhashSigs(df: DataFrame, idCol: String, textCol: String, shingleSize: Int): DataFrame = {
    val ex = df
      .select(col(idCol).as("id"), explode(shingles(col(textCol), shingleSize)).as("sh"))
      .select(col("id"), xxhash64(col("sh")).as("h"))
    val voteAggs = (0 until 64).map { i =>
      sum(when(call_function("shiftrightunsigned", col("h"), lit(i)).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
        .as(s"v$i")
    }
    val sigExpr = (0 until 64)
      .map(i => when(col(s"v$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce[Column]((a, b) => a.bitwiseOR(b))
    ex.groupBy(col("id")).agg(voteAggs.head, voteAggs.tail: _*).select(col("id"), sigExpr.as("sig"))
  }

  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      maxHamming: Int = 3
  ): DataFrame = {
    val sigs = simhashSigs(df, idCol, textCol, shingleSize)
    val banded = sigs.select(
      col("id"),
      col("sig"),
      explode(
        transform(
          sequence(lit(0), lit(3)),
          b => struct(b.as("band"), call_function("shiftrightunsigned", col("sig"), b * 16).bitwiseAND(lit(0xffffL)).as("bh"))
        )
      ).as("bk")
    ).select(col("id"), col("sig"), col("bk.band"), col("bk.bh"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", F.hamming(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /**
   * Character n-gram Jaccard near-dup pairs within bounded groups
   * (group key caps candidate counts; at scale the group key is an LSH
   * prefix or domain/source bucket).
   */
  /**
   * Set-similarity-join formulation (PPJoin-lite): explode distinct
   * grams, equi-join on (group, gram), count shared grams per pair,
   * jaccard = |∩| / (|A| + |B| − |∩|). Compared to joining whole gram
   * arrays and running array_intersect per candidate pair (measured 51s
   * at sf0.1), only pairs sharing ≥1 gram are ever materialized and the
   * per-pair work is a counting aggregate with map-side combine — the
   * shape that survives a 100 TB corpus.
   */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCols: Seq[String],
      n: Int = 4,
      threshold: Double = 0.35
  ): DataFrame = {
    val withGrams = df.select(
      (col(idCol).as("id") +: F.charNgrams(lower(col(textCol)), n).as("grams") +: groupCols.map(col)): _*
    )
    val ex = withGrams
      .select((col("id") +: size(col("grams")).as("sz") +: explode(col("grams")).as("gram") +: groupCols.map(col)): _*)
    val a = ex.as("a")
    val b = ex.as("b")
    val joinCond = (groupCols.map(c => col(s"a.$c") === col(s"b.$c")) :+
      (col("a.gram") === col("b.gram")) :+ (col("a.id") < col("b.id"))).reduce(_ && _)
    a.join(b, joinCond)
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"), col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn(
        "jac",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")).cast("double")
      )
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
  }

  /**
   * Embedding near-duplicate pairs via random-hyperplane LSH: sign-bit
   * signature over `planes` pseudo-random hyperplanes (deterministic,
   * hash-generated — no RNG state to ship), banded for candidates, then
   * exact cosine >= threshold.
   */
  def embeddingPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      planes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.97
  ): DataFrame = {
    val rowsPerBand = planes / bands
    // deterministic hyperplane component p_{j,i} in [-1,1): hash of (j,i)
    def planeComponent(j: Column, i: Column): Column =
      (xxhash64(j, i).cast("double") / lit(Long.MaxValue.toDouble))
    val dim = size(col(vecCol))
    val bits = transform(
      sequence(lit(0), lit(planes - 1)),
      j =>
        when(
          aggregate(
            zip_with(col(vecCol), sequence(lit(0), dim - 1), (v, i) => v.cast("double") * planeComponent(j, i)),
            lit(0.0),
            _ + _
          ) > 0,
          lit(1)
        ).otherwise(lit(0))
    )
    val sigs = df.select(col(idCol).as("id"), col(vecCol).as("vec"), F.l2norm(col(vecCol)).as("nrm"), bits.as("bits"))
    val banded = sigs.select(
      col("id"),
      col("vec"),
      col("nrm"),
      explode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          bnd => struct(bnd.as("band"), concat_ws("", slice(col("bits"), bnd * rowsPerBand + 1, lit(rowsPerBand))).as("bh"))
        )
      ).as("bk")
    ).select(col("id"), col("vec"), col("nrm"), col("bk.band"), col("bk.bh"))
    val a = banded.as("a")
    val b = banded.as("b")
    // norms precomputed per row (not per candidate pair): the pair-level
    // work is one dot product, a 3x saving measured at sf0.1.
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") && col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.vec").as("vec_a"), col("b.vec").as("vec_b"),
        col("a.nrm").as("nrm_a"), col("b.nrm").as("nrm_b")
      )
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", F.dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
