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
    val ex = df.select(col(idCol).as("id"), explode(shingles(col(textCol), shingleSize)).as("sh"))
    val aggs = (0 until numHashes).map(i => min(xxhash64(col("sh"), lit(i))).as(s"h$i"))
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
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCols: Seq[String],
      n: Int = 4,
      threshold: Double = 0.35
  ): DataFrame = {
    val g = df.select(
      (col(idCol).as("id") +: F.charNgrams(lower(col(textCol)), n).as("grams") +: groupCols.map(col)): _*
    )
    val a = g.as("a")
    val b = g.as("b")
    val joinCond = groupCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _) && col("a.id") < col("b.id")
    a.join(b, joinCond)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        F.jaccard(col("a.grams"), col("b.grams")).as("jac"))
      .filter(col("jac") >= threshold)
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
    val sigs = df.select(col(idCol).as("id"), col(vecCol).as("vec"), bits.as("bits"))
    val banded = sigs.select(
      col("id"),
      col("vec"),
      explode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          bnd => struct(bnd.as("band"), concat_ws("", slice(col("bits"), bnd * rowsPerBand + 1, lit(rowsPerBand))).as("bh"))
        )
      ).as("bk")
    ).select(col("id"), col("vec"), col("bk.band"), col("bk.bh"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("a.vec").as("vec_a"), col("b.vec").as("vec_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", F.cosine(col("vec_a"), col("vec_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
