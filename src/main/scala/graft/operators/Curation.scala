package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * End-to-end corpus curation: the composition a training-data pipeline
 * actually runs, as one operator. Per input document, gates are
 * evaluated in a fixed order and the FIRST failing gate is recorded:
 *
 *  1. `exact_dup` — not the minimum id of its identical-text group
 *     (128-bit content-hash grouping, 24-byte shuffle keys);
 *  2. `near_dup` — not the canonical (minimum) id of its near-duplicate
 *     cluster (exact-verified LSH pairs → connected components);
 *  3. `lang` — language-ID not in the accepted set;
 *  4. `quality` — quality score below the floor;
 *  5. otherwise kept, with a deterministic content-hash train/val/test
 *     split.
 *
 * Every stage is bucket-local or a fixed-width-key shuffle — the whole
 * pass is a constant number of shuffles independent of corpus size.
 * Output: one row per input doc (doc_id, canonical_id, lang, quality,
 * keep, reason, split) — reason/split are null where not applicable,
 * so the decision is auditable (the pipeline never silently drops).
 */
object Curation {

  def curate(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      languages: Seq[String] = Seq("en"),
      minQuality: Double = 0.3,
      nearDupThreshold: Double = 0.5
  ): DataFrame = {
    val id = col(idCol)

    val base = docs.select(
      id,
      col(textCol).as("__text"),
      xxhash64(col(textCol)).as("__h1"),
      xxhash64(lit("graft-seed-2"), col(textCol)).as("__h2"),
      TextAnalysis.langId(col(textCol)).as("lang"),
      TextAnalysis.qualityScore(col(textCol)).as("quality"),
      TextAnalysis.fingerprint(col(textCol)).as("__fp")
    )

    // gate 1: exact-duplicate canonical per identical text
    val wExact = Window.partitionBy(col("__h1"), col("__h2"))
    val withExact = base.withColumn("__exact_canon", min(id).over(wExact))

    // gate 2: near-dup cluster canonical — computed over EXACT-CANONICAL
    // REPRESENTATIVES only, then propagated through the exact groups.
    // Identical texts are jaccard-1 pairs, so the full-corpus component
    // minimum equals the representative-component minimum (each exact
    // group's minimum IS its representative) — same canonical ids, but
    // the pairwise verify runs on |unique texts|, not |docs|: a corpus
    // that is 50% exact duplicates would otherwise pay a quadratic
    // blow-up inside every replica group (measured 26s vs <1s on a
    // 20×-replicated stress corpus).
    val reps = withExact.filter(id === col("__exact_canon")).select(id, col("__text"))
    val pairs = Dedup.minhashJaccardPairs(reps, idCol, "__text", threshold = nearDupThreshold)
    val comp = Dedup.connectedComponents(pairs)
      .select(col("id").as("__exact_canon"), col("component").as("__near_canon"))

    val reason = when(id =!= col("__exact_canon"), "exact_dup")
      .when(col("canonical_id") =!= id, "near_dup")
      .when(!col("lang").isin(languages: _*), "lang")
      .when(col("quality") < minQuality, "quality")

    withExact
      .join(comp, Seq("__exact_canon"), "left") // AQE broadcasts the (small) component table
      .withColumn("canonical_id", coalesce(col("__near_canon"), col("__exact_canon")))
      .withColumn("reason", reason)
      .withColumn("keep", col("reason").isNull)
      .withColumn(
        "split",
        when(
          col("keep"),
          when(col("__fp") % 10 < 8, "train").when(col("__fp") % 10 === 8, "val").otherwise("test"))
      )
      .select(id, col("canonical_id"), col("lang"), col("quality"), col("keep"), col("reason"), col("split"))
  }

  /**
   * Corpus snapshot diff — the data-versioning audit between two
   * corpus versions: per doc id, `added` (only in v2), `removed`
   * (only in v1), `changed` (both, content fingerprint differs) or
   * `unchanged`. Content identity is [[TextAnalysis.fingerprint]]
   * (the cross-engine rolling hash), computed NARROWLY on each side
   * before the join — the full-outer join on the id key ships
   * (id, fingerprint) rows only, never text, so diffing two 100 TB
   * snapshots moves two long columns.
   */
  def corpusDiff(v1: DataFrame, v2: DataFrame, idCol: String, textCol: String): DataFrame = {
    val a = v1.select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fp_old"))
    val b = v2.select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fp_new"))
    a.join(b, Seq(idCol), "full_outer")
      .withColumn("change",
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") === col("fp_new"), "unchanged")
          .otherwise("changed"))
  }

  /**
   * Leakage-safe holdout split: every row of the same GROUP lands on
   * the same side, so eval can never share a group with train — the
   * eval-contamination guard a doc-level random split cannot give
   * (near-identical pages land on both sides and eval measures
   * memorization). Split by domain (all pages of a site together) or,
   * the strongest form, by near-duplicate cluster label —
   * [[Dedup.dedupClusters]] composes directly: split on the cluster
   * id and no near-dup pair ever crosses the split (spec-proven).
   *
   * Assignment is content-defined and engine-portable: the first 4
   * hex chars of md5(group) compare against the train-fraction
   * threshold — deterministic across runs, partition orders, and
   * engines (the DuckDB oracle reproduces it byte-for-byte), at
   * 1/65536 granularity. One narrow map over the rows: no shuffle, no
   * RNG state, no driver-side group list — the group's side is a pure
   * function of its name, so two jobs splitting different shards of
   * the same corpus agree without coordination.
   */
  def groupSplit(df: DataFrame, groupCol: Column, evalFrac: Double = 0.1): DataFrame = {
    require(evalFrac > 0.0 && evalFrac < 1.0, s"evalFrac must be in (0,1), got $evalFrac")
    val threshold = f"${math.floor((1.0 - evalFrac) * 65536).toInt}%04x"
    df.withColumn("split",
      when(substring(md5(groupCol.cast("string")), 1, 4) < lit(threshold), "train")
        .otherwise("eval"))
  }

  /**
   * Per-domain document cap — the CommonCrawl-style curation gate that
   * stops one prolific domain from dominating the training mix: within
   * each `domainCol` value keep the `maxPerDomain` highest-quality
   * documents ([[TextAnalysis.qualityScore]]; id ascending breaks
   * ties), mark the rest dropped. Emits EVERY input row with its
   * per-domain quality rank and the keep verdict, so the caller can
   * either filter `kept` or audit what the cap removed.
   *
   * Scale shape: one hash shuffle on the domain key, then one
   * per-key rank pass (Spark's window sort is external/spillable, so a
   * skewed 10^8-page domain spills instead of OOMing; a kept-only
   * consumer that filters `rk <= cap` directly gets the rank-window
   * pattern TopKPerKeyStrategy rewrites to a bounded heap). No joins,
   * no second pass; quality is computed inline in the same projection
   * that feeds the exchange.
   */
  def capPerDomain(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      domainCol: String,
      maxPerDomain: Int
  ): DataFrame = {
    require(maxPerDomain > 0, s"maxPerDomain must be positive, got $maxPerDomain")
    val w = Window
      .partitionBy(col(domainCol))
      .orderBy(col("quality").desc, col(idCol).asc)
    docs
      .select(
        col(idCol),
        col(domainCol),
        TextAnalysis.qualityScore(col(textCol)).as("quality"))
      .withColumn("rk", row_number().over(w))
      .withColumn("kept", col("rk") <= maxPerDomain)
  }
}
