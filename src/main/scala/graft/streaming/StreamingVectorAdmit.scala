package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Ann

/**
 * Streaming admission into a PERSISTED batch-layout IVF index
 * ([[graft.operators.Ann.buildIvfIndex]]): each micro-batch becomes a
 * searchable delta shard by one narrow assignment pass — the vector
 * twin of [[StreamingDedup.run]]'s unified-index discipline. One
 * format, both writers: an index grown by this stream is searchable
 * with `Ann.searchIvfIndex`, inventoried by `SHOW VECTOR INDEX`,
 * foldable with `PROMOTE VECTOR INDEX DELTA`, and the stream can
 * extend an index the batch side built (the geometry is the index's
 * own centroids — never this stream's parameters).
 *
 * Convergence under REPLAY and FOLDING: item_id is the identity. Each
 * batch resolves its NOVEL subset per id — the ids already present in
 * the base (folded by a drift-rebuild, an external promotion, or
 * ingested by the batch side) or in ANOTHER committed shard are
 * excluded row-by-row, never batch-by-batch, so a mixed batch (some
 * ids already held, some new) admits exactly its new rows. The
 * batch's OWN shard dir is excluded from that probe (the admitShard
 * replay discipline: a shard must never self-match) and then
 * overwritten, so a replayed batch converges whether its rows live in
 * its shard, in the base, or nowhere yet. The id probes broadcast the
 * bounded batch ids against the base/delta id columns — one narrow
 * column scan per batch.
 *
 * Drift self-heal: every batch pays the narrow drift probe
 * ([[graft.operators.Ann.ivfDriftFraction]]); past
 * `driftRetrainFraction` the index REBUILDS from its own rows — the
 * plain-IVF layout stores raw vectors, so base ∪ committed delta IS
 * the corpus. The corpus is staged OUTSIDE the index dirs first
 * (`rebuild_src` — the rebuild's wipe deletes the very files a lazy
 * read would still need), then re-quantized by the standard build at
 * the corpus-derived cell count (~n/2048, floor 16 — a heal must not
 * collapse a corpus-scaled index onto a default). Crash recovery keys
 * on the index's completion marker (`stats`, the plain build's LAST
 * write, deleted FIRST by the rebuild's wipe): a leftover stage with
 * the marker MISSING means a crashed rebuild — the next batch's
 * preamble resumes it before anything else, closing every window of
 * the build's write sequence — while a leftover stage with the marker
 * PRESENT means the rebuild completed and only the cleanup crashed,
 * so the stage is deleted, never resurrected. The stream is the
 * index's only writer during a heal (concurrent external
 * rebuilds/promotions racing a crashed heal are the same
 * single-maintainer contract the batch lifecycle documents).
 * PQ-family indexes are refused: their rows are codes — rebuilding
 * needs the raw source table and stays a batch-side action.
 */
object StreamingVectorAdmit {

  def run(
      vecs: DataFrame, // streaming: (vec_id long, embedding array<float>)
      indexPath: String,
      checkpoint: String,
      driftRetrainFraction: Double = 0.5,
      rebuildCells: Int = 0 // ≤0 = corpus-derived (~n/2048, floor 16)
  ): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0L))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatch(batch, indexPath, batchId, driftRetrainFraction, rebuildCells)
        ()
      }
      .start()

  /** One micro-batch's admission (the foreachBatch body, callable
    * directly in specs): returns true when the drift trigger rebuilt
    * the index this batch. */
  private[graft] def admitBatch(
      batch: DataFrame,
      indexPath: String,
      batchId: Long,
      driftRetrainFraction: Double = 0.5,
      rebuildCells: Int = 0
  ): Boolean = {
    if (batch.isEmpty) return false
    val s = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val stage = new org.apache.hadoop.fs.Path(s"$indexPath/rebuild_src")
    // crash recovery (see the scaladoc's marker protocol)
    if (fs.exists(new org.apache.hadoop.fs.Path(stage, "_SUCCESS"))) {
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$indexPath/stats/_SUCCESS")))
        rebuildFromStage(s, indexPath, rebuildCells) // crashed rebuild: resume
      else fs.delete(stage, true) // completed rebuild, crashed cleanup: never resurrect
    }
    require(Ann.deltaDirName(s, indexPath) == "assignments_delta",
      "streaming admission targets the plain IVF family (a PQ index's rows are codes; " +
        "its rebuild needs the raw source and stays a batch-side action)")
    val batchIds = batch.select(col("vec_id").as("item_id")).distinct()
    // ids-only broadcasts below are batch-bounded in a configured
    // stream, but a restart backlog can deliver an arbitrarily large
    // batch — force-broadcasting it would fail the trigger AND every
    // replay. Past ~4M ids fall back to the shuffled join: slower, but
    // the trigger completes (the StreamingDedup.BcastBatchRows
    // discipline).
    val idsSmall = batchIds.limit((1 << 22) + 1).count() <= (1L << 22)
    def maybeBcast(d: DataFrame): DataFrame = if (idsSmall) broadcast(d) else d
    // ids already held by the index — base rows, or a committed shard
    // OTHER than this batch's own (own-shard exclusion: a replay must
    // not see its previous write as "already held" and then overwrite
    // its shard with nothing)
    val ownShard = s"shard=stream_$batchId"
    val heldIds = {
      val base = s.read.parquet(s"$indexPath/assignments").select(col("item_id"))
      val others = Ann.readableVecShardDirs(s, indexPath).filterNot(_.getName == ownShard)
      val all =
        if (others.isEmpty) base
        else base.unionByName(
          s.read.option("basePath", s"$indexPath/assignments_delta")
            .parquet(others.map(_.toString).toIndexedSeq: _*)
            .select(col("item_id")))
      all.join(maybeBcast(batchIds), Seq("item_id"), "left_semi")
    }
    // per-ID novelty: a mixed batch admits exactly its new rows (an
    // any-overlap skip would silently drop them)
    val novel = batch.join(
      maybeBcast(heldIds.withColumnRenamed("item_id", "vec_id")), Seq("vec_id"), "left_anti")
    Ann.appendToIvfIndex(novel, indexPath, s"stream_$batchId")
    val drifted = Ann.ivfDriftFraction(s, indexPath, batch) > driftRetrainFraction
    if (drifted) {
      // stage base ∪ committed delta (identity-deduped) outside the
      // index dirs, then re-quantize through the standard build
      val base = s.read.parquet(s"$indexPath/assignments")
        .select(col("item_id"), col("item_vec"))
      val all = Ann.deltaSide(s, indexPath, "assignments_delta", Seq("item_id", "item_vec"))
        .fold(base)(base.unionByName(_))
      all.dropDuplicates(Seq("item_id"))
        .select(col("item_id").as("vec_id"), col("item_vec").as("embedding"))
        .write.mode("overwrite").parquet(stage.toString)
      rebuildFromStage(s, indexPath, rebuildCells)
    }
    drifted
  }

  private def rebuildFromStage(
      s: org.apache.spark.sql.SparkSession, indexPath: String, rebuildCells: Int): Unit = {
    val staged = s.read.parquet(s"$indexPath/rebuild_src")
    val cells =
      if (rebuildCells > 0) rebuildCells
      else math.max(16, (staged.count() / 2048L).toInt)
    Ann.buildIvfIndex(s, staged, indexPath, numCells = cells)
    val stage = new org.apache.hadoop.fs.Path(s"$indexPath/rebuild_src")
    stage.getFileSystem(s.sparkContext.hadoopConfiguration).delete(stage, true)
  }
}
