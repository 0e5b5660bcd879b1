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
 * Replay safety under FOLDING: shard `stream_<batchId>` overwrites its
 * own dir on a plain replay, but a drift-triggered self-heal (or an
 * external promotion racing a crashed stream) may have already folded
 * this batch's rows into the base — re-appending would double-carry
 * them. Each batch therefore probes the base with its OWN id set
 * (bounded batch ids broadcast against the base's id column — one
 * narrow column scan) and skips the append when its items are already
 * base rows. Re-ingesting ids the corpus already holds is likewise a
 * no-op: item_id is the identity, same convergence contract as the
 * text stream's shard overwrite.
 *
 * Drift self-heal: every batch pays the narrow drift probe
 * ([[graft.operators.Ann.ivfDriftFraction]]); past
 * `driftRetrainFraction` the index REBUILDS from its own rows — the
 * plain-IVF layout stores raw vectors, so base ∪ committed delta IS
 * the corpus. The corpus is staged OUTSIDE the index dirs first
 * (`rebuild_src` — the rebuild's wipe deletes the very files a lazy
 * read would still need), then re-quantized by the standard build. A
 * crash mid-rebuild leaves a probe-refusing index (centroids deleted
 * first) plus the complete stage; the next batch's preamble resumes
 * the rebuild from the stage before doing anything else. PQ-family
 * indexes are refused: their rows are codes — rebuilding needs the
 * raw source table and stays a batch-side action.
 */
object StreamingVectorAdmit {

  def run(
      vecs: DataFrame, // streaming: (vec_id long, embedding array<float>)
      indexPath: String,
      checkpoint: String,
      driftRetrainFraction: Double = 0.5,
      rebuildCells: Int = 16
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
      rebuildCells: Int = 16
  ): Boolean = {
    if (batch.isEmpty) return false
    val s = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val stage = new org.apache.hadoop.fs.Path(s"$indexPath/rebuild_src")
    // resume a crashed self-heal first: centroids deleted (the
    // rebuild's probe-refusing wipe) with a complete stage present
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$indexPath/centroids")) &&
        fs.exists(new org.apache.hadoop.fs.Path(stage, "_SUCCESS")))
      rebuildFromStage(s, indexPath, rebuildCells)
    require(Ann.deltaDirName(s, indexPath) == "assignments_delta",
      "streaming admission targets the plain IVF family (a PQ index's rows are codes; " +
        "its rebuild needs the raw source and stays a batch-side action)")
    val batchIds = batch.select(col("vec_id").as("item_id")).distinct()
    val alreadyFolded = !s.read.parquet(s"$indexPath/assignments")
      .select(col("item_id"))
      .join(broadcast(batchIds), Seq("item_id"), "left_semi")
      .isEmpty
    val drifted =
      if (alreadyFolded) Ann.ivfDriftFraction(s, indexPath, batch) > driftRetrainFraction
      else Ann.admitVectors(batch, indexPath, s"stream_$batchId", driftRetrainFraction)
    if (drifted) {
      // stage base ∪ committed delta (identity-deduped — a replayed
      // shard may already be base rows) outside the index dirs, then
      // re-quantize through the standard build
      val base = s.read.parquet(s"$indexPath/assignments")
        .select(col("item_id"), col("item_vec"))
      val deltaDirs = Ann.readableVecShardDirs(s, indexPath)
      val all =
        if (deltaDirs.isEmpty) base
        else base.unionByName(
          s.read.option("basePath", s"$indexPath/assignments_delta")
            .parquet(deltaDirs.map(_.toString).toIndexedSeq: _*)
            .select(col("item_id"), col("item_vec")))
      all.dropDuplicates(Seq("item_id"))
        .select(col("item_id").as("vec_id"), col("item_vec").as("embedding"))
        .write.mode("overwrite").parquet(stage.toString)
      rebuildFromStage(s, indexPath, rebuildCells)
    }
    drifted
  }

  private def rebuildFromStage(
      s: org.apache.spark.sql.SparkSession, indexPath: String, cells: Int): Unit = {
    Ann.buildIvfIndex(s, s.read.parquet(s"$indexPath/rebuild_src"), indexPath, numCells = cells)
    val stage = new org.apache.hadoop.fs.Path(s"$indexPath/rebuild_src")
    stage.getFileSystem(s.sparkContext.hadoopConfiguration).delete(stage, true)
  }
}
