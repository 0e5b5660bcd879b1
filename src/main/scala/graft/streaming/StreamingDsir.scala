package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * DSIR quality screening over a document stream — the admission-time
 * twin of [[graft.operators.Dsir]]: each micro-batch is scored against
 * a FROZEN persisted model ([[graft.operators.Dsir.fit]]) and a
 * per-doc report row (doc_id, doc_tokens, logw_q, logw, keep) is
 * appended. Stateless per batch — the model is a broadcastable
 * ≤-buckets table, so per-batch work is one narrow tokenize pass over
 * the batch plus a broadcast join, nothing corpus-sized
 * (the [[StreamingContamination]] shape). Replay-safe: each batch
 * overwrites its own `batch_id=…` partition, so a recovered query
 * rewrites identical rows instead of duplicating them.
 *
 * The model is static between corpus versions by design (DSIR fits
 * once on target + raw snapshots); refreshing it is a restart, the
 * same ops model as the eval set in [[StreamingContamination]] — OR
 * a live [[runUpdate]] stream folds arriving batches into the model
 * continuously while scoring queries keep serving the previous
 * generation until the next one commits.
 */
object StreamingDsir {

  def run(
      spark: SparkSession,
      docs: DataFrame, // streaming: (doc_id long, text string)
      modelPath: String,
      reportPath: String,
      minLogw: Double,
      checkpoint: String = "/tmp/graft_streaming_dsir_ckpt"
  ): StreamingQuery = {
    // the model is FROZEN for the query's lifetime — load geometry and
    // ratio table once here, not per micro-batch (scoreWithModel's
    // marker check + meta read would otherwise run on every batch)
    val (buckets, _, _, defaultQ) = graft.operators.Dsir.readMeta(spark, modelPath)
    val ratios = graft.operators.Dsir.ratiosOf(spark, modelPath)
    docs.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0L))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Dsir
            .scoreWithRatios(batch, "doc_id", "text", ratios, buckets, defaultQ)
            .withColumn("keep", col("logw") >= lit(minLogw))
            .write.mode("overwrite").parquet(s"$reportPath/batch_id=$batchId")
        }
        ()
      }
      .start()
  }

  /**
   * Streaming MODEL REFRESH — the other half of the DSIR lifecycle:
   * each micro-batch's bucket counts fold into the persisted model
   * through [[graft.operators.Dsir.update]], so the model tracks the
   * arriving corpus in O(batch) per trigger with the corpus never
   * re-scanned (counts are additive — after any prefix of batches the
   * stored model is EXACTLY the from-scratch fit on base ∪ prefix,
   * spec-pinned). Exactly-once without a transaction: the batchId is
   * the update's idempotency label, and structured streaming only ever
   * replays the last uncommitted batch — whose label the servable
   * generation already carries, making the replay a no-op. Readers
   * (scoreWithModel, [[run]] restarts) serve the previous generation
   * until the new meta commits: refresh never pauses serving.
   */
  def runUpdate(
      docs: DataFrame, // streaming: (doc_id long, text string, + target evidence)
      isTarget: org.apache.spark.sql.Column,
      modelPath: String,
      checkpoint: String = "/tmp/graft_streaming_dsir_upd_ckpt"
  ): StreamingQuery = {
    docs.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0L))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Dsir.update(
            batch, "doc_id", "text", isTarget, modelPath, s"epoch=$batchId")
        }
        ()
      }
      .start()
  }
}
