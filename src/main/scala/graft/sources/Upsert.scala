package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Upsert semantics: the reference ingests DataPoints keyed by
 * (time, dimensions); re-putting a key replaces its metric values
 * (yupana-core TSDB.put / yupana SQL UPSERT,
 * yupana-core/src/main/scala/org/yupana/core/sql/parser — Upsert AST).
 *
 * graft merges base + updates with updates winning per key: a union and
 * one window dedup over the key. At scale the window shuffles on the
 * key — the same shuffle a groupBy would need; when the base is the
 * TsLayout, time-bucket pruning limits the rewrite to touched buckets
 * (classic merge-on-read compaction shape).
 */
object Upsert {

  def apply(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val tagged = base.withColumn("__prio", lit(0)).unionByName(updates.withColumn("__prio", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__prio").desc)
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__prio", "__rn")
  }
}
