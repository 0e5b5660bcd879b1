package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Rollup: pre-aggregation of a fact table into a coarser-time-grain
 * table, re-expressing the reference's TsdbRollup
 * (yupana-api/src/main/scala/org/yupana/api/schema/Rollup.scala:46,
 * executed by yupana-spark/CustomRollup.scala). The reference runs
 * rollups as periodic Spark ETL jobs writing back to HBase; graft runs
 * them as an aggregation job materialized to parquet, after which
 * queries hit the (orders-of-magnitude smaller) rollup table.
 *
 * The aggregation is a plain groupBy → map-side partial aggregation +
 * one shuffle on (timeExpr, dims); at 100 TB the rollup output is what
 * dashboards query, so the expensive scan happens once per period, not
 * per query — exactly the reference's receiptByDay/ItemRollups design
 * (yupana-schema ReceiptRollups.scala).
 */
final case class Rollup(
    name: String,
    timeExpr: Column,
    groupBy: Seq[Column],
    aggregates: Seq[Column],
    filter: Option[Column] = None
) {

  /** Compute the rollup DataFrame from the source fact table. */
  def apply(fact: DataFrame): DataFrame = {
    val src = filter.map(fact.filter).getOrElse(fact)
    src
      .groupBy((timeExpr.as("rollup_time") +: groupBy): _*)
      .agg(aggregates.head, aggregates.tail: _*)
  }

  /** Materialize to parquet at `path` (the persistent rollup table). */
  def materialize(fact: DataFrame, path: String): Unit =
    apply(fact).write.mode("overwrite").parquet(path)
}
