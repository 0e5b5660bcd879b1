package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/**
 * Event-time normalization for the `events` fact table.
 *
 * The driver's generator has shipped `ts` as parquet TIMESTAMP(NANOS)
 * (read as BIGINT under spark.sql.legacy.parquet.nanosAsLong) and as
 * TIMESTAMP(MICROS) without a UTC flag (read as TIMESTAMP_NTZ). Both
 * encodings carry µs-aligned UTC instants; downstream operators expect
 * one canonical TimestampType column, so normalize here instead of at
 * every read site. Sessions run with spark.sql.session.timeZone=UTC,
 * making the NTZ→LTZ cast value-preserving.
 */
object EventTime {
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema.find(_.name == colName).map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn(colName, timestamp_micros(expr(s"$colName div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn(colName, col(colName).cast("timestamp"))
      case _ => df
    }
}
