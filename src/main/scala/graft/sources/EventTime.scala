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
    // Case-insensitive lookup to match Spark's default column resolution;
    // Column-API arithmetic so names never pass through SQL unquoted.
    df.schema.find(_.name.equalsIgnoreCase(colName)) match {
      case Some(f) if f.dataType == LongType =>
        // Integer `div`, not `/`: double division is lossy above 2^53 and
        // nanosecond epochs exceed that. Backtick-quote the resolved name.
        val quoted = "`" + f.name.replace("`", "``") + "`"
        df.withColumn(f.name, timestamp_micros(expr(s"$quoted div 1000")))
      case Some(f) if f.dataType == TimestampNTZType =>
        df.withColumn(f.name, col(f.name).cast("timestamp"))
      case _ => df
    }
}
