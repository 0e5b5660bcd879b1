package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.schema.GSchema

/**
 * Metadata surface: the reference's SHOW TABLES / SHOW COLUMNS /
 * SHOW FUNCTIONS statements (yupana-core QueryEngineRouter + sql
 * parser Show* AST) over the graft schema registry.
 */
object Catalog {

  def showTables(spark: SparkSession, schema: GSchema): DataFrame = {
    import spark.implicits._
    schema.tables
      .map(t => (t.name, t.timeColumn, t.dimensions.size, t.metrics.size, t.rowTimeSpan))
      .toDF("table_name", "time_column", "n_dimensions", "n_metrics", "row_time_span_ms")
  }

  def showColumns(spark: SparkSession, schema: GSchema, table: String): DataFrame = {
    import spark.implicits._
    val t = schema.table(table)
    val rows =
      Seq((t.timeColumn, "time", "timestamp")) ++
        t.dimensions.map(d => (d.name, "dimension", d.dataType.simpleString)) ++
        t.metrics.map(m => (m.name, "metric", m.dataType.simpleString))
    rows.toDF("column_name", "kind", "data_type")
  }

  def showFunctions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    GraftFunctions.builders.map(_._1).sorted.toDF("function_name")
  }
}
