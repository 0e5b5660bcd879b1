package graft.schema

import org.apache.spark.sql.types.DataType

/**
 * Schema model for graft tables, re-expressing the reference data model
 * (yupana-api/src/main/scala/org/yupana/api/schema/Table.scala,
 * Dimension.scala, Metric.scala) on Spark terms.
 *
 * A yupana Table is a multidimensional time series: a mandatory time
 * axis, a sequence of tag dimensions forming the storage key, and typed
 * metrics. Here a table is backed by (time-partitioned) Parquet; the
 * dimension sequence is the recommended sort/bucket key so that scans
 * filtered on leading dimensions prune row groups, mirroring the
 * reference's HBase row-key design (rowTimeSpan time bucketing).
 */
final case class GDimension(name: String, dataType: DataType)

final case class GMetric(name: String, dataType: DataType)

/**
 * @param name        table name (parquet file / directory basename)
 * @param timeColumn  the time axis (yupana Table.TIME_FIELD_NAME)
 * @param dimensions  tag dimensions, in storage-key order
 * @param metrics     measure columns
 * @param rowTimeSpan time-bucket width in millis used by the
 *                    partitioned layout (reference Table.rowTimeSpan)
 */
final case class GTable(
    name: String,
    timeColumn: String,
    dimensions: Seq[GDimension],
    metrics: Seq[GMetric],
    rowTimeSpan: Long = 86400000L * 30L
) {
  def dimensionNames: Seq[String] = dimensions.map(_.name)
  def metricNames: Seq[String] = metrics.map(_.name)
  def columnNames: Seq[String] = timeColumn +: (dimensionNames ++ metricNames)
}

/**
 * External link: enrichment of a dimension with catalog attributes,
 * re-expressing yupana-api ExternalLink.scala / LinkField.scala.
 * At query time this becomes a broadcast hash join on `dimensionName` —
 * catalogs are small relative to facts, so no shuffle of the fact side.
 */
final case class GExternalLink(
    linkName: String,
    dimensionName: String,
    catalogTable: String,
    catalogKey: String,
    fields: Seq[String]
)

/** Schema registry (reference: yupana-api Schema.scala, SchemaRegistry). */
final case class GSchema(tables: Seq[GTable], links: Seq[GExternalLink] = Seq.empty) {
  private val byName = tables.map(t => t.name -> t).toMap
  def table(name: String): GTable =
    byName.getOrElse(name, throw new IllegalArgumentException(s"unknown table $name"))
  def linksOf(table: GTable): Seq[GExternalLink] =
    links.filter(l => table.dimensionNames.contains(l.dimensionName))
}

/** The testdata star schema expressed as a graft GSchema. */
object TestSchema {
  import org.apache.spark.sql.types._

  val lineitem: GTable = GTable(
    "lineitem",
    timeColumn = "l_shipdate",
    dimensions = Seq(
      GDimension("l_returnflag", StringType),
      GDimension("l_linestatus", StringType),
      GDimension("l_partkey", LongType),
      GDimension("l_suppkey", LongType),
      GDimension("l_orderkey", LongType),
      GDimension("l_linenumber", IntegerType)
    ),
    metrics = Seq(
      GMetric("l_quantity", DoubleType),
      GMetric("l_extendedprice", DoubleType),
      GMetric("l_discount", DoubleType),
      GMetric("l_tax", DoubleType)
    )
  )

  val events: GTable = GTable(
    "events",
    timeColumn = "ts",
    dimensions = Seq(
      GDimension("user_id", LongType),
      GDimension("event_type", StringType)
    ),
    metrics = Seq(GMetric("value", DoubleType)),
    rowTimeSpan = 86400000L
  )

  val schema: GSchema = GSchema(
    tables = Seq(lineitem, events),
    links = Seq(
      GExternalLink("supplier_link", "l_suppkey", "supplier", "s_suppkey", Seq("s_name", "s_nationkey", "s_acctbal")),
      GExternalLink("part_link", "l_partkey", "part", "p_partkey", Seq("p_name", "p_brand", "p_type", "p_size"))
    )
  )
}
