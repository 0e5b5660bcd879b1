package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.{GExternalLink, GSchema, GTable}

/**
 * graft query core: the reference Query model
 * (yupana-api/src/main/scala/org/yupana/api/query/Query.scala:38 —
 * table / fields / filter / groupBy / postFilter / limit) declared as a
 * Catalyst logical plan. The reference runs its own optimizer
 * (yupana-core QueryOptimizer.scala: constant folding, and/or
 * simplification) and a hand-built map-reduce pipeline (TsdbBase.scala);
 * on Spark both are native: Catalyst folds constants and pushes the
 * time-range/dimension filters into the parquet scan, and groupBy gets
 * map-side partial aggregation for free.
 */
final class QueryBuilder private (
    spark: SparkSession,
    schema: GSchema,
    loadTable: String => DataFrame,
    table: GTable,
    filters: Seq[Column],
    fields: Seq[Column],
    groupings: Seq[Column],
    postFilters: Seq[Column],
    limitN: Option[Int],
    linkJoins: Seq[GExternalLink]
) {

  private def copy(
      filters: Seq[Column] = filters,
      fields: Seq[Column] = fields,
      groupings: Seq[Column] = groupings,
      postFilters: Seq[Column] = postFilters,
      limitN: Option[Int] = limitN,
      linkJoins: Seq[GExternalLink] = linkJoins
  ) = new QueryBuilder(spark, schema, loadTable, table, filters, fields, groupings, postFilters, limitN, linkJoins)

  /** Mandatory time-range filter (reference queries always carry one). */
  def timeRange(from: String, to: String): QueryBuilder =
    copy(filters = filters :+ (col(table.timeColumn) >= lit(from).cast("timestamp") &&
      col(table.timeColumn) < lit(to).cast("timestamp")))

  def where(c: Column): QueryBuilder = copy(filters = filters :+ c)

  def select(cs: Column*): QueryBuilder = copy(fields = fields ++ cs)

  def groupBy(cs: Column*): QueryBuilder = copy(groupings = groupings ++ cs)

  /** HAVING — the reference postFilter (applied after aggregation). */
  def having(c: Column): QueryBuilder = copy(postFilters = postFilters :+ c)

  def limit(n: Int): QueryBuilder = copy(limitN = Some(n))

  /**
   * External-link enrichment (reference ExternalLinkService): joins the
   * catalog on the dimension key. Catalogs are broadcast — at 100 TB
   * fact scale the fact side never shuffles for enrichment.
   */
  def withLink(link: GExternalLink): QueryBuilder = copy(linkJoins = linkJoins :+ link)

  def build(): DataFrame = {
    try buildUnchecked()
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        // reference QueryValidator parity: resolve errors surface with the
        // table's schema so a bad field name is immediately diagnosable
        val cols = (table.columnNames ++ linkJoins.flatMap(_.fields)).mkString(", ")
        throw new IllegalArgumentException(
          s"invalid query against table '${table.name}' (available columns: $cols): ${e.getMessage}",
          e
        )
    }
  }

  private def buildUnchecked(): DataFrame = {
    var df = loadTable(table.name)
    for (l <- linkJoins) {
      val cat = broadcast(loadTable(l.catalogTable).select((l.catalogKey +: l.fields).map(col): _*))
      df = df.join(cat, df(l.dimensionName) === cat(l.catalogKey), "left").drop(l.catalogKey)
    }
    for (f <- filters) df = df.filter(f)
    var out =
      if (groupings.nonEmpty) df.groupBy(groupings: _*).agg(fields.head, fields.tail: _*)
      else df.select(fields: _*)
    for (pf <- postFilters) out = out.filter(pf)
    limitN.foreach(n => out = out.limit(n))
    out
  }
}

object QueryBuilder {
  def apply(spark: SparkSession, schema: GSchema, loadTable: String => DataFrame, tableName: String): QueryBuilder =
    new QueryBuilder(spark, schema, loadTable, schema.table(tableName), Nil, Nil, Nil, Nil, None, Nil)
}
