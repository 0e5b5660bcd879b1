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
    linkJoins: Seq[GExternalLink],
    linkFilters: Seq[(GExternalLink, Column, Boolean)]
) {

  private def copy(
      filters: Seq[Column] = filters,
      fields: Seq[Column] = fields,
      groupings: Seq[Column] = groupings,
      postFilters: Seq[Column] = postFilters,
      limitN: Option[Int] = limitN,
      linkJoins: Seq[GExternalLink] = linkJoins,
      linkFilters: Seq[(GExternalLink, Column, Boolean)] = linkFilters
  ) = new QueryBuilder(
    spark, schema, loadTable, table, filters, fields, groupings, postFilters, limitN, linkJoins, linkFilters)

  /** Mandatory time-range filter (reference queries always carry one).
    * Bounds are validated HERE: under non-ANSI semantics a malformed
    * date casts to NULL, the filter is NULL for every row, and the
    * query silently returns nothing — the reference's validator
    * rejects bad literals, so this surface must too. */
  def timeRange(from: String, to: String): QueryBuilder = {
    def check(s: String): Unit =
      require(
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .stringToTimestamp(
            org.apache.spark.unsafe.types.UTF8String.fromString(s),
            java.time.ZoneOffset.UTC)
          .isDefined,
        s"timeRange bound '$s' is not a valid date/timestamp")
    check(from); check(to)
    copy(filters = filters :+ (col(table.timeColumn) >= lit(from).cast("timestamp") &&
      col(table.timeColumn) < lit(to).cast("timestamp")))
  }

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

  /**
   * Condition on external-link (catalog) fields, pushed down to the
   * FACT SCAN as a dimension filter — the reference's single biggest
   * scan-volume optimization (yupana-core ExternalLinkService.scala:73
   * `transformCondition`, yupana-api ConditionTransformation.scala:37:
   * a link-field predicate becomes `DimIdIn`/`DimIdNotIn` sets before
   * the scan). Spark realization: evaluate the predicate on the (small)
   * catalog, and if the matching key set is bounded turn it into a
   * literal `IN` on the dimension column — Catalyst pushes that into
   * the parquet scan (`PushedFilters: In(dim, ...)`), pruning row
   * groups / partitions instead of post-filtering joined rows. Past
   * the bound it degrades to a broadcast semi-join (still no fact
   * shuffle, no driver blow-up).
   *
   * @param exclude true = reference `NotIn` transformation (rows whose
   *                dimension matches the predicate are dropped)
   */
  def whereLink(link: GExternalLink, condition: Column, exclude: Boolean = false): QueryBuilder =
    copy(linkFilters = linkFilters :+ ((link, condition, exclude)))

  /** Keys at or below this bound become a literal IN-set; above it, a
    * broadcast semi/anti join. Catalog cardinality is bounded metadata
    * (same class as broadcast thresholds), so the cap guards the plan
    * size, not correctness. Tunable per session. */
  private def maxInSetKeys: Int =
    spark.conf.get("spark.graft.link.maxInSetKeys", "10000").toInt

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
    for ((link, cond, exclude) <- linkFilters) {
      // drop NULL catalog keys: a NULL inside an IN-list makes the
      // predicate NULL (row dropped) for every non-matching row, which
      // would turn the exclude path into drop-almost-everything
      val keys = loadTable(link.catalogTable)
        .filter(cond && col(link.catalogKey).isNotNull)
        .select(col(link.catalogKey)).distinct()
      // Bounded probe: take cap+1 — if it overflows, never collect the rest.
      val sample = keys.limit(maxInSetKeys + 1).collect().map(_.get(0))
      if (sample.length <= maxInSetKeys) {
        val in = col(link.dimensionName).isin(sample.toIndexedSeq: _*)
        df = df.filter(if (exclude) !in || col(link.dimensionName).isNull else in)
      } else {
        df = df.join(
          broadcast(keys.withColumnRenamed(link.catalogKey, link.dimensionName)),
          Seq(link.dimensionName),
          if (exclude) "left_anti" else "left_semi")
      }
    }
    for (l <- linkJoins) {
      val cat = broadcast(loadTable(l.catalogTable).select((l.catalogKey +: l.fields).map(col): _*))
      // drop by REFERENCE, not name: a declared link's catalog key is
      // named like the dimension itself (JsonCatalogs.toLink), and
      // drop-by-name after a join removes ALL same-named columns —
      // including the fact's dimension column
      df = df.join(cat, df(l.dimensionName) === cat(l.catalogKey), "left").drop(cat(l.catalogKey))
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
    new QueryBuilder(spark, schema, loadTable, schema.table(tableName), Nil, Nil, Nil, Nil, None, Nil, Nil)
}
