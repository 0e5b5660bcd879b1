package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Automatic query-over-rollup routing — the optimizer tier of the
 * rollup story (reference users query rollup tables BY NAME, e.g.
 * receiptByDay in yupana-schema ReceiptRollups.scala; graft routes
 * transparently, the Spark-idiomatic materialized-view rewrite).
 *
 * A registered [[RollupRoute]] declares the mapping fact → materialized
 * rollup: time grain, dimension columns, and which rollup column holds
 * each metric's partial sum / the group count. [[RollupRewriteRule]]
 * then rewrites any covered aggregate over the FACT scan into the same
 * aggregate over the (orders-of-magnitude smaller) rollup:
 *
 *   - GROUP BY date_trunc(G, ts) with G at-or-coarser-than the rollup
 *     grain (grain-aligned: day→month/quarter/year, hour→day, …,
 *     week only from ≤day grains), plus any subset of rollup dims;
 *   - sum(m) / sum(cast(m as decimal)) → sum(rollup_sum_col),
 *     count(*)/count(1) → sum(rollup_count_col), min/max → min/max —
 *     re-aggregation is exact because sum/count/min/max are
 *     decomposable; avg/distinct are NOT matched (not decomposable
 *     from these partials) and leave the query on the fact;
 *   - WHERE conditions referencing only rollup dims are carried over.
 *
 * The rewrite preserves output names, exprIds, and types (casting the
 * re-aggregated sum back to the original result type), so it is
 * plug-compatible for any parent operator. Queries or aggregates not
 * fully covered are left untouched — correctness never depends on the
 * route, only speed.
 */
final case class RollupRoute(
    factPathContains: String,
    rollupPath: String,
    timeCol: String,
    grain: String,
    dims: Seq[String],
    sums: Map[String, String],
    countCol: Option[String] = None,
    mins: Map[String, String] = Map.empty,
    maxs: Map[String, String] = Map.empty
)

/** Session-wide route registry (rollupPath is the identity). */
object RollupRoutes {
  @volatile private var routes: Seq[RollupRoute] = Nil
  def register(r: RollupRoute): Unit = synchronized {
    routes = routes.filterNot(_.rollupPath == r.rollupPath) :+ r
  }
  def unregister(rollupPath: String): Unit = synchronized {
    routes = routes.filterNot(_.rollupPath == rollupPath)
  }
  def clear(): Unit = synchronized { routes = Nil }
  def all: Seq[RollupRoute] = routes
}

case class RollupRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val grainRank =
    Map("second" -> 0, "minute" -> 1, "hour" -> 2, "day" -> 3, "month" -> 4, "quarter" -> 5, "year" -> 6)

  /** Is re-truncating a `from`-grain time to `to` grain exact? */
  private def coarsenOk(from: String, to: String): Boolean =
    from == to ||
      (grainRank.contains(from) && grainRank.contains(to) && grainRank(to) > grainRank(from)) ||
      (to == "week" && grainRank.get(from).exists(_ <= grainRank("day")))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val routes = RollupRoutes.all
    if (routes.isEmpty) plan
    else {
      // among covering rollups prefer the coarsest grain — it is the
      // smallest table (each coarsening step collapses groups)
      val ordered = routes.sortBy(r => -grainRank.getOrElse(r.grain, -1))
      plan.transformUp {
        case agg: Aggregate =>
          ordered.view.flatMap(r => tryRewrite(agg, r)).headOption.getOrElse(agg)
      }
    }
  }

  private def tryRewrite(agg: Aggregate, route: RollupRoute): Option[LogicalPlan] = {
    // 1. the aggregate's child must be the fact scan, modulo dim-only
    //    filters and projections. Projections may carry aliases — the
    //    optimizer's PullOutGroupingExpressions extracts date_trunc into
    //    a `_groupingexpression` alias below the Aggregate — so alias
    //    definitions are collected and inlined back before matching.
    def strip(
        p: LogicalPlan,
        conds: Seq[Expression],
        subs: Map[ExprId, Expression]
    ): Option[(Seq[Expression], Map[ExprId, Expression], LogicalRelation)] =
      p match {
        case lr: LogicalRelation if isFactScan(lr, route) => Some((conds, subs, lr))
        case f: Filter => strip(f.child, conds :+ f.condition, subs)
        case pr: Project if pr.projectList.forall {
              case _: AttributeReference => true
              case a: Alias => a.child.deterministic
              case _ => false
            } =>
          val newSubs = pr.projectList.collect { case a: Alias => a.exprId -> a.child }.toMap
          strip(pr.child, conds, subs ++ newSubs)
        case _ => None
      }

    strip(agg.child, Nil, Map.empty).flatMap { case (conds0, subs, fact) =>
      // inline alias chains to fixpoint (substitution targets are strictly
      // lower plan nodes, so this terminates)
      def inline(e: Expression): Expression = {
        var cur = e
        var next = cur.transformUp {
          case a: AttributeReference if subs.contains(a.exprId) => subs(a.exprId)
        }
        while (!next.fastEquals(cur)) {
          cur = next
          next = cur.transformUp {
            case a: AttributeReference if subs.contains(a.exprId) => subs(a.exprId)
          }
        }
        next
      }
      val conds = conds0.map(inline)
      val factAttr: Map[String, AttributeReference] = fact.output.map(a => a.name -> a).toMap
      val dimAttrIds = route.dims.flatMap(factAttr.get).map(_.exprId).toSet

      // 2. resolve the rollup relation (fresh analyzed scan; attr lookups by name)
      val rollupPlan = spark.read.parquet(route.rollupPath).queryExecution.analyzed
      val rAttr: Map[String, Attribute] = rollupPlan.output.map(a => a.name -> a).toMap
      rAttr.get("rollup_time").flatMap { rollupTime =>

      def isFactTime(a: AttributeReference) =
        a.name == route.timeCol && factAttr.get(route.timeCol).exists(_.exprId == a.exprId)

      // grouping expression → rollup-side expression
      def mapGroup(e: Expression): Option[Expression] = e match {
        case a: AttributeReference if dimAttrIds.contains(a.exprId) => rAttr.get(a.name)
        case t @ TruncTimestamp(Literal(fmt: UTF8String, _), a: AttributeReference, _)
            if isFactTime(a) && coarsenOk(route.grain, fmt.toString.toLowerCase) =>
          if (fmt.toString.equalsIgnoreCase(route.grain)) Some(rollupTime)
          else Some(t.withNewChildren(Seq(t.children.head, rollupTime)))
        case _ => None
      }

      def metricName(e: Expression): Option[String] = e match {
        case a: AttributeReference if factAttr.get(a.name).exists(_.exprId == a.exprId) => Some(a.name)
        case c: Cast => metricName(c.child)
        case _ => None
      }

      def mapAgg(ae: AggregateExpression): Option[Expression] = {
        if (ae.isDistinct || ae.filter.isDefined || ae.mode != Complete) return None
        val rolled: Option[AggregateFunction] = ae.aggregateFunction match {
          case s: Sum => metricName(s.child).flatMap(route.sums.get).flatMap(rAttr.get).map(Sum(_))
          case Count(Seq(l: Literal)) if l.foldable => route.countCol.flatMap(rAttr.get).map(Sum(_))
          case m: Min => metricName(m.child).flatMap(route.mins.get).flatMap(rAttr.get).map(Min(_))
          case m: Max => metricName(m.child).flatMap(route.maxs.get).flatMap(rAttr.get).map(Max(_))
          case _ => None
        }
        rolled.map { nf =>
          val nae = AggregateExpression(nf, Complete, isDistinct = false)
          val typed: Expression = if (nae.dataType == ae.dataType) nae else Cast(nae, ae.dataType)
          // count(*) is non-nullable but sum(count_col) is nullable; the
          // value can't actually be null for an existing group, so pin
          // the static type back with a zero fallback
          if (!ae.nullable && typed.nullable) Coalesce(Seq(typed, Literal.default(ae.dataType)))
          else typed
        }
      }

      // any expression in the aggregate list: groupings, aggregates, and
      // arbitrary arithmetic over them; a bare fact attribute that is
      // neither dim nor time fails the whole rewrite
      def mapExpr(e: Expression): Option[Expression] =
        mapGroup(e).orElse(e match {
          case ae: AggregateExpression => mapAgg(ae)
          case a: AttributeReference if factAttr.get(a.name).exists(_.exprId == a.exprId) => None
          case _ if e.children.nonEmpty =>
            val kids = e.children.map(mapExpr)
            if (kids.forall(_.isDefined)) Some(e.withNewChildren(kids.map(_.get))) else None
          case leaf => Some(leaf)
        })

      val newGroups = agg.groupingExpressions.map(e => mapGroup(inline(e)))
      val newAggs: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
        case al @ Alias(child, name) =>
          mapExpr(inline(child)).map(ne =>
            Alias(ne, name)(exprId = al.exprId, qualifier = al.qualifier,
              explicitMetadata = al.explicitMetadata))
        case a: AttributeReference =>
          mapExpr(inline(a)).map {
            case ne: NamedExpression if ne.exprId == a.exprId => ne
            case ne => Alias(ne, a.name)(exprId = a.exprId)
          }
        case _ => None
      }
      // a time literal is routable when truncating it at the rollup grain
      // is a no-op — then every fact row in [lo, hi) maps to a rollup_time
      // in the same range and the comparison is exact on the rollup
      def grainAligned(l: Literal): Boolean =
        l.value != null && l.dataType == org.apache.spark.sql.types.TimestampType &&
          (try {
            TruncTimestamp(Literal(UTF8String.fromString(route.grain)), l,
              Some(spark.sessionState.conf.sessionLocalTimeZone)).eval() == l.value
          } catch { case scala.util.control.NonFatal(_) => false })

      // dim-only filters and grain-aligned time-range bounds carry over;
      // anything else blocks the route
      def mapCond(c: Expression): Option[Expression] = c match {
        case And(l, r) => for (nl <- mapCond(l); nr <- mapCond(r)) yield And(nl, nr)
        // inferred null guard: null-ts rows land in the null rollup_time group
        case IsNotNull(a: AttributeReference) if isFactTime(a) => Some(IsNotNull(rollupTime))
        case GreaterThanOrEqual(a: AttributeReference, l: Literal) if isFactTime(a) && grainAligned(l) =>
          Some(GreaterThanOrEqual(rollupTime, l))
        case LessThan(a: AttributeReference, l: Literal) if isFactTime(a) && grainAligned(l) =>
          Some(LessThan(rollupTime, l))
        case GreaterThan(l: Literal, a: AttributeReference) if isFactTime(a) && grainAligned(l) =>
          Some(GreaterThan(l, rollupTime))
        case LessThanOrEqual(l: Literal, a: AttributeReference) if isFactTime(a) && grainAligned(l) =>
          Some(LessThanOrEqual(l, rollupTime))
        case _ if c.deterministic && c.references.forall(r => dimAttrIds.contains(r.exprId)) =>
          Some(c.transform { case a: AttributeReference if dimAttrIds.contains(a.exprId) => rAttr(a.name) })
        case _ => None
      }
      val newConds = conds.map(mapCond)

      if (newGroups.exists(_.isEmpty) || newAggs.exists(_.isEmpty) || newConds.exists(_.isEmpty)) None
      else {
        val child = newConds.map(_.get).foldRight(rollupPlan)((c, p) => Filter(c, p))
        val rewritten = Aggregate(newGroups.map(_.get), newAggs.map(_.get), child)
        // the rewrite must be plug-compatible: same names and types
        if (rewritten.schema == agg.schema) Some(rewritten) else None
      }
      }
    }
  }

  private def isFactScan(lr: LogicalRelation, route: RollupRoute): Boolean =
    lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.exists(_.toString.contains(route.factPathContains))
      case _ => false
    }
}
