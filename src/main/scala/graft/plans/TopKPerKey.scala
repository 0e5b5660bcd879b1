package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LogicalPlan, Window => LWindow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, AllTuples}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/**
 * Whole-operator extension ((c)-tier): a custom physical operator,
 * planned through an injected Strategy, that accelerates the standard
 * top-k-per-key pattern
 *
 *   `df.withColumn("rank", row_number().over(partitionBy(k).orderBy(o)))
 *      .filter($"rank" <= k)`
 *
 * Spark's Window operator SORTS every partition's full row set before
 * ranking — at 100 TB of candidates that sort dominates the query. This
 * operator keeps a bounded heap of k rows per key instead:
 * O(n log k) with O(keys·k) memory, no per-partition mega-sort. The
 * planner rule matches the user-facing pattern, so query code does not
 * change — registering graft.sql.GraftExtensions is enough.
 *
 * Same planning story as Spark's own TakeOrderedAndProject (the global
 * top-k specialization); this is the per-key generalization.
 *
 * Memory: O(distinct keys in partition × k) rows held on-heap, with no
 * spill — the right trade when k is small and keys per partition are
 * bounded (the rank-filter pattern's normal shape). For huge key
 * cardinality per partition prefer the window operator (sorts spill);
 * remove the strategy from extraStrategies to opt out per session.
 */
case class TopKPerKeyExec(
    k: Int,
    partitionExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    rankAttr: Attribute,
    child: SparkPlan
) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val partExprs = partitionExprs
    val order = sortOrder
    val kk = k
    val outAttrs = output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val rowOrdering: Ordering[InternalRow] =
        GenerateOrdering.generate(order, childOutput).asInstanceOf[Ordering[InternalRow]]
      // max-heap under the sort order: head = worst kept row (rank k)
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](rowOrdering)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (rowOrdering.compare(row, heap.head) < 0) { heap.dequeue(); heap.enqueue(row.copy()) }
      }
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap { heap =>
        val ascending = heap.dequeueAll.reverse // dequeueAll is worst-first
        ascending.iterator.zipWithIndex.map { case (row, i) =>
          outProj(joined(row, InternalRow(i + 1)))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec = copy(child = newChild)
}

/**
 * Planner strategy: recognize Filter(row_number <= k) over Window and
 * plan [[TopKPerKeyExec]]. Only fires for the exact safe shape (single
 * row_number window expression, constant k); anything else falls
 * through to Spark's planner.
 */
case class TopKPerKeyStrategy(spark: SparkSession) extends org.apache.spark.sql.execution.SparkStrategy {

  private object RankLimit {
    def unapply(cond: Expression): Option[(Attribute, Int)] = cond match {
      case LessThanOrEqual(a: Attribute, Literal(v: Int, _)) => Some((a, v))
      case LessThan(a: Attribute, Literal(v: Int, _)) => Some((a, v - 1))
      case GreaterThanOrEqual(Literal(v: Int, _), a: Attribute) => Some((a, v))
      case _ => None
    }
  }

  /** Strip the sort-based WindowGroupLimit the optimizer inserts — the heap subsumes it. */
  private def stripGroupLimit(p: LogicalPlan): LogicalPlan = p match {
    case g: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit => g.child
    case other => other
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LFilter(
          RankLimit(rankRef, k),
          LWindow(
            Seq(alias @ Alias(WindowExpression(_: RowNumber, WindowSpecDefinition(partSpec, orderSpec, _)), _)),
            _,
            _,
            child,
            _
          )
        ) if k > 0 && alias.toAttribute.semanticEquals(rankRef) =>
      TopKPerKeyExec(k, partSpec, orderSpec, alias.toAttribute, planLater(stripGroupLimit(child))) :: Nil
    case _ => Nil
  }
}
