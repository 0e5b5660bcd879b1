package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, File, FileInputStream, FileOutputStream}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LogicalPlan, Window => LWindow}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

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
 * O(n log k) time with O(min(keys, maxRowsInMemory/k)·k) memory.
 *
 * Memory is bounded: when the retained row count passes
 * `spark.graft.topk.maxRowsInMemory` (per partition), the current heaps
 * are spilled to a key-sorted run file and the map is cleared; the final
 * answer is a k-way merge of the runs (top-k of a union == top-k of the
 * per-run top-k's, so runs are lossless). Peak memory is the threshold
 * regardless of key cardinality — high-cardinality inputs degrade to
 * sequential spill I/O instead of OOM.
 *
 * Same planning story as Spark's own TakeOrderedAndProject (the global
 * top-k specialization); this is the per-key generalization.
 */
case class TopKPerKeyExec(
    k: Int,
    partitionExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    rankAttr: Attribute,
    maxRowsInMemory: Int,
    child: SparkPlan
) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numSpills" -> SQLMetrics.createMetric(sparkContext, "number of heap spills"))

  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val partExprs = partitionExprs
    val order = sortOrder
    val kk = k
    val outAttrs = output
    val spillThreshold = math.max(maxRowsInMemory, kk) // always room for one key's heap
    val numSpills = longMetric("numSpills")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val rowOrdering: Ordering[InternalRow] =
        GenerateOrdering.generate(order, childOutput).asInstanceOf[Ordering[InternalRow]]
      // max-heap under the sort order: head = worst kept row (rank k)
      val heaps = new java.util.HashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]]()
      var retained = 0L
      val spillFiles = mutable.ArrayBuffer.empty[File]
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
        spillFiles.foreach(f => if (f.exists()) f.delete())
      })

      /** Dump all heaps to a key-sorted run file and clear the map. */
      def spill(): Unit = if (!heaps.isEmpty) {
        val f = File.createTempFile("graft-topk-spill-", ".run")
        spillFiles += f
        val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(f), 1 << 16))
        try {
          val entries = heaps.entrySet().asScala.toArray
            .sortBy(_.getKey.getBytes)(TopKPerKeyExec.bytesOrdering)
          entries.foreach { e =>
            val keyBytes = e.getKey.getBytes
            out.writeInt(keyBytes.length); out.write(keyBytes)
            val rows = e.getValue.dequeueAll.reverse // ascending (best-first)
            out.writeInt(rows.length)
            rows.foreach { r =>
              val b = r.asInstanceOf[UnsafeRow].getBytes
              out.writeInt(b.length); out.write(b)
            }
          }
        } finally out.close()
        heaps.clear()
        retained = 0L
        numSpills += 1
      }

      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        // Threshold checked per retained row (not only on new-key
        // creation): rows filling EXISTING heaps grow memory too, and
        // interleaved key order would otherwise retain up to k× the
        // bound before any spill fired.
        if (retained >= spillThreshold) spill()
        var heap = heaps.get(key)
        if (heap == null) {
          heap = mutable.PriorityQueue.empty[InternalRow](rowOrdering)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) { heap.enqueue(row.copy()); retained += 1 }
        else if (rowOrdering.compare(row, heap.head) < 0) { heap.dequeue(); heap.enqueue(row.copy()) }
      }

      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      def emit(rowsAscending: Seq[InternalRow]): Iterator[InternalRow] =
        rowsAscending.iterator.zipWithIndex.map { case (row, i) =>
          outProj(joined(row, InternalRow(i + 1)))
        }

      if (spillFiles.isEmpty) {
        heaps.values().asScala.iterator.flatMap(h => emit(h.dequeueAll.reverse.toSeq))
      } else {
        spill() // remainder joins the runs; answer = pure merge of runs
        val nKeyFields = partExprs.length
        val nRowFields = childOutput.length
        val runs = spillFiles.map(f => new TopKPerKeyExec.RunReader(f, nKeyFields, nRowFields))
        // k-way merge by key bytes; equal keys merge their ≤k candidate rows
        val queue = mutable.PriorityQueue.empty[TopKPerKeyExec.RunReader](
          Ordering.by[TopKPerKeyExec.RunReader, Array[Byte]](_.headKeyBytes)(
            TopKPerKeyExec.bytesOrdering).reverse)
        runs.filter(_.advance()).foreach(queue.enqueue(_))
        val merged: Iterator[Seq[InternalRow]] = new Iterator[Seq[InternalRow]] {
          override def hasNext: Boolean = queue.nonEmpty
          override def next(): Seq[InternalRow] = {
            val first = queue.dequeue()
            val keyBytes = first.headKeyBytes
            var candidates = first.headRows
            if (first.advance()) queue.enqueue(first)
            while (queue.nonEmpty &&
                java.util.Arrays.equals(queue.head.headKeyBytes, keyBytes)) {
              val r = queue.dequeue()
              candidates ++= r.headRows
              if (r.advance()) queue.enqueue(r)
            }
            candidates.sorted(rowOrdering).take(kk).toSeq
          }
        }
        merged.flatMap(emit)
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec = copy(child = newChild)
}

object TopKPerKeyExec {

  /** Default per-partition retained-row bound before spilling (~tens of MB). */
  val DefaultMaxRowsInMemory: Int = 1 << 20

  val ConfKey = "spark.graft.topk.maxRowsInMemory"

  /** Unsigned lexicographic byte ordering — consistent key order across runs. */
  val bytesOrdering: Ordering[Array[Byte]] = new Ordering[Array[Byte]] {
    override def compare(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      var c = 0
      while (i < n && c == 0) {
        c = (a(i) & 0xff) - (b(i) & 0xff)
        i += 1
      }
      if (c != 0) c else a.length - b.length
    }
  }

  /** Sequential reader over one spilled run: (key, ≤k ascending rows) records. */
  final class RunReader(file: File, nKeyFields: Int, nRowFields: Int) {
    private val in = new DataInputStream(new BufferedInputStream(new FileInputStream(file), 1 << 16))
    var headKeyBytes: Array[Byte] = _
    var headRows: mutable.ArrayBuffer[InternalRow] = _

    /** Load the next (key, rows) record; false (and close) at EOF. */
    def advance(): Boolean =
      try {
        val keyLen = in.readInt()
        headKeyBytes = new Array[Byte](keyLen)
        in.readFully(headKeyBytes)
        val nRows = in.readInt()
        headRows = new mutable.ArrayBuffer[InternalRow](nRows)
        var i = 0
        while (i < nRows) {
          val len = in.readInt()
          val bytes = new Array[Byte](len)
          in.readFully(bytes)
          val row = new UnsafeRow(nRowFields)
          row.pointTo(bytes, len)
          headRows += row
          i += 1
        }
        true
      } catch {
        case _: EOFException => in.close(); file.delete(); false
      }
  }
}

/**
 * Planner strategy: recognize Filter(row_number <= k) over Window and
 * plan [[TopKPerKeyExec]]. Only fires for the exact safe shape (single
 * row_number window expression, constant k); anything else falls
 * through to Spark's planner.
 *
 * Installed explicitly — graft.sql.GraftFunctions.installTopKStrategy
 * or the GraftExtensions entry point — never as a side effect of
 * function registration, so plain sessions keep Spark's window operator
 * unless the user (or a graft operator that knows its key cardinality)
 * opts in.
 */
case class TopKPerKeyStrategy(spark: SparkSession) extends org.apache.spark.sql.execution.SparkStrategy {

  private object RankLimit {
    def unapply(cond: Expression): Option[(Attribute, Int)] = cond match {
      case LessThanOrEqual(a: Attribute, Literal(v: Int, _)) => Some((a, v))
      // v - 1 would wrap rank < Int.MinValue to k = Int.MaxValue —
      // an always-false filter silently becoming keep-everything
      case LessThan(a: Attribute, Literal(v: Int, _)) if v > Int.MinValue => Some((a, v - 1))
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
      val maxRows = spark.conf
        .getOption(TopKPerKeyExec.ConfKey)
        .map(_.toInt)
        .getOrElse(TopKPerKeyExec.DefaultMaxRowsInMemory)
      TopKPerKeyExec(k, partSpec, orderSpec, alias.toAttribute, maxRows,
        planLater(stripGroupLimit(child))) :: Nil
    case _ => Nil
  }
}
