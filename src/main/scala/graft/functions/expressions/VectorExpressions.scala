package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/**
 * Native vector-index expressions.
 *
 * Centroid tables are tiny, bounded metadata (numCells × dim floats) —
 * the standard IVF design ships them with the plan, so cell assignment
 * is a narrow per-row argmin instead of a crossJoin + window
 * row_number over |corpus| × numCells rows (two shuffles and a sort
 * saved per pass at any scale).
 *
 * All three expressions are codegen-capable: generated code calls the
 * static [[VectorOps]] kernels with the centroid table attached as a
 * codegen reference object, so scans stay inside one whole-stage span.
 */
object VectorOps {
  /** Squared L2 distance between an ArrayData float vector and a centroid. */
  @inline final def dist2(v: ArrayData, c: Array[Float]): Double = {
    val n = math.min(v.numElements(), c.length)
    var d = 0.0
    var i = 0
    while (i < n) {
      val diff = v.getFloat(i).toDouble - c(i).toDouble
      d += diff * diff
      i += 1
    }
    d
  }

  /** [[nearest]] over a plain float array — same math and tie-break, for
    * driver-local quantizer training on a bounded sample. */
  def nearestLocal(v: Array[Float], centroids: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val n = math.min(v.length, cent.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val diff = v(i).toDouble - cent(i).toDouble
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Static kernel: index of the nearest centroid (ties → lowest index). */
  def nearest(v: ArrayData, centroids: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val d = dist2(v, centroids(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Static kernel: `probes` nearest centroid indices, ascending by (distance, index). */
  def nearestK(v: ArrayData, centroids: Array[Array[Float]], probes: Int): ArrayData = {
    val ds = Array.tabulate(centroids.length)(c => (dist2(v, centroids(c)), c))
    val top = ds.sortBy(t => (t._1, t._2)).take(math.min(probes, ds.length)).map(_._2)
    new GenericArrayData(top)
  }

  /** Static kernel: sign bits against `planes` deterministic hyperplanes, packed into a long. */
  def hyperplaneBits(v: ArrayData, planes: Int): Long = {
    val n = v.numElements()
    var bits = 0L
    var j = 0
    while (j < planes) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        val h = Mix.splitmix64(j.toLong * 0x9E3779B97F4A7C15L + i.toLong)
        dot += v.getFloat(i).toDouble * (h.toDouble / Long.MaxValue.toDouble)
        i += 1
      }
      if (dot > 0) bits |= (1L << j)
      j += 1
    }
    bits
  }
}

/** Index of the nearest centroid (ties → lowest index). */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]]) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_nearest_centroid"

  override protected def nullSafeEval(input: Any): Any =
    VectorOps.nearest(input.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.VectorOps.nearest($c, $cents);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid = copy(child = newChild)
}

/** Indices of the `probes` nearest centroids, ascending by distance (ties → lower index). */
case class NearestCentroids(child: Expression, centroids: Array[Array[Float]], probes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_centroids"

  override protected def nullSafeEval(input: Any): Any =
    VectorOps.nearestK(input.asInstanceOf[ArrayData], centroids, probes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.VectorOps.nearestK($c, $cents, $probes);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids = copy(child = newChild)
}

/**
 * Sign bits against `planes` deterministic pseudo-random hyperplanes
 * (component (j,i) = splitmix-derived value in [-1,1)), packed into a
 * long. Replaces a planes×dim interpreted lambda pipeline per row.
 */
case class HyperplaneBits(child: Expression, planes: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_bits"

  override protected def nullSafeEval(input: Any): Any =
    VectorOps.hyperplaneBits(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.VectorOps.hyperplaneBits($c, $planes);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBits = copy(child = newChild)
}
