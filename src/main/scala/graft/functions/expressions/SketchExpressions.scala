package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the sketch hot paths.
 *
 * The `aggregate`/`zip_with`/`transform` higher-order functions are
 * CodegenFallback in Spark — every lambda step allocates and boxes —
 * and the explode → 64-partial-agg formulation of minhash/simhash pays
 * a shuffle of |corpus|×|shingles| rows. These expressions compute a
 * whole signature in one tight per-row loop: no explode, no shuffle,
 * no boxing; the signature stage becomes a narrow map that scales
 * linearly to any corpus size.
 *
 * xxhash64 seeding matches nothing external by design (signatures are
 * engine-internal); determinism is what matters and DJB-free splitmix
 * mixing is stable across JVMs.
 */
object Mix {
  /** splitmix64 finalizer — cheap 64-bit family derivation. */
  @inline final def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** xxh64-style string hash via Spark's unsafe murmur + splitmix widen. */
  @inline final def hashString(u: UTF8String): Long = {
    val h32 = Murmur3_x86_32.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42)
    splitmix64((h32.toLong << 32) | (u.numBytes.toLong & 0xffffffffL))
  }
}

/**
 * MinHash signature of an array<string>: k permutation-minima computed
 * in one pass (hash each element once, derive the k-member family by
 * splitmix-mixing with the member index).
 */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.expressions.MinHashSignature.compute($c, $k);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature = copy(child = newChild)
}

object MinHashSignature {
  /** Static kernel, callable from generated Java.
    *
    * An EMPTY input set has no signature: returning the all-MaxValue
    * initial state would give every empty-set doc the same signature —
    * they band together, form a quadratic LSH bucket, and estimate
    * jaccard 1.0 against each other (the exact all-MaxValue collision
    * TextSketch's short-doc floor exists to prevent). NULL instead:
    * band keys explode to no rows, so empty docs simply never pair. */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = Mix.hashString(arr.getUTF8String(i))
      var j = 0
      while (j < k) {
        val m = Mix.splitmix64(h ^ (j.toLong * 0xC2B2AE3D27D4EB4FL))
        if (m < mins(j)) mins(j) = m
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/**
 * 64-bit SimHash of an array<string>: per-element hash votes ±1 per bit
 * position; bit set where the vote sum is positive. One pass, no state
 * beyond 64 ints.
 */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(child = newChild)
}

object SimHash64 {
  /** Static kernel, callable from generated Java. */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = Mix.hashString(arr.getUTF8String(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/**
 * Dot product of two numeric arrays (sequential index-order summation —
 * bit-identical to the `aggregate(zip_with(...))` fold it replaces).
 * Accepts float or double arrays; result is double. Null semantics match
 * the zip_with formulation exactly, so the fusion rule can substitute it
 * unconditionally: NULL on length mismatch (zip_with pads with null) and
 * NULL when any element is null (the fold's acc + NULL).
 */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def nullable: Boolean = true

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType ==
      org.apache.spark.sql.types.FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloat(left), isFloat(right))

  // Inline primitive loop (the CosineSimilarity discipline) — the
  // previous static-kernel call boxed a java.lang.Double per
  // invocation, which on an 860M-candidate join is 860M short-lived
  // allocations of pure GC pressure. Element getters are specialized
  // at codegen time from the input types (no per-element branch).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val anyNull = ctx.freshName("anyNull")
      def get(arr: String, fl: Boolean): String =
        if (fl) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = $x.numElements();
         |double $dot = 0.0;
         |boolean $anyNull = ($y.numElements() != $n);
         |for (int $i = 0; !$anyNull && $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { $anyNull = true; break; }
         |  $dot += ${get(x, isFloat(left))} * ${get(y, isFloat(right))};
         |}
         |if ($anyNull) { ${ev.isNull} = true; } else { ${ev.value} = $dot; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Static kernel; boxed null = SQL NULL (length mismatch / null element),
    * preserving the zip_with-fold semantics the fusion rule substitutes. */
  def compute(x: ArrayData, y: ArrayData, xf: Boolean, yf: Boolean): java.lang.Double = {
    @inline def get(a: ArrayData, isFloat: Boolean, i: Int): Double =
      if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var dot = 0.0
      var i = 0
      var anyNull = false
      while (i < n && !anyNull) {
        if (x.isNullAt(i) || y.isNullAt(i)) anyNull = true
        else { dot += get(x, xf, i) * get(y, yf, i); i += 1 }
      }
      if (anyNull) null else java.lang.Double.valueOf(dot)
    }
  }
}

/**
 * Cosine similarity of two float arrays with full codegen: one fused
 * loop accumulating dot, |a|² and |b|² — bit-identical to the
 * fold-based formulation (`dot/(sqrt(na)*sqrt(nb))`, per-accumulator
 * sequential summation), so it is interchangeable with the DuckDB
 * oracle arithmetic, but ~10x cheaper than the interpreted
 * zip_with/aggregate path and it keeps the surrounding operators
 * inside whole-stage codegen.
 *
 * Degenerate vectors: cosine is UNDEFINED for a zero-norm vector
 * (IEEE 0/0 = NaN) and for vectors carrying NaN elements, so any NaN
 * result is returned as SQL NULL. This is load-bearing for every
 * `cos >= threshold` dedup filter downstream: Spark (and DuckDB) order
 * NaN ABOVE every number, so a NaN cosine would silently satisfy any
 * threshold and pair a degenerate vector with the whole corpus —
 * connected components would then collapse the corpus into one
 * cluster. NULL `>= t` is never true, so degenerate vectors simply
 * never pair. (Oracle SQL mirrors this with a `NOT isnan(cos)` guard.)
 */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  // The eval/codegen bodies read elements with getFloat; reject anything
  // that is not array<float> at analysis time instead of silently
  // misreading the buffer (e.g. array<double> built from SQL literals).
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.FloatType, _),
            ArrayType(org.apache.spark.sql.types.FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<float> arguments, got ${l.catalogString} and ${r.catalogString}")
    }

  // Null ELEMENTS (containsNull arrays) return SQL NULL, matching
  // DotProduct: the interpreted path would otherwise NPE unboxing a
  // null from GenericArrayData while the unsafe path silently read
  // 0.0f — a crash on one physical layout and a wrong answer on the
  // other, for the same row.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // dimension mismatch has no defined cosine: truncating to the
    // common prefix (the old behavior) could score a corrupted vector
    // ABOVE a dedup threshold — NULL matches DotProduct, the fold
    // formulation (zip_with pads with null), and the oracle
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val res = dot / (math.sqrt(na) * math.sqrt(nb))
    if (java.lang.Double.isNaN(res)) null else java.lang.Double.valueOf(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val anyNull = ctx.freshName("anyNull")
      s"""
         |int $n = $x.numElements();
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |boolean $anyNull = ($y.numElements() != $n);
         |for (int $i = 0; !$anyNull && $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { $anyNull = true; break; }
         |  double $xv = (double) $x.getFloat($i);
         |  double $yv = (double) $y.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |if ($anyNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  if (java.lang.Double.isNaN(${ev.value})) { ${ev.isNull} = true; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
