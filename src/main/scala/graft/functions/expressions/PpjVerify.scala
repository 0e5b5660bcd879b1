package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * PPJoin candidate verification (Xiao, Wang, Lin, Yu, "Efficient
 * Similarity Joins for Near Duplicate Detection", WWW 2008 §3.3-§4):
 * given two documents' gram arrays sorted by the SAME canonical order
 * and the 0-based positions of their FIRST shared prefix token,
 * returns the EXACT distinct-gram intersection size, or -1 when the
 * pair is PROVABLY below the jaccard threshold — decided by
 *
 *  1. the paper's SUFFIX FILTER: a recursive partition-probe of the
 *     two suffixes (the tokens after the first shared position) that
 *     lower-bounds their hamming distance without scanning them —
 *     each probe binary-searches one suffix's median token in the
 *     other, splits both, and sums per-part |length-difference|
 *     bounds (depth-limited); a bound above the threshold's hamming
 *     allowance kills the candidate in O(log) comparisons;
 *  2. EARLY-TERMINATING merge intersection: because both arrays share
 *     one sort order and no shared token precedes the seed positions
 *     (the caller feeds the FIRST shared prefix token — any earlier
 *     shared token would contradict its minimality), the merge starts
 *     AT the seeds with overlap 1 and aborts as soon as
 *     matched + min(remaining) cannot reach the required overlap.
 *
 * The required overlap is the SMALLEST integer m whose double-domain
 * jaccard m/(|a|+|b|-m) passes `>= threshold` — computed with the
 * exact comparison the final SQL filter uses, so pruning can never
 * disagree with the unpruned plan at a floating-point boundary:
 * -1 is returned only for pairs the jac filter would drop anyway
 * (result-identity is spec-enforced against the dense route).
 *
 * Token strings are compared with UTF8String binary order — the same
 * order `sort_array` applied when the caller built the arrays.
 */
case class PpjVerify(
    toksA: Expression, toksB: Expression, posA: Expression, posB: Expression,
    threshold: Double)
    extends QuaternaryExpression {

  override def first: Expression = toksA
  override def second: Expression = toksB
  override def third: Expression = posA
  override def fourth: Expression = posB

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_ppj_verify"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = toksA.dataType.isInstanceOf[ArrayType] &&
      toksA.dataType.asInstanceOf[ArrayType].elementType == StringType &&
      toksB.dataType.isInstanceOf[ArrayType] &&
      toksB.dataType.asInstanceOf[ArrayType].elementType == StringType &&
      posA.dataType == IntegerType && posB.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<string>, array<string>, int, int)")
  }

  override protected def nullSafeEval(a: Any, b: Any, pa: Any, pb: Any): Any =
    PpjVerify.verify(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      pa.asInstanceOf[Int], pb.asInstanceOf[Int], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, pa, pb) =>
      s"${ev.value} = graft.functions.expressions.PpjVerify.verify($a, $b, $pa, $pb, $threshold);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): PpjVerify =
    copy(toksA = newFirst, toksB = newSecond, posA = newThird, posB = newFourth)
}

object PpjVerify {

  /** Depth cap for the suffix filter's recursive partition probe —
    * the paper's MAXDEPTH (2 probes resolve most false candidates;
    * deeper probes cost more than the merge they'd save). */
  private val MaxDepth = 2

  /** Smallest integer overlap whose jaccard passes the double-domain
    * `>= t` filter for set sizes (szA, szB) — exact agreement with the
    * SQL-side filter is what makes pruning result-identical.
    * Int.MaxValue when even the full min(szA, szB) overlap cannot
    * pass (the caller's length filter normally precludes this). */
  def minOverlap(szA: Int, szB: Int, t: Double): Int = {
    val mMax = math.min(szA, szB)
    var m = math.ceil(t * (szA + szB) / (1.0 + t)).toInt
    if (m < 1) m = 1
    if (m > mMax) m = mMax
    while (m > 1 && (m - 1).toDouble / (szA + szB - (m - 1)) >= t) m -= 1
    while (m <= mMax && m.toDouble / (szA + szB - m) < t) m += 1
    if (m > mMax) Int.MaxValue else m
  }

  /** Static kernel, callable from generated Java. `pa`/`pb` are the
    * 0-based positions of the first shared token in THESE arrays'
    * sort order, or -1/-1 when the caller's seed positions refer to a
    * different canonical order (e.g. rarity-ranked prefixes verified
    * against lexicographic arrays): the suffix filter then bounds the
    * FULL arrays' hamming distance and the merge runs from (0, 0) —
    * same exactness, one extra pass over the already-matched heads. */
  def verify(a: ArrayData, b: ArrayData, pa: Int, pb: Int, threshold: Double): Int = {
    val szA = a.numElements()
    val szB = b.numElements()
    val alpha = minOverlap(szA, szB, threshold)
    if (alpha == Int.MaxValue) return -1
    val seeded = pa >= 0 && pb >= 0
    // suffix allowance: the (suffix) arrays must still contribute
    // alpha (minus any banked seed match) shared tokens, i.e. their
    // hamming distance is at most lenA + lenB - 2*needed
    val lenSa = if (seeded) szA - pa - 1 else szA
    val lenSb = if (seeded) szB - pb - 1 else szB
    val needed = if (seeded) alpha - 1 else alpha
    val hmax = lenSa + lenSb - 2 * needed
    if (hmax < 0) return -1
    val sl = if (seeded) pa + 1 else 0
    val tl = if (seeded) pb + 1 else 0
    if (suffixBound(a, sl, szA, b, tl, szB, hmax, MaxDepth) > hmax) return -1
    // early-terminating merge (seed match banked when seeded)
    var matched = if (seeded) 1 else 0
    var i = sl
    var j = tl
    while (i < szA && j < szB) {
      if (matched + math.min(szA - i, szB - j) < alpha) return -1
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c < 0) i += 1
      else if (c > 0) j += 1
      else { matched += 1; i += 1; j += 1 }
    }
    matched
  }

  /** First index in a[lo, hi) whose token is >= w (binary search in
    * the arrays' shared sort order). */
  private def lowerBound(a: ArrayData, lo0: Int, hi0: Int, w: UTF8String): Int = {
    var lo = lo0
    var hi = hi0
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a.getUTF8String(mid).compareTo(w) < 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Lower bound on the hamming distance between a[al, ar) and
    * b[bl, br) (the paper's SuffixFilter): probe b's median token,
    * binary-search it in a, split both around it, and recurse with
    * the remaining allowance; leaves bound by |length difference|.
    * Always a true lower bound — pruning with it is result-safe. */
  private def suffixBound(
      a: ArrayData, al: Int, ar: Int,
      b: ArrayData, bl: Int, br: Int,
      hmax: Int, depth: Int): Int = {
    val lenA = ar - al
    val lenB = br - bl
    if (lenA == 0 || lenB == 0) return lenA + lenB
    val diff = math.abs(lenA - lenB)
    if (depth == 0 || diff > hmax) return diff
    val mid = (bl + br) >>> 1
    val w = b.getUTF8String(mid)
    val p = lowerBound(a, al, ar, w)
    val found = p < ar && a.getUTF8String(p).compareTo(w) == 0
    val probeCost = if (found) 0 else 1
    // cheap right-part bound first: an early prune skips the recursion
    val rightQuick = math.abs((ar - (if (found) p + 1 else p)) - (br - mid - 1))
    val hl = suffixBound(a, al, p, b, bl, mid, hmax - probeCost - rightQuick, depth - 1)
    if (hl + probeCost + rightQuick > hmax) return hl + probeCost + rightQuick
    val hr = suffixBound(a, if (found) p + 1 else p, ar, b, mid + 1, br,
      hmax - probeCost - hl, depth - 1)
    hl + hr + probeCost
  }
}
