package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Distinct sliding character n-grams of a string, first-occurrence
 * order — exactly `array_distinct(transform(sequence(1,
 * greatest(len-(n-1),1)), i -> substr(s, i, n)))` (and the DuckDB
 * oracle's list_distinct/substr formulation), but one per-row loop
 * instead of three interpreted higher-order functions. Tail grams
 * shorter than n (when the string is shorter than n) are kept,
 * matching substr semantics. Codegen-capable via the static kernel.
 */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    CharNgrams.ngrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.expressions.CharNgrams.ngrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams = copy(child = newChild)
}

object CharNgrams {
  /** Static kernel, callable from generated Java.
    *
    * Windows are CODE POINTS, not UTF-16 chars: `substr` in both
    * engines (and the composable formulation this kernel replaces)
    * counts code points, and a char-indexed window both slices
    * surrogate pairs into lone-surrogate grams (mangled to U+FFFD in
    * UTF-8) and produces a different gram count on astral text. */
  def ngrams(u: UTF8String, n: Int): ArrayData = {
    val s = u.toString
    val cps = s.codePoints().toArray
    val len = cps.length
    val count = math.max(len - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < count) {
      seen.add(new String(cps, i, math.min(n, len - i)))
      i += 1
    }
    val out = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}
