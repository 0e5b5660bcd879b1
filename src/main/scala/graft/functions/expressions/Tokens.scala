package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Tokenizer as a native expression: letter/digit runs, optionally
 * per-char lowercased — exactly `filter(split(lower(s),
 * "[^\p{L}\p{Nd}]+"), length > 0)` (Character.isLetterOrDigit covers
 * the same letter/digit classes as the regex), in one per-row loop instead of
 * three interpreted higher-order functions (measured ~10s cold / ~1s
 * warm for the HOF chain over 5000 docs vs ~0.3s here).
 */
case class Tokens(child: Expression, lowercase: Boolean)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out = new java.util.ArrayList[AnyRef]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    val len = s.length
    while (i < len) {
      val c0 = s.charAt(i)
      if (Character.isLetterOrDigit(c0)) {
        sb.append(if (lowercase) Character.toLowerCase(c0) else c0)
      } else if (sb.length > 0) {
        out.add(UTF8String.fromString(sb.toString)); sb.setLength(0)
      }
      i += 1
    }
    if (sb.length > 0) out.add(UTF8String.fromString(sb.toString))
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Tokens = copy(child = newChild)
}
