package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Table-driven transliteration as a native expression — the reference's
 * `RussianTransliterator` (yupana-utils RussianTransliterator.scala:
 * 23-90: the char → latin table; TableTransliterator.scala:25-32: the
 * per-char append loop) re-expressed as a codegen-capable Catalyst
 * expression. The TABLE is the behavioral spec and is carried verbatim
 * as data ([[Transliterate.table]]); the implementation differs: the
 * reference materializes a 65536-slot string array, graft indexes a
 * dense array over just the Cyrillic block (every other char is
 * appended unchanged without a lookup).
 *
 * Characters outside the table pass through; table rows may map to
 * multi-char latin ("щ" → "shch") or to nothing ("ъ", "ь" → "").
 */
case class Transliterate(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_translit"

  override protected def nullSafeEval(input: Any): Any =
    Transliterate.transliterate(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.Transliterate.transliterate($c);")

  override protected def withNewChildInternal(newChild: Expression): Transliterate =
    copy(child = newChild)
}

object Transliterate {

  /** The reference transliteration table, verbatim
    * (RussianTransliterator.scala:23-90) — shared with the DuckDB
    * oracle so the two engines fold the SAME rows. */
  val table: Seq[(Char, String)] = Seq(
    'а' -> "a", 'б' -> "b", 'в' -> "v", 'г' -> "g", 'д' -> "d",
    'е' -> "e", 'ё' -> "e", 'ж' -> "zh", 'з' -> "z", 'и' -> "i",
    'й' -> "j", 'к' -> "k", 'л' -> "l", 'м' -> "m", 'н' -> "n",
    'о' -> "o", 'п' -> "p", 'р' -> "r", 'с' -> "s", 'т' -> "t",
    'у' -> "u", 'ф' -> "f", 'х' -> "h", 'ц' -> "c", 'ч' -> "ch",
    'ш' -> "sh", 'щ' -> "shch", 'ъ' -> "", 'ы' -> "y", 'ь' -> "",
    'э' -> "e", 'ю' -> "yu", 'я' -> "ya",
    'А' -> "A", 'Б' -> "B", 'В' -> "V", 'Г' -> "G", 'Д' -> "D",
    'Е' -> "E", 'Ё' -> "E", 'Ж' -> "ZH", 'З' -> "Z", 'И' -> "I",
    'Й' -> "J", 'К' -> "K", 'Л' -> "L", 'М' -> "M", 'Н' -> "N",
    'О' -> "O", 'П' -> "P", 'Р' -> "R", 'С' -> "S", 'Т' -> "T",
    'У' -> "U", 'Ф' -> "F", 'Х' -> "H", 'Ц' -> "C", 'Ч' -> "CH",
    'Ш' -> "SH", 'Щ' -> "SHCH", 'Ъ' -> "", 'Ы' -> "Y", 'Ь' -> "",
    'Э' -> "E", 'Ю' -> "YU", 'Я' -> "YA")

  // dense lookup over the table's char range only (0x0401 'Ё' to
  // 0x0451 'ё' — 81 slots); null = pass-through
  private val lo: Char = table.map(_._1).min
  private val hi: Char = table.map(_._1).max
  private val lut: Array[String] = {
    val a = new Array[String](hi - lo + 1)
    table.foreach { case (c, s) => a(c - lo) = s }
    a
  }

  /** Static kernel, callable from generated Java. Per-UTF-16-char like
    * the reference loop: the table is BMP-only, and surrogate halves
    * fall outside [lo, hi] so supplementary chars pass through intact. */
  def transliterate(u: UTF8String): UTF8String = {
    val s = u.toString
    val n = s.length
    var i = 0
    // fast path: nothing in range ⇒ the input IS the output
    var touched = false
    while (i < n && !touched) {
      val c = s.charAt(i)
      touched = c >= lo && c <= hi && lut(c - lo) != null
      i += 1
    }
    if (!touched) return u
    val sb = new java.lang.StringBuilder(n * 2)
    i = 0
    while (i < n) {
      val c = s.charAt(i)
      val m = if (c >= lo && c <= hi) lut(c - lo) else null
      if (m == null) sb.append(c) else sb.append(m)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** String-side entry for kernels that already hold a String. */
  def transliterate(s: String): String =
    transliterate(UTF8String.fromString(s)).toString
}
