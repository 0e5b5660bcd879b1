package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, StringReplace}
import org.apache.spark.sql.functions.{lit, replace}

/**
 * Receipt item-name mojibake repair — the reference's ItemFixer hook
 * (yupana-api utils/ItemFixer.scala, implemented by
 * yupana-utils OfdItemFixer.scala:22-29): fiscal-data (OFD) feeds
 * deliver item names where some characters survived an encoding
 * round-trip broken — the guillemets « » arrive as the two-character
 * sequences "┬л" / "┬╗" (their UTF-8 bytes C2 AB / C2 BB read as
 * cp866) and the single-byte cp1251 characters ё (0xB8) / № (0xB9)
 * arrive as the cp866 glyphs at those code points, "╕" / "╣". The
 * fixer maps each observed broken sequence to the intended character
 * (guillemets normalize to '"', matching the reference's choice) so
 * downstream tokenize/stem/dedup see the real text.
 *
 * Spark-first shape: a fold of codegen'd `StringReplace` expressions —
 * per-row column algebra, no UDF, no shuffle; registered in SQL as
 * `graft_fix_item(text)` and applied like any projection in an ETL
 * select. The replacement table is data, so both engines execute the
 * identical replace chain (DuckDB: nested replace()).
 */
object ItemFixer {

  /** (broken sequence → intended character), applied in order. */
  val Replacements: Seq[(String, String)] = Seq(
    "┬л" -> "\"",
    "┬╗" -> "\"",
    "╕" -> "ё",
    "╣" -> "№"
  )

  /** DataFrame-API form: chained codegen'd replaces. */
  def fix(c: Column): Column =
    Replacements.foldLeft(c) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }

  /** Catalyst form for the SQL function registry. */
  def fixExpr(child: Expression): Expression =
    Replacements.foldLeft(child) { case (acc, (from, to)) =>
      StringReplace(acc, Literal(from), Literal(to))
    }
}
