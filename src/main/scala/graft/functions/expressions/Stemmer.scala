package graft.functions.expressions

/**
 * Pluggable per-token stemmer hook for [[Tokens]], mirroring the
 * reference tokenizer's stem step (yupana-utils TokenizerBase.scala:28
 * `stem` / RussianTokenizer.scala:49 `stemArray` — the reference plugs
 * a locale-specific light stemmer into the shared tokenizer). graft
 * ships an English light stemmer (the Harman 1991 "S-stemmer" plural
 * reduction — a published algorithm) and identity for other locales;
 * any `Stemmer` can be registered per-query.
 *
 * Stemmers must be deterministic, pure, and serializable: they run
 * inside codegen'd expressions on executors.
 */
trait Stemmer extends Serializable {
  def stem(word: String): String
}

object IdentityStemmer extends Stemmer {
  override def stem(word: String): String = word
}

/**
 * Harman S-stemmer (Donna Harman, "How Effective Is Suffixing?",
 * JASIS 1991): three ordered plural-reduction rules. Deliberately
 * mirrored token-for-token by the DuckDB oracle SQL in OracleSql —
 * change both together.
 *
 *  - `-ies` → `-y` unless preceded by `e`/`a` (len > 3)
 *  - `-es`  → `-e` unless preceded by `a`/`e`/`o` (len > 3)
 *  - `-s`   dropped unless preceded by `u`/`s` (len > 2)
 */
object EnglishLightStemmer extends Stemmer {
  override def stem(word: String): String = {
    val n = word.length
    if (n > 3 && word.endsWith("ies")) {
      val p = word.charAt(n - 4)
      if (p != 'e' && p != 'a') word.substring(0, n - 3) + "y" else word
    } else if (n > 3 && word.endsWith("es")) {
      val p = word.charAt(n - 3)
      if (p != 'a' && p != 'e' && p != 'o') word.substring(0, n - 1) else word
    } else if (n > 2 && word.charAt(n - 1) == 's') {
      val p = word.charAt(n - 2)
      if (p != 'u' && p != 's') word.substring(0, n - 1) else word
    } else word
  }
}

/**
 * Russian light stemmer in the Savoy light-stemming tradition (Dolamic
 * & Savoy, "Indexing and stemming approaches for the Russian language",
 * JASIST 2009 — strip frequent adjectival/nominal case endings, no
 * dictionary): the locale the reference ships a stemmer for
 * (yupana-utils RussianTokenizer.scala; implemented here from the
 * published algorithm family, not from the reference's code).
 *
 * Rules: fold ё→е; then for words of ≥ 5 letters strip the LONGEST
 * matching inflectional ending that leaves a stem of ≥ 3 letters.
 * Light = case/gender/number reduction only; derivational suffixes stay.
 */
object RussianLightStemmer extends Stemmer {
  // ordered longest-first so the longest match wins
  private val endings: Array[String] = Array(
    // adjectival (incl. superlative -ейш- forms)
    "ейшими", "ейшего", "ейшему", "ейшую", "ейшая", "ейшими", "ейших", "ейшим", "ейшей", "ейшее",
    "иями", "ями", "ами", "ого", "его", "ому", "ему", "ыми", "ими",
    "иях", "ях", "ах", "ией", "ием", "иям", "ям", "ам", "ию", "ью",
    "ая", "яя", "ую", "юю", "ое", "ее", "ие", "ые", "ой", "ей", "ий", "ый",
    "ом", "ем", "им", "ым", "их", "ых", "ов", "ев", "еи", "ии", "ия", "ья",
    "а", "е", "и", "й", "о", "у", "ы", "ь", "ю", "я"
  ).distinct.sortBy(-_.length)

  override def stem(word: String): String = {
    val w = word.replace('ё', 'е')
    if (w.length < 5) w
    else {
      var i = 0
      while (i < endings.length) {
        val e = endings(i)
        if (w.length - e.length >= 3 && w.endsWith(e)) return w.substring(0, w.length - e.length)
        i += 1
      }
      w
    }
  }
}

/**
 * Transliteration step composed after stemming, mirroring the
 * reference's `transliteratedTokens` (yupana-utils TokenizerBase
 * .scala:34: stemmedTokens.map(transliterate); RussianTransliterator
 * maps Cyrillic→Latin). The shipped transliterator ASCII-folds Latin
 * diacritics via Unicode NFD decomposition + combining-mark strip —
 * the locale-neutral analogue; locale tables register like stemmers.
 */
final case class TransliteratingStemmer(base: Stemmer, transliterate: String => String)
    extends Stemmer {
  override def stem(word: String): String = transliterate(base.stem(word))
}

/** Cyrillic→Latin romanization (standard BGN/PCGN-style digraph table —
  * the common public scheme; reference RussianTransliterator is the
  * same idea with its own table). Non-Cyrillic chars pass through. */
object CyrillicTranslit extends (String => String) with Serializable {
  private val table: Map[Char, String] = Map(
    'а' -> "a", 'б' -> "b", 'в' -> "v", 'г' -> "g", 'д' -> "d", 'е' -> "e", 'ё' -> "e",
    'ж' -> "zh", 'з' -> "z", 'и' -> "i", 'й' -> "j", 'к' -> "k", 'л' -> "l", 'м' -> "m",
    'н' -> "n", 'о' -> "o", 'п' -> "p", 'р' -> "r", 'с' -> "s", 'т' -> "t", 'у' -> "u",
    'ф' -> "f", 'х' -> "h", 'ц' -> "c", 'ч' -> "ch", 'ш' -> "sh", 'щ' -> "sch",
    'ъ' -> "", 'ы' -> "y", 'ь' -> "", 'э' -> "e", 'ю' -> "yu", 'я' -> "ya"
  )
  override def apply(s: String): String = {
    var hasCyrillic = false
    var i = 0
    while (i < s.length && !hasCyrillic) { if (table.contains(s.charAt(i))) hasCyrillic = true; i += 1 }
    if (!hasCyrillic) s
    else {
      val b = new java.lang.StringBuilder(s.length + 4)
      i = 0
      while (i < s.length) { b.append(table.getOrElse(s.charAt(i), s.charAt(i).toString)); i += 1 }
      b.toString
    }
  }
}

object AsciiFold extends (String => String) with Serializable {
  private val marks = "\\p{M}+".r
  override def apply(s: String): String = {
    var hasNonAscii = false
    var i = 0
    while (i < s.length && !hasNonAscii) { if (s.charAt(i) > 127) hasNonAscii = true; i += 1 }
    if (!hasNonAscii) s
    else marks.replaceAllIn(java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD), "")
  }
}

/** Locale → stemmer registry (reference: one TokenizerBase object per
  * locale). Extensible: `register` before building queries. */
object Stemmers {
  @volatile private var byId: Map[String, Stemmer] =
    Map(
      "none" -> IdentityStemmer,
      "en" -> EnglishLightStemmer,
      "ru" -> RussianLightStemmer,
      // reference transliteratedTokens analogues
      "ascii" -> TransliteratingStemmer(IdentityStemmer, AsciiFold),
      "en-ascii" -> TransliteratingStemmer(EnglishLightStemmer, AsciiFold),
      // the reference's full Russian pipeline SHAPE: stem, then romanize.
      // NOTE this id romanizes with the BGN-style table below ('щ'→sch);
      // the reference transliterator's OWN table ('щ'→shch, uppercase
      // rows, r16) is [[Transliterate]] — exposed as graft_translit /
      // graft_transliterated_tokens, the gated exact-parity path.
      "ru-translit" -> TransliteratingStemmer(RussianLightStemmer, CyrillicTranslit)
    )

  def register(id: String, s: Stemmer): Unit = synchronized { byId = byId + (id -> s) }

  def forId(id: String): Stemmer =
    byId.getOrElse(id, throw new IllegalArgumentException(
      s"unknown stemmer '$id' (registered: ${byId.keys.toSeq.sorted.mkString(", ")})"))
}
