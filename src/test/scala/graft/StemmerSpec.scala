package graft

import org.apache.spark.sql.functions._
import graft.functions.F
import graft.functions.expressions.{EnglishLightStemmer, Stemmer, Stemmers}

/**
 * Stemmed tokenization, mirroring the shape of the reference's
 * tokenizer tests (yupana-utils RussianTokenizerTest.scala: phrase →
 * expected stemmed token list; the locale stemmer plugs into the shared
 * tokenizer via TokenizerBase.stemArray — here via [[Stemmers]]).
 */
class StemmerSpec extends SparkSpecBase {
  import spark.implicits._

  private def stemmed(phrase: String): Seq[String] =
    Seq(phrase).toDF("text")
      .select(F.stemmedTokens(col("text")).as("tk"))
      .as[Seq[String]].head()

  test("stemmer splits numbers-and-words text and stems each token") {
    assert(stemmed("95 pulsars and 12 galaxies") ===
      Seq("95", "pulsar", "and", "12", "galaxy"))
    assert(stemmed("TRK-1 (atum-92) runs 1.25x faster") ===
      Seq("trk", "1", "atum", "92", "run", "1", "25x", "faster"))
  }

  test("English light stemmer applies the three S-stemmer rules in order") {
    // -ies → -y (unless e/a precedes)
    assert(EnglishLightStemmer.stem("ponies") === "pony")
    assert(EnglishLightStemmer.stem("ties") === "ty")
    assert(EnglishLightStemmer.stem("bodies") === "body")
    // -es → -e (unless a/e/o precedes)
    assert(EnglishLightStemmer.stem("classes") === "classe")
    assert(EnglishLightStemmer.stem("shoes") === "shoes")
    // -s dropped (unless u/s precedes)
    assert(EnglishLightStemmer.stem("cats") === "cat")
    assert(EnglishLightStemmer.stem("corpus") === "corpus")
    assert(EnglishLightStemmer.stem("glass") === "glass")
    // short words untouched
    assert(EnglishLightStemmer.stem("is") === "is")
  }

  test("identity stemmer is the default tokens() path; stemmers are pluggable") {
    val raw = Seq("galaxies").toDF("text").select(F.tokens(col("text"))).as[Seq[String]].head()
    assert(raw === Seq("galaxies"))

    object Shouty extends Stemmer { def stem(w: String): String = w.toUpperCase }
    Stemmers.register("shout", Shouty)
    val shouted = Seq("hello world").toDF("text")
      .select(F.stemmedTokens(col("text"), "shout")).as[Seq[String]].head()
    assert(shouted === Seq("HELLO", "WORLD"))
  }

  test("transliterated tokens: stem then ASCII-fold (reference transliteratedTokens shape)") {
    assert(stemmed("café ünïcode naïve") === Seq("café", "ünïcode", "naïve")) // en: no translit
    val folded = Seq("Café ÜNÏCODE naïve piñatas").toDF("text")
      .select(F.stemmedTokens(col("text"), "en-ascii").as("tk"))
      .as[Seq[String]].head()
    assert(folded === Seq("cafe", "unicode", "naive", "pinata"))
    val noStem = Seq("piñatas").toDF("text")
      .select(F.stemmedTokens(col("text"), "ascii").as("tk"))
      .as[Seq[String]].head()
    assert(noStem === Seq("pinatas"))
  }

  test("stemmed inverted index matches inflected phrase forms (reference ItemsInvertedIndex shape)") {
    import graft.operators.InvertedIndex
    val docs = Seq(
      (1L, "the pony jumps over fences"),
      (2L, "many ponies jumped over a fence"),
      (3L, "a completely different document")
    ).toDF("doc_id", "text")
    val idx = InvertedIndex.build(docs, "doc_id", "text", stemmer = "en")
    // query uses a different inflection than either doc
    val hits = InvertedIndex.phraseSearch(idx, "ponies fences", stemmer = "en")
      .as[Long].collect().toSet
    assert(hits === Set(1L, 2L), s"stemmed index should match both inflections, got $hits")
    // identity index misses the inflected forms
    val rawHits = InvertedIndex.phraseSearch(
      InvertedIndex.build(docs, "doc_id", "text"), "ponies fences")
      .as[Long].collect().toSet
    assert(rawHits === Set.empty)
  }

  test("Russian light stemmer conflates case/number inflections (reference RussianTokenizer locale)") {
    import graft.functions.expressions.RussianLightStemmer
    // the same lemma under different case endings maps to one stem
    val cases = Seq("книга", "книги", "книгу", "книгой", "книгами", "книгах")
    assert(cases.map(RussianLightStemmer.stem).distinct.size == 1)
    val adj = Seq("красивый", "красивая", "красивое", "красивые", "красивыми")
    assert(adj.map(RussianLightStemmer.stem).distinct.size == 1)
    // ё folds to е; short words pass through untouched
    assert(RussianLightStemmer.stem("ёлка") == "елка")
    assert(RussianLightStemmer.stem("дом") == "дом")
    // stems never shrink below 3 letters
    assert(Seq("окно", "мама", "сила").map(RussianLightStemmer.stem).forall(_.length >= 3))
  }

  test("ru-translit romanizes stemmed Cyrillic tokens (reference transliteratedTokens)") {
    val out = Seq("Книгами про Ёжика и ascii")
      .toDF("text")
      .select(F.stemmedTokens(col("text"), "ru-translit"))
      .as[Seq[String]].head()
    assert(out.forall(_.forall(_ < 128.toChar)), s"expected pure ASCII, got $out")
    assert(out.contains("knig")) // книгами → книг → knig
    assert(out.contains("ascii"))
  }

  test("unknown stemmer id fails with the registered set named") {
    val e = intercept[Exception] {
      Seq("x").toDF("text").select(F.stemmedTokens(col("text"), "xx")).as[Seq[String]].head()
    }
    assert(e.getMessage.contains("unknown stemmer") || e.getCause.getMessage.contains("unknown stemmer"))
  }
}
