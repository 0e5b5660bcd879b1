package graft

import org.apache.spark.sql.functions._
import graft.functions.F
import graft.operators.TextAnalysis

class FunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("tokens: lowercase, split on non-alphanumeric, drop empties") {
    val out = Seq("Hello, World!  42x").toDF("t").select(F.tokens(col("t"))).as[Seq[String]].head()
    assert(out == Seq("hello", "world", "42x"))
  }

  test("tokens: supplementary-plane letters survive as whole code points, matching the regex form") {
    // U+1D400 MATHEMATICAL BOLD CAPITAL A etc. — two UTF-16 chars each;
    // a per-char kernel split every one of them (surrogates are not
    // letterOrDigit) while the regex formulation kept them
    val text = "𝐀𝐁 plain 𝐂x"
    val native = Seq(text).toDF("t").select(F.tokens(col("t"))).as[Seq[String]].head()
    val viaRegex = Seq(text).toDF("t")
      .select(filter(split(lower(col("t")), "[^\\p{L}\\p{Nd}]+"), x => length(x) > 0))
      .as[Seq[String]].head()
    assert(native == viaRegex, s"native $native != regex $viaRegex")
    // math alphanumerics have no case mapping — they must survive WHOLE
    assert(native.contains("𝐀𝐁"), s"expected intact surrogate-pair token in $native")
  }

  test("graft_translit pins the reference transliterator's own test vectors") {
    // yupana-utils RussianTransliteratorTest.scala — the four vectors
    // verbatim (lower + UPPER rows, multi-char expansions, ъ/ь → "")
    val vectors = Seq(
      "черный плащ" -> "chernyj plashch",
      "щупальца южных ёжиков" -> "shchupalca yuzhnyh ezhikov",
      "Ядерный Грибок" -> "YAdernyj Gribok",
      "ОБЪЕДЕННЫЙ КРЕНДЕЛЬ" -> "OBEDENNYJ KRENDEL",
      // pass-through + identity edges
      "plain latin 42" -> "plain latin 42",
      "" -> "")
    val got = vectors.map(_._1).toDF("t").select(F.translit(col("t"))).as[String].collect().toSeq
    assert(got == vectors.map(_._2), s"$got")
    // null in, null out
    assert(Seq(Option.empty[String]).toDF("t").select(F.translit(col("t")))
      .as[Option[String]].head().isEmpty)
  }

  test("transliterated tokens: tokenize -> stem -> transliterate, emptied tokens dropped") {
    // reference TokenizerBase.transliteratedTokens (TokenizerBase.scala:
    // 34-36): the transliterate stage runs AFTER stemming and tokens
    // that transliterate to "" (a bare hard/soft sign) disappear
    val out = Seq("Черный ъ plashes И").toDF("t")
      .select(F.transliteratedTokens(col("t"))).as[Seq[String]].head()
    // черный → chernyj; ъ → "" (dropped); plashes → plashe (S-stemmer) →
    // plashe; и → i
    assert(out == Seq("chernyj", "plashe", "i"), s"$out")
    // the chain composes with the scalar stage bit-for-bit: tokens
    // mapped through graft_translit (minus emptied ones) must equal it
    val twin = Seq("Черный ъ plashes И").toDF("t")
      .select(filter(transform(F.stemmedTokens(col("t")), F.translit(_)), x => length(x) > 0))
      .as[Seq[String]].head()
    assert(out == twin, s"chain $out != composed $twin")
  }

  test("graft_cosine: a null ELEMENT yields SQL NULL on both eval paths, never an NPE or 0-read") {
    val df = Seq(
      (Seq(Some(1.0f), None, Some(2.0f)), Seq(Some(1.0f), Some(1.0f), Some(1.0f))),
      (Seq(Some(1.0f), Some(0.0f)), Seq(Some(1.0f), Some(0.0f)))
    ).toDF("a", "b")
    val out = df.select(call_function("graft_cosine", col("a"), col("b")).as("c"))
      .as[Option[Double]].collect().toSeq
    assert(out.head.isEmpty, "null element must give NULL cosine")
    assert(out(1).contains(1.0))
  }

  test("splitWords keeps case") {
    val out = Seq("PROMO BURNISHED-COPPER").toDF("t").select(F.splitWords(col("t"))).as[Seq[String]].head()
    assert(out == Seq("PROMO", "BURNISHED", "COPPER"))
  }

  test("contains_all / contains_any / contains_same") {
    val df = Seq((Seq("a", "b", "c"), Seq("c", "a"))).toDF("x", "y")
    val r = df
      .select(
        F.containsAll(col("x"), col("y")),
        F.containsAny(col("x"), array(lit("z"), lit("b"))),
        F.containsSame(col("x"), array(lit("c"), lit("b"), lit("a"))),
        F.containsSame(col("x"), col("y"))
      )
      .as[(Boolean, Boolean, Boolean, Boolean)]
      .head()
    assert(r == ((true, true, true, false)))
  }

  test("charNgrams produces distinct sliding n-grams") {
    val out = Seq("abcd").toDF("t").select(F.charNgrams(col("t"), 3)).as[Seq[String]].head()
    assert(out == Seq("abc", "bcd"))
  }

  test("jaccard on arrays-as-sets") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(F.jaccard(col("x"), col("y"))).as[Double].head()
    assert(math.abs(j - 0.5) < 1e-12)
  }

  test("hamming of longs") {
    val d = Seq((0L, 7L)).toDF("a", "b").select(F.hamming(col("a"), col("b"))).as[Int].head()
    assert(d == 3)
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))
    ).toDF("a", "b")
    val cs = df.select(F.cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(cs(0) - 1.0) < 1e-12 && math.abs(cs(1)) < 1e-12)
  }

  test("fingerprint matches the reference polynomial computed in plain Scala") {
    val text = "Key agg ROW scan 42!"
    val norm = text.toLowerCase.replaceAll("[^a-z0-9 ]", "").take(128)
    val expected = norm.foldLeft(0L)((acc, c) => (acc * 131L + c.toLong) % 2147483647L)
    val got = Seq(text).toDF("text").select(TextAnalysis.fingerprint(col("text"))).as[Long].head()
    assert(got == expected)
  }

  test("langId picks the max-marker language, und when none") {
    val df = Seq("the cat and the dog of a", "der hund und die katze ist", "xyzzy").toDF("text")
    val out = df.select(TextAnalysis.langId(col("text"))).as[String].collect().toSeq
    assert(out == Seq("en", "de", "und"))
  }

  test("time trunc family matches expected boundaries") {
    val df = Seq("2024-05-15 13:45:30.5").toDF("s").select(col("s").cast("timestamp").as("ts"))
    val r = df
      .select(
        F.truncYear(col("ts")).cast("string"),
        F.truncQuarter(col("ts")).cast("string"),
        F.truncWeek(col("ts")).cast("string"),
        F.truncHour(col("ts")).cast("string")
      )
      .as[(String, String, String, String)]
      .head()
    assert(r._1 == "2024-01-01 00:00:00")
    assert(r._2 == "2024-04-01 00:00:00")
    assert(r._3 == "2024-05-13 00:00:00") // Monday of that ISO week
    assert(r._4 == "2024-05-15 13:00:00")
  }

  test("dialect parity: graft_tokens over array<string> (reference ArrayTokensExpr)") {
    graft.sql.GraftFunctions.register(spark)
    // flatMap of the same kernel, element order preserved
    // (FunctionRegistry.scala:171; ConstantCalculator.scala:142)
    val out = Seq(Seq("Red Apple!", "salt WATER"))
      .toDF("arr")
      .select(call_function("graft_tokens", col("arr")).as("tk"))
      .as[Seq[String]].head()
    assert(out == Seq("red", "apple", "salt", "water"))
    // null elements contribute no tokens; a null array stays null
    val r = spark.sql(
      "SELECT graft_tokens(array('a b', CAST(NULL AS STRING), 'c')) AS tk, " +
        "graft_tokens(CAST(NULL AS ARRAY<STRING>)) AS tn, " +
        "graft_stemmed_tokens(array('many ponies')) AS st").head()
    assert(r.getAs[scala.collection.Seq[String]]("tk").toSeq == Seq("a", "b", "c"))
    assert(r.isNullAt(1))
    assert(r.getAs[scala.collection.Seq[String]]("st").toSeq == Seq("many", "pony"))
  }

  test("dialect parity: graft_fix_item repairs OFD mojibake (reference OfdItemFixerTest vectors)") {
    graft.sql.GraftFunctions.register(spark)
    // behavior vectors from the reference's own test
    // (yupana-utils OfdItemFixerTest.scala:9-18) — guillemet mojibake
    // to '"', cp866 ╕/╣ glyphs to ё/№, untouched text passes through
    val vectors = Seq(
      ("гуляш соевый 50% ┬лсойка┬╗, 500г (россия) шт",
        "гуляш соевый 50% \"сойка\", 500г (россия) шт"),
      ("семечки крупные ╣1", "семечки крупные №1"),
      ("г╕ссер 0.3 мл в розлив", "гёссер 0.3 мл в розлив"),
      ("plain untouched item 100g", "plain untouched item 100g")
    )
    val viaCol = vectors.map(_._1).toDF("s")
      .select(graft.functions.ItemFixer.fix(col("s")).as("f"))
      .as[String].collect().toSeq
    assert(viaCol == vectors.map(_._2))
    // SQL registration agrees with the Column form; null propagates
    val viaSql = vectors.map(_._1).toDF("s")
      .selectExpr("graft_fix_item(s) AS f").as[String].collect().toSeq
    assert(viaSql == vectors.map(_._2))
    assert(spark.sql("SELECT graft_fix_item(CAST(NULL AS STRING))").head().isNullAt(0))
  }

  test("dialect parity: graft_hll_count(x, std_err) — reference range validation") {
    graft.sql.GraftFunctions.register(spark)
    val docs = (1 to 2000).map(i => ("k", s"v$i")).toDF("k", "v")
    docs.createOrReplaceTempView("hll_docs")
    // relativeSD IS the requested standard error; estimate lands within
    // a generous 6-sigma of the true distinct count
    val est = spark.sql("SELECT graft_hll_count(v, 0.02) AS e FROM hll_docs GROUP BY k")
      .head().getLong(0)
    assert(math.abs(est - 2000L) <= (2000 * 0.02 * 6).toLong, s"estimate $est too far from 2000")
    // default form (no std_err) and the reference's validated extremes
    // (0.00003, 0.367) both build and run
    for (q <- Seq(
        "SELECT graft_hll_count(v) AS e FROM hll_docs GROUP BY k",
        "SELECT graft_hll_count(v, 0.00004) AS e FROM hll_docs GROUP BY k",
        "SELECT graft_hll_count(v, 0.366) AS e FROM hll_docs GROUP BY k"))
      assert(spark.sql(q).head().getLong(0) > 0L)
    // out-of-range std_err rejected with the reference's message
    // (yupana-core sql/FunctionRegistry.scala:276-291)
    for (bad <- Seq("0.5", "0.00001")) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT graft_hll_count(v, $bad) FROM hll_docs GROUP BY k").head()
      }
      assert(e.getMessage.contains("std_err"), s"unexpected error for $bad: ${e.getMessage}")
    }
    // listed on the metadata surface
    val fns = graft.sql.Catalog.showFunctions(spark).as[String].collect()
    assert(fns.contains("graft_hll_count"))
  }

  test("native expressions generate compilable code (no silent interpreter fallback)") {
    // codegen.fallback=false turns a broken doGenCode into a hard error
    // instead of a quiet per-row interpreter downgrade
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq(
        (Seq("a", "b", "c"), Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f))
      ).toDF("toks", "v1", "v2")
      val cents = typedlit[Seq[Seq[Float]]](Seq(Seq(0.0f, 0.0f, 0.0f), Seq(1.0f, 2.0f, 3.0f)))
      val r = df.select(
        call_function("graft_minhash", col("toks")).as("mh"),
        call_function("graft_simhash", col("toks")).as("sh"),
        call_function("graft_cosine", col("v1"), col("v2")).as("cos"),
        call_function("graft_nearest_centroid", col("v1"), cents).as("cell"),
        call_function("graft_nearest_centroids", col("v1"), cents, lit(2)).as("cells"),
        call_function("graft_hyperplane_bits", col("v1"), lit(16)).as("bits"),
        call_function("graft_tokens", lit("A b!c")).as("tk"),
        call_function("graft_stemmed_tokens", lit("many ponies")).as("st"),
        call_function("graft_word_shingles", lit("a b c d"), lit(2)).as("ws")
      ).head()
      assert(r.getAs[scala.collection.Seq[Long]]("mh").length == 64)
      assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-12)
      assert(r.getAs[Int]("cell") == 1)
      assert(r.getAs[scala.collection.Seq[Int]]("cells").toSeq == Seq(1, 0))
      assert(r.getAs[scala.collection.Seq[String]]("tk").toSeq == Seq("a", "b", "c"))
      assert(r.getAs[scala.collection.Seq[String]]("st").toSeq == Seq("many", "pony"))
      assert(r.getAs[scala.collection.Seq[String]]("ws").toSeq == Seq("a b", "b c", "c d"))

      // DotProduct (the fusion rule's target) under codegen, incl. null semantics
      val dots = Seq(
        (Seq(1.0, 2.0), Seq(3.0, 4.0)),
        (Seq(1.0, 2.0), Seq(3.0, 4.0, 5.0)) // length mismatch -> NULL
      ).toDF("a", "b")
        .select(call_function("graft_dot", col("a"), col("b")).as("d"))
        .collect()
      assert(dots(0).getDouble(0) == 11.0)
      assert(dots(1).isNullAt(0))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }
}
