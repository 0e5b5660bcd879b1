package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe
import graft.operators.Bpe.Merge

/**
 * BPE vocabulary induction + subword encode. The incremental-index
 * learner is replayed against an INDEPENDENT naive recount-per-round
 * implementation (below) on both a hand-checkable corpus and real
 * testdata word counts; the codegen'd encode expression is checked
 * against the learner's own merge discipline.
 */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  /** Naive reference: full pair recount every round — O(rounds ×
    * table) but unarguable. Same tie-break (weight desc, pair asc),
    * same left-to-right non-overlapping merge. */
  private def naiveLearn(
      freq: Seq[(String, Long)], numMerges: Int, minWeight: Long, endMarker: String
  ): Seq[Merge] = {
    var words: Seq[(Array[String], Long)] = freq.map { case (w, c) =>
      (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))) :+ endMarker, c)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    var stop = false
    while (rank < numMerges && !stop) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), w) = counts.toSeq.minBy { case ((a, b), w) => (-w, a, b) }
        if (w < minWeight) stop = true
        else {
          out += Merge(rank, a, b, w)
          words = words.map { case (syms, c) =>
            val merged = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) { merged += a + b; i += 2 }
              else { merged += syms(i); i += 1 }
            }
            (merged.toArray, c)
          }
          rank += 1
        }
      }
    }
    out.toSeq
  }

  test("learner matches the classic reference corpus, first merges hand-checkable") {
    // Sennrich et al. 2016 §3.2's illustrative corpus shape
    val freq = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.learnMerges(
      freq.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }.toSeq.toDF("text"),
      "text", numMerges = 10, minWeight = 2)
    // hand-check the head: es (9: newest+widest), then est (9), est</w> (9)
    assert(merges.take(3).map(m => (m.left, m.right, m.weight)) ==
      Seq(("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L)))
    // full-sequence parity with the naive recount implementation
    val naive = naiveLearn(freq.toSeq, 10, 2L, "</w>")
    assert(merges == naive, s"incremental vs naive diverged:\n$merges\n$naive")
  }

  test("learner parity with the naive implementation on real word counts") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val freq = Bpe.wordCounts(docs, "text", maxWords = 2000).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val inc = Bpe.learnMerges(docs, "text", numMerges = 60, maxWords = 2000)
    val naive = naiveLearn(freq.toSeq, 60, 2L, "</w>")
    assert(inc == naive)
    assert(inc.size == 60, "real text at this size must sustain 60 merges")
    // ranks are the learning order and weights are non-increasing only
    // per-pair-lifecycle, but every weight must be >= minWeight and
    // every merged token must be a concatenation of its parts
    assert(inc.forall(m => m.weight >= 2L))
    assert(Bpe.vocab(inc) == inc.map(m => m.left + m.right))
  }

  test("encode expression replays the learned merges; codegen and interpreted agree") {
    val freq = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val corpus = freq.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }.toSeq.toDF("text")
    val merges = Bpe.learnMerges(corpus, "text", numMerges = 6, minWeight = 2)
    val df = Seq("newest low", "lowest wide", "" /* empty text: no tokens */)
      .toDF("text")
      .select(col("text"), Bpe.encode(graft.functions.F.tokens(col("text")), merges).as("bpe"))
    val rows = df.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // every word's subwords must reconstruct word + end marker
    for ((text, toks) <- rows) {
      val words = text.split(" ").filter(_.nonEmpty)
      assert(toks.mkString == words.map(_ + "</w>").mkString,
        s"subwords of '$text' must concatenate back: $toks")
    }
    // trained words encode to their fully-merged forms
    assert(rows("newest low").containsSlice(Seq("newest</w>")) ||
      rows("newest low").containsSlice(Seq("newest", "</w>")) ||
      rows("newest low").head.nonEmpty) // exact split asserted below vs local replay
    // exact parity with a local replay of the greedy algorithm
    def localEncode(word: String): Seq[String] = {
      val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
      var syms = word.codePoints().toArray.map(cp => new String(Character.toChars(cp))) :+ "</w>"
      var done = false
      while (!done && syms.length > 1) {
        val cands = syms.indices.init
          .flatMap(i => ranks.get((syms(i), syms(i + 1))).map(r => (r, i)))
        if (cands.isEmpty) done = true
        else {
          val (_, at) = cands.minBy(_._1)
          syms = Bpe.mergePair(syms, syms(at), syms(at + 1))
        }
      }
      syms.toSeq
    }
    for ((text, toks) <- rows) {
      val expected = text.split(" ").filter(_.nonEmpty).toSeq.flatMap(localEncode)
      assert(toks == expected, s"'$text': $toks != $expected")
    }
    // interpreted path (no codegen) must agree with the codegen'd run
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val again = df.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      assert(again == rows)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("frozenMerges is a valid learned sequence — the oracle-replay precondition") {
    // q_bpe_encode's DuckDB oracle replays the merges sequentially in
    // rank order; that equals the expression's greedy lowest-rank loop
    // ONLY for a valid learned sequence (every symbol is base or an
    // earlier merge's output — Bpe.frozenMerges scaladoc). Pin it, plus
    // the two separator constraints both replay encodings lean on.
    val outputs = scala.collection.mutable.Set.empty[String]
    for (m <- Bpe.frozenMerges.sortBy(_.rank)) {
      def derivable(sym: String) =
        sym == "</w>" || sym.codePointCount(0, sym.length) == 1 || outputs(sym)
      assert(derivable(m.left), s"left '${m.left}' of rank ${m.rank} is not derivable")
      assert(derivable(m.right), s"right '${m.right}' of rank ${m.rank} is not derivable")
      assert(!m.left.contains("|") && !m.right.contains("|"), "oracle boundary char inside a symbol")
      assert(!m.left.contains(" ") && !m.right.contains(" "), "wire separator inside a symbol")
      val out = m.left + m.right
      assert(!outputs(out),
        s"duplicate merge output '$out' at rank ${m.rank} — two string-equal outputs break " +
          "sequential-replay ≡ greedy equivalence")
      outputs += out
    }
    // no merge may re-create a symbol string an EARLIER merge already
    // consumes or emits: an input matching a later-or-equal-ranked
    // output would make the oracle's sequential replay diverge from the
    // expression's greedy lowest-rank loop (derivability above only
    // checks the earlier direction)
    val ordered = Bpe.frozenMerges.sortBy(_.rank)
    val outSeq = ordered.map(m => m.left + m.right)
    for ((m, i) <- ordered.zipWithIndex; sym <- Seq(m.left, m.right))
      assert(!outSeq.drop(i).contains(sym),
        s"input '$sym' of rank ${m.rank} equals the output of a later-or-equal-ranked merge")
    assert(Bpe.frozenMerges.map(_.rank) == Bpe.frozenMerges.indices, "ranks must be 0..n-1")
    // the table actually fires on corpus-typical words: 'lower' merges
    // (e,r) -> (o,w) -> (er,</w>) into l·ow·er</w>
    val out = Seq("lower").toDF("text")
      .select(Bpe.encode(graft.functions.F.tokens(col("text")), Bpe.frozenMerges).as("bpe"))
      .head().getSeq[String](0)
    assert(out == Seq("l", "ow", "er</w>"), s"got $out")
  }

  test("empty merge table degrades to character + end-marker tokens; early stop below minWeight") {
    val df = Seq("ab").toDF("text")
      .select(Bpe.encode(graft.functions.F.tokens(col("text")), Seq.empty).as("bpe"))
    assert(df.head().getSeq[String](0) == Seq("a", "b", "</w>"))
    // all pairs unique → nothing reaches minWeight=2 → zero merges
    val merges = Bpe.learnMerges(Seq("abcdefg").toDF("text"), "text", numMerges = 5)
    assert(merges.isEmpty)
  }
}
