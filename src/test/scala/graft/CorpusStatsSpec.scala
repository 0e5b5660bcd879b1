package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusStats

class CorpusStatsSpec extends SparkSpecBase {
  import spark.implicits._

  test("collocations rank adjacent pairs by exact lift with the hapax guard") {
    // "x y" always adjacent (perfect collocation); "a b" sometimes; "a a" never
    val docs = Seq(
      "x y a b c", "x y b a c", "x y a b c", "x y c c a b",
      "x y a c b", "x y a b c", "x y b c a"
    ).toDF("text")
    val out = CorpusStats.collocations(docs, "text", minCount = 5L, topK = 10)
      .as[(String, String, Long, Long, Long, Double)].collect()
    val n = 36L // 7 docs: 4x5 + 2x5 + 1x6 tokens = 36
    // (x,y): c_xy=7, c_x=7, c_y=7 -> lift = 7*36/49
    val xy = out.find(r => r._1 == "x" && r._2 == "y").get
    assert(xy._3 == 7L && xy._4 == 7L && xy._5 == 7L)
    assert(xy._6 == (7.0 * n.toDouble) / (7.0 * 7.0))
    // hapax guard: no pair below minCount surfaces
    assert(out.forall(_._3 >= 5L))
    // ranked by lift desc; (x,y) is the strongest collocation here
    assert(out.head._1 == "x" && out.head._2 == "y")
  }

  test("lmPerplexity: hand-computed smoothed surprisal, empty docs keep their row") {
    val docs = Seq((1L, "a a b"), (2L, "c"), (3L, "")).toDF("doc_id", "text")
    // corpus: a=2, b=1, c=1; n=4 tokens, V=3
    def q(x: Double) = math.floor(math.log(x) * 1e6).toLong
    val sA = q(4 + 3) - q(2 + 1)
    val sB = q(4 + 3) - q(1 + 1)
    val sC = q(4 + 3) - q(1 + 1)
    val nll1 = (2 * sA + sB).toDouble / (3L * 1000000L).toDouble
    val nll2 = sC.toDouble / 1000000.0
    val out = CorpusStats.lmPerplexity(docs, "doc_id", "text", maxNll = 1.2)
      .orderBy("doc_id")
      .as[(Long, Long, Option[Double], Boolean)].collect().toSeq
    assert(out(0) == ((1L, 3L, Some(nll1), nll1 <= 1.2)))
    assert(out(1) == ((2L, 1L, Some(nll2), nll2 <= 1.2)))
    assert(out(2) == ((3L, 0L, None, false)), "tokenless docs keep a row, keep=false")
  }

  test("lmPerplexity scores against a held-out train corpus; unseen tokens are smoothed, not dropped") {
    val train = Seq((10L, "a a a b")).toDF("doc_id", "text") // a=3, b=1; n=4, V=2
    val score = Seq((1L, "a z")).toDF("doc_id", "text") // z unseen by the LM
    def q(x: Double) = math.floor(math.log(x) * 1e6).toLong
    val sA = q(4 + 2) - q(3 + 1)
    val sZ = q(4 + 2) - q(0 + 1) // c_w = 0 via the left join, add-one prices it
    val nll = (sA + sZ).toDouble / (2L * 1000000L).toDouble
    val out = CorpusStats.lmPerplexity(score, "doc_id", "text", maxNll = 10.0, train = Some(train))
      .as[(Long, Long, Option[Double], Boolean)].collect().toSeq
    assert(out == Seq((1L, 2L, Some(nll), true)))
  }

  test("knBigramPerplexity: exact local KN recompute; interpolated KN sums to 1 per context") {
    val corpus = Seq(
      (1L, "a b a b c"),
      (2L, "a b c d"),
      (3L, "b c d a"),
      (4L, "x")) // single token: no bigram events
    // local model from the corpus bigrams
    val bigrams = corpus.flatMap { case (_, t) =>
      val w = t.split(" ").toSeq; w.zip(w.drop(1))
    }
    val c12 = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = c12.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1p = c12.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val nc = c12.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val nbig = c12.size.toLong
    // interpolated KN is a probability distribution over continuations:
    // Σ_w2 P(w2|w1) = 1 for every context (continuation mass Σ Nc = Nbig)
    val vocab2 = nc.keySet
    for (w1 <- c1.keySet) {
      val tot = vocab2.toSeq.map { w2 =>
        val disc = math.max(c12.getOrElse((w1, w2), 0L) - 0.75, 0.0) / c1(w1)
        disc + 0.75 * n1p(w1) / c1(w1) * nc(w2) / nbig
      }.sum
      assert(math.abs(tot - 1.0) < 1e-9, s"context '$w1' mass $tot")
    }
    // exact quantized recompute of every doc score
    def q(x: Long) = math.floor(math.log(x.toDouble) * 1e6).toLong
    val expect = corpus.map { case (id, t) =>
      val w = t.split(" ").toSeq
      val ev = w.zip(w.drop(1))
      val nllq = ev.map { case (w1, w2) =>
        q(4L * c1(w1) * nbig) -
          q((4L * c12((w1, w2)) - 3L) * nbig + 3L * n1p(w1) * nc(w2))
      }.sum
      (id, ev.size.toLong,
        if (ev.isEmpty) None else Some(nllq.toDouble / (ev.size * 1000000L).toDouble))
    }
    val out = CorpusStats
      .knBigramPerplexity(corpus.toDF("doc_id", "text"), "doc_id", "text", maxNll = 1.5)
      .orderBy("doc_id")
      .as[(Long, Long, Option[Double], Boolean)].collect().toSeq
    for (((id, n, nll), got) <- expect.zip(out)) {
      assert(got._1 == id && got._2 == n && got._3 == nll, s"doc $id: $got")
      assert(got._4 == nll.exists(_ <= 1.5))
    }
  }
}
