package graft

import org.apache.spark.sql.functions._
import graft.operators.NaiveBayes

/** Pins [[NaiveBayes.classify]]'s DISCRIMINATIVE behavior (the DuckDB
  * gate q_nb_classify proves engine-exactness, but this testdata's
  * synthetic texts carry no per-source signal): constructed separable
  * vocabularies classify correctly, priors decide zero-evidence docs,
  * ties break by label, and unlabeled train rows don't become a
  * phantom class. */
class NaiveBayesSpec extends SparkSpecBase {

  private def run(rows: Seq[(Long, String, String, Boolean)]) = {
    import spark.implicits._
    NaiveBayes.classify(
      rows.toDF("doc_id", "text", "label", "is_train"),
      "doc_id", "text", "label", col("is_train"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(4)))).toMap
  }

  test("separable vocabularies classify correctly; mixed evidence goes to the majority tokens") {
    val out = run(Seq(
      (1L, "alpha beta alpha", "A", true),
      (2L, "beta alpha beta beta", "A", true),
      (3L, "gamma delta gamma", "B", true),
      (4L, "delta delta gamma", "B", true),
      (10L, "alpha beta", null, false),
      (11L, "gamma delta delta", null, false),
      (12L, "alpha gamma gamma", null, false))) // 2 B-tokens vs 1 A-token
    assert(out(10L) == (("A", 2L)))
    assert(out(11L) == (("B", 3L)))
    assert(out(12L)._1 == "B")
  }

  test("zero-token and all-unseen docs fall back to the prior; ties break label-ascending") {
    // priors: C has 2 train docs, A and B one each → empty doc goes to C
    val out = run(Seq(
      (1L, "alpha alpha", "A", true),
      (2L, "gamma gamma", "B", true),
      (3L, "omega psi", "C", true),
      (4L, "psi omega omega", "C", true),
      (10L, "", null, false),
      (11L, "zzz qqq", null, false)))
    assert(out(10L) == (("C", 0L)), "empty doc classifies by the doc-count prior")
    // unseen-everywhere tokens: per-class default ln(1/(nk+B)) favors the
    // SMALLER class likelihood but C's prior (ln 2/4 vs ln 1/4) dominates
    // at equal nk... here nk(A)=nk(B)=2 < nk(C)=5, so A vs B tie on
    // evidence AND prior — label asc picks A only if it beats C overall.
    // Just pin determinism and the token count; the argmax value is
    // already hash-pinned by the gate.
    assert(out(11L)._2 == 2L)
    val again = run(Seq(
      (1L, "alpha alpha", "A", true),
      (2L, "gamma gamma", "B", true),
      (3L, "omega psi", "C", true),
      (4L, "psi omega omega", "C", true),
      (10L, "", null, false),
      (11L, "zzz qqq", null, false)))
    assert(again(11L) == out(11L), "unseen-token argmax is deterministic")
  }

  test("exact tie on evidence and prior breaks by label ascending") {
    val out = run(Seq(
      (1L, "alpha", "B", true),
      (2L, "alpha", "A", true),
      (10L, "alpha alpha", null, false)))
    assert(out(10L) == (("A", 2L)))
  }

  test("null train labels are excluded from the model, not a phantom class") {
    val out = run(Seq(
      (1L, "alpha beta", "A", true),
      (2L, "gamma delta", "B", true),
      (3L, "alpha beta gamma delta omega", null, true), // unlabeled backfill
      (10L, "alpha beta", null, false)))
    assert(out(10L)._1 == "A")
    // and the unlabeled row's tokens did not leak into either class:
    // "omega" stays unseen for both, so a pure-omega doc ties A/B on
    // evidence and prior → label asc
    val out2 = run(Seq(
      (1L, "alpha beta", "A", true),
      (2L, "gamma delta", "B", true),
      (3L, "omega omega omega", null, true),
      (11L, "omega", null, false)))
    assert(out2(11L)._1 == "A")
  }
}
