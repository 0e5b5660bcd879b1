package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Gate ordering and auditability of the one-pass curation pipeline. */
class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  test("curate applies gates in order and keeps the decision auditable") {
    val good = "the cat and the dog of a house with many windows and a door " * 4
    val docs = Seq(
      (1L, good),                       // keep (en, long enough, canonical)
      (2L, good),                       // exact dup of 1
      (3L, good + "extra tail words"),  // near dup of 1 (not exact)
      (4L, "der hund und die katze ist im haus " * 6), // lang=de -> dropped
      (5L, "ok")                        // en?, too short -> quality or lang
    ).toDF("doc_id", "text")

    val out = Curation.curate(docs, languages = Seq("en"), minQuality = 0.3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), Option(r.getAs[String]("reason")), Option(r.getAs[String]("split"))))
      .toMap

    assert(out(1L)._1 && out(1L)._2.isEmpty && out(1L)._3.nonEmpty)
    assert(out(2L) === ((false, Some("exact_dup"), None)))
    assert(out(3L) === ((false, Some("near_dup"), None)))
    assert(out(4L) === ((false, Some("lang"), None)))
    assert(!out(5L)._1 && Set("lang", "quality").contains(out(5L)._2.get))
    // every input doc has exactly one decision row
    assert(out.size == 5)
  }

  test("boilerplate flags grams shared across a source's docs, not cross-source or unique text") {
    val header = "this site uses cookies to improve your experience always"
    val docs = Seq(
      (1L, s"$header alpha beta gamma delta epsilon zeta eta theta", "siteA"),
      (2L, s"$header iota kappa lambda mu nu xi omicron pi", "siteA"),
      // same header on ANOTHER source: must not count toward siteA's df,
      // and alone on siteB it stays under minDf
      (3L, s"$header rho sigma tau upsilon phi chi psi omega", "siteB"),
      (4L, "entirely unique prose with no repeated navigation fragments at all", "siteA"),
      // fewer than n tokens: no 5-grams exist, but the doc must STILL
      // get an output row (explode_outer) — a pipeline joining
      // decisions back to the corpus must not lose it
      (5L, "too short", "siteA")
    ).toDF("doc_id", "text", "source")

    val rows = graft.operators.TextAnalysis
      .boilerplate(docs, "doc_id", "text", "source", n = 5, minDf = 2)
      .orderBy("doc_id")
      .collect()
    val out = rows
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_boiler"), r.getAs[Long]("n_grams")))
      .toMap

    // the 9-token header contributes 5 shared 5-grams to docs 1 and 2
    assert(out(1L)._1 == 5L, s"doc1 boiler grams: ${out(1L)}")
    assert(out(2L)._1 == 5L, s"doc2 boiler grams: ${out(2L)}")
    assert(out(3L)._1 == 0L, "siteB's single doc has nothing repeated within its source")
    assert(out(4L)._1 == 0L, "unique prose has no boilerplate")
    // 17 tokens per doc -> 13 distinct 5-grams
    assert(out(1L)._2 == 13L)
    // the short doc: present, zero grams, null fraction
    assert(out(5L) == (0L, 0L), s"sub-n-token doc must surface with zero counts: ${out.get(5L)}")
    assert(rows.find(_.getAs[Long]("doc_id") == 5L).get.isNullAt(3),
      "boiler_frac must be null (not NaN) when no grams exist")
  }

  test("substring duplication flags positions whose k-token span recurs anywhere in the corpus") {
    val shared = "one two three four five six seven eight nine ten eleven twelve" // 12 tokens
    val docs = Seq(
      (1L, s"$shared alpha beta gamma"),          // shares a 12-token prefix with doc 2
      (2L, s"$shared delta epsilon zeta"),
      (3L, "totally different words making a unique fifteen token document nothing shared here at all"),
      (4L, "too short for any span")              // < k tokens: row kept, zero spans
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .substringDuplication(docs, "doc_id", "text", k = 10)
      .orderBy("doc_id")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup")))
      .toMap
    // doc 1: 15 tokens -> 6 span positions; positions 0..2 lie inside the
    // shared 12-token run (a 10-token span fits at offsets 0,1,2), so 3 dup
    assert(out(1L) == (6L, 3L), s"doc1: ${out(1L)}")
    assert(out(2L) == (6L, 3L), s"doc2: ${out(2L)}")
    assert(out(3L)._2 == 0L, "unique doc has no duplicated spans")
    assert(out(4L) == (0L, 0L), "sub-k doc must still get a row with zero spans")
  }

  test("pii scrub masks email, IP, and phone spans with exact counts") {
    val docs = Seq(
      (1L, "contact john.doe+x@example.co.uk or 192.168.1.254 ; call +1-415-555-0199 today"),
      (2L, "no sensitive content here at all")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.piiScrub(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_emails") == 1 &&
      out(0).getAs[Long]("n_ips") == 1 && out(0).getAs[Long]("n_phones") == 1)
    assert(out(0).getAs[String]("scrubbed") == "contact <EMAIL> or <IP> ; call <PHONE> today")
    assert(out(1).getAs[Long]("n_emails") == 0 &&
      out(1).getAs[String]("scrubbed") == "no sensitive content here at all")
  }

  test("chunkDocs windows tokens with overlap, keeps the tail and empty docs") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens
      (2L, "x y"),                 // shorter than one chunk
      (3L, "--- ;;; !!!")          // tokenizes to zero tokens
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .chunkDocs(docs, "doc_id", "text", chunk = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getAs[Long]("doc_id"), Option(r.getAs[java.lang.Long]("chunk_idx")),
        Option(r.getAs[java.lang.Long]("n_tokens")), Option(r.getAs[String]("chunk_text"))))
    // doc 1: starts 0,3,6,9 -> 4 chunks, last is the single-token tail
    assert(out.count(_._1 == 1L) == 4)
    assert(out(0) == ((1L, Some(0L), Some(4L), Some("a b c d"))))
    assert(out(1) == ((1L, Some(1L), Some(4L), Some("d e f g"))))
    assert(out(3) == ((1L, Some(3L), Some(1L), Some("j"))), s"tail chunk: ${out(3)}")
    // doc 2: one short chunk
    assert(out(4) == ((2L, Some(0L), Some(2L), Some("x y"))))
    // doc 3: zero tokens -> exactly one row, null idx/count/text
    assert(out(5) == ((3L, None, None, None)), "empty doc keeps a joinable row")
    assert(out.length == 6)
    // stride == chunk is disjoint windows covering every token once
    val disjoint = graft.operators.TextAnalysis
      .chunkDocs(docs.filter(col("doc_id") === 1L), "doc_id", "text", chunk = 5, stride = 5)
      .orderBy("chunk_idx").collect()
    assert(disjoint.map(_.getAs[Long]("n_tokens")).toSeq == Seq(5L, 5L))
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.chunkDocs(docs, "doc_id", "text", chunk = 4, stride = 5)
    }
  }

  test("capPerDomain keeps the top-quality docs per domain, audits the rest, spares small domains") {
    import spark.implicits._
    val good = "the cat and the dog of a house with many windows and a door " * 4
    val bad = "x!!! y??? z;;;"
    val docs = Seq(
      (1L, good, "a"), (2L, good, "a"), (3L, bad, "a"), // domain a: 3 docs, cap 2
      (4L, bad, "b") // domain b under the cap: kept even at low quality
    ).toDF("doc_id", "text", "source")
    val out = Curation.capPerDomain(docs, "doc_id", "text", "source", maxPerDomain = 2)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Int]("rk"), r.getAs[Boolean]("kept"))))
      .toMap
    assert(out.size == 4, "every input doc gets an audited row")
    // identical quality ties break by ascending id
    assert(out(1L) == ((1, true)) && out(2L) == ((2, true)))
    assert(out(3L) == ((3, false)), "lowest quality doc in a full domain is dropped")
    assert(out(4L) == ((1, true)), "a domain under the cap keeps everything")
    intercept[IllegalArgumentException] {
      Curation.capPerDomain(docs, "doc_id", "text", "source", maxPerDomain = 0)
    }
  }

  test("groupSplit keeps every group whole; near-dup clusters never cross the split") {
    import spark.implicits._
    // many docs per group, many groups: no group may straddle sides,
    // and with 200 groups both sides must be populated at evalFrac 0.1
    val docs = (0 until 1000).map(i => (i.toLong, s"g${i % 200}")).toDF("doc_id", "grp")
    val out = Curation.groupSplit(docs, col("grp"), evalFrac = 0.1)
    val sidesPerGroup = out.groupBy("grp")
      .agg(countDistinct(col("split")).as("sides"))
      .agg(max(col("sides"))).head().getLong(0)
    assert(sidesPerGroup == 1L, "a group must never straddle the split")
    val bySide = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySide.keySet == Set("train", "eval") && bySide("train") > bySide("eval"),
      s"both sides populated, train the larger: $bySide")
    // determinism: the side is a pure function of the group name
    assert(Curation.groupSplit(docs, col("grp"), evalFrac = 0.1)
      .select("doc_id", "split").collect().toSet ==
      out.select("doc_id", "split").collect().toSet)

    // the strongest composition: split on the near-dup CLUSTER label
    // (dedupClusters) and no near-dup pair can cross the split
    val near = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (3L, "a wholly different document about columnar shuffle compression tradeoffs"),
      (4L, "a wholly different document about columnar shuffle compression tradeoff")
    ).toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.minhashJaccardPairs(near, "doc_id", "text", threshold = 0.5)
    val clustered = graft.operators.Dedup.dedupClusters(near, "doc_id", pairs)
    val splitByCluster = Curation.groupSplit(
      near.join(clustered, "doc_id"), col("canonical_id"), evalFrac = 0.3)
    val pairSides = splitByCluster
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pairSides(1L) == pairSides(2L) && pairSides(3L) == pairSides(4L),
      s"near-dup pairs must land on the same side: $pairSides")

    intercept[IllegalArgumentException](Curation.groupSplit(docs, col("grp"), evalFrac = 0.0))
    intercept[IllegalArgumentException](Curation.groupSplit(docs, col("grp"), evalFrac = 1.0))
  }

  test("corpusDiff classifies added/removed/changed/unchanged, whitespace-insensitively normalized") {
    import spark.implicits._
    val v1 = Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon"), (3L, "kept the same"),
      (4L, "Case AND punctuation!! differ")
    ).toDF("doc_id", "text")
    val v2 = Seq(
      (1L, "alpha beta gamma CHANGED"), (3L, "kept the same"),
      // fingerprint normalizes case/punctuation: not a content change
      (4L, "case and punctuation differ"),
      (5L, "brand new doc")
    ).toDF("doc_id", "text")
    val out = Curation.corpusDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("change")).toMap
    assert(out == Map(
      1L -> "changed", 2L -> "removed", 3L -> "unchanged",
      4L -> "unchanged", 5L -> "added"))
  }

  test("contaminationScreenBloom equals the exact check even when the filter is FP-saturated") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val eval = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      // contains eval 5-gram "alpha beta gamma delta epsilon"
      (1L, "prefix alpha beta gamma delta epsilon suffix tail words here"),
      (2L, "nothing shared with the benchmark set at all in this document text"),
      (3L, "too short"), // < 5 tokens -> zero grams -> no output row
      (4L, "one two three four five six seven"),
      // duplicate id: the exact check aggregates BY ID, so the twin
      // must too — one row, gram instances summed across the two rows
      (5L, "one two three four five"),
      (5L, "unrelated words fill this row entirely")
    ).toDF("doc_id", "text")
    def run(fpp: Double) = TextAnalysis
      .contaminationScreenBloom(corpus, eval, "doc_id", "text", n = 5, fpp = fpp)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val tight = run(0.01)
    // doc 4 = 7 tokens -> 3 distinct grams, all in eval doc 101;
    // doc 5 = two rows merged by id: 1 + 2 grams, 1 hit
    assert(tight == Seq((1L, 6L, 1L), (2L, 8L, 0L), (4L, 3L, 3L), (5L, 3L, 1L)))
    // a near-useless filter (fpp 0.5) lets false positives through the
    // screen; the exact verify must kill every one of them
    assert(run(0.5) == tight, "verify join removes Bloom false positives")
  }

  test("contaminationScreenBloom plan screens map-side with the codegen'd might_contain") {
    import spark.implicits._
    val eval = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val plan = graft.operators.TextAnalysis
      .contaminationScreenBloom(corpus, eval, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom screen missing from plan:\n$plan")
  }
}
