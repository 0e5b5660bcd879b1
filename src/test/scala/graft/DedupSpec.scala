package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.F

class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 0
    (2L, "completely different content about spark catalyst optimizer and tungsten"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
    (4L, "yet another unrelated text mentioning columnar storage formats and parquet")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts and keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text").orderBy("keep_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 2L), (1L, 1L), (2L, 1L), (4L, 1L)))
  }

  test("minhash LSH finds the exact and near duplicates, not the unrelated pairs") {
    val pairs = Dedup
      .minhashPairs(docs, "doc_id", "text", numHashes = 64, bands = 16, threshold = 0.3)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(pairs.contains((0L, 3L))) // exact dup: est jaccard 1.0
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 3L))) // near dup
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(2L) || Set(a, b).contains(4L) })
  }

  test("minhash estimated jaccard tracks true shingle jaccard") {
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
    val a = sh.filter(col("doc_id") === 0).select(col("sh").as("sa"))
    val b = sh.filter(col("doc_id") === 1).select(col("sh").as("sb"))
    val trueJac = a.crossJoin(b).select(F.jaccard(col("sa"), col("sb"))).as[Double].head()
    val est = Dedup
      .minhashPairs(docs, "doc_id", "text", threshold = 0.0)
      .filter(col("id_a") === 0 && col("id_b") === 1)
      .select("est_jaccard")
      .as[Double]
      .head()
    assert(math.abs(trueJac - est) < 0.2, s"true=$trueJac est=$est")
  }

  test("simhash: identical texts have hamming 0 and are paired") {
    val sigs = Dedup.simhashSigs(docs, "doc_id", "text", 3)
    val s0 = sigs.filter(col("id") === 0).select("sig").as[Long].head()
    val s3 = sigs.filter(col("id") === 3).select("sig").as[Long].head()
    assert(s0 == s3)
    val pairs = Dedup
      .simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(pairs.contains((0L, 3L)))
  }

  test("exact-verified LSH dedups equal brute-force jaccard/cosine ground truth on real data") {
    val real = spark.read.parquet(s"$sfDir/documents.parquet")
    val sh = real.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
    val brute = sh.select(col("doc_id").as("ia"), col("sh").as("sa"))
      .crossJoin(sh.select(col("doc_id").as("ib"), col("sh").as("sb")))
      .filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))).cast("double")).as("jac"))
      .filter(col("jac") >= 0.5)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val viaMinhash = Dedup.minhashJaccardPairs(real, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val viaSimhash = Dedup.simhashJaccardPairs(real, "doc_id", "text", maxHamming = 12, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(viaMinhash == brute, s"minhash candidates missed a true pair: ${brute.diff(viaMinhash)}")
    assert(viaSimhash == brute, s"simhash candidates missed a true pair: ${brute.diff(viaSimhash)}")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val ve = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("vb")))
      .filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib"), call_function("graft_cosine", col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= 0.5)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val viaLsh = Dedup.embeddingPairs(emb, "vec_id", "embedding", threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(viaLsh == ve, s"embedding LSH missed a true pair: ${ve.diff(viaLsh)}")
  }

  test("maxBucket caps degenerate LSH buckets without touching distinct-content pairs") {
    // 40 identical boilerplate docs (one quadratic bucket) + 2 distinct near-dups
    val docs = ((1L to 40L).map(i => (i, "empty boilerplate page nothing here")) ++ Seq(
      (100L, "the quick brown fox jumps over the lazy dog by the river"),
      (101L, "the quick brown fox jumps over the lazy dog by the riverbank")
    )).toDF("doc_id", "text")
    val uncapped = Dedup.minhashJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(uncapped.count { case (a, b, _) => a < 100 && b < 100 } == 40 * 39 / 2)
    val capped = Dedup.minhashJaccardPairs(docs, "doc_id", "text", threshold = 0.5, maxBucket = Some(10))
      .as[(Long, Long, Double)].collect().toSet
    // boilerplate bucket dropped (route via exact dedup instead)...
    assert(!capped.exists { case (a, b, _) => a < 100 && b < 100 })
    // ...while the genuinely-distinct near-dup pair survives
    assert(capped.exists { case (a, b, _) => a == 100L && b == 101L })
  }

  test("connected components: chains, separate components, canonical mapping") {
    // component {1..6} as a pure chain (worst case for naive propagation),
    // component {10,11,12} as a triangle, 20-21 pair, 30 singleton
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L), (5L, 4L), (6L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)
    ).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert((1L to 6L).forall(comp(_) == 1L), s"chain must collapse to 1: $comp")
    assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L))
    assert(comp(20L) == 20L && comp(21L) == 20L)
    assert(!comp.contains(30L)) // not in any pair -> not in component output

    val docs = (Seq(1L, 2L, 3L, 4L, 5L, 6L, 10L, 11L, 12L, 20L, 21L, 30L)).toDF("doc_id")
    val clusters = Dedup.dedupClusters(docs, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(clusters(30L) == 30L) // singleton is its own canonical
    assert(clusters(6L) == 1L && clusters(12L) == 10L && clusters(21L) == 20L)
    val kept = clusters.filter { case (id, canon) => id == canon }.keySet
    assert(kept === Set(1L, 10L, 20L, 30L))

    // ids keep their native type: string ids must not be nulled away
    val sPairs = Seq(("doc-b", "doc-a"), ("doc-b", "doc-c")).toDF("id_a", "id_b")
    val sComp = Dedup.connectedComponents(sPairs).as[(String, String)].collect().toMap
    assert(sComp === Map("doc-a" -> "doc-a", "doc-b" -> "doc-a", "doc-c" -> "doc-a"))
  }

  test("prefix-filtered ngram jaccard returns exactly the unfiltered result") {
    val real = spark.read.parquet(s"$sfDir/documents.parquet")
    val full = Dedup
      .ngramJaccardPairsDense(real, "doc_id", "text", Seq("lang", "source"), n = 4, threshold = 0.35)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val prefixed = Dedup
      .ngramJaccardPairsPrefix(real, "doc_id", "text", Seq("lang", "source"), n = 4, threshold = 0.35)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(prefixed == full)
    // the volume-sized candidate-join width (the dispatcher engages it
    // past ~8M estimated rows — unreachable at spec scale) must be a
    // pure plan-width change, never a result change
    val widened = Dedup
      .ngramJaccardPairsPrefix(real, "doc_id", "text", Seq("lang", "source"), n = 4,
        threshold = 0.35, numPartitions = Some(64))
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(widened == full)
  }

  test("ngram jaccard dispatcher routes by skew and both routes give identical pairs") {
    val real = spark.read.parquet(s"$sfDir/documents.parquet")
    val dense = Dedup
      .ngramJaccardPairsDense(real, "doc_id", "text", Seq("lang", "source"), n = 4, threshold = 0.35)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    // default bound: the tiny dense corpus stays on the direct self-join route
    val auto = Dedup
      .ngramJaccardPairs(real, "doc_id", "text", Seq("lang", "source"), n = 4, threshold = 0.35)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    // forced-low bound: any corpus reads as heavy-tailed → prefix route
    val forced = Dedup
      .ngramJaccardPairs(real, "doc_id", "text", Seq("lang", "source"), n = 4, threshold = 0.35,
        maxExpansion = 0.0)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(auto == dense)
    assert(forced == dense)
  }

  test("conf-pinned ngram route skips the probes and is pair-identical on every value") {
    val real = spark.read.parquet(s"$sfDir/documents.parquet")
    def run(): Seq[(Long, Long, Double)] = Dedup
      .ngramJaccardPairs(real, "doc_id", "text", Seq("lang", "source"), n = 4, threshold = 0.35,
        probeFraction = 1.0)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val adaptive = run()
    val key = "graft.dedup.ngram.route"
    try {
      for (route <- Seq("collapsed", "dense", "prefix")) {
        spark.conf.set(key, route)
        assert(run() == adaptive, s"pinned route '$route' must match the adaptive result")
      }
      spark.conf.set(key, "bogus")
      intercept[IllegalArgumentException](run())
    } finally spark.conf.unset(key)
  }

  test("exact-dup collapse is pair-identical to the raw pipeline on a replica-saturated corpus") {
    // the sf0.5_synth straggler shape: dense replica clusters (identical
    // text) that melt the posting self-join, plus the edge cases the
    // collapse must not distort — near-dups ACROSS clusters, short
    // texts (single tail gram), empty text (gram [""]), null text
    // (never pairs), and a group-key split of identical texts
    val docs = (
      (1L to 25L).map(i => (i, "the quick brown fox jumps over the lazy dog by the river", "en", "s0")) ++
      (31L to 55L).map(i => (i, "the quick brown fox jumps over the lazy dog by the riverbank", "en", "s0")) ++
      Seq(
        (60L, "a completely different document about spark query planning", "en", "s0"),
        (61L, "ab", "en", "s0"), (62L, "ab", "en", "s0"), (63L, "ab", "ru", "s0"),
        (64L, "", "en", "s0"), (65L, "", "en", "s0"),
        (66L, null.asInstanceOf[String], "en", "s0"), (67L, null.asInstanceOf[String], "en", "s0"),
        (68L, "The Quick BROWN fox jumps over the lazy dog by the river", "en", "s0"),
        // null GROUP keys are pair-sterile in the raw pipeline (the
        // posting join's group equality is null) — identical texts
        // under a null group must not become collapse intra pairs
        (70L, "identical text under a null group key", null.asInstanceOf[String], "s0"),
        (71L, "identical text under a null group key", null.asInstanceOf[String], "s0")
      )).toDF("doc_id", "text", "lang", "source")
    val raw = Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", Seq("lang", "source"), n = 4, threshold = 0.35,
        collapseExact = false)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    // probeFraction = 1: the dup probe sees the full corpus (44% exact
    // dups ≫ the 5% bound), so this run provably takes the collapse
    // route rather than sampling its way back to raw
    val collapsed = Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", Seq("lang", "source"), n = 4, threshold = 0.35,
        probeFraction = 1.0)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(collapsed == raw)
    // sanity on the shape itself: the 26-member cluster (1-25 plus the
    // case-folded 68) emits all intra pairs, the cross-cluster near-dup
    // pairs survive, nulls never pair, and the ru-group "ab" never
    // pairs with the en-group ones
    val set = collapsed.map(p => (p._1, p._2)).toSet
    assert(set.count { case (a, b) => a <= 25 && b <= 25 } == 25 * 24 / 2)
    assert(set.contains((1L, 68L)) && set.contains((25L, 68L)))
    assert(set.contains((1L, 31L))) // cross-cluster near-dup at rep jaccard
    assert(set.contains((61L, 62L)) && !set.contains((61L, 63L)) && !set.contains((62L, 63L)))
    assert(set.contains((64L, 65L)))
    assert(!set.exists { case (a, b) =>
      Set(66L, 67L, 70L, 71L).contains(a) || Set(66L, 67L, 70L, 71L).contains(b) })
  }

  test("collapse chunking: a mega exact-dup cluster expands the same pairs through bounded chunks") {
    // 900 exact replicas force ceil(900/256) = 4 membership chunks —
    // every intra pair must appear exactly once across the triangular
    // chunk join (4 same-chunk + 6 cross-chunk cells), every cross
    // pair once per member combination, and no collect_list buffer
    // ever holds more than ~MaxChunk ids (the OOM bound under test).
    // A second small cluster + a near-dup partner pin the cross rules.
    val mega = (1L to 900L).map(i => (i, "mega cluster boilerplate page body", "en", "s0"))
    val small = (1000L to 1002L).map(i => (i, "a second, smaller duplicated document", "en", "s0"))
    val near = Seq((2000L, "mega cluster boilerplate page bods", "en", "s0")) // near-dup of mega
    val docs = (mega ++ small ++ near).toDF("doc_id", "text", "lang", "source")
    val got = Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", Seq("lang", "source"), n = 4, threshold = 0.35,
        probeFraction = 1.0)
      .select(col("id_a"), col("id_b"), col("jac"))
    // intra: C(900,2) + C(3,2) pairs at jaccard 1.0
    assert(got.filter(col("jac") === 1.0).count() == 900L * 899 / 2 + 3)
    // no pair may appear twice (the chunk join's exactly-once contract)
    assert(got.groupBy(col("id_a"), col("id_b")).count().filter(col("count") > 1).count() == 0)
    // every ordered intra pair present (spot-check the extremes + a
    // cross-chunk-certain pair)
    val intraSet = got.filter(col("jac") === 1.0)
      .filter(col("id_a").isin(1L, 899L) || col("id_b").isin(2L, 900L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(intraSet.contains((1L, 900L)) && intraSet.contains((899L, 900L)) &&
      intraSet.contains((1L, 2L)))
    // cross: the near-dup pairs against EVERY mega member at the rep jaccard
    val crossRows = got.filter(col("id_b") === 2000L && col("jac") < 1.0)
    assert(crossRows.count() == 900)
    assert(crossRows.select(countDistinct(col("jac"))).head().getLong(0) == 1)
    // and the raw pipeline agrees on the near-dup's pair count + jac
    val raw = Dedup
      .ngramJaccardPairs(docs.filter(col("doc_id").isin(1L, 2L, 2000L)), "doc_id", "text",
        Seq("lang", "source"), n = 4, threshold = 0.35, collapseExact = false)
      .filter(col("id_b") === 2000L).select(col("jac")).head().getDouble(0)
    assert(crossRows.select(col("jac")).head().getDouble(0) == raw)
  }

  test("heavy-gram salting is join-identical: each pair meets exactly once, spread or not") {
    // a shared boilerplate prefix makes its grams hot while unique
    // tails keep most pairs sub-threshold; two true near-dups must
    // survive with identical jaccard on both plans
    val docs = ((1L to 300L).map(i => (i, s"zzzz common head doc$i tail${i * 7}", "en", "s0")) ++ Seq(
      (900L, "the quick brown fox jumps over the lazy dog", "en", "s0"),
      (901L, "the quick brown fox jumps over the lazy dogs", "en", "s0")
    )).toDF("doc_id", "text", "lang", "source")
    val ex = Dedup.gramPostings(docs, "doc_id", "text", Seq("lang", "source"), 4)
    val unsalted = Dedup.denseFromPostings(ex, Seq("lang", "source"), 0.35)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    // force-salt the hot prefix grams (plus one absent key — harmless)
    val hot = Seq("zzzz", "zzz ", "zz c", "comm").map(g => s"en\u0000s0\u0000$g") :+ "en\u0000s0\u0000nope"
    val salted = Dedup.denseFromPostings(ex, Seq("lang", "source"), 0.35, heavyKeys = hot)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(salted == unsalted)
    assert(salted.exists(p => p._1 == 900L && p._2 == 901L))
  }

  test("embedding LSH pairs agree with brute-force cosine at the same threshold on real data") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val lsh = Dedup
      .embeddingPairs(emb, "vec_id", "embedding", threshold = 0.4)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val brute = a
      .crossJoin(b)
      .filter(col("ia") < col("ib"))
      .withColumn("cos", F.cosine(col("va"), col("vb")))
      .filter(col("cos") >= 0.4)
      .select("ia", "ib")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(lsh.subsetOf(brute), "LSH must not produce false positives after exact verification")
    assert(brute.isEmpty || lsh.nonEmpty, "LSH should recall some true pairs")
  }

  test("threshold-sized bandings satisfy the miss bound inside their bit budgets") {
    def missSign(t: Double, planes: Int, bands: Int): Double = {
      val p = 1.0 - math.acos(t) / math.Pi
      math.pow(1.0 - math.pow(p, planes / bands), bands)
    }
    def missMinhash(t: Double, hashes: Int, bands: Int): Double =
      math.pow(1.0 - math.pow(t, hashes / bands), bands)
    for (t <- Seq(0.3, 0.5, 0.7, 0.8, 0.9, 0.97)) {
      val (pl, bs) = Dedup.signBanding(t)
      assert(pl <= 64 && bs >= 1 && pl % bs == 0, s"sign t=$t -> ($pl,$bs)")
      assert(missSign(t, pl, bs) <= 1e-6, s"sign miss bound violated at t=$t: ($pl,$bs)")
      val (nh, nb) = Dedup.minhashBanding(t)
      assert(nh <= 128 && nb >= 1 && nh % nb == 0, s"minhash t=$t -> ($nh,$nb)")
      assert(missMinhash(t, nh, nb) <= 1e-6, s"minhash miss bound violated at t=$t: ($nh,$nb)")
    }
    // the known layouts the gate queries rely on
    assert(Dedup.signBanding(0.5) == (48, 24))
    assert(Dedup.minhashBanding(0.5) == (98, 49))
    // missTarget is the recall/cost dial: loosening it shrinks the
    // banding (fewer bands => fewer candidates), still within bound
    val (nhL, nbL) = Dedup.minhashBanding(0.5, missTarget = 1e-3)
    assert(nhL < 98, s"looser bound must shrink the layout, got ($nhL,$nbL)")
    assert(missMinhash(0.5, nhL, nbL) <= 1e-3)
  }

  test("IVF cell-partitioned embedding pairs: exact subset of brute force with measured recall") {
    // synthetic clustered corpus with KNOWN ≥-threshold structure (the
    // sf0.001 embeddings have zero t≥0.5 pairs, which would make the
    // recall assertion vacuous): 40 cluster centers on deterministic
    // pseudo-random directions, 6 members each = small perturbations of
    // the center (within-cluster cosine ≈ 0.98 ≥ 0.5), plus 160 lone
    // noise vectors. Every number derives from xxhash-style mixing of
    // the index — no RNG state, identical corpus every run.
    def mix(i: Long, j: Long): Double = {
      var h = i * 0x9E3779B97F4A7C15L + j * 0xC2B2AE3D27D4EB4FL
      h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
      (h >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    val dim = 16
    val vecs = ((0 until 40).flatMap { c =>
      val center = Array.tabulate(dim)(d => mix(c, d))
      (0 until 6).map { m =>
        val id = (c * 6 + m).toLong
        id -> Array.tabulate(dim)(d => (center(d) + 0.02 * mix(id + 1000, d)).toFloat)
      }
    } ++ (0 until 160).map { n =>
      val id = (1000 + n).toLong
      id -> Array.tabulate(dim)(d => mix(id + 5000, d).toFloat)
    }).toDF("vec_id", "embedding")

    val a = vecs.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = vecs.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val brute = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib"), call_function("graft_cosine", col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= 0.5)
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    assert(brute.size >= 40 * 15, s"corpus must contain real ≥0.5 pairs, got ${brute.size}")
    val ivf = Dedup.embeddingPairsIvf(vecs, "vec_id", "embedding", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // exact verification makes false positives structurally impossible
    assert((ivf -- brute).isEmpty, s"IVF produced non-pairs: ${ivf -- brute}")
    // recall is the measured quantity the scale dispatch trades on;
    // near-dup pairs are close vectors, which coarse k-means cells
    // keep together — multi-probe covers most boundary splits
    val recall = (brute & ivf).size.toDouble / brute.size
    info(f"IVF within-cell recall vs brute at t=0.5: $recall%.3f (${ivf.size}/${brute.size} pairs)")
    assert(recall >= 0.9, f"IVF recall $recall%.3f below floor: missed ${(brute -- ivf).size} pairs")

    // the low-threshold dispatch: past the brute bound embeddingPairs
    // must route to the IVF path (a subset), below it to brute (exact)
    val viaDispatchBrute = Dedup.embeddingPairs(vecs, "vec_id", "embedding", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(viaDispatchBrute == brute, "below the bound the dispatch must stay exact")
    val viaDispatchIvf = Dedup.embeddingPairs(vecs, "vec_id", "embedding", threshold = 0.5,
      bruteBound = 0L).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(viaDispatchIvf == ivf, "past the bound the dispatch must take the IVF cell path")

    // the TWO-LEVEL quantizer (the >4096-cell scale path): same subset
    // guarantee, recall measured across both levels of cell boundaries
    val hier = Dedup.embeddingPairsIvfHier(vecs, "vec_id", "embedding", threshold = 0.5,
      c1 = 5, c2 = 5).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert((hier -- brute).isEmpty, s"hier IVF produced non-pairs: ${hier -- brute}")
    val hierRecall = (brute & hier).size.toDouble / brute.size
    info(f"two-level IVF recall vs brute at t=0.5 (5x5 cells, 2x2 probes): $hierRecall%.3f")
    assert(hierRecall >= 0.85, f"hier recall $hierRecall%.3f below floor")
  }

  test("degenerate vectors never pair: graft_cosine is NULL, the corpus does not collapse") {
    // Spark orders NaN ABOVE every number, so a NaN cosine (IEEE 0/0 for
    // zero-norm vectors) would satisfy ANY `cos >= t` filter, pair the
    // degenerate vector with the whole corpus, and connected components
    // would collapse everything into one cluster. graft_cosine must
    // return SQL NULL for undefined cosines instead.
    graft.sql.GraftFunctions.register(spark)
    val cs = Seq(
      (Seq(0.0f, 0.0f), Seq(1.0f, 1.0f)),      // zero-norm left
      (Seq(1.0f, 1.0f), Seq(0.0f, 0.0f)),      // zero-norm right
      (Seq(Float.NaN, 1.0f), Seq(1.0f, 1.0f)), // NaN element
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))       // well-defined control
    ).toDF("a", "b").select(call_function("graft_cosine", col("a"), col("b")).as("cos")).collect()
    assert(cs(0).isNullAt(0) && cs(1).isNullAt(0) && cs(2).isNullAt(0))
    assert(math.abs(cs(3).getDouble(0) - 1.0) < 1e-12)

    // t=0.5 dispatches to the all-pairs brute path — the one the NaN
    // semantics would poison. Zero-norm vectors must stay singletons.
    val vecs = Seq(
      (0L, Array(1.0f, 0.01f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.0f, 0.01f, 0.0f)), // near-dup of 0
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),   // zero-norm
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)),   // identical zero-norm
      (4L, Array(0.0f, 1.0f, 0.0f, 0.0f))    // orthogonal singleton
    ).toDF("vec_id", "embedding")
    val out = Dedup
      .semanticDedup(vecs, "vec_id", "embedding", threshold = 0.5)
      .orderBy("vec_id")
      .as[(Long, Long, Boolean)]
      .collect()
      .toSeq
    assert(out == Seq((0L, 0L, true), (1L, 0L, false), (2L, 2L, true), (3L, 3L, true), (4L, 4L, true)),
      s"degenerate vectors must not pair: $out")

    // the IVF fused-verify path must carry the SAME NaN→null guard:
    // its norm-precomputed quotient (0/0 = NaN for a zero-norm vector)
    // compared raw with `>= t` would pair the degenerate vector with
    // its whole probed cell (the r13 review find — Spark orders NaN
    // above every number)
    val ivfPairs = Dedup
      .embeddingPairsIvf(vecs, "vec_id", "embedding", threshold = 0.5, numCells = 2)
      .as[(Long, Long, Double)].collect().toSeq
    assert(ivfPairs.forall { case (a, b, _) => !Set(a, b).exists(Set(2L, 3L)) },
      s"zero-norm vectors must not pair on the IVF path: $ivfPairs")
  }

  test("hash-pair collapse key gives the same semantic dedup as raw-vector grouping") {
    // replica-heavy corpus: every vector appears 5x under distinct ids
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val replicated = (0 until 5)
      .map(i => emb.withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000L)))
      .reduce(_ unionByName _)
    val out = Dedup.semanticDedup(replicated, "vec_id", "embedding", threshold = 0.5)
      .as[(Long, Long, Boolean)].collect().toSeq.sorted
    // ground truth for the collapse stage computed over the RAW vector
    // (the formulation the 16-byte hash-pair window key replaced)
    val rawRep = replicated
      .withColumn("rep_id",
        min(col("vec_id")).over(org.apache.spark.sql.expressions.Window.partitionBy(col("embedding"))))
    // every replica must inherit its representative's canonical id
    val canon = out.map { case (id, c, _) => id -> c }.toMap
    val repOf = rawRep.select("vec_id", "rep_id").as[(Long, Long)].collect().toMap
    assert(replicated.select("vec_id").as[Long].collect()
      .forall(id => canon(id) == canon(repOf(id))), "replicas must share their representative's cluster")
    // and cluster count equals the base corpus' (replicas add no clusters)
    val baseKept = Dedup.semanticDedup(emb, "vec_id", "embedding", threshold = 0.5)
      .filter(col("keep")).count()
    assert(out.count(_._3) == baseKept)
  }

  test("semantic dedup collapses embedding clusters to min-id representatives") {
    // two tight clusters (0,1) and (2,3) plus a singleton 4: vectors in a
    // cluster are small perturbations, cross-cluster cosine ~ 0
    val vecs = Seq(
      (0L, Array(1.0f, 0.01f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.0f, 0.01f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.01f, 0.0f)),
      (3L, Array(0.01f, 0.99f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Dedup
      .semanticDedup(vecs, "vec_id", "embedding", threshold = 0.9)
      .orderBy("vec_id")
      .as[(Long, Long, Boolean)]
      .collect()
      .toSeq
    assert(out == Seq((0L, 0L, true), (1L, 0L, false), (2L, 2L, true), (3L, 2L, false), (4L, 4L, true)))
  }

  test("keep-best dedup retains the highest-scoring cluster member, min-id tie-break") {
    val docs = Seq(
      (1L, 0.5), (2L, 0.9), (3L, 0.9), // one cluster via pairs; 2 and 3 tie on score
      (4L, 0.2), // singleton: keeps itself regardless of score
      (5L, Double.NaN), // all-NaN cluster: normalized to NULL -> min id kept
      (6L, Double.NaN),
      (7L, 0.4), (8L, Double.NaN) // mixed: NaN must NOT outrank the real score
    ).toDF("id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 8L)).toDF("id_a", "id_b")
    val out = Dedup.dedupKeepBest(docs, "id", col("q"), pairs)
      .select("id", "cluster_id", "keep_id", "keep")
      .orderBy("id")
      .as[(Long, Long, Long, Boolean)]
      .collect()
      .toSeq
    assert(out == Seq(
      (1L, 1L, 2L, false), (2L, 1L, 2L, true), (3L, 1L, 2L, false),
      (4L, 4L, 4L, true),
      (5L, 5L, 5L, true), (6L, 5L, 5L, false),
      (7L, 7L, 7L, true), (8L, 7L, 7L, false)))
  }

  test("keep-best dedup: clusters whose every score is NULL keep the min id") {
    val docs = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double]))
      .toDF("id", "q")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = Dedup.dedupKeepBest(docs, "id", col("q"), pairs)
      .select("id", "keep_id", "keep").orderBy("id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, 1L, true), (2L, 1L, false)))
  }

  // ───────────── cross-corpus dedup (probe vs reference) ─────────────

  /** Spark-side quadratic ground truth for A-vs-B shingle jaccard. */
  private def bruteCross(probe: org.apache.spark.sql.DataFrame,
      ref: org.apache.spark.sql.DataFrame, threshold: Double) = {
    val sa = probe.select(col("doc_id").as("id_a"), Dedup.shingles(col("text"), 3).as("sa"))
    val sb = ref.select(col("doc_id").as("id_b"), Dedup.shingles(col("text"), 3).as("sb"))
    sa.crossJoin(sb)
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))).cast("double")).as("jac"))
      .filter(col("jac") >= threshold)
  }

  test("cross-corpus pairs equal the brute-force A×B ground truth at sf0.001") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val probe = docs.filter(col("source").isin("src0", "src1", "src2"))
    val ref = docs.filter(!col("source").isin("src0", "src1", "src2"))
    val got = Dedup.crossJaccardPairs(probe, ref, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = bruteCross(probe, ref, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(want.nonEmpty, "split must produce cross pairs or the test proves nothing")
  }

  test("indexed cross-corpus probe ≡ direct, and the geometry rides in the index meta") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val probe = docs.filter(col("source").isin("src0", "src1", "src2"))
    val ref = docs.filter(!col("source").isin("src0", "src1", "src2"))
    val path = "/tmp/graft_xidx_" + System.nanoTime()
    // build at a NON-default threshold: the probe call takes no threshold
    // argument, so agreement with the direct t=0.35 run proves the probe
    // read its banding geometry and threshold from the persisted meta
    Dedup.buildTextIndex(ref, "doc_id", "text", path, threshold = 0.35)
    val indexed = Dedup.crossJaccardPairsIndexed(probe, path, ref, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    val direct = Dedup.crossJaccardPairs(probe, ref, "doc_id", "text", threshold = 0.35)
      .as[(Long, Long, Double)].collect().toSet
    assert(indexed == direct)
    assert(indexed.nonEmpty)
  }

  test("cross-corpus: colliding ids across the two corpora are distinct documents") {
    // id 1 exists on BOTH sides with different text; the probe's id-1 doc
    // duplicates the ref's id-7 doc. Nothing may conflate the namespaces.
    val probe = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")).toDF("doc_id", "text")
    val ref = Seq(
      (1L, "completely unrelated reference content about distributed query planning"),
      (7L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")).toDF("doc_id", "text")
    val got = Dedup.crossJaccardPairs(probe, ref, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 7L)))
  }

  test("cross-corpus: empty probe shard yields no pairs against a populated index") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val ref = docs.filter(!col("source").isin("src0", "src1", "src2"))
    val empty = docs.filter(lit(false))
    assert(Dedup.crossJaccardPairs(empty, ref, "doc_id", "text").isEmpty)
  }

  test("admitShard: novel docs survive and are indexed; a later shard catches dups of them") {
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "completely different content about spark catalyst optimizer and tungsten")
    ).toDF("doc_id", "text")
    val shardB = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of base 1
      (11L, "a wholly novel document describing columnar shuffle compression tradeoffs in depth")
    ).toDF("doc_id", "text")
    val shardC = Seq(
      (20L, "a wholly novel document describing columnar shuffle compression tradeoffs in detail"), // near-dup of ADMITTED 11
      (21L, "unrelated fresh text on watermark semantics for late arriving stream events")
    ).toDF("doc_id", "text")
    val path = "/tmp/graft_xadmit_" + System.nanoTime()
    Dedup.buildTextIndex(base, "doc_id", "text", path, threshold = 0.5)
    val survivorsB = Dedup.admitShard(shardB, path, base, "doc_id", "text", "b")
    assert(survivorsB.select("doc_id").as[Long].collect().toSet == Set(11L))
    // shard C's dup of doc 11 is only catchable if the append worked;
    // ref must cover base + admitted shards (the index is text-free)
    val refAfterB = base.unionByName(shardB.filter(col("doc_id") === 11L))
    val survivorsC = Dedup.admitShard(shardC, path, refAfterB, "doc_id", "text", "c")
    assert(survivorsC.select("doc_id").as[Long].collect().toSet == Set(21L))
  }

  test("admitShard replay converges: same survivors, no self-matching, index intact") {
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today")
    ).toDF("doc_id", "text")
    val shard = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // dup of base
      (11L, "a wholly novel document describing columnar shuffle compression tradeoffs in depth")
    ).toDF("doc_id", "text")
    val path = "/tmp/graft_xreplay_" + System.nanoTime()
    Dedup.buildTextIndex(base, "doc_id", "text", path, threshold = 0.5)
    val first = Dedup.admitShard(shard, path, base, "doc_id", "text", "s1")
      .select("doc_id").as[Long].collect().toSet
    // replay the same shard (crash-retry semantics): the probe excludes
    // shard s1's own index rows, so doc 11 does not self-match into
    // rejection and the shard's index entry is rewritten, not emptied
    val replay = Dedup.admitShard(shard, path, base, "doc_id", "text", "s1")
      .select("doc_id").as[Long].collect().toSet
    assert(first == Set(11L) && replay == Set(11L))
    val indexed = spark.read.parquet(s"$path/sigs")
      .select("id").as[Long].collect().sorted.toSeq
    assert(indexed == Seq(1L, 11L))
  }

  test("band-key sidecars prune untouched shard dirs; results identical with sidecars stripped") {
    // three shards with DISJOINT vocabularies + a base: a probe that
    // duplicates only shard s2's doc must open s2 (and any bloom-less
    // dir) and skip s1/s3 — and deleting every sidecar must change
    // nothing but the read set
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text")
    val s1 = Seq((10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text")
    val s2 = Seq((20L, "columnar shuffle compression tradeoffs dominate wide analytical scan throughput budgets"))
      .toDF("doc_id", "text")
    val s3 = Seq((30L, "maritime chronometer calibration drifts with ambient temperature and spring fatigue"))
      .toDF("doc_id", "text")
    val path = "/tmp/graft_xsidecar_" + System.nanoTime()
    Dedup.buildTextIndex(base, "doc_id", "text", path, threshold = 0.5)
    Dedup.appendToTextIndex(s1, path, "doc_id", "text", "s1")
    Dedup.appendToTextIndex(s2, path, "doc_id", "text", "s2")
    Dedup.appendToTextIndex(s3, path, "doc_id", "text", "s3")
    // every dir got a sidecar (all are far under the key cap)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dirs = Dedup.readableShardDirs(spark, path)
    assert(dirs.length == 4)
    dirs.foreach(d => assert(
      fs.exists(new org.apache.hadoop.fs.Path(d, Dedup.BandsBloomFile)), s"no sidecar under $d"))
    // probe: a near-dup of s2's doc only
    val probe = Seq(
      (100L, "columnar shuffle compression tradeoffs dominate wide analytical scan throughput limits"))
      .toDF("doc_id", "text")
    val ref = base.unionByName(s1).unionByName(s2).unionByName(s3)
    val withSidecars = Dedup.crossJaccardPairsIndexed(probe, path, ref, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(withSidecars.map(p => (p._1, p._2)) == Set((100L, 20L)))
    // the pruning decision itself: only s2 read, s1/s3/__base skipped
    // (the probe shares no shingles with them at fpp 1e-6)
    val meta = spark.read.parquet(s"$path/meta").collect()(0)
    val pb = Dedup.profileBanded(probe, "doc_id", "text",
      meta.getAs[Int]("num_hashes"), meta.getAs[Int]("bands"), meta.getAs[Int]("shingle_size"))
    val keys = pb.select(org.apache.spark.sql.functions.xxhash64(col("band"), col("bh")).as("k"))
      .distinct().as[Long].collect()
    val (read, skipped) = Dedup.pruneShardDirs(spark, dirs, Some(keys))
    assert(read.map(_.getName).toSet == Set("shard=s2"),
      s"only the duplicated shard should be read, got ${read.map(_.getName).toSeq}")
    assert(skipped.length == 3)
    // an all-novel probe prunes EVERY dir — the zero-base-read fast path
    val novel = Seq((200L, "entirely unrelated verbiage about beekeeping apiary ventilation schedules"))
      .toDF("doc_id", "text")
    assert(Dedup.crossJaccardPairsIndexed(novel, path, ref, "doc_id", "text").count() == 0)
    // strip every sidecar: results must be identical (dirs just read fully)
    dirs.foreach(d => fs.delete(new org.apache.hadoop.fs.Path(d, Dedup.BandsBloomFile), false))
    val withoutSidecars = Dedup.crossJaccardPairsIndexed(probe, path, ref, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(withoutSidecars == withSidecars, "sidecars are a read-set optimization, never a result change")
    // admission over sidecar-less dirs still works and rewrites s-new's sidecar
    val admitted = Dedup.admitShard(novel, path, ref, "doc_id", "text", "snew")
    assert(admitted.count() == 1)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/sigs/shard=snew/${Dedup.BandsBloomFile}")))
  }

  test("compactTextIndex merges shards into __base; probe results and inventory survive") {
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text")
    val s1 = Seq(
      (10L, "a wholly novel document describing columnar shuffle compression tradeoffs in depth"))
      .toDF("doc_id", "text")
    val path = "/tmp/graft_xcompact_" + System.nanoTime()
    Dedup.buildTextIndex(base, "doc_id", "text", path, threshold = 0.5)
    Dedup.admitShard(s1, path, base, "doc_id", "text", "s1")
    val refAll = base.unionByName(s1)
    val probe = Seq(
      (20L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // dup of base 1
      (21L, "a wholly novel document describing columnar shuffle compression tradeoffs in detail")) // dup of admitted 10
      .toDF("doc_id", "text")
    val before = Dedup.crossJaccardPairsIndexed(probe, path, refAll, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    Dedup.compactTextIndex(spark, path)
    val after = Dedup.crossJaccardPairsIndexed(probe, path, refAll, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(before == after && before.map(p => (p._1, p._2)) == Set((20L, 1L), (21L, 10L)))
    val shards = spark.read.parquet(s"$path/sigs").select("shard").distinct()
      .as[String].collect().toSeq
    assert(shards == Seq("__base"))
  }

  test("mid-compaction crash state (duplicated signatures) does not change probe results") {
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text")
    val path = "/tmp/graft_xcrash_" + System.nanoTime()
    Dedup.buildTextIndex(base, "doc_id", "text", path, threshold = 0.5)
    // simulate the crash window: base rows ALSO present under a stale
    // shard dir (merged but not yet deleted)
    Dedup.appendToTextIndex(base, path, "doc_id", "text", "stale_copy")
    val probe = Seq(
      (20L, "the quick brown fox jumps over the lazy dog near the river bank tonight"))
      .toDF("doc_id", "text")
    val dup = Dedup.crossJaccardPairsIndexed(probe, path, base, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSeq
    assert(dup.map(p => (p._1, p._2)) == Seq((20L, 1L)),
      s"duplicated index rows must not duplicate emitted pairs, got $dup")
    // re-running compaction heals the duplication: the identical
    // (id, sig) rows collapse back to one
    Dedup.compactTextIndex(spark, path)
    val healedCount = spark.read.parquet(s"$path/sigs").count()
    assert(healedCount == 1L, s"expected the duplicate to collapse, got $healedCount rows")
  }

  test("a shard admitted WHILE compaction runs survives it (snapshot-scoped cleanup)") {
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text")
    val s1 = Seq(
      (10L, "a wholly novel document describing columnar shuffle compression tradeoffs in depth"))
      .toDF("doc_id", "text")
    val s2 = Seq(
      (30L, "an unrelated late arriving note on watermark semantics for streaming joins"))
      .toDF("doc_id", "text")
    val path = "/tmp/graft_xconcur_" + System.nanoTime()
    Dedup.buildTextIndex(base, "doc_id", "text", path, threshold = 0.5)
    Dedup.admitShard(s1, path, base, "doc_id", "text", "s1")
    // the race the snapshot exists for: an admission lands between the
    // merge swap and the cleanup — the test seam injects it exactly there
    Dedup.compactTextIndexImpl(spark, path, () =>
      Dedup.admitShard(s2, path, base.unionByName(s1), "doc_id", "text", "s2"))
    // the late shard was neither folded nor deleted; everything else is __base
    val shards = spark.read.parquet(s"$path/sigs").select("shard").distinct()
      .as[String].collect().sorted.toSeq
    assert(shards == Seq("__base", "s2"), s"late admission must survive the cleanup: $shards")
    assert(spark.read.parquet(s"$path/sigs").select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 10L, 30L), "no signature lost, none duplicated")
    // probes see the full corpus including the late shard
    val probe = Seq(
      (40L, "an unrelated late arriving note on watermark semantics for streaming join"))
      .toDF("doc_id", "text")
    val pairs = Dedup.crossJaccardPairsIndexed(
      probe, path, base.unionByName(s1).unionByName(s2), "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((40L, 30L)), s"probe must reach the late shard's rows: $pairs")
    // the NEXT compaction folds the late shard in
    Dedup.compactTextIndex(spark, path)
    val shards2 = spark.read.parquet(s"$path/sigs").select("shard").distinct()
      .as[String].collect().toSeq
    assert(shards2 == Seq("__base"))
    assert(spark.read.parquet(s"$path/sigs").count() == 3L)
  }

  test("compaction restart after a crash in the swap window (leftover __compacted) converges") {
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text")
    val s1 = Seq(
      (10L, "a wholly novel document describing columnar shuffle compression tradeoffs in depth"))
      .toDF("doc_id", "text")
    val path = "/tmp/graft_xswapcrash_" + System.nanoTime()
    Dedup.buildTextIndex(base, "doc_id", "text", path, threshold = 0.5)
    Dedup.admitShard(s1, path, base, "doc_id", "text", "s1")
    // simulate a crash right after step 2 (merge renamed into the index,
    // old shard dirs not yet deleted): the merged rows sit under
    // shard=__compacted while every original shard dir survives
    spark.read.parquet(s"$path/sigs").select("id", "sig").dropDuplicates(Seq("id", "sig"))
      .write.parquet(s"$path/sigs/shard=__compacted")
    val probe = Seq(
      (20L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (21L, "a wholly novel document describing columnar shuffle compression tradeoffs in detail"))
      .toDF("doc_id", "text")
    val refAll = base.unionByName(s1)
    // the crashed state itself probes correctly (duplicates collapse)
    val crashed = Dedup.crossJaccardPairsIndexed(probe, path, refAll, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(crashed == Set((20L, 1L), (21L, 10L)))
    // restart converges to the clean single-__base layout, nothing lost
    Dedup.compactTextIndex(spark, path)
    val shards = spark.read.parquet(s"$path/sigs").select("shard").distinct()
      .as[String].collect().toSeq
    assert(shards == Seq("__base"))
    assert(spark.read.parquet(s"$path/sigs").select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 10L))
    val after = Dedup.crossJaccardPairsIndexed(probe, path, refAll, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(after == crashed)
  }

  test("compaction restart when __compacted is the SOLE copy (crash after cleanup) loses nothing") {
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "completely different content about spark catalyst optimizer and tungsten"))
      .toDF("doc_id", "text")
    val path = "/tmp/graft_xsolecopy_" + System.nanoTime()
    Dedup.buildTextIndex(base, "doc_id", "text", path, threshold = 0.5)
    // simulate a crash between step 3 (old dirs deleted) and step 4 (final
    // rename): the whole index lives under shard=__compacted only
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$path/sigs/shard=__base"),
      new org.apache.hadoop.fs.Path(s"$path/sigs/shard=__compacted")))
    Dedup.compactTextIndex(spark, path)
    val shards = spark.read.parquet(s"$path/sigs").select("shard").distinct()
      .as[String].collect().toSeq
    assert(shards == Seq("__base"), s"restart must complete the swap, got $shards")
    assert(spark.read.parquet(s"$path/sigs").select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L), "the sole-copy rows must survive the restart")
  }

  test("bucketed text index: probe ≡ direct, and the index side joins without an exchange") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val probe = docs.filter(col("source").isin("src0", "src1", "src2"))
    val ref = docs.filter(!col("source").isin("src0", "src1", "src2"))
    val tbl = "xbucketed_idx"
    Seq(tbl, s"${tbl}_meta").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"/tmp/graft_warehouse/$t"))
    }
    // default (≤0) numBuckets = corpus-derived sizing: assert the build
    // recorded its choice in meta, that it is NOT the old flat-64
    // constant, and that the probe below is correct at that count
    Dedup.buildTextIndexBucketed(ref, "doc_id", "text", tbl, threshold = 0.5)
    val metaRow = spark.table(s"${tbl}_meta").collect()(0)
    val chosenBuckets = metaRow.getAs[Int]("num_buckets")
    assert(chosenBuckets == Dedup.textIndexBuckets(ref.count() * metaRow.getAs[Int]("bands")))
    assert(chosenBuckets != 64 && chosenBuckets >= 8)
    // plain tree for the ancestry walk (AQE wraps stages); no broadcast
    // so the candidate join takes the merge path bucketing feeds at scale
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pairs = Dedup.crossJaccardPairsBucketedIndexed(probe, tbl, ref, "doc_id", "text")
      val got = pairs.as[(Long, Long, Double)].collect().toSet
      val want = Dedup.crossJaccardPairs(probe, ref, "doc_id", "text", threshold = 0.5)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == want && got.nonEmpty)
      import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.SortMergeJoinExec
      def bucketedScanIn(p: SparkPlan): Boolean = p.exists {
        case s: FileSourceScanExec => s.relation.bucketSpec.isDefined
        case _ => false
      }
      // the candidate stage is materialized inside the probe (one index
      // scan per admission), so its join no longer appears in the final
      // probe plan — build the SAME candidate frame through the seams
      // the probe uses and assert the plan shape there
      val nh = metaRow.getAs[Int]("num_hashes")
      val bnd = metaRow.getAs[Int]("bands")
      // same conf the probe itself plans under (sorted-bucket ordering)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val candPlan =
        try Dedup.profileCrossCandidates(
          Dedup.profileBanded(probe, "doc_id", "text", nh, bnd, 3),
          spark.table(tbl), hintProbe = false)
          .queryExecution.executedPlan
        finally spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      val join = candPlan.collectFirst {
        case j: SortMergeJoinExec
            if bucketedScanIn(j) && j.leftKeys.exists(_.references.exists(_.name == "band")) => j
      }.getOrElse(fail(s"no band-keyed SortMergeJoin over the bucketed scan:\n${candPlan.toString.take(3000)}"))
      val (idxSide, probeSide) =
        if (bucketedScanIn(join.left)) (join.left, join.right) else (join.right, join.left)
      assert(!idxSide.exists { case _: ShuffleExchangeExec => true; case _ => false },
        s"index side must join bucket-local, no exchange:\n${idxSide.toString.take(3000)}")
      // one sorted file per bucket: the scan's own ordering feeds the
      // merge join — a Sort on the index side would mean the writer
      // fanned a bucket across files and every probe re-sorts the corpus
      assert(!idxSide.exists { case _: SortExec => true; case _ => false },
        s"index side must be merge-ready from the sorted bucket files, no Sort:\n${idxSide.toString.take(3000)}")
      assert(probeSide.exists { case _: ShuffleExchangeExec => true; case _ => false },
        "probe side shuffles into the index's bucketing")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
    }
  }

  test("broadcast-probe candidate join: identical candidates, zero exchange on the index side") {
    // the r17 admission shape: a bounded probe's banded rows broadcast,
    // the corpus-sized index side streams through the join un-exchanged
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val probe = docs.filter(col("doc_id") < 200)
      .select(col("doc_id"), concat(col("text"), lit(" probex")).as("text"))
    val pb = Dedup.profileBanded(probe, "doc_id", "text", 64, 16, 3)
    val rb = Dedup.profileBanded(docs, "doc_id", "text", 64, 16, 3)
    val shuffled = Dedup.profileCrossCandidates(pb, rb, hintProbe = true)
      .as[(Long, Long)].collect().toSet
    val bcastDf = Dedup.profileCrossCandidates(pb, rb, hintProbe = false, broadcastProbe = true)
    assert(bcastDf.as[(Long, Long)].collect().toSet == shuffled && shuffled.nonEmpty)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan: SparkPlan = Dedup
        .profileCrossCandidates(pb, rb, hintProbe = false, broadcastProbe = true)
        .queryExecution.executedPlan
      val join = plan.collectFirst { case j: BroadcastHashJoinExec => j }
        .getOrElse(fail(s"no BroadcastHashJoin in the broadcast-probe plan:\n${plan.toString.take(3000)}"))
      val streamed = if (join.buildSide == org.apache.spark.sql.catalyst.optimizer.BuildLeft)
        join.right else join.left
      // no JOIN-keyed (hash) exchange on the index side — the raw test
      // frame's banding includes spread()'s round-robin exchange, which
      // the real index read path (parquet sigs) does not have
      val joinShuffles = streamed.collect { case e: ShuffleExchangeExec => e }.filter(
        _.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.HashPartitioning])
      assert(joinShuffles.isEmpty,
        s"the index side must stream with no join-key exchange:\n${streamed.toString.take(3000)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("textIndexBuckets scales with corpus and floors for parallelism") {
    assert(Dedup.textIndexBuckets(0L) == 8) // empty corpus: floor wins
    assert(Dedup.textIndexBuckets(125L * 1000) == 8) // sf0.1-scale
    // 1e9 docs × 25 bands = 2.5e10 banded rows → thousands of buckets,
    // not the frozen 64 (which would put ~390M rows in each bucket)
    assert(Dedup.textIndexBuckets(25L * 1000 * 1000 * 1000) == 6250)
  }

  // shared fixture for the base+delta lifecycle tests: a bucketed base
  // of two docs, distinct shard docs, and a helper that wipes the table
  private def bucketedBaseFixture(tag: String): (String, String, org.apache.spark.sql.DataFrame) = {
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "completely different content about spark catalyst optimizer and tungsten"))
      .toDF("doc_id", "text")
    val tbl = s"xdelta_${tag}"
    Seq(tbl, s"${tbl}_meta").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"/tmp/graft_warehouse/$t"))
    }
    Dedup.buildTextIndexBucketed(base, "doc_id", "text", tbl, threshold = 0.5)
    (tbl, "/tmp/graft_xdelta_" + tag + "_" + System.nanoTime(), base)
  }
  private val novelX =
    "a wholly novel document describing columnar shuffle compression tradeoffs in depth"
  private val dupOfX =
    "a wholly novel document describing columnar shuffle compression tradeoffs in detail"

  test("base+delta bucketed admission: the delta is probe-visible before promotion") {
    val (tbl, delta, base) = bucketedBaseFixture("vis")
    // s1 admits a novel doc into the delta
    val s1 = Seq((10L, novelX)).toDF("doc_id", "text")
    val surv1 = Dedup.admitShardBucketed(s1, tbl, delta, base, "doc_id", "text", "s1")
    assert(surv1.select("doc_id").as[Long].collect().toSeq == Seq(10L))
    // s2 carries: a near-dup of the DELTA doc (the case a base-only
    // probe would miss), a dup of a BASE doc, and a novel doc
    val s2 = Seq(
      (20L, dupOfX),
      (21L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (22L, "an unrelated note on watermark semantics for late arriving stream events"))
      .toDF("doc_id", "text")
    val ref2 = base.unionByName(s1)
    val surv2 = Dedup.admitShardBucketed(s2, tbl, delta, ref2, "doc_id", "text", "s2")
    assert(surv2.select("doc_id").as[Long].collect().sorted.toSeq == Seq(22L),
      "the delta dup (20) and the base dup (21) must both be rejected")
    // replay of s2 converges (own-shard exclusion in the delta probe)
    val replay = Dedup.admitShardBucketed(s2, tbl, delta, ref2, "doc_id", "text", "s2")
    assert(replay.select("doc_id").as[Long].collect().sorted.toSeq == Seq(22L))
    val shards = spark.read.parquet(s"$delta/sigs").select("shard").distinct()
      .as[String].collect().sorted.toSeq
    assert(shards == Seq("s1", "s2"))
  }

  test("promotion folds the delta into the table from signatures alone and resets it") {
    val (tbl, delta, base) = bucketedBaseFixture("promo")
    val s1 = Seq((10L, novelX)).toDF("doc_id", "text")
    Dedup.admitShardBucketed(s1, tbl, delta, base, "doc_id", "text", "s1")
    Dedup.promoteTextIndexDelta(spark, tbl, delta)
    // the delta is reset; the table now carries doc 10's banded rows
    assert(Dedup.readableShardDirs(spark, delta).isEmpty, "promotion must reset the delta")
    assert(spark.table(tbl).select("id").distinct().as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 10L))
    assert(spark.table(s"${tbl}_meta").collect()(0).getAs[Int]("num_buckets") >= 8)
    // a BASE-ONLY probe (no delta) now rejects the X near-dup: proof the
    // promoted rows are candidate-generating in the bucketed table
    val refAll = base.unionByName(s1)
    val pairs = Dedup.crossJaccardPairsBucketedIndexed(
      Seq((30L, dupOfX)).toDF("doc_id", "text"), tbl, refAll, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((30L, 10L)))
    // admission keeps working against the rebuilt base with an empty delta
    val surv = Dedup.admitShardBucketed(
      Seq((31L, dupOfX)).toDF("doc_id", "text"), tbl, delta, refAll, "doc_id", "text", "s3")
    assert(surv.isEmpty, "post-promotion admission must reject dups via the base alone")
    // re-promotion with only a zero-row shard (s3 admitted 0 docs) is
    // harmless: the fold adds nothing and the table is unchanged
    Dedup.promoteTextIndexDelta(spark, tbl, delta)
    assert(spark.table(tbl).select("id").distinct().count() == 3L)
  }

  test("a shard admitted WHILE promotion runs survives it (persisted folded-shard list)") {
    val (tbl, delta, base) = bucketedBaseFixture("race")
    val s1 = Seq((10L, novelX)).toDF("doc_id", "text")
    Dedup.admitShardBucketed(s1, tbl, delta, base, "doc_id", "text", "s1")
    val late = Seq(
      (40L, "an unrelated late arriving note on watermark semantics for streaming joins"))
      .toDF("doc_id", "text")
    Dedup.promoteTextIndexDeltaImpl(spark, tbl, delta, () =>
      Dedup.admitShardBucketed(late, tbl, delta, base.unionByName(s1), "doc_id", "text", "late"))
    val shards = spark.read.parquet(s"$delta/sigs").select("shard").distinct()
      .as[String].collect().toSeq
    assert(shards == Seq("late"), s"the late shard must survive the cleanup: $shards")
    assert(spark.table(tbl).select("id").distinct().as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 10L), "the staged merge must not include the late shard")
    // the late shard stays probe-visible through the delta
    val surv = Dedup.admitShardBucketed(
      Seq((41L, "an unrelated late arriving note on watermark semantics for streaming join"))
        .toDF("doc_id", "text"),
      tbl, delta, base.unionByName(s1).unionByName(late), "doc_id", "text", "s4")
    assert(surv.isEmpty, "a dup of the late-admitted doc must be rejected via the delta")
  }

  test("promotion restart from a leftover stage folds only the staged shards") {
    val (tbl, delta, base) = bucketedBaseFixture("restart")
    val s1 = Seq((10L, novelX)).toDF("doc_id", "text")
    Dedup.admitShardBucketed(s1, tbl, delta, base, "doc_id", "text", "s1")
    // crash after the stage completes but before the table rebuild
    val boom = new RuntimeException("simulated crash")
    assert(intercept[RuntimeException] {
      Dedup.promoteTextIndexDeltaImpl(spark, tbl, delta, () => throw boom)
    } eq boom)
    // a shard admitted AFTER the crashed attempt, before the restart
    val post = Seq(
      (50L, "yet another distinct piece about adaptive query execution plan stages"))
      .toDF("doc_id", "text")
    Dedup.admitShardBucketed(post, tbl, delta, base.unionByName(s1), "doc_id", "text", "post")
    // restart: rebuilds from the persisted stage, deletes ONLY s1
    Dedup.promoteTextIndexDelta(spark, tbl, delta)
    val shards = spark.read.parquet(s"$delta/sigs").select("shard").distinct()
      .as[String].collect().toSeq
    assert(shards == Seq("post"), s"the post-crash shard must survive the restart: $shards")
    assert(spark.table(tbl).select("id").distinct().as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 10L))
  }

  test("a delta banded differently than its base table is refused") {
    val (tbl, delta, base) = bucketedBaseFixture("geom")
    // pre-create the delta as a standalone index at a DIFFERENT threshold
    // (different banding geometry under minhashBanding)
    Dedup.buildTextIndex(base, "doc_id", "text", delta, threshold = 0.9)
    intercept[IllegalArgumentException] {
      Dedup.admitShardBucketed(
        Seq((10L, novelX)).toDF("doc_id", "text"), tbl, delta, base, "doc_id", "text", "s1")
    }
  }

  test("rebuilding a text index wipes stale admitted shards") {
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text")
    val shard = Seq(
      (10L, "a wholly novel document describing columnar shuffle compression tradeoffs in depth"))
      .toDF("doc_id", "text")
    val path = "/tmp/graft_xrebuild_" + System.nanoTime()
    Dedup.buildTextIndex(base, "doc_id", "text", path, threshold = 0.5)
    Dedup.admitShard(shard, path, base, "doc_id", "text", "old_shard")
    // rebuild at a DIFFERENT threshold: stale old_shard signatures under
    // the new geometry would band wrong (silent candidate misses)
    Dedup.buildTextIndex(base, "doc_id", "text", path, threshold = 0.35)
    val shards = spark.read.parquet(s"$path/sigs").select("shard").distinct()
      .as[String].collect().toSeq
    assert(shards == Seq("__base"), s"stale shards must not survive a rebuild: $shards")
  }

  test("appendToTextIndex rejects the reserved __base shard and empty names") {
    val base = Seq((1L, "some base corpus text about anything at all")).toDF("doc_id", "text")
    val path = "/tmp/graft_xguard_" + System.nanoTime()
    Dedup.buildTextIndex(base, "doc_id", "text", path)
    Seq("__base", "__compacted", "__prev_compacted", "").foreach { bad =>
      intercept[IllegalArgumentException] {
        Dedup.appendToTextIndex(base, path, "doc_id", "text", bad)
      }
    }
  }
}
