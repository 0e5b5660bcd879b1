package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: scale-stress the dedup/curation path on a synthetic 20x
  * corpus (sf0.1 documents replicated with id offsets — every replica
  * group is an exact-dup cluster, stressing precisely the degenerate
  * shapes the guards exist for). Not part of the driver contract. */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n = docs0.count()
    val big = (0 until mult).map { i =>
      docs0.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000L))
    }.reduce(_ unionByName _)
    big.write.mode("overwrite").parquet("/tmp/graft_stress/docs")
    val docs = spark.read.parquet("/tmp/graft_stress/docs")
    println(s"[stress] corpus: ${docs.count()} docs (${n} x $mult)")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    time("exact dedup")(graft.operators.Dedup.exact(docs, "doc_id", "text").count())
    // capped LSH: replica groups share signatures -> hot buckets; the cap
    // drops them (they're exact dups, handled above) instead of melting
    val pairs = time("minhash pairs (capped 1000)")(
      graft.operators.Dedup.minhashJaccardPairs(docs, "doc_id", "text",
        threshold = 0.5, maxBucket = Some(1000)))
    val pc = time("pairs count")(pairs.count())
    println(s"[stress] candidate-verified pairs: $pc")
    // smallGraphEdges = 0 forces the distributed star-contraction path —
    // this tool exists to prove THAT path's behavior at scale
    val cc = time("connected components (distributed path)")(
      graft.operators.Dedup.connectedComponents(pairs, smallGraphEdges = 0L).count())
    println(s"[stress] component rows: $cc")
    // full pipeline: near-dedup runs over exact representatives only
    val kept = time("curate (full pipeline)")(
      graft.operators.Curation.curate(docs).filter(col("keep")).count())
    println(s"[stress] kept docs: $kept")
    // round-3 operators on the same inflated corpus
    val bm = time("bm25 top-10 (3 queries)")(
      graft.operators.Retrieval.bm25TopK(spark, docs, "doc_id", "text", k = 10).count())
    println(s"[stress] bm25 rows: $bm")
    val packed = time("pack shards (budget 4096)")(
      graft.operators.Packing.packShards(
        docs.select(col("doc_id"), size(graft.functions.F.tokens(col("text"))).cast("long").as("w")),
        "doc_id", "w", budget = 4096L,
        orderCol = md5(col("doc_id").cast("string").cast("binary"))).count())
    println(s"[stress] packed rows: $packed")
    // boilerplate: the replicas make every gram a within-source repeat —
    // the worst case for the (source, gram) window (hottest grams =
    // mult × df); proves the single-shuffle window shape holds
    val bp = time("boilerplate (5-gram window)")(
      graft.operators.TextAnalysis.boilerplate(docs, "doc_id", "text", "source").count())
    println(s"[stress] boilerplate rows: $bp")
    // the alternative shape the window form was chosen over: aggregate
    // per-(source, gram) df, then join the posting table back — two
    // evaluations of the tokenize+explode subtree (the sides don't
    // canonicalize equal, so no exchange reuse) but no whole-partition
    // sort. Timed here at replica-skewed gram distributions so the
    // trade is a recorded number, not an assumption.
    val bpAlt = time("boilerplate (agg + join-back)") {
      val grams = docs
        .select(col("doc_id"), col("source"), graft.functions.F.tokens(col("text")).as("tk"))
        .select(col("doc_id"), col("source"),
          explode(graft.operators.TextAnalysis.wordNgrams(col("tk"), 5)).as("gram"))
      val freq = grams.groupBy(col("source"), col("gram")).agg(count(lit(1)).as("df"))
      grams.join(freq, Seq("source", "gram"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"), sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_boiler"))
        .count()
    }
    println(s"[stress] boilerplate join-back rows: $bpAlt")
    // semantic dedup on an inflated embeddings table: replica vectors are
    // bit-identical -> every LSH bucket is mult-deep (degenerate hot
    // buckets by construction), then CC over the pair list
    val emb0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val bigEmb = (0 until mult).map { i =>
      emb0.withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000L))
    }.reduce(_ unionByName _)
    val sd = time("semantic dedup (identical-replica clusters)")(
      graft.operators.Dedup.semanticDedup(bigEmb, "vec_id", "embedding", threshold = 0.97)
        .filter(col("keep")).count())
    println(s"[stress] semantic-dedup kept: $sd")
    // LOW threshold at scale: t=0.5 degenerates sign-LSH banding, so
    // past the brute bound the dispatch must take the IVF cell path —
    // bruteBound=0 forces it here to prove the sub-quadratic shape
    // (the identical-vector collapse first shrinks the corpus to the
    // distinct vectors, then cells bound the pair generation).
    val sdLow = time("semantic dedup (t=0.5, forced IVF cell path)")(
      graft.operators.Dedup.semanticDedup(bigEmb, "vec_id", "embedding", threshold = 0.5,
        bruteBound = 0L).filter(col("keep")).count())
    println(s"[stress] low-threshold semantic-dedup kept: $sdLow")
    // Sub-quadratic GROWTH evidence for the IVF cell path: perturbed
    // replicas (every copy shifted by a replica-dependent offset, so
    // the identical-vector collapse cannot shrink the corpus) at 1x
    // and 2x, timed through embeddingPairsIvf directly. All-pairs
    // work would grow 4x for 2x data; cells sized from the corpus
    // (~2048/cell) keep the growth ~2x (within-cell volume constant
    // per vector).
    def perturbedEmb(m: Int) = (0 until m).map { i =>
      emb0.select(
        (col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
        expr(s"transform(embedding, x -> CAST(x + ${0.003 * (i + 1)} AS FLOAT))").as("embedding"))
    }.reduce(_ unionByName _)
    // explicit n/512 cell sizing keeps BOTH sizes in the regime where
    // cell count scales with the corpus (the default auto-sizing floors
    // at 16 cells below ~33k vectors to avoid over-sharding tiny
    // corpora, which would make this comparison quadratic by floor)
    val nEmb = emb0.count() // embeddings table size, NOT the doc count
    val tIvf = Seq(2, 4).map { m =>
      val corpus = perturbedEmb(m)
      val cells = (nEmb * m / 512L).toInt
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup
        .embeddingPairsIvf(corpus, "vec_id", "embedding", threshold = 0.5, numCells = cells)
        .count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[stress] ivf pairs at ${m}x distinct vectors ($cells cells): $t%.1f s ($pairs pairs)")
      t
    }
    println(f"[stress] ivf growth for 2x data: ${tIvf(1) / tIvf(0)}%.2f x (all-pairs would be ~4x)")

    // Round-5 operators on the inflated corpora.
    // Self k-NN growth on perturbed (non-collapsible) vectors through
    // the IVF shuffle-join path: all-pairs would grow 4x for 2x data.
    val tKnn = Seq(2, 4).map { m =>
      val corpus = perturbedEmb(m)
      val cells = (nEmb * m / 512L).toInt
      val t0 = System.nanoTime()
      val rows = graft.operators.Ann
        .knnJoinIvf(corpus, "vec_id", "embedding", k = 5, numCells = cells)
        .count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[stress] knn-join at ${m}x vectors ($cells cells): $t%.1f s ($rows rows)")
      t
    }
    println(f"[stress] knn growth for 2x data: ${tKnn(1) / tKnn(0)}%.2f x (all-pairs would be ~4x)")
    // Keep-best over replica clusters: the minhash cap handles the
    // replica-deep buckets, CC + two aggregations pick winners.
    val kb = time("keep-best dedup (capped pairs)")(
      graft.operators.Dedup.dedupKeepBest(docs, "doc_id",
        graft.operators.TextAnalysis.qualityScore(col("text")),
        graft.operators.Dedup.minhashJaccardPairs(docs, "doc_id", "text",
          threshold = 0.5, maxBucket = Some(1000)))
        .filter(col("keep")).count())
    println(s"[stress] keep-best kept: $kb")
    // Corpus-stat passes at 20x: both are one-tokenize single-shuffle
    // shapes — wall time should grow ~linearly with the corpus.
    val colloc = time("collocations (top 20)")(
      graft.operators.CorpusStats.collocations(docs, "text").count())
    println(s"[stress] collocation rows: $colloc")
    val lm = time("lm perplexity gate")(
      graft.operators.CorpusStats.lmPerplexity(docs, "doc_id", "text", maxNll = 4.0)
        .filter(col("keep")).count())
    println(s"[stress] lm-kept docs: $lm")
    spark.stop()
  }
}
