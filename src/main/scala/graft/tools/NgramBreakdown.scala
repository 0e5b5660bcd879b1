package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Stage-level breakdown of the ngram-jaccard routes (dev tool):
  * probe volumes (dense Σgf² vs prefix Σpf²), then per-stage timings
  * of the PPJoin prefix pipeline and the dense counting join. */
object NgramBreakdown {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.GraftFunctions.register(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val groupCols = Seq("lang", "source")
    val threshold = 0.35

    // --- probe volumes (full corpus, not sampled: exact numbers)
    val ex = docs.select(col("doc_id").as("id"),
        call_function("graft_char_ngrams", lower(col("text")), lit(4)).as("grams"),
        col("lang"), col("source"))
      .select(col("id"), size(col("grams")).as("sz"), explode(col("grams")).as("gram"),
        col("lang"), col("source"))
    val freq = ex.groupBy(col("lang"), col("source"), col("gram")).agg(count(lit(1)).as("gf"))
    val d = freq.agg(sum(col("gf")), sum(col("gf") * col("gf")), max(col("gf"))).head()
    println(s"postings=${d.getLong(0)} denseRows=${d.getLong(1)} maxgf=${d.getLong(2)}")
    val toks = ex.join(freq, Seq("lang", "source", "gram"))
      .select(col("id"), col("sz"),
        concat(lpad(col("gf").cast("string"), 10, "0"), col("gram")).as("tok"),
        col("lang"), col("source"))
      .groupBy(col("id"), col("sz"), col("lang"), col("source"))
      .agg(sort_array(collect_list(col("tok"))).as("toks"))
    val prefLen = (col("sz") - ceil(col("sz").cast("double") * lit(threshold) - lit(1e-9)) + 1)
      .cast("int")
    val pf = toks
      .select(col("lang"), col("source"), explode(slice(col("toks"), lit(1), prefLen)).as("tok"))
      .groupBy(col("lang"), col("source"), col("tok")).agg(count(lit(1)).as("pf"))
      .agg(sum(col("pf") * col("pf"))).head()
    println(s"prefixRows=${pf.getLong(0)}")

    // --- candidate-pipeline cardinalities (one pass each), mirroring
    // the ASYMMETRIC prefixPairs pipeline
    println(s"docs=${docs.count()}")
    val idxFrac = 2.0 * threshold / (1.0 + threshold)
    val idxLen = (col("sz") - ceil(col("sz").cast("double") * lit(idxFrac) - lit(1e-9)) + 1)
      .cast("int")
    val pref = toks.select((col("id") +: col("sz") +: Seq("lang", "source").map(col) :+
        posexplode(slice(col("toks"), lit(1), prefLen)).as(Seq("pos", "tok"))): _*)
      .select(col("id"), col("sz"), col("pos"), substring(col("tok"), 11, 5).as("gram"),
        col("lang"), col("source"))
    val idxPref = pref.filter(col("pos") < idxLen)
    println(s"  probePostings=${pref.count()} idxPostings=${idxPref.count()}")
    def jacCan(ub: org.apache.spark.sql.Column, szA: org.apache.spark.sql.Column, szB: org.apache.spark.sql.Column) =
      ub.cast("double") >= lit(threshold) * ((szA + szB).cast("double") - ub.cast("double"))
    val ubRow = least(col("a.pos"), col("b.pos")) + lit(1) +
      least(col("a.sz") - col("a.pos") - 1, col("b.sz") - col("b.pos") - 1)
    val alphaD = lit(threshold / (1.0 + threshold)) * (col("a.sz") + col("b.sz")).cast("double")
    val joined = idxPref.as("a").join(pref.as("b").hint("shuffle_hash"),
      (Seq("lang", "source").map(c => col(s"a.$c") === col(s"b.$c")) :+
        (col("a.gram") === col("b.gram")) :+
        ((col("a.sz") < col("b.sz")) ||
          (col("a.sz") === col("b.sz") && col("a.id") < col("b.id"))) :+
        (col("a.sz").cast("double") >= lit(threshold) * col("b.sz")) :+
        ((col("a.sz") - col("a.pos")).cast("double") >= alphaD - lit(1.000001)) :+
        ((col("b.sz") - col("b.pos")).cast("double") >= alphaD - lit(1.000001)) :+
        jacCan(ubRow, col("a.sz"), col("b.sz"))).reduce(_ && _))
    time("joinrows")(println(s"  joinSurvivors=${joined.count()}"))
    val aggd = joined.groupBy(col("a.id").as("id_x"), col("b.id").as("id_y"),
        col("a.sz").as("sz_x"), col("b.sz").as("sz_y"))
      .agg(min(struct(col("a.pos").as("pa"), col("b.pos").as("pb"))).as("f"))
    val strong = aggd.filter(jacCan(
      lit(1) + least(col("sz_x") - col("f.pa") - 1, col("sz_y") - col("f.pb") - 1),
      col("sz_x"), col("sz_y")))
    time("strongpairs")(println(s"  strongSurvivors=${strong.count()}"))

    // --- stage timings: array build, then full routes
    for (r <- 1 to reps) {
      time(s"ex $r")(ex.count())
      time(s"freq $r")(freq.count())
      time(s"ranked $r")(ex.join(freq.hint("shuffle_hash"), Seq("lang", "source", "gram")).count())
      time(s"arrbuild $r")(toks.count())
      time(s"prefix $r")(Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", groupCols).count())
      time(s"dense $r")(Dedup.ngramJaccardPairsDense(docs, "doc_id", "text", groupCols).count())
      time(s"dispatch $r")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", groupCols).count())
    }
    spark.stop()
  }
}
