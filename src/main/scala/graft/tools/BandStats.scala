package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: banded-vs-unbanded PPJoin candidate-scan volumes for a
  * corpus — Σ pfi·pfp per (group, gram[, band]) plus probe-entry
  * counts — the numbers behind the band-dispatch decision. Args:
  * either a testdata dir (reads documents.parquet) or "stress N"
  * (builds the NgramHotStress corpus at N docs). */
object BandStats {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.GraftFunctions.register(spark)
    val docs =
      if (args.headOption.contains("stress")) {
        val nDocs = args(1).toInt
        spark.range(nDocs).select(
          col("id").as("doc_id"),
          concat(
            lit("breaking news network all rights reserved navigation menu "),
            concat_ws(" ", (0 until 12).map(k =>
              concat(lit("w"), pmod(xxhash64(col("id"), lit(k)), lit(99991)).cast("string"))): _*)
          ).as("text"),
          lit("en").as("lang"), lit("s0").as("source"))
      } else spark.read.parquet(s"${args.head}/documents.parquet")
    val (n, threshold) = (4, 0.35)
    val g = Seq("lang", "source")
    val ex = docs.select(col("doc_id").as("id"),
        call_function("graft_char_ngrams", lower(col("text")), lit(n)).as("grams"),
        col("lang"), col("source"))
      .select(col("id"), size(col("grams")).as("sz"), explode(col("grams")).as("gram"),
        col("lang"), col("source"))
    val freq = ex.groupBy(col("lang"), col("source"), col("gram")).agg(count(lit(1)).as("gf"))
    val toks = ex.join(freq, g :+ "gram")
      .select(col("id"), col("sz"),
        concat(lpad(col("gf").cast("string"), 10, "0"), col("gram")).as("tok"),
        col("lang"), col("source"))
      .groupBy(col("id"), col("sz"), col("lang"), col("source"))
      .agg(sort_array(collect_list(col("tok"))).as("toks"))
      .localCheckpoint()
    // the library's OWN band/prefix expressions (private[graft]) — the
    // tool must measure the join shape prefixPairs actually runs
    import graft.operators.Dedup.{ppjBandOf => bandOf, ppjXmin, ppjBandMin, ppjAlpha,
      probePrefLen, idxPrefLen}
    val probeLen = probePrefLen(threshold)
    val idxLen = idxPrefLen(threshold)
    println("occupiedBands=" + toks.select(bandOf(col("sz"))).distinct().count())
    // unbanded: Σ pfi·pfp
    val pu = toks.select(col("sz"), col("lang"), col("source"),
        posexplode(slice(col("toks"), lit(1), probeLen)).as(Seq("pos", "tok")))
    val un = pu.groupBy(col("lang"), col("source"), col("tok"))
      .agg(count(lit(1)).as("pfp"), sum(when(col("pos") < idxLen, 1L).otherwise(0L)).as("pfi"))
      .agg(sum(col("pfi") * col("pfp")), sum(col("pfp"))).head()
    println(s"unbanded scan=${un.getLong(0)} probeEntries=${un.getLong(1)}")
    // banded
    val occ = toks.select(bandOf(col("sz")).as("band"), col("lang"), col("source")).distinct()
    val xmin = ppjXmin(col("sz"), threshold)
    val mK = ppjBandMin(col("band"), xmin)
    val alphaK = ppjAlpha(mK, col("sz"), threshold)
    val pb = toks.select(col("id"), col("sz"), col("toks"), col("lang"), col("source"),
        explode(sequence(bandOf(xmin), bandOf(col("sz")))).as("band"))
      .join(broadcast(occ), g :+ "band")
      .withColumn("plen", greatest(least((col("sz") - alphaK + 1).cast("int"), probeLen), lit(0)))
      .select(col("sz"), col("band"), col("lang"), col("source"),
        posexplode(slice(col("toks"), lit(1), col("plen"))).as(Seq("pos", "tok")))
    val ib = toks.select(col("sz"), bandOf(col("sz")).as("band"), col("lang"), col("source"),
        posexplode(slice(col("toks"), lit(1), idxLen)).as(Seq("pos", "tok")))
    val bp = pb.groupBy(col("lang"), col("source"), col("band"), col("tok"))
      .agg(count(lit(1)).as("pfp"))
    val bi = ib.groupBy(col("lang"), col("source"), col("band"), col("tok"))
      .agg(count(lit(1)).as("pfi"))
    val bb = bi.join(bp, g ++ Seq("band", "tok"))
      .agg(sum(col("pfi") * col("pfp")), sum(col("pfp"))).head()
    println(s"banded   scan=${bb.getLong(0)} probeEntries=${pb.count()}")
    spark.stop()
  }
}
