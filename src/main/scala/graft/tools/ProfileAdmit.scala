package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev tool: stage-wise attribution of one text-index ADMISSION at
  * corpus scale — which part of admitShard/admitShardBucketed is
  * corpus-bound (the r15 verdict's remaining `weak`). Stages timed
  * separately via the package-private probe internals' public
  * surfaces: probe signatures, candidate generation, exact verify,
  * anti-join + append. Args: <corpusDir> [scratch]. Assumes the
  * lifecycle fixtures (TextLifeScale layout) already exist or builds
  * them. */
object ProfileAdmit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_text2m")
    val scratch = if (args.length > 1) args(1) else s"${dir}_profadmit"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", s"$scratch/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profadmit] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val n = docs.count()
    println(s"[profadmit] corpus n=$n")
    val baseSample = docs.filter(col("doc_id") < 2500)
    val nearDup = baseSample.select(
      (col("doc_id") + 500000000000L).as("doc_id"),
      concat(col("text"), lit(" probeterm")).as("text"))
    val novel = baseSample.select(
      (col("doc_id") + 600000000000L).as("doc_id"),
      regexp_replace(col("text"), lit(" "),
        concat(lit(" zq"), pmod(xxhash64(col("doc_id")), lit(100000L)).cast("string"), lit(" ")))
        .as("text"))
    val shard = nearDup.unionByName(novel).localCheckpoint(true)

    // fixtures
    val tbl = "profadmit_idx"
    val haveTbl = spark.catalog.tableExists(tbl)
    if (!haveTbl)
      timed(s"buildTextIndexBucketed($n)")(
        Dedup.buildTextIndexBucketed(docs, "doc_id", "text", tbl))

    // ---- stage-wise bucketed admission ----
    val meta = spark.table(s"${tbl}_meta").collect()(0)
    val nh = meta.getAs[Int]("num_hashes")
    val b = meta.getAs[Int]("bands")
    val shingleSize = meta.getAs[Int]("shingle_size")
    val threshold = meta.getAs[Double]("threshold")
    println(s"[profadmit] geometry nh=$nh bands=$b rowsPerBand=${nh / b}")
    println(s"[profadmit] index banded rows=${spark.table(tbl).count()}")

    val pb = timed("probe sigs+banding (materialize)") {
      val x = Dedup.profileBanded(shard, "doc_id", "text", nh, b, shingleSize).localCheckpoint(true)
      println(s"[profadmit] probe banded rows=${x.count()}")
      x
    }
    val cands = timed("candidate join vs bucketed table (materialize)") {
      val c = Dedup.profileCrossCandidates(pb, spark.table(tbl), hintProbe = false)
        .localCheckpoint(true)
      println(s"[profadmit] candidates=${c.count()}")
      c
    }
    timed("exact verify (ref semi-join prune + shingle jaccard)") {
      val v = Dedup.profileCrossVerify(cands, shard, docs, "doc_id", "text", shingleSize)
        .filter(col("jac") >= threshold)
      println(s"[profadmit] dup pairs=${v.count()}")
    }
    timed("anti-join survivors (count only)") {
      val dupIds = Dedup.profileCrossVerify(cands, shard, docs, "doc_id", "text", shingleSize)
        .filter(col("jac") >= threshold)
        .select(col("id_a").as("__dup_id")).distinct()
      val survivors = shard.join(
        dupIds.hint("shuffle_hash"), col("doc_id") === col("__dup_id"), "left_anti")
      println(s"[profadmit] survivors=${survivors.count()}")
    }
    // end-to-end for reference
    val delta = s"$scratch/delta_${System.nanoTime()}"
    timed("admitShardBucketed end-to-end") {
      val a = Dedup.admitShardBucketed(shard, tbl, delta, docs, "doc_id", "text", "p1")
      println(s"[profadmit] admitted=${a.count()}")
    }

    // ---- parquet-path candidate join: shuffled-hash vs broadcast-probe
    // A/B (same JVM, interleaved — the r17 question: the corpus-sized
    // banded index re-EXCHANGES per admission under the shuffle_hash
    // hint; a broadcast banded probe streams the index scan with zero
    // exchange and no sort) ----
    val idxPath = s"$scratch/pq_idx"
    val fsP = new org.apache.hadoop.fs.Path(idxPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fsP.exists(new org.apache.hadoop.fs.Path(s"$idxPath/meta/_SUCCESS")))
      timed(s"buildTextIndex($n)")(Dedup.buildTextIndex(docs, "doc_id", "text", idxPath))
    val rb = {
      val sigs = spark.read.parquet(s"$idxPath/sigs").select(col("id"), col("sig"))
      Dedup.profileBandedFromSigs(sigs, b, nh / b)
    }
    for (rep <- 1 to 2) {
      timed(s"parquet cands SHUFFLED rep$rep") {
        val c = Dedup.profileCrossCandidates(pb, rb, hintProbe = true)
        println(s"[profadmit] cands=${c.count()}")
      }
      timed(s"parquet cands BROADCAST rep$rep") {
        val c = Dedup.profileCrossCandidates(pb, rb, hintProbe = false, broadcastProbe = true)
        println(s"[profadmit] cands=${c.count()}")
      }
    }
    // full parquet verify + end-to-end admit (the TextLifeScale
    // admitShard number, stage-attributed)
    val pqCands = timed("parquet cands (materialize)") {
      val c = Dedup.profileCrossCandidates(pb, rb, hintProbe = true).localCheckpoint(true)
      println(s"[profadmit] cands=${c.count()}")
      c
    }
    timed("parquet exact verify") {
      val v = Dedup.profileCrossVerify(pqCands, shard, docs, "doc_id", "text", shingleSize)
        .filter(col("jac") >= threshold)
      println(s"[profadmit] dup pairs=${v.count()}")
    }
    timed("admitShard parquet end-to-end") {
      val a = Dedup.admitShard(shard, idxPath, docs, "doc_id", "text", s"p${System.nanoTime()}")
      println(s"[profadmit] admitted=${a.count()}")
    }
    spark.stop()
  }
}
