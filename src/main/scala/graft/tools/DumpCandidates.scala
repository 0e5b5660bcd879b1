package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.F
import graft.operators.Dedup

/** Scratch: dump LSH candidate pair sets at a given sf for recall checks
  * against DuckDB brute-force ground truth (oracle design for the dedup
  * queries). Writes to /tmp/graft_cands. */
object DumpCandidates {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // minhash band-collision candidates (numHashes=64, bands=16)
    val sigs = Dedup.minhashSigs(docs, "doc_id", "text", 64, 3)
    val banded = sigs
      .select(col("id"), explode(F.lshBandKeys(col("sig"), 16, 4)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.bh"))
    banded.as("a")
      .join(banded.as("b"), col("a.band") === col("b.band") && col("a.bh") === col("b.bh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
      .write.mode("overwrite").parquet("/tmp/graft_cands/minhash")

    // simhash band candidates (4 x 16-bit bands)
    val ssigs = Dedup.simhashSigs(docs, "doc_id", "text", 3)
    val sbanded = ssigs.select(
      col("id"),
      explode(transform(sequence(lit(0), lit(3)),
        b => struct(b.as("band"),
          call_function("shiftrightunsigned", col("sig"), b * 16).bitwiseAND(lit(0xffffL)).as("bh"))))
        .as("bk")
    ).select(col("id"), col("bk.band"), col("bk.bh"))
    sbanded.as("a")
      .join(sbanded.as("b"), col("a.band") === col("b.band") && col("a.bh") === col("b.bh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
      .write.mode("overwrite").parquet("/tmp/graft_cands/simhash")

    // embedding hyperplane candidates (16 planes, 4 bands)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val vecs = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val esigs = vecs.select(col("id"), call_function("graft_hyperplane_bits", col("vec"), lit(16)).as("bits"))
    val ebanded = esigs.select(
      col("id"),
      explode(transform(sequence(lit(0), lit(3)),
        b => struct(b.as("band"),
          call_function("shiftrightunsigned", col("bits"), b * 4).bitwiseAND(lit(0xfL)).as("bh"))))
        .as("bk")
    ).select(col("id"), col("bk.band"), col("bk.bh"))
    ebanded.as("a")
      .join(ebanded.as("b"), col("a.band") === col("b.band") && col("a.bh") === col("b.bh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
      .write.mode("overwrite").parquet("/tmp/graft_cands/embed")

    ssigs.write.mode("overwrite").parquet("/tmp/graft_cands/simhash_sigs")
    esigs.write.mode("overwrite").parquet("/tmp/graft_cands/embed_bits")

    // exact shingle jaccard for all minhash candidates (for threshold design)
    val sh = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
    spark.read.parquet("/tmp/graft_cands/minhash")
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jac"))
      .write.mode("overwrite").parquet("/tmp/graft_cands/minhash_jac")

    spark.stop()
  }
}
