package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Hub-heavy mutual-kNN stress (SURVEY §5): a CONE corpus — every
 * vector is a shared base direction plus per-vector noise — plus the
 * pure base direction planted as the HUB. For cone members,
 * cos(member, hub) > cos(member, other member) holds analytically
 * (the hub carries no noise; two members' independent noises overlap
 * less), so every member that probes the hub's cell ranks it #1: the
 * hub's directed fan-in is corpus-scale while the hub itself can
 * reciprocate at most k edges. Proves at 20x what the unit spec proves
 * at toy scale: the mutual filter bounds the hub's degree at k — an
 * unfiltered kNN graph would hand CC a star of the hub's whole fan-in
 * and collapse the clustering into one giant component.
 */
object HubStress {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(20)
    val k = 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val dim = emb0.head().getSeq[Float](1).length
    val nMembers = emb0.count() * mult
    // cone: base direction (3.0 in every dim) + UNIQUE per-member hash
    // noise (±0.5/dim). Uniqueness matters: members sharing noise (e.g.
    // replicated real vectors) rank their twins above the hub and no
    // hub forms — with independent noise, cos(member, hub) ≈ 1/sqrt(1+s)
    // strictly beats cos(member, member) ≈ 1/(1+s), so the hub is
    // every member's #1 (among probed cells)
    val corpus0 = spark.range(nMembers).select(
      col("id").as("vec_id"),
      expr(s"transform(sequence(1, $dim), j -> " +
        "CAST(3.0 + (pmod(xxhash64(concat(cast(id as string), '_', cast(j as string))), 1000) - 500) / 1000.0 AS FLOAT))")
        .as("embedding"))
    val hubId = 999999999L
    val corpus = corpus0
      .unionByName(Seq((hubId, Seq.fill(dim)(3.0f))).toDF("vec_id", "embedding"))
      .cache()
    val n = corpus.count()
    println(s"[hub] corpus: $n cone vectors (+1 planted hub = the pure base direction)")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[hub] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // directed kNN edges through the forced-IVF path (the 100 TB shape)
    val edges = graft.operators.Ann
      .knnJoin(corpus, "vec_id", "embedding", k = k, bruteBound = 0L)
      .select(col("query_id"), col("item_id")).cache()
    val total = time("directed kNN join (forced IVF)")(edges.count())
    val hubIn = edges.filter(col("item_id") === hubId).count()
    println(s"[hub] directed edges: $total; hub fan-in (queries ranking the hub): $hubIn")

    // the mutual filter (mutualKnnClusters' internal step, reproduced
    // for measurement): an edge survives only if both directions exist
    val directed = edges.filter(col("query_id") < col("item_id"))
      .select(col("query_id").as("id_a"), col("item_id").as("id_b"))
    val reverse = edges.filter(col("query_id") > col("item_id"))
      .select(col("item_id").as("id_a"), col("query_id").as("id_b"))
    val mutual = directed.join(reverse.hint("shuffle_hash"), Seq("id_a", "id_b"), "left_semi").cache()
    val mTotal = mutual.count()
    val hubMutual = mutual.filter(col("id_a") === hubId || col("id_b") === hubId).count()
    println(s"[hub] mutual edges: $mTotal; hub mutual degree: $hubMutual (bound: k=$k)")
    assert(hubMutual <= k, s"mutual filter must bound the hub at k: $hubMutual > $k")
    assert(hubIn > 10L * k, s"the construction must actually create a hub (fan-in $hubIn)")

    // end-to-end clustering over the bounded graph
    val clusters = time("mutual-kNN clustering end-to-end (kNN + mutual + CC)")(
      graft.operators.Ann.mutualKnnClusters(corpus, "vec_id", "embedding", k = k, bruteBound = 0L)
        .select(col("cluster_id")).distinct().count())
    println(s"[hub] clusters: $clusters")
    spark.stop()
  }
}
