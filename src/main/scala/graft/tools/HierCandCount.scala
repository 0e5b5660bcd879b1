package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Dev tool: the exact candidate volume of knnJoinIvf's hier branch at
  * a given corpus — attribution for the 2.2M-point wall (is it
  * per-candidate overhead, or data-degenerate cell occupancy? A
  * VecScale replica corpus packs each 1100-replica cluster into ~one
  * fine cell, so Σ|cell|·|probers| can far exceed the uniform-cell
  * estimate). Counts the cell join only — no cosine, no vectors in the
  * projection. Args: <dir>. */
object HierCandCount {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_vec2m")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sql.GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint(true)
    val n = emb.count()
    val wanted = math.max(16L, n / 512L)
    // mirror knnJoinIvf's dispatch: below the flip the real operator
    // runs the FLAT branch — attributing a hier quantizer there would
    // measure a code path the operator never takes
    if (wanted <= 4096L) {
      println(s"[hiercand] n=$n wanted=$wanted <= 4096: knnJoinIvf dispatches the FLAT " +
        "branch here — use KnnCellSweep for flat-branch attribution")
      spark.stop()
      return
    }
    val side = math.ceil(math.sqrt(wanted.toDouble)).toInt
    val (l1, l2) = Ann.ivfTrainHier(spark,
      emb.select(xxhash64(col("vec_id")).as("vec_id"), col("embedding")),
      side, side, knownCount = n)
    val bcL1 = Ann.bcastCentroids(spark, l1)
    val bcL2 = Ann.bcastCentroids3(spark, l2)
    val items = emb.select(col("vec_id").as("item_id"), col("embedding").as("item_vec"),
        lit(1.0d).as("item_n"),
        element_at(Ann.nearestCellsHierBc(col("embedding"), bcL1, bcL2, 1, 1), 1).as("cell"))
      .localCheckpoint(true)
    val queries = emb.select(col("vec_id").as("query_id"), col("embedding").as("query_vec"),
        lit(1.0d).as("query_n"),
        explode(Ann.nearestCellsHierBc(col("embedding"), bcL1, bcL2, 2, 2)).as("cell"))
      .localCheckpoint(true)
    val occ = items.groupBy("cell").agg(count(lit(1)).as("ic"))
    val top = occ.orderBy(col("ic").desc).limit(5).collect().map(r => (r.getInt(0), r.getLong(1)))
    val stats = occ.agg(count(lit(1)), expr("sum(ic)"), expr("sum(ic*ic)")).head()
    println(s"[hiercand] n=$n side=$side occupiedCells=${stats.getLong(0)} " +
      s"sumIc=${stats.getLong(1)} sumIc2=${stats.getLong(2)} topCells=${top.mkString(",")}")
    val t0 = System.nanoTime()
    val raw = items.join(queries.hint("shuffle_hash"), Seq("cell"))
      .filter(col("query_id") =!= col("item_id")).count()
    println(f"[hiercand] RAW candidates=$raw (count wall ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
      "no cosine, pre-bounding cell keys)")
    // bounded keys (split + salt): the volume knnJoinIvf's kernel now scans
    val t1 = System.nanoTime()
    val bounded = Ann.boundOccupancy(spark, items, queries, cellTarget = 512)
    val bi = bounded.items.select(col("ckey"), col("item_id")).localCheckpoint(true)
    val bq = bounded.queries.select(col("ckey"), col("query_id")).localCheckpoint(true)
    val boundSecs = (System.nanoTime() - t1) / 1e9
    val occ2 = bi.groupBy("ckey").agg(count(lit(1)).as("ic"))
    val top2 = occ2.orderBy(col("ic").desc).limit(5).collect().map(r => (r.getLong(0), r.getLong(1)))
    val t2 = System.nanoTime()
    val bcands = bi.join(bq.hint("shuffle_hash"), Seq("ckey"))
      .filter(col("query_id") =!= col("item_id")).count()
    println(f"[hiercand] BOUNDED candidates=$bcands " +
      f"(splitCells=${bounded.splitCells} saltedKeys=${bounded.saltedKeys}, bounding ran $boundSecs%.1f s, " +
      f"count wall ${(System.nanoTime() - t2) / 1e9}%.1f s) topKeys=${top2.mkString(",")}")
    // exact-recall FLOOR on a VecScale corpus: cluster id = vec_id % floorMod
    // (replica structure), and naming the exact top-k by id requires every
    // member to be compared against its whole cluster — Σ m·(m−1). Any
    // volume below this cannot be exact on this corpus; the gap between
    // BOUNDED and the floor is the quantizer's real overhead.
    val floorMod = if (args.length > 1) args(1).toLong else 1000000000L
    val floor = emb.groupBy(pmod(col("vec_id"), lit(floorMod)).as("cluster"))
      .agg(count(lit(1)).as("m"))
      .agg(sum(col("m") * (col("m") - 1L))).head().getLong(0)
    println(f"[hiercand] exact-recall floor (vec_id %% $floorMod clusters) = $floor; " +
      f"bounded/floor = ${bcands.toDouble / floor}%.3f, raw/floor = ${raw.toDouble / floor}%.3f")
    spark.stop()
  }
}
