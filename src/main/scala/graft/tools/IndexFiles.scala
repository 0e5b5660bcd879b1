package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scratch: data-file count and layout of a freshly built + delta-grown
 * IVF index — the guide-§6 small-files evidence for the cell-clustered
 * write discipline (a scan-partitioned `partitionBy(cell)` write fans
 * every task across every cell it holds; the clustered form writes ≤1
 * file per populated cell). Usage: `IndexFiles [nVecs] [cells] [cpus]`.
 */
object IndexFiles {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 20000
    val cells = if (args.length > 1) args(1).toInt else 64
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val vecs = spark.range(n.toLong).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => (pmod(xxhash64(col("id"), i), lit(1000)) / lit(1000.0)).cast("float")).as("embedding"))
    val path = s"/tmp/graft_indexfiles/${java.util.UUID.randomUUID()}"
    graft.operators.Ann.buildIvfIndex(spark, vecs, path, numCells = cells)
    graft.operators.Ann.appendToIvfIndex(
      vecs.withColumn("vec_id", col("vec_id") + lit(10000000L)), path, "shard_a")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def countParquet(sub: String): Int = {
      val p = new org.apache.hadoop.fs.Path(s"$path/$sub")
      if (!fs.exists(p)) return -1
      val it = fs.listFiles(p, true)
      var c = 0
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet")) c += 1
      }
      c
    }
    println(s"[indexfiles] n=$n cells=$cells cpus=$cpus")
    println(s"[indexfiles] assignments data files: ${countParquet("assignments")}")
    println(s"[indexfiles] delta shard data files: ${countParquet("assignments_delta")}")
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    spark.stop()
  }
}
