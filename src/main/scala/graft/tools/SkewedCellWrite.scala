package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scratch: the guide-§2.5 evidence for the r17 cell-write skew fix —
 * a deliberately skewed cell assignment (half the corpus in ONE hot
 * cell) written `partitionBy("cell")` two ways:
 *
 *  - `repartition(col("cell"))` (the r16 discipline): the hot cell is
 *    one reduce partition → one straggler task, one giant file;
 *  - `hint("rebalance", col("cell"))` (r17): AQE splits the hot cell
 *    at the advisory partition size and coalesces the tiny cells.
 *
 * Reports per-write: files in the hot cell dir, total files, max/median
 * task duration of the write stage. Usage:
 * `SkewedCellWrite [nVecs] [cells] [cpus] [advisoryMB]`.
 */
object SkewedCellWrite {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 400000
    val cells = if (args.length > 1) args(1).toInt else 64
    val cpus = if (args.length > 2) args(2) else "32"
    val advisoryMb = if (args.length > 3) args(3).toInt else 4
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", s"${advisoryMb}m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // half the rows land in cell 0; the rest hash-spread over the others
    val assigned = spark.range(n.toLong).select(
      col("id").as("item_id"),
      transform(sequence(lit(0), lit(63)),
        i => (pmod(xxhash64(col("id"), i), lit(1000)) / lit(1000.0)).cast("float")).as("item_vec"),
      when(pmod(col("id"), lit(2)) === 0, lit(0))
        .otherwise(pmod(xxhash64(col("id")), lit(cells - 1)).cast("int") + lit(1)).as("cell"))

    val taskMs = scala.collection.mutable.ArrayBuffer.empty[Long]
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (record && te.taskInfo != null) taskMs.synchronized { taskMs += te.taskInfo.duration }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = ()
    })

    def report(label: String, df: DataFrame): Unit = {
      val path = s"/tmp/graft_skewwrite/${java.util.UUID.randomUUID()}"
      taskMs.synchronized(taskMs.clear())
      record = true
      val t0 = System.nanoTime()
      df.write.mode("overwrite").partitionBy("cell").parquet(path)
      val wall = (System.nanoTime() - t0) / 1e9
      record = false
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def files(sub: String): Seq[Long] = {
        val p = new org.apache.hadoop.fs.Path(s"$path/$sub")
        if (!fs.exists(p)) Seq.empty
        else {
          val it = fs.listFiles(p, true)
          val out = scala.collection.mutable.ArrayBuffer.empty[Long]
          while (it.hasNext) {
            val st = it.next()
            if (st.isFile && st.getPath.getName.endsWith(".parquet")) out += st.getLen
          }
          out.toSeq
        }
      }
      val hot = files("cell=0")
      val all = files("")
      val ts = taskMs.synchronized(taskMs.sorted.toIndexedSeq)
      def med(xs: Seq[Long]): Long = if (xs.isEmpty) 0 else xs(xs.size / 2)
      println(f"[skewwrite] $label%-12s wall ${wall}%6.1f s  files total=${all.size}%4d " +
        f"hotCell=${hot.size}%3d (maxFile ${if (hot.isEmpty) 0L else hot.max / 1024 / 1024}%3d MB)  " +
        f"tasks max=${if (ts.isEmpty) 0L else ts.last}%6d ms med=${med(ts)}%5d ms")
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
    }

    println(s"[skewwrite] n=$n cells=$cells cpus=$cpus advisory=${advisoryMb}m (half the rows in cell 0)")
    report("repartition", assigned.repartition(col("cell")))
    report("rebalance", assigned.hint("rebalance", col("cell")))
    spark.stop()
  }
}
