package graft.core

import org.apache.spark.sql.SparkSession

/**
 * Driver-side cache of small per-directory loads (index meta rows,
 * centroid tables, PQ codebooks, stats scalars), keyed by the dir's
 * file fingerprint. What it buys: steady-state admission/search/stream
 * paths re-read the SAME bounded metadata dir on every trigger or
 * query, and each re-read is a full Spark job (scan + collect) for
 * bytes the driver already held. A hit costs one `listStatus`; any
 * rewrite (fresh part-file UUID names from `mode("overwrite")`) moves
 * the fingerprint and misses, so a stale value can never be served.
 */
object DirCache {
  // (appId, dir fingerprint, loaded value) per dir
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long, AnyRef)]()

  /** Fingerprint of a written-by-Spark dir: every child's (name,
    * length, mtime) folded into one hash. Overwrites produce fresh
    * part-file UUID names, so any rewrite moves the fingerprint even
    * inside one mtime tick. One listStatus — no Spark job. */
  private def fingerprint(
      fs: org.apache.hadoop.fs.FileSystem, p: org.apache.hadoop.fs.Path): Long = {
    var h = 1125899906842597L
    fs.listStatus(p).foreach { st =>
      h = h * 31 + st.getPath.getName.hashCode
      h = h * 31 + st.getLen
      h = h * 31 + st.getModificationTime
    }
    h
  }

  /**
   * Cached load. A missing dir is NOT cached (and must keep throwing
   * the loader's own error shape — "refuses without meta/centroids" is
   * a documented contract at several call sites): it falls through to
   * the uncached load.
   */
  def cached[T <: AnyRef](spark: SparkSession, dir: String)(load: => T): T = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fp =
      try fingerprint(fs, p)
      catch { case _: java.io.FileNotFoundException => return load }
    val appId = spark.sparkContext.applicationId
    val cur = cache.get(dir)
    if (cur != null && cur._1 == appId && cur._2 == fp) cur._3.asInstanceOf[T]
    else {
      val v = load
      cache.put(dir, (appId, fp, v))
      v
    }
  }

  /** Pre-populate the cache for a dir the caller JUST wrote with the
    * in-memory value the write came from — the first post-write load
    * (e.g. an append reading back the centroids its build computed)
    * then hits without ever running the read job. Only sound when the
    * value is exactly what the loader would produce; a concurrent
    * rewrite is caught by the fingerprint as usual. */
  def put(spark: SparkSession, dir: String, value: AnyRef): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try cache.put(dir, (spark.sparkContext.applicationId, fingerprint(fs, p), value))
    catch { case _: java.io.FileNotFoundException => () }
  }

  /**
   * Total row count of a parquet dir from file FOOTERS — pure
   * driver-side metadata (recursive listing + one footer read per data
   * file), NO Spark job. The count a bloom-sizing step needs right
   * after writing a dir: equivalent to `spark.read.parquet(dir).count()`
   * (parquet row counts are exact in footers) at zero job cost. Only
   * sound on dirs this engine wrote (all files parquet); file counts
   * stay bounded by the cell/bucket-clustered write discipline.
   */
  def parquetRowCount(spark: SparkSession, dir: String): Long = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    var n = 0L
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && !name.startsWith("_") && !name.startsWith(".")) {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(st, spark.sparkContext.hadoopConfiguration)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try n += r.getRecordCount finally r.close()
      }
    }
    n
  }
}
