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
  // (appId, dir fingerprint, loaded value) per dir. SIZE-BOUNDED LRU:
  // values are small (meta rows, centroid tables, counts maps) but the
  // engine also runs as a long-lived multi-session server, and a
  // path-churning workload (e.g. DSIR generation dirs — gen=N/meta,
  // gen=N/counts per update) would otherwise grow the map forever.
  // Eviction only costs the next access a reload; correctness never
  // depends on residency. Access-ordered so hot index dirs survive.
  private val MaxEntries = 512
  private val cache =
    new java.util.LinkedHashMap[String, (String, Long, AnyRef)](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (String, Long, AnyRef)]): Boolean =
        size() > MaxEntries
    }
  private def get(dir: String): (String, Long, AnyRef) =
    cache.synchronized(cache.get(dir))
  private def putEntry(dir: String, v: (String, Long, AnyRef)): Unit =
    cache.synchronized { cache.put(dir, v); () }

  /** Drop every entry whose dir is `path` or lives under it — called by
    * deleters (generation pruning, index wipes) so a deleted dir's
    * entry does not linger until LRU eviction. Purely hygienic: a
    * recreated dir would miss on fingerprint anyway. */
  def invalidateUnder(path: String): Unit = cache.synchronized {
    val prefix = if (path.endsWith("/")) path else path + "/"
    val it = cache.keySet().iterator()
    while (it.hasNext) {
      val k = it.next()
      if (k == path || k.startsWith(prefix)) it.remove()
    }
  }

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
      catch {
        case _: java.io.FileNotFoundException =>
          // deleted dir: drop any stale entry instead of leaving it to
          // age out — keeps the map honest under dir-churning workloads
          cache.synchronized { cache.remove(dir); () }
          return load
      }
    val appId = spark.sparkContext.applicationId
    val cur = get(dir)
    if (cur != null && cur._1 == appId && cur._2 == fp) cur._3.asInstanceOf[T]
    else {
      val v = load
      putEntry(dir, (appId, fp, v))
      v
    }
  }

  /** Pre-populate the cache for a dir the caller JUST wrote with the
    * in-memory value the write came from — the first post-write load
    * (e.g. an append reading back the centroids its build computed)
    * then hits without ever running the read job. Only sound when the
    * value is exactly what the loader would produce AND the caller is
    * the dir's only writer between its write and this call (the
    * engine's single-maintainer-per-index contract): the fingerprint is
    * taken HERE, after the write, so a foreign rewrite inside that
    * window would pair the new fingerprint with this stale value. A
    * rewrite after the seed is caught by the fingerprint as usual. */
  def put(spark: SparkSession, dir: String, value: AnyRef): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try putEntry(dir, (spark.sparkContext.applicationId, fingerprint(fs, p), value))
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
