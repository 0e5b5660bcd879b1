package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew handling for joins whose key distribution is heavy-tailed
 * (hot users, hot items): classic salting. AQE's skew-join split
 * handles sort-merge skew at runtime; salting is the static
 * counterpart that also works for hash joins and pre-partitioned
 * writes, and it is the tool the brief's 100 TB design calls for when
 * one key holds a double-digit percentage of the fact table.
 *
 * The build side is replicated `saltFactor` times (one copy per salt
 * value); the probe side scatters each row to one salt pseudo-randomly
 * but deterministically (hash of the row's key) — every probe row
 * still meets exactly one copy of its build row, so the join result is
 * identical while the hot key's rows spread over `saltFactor`
 * partitions.
 */
object Skew {

  /** Does xxhash64 accept this type? MapType (anywhere in the nesting)
    * fails analysis — Spark deems maps unhashable (element order is
    * undefined) unless a legacy flag is set. */
  private def hashSafe(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => false
    case a: org.apache.spark.sql.types.ArrayType => hashSafe(a.elementType)
    case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashSafe(f.dataType))
    case _ => true
  }

  /** The hashable subset of a frame's columns, for content-derived
    * salts/tie-breaks (shared with Upsert.rowTieBreak). Rows differing
    * ONLY in unhashable (map) columns share a hash — the residual-skew
    * caveat on saltedJoin already covers that class. */
  private[graft] def hashableCols(df: DataFrame, exclude: Set[String] = Set.empty): Seq[Column] = {
    val cols = df.schema.fields
      .filter(f => !exclude.contains(f.name) && hashSafe(f.dataType))
      .map(f => col(f.name)).toIndexedSeq
    // all-unhashable frame: hash a constant (valid, single bucket —
    // documented residual) rather than fail analysis on zero args
    if (cols.isEmpty) IndexedSeq(lit(0L)) else cols
  }

  /**
   * Inner equi-join `probe ⋈ build` on `key`, salted. `build` must be
   * the smaller side (it is replicated ×saltFactor).
   */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String, saltFactor: Int): DataFrame = {
    // Salt varies per ROW (not per key) — that is what spreads a hot
    // key — but it must be a DETERMINISTIC function of row CONTENT:
    // monotonically_increasing_id depends on partition layout and
    // in-partition order, so a fetch-failure recompute of the probe map
    // stage re-salts rows differently than the shuffle blocks already
    // fetched — silently duplicating or dropping probe rows (the
    // SPARK-23207 nondeterministic-repartition class). Hashing the full
    // row spreads identical hot-key rows only as far as their other
    // columns differ — for a fact table that is every row; fully
    // identical duplicate rows hash together, which only returns the
    // skew to the degree the input itself is one repeated row. Hash
    // input is restricted to hashable column types: a map column
    // anywhere in the row would fail xxhash64 analysis outright.
    val salted = probe.withColumn(
      "__salt",
      pmod(xxhash64(hashableCols(probe): _*), lit(saltFactor)).cast("int"))
    val replicated = build.withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
