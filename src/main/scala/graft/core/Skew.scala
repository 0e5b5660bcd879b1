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
    // skew to the degree the input itself is one repeated row.
    val salted = probe.withColumn(
      "__salt",
      pmod(xxhash64(probe.columns.map(col).toIndexedSeq: _*), lit(saltFactor)).cast("int"))
    val replicated = build.withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
