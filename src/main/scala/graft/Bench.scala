package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // a long full-GC pause must not kill the run: with the default
      // 120s heartbeat timeout a measured 153s stall got the (local!)
      // executor "removed" and the whole bench died rpc-less — the
      // driver round then records no bench at all, which is worse than
      // a slow one
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // machine state BEFORE any work: a single end-of-run load sample
    // missed a ~3x degraded machine for a whole round (the r7 32s
    // dedup_cross_bucketed phantom) — both ends of the run are recorded
    val load0 = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

    // Explicit fixture-setup phase: build the one-time artifacts
    // (text index, bucketed table, IVF index, Derby catalog) BEFORE any
    // timing, so each query's warm pass below is the probe path a daily
    // pipeline pays and the rep-count policy sees honest numbers.
    SparkEntry.setupFixtures(spark, sfDir)

    // Untimed warm-up: JIT the scan/shuffle/sort/join/agg machinery so the
    // per-query timings below measure steady-state throughput (what a
    // long-lived cluster sees), not first-use interpreter/JIT cliffs —
    // a cold sort-merge join was measured 14x slower than warm.
    {
      import org.apache.spark.sql.functions._
      // JIT-warm the operator machinery with the same SHAPES the suite
      // uses but small outputs: the old 2M-row/1000-key self-join
      // counted ~2e9 joined rows and its GC pressure once froze the
      // driver past the heartbeat timeout — warm-up needs compiled
      // code paths, not big data
      val w = spark.range(500000).select(col("id"), (col("id") % 5000).as("k"), (col("id") % 7).as("v"))
      w.groupBy("k").agg(sum("v"), countDistinct("v")).count()
      w.as("a").join(w.as("b"), col("a.k") === col("b.k") && col("a.id") < col("b.id")).count()
      w.orderBy(col("v").desc, col("id")).limit(10).count()
      // string-keyed shuffled hash join + multi-column hash agg (the dedup join shape)
      val sk = w.limit(100000).select(concat(lit("k"), col("k") % 1000).as("ks"), col("id"), col("v"))
      sk.as("a").join(sk.as("b").hint("shuffle_hash"), col("a.ks") === col("b.ks") && col("a.id") < col("b.id"))
        .groupBy(col("a.id"), col("b.id")).agg(count(lit(1))).count()
      // interpreted higher-order-function path (zip_with/aggregate lambdas)
      val arr = spark.range(200000)
        .select(col("id"), transform(sequence(lit(0), lit(63)), i => xxhash64(col("id"), i)).as("a"))
      arr.select(aggregate(zip_with(col("a"), col("a"), (x, y) => when(x === y, 1).otherwise(0)), lit(0), _ + _).as("s"))
        .agg(sum(col("s"))).count()
      spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().count()
    }

    // MACHINE-STRETCH ANCHOR: a fixed pure-compute probe (100M xxhash64
    // + sum, sf-independent, shuffle-free) timed at both ends of the
    // run. The driver bench has whiplashed 1.2-1.6x round-over-round on
    // machine load alone (r13: 96.3s driver vs 82.1s idle, same code);
    // with the anchor in the line, a stretched run is attributable AT
    // SWEEP TIME — divide totals by C/C_idle instead of guessing from
    // load averages. Near-idle reference on this machine: ~200-330 ms
    // at local[32], ~330-370 ms at local[8] (r14 smoke, L0≈2-3; also in
    // BENCH_IDLE.json notes). First call JITs, second measures.
    def calibrate(): Long = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      // pmod bounds the summands: a raw sum of 100M xxhash64 longs
      // overflows under ANSI mode (1e8 × 1e6 stays far below 2^63)
      spark.range(0L, 100000000L, 1L, cpus.toInt)
        .select(pmod(xxhash64(col("id")), lit(1000000L)).as("h")).agg(sum(col("h"))).head()
      math.round((System.nanoTime() - t0) / 1e6).max(1L)
    }
    calibrate()
    val cal0 = calibrate()

    // PER-QUERY STRETCH PROBE (r17, additions-only): C0/C bracket the
    // whole run, but this host's stretch arrives in minutes-scale
    // windows — a degraded mid-run window poisoned 4 queries in the r16
    // driver comparison while both end anchors read near-idle-ish. A
    // single-threaded ~20 ms driver CPU loop timed right after EVERY
    // query (untimed region — query seconds are untouched) makes a
    // stalled sample attributable PER QUERY: full array in
    // bench_full.json (`cq_ms`), and in the stdout line the median/p90
    // plus the indices of queries whose probe exceeded 2× the run
    // median (`cq_hot`, alphabetical q_ms order). A mid-suite full
    // Spark calibration every 16 queries (`C_mid`) keeps the
    // C0/C-comparable series too. First calls below JIT-warm the loop.
    def cpuProbe(): Long = {
      val t0 = System.nanoTime()
      var h = 0x9E3779B97F4A7C15L
      var i = 0L
      while (i < 30000000L) { h ^= i; h *= 0xC2B2AE3D27D4EB4FL; h ^= (h >>> 29); i += 1 }
      if (h == 42L) Console.err.println("") // keep the loop un-eliminable
      math.round((System.nanoTime() - t0) / 1e6).max(1L)
    }
    cpuProbe(); cpuProbe()

    // Fixed alphabetical order + a per-query warm pass: Map iteration order
    // made round-over-round numbers incomparable (whichever query ran first
    // absorbed residual first-touch cost — a 10s q_topk at sf0.1 was pure
    // ordering noise), and steady-state per-query time is the number that
    // predicts cluster throughput.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val cqMs = new Array[Long](ordered.size)
    val cMid = scala.collection.mutable.ArrayBuffer.empty[Long]
    val looped = ordered.zipWithIndex.map { case ((name, fn), qi) =>
      // a failed query must NOT record its (near-zero) elapsed time as
      // a legitimate result — a broken query would read as a 10x win
      def timed(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      }
      // warm pass: plan + JIT + page cache (untimed)
      val warm = timed()
      // Rep policy keys on the first TIMED value, not the warm pass:
      // the queries that most need reps are exactly those whose warm
      // absorbs residual one-time cost (three rounds of driver-bench
      // phantoms: r5 trio, r6 substring_dup 14.4s-vs-0.6s, r7's four
      // headliners) — a warm-based gate demoted them to single-timed on
      // a loaded machine. Median of 3 below 8s; genuinely slow queries
      // stay single-timed (signal-to-noise is fine, reps blow budget).
      val t =
        if (warm < 0) -1.0
        else {
          val t1 = timed()
          if (t1 < 0) -1.0
          else if (t1 < 8.0) {
            val reps = Seq(t1, timed(), timed())
            if (reps.exists(_ < 0)) -1.0 else reps.sorted.apply(1)
          } else t1
        }
      // stretch probes ride BETWEEN queries (untimed): per-query CPU
      // probe always, full Spark calibration every 16th query
      cqMs(qi) = cpuProbe()
      if ((qi + 1) % 16 == 0) cMid += calibrate()
      name -> t
    }

    // routed-vs-disabled pair: the RollupRewriteRule's win as a recorded
    // number, not an inference. SYMMETRIC measurement: both sides time a
    // prebuilt DataFrame's first action (plan + execute), differing only
    // in whether the route registry is populated when the optimizer runs
    // — the in-loop q_rollup_routed number additionally pays the
    // layout/rollup setup checks, so it is not the comparison baseline.
    val routedPair = try {
      val fn = SparkEntry.queries("q_rollup_routed")
      fn(spark, sfDir).count() // warm: ETL, registration, page cache
      val onDf = fn(spark, sfDir)
      val t1 = System.nanoTime()
      onDf.count()
      val on = (System.nanoTime() - t1) / 1e9
      val offDf = fn(spark, sfDir)
      graft.sql.RollupRoutes.clear()
      val t2 = System.nanoTime()
      offDf.count()
      val off = (System.nanoTime() - t2) / 1e9
      Seq("q_rollup_routed_on" -> on, "q_rollup_routed_off" -> off)
    } catch { case _: Throwable => Seq.empty }

    // The driver keeps only the LAST 2000 chars of output and sbt's
    // epilogue line (~75 chars) lands after ours, so the whole JSON
    // line must fit in ~1925 chars or its HEAD gets cut and the parse
    // fails (BENCH_r03: full-precision values pushed the line to
    // ~2600 and `parsed` came back null). Two decimals keeps ~82
    // queries near 1860 chars. 1-minute load average records machine
    // state with the run (concurrent driver jobs have inflated totals
    // ~2x before).
    // Locale.ROOT formatting: the f interpolator follows the JVM default
    // locale, and a decimal-comma locale would emit invalid JSON — the
    // exact parse failure this block exists to prevent
    // trailing zeros trimmed ("0.50"→"0.5", "3.00"→"3"): ~1 char/query,
    // which is what keeps 85+ queries inside the budget
    def num(v: Double, dp: Int): String = {
      val s = String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".") else s
    }
    val total = looped.map(_._2).sum
    val cal1 = calibrate()
    // per-query stretch summary for the budget-bound line: median/p90
    // of the per-query CPU probes, the mid-suite Spark anchors, and
    // the indices (alphabetical q_ms order) of queries probed at >2×
    // the run median — the degraded samples a comparison should
    // discard. cq_hot is capped at 32 indices for line budget;
    // cq_hot_n carries the TRUE count (a big count = the whole run is
    // degraded and C0/C/C_mid already tell that story); bench_full.json
    // below holds the complete cq_ms array.
    val cqSorted = cqMs.sorted
    def cqPct(p: Double): Long =
      if (cqSorted.isEmpty) 0L
      else cqSorted(math.min((cqSorted.length * p).toInt, cqSorted.length - 1))
    val cq50 = cqPct(0.5)
    val cqHot = cqMs.zipWithIndex.filter(_._1 > 2 * cq50).map(_._2)
    val stretchField =
      s""""CQ50":$cq50,"CQ90":${cqPct(0.9)},"C_mid":${cMid.mkString("[", ",", "]")},""" +
        s""""cq_hot_n":${cqHot.length},"cq_hot":${cqHot.take(32).mkString("[", ",", "]")},"""
    val load = java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val sfName = sfDir.split('/').last // basename: the path prefix is line budget
    def mkLine(withLoad: Boolean, withPair: Boolean, dp: Int = 2, stripQ: Boolean = false) = {
      val results = if (withPair) looped ++ routedPair else looped
      // stripQ: the uniform "q_" key prefix is ~2 chars × 90+ queries of
      // pure line budget — shedding it keeps 1-decimal per-query
      // resolution where the alternative is whole seconds
      val qs = results.map { case (k, v) =>
        "\"" + (if (stripQ) k.stripPrefix("q_") else k) + "\":" + num(v, dp)
      }.mkString("{", ",", "}")
      // "L0"/"L": 1-min load average at run START and END, rounded to
      // int — ~13 chars total, and the machine-state diagnostic
      // survives every shedding tier (the r5 line shed the full load
      // field and left the driver-bench regressions unattributable; the
      // r7 single end-sample missed a 3x-degraded machine entirely).
      // ~0 means an idle machine; >= cpus/4 under local[32] has
      // historically meant 1.5-4x inflated numbers. -1 = load
      // unavailable on this platform (MXBean contract) — NOT clamped to
      // 0, which would certify an unknown machine as idle.
      def li(v: Double) = if (v < 0) -1L else math.round(v)
      // C0/C: the stretch anchor (ms) at run start/end — see calibrate()
      val loadField =
        if (withLoad)
          s""""L0":${li(load0)},"L":${li(load)},"C0":$cal0,"C":$cal1,""" + stretchField
        else ""
      s"""{"metric":"total","value":${num(total, 2)},"unit":"sec",$loadField"queries":$qs,"sf":"$sfName"}"""
    }
    // MILLISECOND ARRAY tier: at 123 queries NO keyed dict fits the
    // 2000-char tail capture at any useful resolution (r11's final
    // whole-second stripped-key fallback measured >1920 and the head
    // got clipped — the driver recorded parsed:null and 109 of 123
    // queries read 0/1s). The array drops the keys entirely: "q_ms" is
    // integer milliseconds in ALPHABETICAL SparkEntry.queries key
    // order (exactly the `ordered` loop above; "q_ms_order" names the
    // convention in-line). 123 ms values ≈ 700 chars, so full
    // regression-visible resolution survives any suite size this repo
    // will reach. The full keyed float map is also written to
    // bench_full.json (below) for direct reading.
    def mkLineArr(withPair: Boolean) = {
      def li(v: Double) = if (v < 0) -1L else math.round(v)
      val arr = looped.map { case (_, v) =>
        if (v < 0) "-1" else math.round(v * 1000).toString
      }.mkString("[", ",", "]")
      val pair = if (withPair && routedPair.nonEmpty)
        routedPair.map { case (k, v) =>
          "\"" + k.stripPrefix("q_rollup_") + "_ms\":" + math.round(v * 1000)
        }.mkString("", ",", ",")
      else ""
      // the 10 slowest queries ALSO get a named seconds dict (the
      // documented "queries" shape) — regressions in the heavies stay
      // directly readable without decoding the array, ~250 chars
      val slow = looped.filter(_._2 >= 0).sortBy(-_._2).take(10)
        .map { case (k, v) => "\"" + k + "\":" + num(v, 2) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${num(total, 2)},"unit":"sec","L0":${li(load0)},"L":${li(load)},""" +
        s""""C0":$cal0,"C":$cal1,""" + stretchField +
        s""""queries":$slow,"q_note":"10 slowest; q_ms has all",""" +
        s""""q_ms_order":"alphabetical SparkEntry.queries keys",$pair"q_ms":$arr,"sf":"$sfName"}"""
    }
    // tiered shedding against the driver's 2000-char tail capture (a
    // clipped line loses EVERYTHING — r11 proved it): prefer the keyed
    // dict WITH the ms array alongside when the suite is small enough,
    // then shed the dict (keys are recoverable from q_order), never the
    // ms array or the L0/L load flags (dropping loads left the r5
    // driver-bench regressions unattributable). The array-only tier is
    // ~800 chars at 123 queries, so the getOrElse is unreachable today.
    // NOTE: no "q_unit" field here — in r8/r9 lines q_unit described
    // the keyed "queries" dict (e.g. "ds"), and these tiers keep that
    // dict in SECONDS; the q_ms array's name carries its own unit
    def withArr(base: String) = {
      val arr = looped.map { case (_, v) =>
        if (v < 0) "-1" else math.round(v * 1000).toString
      }.mkString("[", ",", "]")
      base.stripSuffix("}") + s""","q_ms":$arr}"""
    }
    val line = Seq(
      withArr(mkLine(true, true)), withArr(mkLine(true, false)),
      withArr(mkLine(true, false, dp = 1, stripQ = true)),
      mkLineArr(true), mkLineArr(false))
      // 1920 = the driver's 2000-char tail capture minus sbt's ~75-char
      // epilogue (which lands AFTER our line) with a small safety pad
      .find(_.length <= 1920).getOrElse(mkLineArr(false))
    // full-precision keyed record for direct reading (the stdout line
    // is budget-bound; this file is not): seconds as floats, keyed by
    // full query name, plus machine-state fields
    val fullJson = {
      val qs = (looped ++ routedPair).map { case (k, v) =>
        "\"" + k + "\":" + num(v, 4)
      }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","L0":${num(load0, 2)},"L":${num(load, 2)},"C0":$cal0,"C":$cal1,""" +
        stretchField + s""""cq_ms":${cqMs.mkString("[", ",", "]")},"queries":$qs,"sf":"$sfName"}"""
    }
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
        fullJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () } // diagnostics only — never fail the bench
    println(line)
    if (line.length > 1925)
      Console.err.println(s"[bench] WARNING: JSON line ${line.length} chars — driver tail capture may clip it")
    spark.stop()
  }
}
