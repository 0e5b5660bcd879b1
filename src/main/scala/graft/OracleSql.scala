package graft

/**
 * DuckDB oracle SQL for SparkEntry.queries (driver correctness gate).
 *
 * Every statement mirrors its Spark query exactly: same column names,
 * same total ORDER BY, decimal-then-double aggregation, BIGINT casts on
 * computed ints, and fold-order-identical float math (so doubles are
 * bit-identical across engines). Every query carries an oracle.
 * Approximate operators are gated on their deterministic properties:
 * the LSH dedups emit exact verify metrics over recall-complete
 * candidates (brute force is the ground truth); hll /
 * source_similarity emit the exact value plus an accuracy-bound
 * boolean; distinct_random picks min-by-md5 (reproducible here); IVF
 * gates mechanism correctness (heap plan ≡ independent agg-sort plan).
 */
object OracleSql {

  private val rev = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"

  /** The densified-calendar trailing-window anomaly grid over any
    * events source — shared by the batch gate and its streaming twin
    * so the two oracles cannot drift apart. */
  private def anomalyGrid(source: String): String =
    s"""WITH d0 AS (SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS cnt
                     FROM $source GROUP BY 1, 2),
            grid AS (SELECT event_type, unnest(generate_series(min(day), max(day),
                            INTERVAL 1 DAY)) AS day
                     FROM d0 GROUP BY event_type),
            d AS (SELECT g.day, g.event_type, COALESCE(d0.cnt, 0) AS cnt
                  FROM grid g LEFT JOIN d0 ON g.day = d0.day AND g.event_type = d0.event_type),
            w AS (SELECT day, event_type, cnt,
                    COUNT(*) OVER tw AS n_prev,
                    SUM(cnt) OVER tw AS sum_prev,
                    SUM(cnt * cnt) OVER tw AS sumsq_prev
                  FROM d
                  WINDOW tw AS (PARTITION BY event_type ORDER BY day
                                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
            f AS (SELECT day, event_type, cnt,
                    CAST(n_prev AS DOUBLE) AS nd, CAST(sum_prev AS DOUBLE) AS sd,
                    CAST(sumsq_prev AS DOUBLE) AS ssd
                  FROM w WHERE n_prev > 1),
            g AS (SELECT day, event_type, cnt, sd / nd AS mean_prev,
                    sqrt((ssd - sd * sd / nd) / (nd - 1)) AS std
                  FROM f)
         SELECT day, event_type, cnt, mean_prev,
           CASE WHEN std > 0.0 THEN (cnt - mean_prev) / std END AS z,
           COALESCE(CASE WHEN std > 0.0 THEN abs((cnt - mean_prev) / std) > 3.0 END,
                    CAST(cnt AS DOUBLE) <> mean_prev) AS is_anomaly
         FROM g ORDER BY event_type, day"""

  /** The weekly-cohort retention matrix over any events source —
    * shared by the batch gate and its streaming twin so the two
    * oracles cannot drift apart. */
  private def retentionMatrix(source: String): String =
    s"""WITH a AS (SELECT user_id, MIN(ts) AS t0
                    FROM $source WHERE event_type = 'signup' GROUP BY user_id),
              ac AS (SELECT user_id, t0, date_trunc('week', t0) AS cohort FROM a),
              act AS (SELECT DISTINCT e.user_id, ac.cohort,
                        CAST(FLOOR((FLOOR(epoch(e.ts)) - FLOOR(epoch(ac.t0))) / 604800.0) AS INT) AS period_n
                      FROM $source e JOIN ac ON e.user_id = ac.user_id
                      WHERE e.ts >= ac.t0),
              cs AS (SELECT cohort, COUNT(*) AS n_cohort FROM ac GROUP BY cohort),
              cells AS (SELECT cohort, period_n, COUNT(*) AS n_active
                        FROM act GROUP BY cohort, period_n)
         SELECT cells.cohort AS cohort, period_n, n_cohort, n_active,
                CAST(n_active AS DOUBLE) / CAST(n_cohort AS DOUBLE) AS retention
         FROM cells JOIN cs ON cells.cohort = cs.cohort
         ORDER BY cells.cohort, period_n"""

  /** The funnel's cascaded running-min window construction over any
    * events source — shared by the batch gate and its streaming twin
    * so the two oracles cannot drift apart. */
  private def funnelCascade(source: String): String =
    s"""WITH s1 AS (SELECT user_id, ts, event_type, event_id,
              MIN(CASE WHEN event_type = 'view' THEN ts END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v1
            FROM $source),
            s2 AS (SELECT *,
              MIN(CASE WHEN event_type = 'click' AND ts > v1 THEN ts END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v2
            FROM s1),
            s3 AS (SELECT *,
              MIN(CASE WHEN event_type = 'purchase' AND ts > v2 THEN ts END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v3
            FROM s2)
         SELECT user_id, MIN(v1) AS ts_step1, MIN(v2) AS ts_step2, MIN(v3) AS ts_step3,
           CAST(CASE WHEN MIN(v3) IS NOT NULL THEN 3
                     WHEN MIN(v2) IS NOT NULL THEN 2
                     WHEN MIN(v1) IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS steps_completed
         FROM s3 GROUP BY user_id ORDER BY user_id"""

  private val toks =
    "list_filter(regexp_split_to_array(lower(text), '[^\\p{L}\\p{Nd}]+'), x -> length(x) > 0)"

  /** ONE quadratic cross-corpus ground truth (probe = src0-2,
    * reference = the rest, exact distinct-3-shingle jaccard >= 0.5)
    * shared by all five serving-layout gates: q_dedup_cross,
    * _bucketed, _delta, _promoted, _compacted must stay ONE truth —
    * every layout is required to be probe-invisible, and five
    * drifting copies of this literal would silently desynchronize
    * them. */
  private lazy val crossCorpusPairsSql =
    s"""WITH t AS (SELECT doc_id, source, $toks AS tk FROM documents),
              s AS (SELECT doc_id, source, list_distinct(list_transform(
                      range(1, greatest(len(tk) - 2, 1) + 1),
                      i -> array_to_string(tk[i:i+2], ' '))) AS sh FROM t),
              a AS (SELECT * FROM s WHERE source IN ('src0', 'src1', 'src2')),
              b AS (SELECT * FROM s WHERE source NOT IN ('src0', 'src1', 'src2')),
              j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                      CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jac
                    FROM a JOIN b ON true)
         SELECT id_a, id_b, jac FROM j WHERE jac >= 0.5 ORDER BY id_a, id_b"""

  /** Transliterate replayed as a replace-fold over the SAME table the
    * Spark expression indexes
    * ([[graft.functions.expressions.Transliterate.table]] — the
    * reference RussianTransliterator rows): outputs are latin, inputs
    * Cyrillic, so no replacement can re-match a later rule and the
    * fold order cannot matter. One source of truth for both engines. */
  private def translitFold(expr: String): String =
    graft.functions.expressions.Transliterate.table.foldLeft(expr) {
      case (acc, (c, s)) => s"replace($acc, '$c', '$s')"
    }

  /** Harman S-stemmer (EnglishLightStemmer) — the same three ordered
    * rules as the Scala kernel, change both together. */
  private val stem =
    """t -> CASE
         WHEN len(t) > 3 AND t LIKE '%ies' THEN
           CASE WHEN t NOT LIKE '%eies' AND t NOT LIKE '%aies'
                THEN substr(t, 1, len(t) - 3) || 'y' ELSE t END
         WHEN len(t) > 3 AND t LIKE '%es' THEN
           CASE WHEN t NOT LIKE '%aes' AND t NOT LIKE '%ees' AND t NOT LIKE '%oes'
                THEN substr(t, 1, len(t) - 1) ELSE t END
         WHEN len(t) > 2 AND t LIKE '%s' THEN
           CASE WHEN t NOT LIKE '%us' AND t NOT LIKE '%ss'
                THEN substr(t, 1, len(t) - 1) ELSE t END
         ELSE t END"""

  /** q_bpe_encode: one word's BPE encode replayed in SQL — code points
    * boundary-joined as `|c1||c2||...||</w>|`, then
    * [[graft.operators.Bpe.frozenMerges]] applied in rank order, each
    * as ONE left-to-right non-overlapping replace (DuckDB `replace`
    * semantics ≡ Bpe.mergePair's single pass; sequential rank order ≡
    * the expression's greedy lowest-rank loop — frozenMerges scaladoc).
    * Built by folding over the SAME frozen table the Spark query
    * applies, so the two sides cannot drift. '|' never occurs inside a
    * symbol: tokens are letter/digit runs and the end marker is </w>. */
  private val bpeEncodeWord: String = {
    val base = """('|' || array_to_string(regexp_extract_all(w, '.'), '||') || '||</w>|')"""
    val merged = graft.operators.Bpe.frozenMerges.sortBy(_.rank).foldLeft(base) { (acc, m) =>
      s"replace($acc, '|${m.left}||${m.right}|', '|${m.left}${m.right}|')"
    }
    s"string_split(trim($merged, '|'), '||')"
  }

  /** en/de/fr/es/zh marker scores over padded lower text `p` (mirrors TextAnalysis.langScore). */
  private def score(words: Seq[String]): String =
    words.map(w => s"(CASE WHEN instr(p, ' $w ') > 0 THEN 1 ELSE 0 END)").mkString(" + ")

  private val sEn = score(Seq("the", "and", "of", "to", "a"))
  private val sDe = score(Seq("der", "die", "und", "das", "ist"))
  private val sFr = score(Seq("le", "la", "et", "les", "des"))
  private val sEs = score(Seq("el", "los", "que", "una", "y"))
  private val sZh = score(Seq("的", "了", "是", "我", "不"))

  /** BM25 scoring CTE prefix (t/lens/u/tf/stats/dfq/q/contrib/sc) —
    * ONE copy of the quantized scoring kernel, shared by q_bm25 and the
    * q_hybrid_retrieval lexical leg (Retrieval.scala scaladoc: change
    * kernel and oracle together). `sc` ends at (query_id, doc_id,
    * score); consumers append their own ranking. */
  private val bm25ScoreCtes =
    s"""t AS (SELECT doc_id, $toks AS tk FROM documents),
            lens AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS len FROM t),
            u AS (SELECT doc_id, unnest(tk) AS term FROM t),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM u GROUP BY doc_id, term),
            -- corpus stats over TOKENIZED docs (mirrors the engine: a
            -- zero-token doc can never be retrieved, so it does not
            -- count toward N or avgdl)
            stats AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n,
                             CAST(COALESCE(SUM(tf), 0) AS DOUBLE) AS l FROM tf),
            dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
            q(query_id, term) AS (VALUES
              ('q_hash_join', 'hash'), ('q_hash_join', 'join'),
              ('q_fast_scan', 'scan'), ('q_fast_scan', 'filter'), ('q_fast_scan', 'fast'),
              ('q_vector_data', 'vector'), ('q_vector_data', 'data')),
            contrib AS (
              SELECT q.query_id, tf.doc_id,
                CAST(CAST(FLOOR(ln((2.0 * s.n - 2.0 * dfq.df + 1.0) / (2.0 * dfq.df + 1.0) + 1.0) * 1000000.0) AS BIGINT) AS DOUBLE)
                  * ((22.0 * s.l * tf.tf) / (10.0 * s.l * tf.tf + 3.0 * s.l + 9.0 * s.n * lens.len)) AS contrib
              FROM q JOIN tf USING (term) JOIN dfq USING (term)
                   JOIN lens ON tf.doc_id = lens.doc_id CROSS JOIN stats s),
            sc AS (SELECT query_id, doc_id,
                     CAST(SUM(CAST(FLOOR(contrib * 100000000.0 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 100000000.0 AS score
                   FROM contrib GROUP BY query_id, doc_id)"""

  /** TextAnalysis.qualityScore as one scalar over (nc, words, punct, p)
    * columns — ONE copy of the float op tree (len·0.5 + stop·0.3 +
    * (1−punct)·0.2, in that order), shared by every oracle that ranks
    * or gates on quality. Change together with the Scala kernel. */
  private val qualityExpr =
    s"""((CASE WHEN nc >= 100 AND nc <= 10000 THEN 1.0
               WHEN nc < 100 THEN CAST(nc AS DOUBLE) / 100.0
               ELSE 10000.0 / CAST(nc AS DOUBLE) END) * 0.5)
       + ((CAST($sEn AS DOUBLE) / 5.0) * 0.3)
       + ((1.0 - (CASE WHEN words > 0 THEN least(CAST(punct AS DOUBLE) / CAST(words AS DOUBLE), 1.0) ELSE 1.0 END)) * 0.2)"""

  /** Brute-force k=5 cosine top-k with the limited-run invariant pinned
    * TRUE — shared by every index-backed search whose exhaustive run
    * provably equals brute force (q_ann_indexed: exhaustive cell
    * probing; q_ann_pq: unlimited re-rank pool). */
  /** Exhaustive-probing-equals-brute-force contract, scoped to a
    * candidate-corpus predicate — `TRUE` is the whole-corpus form the
    * batch index gates share; the streaming admission twin runs it
    * over its bounded window. */
  private def exhaustiveEqualsBruteScoped(
      corpusPred: String, withLimitedCol: Boolean = true): String =
    s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                  FROM embeddings WHERE vec_id < 8),
            c AS (SELECT vec_id AS item_id, CAST(embedding AS DOUBLE[]) AS iv
                  FROM embeddings WHERE $corpusPred),
            s AS (SELECT query_id, item_id,
              list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(qv)), i -> qv[i] * iv[i])), (a, x) -> a + x) /
              (sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])), (a, x) -> a + x)) *
               sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(iv)), i -> iv[i] * iv[i])), (a, x) -> a + x))) AS cos
            FROM q CROSS JOIN c WHERE query_id <> item_id),
            r AS (SELECT query_id, item_id, cos,
              CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, item_id) AS INT) AS rank
            FROM s WHERE NOT isnan(cos))
       SELECT query_id, item_id, cos, rank${
         if (withLimitedCol) ", TRUE AS limited_wellformed_ok" else ""}
       FROM r WHERE rank <= 5 ORDER BY query_id, rank"""

  private val exhaustiveEqualsBruteSql = exhaustiveEqualsBruteScoped("TRUE")

  /** TextAnalysis.fingerprint over a `text` column — the rolling-hash
    * content identity, ONE copy (q_text_fingerprint, q_corpus_diff). */
  private val fpOfText =
    """CAST(list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(list_filter(
             string_split(substr(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), 1, 128), ''),
             c -> length(c) > 0),
             c -> CAST(ascii(c) AS BIGINT))),
         (a, c) -> (a * 131 + c) % 2147483647) AS BIGINT)"""

  /** Brute-force contamination check (shared by q_contamination and its
    * Bloom-prefiltered twin q_contamination_bloom — identical results
    * by construction, see TextAnalysis.contaminationScreenBloom). */
  /** Benchmark-contamination check with a parameterized screened-doc
    * predicate — shared by the exact gate, the Bloom scale path, and
    * the streaming twin so the gram/benchmark definitions cannot
    * drift. */
  private def contaminationScoped(screenedPred: String): String =
    s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
            g AS (SELECT doc_id, unnest(list_distinct(list_filter(
                    list_transform(tk, (x, i) -> CASE WHEN i + 4 <= len(tk)
                      THEN x || ' ' || tk[i + 1] || ' ' || tk[i + 2] || ' ' || tk[i + 3] || ' ' || tk[i + 4] END),
                    v -> v IS NOT NULL))) AS gram
                  FROM t),
            e AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
            c AS (SELECT g.doc_id, COUNT(*) AS n_grams,
                         CAST(SUM(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
                  FROM g LEFT JOIN e ON g.gram = e.gram
                  WHERE $screenedPred GROUP BY g.doc_id)
       SELECT doc_id, n_grams, n_hit,
              CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE) AS contamination_frac
       FROM c ORDER BY doc_id"""

  private val contaminationSql = contaminationScoped("g.doc_id % 97 <> 0")

  /** Streaming contamination twin: the same check window-scoped. */
  private[graft] val contaminationStreamSql =
    contaminationScoped("g.doc_id % 97 <> 0 AND g.doc_id < 2000")

  val all: Map[String, String] = Map(
    "q_agg_sum_min_max" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         MIN(l_extendedprice) AS min_price,
         MAX(l_extendedprice) AS max_price,
         COUNT(*) AS cnt
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_agg_avg" ->
      """SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_agg_distinct_count" ->
      """SELECT l_returnflag,
         COUNT(DISTINCT l_partkey) AS nd_part,
         COUNT(DISTINCT l_suppkey) AS nd_supp
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // the HLL estimate is engine-specific; the gated property is the
    // accuracy bound (TRUE iff the estimate is within 5% of exact)
    "q_agg_hll_count" ->
      """SELECT l_returnflag,
         COUNT(DISTINCT l_partkey) AS nd_part,
         TRUE AS hll_within_5pct
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // deterministic "random" pick: the element with the smallest md5
    "q_agg_distinct_random" ->
      """SELECT l_returnflag,
         min_by(l_partkey, md5(CAST(l_partkey AS VARCHAR))) AS random_part
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_profile" ->
      """SELECT * FROM (
           SELECT 'l_quantity' AS column_name, COUNT(*) AS cnt,
                  CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                  CAST(MIN(l_quantity) AS DOUBLE) AS min_d, CAST(MAX(l_quantity) AS DOUBLE) AS max_d,
                  COUNT(DISTINCT l_quantity) AS ndv FROM lineitem
           UNION ALL
           SELECT 'l_extendedprice', COUNT(*),
                  CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                  CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE),
                  COUNT(DISTINCT l_extendedprice) FROM lineitem
           UNION ALL
           SELECT 'l_discount', COUNT(*),
                  CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                  CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE),
                  COUNT(DISTINCT l_discount) FROM lineitem
           UNION ALL
           SELECT 'l_partkey', COUNT(*),
                  CAST(SUM(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                  CAST(MIN(l_partkey) AS DOUBLE), CAST(MAX(l_partkey) AS DOUBLE),
                  COUNT(DISTINCT l_partkey) FROM lineitem
         ) ORDER BY column_name""",
    "q_agg_stats" ->
      """WITH t AS (
           SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_q,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(24,8))) AS DOUBLE) AS sumsq_q,
             COUNT(l_quantity) AS n
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag,
           CASE WHEN n > 1 THEN (sumsq_q - (sum_q * sum_q) / n) / (n - 1) END AS var_qty,
           CASE WHEN n > 1 THEN sqrt((sumsq_q - (sum_q * sum_q) / n) / (n - 1)) END AS std_qty
         FROM t ORDER BY l_returnflag""",
    "q_semi_anti" ->
      """WITH w AS (SELECT 'with_orders' AS kind, c_custkey FROM customer
                    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)),
              n AS (SELECT 'no_orders' AS kind, c_custkey FROM customer
                    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
         SELECT kind, COUNT(*) AS n_customers FROM (SELECT * FROM w UNION ALL SELECT * FROM n)
         GROUP BY kind ORDER BY kind""",
    "q_set_ops" ->
      """WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
              b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
              u AS (SELECT 'union' AS op, user_id FROM (SELECT user_id FROM c UNION SELECT user_id FROM b)),
              i AS (SELECT 'intersect' AS op, user_id FROM (SELECT user_id FROM c INTERSECT SELECT user_id FROM b)),
              e AS (SELECT 'except' AS op, user_id FROM (SELECT user_id FROM c EXCEPT SELECT user_id FROM b))
         SELECT op, COUNT(*) AS n_users
         FROM (SELECT * FROM u UNION ALL SELECT * FROM i UNION ALL SELECT * FROM e)
         GROUP BY op ORDER BY op""",
    "q_grouping_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         COUNT(*) AS cnt
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q_grouping_cube" ->
      """SELECT event_type, user_id % 10 AS user_bucket,
         COUNT(*) AS cnt,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events GROUP BY CUBE(event_type, user_bucket)
         ORDER BY event_type NULLS FIRST, user_bucket NULLS FIRST""",
    "q_window_funcs" ->
      """SELECT event_id, user_id,
         LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cnt
         FROM events WHERE event_id < 2000 ORDER BY event_id""",
    "q_agg_percentile" ->
      """SELECT l_returnflag,
         quantile_cont(l_quantity, 0.5) AS p50_qty,
         quantile_cont(l_extendedprice, 0.9) AS p90_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_window_lag" ->
      """SELECT event_id, user_id, value,
         LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
         FROM events ORDER BY event_id""",
    // the same cascaded running-min construction, window by window
    "q_funnel" -> funnelCascade("events"),
    // STREAMING twin parity gate: the IDENTICAL batch construction
    // over the gate's deterministic bounded window — the streamed rows
    // must equal the batch funnel of the same events, and sharing one
    // SQL template keeps a future chaining fix from diverging the two
    "q_stream_funnel" ->
      funnelCascade("(SELECT * FROM events WHERE event_id < 20000)"),
    // exact window integers (count/sum/sum-of-squares over the trailing
    // 7 days), then the IDENTICAL scalar double formula both engines
    // evaluate bit-for-bit — the q_agg_stats discipline on a window
    "q_anomaly" -> anomalyGrid("events"),
    // STREAMING twin parity gate — the identical batch construction
    // over the gate's bounded window (one shared template)
    "q_stream_anomaly" ->
      anomalyGrid("(SELECT * FROM events WHERE event_id < 20000)"),
    "q_event_paths" ->
      """WITH p AS (SELECT user_id, event_type,
              lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s1,
              lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s2
            FROM events),
            g AS (SELECT event_type || ' > ' || s1 || ' > ' || s2 AS path, user_id
                  FROM p WHERE event_type IS NOT NULL
                          AND s1 IS NOT NULL AND s2 IS NOT NULL),
            c AS (SELECT path, COUNT(*) AS n_occurrences,
                         COUNT(DISTINCT user_id) AS n_users FROM g GROUP BY path)
         SELECT path, n_occurrences, n_users FROM c
         ORDER BY n_occurrences DESC, path ASC LIMIT 10""",
    // floor-epoch period arithmetic: Spark's timestamp->long cast ==
    // floor(epoch(ts)) here, so cell boundaries are engine-exact
    "q_retention" -> retentionMatrix("events"),
    // STREAMING twin parity gate — the identical batch construction
    // over the gate's bounded window (one shared template, like
    // q_funnel / q_stream_funnel)
    "q_stream_retention" ->
      retentionMatrix("(SELECT * FROM events WHERE event_id < 20000)"),
    "q_time_trunc" ->
      """SELECT event_id,
         date_trunc('year', ts) AS t_year,
         date_trunc('quarter', ts) AS t_quarter,
         date_trunc('month', ts) AS t_month,
         date_trunc('week', ts) AS t_week,
         date_trunc('day', ts) AS t_day,
         date_trunc('hour', ts) AS t_hour,
         date_trunc('minute', ts) AS t_minute,
         date_trunc('second', ts) AS t_second
         FROM events WHERE event_id < 500 ORDER BY event_id""",
    "q_time_extract" ->
      """SELECT event_id,
         CAST(year(ts) AS BIGINT) AS e_year,
         CAST(quarter(ts) AS BIGINT) AS e_quarter,
         CAST(month(ts) AS BIGINT) AS e_month,
         CAST(weekofyear(ts) AS BIGINT) AS e_week,
         CAST(dayofmonth(ts) AS BIGINT) AS e_day,
         CAST(hour(ts) AS BIGINT) AS e_hour,
         CAST(minute(ts) AS BIGINT) AS e_minute,
         CAST(CAST(floor(second(ts)) AS BIGINT) AS BIGINT) AS e_second
         FROM events WHERE event_id < 500 ORDER BY event_id""",
    "q_time_interval" ->
      """SELECT event_id,
         ts + INTERVAL 1 DAY AS ts_plus_day,
         ts - INTERVAL 2 HOUR AS ts_minus_2h,
         ts + INTERVAL 90 MINUTE AS ts_plus_90m
         FROM events WHERE event_id < 500 ORDER BY event_id""",
    "q_sql_agg" ->
      """SELECT date_trunc('month', l_shipdate) AS month, l_returnflag,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         COUNT(*) AS cnt
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_shipdate < TIMESTAMP '1997-06-01'
         GROUP BY month, l_returnflag
         ORDER BY month, l_returnflag""",
    "q_sql_topn" ->
      """SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend,
         COUNT(*) AS n_orders
         FROM orders
         GROUP BY o_custkey
         HAVING COUNT(*) >= 2
         ORDER BY spend DESC, o_custkey
         LIMIT 20""",
    // Data contract: event_id is unique in the events table (its PK in
    // the generator). Upsert.apply keeps one row per key while this
    // per-row CASE keeps all rows — a duplicated event_id would
    // row-count-mismatch, surfacing the contract violation rather than
    // silently agreeing.
    "q_upsert" ->
      """SELECT event_id, ts, user_id, event_type,
         CASE WHEN event_id < 100 THEN value * 2.0 ELSE value END AS value
         FROM events ORDER BY event_id""",
    "q_str_funcs" ->
      """SELECT c_custkey,
         CAST(length(c_name) AS BIGINT) AS name_len,
         lower(c_name) AS name_lower,
         upper(c_mktsegment) AS seg_upper
         FROM customer ORDER BY c_custkey""",
    "q_tokens" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents)
         SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
                array_to_string(tk[1:5], '|') AS head_tokens
         FROM t ORDER BY doc_id""",
    "q_stemmed_tokens" ->
      s"""WITH t AS (SELECT doc_id, list_transform($toks, $stem) AS tk FROM documents)
         SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
                array_to_string(tk[1:8], '|') AS head_stems
         FROM t ORDER BY doc_id""",
    "q_translit" ->
      s"""WITH t AS (SELECT doc_id,
             translate(lower(text), 'aeiouyshcq', 'аеиоуыщжчъ') AS src FROM documents),
           u AS (SELECT doc_id, src,
             list_filter(
               list_transform(
                 list_transform(
                   list_filter(regexp_split_to_array(src, '[^\\p{L}\\p{Nd}]+'),
                     x -> length(x) > 0),
                   $stem),
                 w -> ${translitFold("w")}),
               x -> length(x) > 0) AS tk
           FROM t)
         SELECT doc_id, ${translitFold("src")} AS translit_text,
                CAST(len(tk) AS BIGINT) AS n_tokens,
                array_to_string(tk[1:8], '|') AS head_translit
         FROM u ORDER BY doc_id""",
    "q_split" ->
      """WITH t AS (SELECT p_partkey,
           list_filter(regexp_split_to_array(p_type, '[^\p{L}\p{Nd}]+'), x -> length(x) > 0) AS tw
           FROM part)
         SELECT p_partkey, array_to_string(tw, '|') AS type_words, CAST(len(tw) AS BIGINT) AS n_words
         FROM t ORDER BY p_partkey""",
    "q_arith" ->
      s"""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         -l_quantity AS neg_qty,
         abs(l_quantity - 25.0) AS abs_dev,
         CAST($rev AS DOUBLE) AS revenue,
         l_partkey % 7 AS pk_mod,
         l_quantity / 2.0 AS half_qty
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_is_null" ->
      """SELECT c_custkey,
         nullif(c_mktsegment, 'BUILDING') IS NULL AS seg_is_null,
         nullif(c_mktsegment, 'BUILDING') IS NOT NULL AS seg_is_not_null,
         coalesce(nullif(c_mktsegment, 'BUILDING'), 'NONE') AS seg_or_none
         FROM customer ORDER BY c_custkey""",
    "q_cmp_logic" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         (l_quantity >= 45.0) AS big_qty,
         (l_returnflag <> 'N') AS returned_or_na,
         (l_extendedprice < 10000.0) AS cheap
         FROM lineitem
         WHERE (l_quantity > 30 AND l_discount <= 0.05) OR NOT (l_returnflag = 'N')
         ORDER BY l_orderkey, l_linenumber""",
    "q_in_notin" ->
      """SELECT l_returnflag, COUNT(*) AS cnt,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
         FROM lineitem
         WHERE l_returnflag IN ('A','R') AND l_linenumber NOT IN (1,2)
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_case" ->
      s"""SELECT CASE WHEN l_quantity < 10 THEN 'low'
                     WHEN l_quantity < 30 THEN 'mid'
                     ELSE 'high' END AS band,
         COUNT(*) AS cnt,
         CAST(SUM($rev) AS DOUBLE) AS sum_rev
         FROM lineitem GROUP BY band ORDER BY band""",
    "q_array_ops" ->
      s"""WITH t AS (SELECT doc_id, ($toks)[1:8] AS tk FROM documents)
         SELECT doc_id,
         list_contains(tk, 'the') AS has_the,
         list_has_all(tk, ['the','data']) AS has_all,
         list_has_any(tk, ['spark','table']) AS has_any,
         array_to_string(tk, ', ') AS joined,
         CAST(len(tk) AS BIGINT) AS arr_len
         FROM t ORDER BY doc_id""",
    "q_filter_range" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         l_quantity, l_extendedprice
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_shipdate < TIMESTAMP '1996-06-01'
           AND l_returnflag = 'R'
         ORDER BY l_orderkey, l_linenumber""",
    "q_postfilter" ->
      """SELECT l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         COUNT(*) AS cnt
         FROM lineitem GROUP BY l_suppkey
         HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 300.0
         ORDER BY l_suppkey""",
    "q_limit" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q_join_link" ->
      s"""SELECT r_name, n_name,
         CAST(SUM($rev) AS DOUBLE) AS sum_rev,
         COUNT(*) AS cnt
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q_join_link_filtered" ->
      """SELECT s_nationkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         COUNT(*) AS cnt
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         WHERE s_acctbal > 4000.0
         GROUP BY s_nationkey ORDER BY s_nationkey""",
    "q_link_declared" ->
      """SELECT 'cat-' || CAST(s_suppkey AS VARCHAR) AS "supplierName",
         COUNT(*) AS cnt,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         WHERE s_suppkey % 3 = 0
         GROUP BY 1 ORDER BY 1""",
    "q_join_facts" ->
      s"""SELECT o_orderpriority,
         CAST(SUM($rev) AS DOUBLE) AS sum_rev,
         COUNT(*) AS n_items,
         COUNT(DISTINCT o_orderkey) AS n_orders
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    // the fused dot product must equal the sequential left fold the
    // composable form spells out — fusion is invisible by contract
    "q_dot_fused" ->
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings WHERE vec_id < 8),
              c AS (SELECT vec_id AS iid, CAST(embedding AS DOUBLE[]) AS iv
                    FROM embeddings)
         SELECT qid, iid,
           list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(qv)), i -> qv[i] * iv[i])), (a, x) -> a + x) AS dot
         FROM q JOIN c ON qid < iid
         ORDER BY qid, iid""",
    // the salted skew join must equal the PLAIN equi-join — scatter by
    // content hash × replicate-per-salt is pure mechanics, so the
    // oracle is the unsalted join itself
    "q_skew_join" ->
      """SELECT o_orderpriority,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         COUNT(*) AS cnt
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_asof_attribution" ->
      """WITH cl AS (SELECT user_id, ts, MIN(event_id) AS asof_event_id
                     FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
              u AS (SELECT event_id, user_id, ts, value, 1 AS side
                    FROM events WHERE event_type = 'purchase'
                    UNION ALL
                    SELECT asof_event_id, user_id, ts, NULL, 0 FROM cl),
              c AS (SELECT *,
                      MAX(CASE WHEN side = 0 THEN ts END) OVER (
                        PARTITION BY user_id ORDER BY ts, side
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lrt
                    FROM u),
              p AS (SELECT event_id, user_id, ts, value,
                      CASE WHEN epoch_us(ts) - epoch_us(lrt) <= 7200000000 THEN lrt END AS lrt
                    FROM c WHERE side = 1)
         SELECT p.event_id, p.user_id, p.ts, p.value, cl.asof_event_id AS click_id
         FROM p LEFT JOIN cl ON cl.user_id = p.user_id AND cl.ts = p.lrt
         ORDER BY p.event_id""",
    "q_range_join" ->
      """SELECT p.event_id AS purchase_id, e.event_id AS error_id, p.user_id
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         JOIN (SELECT * FROM events WHERE event_type = 'error') e
           ON p.user_id = e.user_id
          AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 5 MINUTE
         ORDER BY purchase_id, error_id""",
    "q_inverted_phrase" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents)
         SELECT doc_id FROM t
         WHERE list_has_all(tk, ['spark','table','merge'])
         ORDER BY doc_id""",
    "q_cooccurrence" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
         SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_users
         FROM ut a JOIN ut b
           ON a.user_id = b.user_id AND a.event_type < b.event_type
         GROUP BY type_a, type_b ORDER BY type_a, type_b""",
    // the group's side is a pure function of its name: first 4 hex
    // chars of md5(source) vs the train threshold 'e666'
    // (floor(0.9*65536) = 58982 = 0xe666) — both engines emit lowercase
    // hex md5, so the assignment reproduces byte-for-byte
    "q_group_split" ->
      """WITH a AS (SELECT source,
           CASE WHEN substr(md5(source), 1, 4) < 'e666' THEN 'train' ELSE 'eval' END AS split
           FROM documents)
         SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT source) AS n_groups
         FROM a GROUP BY split ORDER BY split""",
    "q_sample_split" ->
      """WITH t AS (SELECT doc_id,
           substr(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), 1, 128) AS norm
           FROM documents),
         f AS (SELECT doc_id,
           CAST(list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(list_filter(string_split(norm, ''), c -> length(c) > 0),
                 c -> CAST(ascii(c) AS BIGINT))),
             (a, c) -> (a * 131 + c) % 2147483647) AS BIGINT) AS fp
           FROM t)
         SELECT CASE WHEN fp % 10 < 8 THEN 'train' WHEN fp % 10 = 8 THEN 'val' ELSE 'test' END AS split,
                COUNT(*) AS n_docs
         FROM f GROUP BY split ORDER BY split""",
    "q_vocab_stats" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
              u AS (SELECT unnest(tk) AS token FROM t)
         SELECT token, COUNT(*) AS occurrences
         FROM u GROUP BY token
         ORDER BY occurrences DESC, token LIMIT 30""",
    "q_tfidf" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
              n AS (SELECT COUNT(*) AS nd FROM documents),
              u AS (SELECT doc_id, unnest(tk) AS term FROM t),
              tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM u GROUP BY doc_id, term),
              df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
              sc AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                       CAST(tf.tf * (n.nd + 1) AS DOUBLE) / CAST(df.df + 1 AS DOUBLE) AS score
                     FROM tf JOIN df USING (term) CROSS JOIN n),
              r AS (SELECT doc_id, term, tf, df,
                      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
                    FROM sc)
         SELECT doc_id, term, tf, df, CAST(rank AS INT) AS rank
         FROM r WHERE rank <= 3 ORDER BY doc_id, rank""",
    "q_heavy_hitters" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
              u AS (SELECT unnest(tk) AS token FROM t)
         SELECT token, COUNT(*) AS occurrences
         FROM u GROUP BY token
         ORDER BY occurrences DESC, token LIMIT 20""",
    "q_rollup" ->
      """WITH daily AS (
           SELECT date_trunc('day', ts) AS rollup_time, event_type,
                  COUNT(*) AS c,
                  SUM(CAST(value AS DECIMAL(18,4))) AS v
           FROM events GROUP BY rollup_time, event_type)
         SELECT date_trunc('month', rollup_time) AS month, event_type,
                CAST(SUM(c) AS BIGINT) AS n_events, CAST(SUM(v) AS DOUBLE) AS sum_value
         FROM daily GROUP BY month, event_type ORDER BY month, event_type""",
    "q_topk" ->
      s"""SELECT l_partkey, CAST(SUM($rev) AS DOUBLE) AS part_rev
         FROM lineitem GROUP BY l_partkey
         ORDER BY part_rev DESC, l_partkey LIMIT 10""",
    "q_type_convs" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         CAST(l_linenumber AS VARCHAR) AS ln_str,
         CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
         CAST(CAST(l_linenumber AS DECIMAL(18,2)) AS DOUBLE) AS ln_currency,
         CAST(FLOOR(l_quantity) AS BIGINT) AS qty_long,
         CAST(l_partkey AS DOUBLE) AS pk_double
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_stream_ingest" ->
      """SELECT event_id, ts, user_id, event_type, value
         FROM events ORDER BY event_id""",
    "q_stream_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events GROUP BY window_start, event_type
         ORDER BY window_start, event_type""",
    "q_sessionize" ->
      """WITH o AS (
           SELECT user_id, ts, value, event_id,
                  LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events),
         f AS (
           SELECT user_id, ts, value, event_id,
                  CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
           FROM o),
         s AS (
           SELECT user_id, ts, value,
                  SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM f)
         SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
                COUNT(*) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM s GROUP BY user_id, sid
         ORDER BY user_id, session_start""",
    "q_dedup_exact" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
         FROM documents GROUP BY text ORDER BY keep_id""",
    // full curation pipeline: composes the verified fragments (exact-dup
    // groups, recursive-CTE near-dup closure, langid, quality, split) in
    // the operator's gate order
    "q_curate" ->
      s"""WITH RECURSIVE
              t AS (SELECT doc_id, text, $toks AS tk, ' ' || lower(text) || ' ' AS p FROM documents),
              ex AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text) AS exact_canon FROM documents),
              s AS (SELECT doc_id, list_distinct(list_transform(
                      range(1, greatest(len(tk) - 2, 1) + 1),
                      i -> array_to_string(tk[i:i+2], ' '))) AS sh FROM t),
              j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                    FROM s a JOIN s b ON a.doc_id < b.doc_id
                    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                          CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.5),
              e AS (SELECT id_a AS a, id_b AS b FROM j UNION SELECT id_b, id_a FROM j),
              reach(id, r) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b),
              comp AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS canonical_id FROM reach GROUP BY id),
              sc AS (SELECT doc_id, $sEn AS s_en, $sDe AS s_de, $sFr AS s_fr, $sEs AS s_es, $sZh AS s_zh FROM t),
              m AS (SELECT doc_id, s_en, s_de, s_fr, s_es, s_zh,
                    greatest(s_en, s_de, s_fr, s_es, s_zh) AS best FROM sc),
              lang AS (SELECT doc_id,
                CASE WHEN s_en > 0 AND s_en = best THEN 'en'
                     WHEN s_de > 0 AND s_de = best THEN 'de'
                     WHEN s_fr > 0 AND s_fr = best THEN 'fr'
                     WHEN s_es > 0 AND s_es = best THEN 'es'
                     WHEN s_zh > 0 AND s_zh = best THEN 'zh'
                     ELSE 'und' END AS lang FROM m),
              qt AS (SELECT doc_id, text, p,
                       CAST(length(text) AS BIGINT) AS nc,
                       CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS words,
                       CAST(len(regexp_extract_all(text, '[.,;:!?''"()\\[\\]{}-]')) AS BIGINT) AS punct
                     FROM t),
              q AS (SELECT doc_id, $qualityExpr AS quality FROM qt),
              fpn AS (SELECT doc_id,
                        substr(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), 1, 128) AS norm
                      FROM documents),
              fp AS (SELECT doc_id,
                       CAST(list_reduce(
                         list_prepend(CAST(0 AS BIGINT),
                           list_transform(list_filter(string_split(norm, ''), c -> length(c) > 0),
                             c -> CAST(ascii(c) AS BIGINT))),
                         (a, c) -> (a * 131 + c) % 2147483647) AS BIGINT) AS fp
                     FROM fpn),
              dec AS (SELECT d.doc_id, comp.canonical_id, lang.lang, q.quality, fp.fp,
                        CASE WHEN d.doc_id <> ex.exact_canon THEN 'exact_dup'
                             WHEN comp.canonical_id <> d.doc_id THEN 'near_dup'
                             WHEN lang.lang NOT IN ('en') THEN 'lang'
                             WHEN q.quality < 0.3 THEN 'quality'
                             END AS reason
                      FROM documents d
                      JOIN ex USING (doc_id) JOIN comp USING (doc_id)
                      JOIN lang USING (doc_id) JOIN q USING (doc_id) JOIN fp USING (doc_id))
         SELECT doc_id, canonical_id, lang, quality,
                (reason IS NULL) AS keep, reason,
                CASE WHEN reason IS NULL THEN
                  CASE WHEN fp % 10 < 8 THEN 'train' WHEN fp % 10 = 8 THEN 'val' ELSE 'test' END
                END AS split
         FROM dec ORDER BY doc_id""",
    // transitive closure over the exact >=0.5-jaccard pair set (the same
    // ground truth the minhash query emits), min id per component
    "q_dedup_cluster" ->
      s"""WITH RECURSIVE
              t AS (SELECT doc_id, $toks AS tk FROM documents),
              s AS (SELECT doc_id, list_distinct(list_transform(
                      range(1, greatest(len(tk) - 2, 1) + 1),
                      i -> array_to_string(tk[i:i+2], ' '))) AS sh FROM t),
              j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                    FROM s a JOIN s b ON a.doc_id < b.doc_id
                    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                          CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.5),
              e AS (SELECT id_a AS a, id_b AS b FROM j
                    UNION SELECT id_b, id_a FROM j),
              reach(id, r) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b
              )
         SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS canonical_id
         FROM reach GROUP BY id ORDER BY doc_id""",
    "q_dedup_ngram_jaccard" ->
      """WITH g AS (
           SELECT doc_id, lang, source,
             list_distinct(list_transform(
               generate_series(1, greatest(length(lower(text)) - 3, 1)),
               i -> substr(lower(text), i, 4))) AS grams
           FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
           CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE) AS jac
         FROM g a JOIN g b
           ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
         WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
               CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE) >= 0.35
         ORDER BY id_a, id_b""",
    // the COLLAPSE route's gate: the 400-doc window doubled with exact
    // replicas (doc_id + 10M), full quadratic recompute over the
    // doubled corpus — the engine's collapse-and-expand must emit the
    // identical pair set (originals ×4 via replicas + replica self
    // pairs at jaccard 1.0)
    "q_dedup_ngram_collapsed" ->
      """WITH d AS (
           SELECT doc_id, text, lang, source FROM documents WHERE doc_id < 400
           UNION ALL
           SELECT doc_id + 10000000, text, lang, source FROM documents WHERE doc_id < 400),
         g AS (
           SELECT doc_id, lang, source,
             list_distinct(list_transform(
               generate_series(1, greatest(length(lower(text)) - 3, 1)),
               i -> substr(lower(text), i, 4))) AS grams
           FROM d)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
           CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE) AS jac
         FROM g a JOIN g b
           ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
         WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
               CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE) >= 0.35
         ORDER BY id_a, id_b""",
    // LSH dedups emit EXACT verify metrics over candidates whose recall is
    // complete (minhash: 32x2 banding, miss < 1e-9 at the pairs' j>=0.7;
    // simhash: radius-3 blocks + the same minhash bands as backstop) — so
    // brute force over all pairs is the exact oracle.
    "q_dedup_minhash" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
              s AS (SELECT doc_id, list_distinct(list_transform(
                      range(1, greatest(len(tk) - 2, 1) + 1),
                      i -> array_to_string(tk[i:i+2], ' '))) AS sh FROM t),
              j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                      CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jac
                    FROM s a JOIN s b ON a.doc_id < b.doc_id)
         SELECT id_a, id_b, jac FROM j WHERE jac >= 0.5 ORDER BY id_a, id_b""",
    // cross-corpus dedup: probe shard (src0-2) vs reference corpus (the
    // rest), quadratic A×B ground truth — the Spark side's threshold-
    // sized banding (miss < 1e-6) plus exact shingle verify emits the
    // same set through the persisted-index probe path
    "q_dedup_cross" ->
      crossCorpusPairsSql,
    // admission novelty decision: admitted ⇔ no reference doc reaches
    // jaccard >= 0.5 — the quadratic probe×ref recompute of the
    // decision admitShard makes through the banded index probe
    "q_dedup_admitted" ->
      s"""WITH d AS (SELECT doc_id, $toks AS tk FROM documents WHERE doc_id < 300),
              s AS (SELECT doc_id, list_distinct(list_transform(
                      range(1, greatest(len(tk) - 2, 1) + 1),
                      i -> array_to_string(tk[i:i+2], ' '))) AS sh FROM d),
              ref AS (SELECT * FROM s WHERE doc_id < 200),
              probe AS (SELECT doc_id, sh FROM s WHERE doc_id >= 200
                        UNION ALL
                        SELECT doc_id + 10000000, sh FROM s WHERE doc_id < 100),
              m AS (SELECT p.doc_id
                    FROM probe p JOIN ref r ON
                      CAST(len(list_intersect(p.sh, r.sh)) AS DOUBLE) /
                      CAST(len(list_distinct(list_concat(p.sh, r.sh))) AS DOUBLE) >= 0.5
                    GROUP BY p.doc_id)
         SELECT p.doc_id, (m.doc_id IS NULL) AS admitted
         FROM probe p LEFT JOIN m ON p.doc_id = m.doc_id
         ORDER BY p.doc_id""",
    // same ground truth through the PROMOTED bucketed table (even-id
    // base + odd-id delta folded in by promoteTextIndexDelta): the fold
    // must be probe-invisible, so the emitted pair set is identical
    "q_dedup_cross_promoted" ->
      crossCorpusPairsSql,
    // same ground truth through the COMPACTED index (base third + two
    // admitted shard thirds folded into __base): compaction must be
    // probe-invisible, so the emitted pair set is identical
    "q_dedup_cross_compacted" ->
      crossCorpusPairsSql,
    // same ground truth through the BASE+DELTA split serving layout
    // (bucketed base over even-id refs + parquet delta over odd-id
    // refs): the split must emit the identical exact pair set
    "q_dedup_cross_delta" ->
      crossCorpusPairsSql,
    // same ground truth through the BUCKETED index layout — both
    // layouts must emit the identical exact pair set
    "q_dedup_cross_bucketed" ->
      crossCorpusPairsSql,
    // streaming near-dup twin: the 400-doc window doubled with exact
    // replicas at +10000001 (the Spark side streams it in two parity
    // batches against the persisted signature index); ground truth is
    // the same brute-force distinct-shingle jaccard over the doubled
    // window — candidate recall is threshold-sized (miss < 1e-6) and
    // the emitted metric is the exact verify, so the sets must agree
    "q_stream_dedup" ->
      s"""WITH d0 AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
              d AS (SELECT doc_id, text FROM d0
                    UNION ALL SELECT doc_id + 10000001, text FROM d0),
              t AS (SELECT doc_id, $toks AS tk FROM d),
              s AS (SELECT doc_id, list_distinct(list_transform(
                      range(1, greatest(len(tk) - 2, 1) + 1),
                      i -> array_to_string(tk[i:i+2], ' '))) AS sh FROM t),
              j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                      CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jac
                    FROM s a JOIN s b ON a.doc_id < b.doc_id)
         SELECT id_a, id_b, jac FROM j WHERE jac >= 0.5 ORDER BY id_a, id_b""",
    // streaming semantic-dedup twin: the 200-vector window doubled with
    // exact replicas at +10000001 (the Spark side streams it in two
    // parity batches through the sign-LSH band probe of the persisted
    // vector index); ground truth is brute-force cosine over the
    // doubled window — band recall at 0.9 is threshold-sized
    // (miss < 1e-6; replica pairs share signatures and cannot miss)
    // and the streamed metric is the exact cosine verify, so the sets
    // must agree
    "q_stream_semdedup" ->
      """WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                     FROM embeddings WHERE vec_id < 200),
              e AS (SELECT vec_id, v FROM e0
                    UNION ALL SELECT vec_id + 10000001, v FROM e0),
              p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i])), (x, y) -> x + y) /
                (sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(a.v)), i -> a.v[i] * a.v[i])), (x, y) -> x + y)) *
                 sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(b.v)), i -> b.v[i] * b.v[i])), (x, y) -> x + y))) AS cos
              FROM e a JOIN e b ON a.vec_id < b.vec_id)
         SELECT id_a, id_b, cos FROM p WHERE cos >= 0.9 AND NOT isnan(cos)
         ORDER BY id_a, id_b""",
    // streaming keep-best twin: clusters are 3 exact replicas of
    // cluster-disjoint synthetic text with score = doc_id, so the
    // rep-chained streaming decisions are provably the closed form —
    // the max-id replica keeps, every member attributes to it, score
    // rides as the doc's own id (SparkEntry.qStreamKeepBest scaladoc
    // derives both the lose-to-rep and beat-and-demote paths)
    "q_stream_keep_best" ->
      """WITH d0 AS (SELECT doc_id AS base FROM documents WHERE doc_id < 150),
              m AS (SELECT base, unnest([base, base + 10000001, base + 20000002]) AS doc_id
                    FROM d0)
         SELECT doc_id, doc_id = base + 20000002 AS kept,
                base + 20000002 AS rep_id,
                CAST(doc_id AS DOUBLE) AS score
         FROM m ORDER BY doc_id""",
    // streaming exact dedup twin: the window delivered at-least-once
    // (in-batch dups + a full cross-batch re-delivery) must come out
    // exactly-once per event_id — the oracle is the window itself
    "q_stream_dedup_exact" ->
      """SELECT event_id, user_id, event_type, value
         FROM events WHERE event_id < 20000 ORDER BY event_id""",
    "q_dedup_simhash" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
              s AS (SELECT doc_id, list_distinct(list_transform(
                      range(1, greatest(len(tk) - 2, 1) + 1),
                      i -> array_to_string(tk[i:i+2], ' '))) AS sh FROM t),
              j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                      CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jac
                    FROM s a JOIN s b ON a.doc_id < b.doc_id)
         SELECT id_a, id_b, jac FROM j WHERE jac >= 0.5 ORDER BY id_a, id_b""",
    "q_dedup_embed" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i])), (x, y) -> x + y) /
                (sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(a.v)), i -> a.v[i] * a.v[i])), (x, y) -> x + y)) *
                 sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(b.v)), i -> b.v[i] * b.v[i])), (x, y) -> x + y))) AS cos
              FROM e a JOIN e b ON a.vec_id < b.vec_id)
         SELECT id_a, id_b, cos FROM p WHERE cos >= 0.5 AND NOT isnan(cos)
         ORDER BY id_a, id_b""",
    // forced-IVF embedding dedup: the Spark side runs the IVF machinery
    // with EXHAUSTIVE probing (probes = numCells), whose output provably
    // equals the brute >=-threshold set — so brute force re-verifies
    // every emitted pair; the probe-limited subset property is computed
    // Spark-side and the oracle pins the expected TRUE. Both engines
    // run on the same deterministic fixed-size gate subset (the 500
    // lowest multiplicative-id-hash vectors — SparkEntry.gateEmbeddings)
    // so the deliberately-quadratic gate stays flat-cost at any sf.
    "q_dedup_embed_ivf" ->
      """WITH g AS (SELECT vec_id, embedding FROM embeddings
                    ORDER BY ((vec_id % 1048576) * 2654435761) % 4294967296, vec_id LIMIT 500),
              e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM g),
              p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i])), (x, y) -> x + y) /
                (sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(a.v)), i -> a.v[i] * a.v[i])), (x, y) -> x + y)) *
                 sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(b.v)), i -> b.v[i] * b.v[i])), (x, y) -> x + y))) AS cos
              FROM e a JOIN e b ON a.vec_id < b.vec_id)
         SELECT id_a, id_b, cos, TRUE AS limited_subset_ok
         FROM p WHERE cos >= 0.4 AND NOT isnan(cos)
         ORDER BY id_a, id_b""",
    "q_ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings WHERE vec_id < 8),
              c AS (SELECT vec_id AS item_id, CAST(embedding AS DOUBLE[]) AS iv
                    FROM embeddings),
              s AS (SELECT query_id, item_id,
                list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(qv)), i -> qv[i] * iv[i])), (a, x) -> a + x) /
                (sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])), (a, x) -> a + x)) *
                 sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(iv)), i -> iv[i] * iv[i])), (a, x) -> a + x))) AS cos
              FROM q CROSS JOIN c WHERE query_id <> item_id),
              r AS (SELECT query_id, item_id, cos,
                CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, item_id) AS INT) AS rank
              FROM s WHERE NOT isnan(cos))
         SELECT query_id, item_id, cos, rank FROM r WHERE rank <= 5
         ORDER BY query_id, rank""",
    // IVF: mechanism correctness (heap plan == independent agg-sort
    // plan over the probed candidates) and minimal quality are the
    // deterministic gated properties; the booleans are computed
    // Spark-side, the oracle pins the expected all-TRUE skeleton
    "q_ann_ivf" ->
      """SELECT vec_id AS query_id,
         CAST(5 AS BIGINT) AS n_results,
         TRUE AS mechanism_ok,
         TRUE AS found_true_neighbor
         FROM embeddings WHERE vec_id < 8 ORDER BY query_id""",
    // persisted-index search with EXHAUSTIVE probing: the probed-cell
    // candidate set is the whole corpus minus self, so the index path's
    // output equals brute-force top-k — re-verified neighbor by
    // neighbor; the probe-limited run's structural invariant is pinned
    // as the expected TRUE
    "q_ann_indexed" -> exhaustiveEqualsBruteSql,
    // the admission lifecycle under the same contract: the index is
    // split (base = even vec_ids, delta shard = odd), and exhaustive
    // probing through the base∪delta serving path must equal brute
    // force over the FULL corpus — every neighbor re-verified through
    // the admission machinery
    "q_ann_admitted" -> exhaustiveEqualsBruteSql,
    // the STREAMING admission twin under the same contract: the index
    // grows by streamed micro-batch shards over a bounded 400-vector
    // window (base = the first 100), and exhaustive probing through
    // the stream-grown index must equal brute force over the window —
    // every neighbor re-verified through the streaming admission path
    // (the probe-LIMITED path's structural invariant stays
    // q_ann_admitted's daily job — this gate pays one search pipeline)
    "q_stream_vector_admit" ->
      exhaustiveEqualsBruteScoped("vec_id < 400", withLimitedCol = false),
    // the PROMOTED index serves the identical window: folding delta
    // shards into the base must be probe-invisible, so exhaustive
    // probing equals the same brute-force recompute
    "q_ann_promoted" ->
      exhaustiveEqualsBruteScoped("vec_id < 400", withLimitedCol = false),
    // the codes-layout admission: exhaustive probes + unlimited exact
    // re-rank equal brute force regardless of code quality, so the
    // same oracle re-verifies the PQ admission-serving path
    "q_ann_pq_admitted" -> exhaustiveEqualsBruteSql,
    // same contract as q_ann_indexed: the exhaustive-pool PQ run (ADC
    // prunes nothing, exact re-rank over everything) provably equals
    // brute force; the rerank-limited run's mechanism invariant is the
    // pinned boolean
    "q_ann_pq" -> exhaustiveEqualsBruteSql,
    "q_ann_pq_indexed" -> exhaustiveEqualsBruteSql,
    // exact_jaccard is recomputed here from scratch (tokenize →
    // distinct word-3-shingles per source → |∩|/|∪|); the minhash
    // estimate is gated as the |est − exact| <= 0.2 bound
    "q_source_similarity" ->
      s"""WITH t AS (SELECT source, $toks AS tk FROM documents),
              sh AS (SELECT DISTINCT source, array_to_string(tk[i : i + 2], ' ') AS shingle
                     FROM t, UNNEST(range(1, greatest(len(tk) - 2, 1) + 1)) AS u(i)),
              counts AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
              inter AS (SELECT a.source AS sa, b.source AS sb, COUNT(*) AS i
                        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
                        GROUP BY 1, 2)
         SELECT ca.source AS source_a, cb.source AS source_b,
           CAST(COALESCE(i.i, 0) AS DOUBLE) / CAST(ca.n + cb.n - COALESCE(i.i, 0) AS DOUBLE) AS exact_jaccard,
           TRUE AS est_err_ok
         FROM counts ca JOIN counts cb ON ca.source < cb.source
         LEFT JOIN inter i ON ca.source = i.sa AND cb.source = i.sb
         ORDER BY source_a, source_b""",
    "q_text_langid" ->
      s"""WITH t AS (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents),
              sc AS (SELECT doc_id, $sEn AS s_en, $sDe AS s_de, $sFr AS s_fr, $sEs AS s_es, $sZh AS s_zh FROM t),
              m AS (SELECT doc_id, s_en, s_de, s_fr, s_es, s_zh,
                    greatest(s_en, s_de, s_fr, s_es, s_zh) AS best FROM sc)
         SELECT doc_id,
           CASE WHEN s_en > 0 AND s_en = best THEN 'en'
                WHEN s_de > 0 AND s_de = best THEN 'de'
                WHEN s_fr > 0 AND s_fr = best THEN 'fr'
                WHEN s_es > 0 AND s_es = best THEN 'es'
                WHEN s_zh > 0 AND s_zh = best THEN 'zh'
                ELSE 'und' END AS lang_pred
         FROM m ORDER BY doc_id""",
    "q_text_quality" ->
      s"""WITH t AS (SELECT doc_id, text, ' ' || lower(text) || ' ' AS p,
             CAST(length(text) AS BIGINT) AS nc,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS words,
             CAST(len(regexp_extract_all(text, '[.,;:!?''"()\\[\\]{}-]')) AS BIGINT) AS punct
           FROM documents),
           f AS (SELECT doc_id, nc, words, $qualityExpr AS quality FROM t)
         SELECT doc_id, nc AS n_chars_actual, words AS n_words, quality
         FROM f ORDER BY doc_id""",
    "q_text_tokencount" ->
      """SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws_tokens,
         CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]+')) AS BIGINT) AS bpe_tokens
         FROM documents ORDER BY doc_id""",
    "q_bpe_encode" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         e AS (SELECT doc_id, flatten(list_transform(tk, w -> $bpeEncodeWord)) AS sub FROM t)
         SELECT doc_id, CAST(len(sub) AS BIGINT) AS n_subwords,
                array_to_string(sub[1:8], '|') AS head_subwords
         FROM e ORDER BY doc_id""",
    "q_chunk_tokens" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         c AS (SELECT doc_id, tk,
                 unnest(CASE WHEN len(tk) = 0 THEN [NULL]
                        ELSE range(0, len(tk), 48) END) AS start
               FROM t),
         s AS (SELECT doc_id, start, tk[start + 1 : start + 64] AS chunk FROM c)
         SELECT doc_id,
           CAST(start // 48 AS BIGINT) AS chunk_idx,
           CAST(len(chunk) AS BIGINT) AS n_tokens,
           array_to_string(chunk, ' ') AS chunk_text
         FROM s ORDER BY doc_id, chunk_idx""",
    "q_text_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, $fpOfText AS fp FROM documents)
         SELECT doc_id, fp FROM t ORDER BY doc_id""",
    // v2 rebuilt with the same deterministic edits; per-side narrow
    // fingerprints full-outer-joined on the id
    "q_corpus_diff" ->
      s"""WITH v2 AS (
              SELECT doc_id,
                CASE WHEN doc_id % 13 = 0 THEN text || ' v2 edit' ELSE text END AS text
              FROM documents WHERE doc_id % 17 <> 0
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 19 = 0),
            a AS (SELECT doc_id, $fpOfText AS fp_old FROM documents),
            b AS (SELECT doc_id, $fpOfText AS fp_new FROM v2)
         SELECT doc_id, fp_old, fp_new,
           CASE WHEN fp_old IS NULL THEN 'added'
                WHEN fp_new IS NULL THEN 'removed'
                WHEN fp_old = fp_new THEN 'unchanged'
                ELSE 'changed' END AS change
         FROM a FULL JOIN b USING (doc_id)
         ORDER BY doc_id""",
    // Frame addressing re-derived from the GVID container layout
    // formula (8-byte header, then per frame u32 length prefix + one
    // BMP of 54 + h·stride bytes); img/audio are one whole-payload
    // frame whose size is the BMP / canonical-WAV layout formula —
    // so the engine's parsed offsets equal the oracle's arithmetic
    // only if encoder and container parser agree byte-for-byte.
    "q_multimodal_frames" ->
      """WITH p AS (
           SELECT doc_id AS d,
             CASE CAST(((doc_id % 3) + 3) % 3 AS INT) WHEN 0 THEN 'img' WHEN 1 THEN 'audio' ELSE 'video' END AS fmt,
             8 + (((doc_id*5 + 1) % 17 + 17) % 17) AS w,
             8 + (((doc_id*3 + 2) % 13 + 13) % 13) AS h,
             64 + ((doc_id % 193 + 193) % 193) AS ns,
             1 + ((doc_id % 4 + 4) % 4) AS nf
           FROM documents WHERE doc_id < 100),
         s AS (SELECT *, 54 + h * (((w*3 + 3) // 4) * 4) AS bmp FROM p),
         f AS (SELECT d, fmt, bmp, ns,
                 unnest(range(0, CASE WHEN fmt = 'video' THEN nf ELSE 1 END)) AS fi
               FROM s)
         SELECT d AS doc_id, fmt, CAST(fi AS BIGINT) AS frame_idx,
                CAST(CASE WHEN fmt = 'video' THEN 8 + fi*(4 + bmp) + 4 ELSE 0 END AS BIGINT) AS byte_offset,
                CAST(CASE fmt WHEN 'audio' THEN 44 + 2*ns ELSE bmp END AS BIGINT) AS frame_bytes
         FROM f ORDER BY doc_id, frame_idx""",
    // Decoded-media features re-derived from the generator arithmetic
    // + format layout formulas (Multimodal.renderMedia / MediaCodec —
    // change together): byte_len from the BMP/WAV/GVID size formulas,
    // content_sum = Σ luma·1000 (BT.601 per-mille weights) over every
    // pixel of every frame, or Σ (sample+32768) over every PCM sample.
    // The engine computes the same digests by PARSING the blobs, so a
    // stride/flip/channel/sample-width bug diverges here.
    "q_multimodal_meta" ->
      """WITH p AS (
           SELECT doc_id AS d,
             CASE CAST(((doc_id % 3) + 3) % 3 AS INT) WHEN 0 THEN 'img' WHEN 1 THEN 'audio' ELSE 'video' END AS fmt,
             8 + (((doc_id*5 + 1) % 17 + 17) % 17) AS w,
             8 + (((doc_id*3 + 2) % 13 + 13) % 13) AS h,
             64 + ((doc_id % 193 + 193) % 193) AS ns,
             1 + ((doc_id % 4 + 4) % 4) AS nf
           FROM documents),
         s AS (SELECT *, 54 + h * (((w*3 + 3) // 4) * 4) AS bmp FROM p)
         SELECT d AS doc_id, fmt,
           CAST(CASE fmt WHEN 'img' THEN bmp WHEN 'audio' THEN 44 + 2*ns ELSE 8 + nf*(4 + bmp) END AS BIGINT) AS byte_len,
           CAST(CASE WHEN fmt = 'audio' THEN 0 ELSE w END AS INT) AS width,
           CAST(CASE WHEN fmt = 'audio' THEN 0 ELSE h END AS INT) AS height,
           CAST(CASE fmt WHEN 'img' THEN 1 WHEN 'audio' THEN ns ELSE nf END AS BIGINT) AS frame_count,
           CAST(CASE fmt
             WHEN 'audio' THEN list_sum(list_transform(range(0, ns), i -> (d*31 + i*17) % 65536))
             WHEN 'img' THEN list_sum(list_transform(range(0, w*h), pp ->
                 ((d*3 + (pp % w)*7  + (pp // w)*13) % 256) * 299
               + ((d*5 + (pp % w)*11 + (pp // w)*3 ) % 256) * 587
               + ((d*7 + (pp % w)*5  + (pp // w)*17) % 256) * 114))
             ELSE list_sum(list_transform(range(0, nf), t -> list_sum(list_transform(range(0, w*h), pp ->
                 ((d*3 + (pp % w)*7  + (pp // w)*13 + t*29) % 256) * 299
               + ((d*5 + (pp % w)*11 + (pp // w)*3  + t*31) % 256) * 587
               + ((d*7 + (pp % w)*5  + (pp // w)*17 + t*37) % 256) * 114))))
           END AS BIGINT) AS content_sum
         FROM s ORDER BY doc_id""",
    // Average-hash re-derived from the generator's pixel arithmetic:
    // every pixel's luma·1000, the exact integer 8×8 box downsample
    // (cell of (x,y) = (⌊8y/h⌋, ⌊8x/w⌋) — w,h ≥ 8 so no empty cell),
    // the bit rule cs·N > total·cn in exact integers, packed as two
    // 32-bit halves (1::BIGINT << 63 overflows here). The engine hashes
    // pixels it DECODED from the BMP blob — fingerprints agree only if
    // the whole encode→decode→hash chain is pixel-exact.
    "q_multimodal_phash" ->
      """WITH p AS (SELECT doc_id AS d,
                      8 + (((doc_id*5 + 1) % 17 + 17) % 17) AS w,
                      8 + (((doc_id*3 + 2) % 13 + 13) % 13) AS h
                    FROM documents WHERE ((doc_id % 3) + 3) % 3 = 0),
              px AS (SELECT d, w, h, unnest(range(0, w*h)) AS pp FROM p),
              lum AS (SELECT d,
                        (((pp // w)*8) // h) * 8 + ((pp % w)*8) // w AS ci,
                        ((d*3 + (pp % w)*7  + (pp // w)*13) % 256) * 299
                      + ((d*5 + (pp % w)*11 + (pp // w)*3 ) % 256) * 587
                      + ((d*7 + (pp % w)*5  + (pp // w)*17) % 256) * 114 AS l
                      FROM px),
              cells AS (SELECT d, ci, CAST(SUM(l) AS BIGINT) AS cs, COUNT(*) AS cn FROM lum GROUP BY d, ci),
              tot AS (SELECT d, CAST(SUM(cs) AS BIGINT) AS total, CAST(SUM(cn) AS BIGINT) AS n FROM cells GROUP BY d),
              hash AS (SELECT c.d,
                         CAST(SUM(CASE WHEN c.cs * t.n > t.total * c.cn AND c.ci < 32
                                       THEN (1::BIGINT << CAST(31 - c.ci AS INT)) ELSE 0 END) AS BIGINT) AS phash_hi,
                         CAST(SUM(CASE WHEN c.cs * t.n > t.total * c.cn AND c.ci >= 32
                                       THEN (1::BIGINT << CAST(63 - c.ci AS INT)) ELSE 0 END) AS BIGINT) AS phash_lo
                       FROM cells c JOIN tot t USING (d) GROUP BY c.d)
         SELECT p.d AS doc_id, 'img' AS fmt,
                CAST(54 + h * (((w*3 + 3) // 4) * 4) AS BIGINT) AS byte_len,
                phash_hi, phash_lo
         FROM p JOIN hash ON p.d = hash.d ORDER BY doc_id""",
    // Box-average resize re-derived from the generator arithmetic: the
    // same cell mapping as the engine (cell of (x,y) =
    // (⌊4y/h⌋, ⌊4x/w⌋)) and ONE exact integer division per cell
    // (SUM(luma) // COUNT). Video resizes its first frame, whose pixel
    // formula is the t = 0 image formula; audio excluded. The engine
    // resizes pixels it DECODED from the blob, so any stride/flip/
    // cell-mapping bug in decode OR resize diverges here.
    "q_multimodal_resize" ->
      """WITH p AS (SELECT doc_id AS d,
                      8 + (((doc_id*5 + 1) % 17 + 17) % 17) AS w,
                      8 + (((doc_id*3 + 2) % 13 + 13) % 13) AS h
                    FROM documents
                    WHERE doc_id < 200 AND ((doc_id % 3) + 3) % 3 <> 1),
              px AS (SELECT d, w, h, unnest(range(0, w*h)) AS pp FROM p),
              lum AS (SELECT d,
                        (((pp // w)*4) // h) * 4 + ((pp % w)*4) // w AS ci,
                        ((d*3 + (pp % w)*7  + (pp // w)*13) % 256) * 299
                      + ((d*5 + (pp % w)*11 + (pp // w)*3 ) % 256) * 587
                      + ((d*7 + (pp % w)*5  + (pp // w)*17) % 256) * 114 AS l
                      FROM px),
              cells AS (SELECT d, ci, SUM(l) // COUNT(*) AS cellv FROM lum GROUP BY d, ci),
              agg AS (SELECT d, CAST(SUM(cellv) AS BIGINT) AS thumb_sum,
                             CAST(SUM((ci + 1) * cellv) AS BIGINT) AS thumb_digest
                      FROM cells GROUP BY d)
         SELECT p.d AS doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
                CAST(4 AS INT) AS out_w, CAST(4 AS INT) AS out_h, thumb_sum, thumb_digest
         FROM p JOIN agg ON p.d = agg.d ORDER BY doc_id""",
    // BM25: same exact-rational term factor + micro-nat-quantized IDF as
    // graft.operators.Retrieval (change both together). k1=1.2 b=0.75.
    "q_bm25" ->
      s"""WITH $bm25ScoreCtes,
              r AS (SELECT query_id, doc_id, score,
                      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
                    FROM sc)
         SELECT query_id, doc_id, score, CAST(rank AS INT) AS rank
         FROM r WHERE rank <= 10 ORDER BY query_id, rank""",
    // q_bm25_admitted serves from the persisted base+delta postings
    // index; the union of disjoint shards IS the monolithic postings
    // table and the stored stats sum to the monolithic constants, so
    // the oracle is the SAME monolithic recompute as q_bm25
    "q_bm25_admitted" ->
      s"""WITH $bm25ScoreCtes,
              r AS (SELECT query_id, doc_id, score,
                      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
                    FROM sc)
         SELECT query_id, doc_id, score, CAST(rank AS INT) AS rank
         FROM r WHERE rank <= 10 ORDER BY query_id, rank""",
    // positional k=10 spans (NOT distinct — every position counts), gram
    // occurrence counts corpus-wide, per-doc duplicated-position stats;
    // grouped by the span STRING (the engine groups 128-bit
    // fingerprints — a collision would hash-mismatch here and be caught)
    "q_substring_dup" -> {
      val tail = (1 to 9).map(j => s"|| ' ' || tk[i + $j]").mkString(" ")
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
              g AS (SELECT doc_id, unnest(list_filter(
                      list_transform(tk, (x, i) -> CASE WHEN i + 9 <= len(tk)
                        THEN x $tail END),
                      v -> v IS NOT NULL)) AS gram
                    FROM t),
              c AS (SELECT gram, COUNT(*) AS occ FROM g GROUP BY gram),
              d AS (SELECT g.doc_id, COUNT(*) AS n_spans,
                           CAST(SUM(CASE WHEN c.occ >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
                    FROM g JOIN c USING (gram) GROUP BY g.doc_id)
         SELECT dd.doc_id,
                CAST(COALESCE(d.n_spans, 0) AS BIGINT) AS n_spans,
                CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup,
                CASE WHEN COALESCE(d.n_spans, 0) > 0
                     THEN CAST(d.n_dup AS DOUBLE) / CAST(d.n_spans AS DOUBLE) END AS dup_frac
         FROM documents dd LEFT JOIN d ON dd.doc_id = d.doc_id ORDER BY dd.doc_id""" },
    "q_text_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
              u AS (SELECT doc_id, unnest(tk) AS token FROM t),
              tc AS (SELECT doc_id, token, COUNT(*) AS c FROM u GROUP BY doc_id, token),
              ts AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                            COUNT(*) AS n_distinct, CAST(MAX(c) AS BIGINT) AS top_token_n
                     FROM tc GROUP BY doc_id),
              b AS (SELECT doc_id,
                      unnest(list_filter(
                        list_transform(tk, (x, i) -> CASE WHEN i < len(tk) THEN x || ' ' || tk[i + 1] END),
                        g -> g IS NOT NULL)) AS bigram
                    FROM t),
              bc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM b GROUP BY doc_id, bigram),
              bs AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams, CAST(MAX(c) AS BIGINT) AS top_bigram_n
                     FROM bc GROUP BY doc_id)
         SELECT ts.doc_id, ts.n_tokens, ts.n_distinct, ts.top_token_n,
                COALESCE(bs.n_bigrams, 0) AS n_bigrams,
                COALESCE(bs.top_bigram_n, 0) AS top_bigram_n,
                CAST(ts.n_distinct AS DOUBLE) / CAST(ts.n_tokens AS DOUBLE) AS distinct_frac,
                CAST(ts.top_token_n AS DOUBLE) / CAST(ts.n_tokens AS DOUBLE) AS top_token_frac
         FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id
         ORDER BY ts.doc_id""",
    "q_pack_shards" ->
      s"""WITH d AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS w,
                       md5(CAST(doc_id AS VARCHAR)) AS ok
                     FROM documents),
              c AS (SELECT doc_id, w,
                      CAST(SUM(w) OVER (ORDER BY ok, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
                    FROM d)
         SELECT doc_id, w, cum,
                (cum - w) // 512 AS shard_id,
                cum - w - ((cum - w) // 512) * 512 AS shard_offset
         FROM c ORDER BY doc_id""",
    // chunk stage mirrors q_chunk_tokens (range() starts, min(64, n-start)
    // tail), pack stage mirrors q_pack_shards (md5 order, global cumsum)
    "q_pack_chunks" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
              c AS (SELECT doc_id, len(tk) AS n, unnest(range(0, len(tk), 48)) AS start
                    FROM t WHERE len(tk) > 0),
              ch AS (SELECT CAST(doc_id AS VARCHAR) || ':' || CAST(start // 48 AS VARCHAR) AS chunk_id,
                            CAST(least(64, n - start) AS BIGINT) AS w
                     FROM c),
              o AS (SELECT chunk_id, w, md5(chunk_id) AS ok FROM ch),
              s AS (SELECT chunk_id, w,
                      CAST(SUM(w) OVER (ORDER BY ok, chunk_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
                    FROM o)
         SELECT chunk_id, w, cum,
                (cum - w) // 256 AS shard_id,
                cum - w - ((cum - w) // 256) * 256 AS shard_offset
         FROM s ORDER BY chunk_id""",
    "q_stratified_sample" ->
      """WITH r AS (
           SELECT lang, doc_id,
                  ROW_NUMBER() OVER (PARTITION BY lang
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
           FROM documents)
         SELECT lang, doc_id, CAST(rn AS INT) AS rn
         FROM r WHERE rn <= 40 ORDER BY lang, rn""",
    "q_embed_quant" ->
      """WITH s AS (
           SELECT vec_id, embedding,
                  CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) / 127.0 AS scale
           FROM embeddings)
         SELECT vec_id, scale,
                array_to_string(list_transform(embedding,
                  x -> CAST(COALESCE(FLOOR(CAST(x AS DOUBLE) / nullif(scale, 0.0) + 0.5), 0.0) AS INT)), ',') AS q8_csv,
                CAST(len(list_filter(list_transform(embedding,
                  x -> CAST(COALESCE(FLOOR(CAST(x AS DOUBLE) / nullif(scale, 0.0) + 0.5), 0.0) AS INT)),
                  q -> abs(q) = 127)) AS BIGINT) AS n_saturated
         FROM s ORDER BY vec_id""",
    "q_contamination" -> contaminationSql,
    // streaming screening twin: same check, window-scoped
    "q_stream_contamination" -> contaminationStreamSql,
    // the Bloom-prefiltered scale path returns EXACTLY the exact
    // check's rows (FPs die in the verify join, FNs are impossible),
    // so it shares the brute-force oracle — the gate proves it
    "q_contamination_bloom" -> contaminationSql,
    // quality formula = the verified q_text_quality fragment (same op
    // order), ranked per source with doc_id tiebreak
    "q_domain_cap" ->
      s"""WITH t AS (SELECT doc_id, source, ' ' || lower(text) || ' ' AS p,
             CAST(length(text) AS BIGINT) AS nc,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS words,
             CAST(len(regexp_extract_all(text, '[.,;:!?''"()\\[\\]{}-]')) AS BIGINT) AS punct
           FROM documents),
           f AS (SELECT doc_id, source, $qualityExpr AS quality FROM t),
           r AS (SELECT doc_id, source, quality,
                   CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY quality DESC, doc_id ASC) AS INT) AS rk
                 FROM f)
         SELECT doc_id, source, quality, rk, rk <= 10 AS kept
         FROM r ORDER BY doc_id""",
    // hybrid = the verified q_bm25 leg + an integer tf-idf dot-product
    // leg (milli-nat idf, exact integer sums) fused by RRF; the rrf
    // float is two exactly-rounded divisions added bm25-leg-first —
    // the same fixed order as Retrieval.hybridTopK
    "q_hybrid_retrieval" ->
      s"""WITH $bm25ScoreCtes,
              leg1 AS (SELECT query_id, doc_id, CAST(bm25_rank AS INT) AS bm25_rank FROM (
                         SELECT query_id, doc_id,
                           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS bm25_rank
                         FROM sc) WHERE bm25_rank <= 10),
              idfk AS (SELECT dfq.term,
                         CAST(FLOOR(ln((s.n + 1.0) / (CAST(dfq.df AS DOUBLE) + 1.0)) * 1000.0) AS BIGINT) AS idfm
                       FROM dfq CROSS JOIN stats s),
              sc2 AS (SELECT q.query_id, tf.doc_id,
                        CAST(SUM(tf.tf * idfk.idfm * idfk.idfm) AS BIGINT) AS score
                      FROM q JOIN tf USING (term) JOIN idfk USING (term)
                      GROUP BY q.query_id, tf.doc_id),
              leg2 AS (SELECT query_id, doc_id, CAST(tfidf_rank AS INT) AS tfidf_rank FROM (
                         SELECT query_id, doc_id,
                           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS tfidf_rank
                         FROM sc2) WHERE tfidf_rank <= 10),
              fused AS (SELECT query_id, doc_id, bm25_rank, tfidf_rank,
                          COALESCE(1.0 / (60.0 + CAST(bm25_rank AS DOUBLE)), 0.0)
                            + COALESCE(1.0 / (60.0 + CAST(tfidf_rank AS DOUBLE)), 0.0) AS rrf
                        FROM leg1 FULL JOIN leg2 USING (query_id, doc_id)),
              fr AS (SELECT query_id, doc_id, bm25_rank, tfidf_rank, rrf,
                       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC) AS INT) AS rank
                     FROM fused)
         SELECT query_id, doc_id, bm25_rank, tfidf_rank, rrf, rank
         FROM fr WHERE rank <= 5 ORDER BY query_id, rank""",
    // composes the verified q_text_quality and q_text_fingerprint fragments:
    // keep-probability = quality, uniform draw = fingerprint / 2^31-1
    "q_weighted_sample" ->
      s"""WITH t AS (SELECT doc_id, text, ' ' || lower(text) || ' ' AS p,
             CAST(length(text) AS BIGINT) AS nc,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS words,
             CAST(len(regexp_extract_all(text, '[.,;:!?''"()\\[\\]{}-]')) AS BIGINT) AS punct
           FROM documents),
           q AS (SELECT doc_id, $qualityExpr AS quality FROM t),
           n AS (SELECT doc_id,
             substr(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), 1, 128) AS norm
           FROM documents),
           fp AS (SELECT doc_id,
             CAST(list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(list_filter(string_split(norm, ''), c -> length(c) > 0),
                   c -> CAST(ascii(c) AS BIGINT))),
               (a, c) -> (a * 131 + c) % 2147483647) AS DOUBLE) / 2147483647.0 AS u
           FROM n)
         SELECT q.doc_id, q.quality, fp.u, fp.u < q.quality AS kept
         FROM q JOIN fp ON q.doc_id = fp.doc_id
         ORDER BY q.doc_id""",
    // Spark answers this from the ROUTED day-grain rollup (RollupRewriteRule);
    // the oracle recomputes from the raw fact — equality proves the rewrite
    "q_rollup_routed" ->
      """SELECT date_trunc('month', ts) AS month, event_type,
                COUNT(*) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events GROUP BY month, event_type
         ORDER BY month, event_type""",
    "q_rollup_routed_avg" ->
      """SELECT date_trunc('month', ts) AS month, event_type,
                CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(value) AS avg_value
         FROM events GROUP BY month, event_type
         ORDER BY month, event_type""",
    // brute-force all-pairs cosine + recursive-CTE transitive closure —
    // the ground truth for the LSH-candidate + CC semantic dedup
    "q_semdedup" ->
      """WITH RECURSIVE
              e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              j0 AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                           list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i])), (x, y) -> x + y) /
                           (sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(a.v)), i -> a.v[i] * a.v[i])), (x, y) -> x + y)) *
                            sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(b.v)), i -> b.v[i] * b.v[i])), (x, y) -> x + y))) AS cos
                     FROM e0 a JOIN e0 b ON a.vec_id < b.vec_id),
              j AS (SELECT id_a, id_b FROM j0 WHERE cos >= 0.5 AND NOT isnan(cos)),
              e AS (SELECT id_a AS a, id_b AS b FROM j
                    UNION SELECT id_b, id_a FROM j),
              reach(id, r) AS (
                SELECT vec_id, vec_id FROM embeddings
                UNION
                SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b
              )
         SELECT id AS vec_id, CAST(min(r) AS BIGINT) AS canonical_id,
                (id = min(r)) AS keep
         FROM reach GROUP BY id ORDER BY vec_id""",
    "q_boilerplate" ->
      s"""WITH t AS (SELECT doc_id, source, $toks AS tk FROM documents),
              g AS (SELECT doc_id, source, unnest(list_distinct(list_filter(
                      list_transform(tk, (x, i) -> CASE WHEN i + 4 <= len(tk)
                        THEN x || ' ' || tk[i + 1] || ' ' || tk[i + 2] || ' ' || tk[i + 3] || ' ' || tk[i + 4] END),
                      v -> v IS NOT NULL))) AS gram
                    FROM t),
              f AS (SELECT source, gram, COUNT(*) AS df FROM g GROUP BY source, gram),
              b AS (SELECT source, gram FROM f WHERE df >= 2),
              c AS (SELECT g.doc_id, COUNT(*) AS n_grams,
                           CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
                    FROM g LEFT JOIN b ON g.source = b.source AND g.gram = b.gram
                    GROUP BY g.doc_id)
         -- every corpus doc gets a row: sub-n-token docs have no grams
         -- (n_grams 0, boiler_frac null), mirroring explode_outer
         SELECT d.doc_id,
                CAST(COALESCE(c.n_grams, 0) AS BIGINT) AS n_grams,
                CAST(COALESCE(c.n_boiler, 0) AS BIGINT) AS n_boiler,
                CASE WHEN COALESCE(c.n_grams, 0) > 0
                     THEN CAST(c.n_boiler AS DOUBLE) / CAST(c.n_grams AS DOUBLE) END AS boiler_frac
         FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id ORDER BY d.doc_id""",
    // α=0.5 temperature weights: sqrt is correctly rounded in IEEE 754
    // (pow is not), quantized to integers before the exact
    // normalization sum, one division per row — bit-stable both engines
    "q_mix_alpha" ->
      """WITH s AS (SELECT lang, source,
                           CAST(SUM(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)) AS BIGINT) AS n_tokens
                    FROM documents GROUP BY lang, source),
              q AS (SELECT lang, source, n_tokens,
                           CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS sq_micro
                    FROM s),
              t AS (SELECT CAST(SUM(CAST(sq_micro AS DECIMAL(38,0))) AS DOUBLE) AS tot_sq FROM q)
         SELECT lang, source, n_tokens,
                CAST(sq_micro AS DOUBLE) / t.tot_sq AS p_alpha
         FROM q CROSS JOIN t ORDER BY lang, source""",
    "q_mix_weights" ->
      """WITH s AS (SELECT lang, source, COUNT(*) AS n_docs,
                           CAST(SUM(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)) AS BIGINT) AS n_tokens
                    FROM documents GROUP BY lang, source),
              t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
                           CAST(COUNT(*) AS BIGINT) AS n_groups FROM s)
         SELECT lang, source, n_docs, n_tokens,
                CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE) AS actual_share,
                CASE WHEN n_tokens > 0
                     THEN CAST(tot_tokens AS DOUBLE) / CAST(n_groups * n_tokens AS DOUBLE) END AS weight
         FROM s CROSS JOIN t ORDER BY lang, source""",
    // same three patterns as TextAnalysis.piiScrub, same email->ip->phone order
    "q_pii_scrub" ->
      """SELECT doc_id,
                CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
                CAST(len(regexp_extract_all(text, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
                CAST(len(regexp_extract_all(text, '\+?[0-9][0-9()\- ]{7,}[0-9]')) AS BIGINT) AS n_phones,
                regexp_replace(regexp_replace(regexp_replace(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                  '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
                  '\+?[0-9][0-9()\- ]{7,}[0-9]', '<PHONE>', 'g') AS scrubbed
         FROM documents ORDER BY doc_id""",
    // self k-NN: at gate scale the dispatch is the exact all-pairs path,
    // so brute force IS the ground truth (same fold-order cosine as
    // q_ann_bruteforce — sequential i = 1..len accumulation)
    "q_knn_join" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings),
              c AS (SELECT vec_id AS item_id, CAST(embedding AS DOUBLE[]) AS iv
                    FROM embeddings),
              s AS (SELECT query_id, item_id,
                list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(qv)), i -> qv[i] * iv[i])), (a, x) -> a + x) /
                (sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])), (a, x) -> a + x)) *
                 sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(iv)), i -> iv[i] * iv[i])), (a, x) -> a + x))) AS cos
              FROM q CROSS JOIN c WHERE query_id <> item_id),
              r AS (SELECT query_id, item_id, cos,
                CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, item_id) AS INT) AS rank
              FROM s WHERE NOT isnan(cos))
         SELECT query_id, item_id, cos, rank FROM r WHERE rank <= 3
         ORDER BY query_id, rank""",
    // forced-IVF self k-NN: exhaustive probing (probes = numCells) makes
    // the cell-join candidate set complete, so the Spark result equals
    // brute kNN — every neighbor/cosine/rank re-verified here; the
    // probe-limited well-formedness invariant is computed Spark-side.
    // Same fixed-size gate subset as q_dedup_embed_ivf (flat-cost gate).
    "q_knn_join_ivf" ->
      """WITH g AS (SELECT vec_id, embedding FROM embeddings
                    ORDER BY ((vec_id % 1048576) * 2654435761) % 4294967296, vec_id LIMIT 500),
              q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                    FROM g),
              c AS (SELECT vec_id AS item_id, CAST(embedding AS DOUBLE[]) AS iv
                    FROM g),
              s AS (SELECT query_id, item_id,
                list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(qv)), i -> qv[i] * iv[i])), (a, x) -> a + x) /
                (sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])), (a, x) -> a + x)) *
                 sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(iv)), i -> iv[i] * iv[i])), (a, x) -> a + x))) AS cos
              FROM q CROSS JOIN c WHERE query_id <> item_id),
              r AS (SELECT query_id, item_id, cos,
                CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, item_id) AS INT) AS rank
              FROM s WHERE NOT isnan(cos))
         SELECT query_id, item_id, cos, rank, TRUE AS limited_wellformed_ok
         FROM r WHERE rank <= 3
         ORDER BY query_id, rank""",
    // forced-SPLIT self k-NN (occupancy bounding): everything lands in
    // ONE cell whose occupancy blows the 4×cellTarget threshold, the
    // local re-quantize splits it, and exhaustive sub-cell probing
    // (splitProbes ≥ split width) makes the candidate set complete —
    // so the split+salt+kernel path must equal brute kNN, every
    // neighbor/cosine/rank re-verified here.
    "q_knn_join_split" ->
      """WITH g AS (SELECT vec_id, embedding FROM embeddings
                    ORDER BY ((vec_id % 1048576) * 2654435761) % 4294967296, vec_id LIMIT 500),
              q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                    FROM g),
              c AS (SELECT vec_id AS item_id, CAST(embedding AS DOUBLE[]) AS iv
                    FROM g),
              s AS (SELECT query_id, item_id,
                list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(qv)), i -> qv[i] * iv[i])), (a, x) -> a + x) /
                (sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])), (a, x) -> a + x)) *
                 sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(iv)), i -> iv[i] * iv[i])), (a, x) -> a + x))) AS cos
              FROM q CROSS JOIN c WHERE query_id <> item_id),
              r AS (SELECT query_id, item_id, cos,
                CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, item_id) AS INT) AS rank
              FROM s WHERE NOT isnan(cos))
         SELECT query_id, item_id, cos, rank FROM r WHERE rank <= 3
         ORDER BY query_id, rank""",
    // mutual-kNN clusters: brute ranked pairs in BOTH directions, an
    // edge where each end ranks the other <= 3, recursive-CTE closure
    // seeded from every vector (singletons label themselves)
    "q_knn_clusters" ->
      """WITH RECURSIVE
              q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings),
              c AS (SELECT vec_id AS item_id, CAST(embedding AS DOUBLE[]) AS iv
                    FROM embeddings),
              s AS (SELECT query_id, item_id,
                list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(qv)), i -> qv[i] * iv[i])), (a, x) -> a + x) /
                (sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])), (a, x) -> a + x)) *
                 sqrt(list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(iv)), i -> iv[i] * iv[i])), (a, x) -> a + x))) AS cos
              FROM q CROSS JOIN c WHERE query_id <> item_id),
              r AS (SELECT query_id, item_id,
                CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, item_id) AS INT) AS rank
              FROM s WHERE NOT isnan(cos)),
              e0 AS (SELECT a.query_id AS a, a.item_id AS b
                     FROM r a JOIN r b ON a.query_id = b.item_id AND a.item_id = b.query_id
                     WHERE a.rank <= 3 AND b.rank <= 3 AND a.query_id < a.item_id),
              e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
              reach(id, rt) AS (
                SELECT vec_id, vec_id FROM embeddings
                UNION
                SELECT e.a, reach.rt FROM e JOIN reach ON reach.id = e.b
              )
         SELECT id AS vec_id, CAST(MIN(rt) AS BIGINT) AS cluster_id
         FROM reach GROUP BY id ORDER BY vec_id""",
    // near-dup clusters (recursive-CTE closure, as q_dedup_cluster) keep
    // the highest-quality member, min-id tie-break
    "q_dedup_keep_best" -> {
      val quality = qualityExpr
      s"""WITH RECURSIVE
              t AS (SELECT doc_id, $toks AS tk FROM documents),
              s AS (SELECT doc_id, list_distinct(list_transform(
                      range(1, greatest(len(tk) - 2, 1) + 1),
                      i -> array_to_string(tk[i:i+2], ' '))) AS sh FROM t),
              j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                    FROM s a JOIN s b ON a.doc_id < b.doc_id
                    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                          CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.5),
              e AS (SELECT id_a AS a, id_b AS b FROM j
                    UNION SELECT id_b, id_a FROM j),
              reach(id, r) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b
              ),
              comp AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
                       FROM reach GROUP BY id),
              qual AS (SELECT doc_id, $quality AS q FROM (
                         SELECT doc_id, ' ' || lower(text) || ' ' AS p,
                                CAST(length(text) AS BIGINT) AS nc,
                                CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS words,
                                CAST(len(regexp_extract_all(text, '[.,;:!?''"()\\[\\]{}-]')) AS BIGINT) AS punct
                         FROM documents)),
              m AS (SELECT comp.cluster_id, MAX(qual.q) AS best
                    FROM comp JOIN qual USING (doc_id) GROUP BY comp.cluster_id),
              kp AS (SELECT comp.cluster_id, MIN(comp.doc_id) AS keep_id
                     FROM comp JOIN qual USING (doc_id) JOIN m ON comp.cluster_id = m.cluster_id
                     WHERE qual.q = m.best GROUP BY comp.cluster_id)
         SELECT comp.doc_id, comp.cluster_id, kp.keep_id,
                comp.doc_id = kp.keep_id AS keep
         FROM comp JOIN kp USING (cluster_id) ORDER BY comp.doc_id""" },
    // lift = c_xy·n/(c_x·c_y): doubles before multiplying (both engines),
    // one IEEE mul/div chain — deterministic without logs
    "q_collocations" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
              b AS (SELECT unnest(list_filter(
                      list_transform(tk, (x, i) -> CASE WHEN i < len(tk) THEN struct_pack(w1 := x, w2 := tk[i + 1]) END),
                      g -> g IS NOT NULL)) AS bg
                    FROM t),
              p AS (SELECT bg.w1 AS w1, bg.w2 AS w2, COUNT(*) AS c_xy FROM b GROUP BY 1, 2
                    HAVING COUNT(*) >= 5),
              u AS (SELECT unnest(tk) AS w FROM t),
              uc AS (SELECT w, COUNT(*) AS c_w FROM u GROUP BY w),
              n AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n_tokens FROM uc)
         SELECT p.w1, p.w2, p.c_xy, x.c_w AS c_x, y.c_w AS c_y,
                (CAST(p.c_xy AS DOUBLE) * CAST(n.n_tokens AS DOUBLE)) /
                (CAST(x.c_w AS DOUBLE) * CAST(y.c_w AS DOUBLE)) AS lift
         FROM p JOIN uc x ON p.w1 = x.w JOIN uc y ON p.w2 = y.w CROSS JOIN n
         ORDER BY lift DESC, w1 ASC, w2 ASC LIMIT 20""",
    // quantized-log surprisal (floor(ln·10^6) BIGINT — the BM25
    // discipline): exact integer sums, one final IEEE division
    "q_lm_perplexity" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
              u AS (SELECT doc_id, unnest(tk) AS w FROM t),
              uc AS (SELECT w, COUNT(*) AS c_w FROM u GROUP BY w),
              st AS (SELECT CAST(COALESCE(SUM(c_w), 0) AS BIGINT) AS n_tokens,
                            CAST(COUNT(*) AS BIGINT) AS vocab FROM uc),
              tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM u GROUP BY doc_id, w),
              sc AS (SELECT tf.doc_id,
                       CAST(SUM(tf.tf) AS BIGINT) AS doc_tokens,
                       CAST(SUM(tf.tf * (CAST(FLOOR(ln(CAST(st.n_tokens + st.vocab AS DOUBLE)) * 1000000.0) AS BIGINT)
                                       - CAST(FLOOR(ln(CAST(uc.c_w + 1 AS DOUBLE)) * 1000000.0) AS BIGINT))) AS BIGINT) AS nll_q
                     FROM tf JOIN uc USING (w) CROSS JOIN st GROUP BY tf.doc_id)
         SELECT d.doc_id,
                CAST(COALESCE(sc.doc_tokens, 0) AS BIGINT) AS doc_tokens,
                CAST(sc.nll_q AS DOUBLE) / CAST(sc.doc_tokens * 1000000 AS DOUBLE) AS nll,
                COALESCE(CAST(sc.nll_q AS DOUBLE) / CAST(sc.doc_tokens * 1000000 AS DOUBLE) <= 4.0, FALSE) AS keep
         FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
         ORDER BY d.doc_id""",
    // DSIR importance resampling (Xie et al. 2023): hashed-unigram
    // (24-bit md5 prefix % 4096) target-vs-raw ratio model, add-1
    // smoothed; per-bucket log ratio is ONE ln of ONE division of
    // exact integer products, quantized to micro-nats at the leaf —
    // per-doc sums are exact BIGINT, so top-100 selection is
    // engine-exact (ties broken by doc_id)
    // interpolated Kneser–Ney bigram LM (D = 3/4): each event
    // probability is ONE ratio of exact integers
    // [max(4·c12−3,0)·Nbig + 3·N1p(w1)·Nc(w2)] / (4·c1·Nbig) —
    // self-trained, so c12 ≥ 1 and the max never clips; two
    // quantized-ln leaves per event, exact BIGINT sums, one division
    "q_lm_bigram" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
              b AS (SELECT doc_id, unnest(list_filter(
                      list_transform(tk, (x, i) -> CASE WHEN i < len(tk) THEN struct_pack(w1 := x, w2 := tk[i + 1]) END),
                      g -> g IS NOT NULL)) AS bg
                    FROM t),
              dtf AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2, COUNT(*) AS tf FROM b GROUP BY 1, 2, 3),
              p AS (SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS c12 FROM dtf GROUP BY 1, 2),
              cx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1, CAST(COUNT(*) AS BIGINT) AS n1p FROM p GROUP BY 1),
              cn AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS nc FROM p GROUP BY 1),
              nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nbig FROM p),
              sc AS (SELECT dtf.doc_id,
                       CAST(SUM(dtf.tf) AS BIGINT) AS n_bigrams,
                       CAST(SUM(dtf.tf * (
                         CAST(FLOOR(ln(CAST(4 * cx.c1 * nb.nbig AS DOUBLE)) * 1000000.0) AS BIGINT)
                         - CAST(FLOOR(ln(CAST((4 * p.c12 - 3) * nb.nbig + 3 * cx.n1p * cn.nc AS DOUBLE)) * 1000000.0) AS BIGINT)
                       )) AS BIGINT) AS nll_q
                     FROM dtf JOIN p USING (w1, w2) JOIN cx USING (w1) JOIN cn USING (w2) CROSS JOIN nb
                     GROUP BY dtf.doc_id)
         SELECT d.doc_id,
                CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                CAST(sc.nll_q AS DOUBLE) / CAST(sc.n_bigrams * 1000000 AS DOUBLE) AS nll,
                COALESCE(CAST(sc.nll_q AS DOUBLE) / CAST(sc.n_bigrams * 1000000 AS DOUBLE) <= 3.39, FALSE) AS keep
         FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
         ORDER BY d.doc_id""",
    "q_dsir_select" -> dsirSelectSql,
    // serving from the persisted model (Dsir.scoreWithModel) is exactly
    // the inline fit+select — the stored quantized ratios ARE the
    // inline ones and every raw-pool bucket is in the table
    "q_dsir_served" -> dsirSelectSql,
    // streaming scoring twin: same model CTEs, window-scoped scores
    "q_stream_dsir" -> dsirStreamSql,
    "q_stream_dsir_update" -> dsirUpdateStreamSql,
    // the incrementally-refreshed model (fit half + update half) must
    // serve EXACTLY the full-corpus model — same oracle by design
    "q_dsir_updated" -> dsirSelectSql,
    // hashed-unigram multinomial NB source classifier: same 24-bit md5
    // buckets and floor(1e6·ln(one-exact-division)) leaf discipline as
    // DSIR, per-class add-1 smoothing, doc-count prior, argmax with
    // label-asc ties
    "q_nb_classify" ->
      s"""WITH base AS (SELECT doc_id, source AS label,
                               CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 2 = 0 AS is_train,
                               $toks AS tk
                        FROM documents),
              u AS (SELECT doc_id, label, is_train, unnest(tk) AS w FROM base),
              ub AS (SELECT doc_id, label, is_train,
                       CAST(CONCAT('0x', substr(md5(w), 1, 6)) AS BIGINT) % 4096 AS bucket
                     FROM u),
              cc AS (SELECT label, bucket, CAST(COUNT(*) AS BIGINT) AS c
                     FROM ub WHERE is_train AND label IS NOT NULL GROUP BY 1, 2),
              cd AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS dk
                     FROM base WHERE is_train AND label IS NOT NULL GROUP BY 1),
              tot AS (SELECT CAST(SUM(dk) AS BIGINT) AS d FROM cd),
              cls AS (SELECT cd.label, COALESCE(nk, 0) AS nk,
                        CAST(FLOOR(ln(CAST(dk AS DOUBLE) / CAST(d AS DOUBLE)) * 1000000.0) AS BIGINT) AS prior_q
                      FROM cd
                      LEFT JOIN (SELECT label, CAST(SUM(c) AS BIGINT) AS nk FROM cc GROUP BY 1) n
                        ON n.label = cd.label
                      CROSS JOIN tot),
              tf AS (SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS tf
                     FROM ub WHERE NOT is_train GROUP BY 1, 2),
              ts AS (SELECT tf.doc_id, cls.label,
                       CAST(SUM(tf.tf * CAST(FLOOR(ln(
                         CAST(COALESCE(cc.c, 0) + 1 AS DOUBLE) /
                         CAST(cls.nk + 4096 AS DOUBLE)) * 1000000.0) AS BIGINT)) AS BIGINT) AS tok_q,
                       CAST(SUM(tf.tf) AS BIGINT) AS n_tokens
                     FROM tf CROSS JOIN cls
                     LEFT JOIN cc ON cc.label = cls.label AND cc.bucket = tf.bucket
                     GROUP BY 1, 2),
              scored AS (SELECT b.doc_id, cls.label,
                           cls.prior_q + COALESCE(ts.tok_q, 0) AS score_q,
                           COALESCE(ts.n_tokens, 0) AS n_tokens
                         FROM (SELECT doc_id FROM base WHERE NOT is_train) b
                         CROSS JOIN cls
                         LEFT JOIN ts ON ts.doc_id = b.doc_id AND ts.label = cls.label),
              rk AS (SELECT doc_id, label, score_q, n_tokens,
                       ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score_q DESC, label ASC) AS rn
                     FROM scored)
         SELECT doc_id, label AS pred, score_q,
                CAST(score_q AS DOUBLE) / 1000000.0 AS score, n_tokens
         FROM rk WHERE rn = 1 ORDER BY doc_id""",
    // Morton key re-derived from the SAME five spread constants as
    // graft.operators.ZOrder (generated, not hand-copied); DuckDB's
    // lateral column aliases let the step chain live in one SELECT
    "q_zorder" ->
      s"""WITH e AS (SELECT user_id,
                       CAST(FLOOR(FLOOR(epoch(ts)) / 86400.0) AS BIGINT) AS day
                     FROM events),
              k AS (SELECT user_id, day,
                      (user_id & 2097151) AS xa,
                      (day & 2097151) AS xb,
                      ${graft.operators.ZOrder.spreadSqlSteps("xa", "za").mkString(",\n                      ")},
                      ${graft.operators.ZOrder.spreadSqlSteps("xb", "zb").mkString(",\n                      ")},
                      (za_s4 | (zb_s4 << 1)) AS zkey
                    FROM e)
         SELECT zkey >> 10 AS zcell, COUNT(*) AS n_rows,
                MIN(user_id) AS u_min, MAX(user_id) AS u_max,
                MIN(day) AS d_min, MAX(day) AS d_max,
                MIN(zkey) AS z_min, MAX(zkey) AS z_max
         FROM k GROUP BY 1 ORDER BY zcell""",
    // the ln-quantization drift canary: the identical leaf form every
    // quantized-surprisal gate rests on — floor(1e6 · ln(one IEEE
    // division of exact integers)) — swept over a dense deterministic
    // grid in DuckDB's libm; divergence from the JDK's Math.log at any
    // floor boundary reds THIS row by name instead of a DSIR/NB/LM gate
    "q_ln_quant_canary" ->
      """WITH g AS (SELECT id, (id * 48271) % 99991 + 1 AS den
                    FROM range(1, 65537) t(id))
         SELECT id, den,
                CAST(FLOOR(ln(CAST(id AS DOUBLE) / CAST(den AS DOUBLE)) * 1000000.0) AS BIGINT) AS ratio_q,
                CAST(FLOOR(ln(CAST(id AS DOUBLE)) * 1000000.0) AS BIGINT) AS int_q,
                CAST(FLOOR(ln(CAST(id AS DOUBLE) / CAST(id + 1 AS DOUBLE)) * 1000000.0) AS BIGINT) AS adj_q
         FROM g ORDER BY id""",
    // OFD item-name mojibake repair: identical broken-string
    // construction + the identical replace chain (the replacement
    // table is data — reference yupana-utils OfdItemFixer.scala:22-29)
    "q_item_fix" ->
      """WITH b AS (SELECT doc_id,
                      '┬л' || substr(text, 1, 40) || '┬╗ ╣' ||
                      CAST(doc_id % 10 AS VARCHAR) || ' г╕ссер' AS broken
                    FROM documents)
         SELECT doc_id, broken,
                replace(replace(replace(replace(broken,
                  '┬л', '"'), '┬╗', '"'), '╕', 'ё'), '╣', '№') AS fixed
         FROM b ORDER BY doc_id""",
    // the result-cache gate's probe aggregation, recomputed directly:
    // the Spark side serves the SECOND execution from the parquet
    // result cache, so hash-equality here proves a cache hit is
    // bit-identical to recompute (decimal-exact sum, double at the end)
    "q_result_cached" ->
      """SELECT o_orderpriority,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                COUNT(*) AS cnt
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""
  )

  // COALESCE mirrors Dsir.featureCounts' null-flag rule: a NULL source
  // is raw pool on both sides, so the gate cannot diverge on null rows
  /** DSIR model CTEs over the docs matching `corpusPred`: the
    * hashed-unigram bucket counts, totals, and quantized ratio table —
    * ONE copy of the model arithmetic, shared by every DSIR gate
    * (batch select/serve, streaming scoring, streaming model refresh)
    * so it cannot drift between them. Ends at the `r`/`tot` CTEs. */
  private def dsirModelCtes(corpusPred: String): String =
      s"""WITH t AS (SELECT doc_id, COALESCE(source = 'src0', FALSE) AS is_t, $toks AS tk
                     FROM documents WHERE $corpusPred),
              u AS (SELECT doc_id, is_t, unnest(tk) AS w FROM t),
              ub AS (SELECT doc_id, is_t,
                       CAST(CONCAT('0x', substr(md5(w), 1, 6)) AS BIGINT) % 4096 AS bucket
                     FROM u),
              bc AS (SELECT bucket,
                       CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
                       CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS cr
                     FROM ub GROUP BY bucket),
              tot AS (SELECT CAST(COALESCE(SUM(ct), 0) AS BIGINT) AS nt,
                             CAST(COALESCE(SUM(cr), 0) AS BIGINT) AS nr FROM bc),
              r AS (SELECT bucket,
                      CAST(FLOOR(ln(
                        (CAST(ct + 1 AS DOUBLE) * CAST(nr + 4096 AS DOUBLE)) /
                        (CAST(cr + 1 AS DOUBLE) * CAST(nt + 4096 AS DOUBLE))) * 1000000.0) AS BIGINT) AS ratio_q
                    FROM bc CROSS JOIN tot)"""

  /** The model CTEs plus per-doc quantized scores over the raw-pool
    * docs matching `scoredPred` — the batch select/serve gates and the
    * streaming scoring twin. */
  private def dsirScored(scoredPred: String): String =
      s"""${dsirModelCtes("TRUE")},
              tfb AS (SELECT doc_id, bucket, COUNT(*) AS tf FROM ub
                      WHERE $scoredPred GROUP BY doc_id, bucket),
              sc AS (SELECT tfb.doc_id,
                       CAST(SUM(tfb.tf) AS BIGINT) AS doc_tokens,
                       CAST(SUM(tfb.tf * r.ratio_q) AS BIGINT) AS logw_q
                     FROM tfb JOIN r USING (bucket) GROUP BY tfb.doc_id)"""

  /** Streaming DSIR model-refresh twin: the from-scratch ratio model
    * over the bounded window — the Spark side must land the identical
    * table through base-fit + two streamed Dsir.update folds. */
  private[graft] lazy val dsirUpdateStreamSql =
      s"""${dsirModelCtes("doc_id < 1200")}
         SELECT r.bucket, r.ratio_q, tot.nt, tot.nr
         FROM r CROSS JOIN tot ORDER BY r.bucket"""

  private lazy val dsirSelectSql =
      s"""${dsirScored("NOT is_t")},
              rk AS (SELECT doc_id, doc_tokens, logw_q,
                       ROW_NUMBER() OVER (ORDER BY logw_q DESC, doc_id ASC) AS rank
                     FROM sc)
         SELECT doc_id, doc_tokens, logw_q,
                CAST(logw_q AS DOUBLE) / 1000000.0 AS logw,
                CAST(rank AS INT) AS rank
         FROM rk WHERE rank <= 100 ORDER BY rank"""

  /** Streaming DSIR scoring twin: every raw-pool doc in the bounded
    * window scored against the same full-corpus model, with the
    * minLogw=0 keep decision — engine-exact as logw_q >= 0. */
  private[graft] lazy val dsirStreamSql =
      s"""${dsirScored("NOT is_t AND doc_id < 2000")}
         SELECT doc_id, doc_tokens, logw_q,
                CAST(logw_q AS DOUBLE) / 1000000.0 AS logw,
                logw_q >= 0 AS keep
         FROM sc ORDER BY doc_id"""
}
