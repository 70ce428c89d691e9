package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Advanced, Corpus, Dedup, Multimodal, Prep, Quality, Relational, Similarity, TextAnalysis, Warehouse}
import graft.sources.Tables

/** Quality family: `SparkEntry.queries` registrations + their DuckDB
  * oracles (round-17 verdict task 6 — the 8k-line single-file registry
  * split per family; `SparkEntry` folds every family back into the one
  * driver-contract map, and OracleCoverageSpec still guards that every
  * query has its oracle).
  */
private[graft] object QualityEntries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q95_fk_integrity" -> (Quality.fkIntegrity _),
    "q96_column_profile" -> (Quality.columnProfile _),
    "q126_winsorized_length" -> ((s, d) => Quality.winsorizedLength(s, d)),
    "q127_length_mad" -> ((s, d) => Quality.lengthMad(s, d)),
    "q128_benford_audit" -> ((s, d) => Quality.benfordAudit(s, d)),
    "q138_order_reconciliation" -> ((s, d) => Quality.orderReconciliation(s, d)),
    "q141_five_number" -> ((s, d) => Quality.fiveNumber(s, d)),
    "q142_iqr_outliers" -> ((s, d) => Quality.iqrOutliers(s, d)),
    "q143_contingency" -> ((s, d) => Quality.contingency(s, d)),
    "q202_contract_monitor" -> ((s, d) => Quality.contractMonitor(s, d)),
    "q207_drift_monitor" -> ((s, d) => Quality.driftMonitor(s, d)),
    "q209_daily_uniques" -> ((s, d) => Quality.dailyUniques(s, d)),
    "q219_skew_profile" -> ((s, d) => Quality.skewProfile(s, d)),
    "q220_join_cardinality" -> ((s, d) => Quality.joinCardinality(s, d)),
    "q238_key_overlap" -> ((s, d) => Quality.keyOverlapSketch(s, d)),
    "q239_price_quantile_sketch" -> ((s, d) => Quality.priceQuantileSketch(s, d)),
    "q240_daily_value_quantiles" -> ((s, d) => Quality.dailyValueQuantiles(s, d)),
    "q241_mass_estimate" -> ((s, d) => Quality.massEstimate(s, d)),
    "q244_source_ols" -> ((s, d) => Quality.sourceOlsFit(s, d)),
    "q246_score_auc" -> ((s, d) => Quality.scoreAuc(s, d)),
    "q247_calibration_bins" -> ((s, d) => Quality.calibrationBins(s, d)),
    "q252_youden_threshold" -> ((s, d) => Quality.youdenThreshold(s, d)),
    "q256_decile_lift" -> ((s, d) => Quality.decileLift(s, d)),
    "q262_kappa_agreement" -> ((s, d) => Quality.kappaAgreement(s, d)),
    "q268_neyman_alloc" -> ((s, d) => Quality.neymanAllocation(s, d)),
    "q273_signal_agreement" -> ((s, d) => Quality.signalAgreement(s, d)),
    "q282_k_anonymity" -> ((s, d) => Quality.kAnonymityAudit(s, d)),
    "q290_isotonic_rate" -> ((s, d) => Quality.isotonicCalibration(s, d)),
  )

  def oracleSql: Map[String, String] = Map(

    // q95: each FK edge is a left join against the distinct parent keys;
    // relation labels match the Scala literals exactly.
    "q95_fk_integrity" ->
      """SELECT 'lineitem.l_orderkey->orders' AS relation, COUNT(*) AS n_child,
        |  CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan
        |FROM lineitem c LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) p
        |  ON c.l_orderkey = p.k
        |UNION ALL
        |SELECT 'lineitem.l_partkey->part', COUNT(*),
        |  CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |FROM lineitem c LEFT JOIN (SELECT DISTINCT p_partkey AS k FROM part) p
        |  ON c.l_partkey = p.k
        |UNION ALL
        |SELECT 'lineitem.l_suppkey->supplier', COUNT(*),
        |  CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |FROM lineitem c LEFT JOIN (SELECT DISTINCT s_suppkey AS k FROM supplier) p
        |  ON c.l_suppkey = p.k
        |UNION ALL
        |SELECT 'orders.o_custkey->customer', COUNT(*),
        |  CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders c LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) p
        |  ON c.o_custkey = p.k
        |UNION ALL
        |SELECT 'customer.c_nationkey->nation', COUNT(*),
        |  CAST(SUM(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |FROM customer c LEFT JOIN (SELECT DISTINCT n_nationkey AS k FROM nation) p
        |  ON c.c_nationkey = p.k""".stripMargin,

    // q96: per-column profile; min/max computed on the native type and
    // stringified only in the output, mirroring the Spark side.
    "q96_column_profile" ->
      """SELECT 'doc_id' AS col_name, COUNT(*) AS n_rows, COUNT(doc_id) AS n_nonnull,
        |  COUNT(DISTINCT doc_id) AS n_distinct,
        |  CAST(MIN(doc_id) AS VARCHAR) AS min_val, CAST(MAX(doc_id) AS VARCHAR) AS max_val
        |FROM documents
        |UNION ALL
        |SELECT 'lang', COUNT(*), COUNT(lang), COUNT(DISTINCT lang),
        |  CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR) FROM documents
        |UNION ALL
        |SELECT 'source', COUNT(*), COUNT(source), COUNT(DISTINCT source),
        |  CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR) FROM documents
        |UNION ALL
        |SELECT 'n_chars', COUNT(*), COUNT(n_chars), COUNT(DISTINCT n_chars),
        |  CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR) FROM documents
        |UNION ALL
        |SELECT 'text', COUNT(*), COUNT(text), COUNT(DISTINCT text),
        |  CAST(MIN(text) AS VARCHAR), CAST(MAX(text) AS VARCHAR) FROM documents""".stripMargin,

    // q126: identical integral percentile ranks and decimal-routed mean.
    "q126_winsorized_length" ->
      """WITH r AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, source, n_chars, rn, n,
        |    (5 * n + 99) // 100 AS lo_rank, (95 * n + 99) // 100 AS hi_rank
        |  FROM r
        |), v AS (
        |  SELECT source, n_chars,
        |    MAX(CASE WHEN rn = lo_rank THEN n_chars END) OVER (PARTITION BY source) AS lo_val,
        |    MAX(CASE WHEN rn = hi_rank THEN n_chars END) OVER (PARTITION BY source) AS hi_val
        |  FROM b
        |)
        |SELECT source, COUNT(*) AS n, MAX(lo_val) AS lo_val, MAX(hi_val) AS hi_val,
        |  CAST(SUM(CAST(GREATEST(LEAST(n_chars, hi_val), lo_val) AS DECIMAL(18,0))) AS DOUBLE)
        |    / COUNT(*) AS wins_mean
        |FROM v GROUP BY 1""".stripMargin,

    // q127: the same two nearest-rank picks over one partitioning.
    "q127_length_mad" ->
      """WITH r AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n
        |  FROM documents
        |), m AS (
        |  SELECT doc_id, lang, n_chars, rn, n,
        |    MAX(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) OVER (PARTITION BY lang) AS med
        |  FROM r
        |), d AS (
        |  SELECT doc_id, lang, n, med, ABS(n_chars - med) AS dev FROM m
        |), dr AS (
        |  SELECT lang, n, med, dev,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY dev, doc_id) AS BIGINT) AS drn
        |  FROM d
        |), md AS (
        |  SELECT lang, med,
        |    MAX(CASE WHEN drn = (n + 1) // 2 THEN dev END) OVER (PARTITION BY lang) AS mad
        |  FROM dr
        |)
        |SELECT lang, COUNT(*) AS n, MAX(med) AS median_chars, MAX(mad) AS mad_chars
        |FROM md GROUP BY 1""".stripMargin,

    // q128: digit from the cents integer's string form; expected shares
    // as spelled-out literals (no engine-side log).
    "q128_benford_audit" ->
      """WITH d AS (
        |  SELECT o_orderpriority AS priority,
        |    CAST(SUBSTR(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders
        |), c AS (
        |  SELECT priority, digit, COUNT(*) AS n FROM d GROUP BY 1, 2
        |), t AS (
        |  SELECT priority, digit, n, SUM(n) OVER (PARTITION BY priority) AS n_prio FROM c
        |)
        |SELECT priority, digit, n,
        |  CASE digit WHEN 1 THEN 0.30102999566398120e0 WHEN 2 THEN 0.17609125905568124e0
        |    WHEN 3 THEN 0.12493873660829993e0 WHEN 4 THEN 0.09691001300805642e0
        |    WHEN 5 THEN 0.07918124604762482e0 WHEN 6 THEN 0.06694678963061322e0
        |    WHEN 7 THEN 0.05799194697768673e0 WHEN 8 THEN 0.05115252244738129e0
        |    WHEN 9 THEN 0.04575749056067514e0 END * CAST(n_prio AS DOUBLE) AS expected
        |FROM t""".stripMargin,

    // q138: identical integer-cents header/detail comparison; orderless
    // orders reconcile against zero via the left join + coalesce.
    "q138_order_reconciliation" ->
      """WITH ls AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS line_c
        |  FROM lineitem GROUP BY 1
        |), j AS (
        |  SELECT o_orderpriority AS priority,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS total_c,
        |    COALESCE(line_c, 0) AS line_c
        |  FROM orders LEFT JOIN ls ON o_orderkey = l_orderkey
        |)
        |SELECT priority, COUNT(*) AS n_orders,
        |  COUNT(*) FILTER (ABS(total_c - line_c) > 0) AS n_mismatched,
        |  CAST(MAX(ABS(total_c - line_c)) AS BIGINT) AS max_drift_c,
        |  CAST(SUM(ABS(total_c - line_c)) AS BIGINT) AS total_drift_c
        |FROM j GROUP BY 1""".stripMargin,

    // q141: identical integral nearest-rank quartiles in cents.
    "q141_five_number" ->
      """WITH j AS (
        |  SELECT c_mktsegment AS segment, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |), r AS (
        |  SELECT segment, cents,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY segment ORDER BY cents, o_orderkey) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY segment) AS BIGINT) AS n
        |  FROM j
        |)
        |SELECT segment, COUNT(*) AS n, MIN(cents) AS min_c,
        |  MAX(CASE WHEN rn = (25 * n + 99) // 100 THEN cents END) AS p25_c,
        |  MAX(CASE WHEN rn = (50 * n + 99) // 100 THEN cents END) AS p50_c,
        |  MAX(CASE WHEN rn = (75 * n + 99) // 100 THEN cents END) AS p75_c,
        |  MAX(cents) AS max_c
        |FROM r GROUP BY 1""".stripMargin,

    // q142: the same doubled-cents integer fences.
    "q142_iqr_outliers" ->
      """WITH j AS (
        |  SELECT c_mktsegment AS segment, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |), r AS (
        |  SELECT segment, cents,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY segment ORDER BY cents, o_orderkey) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY segment) AS BIGINT) AS n
        |  FROM j
        |), q AS (
        |  SELECT segment AS qseg,
        |    MAX(CASE WHEN rn = (25 * n + 99) // 100 THEN cents END) AS p25_c,
        |    MAX(CASE WHEN rn = (75 * n + 99) // 100 THEN cents END) AS p75_c
        |  FROM r GROUP BY 1
        |)
        |SELECT segment, COUNT(*) AS n,
        |  COUNT(*) FILTER (cents * 2 < p25_c * 2 - (p75_c - p25_c) * 3) AS n_low,
        |  COUNT(*) FILTER (cents * 2 > p75_c * 2 + (p75_c - p25_c) * 3) AS n_high
        |FROM j JOIN q ON segment = qseg GROUP BY 1""".stripMargin,

    // q143: exact marginals; expected/residual as the same per-cell
    // three-op double chain (no order-dependent chi-square total).
    "q143_contingency" ->
      """WITH cells AS (
        |  SELECT c_mktsegment AS segment, o_orderpriority AS priority,
        |    COUNT(*) AS o
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2
        |), m AS (
        |  SELECT segment, priority, o,
        |    CAST(SUM(o) OVER (PARTITION BY segment) AS BIGINT) AS r,
        |    CAST(SUM(o) OVER (PARTITION BY priority) AS BIGINT) AS c,
        |    CAST(SUM(o) OVER () AS BIGINT) AS n
        |  FROM cells
        |)
        |SELECT segment, priority, o, r, c,
        |  CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE) AS expected,
        |  (CAST(o AS DOUBLE) - CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE))
        |    / sqrt(CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE)) AS residual
        |FROM m""".stripMargin,

    // q202: the streaming quality monitor's batch twin — 15-minute
    // tumbling buckets (time_bucket aligns with Spark's window() for
    // sub-day intervals) with per-clause violation counts.
    "q202_contract_monitor" ->
      """SELECT time_bucket(INTERVAL '15 minutes', ts) AS w_start,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative_value,
        |  CAST(SUM(CASE WHEN event_type NOT IN ('view', 'click', 'purchase', 'signup') THEN 1 ELSE 0 END) AS BIGINT) AS n_unknown_type
        |FROM events GROUP BY 1""".stripMargin,

    // q207: windowed distribution-drift monitor (batch twin of
    // StreamingOps.driftMonitor). Fixed type vocabulary + other bucket;
    // TV numerator in HUGEINT (Spark side: DECIMAL(38,0)), one
    // correctly-rounded final division.
    "q207_drift_monitor" ->
      """WITH base AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS b_view,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS b_click,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS b_purchase,
        |    CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS b_signup,
        |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS b_error,
        |    CAST(SUM(CASE WHEN event_type NOT IN ('view', 'click', 'purchase', 'signup', 'error') THEN 1 ELSE 0 END) AS BIGINT) AS b_other,
        |    COUNT(*) AS n_base
        |  FROM events
        |), win AS (
        |  SELECT time_bucket(INTERVAL '15 minutes', ts) AS w_start,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS c_view,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c_click,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS c_purchase,
        |    CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS c_signup,
        |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS c_error,
        |    CAST(SUM(CASE WHEN event_type NOT IN ('view', 'click', 'purchase', 'signup', 'error') THEN 1 ELSE 0 END) AS BIGINT) AS c_other,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1
        |)
        |SELECT w_start, n_events,
        |  CAST(
        |      abs(CAST(c_view AS HUGEINT) * n_base - CAST(b_view AS HUGEINT) * n_events)
        |    + abs(CAST(c_click AS HUGEINT) * n_base - CAST(b_click AS HUGEINT) * n_events)
        |    + abs(CAST(c_purchase AS HUGEINT) * n_base - CAST(b_purchase AS HUGEINT) * n_events)
        |    + abs(CAST(c_signup AS HUGEINT) * n_base - CAST(b_signup AS HUGEINT) * n_events)
        |    + abs(CAST(c_error AS HUGEINT) * n_base - CAST(b_error AS HUGEINT) * n_events)
        |    + abs(CAST(c_other AS HUGEINT) * n_base - CAST(b_other AS HUGEINT) * n_events)
        |  AS DOUBLE) / (2.0 * CAST(n_events AS DOUBLE) * CAST(n_base AS DOUBLE)) AS tv
        |FROM win CROSS JOIN base""".stripMargin,

    // q209: daily distinct-actives via the q42 KMV idiom — k=64 smallest
    // distinct 48-bit md5 hashes per day; exact below k, the
    // (k-1)<<48 / h_k inversion (17732923532771328 = 63<<48) above.
    "q209_daily_uniques" ->
      """WITH hx AS (
        |  SELECT DISTINCT time_bucket(INTERVAL '1 day', ts) AS w_start,
        |    md5(CAST(user_id AS VARCHAR)) AS m
        |  FROM events
        |), hh AS (
        |  SELECT DISTINCT w_start,
        |    SUM(((instr('0123456789abcdef', substr(m, CAST(j + 1 AS INT), 1)) - 1)::BIGINT) << CAST((11 - j) * 4 AS INT)) AS h
        |  FROM hx, range(0, 12) r(j) GROUP BY w_start, m
        |), kt AS (
        |  SELECT w_start, h, row_number() OVER (PARTITION BY w_start ORDER BY h) AS rn,
        |         COUNT(*) OVER (PARTITION BY w_start) AS nd
        |  FROM hh
        |), ndv AS (
        |  SELECT w_start,
        |    CAST(CASE WHEN MAX(nd) < 64 THEN MAX(nd)
        |         ELSE 17732923532771328 // MAX(CASE WHEN rn = 64 THEN h END) END AS BIGINT) AS ndv_users
        |  FROM kt GROUP BY w_start
        |), cnt AS (
        |  SELECT time_bucket(INTERVAL '1 day', ts) AS w_start, COUNT(*) AS n_events
        |  FROM events GROUP BY 1
        |)
        |SELECT c.w_start, c.n_events, n.ndv_users
        |FROM cnt c JOIN ndv n ON n.w_start = c.w_start""".stripMargin,

    "q219_skew_profile" ->
      """WITH counts AS (
        |  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1
        |), totals AS (
        |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, COUNT(*) AS n_keys FROM counts
        |)
        |SELECT c.user_id, c.cnt AS n_rows_key, t.n_rows, t.n_keys,
        |  CAST(c.cnt AS DOUBLE) / CAST(t.n_rows AS DOUBLE) AS row_share,
        |  CAST(c.cnt AS DOUBLE) / CAST(t.n_rows AS DOUBLE) * CAST(t.n_keys AS DOUBLE) AS skew_factor
        |FROM (SELECT * FROM counts ORDER BY cnt DESC, user_id LIMIT 10) c
        |CROSS JOIN totals t""".stripMargin,

    "q220_join_cardinality" ->
      """WITH lc AS (
        |  SELECT user_id AS key, COUNT(*) AS cnt_left FROM events GROUP BY 1
        |), rc AS (
        |  SELECT o_custkey AS key, COUNT(*) AS cnt_right FROM orders GROUP BY 1
        |), contrib AS (
        |  SELECT lc.key, cnt_left, cnt_right, cnt_left * cnt_right AS contribution
        |  FROM lc JOIN rc USING (key)
        |), totals AS (
        |  SELECT CAST(SUM(contribution) AS BIGINT) AS est_rows,
        |         COUNT(*) AS n_join_keys FROM contrib
        |)
        |SELECT c.key, c.cnt_left, c.cnt_right, c.contribution,
        |  t.est_rows, t.n_join_keys,
        |  CAST(c.contribution AS DOUBLE) / CAST(t.est_rows AS DOUBLE) AS share
        |FROM (SELECT * FROM contrib ORDER BY contribution DESC, key LIMIT 10) c
        |CROSS JOIN totals t""".stripMargin,

    // q238: KMV key-overlap sketches — the q209 min-k idiom on both key
    // populations plus their union, inclusion-exclusion overlap, exact
    // below k=64, the 63<<48 inversion above.
    "q238_key_overlap" ->
      """WITH hx AS (
        |  SELECT DISTINCT 'a' AS side, md5(CAST(o_custkey AS VARCHAR)) AS m FROM orders
        |  WHERE o_custkey IS NOT NULL
        |  UNION
        |  SELECT DISTINCT 'b', md5(CAST(user_id AS VARCHAR)) FROM events
        |  WHERE user_id IS NOT NULL
        |), hh AS (
        |  SELECT side, m,
        |    SUM(((instr('0123456789abcdef', substr(m, CAST(j + 1 AS INT), 1)) - 1)::BIGINT) << CAST((11 - j) * 4 AS INT)) AS h
        |  FROM hx, range(0, 12) r(j) GROUP BY side, m
        |), ka AS (
        |  SELECT h, row_number() OVER (ORDER BY h) AS rn, COUNT(*) OVER () AS nd
        |  FROM hh WHERE side = 'a'
        |), kb AS (
        |  SELECT h, row_number() OVER (ORDER BY h) AS rn, COUNT(*) OVER () AS nd
        |  FROM hh WHERE side = 'b'
        |), ku AS (
        |  SELECT h, row_number() OVER (ORDER BY h) AS rn, COUNT(*) OVER () AS nd
        |  FROM (SELECT DISTINCT h FROM hh)
        |), est AS (
        |  SELECT
        |    (SELECT CAST(CASE WHEN MAX(nd) < 64 THEN MAX(nd)
        |       ELSE 17732923532771328 // MAX(CASE WHEN rn = 64 THEN h END) END AS BIGINT) FROM ka) AS ndv_a,
        |    (SELECT CAST(CASE WHEN MAX(nd) < 64 THEN MAX(nd)
        |       ELSE 17732923532771328 // MAX(CASE WHEN rn = 64 THEN h END) END AS BIGINT) FROM kb) AS ndv_b,
        |    (SELECT CAST(CASE WHEN MAX(nd) < 64 THEN MAX(nd)
        |       ELSE 17732923532771328 // MAX(CASE WHEN rn = 64 THEN h END) END AS BIGINT) FROM ku) AS ndv_union
        |), ov AS (
        |  SELECT ndv_a, ndv_b, ndv_union,
        |    GREATEST(CAST(0 AS BIGINT), ndv_a + ndv_b - ndv_union) AS ndv_overlap
        |  FROM est
        |)
        |SELECT ndv_a, ndv_b, ndv_union, ndv_overlap,
        |  CAST(ndv_overlap AS DOUBLE) / nullif(CAST(ndv_a AS DOUBLE), 0.0) AS containment_a,
        |  CAST(ndv_overlap AS DOUBLE) / nullif(CAST(ndv_b AS DOUBLE), 0.0) AS containment_b,
        |  CAST(ndv_overlap AS DOUBLE) / nullif(CAST(ndv_union AS DOUBLE), 0.0) AS jaccard
        |FROM ov""".stripMargin,

    // q239: mergeable quantile sketch — bottom-k row sample keyed by the
    // md5-derived 48-bit hash of the (orderkey, linenumber) identity,
    // k=256 smallest DISTINCT (h, v) pairs per flag, nearest-rank picks
    // over the sample's value order in pure integer arithmetic.
    "q239_price_quantile_sketch" ->
      """WITH rws AS (
        |  SELECT l_returnflag AS flag,
        |    md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)) AS mm,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM lineitem
        |), hh AS (
        |  SELECT flag, v,
        |    SUM(((instr('0123456789abcdef', substr(mm, CAST(j + 1 AS INT), 1)) - 1)::BIGINT) << CAST((11 - j) * 4 AS INT)) AS h
        |  FROM rws, range(0, 12) r(j) GROUP BY flag, mm, v
        |), dist AS (
        |  SELECT DISTINCT flag, h, v FROM hh
        |), samp AS (
        |  SELECT flag, v, row_number() OVER (PARTITION BY flag ORDER BY h, v) AS rn
        |  FROM dist
        |), kept AS (
        |  SELECT flag, v,
        |    row_number() OVER (PARTITION BY flag ORDER BY v) AS vr,
        |    COUNT(*) OVER (PARTITION BY flag) AS m
        |  FROM samp WHERE rn <= 256
        |), tot AS (
        |  SELECT l_returnflag AS flag, COUNT(*) AS n_rows FROM lineitem GROUP BY 1
        |)
        |SELECT t.flag, t.n_rows, CAST(MAX(k.m) AS BIGINT) AS sample_n,
        |  MAX(CASE WHEN vr = (m + 1) // 2 THEN v END) AS p50_c,
        |  MAX(CASE WHEN vr = (9 * m + 9) // 10 THEN v END) AS p90_c,
        |  MAX(CASE WHEN vr = (99 * m + 99) // 100 THEN v END) AS p99_c
        |FROM kept k JOIN tot t ON k.flag = t.flag
        |GROUP BY t.flag, t.n_rows""".stripMargin,

    // q240: the same sketch per tumbling day over event values — the
    // registered batch twin of StreamingOps.quantileMonitor (the q209
    // twin discipline), identity = event_id.
    "q240_daily_value_quantiles" ->
      """WITH rws AS (
        |  SELECT time_bucket(INTERVAL '1 day', ts) AS w_start,
        |    md5(CAST(event_id AS VARCHAR)) AS mm,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM events
        |), hh AS (
        |  SELECT w_start, v,
        |    SUM(((instr('0123456789abcdef', substr(mm, CAST(j + 1 AS INT), 1)) - 1)::BIGINT) << CAST((11 - j) * 4 AS INT)) AS h
        |  FROM rws, range(0, 12) r(j) GROUP BY w_start, mm, v
        |), dist AS (
        |  SELECT DISTINCT w_start, h, v FROM hh
        |), samp AS (
        |  SELECT w_start, v, row_number() OVER (PARTITION BY w_start ORDER BY h, v) AS rn
        |  FROM dist
        |), kept AS (
        |  SELECT w_start, v,
        |    row_number() OVER (PARTITION BY w_start ORDER BY v) AS vr,
        |    COUNT(*) OVER (PARTITION BY w_start) AS m
        |  FROM samp WHERE rn <= 256
        |), tot AS (
        |  SELECT time_bucket(INTERVAL '1 day', ts) AS w_start, COUNT(*) AS n_events
        |  FROM events GROUP BY 1
        |)
        |SELECT t.w_start, t.n_events, CAST(MAX(k.m) AS BIGINT) AS sample_n,
        |  MAX(CASE WHEN vr = (m + 1) // 2 THEN v END) AS p50_c,
        |  MAX(CASE WHEN vr = (9 * m + 9) // 10 THEN v END) AS p90_c,
        |  MAX(CASE WHEN vr = (99 * m + 99) // 100 THEN v END) AS p99_c
        |FROM kept k JOIN tot t ON k.w_start = t.w_start
        |GROUP BY t.w_start, t.n_events""".stripMargin,

    // q241: priority sampling — k+1 highest (w*2^64 // (h+1)) priorities
    // per source (ties by h, w), exact integer cross-product estimator
    // with one final double division; the exact total rides alongside so
    // the error ratio is itself oracle-checked.
    "q241_mass_estimate" ->
      """WITH rws AS (
        |  SELECT source, CAST(n_chars AS BIGINT) AS w,
        |    md5(CAST(doc_id AS VARCHAR)) AS mm
        |  FROM documents
        |), hh AS (
        |  SELECT source, w,
        |    SUM(((instr('0123456789abcdef', substr(mm, CAST(j + 1 AS INT), 1)) - 1)::BIGINT) << CAST((11 - j) * 4 AS INT)) AS h
        |  FROM rws, range(0, 12) r(j) GROUP BY source, mm, w
        |), dist AS (
        |  SELECT DISTINCT source, w, h FROM hh
        |), sel AS (
        |  SELECT source, w, h,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY (w::HUGEINT * 18446744073709551616) // (h + 1) DESC, h ASC, w ASC) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS m
        |  FROM dist
        |), tau AS (
        |  SELECT source, w AS wt, h AS ht FROM sel WHERE rn = 17
        |), agg AS (
        |  SELECT s.source, MAX(s.m) AS m, MAX(t.ht) AS ht,
        |    SUM(s.w) AS sum_all,
        |    SUM(CASE WHEN s.rn <= 16 THEN
        |      GREATEST(s.w::HUGEINT * 65536 * (t.ht + 1),
        |               t.wt::HUGEINT * 18446744073709551616) END) AS sum_terms
        |  FROM sel s LEFT JOIN tau t ON t.source = s.source
        |  GROUP BY s.source
        |), tot AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
        |  FROM documents GROUP BY source
        |), fin AS (
        |  SELECT t.source, t.n_docs, t.total_chars,
        |    CAST(LEAST(a.m, 16) AS BIGINT) AS sample_n,
        |    CASE WHEN a.m <= 16 THEN CAST(a.sum_all AS DOUBLE)
        |         ELSE CAST(a.sum_terms AS DOUBLE) / 65536.0 / CAST(a.ht + 1 AS DOUBLE)
        |    END AS est_chars
        |  FROM tot t JOIN agg a ON a.source = t.source
        |)
        |SELECT source, n_docs, total_chars, sample_n, est_chars,
        |  est_chars / CAST(total_chars AS DOUBLE) AS err_ratio
        |FROM fin""".stripMargin,

    "q244_source_ols" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        |), tf AS (
        |  SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY 1, 2
        |), pd AS (
        |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS y, COUNT(*) AS ndw FROM tf GROUP BY 1
        |), feat AS (
        |  SELECT d.source, d.n_chars AS x1, p.ndw AS x2, p.y
        |  FROM documents d JOIN pd p USING (doc_id)
        |), m AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(x1 AS HUGEINT)) AS sx1, SUM(CAST(x2 AS HUGEINT)) AS sx2,
        |    SUM(CAST(y AS HUGEINT)) AS sy,
        |    SUM(CAST(x1 * x1 AS HUGEINT)) AS sx11,
        |    SUM(CAST(x1 * x2 AS HUGEINT)) AS sx12,
        |    SUM(CAST(x2 * x2 AS HUGEINT)) AS sx22,
        |    SUM(CAST(x1 * y AS HUGEINT)) AS sx1y,
        |    SUM(CAST(x2 * y AS HUGEINT)) AS sx2y,
        |    SUM(CAST(y * y AS HUGEINT)) AS syy
        |  FROM feat GROUP BY 1
        |), dd AS (
        |  SELECT source, n,
        |    CAST(n AS DOUBLE) AS dn, CAST(sx1 AS DOUBLE) AS dx1,
        |    CAST(sx2 AS DOUBLE) AS dx2, CAST(sy AS DOUBLE) AS dy,
        |    CAST(sx11 AS DOUBLE) AS dx11, CAST(sx12 AS DOUBLE) AS dx12,
        |    CAST(sx22 AS DOUBLE) AS dx22, CAST(sx1y AS DOUBLE) AS dx1y,
        |    CAST(sx2y AS DOUBLE) AS dx2y, CAST(syy AS DOUBLE) AS dyy
        |  FROM m
        |), solved AS (
        |  SELECT source, n, dy, dx1y, dx2y, dyy, dn,
        |    ((dn * (dx11 * dx22 - dx12 * dx12)
        |      - dx1 * (dx1 * dx22 - dx12 * dx2)) + dx2 * (dx1 * dx12 - dx11 * dx2)) AS det,
        |    ((dy * (dx11 * dx22 - dx12 * dx12)
        |      - dx1 * (dx1y * dx22 - dx12 * dx2y)) + dx2 * (dx1y * dx12 - dx11 * dx2y)) AS det0,
        |    ((dn * (dx1y * dx22 - dx12 * dx2y)
        |      - dy * (dx1 * dx22 - dx12 * dx2)) + dx2 * (dx1 * dx2y - dx1y * dx2)) AS det1,
        |    ((dn * (dx11 * dx2y - dx1y * dx12)
        |      - dx1 * (dx1 * dx2y - dx1y * dx2)) + dy * (dx1 * dx12 - dx11 * dx2)) AS det2
        |  FROM dd
        |), beta AS (
        |  SELECT source, n, dy, dx1y, dx2y, dyy, dn,
        |    det0 / nullif(det, 0.0) AS beta0,
        |    det1 / nullif(det, 0.0) AS beta1,
        |    det2 / nullif(det, 0.0) AS beta2
        |  FROM solved
        |)
        |SELECT source, n, beta0, beta1, beta2,
        |  (1.0 - (dyy - ((beta0 * dy + beta1 * dx1y) + beta2 * dx2y))
        |       / nullif(dyy - (dy * dy) / dn, 0.0)) AS r2
        |FROM beta""".stripMargin,

    // q246: Mann-Whitney AUC of the dup-bigram-share micro score
    // predicting lang='en', per source — exact tie-corrected midranks
    // over per-(source, score) counts, one trailing double division.
    "q246_score_auc" ->
      """WITH g0 AS (
        |  SELECT doc_id, source, lang = 'en' AS pos,
        |    unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS g
        |  FROM (SELECT doc_id, source, lang, string_split(text, ' ') AS w
        |        FROM documents)
        |  WHERE len(w) >= 2
        |), pg AS (
        |  SELECT doc_id, source, pos, g, COUNT(*) AS n FROM g0
        |  GROUP BY 1, 2, 3, 4
        |), ds AS (
        |  SELECT doc_id, source, pos, SUM(n) AS n_grams,
        |    SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS dup_mass
        |  FROM pg GROUP BY 1, 2, 3
        |), sc AS (
        |  SELECT source, pos, (1000000 * dup_mass) // n_grams AS s FROM ds
        |), cnts AS (
        |  SELECT source, s, COUNT(*) AS n,
        |    SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS npos
        |  FROM sc GROUP BY 1, 2
        |), cum AS (
        |  SELECT source, s, n, npos,
        |    COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        |  FROM cnts
        |), agg AS (
        |  SELECT source, SUM(npos) AS npos, SUM(n - npos) AS nneg,
        |    SUM(npos * (2 * below + n + 1)) AS r2
        |  FROM cum GROUP BY 1
        |)
        |SELECT source, CAST(npos AS BIGINT) AS npos,
        |  CAST(nneg AS BIGINT) AS nneg,
        |  CAST(CAST(r2 - npos * (npos + 1) AS VARCHAR) AS DOUBLE)
        |    / nullif(CAST(2 * npos * nneg AS DOUBLE), 0.0) AS auc
        |FROM agg""".stripMargin,

    // q247: reliability bins of the same micro score — fixed 11-bin
    // grid, exact integer sums, fixed (double/1e6)/n division chain.
    "q247_calibration_bins" ->
      """WITH g0 AS (
        |  SELECT doc_id, lang = 'en' AS pos,
        |    unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS g
        |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w
        |        FROM documents)
        |  WHERE len(w) >= 2
        |), pg AS (
        |  SELECT doc_id, pos, g, COUNT(*) AS n FROM g0 GROUP BY 1, 2, 3
        |), ds AS (
        |  SELECT doc_id, pos, SUM(n) AS n_grams,
        |    SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS dup_mass
        |  FROM pg GROUP BY 1, 2
        |), sc AS (
        |  SELECT pos, (1000000 * dup_mass) // n_grams AS s FROM ds
        |), b AS (
        |  SELECT s // 100000 AS bin, COUNT(*) AS n, SUM(s) AS s_sum,
        |    SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS npos
        |  FROM sc GROUP BY 1
        |)
        |SELECT CAST(bin AS BIGINT) AS bin, n,
        |  CAST(CAST(s_sum AS VARCHAR) AS DOUBLE) / 1e6 / CAST(n AS DOUBLE)
        |    AS mean_score,
        |  CAST(npos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate
        |FROM b""".stripMargin,

    // q252: Youden-J operating point of the dup-share screen per source
    // — integer argmax of |flagged_pos*nneg - flagged_neg*npos| over
    // observed thresholds (classify s >= t), smallest-t tie-break.
    "q252_youden_threshold" ->
      """WITH g0 AS (
        |  SELECT doc_id, source, lang = 'en' AS pos,
        |    unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS g
        |  FROM (SELECT doc_id, source, lang, string_split(text, ' ') AS w
        |        FROM documents)
        |  WHERE len(w) >= 2
        |), pg AS (
        |  SELECT doc_id, source, pos, g, COUNT(*) AS n FROM g0
        |  GROUP BY 1, 2, 3, 4
        |), ds AS (
        |  SELECT doc_id, source, pos, SUM(n) AS n_grams,
        |    SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS dup_mass
        |  FROM pg GROUP BY 1, 2, 3
        |), sc AS (
        |  SELECT source, pos, (1000000 * dup_mass) // n_grams AS s FROM ds
        |), cnts AS (
        |  SELECT source, s, COUNT(*) AS n,
        |    SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS npos
        |  FROM sc GROUP BY 1, 2
        |), cum AS (
        |  SELECT source, s, n, npos,
        |    SUM(n) OVER (PARTITION BY source ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fl_n,
        |    SUM(npos) OVER (PARTITION BY source ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fl_p
        |  FROM cnts
        |), tot AS (
        |  SELECT source, SUM(n) AS tn, SUM(npos) AS tp FROM cnts GROUP BY 1
        |), j AS (
        |  SELECT c.source, c.s, c.fl_n, c.fl_p, t.tn, t.tp,
        |    abs(c.fl_p * (t.tn - t.tp) - (c.fl_n - c.fl_p) * t.tp) AS jnum,
        |    row_number() OVER (PARTITION BY c.source
        |      ORDER BY abs(c.fl_p * (t.tn - t.tp) - (c.fl_n - c.fl_p) * t.tp) DESC,
        |               c.s ASC) AS rn
        |  FROM cum c JOIN tot t USING (source)
        |)
        |SELECT source, CAST(s AS BIGINT) AS threshold_micro,
        |  CAST(fl_p AS DOUBLE) / nullif(CAST(tp AS DOUBLE), 0.0) AS tpr,
        |  CAST(fl_n - fl_p AS DOUBLE) / nullif(CAST(tn - tp AS DOUBLE), 0.0) AS fpr,
        |  CAST(jnum AS DOUBLE)
        |    / nullif(CAST(tp * (tn - tp) AS DOUBLE), 0.0) AS j
        |FROM j WHERE rn = 1""".stripMargin,

    // q256: decile lift table — exact descending grid prefix ranks,
    // atomic tie groups, integer cross-product lifts.
    "q256_decile_lift" ->
      """WITH g0 AS (
        |  SELECT doc_id, lang = 'en' AS pos,
        |    unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS g
        |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w
        |        FROM documents)
        |  WHERE len(w) >= 2
        |), pg AS (
        |  SELECT doc_id, pos, g, COUNT(*) AS n FROM g0 GROUP BY 1, 2, 3
        |), ds AS (
        |  SELECT doc_id, pos, SUM(n) AS n_grams,
        |    SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS dup_mass
        |  FROM pg GROUP BY 1, 2
        |), sc AS (
        |  SELECT pos, (1000000 * dup_mass) // n_grams AS s FROM ds
        |), cnts AS (
        |  SELECT s, COUNT(*) AS n,
        |    SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS npos
        |  FROM sc GROUP BY 1
        |), cum AS (
        |  SELECT s, n, npos,
        |    COALESCE(SUM(n) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
        |  FROM cnts
        |), tot AS (
        |  SELECT SUM(n) AS nn, SUM(npos) AS np FROM cnts
        |), dd AS (
        |  SELECT least(9, (10 * above) // nn) AS decile, n, npos, nn, np
        |  FROM cum, tot
        |), agg AS (
        |  SELECT decile, SUM(n) AS n, SUM(npos) AS npos,
        |    MAX(nn) AS nn, MAX(np) AS np
        |  FROM dd GROUP BY 1
        |), c AS (
        |  SELECT decile, n, npos, nn, np,
        |    SUM(n) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
        |    SUM(npos) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_npos
        |  FROM agg
        |)
        |SELECT CAST(decile AS BIGINT) AS decile, CAST(n AS BIGINT) AS n,
        |  CAST(npos AS BIGINT) AS npos,
        |  CAST(npos AS DOUBLE) / CAST(n AS DOUBLE) AS response_rate,
        |  CAST(CAST(npos * nn AS VARCHAR) AS DOUBLE)
        |    / nullif(CAST(CAST(n * np AS VARCHAR) AS DOUBLE), 0.0) AS lift,
        |  CAST(cum_npos AS DOUBLE) / nullif(CAST(np AS DOUBLE), 0.0)
        |    AS cum_capture,
        |  CAST(CAST(cum_npos * nn AS VARCHAR) AS DOUBLE)
        |    / nullif(CAST(CAST(cum_n * np AS VARCHAR) AS DOUBLE), 0.0)
        |    AS cum_lift
        |FROM c""".stripMargin,

    // q262: Cohen's kappa over the q245 confusion matrix — q245's CTEs
    // verbatim, then marginal products in HUGEINT and micro-unit floor
    // division (mirrors the Spark side's DECIMAL(38,0) internal).
    "q262_kappa_agreement" ->
      """WITH fold AS (
        |  SELECT doc_id, source, text,
        |    ( (instr('0123456789abcdef', substr(md5('nb|' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5('nb|' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5('nb|' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5('nb|' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 2 AS b
        |  FROM documents
        |), w AS (
        |  SELECT doc_id, source, b, unnest(string_split(text, ' ')) AS word
        |  FROM fold
        |), cw AS (
        |  SELECT source, word, COUNT(*) AS cnt FROM w
        |  WHERE b = 0 GROUP BY 1, 2
        |), voc AS (
        |  SELECT COUNT(DISTINCT word) AS v FROM cw
        |), classes AS (
        |  SELECT source AS cand, 1000000 * (SUM(cnt) + voc.v) AS unseen
        |  FROM cw CROSS JOIN voc GROUP BY 1, voc.v
        |), delta AS (
        |  SELECT cw.word, c.cand,
        |    c.unseen // (cw.cnt + 1) - c.unseen AS delta
        |  FROM cw JOIN classes c ON cw.source = c.cand
        |), tf AS (
        |  SELECT doc_id, source, word, COUNT(*) AS tf FROM w
        |  WHERE b = 1 GROUP BY 1, 2, 3
        |), tot AS (
        |  SELECT doc_id, source, SUM(tf) AS t FROM tf GROUP BY 1, 2
        |), adj AS (
        |  SELECT tf.doc_id, d.cand, SUM(tf.tf * d.delta) AS adj
        |  FROM tf JOIN delta d USING (word) GROUP BY 1, 2
        |), sc AS (
        |  SELECT tot.doc_id, tot.source, c.cand,
        |    tot.t * c.unseen + COALESCE(adj.adj, 0) AS score
        |  FROM tot CROSS JOIN classes c
        |  LEFT JOIN adj ON adj.doc_id = tot.doc_id AND adj.cand = c.cand
        |), pred AS (
        |  SELECT doc_id, source, cand AS predicted,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score, cand) AS rn
        |  FROM sc
        |), cm AS (
        |  SELECT source, predicted, COUNT(*) AS n
        |  FROM pred WHERE rn = 1 GROUP BY 1, 2
        |), agg AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
        |    CAST(SUM(CASE WHEN source = predicted THEN n ELSE 0 END) AS BIGINT)
        |      AS n_agree
        |  FROM cm
        |), ra AS (
        |  SELECT source, SUM(n) AS n_actual FROM cm GROUP BY 1
        |), rp AS (
        |  SELECT predicted, SUM(n) AS n_pred FROM cm GROUP BY 1
        |), ch AS (
        |  SELECT CAST(SUM(ra.n_actual * rp.n_pred) AS HUGEINT) AS chance_mass
        |  FROM ra JOIN rp ON ra.source = rp.predicted
        |), m AS (
        |  SELECT agg.n_total, agg.n_agree,
        |    (1000000 * agg.n_agree) // agg.n_total AS po_micro,
        |    CAST((1000000 * ch.chance_mass)
        |      // (CAST(agg.n_total AS HUGEINT) * agg.n_total) AS BIGINT)
        |      AS pe_micro
        |  FROM agg CROSS JOIN ch
        |)
        |SELECT n_total, n_agree, po_micro, pe_micro,
        |  (1000000 * (po_micro - pe_micro)) // (1000000 - pe_micro)
        |    AS kappa_micro
        |FROM m""".stripMargin,

    // q268: Neyman allocation — q246's score CTEs, per-source HUGEINT
    // moments, exact integer sqrt (double seed + two ±1 clamp probes
    // each way), then the q194 largest-remainder seat assignment. The
    // radicand reaches the double via VARCHAR (correct rounding past
    // 2^53, the q236 parity rule).
    "q268_neyman_alloc" ->
      """WITH g0 AS (
        |  SELECT doc_id, source,
        |    unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS g
        |  FROM (SELECT doc_id, source, string_split(text, ' ') AS w
        |        FROM documents)
        |  WHERE len(w) >= 2
        |), pg AS (
        |  SELECT doc_id, source, g, COUNT(*) AS n FROM g0 GROUP BY 1, 2, 3
        |), ds AS (
        |  SELECT doc_id, source, SUM(n) AS n_grams,
        |    SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS dup_mass
        |  FROM pg GROUP BY 1, 2
        |), sc AS (
        |  SELECT source, (1000000 * dup_mass) // n_grams AS s FROM ds
        |), mo AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    SUM(CAST(s AS HUGEINT)) AS s1,
        |    SUM(CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS s2
        |  FROM sc GROUP BY 1
        |), mm AS (
        |  SELECT source, n_docs,
        |    CAST(n_docs AS HUGEINT) * s2 - s1 * s1 AS m FROM mo
        |), q0 AS (
        |  SELECT *, CAST(floor(sqrt(CAST(CAST(m AS VARCHAR) AS DOUBLE)))
        |    AS HUGEINT) AS r0 FROM mm
        |), q1 AS (
        |  SELECT *, CASE WHEN (r0+1)*(r0+1) <= m THEN r0+1 ELSE r0 END AS r1 FROM q0
        |), q2 AS (
        |  SELECT *, CASE WHEN (r1+1)*(r1+1) <= m THEN r1+1 ELSE r1 END AS r2 FROM q1
        |), q3 AS (
        |  SELECT *, CASE WHEN r2*r2 > m THEN r2-1 ELSE r2 END AS r3 FROM q2
        |), qw AS (
        |  SELECT source, n_docs,
        |    CASE WHEN r3*r3 > m THEN r3-1 ELSE r3 END AS w FROM q3
        |), a AS (
        |  SELECT *, (1000::HUGEINT * w) // (SELECT SUM(w) FROM qw) AS base,
        |            (1000::HUGEINT * w) % (SELECT SUM(w) FROM qw) AS rem
        |  FROM qw
        |), r AS (
        |  SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk,
        |    1000 - CAST((SELECT SUM(base) FROM a) AS BIGINT) AS residual
        |  FROM a
        |)
        |SELECT source, n_docs, CAST(w AS BIGINT) AS ns_sd,
        |  CAST(base + CASE WHEN rk <= residual THEN 1 ELSE 0 END AS BIGINT)
        |    AS alloc_docs
        |FROM r""".stripMargin,

    // q273: Spearman-with-ties between the dup-share and inverse-fluency
    // scores per source — exact doubled midranks (min+max row_number over
    // each tie group), HUGEINT moments, the q268 isqrt clamp, and one
    // positive integer division onto the 1e6 grid.
    "q273_signal_agreement" ->
      """WITH bgr AS (
        |  SELECT doc_id, source, bigram, string_split(bigram, ' ')[1] AS w1
        |  FROM (
        |    SELECT doc_id, source,
        |      unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bigram
        |    FROM (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents)
        |    WHERE len(w) >= 2
        |  )
        |), sa AS (
        |  SELECT doc_id, source, (1000000 * dup_mass) // n_grams AS s_dup
        |  FROM (
        |    SELECT doc_id, source, SUM(n) AS n_grams,
        |      SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS dup_mass
        |    FROM (SELECT doc_id, source, bigram, COUNT(*) AS n
        |          FROM bgr GROUP BY 1, 2, 3)
        |    GROUP BY 1, 2)
        |), b2 AS (
        |  SELECT bigram, COUNT(*) AS n12 FROM bgr GROUP BY 1
        |), h1 AS (
        |  SELECT w1, COUNT(*) AS n1 FROM bgr GROUP BY 1
        |), voc AS (SELECT COUNT(*) AS v FROM h1
        |), sb AS (
        |  SELECT doc_id, s // nb AS s_flu FROM (
        |    SELECT bgr.doc_id, COUNT(*) AS nb,
        |      SUM((1000000 * (h1.n1 + voc.v)) // (b2.n12 + 1)) AS s
        |    FROM bgr JOIN b2 USING (bigram) JOIN h1 USING (w1) CROSS JOIN voc
        |    GROUP BY 1)
        |), sc AS (
        |  SELECT sa.doc_id, sa.source, sa.s_dup, sb.s_flu
        |  FROM sa JOIN sb USING (doc_id)
        |), ra AS (
        |  SELECT doc_id, source, s_dup,
        |    row_number() OVER (PARTITION BY source ORDER BY s_dup, doc_id) AS rk
        |  FROM sc
        |), ma AS (
        |  SELECT source, s_dup, MIN(rk) + MAX(rk) AS a2 FROM ra GROUP BY 1, 2
        |), rb AS (
        |  SELECT doc_id, source, s_flu,
        |    row_number() OVER (PARTITION BY source ORDER BY s_flu, doc_id) AS rk
        |  FROM sc
        |), mb AS (
        |  SELECT source, s_flu, MIN(rk) + MAX(rk) AS b2 FROM rb GROUP BY 1, 2
        |), mr AS (
        |  SELECT sc.doc_id, sc.source, ma.a2, mb.b2
        |  FROM sc JOIN ma ON ma.source = sc.source AND ma.s_dup = sc.s_dup
        |          JOIN mb ON mb.source = sc.source AND mb.s_flu = sc.s_flu
        |), mo AS (
        |  SELECT source, COUNT(*) AS n,
        |    SUM(a2::HUGEINT) AS sa1, SUM(b2::HUGEINT) AS sb1,
        |    SUM(a2::HUGEINT * b2) AS sab,
        |    SUM(a2::HUGEINT * a2) AS saa,
        |    SUM(b2::HUGEINT * b2) AS sbb
        |  FROM mr GROUP BY 1
        |), vv AS (
        |  SELECT source, n,
        |    n::HUGEINT * sab - sa1 * sb1 AS covn,
        |    n::HUGEINT * saa - sa1 * sa1 AS vara,
        |    n::HUGEINT * sbb - sb1 * sb1 AS varb
        |  FROM mo
        |), q0 AS (
        |  SELECT *,
        |    CAST(floor(sqrt(CAST(CAST(vara AS VARCHAR) AS DOUBLE))) AS HUGEINT) AS ra0,
        |    CAST(floor(sqrt(CAST(CAST(varb AS VARCHAR) AS DOUBLE))) AS HUGEINT) AS rb0
        |  FROM vv
        |), q1 AS (
        |  SELECT *, CASE WHEN (ra0+1)*(ra0+1) <= vara THEN ra0+1 ELSE ra0 END AS ra1,
        |            CASE WHEN (rb0+1)*(rb0+1) <= varb THEN rb0+1 ELSE rb0 END AS rb1 FROM q0
        |), q2 AS (
        |  SELECT *, CASE WHEN (ra1+1)*(ra1+1) <= vara THEN ra1+1 ELSE ra1 END AS ra2,
        |            CASE WHEN (rb1+1)*(rb1+1) <= varb THEN rb1+1 ELSE rb1 END AS rb2 FROM q1
        |), q3 AS (
        |  SELECT *, CASE WHEN ra2*ra2 > vara THEN ra2-1 ELSE ra2 END AS ra3,
        |            CASE WHEN rb2*rb2 > varb THEN rb2-1 ELSE rb2 END AS rb3 FROM q2
        |), qr AS (
        |  SELECT source, n, covn,
        |    CASE WHEN ra3*ra3 > vara THEN ra3-1 ELSE ra3 END AS rra,
        |    CASE WHEN rb3*rb3 > varb THEN rb3-1 ELSE rb3 END AS rrb
        |  FROM q3
        |)
        |SELECT source, CAST(n AS BIGINT) AS n_docs,
        |  CASE WHEN (rra * rrb) // 1000000 > 0 THEN
        |    CAST(CASE WHEN covn >= 0
        |      THEN abs(covn) // ((rra * rrb) // 1000000)
        |      ELSE -(abs(covn) // ((rra * rrb) // 1000000)) END AS BIGINT)
        |  ELSE NULL END AS rho_micro
        |FROM qr""".stripMargin,

    // q282: k-anonymity / l-diversity audit over a 3-level
    // generalization ladder — bands on IEEE floor(bal/width), classes
    // by (width, nation, band), one report row per width.
    "q282_k_anonymity" ->
      """WITH lad AS (
        |  SELECT c_nationkey, c_acctbal, c_mktsegment, w.band_width
        |  FROM customer, (SELECT UNNEST([100, 1000, 10000]) AS band_width) w
        |), cls AS (
        |  SELECT band_width, c_nationkey,
        |    CAST(floor(c_acctbal / band_width) AS BIGINT) AS band,
        |    COUNT(*) AS k, COUNT(DISTINCT c_mktsegment) AS l
        |  FROM lad GROUP BY 1, 2, 3
        |)
        |SELECT CAST(band_width AS BIGINT) AS band_width,
        |  COUNT(*) AS n_classes,
        |  MIN(k) AS min_k, MAX(k) AS max_k,
        |  CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
        |    AS records_at_risk,
        |  CAST(SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS classes_at_risk,
        |  MIN(l) AS min_l,
        |  CAST(SUM(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT) AS classes_l1
        |FROM cls GROUP BY 1""".stripMargin,

    // q290: PAV isotonic fit in the closed minimax form over the
    // bounded density-bin relation; floored micro means commute with
    // min/max, so both engines land on floor(true PAV) exactly.
    "q290_isotonic_rate" ->
      """WITH sc AS (
        |  SELECT md5(text) AS fp,
        |    ((1000000 * CAST(len(list_distinct(w)) AS BIGINT)) // len(w))
        |      // 50000 AS bin
        |  FROM (SELECT text, string_split(text, ' ') AS w FROM documents)
        |), dupfp AS (
        |  SELECT fp, 1 AS is_dup FROM sc GROUP BY fp HAVING COUNT(*) > 1
        |), br AS (
        |  SELECT bin, COUNT(*) AS n_docs,
        |    CAST(SUM(COALESCE(d.is_dup, 0)) AS BIGINT) AS n_dups
        |  FROM sc LEFT JOIN dupfp d USING (fp) GROUP BY 1
        |), cum AS (
        |  SELECT *,
        |    SUM(n_docs) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cd,
        |    SUM(n_dups) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cy
        |  FROM br
        |), pairs AS (
        |  SELECT j.bin AS j, k.bin AS k,
        |    (1000000 * (k.cy - j.cy + j.n_dups))
        |      // (k.cd - j.cd + j.n_docs) AS mean_micro
        |  FROM cum j JOIN cum k ON j.bin <= k.bin
        |), mns AS (
        |  SELECT b.bin, p.j, MIN(p.mean_micro) AS mn
        |  FROM br b JOIN pairs p ON p.j <= b.bin AND p.k >= b.bin
        |  GROUP BY 1, 2
        |), fits AS (
        |  SELECT bin, MAX(mn) AS iso FROM mns GROUP BY 1
        |)
        |SELECT b.bin, b.n_docs, b.n_dups,
        |  CAST((1000000 * b.n_dups) // b.n_docs AS BIGINT) AS rate_micro,
        |  CAST(f.iso AS BIGINT) AS iso_micro
        |FROM br b JOIN fits f USING (bin)""".stripMargin,
  )
}
