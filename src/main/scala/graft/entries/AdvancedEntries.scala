package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Advanced, Corpus, Dedup, Multimodal, Prep, Quality, Relational, Similarity, TextAnalysis, Warehouse}
import graft.sources.Tables

/** Advanced family: `SparkEntry.queries` registrations + their DuckDB
  * oracles (round-17 verdict task 6 — the 8k-line single-file registry
  * split per family; `SparkEntry` folds every family back into the one
  * driver-contract map, and OracleCoverageSpec still guards that every
  * query has its oracle).
  */
private[graft] object AdvancedEntries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_rollup_revenue" -> (Advanced.rollupRevenue _),
    "q29_cube_events" -> (Advanced.cubeEvents _),
    "q30_asof_last_order" -> (Advanced.asofLastOrder _),
    "q31_range_join_bands" -> (Advanced.rangeJoinBands _),
    "q32_above_customer_avg" -> (Advanced.aboveCustomerAvg _),
    "q33_topk_per_customer" -> ((s, d) => Advanced.topKPerCustomer(s, d)),
    "q34_salted_skew_agg" -> ((s, d) => Advanced.saltedSkewAgg(s, d)),
    "q62_rolling_revenue" -> (Advanced.rollingRevenue _),
    "q63_gap_fill_daily" -> (Advanced.gapFillDaily _),
    "q64_funnel_stages" -> (Advanced.funnelStages _),
    "q65_props_extract" -> (Advanced.propsExtract _),
    "q67_cohort_retention" -> (Advanced.cohortRetention _),
    "q71_salted_skew_join" -> ((s, d) => Advanced.saltedSkewJoin(s, d)),
    "q97_regression_stats" -> ((s, d) => Advanced.regressionStats(s, d)),
    "q98_price_histogram" -> ((s, d) => Advanced.priceHistogram(s, d)),
    "q101_rolling_wau" -> ((s, d) => Advanced.rollingActiveUsers(s, d)),
    "q102_event_throttle" -> ((s, d) => Advanced.throttleEvents(s, d)),
    "q103_conversion_latency" -> ((s, d) => Advanced.conversionLatency(s, d)),
    "q107_revenue_anomaly" -> ((s, d) => Advanced.revenueAnomaly(s, d)),
    "q108_mom_growth" -> ((s, d) => Advanced.momGrowth(s, d)),
    "q109_event_transitions" -> ((s, d) => Advanced.eventTransitions(s, d)),
    "q110_basket_pairs" -> ((s, d) => Advanced.basketPairs(s, d)),
    "q111_concurrent_sessions" -> ((s, d) => Advanced.concurrentSessions(s, d)),
    "q113_session_time_weighted" -> ((s, d) => Advanced.sessionTimeWeighted(s, d)),
    "q114_copurchase_rank" -> ((s, d) => Advanced.copurchaseRank(s, d)),
    "q115_pareto_frontier" -> ((s, d) => Advanced.paretoFrontier(s, d)),
    "q116_max_drawdown" -> ((s, d) => Advanced.maxDrawdown(s, d)),
    "q117_modal_event_type" -> ((s, d) => Advanced.modalEventType(s, d)),
    "q118_interval_merge" -> ((s, d) => Advanced.mergeIntervals(s, d)),
    "q119_activity_streaks" -> ((s, d) => Advanced.activityStreaks(s, d)),
    "q120_allocate_cents" -> ((s, d) => Advanced.allocateProportional(s, d)),
    "q121_triangle_counts" -> ((s, d) => Advanced.triangleCounts(s, d)),
    "q122_systematic_sample" -> ((s, d) => Advanced.systematicSample(s, d)),
    "q125_session_paths" -> ((s, d) => Advanced.sessionPaths(s, d)),
    "q129_growth_accounting" -> ((s, d) => Advanced.growthAccounting(s, d)),
    "q130_state_dwell" -> ((s, d) => Advanced.stateDwell(s, d)),
    "q131_rfm_segments" -> ((s, d) => Advanced.rfmSegments(s, d)),
    "q132_ship_lag" -> ((s, d) => Advanced.shipLagPercentiles(s, d)),
    "q133_abc_classification" -> ((s, d) => Advanced.abcClassification(s, d)),
    "q134_duplicate_charges" -> ((s, d) => Advanced.duplicateCharges(s, d)),
    "q139_weekday_profile" -> ((s, d) => Advanced.weekdayProfile(s, d)),
    "q147_stickiness" -> ((s, d) => Advanced.stickiness(s, d)),
    "q148_order_backlog" -> ((s, d) => Advanced.orderBacklog(s, d)),
    "q149_revenue_concentration" -> ((s, d) => Advanced.revenueConcentration(s, d)),
    "q154_purchase_regularity" -> ((s, d) => Advanced.purchaseRegularity(s, d)),
    "q155_price_band_mix" -> ((s, d) => Advanced.priceBandMix(s, d)),
    "q156_ltv_curve" -> ((s, d) => Advanced.ltvCurve(s, d)),
    "q158_cross_sell" -> ((s, d) => Advanced.crossSellMatrix(s, d)),
    "q159_split_balance" -> ((s, d) => Advanced.splitBalance(s, d)),
    "q161_lorenz_curve" -> ((s, d) => Advanced.lorenzCurve(s, d)),
    "q162_repurchase_cycle" -> ((s, d) => Advanced.repurchaseCycle(s, d)),
    "q168_volume_anomalies" -> ((s, d) => Advanced.volumeAnomalies(s, d)),
    "q172_category_breadth" -> ((s, d) => Advanced.categoryBreadth(s, d)),
    "q173_median_order_trend" -> ((s, d) => Advanced.medianOrderTrend(s, d)),
    "q178_engagement_diversity" -> ((s, d) => Advanced.engagementDiversity(s, d)),
    "q179_gap_histogram" -> ((s, d) => Advanced.gapHistogram(s, d)),
    "q180_size_revenue_corr" -> ((s, d) => Advanced.sizeRevenueCorr(s, d)),
    "q184_acquisition_curve" -> ((s, d) => Advanced.acquisitionCurve(s, d)),
    "q185_arpu_trend" -> ((s, d) => Advanced.arpuTrend(s, d)),
    "q186_pre_transition_dwell" -> ((s, d) => Advanced.preTransitionDwell(s, d)),
    "q188_qty_by_price_band" -> ((s, d) => Advanced.quantityByPriceBand(s, d)),
    "q189_expansion_cohorts" -> ((s, d) => Advanced.expansionCohorts(s, d)),
    "q283_pagerank" -> ((s, d) => Advanced.copurchasePageRank(s, d)),
  )

  def oracleSql: Map[String, String] = Map(

    "q28_rollup_revenue" ->
      """SELECT n_name, o_orderstatus,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, COUNT(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, o_orderstatus)""".stripMargin,

    "q29_cube_events" ->
      """SELECT event_type, band, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM (SELECT event_type,
        |        CASE WHEN value < 50 THEN 'LOW' WHEN value < 150 THEN 'MID' ELSE 'HIGH' END AS band,
        |        value FROM events)
        |GROUP BY CUBE(event_type, band)""".stripMargin,

    "q30_asof_last_order" ->
      """SELECT e.event_id, e.user_id,
        |  (SELECT max(o.o_orderkey) FROM orders o
        |    WHERE o.o_custkey = e.user_id
        |      AND o.o_orderdate = (SELECT max(o2.o_orderdate) FROM orders o2
        |                            WHERE o2.o_custkey = e.user_id AND o2.o_orderdate <= e.ts)) AS last_order_key,
        |  (SELECT max(o2.o_orderdate) FROM orders o2
        |    WHERE o2.o_custkey = e.user_id AND o2.o_orderdate <= e.ts) AS last_order_date
        |FROM events e""".stripMargin,

    "q31_range_join_bands" ->
      """SELECT event_id, user_id, value, band
        |FROM events
        |JOIN (VALUES ('LOW', 0.0, 50.0), ('MID', 50.0, 150.0), ('HIGH', 150.0, 1e12)) b(band, lo, hi)
        |  ON value >= lo AND value < hi""".stripMargin,

    "q32_above_customer_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o JOIN (
        |  SELECT o_custkey AS ck, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_tp, COUNT(*) AS cnt
        |  FROM orders GROUP BY 1) s ON o.o_custkey = s.ck
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * cnt > sum_tp""".stripMargin,

    "q33_topk_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) WHERE rnk <= 3""".stripMargin,

    "q34_salted_skew_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,

    "q62_rolling_revenue" ->
      """SELECT o_orderkey, o_custkey, day,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY day
        |    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d
        |FROM (SELECT o_orderkey, o_custkey,
        |        date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
        |        o_totalprice
        |      FROM orders)""".stripMargin,

    "q63_gap_fill_daily" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1, 2
        |), span AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
        |), scaffold AS (
        |  SELECT user_id,
        |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span
        |)
        |SELECT s.user_id, s.day, COALESCE(d.n, 0) AS n, COALESCE(d.sum_value, 0.0) AS sum_value
        |FROM scaffold s LEFT JOIN daily d USING (user_id, day)""".stripMargin,

    "q64_funnel_stages" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec FROM events
        |), v AS (
        |  SELECT user_id, MIN(sec) AS view_sec FROM e WHERE event_type = 'view' GROUP BY 1
        |), c AS (
        |  SELECT user_id, MIN(sec) AS click_sec FROM e JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND sec >= view_sec GROUP BY 1
        |), p AS (
        |  SELECT user_id, MIN(sec) AS purchase_sec FROM e JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND sec >= click_sec GROUP BY 1
        |)
        |SELECT user_id, view_sec, click_sec, purchase_sec,
        |  CASE WHEN purchase_sec IS NOT NULL THEN 3
        |       WHEN click_sec IS NOT NULL THEN 2
        |       ELSE 1 END AS stage
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""".stripMargin,

    "q65_props_extract" ->
      """SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q67_cohort_retention" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), cohorts AS (
        |  SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY 1
        |)
        |SELECT cohort_day, date_diff('day', cohort_day, day) AS day_offset,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM days JOIN cohorts USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    // q71: the Spark side joins through (event_type, salt) sub-keys; the
    // salt only affects row placement, so the answer must be identical to
    // the plain join — which is what the oracle runs.
    "q71_salted_skew_join" ->
      """WITH stats AS (
        |  SELECT event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS type_mean
        |  FROM events GROUP BY 1
        |)
        |SELECT e.event_id, e.event_type, e.value, s.type_mean,
        |  e.value - s.type_mean AS deviation
        |FROM events e JOIN stats s USING (event_type)""".stripMargin,

    // q97: integer-cents moments (hugeint = exact int128, one rounding
    // per double conversion — decimal scale-4 sums double-round their
    // cast in DuckDB once the backing int passes 2^53), then the same
    // fixed chain of double ops as the Spark side.
    "q97_regression_stats" ->
      """WITH c AS (
        |  SELECT l_returnflag,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS HUGEINT) AS xc,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS HUGEINT) AS yc
        |  FROM lineitem
        |), m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(xc) AS sx, SUM(yc) AS sy,
        |    SUM(xc * xc) AS sxx, SUM(xc * yc) AS sxy, SUM(yc * yc) AS syy
        |  FROM c GROUP BY 1
        |), d AS (
        |  -- VARCHAR route: DuckDB's direct HUGEINT->DOUBLE cast is not
        |  -- correctly rounded past 2^53; string->double parse is,
        |  -- matching Spark's BigDecimal conversion
        |  SELECT l_returnflag, n,
        |    CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS cov,
        |    CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS vx,
        |    CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS vy,
        |    CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
        |    CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd
        |  FROM m
        |)
        |SELECT l_returnflag, n,
        |  cov / vx AS slope,
        |  (syd - cov / vx * sxd) / CAST(n AS DOUBLE) / CAST(100 AS DOUBLE) AS intercept,
        |  cov / (sqrt(vx) * sqrt(vy)) AS corr
        |FROM d""".stripMargin,

    // q98: min/max scalar then one binned aggregate; the bin expression
    // and boundary arithmetic mirror the Spark side op-for-op.
    "q98_price_histogram" ->
      """WITH b AS (
        |  SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders
        |), w AS (
        |  SELECT mn, mx, (mx - mn) / CAST(20 AS DOUBLE) AS width FROM b
        |), binned AS (
        |  SELECT LEAST(19, CAST(FLOOR((o_totalprice - mn) / width) AS INT)) AS bin,
        |    mn, width
        |  FROM orders CROSS JOIN w
        |)
        |SELECT bin, COUNT(*) AS n,
        |  MIN(mn + CAST(bin AS DOUBLE) * width) AS lo,
        |  MIN(mn + CAST(bin + 1 AS DOUBLE) * width) AS hi
        |FROM binned GROUP BY bin""".stripMargin,

    // q101: each active (user, day) contributes to 7 report days; report
    // days restricted to observed days; one distinct count per day.
    "q101_rolling_wau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), obs AS (
        |  SELECT DISTINCT day AS report_day FROM ud
        |), contrib AS (
        |  SELECT DISTINCT user_id, day + CAST(k AS INT) AS report_day
        |  FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS k)
        |)
        |SELECT report_day, COUNT(*) AS active_users
        |FROM (SELECT DISTINCT user_id, report_day FROM contrib
        |      WHERE report_day IN (SELECT report_day FROM obs))
        |GROUP BY report_day""".stripMargin,

    // q102: lag per (user, type) ordered by exact integer micros with an
    // event_id tiebreak; keep firsts and events >= 30 min after the
    // previous one.
    "q102_event_throttle" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
        |    LAG(epoch_us(ts)) OVER (
        |      PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events
        |)
        |SELECT event_id, user_id, event_type, us
        |FROM e
        |WHERE prev_us IS NULL OR us - prev_us >= 1800000000""".stripMargin,

    // q103: conditional min per user (no stream self-join), exclusion of
    // purchase-before-signup, rank-boundary percentiles in exact micros.
    "q103_conversion_latency" ->
      """WITH f AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS s_us,
        |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p_us
        |  FROM events
        |  WHERE event_type IN ('signup', 'purchase')
        |  GROUP BY user_id
        |), c AS (
        |  SELECT date_trunc('month', make_timestamp(s_us)) AS cohort,
        |    p_us - s_us AS delta_us, user_id
        |  FROM f
        |  WHERE s_us IS NOT NULL AND p_us IS NOT NULL AND p_us >= s_us
        |), r AS (
        |  SELECT cohort, delta_us,
        |    ROW_NUMBER() OVER (PARTITION BY cohort ORDER BY delta_us, user_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY cohort) AS n
        |  FROM c
        |)
        |SELECT cohort, MAX(n) AS n_converted,
        |  MAX(CASE WHEN rn = CEIL(n * 0.5) THEN delta_us END) AS median_us,
        |  MAX(CASE WHEN rn = CEIL(n * 0.9) THEN delta_us END) AS p90_us
        |FROM r GROUP BY cohort""".stripMargin,

    // q107: integer-cents daily sums, exact window moments (hugeint),
    // one double conversion, same op order as the Spark side.
    "q107_revenue_anomaly" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT)) AS x
        |  FROM orders GROUP BY 1
        |), dn AS (
        |  SELECT day, datediff('day', DATE '1970-01-01', day) AS day_num, x FROM daily
        |), st AS (
        |  SELECT day, x,
        |    COUNT(x) OVER w AS n, SUM(x) OVER w AS s1, SUM(x * x) OVER w AS s2
        |  FROM dn
        |  WINDOW w AS (ORDER BY day_num RANGE BETWEEN 28 PRECEDING AND 1 PRECEDING)
        |)
        |SELECT day, n AS n_baseline,
        |  CAST(x AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
        |  -- VARCHAR route: DuckDB's direct HUGEINT->DOUBLE cast is not
        |  -- correctly rounded past 2^53 (off by an ulp at sf0.1 moments);
        |  -- string->double parse is, matching Spark's BigDecimal path
        |  CASE WHEN sqrt(CAST(CAST(n * s2 - s1 * s1 AS VARCHAR) AS DOUBLE)
        |                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) = 0
        |       THEN NULL
        |       ELSE (CAST(x AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |         / sqrt(CAST(CAST(n * s2 - s1 * s1 AS VARCHAR) AS DOUBLE)
        |                / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) END AS z
        |FROM st WHERE n >= 14""".stripMargin,

    // q108: lag over the monthly rollup; growth = (rev - prev) / prev in
    // the same double op order; first month keeps a null ratio.
    "q108_mom_growth" ->
      """WITH m AS (
        |  SELECT date_trunc('month', o_orderdate) AS month,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY 1
        |)
        |SELECT month, revenue,
        |  LAG(revenue) OVER (ORDER BY month) AS prev_revenue,
        |  (revenue - LAG(revenue) OVER (ORDER BY month))
        |    / LAG(revenue) OVER (ORDER BY month) AS growth
        |FROM m""".stripMargin,

    // q109: lead over (micros, event_id) total order — the q102 tie
    // rule; p = one double division of exact bigint counts.
    "q109_event_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
        |), s AS (
        |  SELECT event_type AS from_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS to_type
        |  FROM e
        |), t AS (
        |  SELECT from_type, to_type, COUNT(*) AS n
        |  FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT from_type, to_type, n,
        |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        |FROM t""".stripMargin,

    // q110: apriori-pruned within-basket self-join, mirrored order
    // (frequent filter before the pair join, pair filter after).
    "q110_basket_pairs" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |f AS (SELECT p FROM b GROUP BY p HAVING COUNT(*) >= 3),
        |fb AS (SELECT o, p FROM b WHERE p IN (SELECT p FROM f)),
        |pr AS (
        |  SELECT a.p AS part_a, b2.p AS part_b, COUNT(*) AS n
        |  FROM fb a JOIN fb b2 ON a.o = b2.o AND a.p < b2.p
        |  GROUP BY 1, 2
        |),
        |nb AS (SELECT COUNT(DISTINCT o) AS n_baskets FROM b)
        |SELECT part_a, part_b, n, CAST(n AS DOUBLE) / CAST(n_baskets AS DOUBLE) AS support
        |FROM pr, nb WHERE n >= 3""".stripMargin,

    // q111: the oracle runs the global running sum directly (one window)
    // — the Spark side's bucketed two-pass prefix sum must land on
    // identical concurrency values row for row.
    "q111_concurrent_sessions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events
        |), f AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM e
        |), g AS (
        |  SELECT user_id, us,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM f
        |), s AS (
        |  SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |    MIN(us) AS s_us, MAX(us) AS e_us
        |  FROM g GROUP BY 1, 2
        |), bnd AS (
        |  SELECT user_id, session_seq, s_us AS us, CAST(1 AS BIGINT) AS delta FROM s
        |  UNION ALL
        |  SELECT user_id, session_seq, e_us + 1 AS us, CAST(-1 AS BIGINT) AS delta FROM s
        |)
        |SELECT us, user_id, session_seq, delta,
        |  CAST(SUM(delta) OVER (ORDER BY us, delta, user_id, session_seq
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS concurrency
        |FROM bnd""".stripMargin,

    // q113: q15's session windows, duration weights in exact integer
    // micros x cents, one double division at the end (same op order).
    "q113_session_time_weighted" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    LAG(epoch_us(ts)) OVER w AS prev_us,
        |    LEAD(epoch_us(ts)) OVER w AS next_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |), f AS (
        |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM e
        |), g AS (
        |  SELECT user_id, us, cents, next_us,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_seq,
        |    LEAD(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id) AS next_new
        |  FROM f
        |), h AS (
        |  SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, cents,
        |    CASE WHEN next_new = 0 THEN next_us - us ELSE 0 END AS gap_us
        |  FROM g
        |)
        |SELECT user_id, session_seq, COUNT(*) AS n_events,
        |  CAST(SUM(gap_us) AS BIGINT) AS dur_us,
        |  CASE WHEN SUM(gap_us) = 0 THEN NULL
        |       -- VARCHAR route: correctly-rounded int128->double
        |       ELSE CAST(CAST(SUM(CAST(cents * gap_us AS HUGEINT)) AS VARCHAR) AS DOUBLE)
        |            / CAST(SUM(gap_us) AS DOUBLE) / 100.0 END AS tw_value
        |FROM h GROUP BY 1, 2""".stripMargin,

    // q114: q110's edge CTEs, two unrolled fixed-point iterations; //
    // is floor division but every operand is positive, matching Spark's
    // truncating div exactly.
    "q114_copurchase_rank" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |f AS (SELECT p FROM b GROUP BY p HAVING COUNT(*) >= 3),
        |fb AS (SELECT o, p FROM b WHERE p IN (SELECT p FROM f)),
        |pr AS (
        |  SELECT a.p AS part_a, b2.p AS part_b
        |  FROM fb a JOIN fb b2 ON a.o = b2.o AND a.p < b2.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3
        |),
        |ed AS (
        |  SELECT part_a AS src, part_b AS dst FROM pr
        |  UNION ALL SELECT part_b AS src, part_a AS dst FROM pr
        |),
        |dg AS (SELECT src, COUNT(*) AS deg FROM ed GROUP BY src),
        |r0 AS (SELECT src AS node, CAST(1000000000000 AS BIGINT) AS rk FROM dg),
        |c1 AS (SELECT e.dst, SUM(r.rk // d.deg) AS m
        |       FROM ed e JOIN dg d ON e.src = d.src JOIN r0 r ON e.src = r.node
        |       GROUP BY 1),
        |r1 AS (SELECT d.src AS node, 150000000000 + (COALESCE(c1.m, 0) * 85) // 100 AS rk
        |       FROM dg d LEFT JOIN c1 ON d.src = c1.dst),
        |c2 AS (SELECT e.dst, SUM(r.rk // d.deg) AS m
        |       FROM ed e JOIN dg d ON e.src = d.src JOIN r1 r ON e.src = r.node
        |       GROUP BY 1),
        |r2 AS (SELECT d.src AS node, 150000000000 + (COALESCE(c2.m, 0) * 85) // 100 AS rk
        |       FROM dg d LEFT JOIN c2 ON d.src = c2.dst)
        |SELECT r2.node AS part, dg.deg, CAST(r2.rk AS BIGINT) AS rank_fp
        |FROM r2 JOIN dg ON r2.node = dg.src""".stripMargin,

    // q115: the oracle computes the same per-price reduce + exclusive
    // prefix max in one global window; the Spark side's bucketed
    // two-pass prefix must select the identical frontier rows.
    "q115_pareto_frontier" ->
      """WITH g AS (
        |  SELECT o_totalprice AS pr, MAX(CAST(o_orderdate AS DATE)) AS gmax
        |  FROM orders GROUP BY 1
        |), p AS (
        |  SELECT pr, gmax, MAX(gmax) OVER (ORDER BY pr DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
        |  FROM g
        |), k AS (SELECT pr, gmax FROM p WHERE prev IS NULL OR gmax > prev)
        |SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS d
        |FROM orders JOIN k ON o_totalprice = k.pr AND CAST(o_orderdate AS DATE) = k.gmax""".stripMargin,

    // q116: exact cents moments under the same (date, key) total order;
    // one double conversion after the max.
    "q116_max_drawdown" ->
      """WITH c AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders
        |), p AS (
        |  SELECT o_custkey, cents,
        |    MAX(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |      ROWS UNBOUNDED PRECEDING) AS peak
        |  FROM c
        |)
        |SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(MAX(peak - cents) AS DOUBLE) / 100.0 AS max_drawdown
        |FROM p GROUP BY 1""".stripMargin,

    // q117: modal pick with the explicit (count desc, type asc) tie
    // rule — deterministic in any engine.
    "q117_modal_event_type" ->
      """WITH c AS (
        |  SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT user_id, event_type, n,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
        |  FROM c
        |)
        |SELECT user_id, event_type AS modal_type, n FROM r WHERE rn = 1""".stripMargin,

    // q118: same islands construction — exclusive running max of ends,
    // new-episode flags, prefix-summed episode ids — in one window CTE
    // chain; episode ids cast to BIGINT to match Spark's long.
    "q118_interval_merge" ->
      """WITH iv AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + 1800000000 AS e
        |  FROM events
        |), m AS (
        |  SELECT user_id, event_id, s, e,
        |    MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM iv
        |), g AS (
        |  SELECT user_id, s, e,
        |    SUM(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY s, event_id
        |        ROWS UNBOUNDED PRECEDING) AS ep
        |  FROM m
        |)
        |SELECT user_id, CAST(ep AS BIGINT) AS episode, MIN(s) AS s_us,
        |  MAX(e) AS e_us, COUNT(*) AS n_events
        |FROM g GROUP BY 1, 2""".stripMargin,

    // q119: day-number minus row-number anchors; identical (len desc,
    // start asc) winner rule.
    "q119_activity_streaks" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), r AS (
        |  SELECT user_id, day,
        |    (day - DATE '1970-01-01')
        |      - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS anchor
        |  FROM d
        |), g AS (
        |  SELECT user_id, anchor, COUNT(*) AS best_len, MIN(day) AS best_start
        |  FROM r GROUP BY 1, 2
        |), k AS (
        |  SELECT user_id, best_len, best_start,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY best_len DESC, best_start) AS rn
        |  FROM g
        |)
        |SELECT user_id, best_len, best_start FROM k WHERE rn = 1""".stripMargin,

    // q120: the same integer floor-divide (// here, div in Spark) and
    // largest-remainder handout; both engines reconcile each order to
    // the cent.
    "q120_allocate_cents" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_c
        |  FROM lineitem
        |), o AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS total_c
        |  FROM orders
        |), j AS (
        |  SELECT l_orderkey, l_linenumber, qty_c, total_c,
        |    SUM(qty_c) OVER (PARTITION BY l_orderkey) AS q_sum
        |  FROM li JOIN o ON l_orderkey = o_orderkey
        |), b AS (
        |  SELECT l_orderkey, l_linenumber, total_c,
        |    (total_c * qty_c) // q_sum AS base,
        |    (total_c * qty_c) % q_sum AS rem
        |  FROM j
        |), r AS (
        |  SELECT l_orderkey, l_linenumber, base,
        |    total_c - SUM(base) OVER (PARTITION BY l_orderkey) AS residual,
        |    ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |      ORDER BY rem DESC, l_linenumber) AS rk
        |  FROM b
        |)
        |SELECT l_orderkey, l_linenumber,
        |  CAST(base + CASE WHEN rk <= residual THEN 1 ELSE 0 END AS BIGINT) AS alloc_c,
        |  CAST(base + CASE WHEN rk <= residual THEN 1 ELSE 0 END AS DOUBLE) / 100.0 AS alloc
        |FROM r""".stripMargin,

    // q121: the same degree-ordered orientation and wedge closure in
    // CTEs; EXISTS plays the left-semi closure join.
    "q121_triangle_counts" ->
      """WITH baskets AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |freq AS (SELECT p FROM baskets GROUP BY 1 HAVING COUNT(*) >= 2),
        |fb AS (SELECT o, p FROM baskets WHERE p IN (SELECT p FROM freq)),
        |ed AS (
        |  SELECT a.p AS a, b.p AS b
        |  FROM fb a JOIN fb b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |),
        |deg AS (
        |  SELECT n, COUNT(*) AS d FROM (
        |    SELECT a AS n FROM ed UNION ALL SELECT b AS n FROM ed) GROUP BY 1
        |),
        |fwd AS (
        |  SELECT CASE WHEN (da.d < db.d OR (da.d = db.d AND ed.a < ed.b))
        |           THEN ed.a ELSE ed.b END AS u,
        |         CASE WHEN (da.d < db.d OR (da.d = db.d AND ed.a < ed.b))
        |           THEN ed.b ELSE ed.a END AS v,
        |         CASE WHEN (da.d < db.d OR (da.d = db.d AND ed.a < ed.b))
        |           THEN db.d ELSE da.d END AS dv
        |  FROM ed JOIN deg da ON ed.a = da.n JOIN deg db ON ed.b = db.n
        |),
        |wedges AS (
        |  SELECT x.u AS w0, x.v AS w1, y.v AS w2
        |  FROM fwd x JOIN fwd y ON x.u = y.u
        |    AND (x.dv < y.dv OR (x.dv = y.dv AND x.v < y.v))
        |),
        |tri AS (
        |  SELECT w0, w1, w2 FROM wedges WHERE EXISTS (
        |    SELECT 1 FROM fwd WHERE fwd.u = wedges.w1 AND fwd.v = wedges.w2)
        |)
        |SELECT part, COUNT(*) AS n_tri FROM (
        |  SELECT UNNEST([w0, w1, w2]) AS part FROM tri) GROUP BY 1""".stripMargin,

    // q122: one global cumulative-sum window stands in for the bucketed
    // two-pass prefix; identical integer stride arithmetic.
    "q122_systematic_sample" ->
      """WITH r AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS w
        |  FROM orders
        |), c AS (
        |  SELECT o_orderkey, w,
        |    SUM(w) OVER (ORDER BY o_orderkey ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(w) OVER () AS grand
        |  FROM r
        |)
        |SELECT o_orderkey, w,
        |  CAST(cum // (grand // 500) - (cum - w) // (grand // 500) AS BIGINT) AS n_picks
        |FROM c WHERE cum // (grand // 500) > (cum - w) // (grand // 500)""".stripMargin,

    // q125: q15's sessionization feeding rank-conditional MAX prefix
    // extraction; concat_ws drops nulls identically in both engines.
    "q125_session_paths" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events
        |), f AS (
        |  SELECT user_id, event_id, event_type, us,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM e
        |), s AS (
        |  SELECT user_id, event_id, event_type, us,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM f
        |), rn AS (
        |  SELECT user_id, session_seq, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, session_seq ORDER BY us, event_id) AS rn
        |  FROM s
        |), p AS (
        |  SELECT user_id, session_seq,
        |    MAX(CASE WHEN rn = 1 THEN event_type END) AS t1,
        |    MAX(CASE WHEN rn = 2 THEN event_type END) AS t2,
        |    MAX(CASE WHEN rn = 3 THEN event_type END) AS t3
        |  FROM rn WHERE rn <= 3 GROUP BY 1, 2
        |), c AS (
        |  SELECT concat_ws('>', t1, t2, t3) AS path, COUNT(*) AS n_sessions
        |  FROM p GROUP BY 1
        |), k AS (
        |  SELECT path, n_sessions,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path) AS BIGINT) AS rk
        |  FROM c
        |)
        |SELECT path, n_sessions, rk FROM k WHERE rk <= 20""".stripMargin,

    // q129: same Monday-start week truncation and churn posting rule.
    "q129_growth_accounting" ->
      """WITH aw AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events
        |), c AS (
        |  SELECT user_id, week,
        |    MIN(week) OVER (PARTITION BY user_id) AS first_week,
        |    LAG(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_week,
        |    LEAD(week) OVER (PARTITION BY user_id ORDER BY week) AS next_week
        |  FROM aw
        |), mx AS (SELECT MAX(week) AS max_week FROM aw),
        |cls AS (
        |  SELECT week,
        |    CASE WHEN week = first_week THEN 'new'
        |         WHEN prev_week = week - 7 THEN 'retained'
        |         ELSE 'resurrected' END AS kind
        |  FROM c
        |  UNION ALL
        |  SELECT week + 7 AS week, 'churned' AS kind
        |  FROM c, mx
        |  WHERE (next_week IS NULL OR next_week > week + 7) AND week + 7 <= mx.max_week
        |)
        |SELECT week,
        |  COUNT(*) FILTER (kind = 'new') AS n_new,
        |  COUNT(*) FILTER (kind = 'retained') AS n_retained,
        |  COUNT(*) FILTER (kind = 'resurrected') AS n_resurrected,
        |  COUNT(*) FILTER (kind = 'churned') AS n_churned
        |FROM cls GROUP BY 1""".stripMargin,

    // q130: identical lead gap in exact micros; last events excluded.
    "q130_state_dwell" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us,
        |    LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_us
        |  FROM events
        |)
        |SELECT event_type, COUNT(*) AS n_intervals,
        |  CAST(SUM(next_us - us) AS BIGINT) AS total_us,
        |  CAST(SUM(next_us - us) AS DOUBLE) / COUNT(*) AS mean_us
        |FROM e WHERE next_us IS NOT NULL GROUP BY 1""".stripMargin,

    // q131: the same three boundary ladders (cum over distinct values,
    // ceil(n·k/5.0) picks) and inverted recency digit.
    "q131_rfm_segments" ->
      """WITH base AS (
        |  SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_date, COUNT(*) AS freq,
        |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)) AS mon_c
        |  FROM orders GROUP BY 1
        |), a AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS anchor FROM orders),
        |b AS (SELECT base.*, CAST(anchor - last_date AS BIGINT) AS rec_days FROM base, a),
        |n AS (SELECT COUNT(*) AS n FROM b),
        |rd AS (SELECT rec_days AS v, COUNT(*) AS cnt FROM b GROUP BY 1),
        |rc AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum FROM rd),
        |rb AS (SELECT MIN(CASE WHEN cum >= CEIL(n*1/5.0) THEN v END) AS rb1,
        |              MIN(CASE WHEN cum >= CEIL(n*2/5.0) THEN v END) AS rb2,
        |              MIN(CASE WHEN cum >= CEIL(n*3/5.0) THEN v END) AS rb3,
        |              MIN(CASE WHEN cum >= CEIL(n*4/5.0) THEN v END) AS rb4 FROM rc, n),
        |fd AS (SELECT freq AS v, COUNT(*) AS cnt FROM b GROUP BY 1),
        |fc AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum FROM fd),
        |fb AS (SELECT MIN(CASE WHEN cum >= CEIL(n*1/5.0) THEN v END) AS fb1,
        |              MIN(CASE WHEN cum >= CEIL(n*2/5.0) THEN v END) AS fb2,
        |              MIN(CASE WHEN cum >= CEIL(n*3/5.0) THEN v END) AS fb3,
        |              MIN(CASE WHEN cum >= CEIL(n*4/5.0) THEN v END) AS fb4 FROM fc, n),
        |md AS (SELECT mon_c AS v, COUNT(*) AS cnt FROM b GROUP BY 1),
        |mc AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum FROM md),
        |mb AS (SELECT MIN(CASE WHEN cum >= CEIL(n*1/5.0) THEN v END) AS mb1,
        |              MIN(CASE WHEN cum >= CEIL(n*2/5.0) THEN v END) AS mb2,
        |              MIN(CASE WHEN cum >= CEIL(n*3/5.0) THEN v END) AS mb3,
        |              MIN(CASE WHEN cum >= CEIL(n*4/5.0) THEN v END) AS mb4 FROM mc, n),
        |s AS (
        |  SELECT o_custkey,
        |    6 - (1 + (rb1 < rec_days)::INT + (rb2 < rec_days)::INT
        |           + (rb3 < rec_days)::INT + (rb4 < rec_days)::INT) AS r_score,
        |    1 + (fb1 < freq)::INT + (fb2 < freq)::INT
        |      + (fb3 < freq)::INT + (fb4 < freq)::INT AS f_score,
        |    1 + (mb1 < mon_c)::INT + (mb2 < mon_c)::INT
        |      + (mb3 < mon_c)::INT + (mb4 < mon_c)::INT AS m_score
        |  FROM b, rb, fb, mb
        |)
        |SELECT o_custkey, r_score, f_score, m_score,
        |  r_score*100 + f_score*10 + m_score AS segment FROM s""".stripMargin,

    // q132: identical integral nearest-rank picks per priority.
    "q132_ship_lag" ->
      """WITH l AS (
        |  SELECT o_orderpriority AS priority,
        |    CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS BIGINT) AS lag_days,
        |    l_orderkey, l_linenumber
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |), r AS (
        |  SELECT priority, lag_days,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY priority ORDER BY lag_days, l_orderkey, l_linenumber) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY priority) AS BIGINT) AS n
        |  FROM l
        |)
        |SELECT priority, COUNT(*) AS n_items,
        |  MAX(CASE WHEN rn = (n + 1) // 2 THEN lag_days END) AS p50_days,
        |  MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN lag_days END) AS p90_days
        |FROM r GROUP BY 1""".stripMargin,

    // q133: one global cumulative window stands in for bucketedPrefix;
    // integer tenths thresholds.
    "q133_abc_classification" ->
      """WITH rev AS (
        |  SELECT l_partkey AS part,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem GROUP BY 1
        |), t AS (SELECT SUM(rev_c) AS grand FROM rev),
        |c AS (
        |  SELECT part, rev_c,
        |    SUM(rev_c) OVER (ORDER BY rev_c DESC, part ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM rev
        |)
        |SELECT CASE WHEN cum * 10 <= grand * 7 THEN 'A'
        |            WHEN cum * 10 <= grand * 9 THEN 'B' ELSE 'C' END AS abc_class,
        |  COUNT(*) AS n_parts, CAST(SUM(rev_c) AS BIGINT) AS rev_c,
        |  CAST(SUM(rev_c) AS DOUBLE) / CAST(MAX(grand) AS DOUBLE) AS share
        |FROM c, t GROUP BY 1""".stripMargin,

    // q134: adjacent-order lag screen with the same integer 5% rule.
    "q134_duplicate_charges" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders
        |), l AS (
        |  SELECT o_custkey, cents, o_orderkey, d,
        |    LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS prev_key,
        |    LAG(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS prev_d,
        |    LAG(cents) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS prev_c
        |  FROM o
        |)
        |SELECT o_custkey, prev_key, o_orderkey, prev_c, cents,
        |  CAST(d - prev_d AS BIGINT) AS gap_days
        |FROM l WHERE prev_key IS NOT NULL AND d - prev_d <= 30
        |  AND ABS(cents - prev_c) * 20 <= prev_c""".stripMargin,

    // q139: isodow matches Spark's weekday()+1 — the engines' default
    // dayofweek functions number weeks differently.
    "q139_weekday_profile" ->
      """WITH c AS (
        |  SELECT event_type, CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS isodow,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, isodow, n,
        |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE) AS share
        |FROM c""".stripMargin,

    // q147: both distinct counts via the bounded contribution explode.
    "q147_stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |obs AS (SELECT DISTINCT day AS report_day FROM ud),
        |dau AS (SELECT day AS report_day, COUNT(*) AS dau FROM ud GROUP BY 1),
        |mau AS (
        |  SELECT report_day, COUNT(*) AS mau FROM (
        |    SELECT DISTINCT user_id, day + CAST(k AS INT) AS report_day
        |    FROM ud, (SELECT unnest(range(0, 30)) AS k) ks
        |    WHERE day + CAST(k AS INT) IN (SELECT report_day FROM obs)
        |  ) GROUP BY 1
        |)
        |SELECT d.report_day, d.dau, m.mau,
        |  CAST(d.dau AS DOUBLE) / CAST(m.mau AS DOUBLE) AS stickiness
        |FROM dau d JOIN mau m ON d.report_day = m.report_day""".stripMargin,

    // q148: one global cumulative window stands in for bucketedPrefix;
    // same (d, delta, key) total order, ends-at-day+1 netting.
    "q148_order_backlog" ->
      """WITH spans AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS open_d,
        |    close_d
        |  FROM orders JOIN (
        |    SELECT l_orderkey,
        |      CAST(MAX(CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS BIGINT) AS close_d
        |    FROM lineitem GROUP BY 1) ls ON o_orderkey = l_orderkey
        |), bounds AS (
        |  SELECT o_orderkey, open_d AS d, CAST(1 AS BIGINT) AS delta FROM spans
        |  UNION ALL
        |  SELECT o_orderkey, close_d + 1 AS d, CAST(-1 AS BIGINT) AS delta FROM spans
        |)
        |SELECT d, o_orderkey, delta,
        |  CAST(SUM(delta) OVER (ORDER BY d, delta, o_orderkey
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS backlog
        |FROM bounds""".stripMargin,

    // q149: identical integral ceil cut ranks; share is one division.
    "q149_revenue_concentration" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS rev_c
        |  FROM orders GROUP BY 1
        |), tot AS (SELECT COUNT(*) AS n_cust, SUM(rev_c) AS grand FROM rev),
        |rk AS (
        |  SELECT o_custkey, rev_c,
        |    CAST(ROW_NUMBER() OVER (ORDER BY rev_c DESC, o_custkey) AS BIGINT) AS rank
        |  FROM rev
        |)
        |SELECT t.tier_pct, COUNT(*) AS n_customers,
        |  CAST(SUM(rev_c) AS BIGINT) AS tier_rev_c,
        |  CAST(SUM(rev_c) AS DOUBLE) / CAST(MAX(grand) AS DOUBLE) AS share
        |FROM rk, tot, (SELECT CAST(unnest([1, 5, 20]) AS BIGINT) AS tier_pct) t
        |WHERE rank <= (t.tier_pct * n_cust + 99) // 100
        |GROUP BY 1""".stripMargin,

    // q154: identical integer gap moments and four-op double CV chain.
    "q154_purchase_regularity" ->
      """WITH g AS (
        |  SELECT o_custkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    o_orderkey
        |  FROM orders
        |), gp AS (
        |  SELECT o_custkey,
        |    d - LAG(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS gap
        |  FROM g
        |), m AS (
        |  SELECT o_custkey, COUNT(*) AS n,
        |    CAST(SUM(gap) AS BIGINT) AS s1, CAST(SUM(gap * gap) AS BIGINT) AS s2
        |  FROM gp WHERE gap IS NOT NULL GROUP BY 1 HAVING COUNT(*) >= 2
        |)
        |SELECT o_custkey, n AS n_gaps,
        |  CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_gap_days,
        |  CASE WHEN s1 = 0 THEN NULL ELSE
        |    sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
        |    / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) END AS cv
        |FROM m""".stripMargin,

    // q155: the same distinct-cents boundary ladder and band rule.
    "q155_price_band_mix" ->
      """WITH c AS (
        |  SELECT o_orderkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders
        |), n AS (SELECT COUNT(*) AS n FROM c),
        |dist AS (SELECT c.c, COUNT(*) AS cnt FROM c GROUP BY 1),
        |cum AS (SELECT c, SUM(cnt) OVER (ORDER BY c) AS cum FROM dist),
        |b AS (
        |  SELECT MIN(CASE WHEN cum >= CEIL(n * 1 / 5.0) THEN c END) AS b1,
        |    MIN(CASE WHEN cum >= CEIL(n * 2 / 5.0) THEN c END) AS b2,
        |    MIN(CASE WHEN cum >= CEIL(n * 3 / 5.0) THEN c END) AS b3,
        |    MIN(CASE WHEN cum >= CEIL(n * 4 / 5.0) THEN c END) AS b4
        |  FROM cum, n
        |), banded AS (
        |  SELECT month,
        |    1 + (b1 < c.c)::INT + (b2 < c.c)::INT + (b3 < c.c)::INT + (b4 < c.c)::INT AS band
        |  FROM c, b
        |), mc AS (
        |  SELECT month, CAST(band AS BIGINT) AS band, COUNT(*) AS n FROM banded GROUP BY 1, 2
        |)
        |SELECT month, band, n,
        |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY month) AS DOUBLE) AS share
        |FROM mc""".stripMargin,

    // q156: same integer month offsets and monotone cum pick.
    "q156_ltv_curve" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CAST(EXTRACT(YEAR FROM o_orderdate) * 12 + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS ym,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders
        |), c AS (
        |  SELECT o_custkey, ym,
        |    SUM(cents) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey
        |      ROWS UNBOUNDED PRECEDING) AS cum_c,
        |    ym - MIN(ym) OVER (PARTITION BY o_custkey) AS offset_m
        |  FROM o
        |), per AS (
        |  SELECT o_custkey, offset_m, MAX(cum_c) AS cum_at_offset
        |  FROM c GROUP BY 1, 2
        |)
        |SELECT offset_m, COUNT(*) AS n_customers,
        |  CAST(SUM(cum_at_offset) AS DOUBLE) / COUNT(*) / 100.0 AS avg_cum_spend
        |FROM per GROUP BY 1""".stripMargin,

    // q158: distinct (order, family) pairs; directional conditionals.
    "q158_cross_sell" ->
      """WITH f AS (
        |  SELECT DISTINCT l_orderkey AS o, string_split(p_name, ' ')[1] AS family
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |), n AS (SELECT family, COUNT(*) AS n_a FROM f GROUP BY 1),
        |ab AS (
        |  SELECT a.family AS family_a, b.family AS family_b, COUNT(*) AS n_ab
        |  FROM f a JOIN f b ON a.o = b.o AND a.family <> b.family
        |  GROUP BY 1, 2
        |)
        |SELECT family_a, family_b, n_ab, n_a,
        |  CAST(n_ab AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_b_given_a
        |FROM ab JOIN n ON family_a = n.family""".stripMargin,

    // q159: q40's buckets, exact shares, decimal-routed means.
    "q159_split_balance" ->
      """WITH b AS (
        |  SELECT doc_id, n_chars,
        |    CAST('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 AS bucket
        |  FROM documents
        |), s AS (
        |  SELECT CASE WHEN bucket < 80 THEN 'train'
        |              WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
        |    n_chars FROM b
        |), t AS (SELECT COUNT(*) AS n_total FROM b)
        |SELECT split, COUNT(*) AS n_docs,
        |  CAST(COUNT(*) AS DOUBLE) / CAST(MAX(n_total) AS DOUBLE) AS share,
        |  CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*) AS mean_chars
        |FROM s, t GROUP BY 1""".stripMargin,

    // q161: one global (rank, cum) window stands in for the
    // struct-valued bucketed prefix; identical decile cut ranks.
    "q161_lorenz_curve" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS rev_c
        |  FROM orders GROUP BY 1
        |), tot AS (SELECT COUNT(*) AS n_cust, SUM(rev_c) AS grand FROM rev),
        |rk AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY rev_c, o_custkey) AS BIGINT) AS rank,
        |    CAST(SUM(rev_c) OVER (ORDER BY rev_c, o_custkey
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c
        |  FROM rev
        |)
        |SELECT CAST(d.d AS BIGINT) AS decile, rank AS n_cust_cum, cum_c,
        |  CAST(cum_c AS DOUBLE) / CAST(grand AS DOUBLE) AS cum_share
        |FROM rk, tot, (SELECT unnest(range(1, 11)) AS d) d
        |WHERE rank = (d.d * n_cust + 9) // 10""".stripMargin,

    // q162: distinct same-day purchases, per-(customer, family) lags,
    // integral median rank per family.
    "q162_repurchase_cycle" ->
      """WITH p AS (
        |  SELECT DISTINCT o_custkey, string_split(p_name, ' ')[1] AS family,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |), g AS (
        |  SELECT o_custkey, family, d,
        |    d - LAG(d) OVER (PARTITION BY o_custkey, family ORDER BY d) AS gap
        |  FROM p
        |), r AS (
        |  SELECT family, gap,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY family ORDER BY gap, o_custkey, d) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY family) AS BIGINT) AS n
        |  FROM g WHERE gap IS NOT NULL
        |)
        |SELECT family, COUNT(*) AS n_gaps,
        |  MAX(CASE WHEN rn = (n + 1) // 2 THEN gap END) AS median_gap_days
        |FROM r GROUP BY 1""".stripMargin,

    // q168: the same two nearest-rank picks and integer fence.
    "q168_volume_anomalies" ->
      """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY 1
        |), r AS (
        |  SELECT day, n,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n, day) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS cnt
        |  FROM d
        |), m AS (
        |  SELECT day, n, cnt,
        |    MAX(CASE WHEN rn = (cnt + 1) // 2 THEN n END) OVER () AS med
        |  FROM r
        |), dv AS (
        |  SELECT day, n, cnt, med, ABS(n - med) AS dev,
        |    CAST(ROW_NUMBER() OVER (ORDER BY ABS(n - med), day) AS BIGINT) AS drn
        |  FROM m
        |), md AS (
        |  SELECT day, n, med, dev,
        |    MAX(CASE WHEN drn = (cnt + 1) // 2 THEN dev END) OVER () AS mad
        |  FROM dv
        |)
        |SELECT day, CAST(n AS BIGINT) AS n, CAST(med AS BIGINT) AS med,
        |  CAST(mad AS BIGINT) AS mad, CAST(dev AS BIGINT) AS dev
        |FROM md WHERE dev > 3 * mad""".stripMargin,

    // q172: distinct family breadth per customer; same bucket rules.
    "q172_category_breadth" ->
      """WITH cf AS (
        |  SELECT DISTINCT o_custkey, string_split(p_name, ' ')[1] AS family
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |), nb AS (
        |  SELECT o_custkey, COUNT(*) AS n_families FROM cf GROUP BY 1
        |), cr AS (
        |  SELECT o_custkey,
        |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS rev_c
        |  FROM orders GROUP BY 1
        |)
        |SELECT CASE WHEN n_families <= 2 THEN 'specialist'
        |            WHEN n_families <= 5 THEN 'regular' ELSE 'explorer' END AS breadth,
        |  COUNT(*) AS n_customers, CAST(SUM(rev_c) AS BIGINT) AS rev_c
        |FROM nb JOIN cr USING (o_custkey) GROUP BY 1""".stripMargin,

    // q173: same integral p50 pick per quarter.
    "q173_median_order_trend" ->
      """WITH q AS (
        |  SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter,
        |    o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders
        |), r AS (
        |  SELECT quarter, cents,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY quarter ORDER BY cents, o_orderkey) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY quarter) AS BIGINT) AS n
        |  FROM q
        |)
        |SELECT quarter, COUNT(*) AS n_orders,
        |  CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS DOUBLE) / 100.0
        |    AS median_value
        |FROM r GROUP BY 1""".stripMargin,

    // q178: weekly distinct-type cohorts with exact volume ratios.
    "q178_engagement_diversity" ->
      """WITH u AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week,
        |    COUNT(DISTINCT event_type) AS n_types, COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT CAST(n_types AS BIGINT) AS n_types, COUNT(*) AS n_user_weeks,
        |  CAST(SUM(n_events) AS BIGINT) AS n_events,
        |  CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS mean_events
        |FROM u GROUP BY 1""".stripMargin,

    // q179: same week-wide capped buckets.
    "q179_gap_histogram" ->
      """WITH g AS (
        |  SELECT o_custkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    o_orderkey
        |  FROM orders
        |), gp AS (
        |  SELECT d - LAG(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS gap
        |  FROM g
        |)
        |SELECT LEAST(gap // 7, 26) AS week_bucket, COUNT(*) AS n_gaps
        |FROM gp WHERE gap IS NOT NULL GROUP BY 1""".stripMargin,

    // q180: q97's moment discipline; VARCHAR route for the
    // correctly-rounded int128->double conversions.
    "q180_size_revenue_corr" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS HUGEINT)) AS y
        |  FROM lineitem GROUP BY 1
        |), j AS (
        |  SELECT p_brand, CAST(p_size AS HUGEINT) AS x, y
        |  FROM rev JOIN part ON l_partkey = p_partkey
        |), m AS (
        |  SELECT p_brand, COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx,
        |    SUM(x * y) AS sxy, SUM(y * y) AS syy
        |  FROM j GROUP BY 1
        |), d AS (
        |  SELECT p_brand, n,
        |    CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS cov,
        |    CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS vx,
        |    CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS vy
        |  FROM m
        |)
        |SELECT p_brand, n,
        |  CASE WHEN vx = 0 OR vy = 0 THEN NULL
        |       ELSE cov / (sqrt(vx) * sqrt(vy)) END AS corr
        |FROM d""".stripMargin,

    // q184: first-quarter reduce + tiny cumulative.
    "q184_acquisition_curve" ->
      """WITH f AS (
        |  SELECT o_custkey, MIN(CAST(date_trunc('quarter', o_orderdate) AS DATE)) AS quarter
        |  FROM orders GROUP BY 1
        |), q AS (SELECT quarter, COUNT(*) AS n_new FROM f GROUP BY 1)
        |SELECT quarter, n_new,
        |  CAST(SUM(n_new) OVER (ORDER BY quarter ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS cum_customers
        |FROM q""".stripMargin,

    // q185: exact cents over exact distinct actives.
    "q185_arpu_trend" ->
      """SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter,
        |  COUNT(DISTINCT o_custkey) AS n_active,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)
        |    / COUNT(DISTINCT o_custkey) / 100.0 AS arpu
        |FROM orders GROUP BY 1""".stripMargin,

    // q186: q130's lead gap keyed to the destination type.
    "q186_pre_transition_dwell" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_us,
        |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_type
        |  FROM events
        |)
        |SELECT next_type, COUNT(*) AS n_intervals,
        |  CAST(SUM(next_us - us) AS BIGINT) AS total_us,
        |  CAST(SUM(next_us - us) AS DOUBLE) / COUNT(*) AS mean_us
        |FROM e WHERE next_us IS NOT NULL GROUP BY 1""".stripMargin,

    // q188: the same distinct-cents boundary ladder over unit prices.
    "q188_qty_by_price_band" ->
      """WITH r AS (
        |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS q
        |  FROM lineitem
        |), n AS (SELECT COUNT(*) AS n FROM r),
        |dist AS (SELECT c, COUNT(*) AS cnt FROM r GROUP BY 1),
        |cum AS (SELECT c, SUM(cnt) OVER (ORDER BY c) AS cum FROM dist),
        |b AS (
        |  SELECT MIN(CASE WHEN cum >= CEIL(n * 1 / 5.0) THEN c END) AS b1,
        |    MIN(CASE WHEN cum >= CEIL(n * 2 / 5.0) THEN c END) AS b2,
        |    MIN(CASE WHEN cum >= CEIL(n * 3 / 5.0) THEN c END) AS b3,
        |    MIN(CASE WHEN cum >= CEIL(n * 4 / 5.0) THEN c END) AS b4
        |  FROM cum, n
        |)
        |SELECT CAST(1 + (b1 < c)::INT + (b2 < c)::INT + (b3 < c)::INT + (b4 < c)::INT AS BIGINT) AS band,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(q) AS DOUBLE) / COUNT(*) / 100.0 AS mean_qty
        |FROM r, b GROUP BY 1""".stripMargin,

    // q189: same first/last picks and integer ratio tests.
    "q189_expansion_cohorts" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders
        |), r AS (
        |  SELECT o_custkey, c,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS rn,
        |    COUNT(*) OVER (PARTITION BY o_custkey) AS n,
        |    FIRST_VALUE(c) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey
        |      ROWS UNBOUNDED PRECEDING) AS first_c
        |  FROM o
        |)
        |SELECT CASE WHEN n = 1 THEN 'single_order'
        |            WHEN c >= first_c * 2 THEN 'expanding'
        |            WHEN c * 2 <= first_c THEN 'contracting'
        |            ELSE 'stable' END AS cohort,
        |  COUNT(*) AS n_customers
        |FROM r WHERE rn = n GROUP BY 1""".stripMargin,

    // q283: fixed-point PageRank (3 supersteps, damping 0.85) over the
    // q121 support-2 co-purchase edge relation, symmetrized; all
    // arithmetic on the integer ppb grid (contrib = r // outdeg,
    // r' = 0.15e9 + (85 * inflow) // 100) so both engines agree bit-for-bit.
    "q283_pagerank" ->
      """WITH baskets AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |freq AS (SELECT p FROM baskets GROUP BY 1 HAVING COUNT(*) >= 2),
        |fb AS (SELECT o, p FROM baskets WHERE p IN (SELECT p FROM freq)),
        |ed AS (
        |  SELECT a.p AS a, b.p AS b
        |  FROM fb a JOIN fb b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |),
        |sym AS (SELECT a AS src, b AS dst FROM ed
        |        UNION ALL SELECT b AS src, a AS dst FROM ed),
        |deg AS (SELECT src, COUNT(*) AS outdeg FROM sym GROUP BY 1),
        |r0 AS (SELECT src AS node, CAST(1000000000 AS HUGEINT) AS r FROM deg),
        |i1 AS (
        |  SELECT s.dst AS node,
        |    150000000 + (85 * SUM(r.r // d.outdeg)) // 100 AS r
        |  FROM sym s JOIN deg d ON d.src = s.src JOIN r0 r ON r.node = s.src
        |  GROUP BY 1
        |),
        |i2 AS (
        |  SELECT s.dst AS node,
        |    150000000 + (85 * SUM(r.r // d.outdeg)) // 100 AS r
        |  FROM sym s JOIN deg d ON d.src = s.src JOIN i1 r ON r.node = s.src
        |  GROUP BY 1
        |),
        |i3 AS (
        |  SELECT s.dst AS node,
        |    150000000 + (85 * SUM(r.r // d.outdeg)) // 100 AS r
        |  FROM sym s JOIN deg d ON d.src = s.src JOIN i2 r ON r.node = s.src
        |  GROUP BY 1
        |)
        |SELECT i3.node AS part, d.outdeg, CAST(i3.r AS BIGINT) AS rank_ppb
        |FROM i3 JOIN deg d ON d.src = i3.node""".stripMargin,
  )
}
