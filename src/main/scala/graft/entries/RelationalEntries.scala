package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Advanced, Corpus, Dedup, Multimodal, Prep, Quality, Relational, Similarity, TextAnalysis, Warehouse}
import graft.sources.Tables

/** Relational family: `SparkEntry.queries` registrations + their DuckDB
  * oracles (round-17 verdict task 6 — the 8k-line single-file registry
  * split per family; `SparkEntry` folds every family back into the one
  * driver-contract map, and OracleCoverageSpec still guards that every
  * query has its oracle).
  */
private[graft] object RelationalEntries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_filter_project" -> (Relational.scanFilterProject _),
    "q02_agg_pricing_summary" -> (Relational.aggPricingSummary _),
    "q03_join_enrich_broadcast" -> (Relational.joinEnrichBroadcast _),
    "q04_join_multi_revenue" -> (Relational.joinMultiRevenue _),
    "q05_status_bands" -> (Relational.statusBands _),
    "q06_latest_state_per_key" -> (Relational.latestStatePerKey _),
    "q07_row_to_json" -> (Relational.rowToJson _),
    "q08_cast_projection" -> (Relational.castProjection _),
    "q09_topk_orders" -> (Relational.topKOrders _),
    "q10_semi_join_active" -> (Relational.semiJoinActiveCustomers _),
    "q11_anti_join_dormant" -> (Relational.antiJoinDormantCustomers _),
    "q12_distinct_user_events" -> (Relational.distinctUserEvents _),
    "q13_window_tumbling_daily" -> (Relational.windowTumblingDaily _),
    "q14_union_high_low" -> (Relational.unionHighLowValue _),
    "q15_sessionize" -> (Relational.sessionize _),
    "q43_intersect_users" -> (Relational.intersectUsers _),
    "q44_except_users" -> (Relational.exceptUsers _),
    "q45_pivot_event_counts" -> (Relational.pivotEventCounts _),
    "q46_full_outer_activity" -> (Relational.fullOuterActivity _),
    "q47_grouping_sets" -> (Relational.groupingSetsRevenue _),
    "q90_null_semantics" -> (Relational.nullSemantics _),
    "q93_unpivot_metrics" -> ((s, d) => Relational.unpivotMetrics(s, d)),
    "q135_local_supplier_revenue" -> ((s, d) => Relational.localSupplierRevenue(s, d)),
    "q136_market_share" -> ((s, d) => Relational.marketShare(s, d)),
    "q137_part_velocity" -> ((s, d) => Relational.partVelocity(s, d)),
    "q145_part_family" -> ((s, d) => Relational.partFamilyRollup(s, d)),
    "q146_supplier_standing" -> ((s, d) => Relational.supplierStanding(s, d)),
    "q169_trade_flows" -> ((s, d) => Relational.tradeFlows(s, d)),
    "q181_brand_share" -> ((s, d) => Relational.brandShare(s, d)),
    "q182_line_dominance" -> ((s, d) => Relational.lineDominance(s, d)),
    "q183_export_diversity" -> ((s, d) => Relational.supplierExportDiversity(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity AS qty, l_extendedprice AS price
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'""".stripMargin,

    "q02_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q03_join_enrich_broadcast" ->
      """SELECT event_id, user_id, event_type, value, c_name, c_mktsegment
        |FROM events JOIN customer ON user_id = c_custkey""".stripMargin,

    "q04_join_multi_revenue" ->
      """SELECT r_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "q05_status_bands" ->
      """SELECT event_id, user_id, event_type, value, c_name, n_name,
        |  CASE WHEN value > c_acctbal THEN 'OVER'
        |       WHEN c_acctbal - value < 100 THEN 'NEAR'
        |       ELSE 'UNDER' END AS acct_status,
        |  CASE WHEN value < 50 THEN 'LOW'
        |       WHEN value < 150 THEN 'MID'
        |       ELSE 'HIGH' END AS value_band,
        |  CASE WHEN value = 0 THEN 'DEAD' ELSE 'ALIVE' END AS liveness
        |FROM events
        |JOIN customer ON user_id = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey""".stripMargin,

    "q06_latest_state_per_key" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1""".stripMargin,

    "q07_row_to_json" ->
      """SELECT event_id,
        |  CAST(to_json(struct_pack(event_id := event_id, user_id := user_id, event_type := event_type)) AS VARCHAR) AS payload
        |FROM events""".stripMargin,

    "q08_cast_projection" ->
      """SELECT c_custkey,
        |  CAST(c_custkey AS VARCHAR) AS key_str,
        |  CAST(c_nationkey AS BIGINT) AS nation_big,
        |  CAST(c_acctbal AS VARCHAR) AS bal_str
        |FROM customer""".stripMargin,

    "q09_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q10_semi_join_active" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q11_anti_join_dormant" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q12_distinct_user_events" ->
      "SELECT DISTINCT user_id, event_type FROM events",

    "q13_window_tumbling_daily" ->
      """SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q14_union_high_low" ->
      """SELECT user_id, bucket, COUNT(*) AS n FROM (
        |  SELECT user_id, 'high' AS bucket FROM events WHERE value >= 200
        |  UNION ALL
        |  SELECT user_id, 'low' AS bucket FROM events WHERE value < 20
        |) GROUP BY user_id, bucket""".stripMargin,

    "q15_sessionize" ->
      """WITH w AS (
        |  SELECT user_id, ts, event_id, value,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), f AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |                   OR CAST(FLOOR(epoch(ts)) AS BIGINT) - CAST(FLOOR(epoch(prev_ts)) AS BIGINT) > 1800
        |                 THEN 1 ELSE 0 END AS new_session
        |  FROM w
        |), g AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM f
        |)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM g GROUP BY user_id, session_seq""".stripMargin,

    "q43_intersect_users" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'purchase'""".stripMargin,

    "q44_except_users" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'purchase'""".stripMargin,

    "q45_pivot_event_counts" ->
      """SELECT user_id,
        |  NULLIF(COUNT(CASE WHEN event_type = 'click' THEN 1 END), 0) AS click_n,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click_val,
        |  NULLIF(COUNT(CASE WHEN event_type = 'error' THEN 1 END), 0) AS error_n,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error_val,
        |  NULLIF(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS purchase_n,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_val,
        |  NULLIF(COUNT(CASE WHEN event_type = 'signup' THEN 1 END), 0) AS signup_n,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup_val,
        |  NULLIF(COUNT(CASE WHEN event_type = 'view' THEN 1 END), 0) AS view_n,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view_val
        |FROM events GROUP BY user_id""".stripMargin,

    "q46_full_outer_activity" ->
      """SELECT cust, COALESCE(n_orders, 0) AS n_orders, COALESCE(n_events, 0) AS n_events
        |FROM (SELECT o_custkey AS cust, COUNT(*) AS n_orders FROM orders GROUP BY 1) o
        |FULL JOIN (SELECT user_id AS cust, COUNT(*) AS n_events FROM events GROUP BY 1) e
        |USING (cust)""".stripMargin,

    "q47_grouping_sets" ->
      """SELECT n_name, o_orderstatus,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, COUNT(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name, o_orderstatus), (n_name), (o_orderstatus))""".stripMargin,

    // q90: pins the three standard null behaviors the Spark side relies
    // on — GROUP BY folds nulls into one group, COUNT(*) vs COUNT(col),
    // and IS NOT DISTINCT FROM (Spark's <=>) matching the null group.
    "q90_null_semantics" ->
      """WITH k AS (
        |  SELECT CASE WHEN event_type = 'view' THEN NULL
        |              ELSE event_type END AS key
        |  FROM events
        |), agg AS (
        |  SELECT key, COUNT(*) AS n_rows, COUNT(key) AS n_nonnull
        |  FROM k GROUP BY key
        |), dim(dkey, dim_id) AS (
        |  VALUES ('click', CAST(1 AS BIGINT)), (NULL, CAST(2 AS BIGINT))
        |)
        |SELECT key, n_rows, n_nonnull, dim_id
        |FROM agg LEFT JOIN dim ON agg.key IS NOT DISTINCT FROM dim.dkey""".stripMargin,

    // q93: UNPIVOT as the portable UNION ALL form; metric labels are the
    // source column names, matching Spark's unpivot variable column.
    "q93_unpivot_metrics" ->
      """WITH m AS (
        |  SELECT 'l_quantity' AS metric, l_quantity AS v FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
        |)
        |SELECT metric, COUNT(*) AS n,
        |  CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM m GROUP BY metric""".stripMargin,

    // q135: the same 6-table star with exact decimal discount math.
    "q135_local_supplier_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin,

    // q136: numerator and denominator in one exact-decimal pass, one
    // double division per year.
    "q136_market_share" ->
      """SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_rev,
        |  CAST(SUM(CASE WHEN n_name = 'NATION_2'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_rev,
        |  CAST(SUM(CASE WHEN n_name = 'NATION_2'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |GROUP BY 1""".stripMargin,

    // q137: quarter rank + part lag with the delta computed before the
    // top-100 cut.
    "q137_part_velocity" ->
      """WITH q AS (
        |  SELECT l_partkey AS part, CAST(date_trunc('quarter', l_shipdate) AS DATE) AS quarter,
        |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS qty_c
        |  FROM lineitem GROUP BY 1, 2
        |), r AS (
        |  SELECT part, quarter, qty_c,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY quarter ORDER BY qty_c DESC, part) AS BIGINT) AS rank
        |  FROM q
        |), l AS (
        |  SELECT part, quarter, qty_c, rank,
        |    LAG(rank) OVER (PARTITION BY part ORDER BY quarter) AS prev_rank
        |  FROM r
        |)
        |SELECT part, quarter, qty_c, rank, prev_rank, prev_rank - rank AS rank_delta
        |FROM l WHERE rank <= 100""".stripMargin,

    // q145: leading-token family extraction, decimal-cents sums.
    "q145_part_family" ->
      """SELECT string_split(p_name, ' ')[1] AS family, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c,
        |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS qty_c
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1""".stripMargin,

    // q146: percent_rank's (rank-1)/(n-1) closed form is shared.
    "q146_supplier_standing" ->
      """SELECT s_suppkey, n_name, s_acctbal,
        |  PERCENT_RANK() OVER (PARTITION BY s_nationkey
        |    ORDER BY s_acctbal, s_suppkey) AS pr
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey""".stripMargin,

    // q169: Q7-shaped cross-border flows with exact decimal discounts.
    "q169_trade_flows" ->
      """SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ns ON s_nationkey = ns.n_nationkey
        |JOIN nation nc ON c_nationkey = nc.n_nationkey
        |WHERE ns.n_name <> nc.n_name
        |GROUP BY 1, 2""".stripMargin,

    // q181: two-level share with the same leader tie rule.
    "q181_brand_share" ->
      """WITH fb AS (
        |  SELECT string_split(p_name, ' ')[1] AS family, p_brand,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2
        |)
        |SELECT family, p_brand, rev_c,
        |  CAST(rev_c AS DOUBLE) / CAST(SUM(rev_c) OVER (PARTITION BY family) AS DOUBLE) AS share,
        |  ROW_NUMBER() OVER (PARTITION BY family ORDER BY rev_c DESC, p_brand) = 1 AS is_leader
        |FROM fb""".stripMargin,

    // q182: integer 2x compare for the 50% dominance band.
    "q182_line_dominance" ->
      """WITH o AS (
        |  SELECT l_orderkey, COUNT(*) AS n_lines,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS tot_c,
        |    CAST(MAX(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS max_c
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT CASE WHEN n_lines = 1 THEN 'single'
        |            WHEN max_c * 2 >= tot_c THEN 'dominant' ELSE 'spread' END AS band,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(max_c) AS DOUBLE) / CAST(SUM(tot_c) AS DOUBLE) AS pooled_max_share
        |FROM o GROUP BY 1""".stripMargin,

    // q183: q160's exact HHI over the supplier-nation flow counts.
    "q183_export_diversity" ->
      """WITH f AS (
        |  SELECT l_suppkey, c_nationkey, COUNT(*) AS n
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2
        |)
        |SELECT l_suppkey, COUNT(*) AS n_nations, CAST(SUM(n) AS BIGINT) AS n_items,
        |  CAST(SUM(n * n) AS DOUBLE) / CAST(SUM(n) * SUM(n) AS DOUBLE) AS hhi
        |FROM f GROUP BY 1""".stripMargin,
  )
}
