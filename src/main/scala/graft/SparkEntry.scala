package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a DuckDB-equivalent in `oracleSql` with
  * IDENTICAL output column names; floating-point aggregates are routed
  * through DECIMAL on both sides so results hash-match bit-for-bit
  * (see graft.functions.Exact).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The testdata analog of the reference's enrichment pipeline: stream
    * events ⋈ two dims → ordered CASE status bands
    * (reference: script/TributeStreamingJob.py:106-135).
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.statusBands(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
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
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
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
  )
}
