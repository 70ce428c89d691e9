package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Advanced, Corpus, Dedup, Multimodal, Prep, Quality, Relational, Similarity, TextAnalysis, Warehouse}
import graft.sources.Tables

/** Warehouse family: `SparkEntry.queries` registrations + their DuckDB
  * oracles (round-17 verdict task 6 — the 8k-line single-file registry
  * split per family; `SparkEntry` folds every family back into the one
  * driver-contract map, and OracleCoverageSpec still guards that every
  * query has its oracle).
  */
private[graft] object WarehouseEntries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_bucketed_join" -> ((s, d) => Warehouse.bucketedJoinRevenue(s, d)),
    "q75_scd2_history" -> (Warehouse.scd2History _),
    "q76_zorder_readback" -> ((s, d) => Warehouse.zorderReadback(s, d)),
    "q77_scd2_asof" -> ((s, d) => Warehouse.scd2AsOf(s, d)),
    "q86_compaction_readback" -> (Warehouse.compactionReadback _),
    "q89_schema_evolution" -> (Warehouse.schemaEvolutionReadback _),
    "q91_merge_upsert" -> ((s, d) => Warehouse.mergeUpsert(s, d)),
    "q92_snapshot_diff" -> ((s, d) => Warehouse.snapshotDiff(s, d)),
    "q106_incremental_rollup" -> ((s, d) => Warehouse.incrementalRollup(s, d)),
    "q123_month_end_balance" -> ((s, d) => Warehouse.monthEndBalance(s, d)),
    "q151_open_order_aging" -> ((s, d) => Warehouse.openOrderAging(s, d)),
    "q152_return_rates" -> ((s, d) => Warehouse.returnRates(s, d)),
    "q153_supply_risk" -> ((s, d) => Warehouse.supplyRisk(s, d)),
    "q157_shipment_stagger" -> ((s, d) => Warehouse.shipmentStagger(s, d)),
    "q163_sla_compliance" -> ((s, d) => Warehouse.slaCompliance(s, d)),
    "q164_dormant_parts" -> ((s, d) => Warehouse.dormantParts(s, d)),
    "q165_basket_sizes" -> ((s, d) => Warehouse.basketSizes(s, d)),
    "q166_supplier_scorecard" -> ((s, d) => Warehouse.supplierScorecard(s, d)),
    "q167_discount_effect" -> ((s, d) => Warehouse.discountEffect(s, d)),
    "q170_seasonality_index" -> ((s, d) => Warehouse.seasonalityIndex(s, d)),
    "q175_lag_by_basket" -> ((s, d) => Warehouse.lagByBasketSize(s, d)),
    "q176_weekend_mix" -> ((s, d) => Warehouse.weekendMix(s, d)),
    "q177_negative_balances" -> ((s, d) => Warehouse.negativeBalances(s, d)),
    "q192_incremental_mv" -> ((s, d) => Warehouse.incrementalMv(s, d)),
    "q253_dpp_revenue" -> ((s, d) => Warehouse.dppPrunedRevenue(s, d)),
    "q276_gdpr_erase" -> ((s, d) => Warehouse.gdprErase(s, d)),
    "q293_retention_sweep" -> ((s, d) => Warehouse.retentionSweep(s, d)),
  )

  def oracleSql: Map[String, String] = Map(

    // q70: the Spark side joins through bucketed catalog tables (zero
    // join-side exchanges — the write pre-shuffled); the answer must be
    // identical to the plain join, which is exactly what the oracle runs.
    "q70_bucketed_join" ->
      """SELECT c_nationkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey""".stripMargin,

    // q75: SCD2 intervals are a single LEAD window — directly
    // expressible; the tie-break on o_orderkey makes the versioning
    // total, so the hash compare is exact.
    "q75_scd2_history" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  o_orderdate AS valid_from,
        |  LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to,
        |  LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
        |FROM orders""".stripMargin,

    // q76: the result set is layout-independent — a plain filtered scan
    // answers it; the z-order LAYOUT benefit (file pruning) is measured
    // separately by WarehouseSpec's fileBoxes test.
    "q76_zorder_readback" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1995-07-01'
        |  AND o_custkey BETWEEN 100 AND 250""".stripMargin,

    // q77: the as-of probe against the q75 interval table — one version
    // per customer qualifies at any T, enforced by the half-open
    // [valid_from, valid_to) intervals.
    "q77_scd2_asof" ->
      """WITH h AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    o_orderdate AS valid_from,
        |    LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to
        |  FROM orders
        |)
        |SELECT o_custkey, o_orderkey, o_totalprice, valid_from, valid_to
        |FROM h
        |WHERE valid_from <= TIMESTAMP '1996-06-01'
        |  AND (valid_to IS NULL OR valid_to > TIMESTAMP '1996-06-01')""".stripMargin,

    // q86: the per-month aggregate is layout-independent — the oracle
    // recomputes it straight from the source; the compaction mechanics
    // (file count collapse, range clustering) are asserted by
    // WarehouseSpec, not the hash.
    "q86_compaction_readback" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY 1""".stripMargin,

    // q89: the aggregate is layout-independent — the oracle computes the
    // same per-priority rollup straight from the source, with the
    // pre-cutover rows (written in the v1 layout that predates the
    // priority column) foldered under the same sentinel mergeSchema
    // null-fills them into.
    "q89_schema_evolution" ->
      """SELECT CASE WHEN o_orderdate < TIMESTAMP '1995-01-01'
        |            THEN 'PRE_SCHEMA' ELSE o_orderpriority END AS priority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1""".stripMargin,

    // q91: the change batch is a pure function of the target (mod-7
    // updates, mod-97 re-keyed inserts, both inside the fixed key window
    // <= 10000 that keeps the batch constant-size at any SF), so the
    // oracle rebuilds it and applies MERGE semantics relationally.
    "q91_merge_upsert" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |), upd AS (
        |  SELECT o_orderkey, o_custkey AS u_custkey,
        |    o_totalprice * CAST(1.05 AS DOUBLE) AS u_price
        |  FROM t WHERE o_orderkey % 7 = 0 AND o_orderkey <= 10000
        |  UNION ALL
        |  SELECT o_orderkey + 6000000, o_custkey, CAST(100.0 AS DOUBLE)
        |  FROM t WHERE o_orderkey % 97 = 0 AND o_orderkey <= 10000
        |)
        |SELECT o_orderkey, o_custkey, o_totalprice, 'keep' AS action
        |FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |UNION ALL
        |SELECT t.o_orderkey, t.o_custkey, u.u_price, 'update'
        |FROM t JOIN upd u USING (o_orderkey)
        |UNION ALL
        |SELECT u.o_orderkey, u.u_custkey, u.u_price, 'insert'
        |FROM upd u WHERE u.o_orderkey NOT IN (SELECT o_orderkey FROM t)""".stripMargin,

    // q92: snapshot B is a pure function of A (mod-13 deletes, mod-5
    // reprices, mod-101 re-keyed inserts); the diff is the full outer
    // join keeping only changed keys.
    "q92_snapshot_diff" ->
      """WITH a AS (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |), b AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 10.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM a WHERE o_orderkey % 13 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 7000000, o_totalprice
        |  FROM a WHERE o_orderkey % 101 = 0
        |), j AS (
        |  SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        |    a.o_totalprice AS old_price, b.o_totalprice AS new_price
        |  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
        |)
        |SELECT o_orderkey, old_price, new_price,
        |  CASE WHEN old_price IS NULL THEN 'insert'
        |       WHEN new_price IS NULL THEN 'delete'
        |       WHEN old_price <> new_price THEN 'update' END AS change
        |FROM j
        |WHERE old_price IS NULL OR new_price IS NULL OR old_price <> new_price""".stripMargin,

    // q106: the oracle recomputes the rollup from scratch — incremental
    // merge of exact decimal partials must equal the full recompute.
    "q106_incremental_rollup" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1""".stripMargin,

    // q123: same last-per-month pick, month scaffold via
    // generate_series, and IGNORE NULLS carry-forward.
    "q123_month_end_balance" ->
      """WITH b AS (
        |  SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey, date_trunc('month', o_orderdate)
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders
        |), lb AS (SELECT o_custkey, month, cents FROM b WHERE rn = 1),
        |mm AS (SELECT MAX(month) AS mmax FROM lb),
        |f AS (SELECT o_custkey, MIN(month) AS m0 FROM lb GROUP BY 1),
        |sc AS (
        |  SELECT f.o_custkey,
        |    CAST(UNNEST(generate_series(CAST(f.m0 AS TIMESTAMP),
        |      CAST(mm.mmax AS TIMESTAMP), INTERVAL 1 MONTH)) AS DATE) AS month
        |  FROM f, mm
        |), cf AS (
        |  SELECT sc.o_custkey, sc.month,
        |    LAST_VALUE(lb.cents IGNORE NULLS) OVER (PARTITION BY sc.o_custkey
        |      ORDER BY sc.month ROWS UNBOUNDED PRECEDING) AS bal_c
        |  FROM sc LEFT JOIN lb ON sc.o_custkey = lb.o_custkey AND sc.month = lb.month
        |)
        |SELECT month, COUNT(*) AS n_custs, CAST(SUM(bal_c) AS DOUBLE) / 100.0 AS balance
        |FROM cf GROUP BY 1""".stripMargin,

    // q151: same horizon scalar and bucket boundaries.
    "q151_open_order_aging" ->
      """WITH ls AS (
        |  SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS close_d
        |  FROM lineitem GROUP BY 1
        |), h AS (SELECT MAX(close_d) AS h FROM ls)
        |SELECT CASE WHEN age_days <= 365 THEN '0-1y'
        |            WHEN age_days <= 1095 THEN '1-3y' ELSE '3y+' END AS age_bucket,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS value_c
        |FROM (
        |  SELECT o_totalprice,
        |    CAST(h - CAST(o_orderdate AS DATE) AS BIGINT) AS age_days
        |  FROM orders JOIN ls ON o_orderkey = l_orderkey, h
        |  WHERE close_d >= h
        |) GROUP BY 1""".stripMargin,

    // q152: exact integer numerators/denominators, one division each.
    "q152_return_rates" ->
      """WITH m AS (
        |  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
        |    COUNT(*) AS n_items,
        |    SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS qty_c,
        |    SUM(CASE WHEN l_returnflag = 'R'
        |      THEN CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END) AS ret_qty_c,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS rev_c,
        |    SUM(CASE WHEN l_returnflag = 'R'
        |      THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END) AS ret_rev_c
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT month, n_items,
        |  CAST(ret_qty_c AS DOUBLE) / CAST(qty_c AS DOUBLE) AS qty_return_rate,
        |  CAST(ret_rev_c AS DOUBLE) / CAST(rev_c AS DOUBLE) AS rev_return_rate
        |FROM m""".stripMargin,

    // q153: same sourcing buckets over distinct-supplier counts.
    "q153_supply_risk" ->
      """WITH p AS (
        |  SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS n_suppliers,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS rev_c
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT CASE WHEN n_suppliers <= 20 THEN 'concentrated'
        |            WHEN n_suppliers <= 30 THEN 'moderate' ELSE 'diversified' END AS sourcing,
        |  COUNT(*) AS n_parts, CAST(SUM(rev_c) AS BIGINT) AS rev_c
        |FROM p GROUP BY 1""".stripMargin,

    // q157: identical span/bucket rules.
    "q157_shipment_stagger" ->
      """WITH s AS (
        |  SELECT l_orderkey, COUNT(*) AS n_lines,
        |    CAST(MAX(CAST(l_shipdate AS DATE)) - MIN(CAST(l_shipdate AS DATE)) AS BIGINT) AS span_days
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT o_orderpriority AS priority,
        |  CASE WHEN n_lines = 1 THEN 'single_line'
        |       WHEN span_days = 0 THEN 'same_day' ELSE 'staggered' END AS profile,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(span_days) AS DOUBLE) / COUNT(*) AS mean_span_days
        |FROM orders JOIN s ON o_orderkey = l_orderkey
        |GROUP BY 1, 2""".stripMargin,

    // q163: same literal target table and integer lag compare.
    "q163_sla_compliance" ->
      """WITH l AS (
        |  SELECT o_orderpriority AS priority,
        |    CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS BIGINT) AS lag_days,
        |    CASE o_orderpriority WHEN '1-URGENT' THEN 60 WHEN '2-HIGH' THEN 90
        |      WHEN '3-MEDIUM' THEN 120 ELSE 180 END AS target_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |)
        |SELECT priority, CAST(MAX(target_days) AS BIGINT) AS target_days,
        |  COUNT(*) AS n_items,
        |  COUNT(*) FILTER (lag_days <= target_days) AS n_on_time,
        |  CAST(COUNT(*) FILTER (lag_days <= target_days) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS compliance
        |FROM l GROUP BY 1""".stripMargin,

    // q164: same horizon scalar and 365-day dormancy rule.
    "q164_dormant_parts" ->
      """WITH p AS (
        |  SELECT l_partkey, MAX(CAST(l_shipdate AS DATE)) AS last_ship,
        |    COUNT(*) AS n_lifetime,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem GROUP BY 1
        |), h AS (SELECT MAX(last_ship) AS h FROM p)
        |SELECT l_partkey, last_ship, n_lifetime, rev_c
        |FROM p, h WHERE h - last_ship > 365""".stripMargin,

    // q165: same per-order line counts and exact mean values.
    "q165_basket_sizes" ->
      """WITH b AS (
        |  SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem GROUP BY 1
        |)
        |SELECT n_lines, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)
        |    / COUNT(*) / 100.0 AS mean_value
        |FROM b JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    // q166: q163's target table per supplier; exact-integer ratios.
    "q166_supplier_scorecard" ->
      """WITH l AS (
        |  SELECT l_suppkey,
        |    CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS BIGINT) AS lag_days,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS rev_c,
        |    CASE o_orderpriority WHEN '1-URGENT' THEN 60 WHEN '2-HIGH' THEN 90
        |      WHEN '3-MEDIUM' THEN 120 ELSE 180 END AS target_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |)
        |SELECT l_suppkey, COUNT(*) AS n_items,
        |  CAST(SUM(rev_c) AS BIGINT) AS rev_c,
        |  CAST(SUM(lag_days) AS DOUBLE) / COUNT(*) AS mean_lag_days,
        |  CAST(COUNT(*) FILTER (lag_days <= target_days) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS on_time_share
        |FROM l GROUP BY 1""".stripMargin,

    // q167: basis-point bands; exact counts.
    "q167_discount_effect" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |    CASE WHEN CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT) = 0 THEN 'none'
        |         WHEN CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT) <= 500 THEN '1-5%'
        |         ELSE '6%+' END AS band
        |  FROM lineitem
        |)
        |SELECT band, COUNT(*) AS n_items,
        |  COUNT(*) FILTER (l_returnflag = 'R') AS n_returned,
        |  CAST(COUNT(*) FILTER (l_returnflag = 'R') AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS return_rate
        |FROM b GROUP BY 1""".stripMargin,

    // q170: exact cents share scaled by 12.
    "q170_seasonality_index" ->
      """WITH m AS (
        |  SELECT CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS month_of_year,
        |    COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM orders GROUP BY 1
        |)
        |SELECT month_of_year, n_orders, rev_c,
        |  CAST(rev_c AS DOUBLE) / CAST(SUM(rev_c) OVER () AS DOUBLE) * 12.0
        |    AS seasonality_index
        |FROM m""".stripMargin,

    // q175: same buckets and exact lag moments.
    "q175_lag_by_basket" ->
      """WITH p AS (
        |  SELECT l_orderkey, COUNT(*) AS n_lines,
        |    MAX(CAST(l_shipdate AS DATE)) AS last_ship
        |  FROM lineitem GROUP BY 1
        |), j AS (
        |  SELECT CASE WHEN n_lines <= 2 THEN '1-2'
        |              WHEN n_lines <= 4 THEN '3-4' ELSE '5+' END AS size_bucket,
        |    CAST(last_ship - CAST(o_orderdate AS DATE) AS BIGINT) AS lag_days
        |  FROM orders JOIN p ON o_orderkey = l_orderkey
        |)
        |SELECT size_bucket, COUNT(*) AS n_orders,
        |  CAST(SUM(lag_days) AS DOUBLE) / COUNT(*) AS mean_lag_days,
        |  MAX(lag_days) AS max_lag_days
        |FROM j GROUP BY 1""".stripMargin,

    // q176: isodow weekend rule (engines' default dayofweek disagree).
    "q176_weekend_mix" ->
      """WITH m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT) AS isodow
        |  FROM orders
        |)
        |SELECT month, COUNT(*) AS n_orders,
        |  COUNT(*) FILTER (isodow >= 6) AS n_weekend,
        |  CAST(COUNT(*) FILTER (isodow >= 6) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS weekend_share
        |FROM m GROUP BY 1""".stripMargin,

    // q177: negative-balance exposure per role and nation, exact cents.
    "q177_negative_balances" ->
      """SELECT role, n_name, n_accounts, exposure_c FROM (
        |  SELECT 'customer' AS role, c_nationkey AS nk, COUNT(*) AS n_accounts,
        |    CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS exposure_c
        |  FROM customer WHERE c_acctbal < 0 GROUP BY 2
        |  UNION ALL
        |  SELECT 'supplier', s_nationkey, COUNT(*),
        |    CAST(SUM(CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |  FROM supplier WHERE s_acctbal < 0 GROUP BY 2
        |) JOIN nation ON nk = n_nationkey""".stripMargin,

    // q192: the oracle recomputes the view from scratch — the merge of
    // base + delta aggregates must be exactly lossless.
    "q192_incremental_mv" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM orders GROUP BY 1""".stripMargin,

    // q253: dynamic-partition-pruning probe — Q1 months via the
    // calendar-dim attribute filter; per-month counts/cents. The
    // pruning mechanism is asserted in PlanShapeSpec, the VALUES here.
    "q253_dpp_revenue" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c
        |FROM orders
        |WHERE CAST(strftime(o_orderdate, '%m') AS INT) <= 3
        |GROUP BY 1""".stripMargin,

    // q276: the erase audit recomputed from the RAW orders relation —
    // the Spark side reads the physically-rewritten target table, so a
    // lost row, leaked victim, or clobbered untouched partition all
    // hash-mismatch here. Victims: five smallest distinct custkeys with
    // md5 bucket < 10 (the q258 bucket rule on custkey).
    "q276_gdpr_erase" ->
      """WITH b AS (
        |  SELECT o_custkey,
        |    ( (instr('0123456789abcdef', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(CAST(o_custkey AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(CAST(o_custkey AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(CAST(o_custkey AS VARCHAR)), 4, 1)) - 1) ) % 100 AS cust_bucket
        |  FROM orders
        |), v AS (
        |  SELECT o_custkey FROM (SELECT DISTINCT o_custkey, cust_bucket FROM b)
        |  WHERE cust_bucket < 10 ORDER BY o_custkey LIMIT 5
        |), vb AS (
        |  SELECT DISTINCT cust_bucket FROM b WHERE o_custkey IN (SELECT o_custkey FROM v)
        |), agg AS (
        |  SELECT cust_bucket, COUNT(*) AS rows_before,
        |    SUM(CASE WHEN o_custkey IN (SELECT o_custkey FROM v) THEN 1 ELSE 0 END) AS erased
        |  FROM b GROUP BY 1
        |)
        |SELECT cust_bucket, CAST(rows_before AS BIGINT) AS rows_before,
        |  CAST(rows_before - erased AS BIGINT) AS rows_after,
        |  CAST(erased AS BIGINT) AS erased,
        |  cust_bucket IN (SELECT cust_bucket FROM vb) AS rewritten,
        |  CAST(0 AS BIGINT) AS residual_victims
        |FROM agg""".stripMargin,

    // q293: the oracle recomputes the EXPECTED post-sweep state from
    // raw rows — a surviving expired partition or a clobbered live one
    // hash-mismatches either way.
    "q293_retention_sweep" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  COUNT(*) AS rows_src,
        |  CAST(CASE WHEN strftime(o_orderdate, '%Y-%m') < '1996-01'
        |       THEN 0 ELSE COUNT(*) END AS BIGINT) AS rows_after,
        |  strftime(o_orderdate, '%Y-%m') < '1996-01' AS expired
        |FROM orders GROUP BY 1""".stripMargin,
  )
}
