package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.functions.Exact._
import graft.ops.Status
import graft.sources.Tables

/** The SURVEY §2 operator inventory re-expressed over the driver testdata
  * so each has a DuckDB-checkable oracle (TESTDATA.md). Every query is a
  * declarative DataFrame plan — Catalyst handles pushdown/pruning/broadcast;
  * plan-shape expectations live in the specs.
  *
  * Scale notes are attached per operator: the testdata is small, but each
  * plan is written to hold at 100 TB (broadcast only genuinely small dims,
  * partial aggregation before shuffles, no driver-side collects).
  */
object Relational {

  /** Scan + filter + projection + rename (SURVEY §2 #2/#16/#17).
    * Filter and 3-column projection push into the parquet scan.
    */
  def scanFilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_quantity").as("qty"),
        col("l_extendedprice").as("price"))

  /** Aggregation with exact (order-independent) double math — TPC-H Q1
    * shape. Partial aggregation (map-side combine) happens before the
    * 1-key-per-group shuffle, so this scales linearly with input.
    */
  def aggPricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        dsumProduct(col("l_extendedprice"), lit(1) - col("l_discount")).as("sum_disc_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("n"))

  /** Stream-static-style equi-join (SURVEY §2 #8): fact side stays
    * partition-local; the user dim broadcasts — by AQE's size decision,
    * not a forced hint: unlike the flagship's genuinely bounded 16-row
    * tribute dim (ops/Status.scala, which keeps its hint), a user
    * dimension scales with the user base, and presuming smallness in the
    * static plan is the q195-class scale hazard. At every tested scale
    * AQE still picks the broadcast (the pin asserts it).
    */
  def joinEnrichBroadcast(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .join(Tables.customer(s, dir),
        col("user_id") === col("c_custkey"))
      .select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("c_name"), col("c_mktsegment"))

  /** Multi-hop dimensional join + aggregate (SURVEY §2 #9 widened):
    * orders ⋈ customer ⋈ nation ⋈ region → revenue per region. The
    * constant dims (nation 25, region 5) are hinted broadcasts; customer
    * SCALES with the dataset, so its join is left to AQE's size decision
    * (still a broadcast at every tested scale). One shuffle for the
    * final group-by.
    */
  def joinMultiRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        dsum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))

  /** The flagship enrichment analog on testdata (SURVEY §2 #10-#15):
    * per-entity thresholds from a joined dim drive ordered CASE bands,
    * exactly the reference's shape (threshold band + equality status +
    * banded classification).
    */
  def statusBands(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    // customer scales with SF — no forced broadcast (AQE size-decides);
    // nation is a constant 25-row dim, so its hint is safe at any scale.
    e.join(c, col("user_id") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("c_name"), col("n_name"),
        when(col("value") > col("c_acctbal"), "OVER")
          .when(col("c_acctbal") - col("value") < 100, "NEAR")
          .otherwise("UNDER").as("acct_status"),
        when(col("value") < 50, "LOW")
          .when(col("value") < 150, "MID")
          .otherwise("HIGH").as("value_band"),
        when(col("value") === 0, "DEAD").otherwise("ALIVE").as("liveness"))
  }

  /** Last-writer-wins keyed state as a batch query (SURVEY §2 #20): the
    * latest event per user. Single hash-partition shuffle on the key; at
    * scale this is the canonical "current state from a changelog" pattern.
    */
  def latestStatePerKey(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
  }

  /** Row→JSON serialization (SURVEY §2 #18). */
  def rowToJson(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        to_json(struct(col("event_id"), col("user_id"), col("event_type")))
          .as("payload"))

  /** Scalar casts number→string (SURVEY §2 #17). */
  def castProjection(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        col("c_custkey").cast("string").as("key_str"),
        col("c_nationkey").cast("bigint").as("nation_big"),
        col("c_acctbal").cast("string").as("bal_str"))

  /** Deterministic top-k: total order with unique tiebreak then limit.
    * At scale Spark runs TakeOrderedAndProject — no global sort.
    */
  def topKOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(10)

  /** Left-semi join: customers having orders (EXISTS). */
  def semiJoinActiveCustomers(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))

  /** Left-anti join: customers with no orders (NOT EXISTS). */
  def antiJoinDormantCustomers(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Distinct (hash de-dup with partial aggregation). */
  def distinctUserEvents(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(col("user_id"), col("event_type")).distinct()

  /** Tumbling-window aggregation (the event-time extension the reference
    * lacks — SURVEY §2 "not implemented" + §7.1 extensions): per-day,
    * per-type counts and exact value sums. Streaming twin lives in
    * graft.streaming.
    */
  def windowTumblingDaily(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        date_trunc("day", col("ts")).as("day"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("sum_value"))

  /** Set operation: union of two filtered projections, aggregated. */
  def unionHighLowValue(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val high = e.filter(col("value") >= 200)
      .select(col("user_id"), lit("high").as("bucket"))
    val low = e.filter(col("value") < 20)
      .select(col("user_id"), lit("low").as("bucket"))
    high.unionAll(low)
      .groupBy(col("user_id"), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Sessionization via gaps-and-islands (extension; SURVEY §7.1 #5):
    * a session breaks after 30 idle minutes per user. Two window passes
    * over the same (user_id, ts) partitioning — one shuffle total.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val e = Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("timestamp").cast("long") -
            col("prev_ts").cast("timestamp").cast("long") > 1800, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    e.groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("session_value"))
  }

  /** Set intersection: users who both clicked AND purchased. Plans as a
    * left-semi aggregate join; both sides partial-aggregate (distinct)
    * before the shuffle, so data movement is bounded by distinct users,
    * not events.
    */
  def intersectUsers(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.filter(col("event_type") === "click").select(col("user_id"))
      .intersect(e.filter(col("event_type") === "purchase").select(col("user_id")))
  }

  /** Set difference: users who clicked but never purchased (left-anti over
    * distincts). Same shuffle profile as [[intersectUsers]].
    */
  def exceptUsers(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.filter(col("event_type") === "click").select(col("user_id"))
      .except(e.filter(col("event_type") === "purchase").select(col("user_id")))
  }

  /** Pivot (long→wide): per-user event counts and exact value sums, one
    * column pair per event type. The type list is pinned so the plan is
    * static (no extra distinct-values job, deterministic column order) —
    * at scale an unpinned pivot would add a full pass just to discover
    * the column set. Single hash aggregate keyed by user_id; each cell is
    * a filtered partial aggregate (map-side combined).
    */
  def pivotEventCounts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("val"))

  /** Full-outer join of two aggregated activity views: order counts vs
    * event counts per customer, keeping customers present in either side.
    * Both inputs pre-aggregate to one row per key before the join, so the
    * full-outer shuffle moves at most |customers| rows per side.
    */
  def fullOuterActivity(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("cust")).agg(count(lit(1)).as("n_orders"))
    val e = Tables.events(s, dir)
      .groupBy(col("user_id").as("cust")).agg(count(lit(1)).as("n_events"))
    o.join(e, Seq("cust"), "full_outer")
      .select(col("cust"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  /** Explicit GROUPING SETS — (nation, status), (nation), (status) — i.e.
    * rollup minus the grand total plus the status-only margin; exercises
    * arbitrary set lists rather than the rollup/cube prefixes. Spark plans
    * one Expand (3× row multiplication) + one hash aggregate: a single
    * shuffle regardless of how many sets are asked for.
    */
  def groupingSetsRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupingSets(
        Seq(Seq(col("n_name"), col("o_orderstatus")), Seq(col("n_name")), Seq(col("o_orderstatus"))),
        col("n_name"), col("o_orderstatus"))
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n"))

  /** Wide→long reshape (UNPIVOT/melt) + per-metric profile. Spark's
    * native `unpivot` is a zero-shuffle row transpose — each input row
    * emits one row per value column inside the same task, no exchange —
    * and the downstream aggregate is a plain map-side-combined hash agg
    * over exactly `n_metrics` groups. At 100 TB the only real cost is the
    * ×4 row expansion, which stays pipelined inside whole-stage codegen
    * and never materializes; the alternative (4 separate scans unioned)
    * reads the file 4 times.
    */
  def unpivotMetrics(lineitem: DataFrame): DataFrame =
    lineitem
      .unpivot(
        ids = Array.empty[Column],
        values = Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        variableColumnName = "metric",
        valueColumnName = "v")
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n"), dsum(col("v")).as("total"))

  def unpivotMetrics(s: SparkSession, dir: String): DataFrame =
    unpivotMetrics(Tables.lineitem(s, dir))

  /** SQL null-semantics parity in one query — the behaviors that silently
    * diverge between hand-rolled engines and the standard, pinned here
    * against the oracle: GROUP BY collects all nulls into ONE group,
    * COUNT(*) counts them while COUNT(col) skips them, and the null-safe
    * equality join (`<=>` / IS NOT DISTINCT FROM) matches the null group
    * to a null dim key where plain `=` never would. The nullable key is
    * synthesized deterministically (view events → null). All plain
    * projections and one hash aggregate; the two-row dim broadcasts.
    */
  def nullSemantics(s: SparkSession, dir: String): DataFrame = {
    val dim = s.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row("click", 1L),
        org.apache.spark.sql.Row(null, 2L)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("dkey",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("dim_id",
          org.apache.spark.sql.types.LongType, nullable = false))))
    Tables.events(s, dir)
      .select(
        when(col("event_type") === "view", lit(null))
          .otherwise(col("event_type")).as("key"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_rows"), count(col("key")).as("n_nonnull"))
      .join(broadcast(dim), col("key") <=> col("dkey"), "left")
      .select(col("key"), col("n_rows"), col("n_nonnull"), col("dim_id"))
  }

  /** TPC-H Q5-shaped local-supplier revenue: discounted revenue per
    * (region, nation) counting only line items whose CUSTOMER and
    * SUPPLIER share a nation — the classic 6-table star. Join strategy
    * by cardinality class: supplier/nation/region broadcast (bounded
    * dims), orders↔lineitem and customer shuffle on their keys (fact-
    * sized at scale). Revenue is decimal the whole way —
    * price·(1−disc) multiplies two exact decimals — and becomes a
    * double once, after the sum.
    */
  def localSupplierRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) -
            col("l_discount").cast(DecimalType(18, 2)))).as("disc_price"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("disc_price")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q8-shaped market share: per order year, the fraction of
    * ASIA-region discounted revenue supplied by NATION_2. Both the
    * numerator (conditional sum) and denominator accumulate in exact
    * decimal on ONE aggregation pass; the share is a single double
    * division per year — no float accumulates across rows.
    */
  def marketShare(s: SparkSession, dir: String,
      regionName: String = "ASIA", nationName: String = "NATION_2"): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) -
            col("l_discount").cast(DecimalType(18, 2)))).as("disc_price"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("yr"))
      .agg(
        sum(col("disc_price")).cast("double").as("total_rev"),
        sum(when(col("n_name") === nationName, col("disc_price"))
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double").as("nation_rev"))
      .withColumn("share", col("nation_rev") / col("total_rev"))

  /** Part shipment velocity with quarter-over-quarter rank movement:
    * quantity shipped per (part, quarter), ranked within each quarter,
    * and each part's rank compared to its previous quarter (null for a
    * first appearance). The quarter-partition rank and the part-
    * partition lag are two windows on two different keys — unavoidable
    * and both bounded; the final filter keeps the reportable top 100
    * per quarter AFTER deltas are computed, so a part falling out of
    * the top still shows as the prior rank it fell from.
    */
  /** Product-family rollup: the leading token of `p_name` is the family
    * (the classic dirty-hierarchy extraction when no category dim
    * exists); revenue and quantity aggregate per family. The part join
    * shuffles on partkey (part is fact-scale in TPC-H); the family
    * projection is per-row string work that stays in codegen.
    */
  def partFamilyRollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_partkey"),
        unscaled(col("l_extendedprice")).as("rev_c"),
        unscaled(col("l_quantity")).as("qty_c"))
      .join(Tables.part(s, dir).select(col("p_partkey"),
        substring_index(col("p_name"), " ", 1).as("family")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("family"))
      .agg(count(lit(1)).as("n_items"), sum(col("rev_c")).as("rev_c"),
        sum(col("qty_c")).as("qty_c"))

  /** Supplier account-balance standing vs nation peers: percent_rank
    * over a (balance, suppkey)-totalized order within each nation —
    * (rank−1)/(n−1), the same closed form in both engines, one double
    * division per supplier. Windows partition by nation, so the work
    * is peer-group-parallel at any supplier count.
    */
  def supplierStanding(s: SparkSession, dir: String): DataFrame = {
    val byNation = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal"), col("s_suppkey"))
    Tables.supplier(s, dir)
      .withColumn("pr", percent_rank().over(byNation))
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"), col("s_acctbal"), col("pr"))
  }

  /** Nation trade-flow matrix, Q7-shaped: discounted revenue flowing
    * from each supplier nation to each customer nation — the bounded
    * |nations|² view of cross-border volume. Same join strategy as
    * q135: nations broadcast, supplier broadcast, customer and the
    * fact tables shuffle; exact decimal discount math with one double
    * conversion after the sum.
    */
  def tradeFlows(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) -
            col("l_discount").cast(DecimalType(18, 2)))).as("disc_price"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sk"))
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("ck"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("disc_price")).cast("double").as("revenue"))

  /** Brand market share within each product family: revenue share and
    * leader flag per (family, brand) — the two-level composition view.
    * One partkey join, one (family, brand) aggregate; the family total
    * and leader pick ride windows over the bounded family×brand
    * relation.
    */
  def brandShare(s: SparkSession, dir: String): DataFrame = {
    val fb = Tables.lineitem(s, dir)
      .select(col("l_partkey"),
        unscaled(col("l_extendedprice")).as("rev_c"))
      .join(Tables.part(s, dir).select(col("p_partkey"),
        substring_index(col("p_name"), " ", 1).as("family"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("family"), col("p_brand"))
      .agg(sum(col("rev_c")).as("rev_c"))
    val byFam = Window.partitionBy(col("family"))
    fb.withColumn("fam_c", sum(col("rev_c")).over(byFam))
      .withColumn("rk", row_number().over(
        byFam.orderBy(col("rev_c").desc, col("p_brand"))))
      .select(col("family"), col("p_brand"), col("rev_c"),
        (col("rev_c").cast("double") / col("fam_c").cast("double")).as("share"),
        (col("rk") === 1).as("is_leader"))
  }

  /** Order-composition dominance: the share of each order's line
    * revenue carried by its single largest line, banded — whether
    * baskets are one big item plus filler or evenly spread. Exact
    * integer compare (max·denominator vs bound·numerator would need
    * care; here the band test multiplies out: 2·max ≥ total means
    * ≥ 50%). One orderkey aggregate, one bounded rollup.
    */
  def lineDominance(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"),
        unscaled(col("l_extendedprice")).as("c"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"), sum(col("c")).as("tot_c"), max(col("c")).as("max_c"))
      .withColumn("band",
        when(col("n_lines") === 1, "single")
          .when(col("max_c") * 2 >= col("tot_c"), "dominant")
          .otherwise("spread"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(col("max_c")).cast("double") / sum(col("tot_c")).cast("double"))
          .as("pooled_max_share"))

  /** Supplier export diversity: each supplier's customer-nation mix as
    * an exact-integer HHI (q160's idiom over a join), bucketed into
    * focused / balanced books. Distinct flows aggregate per (supplier,
    * nation) then per supplier; output bounded by supplier count.
    */
  def supplierExportDiversity(s: SparkSession, dir: String): DataFrame = {
    val flows = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_suppkey"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"))
    flows.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_nations"), sum(col("n")).as("n_items"),
        sum(col("n") * col("n")).as("ss"))
      .select(col("l_suppkey"), col("n_nations"), col("n_items"),
        (col("ss").cast("double") /
          (col("n_items") * col("n_items")).cast("double")).as("hhi"))
  }

  def partVelocity(s: SparkSession, dir: String, topK: Int = 100): DataFrame = {
    val q = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("part"),
        date_trunc("quarter", col("l_shipdate")).cast("date").as("quarter"))
      .agg(sum(unscaled(col("l_quantity")))
        .as("qty_c"))
    val rank = row_number().over(Window.partitionBy(col("quarter"))
      .orderBy(col("qty_c").desc, col("part")))
    val prev = Window.partitionBy(col("part")).orderBy(col("quarter"))
    q.withColumn("rank", rank.cast("long"))
      .withColumn("prev_rank", lag(col("rank"), 1).over(prev))
      .withColumn("rank_delta", col("prev_rank") - col("rank"))
      .filter(col("rank") <= topK)
      .select(col("part"), col("quarter"), col("qty_c"),
        col("rank"), col("prev_rank"), col("rank_delta"))
  }
}
