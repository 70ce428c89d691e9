package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Caches
import graft.functions.Exact.unscaled
import graft.sources.Tables

/** Data-quality audits — the checks a 100 TB warehouse runs nightly
  * before anything downstream trusts the data. Both operators follow the
  * same design rule: an audit must never be more expensive than the
  * cheapest query over the audited table, so everything here is either a
  * column-pruned single-column scan or a key-only join.
  */
object Quality {

  /** One referential-integrity relation: how many child rows point at a
    * parent key that does not exist. A LEFT join against the DISTINCT
    * parent keys (not the parent rows — keys only, so the build side is
    * as small as it can possibly be) marks orphans as null parents; one
    * hash aggregate counts them. Null foreign keys count as orphans here
    * (the stricter reading; ANSI FK semantics would exempt them — the
    * data has none, so the two readings agree).
    */
  private[graft] def fkAudit(
      relation: String,
      child: DataFrame, fk: String,
      parent: DataFrame, pk: String): DataFrame =
    child.select(col(fk).as("k"))
      .join(parent.select(col(pk).as("k")).distinct
        .withColumn("present", lit(1)), Seq("k"), "left")
      .agg(
        count(lit(1)).as("n_child"),
        sum(when(col("present").isNull, 1L).otherwise(0L)).as("n_orphan"))
      .select(lit(relation).as("relation"), col("n_child"), col("n_orphan"))

  /** Referential-integrity audit across the star schema's five FK edges.
    * Each edge is an independent key-only join: the child side is pruned
    * to ONE column at the scan, and the parent side is a distinct-key
    * relation Catalyst broadcasts when it fits (nation always, customer/
    * part/supplier up to the broadcast threshold) and shuffle-joins
    * otherwise — exactly the per-edge choice you want at 100 TB, made per
    * edge by AQE rather than hardcoded. The five one-row aggregates union
    * into the audit report; no edge's cost depends on another's.
    */
  def fkIntegrity(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    Seq(
      fkAudit("lineitem.l_orderkey->orders", li, "l_orderkey", ord, "o_orderkey"),
      fkAudit("lineitem.l_partkey->part", li, "l_partkey", Tables.part(s, dir), "p_partkey"),
      fkAudit("lineitem.l_suppkey->supplier", li, "l_suppkey", Tables.supplier(s, dir), "s_suppkey"),
      fkAudit("orders.o_custkey->customer", ord, "o_custkey", cust, "c_custkey"),
      fkAudit("customer.c_nationkey->nation", cust, "c_nationkey", Tables.nation(s, dir), "n_nationkey"),
    ).reduce(_ unionByName _)
  }

  /** One column's profile row: completeness, exact distinct cardinality,
    * and min/max rendered as strings so heterogeneous column types share
    * one report schema. min/max run on the NATIVE type and only the
    * result is stringified — `min(cast(c as string))` would order
    * numbers lexicographically ("10" < "9") and be wrong.
    */
  private def profileOne(df: DataFrame, c: String): DataFrame =
    df.select(col(c))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_nonnull"),
        count_distinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_val"),
        max(col(c)).cast("string").as("max_val"))
      .select(lit(c).as("col_name"), col("n_rows"), col("n_nonnull"),
        col("n_distinct"), col("min_val"), col("max_val"))

  /** Audit-while-writing: materialize a table AND collect its quality
    * metrics in the SAME job via `observe`/CollectMetrics — the metrics
    * accumulate on the executors as rows stream past on their way to the
    * sink, so the audit costs ZERO extra passes. At 100 TB this is the
    * difference between "write, then re-scan everything to validate" and
    * getting row counts / empty-payload counts / short-doc counts for
    * free with the write. Returns the observed metrics; the written
    * table is at `out`.
    */
  def auditedWrite(df: DataFrame, out: String): Map[String, Any] = {
    val obs = new org.apache.spark.sql.Observation()
    df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col("text").isNull || length(col("text")) === 0, 1L)
        .otherwise(0L)).as("n_empty_text"),
      sum(when(col("n_chars") < 10, 1L).otherwise(0L)).as("n_short"))
      .write.mode("overwrite").parquet(out)
    obs.get
  }

  /** Deequ-style column profile of the documents table: one report row
    * per column with completeness, exact distinct count, and min/max.
    * Deliberately one single-column pass PER column rather than one
    * multi-distinct pass over all of them: multiple count_distinct in a
    * single aggregate makes Catalyst plan an Expand (row volume ×
    * n_columns through the shuffle), while per-column passes each read
    * exactly one column from parquet and combine map-side. On a columnar
    * store the N narrow scans are I/O-proportional to the one wide scan,
    * and nothing is ever wider than (value) in flight.
    */
  def columnProfile(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Seq("doc_id", "lang", "source", "n_chars", "text")
      .map(profileOne(docs, _))
      .reduce(_ unionByName _)
  }

  /** Per-source winsorized mean of document length: clamp each value to
    * the nearest-rank p05/p95 of its source, then take the exact mean —
    * the outlier-robust center a corpus-quality dashboard wants. The
    * percentile ranks are integral (`ceil(q·n)` via `(q·n + 99) div
    * 100`), so both engines pick the identical ladder values; the mean
    * routes through decimal (`Exact.dsum` idiom) so partial-aggregation
    * order can't wiggle the double. One shuffle on source; both rank
    * windows and the final aggregate share it.
    */
  def winsorizedLength(docs: DataFrame): DataFrame = {
    val bySrc = Window.partitionBy(col("source"))
    val ranked = docs.select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rn",
        row_number().over(bySrc.orderBy(col("n_chars"), col("doc_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(bySrc).cast("long"))
      .withColumn("lo_rank", expr("(5 * n + 99) div 100"))
      .withColumn("hi_rank", expr("(95 * n + 99) div 100"))
    val bounds = ranked
      .withColumn("lo_val",
        max(when(col("rn") === col("lo_rank"), col("n_chars"))).over(bySrc))
      .withColumn("hi_val",
        max(when(col("rn") === col("hi_rank"), col("n_chars"))).over(bySrc))
    bounds
      .withColumn("wins", greatest(least(col("n_chars"), col("hi_val")), col("lo_val")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        max(col("lo_val")).as("lo_val"), max(col("hi_val")).as("hi_val"),
        (sum(col("wins").cast(DecimalType(18, 0))).cast("double") /
          count(lit(1))).as("wins_mean"))
  }

  def winsorizedLength(s: SparkSession, dir: String): DataFrame =
    winsorizedLength(Tables.documents(s, dir))

  /** Per-language median absolute deviation of document length — the
    * robust spread statistic: nearest-rank median, then the nearest-rank
    * median of |x − median|. Both medians are rank picks over the same
    * language partitioning (two window phases, one shuffle), entirely in
    * integers, so there is no interpolation for engines to disagree on.
    */
  def lengthMad(docs: DataFrame): DataFrame = {
    val byLang = Window.partitionBy(col("lang"))
    val med = docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("rn",
        row_number().over(byLang.orderBy(col("n_chars"), col("doc_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(byLang).cast("long"))
      .withColumn("med",
        max(when(col("rn") === expr("(n + 1) div 2"), col("n_chars"))).over(byLang))
      .withColumn("dev", abs(col("n_chars") - col("med")))
    med
      .withColumn("drn",
        row_number().over(byLang.orderBy(col("dev"), col("doc_id"))).cast("long"))
      .withColumn("mad",
        max(when(col("drn") === expr("(n + 1) div 2"), col("dev"))).over(byLang))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), max(col("med")).as("median_chars"),
        max(col("mad")).as("mad_chars"))
  }

  def lengthMad(s: SparkSession, dir: String): DataFrame =
    lengthMad(Tables.documents(s, dir))

  /** Benford first-digit audit of order totals by priority class: the
    * observed leading-digit distribution against the Benford expectation
    * n·log10(1+1/d). The digit comes from the CENTS integer rendered as
    * a string (integer→string is locale-free and identical everywhere;
    * a double's string form is not), and the nine expected-share
    * constants are spelled as literals so no engine evaluates a log.
    * One map-side-combined aggregate over (priority, digit) — 45 output
    * rows from any input size.
    */
  def benfordAudit(orders: DataFrame): DataFrame = {
    val expected = Seq(
      1 -> 0.30102999566398120, 2 -> 0.17609125905568124,
      3 -> 0.12493873660829993, 4 -> 0.09691001300805642,
      5 -> 0.07918124604762482, 6 -> 0.06694678963061322,
      7 -> 0.05799194697768673, 8 -> 0.05115252244738129,
      9 -> 0.04575749056067514)
      .map { case (d, p) => (when(col("digit") === d, lit(p)), p) }
    val share = expected.map(_._1).reduce((a, b) => coalesce(a, b))
    orders
      .select(col("o_orderpriority").as("priority"),
        substring(unscaled(col("o_totalprice")).cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("priority"), col("digit"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_prio",
        sum(col("n")).over(Window.partitionBy(col("priority"))))
      .withColumn("expected", share * col("n_prio").cast("double"))
      .select(col("priority"), col("digit"), col("n"), col("expected"))
  }

  def benfordAudit(s: SparkSession, dir: String): DataFrame =
    benfordAudit(Tables.orders(s, dir))

  /** Header/detail reconciliation audit: does each order's stated total
    * equal the sum of its line items? Reports, per priority class, how
    * many orders drift and by how much — the first query any warehouse
    * migration runs. All comparison in integer cents (header and detail
    * both quantized through decimal(18,2)); orders with no line items
    * reconcile against zero rather than silently dropping. One
    * map-side-combined line aggregate, one orderkey join, one tiny
    * grouped output.
    */
  def orderReconciliation(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val lineSums = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(unscaled(col("l_extendedprice"))).as("line_c"))
    orders
      .select(col("o_orderkey"), col("o_orderpriority").as("priority"),
        unscaled(col("o_totalprice")).as("total_c"))
      .join(lineSums, col("o_orderkey") === col("l_orderkey"), "left")
      .withColumn("line_c", coalesce(col("line_c"), lit(0L)))
      .withColumn("drift_c", abs(col("total_c") - col("line_c")))
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("n_orders"),
        count(when(col("drift_c") > 0, 1)).as("n_mismatched"),
        max(col("drift_c")).as("max_drift_c"),
        sum(col("drift_c")).as("total_drift_c"))
  }

  def orderReconciliation(s: SparkSession, dir: String): DataFrame =
    orderReconciliation(Tables.orders(s, dir), Tables.lineitem(s, dir))

  /** Market-segment order totals joined once; shared by the five-number
    * summary and the outlier screen. */
  private def segmentCents(orders: DataFrame, customer: DataFrame): DataFrame =
    orders.select(col("o_custkey"), col("o_orderkey"),
      unscaled(col("o_totalprice")).as("cents"))
      .join(customer.select(col("c_custkey"), col("c_mktsegment").as("segment")),
        col("o_custkey") === col("c_custkey"))

  /** Exact Tukey five-number summary of order totals per market
    * segment: min / p25 / p50 / p75 / max by nearest rank (`ceil(q·n)`
    * in integers), in cents. One customer join, one segment-partitioned
    * rank window, one aggregate — the `describe()` every warehouse
    * publishes, without approximate percentiles.
    */
  def fiveNumber(orders: DataFrame, customer: DataFrame): DataFrame = {
    val bySeg = Window.partitionBy(col("segment"))
    segmentCents(orders, customer)
      .withColumn("rn", row_number().over(
        bySeg.orderBy(col("cents"), col("o_orderkey"))).cast("long"))
      .withColumn("n", count(lit(1)).over(bySeg).cast("long"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"),
        min(col("cents")).as("min_c"),
        max(when(col("rn") === expr("(25 * n + 99) div 100"), col("cents"))).as("p25_c"),
        max(when(col("rn") === expr("(50 * n + 99) div 100"), col("cents"))).as("p50_c"),
        max(when(col("rn") === expr("(75 * n + 99) div 100"), col("cents"))).as("p75_c"),
        max(col("cents")).as("max_c"))
  }

  def fiveNumber(s: SparkSession, dir: String): DataFrame =
    fiveNumber(Tables.orders(s, dir), Tables.customer(s, dir))

  /** Tukey-fence outlier counts per segment: how many orders fall below
    * p25 − 1.5·IQR or above p75 + 1.5·IQR. The fences stay INTEGER by
    * comparing doubled cents (2·x < 2·p25 − 3·(p75−p25)), so no float
    * boundary for engines to disagree on; the quartile relation is a
    * broadcast-joined handful of rows.
    */
  def iqrOutliers(orders: DataFrame, customer: DataFrame): DataFrame = {
    val q = fiveNumber(orders, customer)
      .select(col("segment").as("qseg"), col("p25_c"), col("p75_c"))
    segmentCents(orders, customer)
      .join(broadcast(q), col("segment") === col("qseg"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"),
        count(when(col("cents") * 2 <
          col("p25_c") * 2 - (col("p75_c") - col("p25_c")) * 3, 1)).as("n_low"),
        count(when(col("cents") * 2 >
          col("p75_c") * 2 + (col("p75_c") - col("p25_c")) * 3, 1)).as("n_high"))
  }

  def iqrOutliers(s: SparkSession, dir: String): DataFrame =
    iqrOutliers(Tables.orders(s, dir), Tables.customer(s, dir))

  /** Segment × priority contingency table with expected counts and
    * per-cell Pearson residuals — the dependence screen between two
    * categorical dimensions. Counts and marginals are exact longs
    * (row/col marginals ride two tiny windows over the ≤ |segments| ×
    * |priorities| cell relation); expected and residual are the same
    * fixed three-op double chain in both engines, evaluated per cell —
    * deliberately NO chi-square total, whose cross-engine sum order
    * would not be reproducible.
    */
  def contingency(orders: DataFrame, customer: DataFrame): DataFrame = {
    val cells = orders.select(col("o_custkey"), col("o_orderpriority"))
      .join(customer.select(col("c_custkey"), col("c_mktsegment").as("segment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("segment"), col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("o"))
    cells
      .withColumn("r", sum(col("o")).over(Window.partitionBy(col("segment"))))
      .withColumn("c", sum(col("o")).over(Window.partitionBy(col("priority"))))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
      .withColumn("expected",
        (col("r") * col("c")).cast("double") / col("n").cast("double"))
      .withColumn("residual",
        (col("o").cast("double") - col("expected")) / sqrt(col("expected")))
      .select(col("segment"), col("priority"), col("o"), col("r"), col("c"),
        col("expected"), col("residual"))
  }

  def contingency(s: SparkSession, dir: String): DataFrame =
    contingency(Tables.orders(s, dir), Tables.customer(s, dir))

  /** Batch twin of streaming/StreamingOps.qualityMonitor — per tumbling
    * 15-minute window, the count of arriving events violating each
    * contract clause (negative measure; event type outside the declared
    * vocabulary) alongside the window total. Identical flag projection
    * and aggregate as the streaming form (StreamingOpsSpec pins the
    * equivalence); this registered twin is what gives the monitor's
    * windowing a driver-gated DuckDB oracle. Violations are flagged in
    * the scan projection (pure when/otherwise, map-side), so the shuffle
    * carries one pre-combined row per (window, partition) — the audit
    * costs one pass over the pruned (ts, value, event_type) columns at
    * any scale.
    */
  def contractMonitor(events: DataFrame, knownTypes: Seq[String]): DataFrame =
    events
      .select(window(col("ts"), "15 minutes").as("w"),
        when(col("value") < 0, 1L).otherwise(0L).as("v_neg"),
        when(!col("event_type").isin(knownTypes: _*), 1L).otherwise(0L).as("v_type"))
      .groupBy(col("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("v_neg")).as("n_negative_value"),
        sum(col("v_type")).as("n_unknown_type"))
      .select(col("w.start").as("w_start"), col("n_events"),
        col("n_negative_value"), col("n_unknown_type"))

  /** Registered with 'error' outside the declared vocabulary so the
    * unknown-type column is non-trivially exercised by the oracle. */
  def contractMonitor(s: SparkSession, dir: String): DataFrame =
    contractMonitor(Tables.events(s, dir),
      knownTypes = Seq("view", "click", "purchase", "signup"))

  /** The fixed event-type vocabulary the drift monitor tracks; anything
    * outside it lands in the 'other' bucket, so the distribution domain
    * is CONSTANT — which is what lets the streaming twin compute the
    * distance inside a single windowed aggregate. */
  val DriftTypes: Seq[String] = Seq("view", "click", "purchase", "signup", "error")

  /** One typed count column per vocabulary entry + the other-bucket +
    * the total, shared by the batch twin and the streaming monitor. */
  private[graft] def driftCounts(types: Seq[String]): Seq[Column] =
    types.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"c_$t")) ++
      Seq(
        sum(when(!col("event_type").isin(types: _*), 1L).otherwise(0L)).as("c_other"),
        count(lit(1)).as("n_events"))

  /** The |window·B − baseline·n| numerator summed over the fixed type
    * domain, evaluated in DECIMAL(38,0) so the cross products are exact
    * at genuinely corpus-scale counts (the q205 discipline). */
  private[graft] def driftTv(types: Seq[String]): Column = {
    val dec = "decimal(38,0)"
    val num = (types :+ "other")
      .map(t => abs(col(s"c_$t").cast(dec) * col("n_base").cast(dec) -
        col(s"b_$t").cast(dec) * col("n_events").cast(dec)))
      .reduce(_ + _)
    num.cast("double") /
      (lit(2.0) * col("n_events").cast("double") * col("n_base").cast("double"))
  }

  /** The 1-row drift baseline: the reference event-type distribution the
    * monitor compares every window against (batch: the whole table;
    * production: last week's healthy traffic). Constant-size broadcast. */
  def driftBaseline(events: DataFrame, types: Seq[String] = DriftTypes): DataFrame = {
    val cs = driftCounts(types)
    events.agg(cs.head, cs.tail: _*)
      .select((types :+ "other").map(t => col(s"c_$t").as(s"b_$t")) :+
        col("n_events").as("n_base"): _*)
  }

  /** Windowed distribution-drift monitor, batch twin (q207): per
    * 15-minute window, the total-variation distance between the window's
    * event-type distribution and a baseline distribution — the alarm an
    * ingestion pipeline raises when traffic composition shifts (a client
    * rollout gone wrong, a bot flood) even when per-event contracts
    * (q202) all still pass. TV over the FIXED type vocabulary is exact
    * integer arithmetic plus one correctly-rounded division, so the
    * oracle hash-matches; the identical projection/aggregate runs as the
    * streaming monitor (StreamingOps.driftMonitor — StreamingOpsSpec
    * pins the equivalence).
    *
    * Scale: one pruned (ts, event_type) pass, map-side pre-combined to
    * one row per (window, partition); the baseline is one broadcast row.
    */
  def driftMonitor(events: DataFrame, baseline: DataFrame,
                   types: Seq[String] = DriftTypes): DataFrame = {
    val cs = driftCounts(types)
    events
      .groupBy(window(col("ts"), "15 minutes").as("w"))
      .agg(cs.head, cs.tail: _*)
      .crossJoin(broadcast(baseline))
      .select(col("w.start").as("w_start"), col("n_events"),
        driftTv(types).as("tv"))
  }

  def driftMonitor(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    driftMonitor(ev, driftBaseline(ev))
  }

  /** Daily distinct-actives monitor, batch twin (q209): per tumbling day,
    * the event count and the KMV-sketched distinct-user count — the DAU
    * board a pipeline watches continuously. The point of the sketch here
    * is the STREAMING twin (StreamingOps.uniquesMonitor): streaming
    * aggregation cannot evaluate `count_distinct` at all (unbounded
    * per-group state), while the KMV aggregator is a legal streaming
    * UDAF whose state is k longs per window — bounded by construction —
    * and, being md5-derived and order-independent, returns the SAME
    * estimate in batch and streaming, so this registered twin carries
    * the DuckDB oracle for both (exact below k distinct, the
    * `(k-1)·2^48 / h_k` inversion above — all int64, engine-identical).
    *
    * Scale: one pruned (ts, user_id) pass; map-side partial aggregation
    * ships at most k hashes per (map task × day).
    */
  def dailyUniques(events: DataFrame, k: Int = 64): DataFrame = {
    import org.apache.spark.sql.Encoders
    val kmv = udaf(new graft.functions.KMinValues(k), Encoders.scalaLong)
    events
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_events"),
        kmv(Corpus.h48(col("user_id").cast("string"))).as("ndv_users"))
      .select(col("w.start").as("w_start"), col("n_events"), col("ndv_users"))
  }

  def dailyUniques(s: SparkSession, dir: String): DataFrame =
    dailyUniques(Tables.events(s, dir))

  /** Shared rank-pick projection: given a `samp` column (the
    * BottomKQuantile output — sampled values sorted ascending), emit the
    * sample size and the nearest-rank p50/p90/p99 picks in pure integer
    * arithmetic (`ceil(p·m)` as `(a·m + a) div b` — floor division is
    * identical in Spark, DuckDB, and the JVM). */
  private[graft] def rankPicks(): Seq[Column] = Seq(
    size(col("samp")).cast("long").as("sample_n"),
    element_at(col("samp"),
      expr("cast((size(samp) + 1) div 2 as int)")).as("p50_c"),
    element_at(col("samp"),
      expr("cast((9 * size(samp) + 9) div 10 as int)")).as("p90_c"),
    element_at(col("samp"),
      expr("cast((99 * size(samp) + 99) div 100 as int)")).as("p99_c"))

  /** Mergeable price-quantile sketch per return flag (q239): p50/p90/p99
    * of extended price from BOUNDED state — k (hash, value) pairs per
    * group (graft.functions.BottomKQuantile), where exact nearest-rank
    * (q103/q127/q132) needs the whole column shuffled and sorted. This is
    * the rollup shape: at 100 TB the per-partition partials ship k pairs
    * each, sketches of daily partitions merge into the monthly answer
    * without re-reading a row, and the identical aggregate runs inside a
    * watermarked stream (quantileMonitor). Row identity for the sampling
    * hash is the (orderkey, linenumber) primary key; values are exact
    * cents. Exact below k rows per group; ~1/sqrt(k) rank error above.
    *
    * The registered oracle replays the md5 bottom-k sample and the rank
    * picks in plain SQL — full hash-match, no rows-only waiver.
    */
  def priceQuantileSketch(lineitem: DataFrame, k: Int = 256): DataFrame = {
    import org.apache.spark.sql.Encoders
    val bkq = udaf(new graft.functions.BottomKQuantile(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    lineitem
      .select(col("l_returnflag").as("flag"),
        Corpus.h48(concat(col("l_orderkey").cast("string"), lit(":"),
          col("l_linenumber").cast("string"))).as("h"),
        unscaled(col("l_extendedprice")).as("v"))
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n_rows"), bkq(col("h"), col("v")).as("samp"))
      .select(col("flag") +: col("n_rows") +: rankPicks(): _*)
  }

  def priceQuantileSketch(s: SparkSession, dir: String): DataFrame =
    priceQuantileSketch(Tables.lineitem(s, dir))

  /** Daily event-value quantiles from the same bounded sketch (q240) —
    * the batch twin of StreamingOps.quantileMonitor, exactly as
    * dailyUniques (q209) twins uniquesMonitor: identical hash, identical
    * aggregate, identical rank picks, so streaming and batch land on the
    * SAME longs and the DuckDB oracle gates both. Row identity =
    * event_id; values = exact cents.
    */
  def dailyValueQuantiles(events: DataFrame, k: Int = 256): DataFrame = {
    import org.apache.spark.sql.Encoders
    val bkq = udaf(new graft.functions.BottomKQuantile(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    events
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_events"),
        bkq(Corpus.h48(col("event_id").cast("string")),
          unscaled(col("value")))
          .as("samp"))
      .select(col("w.start").as("w_start") +: col("n_events") +: rankPicks(): _*)
  }

  def dailyValueQuantiles(s: SparkSession, dir: String): DataFrame =
    dailyValueQuantiles(Tables.events(s, dir))

  /** Weighted-mass estimation by priority sampling (q241): per source,
    * estimate the total character mass from a k-document weighted sample
    * (graft.functions.PrioritySample — the Duffield–Lund–Thorup
    * estimator: heavy documents enter the sample with probability 1,
    * light ones proportionally to weight, and `Σ max(w_i, τ)` over the
    * top-k is unbiased for the true total). This is the audit that
    * prices a mixture or a filter sweep on a 100 TB catalog from k rows
    * per (group × map task) instead of a full scan; the registered demo
    * carries the exact total alongside (one extra map-side sum on a scan
    * that's already happening at this SF) so the estimator's error is
    * itself part of the oracle-checked output.
    *
    * Exactness: the estimate is computed entirely in integer cross
    * products (`max(w_i, τ)` → `max(w_i·2¹⁶·(h_τ+1), w_τ·2⁶⁴)`, exact in
    * DECIMAL(38,0)) with one final double division — both engines land
    * on the identical double, so q241 hash-matches like every other
    * query. Exact below k+1 distinct (weight, hash) pairs per group.
    */
  def massEstimate(docs: DataFrame, k: Int = 64): DataFrame = {
    import org.apache.spark.sql.Encoders
    val ps = udaf(new graft.functions.PrioritySample(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    val dec = DecimalType(38, 0)
    val two64 = lit(new java.math.BigDecimal("18446744073709551616")).cast(dec)
    docs
      .select(col("source"), col("n_chars").cast("long").as("w"),
        Corpus.h48(col("doc_id").cast("string")).as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("total_chars"),
        ps(col("w"), col("h")).as("samp"))
      .withColumn("m", size(col("samp")))
      .withColumn("est_chars",
        when(col("m") <= k,
          aggregate(col("samp"), lit(0L), (acc, x) => acc + x("_1"))
            .cast("double"))
        .otherwise {
          val wt = element_at(col("samp"), k + 1)("_1")
          val ht = element_at(col("samp"), k + 1)("_2")
          val terms = aggregate(slice(col("samp"), 1, k),
            lit(java.math.BigDecimal.ZERO).cast(dec),
            (acc, x) => acc + greatest(
              x("_1").cast(dec) * lit(65536L).cast(dec) * (ht + 1).cast(dec),
              wt.cast(dec) * two64))
          terms.cast("double") / lit(65536.0) / (ht + lit(1L)).cast("double")
        })
      .select(col("source"), col("n_docs"), col("total_chars"),
        least(col("m"), lit(k)).cast("long").as("sample_n"), col("est_chars"),
        (col("est_chars") / col("total_chars").cast("double")).as("err_ratio"))
  }

  /** Registered demo runs k=16: the test corpora hold 25–250 documents
    * per source, so 16 keeps the ESTIMATE path (the part worth
    * oracle-gating — the exact path is a plain sum) exercised at every
    * SF the driver checks. */
  def massEstimate(s: SparkSession, dir: String): DataFrame =
    massEstimate(Tables.documents(s, dir), k = 16)

  /** Sketch-based key-overlap discovery (q238): how much do two tables'
    * key populations overlap — answered from two column-pruned scans and
    * O(k) state, WITHOUT running the join. This is the data-discovery
    * audit a 100 TB catalog runs across table pairs before anyone pays
    * for an actual join (q220's exact estimator still needs both count
    * tables shuffled; this needs k longs per side): per-side KMV
    * distinct-count sketches plus the union sketch from the same pass
    * (grouping sets — the union group is just the merged sketch), then
    * inclusion–exclusion for the overlap and the containment/Jaccard
    * ratios that decide whether A's keys live inside B or vice versa.
    * Exact below k on every sketch; ~1/√k relative error above.
    *
    * Scale: one hash projection per table, one aggregation whose
    * map-side partials are capped at k values per (task × group) no
    * matter the table sizes, one 3-row final fold. Deterministic
    * (md5-derived hashes, integer inversion) so the estimates hash-match
    * the SQL oracle bit for bit.
    */
  def keyOverlapSketch(
      a: DataFrame, aKey: String,
      b: DataFrame, bKey: String,
      k: Int = 64): DataFrame = {
    import org.apache.spark.sql.Encoders
    val kmv = udaf(new graft.functions.KMinValues(k), Encoders.scalaLong)
    // NULL keys are excluded up front: a NULL is not a joinable key, and
    // without the filter md5(NULL) = NULL would coerce to a phantom
    // 0-valued minimum in the primitive-Long KMV state while a SQL
    // engine's NDV keeps counting the NULL row — silent divergence on
    // any nullable key column.
    val hashes = a.filter(col(aKey).isNotNull)
      .select(Corpus.h48(col(aKey).cast("string")).as("h"),
        lit("a").as("side"))
      .unionAll(b.filter(col(bKey).isNotNull)
        .select(Corpus.h48(col(bKey).cast("string")).as("h"),
          lit("b").as("side")))
    hashes
      .groupingSets(Seq(Seq(col("side")), Seq()), col("side"))
      .agg(kmv(col("h")).as("ndv"), grouping(col("side")).as("g"))
      .agg(
        max(when(col("g") === 0 && col("side") === "a", col("ndv"))).as("ndv_a"),
        max(when(col("g") === 0 && col("side") === "b", col("ndv"))).as("ndv_b"),
        max(when(col("g") === 1, col("ndv"))).as("ndv_union"))
      .select(col("ndv_a"), col("ndv_b"), col("ndv_union"),
        greatest(lit(0L),
          col("ndv_a") + col("ndv_b") - col("ndv_union")).as("ndv_overlap"))
      .select(col("ndv_a"), col("ndv_b"), col("ndv_union"), col("ndv_overlap"),
        (col("ndv_overlap").cast("double") /
          nullif(col("ndv_a").cast("double"), lit(0.0))).as("containment_a"),
        (col("ndv_overlap").cast("double") /
          nullif(col("ndv_b").cast("double"), lit(0.0))).as("containment_b"),
        (col("ndv_overlap").cast("double") /
          nullif(col("ndv_union").cast("double"), lit(0.0))).as("jaccard"))
  }

  /** Registered pair: order-placing customers vs event-generating users —
    * the "which identity spaces can I join" question on the testdata. */
  def keyOverlapSketch(s: SparkSession, dir: String): DataFrame =
    keyOverlapSketch(
      Tables.orders(s, dir), "o_custkey",
      Tables.events(s, dir), "user_id")

  /** Hot-key skew profiler (q219): the top-k hottest grouping keys with
    * their row share and skew factor (count ÷ mean rows-per-key) — the
    * audit that decides whether a join/aggregation on this key needs
    * salting (q34/q71) before it hits a 1000-executor cluster, where one
    * hot reducer is the difference between a 5-minute and a 5-hour job.
    *
    * Scale: one map-side-combined count per key, a bounded
    * TakeOrdered(k) for the hot set (never a global sort), and the
    * two scalar totals ride in on a broadcast. skew = row_share · n_keys
    * — two correctly-rounded double ops in a pinned order (an int64
    * cnt·n_keys product would overflow at exactly the hot-key × key-count
    * magnitudes this profiler exists for), so both engines round
    * identically.
    */
  def skewProfile(events: DataFrame, k: Int = 10): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // cached: both the totals aggregate and the top-k cut read it, and a
    // recompute would scan the audited table twice (see joinCardinality)
    val counts = graft.Caches.track(
      events.groupBy(col("user_id")).agg(count(lit(1)).as("cnt")))
    val totals = counts.agg(
      sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"))
    counts
      .orderBy(col("cnt").desc, col("user_id"))
      .limit(k)
      .crossJoin(broadcast(totals))
      .select(col("user_id"), col("cnt").as("n_rows_key"),
        col("n_rows"), col("n_keys"),
        (col("cnt").cast("double") / col("n_rows").cast("double"))
          .as("row_share"),
        (col("cnt").cast("double") / col("n_rows").cast("double") *
          col("n_keys").cast("double")).as("skew_factor"))
  }

  def skewProfile(s: SparkSession, dir: String): DataFrame =
    skewProfile(Tables.events(s, dir))

  /** Join-cardinality pre-flight estimator (q220): the predicted output
    * size of `left ⋈ right` on an equi-key, computed from the two per-key
    * count tables — never by running the join. Per-key contribution is
    * `cnt_left · cnt_right`; the result is the top-k hottest join keys
    * with their contribution and share, plus the exact totals
    * (`est_rows` = Σ contributions = the join's true inner-output row
    * count, `n_join_keys` = matching keys). This is the audit that
    * catches a 10¹²-row join *before* it is submitted: on a
    * 1000-executor cluster the estimate costs two map-side-combined
    * aggregates over key columns only (column-pruned scans) and a join of
    * two count tables bounded by the distinct-key counts — orders of
    * magnitude below the join it predicts.
    *
    * The count-table join is left unhinted: both sides scale with
    * distinct keys, not rows, and AQE broadcasts whichever side turns out
    * small. The one-row totals ride in on a constant broadcast.
    */
  def joinCardinality(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      k: Int = 10): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val lc = left.groupBy(col(leftKey).as("key")).agg(count(lit(1)).as("cnt_left"))
    val rc = right.groupBy(col(rightKey).as("key")).agg(count(lit(1)).as("cnt_right"))
    // cached: totals and the top-k cut both read it, and a recompute
    // would re-scan both input relations
    val contrib = graft.Caches.track(
      lc.join(rc, "key").select(col("key"), col("cnt_left"), col("cnt_right"),
        (col("cnt_left") * col("cnt_right")).as("contribution")))
    val totals = contrib.agg(
      sum(col("contribution")).as("est_rows"), count(lit(1)).as("n_join_keys"))
    contrib
      .orderBy(col("contribution").desc, col("key"))
      .limit(k)
      .crossJoin(broadcast(totals))
      .select(col("key"), col("cnt_left"), col("cnt_right"), col("contribution"),
        col("est_rows"), col("n_join_keys"),
        (col("contribution").cast("double") / col("est_rows").cast("double"))
          .as("share"))
  }

  def joinCardinality(s: SparkSession, dir: String): DataFrame =
    joinCardinality(
      Tables.events(s, dir), "user_id", Tables.orders(s, dir), "o_custkey")

  /** Per-source closed-form OLS fit (q244): regress each document's token
    * count on [1, n_chars, distinct-word count] — the cheap linear probe a
    * curation pipeline fits per source to catch tokenisation drift (a
    * source whose tokens-per-char slope or vocabulary-breadth coefficient
    * jumps between snapshots changed its segmentation, encoding, or
    * boilerplate profile, before any model sees it).
    *
    * The fit is the normal-equations solution done Spark-shaped: ONE
    * map-side-combined aggregate accumulates the nine Gram/moment sums
    * per source as exact DECIMAL(38,0) (per-row products stay inside
    * int64: chars ≤ ~1e5 squared is 1e10), then a per-group projection
    * solves the 3×3 system by Cramer's rule in doubles. Every moment is
    * an exact integer, every determinant is the same fixed-parenthesis
    * expression tree in any engine, so coefficients are bit-identical —
    * never an iterative solver, never a driver-side matrix. A singular
    * Gram matrix (constant features) yields NULL coefficients via the
    * nullif guard rather than ±Inf.
    *
    * Scale: the token/vocab features ride the tfidf explode→aggregate
    * discipline (high-cardinality doc_id keys); the final aggregate is
    * |sources| rows. No step holds more than a row of state per group.
    */
  def sourceOlsFit(docs: DataFrame): DataFrame = {
    import graft.functions.Text
    val d = DecimalType(38, 0)
    val words = docs
      .repartition(shuffleWidth(docs), col("doc_id"))
      .select(col("doc_id"), explode(Text.words(col("text"))).as("word"))
    val perDoc = words.groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("y"), count(lit(1)).as("ndw"))
    val feat = docs.select(col("doc_id"), col("source"), col("n_chars"))
      .hint("shuffle_hash").join(perDoc.hint("shuffle_hash"), "doc_id")
    val m = feat.groupBy(col("source")).agg(
      count(lit(1)).as("n"),
      sum(col("n_chars").cast(d)).as("sx1"),
      sum(col("ndw").cast(d)).as("sx2"),
      sum(col("y").cast(d)).as("sy"),
      sum((col("n_chars") * col("n_chars")).cast(d)).as("sx11"),
      sum((col("n_chars") * col("ndw")).cast(d)).as("sx12"),
      sum((col("ndw") * col("ndw")).cast(d)).as("sx22"),
      sum((col("n_chars") * col("y")).cast(d)).as("sx1y"),
      sum((col("ndw") * col("y")).cast(d)).as("sx2y"),
      sum((col("y") * col("y")).cast(d)).as("syy"))
    // symmetric 3×3 normal equations solved by Cramer in doubles; the
    // parenthesisation below is replicated verbatim in the SQL oracle
    def dbl(c: String) = col(c).cast("double")
    val (n, sx1, sx2, sy) = (dbl("n"), dbl("sx1"), dbl("sx2"), dbl("sy"))
    val (sx11, sx12, sx22) = (dbl("sx11"), dbl("sx12"), dbl("sx22"))
    val (sx1y, sx2y, syy) = (dbl("sx1y"), dbl("sx2y"), dbl("syy"))
    val det = (n * (sx11 * sx22 - sx12 * sx12)
      - sx1 * (sx1 * sx22 - sx12 * sx2)) + sx2 * (sx1 * sx12 - sx11 * sx2)
    val det0 = (sy * (sx11 * sx22 - sx12 * sx12)
      - sx1 * (sx1y * sx22 - sx12 * sx2y)) + sx2 * (sx1y * sx12 - sx11 * sx2y)
    val det1 = (n * (sx1y * sx22 - sx12 * sx2y)
      - sy * (sx1 * sx22 - sx12 * sx2)) + sx2 * (sx1 * sx2y - sx1y * sx2)
    val det2 = (n * (sx11 * sx2y - sx1y * sx12)
      - sx1 * (sx1 * sx2y - sx1y * sx2)) + sy * (sx1 * sx12 - sx11 * sx2)
    val b0 = det0 / nullif(det, lit(0.0))
    val b1 = det1 / nullif(det, lit(0.0))
    val b2 = det2 / nullif(det, lit(0.0))
    val sst = syy - (sy * sy) / n
    val sse = syy - ((b0 * sy + b1 * sx1y) + b2 * sx2y)
    m.select(col("source"), col("n"),
      b0.as("beta0"), b1.as("beta1"), b2.as("beta2"),
      (lit(1.0) - sse / nullif(sst, lit(0.0))).as("r2"))
  }

  def sourceOlsFit(s: SparkSession, dir: String): DataFrame =
    sourceOlsFit(Tables.documents(s, dir))

  /** Per-doc duplicate-bigram share in integer micro-units on the fixed
    * [0, 1e6] grid — the q237 `dup_share` signal made exact-integer so
    * the rank statistics below ([[scoreAuc]], [[calibrationBins]]) never
    * touch a float: `s = (1e6 * dup_mass) div n_grams`. Carries the
    * `source` stratum and the `lang = 'en'` label the evaluations score
    * against. Docs under two words have no bigrams and are excluded
    * (same rule as q237).
    */
  private def dupShareMicro(docs: DataFrame): DataFrame = {
    import graft.functions.Text
    docs
      .repartition(shuffleWidth(docs), col("doc_id"))
      .select(col("doc_id"), col("source"), (col("lang") === "en").as("pos"),
        Text.words(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), col("source"), col("pos"),
        explode(Text.bigrams(col("w"))).as("g"))
      .groupBy(col("doc_id"), col("source"), col("pos"), col("g"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"), col("source"), col("pos"))
      .agg(sum(col("n")).as("n_grams"),
        sum(when(col("n") >= 2, col("n")).otherwise(0L)).as("dup_mass"))
      .select(col("source"), col("pos"),
        expr("(1000000 * dup_mass) div n_grams").as("s"))
  }

  /** Per-source ranking quality of a screening signal (q246): the
    * Mann-Whitney AUC of the duplicate-bigram share predicting the
    * `lang = 'en'` label — the standard "is this cheap quality score
    * actually separating the populations" audit a filter sweep runs
    * before committing to a threshold. AUC is computed from the exact
    * tie-corrected rank-sum: with per-(source, score) counts `(n_v,
    * npos_v)` and `below_v` rows strictly under `v`, twice the positive
    * rank-sum is `Σ npos_v · (2·below_v + n_v + 1)` (midranks), and
    * `auc = (2R - npos(npos+1)) / (2·npos·nneg)` — one double division
    * at the very end, everything before it an exact integer.
    *
    * Scale: the score lives on the BOUNDED integer grid [0, 1e6], so the
    * cumulative `below` needs no data-dependent sort: rows reduce to
    * per-(source, score) counts (≤ |sources|·1e6 groups regardless of
    * corpus size), the prefix runs two-level over the fixed
    * `s div 1e5` decade — an 11-bucket offset table (bounded, broadcast)
    * plus a within-bucket window whose partitions hold ≤ 1e5 distinct
    * values by construction. No single-partition window at any data
    * size; the 100 TB shape is three hash aggregates and a broadcast.
    */
  def scoreAuc(docs: DataFrame): DataFrame = {
    val dec = DecimalType(38, 0)
    val g = Caches.track(dupShareMicro(docs)
      .groupBy(col("source"), col("s"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("npos"))
      .withColumn("b", expr("s div 100000")))
    val off = g.groupBy(col("source"), col("b")).agg(sum(col("n")).as("bn"))
      .withColumn("offset",
        coalesce(sum(col("bn")).over(Window.partitionBy(col("source"))
          .orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("b"), col("offset"))
    g.withColumn("run",
        coalesce(sum(col("n")).over(Window
          .partitionBy(col("source"), col("b")).orderBy(col("s"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(broadcast(off), Seq("source", "b"))
      .withColumn("below", col("run") + col("offset"))
      .groupBy(col("source"))
      .agg(sum(col("npos")).as("npos"),
        sum(col("n") - col("npos")).as("nneg"),
        sum(col("npos").cast(dec) *
          (lit(2L) * col("below") + col("n") + lit(1L)).cast(dec)).as("r2"))
      .select(col("source"), col("npos"), col("nneg"),
        ((col("r2") - (col("npos").cast(dec) *
            (col("npos") + 1).cast(dec))).cast("double") /
          nullif((lit(2L) * col("npos") * col("nneg")).cast("double"),
            lit(0.0))).as("auc"))
  }

  def scoreAuc(s: SparkSession, dir: String): DataFrame =
    scoreAuc(Tables.documents(s, dir))

  /** Neyman-optimal eval-set allocation (q268): split a fixed
    * human-review budget across source strata ∝ N_h·S_h — stratum size
    * times stratum standard deviation of the screening score (the q246
    * dup-bigram-share micro score) — the classical minimum-variance
    * allocation for estimating the corpus mean score from `evalBudget`
    * labeled docs. High-variance strata (where a sample tells you most)
    * get proportionally more of the budget than proportional sampling
    * would give; a zero-variance stratum gets zero (its mean is already
    * known from any one doc — the textbook caveat, documented not
    * patched). Allocations may exceed a small stratum's size, as in the
    * textbook form.
    *
    * Exactness: N·S = sqrt(N·Σs² − (Σs)²) on the micro grid. The root is
    * taken as an EXACT integer sqrt: an IEEE-correct double sqrt seeds
    * within ±2 of the true root (root ≤ ~5·10¹⁵ < 2⁵³ even at 10¹⁰
    * docs/stratum, and the DECIMAL(38,0) radicand reaches the double
    * correctly rounded), then two exact +1 probes and two exact −1
    * probes in DECIMAL(38,0) clamp to floor(√m) regardless of which side
    * the seed landed — both engines converge to the same integer even if
    * their libm ulps differ. Seats then assign by the q194
    * largest-remainder discipline (pure integer arithmetic).
    *
    * Scale: one corpus pass (the q246 score derivation), then
    * |sources|-row arithmetic; the only windows are over the bounded
    * per-source relation.
    */
  def neymanAllocation(docs: DataFrame, evalBudget: Long = 1000L): DataFrame = {
    val dec = DecimalType(38, 0)
    val g = Caches.track(dupShareMicro(docs)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("s").cast(dec)).as("s1"),
        sum(col("s").cast(dec) * col("s").cast(dec)).as("s2"))
      .withColumn("m", col("n_docs").cast(dec) * col("s2") -
        col("s1") * col("s1"))
      .withColumn("r0", floor(sqrt(col("m").cast("double"))).cast(dec))
      .withColumn("r1", when((col("r0") + 1) * (col("r0") + 1) <= col("m"),
        col("r0") + 1).otherwise(col("r0")))
      .withColumn("r2", when((col("r1") + 1) * (col("r1") + 1) <= col("m"),
        col("r1") + 1).otherwise(col("r1")))
      .withColumn("r3", when(col("r2") * col("r2") > col("m"),
        col("r2") - 1).otherwise(col("r2")))
      .withColumn("w", when(col("r3") * col("r3") > col("m"),
        col("r3") - 1).otherwise(col("r3"))))
    val win = Window.orderBy(col("rem").desc, col("source"))
    val withBase = Caches.track(g
      .crossJoin(broadcast(g.agg(sum(col("w")).as("w_tot"))))
      .withColumn("base",
        expr(s"(cast($evalBudget as decimal(38,0)) * w) div w_tot"))
      .withColumn("rem", (col("w") * evalBudget) % col("w_tot")))
    withBase
      .crossJoin(broadcast(withBase.agg(sum(col("base")).as("base_tot"))))
      .withColumn("rk", row_number().over(win))
      .withColumn("alloc_docs", col("base") +
        when(col("rk") <= lit(evalBudget) - col("base_tot"), 1L).otherwise(0L))
      .select(col("source"), col("n_docs"),
        col("w").cast("long").as("ns_sd"), col("alloc_docs"))
  }

  def neymanAllocation(s: SparkSession, dir: String): DataFrame =
    neymanAllocation(Tables.documents(s, dir))

  /** Quality-signal rank agreement (q273): per source, Spearman's rho
    * (with ties, i.e. Pearson on MIDRANKS) between two independent
    * "badness" signals — the duplicate-bigram share (q246's screening
    * score) and the add-one LM inverse-fluency (q236's statistic as the
    * per-doc exact integer `s div n_bigrams`). Curation pipelines stack
    * filters; this is the audit that says whether two filters measure
    * the same thing (rho → 1: the second filter is redundant) or
    * different things (rho → 0: both earn their place). Both scores
    * derive from ONE shared exploded-bigram relation — the corpus is
    * read once.
    *
    * Exactness: midranks are exact half-integers carried DOUBLED
    * (`mr2 = min_rank + max_rank` over a tie group); the per-source
    * moments are DECIMAL(38,0); rho lands on the 1e6 grid as
    * `sign(cov) · |cov_n| div ((isqrt(varA_n)·isqrt(varB_n)) div 1e6)`
    * with the q268 exact integer sqrt — every division is positive, so
    * Spark `div` ≡ DuckDB `//`. Moments scale as 4·n⁴ per source: exact
    * to ~1.3e9 docs per source in DECIMAL(38,0)/HUGEINT; beyond that,
    * rescale the rank grid (divide mr2 by a power of two) — documented,
    * not silent.
    *
    * Scale (round-15 shape): NO doc row is ever ranked. Both scores
    * live on the 1e6 micro grid, so the tie-group relation
    * (sig, source, score, cnt) is GRID-BOUNDED (≤ 1e6+1 rows per source
    * per signal at any corpus size) and each group's doubled midrank is
    * prefix arithmetic over it; docs then take two narrow probe joins
    * to pick up their midranks, and the final moments are one
    * map-side-combined aggregate to |sources| rows. The round-14
    * bucketedPrefix rank (sampling pass + range shuffle over 2n stacked
    * doc rows + tie-group join-back + pivot) was A/B'd and replaced:
    * sf0.1 pin 5.28 → 4.79, 100× 17.3 → 12.3 s. The pair relation is
    * additionally cached g-partitioned (`dgg`) so the type aggregate
    * and the per-doc probe join share ONE pair-relation shuffle
    * instead of paying it twice: sf0.1 4.79 → 3.26, 100× 12.3 →
    * 10.6 s. Net round-15: pin 5.28 → 3.26, 100× 17.3 → 10.6 s.
    *
    * Round-19 fusion (guide §2.3/§2.4): the two per-doc scores used to be
    * SEPARATE aggregates joined back on doc_id — `sa` (dup share) scanned
    * a second, doc_id-partitioned cache of the pair relation, `sb`
    * (fluency) aggregated the inv_p probe join, and a doc-keyed
    * shuffle-hash join stitched them. But every input either score needs
    * is present in ONE relation — the g-partitioned pair cache joined to
    * the per-type inv_p — because the typeScore join is a no-op row-wise
    * (typeScore has exactly one row per g, derived from the same
    * relation, so the inner join keeps every pair row exactly once), and
    * `source` is functionally dependent on doc_id (primary key), so
    * grouping by (doc_id, source) gives the same groups as doc_id.
    * Both scores are now three sums in a single (doc_id, source)
    * aggregate over that join: the doc_id-partitioned pair cache, the
    * `sa` pass over it, and the scored join are gone — one InMemoryRelation
    * build fewer, one full pair-relation pass fewer, one doc-keyed join
    * exchange fewer. Bit-identical: n_grams ≡ the old nb (Σn over the
    * same group), every sum is the same exact integer/decimal arithmetic.
    */
  def signalAgreement(docs: DataFrame, buckets: Int = 32): DataFrame = {
    import graft.functions.Text
    val dec = DecimalType(38, 0)
    // ONE explode pass, immediately collapsed to distinct (doc, bigram)
    // pairs with occurrence counts — the round-14 cut. Everything both
    // scores need is derivable from this relation: the LM's bigram
    // counts (n12 = Σ_docs n), head counts (n1 = Σ_types n12), the
    // dup-share numerator (pairs with n ≥ 2), and the per-doc fluency
    // sum (Σ n·inv_p — occurrences of the same bigram in the same doc
    // share one inv_p). The previous shape scored PER OCCURRENCE: the
    // (g, w1) model joins carried every bigram token in the corpus;
    // this one carries only distinct pairs (~0.6× rows at sf0.1, and
    // the gap widens with duplication — exactly the corpora this audit
    // targets). Results are bit-identical: the oracle is unchanged.
    // doc_id repartition + bg cache were A/B'd against a no-repartition
    // and an uncached-types variant at 10×/100× (round 14): at sf0.1 the
    // stripped variant reads ~0.5 s faster (pure stage-count overhead),
    // but at 100× this shape wins 13.7 s vs 16.3–20.7 s — the text
    // shuffle co-locates every per-doc aggregate and the types cache
    // spares two extra passes over the pair relation. Scale wins.
    // ONE pair-relation cache, g-partitioned: the type aggregate (bg)
    // and the per-doc inv_p probe join both need g-clustering. The
    // doc_id text shuffle before the explode makes the pair collapse
    // exchange-free (hash(doc_id) clusters (doc_id, source, g)); the
    // collapsed distinct pairs then take the one g-keyed exchange into
    // the cache. The former second, doc_id-partitioned cache existed
    // only for the separate dup-share aggregate — fused below.
    val dgg = Caches.track(docs
      .repartition(shuffleWidth(docs), col("doc_id"))
      .select(col("doc_id"), col("source"), Text.words(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), col("source"),
        explode(graft.functions.Text.bigrams(col("w"))).as("g"))
      .groupBy(col("doc_id"), col("source"), col("g"))
      .agg(count(lit(1)).as("n"))
      .repartition(shuffleWidth(docs), col("g")))
    val bg = Caches.track(dgg.groupBy(col("g")).agg(sum(col("n")).as("n12"))
      .withColumn("w1", element_at(split(col("g"), " "), 1)))
    val heads = bg.groupBy(col("w1")).agg(sum(col("n12")).as("n1"))
    val vocab = heads.agg(count(lit(1)).as("v"))
    val typeScore = bg.hint("shuffle_hash")
      .join(heads.hint("shuffle_hash"), "w1")
      .crossJoin(broadcast(vocab))
      .select(col("g"),
        expr("(1000000 * (n1 + v)) div (n12 + 1)").as("inv_p_micro"))
    // BOTH scores in one (doc_id, source) aggregate over the pair ⋈
    // typeScore relation (round-19 fusion — see scaladoc): score A
    // (dup-bigram share, q246's screen) needs only n; score B (q236's
    // inverse-fluency exact integer mean) needs n·inv_p; n_grams serves
    // as both A's denominator and B's nb (Σn over the same group).
    val scored = Caches.track(
      dgg.hint("shuffle_hash").join(typeScore.hint("shuffle_hash"), "g")
        .groupBy(col("doc_id"), col("source"))
        .agg(sum(col("n")).as("n_grams"),
          sum(when(col("n") >= 2, col("n")).otherwise(0L)).as("dup_mass"),
          sum((col("n").cast(dec) * col("inv_p_micro")).cast(dec)).as("s"))
        .select(col("doc_id"), col("source"),
          expr("(1000000 * dup_mass) div n_grams").as("s_dup"),
          expr("cast(s div n_grams as long)").as("s_flu")))
    // exact midranks WITHOUT ranking any doc row (round 15): both
    // scores live on the 1e6 micro grid, so the tie-group relation
    // (sig, source, v, cnt) is GRID-BOUNDED — ≤ 1e6+1 rows per source
    // per signal at ANY corpus size — and a tie group's doubled midrank
    // is pure prefix arithmetic over it: mr2 = 2·(count below) + cnt + 1
    // (= min_rank + max_rank). The round-14 shape ranked the 2n stacked
    // DOC rows through bucketedPrefix (a sampling pass + range shuffle)
    // and joined the tie groups back with a pivot aggregate — four
    // corpus-scaled exchanges where this needs ONE map-side-combined
    // count to the grid relation plus two narrow doc-keyed probe joins
    // (A/B at sf0.1: 5.28 → 4.79 s, at 100×: 17.3 → 12.3 s; the
    // per-(sig, source) window sorts grid-bounded partitions, not
    // corpus-scaled ones, so the single-partition-window objection the
    // old scaladoc answered no longer has a corpus-scaled input to bite)
    val stacked = scored
      .select(col("source"), lit("a").as("sig"), col("s_dup").as("v"))
      .unionByName(scored.select(col("source"),
        lit("b").as("sig"), col("s_flu").as("v")))
    val wsrc = Window.partitionBy(col("sig"), col("source")).orderBy(col("v"))
    val mrGroups = stacked
      .groupBy(col("sig"), col("source"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("mr2", lit(2L) * coalesce(sum(col("cnt")).over(
          wsrc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) +
        col("cnt") + lit(1L))
    val mr = scored.hint("shuffle_hash")
      .join(mrGroups.filter(col("sig") === "a")
        .select(col("source"), col("v").as("s_dup"), col("mr2").as("a2"))
        .hint("shuffle_hash"),
        Seq("source", "s_dup"))
      .hint("shuffle_hash")
      .join(mrGroups.filter(col("sig") === "b")
        .select(col("source"), col("v").as("s_flu"), col("mr2").as("b2"))
        .hint("shuffle_hash"),
        Seq("source", "s_flu"))
      .select(col("doc_id"), col("source"), col("a2"), col("b2"))
    val m = mr.groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("a2").cast(dec)).as("sa1"),
        sum(col("b2").cast(dec)).as("sb1"),
        sum((col("a2").cast(dec) * col("b2")).cast(dec)).as("sab"),
        sum((col("a2").cast(dec) * col("a2")).cast(dec)).as("saa"),
        sum((col("b2").cast(dec) * col("b2")).cast(dec)).as("sbb"))
      .withColumn("covn", col("n").cast(dec) * col("sab") - col("sa1") * col("sb1"))
      .withColumn("vara", col("n").cast(dec) * col("saa") - col("sa1") * col("sa1"))
      .withColumn("varb", col("n").cast(dec) * col("sbb") - col("sb1") * col("sb1"))
    def isqrtOf(c: String): Column = {
      val r0 = floor(sqrt(col(c).cast("double"))).cast(dec)
      val r1 = when((r0 + 1) * (r0 + 1) <= col(c), r0 + 1).otherwise(r0)
      val r2 = when((r1 + 1) * (r1 + 1) <= col(c), r1 + 1).otherwise(r1)
      val r3 = when(r2 * r2 > col(c), r2 - 1).otherwise(r2)
      when(r3 * r3 > col(c), r3 - 1).otherwise(r3)
    }
    m.withColumn("ra", isqrtOf("vara"))
      .withColumn("rb", isqrtOf("varb"))
      .withColumn("denom", expr("(ra * rb) div 1000000"))
      .select(col("source"), col("n").as("n_docs"),
        when(col("denom") > 0,
          when(col("covn") >= 0, expr("abs(covn) div denom"))
            .otherwise(-expr("abs(covn) div denom")))
          .otherwise(lit(null).cast("long")).as("rho_micro"))
  }

  def signalAgreement(s: SparkSession, dir: String): DataFrame =
    signalAgreement(Tables.documents(s, dir))

  /** Calibration / reliability bins (q247): the duplicate-bigram share
    * bucketed into eleven fixed micro-grid bins (`s div 1e5`; bin 10 is
    * the exactly-1.0 scores), each with its doc count, mean score, and
    * empirical `lang = 'en'` rate — the reliability-diagram table that
    * says whether a screening score's magnitude means anything or only
    * its ordering does (q246 grades ordering; this grades level).
    * The mean is an exact integer micro-unit sum with one fixed
    * `(double / 1e6) / n` division chain at the end; the positive rate
    * is one exact-count division. One map-side-combined aggregate over
    * an 11-key space — nothing about this shape changes at 100 TB.
    */
  def calibrationBins(docs: DataFrame): DataFrame = {
    val dec = DecimalType(38, 0)
    dupShareMicro(docs)
      .groupBy(expr("s div 100000").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("s").cast(dec)).as("s_sum"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("npos"))
      .select(col("bin"), col("n"),
        (col("s_sum").cast("double") / 1e6 / col("n").cast("double"))
          .as("mean_score"),
        (col("npos").cast("double") / col("n").cast("double"))
          .as("pos_rate"))
  }

  def calibrationBins(s: SparkSession, dir: String): DataFrame =
    calibrationBins(Tables.documents(s, dir))

  /** Optimal screening threshold per source (q252): the Youden-J point
    * of the duplicate-bigram-share score against the `lang = 'en'`
    * label — the third leg of the evaluation suite (q246 grades
    * ordering, q247 grades level, this picks the operating point a
    * filter would actually deploy). For every observed score value `t`
    * (classify `s ≥ t` as flagged), `J(t) = |TPR − FPR|`; the argmax is
    * computed on the EXACT integer numerator `|flagged_pos · nneg −
    * flagged_neg · npos|` (the common `npos·nneg` denominator is
    * positive, so the integer argmax IS the rational argmax), ties
    * broken to the smallest threshold via `max(struct(jnum, −t))`; the
    * three ratios are single double divisions at the end.
    *
    * Scale: flagged counts at every threshold are SUFFIX sums over the
    * per-(source, score) count relation — the q246 bounded-micro-grid
    * prefix, run descending. No unpartitioned window, no sort of
    * anything data-sized; one-class sources yield NULL ratios.
    */
  def youdenThreshold(docs: DataFrame): DataFrame = {
    val dec = DecimalType(38, 0)
    val g = Caches.track(dupShareMicro(docs)
      .groupBy(col("source"), col("s"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("npos"))
      .withColumn("b", expr("s div 100000")))
    // suffix sums: rows with score >= t, via the descending two-level
    // fixed-grid prefix (11 bounded bucket offsets + within-bucket runs)
    val off = g.groupBy(col("source"), col("b"))
      .agg(sum(col("n")).as("bn"), sum(col("npos")).as("bp"))
      .withColumn("off_n",
        coalesce(sum(col("bn")).over(Window.partitionBy(col("source"))
          .orderBy(col("b").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("off_p",
        coalesce(sum(col("bp")).over(Window.partitionBy(col("source"))
          .orderBy(col("b").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("b"), col("off_n"), col("off_p"))
    val inB = Window.partitionBy(col("source"), col("b")).orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g
      .withColumn("run_n", sum(col("n")).over(inB))
      .withColumn("run_p", sum(col("npos")).over(inB))
      .join(broadcast(off), Seq("source", "b"))
      .withColumn("fl_n", col("run_n") + col("off_n"))
      .withColumn("fl_p", col("run_p") + col("off_p"))
    val tot = g.groupBy(col("source"))
      .agg(sum(col("n")).as("tn"), sum(col("npos")).as("tp"))
    cum.join(broadcast(tot), "source")
      .withColumn("jnum", abs(
        col("fl_p").cast(dec) * (col("tn") - col("tp")).cast(dec) -
          (col("fl_n") - col("fl_p")).cast(dec) * col("tp").cast(dec)))
      .groupBy(col("source"))
      .agg(max(struct(col("jnum"), (-col("s")).as("negs"),
        col("fl_p"), col("fl_n"), col("tp"), col("tn"))).as("m"))
      .select(col("source"), (-col("m.negs")).as("threshold_micro"),
        (col("m.fl_p").cast("double") /
          nullif(col("m.tp").cast("double"), lit(0.0))).as("tpr"),
        ((col("m.fl_n") - col("m.fl_p")).cast("double") /
          nullif((col("m.tn") - col("m.tp")).cast("double"), lit(0.0)))
          .as("fpr"),
        (col("m.jnum").cast("double") /
          nullif((col("m.tp").cast(dec) * (col("m.tn") - col("m.tp")).cast(dec))
            .cast("double"), lit(0.0))).as("j"))
  }

  def youdenThreshold(s: SparkSession, dir: String): DataFrame =
    youdenThreshold(Tables.documents(s, dir))

  /** Decile lift / cumulative-gains table (q256): rank the corpus by the
    * duplicate-bigram screening score (descending), cut it into ten
    * equal-count deciles, and report each decile's `lang = 'en'` rate
    * against the base rate — the fourth leg of the evaluation suite
    * (q246 ordering, q247 level, q252 operating point, this one
    * TARGETING: "if I can only afford to re-process the top 10/20/30%,
    * how much of the positive class do I capture"). `lift > 1` in the
    * top deciles is what justifies score-ordered processing at all.
    *
    * Ranks come from the exact descending prefix over per-score counts
    * on the bounded micro-grid (the q252 suffix machinery):
    * `decile = min(9, (10 · rows_strictly_above) div N)`. Tied scores
    * form atomic groups assigned to their first rank's decile, so a
    * heavy tie clump can leave later deciles empty rather than being
    * split nondeterministically — documented, exact, engine-identical.
    * Rates and lifts are integer cross-products with one trailing double
    * division (`lift = npos_d · N / (n_d · NP)`).
    *
    * Scale: everything after the per-(score) count aggregate is bounded
    * — an 11-row bucket offset table, a ≤1e6-key decile assignment, and
    * ten-row cumulative windows. The only data-sized passes are the
    * bigram explode and one hash aggregate.
    */
  def decileLift(docs: DataFrame): DataFrame = {
    val dec = DecimalType(38, 0)
    val g = Caches.track(dupShareMicro(docs)
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("npos"))
      .withColumn("b", expr("s div 100000")))
    // rows strictly above each score: descending two-level prefix over
    // the fixed grid (bucket offsets bounded at 11 rows, runs bounded by
    // the 1e5-value bucket domain)
    val off = g.groupBy(col("b")).agg(sum(col("n")).as("bn"))
      .withColumn("off_n",
        coalesce(sum(col("bn")).over(Window.orderBy(col("b").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("b"), col("off_n"))
    val tot = g.agg(sum(col("n")).as("nn"), sum(col("npos")).as("np"))
    val deciles = g
      .withColumn("run",
        coalesce(sum(col("n")).over(Window.partitionBy(col("b"))
          .orderBy(col("s").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(broadcast(off), "b")
      .crossJoin(broadcast(tot))
      .withColumn("decile",
        least(lit(9L), expr("(10 * (run + off_n)) div nn")))
      .groupBy(col("decile"))
      .agg(sum(col("n")).as("n"), sum(col("npos")).as("npos"),
        max(col("nn")).as("nn"), max(col("np")).as("np"))
    // ten-row cumulative pass: bounded by construction
    val cum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deciles
      .withColumn("cum_n", sum(col("n")).over(cum))
      .withColumn("cum_npos", sum(col("npos")).over(cum))
      .select(col("decile"), col("n"), col("npos"),
        (col("npos").cast("double") / col("n").cast("double"))
          .as("response_rate"),
        ((col("npos").cast(dec) * col("nn").cast(dec)).cast("double") /
          nullif((col("n").cast(dec) * col("np").cast(dec)).cast("double"),
            lit(0.0))).as("lift"),
        (col("cum_npos").cast("double") /
          nullif(col("np").cast("double"), lit(0.0))).as("cum_capture"),
        ((col("cum_npos").cast(dec) * col("nn").cast(dec)).cast("double") /
          nullif((col("cum_n").cast(dec) * col("np").cast(dec))
            .cast("double"), lit(0.0))).as("cum_lift"))
  }

  def decileLift(s: SparkSession, dir: String): DataFrame =
    decileLift(Tables.documents(s, dir))

  /** Chance-corrected classifier agreement (q262): Cohen's kappa over
    * the q245 NB source-classifier confusion matrix — observed accuracy
    * corrected for the agreement a marginal-respecting random assignment
    * would reach, the standard guard against a classifier that scores
    * "accurate" by parroting the majority source. All ratios are exact
    * integer micro-units (`div`), so kappa hashes identically across
    * engines; chance mass is DECIMAL(38,0) because
    * `1e6 · Σ(n_actual·n_pred)` exceeds a long once the corpus passes
    * ~10⁶ scored docs.
    *
    * Scale: everything after [[Corpus.nbConfusion]] is arithmetic over a
    * |sources|²-bounded matrix — two |sources|-row marginal aggregates,
    * one broadcast equi-join between them, and a broadcast cross of two
    * one-row scalars. The classifier pass itself is q245's plan.
    */
  def kappaAgreement(docs: DataFrame): DataFrame = {
    val dec = DecimalType(38, 0)
    val cm = Caches.track(Corpus.nbConfusion(docs))
    val tot = cm.agg(sum(col("n")).as("n_total"),
      sum(when(col("source") === col("predicted"), col("n")).otherwise(0L))
        .as("n_agree"))
    // Σ row-marginal × col-marginal over classes present on BOTH axes
    // (a class never predicted, or predicted but never actual,
    // contributes zero to the product either way)
    val chance = cm.groupBy(col("source")).agg(sum(col("n")).as("n_actual"))
      .join(cm.groupBy(col("predicted")).agg(sum(col("n")).as("n_pred")),
        col("source") === col("predicted"))
      .agg(sum((col("n_actual") * col("n_pred")).cast(dec))
        .as("chance_mass"))
    tot.crossJoin(broadcast(chance))
      .withColumn("po_micro", expr("(1000000L * n_agree) div n_total"))
      .withColumn("pe_micro",
        expr("""(CAST(1000000 AS DECIMAL(38,0)) * chance_mass) div
               (CAST(n_total AS DECIMAL(38,0)) * CAST(n_total AS DECIMAL(38,0)))"""))
      .select(col("n_total"), col("n_agree"),
        col("po_micro"), col("pe_micro"),
        expr("(1000000L * (po_micro - pe_micro)) div (1000000L - pe_micro)")
          .as("kappa_micro"))
  }

  def kappaAgreement(s: SparkSession, dir: String): DataFrame =
    kappaAgreement(Tables.documents(s, dir))

  /** k-anonymity / l-diversity audit across a generalization ladder
    * (q282) — the privacy check a curation pass runs before releasing a
    * table keyed on quasi-identifiers, completing the governance family
    * (PII scrub q54, GDPR erase q276, forget propagation). The
    * quasi-identifier here is (nation, account-balance band); the
    * sensitive attribute is the market segment. Sweeping the band width
    * (100 / 1 000 / 10 000 currency units) is the generalization-ladder
    * decision the auditor actually makes: how coarse must the balance
    * bucket be before every equivalence class reaches the k floor?
    *
    * Per ladder level: equivalence classes = groupBy(level, nation,
    * band); k = class size, l = distinct sensitive values in the class.
    * The report row per level carries the class count, min/max k, the
    * record mass in classes below k=5 (prosecutor-risk records — the
    * rows an adversary who knows the QI pins to < 5 candidates), and the
    * minimum l (a class with l = 1 leaks the sensitive value outright,
    * whatever its k).
    *
    * Scale: the ladder is exploded BEFORE the single wide aggregation,
    * so the whole audit is one shuffle of |ladder| × |table| keyed rows
    * and one |classes|-row re-aggregation — no per-level passes over the
    * table. The band is floor(bal / width) on IEEE doubles (exact parity
    * with the oracle's floor-division; widths are powers of ten so the
    * quotient is well inside exact double range).
    */
  def kAnonymityAudit(customer: DataFrame,
      widths: Seq[Long] = Seq(100L, 1000L, 10000L),
      kFloor: Long = 5L): DataFrame = {
    val classes = customer
      .select(col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      .withColumn("band_width", explode(array(widths.map(lit(_)): _*)))
      .withColumn("band",
        floor(col("c_acctbal") / col("band_width")).cast("long"))
      .groupBy(col("band_width"), col("c_nationkey"), col("band"))
      .agg(count(lit(1)).as("k"),
        countDistinct(col("c_mktsegment")).as("l"))
    classes.groupBy(col("band_width"))
      .agg(
        count(lit(1)).as("n_classes"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        sum(when(col("k") < kFloor, col("k")).otherwise(0L))
          .as("records_at_risk"),
        count(when(col("k") < kFloor, 1)).as("classes_at_risk"),
        min(col("l")).as("min_l"),
        count(when(col("l") === 1, 1)).as("classes_l1"))
  }

  def kAnonymityAudit(s: SparkSession, dir: String): DataFrame =
    kAnonymityAudit(Tables.customer(s, dir))

  /** Isotonic calibration of a quality signal against dup labels
    * (q290): the PAV (pool-adjacent-violators) fit, in its CLOSED
    * minimax form — fit_i = max_{j≤i} min_{k≥i} mean(y over bins j..k)
    * — of the exact-dup rate across type-token-ratio density bins. A
    * curation pipeline uses the calibrated curve, not the raw bin
    * rates, to turn a heuristic quality score into a monotone "expected
    * dup probability" it can threshold; PAV is the standard isotonic
    * regression and the minimax identity makes it one bounded
    * relational expression instead of a sequential merge loop.
    *
    * Exactness: bin means live on the micro grid with floor division,
    * and floor is monotone, so minimax of floored means = floor of the
    * true PAV fit — both engines agree bit-for-bit (spec also replays a
    * real stack-PAV on exact rationals and compares modulo the floor).
    *
    * Scale: ONE corpus pass builds the ≤ 21-bin relation (the md5
    * exact-dup flag is a fp-keyed aggregate + semi-join, q20's rule);
    * the O(bins²) minimax runs on the bounded bin relation — windows
    * and joins there never see the corpus.
    */
  def isotonicCalibration(docs: DataFrame, binWidth: Long = 50000L): DataFrame = {
    val ws = graft.functions.Text.words(col("text"))
    val scored = Caches.track(docs.select(md5(col("text")).as("fp"),
      (lit(1000000L) * size(array_distinct(ws)).cast("long")).as("dm"),
      size(ws).cast("long").as("n_tok"))
      .withColumn("bin", expr(s"(dm div n_tok) div $binWidth"))
      .select(col("fp"), col("bin")))
    val dupFp = scored.groupBy(col("fp")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select(col("fp")).withColumn("is_dup", lit(1L))
    val binRel = Caches.track(scored
      .join(dupFp.hint("shuffle_hash"), Seq("fp"), "left")
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_dups")))
    val byBin = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = Caches.track(binRel
      .withColumn("cd", sum(col("n_docs")).over(byBin))
      .withColumn("cy", sum(col("n_dups")).over(byBin)))
    val pairs = cum.as("j").join(cum.as("k"), col("j.bin") <= col("k.bin"))
      .select(col("j.bin").as("j"), col("k.bin").as("k"),
        expr("""(1000000L * (k.cy - j.cy + j.n_dups))
               div (k.cd - j.cd + j.n_docs)""").as("mean_micro"))
    val fits = binRel.select(col("bin"))
      .join(pairs, col("j") <= col("bin") && col("k") >= col("bin"))
      .groupBy(col("bin"), col("j")).agg(min(col("mean_micro")).as("mn"))
      .groupBy(col("bin")).agg(max(col("mn")).as("iso_micro"))
    binRel
      .withColumn("rate_micro", expr("(1000000L * n_dups) div n_docs"))
      .join(fits, Seq("bin"))
      .select(col("bin"), col("n_docs"), col("n_dups"),
        col("rate_micro"), col("iso_micro"))
  }

  def isotonicCalibration(s: SparkSession, dir: String): DataFrame =
    isotonicCalibration(Tables.documents(s, dir))
}
