package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Exact._
import graft.sources.Tables

/** Bucketed-table machinery: pay the shuffle ONCE at write time, then run
  * every subsequent join on the bucket key with ZERO exchanges.
  *
  * At 100 TB this is the difference between re-shuffling two fact tables
  * on every pipeline run and never shuffling them again: `bucketBy(n, k)`
  * hash-partitions rows into `n` files per write task by the same
  * murmur-hash Spark's shuffle uses, so a join between two tables
  * bucketed on their join key with equal bucket counts is planned as a
  * sort-merge join whose children are bare scans — no Exchange on either
  * side (PlanShapeSpec asserts exactly this). The per-bucket `sortBy`
  * keeps the merge phase a linear pass per file.
  *
  * Bucket metadata only survives through a catalog table (a bare
  * `.parquet(path)` read forgets the layout), hence `saveAsTable` with an
  * explicit external path.
  */
object Warehouse {

  /** Catalog/table identity is scoped per (application, data dir, tag):
    * the Spark applicationId keys out concurrent JVMs sharing one
    * java.io.tmpdir, the data-dir name keys out SFs, and the optional
    * caller tag keys out concurrent queries inside one session. Without
    * this, two sessions running q70 would clobber each other's catalog
    * entries and table files mid-join.
    */
  private def token(s: SparkSession, dir: String, tag: String): String = {
    val app = s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
    val d = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
    val t = if (tag.isEmpty) "" else "_" + tag.replaceAll("[^A-Za-z0-9]", "_")
    s"${d}_$app$t"
  }

  private def tablePath(token: String, table: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-warehouse/$token/$table"

  /** Bucket count: fixed and SMALL at test scale. At 100 TB you size this
    * so one bucket ≈ one task's worth of data (e.g. 4096 for a 4 TB
    * table at 1 GiB splits) and keep it IDENTICAL across the tables that
    * join — unequal counts fall back to a shuffle.
    */
  private val nBuckets = 8

  /** Write `df` as an external bucketed+sorted catalog table. The
    * repartition IS the one-time shuffle the layout buys back on every
    * later join — and it co-locates each bucket in a single task, so the
    * table lands as ONE file per bucket instead of (tasks × buckets)
    * files (the classic bucketed-write small-file explosion; repartition
    * and bucketBy share Spark's murmur3 hash, so task n holds exactly
    * bucket n's rows).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, path: String): Unit =
    df.repartition(nBuckets, col(key))
      .write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Orders ⋈ customer on custkey, both sides pre-bucketed on the join
    * key: revenue and order count per nation. The `merge` hint pins the
    * sort-merge strategy (at test scale the planner would broadcast the
    * small customer side and never exercise the bucket layout; at real
    * scale two fact tables leave no broadcast option). The only exchange
    * in the whole plan is the tiny post-join per-nation aggregate.
    */
  def bucketedJoinRevenue(s: SparkSession, dir: String, tag: String = ""): DataFrame = {
    val tok = token(s, dir, tag)
    val (ordersT, customerT) = (s"graft_orders_b_$tok", s"graft_customer_b_$tok")
    writeBucketed(Tables.orders(s, dir).select(col("o_custkey"), col("o_totalprice")),
      ordersT, "o_custkey", tablePath(tok, "orders_b"))
    writeBucketed(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
      customerT, "c_custkey", tablePath(tok, "customer_b"))
    s.table(ordersT).hint("merge")
      .join(s.table(customerT), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("revenue"))
  }

  /** Slowly-changing-dimension (type 2) history from an event-style feed:
    * each customer's orders become versioned rows with
    * [valid_from, valid_to) intervals and an `is_current` flag — the
    * standard warehouse shape for "what did this dimension look like at
    * time T" queries (an as-of join against this table is a plain range
    * probe, no window needed at read time).
    *
    * One window partitioned by o_custkey (high-cardinality — millions of
    * partitions of a handful of rows each at 100 TB, no reducer hotspot):
    * `lead(valid_from)` closes each interval with the next version's
    * start. Ties on date break by o_orderkey so versioning is total and
    * deterministic. The window orders by the POST-rename column
    * (`valid_from`) because `lead().over(w)` resolves against the frame
    * the select already produced — ordering by `o_orderdate` here fails
    * analysis with UNRESOLVED_COLUMN.
    */
  def scd2History(orders: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("valid_from"), col("o_orderkey"))
    orders
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("o_orderdate").as("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  def scd2History(s: SparkSession, dir: String): DataFrame =
    scd2History(Tables.orders(s, dir))

  /** Point-in-time ("as of") probe against the SCD2 interval table — the
    * read-side query the history table exists for: which version of each
    * customer dimension was live at time T? With half-open
    * [valid_from, valid_to) intervals this is a plain range filter — no
    * window, no self-join, no state at read time — and at 100 TB it is a
    * pure scan-side predicate the parquet reader prunes on valid_from
    * min/max stats. Exactly one row per customer qualifies for any T
    * (intervals partition each customer's timeline), which the
    * WarehouseSpec invariant test asserts.
    */
  def scd2AsOf(orders: DataFrame, asOf: String): DataFrame = {
    val t = lit(asOf).cast("timestamp")
    scd2History(orders)
      .filter(col("valid_from") <= t &&
        (col("valid_to").isNull || col("valid_to") > t))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("valid_from"), col("valid_to"))
  }

  def scd2AsOf(s: SparkSession, dir: String): DataFrame =
    scd2AsOf(Tables.orders(s, dir), "1996-06-01")

  /** Z-value: bit-interleave the low 21 bits of two non-negative integer
    * dimensions (x₂₀y₂₀…x₀y₀), mapping 2-D locality onto a 1-D sort key.
    * Sorting files by this key gives every file a TIGHT min/max box in
    * BOTH dimensions, so a 2-D box query skips most files via ordinary
    * parquet min/max stats — single-column sorting can only be tight in
    * one dimension. 21 bits per dimension (42-bit key, comfortably inside
    * a long) covers custkey to ~2.1M — beyond sf10's 1.5M customers —
    * and every epoch-day this side of year 7000; 16 bits would silently
    * truncate custkey above 65535 (~sf0.5) and degrade clustering
    * locality. Pure bit arithmetic on built-ins, whole-stage codegen'd.
    */
  def zvalue(x: Column, y: Column): Column =
    (0 until 21).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b + 1)
        .bitwiseOR(shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b))
    }.reduce(_ bitwiseOR _)

  /** Epoch-day of the order date — the integer form of the date dimension
    * that feeds the z-value.
    */
  private def orderDay: Column =
    datediff(col("o_orderdate").cast("date"), to_date(lit("1970-01-01")))

  /** Z-order data layout round trip: write `orders` clustered by the
    * z-value of (order day, customer key), then answer a 2-D box query
    * (a date range AND a customer range) from the laid-out files.
    *
    * Why this is a 100 TB operator: a fact table is always filtered on
    * more than one dimension, but a single sort column only prunes one of
    * them. Z-clustering (`repartitionByRange` + `sortWithinPartitions` on
    * the interleaved key) makes every file a small rectangle in
    * (date × customer) space, so parquet footer min/max stats on BOTH
    * plain columns prune to the few files intersecting the query box —
    * no index, no custom reader, just layout. WarehouseSpec measures it:
    * the fraction of files whose (day, custkey) bounding box intersects a
    * 10%×10% query box is strictly smaller under z-order than under the
    * date-only sort a naive pipeline would use.
    *
    * The query result itself is layout-independent (same rows whatever
    * the file arrangement), which is exactly what the oracle checks.
    */
  def zorderReadback(s: SparkSession, dir: String, tag: String = ""): DataFrame = {
    val path = tablePath(token(s, dir, tag), "orders_z")
    writeZordered(Tables.orders(s, dir), path)
    s.read.parquet(path)
      .filter(
        col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1995-07-01").cast("timestamp") &&
          col("o_custkey").between(100, 250))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"))
  }

  /** Write orders z-clustered on (order day, custkey) into `nFiles` files.
    * The z-value is a transient sort key — it never lands in the files
    * (recomputable, and keeping the schema identical to the source keeps
    * every existing reader working).
    */
  def writeZordered(orders: DataFrame, path: String, nFiles: Int = 16): Unit =
    orders
      .withColumn("zval", zvalue(orderDay, col("o_custkey")))
      .repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
      .drop("zval")
      .write.mode("overwrite").parquet(path)

  /** Same file count, date-only sort — the baseline layout WarehouseSpec
    * compares z-order against.
    */
  def writeDateSorted(orders: DataFrame, path: String, nFiles: Int = 16): Unit =
    orders
      .repartitionByRange(nFiles, col("o_orderdate"))
      .sortWithinPartitions(col("o_orderdate"))
      .write.mode("overwrite").parquet(path)

  /** Per-file (day, custkey) bounding boxes of a laid-out orders
    * directory — the exact information parquet footers expose to the
    * scanner, reconstructed per file so tests can measure how many files
    * a box query would touch under a given layout.
    */
  def fileBoxes(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(
        min(orderDay).as("day_min"), max(orderDay).as("day_max"),
        min(col("o_custkey")).as("ck_min"), max(col("o_custkey")).as("ck_max"))

  /** Small-file compaction — the table-maintenance pass every streaming
    * or frequently-appended table needs: thousands of kilobyte files
    * (one per micro-batch per partition) make scans open-file-bound and
    * crush the namenode/listing layer, so periodically rewrite the
    * directory into files of a target row size. `repartitionByRange` on
    * the sort key keeps the compacted files range-clustered (footer
    * min/max stay tight, so pruning survives compaction), and the target
    * file count derives from the actual row count — a fixed count would
    * under-split at 100× or shatter at 0.01×. The rewrite lands in a new
    * directory: at scale compaction must be atomic-swap (write new, swap
    * pointer, drop old), never in-place.
    */
  def compact(
      s: SparkSession, inPath: String, outPath: String,
      sortKey: String, rowsPerFile: Long = 1000000L): Long = {
    val src = s.read.parquet(inPath)
    val nFiles = math.max(1L, (src.count() + rowsPerFile - 1) / rowsPerFile).toInt
    src.repartitionByRange(nFiles, col(sortKey))
      .sortWithinPartitions(col(sortKey))
      .write.mode("overwrite").parquet(outPath)
    nFiles.toLong
  }

  /** Compaction round trip the oracle can check: fragment orders into
    * one file per day-ish slice (the streaming-append pathology), compact
    * to ~`rowsPerFile` rows per file, then aggregate per month from the
    * compacted table. The answer is layout-independent — exactly what the
    * oracle recomputes from the source — while WarehouseSpec asserts the
    * mechanical claims: file count collapses and per-file row counts hit
    * the target.
    */
  /** Schema evolution on read — the interop capability every long-lived
    * table needs: files written before a column existed coexist with
    * files that carry it, and one `mergeSchema` read unions the layouts,
    * null-filling the column where it predates the schema. Here orders
    * split into a v1 layout (3 columns, "before the priority column
    * shipped") and a v2 layout (4 columns); the merged read aggregates by
    * priority with the pre-schema rows foldered under an explicit
    * sentinel. At 100 TB this is a footer-only concern — mergeSchema
    * reconciles footers at planning time; no data is rewritten (the
    * anti-pattern this replaces is a full-table backfill for every new
    * column).
    */
  def schemaEvolutionReadback(s: SparkSession, dir: String): DataFrame = {
    val root = tablePath(token(s, dir, "evolve"), "orders_evolving")
    val orders = Tables.orders(s, dir)
    val cut = lit("1995-01-01").cast("timestamp")
    orders.filter(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$root/v1")
    orders.filter(col("o_orderdate") >= cut)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$root/v2")
    s.read.option("mergeSchema", "true").parquet(s"$root/v1", s"$root/v2")
      .groupBy(coalesce(col("o_orderpriority"), lit("PRE_SCHEMA")).as("priority"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("revenue"))
  }

  /** Delta-style MERGE (upsert) of a small change batch into a big
    * target, planned the way it must be at 100 TB: the batch broadcasts,
    * the target NEVER shuffles. ONE broadcast LEFT join over the full
    * target classifies keep vs update in a single projection (matched
    * rows take the batch's new values, unmatched pass through), and the
    * inserts are the batch rows anti-joined against the matched-key set,
    * which comes from a KEY-ONLY (column-pruned, and under a real table
    * layout file-pruned to the batch's key range) semi-join scan — so
    * the full-width target is read exactly once. A naive full-outer
    * join would sort-merge-shuffle the entire target to apply a batch a
    * millionth its size; this shape is why warehouse MERGE
    * implementations rewrite only touched files.
    *
    * Measured A/B at sf0.1 (round 12, three isolated Bench runs each,
    * same box window): the previous two-scan shape (left_anti for keeps
    * + inner for updates + a matched-key broadcast that re-executed the
    * inner join's scan a third time) read 0.619/0.733/0.794 s; this
    * one-pass-plus-key-scan shape read 0.591/0.523/0.599 s — ~16%
    * faster at the SF where scans are cheap, and structurally better at
    * 100 TB (one full-width scan + one single-column scan vs three
    * full-width scans), where the extra full-width passes ARE the cost.
    *
    * The change batch is derived deterministically from the target so the
    * oracle can rebuild it: keys ≡0 (mod 7) INSIDE a fixed key window
    * (≤ `BatchKeyCap`) get a 5% price bump (matched → update), keys ≡0
    * (mod 97) in the window arrive re-keyed past the key space (not
    * matched → insert). The cap is what makes the forced broadcast
    * honest: without it the batch is a constant FRACTION of the target
    * (1/7th — an SF-scaled relation that would blow the 8 GB broadcast
    * ceiling long before 100 TB); with it the batch is a constant ≤1,532
    * rows at every scale, the true small-batch CDC shape.
    */
  /** Fixed key window bounding the synthetic change batch: ≤ ~1,429
    * mod-7 updates + ~104 mod-97 inserts regardless of SF. */
  val BatchKeyCap = 10000L

  def mergeUpsert(orders: DataFrame): DataFrame = {
    val target = orders.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val window = target.filter(col("o_orderkey") <= lit(BatchKeyCap))
    val updates = window.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"),
        col("o_custkey").as("u_custkey"),
        (col("o_totalprice") * lit(1.05)).as("u_price"))
    val inserts = window.filter(col("o_orderkey") % 97 === 0)
      .select((col("o_orderkey") + lit(6000000L)).as("o_orderkey"),
        col("o_custkey").as("u_custkey"),
        lit(100.0).as("u_price"))
    val batch = updates.unionByName(inserts)
    // one full-width pass: keep/update classified in a single projection
    val merged = target.join(broadcast(batch), Seq("o_orderkey"), "left")
      .select(col("o_orderkey"), col("o_custkey"),
        coalesce(col("u_price"), col("o_totalprice")).as("o_totalprice"),
        when(col("u_price").isNotNull, lit("update"))
          .otherwise(lit("keep")).as("action"))
    // matched keys from a key-only scan (one pruned column, ≤|batch|
    // output rows — broadcastable by construction)
    val matchedKeys = target.select(col("o_orderkey"))
      .join(broadcast(batch.select(col("o_orderkey"))),
        Seq("o_orderkey"), "left_semi")
    val inserted = batch.join(broadcast(matchedKeys), Seq("o_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("u_custkey").as("o_custkey"),
        col("u_price").as("o_totalprice"), lit("insert").as("action"))
    merged.unionByName(inserted)
  }

  def mergeUpsert(s: SparkSession, dir: String): DataFrame =
    mergeUpsert(Tables.orders(s, dir))

  /** Change-data-capture diff of two table snapshots: which keys were
    * inserted, deleted, or had a value change between A and B. Unlike
    * MERGE (small batch vs big target), BOTH sides here are full
    * snapshots, so the full-outer join on the key IS the honest plan —
    * one co-partitioned shuffle per side. At 100 TB you pay that shuffle
    * once, or never: snapshots written with `writeBucketed` on the key
    * diff with ZERO exchanges (the q70 machinery), which is exactly how
    * nightly snapshot reconciliation should be laid out. Unchanged rows
    * are dropped before anything downstream sees them.
    *
    * Snapshot B is derived deterministically from A: keys ≡0 (mod 13)
    * deleted, keys ≡0 (mod 5) repriced (+10), keys ≡0 (mod 101) re-keyed
    * past the key space as inserts.
    */
  def snapshotDiff(orders: DataFrame): DataFrame = {
    val a = orders.select(col("o_orderkey"), col("o_totalprice"))
    val b = a.filter(col("o_orderkey") % 13 =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + lit(10.0))
          .otherwise(col("o_totalprice")).as("o_totalprice"))
      .unionByName(a.filter(col("o_orderkey") % 101 === 0)
        .select((col("o_orderkey") + lit(7000000L)).as("o_orderkey"),
          col("o_totalprice")))
    a.select(col("o_orderkey"), col("o_totalprice").as("old_price"))
      .join(b.select(col("o_orderkey"), col("o_totalprice").as("new_price")),
        Seq("o_orderkey"), "full_outer")
      .withColumn("change",
        when(col("old_price").isNull, lit("insert"))
          .when(col("new_price").isNull, lit("delete"))
          .when(col("old_price") =!= col("new_price"), lit("update")))
      .filter(col("change").isNotNull)
  }

  def snapshotDiff(s: SparkSession, dir: String): DataFrame =
    snapshotDiff(Tables.orders(s, dir))

  /** Incremental materialized-view maintenance: a monthly rollup kept
    * additive, so a late-arriving batch updates it WITHOUT rescanning
    * history. The partials (count + exact decimal revenue sum) are
    * mergeable — merge = plain SUM over partials, associative by
    * construction — so applying a delta costs one aggregate over the
    * DELTA plus a tiny merge, while the naive path re-aggregates the
    * whole fact table on every late batch. At 100 TB this is the
    * difference between touching gigabytes and touching everything;
    * the exactness discipline (decimal partials, double only in the
    * final projection) is what makes merged-incremental equal full
    * recompute bit-for-bit — the oracle recomputes from scratch and the
    * hashes must agree.
    */
  def incrementalRollup(orders: DataFrame): DataFrame = {
    // exact unscaled-cents partials (round-19: the Exact.unscaled fast
    // path replaces the per-row string-based HALF_UP cast; the decimal
    // tier sums stay exact and merge-order independent, and the single
    // /100 before the double cast reproduces the former
    // cast(sum(decimal(18,2)) AS double) rounding bit for bit)
    def partial(df: DataFrame): DataFrame =
      df.groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(unscaled(col("o_totalprice")).cast(DecimalType(38, 0)))
            .as("rev_partial"))
    val cut = lit("1997-01-01").cast("timestamp")
    val base = partial(orders.filter(col("o_orderdate") < cut))
    val delta = partial(orders.filter(col("o_orderdate") >= cut))
    base.unionByName(delta)
      .groupBy(col("month"))
      .agg(
        sum(col("n_orders")).as("n_orders"),
        sum(col("rev_partial")).as("rev_merged"))
      .select(col("month"), col("n_orders"),
        (col("rev_merged") / lit(100L)).cast("double").as("revenue"))
  }

  def incrementalRollup(s: SparkSession, dir: String): DataFrame =
    incrementalRollup(Tables.orders(s, dir))

  def compactionReadback(s: SparkSession, dir: String): DataFrame = {
    val tok = token(s, dir, "compact")
    val (fragPath, outPath) = (tablePath(tok, "orders_frag"), tablePath(tok, "orders_compact"))
    Tables.orders(s, dir)
      .repartition(64, col("o_orderkey"))
      .write.mode("overwrite").parquet(fragPath)
    compact(s, fragPath, outPath, "o_orderdate", rowsPerFile = 5000L)
    s.read.parquet(outPath)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("revenue"))
  }

  /** Semi-additive month-end balance: a balance-like measure (here each
    * customer's latest order total) must NOT be summed over time — the
    * correct monthly total takes each customer's LAST observation per
    * month and carries it forward through inactive months. Pipeline:
    * per-(customer, month) last pick in exact cents, a month scaffold
    * per customer from first activity to the global max month (the
    * global bound is one broadcast scalar — the sequence explode is
    * bounded by |customers| × |calendar months|, never by |orders|),
    * then a per-customer carry-forward window and one tiny month-keyed
    * aggregate. Every heavy step shuffles on o_custkey exactly once.
    */
  def monthEndBalance(orders: DataFrame): DataFrame = {
    val byCustMonth = Window.partitionBy(col("o_custkey"), col("month"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val balances = orders
      .select(col("o_custkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        col("o_orderdate"), col("o_orderkey"),
        unscaled(col("o_totalprice")).as("cents"))
      .withColumn("rn", row_number().over(byCustMonth))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("month"), col("cents"))
    val mmax = balances.agg(max(col("month")).as("mmax"))
    val scaffold = balances.groupBy(col("o_custkey")).agg(min(col("month")).as("m0"))
      .crossJoin(broadcast(mmax))
      .select(col("o_custkey"),
        explode(sequence(col("m0"), col("mmax"), expr("interval 1 month"))).as("month"))
    val carry = Window.partitionBy(col("o_custkey")).orderBy(col("month"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scaffold.join(balances, Seq("o_custkey", "month"), "left")
      .withColumn("bal_c", last(col("cents"), ignoreNulls = true).over(carry))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_custs"),
        sum(col("bal_c")).as("tot_c"))
      .select(col("month"), col("n_custs"),
        (col("tot_c").cast("double") / 100.0).as("balance"))
  }

  def monthEndBalance(s: SparkSession, dir: String): DataFrame =
    monthEndBalance(Tables.orders(s, dir))

  /** Open-order aging report — the AR-aging staple: snapshot at the
    * corpus horizon (the max ship date, one broadcast scalar — never
    * wall-clock `now()`), an order counts as still open iff its last
    * line ships on the horizon day itself (nothing ships later by
    * construction), and each open order ages into 0–30 / 31–60 / 61+
    * buckets by days from order date to horizon (year-scaled bounds —
    * the synthetic ship lags run to years; the bounds are parameters),
    * with the exact-cents value tied up per bucket. One lineitem aggregate, one broadcast
    * scalar, one tiny grouped output.
    */
  def openOrderAging(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val lastShip = lineitem.groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate").cast("date")).as("close_d"))
    val horizon = lastShip.agg(max(col("close_d")).as("h"))
    orders
      .join(lastShip, col("o_orderkey") === col("l_orderkey"))
      .crossJoin(broadcast(horizon))
      .filter(col("close_d") >= col("h"))
      .withColumn("age_days",
        datediff(col("h"), col("o_orderdate").cast("date")).cast("long"))
      .withColumn("age_bucket",
        when(col("age_days") <= 365, "0-1y")
          .when(col("age_days") <= 1095, "1-3y")
          .otherwise("3y+"))
      .groupBy(col("age_bucket"))
      .agg(count(lit(1)).as("n_orders"),
        sum(unscaled(col("o_totalprice")))
          .as("value_c"))
  }

  def openOrderAging(s: SparkSession, dir: String): DataFrame =
    openOrderAging(Tables.orders(s, dir), Tables.lineitem(s, dir))

  /** Monthly return rate: returned (l_returnflag = 'R') quantity and
    * revenue share per ship month — the merchandising health metric.
    * Numerators and denominators are exact integer cents/centi-units
    * from ONE map-side-combined aggregate; each share is one double
    * division per month row.
    */
  def returnRates(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(date_trunc("month", col("l_shipdate")).cast("date").as("month"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(unscaled(col("l_quantity"))).as("qty_c"),
        sum(when(col("l_returnflag") === "R",
          unscaled(col("l_quantity")))
          .otherwise(0L)).as("ret_qty_c"),
        sum(unscaled(col("l_extendedprice"))).as("rev_c"),
        sum(when(col("l_returnflag") === "R",
          unscaled(col("l_extendedprice")))
          .otherwise(0L)).as("ret_rev_c"))
      .select(col("month"), col("n_items"),
        (col("ret_qty_c").cast("double") / col("qty_c").cast("double")).as("qty_return_rate"),
        (col("ret_rev_c").cast("double") / col("rev_c").cast("double")).as("rev_return_rate"))

  def returnRates(s: SparkSession, dir: String): DataFrame =
    returnRates(Tables.lineitem(s, dir))

  /** Supply-concentration risk: for each part, how many distinct
    * suppliers ever shipped it; parts bucketed into concentrated /
    * moderate / diversified sourcing with their revenue exposure — the
    * supply-chain concentration screen. Thresholds are parameters (the
    * synthetic catalog is many-sourced, min 13 suppliers per part; a
    * real catalog would screen at 1/2). One (part, supplier) distinct, one part
    * aggregate, one tiny bucket rollup; revenue joins on the same
    * partkey shuffle.
    */
  def supplyRisk(lineitem: DataFrame): DataFrame = {
    val perPart = lineitem
      .groupBy(col("l_partkey"))
      .agg(count_distinct(col("l_suppkey")).as("n_suppliers"),
        sum(unscaled(col("l_extendedprice")))
          .as("rev_c"))
    perPart
      .withColumn("sourcing",
        when(col("n_suppliers") <= 20, "concentrated")
          .when(col("n_suppliers") <= 30, "moderate")
          .otherwise("diversified"))
      .groupBy(col("sourcing"))
      .agg(count(lit(1)).as("n_parts"), sum(col("rev_c")).as("rev_c"))
  }

  def supplyRisk(s: SparkSession, dir: String): DataFrame =
    supplyRisk(Tables.lineitem(s, dir))

  /** Partial-shipment profile: per priority class, how many orders ship
    * complete in one day vs stagger across a span — per order the line
    * count and first→last ship span in integer days, then a tiny
    * bucketed rollup (single-line / same-day / staggered) with the mean
    * span from exact integer sums. One orderkey aggregate, one
    * broadcast-scale grouped output.
    */
  def shipmentStagger(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val spans = lineitem.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"),
        (datediff(max(col("l_shipdate").cast("date")),
          min(col("l_shipdate").cast("date")))).cast("long").as("span_days"))
    orders.select(col("o_orderkey"), col("o_orderpriority").as("priority"))
      .join(spans, col("o_orderkey") === col("l_orderkey"))
      .withColumn("profile",
        when(col("n_lines") === 1, "single_line")
          .when(col("span_days") === 0, "same_day")
          .otherwise("staggered"))
      .groupBy(col("priority"), col("profile"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(col("span_days")).cast("double") / count(lit(1))).as("mean_span_days"))
  }

  def shipmentStagger(s: SparkSession, dir: String): DataFrame =
    shipmentStagger(Tables.orders(s, dir), Tables.lineitem(s, dir))

  /** SLA compliance by priority: share of line items shipped within the
    * priority class's day target (tighter targets for higher classes —
    * a broadcast literal table, the way contract SLAs arrive). Lag is
    * integer days; compliance is exact counts with one division per
    * priority row.
    */
  def slaCompliance(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val target = when(col("priority") === "1-URGENT", 60L)
      .when(col("priority") === "2-HIGH", 90L)
      .when(col("priority") === "3-MEDIUM", 120L)
      .otherwise(180L)
    lineitem.select(col("l_orderkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority").as("priority")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("lag_days",
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
          .cast("long"))
      .withColumn("target_days", target)
      .groupBy(col("priority"))
      .agg(max(col("target_days")).as("target_days"),
        count(lit(1)).as("n_items"),
        count(when(col("lag_days") <= col("target_days"), 1)).as("n_on_time"))
      .withColumn("compliance",
        col("n_on_time").cast("double") / col("n_items").cast("double"))
  }

  def slaCompliance(s: SparkSession, dir: String): DataFrame =
    slaCompliance(Tables.lineitem(s, dir), Tables.orders(s, dir))

  /** Dormant parts: parts with no shipment in the final year before the
    * corpus horizon, with the revenue they historically carried — the
    * discontinue/clearance candidate list. The horizon is a broadcast
    * scalar; dormancy is one per-part max compare, never an anti-join
    * against a date-filtered copy of the fact table.
    */
  def dormantParts(lineitem: DataFrame): DataFrame = {
    val perPart = lineitem.groupBy(col("l_partkey"))
      .agg(max(col("l_shipdate").cast("date")).as("last_ship"),
        count(lit(1)).as("n_lifetime"),
        sum(unscaled(col("l_extendedprice")))
          .as("rev_c"))
    val horizon = perPart.agg(max(col("last_ship")).as("h"))
    perPart.crossJoin(broadcast(horizon))
      .filter(datediff(col("h"), col("last_ship")) > 365)
      .select(col("l_partkey"), col("last_ship"), col("n_lifetime"), col("rev_c"))
  }

  def dormantParts(s: SparkSession, dir: String): DataFrame =
    dormantParts(Tables.lineitem(s, dir))

  /** Basket-size distribution: how many orders carry 1, 2, … line
    * items, with the exact mean basket value per size — the
    * order-economics histogram. Two map-side-combined aggregates,
    * output bounded by the max basket size.
    */
  def basketSizes(orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_lines"))
      .join(orders.select(col("o_orderkey"),
        unscaled(col("o_totalprice")).as("cents")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_lines"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(col("cents")).cast("double") / count(lit(1)) / 100.0)
          .as("mean_value"))

  def basketSizes(s: SparkSession, dir: String): DataFrame =
    basketSizes(Tables.orders(s, dir), Tables.lineitem(s, dir))

  /** Supplier scorecard: per supplier, shipment volume, exact revenue,
    * mean ship lag, and on-time share against the q163 priority targets
    * — the procurement review table. One orderkey join, one supplier
    * aggregate; every ratio is a single division of exact integers.
    */
  def supplierScorecard(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val target = when(col("priority") === "1-URGENT", 60L)
      .when(col("priority") === "2-HIGH", 90L)
      .when(col("priority") === "3-MEDIUM", 120L)
      .otherwise(180L)
    lineitem.select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
      unscaled(col("l_extendedprice")).as("rev_c"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority").as("priority")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("lag_days",
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
          .cast("long"))
      .withColumn("on_time", when(col("lag_days") <= target, 1L).otherwise(0L))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_items"), sum(col("rev_c")).as("rev_c"),
        (sum(col("lag_days")).cast("double") / count(lit(1))).as("mean_lag_days"),
        (sum(col("on_time")).cast("double") / count(lit(1))).as("on_time_share"))
  }

  def supplierScorecard(s: SparkSession, dir: String): DataFrame =
    supplierScorecard(Tables.lineitem(s, dir), Tables.orders(s, dir))

  /** Discount-depth effectiveness: return-rate profile per discount
    * band — does discounting deepen returns? Bands cut on exact cents
    * of discount percentage (l_discount is a 0–0.10 fraction; band
    * boundaries in integer basis points), counts exact, one division
    * per band.
    */
  def discountEffect(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_returnflag"),
        unscaled(col("l_discount"), 4).as("bp"))
      .withColumn("band",
        when(col("bp") === 0, "none")
          .when(col("bp") <= 500, "1-5%")
          .otherwise("6%+"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_items"),
        count(when(col("l_returnflag") === "R", 1)).as("n_returned"))
      .withColumn("return_rate",
        col("n_returned").cast("double") / col("n_items").cast("double"))

  def discountEffect(s: SparkSession, dir: String): DataFrame =
    discountEffect(Tables.lineitem(s, dir))

  /** Month-of-year seasonality index: each calendar month's share of
    * total revenue scaled by 12 — 1.0 means no seasonality, 1.3 a 30%
    * hot month. Exact cents share, two divisions per row of a 12-row
    * output.
    */
  def seasonalityIndex(orders: DataFrame): DataFrame = {
    val monthly = orders
      .groupBy(month(col("o_orderdate")).cast("long").as("month_of_year"))
      .agg(count(lit(1)).as("n_orders"),
        sum(unscaled(col("o_totalprice")))
          .as("rev_c"))
    monthly
      .withColumn("grand", sum(col("rev_c")).over(Window.partitionBy()))
      .select(col("month_of_year"), col("n_orders"), col("rev_c"),
        (col("rev_c").cast("double") / col("grand").cast("double") * 12.0)
          .as("seasonality_index"))
  }

  def seasonalityIndex(s: SparkSession, dir: String): DataFrame =
    seasonalityIndex(Tables.orders(s, dir))

  /** Fulfillment speed vs basket size: does a bigger order ship slower?
    * Mean and max ship lag per basket-size bucket — exact integer
    * moments, one division per bucket row.
    */
  def lagByBasketSize(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val per = lineitem
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"),
        max(col("l_shipdate").cast("date")).as("last_ship"))
    orders.select(col("o_orderkey"), col("o_orderdate"))
      .join(per, col("o_orderkey") === col("l_orderkey"))
      .withColumn("lag_days",
        datediff(col("last_ship"), col("o_orderdate").cast("date")).cast("long"))
      .withColumn("size_bucket",
        when(col("n_lines") <= 2, "1-2")
          .when(col("n_lines") <= 4, "3-4")
          .otherwise("5+"))
      .groupBy(col("size_bucket"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(col("lag_days")).cast("double") / count(lit(1))).as("mean_lag_days"),
        max(col("lag_days")).as("max_lag_days"))
  }

  def lagByBasketSize(s: SparkSession, dir: String): DataFrame =
    lagByBasketSize(Tables.orders(s, dir), Tables.lineitem(s, dir))

  /** Weekend order mix per month: the share of orders placed on ISO
    * weekend days — the demand-rhythm check (same ISO numbering pin as
    * q139; the engines' default dayofweek disagree). Exact counts, one
    * division per month.
    */
  def weekendMix(orders: DataFrame): DataFrame =
    orders
      .select(date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        (weekday(col("o_orderdate").cast("date")) + 1).cast("long").as("isodow"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_orders"),
        count(when(col("isodow") >= 6, 1)).as("n_weekend"))
      .withColumn("weekend_share",
        col("n_weekend").cast("double") / col("n_orders").cast("double"))

  def weekendMix(s: SparkSession, dir: String): DataFrame =
    weekendMix(Tables.orders(s, dir))

  /** Credit-risk exposure: customers and suppliers holding NEGATIVE
    * account balances per nation — count and total exposure in exact
    * cents, both roles in one unioned output. Two tiny aggregates over
    * balance-filtered dimension scans; the filter pushes to parquet.
    */
  def negativeBalances(customer: DataFrame, supplier: DataFrame,
      nation: DataFrame): DataFrame = {
    def side(df: DataFrame, key: String, bal: String, role: String) =
      df.filter(col(bal) < 0)
        .groupBy(col(key).as("nationkey"))
        .agg(count(lit(1)).as("n_accounts"),
          sum(unscaled(col(bal))).as("exposure_c"))
        .withColumn("role", lit(role))
    side(customer, "c_nationkey", "c_acctbal", "customer")
      .unionByName(side(supplier, "s_nationkey", "s_acctbal", "supplier"))
      .join(broadcast(nation), col("nationkey") === col("n_nationkey"))
      .select(col("role"), col("n_name"), col("n_accounts"), col("exposure_c"))
  }

  def negativeBalances(s: SparkSession, dir: String): DataFrame =
    negativeBalances(Tables.customer(s, dir), Tables.supplier(s, dir), Tables.nation(s, dir))

  /** Incremental materialized-view maintenance: a per-month revenue
    * rollup kept current by COMBINING a frozen base aggregate (orders
    * before `cutoff`) with a delta aggregate (orders at/after it) —
    * the refresh path a warehouse runs nightly instead of recomputing
    * the view over the full fact history. Sum/count are self-mergeable,
    * so merge = full-outer join on the group key + coalesced addition;
    * the oracle recomputes from scratch, proving delta maintenance is
    * exactly lossless. At 100 TB the base side is a tiny materialized
    * table and only the delta partition is scanned — the full-history
    * scan this replaces is the thing that stops fitting a refresh
    * window. Exact cents throughout.
    */
  def incrementalMv(orders: DataFrame, cutoff: String): DataFrame = {
    def rollup(df: DataFrame, n: String, r: String) =
      df.groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as(n),
          sum(unscaled(col("o_totalprice"))).as(r))
    val base = rollup(orders.filter(col("o_orderdate") < lit(cutoff).cast("timestamp")), "n_base", "rev_base")
    val delta = rollup(orders.filter(col("o_orderdate") >= lit(cutoff).cast("timestamp")), "n_delta", "rev_delta")
    base.join(delta, Seq("month"), "full_outer")
      .select(col("month"),
        (coalesce(col("n_base"), lit(0L)) + coalesce(col("n_delta"), lit(0L))).as("n_orders"),
        (coalesce(col("rev_base"), lit(0L)) + coalesce(col("rev_delta"), lit(0L))).as("revenue_c"))
  }

  def incrementalMv(s: SparkSession, dir: String): DataFrame =
    incrementalMv(Tables.orders(s, dir), "1997-06-01")

  /** Dynamic-partition-pruning revenue probe (q253): orders laid out as a
    * month-partitioned catalog table, queried through the canonical
    * star-schema shape — a calendar dim (month → quarter) filtered on a
    * dim ATTRIBUTE (`quarter = 'Q1'`) and joined on the fact's partition
    * column. The fact query never mentions months, so static pruning is
    * impossible; Catalyst's DPP rule turns the dim's broadcast into a
    * runtime partition filter on the fact scan, and the fact side READS
    * only the qualifying month directories (3 of every 12). At 100 TB
    * this is the difference between scanning the whole fact table and a
    * quarter of it. The PlanShapeSpec pin asserts the `dynamicpruning`
    * expression sits in the fact scan's partition filters.
    *
    * DPP fine print encoded here: the rule only fires for dim predicates
    * it judges LIKELY SELECTIVE — comparisons against literals (this
    * equality) qualify; an earlier draft filtered on `rev_c · n >
    * total_c` (attribute-vs-attribute) and was correctly skipped. Counts
    * and cents are exact integers, so the result hash-matches the
    * oracle regardless of which partitions were physically read.
    *
    * The partitioned fact table is materialized ONCE per (session, sf,
    * tag) — the `token` carries the applicationId, so a fresh JVM always
    * rebuilds, but repeated calls inside one session (Bench's three
    * reps, repeated test queries) reuse the layout. That is also what
    * the operator models: a warehouse fact table is laid out once and
    * queried many times, so the probe's cost — the thing DPP buys — is
    * what repeated executions pay, not the ingest write.
    */
  def dppPrunedRevenue(s: SparkSession, dir: String, tag: String = ""): DataFrame =
    dppPrunedRevenueOf(s, Tables.orders(s, dir), token(s, dir, tag))

  /** [[dppPrunedRevenue]] over an explicit orders relation — the seam
    * ScaleSmoke uses to probe DPP against an amplified fact table. `tok`
    * keys the one-time materialization (distinct relation → distinct
    * token, or the guard would reuse the wrong layout).
    */
  def dppPrunedRevenueOf(s: SparkSession, orders: DataFrame, rawTok: String): DataFrame = {
    // identifier-safe: a dot in the token would parse as schema.table
    val tok = rawTok.replaceAll("[^A-Za-z0-9]", "_")
    val table = s"graft_orders_p_$tok"
    if (!s.catalog.tableExists(table)) {
      orders
        .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
        .write.mode("overwrite").format("parquet")
        .option("path", tablePath(tok, "orders_p"))
        .partitionBy("month")
        .saveAsTable(table)
    }
    val calendar = orders
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .distinct()
      .withColumn("quarter", concat(lit("Q"), expr(
        "cast((cast(substring(month, 6, 2) as int) + 2) / 3 as int)")))
    val dim = calendar.filter(col("quarter") === "Q1").select(col("month"))
    s.table(table).join(broadcast(dim), "month")
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(unscaled(col("o_totalprice"))).as("rev_c"))
  }

  def dppPrunedRevenue(s: SparkSession, dir: String): DataFrame =
    dppPrunedRevenue(s, dir, "")

  /** Right-to-be-forgotten erase with partition-pruned rewrite (q276):
    * the compliance operation every warehouse eventually runs — given a
    * forget request (here the registered deterministic sample: the five
    * smallest custkeys whose md5 bucket is < 10), physically remove every
    * one of those customers' rows and prove it, rewriting ONLY the
    * partitions that can contain them. The design lesson is the LAYOUT:
    * the fact table is partitioned by `cust_bucket = md5-bucket(custkey)`
    * — erasure-friendly partitioning — so a handful of forget requests
    * maps to a handful of partition directories, and the rewrite's
    * source scan is pruned by DYNAMIC partition pruning from the tiny
    * victim dim (the q253 DPP machinery powering a DELETE; plan-pinned).
    * A date-partitioned table would spread each customer across every
    * partition and force a full rewrite.
    *
    * Mechanics: the source table is materialised once per (sf, tag) (the
    * q253 write-once discipline — layout is paid at ingest, not per
    * query); the target starts as a full copy (also once); every
    * execution then re-runs the erase — a dynamic-partition-overwrite of
    * the affected buckets with `source ⟕anti victims` — and AUDITS it by
    * re-reading the target: per bucket, rows before, rows after, rows
    * erased, whether it was rewritten, and the RESIDUAL victim rows
    * still present (must be 0 — the oracle recomputes all five columns
    * from the raw relation, so a lost row, a leaked victim, or a
    * clobbered untouched partition all hash-mismatch). Idempotent:
    * re-erasing writes the same cleaned content, so Bench reps price the
    * steady-state erase, not a one-way mutation.
    *
    * Scale: victims are a bounded broadcast (a forget request is a
    * handful of ids); the rewrite touches ≤|victims| of the 100 bucket
    * directories; the audit is two partition-pruned-friendly aggregates
    * and one broadcast semi probe.
    */
  def gdprErase(s: SparkSession, dir: String, tag: String = ""): DataFrame =
    gdprEraseOf(s, Tables.orders(s, dir), token(s, dir, tag))

  def gdprEraseOf(s: SparkSession, orders: DataFrame, rawTok: String): DataFrame = {
    val tok = rawTok.replaceAll("[^A-Za-z0-9]", "_")
    val src = s"graft_orders_gdpr_src_$tok"
    val tgt = s"graft_orders_gdpr_tgt_$tok"
    if (!s.catalog.tableExists(src)) {
      orders
        .withColumn("cust_bucket", Corpus.hashBucket(col("o_custkey")))
        .write.mode("overwrite").format("parquet")
        .option("path", tablePath(tok, "orders_gdpr_src"))
        .partitionBy("cust_bucket")
        .saveAsTable(src)
    }
    if (!s.catalog.tableExists(tgt)) {
      s.table(src)
        .write.mode("overwrite").format("parquet")
        .option("path", tablePath(tok, "orders_gdpr_tgt"))
        .partitionBy("cust_bucket")
        .saveAsTable(tgt)
    }
    val victims = orders.select(col("o_custkey")).distinct()
      .filter(Corpus.hashBucket(col("o_custkey")) < 10)
      .orderBy(col("o_custkey")).limit(5)
      .withColumn("cust_bucket", Corpus.hashBucket(col("o_custkey")))
    // the erase: affected buckets only (DPP from the victim dim prunes
    // the source scan), victims removed, untouched buckets NOT written
    val affected = victims.select(col("cust_bucket")).distinct()
    // Replace affected partitions by DROP + physical delete + APPEND.
    // Three write modes were tried and REJECTED by the audit gate:
    // static overwrite (the default) truncates the whole table and
    // leaves only affected buckets; dynamic overwrite has the subtler
    // ERASE-TO-EMPTY hole — it only replaces partitions PRESENT in the
    // written data, so a bucket whose every row belongs to the forgotten
    // customer writes nothing and the old rows silently SURVIVE (caught
    // by WarehouseSpec at sf0.001, where one victim owned an entire
    // bucket); and DROP PARTITION alone removes only CATALOG metadata on
    // an external table — the parquet files stay on disk and the
    // follow-up append re-registers the partition WITH the old files
    // (and a compliance erase that leaves the bytes on disk has not
    // erased anything). Hence: drop the catalog entry, DELETE the
    // partition directory, then append the cleaned rows. The collect is
    // the bounded forget-request itself (≤ |victims| rows).
    //
    // Recovery contract (non-atomic by design): drop+delete+append is not
    // transactional — a crash between the delete and the append leaves the
    // affected buckets' NON-victim rows missing from the target. That state
    // is (a) detectable — the audit's rows_before/rows_after gap exceeds
    // the victim count — and (b) recoverable by RE-RUNNING the erase, since
    // the source table is never mutated and the operation is idempotent.
    // Erring on the side of missing non-victim rows is the correct failure
    // direction for a compliance erase (the alternative — victim bytes
    // surviving — is the unrecoverable one). A failed DELETE, by contrast,
    // must fail FAST: an existing partition directory that cannot be
    // removed means the victim's bytes are still on disk, and continuing
    // to the append would re-register them as live data.
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    affected.collect().map(_.getLong(0)).foreach { b =>
      s.sql(s"ALTER TABLE $tgt DROP IF EXISTS PARTITION (cust_bucket=$b)")
      val dir = new org.apache.hadoop.fs.Path(
        s"${tablePath(tok, "orders_gdpr_tgt")}/cust_bucket=$b")
      // delete()=false with the path still present = deletion FAILURE
      // (false on a missing path is fine: an erased-to-empty bucket has no
      // directory on a re-run). Fail before the append re-registers stale
      // victim files.
      if (!fs.delete(dir, true) && fs.exists(dir))
        throw new java.io.IOException(
          s"gdprErase: failed to delete partition directory $dir — " +
            "victim bytes still on disk; aborting before append")
    }
    s.table(src)
      .join(broadcast(affected), Seq("cust_bucket"), "left_semi")
      .join(broadcast(victims.select(col("o_custkey"))),
        Seq("o_custkey"), "left_anti")
      .select(s.table(src).columns.map(col): _*)
      .write.mode("append")
      .insertInto(tgt)
    // the audit — every column recomputable by the oracle from raw rows
    val before = s.table(src).groupBy(col("cust_bucket"))
      .agg(count(lit(1)).as("rows_before"))
    val after = s.table(tgt).groupBy(col("cust_bucket"))
      .agg(count(lit(1)).as("rows_after"))
    val residual = s.table(tgt)
      .join(broadcast(victims.select(col("o_custkey"))), Seq("o_custkey"),
        "left_semi")
      .groupBy(col("cust_bucket")).agg(count(lit(1)).as("residual"))
    before.join(after, Seq("cust_bucket"), "left")
      .join(residual, Seq("cust_bucket"), "left")
      .join(broadcast(affected.withColumn("rewritten", lit(true))),
        Seq("cust_bucket"), "left")
      .select(col("cust_bucket"),
        col("rows_before"),
        coalesce(col("rows_after"), lit(0L)).as("rows_after"),
        (col("rows_before") - coalesce(col("rows_after"), lit(0L)))
          .as("erased"),
        coalesce(col("rewritten"), lit(false)).as("rewritten"),
        coalesce(col("residual"), lit(0L)).as("residual_victims"))
  }

  /** Retention / TTL sweep (q293): the time-keyed leg of the governance
    * family (GDPR erase q276 is key-keyed; forget propagation is its
    * streaming twin). A month-partitioned fact table is swept against a
    * fixed retention cutoff: every expired month partition is dropped
    * from the catalog AND physically deleted — the q276 lesson applies
    * verbatim, a metadata-only DROP PARTITION on an external table
    * leaves the bytes on disk and a retention policy that leaves bytes
    * has not retained anything. No rewrite is needed (expiry is
    * partition-aligned by LAYOUT — that is the point of partitioning a
    * fact table by its retention key), so the sweep is pure
    * drop+delete, idempotent, and the audit proves BOTH directions:
    * expired months read zero rows after, retained months read exactly
    * their source count (a clobbered live partition hash-mismatches the
    * oracle as loudly as a surviving expired one).
    *
    * Scale: affected partitions are a bounded collect (months, not
    * rows); the audit is one aggregate per side, both partition-pruned
    * friendly; nothing row-scaled moves at all.
    */
  def retentionSweep(s: SparkSession, dir: String, tag: String = ""): DataFrame =
    retentionSweepOf(s, Tables.orders(s, dir), token(s, dir, tag))

  def retentionSweepOf(s: SparkSession, orders: DataFrame, rawTok: String,
      cutoffMonth: String = "1996-01"): DataFrame = {
    val tok = rawTok.replaceAll("[^A-Za-z0-9]", "_")
    val src = s"graft_orders_ttl_src_$tok"
    val tgt = s"graft_orders_ttl_tgt_$tok"
    def monthed(df: DataFrame) = df
      .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
    // Content marker: the snapshot tables are reused across calls keyed
    // only by the token, so without it a sweep against a REGENERATED
    // input under the same dir/tag silently read the stale snapshot
    // (round-15 advice). The input's scan-file fingerprint is recorded
    // beside the src table; a mismatch drops and rebuilds both tables.
    // In-memory inputs have no fingerprint and keep name-keyed reuse.
    val fp = graft.Derived.fingerprint(s, Seq(orders)).getOrElse("")
    val marker = new org.apache.hadoop.fs.Path(
      tablePath(tok, "orders_ttl_src") + ".fp")
    val mfs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
    def markerFp: Option[String] =
      if (!mfs.exists(marker)) None
      else {
        val in = mfs.open(marker)
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](4096)
          var n = in.read(tmp)
          while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
          Some(new String(buf.toByteArray, "UTF-8"))
        } finally in.close()
      }
    if (s.catalog.tableExists(src) && !markerFp.contains(fp)) {
      s.sql(s"DROP TABLE IF EXISTS $src")
      s.sql(s"DROP TABLE IF EXISTS $tgt")
      mfs.delete(new org.apache.hadoop.fs.Path(
        tablePath(tok, "orders_ttl_src")), true)
      mfs.delete(new org.apache.hadoop.fs.Path(
        tablePath(tok, "orders_ttl_tgt")), true)
    }
    if (!s.catalog.tableExists(src)) {
      monthed(orders)
        .write.mode("overwrite").format("parquet")
        .option("path", tablePath(tok, "orders_ttl_src"))
        .partitionBy("month")
        .saveAsTable(src)
      val out = mfs.create(marker, true)
      try out.write(fp.getBytes("UTF-8")) finally out.close()
    }
    if (!s.catalog.tableExists(tgt)) {
      s.table(src)
        .write.mode("overwrite").format("parquet")
        .option("path", tablePath(tok, "orders_ttl_tgt"))
        .partitionBy("month")
        .saveAsTable(tgt)
    }
    val expired = s.table(tgt).select(col("month")).distinct()
      .filter(col("month") < cutoffMonth)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sparkContext.hadoopConfiguration)
    expired.collect().map(_.getString(0)).foreach { m =>
      s.sql(s"ALTER TABLE $tgt DROP IF EXISTS PARTITION (month='$m')")
      val pdir = new org.apache.hadoop.fs.Path(
        s"${tablePath(tok, "orders_ttl_tgt")}/month=$m")
      fs.delete(pdir, true)
      // fail FAST if the bytes are still there — a retention sweep that
      // cannot delete has not expired anything (the q276 contract)
      if (fs.exists(pdir)) throw new IllegalStateException(
        s"retentionSweep: could not delete expired partition $pdir")
    }
    s.catalog.refreshTable(tgt)
    val before = s.table(src).groupBy(col("month"))
      .agg(count(lit(1)).as("rows_src"))
    val after = s.table(tgt).groupBy(col("month"))
      .agg(count(lit(1)).as("rows_after"))
    before.join(after, Seq("month"), "left")
      .select(col("month"), col("rows_src"),
        coalesce(col("rows_after"), lit(0L)).as("rows_after"),
        (col("month") < cutoffMonth).as("expired"))
  }
}
