package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
}
