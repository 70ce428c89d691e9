package graft

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.functions._

import graft.operators.Warehouse

/** Warehouse identity scoping: bucketed-table names and locations are
  * keyed by (application, data dir, caller tag), so two queries — or two
  * sessions — running the bucketed join concurrently can never clobber
  * each other's catalog entries or table files.
  */
class WarehouseSpec extends SparkSpec {

  test("two concurrently tagged bucketed joins land in distinct tables and both answer correctly") {
    val expected = graft.sources.Tables.orders(spark, sf0001)
      .join(graft.sources.Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        graft.functions.Exact.dsum(col("o_totalprice")).as("revenue"))
      .collect().map(r => (r.get(0), r.get(1), r.get(2))).toSet

    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      def run(tag: String) = Future {
        Warehouse.bucketedJoinRevenue(spark, sf0001, tag)
          .collect().map(r => (r.get(0), r.get(1), r.get(2))).toSet
      }
      val (a, b) = (run("qa"), run("qb"))
      assert(Await.result(a, 5.minutes) === expected)
      assert(Await.result(b, 5.minutes) === expected)
    } finally pool.shutdown()

    // the two runs must NOT have shared a catalog identity
    val names = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_orders_b")).toSeq
    assert(names.exists(_.endsWith("_qa")) && names.exists(_.endsWith("_qb")),
      s"expected per-tag bucketed tables, got $names")
  }
}
