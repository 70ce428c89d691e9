package graft

import org.apache.spark.sql.functions._

import graft.operators.Advanced

/** Unit coverage for the advanced operator family on hand-computable
  * testdata slices (the DuckDB gate covers full-table parity; these pin
  * the SEMANTICS with human-verified cases).
  */
class AdvancedSpec extends SparkSpec {

  test("as-of join: carried order is the latest at-or-before each event, ties to max key") {
    import spark.implicits._
    // hand-checkable reconstruction on sf0.001: for one event, recompute
    // the expected answer with a naive filter
    val out = Advanced.asofLastOrder(spark, sf0001).cache()
    val events = graft.sources.Tables.events(spark, sf0001)
      .select($"event_id", $"user_id", $"ts")
    val orders = graft.sources.Tables.orders(spark, sf0001)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate")

    val sample = out.filter($"last_order_key".isNotNull).limit(5).collect()
    assert(sample.nonEmpty, "expected some events with a prior order")
    sample.foreach { r =>
      val eventId = r.getAs[Long]("event_id")
      val userId = r.getAs[Long]("user_id")
      val ts = events.filter($"event_id" === eventId).collect().head.getAs[java.time.LocalDateTime]("ts")
      val naive = orders
        .filter($"o_custkey" === userId &&
          $"o_orderdate".cast("timestamp_ntz") <= lit(java.sql.Timestamp.valueOf(ts)).cast("timestamp_ntz"))
        .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
        .limit(1).collect().head
      assert(r.getAs[Long]("last_order_key") === naive.getAs[Long]("o_orderkey"),
        s"event $eventId: asof disagrees with naive argmax")
    }
    // events with NO prior order carry nulls, never a fabricated match
    val naiveNoPrior = events.as("e").join(orders.as("o"),
        $"e.user_id" === $"o.o_custkey" &&
          $"o.o_orderdate".cast("timestamp_ntz") <= $"e.ts", "left_anti")
      .count()
    assert(out.filter($"last_order_key".isNull).count() === naiveNoPrior)
  }

  test("salted aggregation equals the unsalted aggregate exactly") {
    import spark.implicits._
    val salted = Advanced.saltedSkewAgg(spark, sf0001)
      .as[(String, Long, Double)].collect().toSet
    val plain = graft.sources.Tables.events(spark, sf0001)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
      .as[(String, Long, Double)].collect().toSet
    assert(salted === plain)
  }

  test("range join assigns every event to exactly one band") {
    import spark.implicits._
    val out = Advanced.rangeJoinBands(spark, sf0001).cache()
    val nEvents = graft.sources.Tables.events(spark, sf0001).count()
    assert(out.count() === nEvents) // bands partition the domain
    assert(out.groupBy($"event_id").count().filter($"count" > 1).count() === 0)
    out.collect().foreach { r =>
      val v = r.getAs[Double]("value")
      val expected = if (v < 50) "LOW" else if (v < 150) "MID" else "HIGH"
      assert(r.getAs[String]("band") === expected)
    }
  }

  test("rollup emits leaf, subtotal, and grand-total levels consistently") {
    import spark.implicits._
    val out = Advanced.rollupRevenue(spark, sf0001).cache()
    val grand = out.filter($"n_name".isNull && $"o_orderstatus".isNull).collect()
    assert(grand.length === 1)
    val leafSum = out.filter($"n_name".isNotNull && $"o_orderstatus".isNotNull)
      .agg(sum($"n")).collect().head.getLong(0)
    assert(grand.head.getAs[Long]("n") === leafSum)
    // per-nation subtotal equals the sum of its leaves
    val subtotals = out.filter($"n_name".isNotNull && $"o_orderstatus".isNull)
      .select($"n_name", $"n").as[(String, Long)].collect().toMap
    val leaves = out.filter($"n_name".isNotNull && $"o_orderstatus".isNotNull)
      .groupBy($"n_name").agg(sum($"n").as("n"))
      .as[(String, Long)].collect().toMap
    assert(subtotals === leaves)
  }
}
