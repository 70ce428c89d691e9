package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent floating-point aggregation.
  *
  * A plain `sum(double)` depends on partition/merge order, so two engines
  * (or two runs at different parallelism) disagree in the last ulps — fatal
  * for hash-compared results and non-reproducible at 1000-executor scale.
  * Routing through DECIMAL makes the aggregation exact and associative;
  * the final cast back to double is a single correctly-rounded conversion
  * both Spark and DuckDB perform identically.
  *
  * Oracle-side equivalent: `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`.
  */
object Exact {

  /** Exact sum of a double column with fixed input scale, as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact mean: exact decimal sum divided by count, both as double —
    * one deterministic double division instead of an order-dependent one.
    * Oracle: `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x)`.
    */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(c)

  /** Exact sum of a product: each factor is cast to decimal BEFORE the
    * multiply, so the product and the sum are computed entirely in exact
    * decimal arithmetic (a double product rounds differently per engine;
    * decimal×decimal is exact everywhere). Oracle:
    * `CAST(SUM(CAST(x AS DECIMAL(18,sx)) * CAST(y AS DECIMAL(18,sy))) AS DOUBLE)`.
    */
  def dsumProduct(x: Column, y: Column, sx: Int = 2, sy: Int = 2): Column =
    sum(x.cast(DecimalType(18, sx)) * y.cast(DecimalType(18, sy))).cast("double")
}
