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
  *
  * Round-19 fast path (guide §1.2 "per-task work"): Spark's
  * double→decimal cast routes every row through
  * `Double.toString` + `BigDecimal` parse + HALF_UP `setScale` — the
  * shortest-decimal-representation semantics the cross-engine contract
  * requires, but ~10× the cost of the surrounding codegen'd arithmetic
  * (profiled at 0.75 s vs 0.20 s per sf0.1 lineitem aggregate in round
  * 18). [[unscaled]] computes the identical integer with pure primitive
  * ops for the overwhelmingly common case and falls back to the real
  * cast otherwise, so every aggregate here becomes a primitive-long
  * pipeline feeding a decimal(38,0) sum (long-backed compact adds, no
  * per-row strings) — the "two-tier exact sum" shape: exact at every
  * magnitude, overflow envelope 1e38 unscaled units (WIDER than the old
  * decimal(28,2)'s 1e26).
  */
object Exact {

  /** Unscaled units (e.g. cents for scale 2) of `cast(c AS decimal(18,s))`
    * as a long — `(CAST(x AS DECIMAL(18,s)) * 10^s)::BIGINT` — with a
    * codegen-friendly fast path that avoids the per-row string-based
    * HALF_UP cast.
    *
    * Fast path: `y = rint(c * 10^s)`; taken only when `y / 10^s == c`
    * exactly AND `|y| < 1e13`. Proof of equivalence with the decimal
    * cast on that path: `y/10^s == c` means c is EXACTLY the nearest
    * double to the s-dp decimal y/10^s, so y/10^s lies inside c's
    * half-ulp rounding interval. With `|y| < 1e13` (and s ≤ 6),
    * ulp(c) ≤ 2^-52·|c| < 10^-s, so the interval is far narrower than
    * the s-dp grid: y/10^s is the ONLY ≤s-dp decimal in it. The
    * shortest decimal representation D of c (what the JVM cast parses)
    * is a minimal-digit decimal inside the same interval, hence within
    * ulp of y/10^s and nowhere near a .5·10^-s midpoint, so HALF_UP
    * rounding of D to s places lands exactly on y/10^s — the cast
    * result IS y unscaled, with no rounding decision taken. `|y| < 1e13`
    * also keeps the value far inside decimal(18,s)'s non-null range.
    * NaN/±Inf/overflow fail the `abs(y) < 1e13` guard (Spark orders NaN
    * above every double) and nulls fall through `when` — all land on
    * the slow path, which is the verbatim former expression.
    */
  def unscaled(c: Column, scale: Int = 2): Column = {
    require(scale >= 0 && scale <= 6, s"scale must be in [0, 6], got $scale")
    val f = lit(math.pow(10, scale)) // exact double for scale <= 6
    val y = rint(c * f)
    when((y / f === c) && abs(y) < lit(1e13), y.cast("long"))
      .otherwise((c.cast(DecimalType(18, scale)) *
        lit(math.pow(10, scale).toLong)).cast("long"))
  }

  /** `Σ unscaled` as a decimal(38,0) — long-backed compact adds in the
    * aggregation buffer, no per-row strings; exact to 1e38 units. */
  private def usum(u: Column): Column = sum(u.cast(DecimalType(38, 0)))

  /** Rescale an unscaled decimal(38,0) total back to value units and
    * cast to double. The division by 10^s is exact: Spark types
    * `decimal(38,0) / int` as decimal(38,6) (scale ≥ 6 ≥ s), and the
    * quotient has at most s fractional digits, so no rounding occurs —
    * the final cast to double is the same single correctly-rounded
    * conversion the old `cast(sum(decimal(18,s)) AS double)` performed.
    */
  private def rescaled(total: Column, scale: Int): Column =
    (total / lit(math.pow(10, scale).toLong)).cast("double")

  /** Exact sum of a double column with fixed input scale, as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    rescaled(usum(unscaled(c, scale)), scale)

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
    *
    * Fast path: both factors' unscaled longs are < 1e13 in magnitude
    * (each individually guarded by [[unscaled]]), so their product is
    * < 1e26 — too wide for a long, so the row product is computed as
    * decimal(38,0) FROM the longs (one compact decimal multiply, still
    * no strings). Row values the guards reject take the verbatim former
    * decimal-product expression, rescaled to unscaled units.
    */
  def dsumProduct(x: Column, y: Column, sx: Int = 2, sy: Int = 2): Column = {
    val ux = unscaled(x, sx)
    val uy = unscaled(y, sy)
    val prod = (ux.cast(DecimalType(19, 0)) * uy.cast(DecimalType(19, 0)))
      .cast(DecimalType(38, 0))
    rescaled(sum(prod), sx + sy)
  }
}
