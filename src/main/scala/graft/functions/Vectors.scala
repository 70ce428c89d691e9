package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from codegen'd
  * built-ins (`zip_with`/`aggregate`/`sequence`) — no UDFs, so the whole
  * similarity pipeline stays inside whole-stage codegen.
  *
  * Determinism: each float element is quantized to int64 fixed-point at
  * scale 1e8 (`floor(x*1e8 + 0.5)` — float→double is exact, the multiply
  * and floor are single correctly-rounded IEEE ops), and dot products /
  * norms are summed in exact int64 arithmetic. Bounds: |x| < 92 keeps a
  * 64-dim sum of products inside int64; our embeddings are unit-scale
  * (|x| ≤ ~0.53). The final int→double, sqrt and divide are correctly
  * rounded, so any engine — Spark or the DuckDB oracle — reproduces the
  * cosine bit-for-bit:
  * `SUM(CAST(floor(a[i]*1e8+0.5) AS BIGINT) * CAST(floor(b[i]*1e8+0.5) AS BIGINT))`.
  */
object Vectors {

  private val oddHex = Seq("1", "3", "5", "7", "9", "b", "d", "f")

  /** int64 fixed-point quantization at scale 1e8 (Spark `floor(double)`
    * already returns LongType).
    */
  def quant(x: Column): Column = floor(x.cast("double") * lit(1e8) + lit(0.5))

  /** Exact fixed-point dot product of two float-array columns (int64). */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => quant(x) * quant(y)),
      lit(0L),
      (acc, v) => acc + v
    )

  /** Exact fixed-point squared L2 norm (int64). */
  def normSqExact(a: Column): Column = dotExact(a, a)

  /** Cosine similarity on the fixed-point grid; the int64→double
    * conversions, sqrt and divide are single correctly-rounded IEEE ops,
    * identical across engines. (The 1e8 scale factors cancel.)
    */
  def cosine(a: Column, b: Column): Column =
    dotExact(a, b).cast("double") /
      (sqrt(normSqExact(a).cast("double")) * sqrt(normSqExact(b).cast("double")))

  /** Deterministic ±1 random-hyperplane component for (plane `p`, 1-based
    * dim `i`), reproducible in any engine: +1 iff the first hex nibble of
    * md5("p:i") is odd.
    * Oracle: `CASE WHEN substr(md5(p||':'||i),1,1) IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END`.
    */
  def hyperplaneSign(p: Int, i: Column): Column =
    when(substring(md5(concat(lit(s"$p:"), i.cast("string"))), 1, 1)
      .isin(oddHex: _*), lit(1L)).otherwise(lit(-1L))

  /** Random-hyperplane LSH bucket signature over `nPlanes` deterministic
    * hyperplanes: bit p = sign of <v, h_p>. Vectors sharing a bucket agree
    * on every plane; bucketing is the scale path for near-dup search
    * (candidates join per-bucket instead of all-pairs). The per-plane
    * projection is an exact int64 fixed-point sum (order-independent).
    */
  def lshBucket(vec: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(1), size(vec)), (x, i) =>
          quant(x) * hyperplaneSign(p, i)),
        lit(0L),
        (acc, v) => acc + v)
      when(proj >= 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }
}
