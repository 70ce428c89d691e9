package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One upper-triangle entry of the corpus Gram/covariance moments. */
final case class GramEntry(i: Int, j: Int, n: Long, sxy: Long, sx: Long, sy: Long)

/** Accumulator: row count, per-dim sums, upper-triangle product sums. */
final case class GramState(n: Long, sx: Array[Long], sxy: Array[Long])

/** Exact fixed-point Gram-matrix moments as a typed `Aggregator` — the
  * one-pass engine behind `Similarity.embeddingCovariance` (q229).
  *
  * Why not the built-in composition: the declarative form explodes each
  * row into its dims·(dims+1)/2 upper-triangle product structs
  * (`transform`/`flatten`/`explode`) before aggregating — higher-order
  * functions are excluded from whole-stage codegen, so a 64-dim corpus
  * pays ~2080 interpreted struct allocations per row. This aggregate
  * quantizes each vector once into a local long array and accumulates the
  * triangle in a tight primitive loop; the shuffle carries ONE buffer per
  * map task (16 KB of int64 sums) instead of 2080 rows per task. Integer
  * sums are order-independent, so the result is bit-identical to the
  * explode formulation and to the DuckDB oracle.
  *
  * Dimension mismatches throw (the FixedPointDot contract): a silently
  * truncated row would corrupt every moment it touched.
  */
final class GramMoments(dims: Int, scale: Double)
  extends Aggregator[Array[Float], GramState, Seq[GramEntry]] {
  require(dims > 0, s"dims must be positive, got $dims")
  private val nPairs = dims * (dims + 1) / 2

  override def zero: GramState =
    GramState(0L, Array.ofDim[Long](dims), Array.ofDim[Long](nPairs))

  override def reduce(b: GramState, v: Array[Float]): GramState = {
    if (v.length != dims) {
      throw new IllegalArgumentException(
        s"gram_moments: vector dimension ${v.length} != $dims; " +
          "inputs must be dense equal-dimension embeddings")
    }
    val q = Array.ofDim[Long](dims)
    var i = 0
    while (i < dims) {
      q(i) = math.floor(v(i).toDouble * scale + 0.5).toLong
      i += 1
    }
    var k = 0
    i = 0
    while (i < dims) {
      b.sx(i) += q(i)
      var j = i
      while (j < dims) {
        b.sxy(k) += q(i) * q(j)
        k += 1
        j += 1
      }
      i += 1
    }
    GramState(b.n + 1, b.sx, b.sxy)
  }

  override def merge(a: GramState, c: GramState): GramState = {
    var i = 0
    while (i < dims) { a.sx(i) += c.sx(i); i += 1 }
    i = 0
    while (i < nPairs) { a.sxy(i) += c.sxy(i); i += 1 }
    GramState(a.n + c.n, a.sx, a.sxy)
  }

  override def finish(b: GramState): Seq[GramEntry] = {
    val out = Vector.newBuilder[GramEntry]
    var k = 0
    var i = 0
    while (i < dims) {
      var j = i
      while (j < dims) {
        out += GramEntry(i, j, b.n, b.sxy(k), b.sx(i), b.sx(j))
        k += 1
        j += 1
      }
      i += 1
    }
    out.result()
  }

  override def bufferEncoder: Encoder[GramState] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[GramEntry]] = ExpressionEncoder()
}
