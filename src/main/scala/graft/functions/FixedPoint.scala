package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Exact int64 fixed-point dot product of two `array<float>` columns —
  * the one place the engine drops to a custom Catalyst `Expression`.
  *
  * Why built-ins aren't enough: the `zip_with`/`aggregate` composition in
  * graft.functions.Vectors is semantically identical but higher-order
  * functions are excluded from whole-stage codegen and evaluate
  * interpreted, with one boxed lambda call and an allocation per element.
  * This expression computes the same quantized sum
  * (`Σ floor(a[i]*1e8+0.5) * floor(b[i]*1e8+0.5)`) in a tight primitive
  * loop INSIDE generated code — no allocation, no virtual calls — which
  * is what a 100 TB scan of embedding vectors needs.
  *
  * Overflow bound: |x| < 92 keeps a 64-dim sum inside int64 (our data is
  * unit-scale). Null ELEMENTS are not expected (embeddings are dense);
  * null arrays propagate null; mismatched array lengths throw — the
  * contract is dense equal-dimension embeddings, and a silent
  * truncated-or-padded dot would be silently wrong. Result is
  * bit-identical to the Vectors composition and to the DuckDB oracle's
  * `SUM(CAST(floor(x*1e8+0.5) AS BIGINT) * ...)`.
  */
case class FixedPointDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"fixed_point_dot needs two array<float> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "fixed_point_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      throw new IllegalArgumentException(
        s"fixed_point_dot: mismatched vector dimensions ($n vs ${y.numElements()}); " +
          "inputs must be dense equal-dimension embeddings")
    }
    var acc = 0L
    var i = 0
    while (i < n) {
      val qx = math.floor(x.getFloat(i).toDouble * 1e8 + 0.5).toLong
      val qy = math.floor(y.getFloat(i).toDouble * 1e8 + 0.5).toLong
      acc += qx * qy
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val qx = ctx.freshName("qx")
      val qy = ctx.freshName("qy")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  throw new IllegalArgumentException(
         |    "fixed_point_dot: mismatched vector dimensions (" + $n + " vs " +
         |    $y.numElements() + "); inputs must be dense equal-dimension embeddings");
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $qx = (long) java.lang.Math.floor((double) $x.getFloat($i) * 1.0E8D + 0.5D);
         |  long $qy = (long) java.lang.Math.floor((double) $y.getFloat($i) * 1.0E8D + 0.5D);
         |  $acc += $qx * $qy;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact int64 squared L2 distance `Σ (⌊a[i]·s+½⌋ − ⌊b[i]·s+½⌋)²` of two
  * `array<float>` columns on a CALLER-CHOSEN fixed-point grid `s` — the
  * product-quantization distance kernel (Similarity.pqEncode/pqAdcTopK).
  *
  * Why a second grid instead of reusing the 1e8 cosine grid: PQ is
  * itself a lossy code, and its ranking scores must survive a lossless
  * cast to double so the map-side-combined BoundedTopK (whose score is a
  * double) stays bit-exact cross-engine. At s=1e4 a 16-dim unit-scale
  * sub-distance is ≤ ~1.4e10 and a 4-subspace ADC sum ≤ ~6e10 — far
  * inside double's 2^53 exact-integer range — while at the cosine path's
  * 1e8 the same sum would reach ~6e18 and silently round. Same codegen
  * shape as FixedPointDot: a tight primitive loop inside whole-stage
  * codegen, bit-identical to the DuckDB oracle's
  * `SUM((CAST(floor(a*s+0.5) AS BIGINT) - CAST(floor(b*s+0.5) AS BIGINT))^2)`.
  */
case class FixedPointSqDist(left: Expression, right: Expression, scale: Double)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"fixed_point_sqdist needs two array<float> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "fixed_point_sqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      throw new IllegalArgumentException(
        s"fixed_point_sqdist: mismatched vector dimensions ($n vs ${y.numElements()}); " +
          "inputs must be dense equal-dimension embeddings")
    }
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = math.floor(x.getFloat(i).toDouble * scale + 0.5).toLong -
        math.floor(y.getFloat(i).toDouble * scale + 0.5).toLong
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  throw new IllegalArgumentException(
         |    "fixed_point_sqdist: mismatched vector dimensions (" + $n + " vs " +
         |    $y.numElements() + "); inputs must be dense equal-dimension embeddings");
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = (long) java.lang.Math.floor((double) $x.getFloat($i) * ${scale}D + 0.5D)
         |    - (long) java.lang.Math.floor((double) $y.getFloat($i) * ${scale}D + 0.5D);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FixedPoint {
  /** Column API for the codegen'd dot product. */
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(FixedPointDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd squared L2 norm on the fixed-point grid. */
  def normSqF(a: Column): Column = dotF(a, a)

  /** Codegen'd squared L2 distance on a caller-chosen grid (PQ kernel). */
  def sqDistF(a: Column, b: Column, scale: Double): Column =
    ColumnBridge.column(FixedPointSqDist(
      ColumnBridge.expression(a), ColumnBridge.expression(b), scale))
}
