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

object FixedPoint {
  /** Column API for the codegen'd dot product. */
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(FixedPointDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Codegen'd squared L2 norm on the fixed-point grid. */
  def normSqF(a: Column): Column = dotF(a, a)
}
