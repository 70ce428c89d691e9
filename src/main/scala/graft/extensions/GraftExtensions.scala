package graft.extensions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FixedPointDot, FixedPointSqDist, KrWindowFp, MinGramMd5}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as native SQL functions, so `spark.sql` users get
  * the same codegen'd primitives the Column API exposes
  * (graft.functions.FixedPoint).
  *
  * Wire up either way:
  *  - config: `.config("spark.sql.extensions", "graft.extensions.GraftExtensions")`
  *  - code:   `SparkSession.builder.withExtensions(new GraftExtensions)`
  *
  * `injectFunction` is the narrowest extension hook that delivers the
  * feature — no custom parser, Rule, or Strategy is warranted by anything
  * this engine computes (SURVEY.md §4): every plan shape we need is
  * expressible declaratively, and Catalyst plans it well.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.fixedPointDot)
    ext.injectFunction(GraftExtensions.fixedPointSqDist)
    ext.injectFunction(GraftExtensions.minGramMd5)
    ext.injectFunction(GraftExtensions.krWindowFp)
  }
}

object GraftExtensions {

  /** `fixed_point_dot(array<float>, array<float>) -> bigint`:
    * Σ floor(a[i]*1e8+0.5) * floor(b[i]*1e8+0.5), exact and
    * order-independent — the deterministic vector primitive.
    */
  val fixedPointDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("fixed_point_dot"),
    new ExpressionInfo(
      classOf[FixedPointDot].getCanonicalName, null, "fixed_point_dot",
      "_FUNC_(a, b) - exact int64 fixed-point dot product of two float arrays.",
      "", "", "", "", "4.0.0", "", "built-in"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "fixed_point_dot takes exactly 2 arguments")
      FixedPointDot(children.head, children(1))
    })

  /** `fixed_point_sqdist(array<float>, array<float>, scale) -> bigint`:
    * Σ (⌊a[i]·s+½⌋ − ⌊b[i]·s+½⌋)² on a caller-chosen constant grid — the
    * product-quantization distance kernel (Similarity.pqEncode).
    */
  val fixedPointSqDist: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("fixed_point_sqdist"),
    new ExpressionInfo(
      classOf[FixedPointSqDist].getCanonicalName, null, "fixed_point_sqdist",
      "_FUNC_(a, b, scale) - exact int64 squared L2 distance of two float " +
        "arrays on the constant fixed-point grid `scale`.",
      "", "", "", "", "4.0.0", "", "built-in"),
    (children: Seq[Expression]) => {
      def bad(msg: String) = new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg), None)
      if (children.length != 3) throw bad("fixed_point_sqdist takes exactly 3 arguments")
      // the grid must be CONSTANT at analysis time (it is baked into
      // the generated code); accept any foldable numeric expression
      import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType,
        IntegerType, LongType, ShortType}
      val scale = children(2) match {
        case e if e.foldable && (e.dataType match {
              case ByteType | ShortType | IntegerType | LongType |
                   FloatType | DoubleType => true
              case _ => false
            }) =>
          e.eval() match {
            case null => throw bad("fixed_point_sqdist: scale must not be NULL")
            case n: Number if n.doubleValue() > 0 &&
                !n.doubleValue().isInfinite && !n.doubleValue().isNaN =>
              n.doubleValue()
            case n => throw bad(s"fixed_point_sqdist: scale must be positive and finite: $n")
          }
        case other => throw bad(
          s"fixed_point_sqdist: scale must be a constant numeric expression, got ${other.sql}")
      }
      FixedPointSqDist(children.head, children(1), scale)
    })

  /** `min_gram_md5(string, k) -> string`: minimum md5 hex digest over all
    * character k-grams — the single-pass winnowing kernel.
    */
  val minGramMd5: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("min_gram_md5"),
    new ExpressionInfo(
      classOf[MinGramMd5].getCanonicalName, null, "min_gram_md5",
      "_FUNC_(text, k) - minimum md5 hex digest over all character k-grams of text.",
      "", "", "", "", "4.0.0", "", "built-in"),
    (children: Seq[Expression]) => {
      // a bad k is the USER's analysis error, not an engine bug: raise a
      // proper AnalysisException (not a bare IllegalArgumentException) so
      // spark.sql callers get a catchable, positioned analysis failure.
      def bad(msg: String) = new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg), None)
      if (children.length != 2) throw bad("min_gram_md5 takes exactly 2 arguments")
      // k only needs to be CONSTANT at analysis time, not a bare literal:
      // accept any foldable integral expression (8, 2+2, CAST(8 AS BIGINT))
      // by constant-folding it here.
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val k = children(1) match {
        case e if e.foldable && (e.dataType match {
              case ByteType | ShortType | IntegerType | LongType => true
              case _ => false
            }) =>
          e.eval() match {
            case null => throw bad("min_gram_md5: k must not be NULL")
            case n: Number if n.longValue() >= 1 && n.longValue() <= Int.MaxValue =>
              n.intValue()
            case n => throw bad(s"min_gram_md5: k out of range [1, 2^31): $n")
          }
        case other => throw bad(
          s"min_gram_md5: k must be a constant integral expression, got ${other.sql}")
      }
      MinGramMd5(children.head, k)
    })

  /** `kr_window_fp(array<string>, k) -> array<string>`: dual Karp–Rabin
    * rolling fingerprints ("h1:h2", mod 2^61−1) of every k-token window —
    * the O(n) exact-substring anchor kernel.
    */
  val krWindowFp: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kr_window_fp"),
    new ExpressionInfo(
      classOf[KrWindowFp].getCanonicalName, null, "kr_window_fp",
      "_FUNC_(words, k) - dual Karp-Rabin rolling fingerprints of every " +
        "k-token window of a string array.",
      "", "", "", "", "4.0.0", "", "built-in"),
    (children: Seq[Expression]) => {
      def bad(msg: String) = new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg), None)
      if (children.length != 2) throw bad("kr_window_fp takes exactly 2 arguments")
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val k = children(1) match {
        case e if e.foldable && (e.dataType match {
              case ByteType | ShortType | IntegerType | LongType => true
              case _ => false
            }) =>
          e.eval() match {
            case null => throw bad("kr_window_fp: k must not be NULL")
            case n: Number if n.longValue() >= 2 && n.longValue() <= Int.MaxValue =>
              n.intValue()
            case n => throw bad(s"kr_window_fp: k out of range [2, 2^31): $n")
          }
        case other => throw bad(
          s"kr_window_fp: k must be a constant integral expression, got ${other.sql}")
      }
      KrWindowFp(children.head, k)
    })
}
