package graft

import org.apache.spark.sql.SparkSession

import graft.extensions.GraftExtensions

/** The SparkSessionExtensions hook: custom expressions usable from SQL
  * text, codegen'd, matching the Column API bit-for-bit.
  */
class ExtensionsSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("fixed_point_dot is callable from SQL and matches the Column API") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // when another suite already started a session, getOrCreate returns it
    // and builder extensions are ignored — register the same triple into
    // the live registry so the assertion holds either way
    val (ident, info, builder) = GraftExtensions.fixedPointDot
    if (!spark.catalog.functionExists(ident.funcName)) {
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    try {
      import spark.implicits._
      val df = Seq(
        (Seq(1.0f, 2.0f, 3.0f), Seq(0.5f, -1.0f, 2.0f))
      ).toDF("a", "b")
      df.createOrReplaceTempView("vecs")

      val sql = spark.sql(
        "SELECT fixed_point_dot(a, b) AS dot FROM vecs").collect().head.getLong(0)
      val api = df.select(
        graft.functions.FixedPoint.dotF($"a", $"b").as("dot"))
        .collect().head.getLong(0)
      assert(sql === api)
      // 1*0.5 + 2*(-1) + 3*2 = 4.5 on the 1e8 grid
      assert(sql === (4.5e16).toLong)
    } finally spark.stop()
  }
}
