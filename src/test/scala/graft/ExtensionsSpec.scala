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
    Seq(GraftExtensions.fixedPointDot, GraftExtensions.fixedPointSqDist,
        GraftExtensions.minGramMd5, GraftExtensions.krWindowFp).foreach {
      case (ident, info, builder) =>
        if (!spark.catalog.functionExists(ident.funcName)) {
          spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
        }
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

      // sqdist on the 1e4 PQ grid: (1-0.5)=0.5→5000², (2-(-1))=3→30000²,
      // (3-2)=1→10000² — all exact on the integer grid
      val sqSql = spark.sql(
        "SELECT fixed_point_sqdist(a, b, 1e4) AS d FROM vecs").collect().head.getLong(0)
      val sqApi = df.select(
        graft.functions.FixedPoint.sqDistF($"a", $"b", 1e4).as("d"))
        .collect().head.getLong(0)
      assert(sqSql === sqApi)
      assert(sqSql === 5000L * 5000 + 30000L * 30000 + 10000L * 10000)
      // a non-constant scale is the caller's analysis error
      val badScale = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT fixed_point_sqdist(a, b, size(a)) FROM vecs").collect()
      }
      assert(badScale.getMessage.contains("constant numeric"))

      val texts = Seq("the quick brown fox", "héllo wörld").toDF("text")
      texts.createOrReplaceTempView("texts")
      val sqlFp = spark.sql(
        "SELECT min_gram_md5(text, 8) AS fp FROM texts ORDER BY fp")
        .collect().map(_.getString(0)).toSeq
      val apiFp = texts.select(
        graft.functions.Winnow.minGramMd5($"text", 8).as("fp"))
        .orderBy($"fp").collect().map(_.getString(0)).toSeq
      assert(sqlFp === apiFp)

      // k is any CONSTANT integral expression, not just a bare int literal:
      // a foldable arithmetic expression and a BIGINT cast both resolve
      val folded = spark.sql(
        "SELECT min_gram_md5(text, 2 + 6) AS fp FROM texts ORDER BY fp")
        .collect().map(_.getString(0)).toSeq
      assert(folded === apiFp)
      val bigint = spark.sql(
        "SELECT min_gram_md5(text, CAST(8 AS BIGINT)) AS fp FROM texts ORDER BY fp")
        .collect().map(_.getString(0)).toSeq
      assert(bigint === apiFp)

      // a NON-constant or out-of-range k is the caller's analysis error —
      // a proper AnalysisException, not a bare IllegalArgumentException
      val nonConst = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT min_gram_md5(text, length(text)) FROM texts").collect()
      }
      assert(nonConst.getMessage.contains("constant integral"))
      val zero = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT min_gram_md5(text, 0) FROM texts").collect()
      }
      assert(zero.getMessage.contains("out of range"))

      // kr_window_fp: SQL surface equals the Column API kernel
      val words = Seq(Seq("a", "b", "c", "d", "e")).toDF("w")
      words.createOrReplaceTempView("words")
      val krSql = spark.sql("SELECT kr_window_fp(w, 3) AS fps FROM words")
        .collect().head.getAs[scala.collection.Seq[String]]("fps").toSeq
      val krApi = words.select(
        graft.functions.KrWindowFp.krWindowFp($"w", 3).as("fps"))
        .collect().head.getAs[scala.collection.Seq[String]]("fps").toSeq
      assert(krSql === krApi && krSql.size === 3)
      val krBad = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql("SELECT kr_window_fp(w, 1) FROM words").collect()
      }
      assert(krBad.getMessage.contains("out of range"))
    } finally spark.stop()
  }
}
