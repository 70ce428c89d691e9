package graft

import org.apache.spark.sql.functions._
import graft.ops.Status

/** Truth-table + grid-sweep tests for the five classifiers
  * (reference semantics: script/TributeStreamingJob.py:110-135).
  */
class StatusSpec extends SparkSpec {
  import spark.implicits._

  private def hyd(level: Double, min: String): String =
    Seq((level, min)).toDF("level", "min")
      .select(Status.hydrationStatus(col("level"), col("min")))
      .as[String].head()

  private def hun(level: Double, max: String): String =
    Seq((level, max)).toDF("level", "max")
      .select(Status.hungerStatus(col("level"), col("max")))
      .as[String].head()

  test("hydration bands: below / near / ok, boundaries exact") {
    assert(hyd(7.9, "8.0") === "DEHYDRATED")
    assert(hyd(8.4, "8.0") === "APPROACHING DEHYDRATION") // Thresh case, SURVEY §5
    assert(hyd(8.0, "8.0") === "APPROACHING DEHYDRATION") // == min is NOT below
    assert(hyd(8.5, "8.0") === "OK") // diff == 0.5 is NOT < 0.5
    assert(hyd(10.0, "8.0") === "OK")
  }

  test("hunger bands mirror with upper threshold") {
    assert(hun(6.2, "6.0") === "HUNGRY") // Foxface case, afterRue.json
    assert(hun(5.6, "6.0") === "GETTING HUNGRY")
    assert(hun(6.0, "6.0") === "GETTING HUNGRY")
    assert(hun(5.5, "6.0") === "OK")
  }

  test("grid sweep: (level, threshold) space matches the scalar model") {
    val grid = for {
      l <- BigDecimal(0) to BigDecimal(12) by BigDecimal("0.25")
      t <- Seq(BigDecimal(3), BigDecimal(5), BigDecimal("7.5"), BigDecimal(8))
    } yield (l.toDouble, t.toString)
    val df = grid.toDF("level", "min")
      .select(col("level"), col("min"),
        Status.hydrationStatus(col("level"), col("min")).as("s"))
    df.as[(Double, String, String)].collect().foreach { case (l, t, s) =>
      val td = t.toDouble
      val expected =
        if (l < td) "DEHYDRATED"
        else if (l - td < 0.5) "APPROACHING DEHYDRATION"
        else "OK"
      assert(s === expected, s"level=$l threshold=$t")
    }
  }

  test("location: out of bounds / approaching / in bounds") {
    val games = Seq((0L, 100L, 0L, 100L)).toDF(
      "minXCoordinate", "maxXCoordinate", "minYCoordinate", "maxYCoordinate")
    def loc(x: Double, y: Double): String =
      games.select(Status.locationStatus(lit(x), lit(y),
        col("minXCoordinate"), col("maxXCoordinate"),
        col("minYCoordinate"), col("maxYCoordinate"))).as[String].head()
    assert(loc(1.1, 100.8) === "OUT OF BOUNDS") // Katniss edge-of-map case
    assert(loc(2.0, 98.9) === "APPROACHING THE BOUNDARY") // within 5 of two edges
    assert(loc(50.0, 50.0) === "IN BOUNDS")
    assert(loc(-0.1, 50.0) === "OUT OF BOUNDS")
    assert(loc(95.1, 50.0) === "APPROACHING THE BOUNDARY")
    assert(loc(95.0, 50.0) === "IN BOUNDS") // maxX - x == 5 is NOT < 5
  }

  test("coercion parity: string thresholds behave exactly like pre-cast doubles (SURVEY §7.4 risk 2)") {
    // the reference compares decimal stream columns against STRING csv
    // thresholds and relies on implicit string→double coercion; verify
    // the coerced path equals an explicitly-cast path over a dense grid
    val grid = for {
      l <- BigDecimal(0) to BigDecimal(12) by BigDecimal("0.5")
      t <- Seq("3", "3.0", "7.5", "08.0") // includes a leading-zero form
    } yield (l.toDouble, t)
    val df = grid.toDF("level", "min").select(
      Status.hydrationStatus(col("level"), col("min")).as("viaString"),
      Status.hydrationStatus(col("level"), col("min").cast("double")).as("viaDouble"))
    assert(df.filter(col("viaString") =!= col("viaDouble")).count() === 0)
  }

  test("alive/dead and pain") {
    assert(Seq(java.math.BigDecimal.ZERO).toDF("hr")
      .select(Status.aliveStatus(col("hr"))).as[String].head() === "DEAD")
    assert(Seq(new java.math.BigDecimal("70")).toDF("hr")
      .select(Status.aliveStatus(col("hr"))).as[String].head() === "ALIVE")
    assert(Seq((8.0, "5.0")).toDF("p", "t")
      .select(Status.painStatus(col("p"), col("t"))).as[String].head() === "INJURED")
    assert(Seq((5.0, "5.0")).toDF("p", "t")
      .select(Status.painStatus(col("p"), col("t"))).as[String].head() === "OK")
  }
}
