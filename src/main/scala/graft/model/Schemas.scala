package graft.model

import org.apache.spark.sql.types._

/** Schemas for the tribute-telemetry domain.
  *
  * Derived from the reference's declared Glue-catalog stream schema
  * (reference: cloudformation/template.yml:58-76) and its two static
  * dimensions (reference: staticData/s3/tributeData.csv:1,
  * staticData/dynamo/gameData.json:1-7).
  *
  * The catalog declares bare `decimal` (Hive default = DECIMAL(10,0)) but the
  * fixture events carry 2-dp fractions (e.g. 49.04), which Glue's JSON path
  * tolerates; a strict (10,0) parse would truncate. We therefore parse the
  * measures at DecimalType(10,2) — see SURVEY.md §7.4 risk 1.
  */
object Schemas {

  /** Streaming telemetry event (reference: cloudformation/template.yml:58-76). */
  val eventSchema: StructType = StructType(Seq(
    StructField("streamingeventid", StringType),
    StructField("gameid", StringType),
    StructField("tributeid", StringType),
    StructField("heartrate", DecimalType(10, 2)),
    StructField("painlevel", DecimalType(10, 2)),
    StructField("hydrationlevel", DecimalType(10, 2)),
    StructField("hungerlevel", DecimalType(10, 2)),
    StructField("xcoordinate", DecimalType(10, 2)),
    StructField("ycoordinate", DecimalType(10, 2)),
  ))

  /** Tribute dimension as loaded: header-only CSV, every column StringType
    * (reference: script/TributeStreamingJob.py:85-86 — no inferSchema).
    * The numeric-looking threshold columns stay strings; comparisons rely on
    * Spark's implicit numeric coercion exactly like the reference does.
    */
  val tributeSchema: StructType = StructType(Seq(
    StructField("tributeId", StringType),
    StructField("district", StringType),
    StructField("firstName", StringType),
    StructField("age", StringType),
    StructField("gender", StringType),
    StructField("minHydrationThreshold", StringType),
    StructField("maxHungerThreshold", StringType),
    StructField("maxPainThreshold", StringType),
  ))

  /** Game boundary-box dimension (reference: staticData/dynamo/gameData.json).
    * Integer literals infer as LongType under spark.read.json, mirroring the
    * numeric types the Glue DynamoDB connector surfaces.
    */
  val gameSchema: StructType = StructType(Seq(
    StructField("gameid", StringType),
    StructField("maxXCoordinate", LongType),
    StructField("maxYCoordinate", LongType),
    StructField("minXCoordinate", LongType),
    StructField("minYCoordinate", LongType),
  ))

  /** Sink-side projection: the 12-field keyed state item
    * (reference: script/TributeStreamingJob.py:52-65).
    */
  val stateItemSchema: StructType = StructType(Seq(
    StructField("tributeId", StringType),
    StructField("name", StringType),
    StructField("district", StringType),
    StructField("age", StringType),
    StructField("status", StringType),
    StructField("heartRate", StringType),
    StructField("painStatus", StringType),
    StructField("hydrationStatus", StringType),
    StructField("hungerStatus", StringType),
    StructField("xCoordinate", StringType),
    StructField("yCoordinate", StringType),
    StructField("locationStatus", StringType),
  ))
}

/** Typed views for tests; the engine itself is DataFrame-native because the
  * reference never uses typed records (SURVEY.md §1.2).
  */
final case class TributeEvent(
    streamingeventid: String,
    gameid: String,
    tributeid: String,
    heartrate: java.math.BigDecimal,
    painlevel: java.math.BigDecimal,
    hydrationlevel: java.math.BigDecimal,
    hungerlevel: java.math.BigDecimal,
    xcoordinate: java.math.BigDecimal,
    ycoordinate: java.math.BigDecimal,
)

final case class Tribute(
    tributeId: String,
    district: String,
    firstName: String,
    age: String,
    gender: String,
    minHydrationThreshold: String,
    maxHungerThreshold: String,
    maxPainThreshold: String,
)

final case class Game(
    gameid: String,
    maxXCoordinate: Long,
    maxYCoordinate: Long,
    minXCoordinate: Long,
    minYCoordinate: Long,
)
