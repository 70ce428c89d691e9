package graft

import org.apache.spark.sql.functions._

import graft.model.Schemas
import graft.sources.Sources

/** The production-source seam: broker messages (binary JSON `value`) decode
  * under the DECLARED event schema to exactly the rows the file-based batch
  * read produces — proving the format("kafka") wiring's value→schema hop
  * without a broker (SURVEY.md §2 #7).
  */
class SourcesSpec extends SparkSpec {

  test("kafka value decode reproduces the declared-schema batch read") {
    val batch = Sources.eventBatch(spark, fixture("streamingData/preCornucopia.json"))
    // one JSON object per message, as a broker would carry it
    val messages = batch.select(
      to_json(struct(batch.columns.map(col).toIndexedSeq: _*)).cast("binary").as("value"))
    val decoded = Sources.decodeEventValue(messages)

    assert(decoded.schema === Schemas.eventSchema)
    val expect = batch.collect().map(_.toString).sorted.toSeq
    val got = decoded.collect().map(_.toString).sorted.toSeq
    assert(got === expect)
    assert(got.size === 16)
  }

  test("kinesis record decode reproduces the declared-schema batch read") {
    val batch = Sources.eventBatch(spark, fixture("streamingData/preCornucopia.json"))
    // the spark-sql-kinesis connector's record shape: binary `data`
    // payload plus shard metadata columns
    val records = batch.select(
      to_json(struct(batch.columns.map(col).toIndexedSeq: _*)).cast("binary").as("data"),
      lit("shardId-000000000000").as("shardId"),
      monotonically_increasing_id().cast("string").as("sequenceNumber"),
      current_timestamp().as("approximateArrivalTimestamp"))
    val decoded = Sources.decodeKinesisRecords(records)

    assert(decoded.schema === Schemas.eventSchema)
    val expect = batch.collect().map(_.toString).sorted.toSeq
    val got = decoded.collect().map(_.toString).sorted.toSeq
    assert(got === expect)
    assert(got.size === 16)
  }

  test("Tables.events adapts to both ts parquet layouts (ns-long and timestamp)") {
    import java.nio.file.Files
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    import spark.implicits._

    // the same three instants in both physical layouts the testdata has
    // shipped with across regenerations
    val micros = Seq(1700000000000000L, 1700000000500000L, 1700086400000000L)
    val base = Files.createTempDirectory("events-layouts").toString

    // legacy layout: int64 ns ticks (what nanosAsLong surfaces for
    // TIMESTAMP(NANOS) files)
    val nsDir = s"$base/ns"
    micros.map(_ * 1000L).toDF("ts").withColumn("id", monotonically_increasing_id())
      .write.parquet(s"$nsDir/events.parquet")

    // current layout: TIMESTAMP(MICROS) — written from TimestampNTZ
    val usDir = s"$base/us"
    micros.toDF("us")
      .select(timestamp_micros($"us").cast(TimestampNTZType).as("ts"))
      .withColumn("id", monotonically_increasing_id())
      .write.parquet(s"$usDir/events.parquet")

    val fromNs = graft.sources.Tables.events(spark, nsDir)
    val fromUs = graft.sources.Tables.events(spark, usDir)
    assert(fromNs.schema("ts").dataType === TimestampNTZType)
    assert(fromUs.schema("ts").dataType === TimestampNTZType)
    val a = fromNs.select($"ts".cast("string")).as[String].collect().sorted.toSeq
    val b = fromUs.select($"ts".cast("string")).as[String].collect().sorted.toSeq
    assert(a === b)
    assert(a.size === 3)

    // and the driver's actual testdata (whatever layout it carries today)
    // must load to the same normalized type with live rows
    val real = graft.sources.Tables.events(spark, sf0001)
    assert(real.schema("ts").dataType === TimestampNTZType)
    assert(real.limit(1).count() === 1)
  }

  test("Tables schema memo revalidates on regeneration: a changed physical schema is picked up") {
    import spark.implicits._
    // the Derived staleness lesson applied to the SCHEMA memo: inputs can
    // be regenerated in place mid-JVM (ScaleSmoke's amplified-table
    // writer), and if the regeneration changes the physical layout a
    // JVM-lifetime memo would read the new files under the OLD schema
    val dir = java.nio.file.Files.createTempDirectory("sources-memo").toString
    Seq((1L, "a")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(graft.sources.Tables.documents(spark, dir).schema.fieldNames.toSeq
      === Seq("doc_id", "text"))
    // regenerate in place with an EXTRA column — the dir mtime moves
    // (parquet overwrite deletes/creates children), so the memo must miss
    Seq((1L, "a", 9L)).toDF("doc_id", "text", "extra")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(graft.sources.Tables.documents(spark, dir).schema.fieldNames.toSeq
      === Seq("doc_id", "text", "extra"),
      "a stale memoized schema survived an in-place regeneration")
  }

  test("decode tolerates malformed messages as null-field rows, not crashes") {
    import spark.implicits._
    val junk = Seq("{not json", """{"streamingeventid":"x1","heartrate":"nope"}""")
      .toDF("s").select($"s".cast("binary").as("value"))
    val rows = Sources.decodeEventValue(junk).collect()
    assert(rows.length === 2) // from_json yields null-populated rows
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("heartrate"))))
  }
}
