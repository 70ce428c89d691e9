package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Status
import graft.pipeline.{KVRegistry, TributePipeline}
import graft.sources.Sources

/** DataSource V2 KV sink (SURVEY.md §7.3's optional DynamoDB-shaped
  * writer): `format("graft-kv")` batch and streaming writes upsert
  * key→item into a KVRegistry store from executor tasks.
  */
class KVSinkSpec extends SparkSpec {

  private val batchOrder = Seq(
    "preCornucopia", "postCornucopia", "aFewDaysAfterCornucopia",
    "katnissEdgeOfMap", "katnissInjured", "afterSponsorHelpsKatniss",
    "afterRue", "almostTheEnd", "theEnd")

  private def stateItems: DataFrame = {
    val events = batchOrder
      .map(b => Sources.eventBatch(spark, fixture(s"streamingData/$b.json")))
      .reduce(_ unionAll _)
    val enriched = Status.enrich(events,
      Sources.tributeDim(spark, fixture("staticData/tributeData.csv")),
      Sources.gameDim(spark, fixture("staticData/gameData.json")))
    TributePipeline.latestStatePerTribute(enriched)
  }

  test("batch V2 write upserts the golden state by key") {
    val storeName = s"v2-batch-${System.nanoTime()}"
    stateItems.write.format("graft-kv")
      .option("store", storeName)
      .mode("append").save()

    val state = KVRegistry.getOrCreate(storeName).snapshot()
    assert(state.size === 16)
    assert(state("3")("status") === "DEAD")
    assert(state("8")("status") === "ALIVE")
    assert(state("9")("status") === "ALIVE")
    assert(state("9")("name") === "Katniss")
    // re-running the same write is an idempotent upsert, not a duplicate
    stateItems.write.format("graft-kv").option("store", storeName)
      .mode("append").save()
    assert(KVRegistry.getOrCreate(storeName).snapshot() === state)
  }

  test("non-string column types store their EXTERNAL rendering, not Catalyst internals") {
    import spark.implicits._
    val storeName = s"v2-types-${System.nanoTime()}"
    val df = Seq(("k1", java.sql.Timestamp.valueOf("2026-01-01 00:00:00"),
        java.sql.Date.valueOf("2026-01-02"), BigDecimal("12.50"), 7L))
      .toDF("tributeId", "seen_at", "day", "score", "n")
      .withColumn("score", col("score").cast("decimal(9,2)"))
    df.write.format("graft-kv").option("store", storeName).mode("append").save()
    val item = KVRegistry.getOrCreate(storeName).snapshot()("k1")
    // a timestamp must NOT surface as its internal micros long, nor the
    // date as a day count — the store must agree with the Row-based
    // foreachBatch path's rendering of the same data
    assert(item("seen_at") === "2026-01-01 00:00:00.0")
    assert(item("day") === "2026-01-02")
    assert(item("score") === "12.50")
    assert(item("n") === "7")
  }

  test("missing store option or key column fail loudly") {
    val e1 = intercept[Exception] {
      stateItems.write.format("graft-kv").mode("append").save()
    }
    assert(e1.getMessage.contains("store"))
    val e2 = intercept[Exception] {
      stateItems.drop("tributeId").write.format("graft-kv")
        .option("store", "x").mode("append").save()
    }
    assert(e2.getMessage.contains("tributeId"))
  }

  test("file: store — the V2 write is durable: a fresh client over the same root reads the converged state") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft-kv-durable").toString + "/store"
    val storeName = s"file:$root"
    stateItems.write.format("graft-kv").option("store", storeName)
      .mode("append").save()
    // the registry client converged
    val state = KVRegistry.getOrCreate(storeName).snapshot()
    assert(state.size === 16)
    assert(state("8")("status") === "ALIVE" && state("9")("status") === "ALIVE")
    // REAL BYTES: one file per key on disk, atomic-renamed (no temps left)
    val files = Files.list(Paths.get(root)).iterator()
    val names = Iterator.continually(files).takeWhile(_.hasNext).map(_.next().getFileName.toString).toSeq
    assert(names.count(_.startsWith("k_")) === 16, s"one file per key: $names")
    assert(!names.exists(_.endsWith(".tmp")), s"no staging temps may leak: $names")
    // a FRESH client over the same root — another process, in effect —
    // reads the identical state (the durability InMemoryKVStore can't offer)
    val fresh = new graft.pipeline.FileKVStore(root)
    assert(fresh.snapshot() === state)
    assert(fresh.get("9").map(_("name")) === Some("Katniss"))
    // physical delete: the key's FILE is gone, not just a map entry
    fresh.delete("3")
    assert(!Files.exists(Paths.get(root, "k_3")), "delete must unlink the key file")
    assert(KVRegistry.getOrCreate(storeName).get("3").isEmpty,
      "every client over the root must observe the physical delete")
    // null-valued fields and odd characters round-trip through the encoding
    fresh.put("weird/key\tname", Map("a b" -> null, "x" -> "line\nbreak\tand=%"))
    assert(new graft.pipeline.FileKVStore(root).get("weird/key\tname")
      === Some(Map("a b" -> null, "x" -> "line\nbreak\tand=%")))
  }

  test("streaming V2 write converges per micro-batch") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Files.createTempDirectory("graft-kv-stream")
    val streamDir = Files.createDirectory(base.resolve("stream"))
    val ckpt = base.resolve("ckpt").toString
    val storeName = s"v2-stream-${System.nanoTime()}"

    batchOrder.zipWithIndex.foreach { case (n, i) =>
      val dst = streamDir.resolve(s"$n.json")
      Files.copy(Paths.get(fixture(s"streamingData/$n.json")), dst,
        StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(System.currentTimeMillis() - 60000 + i * 1000)
      ()
    }
    val enriched = Status.enrich(
      Sources.eventStream(spark, streamDir.toString),
      Sources.tributeDim(spark, fixture("staticData/tributeData.csv")),
      Sources.gameDim(spark, fixture("staticData/gameData.json")))
    // one event per key per fixture batch, so per-row upsert order within a
    // micro-batch cannot flip a key's final value (fixture property, SURVEY §4)
    val q = Status.stateItem(enriched).writeStream
      .format("graft-kv")
      .option("store", storeName)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()

    val state = KVRegistry.getOrCreate(storeName).snapshot()
    assert(state.size === 16)
    assert(state("3")("status") === "DEAD")
    assert(state.values.count(_("status") == "ALIVE") === 2)
  }
}
