package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

/** Contract tests for the shared derived-relation cache three operator
  * families (co-purchase pairs, LSH dup pairs, multimodal pair sets, NB
  * confusion) now stand on: identical values to the inline plan, build
  * amortization across consumers, content-keyed invalidation, and the
  * in-memory fallback.
  */
class DerivedSpec extends SparkSpec {

  private def freshInput(rows: Seq[(Long, String)], dir: String): Unit = {
    import spark.implicits._
    rows.toDF("k", "v").write.mode("overwrite").parquet(dir)
  }

  test("materialized returns the build's values and builds exactly once per input generation") {
    val base = Files.createTempDirectory("derived-spec").toString
    val in = s"$base/input.parquet"
    freshInput(Seq((1L, "a"), (2L, "b"), (2L, "b")), in)
    val builds = new AtomicInteger(0)
    def q() = {
      val df = spark.read.parquet(in)
      Derived.materialized(spark, s"spec_counts_${getClass.getSimpleName}",
        Seq(df)) {
        builds.incrementAndGet()
        df.groupBy(col("v")).agg(count(lit(1)).as("n"))
      }
    }
    val first = q().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(first === Map("a" -> 1L, "b" -> 2L))
    assert(builds.get() === 1)
    // second consumer: same values, NO second build
    val second = q().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(second === first)
    assert(builds.get() === 1, "the artifact must be reused, not rebuilt")
  }

  test("an in-place input regeneration changes the fingerprint and forces a rebuild") {
    val base = Files.createTempDirectory("derived-spec-fp").toString
    val in = s"$base/input.parquet"
    freshInput(Seq((1L, "a")), in)
    val builds = new AtomicInteger(0)
    def q() = {
      val df = spark.read.parquet(in)
      Derived.materialized(spark, "spec_fp_counts", Seq(df)) {
        builds.incrementAndGet()
        df.groupBy(col("v")).agg(count(lit(1)).as("n"))
      }
    }
    assert(q().collect().map(_.getString(0)).toSet === Set("a"))
    assert(builds.get() === 1)
    // regenerate IN PLACE under the same path — the retentionSweep
    // staleness scenario; the derived read must follow the new content
    freshInput(Seq((1L, "x"), (2L, "x")), in)
    val out2 = q().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out2 === Map("x" -> 2L),
      s"stale artifact served after the input changed: $out2")
    assert(builds.get() === 2)
  }

  test("non-file-backed inputs fall back to the inline plan (no artifact, every call builds)") {
    import spark.implicits._
    val mem = Seq((1L, "a"), (2L, "a")).toDF("k", "v")
    assert(Derived.fingerprint(spark, Seq(mem)).isEmpty)
    val builds = new AtomicInteger(0)
    def q() = Derived.materialized(spark, "spec_mem", Seq(mem)) {
      builds.incrementAndGet()
      mem.groupBy(col("v")).agg(count(lit(1)).as("n"))
    }
    assert(q().collect().head.getLong(1) === 2L)
    assert(q().collect().head.getLong(1) === 2L)
    assert(builds.get() === 2, "in-memory inputs must never share state")
  }

  test("two concurrent consumers of one key build exactly once and both read correct values") {
    val base = Files.createTempDirectory("derived-spec-conc").toString
    val in = s"$base/input.parquet"
    freshInput(Seq((1L, "a"), (2L, "b"), (3L, "b")), in)
    val builds = new AtomicInteger(0)
    def q() = {
      val df = spark.read.parquet(in)
      Derived.materialized(spark, "spec_conc_counts", Seq(df)) {
        builds.incrementAndGet()
        df.groupBy(col("v")).agg(count(lit(1)).as("n"))
      }.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      val (fa, fb) = (Future(q()), Future(q()))
      val expected = Map("a" -> 1L, "b" -> 2L)
      assert(Await.result(fa, 5.minutes) === expected)
      assert(Await.result(fb, 5.minutes) === expected)
      assert(builds.get() === 1,
        "computeIfAbsent must serialize concurrent builders of one key")
    } finally pool.shutdown()
  }

  test("a build may materialize another artifact (nested keys never hit the recursive-update trap)") {
    val base = Files.createTempDirectory("derived-spec-nested").toString
    val in = s"$base/input.parquet"
    freshInput(Seq((1L, "a"), (2L, "a"), (3L, "b")), in)
    val df = spark.read.parquet(in)
    // outer artifact's build reads the inner artifact — the k-means
    // assignment/centroids shape; with computeIfAbsent this threw
    // IllegalStateException("Recursive update") on same-bin keys
    val out = Derived.materialized(spark, "spec_nested_outer", Seq(df)) {
      val inner = Derived.materialized(spark, "spec_nested_inner", Seq(df)) {
        df.groupBy(col("v")).agg(count(lit(1)).as("n"))
      }
      inner.filter(col("n") >= 2L)
    }.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 2L))
  }

  test("fingerprint distinguishes two relations over the SAME files (a filtered view never collides)") {
    val base = Files.createTempDirectory("derived-spec-plan").toString
    val in = s"$base/input.parquet"
    freshInput(Seq((1L, "a"), (2L, "b")), in)
    val full = spark.read.parquet(in)
    val filtered = full.filter(col("k") >= 2L)
    val (fa, fb) = (Derived.fingerprint(spark, Seq(full)).get,
      Derived.fingerprint(spark, Seq(filtered)).get)
    assert(fa !== fb,
      "file identity alone would let docs and docs.filter share one artifact")
    // and the artifacts really are distinct relations under one name
    def counts(df: org.apache.spark.sql.DataFrame) =
      Derived.materialized(spark, "spec_plan_counts", Seq(df)) {
        df.groupBy(col("v")).agg(count(lit(1)).as("n"))
      }.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts(full) === Map("a" -> 1L, "b" -> 1L))
    assert(counts(filtered) === Map("b" -> 1L))
  }

  test("fingerprint covers every input: a change in ANY of two inputs re-keys") {
    val base = Files.createTempDirectory("derived-spec-multi").toString
    val (inA, inB) = (s"$base/a.parquet", s"$base/b.parquet")
    freshInput(Seq((1L, "a")), inA)
    freshInput(Seq((1L, "b")), inB)
    val dfA = spark.read.parquet(inA)
    val dfB = spark.read.parquet(inB)
    val fp1 = Derived.fingerprint(spark, Seq(dfA, dfB)).get
    freshInput(Seq((2L, "b2")), inB)
    val fp2 = Derived.fingerprint(
      spark, Seq(dfA, spark.read.parquet(inB))).get
    assert(fp1 !== fp2)
  }
}
