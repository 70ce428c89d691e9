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

  // ---- round-17 hardening: conf root, revalidation, GC, race, markers ----

  private def withRoot[T](body: String => T): T = {
    val root = Files.createTempDirectory("derived-spec-root").toString + "/store"
    spark.conf.set("spark.graft.derived.root", root)
    try body(root) finally spark.conf.unset("spark.graft.derived.root")
  }

  private def artifactDirs(root: String, name: String): Seq[String] = {
    val d = new java.io.File(root)
    if (!d.exists()) Seq.empty
    else d.listFiles().map(_.getName).filter(_.startsWith(name + "_")).toSeq.sorted
  }

  test("spark.graft.derived.root places artifacts under the configured store") {
    withRoot { root =>
      val base = Files.createTempDirectory("derived-spec-conf").toString
      val in = s"$base/input.parquet"
      freshInput(Seq((1L, "a")), in)
      val df = spark.read.parquet(in)
      val out = Derived.materialized(spark, "spec_confroot", Seq(df)) {
        df.groupBy(col("v")).agg(count(lit(1)).as("n"))
      }.collect()
      assert(out.length === 1)
      val dirs = artifactDirs(root, "spec_confroot")
      assert(dirs.length === 1, s"artifact must land under the conf root, found $dirs")
      // the artifact self-identifies: the hidden marker carries its key
      val marker = new java.io.File(s"$root/${dirs.head}/.graft_fp")
      assert(marker.exists(), "published artifact must carry its .graft_fp marker")
      val lines = Files.readString(marker.toPath).split("\n")
      assert(lines.head.trim === dirs.head, "marker line 1 must be the artifact's own key")
      assert(lines.lift(1).exists(_.contains("\"type\":\"struct\"")),
        "marker line 2 must carry the schema (spares consumers an inference job)")
    }
  }

  test("a memo hit revalidates on disk: an externally deleted artifact is rebuilt, not served dead") {
    withRoot { root =>
      val base = Files.createTempDirectory("derived-spec-vanish").toString
      val in = s"$base/input.parquet"
      freshInput(Seq((1L, "a"), (2L, "a")), in)
      val builds = new AtomicInteger(0)
      def q() = {
        val df = spark.read.parquet(in)
        Derived.materialized(spark, "spec_vanish", Seq(df)) {
          builds.incrementAndGet()
          df.groupBy(col("v")).agg(count(lit(1)).as("n"))
        }.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      assert(q() === Map("a" -> 2L))
      assert(builds.get() === 1)
      // a tmp cleaner wipes the store inside a long-lived JVM
      val dir = artifactDirs(root, "spec_vanish").head
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(s"$root/$dir"))
      assert(q() === Map("a" -> 2L),
        "the vanished artifact must be rebuilt on the next consumer")
      assert(builds.get() === 2)
    }
  }

  test("GC reclaims superseded generations but keeps same-file different-plan siblings") {
    withRoot { root =>
      val base = Files.createTempDirectory("derived-spec-gc").toString
      val in = s"$base/input.parquet"
      freshInput(Seq((1L, "a"), (2L, "b")), in)
      def build(df: org.apache.spark.sql.DataFrame) =
        Derived.materialized(spark, "spec_gc", Seq(df)) {
          df.groupBy(col("v")).agg(count(lit(1)).as("n"))
        }.collect()
      // two live views of ONE generation: full + filtered share the file
      // fingerprint, differ in the plan half — both must coexist
      build(spark.read.parquet(in))
      build(spark.read.parquet(in).filter(col("k") >= 2L))
      assert(artifactDirs(root, "spec_gc").length === 2,
        "same-file different-plan artifacts are both live and must coexist")
      // regenerating the input kills the generation: the next build must
      // GC BOTH superseded artifacts (disk stops growing across epochs)
      freshInput(Seq((1L, "x"), (2L, "x"), (3L, "y")), in)
      build(spark.read.parquet(in))
      val left = artifactDirs(root, "spec_gc")
      assert(left.length === 1,
        s"superseded generation must be garbage-collected, found $left")
    }
  }

  test("GC is dataset-scoped: same-name artifacts over DIFFERENT datasets coexist") {
    withRoot { root =>
      // sf0.001 unit tests and sf0.1 bench share one per-user root and
      // build the same artifact NAMES from different inputs; reclaiming
      // across datasets would make every run GC the other's live
      // artifact in an endless rebuild ping-pong
      val base = Files.createTempDirectory("derived-spec-gcx").toString
      val (inA, inB) = (s"$base/dsA.parquet", s"$base/dsB.parquet")
      freshInput(Seq((1L, "a")), inA)
      freshInput(Seq((2L, "b"), (3L, "b")), inB)
      def build(in: String) =
        Derived.materialized(spark, "spec_gcx", Seq(spark.read.parquet(in))) {
          spark.read.parquet(in).groupBy(col("v")).agg(count(lit(1)).as("n"))
        }.collect()
      build(inA)
      build(inB)
      assert(artifactDirs(root, "spec_gcx").length === 2,
        "two datasets' artifacts under one name must coexist")
      // regenerating dataset A reclaims only A's old generation
      freshInput(Seq((1L, "a2")), inA)
      build(inA)
      val left = artifactDirs(root, "spec_gcx")
      assert(left.length === 2,
        s"A's old generation GC'd, B's live artifact untouched: $left")
      assert(build(inB).map(_.getString(0)).toSet === Set("b"),
        "dataset B still serves its own artifact")
    }
  }

  test("a lost publish race adopts the winner's artifact and leaks no nested stage copy") {
    withRoot { root =>
      import spark.implicits._
      val base = Files.createTempDirectory("derived-spec-race").toString
      val in = s"$base/input.parquet"
      freshInput(Seq((1L, "loser")), in)
      val df = spark.read.parquet(in)
      val conf = spark.sparkContext.hadoopConfiguration
      // plant a WINNER between the loser's stage write and its publish
      // rename — the cross-JVM race window, forced deterministically
      Derived.testPrePublishHook = { target =>
        val fs = target.getFileSystem(conf)
        val plant = new org.apache.hadoop.fs.Path(target.getParent, ".plant_winner")
        Seq(("winner", 7L)).toDF("v", "n")
          .coalesce(1).write.mode("overwrite").parquet(plant.toString)
        val out = fs.create(new org.apache.hadoop.fs.Path(plant, ".graft_fp"), true)
        out.write(target.getName.getBytes("UTF-8")); out.close()
        assert(fs.rename(plant, target), "test plant must win the rename")
      }
      val got =
        try Derived.materialized(spark, "spec_race", Seq(df)) {
          df.select(lit("loser").as("v"), lit(1L).as("n"))
        }.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        finally Derived.testPrePublishHook = _ => ()
      assert(got === Seq(("winner", 7L)),
        "the loser must adopt the winner's artifact, not overwrite or fail")
      // no torn reads and no leaked duplicates: the loser's stage is gone
      // from the root AND from inside the winner's target
      val stray = new java.io.File(root).listFiles().map(_.getName)
        .filter(_.startsWith(".stage_"))
      assert(stray.isEmpty, s"loser's stage must be cleaned up: ${stray.toSeq}")
      val dir = artifactDirs(root, "spec_race").head
      val nested = new java.io.File(s"$root/$dir").listFiles().map(_.getName)
        .filter(_.startsWith(".stage_"))
      assert(nested.isEmpty,
        s"no stage copy may leak inside a contended target: ${nested.toSeq}")
    }
  }

  test("a pre-planted directory without a matching marker is reclaimed, never served") {
    withRoot { root =>
      val base = Files.createTempDirectory("derived-spec-plant").toString
      val in = s"$base/input.parquet"
      freshInput(Seq((1L, "real"), (2L, "real")), in)
      val df = spark.read.parquet(in)
      val (fileFp, planFp, _) = Derived.fingerprints(spark, Seq(df)).get
      // an attacker (or a torn copy) occupies the key with a _SUCCESS but
      // no self-identifying marker
      val target = new java.io.File(s"$root/spec_plant_${fileFp}_$planFp")
      import spark.implicits._
      Seq(("evil", 666L)).toDF("v", "n")
        .coalesce(1).write.mode("overwrite").parquet(target.toString)
      assert(new java.io.File(target, "_SUCCESS").exists(),
        "the plant must look complete apart from the marker")
      val got = Derived.materialized(spark, "spec_plant", Seq(df)) {
        df.groupBy(col("v")).agg(count(lit(1)).as("n"))
      }.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got === Seq(("real", 2L)),
        "a marker-less pre-plant must be reclaimed and rebuilt, not served")
    }
  }

  test("an in-place rewrite preserving length and mtime still re-keys (the tail probe)") {
    import spark.implicits._
    val base = Files.createTempDirectory("derived-spec-tail").toString
    val (dirA, dirB) = (s"$base/a.parquet", s"$base/b.parquet")
    // same schema, same value lengths -> byte-identical file SIZES, but
    // the parquet footer statistics (min/max of v) differ at the tail
    Seq((1L, "aa")).toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(dirA)
    Seq((1L, "ab")).toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(dirB)
    def part(d: String) = new java.io.File(d).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
    val (pa, pb) = (part(dirA), part(dirB))
    assert(pa.length === pb.length,
      "scenario requires equal-length rewrites; adjust the payloads if parquet output drifted")
    val fp1 = Derived.fingerprint(spark, Seq(spark.read.parquet(dirA))).get
    val mtime = Files.getLastModifiedTime(pa.toPath)
    Files.copy(pb.toPath, pa.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // keep Hadoop's ChecksumFileSystem consistent with the rewritten
    // bytes (the sidecar is not part of the fingerprint surface)
    def crc(f: java.io.File) = new java.io.File(f.getParent, s".${f.getName}.crc")
    if (crc(pb).exists())
      Files.copy(crc(pb).toPath, crc(pa).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(pa.toPath, mtime)
    val fp2 = Derived.fingerprint(spark, Seq(spark.read.parquet(dirA))).get
    assert(fp1 !== fp2,
      "a same-length same-mtime content rewrite must re-key via the tail checksum")
  }

  test("a well-formed plant under a FOREIGN-OWNED root is refused on the adopt path, never served") {
    // the pre-plant attack the adopt path must also close: the artifact
    // key is computable from world-readable inputs plus the deterministic
    // canonicalized plan, so an attacker can pre-create the per-user root
    // and plant a COMPLETE artifact (_SUCCESS + correct .graft_fp) under
    // it — adoption must be gated on root ownership exactly like builds
    val nobody =
      try Some(java.nio.file.FileSystems.getDefault
        .getUserPrincipalLookupService.lookupPrincipalByName("nobody"))
      catch { case scala.util.control.NonFatal(_) => None }
    assume(nobody.isDefined && sys.props.get("user.name").contains("root"),
      "needs root + a 'nobody' principal to simulate a foreign owner")
    val base = Files.createTempDirectory("derived-spec-foreign").toString
    val in = s"$base/input.parquet"
    freshInput(Seq((1L, "mine"), (2L, "mine")), in)
    def q() = {
      val df = spark.read.parquet(in)
      Derived.materialized(spark, "spec_foreign", Seq(df)) {
        df.groupBy(col("v")).agg(count(lit(1)).as("n"))
      }.collect()
    }
    // victim's own root first: produce the exact bytes an attacker would
    // plant (a fully adoptable artifact for the victim's key)
    val victimRoot = s"$base/victim-root"
    spark.conf.set("spark.graft.derived.root", victimRoot)
    try q() finally spark.conf.unset("spark.graft.derived.root")
    // attacker's root: same tree, foreign-owned
    val attackerRoot = s"$base/attacker-root"
    def copy(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) {
        dst.mkdirs()
        src.listFiles().foreach(f => copy(f, new java.io.File(dst, f.getName)))
      } else Files.copy(src.toPath, dst.toPath)
    }
    copy(new java.io.File(victimRoot), new java.io.File(attackerRoot))
    Files.setOwner(java.nio.file.Paths.get(attackerRoot), nobody.get)
    spark.conf.set("spark.graft.derived.root", attackerRoot)
    try {
      val e = intercept[java.io.IOException](q())
      assert(e.getMessage.contains("owned by"),
        s"adoption under a foreign root must refuse, got: ${e.getMessage}")
    } finally spark.conf.unset("spark.graft.derived.root")
  }

  test("spark.graft.derived.gcGraceMs defers reclaim of superseded generations") {
    withRoot { root =>
      val base = Files.createTempDirectory("derived-spec-grace").toString
      val in = s"$base/input.parquet"
      freshInput(Seq((1L, "a")), in)
      def build() =
        Derived.materialized(spark, "spec_grace", Seq(spark.read.parquet(in))) {
          spark.read.parquet(in).groupBy(col("v")).agg(count(lit(1)).as("n"))
        }.collect()
      build()
      // a long grace keeps the superseded generation for in-flight scans
      spark.conf.set("spark.graft.derived.gcGraceMs", "3600000")
      try {
        freshInput(Seq((1L, "b")), in)
        build()
        assert(artifactDirs(root, "spec_grace").length === 2,
          "within the grace window the superseded generation must survive")
      } finally spark.conf.unset("spark.graft.derived.gcGraceMs")
      // default (0): the next publish reclaims everything superseded
      freshInput(Seq((1L, "c")), in)
      build()
      assert(artifactDirs(root, "spec_grace").length === 1,
        "past the grace window superseded generations are reclaimed")
    }
  }

  test("build wall time is recorded per artifact name, once — consumers scanning the artifact add nothing") {
    withRoot { _ =>
      val base = Files.createTempDirectory("derived-spec-timer").toString
      val in = s"$base/input.parquet"
      freshInput(Seq((1L, "a")), in)
      def q() = {
        val df = spark.read.parquet(in)
        Derived.materialized(spark, "spec_timer", Seq(df)) {
          df.groupBy(col("v")).agg(count(lit(1)).as("n"))
        }.collect()
      }
      q()
      val t1 = Derived.buildSeconds.get("spec_timer")
      assert(t1.exists(_ > 0.0), s"build must be timed, got $t1")
      q() // scan-only reuse
      assert(Derived.buildSeconds.get("spec_timer") === t1,
        "a consumer scan must not add build time")
    }
  }
}
