package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._


/** The cross-PROCESS derived-store race (round-17 verdict task 5): two
  * independent JVMs — no shared memo, no shared per-key monitors —
  * racing one key on one root, with a pre-planted SUPERSEDED generation
  * so both processes' gcSuperseded passes run against a live winner.
  * Asserts the full contract: both processes succeed with identical
  * values, exactly one artifact (single winner, loser adopted), the
  * superseded generation reclaimed, the live generation NEVER deleted by
  * either GC pass, no stage leftovers, and a self-identifying marker.
  *
  * Runs real `java` subprocesses over the test classpath with the same
  * module opens the build forks with; a missing java binary cancels
  * rather than fails (assume).
  */
class DerivedCrossJvmRaceSpec extends SparkSpec {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("two JVMs racing one key: one artifact, loser adopts, GC reclaims only the dead generation") {
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java")
    assume(Files.exists(javaBin), s"no java binary at $javaBin")
    val base = Files.createTempDirectory("derived-xjvm").toString
    val root = s"$base/store"
    val input = s"$base/input.parquet"
    val goFile = s"$base/go"

    // ---- pre-plant a SUPERSEDED generation of the same artifact name
    // over the same dataset path, so the racers' GC passes have a real
    // victim AND a live winner to distinguish ----
    import spark.implicits._
    Seq((1L, "old")).toDF("k", "v").write.mode("overwrite").parquet(input)
    spark.conf.set("spark.graft.derived.root", root)
    try {
      val df = spark.read.parquet(input)
      Derived.materialized(spark, "race_probe", Seq(df)) {
        df.groupBy(col("v")).agg(count(lit(1)).as("n"))
      }.collect()
    } finally spark.conf.unset("spark.graft.derived.root")
    val planted = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("race_probe_"))
    assert(planted.length === 1, s"plant setup: $planted")
    // regenerate the input IN PLACE: the planted artifact is now a dead
    // generation of the same dataset (same parent dirs, new fileFp)
    Seq((1L, "a"), (2L, "b"), (3L, "b")).toDF("k", "v")
      .write.mode("overwrite").parquet(input)

    // ---- launch the two racers ----
    def launch(tag: String): (Process, java.io.File) = {
      val out = new java.io.File(base, s"racer-$tag.log")
      val cwd = Files.createDirectory(Paths.get(base, s"cwd-$tag")).toFile
      val cmd = (javaBin.toString +: addOpens) ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false", "-cp", sys.props("java.class.path"),
        "graft.DerivedRaceMain", root, input, goFile, "1500")
      val pb = new ProcessBuilder(cmd: _*)
      pb.directory(cwd)
      pb.redirectErrorStream(true)
      pb.redirectOutput(out)
      (pb.start(), out)
    }
    val (p1, log1) = launch("one")
    val (p2, log2) = launch("two")
    try {
      // start barrier: wait for BOTH sessions to be up, then fire — JVM
      // startup jitter must not serialize the builds (each build then
      // sleeps 1.5 s, so both are provably mid-build simultaneously)
      val deadline = System.currentTimeMillis() + 120000
      def ready(f: java.io.File) =
        f.exists() && Files.readString(f.toPath).contains("READY")
      while (!(ready(log1) && ready(log2))) {
        assert(System.currentTimeMillis() < deadline, {
          def tail(f: java.io.File) =
            if (f.exists()) Files.readString(f.toPath).takeRight(800) else "<no log>"
          s"racers never came up.\n-- one:\n${tail(log1)}\n-- two:\n${tail(log2)}"
        })
        Thread.sleep(100)
      }
      Files.writeString(Paths.get(goFile), "go")
      assert(p1.waitFor(120, java.util.concurrent.TimeUnit.SECONDS), "racer one hung")
      assert(p2.waitFor(120, java.util.concurrent.TimeUnit.SECONDS), "racer two hung")
      def result(f: java.io.File, rc: Int): String = {
        val text = Files.readString(f.toPath)
        assert(rc === 0, s"racer failed (rc=$rc):\n${text.takeRight(1500)}")
        val line = text.linesIterator.find(_.startsWith("RESULT "))
        assert(line.isDefined, s"no RESULT line:\n${text.takeRight(1500)}")
        line.get
      }
      val (r1, r2) = (result(log1, p1.exitValue()), result(log2, p2.exitValue()))
      // loser adoption: both processes served the SAME artifact values
      assert(r1 === "RESULT a=1,b=2", s"racer one wrong: $r1")
      assert(r2 === r1, s"racers diverged: $r1 vs $r2")
    } finally {
      p1.destroyForcibly(); p2.destroyForcibly()
      ()
    }

    // ---- root post-conditions ----
    val names = new java.io.File(root).listFiles().map(_.getName).toSeq
    val artifacts = names.filter(_.startsWith("race_probe_"))
    assert(artifacts.length === 1,
      s"two racers + GC must leave exactly ONE live artifact, found $names")
    assert(!artifacts.contains(planted.head),
      "the superseded pre-planted generation must have been reclaimed")
    assert(!names.exists(_.startsWith(".stage_")),
      s"no stage dir may survive either racer: $names")
    val dir = new java.io.File(root, artifacts.head)
    assert(!dir.listFiles().map(_.getName).exists(_.startsWith(".stage_")),
      "no nested stage copy may leak inside the contended target")
    val marker = new java.io.File(dir, ".graft_fp")
    assert(marker.exists(), "winner must carry its marker")
    assert(Files.readString(marker.toPath).split("\n").head.trim === artifacts.head,
      "marker line 1 must be the artifact's own key")
  }
}
