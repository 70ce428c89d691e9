package graft

import java.nio.file.{Files, Paths}

import graft.operators.Dedup

/** The reliable-checkpoint seam: with `spark.graft.checkpointDir` set,
  * every iterative operator's lineage truncation routes through durable
  * `checkpoint()` (survives executor loss on a real cluster) instead of
  * `localCheckpoint()` — same results, one config knob.
  */
class CheckpointsSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** An in-memory copy of a file-backed table: no Derived fingerprint, so
    * operators take their inline superstep plans — this spec tests the
    * checkpoint SEAM, which only the live superstep loop exercises (since
    * round 19 the file-backed dupClusters serves a derived artifact and
    * never re-runs the loop). */
  private def inMemory(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(df.collect().toList.asJava, df.schema)
  }

  test("dupClusters with spark.graft.checkpointDir set: same clusters, durable checkpoint files written") {
    val docs = inMemory(graft.sources.Tables.documents(spark, sf0001))
    val baseline = canon(Dedup.dupClusters(docs, bands = 4, rowsPerBand = 2, threshold = 0.8))

    val dir = Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set(Checkpoints.ConfKey, dir)
    try {
      val routed = canon(Dedup.dupClusters(docs, bands = 4, rowsPerBand = 2, threshold = 0.8))
      assert(routed === baseline,
        "reliable-checkpoint run must be bit-identical to the localCheckpoint run")
      // setCheckpointDir mints a UUID subdir under the knob's dir; the
      // superstep RDDs must have landed there
      val files = Files.walk(Paths.get(dir)).filter(Files.isRegularFile(_)).count()
      assert(files > 0, s"expected checkpoint part files under $dir")
    } finally {
      spark.conf.unset(Checkpoints.ConfKey)
    }
  }

  test("kmeansCentroids and bpeLearn route through the knob with identical results") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val kmBase = canon(graft.operators.Similarity.kmeansCentroids(emb, k = 4, iters = 2))
    val bpeBase = canon(graft.operators.Corpus.bpeLearn(docs))
    graft.Caches.releaseAll()

    val dir = Files.createTempDirectory("graft_ckpt2").toString
    spark.conf.set(Checkpoints.ConfKey, dir)
    try {
      assert(canon(graft.operators.Similarity.kmeansCentroids(emb, k = 4, iters = 2)) === kmBase)
      graft.Caches.releaseAll()
      assert(canon(graft.operators.Corpus.bpeLearn(docs)) === bpeBase)
      graft.Caches.releaseAll()
    } finally {
      spark.conf.unset(Checkpoints.ConfKey)
    }
  }

  test("cleanCheckpoints: superseded checkpoint dirs are deleted once their RDDs are unreachable") {
    // the flag is read once at context creation — the builder must have set it
    assert(spark.sparkContext.getConf
      .get("spark.cleaner.referenceTracking.cleanCheckpoints", "false") === "true",
      "session builders on the reliable path must enable checkpoint cleanup")
    // setCheckpointDir is minted once per context — earlier tests may
    // already own it, so observe whatever dir the context actually uses
    // and track only the rdd-* dirs THIS run creates
    def rddDirs(): Set[String] =
      spark.sparkContext.getCheckpointDir.toSet[String].flatMap { root =>
        // getCheckpointDir reports a URI (file:/tmp/...); walk its PATH
        val rootPath =
          if (root.contains(":")) Paths.get(new java.net.URI(root))
          else Paths.get(root)
        // the cleaner deletes concurrently with this walk — a dir that
        // vanishes mid-traversal counts as deleted, not as an error
        try {
          val s = Files.walk(rootPath)
            .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("rdd-"))
          try {
            val it = s.iterator()
            val b = Set.newBuilder[String]
            while (it.hasNext) b += it.next().toString
            b.result()
          } finally s.close()
        } catch {
          case _: java.io.UncheckedIOException | _: java.nio.file.NoSuchFileException =>
            Set.empty[String]
        }
      }
    spark.conf.set(Checkpoints.ConfKey,
      Files.createTempDirectory("graft_ckpt3").toString)
    try {
      val before = rddDirs()
      // hold the RESULT FRAME (it roots the checkpointed lineage) across
      // the liveness check, then drop it — cleaner fires on RDD GC
      var res: org.apache.spark.sql.DataFrame = Dedup.dupClusters(
        inMemory(graft.sources.Tables.documents(spark, sf0001)),
        bands = 4, rowsPerBand = 2, threshold = 0.8)
      assert(res.collect().nonEmpty)
      graft.Caches.releaseAll()
      val mine = rddDirs() -- before
      assert(mine.nonEmpty, "supersteps must have written rdd-* checkpoint dirs")
      res = null
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while ((rddDirs() intersect mine).nonEmpty && System.nanoTime() < deadline) {
        System.gc(); Thread.sleep(250)
      }
      assert((rddDirs() intersect mine).isEmpty,
        s"context cleaner must delete superseded checkpoint dirs, left: ${rddDirs() intersect mine}")
    } finally {
      spark.conf.unset(Checkpoints.ConfKey)
    }
  }

  test("truncate without the knob stays local: no checkpoint dir demanded") {
    // guards the default path — localCheckpoint must not require
    // SparkContext.setCheckpointDir
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    assert(Checkpoints.truncate(df).collect().map(_.getInt(0)).sorted === Array(1, 2, 3))
  }
}
