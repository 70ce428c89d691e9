package graft

import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared DERIVED relations: expensive deterministic intermediates that
  * several queries consume (the co-purchase edge relation feeds q110's
  * support table, q114's fixed-point ranks, q121's triangles, and q283's
  * PageRank), materialized to parquet ONCE per input generation and read
  * back by every consumer — the single-box analogue of a production
  * feature/edge store, where a 100 TB pipeline builds the pair graph in
  * one nightly job and four downstream analyses scan the build instead of
  * re-mining baskets.
  *
  * Staleness is handled by CONTENT, not by name (the retentionSweep
  * lesson: a name-keyed reuse silently reads a stale snapshot when the
  * data under the same path changes). The cache key is a fingerprint of
  * every input scan file's (path, length, mtime): regenerating the input
  * parquet — even in place — changes the fingerprint and forces a
  * rebuild; the stale artifact is simply never addressed again.
  *
  * Non-file-backed inputs (in-memory test DataFrames, streaming
  * relations) have no stable fingerprint, so [[materialized]] falls back
  * to the inline plan — unit tests and one-off frames never touch disk.
  *
  * Concurrency: within a JVM a `computeIfAbsent` memo builds each key
  * once; across JVMs the build lands in a session-unique staging dir and
  * is RENAMED into the keyed location (rename-if-absent), so two sessions
  * racing on the same key produce one artifact and no torn reads.
  */
object Derived {

  /** memoKey -> materialized path, per JVM (avoids re-fingerprinting and
    * re-listing on every plan construction). Builds NEVER run inside the
    * map's own computeIfAbsent: one artifact's build may materialize
    * another (the k-means assignment builds the centroid table), and a
    * nested computeIfAbsent on the same ConcurrentHashMap throws
    * "Recursive update" when the keys share a bin. Per-key monitor
    * objects serialize same-key builders instead; the lock graph follows
    * the (acyclic) artifact-dependency graph, so nesting cannot deadlock.
    */
  private val memo = new ConcurrentHashMap[String, String]()
  private val locks = new ConcurrentHashMap[String, Object]()

  private def root: String =
    s"${sys.props("java.io.tmpdir")}/graft-derived"

  /** Content fingerprint of the scan files behind `dfs` PLUS each input's
    * canonicalized logical plan: hex MD5 over the sorted
    * (path, length, mtime) listing followed by the canonicalized plan
    * strings. The plan half matters because two DIFFERENT relations can
    * scan the SAME files (`docs` vs `docs.filter(bucket < 95)`): file
    * identity alone would let them collide under one artifact name.
    * Canonicalized plans normalize expression ids, so the same code path
    * produces the same string across sessions. None when any input is
    * not file-backed (no stable content identity → caller must build
    * inline).
    */
  def fingerprint(s: SparkSession, dfs: Seq[DataFrame]): Option[String] = {
    val files = dfs.flatMap(_.inputFiles)
    if (files.isEmpty || dfs.exists(_.inputFiles.isEmpty)) return None
    val conf = s.sparkContext.hadoopConfiguration
    val lines = files.sorted.map { f =>
      val p = new Path(f)
      val st = p.getFileSystem(conf).getFileStatus(p)
      s"$f|${st.getLen}|${st.getModificationTime}"
    }
    val md = MessageDigest.getInstance("MD5")
    lines.foreach(l => md.update(l.getBytes("UTF-8")))
    dfs.foreach(df => md.update(
      df.queryExecution.analyzed.canonicalized.toString.getBytes("UTF-8")))
    Some(md.digest().map("%02x".format(_)).mkString)
  }

  /** The materialized relation named `name` derived from `inputs`: build
    * it with `build` on first use per input generation, then serve every
    * later consumer (and session) a parquet scan of the artifact. Falls
    * back to the inline `build` plan when no content fingerprint exists.
    */
  def materialized(s: SparkSession, name: String, inputs: Seq[DataFrame])(
      build: => DataFrame): DataFrame = {
    fingerprint(s, inputs) match {
      case None => build
      case Some(fp) =>
        val key = s"${name}_$fp"
        var path = memo.get(key)
        if (path == null) {
          val lock = locks.computeIfAbsent(key, _ => new Object)
          lock.synchronized {
            path = memo.get(key)
            if (path == null) {
              path = ensure(s, key, build)
              memo.put(key, path)
            }
          }
        }
        s.read.parquet(path)
    }
  }

  /** Build-or-adopt the keyed artifact; returns its path. */
  private def ensure(s: SparkSession, key: String, build: => DataFrame): String = {
    val conf = s.sparkContext.hadoopConfiguration
    val target = new Path(s"$root/$key")
    val fs = target.getFileSystem(conf)
    if (fs.exists(new Path(target, "_SUCCESS"))) return target.toString
    // stage under a session-unique name, then rename-if-absent: the
    // loser of a cross-JVM race adopts the winner's artifact
    val app = s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
    // the DOT prefix matters twice: Spark's file listing hides dot-paths,
    // so a stage dir that loses a rename race and lands NESTED inside the
    // winner's target (Hadoop rename-into-existing-dir semantics) is
    // invisible to every later parquet scan
    val stage = new Path(s"$root/.stage_${app}_$key")
    build.write.mode("overwrite").parquet(stage.toString)
    if (!fs.exists(target)) fs.rename(stage, target)
    if (!fs.exists(new Path(target, "_SUCCESS")))
      throw new java.io.IOException(
        s"Derived: could not publish $target and no winner's artifact found")
    fs.delete(stage, true)
    target.toString
  }
}
