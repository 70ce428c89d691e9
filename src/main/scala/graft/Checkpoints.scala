package graft

import org.apache.spark.sql.DataFrame

/** Lineage truncation for the iterative operators (dupClusters,
  * kmeansCentroids, pcaPower, bpeLearn, copurchaseRank).
  *
  * Default is `localCheckpoint`: blocks live on executor local storage,
  * which is exactly right in local[32] and cheap on a cluster — but a
  * lost executor mid-superstep loses its blocks and kills the job,
  * because a truncated plan has no lineage to recompute from. On a real
  * cluster, set `spark.graft.checkpointDir` to a durable path (HDFS/S3)
  * and every truncation routes through reliable `checkpoint()` instead:
  * blocks are written to the shared filesystem and survive executor
  * loss. One knob, no per-operator plumbing.
  */
object Checkpoints {

  /** Conf key: when set (non-empty), iterative operators use reliable
    * `checkpoint()` against this directory instead of
    * `localCheckpoint()`. */
  val ConfKey = "spark.graft.checkpointDir"

  /** Truncate `df`'s lineage. `eager=false` defers materialization to
    * the first action (the bpeLearn superstep pattern, where the next
    * bounded collect is the action). */
  def truncate(df: DataFrame, eager: Boolean = true): DataFrame = {
    val session = df.sparkSession
    session.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = session.sparkContext
        // setCheckpointDir mints a fresh UUID subdir per call — set it
        // once per context, not per superstep
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None =>
        df.localCheckpoint(eager)
    }
  }
}
