package graft

import org.apache.spark.sql.DataFrame

package object operators {

  /** Effective width for the explicit pre-explode repartitions the
    * shingle/word operators use: pinned to spark.sql.shuffle.partitions
    * (with the session default as fallback) so an un-pinned repartition
    * cannot be AQE-coalesced back to ~1 partition at small scale, which
    * would serialize the explode-heavy projection on one core. One
    * definition — the fallback and conf key cannot drift per file.
    */
  private[operators] def shuffleWidth(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
}
