package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Vectors
import graft.sources.Tables

/** Similarity search over the embedding column (`array<float>` 64-dim).
  *
  * Two paths, per the north star:
  *  - `annBruteForceTopK`: exact top-k for a bounded query set — the
  *    correctness baseline. Queries broadcast; the corpus side never
  *    shuffles, so this scales to any corpus size (cost = one pass).
  *  - `nearDupLsh`: random-hyperplane LSH bucketing (deterministic,
  *    md5-derived planes) → per-bucket candidate pairs → exact cosine
  *    verification. The all-pairs join is confined to buckets, which is
  *    what survives a 100×-scale corpus.
  *
  * All dot products/norms are exact int64 fixed-point sums
  * (order-independent; see graft.functions.Vectors) so DuckDB oracles
  * match bit-for-bit.
  */
object Similarity {

  /** Exact cosine top-k neighbours for queries `vec_id < nQueries`. */
  def annBruteForceTopK(
      s: SparkSession, dir: String,
      k: Int = 10, nQueries: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val pairs = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        Vectors.cosine(col("embedding"), col("qe")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Near-duplicate vector pairs via hyperplane-LSH buckets, verified with
    * exact cosine >= threshold. Recall is bucket-limited by design (the
    * scale path); the bucketing is deterministic so results are exactly
    * reproducible.
    */
  def nearDupLsh(
      s: SparkSession, dir: String,
      nPlanes: Int = 8, threshold: Double = 0.4): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val sig = e.select(
      col("vec_id"), col("embedding"),
      Vectors.lshBucket(col("embedding"), nPlanes).as("bucket"))
    sig.as("a")
      .join(sig.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"),
        col("b.vec_id").as("vec_b"),
        Vectors.cosine(col("a.embedding"), col("b.embedding")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
