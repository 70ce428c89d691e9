package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.sources.Tables

/** Document deduplication for training-data pipelines, at four fidelity
  * levels: exact (content hash), n-gram Jaccard (ground truth for near-dup),
  * MinHash+LSH (the scale path: candidates via banded signature buckets,
  * verified with true Jaccard), and SimHash signatures.
  *
  * All hashing is md5-based so every stage is reproducible in any engine —
  * the DuckDB oracles compute identical signatures, buckets, and pairs.
  *
  * Scale design: nothing here is all-pairs except the explicitly-named
  * ground-truth operator. MinHash/LSH cost is O(docs × shingles × k) for
  * signatures plus per-bucket joins; the shuffle keys (shingle, band+key)
  * are high-cardinality so partitions stay balanced.
  */
object Dedup {

  /** Exact dedup by content hash: one row per distinct text, keeper = min
    * doc_id, n = group size. Pure hash-aggregate, one shuffle.
    */
  def exact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))

  /** (doc_id, shingle) pairs: distinct word-3-grams per document. */
  private[operators] def docShingles(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
    d.select(col("doc_id"), explode(Text.shingles(col("w"))).as("sh"))
  }

  /** Per-doc distinct-shingle counts. */
  private def shingleCounts(sh: DataFrame): DataFrame =
    sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))

  /** Jaccard for a pair set: inter-counts joined with per-doc counts.
    * `pairsWithInter` needs (doc_a, doc_b, inter).
    */
  private def withJaccard(pairsWithInter: DataFrame, counts: DataFrame): DataFrame =
    pairsWithInter
      .join(counts.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))

  /** Ground-truth near-dup pairs: docs sharing >=1 shingle, true Jaccard >=
    * threshold. The shingle self-join is the honest quadratic-in-collisions
    * baseline; use `minhashLsh` at scale.
    */
  def ngramJaccard(s: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val sh = docShingles(s, dir)
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    withJaccard(inter, shingleCounts(sh))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash signatures: k = bands*rowsPerBand hash functions; minhash_i =
    * lexicographic min over shingles of md5("i:shingle") (fixed-width hex,
    * so string min ≡ numeric min — portable to any engine with md5).
    */
  private[operators] def minhashes(
      sh: DataFrame, k: Int): DataFrame =
    sh.crossJoin(spark_range_k(sh, k))
      .groupBy(col("doc_id"), col("i"))
      .agg(min(md5(concat(col("i").cast("string"), lit(":"), col("sh")))).as("minh"))

  private def spark_range_k(sh: DataFrame, k: Int): DataFrame =
    sh.sparkSession.range(0, k).select(col("id").as("i"))

  /** LSH candidate pairs + true-Jaccard verification (the scale path).
    * Docs land in the same bucket when one full band of `rowsPerBand`
    * consecutive minhashes matches; candidates are verified with exact
    * Jaccard and filtered at `threshold`. With 4 bands × 2 rows, a pair at
    * Jaccard 0.8 is caught with prob 1-(1-0.8^2)^4 ≈ 0.98.
    */
  def minhashLsh(
      s: SparkSession, dir: String,
      bands: Int = 4, rowsPerBand: Int = 2,
      threshold: Double = 0.8): DataFrame = {
    val sh = docShingles(s, dir)
    val mh = minhashes(sh, bands * rowsPerBand)
      .withColumn("band", floor(col("i") / rowsPerBand))
    // band key: md5 over the band's minhashes in i-order
    val keys = mh.groupBy(col("doc_id"), col("band"))
      .agg(md5(concat_ws("|",
        transform(array_sort(collect_list(struct(col("i"), col("minh")))),
          x => x.getField("minh")))).as("bkey"))
    val cands = keys.as("a")
      .join(keys.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val inter = cands
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("sa.sh") === col("sb.sh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    withJaccard(inter, shingleCounts(sh))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 32-bit SimHash signature per document from distinct words: bit j is
    * the sign of the weighted vote where each word contributes ±1 from bit
    * j of (the first 8 hex chars of) its md5. Emitted as a 32-char bit
    * string, MSB (j=0) first — portable across engines.
    */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    val wordsDf = Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(array_distinct(Text.words(col("text")))).as("w"))
    val k = s.range(0, 32).select(col("id").as("j"))
    val contrib = wordsDf.crossJoin(k)
      .withColumn("nib",
        expr("substr(md5(w), cast(j div 4 as int) + 1, 1)"))
      .withColumn("bit",
        expr("((instr('0123456789abcdef', nib) - 1) >> (3 - cast(j % 4 as int))) & 1"))
      .withColumn("vote", col("bit") * 2 - 1)
    contrib.groupBy(col("doc_id"), col("j"))
      .agg(sum(col("vote")).as("votes"))
      .withColumn("sbit", when(col("votes") >= 0, "1").otherwise("0"))
      .groupBy(col("doc_id"))
      .agg(concat_ws("",
        transform(array_sort(collect_list(struct(col("j"), col("sbit")))),
          x => x.getField("sbit"))).as("simhash"))
  }
}
