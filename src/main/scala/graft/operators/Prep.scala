package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.sources.Tables

/** Dataset-preparation operators for a training-data pipeline: text
  * normalisation, rule-based quality filtering, deterministic stratified
  * sampling, and bigram language-model counts.
  *
  * Everything here is either a pure per-row projection (clean, filter,
  * sample — zero shuffle at any scale) or a single map-side-combined hash
  * aggregate (bigram counts). All randomness is md5-derived so results are
  * reproducible across runs, engines, and partitionings.
  */
object Prep {

  private def shuffleWidth(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt

  /** md5-derived bucket in [0,100): the shared deterministic-sampling
    * primitive (same formula as Corpus.splitAssign so strata and splits
    * compose predictably).
    */
  private def hashBucket(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long") % 100

  /** Text normalisation scrub: lowercase, strip every non-[a-z0-9 ] rune to
    * a space, collapse space runs, trim — the canonical form fed to exact
    * dedup and tokenisation. Emits before/after lengths so the filter rate
    * is observable. Per-row regex projection, embarrassingly parallel.
    */
  def textClean(docs: DataFrame): DataFrame = {
    val cleaned = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    docs.select(
      col("doc_id"),
      cleaned.as("clean_text"),
      length(col("text")).as("n_raw"),
      length(cleaned).as("n_clean"))
  }

  def textClean(s: SparkSession, dir: String): DataFrame =
    textClean(Tables.documents(s, dir))

  /** Rule-based quality filter with audit trail: evaluates five document
    * quality rules and emits keep/drop plus a comma-joined reason list —
    * the form a curation pipeline needs to report WHY mass was dropped.
    * All five rules and the verdict compute in one per-row projection.
    */
  def qualityFilter(docs: DataFrame): DataFrame = {
    val ws = Text.words(col("text"))
    val nWords = size(ws)
    val meanLen = length(regexp_replace(col("text"), " ", "")).cast("double") / nWords
    val punct = regexp_count(col("text"), lit("[^A-Za-z0-9 ]")).cast("double") /
      length(col("text"))
    val reasons = array_compact(array(
      when(col("n_chars") < 50, "too_short"),
      when(col("n_chars") > 5000, "too_long"),
      when(nWords < 10, "few_words"),
      when(meanLen > 12.0, "long_words"),
      when(punct > 0.10, "high_punct")))
    docs.select(
      col("doc_id"),
      (size(reasons) === 0).as("keep"),
      concat_ws(",", reasons).as("reasons"))
  }

  def qualityFilter(s: SparkSession, dir: String): DataFrame =
    qualityFilter(Tables.documents(s, dir))

  /** Deterministic stratified sampling: per-language keep rates (10% for
    * the majority language, 50% for the rest — the classic rebalance of an
    * English-heavy corpus), membership decided by an md5 bucket of doc_id.
    * Hash-based, so the SAME documents are kept on every run, engine, and
    * partitioning, and subsets stay proportional. Pure per-row filter —
    * zero shuffle, and at 100 TB the filter pushes to the scan.
    */
  def stratifiedSample(docs: DataFrame): DataFrame = {
    val rate = when(col("lang") === "en", 10).otherwise(50)
    docs
      .filter(hashBucket(col("doc_id")) < rate)
      .select(col("doc_id"), col("lang"), col("n_chars"))
  }

  def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    stratifiedSample(Tables.documents(s, dir))

  /** Bigram language-model counts: adjacent word pairs with joint count
    * and conditional probability P(w2 | w1) = c(w1,w2) / c(w1,·).
    *
    * The bigram list is a per-row array projection (no self-join of a
    * token table — the classic mistake that shuffles the corpus twice);
    * one explode feeds one hash aggregate keyed by (w1,w2). The
    * denominator reuses the bigram aggregate via a window sum partitioned
    * by w1 — counts are already one row per distinct bigram (vocab², tiny
    * vs corpus), so the second shuffle moves vocab-sized data only.
    */
  def bigramLm(docs: DataFrame): DataFrame = {
    // materialize the split ONCE as a column before the higher-order
    // transform: a lambda body referencing the split expression directly
    // re-evaluates it per element (O(len²) per document)
    val w = col("w")
    // guard: sequence(1, 0) DESCENDS in Spark, so a 1-word doc must yield
    // an empty bigram array explicitly (explode then drops the row)
    val bigrams = when(size(w) >= 2,
      transform(
        sequence(lit(1), size(w) - 1),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1))))
      .otherwise(array().cast("array<string>"))
    val counts = docs
      .repartition(shuffleWidth(docs), col("doc_id"))
      .select(Text.words(col("text")).as("w"))
      .select(explode(bigrams).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
    val byW1 = org.apache.spark.sql.expressions.Window
      .partitionBy(substring_index(col("bigram"), " ", 1))
    counts.select(
      col("bigram"), col("n"),
      (col("n").cast("double") / sum(col("n")).over(byW1)).as("p_cond"))
  }

  def bigramLm(s: SparkSession, dir: String): DataFrame =
    bigramLm(Tables.documents(s, dir))
}
