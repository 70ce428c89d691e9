package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.sources.Tables

/** Corpus-level statistics and dataset-preparation operators — the steps a
  * training-data pipeline runs between raw ingestion and tokenisation:
  * vocabulary / heavy-hitter extraction, deterministic train/valid/test
  * splitting, per-stratum length quantiles, and sketch-based profiling.
  *
  * Scale notes are per-operator; the common theme is that everything is
  * either a pure projection (split assignment) or a single map-side-combined
  * hash aggregate (vocab, profile) — no all-pairs work, no driver collects.
  */
object Corpus {

  private def shuffleWidth(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt

  /** Top-`k` corpus vocabulary by term frequency (with document frequency):
    * the heavy-hitter / vocab-building pass of a tokenizer pipeline.
    *
    * One word-explosion (repartitioned first so the ~50x row multiplication
    * lands on every core, not the handful of input splits), one hash
    * aggregate keyed by word — high-cardinality key, so partitions stay
    * balanced and map-side partial aggregation collapses each partition to
    * its local vocabulary before anything moves. The top-k is
    * `TakeOrderedAndProject`: per-partition bounded heaps + a k-row driver
    * merge, never a global sort. Total order (n DESC, word ASC) makes the
    * cut deterministic.
    */
  def vocabTopK(docs: DataFrame, k: Int): DataFrame =
    docs
      .repartition(shuffleWidth(docs), col("doc_id"))
      .select(explode(Text.words(col("text"))).as("word"), col("doc_id"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"), count_distinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n").desc, col("word"))
      .limit(k)

  def vocabTopK(s: SparkSession, dir: String): DataFrame =
    vocabTopK(Tables.documents(s, dir), 100)

  /** Deterministic train/valid/test assignment: bucket 0-99 from a 16-bit
    * md5 prefix of the document id, split at 80/90. Hash-based (not
    * random) so the assignment is reproducible across runs, engines, and
    * repartitioning, and any subset of the data gets a proportional split.
    * Pure per-row projection — zero shuffle at any scale.
    */
  def splitAssign(docs: DataFrame): DataFrame = {
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast("long") % 100
    docs.select(col("doc_id"), bucket.as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid")
          .otherwise("test"))
  }

  def splitAssign(s: SparkSession, dir: String): DataFrame =
    splitAssign(Tables.documents(s, dir))

  /** Exact per-language length quantiles (p25/p50/p75/p95 of `n_chars`) via
    * rank arithmetic: value at row `ceil(p*n)` in (n_chars, doc_id) order —
    * the classic discrete percentile, expressed with one window sort per
    * stratum plus a conditional aggregate, identical in any SQL engine.
    *
    * The per-stratum sort is the honest cost of EXACT quantiles; lang is
    * low-cardinality so at 100 TB this operator is the one place we would
    * swap in a sketch (see `sketchProfile`) — kept exact here because it is
    * the oracle-verified ground truth the sketch is judged against.
    */
  def lengthQuantiles(docs: DataFrame): DataFrame = {
    val byLang = Window.partitionBy(col("lang"))
    val ranked = docs
      .select(col("lang"), col("n_chars"), col("doc_id"))
      .withColumn("rn", row_number().over(byLang.orderBy(col("n_chars"), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(byLang))
    def at(p: Double) = max(when(col("rn") === ceil(col("n") * p), col("n_chars")))
    ranked.groupBy(col("lang")).agg(
      at(0.25).as("p25"), at(0.50).as("p50"),
      at(0.75).as("p75"), at(0.95).as("p95"),
      max(col("n")).as("n_docs"))
  }

  def lengthQuantiles(s: SparkSession, dir: String): DataFrame =
    lengthQuantiles(Tables.documents(s, dir))

  /** Sketch-based corpus profile per source: approximate distinct counts
    * (HyperLogLog++) and approximate length quantiles (KLL-style) — the
    * 100 TB-scale stand-in for `lengthQuantiles`/`count_distinct`, where a
    * full sort or exact distinct is not worth its shuffle. Fixed-size
    * mergeable sketches: map-side partials are O(1) per partition
    * regardless of data volume. Approximate by design, so registered as a
    * rows-only check (no DuckDB oracle can reproduce Spark's sketches).
    *
    * The quantile sketch is emitted as SCALAR columns (one aggregate per
    * percentile, same sketch cost — the sketch is built once per group and
    * queried twice) so downstream consumers and the verification harness
    * see plain numeric columns, not an array cell.
    */
  def sketchProfile(docs: DataFrame): DataFrame =
    docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      approx_count_distinct(col("text"), 0.01).as("ndv_text"),
      approx_count_distinct(col("lang")).as("ndv_lang"),
      percentile_approx(col("n_chars"), lit(0.5), lit(10000)).as("len_p50"),
      percentile_approx(col("n_chars"), lit(0.95), lit(10000)).as("len_p95"))

  def sketchProfile(s: SparkSession, dir: String): DataFrame =
    sketchProfile(Tables.documents(s, dir))
}
