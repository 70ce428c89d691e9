package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Caches
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


  /** Shared deterministic-sampling bucket (same formula as splitAssign so
    * strata and splits compose predictably).
    */
  private def hashBucket(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Corpus.hashBucket(id)

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

  /** End-to-end curation funnel — the library's operators composed the
    * way a real training-data pipeline runs them, with per-stage
    * survivor counts: all → quality filter (q49's five rules) → exact
    * dedup keepers (q20's min-id rule) → stratified sample (q50's
    * per-language rates) → train/valid/test split. The split hash is
    * SALTED ('split|' prefix) where the standalone q40 is not: the
    * sample already consumed the unsalted doc_id bucket, and reusing it
    * would correlate the two decisions (every sampled doc lands in
    * train — a real and silent pipeline bug; independent salted hashes
    * per decision is the fix this operator demonstrates). Each stage is
    * a filter/semi-join over the previous stage's cached relation; the
    * funnel output is five tiny aggregates unioned.
    */
  def curationFunnel(docs: DataFrame): DataFrame = {
    def stage(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_docs")).select(lit(name).as("stage"), col("n_docs"))
    val d = Caches.track(docs)
    val quality = Caches.track(d.join(
      qualityFilter(d).filter(col("keep")).select(col("doc_id")), Seq("doc_id")))
    val keepers = quality.groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    val deduped = Caches.track(quality.join(keepers, Seq("doc_id"), "left_semi"))
    val sampled = Caches.track(stratifiedSample(deduped))
    val splits = sampled.select(col("doc_id"),
      (conv(substring(md5(concat(lit("split|"), col("doc_id").cast("string"))), 1, 4),
        16, 10).cast("long") % 100).as("b"))
      .withColumn("split",
        when(col("b") < 80, "train").when(col("b") < 90, "valid").otherwise("test"))
    stage("1_all", d)
      .unionByName(stage("2_quality", quality))
      .unionByName(stage("3_dedup", deduped))
      .unionByName(stage("4_sampled", sampled))
      .unionByName(splits.groupBy(concat(lit("5_"), col("split")).as("stage"))
        .agg(count(lit(1)).as("n_docs")))
  }

  def curationFunnel(s: SparkSession, dir: String): DataFrame =
    curationFunnel(Tables.documents(s, dir))

  /** Quality-threshold sweep (q216): bin every document by a quality
    * proxy (stopword ratio — the C4/Gopher-family naturalness signal,
    * an exact integer ratio) and report, per bin from best down, how
    * many documents and tokens survive if the filter cut there. This is
    * the curve a curation pipeline reads to place its quality cutoff
    * against a token budget — the ablation-sweep table, computed in one
    * pass instead of one pipeline run per candidate threshold.
    *
    * Scale: one corpus pass into a map-side-combined ≤ nBins+1-row
    * aggregate; the cumulative window runs over those bins only (the
    * bucketedPrefix bucket-total discipline — bounded, not corpus-wide).
    * Determinism: score = n_stopwords / n_words (exact int ratio), bin =
    * floor(score·nBins) clamped — the same correctly-rounded double ops
    * in both engines.
    */
  def filterSweep(docs: DataFrame, nBins: Int = 20): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val ws = Text.words(col("text"))
    val score = size(filter(ws, w => w.isin(TextAnalysis.stopwords: _*)))
      .cast("double") / size(ws)
    val binned = docs.select(size(ws).as("n_words"), score.as("score"))
      .select(col("n_words"),
        least(floor(col("score") * nBins).cast("long"), lit(nBins - 1L)).as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_tokens"))
    val cum = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned.select(col("bin"),
      (col("bin").cast("double") / nBins).as("score_lo"),
      col("n_docs"), col("n_tokens"),
      sum(col("n_docs")).over(cum).as("cum_docs"),
      sum(col("n_tokens")).over(cum).as("cum_tokens"))
  }

  def filterSweep(s: SparkSession, dir: String): DataFrame =
    filterSweep(Tables.documents(s, dir))

  /** Blocklist / safety-term screen (q269): per document, how many
    * blocklist hits (word terms counted per occurrence, two-word phrase
    * terms counted per bigram occurrence), how many DISTINCT terms
    * matched, and the flag — the unsafe-content gate every curation
    * pipeline runs before admission. Matching is exact-token (not
    * substring), so "class" never trips a "ass" entry — the classic
    * Scunthorpe failure of regex screens.
    *
    * Scale: entirely ROW-LOCAL — the blocklist rides into the plan as
    * two array literals (a real list is thousands of terms — still a
    * broadcast-sized constant) and matching is `filter`/`array_intersect`
    * HOFs over the per-row words/bigrams arrays. Zero joins, zero
    * shuffles, zero state: the q53/q264 per-row family, and the same
    * plan pin (no Exchange anywhere).
    */
  private[graft] val BlockWordTerms = Seq("slow", "merge", "spill")
  private[graft] val BlockPhraseTerms = Seq("hash value", "table scan")

  def blocklistScreen(docs: DataFrame,
      wordTerms: Seq[String] = BlockWordTerms,
      phraseTerms: Seq[String] = BlockPhraseTerms): DataFrame = {
    val wl = array(wordTerms.map(lit): _*)
    val pl = array(phraseTerms.map(lit): _*)
    docs
      .select(col("doc_id"), col("source"), Text.words(col("text")).as("w"))
      .withColumn("bg", Text.bigrams(col("w")))
      .select(col("doc_id"), col("source"),
        (size(filter(col("w"), w => array_contains(wl, w))) +
          size(filter(col("bg"), g => array_contains(pl, g))))
          .cast("long").as("n_hits"),
        (size(array_intersect(col("w"), wl)) +
          size(array_intersect(col("bg"), pl))).cast("long")
          .as("n_terms"))
      .withColumn("flagged", col("n_hits") > 0)
  }

  def blocklistScreen(s: SparkSession, dir: String): DataFrame =
    blocklistScreen(Tables.documents(s, dir))

  /** The q272 admission projection, shared VERBATIM with the streaming
    * admission gate (`streaming/StreamingOps.admissionMonitor`) so the
    * ingest verdict is bit-identical to the batch audit by construction.
    * Four row-local rules, each a reason tag: `too_short` (< 5 words),
    * `blocklist` (any q269 term/phrase hit), `repetition` (more than
    * half the bigram instances are repeats — the HOF form of the Gopher
    * dup-mass rule), `pii` (any q54 email/phone match). `reasons` is the
    * sorted comma-joined tag list; `admitted` = no reasons.
    */
  private[graft] def admissionScreen(df: DataFrame): DataFrame = {
    val wl = array(BlockWordTerms.map(lit): _*)
    val pl = array(BlockPhraseTerms.map(lit): _*)
    df.withColumn("w", Text.words(col("text")))
      .withColumn("bg", Text.bigrams(col("w")))
      .withColumn("reasons", concat_ws(",", sort_array(filter(array(
        when(size(col("w")) < 5, lit("too_short")),
        when(size(filter(col("w"), x => array_contains(wl, x))) +
          size(filter(col("bg"), g => array_contains(pl, g))) > 0,
          lit("blocklist")),
        when(size(col("bg")) > 0 &&
          (size(col("bg")) - size(array_distinct(col("bg")))) * 2 >
            size(col("bg")), lit("repetition")),
        when(regexp_count(col("text"), lit(EmailRe)) +
          regexp_count(col("text"), lit(PhoneRe)) > 0, lit("pii"))
      ), x => x.isNotNull))))
      .withColumn("admitted", col("reasons") === lit(""))
  }

  /** Batch admission audit (q272): the composed corpus-admission gate —
    * every document with its reject reasons and verdict. This is the
    * operator a curation pipeline runs FIRST (cheap row-local rules
    * before any shuffle-bearing dedup); the streaming twin applies the
    * identical projection at ingest. Zero shuffles, the q53-family plan.
    */
  def admissionAudit(docs: DataFrame): DataFrame =
    admissionScreen(docs)
      .select(col("doc_id"), col("source"), col("reasons"), col("admitted"))

  def admissionAudit(s: SparkSession, dir: String): DataFrame =
    admissionAudit(Tables.documents(s, dir))

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
    val counts = docs
      .repartition(shuffleWidth(docs), col("doc_id"))
      .select(Text.words(col("text")).as("w"))
      .select(explode(Text.bigrams(col("w"))).as("bigram"))
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

  /** Repetition signals (the Gopher-style "duplicate mass" quality
    * features): fraction of word occurrences that are repeats of an
    * earlier word, and the same over adjacent-word bigrams. High values
    * flag boilerplate / keyword-stuffed / degenerate documents before
    * they pollute a training mix. Pure per-row array arithmetic — zero
    * shuffle at any scale.
    */
  def repetitionRatios(docs: DataFrame): DataFrame = {
    docs
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .select(col("doc_id"), col("w"), Text.bigrams(col("w")).as("bg"))
      .select(
        col("doc_id"),
        size(col("w")).as("n_words"),
        ((size(col("w")) - size(array_distinct(col("w")))).cast("double") /
          size(col("w"))).as("dup_word_ratio"),
        when(size(col("bg")) > 0,
          (size(col("bg")) - size(array_distinct(col("bg")))).cast("double") /
            size(col("bg")))
          .otherwise(0.0).as("dup_bigram_ratio"))
  }

  def repetitionRatios(s: SparkSession, dir: String): DataFrame =
    repetitionRatios(Tables.documents(s, dir))

  private val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private val PhoneRe = """\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}"""
  private val NumberRe = """\b[0-9]+\b"""

  /** PII scrub: redact emails, phone-shaped sequences, and standalone
    * digit runs to typed placeholder tokens, with per-category counts for
    * the audit trail. Redaction order (email → phone → number) is fixed so
    * later patterns never match inside an earlier placeholder; the number
    * count is likewise taken after email/phone redaction so digits inside
    * an already-redacted match are not double-counted. Per-row regex
    * projection — embarrassingly parallel.
    */
  def piiScrub(docs: DataFrame): DataFrame = {
    val scrubbed =
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"),
        NumberRe, "<NUM>")
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).as("n_emails"),
      regexp_count(col("text"), lit(PhoneRe)).as("n_phones"),
      regexp_count(
        regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"),
        lit(NumberRe)).as("n_numbers"),
      md5(scrubbed).as("scrubbed_fp"))
  }

  def piiScrub(s: SparkSession, dir: String): DataFrame =
    piiScrub(Tables.documents(s, dir))

  /** Overlapping fixed-size chunking: split each document into
    * `chunkSize`-char windows starting every `chunkSize - overlap` chars —
    * the context-window preparation step before tokenisation/packing.
    * One row per chunk keyed by (doc_id, chunk_off); the chunk itself is
    * carried as a length + fingerprint (a real pipeline would carry the
    * text — same plan shape, wider rows). Pure per-row explode of an
    * arithmetic sequence: no shuffle, no join, scales linearly.
    */
  def chunk(docs: DataFrame, chunkSize: Int = 200, overlap: Int = 50): DataFrame = {
    require(overlap < chunkSize, "overlap must be smaller than chunkSize")
    val stride = chunkSize - overlap
    docs
      .select(col("doc_id"),
        explode(sequence(
          lit(1), greatest(length(col("text")) - overlap, lit(1)), lit(stride)))
          .as("chunk_off"),
        col("text"))
      .select(
        col("doc_id"),
        col("chunk_off"),
        length(substring(col("text"), col("chunk_off"), lit(chunkSize))).as("chunk_len"),
        md5(substring(col("text"), col("chunk_off"), lit(chunkSize))).as("chunk_fp"))
  }

  def chunk(s: SparkSession, dir: String): DataFrame =
    chunk(Tables.documents(s, dir))

  /** Temperature-weighted source mixture sampling: rebalance an uneven
    * source mix by keeping each source at rate min(1, sqrt(p_min / p_s))
    * (temperature alpha = 0.5 relative to the smallest source) — the
    * data-mixing step that stops one giant crawl from drowning curated
    * sources in a training mix. The smallest source keeps everything;
    * a source 4x its share keeps half.
    *
    * The per-source share table is one tiny aggregate joined back
    * broadcast; membership is the shared deterministic hash bucket, so
    * the SAME documents are kept on every run/engine/partitioning, and
    * all arithmetic (division, sqrt) is exactly-rounded IEEE — identical
    * across engines.
    */
  def mixtureSample(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    val withMin = counts.crossJoin(
      broadcast(counts.agg(min(col("n_src")).as("n_min"))))
    val rates = withMin.select(col("source"),
      sqrt(col("n_min").cast("double") / col("n_src")).as("keep_rate"))
    docs
      .join(broadcast(rates), "source")
      .filter(hashBucket(col("doc_id")).cast("double") < col("keep_rate") * 100.0)
      .select(col("doc_id"), col("source"), col("keep_rate"))
  }

  def mixtureSample(s: SparkSession, dir: String): DataFrame =
    mixtureSample(Tables.documents(s, dir))

  /** Bigram-LM quality score: mean conditional probability of a document's
    * adjacent word pairs under the corpus bigram model (Prep.bigramLm) —
    * the cheap, fully deterministic stand-in for perplexity-based quality
    * filtering (no logs: a mean of exact-division probabilities is
    * bit-reproducible across engines, a mean of ln() values is not).
    * Boilerplate scores high, out-of-distribution noise scores low.
    *
    * Plan: the per-doc bigram explode joins the (vocab²-sized, already
    * aggregated) LM relation keyed by bigram — high-cardinality key. The
    * probability mean is computed over int64 FIXED-POINT values
    * (floor(p·1e15), exact in both engines — a double→decimal cast would
    * hit engine-specific rounding-mode ties), so it is independent of
    * aggregation order AND bit-identical to the oracle.
    */
  def lmScore(docs: DataFrame): DataFrame = {
    val docBigrams = docs
      .repartition(shuffleWidth(docs), col("doc_id"))
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .select(col("doc_id"), explode(Text.bigrams(col("w"))).as("bigram"))
    // shuffle_hash: the LM side is an aggregate over the whole corpus — a
    // broadcast build would run it single-threaded and could not broadcast
    // at real vocab sizes
    docBigrams.hint("shuffle_hash")
      .join(bigramLm(docs).hint("shuffle_hash"), "bigram")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        (sum(floor(col("p_cond") * 1e15).cast("long")).cast("double") /
          (count(lit(1)) * 1e15)).as("lm_score"))
  }

  def lmScore(s: SparkSession, dir: String): DataFrame =
    lmScore(Tables.documents(s, dir))

  /** Partitioned curated-corpus writer — the last mile of a training
    * pipeline (reference analog: the historical event writes to object
    * storage, reference: script/TributeStreamingJob.py:70-74, done at
    * table scale instead of per-row). Documents are stamped with their
    * deterministic split (Corpus.splitAssign semantics — a pure md5
    * projection, zero shuffle) and written as parquet PARTITIONED BY
    * split, so a downstream training job reads exactly one directory
    * (`split=train/`) and Spark prunes the rest at planning time (see
    * PlanShapeSpec's q68 partition-pruning test).
    *
    * Scale notes: `partitionBy` on a 3-value column means each write task
    * opens at most 3 files — no small-file explosion; within a split,
    * file count tracks input partitions, which the caller sizes via
    * `spark.sql.files.maxPartitionBytes`. The split column itself costs
    * nothing to store (it lives in the directory name).
    */
  def writeCurated(docs: DataFrame, outDir: String): Unit =
    docs
      .withColumn("split",
        when(hashBucket(col("doc_id")) < 80, "train")
          .when(hashBucket(col("doc_id")) < 90, "valid")
          .otherwise("test"))
      .write.mode("overwrite").partitionBy("split").parquet(outDir)

  /** Deterministic scratch location for the curated corpus of `dir`. */
  def curatedDir(dir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-curated/${new java.io.File(dir).getName}"

  /** Write-then-read round trip over the partitioned curated corpus: write
    * with `writeCurated`, read back ONLY the train split (pruned to one
    * partition directory at planning time), and aggregate per language —
    * doc count, total chars, and a 16-bit md5 text fingerprint sum that
    * catches any corruption of the text payload in the round trip. The
    * aggregate is oracle-checked against the source `documents` table, so
    * a green row proves the writer layout is lossless and the split
    * assignment matches the engine-portable md5-bucket formula.
    */
  /** The shared lossless-round-trip check: doc count, char total, and a
    * 16-bit md5 text fingerprint sum per language — any corruption of the
    * text payload in a write/read cycle changes the fingerprint. One
    * definition, used by every format round trip (q68 parquet, q85 ORC),
    * so "lossless" always means the same thing.
    */
  private def langFingerprint(docs: DataFrame): DataFrame =
    docs.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long"))
          .as("text_fp"))

  def curatedReadback(s: SparkSession, dir: String): DataFrame = {
    val out = curatedDir(dir)
    writeCurated(Tables.documents(s, dir), out)
    langFingerprint(s.read.parquet(out).filter(col("split") === "train"))
  }

  /** ORC write/read round trip: the second columnar format a warehouse
    * interop layer must speak (Hive-ecosystem tables are ORC as often as
    * parquet). Documents are written as zlib ORC and read back through
    * Spark's native vectorized ORC reader; the per-language aggregate
    * carries the same 16-bit md5 text fingerprint as q68, so a hash-equal
    * oracle row (computed straight from the parquet source) proves the
    * text payload survived the format conversion byte-for-byte. The
    * scratch path is keyed by (application, data dir) like the warehouse
    * tables, so concurrent sessions never clobber each other's files.
    */
  def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val app = s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
    val out = s"${sys.props("java.io.tmpdir")}/graft-orc/" +
      s"${new java.io.File(dir).getName}_$app/documents_orc"
    Tables.documents(s, dir)
      .write.mode("overwrite").option("compression", "zlib").orc(out)
    langFingerprint(s.read.orc(out))
  }

  /** JSON-lines write/read round trip — the interchange format every
    * ingestion boundary speaks (crawl dumps, API exports, labeling-tool
    * output). Documents are written as gzip JSON lines and read back
    * through Spark's native JSON reader with an EXPLICIT schema — no
    * inference pass (which would cost a second full scan at 100 TB) and
    * no type drift. The readback aggregates with the same md5 text
    * fingerprint as q68/q85, so a hash-equal oracle row computed from
    * the parquet source proves the text payload — unicode, quotes,
    * newlines — survived JSON escaping byte-for-byte.
    */
  def jsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val app = s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
    val out = s"${sys.props("java.io.tmpdir")}/graft-jsonl/" +
      s"${new java.io.File(dir).getName}_$app/documents_jsonl"
    val src = Tables.documents(s, dir)
    src.write.mode("overwrite").option("compression", "gzip").json(out)
    langFingerprint(s.read.schema(src.schema).json(out))
  }

  /** Token-budget sequence packing: assign each document to a training
    * sequence so consecutive docs fill a fixed token budget — the step
    * that turns a curated corpus into fixed-length LM training rows.
    *
    * Packing is inherently sequential (each bin depends on everything
    * before it), so a single global order would serialize the corpus
    * through one reducer. Instead docs are sharded by an md5 bucket of
    * doc_id and packed WITHIN each shard: every shard is an independent
    * greedy run over its docs in doc_id order, so per-reducer work is
    * corpus/shards and the shard count is the scale knob (32 here; ~10⁵
    * at 100 TB). A doc whose tokens straddle a budget boundary belongs to
    * the sequence its FIRST token lands in (`floor(cum_before / budget)`)
    * — the standard concat-then-slice packing, where sequence boundaries
    * cut documents rather than padding them.
    *
    * Determinism: shard and order are md5/id-derived, so the same doc
    * lands in the same sequence on every run, engine, and partitioning.
    * One shuffle (the per-shard window sort); everything else is
    * projection.
    */
  def packSequences(docs: DataFrame, budget: Int = 2048, shards: Int = 32): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
    docs
      .select(
        col("doc_id"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % shards).cast("int").as("shard"),
        size(Text.words(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .select(
        col("doc_id"), col("shard"), col("n_tokens"),
        floor((col("cum_tokens") - col("n_tokens")) / budget).cast("int").as("seq_id"))
  }

  def packSequences(s: SparkSession, dir: String): DataFrame =
    packSequences(Tables.documents(s, dir))

  /** Context-length planning sweep (q263): [[packSequences]]' greedy
    * token-stream packing evaluated at four candidate budgets in one
    * pass — per budget, how many sequences the corpus fills, how many
    * documents straddle a sequence boundary (and so need truncation or a
    * cross-document attention mask), and the utilization of the packed
    * stream. A doc straddles iff its first and last token land in
    * different sequences: `(cum-n) div B != (cum-1) div B` under the
    * same shard-local cumulative sum q73 packs with. Ratios are exact
    * integer micro-units so the sweep is engine-invariant.
    *
    * Scale: the shard-partitioned cumulative window is computed ONCE
    * (per-reducer work = corpus/shards, q73's own profile); the sweep is
    * a 4-way literal-array explode plus two bounded aggregates (4 rows
    * and |shards| rows) — no extra corpus passes or shuffles per budget,
    * which is the point vs re-running q73 once per candidate.
    */
  def packSweep(docs: DataFrame, budgets: Seq[Int] = Seq(512, 1024, 2048, 4096),
      shards: Int = 32): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
    val base = Caches.track(docs
      .select(
        col("doc_id"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % shards).cast("int").as("shard"),
        size(Text.words(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w)))
    val bArr = array(budgets.map(b => lit(b.toLong)): _*)
    val perDoc = base.select(col("*"), explode(bArr).as("budget"))
      .groupBy(col("budget"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("n_tokens") >= 1 &&
            expr("(cum - n_tokens) div budget") =!= expr("(cum - 1) div budget"),
          1L).otherwise(0L)).as("n_straddled"))
    // sequences per budget: each shard contributes ceil(shard_tokens / B)
    val seqs = base.groupBy(col("shard")).agg(max(col("cum")).as("st"))
      .select(explode(bArr).as("budget"), col("st"))
      .groupBy(col("budget"))
      .agg(sum(when(col("st") >= 1, expr("(st - 1) div budget") + lit(1L))
        .otherwise(0L)).as("n_seqs"))
    perDoc.join(broadcast(seqs), Seq("budget"))
      .select(col("budget"), col("n_docs"), col("total_tokens"),
        col("n_straddled"), col("n_seqs"),
        expr("(1000000L * n_straddled) div n_docs").as("straddle_micro"),
        expr("(1000000L * total_tokens) div (n_seqs * budget)").as("util_micro"))
  }

  def packSweep(s: SparkSession, dir: String): DataFrame =
    packSweep(Tables.documents(s, dir))

  /** Dedup-adjusted corpus accounting (q261): the token mass a training
    * run actually sees per source once exact duplicates are collapsed,
    * with each n-copy text's tokens attributed 1/n to every copy — the
    * correction mixture planning (q194) needs so a source whose bulk is
    * re-crawled boilerplate doesn't buy sampling weight with tokens the
    * dedup stage will delete. Attribution is exact integer micro-units
    * (`1e6·n_tok·cnt_s div n_total` per (text, source) cell), so the
    * accounting is engine- and partitioning-invariant.
    *
    * Scale: documents reduce to (md5(text), source) cells with a
    * partial-aggregated groupBy BEFORE anything global — full text never
    * shuffles, only 16-byte digests; global copy counts attach via one
    * digest-partitioned window (high-cardinality key, no hot reducer).
    */
  def effectiveTokens(docs: DataFrame): DataFrame = {
    val per = docs
      .select(col("source"), md5(col("text")).as("h"),
        size(Text.words(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("h"), col("source"), col("n_tok"))
      .agg(count(lit(1)).as("cnt_s"))
    per
      .withColumn("n_total",
        sum(col("cnt_s")).over(Window.partitionBy(col("h"))))
      .groupBy(col("source"))
      .agg(sum(col("cnt_s")).as("raw_docs"),
        sum(col("n_tok") * col("cnt_s")).as("raw_tokens"),
        count(lit(1)).as("distinct_texts"),
        sum(expr("(1000000L * n_tok * cnt_s) div n_total"))
          .as("eff_tokens_micro"))
  }

  def effectiveTokens(s: SparkSession, dir: String): DataFrame =
    effectiveTokens(Tables.documents(s, dir))

  /** Dup-cluster-atomic split assignment (q264): the train/val/test
    * lottery keyed on the doc's exact-dup CLUSTER — `md5(text)` — rather
    * than the doc id, so every copy of a text lands in the SAME split
    * and exact duplicates can never straddle the train/eval boundary.
    * This is the assignment that prevents by construction the leakage
    * q234 audits after the fact (near-dup leakage is handled upstream by
    * REMOVAL — q195 canonicalization / q259 scrub — so exact-hash
    * atomicity is the right granularity for the assigner itself). Same
    * 80/10/10 md5-lottery shape as q40, salted `csplit|` over the
    * digest.
    *
    * Scale: entirely ROW-LOCAL — two md5 projections, zero shuffles,
    * zero joins; the cluster key is derivable per row, which is exactly
    * why the exact-dup granularity scales where a connected-component
    * key (a full q56 run) would cost a graph computation per assignment.
    */
  /** The q264 assignment expressions, shared verbatim with the streaming
    * split router (`streaming/StreamingOps.splitRouter`) so the ingest
    * path is bit-identical to the batch assigner by construction. */
  private[graft] def clusterKeyCol: org.apache.spark.sql.Column =
    md5(col("text"))
  private[graft] def clusterSplitCol: org.apache.spark.sql.Column = {
    val bucket = conv(substring(md5(concat(lit("csplit|"), md5(col("text")))),
      1, 4), 16, 10).cast("long") % 100
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
  }

  def clusterSplit(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), clusterKeyCol.as("cluster_key"),
      clusterSplitCol.as("split"))

  def clusterSplit(s: SparkSession, dir: String): DataFrame =
    clusterSplit(Tables.documents(s, dir))

  /** Token-balanced training-shard manifest (q266): assign every
    * document to one of `shards` shards so per-shard token mass comes
    * out near-equal — the step that decides which file each doc lands
    * in before an epoch, where imbalance = straggling data-loader
    * workers. Docs are ranked globally by token count descending
    * (doc_id tiebreak) and striped BOUSTROPHEDON (snake) across shards:
    * rank cycle 0 deals shards 0..W−1, cycle 1 deals W−1..0, so the
    * shard that just received the largest doc of a cycle receives the
    * smallest of the next — the classic sorted-stripe bound (any two
    * shard sums differ by at most one cycle's spread, independent of
    * corpus size).
    *
    * Scale: the global rank is the ONE order-dependent step, and it
    * rides `Advanced.bucketedPrefix` (two-pass distributed prefix — no
    * single-partition window ever touches a fact-scaled relation);
    * everything after the rank is a row-local modulo. Deterministic:
    * ties broken by doc_id, no randomness.
    */
  def shardManifest(docs: DataFrame, shards: Int = 8,
      buckets: Int = 32): DataFrame = {
    val toks = docs.select(col("doc_id"),
      size(Text.words(col("text"))).cast("long").as("n_tok"))
    Advanced.bucketedPrefix(toks,
      Seq(col("n_tok").desc, col("doc_id")), buckets)(
      spec => count(lit(1)).over(
        spec.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
      count(lit(1)),
      spec => coalesce(sum(col("tot")).over(spec), lit(0L)),
      (run, off) => run + off)
      .select(col("doc_id"), col("n_tok"), col("prefix").as("rank"),
        // Column./ is double division — the cycle index needs `div`
        when(expr(s"((prefix - 1) div $shards) % 2") === 0,
          (col("prefix") - 1) % shards)
          .otherwise(lit(shards - 1) - (col("prefix") - 1) % shards)
          .as("shard"))
  }

  def shardManifest(s: SparkSession, dir: String): DataFrame =
    shardManifest(Tables.documents(s, dir))

  /** Per-domain document cap: keep at most `k` documents per source, the
    * guard every crawl-derived corpus applies so no single domain
    * dominates the mixture. Selection is an md5 lottery over doc_id —
    * deterministic (same winners every run/engine/partitioning) and
    * unbiased by position in the file.
    *
    * Scale: per-group top-k via the map-side-bounded `BoundedTopK`
    * aggregate, NOT a `row_number` window — a window would shuffle the
    * ENTIRE corpus into |sources| partitions before discarding anything
    * (and a mega-domain becomes one straggling reducer); the aggregate
    * ships at most k rows per (map task × source), so exchange volume is
    * O(partitions·k·|sources|) no matter how large the corpus or how
    * skewed the domain.
    */
  def domainCap(docs: DataFrame, k: Int = 50): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    // 48-bit md5 prefix: exactly representable in the aggregate's double
    // score, so negation gives "smallest md5 first" under its DESC order
    val lottery = conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
      .cast("long").cast("double")
    val topk = udaf(new graft.functions.BoundedTopK(k),
      ExpressionEncoder[graft.functions.Scored]())
    docs
      .select(col("source"), col("doc_id"), lottery.as("lot"))
      .groupBy(col("source"))
      .agg(topk(col("doc_id"), -col("lot")).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("source"), col("t.neighborId").as("doc_id"),
        (col("pos") + 1).cast("long").as("rk"))
  }

  def domainCap(s: SparkSession, dir: String): DataFrame =
    domainCap(Tables.documents(s, dir))

  /** Temperature-scaled source mixture: the sampling weights a training
    * run uses to rebalance a source-skewed corpus (upweight small
    * sources, damp the mega-crawl), here with temperature alpha = 1/4 —
    * w_s ∝ n_tokens(s)^0.25 — and an EXACT largest-remainder allocation
    * of a fixed token budget so the per-source allocations sum to the
    * budget to the token (the same cent-reconciliation discipline as
    * q120, applied to tokens).
    *
    * Cross-engine exactness is why alpha is 1/4 and the weights are
    * integerized: x^0.25 = sqrt(sqrt(x)) uses only IEEE-correctly-rounded
    * operations (pow(x, 0.25) is NOT correctly rounded and may differ in
    * the last ulp between libm implementations), and
    * floor(·×10⁶) pins the weight to an integer, after which the entire
    * allocation — products, integral div/mod, the residual handout — is
    * int64 arithmetic every engine computes identically. The final
    * `epochs` ratio is a single double division (correctly rounded, so
    * also bit-identical).
    *
    * Scale: the only corpus-sized work is one map-side-combined
    * aggregate; everything after runs on the per-source table (tens of
    * rows — the unpartitioned rank window reads THAT, not the corpus),
    * with the two scalar totals broadcast, never collected.
    */
  def mixtureWeights(docs: DataFrame, budgetTokens: Long = 1000000L): DataFrame =
    temperatureAlloc(
      docs.select(col("source"),
          size(Text.words(col("text"))).cast("long").as("n_tok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens")),
      budgetTokens)

  /** The q194 allocation arithmetic on an already-aggregated
    * (source, n_docs, n_tokens) relation — shared by [[mixtureWeights]]
    * (raw corpus) and [[dedupMixture]] (post-dedup survivor mass).
    */
  private[operators] def temperatureAlloc(perSourceMass: DataFrame,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("source"))
    // budget × w_int must stay inside int64: non-ANSI Spark would WRAP a
    // hot multiply silently (garbage allocations, broken reconciliation)
    // where the DuckDB oracle errors — fail loudly at the same boundary
    val wCap = Long.MaxValue / budgetTokens
    val perSource = Caches.track(perSourceMass
      .withColumn("w_int",
        floor(sqrt(sqrt(col("n_tokens").cast("double"))) * 1e6).cast("long"))
      .withColumn("w_int",
        when(col("w_int") <= wCap, col("w_int")).otherwise(raise_error(concat(
          lit(s"mixtureWeights: budget=$budgetTokens times w_int overflows int64 for source "),
          col("source"))))))
    val withBase = Caches.track(perSource
      .crossJoin(broadcast(perSource.agg(sum(col("w_int")).as("w_tot"))))
      .withColumn("base", expr(s"($budgetTokens * w_int) div w_tot"))
      .withColumn("rem", expr(s"($budgetTokens * w_int) % w_tot")))
    withBase
      .crossJoin(broadcast(withBase.agg(sum(col("base")).as("base_tot"))))
      .withColumn("rk", row_number().over(w))
      .withColumn("alloc_tokens",
        col("base") + when(col("rk") <= lit(budgetTokens) - col("base_tot"), 1L)
          .otherwise(0L))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("w_int"),
        col("alloc_tokens"),
        (col("alloc_tokens").cast("double") / col("n_tokens")).as("epochs"))
  }

  /** Data-constrained-scaling epoch plan (q267): the audit layered on
    * the q194 temperature mixture that answers "which sources does this
    * allocation over-repeat, and what is the budget really worth?" —
    * the question raised by the data-constrained scaling result
    * (Muennighoff et al. 2023: repeating data beyond ~4 epochs has
    * near-zero marginal value). Per source, from q194's exact
    * `alloc_tokens`:
    *
    *   - `epochs_micro`   floor(1e6·alloc/T) — repeats on the 1e6 grid
    *   - `capped`         epochs > R* (default 4): the allocation asks
    *                      for repeats past the useful regime
    *   - `wasted_tokens`  max(alloc − R*·T, 0) — budget mass spent past
    *                      the cap, the re-allocation opportunity
    *   - `effective_tokens` R*·T·E/(E + R*) — a RATIONAL saturation
    *     surrogate for the exponential-decay effective-data form (exact
    *     in integer arithmetic where e^{−E/R*} is not): slope 1 at E→0
    *     (fresh tokens count fully), saturating at R*·T as E→∞. At E=R*
    *     it reads R*T/2 vs the true form's ≈0.63·R*T — the ranking and
    *     cap diagnostics are unchanged, and every value is bit-exact
    *     across engines.
    *
    * Scale: inherits q194's plan (one corpus aggregate, |sources|-row
    * arithmetic); every added column is row-local DECIMAL(38,0) math on
    * the bounded per-source relation.
    */
  def epochPlan(docs: DataFrame, budgetTokens: Long = 1000000L,
      rStar: Int = 4): DataFrame = {
    val rMicro = rStar.toLong * 1000000L
    mixtureWeights(docs, budgetTokens)
      .withColumn("epochs_micro",
        expr("(cast(1000000 as decimal(38,0)) * alloc_tokens) div n_tokens"))
      .select(col("source"), col("n_tokens"), col("alloc_tokens"),
        col("epochs_micro"),
        (col("epochs_micro") > rMicro).as("capped"),
        greatest(col("alloc_tokens") - lit(rStar.toLong) * col("n_tokens"),
          lit(0L)).as("wasted_tokens"),
        expr(s"(cast($rStar as decimal(38,0)) * n_tokens * epochs_micro)" +
          s" div (cast(epochs_micro as decimal(38,0)) + $rMicro)")
          .as("effective_tokens"))
  }

  def epochPlan(s: SparkSession, dir: String): DataFrame =
    epochPlan(Tables.documents(s, dir))

  def mixtureWeights(s: SparkSession, dir: String): DataFrame =
    mixtureWeights(Tables.documents(s, dir))

  /** DSIR-style importance weights: score every document by how much its
    * hashed-bigram profile looks like a target slice (here `lang = 'en'`)
    * relative to the raw corpus — the data-selection signal behind
    * importance resampling (Xie et al., "Data Selection for Language
    * Models via Importance Resampling"). Bigrams hash into `nBuckets`
    * md5-derived buckets; each bucket carries an add-1-smoothed
    * count ratio, and a document's weight is the count-weighted MEAN of
    * its buckets' ratios, times the global (R+B)/(T+B) normaliser that
    * turns count ratios into probability ratios.
    *
    * The canonical DSIR score is the SUM OF LOGS of those ratios; logs are
    * traded for the arithmetic mean of exact rationals here for the same
    * reason `lmScore` does it — ln() is not correctly rounded, so a
    * cross-engine sum of ln() values is not bit-reproducible, while
    * `lr = ((t+1)·10⁶) div (r+1)` is pure int64 arithmetic both engines
    * compute identically (target ⊆ raw ⇒ r ≥ t ⇒ lr ≤ 10⁶, so the per-doc
    * Σ c·lr stays far inside both int64 and the double-exact 2⁵³ range).
    * The ranking is monotone in the same direction: target-like documents
    * score high, out-of-slice documents low.
    *
    * Scale: one corpus pass builds the per-(doc, bucket) counts (grouped
    * on a doc_id-prefixed key, so the explode's repartition already
    * satisfies that aggregate — the corpus-sized bigram relation shuffles
    * exactly once; the later per-doc agg re-shuffles only the compact
    * cached (doc, bucket) table, ≤ nBuckets rows per doc); the bucket
    * ratio table
    * is `nBuckets` rows — a genuinely CONSTANT-size broadcast, independent
    * of corpus size (unlike a dup-population relation, this can never
    * outgrow the 8 GB ceiling) — and the two scalar totals ride the same
    * broadcast-scalar crossJoin as mixtureWeights. Per-doc scoring is then
    * a map-side-combined hash agg on doc_id. Nothing quadratic, nothing
    * corpus-sized ever broadcasts.
    */
  def dsirWeights(docs: DataFrame, targetLang: String = "en",
                  nBuckets: Int = 256): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val bucket = conv(substring(md5(col("bigram")), 1, 4), 16, 10)
      .cast("long") % nBuckets
    // per-(doc, bucket) bigram counts — the one corpus-sized aggregate,
    // persisted because raw counts, target counts, and doc scoring all
    // read it (it is ≤ min(nBuckets, doc length) rows per document)
    val db = Caches.track(docs
      .repartition(shuffleWidth(docs), col("doc_id"))
      .select(col("doc_id"), col("lang"),
        explode(Text.bigrams(Text.words(col("text")))).as("bigram"))
      .select(col("doc_id"), col("lang"), bucket.as("bucket"))
      .groupBy(col("doc_id"), col("lang"), col("bucket"))
      .agg(count(lit(1)).as("c")))
    val raw = db.groupBy(col("bucket")).agg(sum(col("c")).as("r"))
    val tgt = db.filter(col("lang") === targetLang)
      .groupBy(col("bucket")).agg(sum(col("c")).as("t"))
    // full bucket domain so empty buckets still carry their smoothed ratio
    val dom = docs.sparkSession.range(nBuckets.toLong)
      .select(col("id").as("bucket"))
    val lr = dom
      .join(raw, Seq("bucket"), "left")
      .join(tgt, Seq("bucket"), "left")
      .select(col("bucket"),
        expr("((coalesce(t, 0L) + 1L) * 1000000L) div (coalesce(r, 0L) + 1L)")
          .as("lr"))
    val totals = db.agg(
      sum(col("c")).as("big_r"),
      sum(when(col("lang") === targetLang, col("c")).otherwise(0L)).as("big_t"))
    db
      .join(broadcast(lr), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * col("lr")).as("s"), sum(col("c")).as("n_bigrams"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_bigrams"),
        (col("s").cast("double") / (col("n_bigrams") * 1e6)).as("mean_lr"),
        ((col("s").cast("double") / (col("n_bigrams") * 1e6)) *
          ((col("big_r") + nBuckets).cast("double") /
            (col("big_t") + nBuckets).cast("double"))).as("dsir_weight"))
  }

  def dsirWeights(s: SparkSession, dir: String): DataFrame =
    dsirWeights(Tables.documents(s, dir))

  /** Curriculum ordering (q224): a deterministic global training order —
    * quality band first (q216's stopword-ratio bins, best band 1st),
    * md5-shuffled WITHIN each band so no band replays in corpus order.
    * Emits (doc_id, bin, curriculum_rank) with a dense global rank; the
    * data loader reads rows in rank order and gets an easy-to-hard
    * curriculum whose within-band order is reproducible across runs,
    * engines, and partitionings.
    *
    * Scale: the score/bin/tiebreak are per-row projections; the global
    * ranking is the one hazard and rides `Advanced.bucketedPrefix`
    * (range-partitioned per-bucket ranks + broadcast bucket offsets) —
    * never a single-task global window. Output is corpus-sized by
    * design (it IS the training order).
    */
  def curriculumOrder(docs: DataFrame, nBins: Int = 10, buckets: Int = 32): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val ws = Text.words(col("text"))
    val score = size(filter(ws, w => w.isin(TextAnalysis.stopwords: _*)))
      .cast("double") / size(ws)
    val binned = docs.select(col("doc_id"),
        least(floor(score * nBins).cast("long"), lit(nBins - 1L)).as("bin"))
      .withColumn("tb", md5(concat(lit("cur|"), col("doc_id").cast("string"))))
      .withColumn("one", lit(1L))
    Advanced.bucketedPrefix(
      binned, Seq(col("bin").desc, col("tb"), col("doc_id")), buckets)(
      spec => sum(col("one")).over(
        spec.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
      sum(col("one")),
      spec => coalesce(sum(col("tot")).over(spec), lit(0L)),
      (run, off) => run + off)
      .select(col("doc_id"), col("bin"), col("prefix").as("curriculum_rank"))
  }

  def curriculumOrder(s: SparkSession, dir: String): DataFrame =
    curriculumOrder(Tables.documents(s, dir))

  /** Group-integral K-fold assignment (q232): every document of a source
    * lands in the same fold (GroupKFold — the split that stops
    * near-duplicate leakage between train and validation, since dups
    * concentrate within sources), and folds are size-balanced by
    * rank-striping: sources ordered by document count descending, fold =
    * (rank−1) mod k — the 1st, (k+1)th, (2k+1)th… largest sources land
    * on different folds (the q225 placement rule applied to groups).
    *
    * Scale: one map-side-combined per-source count; the ranking window
    * runs over |sources| rows (bounded, never the corpus). The
    * assignment is returned per SOURCE — joining it back to documents is
    * the caller's (broadcastable) concern.
    */
  def groupKFold(docs: DataFrame, k: Int = 5): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("n_docs").desc, col("source"))))
      .select(col("source"), col("n_docs"),
        ((col("rk") - 1) % k).cast("long").as("fold"))
  }

  def groupKFold(s: SparkSession, dir: String): DataFrame =
    groupKFold(Tables.documents(s, dir))

  /** Class-rebalance plan (q233): per-label resampling factors that
    * bring every label up to the majority count — the plan a training
    * loader applies as per-row repeat counts (factor_fp div 1e6 whole
    * repeats + md5-lottery on the remainder). Factors are exact integer
    * arithmetic (`target·1e6 div n`), so the plan is engine- and
    * partitioning-invariant.
    *
    * Scale: one map-side-combined count to |labels| rows; the majority
    * target rides in as a one-row broadcast.
    */
  def rebalancePlan(emb: DataFrame): DataFrame = {
    val counts = graft.Caches.track(
      emb.groupBy(col("label")).agg(count(lit(1)).as("n")))
    val target = counts.agg(max(col("n")).as("target"))
    counts.crossJoin(broadcast(target))
      .select(col("label"), col("n"), col("target"),
        expr("(target * 1000000L) div n").as("factor_fp"),
        ((col("target") - col("n")).cast("double") / col("n").cast("double"))
          .as("oversample_extra"))
  }

  def rebalancePlan(s: SparkSession, dir: String): DataFrame =
    rebalancePlan(Tables.embeddings(s, dir))

  /** Token-budget-constrained data selection (q285): the step every
    * budgeted training run ends with — rank the corpus by a quality
    * density and admit greedily until the token budget is spent. The
    * density here is the micro-grid type-token ratio (distinct words per
    * word — repetitive boilerplate ranks last); the order is total
    * (density desc, doc_id), so the admitted set is unique and
    * engine-independent. A doc is admitted iff the INCLUSIVE running
    * token mass up to it stays within the budget — the greedy prefix,
    * not a best-fit knapsack (documented, deterministic, and what
    * production selections actually run). Output: per-source admitted
    * doc/token mass and the per-source worst admitted density — the
    * mixture report a curation pass reads to see which sources the
    * budget squeezed out.
    *
    * Scale: the only order-dependent step is the global running sum and
    * it rides [[Advanced.bucketedPrefix]] (range-partition by the rank
    * key, in-bucket window, broadcast bucket offsets) — no
    * single-partition window ever sees the corpus. Everything else is a
    * row-local projection plus one |sources|-row aggregate.
    */
  def budgetSelect(docs: DataFrame, budgetTokens: Long = 20000L,
      buckets: Int = 32): DataFrame = {
    val ws = Text.words(col("text"))
    val scored = docs.select(col("doc_id"), col("source"),
      size(ws).cast("long").as("n_tok"),
      (lit(1000000L) * size(array_distinct(ws)).cast("long")).as("dm"))
      .withColumn("density", expr("dm div n_tok"))
      .drop("dm")
    Advanced.bucketedPrefix(scored,
      Seq(col("density").desc, col("doc_id")), buckets)(
      spec => sum(col("n_tok")).over(
        spec.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
      sum(col("n_tok")),
      spec => coalesce(sum(col("tot")).over(spec), lit(0L)),
      (run, off) => run + off)
      .filter(col("prefix") <= budgetTokens)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_admitted"),
        sum(col("n_tok")).as("tokens_admitted"),
        min(col("density")).as("worst_density_admitted"))
  }

  def budgetSelect(s: SparkSession, dir: String): DataFrame =
    budgetSelect(Tables.documents(s, dir))

  /** Dedup-adjusted mixture weights (q286): re-run the q194 temperature
    * mixture on the POST-DEDUP corpus — the step a pipeline must insert
    * between dedup and training, because near-dup mass is not spread
    * evenly across sources (a mirror-heavy crawl can hold 2× its fair
    * share of the raw token count and collapse after dedup). Survivors
    * are the docs outside every near-dup cluster (q56's connected
    * components) plus each cluster's canonical representative (q195's
    * election: max n_chars, ties to the smallest doc_id). Output per
    * source: raw vs kept doc/token mass, the exact largest-remainder
    * token allocation computed on KEPT mass, and the micro-grid dup
    * token share the dedup removed.
    *
    * Scale: the cluster relation is the dup graph's vertex set (scales
    * with the dup population, not the corpus); survivors are two
    * key-only anti/semi joins against it; the mixture itself is q194's
    * one map-side-combined aggregate plus |sources|-row arithmetic.
    */
  def dedupMixture(docs: DataFrame, budgetTokens: Long = 1000000L): DataFrame = {
    // tokenize ONCE: everything after the cluster pass works on the
    // narrow (doc_id, source, n_chars, n_tok) relation, never on text
    val tokd = Caches.track(docs.select(
      col("doc_id"), col("source"), col("n_chars"),
      size(Text.words(col("text"))).cast("long").as("n_tok")))
    val members = Caches.track(
      Dedup.dupClusters(docs, bands = 4, rowsPerBand = 2, threshold = 0.8))
    val reps = tokd.select(col("doc_id"), col("n_chars"))
      .join(members.hint("shuffle_hash"), Seq("doc_id"))
      .groupBy(col("cluster"))
      .agg(max(struct(col("n_chars"), (-col("doc_id")).as("neg_id"))).as("best"))
      .select((-col("best.neg_id")).as("doc_id"))
    val survivors = tokd
      .join(members.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .unionAll(tokd.join(reps, Seq("doc_id"), "left_semi"))
    val raw = tokd
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_raw"), sum(col("n_tok")).as("n_tokens_raw"))
    temperatureAlloc(
      survivors.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens")),
      budgetTokens)
      .select(col("source"), col("n_docs").as("n_docs_kept"),
        col("n_tokens").as("n_tokens_kept"), col("alloc_tokens"))
      .join(raw, Seq("source"))
      .select(col("source"), col("n_docs_raw"), col("n_tokens_raw"),
        col("n_docs_kept"), col("n_tokens_kept"), col("alloc_tokens"),
        expr("(1000000L * (n_tokens_raw - n_tokens_kept)) div n_tokens_raw")
          .as("dup_token_share_micro"))
  }

  def dedupMixture(s: SparkSession, dir: String): DataFrame =
    dedupMixture(Tables.documents(s, dir))

  /** Balanced-target mixture under availability caps (q287): exact
    * integer WATER-FILLING. A multilingual training run wants every
    * language at the same token mass (the balanced target), but
    * low-resource languages cap out — their surplus must spill to the
    * rest, recursively, until the budget is exact. The classic level
    * construction does this in closed form on the per-language
    * aggregate: sort ascending by (avail, lang); language i is CAPPED
    * iff avail_i·(n−i) + cum_i ≤ B' (monotone in i, so the capped set
    * is a prefix — proof: the difference (avail_{i+1}−avail_i)·(n−i) is
    * ≥ 0 on a sorted relation); the uncapped languages share the
    * remaining budget at level = R div m with the division remainder
    * handed to the lexicographically first uncapped languages. Every
    * uncapped language's avail strictly exceeds the level (shown by the
    * same inequality), so allocations never breach caps and the total
    * reconciles to min(budget, total availability) EXACTLY.
    *
    * Scale: one map-side-combined corpus aggregate to |langs| rows;
    * every window and scalar after that reads the bounded per-language
    * relation — nothing corpus-sized is sorted, windowed, or collected.
    */
  def targetMixture(docs: DataFrame, budgetTokens: Long = 500000L): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val byAvail = Window.orderBy(col("avail_tokens"), col("lang"))
    val avail = Caches.track(docs
      .select(col("lang"), size(Text.words(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("avail_tokens")))
    val ranked = Caches.track(avail
      .withColumn("rk", row_number().over(byAvail))
      .withColumn("cum", sum(col("avail_tokens")).over(
        byAvail.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(avail.agg(
        count(lit(1)).as("n_langs"),
        sum(col("avail_tokens")).as("total_avail"))))
      .withColumn("bp", least(lit(budgetTokens), col("total_avail")))
      .withColumn("capped",
        col("avail_tokens") * (col("n_langs") - col("rk")) + col("cum") <=
          col("bp")))
    val kAgg = ranked.agg(
      sum(when(col("capped"), 1L).otherwise(0L)).as("n_capped"),
      coalesce(sum(when(col("capped"), col("avail_tokens"))), lit(0L))
        .as("capped_mass"))
    ranked.crossJoin(broadcast(kAgg))
      .withColumn("m", col("n_langs") - col("n_capped"))
      .withColumn("rr", col("bp") - col("capped_mass"))
      .withColumn("level",
        when(col("m") > 0, expr("rr div m")).otherwise(lit(0L)))
      .withColumn("rem",
        when(col("m") > 0, col("rr") % col("m")).otherwise(lit(0L)))
      .withColumn("urk", row_number().over(
        Window.partitionBy(col("capped")).orderBy(col("lang"))))
      .withColumn("alloc_tokens",
        when(col("capped"), col("avail_tokens"))
          .otherwise(col("level") +
            when(col("urk") <= col("rem"), 1L).otherwise(0L)))
      .select(col("lang"), col("n_docs"), col("avail_tokens"),
        col("alloc_tokens"), col("capped"),
        expr("(1000000L * alloc_tokens) div avail_tokens")
          .as("utilization_micro"))
  }

  def targetMixture(s: SparkSession, dir: String): DataFrame =
    targetMixture(Tables.documents(s, dir))
}
