package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.sources.Tables

/** Text-analysis queries over the documents table (training-data pipeline
  * extensions): token counting, quality features, language-ID,
  * fingerprinting. All expression-only (codegen'd).
  */
object TextAnalysis {

  /** Token counts: whitespace tokens + BPE-ish regex tokens. */
  def tokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        size(Text.words(col("text"))).as("n_ws_tokens"),
        Text.regexTokenCount(col("text")).as("n_re_tokens"))

  /** The stopword list shared by the quality features (here) and the
    * quality-threshold sweep (Prep.filterSweep) — one list so both read
    * the same signal. */
  private[operators] val stopwords = Seq("the", "and", "of", "to", "is", "in", "a")

  /** Quality features: lengths, mean word length, stopword + punctuation
    * ratios. Per-row double divisions only — deterministic everywhere.
    */
  def quality(s: SparkSession, dir: String): DataFrame = {
    val stop = stopwords
    val ws = Text.words(col("text"))
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars_m"),
        size(ws).as("n_words"),
        (length(regexp_replace(col("text"), " ", "")).cast("double") / size(ws))
          .as("avg_word_len"),
        (size(filter(ws, w => w.isin(stop: _*))).cast("double") / size(ws))
          .as("stopword_ratio"),
        (regexp_count(col("text"), lit("[^A-Za-z0-9 ]")).cast("double") /
          length(col("text"))).as("punct_ratio"))
  }

  /** Heuristic language-ID vs the labelled lang column. Two-stage plan:
    * the four marker-score columns materialize in one projection (each
    * split+filter runs exactly once per row), then the argmax reads the
    * scores as attribute references — the order-of-magnitude constant
    * factor that matters when this runs over 100 TB of text.
    */
  def langid(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(s, dir)
      .select(Seq(
        col("doc_id"),
        col("lang").as("labelled")) ++
        Text.langMarkers.map { case (lang, ms) =>
          Text.markerHits(Text.words(col("text")), ms).as(s"s_$lang")
        }: _*)
    scored.select(
      col("doc_id"), col("labelled"),
      Text.langIdFromScores(
        Text.langMarkers.map { case (lang, _) => lang -> col(s"s_$lang") })
        .as("predicted"))
  }

  /** Language-ID confusion matrix (q226): q18's heuristic classifier
    * evaluated against the labelled `lang` column — (labelled, predicted)
    * counts with per-label recall. The report a pipeline reads before
    * trusting lang-conditioned routing (mixture weights, per-lang
    * sampling) to a heuristic classifier: which labels leak where, and
    * at what rate.
    *
    * Scale: one classifier pass (pure projection) into a map-side
    * combined (labelled, predicted) aggregate — ≤ |langs|·(|langs|+1)
    * rows; the per-label totals join touches only those rows. The
    * confusion relation is cached because the totals aggregate and the
    * final join both read it, and a recompute would re-scan the corpus.
    */
  def langidConfusion(s: SparkSession, dir: String): DataFrame = {
    val cm = graft.Caches.track(
      langid(s, dir)
        .groupBy(col("labelled"), col("predicted")).agg(count(lit(1)).as("n")))
    val tot = cm.groupBy(col("labelled")).agg(sum(col("n")).as("n_labelled"))
    cm.join(tot, "labelled")
      .select(col("labelled"), col("predicted"), col("n"), col("n_labelled"),
        (col("n").cast("double") / col("n_labelled").cast("double")).as("recall"))
  }

  /** Content fingerprint of normalised text. */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))

  /** Rolling-window fingerprint (winnowing-style): hash every character
    * k-gram of the text with a sliding window and keep the minimum — a
    * content identity robust to local edits anywhere except the winning
    * window, unlike whole-document hashing. Pure per-row projection
    * (embarrassingly parallel), evaluated by the codegen'd single-pass
    * kernel (graft.functions.MinGramMd5) — bit-identical to the
    * `array_min(transform(sequence(...), i => md5(substr(text, i, k))))`
    * composition it replaced, without that form's interpreted lambda and
    * O(n²) re-scanning `substr` calls.
    */
  def winnowFingerprint(s: SparkSession, dir: String, k: Int = 8): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.functions.Winnow.minGramMd5(col("text"), k).as("winnow_fp"))

  /** Code-switching / language-mixing profile (q291): q18's marker
    * language-ID applied to fixed 16-token WINDOWS of each document —
    * the screen a multilingual curation pass runs because a doc-level
    * language label hides embedded foreign passages (boilerplate from a
    * mirrored site, quoted sources, spam injections), and a
    * lang-conditioned mixture (q194/q287) silently mis-routes the mixed
    * mass. Per doc: window count, windows with no marker evidence
    * (`und`), windows whose prediction disagrees with the doc label
    * (foreign mass), and adjacent-window switches (fragmentation — many
    * switches with low foreign mass reads as noise, few switches with a
    * long foreign run reads as an embedded passage).
    *
    * Scale: the ENTIRE profile is one codegen'd projection — window
    * slicing, per-window marker argmax, and the switch walk are nested
    * HOFs over the doc's own token array, so there is no explode, no
    * window shuffle, no aggregation: zero exchanges end to end, the
    * q284 row-local discipline in pure SQL functions.
    */
  def codeSwitchProfile(docs: DataFrame, window: Int = 16): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val w = Text.words(col("text"))
    val nWin = ((size(w) + window - 1) / window).cast("int")
    // two-stage argmax (the langIdFromScores contract): materialize the
    // four marker scores per window into a struct FIRST, then argmax
    // over field references — inlining markerHits into the argmax tree
    // re-evaluates each window's filter ~3× per language (measured
    // 3.8 s -> the struct form at sf0.1)
    val scored = transform(
      sequence(lit(0), nWin - 1),
      wi => {
        val win = slice(w, wi * window + 1, lit(window))
        struct(Text.langMarkers.map { case (lang, ms) =>
          Text.markerHits(win, ms).as(s"s_$lang")
        }: _*)
      })
    val preds = transform(col("scored"), sc =>
      Text.langIdFromScores(
        Text.langMarkers.map { case (lang, _) => lang -> sc.getField(s"s_$lang") }))
    docs
      .select(col("doc_id"), col("lang"), scored.as("scored"))
      .select(col("doc_id"), col("lang"), preds.as("preds"))
      .select(col("doc_id"), col("lang"),
        size(col("preds")).cast("long").as("n_windows"),
        size(filter(col("preds"), p => p === "und")).cast("long").as("n_und"),
        size(filter(col("preds"), p => p =!= "und" && p =!= col("lang")))
          .cast("long").as("n_foreign"),
        when(size(col("preds")) > 1,
          expr("""size(filter(sequence(2, size(preds)),
                 i -> element_at(preds, i) != element_at(preds, i - 1)))"""))
          .otherwise(0).cast("long").as("n_switches"))
  }

  def codeSwitchProfile(s: SparkSession, dir: String): DataFrame =
    codeSwitchProfile(Tables.documents(s, dir))
}
