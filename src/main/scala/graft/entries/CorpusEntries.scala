package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Advanced, Corpus, Dedup, Multimodal, Prep, Quality, Relational, Similarity, TextAnalysis, Warehouse}
import graft.sources.Tables

/** Corpus family: `SparkEntry.queries` registrations + their DuckDB
  * oracles (round-17 verdict task 6 — the 8k-line single-file registry
  * split per family; `SparkEntry` folds every family back into the one
  * driver-contract map, and OracleCoverageSpec still guards that every
  * query has its oracle).
  */
private[graft] object CorpusEntries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q16_text_tokens" -> (TextAnalysis.tokens _),
    "q17_text_quality" -> (TextAnalysis.quality _),
    "q18_text_langid" -> (TextAnalysis.langid _),
    "q19_text_fingerprint" -> (TextAnalysis.fingerprint _),
    "q38_text_winnow" -> ((s, d) => TextAnalysis.winnowFingerprint(s, d)),
    "q39_vocab_topk" -> (Corpus.vocabTopK _),
    "q40_split_assign" -> (Corpus.splitAssign _),
    "q41_length_quantiles" -> (Corpus.lengthQuantiles _),
    "q42_sketch_profile" -> (Corpus.sketchProfileKmv _),
    "q57_tfidf_topk" -> ((s, d) => Corpus.tfidfTopTerms(s, d)),
    "q58_freq_spectrum" -> (Corpus.freqSpectrum _),
    "q78_inverted_index" -> ((s, d) => Corpus.invertedIndex(s, d)),
    "q82_feature_hash_embed" -> ((s, d) => Corpus.featureHashEmbed(s, d)),
    "q83_bigram_lift" -> ((s, d) => Corpus.bigramLift(s, d)),
    "q87_bpe_pairs" -> ((s, d) => Corpus.bpePairCounts(s, d)),
    "q88_length_deciles" -> ((s, d) => Corpus.lengthDeciles(s, d)),
    "q100_length_gini" -> ((s, d) => Corpus.lengthGini(s, d)),
    "q124_quantile_normalize" -> ((s, d) => Corpus.quantileNormalize(s, d)),
    "q160_lang_concentration" -> ((s, d) => Corpus.langConcentration(s, d)),
    "q171_type_token_ratio" -> ((s, d) => Corpus.typeTokenRatio(s, d)),
    "q174_vocab_growth" -> ((s, d) => Corpus.vocabGrowth(s, d)),
    "q187_char_class_profile" -> ((s, d) => Corpus.charClassProfile(s, d)),
    "q190_oov_rate" -> ((s, d) => Corpus.oovRate(s, d)),
    "q197_heavy_hitters" -> ((s, d) => Corpus.heavyHitters(s, d)),
    "q199_vocab_coverage" -> ((s, d) => Corpus.vocabCoverage(s, d)),
    "q205_source_divergence" -> ((s, d) => Corpus.sourceDivergence(s, d)),
    "q210_bpe_learn" -> ((s, d) => Corpus.bpeLearn(s, d)),
    "q211_bpe_tokenize" -> ((s, d) => Corpus.bpeTokenize(s, d)),
    "q223_source_manifest" -> ((s, d) => Corpus.sourceManifest(s, d)),
    "q226_langid_confusion" -> ((s, d) => TextAnalysis.langidConfusion(s, d)),
    // oracle: q223's full-corpus card — the incremental merge must be
    // bit-identical to the recompute
    "q228_manifest_merge" -> ((s, d) => Corpus.manifestMerge(s, d)),
    "q236_lm_fluency" -> ((s, d) => Corpus.lmFluency(s, d)),
    "q237_repetition_profile" -> ((s, d) => Corpus.repetitionProfile(s, d)),
    "q242_bm25_topdocs" -> ((s, d) => Corpus.bm25TopDocs(s, d)),
    "q245_nb_confusion" -> ((s, d) => Corpus.nbConfusion(s, d)),
    "q248_cm_freq_audit" -> ((s, d) => Corpus.cmFrequencyAudit(s, d)),
    "q249_zipf_slope" -> ((s, d) => Corpus.zipfSlope(s, d)),
    "q254_lm_affinity" -> ((s, d) => Corpus.lmAffinity(s, d)),
    "q265_kn_fluency" -> ((s, d) => Corpus.knFluency(s, d)),
    "q291_code_switch" -> ((s, d) => TextAnalysis.codeSwitchProfile(s, d)),
  )

  def oracleSql: Map[String, String] = Map(

    "q16_text_tokens" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_re_tokens
        |FROM documents""".stripMargin,

    "q17_text_quality" ->
      """SELECT doc_id, length(text) AS n_chars_m, len(string_split(text, ' ')) AS n_words,
        |  CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) / len(string_split(text, ' ')) AS avg_word_len,
        |  CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the','and','of','to','is','in','a'))) AS DOUBLE) / len(string_split(text, ' ')) AS stopword_ratio,
        |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE) / length(text) AS punct_ratio
        |FROM documents""".stripMargin,

    "q18_text_langid" ->
      """WITH t AS (
        |  SELECT doc_id, lang AS labelled, string_split(text, ' ') AS w FROM documents
        |), sc AS (
        |  SELECT doc_id, labelled,
        |    len(list_filter(w, x -> x IN ('the','and','of','to','is'))) AS s_en,
        |    len(list_filter(w, x -> x IN ('el','la','de','que','los'))) AS s_es,
        |    len(list_filter(w, x -> x IN ('le','les','des','et','une'))) AS s_fr,
        |    len(list_filter(w, x -> x IN ('der','die','und','das','ist'))) AS s_de
        |  FROM t
        |)
        |SELECT doc_id, labelled,
        |  CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
        |       WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
        |       WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
        |       WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
        |       ELSE 'de' END AS predicted
        |FROM sc""".stripMargin,

    "q19_text_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        |FROM documents""".stripMargin,

    "q38_text_winnow" ->
      """SELECT doc_id,
        |  list_min([md5(substr(text, i, 8)) FOR i IN range(1, greatest(length(text) - 7, 1) + 1)]) AS winnow_fp
        |FROM documents""".stripMargin,

    "q39_vocab_topk" ->
      """SELECT w AS word, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |GROUP BY w ORDER BY n DESC, word LIMIT 100""".stripMargin,

    "q40_split_assign" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    ( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 100 AS bucket
        |  FROM documents
        |)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split
        |FROM b""".stripMargin,

    "q41_length_quantiles" ->
      """WITH w AS (
        |  SELECT lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM documents
        |)
        |SELECT lang,
        |  MAX(CASE WHEN rn = CAST(ceil(n * 0.25) AS BIGINT) THEN n_chars END) AS p25,
        |  MAX(CASE WHEN rn = CAST(ceil(n * 0.50) AS BIGINT) THEN n_chars END) AS p50,
        |  MAX(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT) THEN n_chars END) AS p75,
        |  MAX(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT) THEN n_chars END) AS p95,
        |  MAX(n) AS n_docs
        |FROM w GROUP BY lang""".stripMargin,

    // KMV sketch: k-th smallest distinct 48-bit md5 hash per source, estimate
    // by int64 floor division (17732923532771328 = 63 << 48); quantiles are
    // exact discrete percentiles of the deterministic 12% md5-bucket sample.
    // Mirrors graft.functions.KMinValues + Corpus.sketchProfileKmv exactly.
    "q42_sketch_profile" ->
      """WITH tx AS (
        |  SELECT DISTINCT source, md5(text) AS m FROM documents
        |), ht AS (
        |  SELECT DISTINCT source,
        |    SUM(((instr('0123456789abcdef', substr(m, CAST(j + 1 AS INT), 1)) - 1)::BIGINT) << CAST((11 - j) * 4 AS INT)) AS h
        |  FROM tx, range(0, 12) r(j) GROUP BY source, m
        |), lx AS (
        |  SELECT DISTINCT source, md5(lang) AS m FROM documents
        |), hl AS (
        |  SELECT DISTINCT source,
        |    SUM(((instr('0123456789abcdef', substr(m, CAST(j + 1 AS INT), 1)) - 1)::BIGINT) << CAST((11 - j) * 4 AS INT)) AS h
        |  FROM lx, range(0, 12) r(j) GROUP BY source, m
        |), kt AS (
        |  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
        |         COUNT(*) OVER (PARTITION BY source) AS nd
        |  FROM ht
        |), ndv_t AS (
        |  SELECT source,
        |    CAST(CASE WHEN MAX(nd) < 64 THEN MAX(nd)
        |         ELSE 17732923532771328 // MAX(CASE WHEN rn = 64 THEN h END) END AS BIGINT) AS ndv_text
        |  FROM kt GROUP BY source
        |), kl AS (
        |  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
        |         COUNT(*) OVER (PARTITION BY source) AS nd
        |  FROM hl
        |), ndv_l AS (
        |  SELECT source,
        |    CAST(CASE WHEN MAX(nd) < 64 THEN MAX(nd)
        |         ELSE 17732923532771328 // MAX(CASE WHEN rn = 64 THEN h END) END AS BIGINT) AS ndv_lang
        |  FROM kl GROUP BY source
        |), sq AS (
        |  SELECT source, n_chars, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM documents
        |  WHERE ( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |        + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |        + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |        + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 100 < 12
        |), quants AS (
        |  SELECT source,
        |    MAX(CASE WHEN rn = CAST(ceil(n * 0.50) AS BIGINT) THEN n_chars END) AS len_p50,
        |    MAX(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT) THEN n_chars END) AS len_p95,
        |    MAX(n) AS samp_n
        |  FROM sq GROUP BY source
        |), base AS (
        |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
        |)
        |SELECT b.source, b.n_docs, t.ndv_text, l.ndv_lang, q.len_p50, q.len_p95, q.samp_n
        |FROM base b
        |JOIN ndv_t t USING (source)
        |JOIN ndv_l l USING (source)
        |LEFT JOIN quants q USING (source)""".stripMargin,

    "q57_tfidf_topk" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        |), tf AS (
        |  SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY 1, 2
        |), dfreq AS (
        |  SELECT word, COUNT(*) AS df FROM tf GROUP BY 1
        |), s AS (
        |  SELECT t.doc_id, t.word, t.tf, d.df, CAST(t.tf AS DOUBLE) / d.df AS score
        |  FROM tf t JOIN dfreq d USING (word)
        |)
        |SELECT doc_id, word, tf, df, score, rnk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS rnk FROM s
        |) WHERE rnk <= 3""".stripMargin,

    "q58_freq_spectrum" ->
      """SELECT freq, COUNT(*) AS n_words FROM (
        |  SELECT word, COUNT(*) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  GROUP BY word
        |) GROUP BY freq""".stripMargin,

    // q78: the df band and the 20-id posting cap are part of the
    // contract (they are the scale guards), so the oracle applies the
    // same band and the same sorted slice.
    "q78_inverted_index" ->
      """WITH dw AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
        |  FROM documents
        |), banded AS (
        |  SELECT word, COUNT(*) AS df FROM dw GROUP BY 1
        |  HAVING COUNT(*) >= 3
        |    AND COUNT(*) <= floor((SELECT COUNT(*) FROM documents) * 0.95)
        |)
        |SELECT w.word, b.df,
        |  array_to_string(
        |    list_transform(list_sort(list(w.doc_id))[1:20], x -> CAST(x AS VARCHAR)),
        |    ',') AS postings
        |FROM dw w JOIN banded b USING (word)
        |GROUP BY 1, 2""".stripMargin,

    // q82: dimension = 48-bit md5 prefix mod 64 (the same instr-shift
    // reconstruction as q42's KMV hash), sign = parity of hex digit 13.
    "q82_feature_hash_embed" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        |), wc AS (
        |  SELECT doc_id, word, COUNT(*) AS n FROM w GROUP BY 1, 2
        |), h AS (
        |  SELECT doc_id, word, n,
        |    SUM(((instr('0123456789abcdef', substr(md5(word), CAST(j + 1 AS INT), 1)) - 1)::BIGINT)
        |      << CAST((11 - j) * 4 AS INT)) AS h48
        |  FROM wc, range(0, 12) r(j)
        |  GROUP BY doc_id, word, n
        |)
        |SELECT doc_id, CAST(h48 % 64 AS INT) AS pos,
        |  CAST(SUM(CASE WHEN (instr('0123456789abcdef', substr(md5(word), 13, 1)) - 1) % 2 = 0
        |           THEN n ELSE -n END) AS BIGINT) AS value
        |FROM h GROUP BY 1, 2""".stripMargin,

    // q83: all inputs are exact integer counts; the score is the same
    // fixed shape of three double divisions on both engines, so the
    // (lift DESC, bigram) top-50 cut is deterministic.
    "q83_bigram_lift" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), uni AS (
        |  SELECT unnest(w) AS word FROM t
        |), uc AS (
        |  SELECT word, COUNT(*) AS n_w FROM uni GROUP BY 1
        |), tot AS (
        |  SELECT (SELECT SUM(n_w) FROM uc) AS n_tot,
        |    (SELECT SUM(greatest(len(w) - 1, 0)) FROM t) AS n_bg
        |), bg AS (
        |  SELECT unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bigram
        |  FROM t WHERE len(w) >= 2
        |), bc AS (
        |  SELECT bigram, COUNT(*) AS n_ab FROM bg GROUP BY 1 HAVING COUNT(*) >= 5
        |)
        |SELECT b.bigram, b.n_ab, a.n_w AS n_a, c.n_w AS n_b,
        |  (CAST(b.n_ab AS DOUBLE) / t.n_bg) /
        |    ((CAST(a.n_w AS DOUBLE) / t.n_tot) * (CAST(c.n_w AS DOUBLE) / t.n_tot)) AS lift
        |FROM bc b
        |JOIN uc a ON a.word = string_split(b.bigram, ' ')[1]
        |JOIN uc c ON c.word = string_split(b.bigram, ' ')[2]
        |CROSS JOIN tot t
        |ORDER BY lift DESC, b.bigram
        |LIMIT 50""".stripMargin,

    // q87: pair counts run on the collapsed vocabulary weighted by word
    // frequency — the oracle mirrors that exactly (same totals as
    // counting over the raw corpus, provably: sum over words of
    // per-word pairs × count).
    "q87_bpe_pairs" ->
      """WITH v AS (
        |  SELECT word, COUNT(*) AS n_word FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |  ) GROUP BY 1
        |), p AS (
        |  SELECT n_word,
        |    unnest([substr(word, CAST(i AS INT), 2) FOR i IN range(1, len(word))]) AS pair
        |  FROM v WHERE len(word) >= 2
        |)
        |SELECT pair, CAST(SUM(n_word) AS BIGINT) AS n
        |FROM p GROUP BY 1
        |ORDER BY n DESC, pair
        |LIMIT 100""".stripMargin,

    // q88: boundary-based deciles (value at rank ceil(n*d/10), ties share
    // the lower bucket) — deterministic where ntile's positional ties are
    // not; the oracle computes the identical boundaries from the value
    // distribution.
    "q88_length_deciles" ->
      """WITH dist AS (
        |  SELECT n_chars, COUNT(*) AS cnt FROM documents GROUP BY 1
        |), cum AS (
        |  SELECT n_chars, cnt, SUM(cnt) OVER (ORDER BY n_chars) AS cum FROM dist
        |), tot AS (
        |  SELECT COUNT(*) AS n FROM documents
        |), b AS (
        |  SELECT
        |    MIN(CASE WHEN cum >= ceil(n * 1 / 10.0) THEN n_chars END) AS b1,
        |    MIN(CASE WHEN cum >= ceil(n * 2 / 10.0) THEN n_chars END) AS b2,
        |    MIN(CASE WHEN cum >= ceil(n * 3 / 10.0) THEN n_chars END) AS b3,
        |    MIN(CASE WHEN cum >= ceil(n * 4 / 10.0) THEN n_chars END) AS b4,
        |    MIN(CASE WHEN cum >= ceil(n * 5 / 10.0) THEN n_chars END) AS b5,
        |    MIN(CASE WHEN cum >= ceil(n * 6 / 10.0) THEN n_chars END) AS b6,
        |    MIN(CASE WHEN cum >= ceil(n * 7 / 10.0) THEN n_chars END) AS b7,
        |    MIN(CASE WHEN cum >= ceil(n * 8 / 10.0) THEN n_chars END) AS b8,
        |    MIN(CASE WHEN cum >= ceil(n * 9 / 10.0) THEN n_chars END) AS b9
        |  FROM cum CROSS JOIN tot
        |)
        |SELECT doc_id, n_chars,
        |  CAST(1 + (CASE WHEN b1 < n_chars THEN 1 ELSE 0 END)
        |         + (CASE WHEN b2 < n_chars THEN 1 ELSE 0 END)
        |         + (CASE WHEN b3 < n_chars THEN 1 ELSE 0 END)
        |         + (CASE WHEN b4 < n_chars THEN 1 ELSE 0 END)
        |         + (CASE WHEN b5 < n_chars THEN 1 ELSE 0 END)
        |         + (CASE WHEN b6 < n_chars THEN 1 ELSE 0 END)
        |         + (CASE WHEN b7 < n_chars THEN 1 ELSE 0 END)
        |         + (CASE WHEN b8 < n_chars THEN 1 ELSE 0 END)
        |         + (CASE WHEN b9 < n_chars THEN 1 ELSE 0 END) AS INT) AS decile
        |FROM documents CROSS JOIN b""".stripMargin,

    // q100: rank-formula Gini from two integer sums; ranks tie-broken by
    // doc_id (sum is tie-invariant, the break just makes ranks total).
    "q100_length_gini" ->
      """WITH r AS (
        |  SELECT source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS i
        |  FROM documents
        |), g AS (
        |  SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS s0,
        |    SUM(i * n_chars) AS s1
        |  FROM r GROUP BY 1
        |)
        |SELECT source, n_docs,
        |  CAST(2 * s1 AS DOUBLE) / CAST(n_docs * s0 AS DOUBLE)
        |    - CAST(n_docs + 1 AS DOUBLE) / CAST(n_docs AS DOUBLE) AS gini
        |FROM g""".stripMargin,

    // q124: within-source and global ranks as single windows; identical
    // integral ceil arithmetic for the rank lookup.
    "q124_quantile_normalize" ->
      """WITH b AS (SELECT doc_id, source, n_chars FROM documents),
        |t AS (SELECT COUNT(*) AS n_total FROM b),
        |r AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) AS rn_s,
        |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
        |  FROM b
        |), g AS (
        |  SELECT n_chars AS g_chars,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS g_rn
        |  FROM b
        |)
        |SELECT r.doc_id, r.source, r.n_chars, g.g_chars AS norm_chars
        |FROM r, t, g
        |WHERE (r.rn_s * t.n_total + r.n_src - 1) // r.n_src = g.g_rn""".stripMargin,

    // q160: exact integer HHI ratio, one division.
    "q160_lang_concentration" ->
      """WITH sl AS (SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2),
        |s AS (
        |  SELECT source, COUNT(*) AS n_langs, CAST(SUM(n) AS BIGINT) AS n_docs,
        |    CAST(SUM(n * n) AS BIGINT) AS ss
        |  FROM sl GROUP BY 1
        |)
        |SELECT source, n_langs, n_docs,
        |  CAST(ss AS DOUBLE) / CAST(n_docs * n_docs AS DOUBLE) AS hhi
        |FROM s""".stripMargin,

    // q171: same single-space tokenization as Text.words.
    "q171_type_token_ratio" ->
      """WITH w AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
        |), tok AS (SELECT lang, COUNT(*) AS n_tokens FROM w GROUP BY 1),
        |typ AS (
        |  SELECT lang, COUNT(*) AS n_types FROM (SELECT DISTINCT lang, w FROM w) GROUP BY 1
        |)
        |SELECT tok.lang, n_tokens, n_types,
        |  CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr
        |FROM tok JOIN typ ON tok.lang = typ.lang""".stripMargin,

    // q174: first-occurrence checkpoint histogram + ten-row prefixes.
    "q174_vocab_growth" ->
      """WITH w AS (
        |  SELECT CAST('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 // 10 AS ck,
        |    unnest(string_split(text, ' ')) AS w
        |  FROM documents
        |), tok AS (SELECT ck, COUNT(*) AS n_tokens FROM w GROUP BY 1),
        |fst AS (
        |  SELECT ck, COUNT(*) AS n_new_types FROM (
        |    SELECT w, MIN(ck) AS ck FROM w GROUP BY 1) GROUP BY 1
        |)
        |SELECT tok.ck AS checkpoint, n_tokens,
        |  COALESCE(n_new_types, 0) AS n_new_types,
        |  CAST(SUM(n_tokens) OVER (ORDER BY tok.ck) AS BIGINT) AS cum_tokens,
        |  CAST(SUM(COALESCE(n_new_types, 0)) OVER (ORDER BY tok.ck) AS BIGINT) AS cum_vocab
        |FROM tok LEFT JOIN fst ON tok.ck = fst.ck""".stripMargin,

    // q187: identical regex classes and exact ratios.
    "q187_char_class_profile" ->
      """WITH d AS (
        |  SELECT lang, CAST(length(text) AS BIGINT) AS n_chars_t,
        |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS n_punct,
        |    CAST(len(regexp_extract_all(text, ' ')) AS BIGINT) AS n_space
        |  FROM documents
        |)
        |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars_t) AS BIGINT) AS n_chars,
        |  CAST(SUM(n_digit) AS DOUBLE) / CAST(SUM(n_chars_t) AS DOUBLE) AS digit_ratio,
        |  CAST(SUM(n_punct) AS DOUBLE) / CAST(SUM(n_chars_t) AS DOUBLE) AS punct_ratio,
        |  CAST(SUM(n_space) AS DOUBLE) / CAST(SUM(n_chars_t) AS DOUBLE) AS space_ratio
        |FROM d GROUP BY 1""".stripMargin,

    // q190: the same deterministic top-200 vocabulary (count desc, word
    // asc) and the same per-source OOV rollup.
    "q190_oov_rate" ->
      """WITH w AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
        |), v AS (
        |  SELECT word FROM (
        |    SELECT word, COUNT(*) AS n FROM w GROUP BY 1
        |    ORDER BY n DESC, word LIMIT 200)
        |)
        |SELECT w.source, COUNT(*) AS n_tokens,
        |  CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) AS oov_rate
        |FROM w LEFT JOIN v ON w.word = v.word
        |GROUP BY 1""".stripMargin,

    // q197: the oracle is the single-pass exact count — the two-pass
    // sketch+recount must output the identical heavy-hitter set.
    "q197_heavy_hitters" ->
      """WITH bg AS (
        |  SELECT unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS gram
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents)
        |), c AS (SELECT gram, COUNT(*) AS cnt FROM bg GROUP BY 1),
        |t AS (SELECT COUNT(*) AS n_total FROM bg)
        |SELECT gram, cnt, CAST(cnt AS DOUBLE) / n_total AS freq
        |FROM c, t WHERE cnt * 1000 >= n_total""".stripMargin,

    // q199: the oracle's single global window is the semantics; the
    // Spark plan computes the identical prefix with the two-pass
    // range-bucketed sum.
    "q199_vocab_coverage" ->
      """WITH bg AS (
        |  SELECT unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS gram
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents)
        |), c AS (SELECT gram, COUNT(*) AS cnt FROM bg GROUP BY 1),
        |r AS (
        |  SELECT gram, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, gram) AS rnk,
        |    CAST(SUM(cnt) OVER (ORDER BY cnt DESC, gram ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM c
        |), t AS (SELECT COUNT(*) AS n FROM bg)
        |SELECT rnk AS vocab_size, gram AS boundary_gram, CAST(cum AS DOUBLE) / n AS coverage
        |FROM r, t WHERE rnk IN (50, 100, 200, 400, 800)""".stripMargin,

    // q205: per-source total-variation drift. Bucket = the same 16-bit
    // md5 prefix as Spark's conv(substring(md5(word),1,4),16,10) % 256;
    // cross products run in HUGEINT (Spark side: DECIMAL(38,0)) so the
    // arithmetic is exact at any scale; one correctly-rounded final
    // division.
    "q205_source_divergence" ->
      """WITH w AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
        |), sb AS (
        |  SELECT source,
        |    ( (instr('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(word), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(word), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(word), 4, 1)) - 1) ) % 256 AS bucket,
        |    COUNT(*) AS c_sb
        |  FROM w GROUP BY 1, 2
        |), bt AS (
        |  SELECT bucket, CAST(SUM(c_sb) AS BIGINT) AS c_b FROM sb GROUP BY 1
        |), st AS (
        |  SELECT source, CAST(SUM(c_sb) AS BIGINT) AS n_src FROM sb GROUP BY 1
        |), nt AS (
        |  SELECT CAST(SUM(c_sb) AS BIGINT) AS n_total FROM sb
        |), grid AS (
        |  SELECT st.source, st.n_src, bt.bucket, bt.c_b, nt.n_total,
        |    COALESCE(sb.c_sb, 0) AS c_sb
        |  FROM st CROSS JOIN bt CROSS JOIN nt
        |  LEFT JOIN sb ON sb.source = st.source AND sb.bucket = bt.bucket
        |)
        |SELECT source, n_src AS n_words,
        |  CAST(SUM(abs(CAST(c_sb AS HUGEINT) * n_total - CAST(c_b AS HUGEINT) * n_src)) AS DOUBLE)
        |    / (2.0 * CAST(n_src AS DOUBLE) * CAST(n_total AS DOUBLE)) AS tv
        |FROM grid GROUP BY 1, 2, n_total""".stripMargin,

    // q210: BPE merge learning, the fixed nMerges=3 loop unrolled (the
    // q61 discipline). Each step: word-frequency-weighted adjacent-pair
    // counts -> argmax with (t1, t2) tiebreak -> greedy DISJOINT merge
    // via island windows (odd ranks of each consecutive-match run merge,
    // the following position is consumed, positions renumber densely) —
    // the same window algebra as Corpus.bpeLearn, so the merge table is
    // bit-identical.
    "q210_bpe_learn" ->
      """WITH v AS (
        |  SELECT word, COUNT(*) AS n_word FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |  ) GROUP BY 1
        |), t0 AS (
        |  SELECT word, n_word, i AS pos, substr(word, CAST(i AS INT), 1) AS tok
        |  FROM v, LATERAL (SELECT unnest(range(1, len(word) + 1)) AS i) r
        |), c1 AS (
        |  SELECT tok AS t1, nxt AS t2, CAST(SUM(n_word) AS BIGINT) AS cnt FROM (
        |    SELECT n_word, tok, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM t0
        |  ) WHERE nxt IS NOT NULL GROUP BY 1, 2
        |), b1 AS (
        |  SELECT t1, t2, cnt FROM c1 ORDER BY cnt DESC, t1, t2 LIMIT 1
        |), g1 AS (
        |  SELECT f.word, f.n_word, f.pos, f.tok, f.nxt,
        |    COALESCE(f.tok = b.t1 AND f.nxt = b.t2, FALSE) AS mtch
        |  FROM (SELECT *, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM t0) f
        |  CROSS JOIN b1 b
        |), h1 AS (
        |  SELECT *, CASE WHEN mtch THEN pos - row_number()
        |    OVER (PARTITION BY word, mtch ORDER BY pos) END AS mrk FROM g1
        |), s1 AS (
        |  SELECT *, mtch AND (row_number()
        |    OVER (PARTITION BY word, mrk ORDER BY pos) % 2 = 1) AS sel FROM h1
        |), w1 AS (
        |  SELECT *, COALESCE(lag(sel) OVER (PARTITION BY word ORDER BY pos), FALSE) AS prev_sel FROM s1
        |), r1 AS (
        |  SELECT word, n_word,
        |    row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
        |    CASE WHEN sel THEN tok || nxt ELSE tok END AS tok
        |  FROM w1 WHERE NOT prev_sel
        |), c2 AS (
        |  SELECT tok AS t1, nxt AS t2, CAST(SUM(n_word) AS BIGINT) AS cnt FROM (
        |    SELECT n_word, tok, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM r1
        |  ) WHERE nxt IS NOT NULL GROUP BY 1, 2
        |), b2 AS (
        |  SELECT t1, t2, cnt FROM c2 ORDER BY cnt DESC, t1, t2 LIMIT 1
        |), g2 AS (
        |  SELECT f.word, f.n_word, f.pos, f.tok, f.nxt,
        |    COALESCE(f.tok = b.t1 AND f.nxt = b.t2, FALSE) AS mtch
        |  FROM (SELECT *, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM r1) f
        |  CROSS JOIN b2 b
        |), h2 AS (
        |  SELECT *, CASE WHEN mtch THEN pos - row_number()
        |    OVER (PARTITION BY word, mtch ORDER BY pos) END AS mrk FROM g2
        |), s2 AS (
        |  SELECT *, mtch AND (row_number()
        |    OVER (PARTITION BY word, mrk ORDER BY pos) % 2 = 1) AS sel FROM h2
        |), w2 AS (
        |  SELECT *, COALESCE(lag(sel) OVER (PARTITION BY word ORDER BY pos), FALSE) AS prev_sel FROM s2
        |), r2 AS (
        |  SELECT word, n_word,
        |    row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
        |    CASE WHEN sel THEN tok || nxt ELSE tok END AS tok
        |  FROM w2 WHERE NOT prev_sel
        |), c3 AS (
        |  SELECT tok AS t1, nxt AS t2, CAST(SUM(n_word) AS BIGINT) AS cnt FROM (
        |    SELECT n_word, tok, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM r2
        |  ) WHERE nxt IS NOT NULL GROUP BY 1, 2
        |), b3 AS (
        |  SELECT t1, t2, cnt FROM c3 ORDER BY cnt DESC, t1, t2 LIMIT 1
        |)
        |SELECT CAST(1 AS BIGINT) AS merge_step, t1, t2, cnt AS pair_count, t1 || t2 AS new_token FROM b1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), t1, t2, cnt, t1 || t2 FROM b2
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), t1, t2, cnt, t1 || t2 FROM b3""".stripMargin,

    "q211_bpe_tokenize" ->
      """WITH sw AS (
        |  SELECT source, word, COUNT(*) AS n_sw FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
        |  ) GROUP BY 1, 2
        |), v AS (
        |  SELECT word, CAST(SUM(n_sw) AS BIGINT) AS n_word FROM sw GROUP BY 1
        |), t0 AS (
        |  SELECT word, n_word, i AS pos, substr(word, CAST(i AS INT), 1) AS tok
        |  FROM v, LATERAL (SELECT unnest(range(1, len(word) + 1)) AS i) r
        |), c1 AS (
        |  SELECT tok AS t1, nxt AS t2, CAST(SUM(n_word) AS BIGINT) AS cnt FROM (
        |    SELECT n_word, tok, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM t0
        |  ) WHERE nxt IS NOT NULL GROUP BY 1, 2
        |), b1 AS (
        |  SELECT t1, t2, cnt FROM c1 ORDER BY cnt DESC, t1, t2 LIMIT 1
        |), g1 AS (
        |  SELECT f.word, f.n_word, f.pos, f.tok, f.nxt,
        |    COALESCE(f.tok = b.t1 AND f.nxt = b.t2, FALSE) AS mtch
        |  FROM (SELECT *, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM t0) f
        |  CROSS JOIN b1 b
        |), h1 AS (
        |  SELECT *, CASE WHEN mtch THEN pos - row_number()
        |    OVER (PARTITION BY word, mtch ORDER BY pos) END AS mrk FROM g1
        |), s1 AS (
        |  SELECT *, mtch AND (row_number()
        |    OVER (PARTITION BY word, mrk ORDER BY pos) % 2 = 1) AS sel FROM h1
        |), w1 AS (
        |  SELECT *, COALESCE(lag(sel) OVER (PARTITION BY word ORDER BY pos), FALSE) AS prev_sel FROM s1
        |), r1 AS (
        |  SELECT word, n_word,
        |    row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
        |    CASE WHEN sel THEN tok || nxt ELSE tok END AS tok
        |  FROM w1 WHERE NOT prev_sel
        |), c2 AS (
        |  SELECT tok AS t1, nxt AS t2, CAST(SUM(n_word) AS BIGINT) AS cnt FROM (
        |    SELECT n_word, tok, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM r1
        |  ) WHERE nxt IS NOT NULL GROUP BY 1, 2
        |), b2 AS (
        |  SELECT t1, t2, cnt FROM c2 ORDER BY cnt DESC, t1, t2 LIMIT 1
        |), g2 AS (
        |  SELECT f.word, f.n_word, f.pos, f.tok, f.nxt,
        |    COALESCE(f.tok = b.t1 AND f.nxt = b.t2, FALSE) AS mtch
        |  FROM (SELECT *, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM r1) f
        |  CROSS JOIN b2 b
        |), h2 AS (
        |  SELECT *, CASE WHEN mtch THEN pos - row_number()
        |    OVER (PARTITION BY word, mtch ORDER BY pos) END AS mrk FROM g2
        |), s2 AS (
        |  SELECT *, mtch AND (row_number()
        |    OVER (PARTITION BY word, mrk ORDER BY pos) % 2 = 1) AS sel FROM h2
        |), w2 AS (
        |  SELECT *, COALESCE(lag(sel) OVER (PARTITION BY word ORDER BY pos), FALSE) AS prev_sel FROM s2
        |), r2 AS (
        |  SELECT word, n_word,
        |    row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
        |    CASE WHEN sel THEN tok || nxt ELSE tok END AS tok
        |  FROM w2 WHERE NOT prev_sel
        |), c3 AS (
        |  SELECT tok AS t1, nxt AS t2, CAST(SUM(n_word) AS BIGINT) AS cnt FROM (
        |    SELECT n_word, tok, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM r2
        |  ) WHERE nxt IS NOT NULL GROUP BY 1, 2
        |), b3 AS (
        |  SELECT t1, t2, cnt FROM c3 ORDER BY cnt DESC, t1, t2 LIMIT 1
        |), g3 AS (
        |  SELECT f.word, f.n_word, f.pos, f.tok, f.nxt,
        |    COALESCE(f.tok = b.t1 AND f.nxt = b.t2, FALSE) AS mtch
        |  FROM (SELECT *, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM r2) f
        |  CROSS JOIN b3 b
        |), h3 AS (
        |  SELECT *, CASE WHEN mtch THEN pos - row_number()
        |    OVER (PARTITION BY word, mtch ORDER BY pos) END AS mrk FROM g3
        |), s3 AS (
        |  SELECT *, mtch AND (row_number()
        |    OVER (PARTITION BY word, mrk ORDER BY pos) % 2 = 1) AS sel FROM h3
        |), w3 AS (
        |  SELECT *, COALESCE(lag(sel) OVER (PARTITION BY word ORDER BY pos), FALSE) AS prev_sel FROM s3
        |), r3 AS (
        |  SELECT word, n_word,
        |    row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
        |    CASE WHEN sel THEN tok || nxt ELSE tok END AS tok
        |  FROM w3 WHERE NOT prev_sel
        |), nt AS (
        |  SELECT word, COUNT(*) AS n_toks FROM r3 GROUP BY 1
        |)
        |SELECT source,
        |  CAST(SUM(n_sw) AS BIGINT) AS n_words,
        |  CAST(SUM(n_sw * n_toks) AS BIGINT) AS n_tokens,
        |  CAST(SUM(n_sw * len(word)) AS BIGINT) AS n_chars,
        |  CAST(SUM(n_sw * n_toks) AS DOUBLE) / CAST(SUM(n_sw) AS DOUBLE) AS tokens_per_word,
        |  CAST(SUM(n_sw * len(word)) AS DOUBLE) / CAST(SUM(n_sw * n_toks) AS DOUBLE) AS chars_per_token
        |FROM sw JOIN nt USING (word) GROUP BY source""".stripMargin,

    // q223: dominant-language tie-break is max-of-struct (count, then
    // lexicographically greatest lang) — mirrored by ORDER BY n DESC,
    // lang DESC here.
    "q223_source_manifest" ->
      """WITH base AS (
        |  SELECT source, lang, md5(text) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks, n_chars
        |  FROM documents
        |), pl AS (
        |  SELECT source, lang, COUNT(*) AS n, CAST(SUM(toks) AS BIGINT) AS toks,
        |    CAST(SUM(n_chars) AS BIGINT) AS chars
        |  FROM base GROUP BY 1, 2
        |), ps AS (
        |  SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
        |    CAST(SUM(toks) AS BIGINT) AS n_tokens,
        |    CAST(SUM(chars) AS BIGINT) AS n_chars, COUNT(*) AS n_langs
        |  FROM pl GROUP BY 1
        |), top AS (
        |  SELECT source, lang AS top_lang, n AS top_n FROM (
        |    SELECT *, row_number() OVER (PARTITION BY source
        |      ORDER BY n DESC, lang DESC) AS rk FROM pl
        |  ) WHERE rk = 1
        |), dt AS (
        |  SELECT source, COUNT(*) AS n_distinct_texts
        |  FROM (SELECT DISTINCT source, h FROM base) GROUP BY 1
        |)
        |SELECT ps.source, n_docs, n_tokens, ps.n_chars, n_langs, top_lang,
        |  CAST(top_n AS DOUBLE) / CAST(n_docs AS DOUBLE) AS top_lang_share,
        |  n_distinct_texts,
        |  1.0 - CAST(n_distinct_texts AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_rate
        |FROM ps JOIN top USING (source) JOIN dt USING (source)""".stripMargin,

    // q226: q18's classifier CTE grouped into the (labelled, predicted)
    // confusion matrix with per-label recall.
    "q226_langid_confusion" ->
      """WITH t AS (
        |  SELECT doc_id, lang AS labelled, string_split(text, ' ') AS w FROM documents
        |), sc AS (
        |  SELECT doc_id, labelled,
        |    len(list_filter(w, x -> x IN ('the','and','of','to','is'))) AS s_en,
        |    len(list_filter(w, x -> x IN ('el','la','de','que','los'))) AS s_es,
        |    len(list_filter(w, x -> x IN ('le','les','des','et','une'))) AS s_fr,
        |    len(list_filter(w, x -> x IN ('der','die','und','das','ist'))) AS s_de
        |  FROM t
        |), pred AS (
        |  SELECT labelled,
        |    CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
        |         WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
        |         WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
        |         WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
        |         ELSE 'de' END AS predicted
        |  FROM sc
        |), cm AS (
        |  SELECT labelled, predicted, COUNT(*) AS n FROM pred GROUP BY 1, 2
        |), tot AS (
        |  SELECT labelled, CAST(SUM(n) AS BIGINT) AS n_labelled FROM cm GROUP BY 1
        |)
        |SELECT cm.labelled, cm.predicted, cm.n, t.n_labelled,
        |  CAST(cm.n AS DOUBLE) / CAST(t.n_labelled AS DOUBLE) AS recall
        |FROM cm JOIN tot t USING (labelled)""".stripMargin,

    "q228_manifest_merge" ->
      // identical to q223: the incremental merge must reproduce the
      // full-corpus card bit-for-bit
      """WITH base AS (
        |  SELECT source, lang, md5(text) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks, n_chars
        |  FROM documents
        |), pl AS (
        |  SELECT source, lang, COUNT(*) AS n, CAST(SUM(toks) AS BIGINT) AS toks,
        |    CAST(SUM(n_chars) AS BIGINT) AS chars
        |  FROM base GROUP BY 1, 2
        |), ps AS (
        |  SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
        |    CAST(SUM(toks) AS BIGINT) AS n_tokens,
        |    CAST(SUM(chars) AS BIGINT) AS n_chars, COUNT(*) AS n_langs
        |  FROM pl GROUP BY 1
        |), top AS (
        |  SELECT source, lang AS top_lang, n AS top_n FROM (
        |    SELECT *, row_number() OVER (PARTITION BY source
        |      ORDER BY n DESC, lang DESC) AS rk FROM pl
        |  ) WHERE rk = 1
        |), dt AS (
        |  SELECT source, COUNT(*) AS n_distinct_texts
        |  FROM (SELECT DISTINCT source, h FROM base) GROUP BY 1
        |)
        |SELECT ps.source, n_docs, n_tokens, ps.n_chars, n_langs, top_lang,
        |  CAST(top_n AS DOUBLE) / CAST(n_docs AS DOUBLE) AS top_lang_share,
        |  n_distinct_texts,
        |  1.0 - CAST(n_distinct_texts AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_rate
        |FROM ps JOIN top USING (source) JOIN dt USING (source)""".stripMargin,

    // q236: add-one bigram LM fluency — every term is one integer floor
    // division on the 1e6 grid (no transcendental ln, see scaladoc); the
    // per-doc sum goes through the VARCHAR→DOUBLE parse (DuckDB's direct
    // HUGEINT→DOUBLE cast is not correctly rounded past 2^53).
    "q236_lm_fluency" ->
      """WITH bg AS (
        |  SELECT doc_id, bigram, string_split(bigram, ' ')[1] AS w1
        |  FROM (
        |    SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bigram
        |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  )
        |), b2 AS (
        |  SELECT bigram, COUNT(*) AS n12 FROM bg GROUP BY 1
        |), h1 AS (
        |  SELECT w1, COUNT(*) AS n1 FROM bg GROUP BY 1
        |), voc AS (
        |  SELECT COUNT(*) AS v FROM h1
        |), sc AS (
        |  SELECT bg.doc_id, COUNT(*) AS n_bigrams,
        |    SUM((1000000 * (h1.n1 + voc.v)) // (b2.n12 + 1)) AS s
        |  FROM bg JOIN b2 USING (bigram) JOIN h1 USING (w1) CROSS JOIN voc
        |  GROUP BY 1
        |)
        |SELECT doc_id, n_bigrams,
        |  CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n_bigrams AS DOUBLE) / 1e6
        |    AS mean_inv_p
        |FROM sc""".stripMargin,

    // q237: Gopher/MassiveText intra-doc repetition rules — exact integer
    // counts, two double-division ratios, 0.20 top-share flag.
    "q237_repetition_profile" ->
      """WITH g AS (
        |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS g
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |), pg AS (
        |  SELECT doc_id, g, COUNT(*) AS n FROM g GROUP BY 1, 2
        |), agg AS (
        |  SELECT doc_id, SUM(n) AS n_grams, MAX(n) AS top_gram_n,
        |    SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS dup_mass
        |  FROM pg GROUP BY 1
        |)
        |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
        |  CAST(top_gram_n AS DOUBLE) / CAST(n_grams AS DOUBLE) AS top_share,
        |  CAST(dup_mass AS DOUBLE) / CAST(n_grams AS DOUBLE) AS dup_share,
        |  CAST(top_gram_n AS DOUBLE) / CAST(n_grams AS DOUBLE) > 0.20 AS flagged
        |FROM agg""".stripMargin,

    "q242_bm25_topdocs" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        |), pd AS (
        |  SELECT doc_id, COUNT(*) AS dl,
        |    CAST(SUM(CASE WHEN word = 'spark' THEN 1 ELSE 0 END) AS BIGINT) AS tf_spark,
        |    CAST(SUM(CASE WHEN word = 'merge' THEN 1 ELSE 0 END) AS BIGINT) AS tf_merge,
        |    CAST(SUM(CASE WHEN word = 'window' THEN 1 ELSE 0 END) AS BIGINT) AS tf_window
        |  FROM w GROUP BY 1
        |), st AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS s,
        |    CAST(SUM(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_spark,
        |    CAST(SUM(CASE WHEN tf_merge > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_merge,
        |    CAST(SUM(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_window
        |  FROM pd
        |), sc AS (
        |  SELECT doc_id, dl, tf_spark, tf_merge, tf_window,
        |    ((CASE WHEN tf_spark > 0 THEN
        |        CAST(CAST(2*n - 2*df_spark + 1 AS HUGEINT) * (CAST(tf_spark AS HUGEINT) * s * 22) AS DOUBLE)
        |        / CAST(CAST(2*df_spark + 1 AS HUGEINT) * (CAST(s AS HUGEINT)*tf_spark*10 + CAST(s AS HUGEINT)*3 + CAST(dl AS HUGEINT)*n*9) AS DOUBLE)
        |      ELSE 0.0 END
        |    + CASE WHEN tf_merge > 0 THEN
        |        CAST(CAST(2*n - 2*df_merge + 1 AS HUGEINT) * (CAST(tf_merge AS HUGEINT) * s * 22) AS DOUBLE)
        |        / CAST(CAST(2*df_merge + 1 AS HUGEINT) * (CAST(s AS HUGEINT)*tf_merge*10 + CAST(s AS HUGEINT)*3 + CAST(dl AS HUGEINT)*n*9) AS DOUBLE)
        |      ELSE 0.0 END)
        |    + CASE WHEN tf_window > 0 THEN
        |        CAST(CAST(2*n - 2*df_window + 1 AS HUGEINT) * (CAST(tf_window AS HUGEINT) * s * 22) AS DOUBLE)
        |        / CAST(CAST(2*df_window + 1 AS HUGEINT) * (CAST(s AS HUGEINT)*tf_window*10 + CAST(s AS HUGEINT)*3 + CAST(dl AS HUGEINT)*n*9) AS DOUBLE)
        |      ELSE 0.0 END) AS score
        |  FROM pd, st
        |)
        |SELECT doc_id, dl, tf_spark, tf_merge, tf_window, score, CAST(rnk AS INT) AS rnk
        |FROM (
        |  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
        |  FROM sc WHERE score > 0
        |) WHERE rnk <= 15""".stripMargin,

    // q245: log-free NB source classifier — integer inverse-probability
    // micro-units (the q236 grid), salted-md5 half trains, other half
    // scores, argmin with class-name tie-break, confusion counts out.
    "q245_nb_confusion" ->
      """WITH fold AS (
        |  SELECT doc_id, source, text,
        |    ( (instr('0123456789abcdef', substr(md5('nb|' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5('nb|' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5('nb|' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5('nb|' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 2 AS b
        |  FROM documents
        |), w AS (
        |  SELECT doc_id, source, b, unnest(string_split(text, ' ')) AS word
        |  FROM fold
        |), cw AS (
        |  SELECT source, word, COUNT(*) AS cnt FROM w
        |  WHERE b = 0 GROUP BY 1, 2
        |), voc AS (
        |  SELECT COUNT(DISTINCT word) AS v FROM cw
        |), classes AS (
        |  SELECT source AS cand, 1000000 * (SUM(cnt) + voc.v) AS unseen
        |  FROM cw CROSS JOIN voc GROUP BY 1, voc.v
        |), delta AS (
        |  SELECT cw.word, c.cand,
        |    c.unseen // (cw.cnt + 1) - c.unseen AS delta
        |  FROM cw JOIN classes c ON cw.source = c.cand
        |), tf AS (
        |  SELECT doc_id, source, word, COUNT(*) AS tf FROM w
        |  WHERE b = 1 GROUP BY 1, 2, 3
        |), tot AS (
        |  SELECT doc_id, source, SUM(tf) AS t FROM tf GROUP BY 1, 2
        |), adj AS (
        |  SELECT tf.doc_id, d.cand, SUM(tf.tf * d.delta) AS adj
        |  FROM tf JOIN delta d USING (word) GROUP BY 1, 2
        |), sc AS (
        |  SELECT tot.doc_id, tot.source, c.cand,
        |    tot.t * c.unseen + COALESCE(adj.adj, 0) AS score
        |  FROM tot CROSS JOIN classes c
        |  LEFT JOIN adj ON adj.doc_id = tot.doc_id AND adj.cand = c.cand
        |), pred AS (
        |  SELECT doc_id, source, cand AS predicted,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score, cand) AS rn
        |  FROM sc
        |)
        |SELECT source, predicted, COUNT(*) AS n
        |FROM pred WHERE rn = 1 GROUP BY 1, 2""".stripMargin,

    // q248: 4x1024 count-min sketch over the vocabulary — salted 16-bit
    // md5 row hashes mod w, exact integer cells, min-of-rows estimates
    // for the exact top-20 probes.
    "q248_cm_freq_audit" ->
      """WITH v AS (
        |  SELECT word, COUNT(*) AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  GROUP BY 1
        |), hashed AS (
        |  SELECT word, n, r,
        |    ( (instr('0123456789abcdef', substr(md5('cm' || r || '|' || word), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5('cm' || r || '|' || word), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5('cm' || r || '|' || word), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5('cm' || r || '|' || word), 4, 1)) - 1) ) % 1024 AS b
        |  FROM v, range(0, 4) t(r)
        |), cells AS (
        |  SELECT r, b, SUM(n) AS cell FROM hashed GROUP BY 1, 2
        |), probes AS (
        |  SELECT word, n FROM v ORDER BY n DESC, word LIMIT 20
        |)
        |SELECT p.word, p.n, CAST(MIN(c.cell) AS BIGINT) AS cm_est,
        |  CAST(MIN(c.cell) AS BIGINT) - p.n AS overcount
        |FROM probes p
        |JOIN hashed h ON p.word = h.word
        |JOIN cells c ON h.r = c.r AND h.b = c.b
        |GROUP BY 1, 2""".stripMargin,

    // q249: Zipf tail fit — floor-log2 via binary string length (exact
    // in any engine), bounded-decade ccdf suffix sum, integer-moment OLS
    // with the q244 fixed parenthesisation.
    "q249_zipf_slope" ->
      """WITH freq AS (
        |  SELECT source, word, COUNT(*) AS f
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS word
        |        FROM documents)
        |  GROUP BY 1, 2
        |), spec AS (
        |  SELECT source, len(bin(f)) - 1 AS x, COUNT(*) AS nw
        |  FROM freq GROUP BY 1, 2
        |), pts AS (
        |  SELECT source, x,
        |    len(bin(SUM(nw) OVER (PARTITION BY source ORDER BY x DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) - 1 AS y
        |  FROM spec
        |), m AS (
        |  SELECT source, COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx,
        |    SUM(x * y) AS sxy, SUM(y * y) AS syy
        |  FROM pts GROUP BY 1
        |), nrm AS (
        |  SELECT source, n,
        |    n * sxx - sx * sx AS sxxn,
        |    n * sxy - sx * sy AS sxyn,
        |    n * syy - sy * sy AS syyn
        |  FROM m
        |), fit AS (
        |  SELECT source, CAST(n AS BIGINT) AS n_decades,
        |    CAST(sxyn AS DOUBLE) / nullif(CAST(sxxn AS DOUBLE), 0.0) AS slope,
        |    CAST(sxyn * sxyn AS DOUBLE)
        |      / nullif(CAST(sxxn * syyn AS DOUBLE), 0.0) AS r2
        |  FROM nrm
        |)
        |SELECT source, n_decades, slope,
        |  -1.0 / nullif(slope, 0.0) AS zipf_s, r2
        |FROM fit""".stripMargin,

    // q254: per-source bigram LMs cross-scored on a salted-md5 doc
    // sample — the q236 micro grid with the monitor's left-join unseen
    // pricing, |sources|^2 cells out. Round 14: the sample predicate is
    // the fixed-probe-BUDGET contract (8 md5 hex digits mod 1e6 <
    // 200000 ppm — absolute probe mass), matching lmAffinityBudget;
    // the fraction-pinned 4-digit path is package-private now.
    "q254_lm_affinity" ->
      """WITH bgr AS (
        |  SELECT doc_id, source, bigram, string_split(bigram, ' ')[1] AS w1
        |  FROM (
        |    SELECT doc_id, source,
        |      unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bigram
        |    FROM (SELECT doc_id, source, string_split(text, ' ') AS w
        |          FROM documents)
        |  )
        |), b2 AS (
        |  SELECT source AS lm, bigram, COUNT(*) AS n12 FROM bgr GROUP BY 1, 2
        |), h1 AS (
        |  SELECT source AS lm, w1, COUNT(*) AS n1 FROM bgr GROUP BY 1, 2
        |), voc AS (
        |  SELECT lm, COUNT(*) AS v FROM h1 GROUP BY 1
        |), samp AS (
        |  SELECT * FROM bgr WHERE
        |    ( (instr('0123456789abcdef', substr(md5('aff|' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 268435456
        |    + (instr('0123456789abcdef', substr(md5('aff|' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 16777216
        |    + (instr('0123456789abcdef', substr(md5('aff|' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 1048576
        |    + (instr('0123456789abcdef', substr(md5('aff|' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1) * 65536
        |    + (instr('0123456789abcdef', substr(md5('aff|' || CAST(doc_id AS VARCHAR)), 5, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5('aff|' || CAST(doc_id AS VARCHAR)), 6, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5('aff|' || CAST(doc_id AS VARCHAR)), 7, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5('aff|' || CAST(doc_id AS VARCHAR)), 8, 1)) - 1) ) % 1000000 < 200000
        |), sc AS (
        |  SELECT s.source, l.lm, COUNT(*) AS n_bigrams,
        |    SUM((1000000 * (COALESCE(h1.n1, 0) + l.v)) // (COALESCE(b2.n12, 0) + 1)) AS sp
        |  FROM samp s CROSS JOIN voc l
        |  LEFT JOIN b2 ON b2.lm = l.lm AND b2.bigram = s.bigram
        |  LEFT JOIN h1 ON h1.lm = l.lm AND h1.w1 = s.w1
        |  GROUP BY 1, 2
        |)
        |SELECT source, lm, n_bigrams,
        |  CAST(CAST(sp AS VARCHAR) AS DOUBLE) / CAST(n_bigrams AS DOUBLE) / 1e6
        |    AS mean_inv_p
        |FROM sc""".stripMargin,

    // q265: Kneser–Ney bigram fluency — D = 3/4 exactly on a common
    // denominator, one HUGEINT floor division per bigram (mirrors
    // Spark's DECIMAL(38,0) div), q236's VARCHAR→DOUBLE sum parity.
    "q265_kn_fluency" ->
      """WITH bg AS (
        |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bigram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |), b2 AS (
        |  SELECT bigram, COUNT(*) AS c12,
        |    string_split(bigram, ' ')[1] AS w1, string_split(bigram, ' ')[2] AS w2
        |  FROM bg GROUP BY 1
        |), h AS (
        |  SELECT w1, SUM(c12) AS c1, COUNT(*) AS nc1 FROM b2 GROUP BY 1
        |), hist AS (
        |  SELECT w2, COUNT(*) AS nh2 FROM b2 GROUP BY 1
        |), bt AS (
        |  SELECT COUNT(*) AS b FROM b2
        |), sc AS (
        |  SELECT bg.doc_id, COUNT(*) AS n_bigrams,
        |    SUM((4000000::HUGEINT * h.c1 * bt.b) //
        |        (CAST(greatest(4 * b2.c12 - 3, 0) AS HUGEINT) * bt.b
        |         + 3::HUGEINT * h.nc1 * hist.nh2)) AS s
        |  FROM bg JOIN b2 USING (bigram) JOIN h USING (w1)
        |    JOIN hist USING (w2) CROSS JOIN bt
        |  GROUP BY 1
        |)
        |SELECT doc_id, n_bigrams,
        |  CAST(CAST(s AS VARCHAR) AS DOUBLE) / CAST(n_bigrams AS DOUBLE) / 1e6
        |    AS mean_inv_kn
        |FROM sc""".stripMargin,

    // q291: per-16-token-window marker argmax (q18's priority rule:
    // en > es > fr > de on ties, und when no evidence), replayed as
    // nested list comprehensions; switch walk over adjacent windows.
    "q291_code_switch" ->
      """WITH t AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
        |), pr AS (
        |  SELECT doc_id, lang,
        |    [CASE
        |       WHEN len(list_filter(sl, x -> list_contains(['the','and','of','to','is'], x))) >= len(list_filter(sl, x -> list_contains(['el','la','de','que','los'], x)))
        |        AND len(list_filter(sl, x -> list_contains(['the','and','of','to','is'], x))) >= len(list_filter(sl, x -> list_contains(['le','les','des','et','une'], x)))
        |        AND len(list_filter(sl, x -> list_contains(['the','and','of','to','is'], x))) >= len(list_filter(sl, x -> list_contains(['der','die','und','das','ist'], x)))
        |        AND len(list_filter(sl, x -> list_contains(['the','and','of','to','is'], x))) > 0 THEN 'en'
        |       WHEN len(list_filter(sl, x -> list_contains(['el','la','de','que','los'], x))) >= len(list_filter(sl, x -> list_contains(['le','les','des','et','une'], x)))
        |        AND len(list_filter(sl, x -> list_contains(['el','la','de','que','los'], x))) >= len(list_filter(sl, x -> list_contains(['der','die','und','das','ist'], x)))
        |        AND len(list_filter(sl, x -> list_contains(['el','la','de','que','los'], x))) > 0 THEN 'es'
        |       WHEN len(list_filter(sl, x -> list_contains(['le','les','des','et','une'], x))) >= len(list_filter(sl, x -> list_contains(['der','die','und','das','ist'], x)))
        |        AND len(list_filter(sl, x -> list_contains(['le','les','des','et','une'], x))) > 0 THEN 'fr'
        |       WHEN len(list_filter(sl, x -> list_contains(['der','die','und','das','ist'], x))) > 0 THEN 'de'
        |       ELSE 'und' END
        |     FOR sl IN [w[(wi*16+1):(wi*16+16)]
        |                FOR wi IN range(0, (len(w) + 15) // 16)]] AS preds
        |  FROM t
        |)
        |SELECT doc_id, lang,
        |  CAST(len(preds) AS BIGINT) AS n_windows,
        |  CAST(len(list_filter(preds, p -> p = 'und')) AS BIGINT) AS n_und,
        |  CAST(len(list_filter(preds, p -> p <> 'und' AND p <> lang)) AS BIGINT)
        |    AS n_foreign,
        |  CAST(CASE WHEN len(preds) > 1 THEN
        |    len(list_filter(range(2, len(preds) + 1), i -> preds[i] <> preds[i-1]))
        |    ELSE 0 END AS BIGINT) AS n_switches
        |FROM pr""".stripMargin,
  )
}
