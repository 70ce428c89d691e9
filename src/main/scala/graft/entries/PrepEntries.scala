package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Advanced, Corpus, Dedup, Multimodal, Prep, Quality, Relational, Similarity, TextAnalysis, Warehouse}
import graft.sources.Tables

/** Prep family: `SparkEntry.queries` registrations + their DuckDB
  * oracles (round-17 verdict task 6 — the 8k-line single-file registry
  * split per family; `SparkEntry` folds every family back into the one
  * driver-contract map, and OracleCoverageSpec still guards that every
  * query has its oracle).
  */
private[graft] object PrepEntries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q48_text_clean" -> (Prep.textClean _),
    "q49_quality_filter" -> (Prep.qualityFilter _),
    "q50_stratified_sample" -> (Prep.stratifiedSample _),
    "q51_bigram_lm" -> (Prep.bigramLm _),
    "q53_repetition_ratio" -> (Prep.repetitionRatios _),
    "q54_pii_scrub" -> (Prep.piiScrub _),
    "q59_chunking" -> ((s, d) => Prep.chunk(s, d)),
    "q60_lm_score" -> (Prep.lmScore _),
    "q66_mixture_sample" -> (Prep.mixtureSample _),
    "q68_curated_readback" -> (Prep.curatedReadback _),
    "q73_pack_sequences" -> ((s, d) => Prep.packSequences(s, d)),
    "q85_orc_roundtrip" -> (Prep.orcRoundtrip _),
    "q104_json_roundtrip" -> (Prep.jsonRoundtrip _),
    "q150_curation_funnel" -> ((s, d) => Prep.curationFunnel(s, d)),
    "q193_domain_cap" -> ((s, d) => Prep.domainCap(s, d)),
    "q194_mixture_weights" -> ((s, d) => Prep.mixtureWeights(s, d)),
    "q203_dsir_weights" -> ((s, d) => Prep.dsirWeights(s, d)),
    "q216_filter_sweep" -> ((s, d) => Prep.filterSweep(s, d)),
    "q224_curriculum_order" -> ((s, d) => Prep.curriculumOrder(s, d)),
    "q232_group_kfold" -> ((s, d) => Prep.groupKFold(s, d)),
    "q233_rebalance_plan" -> ((s, d) => Prep.rebalancePlan(s, d)),
    "q261_effective_tokens" -> ((s, d) => Prep.effectiveTokens(s, d)),
    "q263_pack_sweep" -> ((s, d) => Prep.packSweep(s, d)),
    "q264_cluster_split" -> ((s, d) => Prep.clusterSplit(s, d)),
    "q266_shard_manifest" -> ((s, d) => Prep.shardManifest(s, d)),
    "q267_epoch_plan" -> ((s, d) => Prep.epochPlan(s, d)),
    "q269_blocklist_screen" -> ((s, d) => Prep.blocklistScreen(s, d)),
    "q272_admission_audit" -> ((s, d) => Prep.admissionAudit(s, d)),
    "q285_budget_select" -> ((s, d) => Prep.budgetSelect(s, d)),
    "q286_dedup_mixture" -> ((s, d) => Prep.dedupMixture(s, d)),
    "q287_target_mixture" -> ((s, d) => Prep.targetMixture(s, d)),
  )

  def oracleSql: Map[String, String] = Map(

    "q48_text_clean" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS clean_text,
        |  length(text) AS n_raw,
        |  length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS n_clean
        |FROM documents""".stripMargin,

    "q49_quality_filter" ->
      """WITH f AS (
        |  SELECT doc_id, n_chars, string_split(text, ' ') AS w,
        |    CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) / len(string_split(text, ' ')) AS mean_len,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE) / length(text) AS punct
        |  FROM documents
        |), r AS (
        |  SELECT doc_id,
        |    [x FOR x IN [
        |      CASE WHEN n_chars < 50 THEN 'too_short' END,
        |      CASE WHEN n_chars > 5000 THEN 'too_long' END,
        |      CASE WHEN len(w) < 10 THEN 'few_words' END,
        |      CASE WHEN mean_len > 12.0 THEN 'long_words' END,
        |      CASE WHEN punct > 0.10 THEN 'high_punct' END] IF x IS NOT NULL] AS reasons
        |  FROM f
        |)
        |SELECT doc_id, len(reasons) = 0 AS keep,
        |  COALESCE(list_aggregate(reasons, 'string_agg', ','), '') AS reasons
        |FROM r""".stripMargin,

    "q50_stratified_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE ( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |      + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |      + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |      + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 100
        |  < CASE WHEN lang = 'en' THEN 10 ELSE 50 END""".stripMargin,

    "q51_bigram_lm" ->
      """WITH bg AS (
        |  SELECT unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bigram
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents)
        |), c AS (
        |  SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram
        |)
        |SELECT bigram, n,
        |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY split_part(bigram, ' ', 1)) AS DOUBLE) AS p_cond
        |FROM c""".stripMargin,

    "q53_repetition_ratio" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), b AS (
        |  SELECT doc_id, w,
        |    CASE WHEN len(w) >= 2 THEN [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]
        |         ELSE [] END AS bg
        |  FROM t
        |)
        |SELECT doc_id, len(w) AS n_words,
        |  CAST(len(w) - len(list_distinct(w)) AS DOUBLE) / len(w) AS dup_word_ratio,
        |  CASE WHEN len(bg) > 0
        |       THEN CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / len(bg)
        |       ELSE 0.0 END AS dup_bigram_ratio
        |FROM b""".stripMargin,

    "q54_pii_scrub" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(text, '\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}')) AS n_phones,
        |  len(regexp_extract_all(
        |    regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g'),
        |    '\b[0-9]+\b')) AS n_numbers,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g'),
        |      '\b[0-9]+\b', '<NUM>', 'g')) AS scrubbed_fp
        |FROM documents""".stripMargin,

    "q59_chunking" ->
      """SELECT doc_id,
        |  CAST(chunk_off AS INT) AS chunk_off,
        |  length(substring(text, CAST(chunk_off AS INT), 200)) AS chunk_len,
        |  md5(substring(text, CAST(chunk_off AS INT), 200)) AS chunk_fp
        |FROM (
        |  SELECT doc_id, text,
        |    unnest(range(1, greatest(length(text) - 50, 1) + 1, 150)) AS chunk_off
        |  FROM documents
        |)""".stripMargin,

    "q60_lm_score" ->
      """WITH docbg AS (
        |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bigram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |), c AS (
        |  SELECT bigram, COUNT(*) AS n
        |  FROM (SELECT unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bigram
        |        FROM (SELECT string_split(text, ' ') AS w FROM documents)) GROUP BY bigram
        |), lm AS (
        |  SELECT bigram,
        |    CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY split_part(bigram, ' ', 1)) AS DOUBLE) AS p_cond
        |  FROM c
        |)
        |SELECT d.doc_id, COUNT(*) AS n_bigrams,
        |  CAST(SUM(CAST(floor(p_cond * 1e15) AS BIGINT)) AS DOUBLE) / (COUNT(*) * 1e15) AS lm_score
        |FROM docbg d JOIN lm USING (bigram)
        |GROUP BY d.doc_id""".stripMargin,

    "q66_mixture_sample" ->
      """WITH counts AS (
        |  SELECT source, COUNT(*) AS n_src FROM documents GROUP BY 1
        |), rates AS (
        |  SELECT source, sqrt(CAST((SELECT MIN(n_src) FROM counts) AS DOUBLE) / n_src) AS keep_rate
        |  FROM counts
        |)
        |SELECT doc_id, d.source, keep_rate
        |FROM documents d JOIN rates r ON d.source = r.source
        |WHERE CAST(( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |           + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |           + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |           + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 100 AS DOUBLE)
        |      < keep_rate * 100.0""".stripMargin,

    // q68: the Spark side writes the split-partitioned curated corpus and
    // reads the train split back; the oracle recomputes the same aggregate
    // straight from `documents` with the identical md5-bucket split — a
    // green row proves the partitioned write/read round trip is lossless
    // (text fingerprint included) and the split boundary matches.
    "q68_curated_readback" ->
      """WITH b AS (
        |  SELECT lang, n_chars, text,
        |    ( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 100 AS bucket
        |  FROM documents
        |)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(
        |      (instr('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(text), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(text), 4, 1)) - 1)) AS BIGINT) AS text_fp
        |FROM b WHERE bucket < 80
        |GROUP BY lang""".stripMargin,

    // q73: shard and order are pure md5/id functions, so the oracle
    // reproduces the exact same greedy packing — the window sum BEFORE
    // each doc, floor-divided by the budget, IS the sequence of the doc's
    // first token (the straddle rule).
    "q73_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |         + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |         + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |         + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 32 AS INT) AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |)
        |SELECT doc_id, shard, n_tokens,
        |  CAST(floor((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
        |              - n_tokens) / 2048.0) AS INT) AS seq_id
        |FROM t""".stripMargin,

    // q85: the result is format-independent — the oracle computes the
    // same fingerprinted aggregate straight from the parquet source, so
    // a hash match proves the ORC write/read conversion was lossless.
    "q85_orc_roundtrip" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(
        |      (instr('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(text), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(text), 4, 1)) - 1)) AS BIGINT) AS text_fp
        |FROM documents
        |GROUP BY lang""".stripMargin,

    // q150: q49/q20/q50/q40's rules composed; the split hash is salted
    // ('split|') so the sample and split decisions stay independent.
    "q150_curation_funnel" ->
      """WITH q AS (
        |  SELECT doc_id, lang, text FROM documents
        |  WHERE NOT (n_chars < 50 OR n_chars > 5000
        |    OR len(string_split(text, ' ')) < 10
        |    OR CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) / len(string_split(text, ' ')) > 12.0
        |    OR CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE) / length(text) > 0.10)
        |), k AS (
        |  SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)
        |), dd AS (SELECT q.* FROM q JOIN k USING (doc_id)),
        |samp AS (
        |  SELECT doc_id FROM dd
        |  WHERE CAST('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100
        |    < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
        |), spl AS (
        |  SELECT doc_id,
        |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END AS split
        |  FROM (SELECT doc_id,
        |    CAST('0x' || SUBSTR(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 AS b
        |    FROM samp)
        |)
        |SELECT '1_all' AS stage, COUNT(*) AS n_docs FROM documents
        |UNION ALL SELECT '2_quality', COUNT(*) FROM q
        |UNION ALL SELECT '3_dedup', COUNT(*) FROM dd
        |UNION ALL SELECT '4_sampled', COUNT(*) FROM samp
        |UNION ALL SELECT '5_' || split, COUNT(*) FROM spl GROUP BY split""".stripMargin,

    // q104: layout-independent fingerprint aggregate (same as q85's),
    // recomputed straight from the parquet source.
    "q104_json_roundtrip" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(
        |      (instr('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(text), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(text), 4, 1)) - 1)) AS BIGINT) AS text_fp
        |FROM documents
        |GROUP BY lang""".stripMargin,

    // q193: the md5 lottery makes the per-source winners a pure function
    // of doc_id, so a window formulation reproduces the bounded
    // aggregate's picks exactly (fixed-length lowercase hex sorts
    // identically to its numeric value).
    "q193_domain_cap" ->
      """SELECT source, doc_id, rk FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 12), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 50""".stripMargin,

    // q194: sqrt(sqrt(x)) and the final division are the only float ops
    // (both IEEE-correctly-rounded in every engine); the allocation
    // itself is pure int64 arithmetic — see Prep.mixtureWeights.
    "q194_mixture_weights" ->
      """WITH t AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1
        |), w AS (
        |  SELECT *, CAST(floor(sqrt(sqrt(CAST(n_tokens AS DOUBLE))) * 1e6) AS BIGINT) AS w_int FROM t
        |), a AS (
        |  SELECT *, (1000000 * w_int) // CAST((SELECT SUM(w_int) FROM w) AS BIGINT) AS base,
        |            (1000000 * w_int) % CAST((SELECT SUM(w_int) FROM w) AS BIGINT) AS rem
        |  FROM w
        |), r AS (
        |  SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk,
        |    1000000 - CAST((SELECT SUM(base) FROM a) AS BIGINT) AS residual
        |  FROM a
        |)
        |SELECT source, n_docs, n_tokens, w_int,
        |  base + CASE WHEN rk <= residual THEN 1 ELSE 0 END AS alloc_tokens,
        |  CAST(base + CASE WHEN rk <= residual THEN 1 ELSE 0 END AS DOUBLE) / n_tokens AS epochs
        |FROM r""".stripMargin,

    // q203: DSIR importance weights. Bucket = the same 16-bit md5 prefix
    // as Spark's conv(substring(md5(bigram),1,4),16,10), spelled in
    // instr-nibble arithmetic (the q40 idiom); the likelihood ratio is
    // pure integer arithmetic (((t+1)·10⁶) // (r+1), target ⊆ raw so
    // r ≥ t keeps everything ≤ 10⁶), so the only doubles are the two
    // final correctly-rounded expressions — bit-identical cross-engine.
    "q203_dsir_weights" ->
      """WITH bg AS (
        |  SELECT doc_id, lang, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bigram
        |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
        |), db AS (
        |  SELECT doc_id, lang,
        |    ( (instr('0123456789abcdef', substr(md5(bigram), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(bigram), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(bigram), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(bigram), 4, 1)) - 1) ) % 256 AS bucket,
        |    COUNT(*) AS c
        |  FROM bg GROUP BY 1, 2, 3
        |), raw AS (
        |  SELECT bucket, SUM(c) AS r FROM db GROUP BY 1
        |), tgt AS (
        |  SELECT bucket, SUM(c) AS t FROM db WHERE lang = 'en' GROUP BY 1
        |), dom AS (
        |  SELECT unnest(range(0, 256)) AS bucket
        |), lr AS (
        |  SELECT dom.bucket,
        |    ((COALESCE(t, 0) + 1) * 1000000) // (COALESCE(r, 0) + 1) AS lr
        |  FROM dom LEFT JOIN raw ON raw.bucket = dom.bucket
        |  LEFT JOIN tgt ON tgt.bucket = dom.bucket
        |), tot AS (
        |  SELECT SUM(c) AS big_r,
        |    SUM(CASE WHEN lang = 'en' THEN c ELSE 0 END) AS big_t FROM db
        |), ds AS (
        |  SELECT doc_id, SUM(c * lr) AS s, CAST(SUM(c) AS BIGINT) AS n_bigrams
        |  FROM db JOIN lr USING (bucket) GROUP BY 1
        |)
        |SELECT doc_id, n_bigrams,
        |  CAST(s AS DOUBLE) / (n_bigrams * 1e6) AS mean_lr,
        |  (CAST(s AS DOUBLE) / (n_bigrams * 1e6)) *
        |    (CAST(big_r + 256 AS DOUBLE) / CAST(big_t + 256 AS DOUBLE)) AS dsir_weight
        |FROM ds, tot""".stripMargin,

    "q216_filter_sweep" ->
      """WITH d AS (
        |  SELECT len(string_split(text, ' ')) AS n_words,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      w -> w IN ('the','and','of','to','is','in','a'))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS score
        |  FROM documents
        |), b AS (
        |  SELECT LEAST(CAST(floor(score * 20) AS BIGINT), 19) AS bin, n_words FROM d
        |), g AS (
        |  SELECT bin, COUNT(*) AS n_docs, CAST(SUM(n_words) AS BIGINT) AS n_tokens
        |  FROM b GROUP BY 1
        |)
        |SELECT bin, CAST(bin AS DOUBLE) / 20 AS score_lo, n_docs, n_tokens,
        |  CAST(SUM(n_docs) OVER (ORDER BY bin DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_docs,
        |  CAST(SUM(n_tokens) OVER (ORDER BY bin DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |FROM g""".stripMargin,

    // q224: q216's stopword-ratio bins, best band first, md5-shuffled
    // within band — the global rank is total-ordered by
    // (bin DESC, md5('cur|'||doc_id), doc_id).
    "q224_curriculum_order" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    LEAST(CAST(floor(CAST(len(list_filter(string_split(text, ' '),
        |      w -> w IN ('the','and','of','to','is','in','a'))) AS DOUBLE)
        |      / len(string_split(text, ' ')) * 10) AS BIGINT), 9) AS bin,
        |    md5('cur|' || CAST(doc_id AS VARCHAR)) AS tb
        |  FROM documents
        |)
        |SELECT doc_id, bin,
        |  row_number() OVER (ORDER BY bin DESC, tb, doc_id) AS curriculum_rank
        |FROM d""".stripMargin,

    "q232_group_kfold" ->
      """WITH c AS (
        |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1
        |)
        |SELECT source, n_docs,
        |  CAST((row_number() OVER (ORDER BY n_docs DESC, source) - 1) % 5 AS BIGINT) AS fold
        |FROM c""".stripMargin,

    "q233_rebalance_plan" ->
      """WITH c AS (
        |  SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1
        |), t AS (
        |  SELECT CAST(MAX(n) AS BIGINT) AS target FROM c
        |)
        |SELECT c.label, c.n, t.target,
        |  (t.target * 1000000) // c.n AS factor_fp,
        |  CAST(t.target - c.n AS DOUBLE) / CAST(c.n AS DOUBLE) AS oversample_extra
        |FROM c CROSS JOIN t""".stripMargin,

    // q261: exact-dup-adjusted token accounting — (md5(text), source)
    // cells, global copy counts joined back, 1/n attribution in integer
    // micro-units. Same words/md5 idioms as q73/q20.
    "q261_effective_tokens" ->
      """WITH t AS (
        |  SELECT source, md5(text) AS h,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents
        |), per AS (
        |  SELECT h, source, n_tok, COUNT(*) AS cnt_s FROM t GROUP BY 1, 2, 3
        |), tot AS (
        |  SELECT h, SUM(cnt_s) AS n_total FROM per GROUP BY 1
        |)
        |SELECT p.source,
        |  CAST(SUM(p.cnt_s) AS BIGINT) AS raw_docs,
        |  CAST(SUM(p.n_tok * p.cnt_s) AS BIGINT) AS raw_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS distinct_texts,
        |  CAST(SUM((1000000 * p.n_tok * p.cnt_s) // t2.n_total) AS BIGINT)
        |    AS eff_tokens_micro
        |FROM per p JOIN tot t2 USING (h)
        |GROUP BY 1""".stripMargin,

    // q263: q73's shard/cum CTE verbatim, swept over four literal
    // budgets — straddle rule (cum-n)//B != (cum-1)//B, sequences =
    // Σ_shard ceil(shard_tokens/B), micro-unit ratios.
    "q263_pack_sweep" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |         + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |         + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |         + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 32 AS INT) AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, shard, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
        |  FROM t
        |), b AS (
        |  SELECT CAST(unnest([512, 1024, 2048, 4096]) AS BIGINT) AS budget
        |), perdoc AS (
        |  SELECT b.budget,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(c.n_tokens) AS BIGINT) AS total_tokens,
        |    CAST(SUM(CASE WHEN c.n_tokens >= 1 AND
        |        (c.cum - c.n_tokens) // b.budget <> (c.cum - 1) // b.budget
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_straddled
        |  FROM c CROSS JOIN b GROUP BY 1
        |), sh AS (
        |  SELECT shard, MAX(cum) AS st FROM c GROUP BY 1
        |), seqs AS (
        |  SELECT b.budget,
        |    CAST(SUM(CASE WHEN sh.st >= 1 THEN (sh.st - 1) // b.budget + 1
        |      ELSE 0 END) AS BIGINT) AS n_seqs
        |  FROM sh CROSS JOIN b GROUP BY 1
        |)
        |SELECT p.budget, p.n_docs, p.total_tokens, p.n_straddled, s.n_seqs,
        |  (1000000 * p.n_straddled) // p.n_docs AS straddle_micro,
        |  (1000000 * p.total_tokens) // (s.n_seqs * p.budget) AS util_micro
        |FROM perdoc p JOIN seqs s USING (budget)""".stripMargin,

    // q264: cluster-atomic split — the q40 lottery applied to md5(text)
    // (salted "csplit|"), so dup copies share a split by construction.
    "q264_cluster_split" ->
      """WITH t AS (
        |  SELECT doc_id, md5(text) AS cluster_key,
        |    ( (instr('0123456789abcdef', substr(md5('csplit|' || md5(text)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5('csplit|' || md5(text)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5('csplit|' || md5(text)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5('csplit|' || md5(text)), 4, 1)) - 1) ) % 100 AS b
        |  FROM documents
        |)
        |SELECT doc_id, cluster_key,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM t""".stripMargin,

    // q266: token-balanced shard manifest — global token-desc rank,
    // snake-striped across 8 shards; rank via row_number here, via
    // bucketedPrefix in Spark (order-identical by the doc_id tiebreak).
    "q266_shard_manifest" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, n_tok,
        |    CAST(row_number() OVER (ORDER BY n_tok DESC, doc_id) AS BIGINT) AS rank
        |  FROM t
        |)
        |SELECT doc_id, n_tok, rank,
        |  CAST(CASE WHEN ((rank - 1) // 8) % 2 = 0 THEN (rank - 1) % 8
        |       ELSE 7 - (rank - 1) % 8 END AS BIGINT) AS shard
        |FROM r""".stripMargin,

    // q267: q194's allocation CTE chain verbatim, then the epoch-plan
    // arithmetic — every added column HUGEINT (mirrors DECIMAL(38,0)).
    "q267_epoch_plan" ->
      """WITH t AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1
        |), w AS (
        |  SELECT *, CAST(floor(sqrt(sqrt(CAST(n_tokens AS DOUBLE))) * 1e6) AS BIGINT) AS w_int FROM t
        |), a AS (
        |  SELECT *, (1000000 * w_int) // CAST((SELECT SUM(w_int) FROM w) AS BIGINT) AS base,
        |            (1000000 * w_int) % CAST((SELECT SUM(w_int) FROM w) AS BIGINT) AS rem
        |  FROM w
        |), r AS (
        |  SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk,
        |    1000000 - CAST((SELECT SUM(base) FROM a) AS BIGINT) AS residual
        |  FROM a
        |), p AS (
        |  SELECT source, n_tokens,
        |    base + CASE WHEN rk <= residual THEN 1 ELSE 0 END AS alloc_tokens
        |  FROM r
        |), e AS (
        |  SELECT *, (1000000::HUGEINT * alloc_tokens) // n_tokens AS epochs_micro
        |  FROM p
        |)
        |SELECT source, n_tokens, alloc_tokens,
        |  CAST(epochs_micro AS BIGINT) AS epochs_micro,
        |  epochs_micro > 4000000 AS capped,
        |  CAST(greatest(alloc_tokens - 4 * n_tokens, 0) AS BIGINT) AS wasted_tokens,
        |  CAST((4::HUGEINT * n_tokens * epochs_micro)
        |       // (epochs_micro + 4000000) AS BIGINT) AS effective_tokens
        |FROM e""".stripMargin,

    // q269: exact-token blocklist screen — per-occurrence hit counts via
    // list_filter, distinct terms via list_intersect (both engines
    // dedupe intersections; only sizes are compared).
    "q269_blocklist_screen" ->
      """WITH t AS (
        |  SELECT doc_id, source, w,
        |    [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))] AS bg
        |  FROM (SELECT doc_id, source, string_split(text, ' ') AS w
        |        FROM documents)
        |), h AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(w, x -> list_contains(['slow','merge','spill'], x)))
        |       + len(list_filter(bg, x -> list_contains(['hash value','table scan'], x)))
        |      AS BIGINT) AS n_hits,
        |    CAST(len(list_intersect(w, ['slow','merge','spill']))
        |       + len(list_intersect(bg, ['hash value','table scan']))
        |      AS BIGINT) AS n_terms
        |  FROM t
        |)
        |SELECT doc_id, source, n_hits, n_terms, n_hits > 0 AS flagged
        |FROM h""".stripMargin,

    // q272: composed admission gate — four row-local rules, reasons as
    // the sorted comma-joined tag list (list comprehension drops the
    // non-firing NULL tags), q54's regexes for the pii rule.
    "q272_admission_audit" ->
      """WITH t AS (
        |  SELECT doc_id, source, text, string_split(text, ' ') AS w
        |  FROM documents
        |), b AS (
        |  SELECT *, [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))] AS bg
        |  FROM t
        |), v AS (
        |  SELECT doc_id, source,
        |    -- DuckDB's array_to_string([]) is NULL; Spark's concat_ws is ''
        |    coalesce(array_to_string(list_sort([r FOR r IN [
        |      CASE WHEN len(w) < 5 THEN 'too_short' END,
        |      CASE WHEN len(list_filter(w, x -> list_contains(['slow','merge','spill'], x)))
        |             + len(list_filter(bg, x -> list_contains(['hash value','table scan'], x))) > 0
        |           THEN 'blocklist' END,
        |      CASE WHEN len(bg) > 0 AND (len(bg) - len(list_distinct(bg))) * 2 > len(bg)
        |           THEN 'repetition' END,
        |      CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |             + len(regexp_extract_all(text, '\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}')) > 0
        |           THEN 'pii' END
        |    ] IF r IS NOT NULL]), ','), '') AS reasons
        |  FROM b
        |)
        |SELECT doc_id, source, reasons, reasons = '' AS admitted
        |FROM v""".stripMargin,

    // q285: token-budget greedy selection — micro-grid type-token-ratio
    // density, total order (density desc, doc_id), inclusive running
    // token mass <= budget; one global cumulative window stands in for
    // the distributed bucketed prefix.
    "q285_budget_select" ->
      """WITH sc AS (
        |  SELECT doc_id, source, CAST(len(w) AS BIGINT) AS n_tok,
        |    (1000000 * CAST(len(list_distinct(w)) AS BIGINT)) // len(w)
        |      AS density
        |  FROM (SELECT doc_id, source, string_split(text, ' ') AS w
        |        FROM documents)
        |), r AS (
        |  SELECT *, SUM(n_tok) OVER (ORDER BY density DESC, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM sc
        |)
        |SELECT source, COUNT(*) AS n_admitted,
        |  CAST(SUM(n_tok) AS BIGINT) AS tokens_admitted,
        |  CAST(MIN(density) AS BIGINT) AS worst_density_admitted
        |FROM r WHERE cum <= 20000 GROUP BY 1""".stripMargin,

    // q286: dedup-adjusted mixture — q56's cluster membership, q195's
    // representative election, then q194's exact largest-remainder
    // allocation recomputed on the surviving mass.
    "q286_dedup_mixture" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS shs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |  WHERE len(w) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(shs) AS sh FROM d
        |), mh AS (
        |  SELECT doc_id,
        |    min(substr(md5('0:' || sh),  1, 8)) AS mh0, min(substr(md5('0:' || sh),  9, 8)) AS mh1,
        |    min(substr(md5('0:' || sh), 17, 8)) AS mh2, min(substr(md5('0:' || sh), 25, 8)) AS mh3,
        |    min(substr(md5('1:' || sh),  1, 8)) AS mh4, min(substr(md5('1:' || sh),  9, 8)) AS mh5,
        |    min(substr(md5('1:' || sh), 17, 8)) AS mh6, min(substr(md5('1:' || sh), 25, 8)) AS mh7
        |  FROM sh GROUP BY doc_id
        |), keys AS (
        |  SELECT doc_id, t.band,
        |    CASE t.band WHEN 0 THEN md5(mh0 || '|' || mh1) WHEN 1 THEN md5(mh2 || '|' || mh3)
        |                WHEN 2 THEN md5(mh4 || '|' || mh5) ELSE md5(mh6 || '|' || mh7) END AS bkey
        |  FROM mh, range(0, 4) t(band)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM keys a JOIN keys b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |), verified AS (
        |  SELECT doc_a, doc_b, len(list_intersect(da.shs, db.shs)) AS inter, len(da.shs) AS n_a, len(db.shs) AS n_b
        |  FROM cand JOIN d da ON doc_a = da.doc_id JOIN d db ON doc_b = db.doc_id
        |), pairs AS (
        |  SELECT doc_a, doc_b FROM verified
        |  WHERE CAST(inter AS DOUBLE) / (n_a + n_b - inter) >= 0.8
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION
        |  SELECT doc_b AS src, doc_a AS dst FROM pairs
        |), reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |), mem AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS cluster
        |  FROM reach GROUP BY src
        |), reps AS (
        |  SELECT doc_id FROM (
        |    SELECT m.doc_id,
        |      ROW_NUMBER() OVER (PARTITION BY m.cluster
        |        ORDER BY dd.n_chars DESC, m.doc_id) AS rn
        |    FROM mem m JOIN documents dd ON dd.doc_id = m.doc_id)
        |  WHERE rn = 1
        |), surv AS (
        |  SELECT doc_id, source, text FROM documents
        |  WHERE doc_id NOT IN (SELECT doc_id FROM mem)
        |  UNION ALL
        |  SELECT doc_id, source, text FROM documents
        |  WHERE doc_id IN (SELECT doc_id FROM reps)
        |), kt AS (
        |  SELECT source, COUNT(*) AS n_docs_kept,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens_kept
        |  FROM surv GROUP BY 1
        |), raw AS (
        |  SELECT source, COUNT(*) AS n_docs_raw,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens_raw
        |  FROM documents GROUP BY 1
        |), w AS (
        |  SELECT *, CAST(floor(sqrt(sqrt(CAST(n_tokens_kept AS DOUBLE))) * 1e6) AS BIGINT) AS w_int FROM kt
        |), a AS (
        |  SELECT *, (1000000 * w_int) // CAST((SELECT SUM(w_int) FROM w) AS BIGINT) AS base,
        |            (1000000 * w_int) % CAST((SELECT SUM(w_int) FROM w) AS BIGINT) AS rem
        |  FROM w
        |), r AS (
        |  SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk,
        |    1000000 - CAST((SELECT SUM(base) FROM a) AS BIGINT) AS residual
        |  FROM a
        |)
        |SELECT r.source, raw.n_docs_raw, raw.n_tokens_raw,
        |  r.n_docs_kept, r.n_tokens_kept,
        |  base + CASE WHEN rk <= residual THEN 1 ELSE 0 END AS alloc_tokens,
        |  (1000000 * (raw.n_tokens_raw - r.n_tokens_kept)) // raw.n_tokens_raw
        |    AS dup_token_share_micro
        |FROM r JOIN raw ON raw.source = r.source""".stripMargin,

    // q287: balanced-target mixture by exact integer water-filling —
    // capped prefix on the (avail, lang)-sorted relation, level = R // m
    // with the remainder to the lexicographically first uncapped langs.
    "q287_target_mixture" ->
      """WITH av AS (
        |  SELECT lang, COUNT(*) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail_tokens
        |  FROM documents GROUP BY 1
        |), rkd AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY avail_tokens, lang) AS rk,
        |    SUM(avail_tokens) OVER (ORDER BY avail_tokens, lang
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    (SELECT COUNT(*) FROM av) AS n_langs,
        |    (SELECT SUM(avail_tokens) FROM av) AS total_avail
        |  FROM av
        |), cpd AS (
        |  SELECT *, LEAST(500000, total_avail) AS bp,
        |    (avail_tokens * (n_langs - rk) + cum
        |      <= LEAST(500000, total_avail)) AS capped
        |  FROM rkd
        |), k AS (
        |  SELECT COALESCE(SUM(CASE WHEN capped THEN 1 ELSE 0 END), 0) AS n_capped,
        |    COALESCE(SUM(CASE WHEN capped THEN avail_tokens END), 0) AS capped_mass
        |  FROM cpd
        |), fin AS (
        |  SELECT c.lang, c.n_docs, c.avail_tokens, c.capped,
        |    CASE WHEN c.n_langs - k.n_capped > 0
        |         THEN (c.bp - k.capped_mass) // (c.n_langs - k.n_capped)
        |         ELSE 0 END AS lvl,
        |    CASE WHEN c.n_langs - k.n_capped > 0
        |         THEN (c.bp - k.capped_mass) % (c.n_langs - k.n_capped)
        |         ELSE 0 END AS rem,
        |    ROW_NUMBER() OVER (PARTITION BY c.capped ORDER BY c.lang) AS urk
        |  FROM cpd c, k
        |), al AS (
        |  SELECT lang, n_docs, avail_tokens, capped,
        |    CAST(CASE WHEN capped THEN avail_tokens
        |         ELSE lvl + CASE WHEN urk <= rem THEN 1 ELSE 0 END END
        |      AS BIGINT) AS alloc_tokens
        |  FROM fin
        |)
        |SELECT lang, n_docs, avail_tokens, alloc_tokens, capped,
        |  CAST((1000000 * alloc_tokens) // avail_tokens AS BIGINT)
        |    AS utilization_micro
        |FROM al""".stripMargin,
  )
}
