package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Advanced, Corpus, Dedup, Multimodal, Prep, Quality, Relational, Similarity, TextAnalysis, Warehouse}
import graft.sources.Tables

/** Dedup family: `SparkEntry.queries` registrations + their DuckDB
  * oracles (round-17 verdict task 6 — the 8k-line single-file registry
  * split per family; `SparkEntry` folds every family back into the one
  * driver-contract map, and OracleCoverageSpec still guards that every
  * query has its oracle).
  */
private[graft] object DedupEntries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_dedup_exact" -> (Dedup.exact _),
    "q21_dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "q22_dedup_minhash_lsh" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "q23_dedup_simhash" -> (Dedup.simhash _),
    "q52_dedup_embedding" -> (Dedup.embeddingNearDup _),
    "q55_contamination" -> (Dedup.contamination _),
    "q56_dup_clusters" -> ((s, d) => Dedup.dupClusters(s, d)),
    "q74_boilerplate_ngrams" -> ((s, d) => Dedup.boilerplate(s, d)),
    "q80_source_overlap" -> ((s, d) => Dedup.sourceOverlap(s, d)),
    "q94_ngram_novelty" -> ((s, d) => Dedup.ngramNovelty(s, d)),
    "q99_fuzzy_match" -> ((s, d) => Dedup.fuzzyNameMatch(s, d)),
    "q105_prefix_simjoin" -> ((s, d) => Dedup.prefixSimJoin(s, d)),
    "q112_containment_join" -> ((s, d) => Dedup.containmentJoin(s, d)),
    "q144_bloom_screen" -> ((s, d) => Dedup.bloomScreen(s, d)),
    "q195_canonical_docs" -> ((s, d) => Dedup.canonicalDocs(s, d)),
    "q196_dup_spans" -> ((s, d) => Dedup.dupSpans(s, d)),
    "q198_delta_dedup" -> ((s, d) => Dedup.deltaDedup(s, d)),
    "q200_lsh_recall_audit" -> ((s, d) => Dedup.lshRecallAudit(s, d)),
    "q201_corpus_neardup_probe" -> ((s, d) => Dedup.corpusNearDupProbe(s, d)),
    "q217_dedup_sweep" -> ((s, d) => Dedup.dedupSweep(s, d)),
    "q222_lsh_cost_planner" -> ((s, d) => Dedup.lshCostPlanner(s, d)),
    "q227_cluster_sizes" -> ((s, d) => Dedup.clusterSizeHistogram(s, d)),
    "q234_split_leakage" -> ((s, d) => Dedup.splitLeakage(s, d)),
    "q251_cdc_chunks" -> ((s, d) => Dedup.cdcChunks(s, d)),
    "q255_dup_assortativity" -> ((s, d) => Dedup.dupAssortativity(s, d)),
    "q257_exact_substring" -> ((s, d) => Dedup.exactSubstringDedup(s, d)),
    "q258_cdc_ingest_probe" -> ((s, d) => Dedup.cdcIngestProbe(s, d)),
    "q259_exact_scrub" -> ((s, d) => Dedup.exactSubstringScrub(s, d)),
    "q260_chunk_flow" -> ((s, d) => Dedup.chunkFlowMatrix(s, d)),
    "q274_substring_probe" -> ((s, d) => Dedup.exactSubstringProbe(s, d)),
    "q289_decontam_scrub" -> ((s, d) => Dedup.decontamScrub(s, d)),
    "q292_authority_canon" -> ((s, d) => Dedup.authorityCanon(s, d)),
    // q200 at threshold 0.5 — the second operating point of the recall/
    // precision audit: a lower threshold admits a much larger truth set
    // and a dirtier candidate stream, so a band-math regression that
    // explodes candidates (or silently narrows them) moves THIS row even
    // when the 0.8 row stays green
    "q294_lsh_recall_audit_t05" -> ((s, d) =>
      Dedup.lshRecallAudit(Tables.documents(s, d),
        bands = 4, rowsPerBand = 2, threshold = 0.5, auditCap = 1000)),
    // q295: incremental maintenance of the standing pair relation — the
    // oracle is q22's FULL-recompute SQL verbatim, so the hash match
    // proves pairs(corpus)∪pairs(delta)∪cross(delta⋈corpus) equals the
    // from-scratch mining exactly
    "q295_delta_pair_update" -> ((s, d) => Dedup.deltaPairUpdate(s, d)),
    // q299: the report above q289's scrub — per (train source, eval
    // source) cell: contaminated docs, matched windows, merged-island
    // token mass. Hot row = a crawler scraping benchmarks; hot column =
    // a leaked benchmark.
    "q299_contamination_matrix" -> ((s, d) => Dedup.contaminationMatrix(s, d)),
    // q300: q299's LSH-verified twin — whole-document near-dups crossing
    // the eval boundary per source cell (a paraphrased benchmark copy
    // carries no exact window but still poisons the eval); two key-only
    // lookups + a |sources|²-row aggregate over the shared q22 artifact
    "q300_neardup_contamination" -> ((s, d) => Dedup.nearDupContamination(s, d)),
    // q301: the audit OF the audit tier — per-source representation of
    // the bounded md5 tier the recall audits (q200/q294) estimate from
    "q301_audit_tier_profile" -> ((s, d) => Dedup.auditTierProfile(s, d)),
    // q303: the tier's statistical payoff — unbiased corpus dup-pair
    // estimate from the O(cap²) tier truth, never the corpus quadratic
    "q303_dup_rate_estimate" -> ((s, d) => Dedup.dupRateEstimate(s, d)),
    // q304: the q303 estimate's exact design-based standard error —
    // three joint-inclusion classes over the same shared tier truth
    "q304_dup_rate_ci" -> ((s, d) => Dedup.dupRateCi(s, d)),
  )

  def oracleSql: Map[String, String] = Map(

    "q20_dedup_exact" ->
      "SELECT md5(text) AS fp, min(doc_id) AS keeper, COUNT(*) AS n FROM documents GROUP BY md5(text)",

    "q21_dedup_ngram_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE len(string_split(text, ' ')) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)])) AS sh
        |  FROM d
        |), cnt AS (
        |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jaccard
        |FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
        |WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.5""".stripMargin,

    "q22_dedup_minhash_lsh" ->
      """WITH d AS (
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
        |)
        |SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / (n_a + n_b - inter) AS jaccard
        |FROM verified
        |WHERE CAST(inter AS DOUBLE) / (n_a + n_b - inter) >= 0.8""".stripMargin,

    "q23_dedup_simhash" ->
      """WITH wd AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w FROM documents
        |), bits AS (
        |  SELECT doc_id, j,
        |    SUM((((instr('0123456789abcdef', substr(md5(w), CAST(j // 4 AS INT) + 1, 1)) - 1) >> CAST(3 - (j % 4) AS INT)) & 1) * 2 - 1) AS votes
        |  FROM wd, range(0, 32) t(j) GROUP BY doc_id, j
        |)
        |SELECT doc_id, string_agg(CASE WHEN votes >= 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS simhash
        |FROM bits GROUP BY doc_id""".stripMargin,

    "q52_dedup_embedding" ->
      """WITH hp AS (
        |  SELECT p, i,
        |    CASE WHEN substr(md5(p || ':' || i), 1, 1) IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END AS s
        |  FROM range(0, 8) tp(p), range(1, 65) ti(i)
        |), proj AS (
        |  SELECT e.vec_id, hp.p,
        |    CASE WHEN SUM(CAST(floor(CAST(e.embedding[hp.i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * hp.s) >= 0 THEN '1' ELSE '0' END AS bit
        |  FROM embeddings e, hp GROUP BY 1, 2
        |), sig AS (
        |  SELECT vec_id, string_agg(bit, '' ORDER BY p) AS bucket FROM proj GROUP BY vec_id
        |), cand AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |  FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |), cos AS (
        |  SELECT c.vec_a, c.vec_b,
        |    CAST(SUM(CAST(floor(CAST(ea.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(eb.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE) /
        |      (sqrt(CAST(SUM(CAST(floor(CAST(ea.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(ea.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE)) *
        |       sqrt(CAST(SUM(CAST(floor(CAST(eb.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(eb.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE))) AS cosine
        |  FROM cand c
        |  JOIN embeddings ea ON c.vec_a = ea.vec_id
        |  JOIN embeddings eb ON c.vec_b = eb.vec_id,
        |  LATERAL (SELECT unnest(range(1, len(ea.embedding) + 1)) AS i) t
        |  GROUP BY 1, 2
        |)
        |SELECT vec_a AS doc_a, vec_b AS doc_b, cosine, least(vec_a, vec_b) AS keeper
        |FROM cos
        |WHERE cosine >= 0.4
        |  AND vec_a IN (SELECT doc_id FROM documents)
        |  AND vec_b IN (SELECT doc_id FROM documents)""".stripMargin,

    "q55_contamination" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)])) AS sh
        |  FROM d
        |), b AS (
        |  SELECT doc_id, sh,
        |    ( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 100 AS bucket
        |  FROM sh
        |), train AS (
        |  SELECT DISTINCT sh FROM b WHERE bucket < 80
        |), test AS (
        |  SELECT doc_id, sh FROM b WHERE bucket >= 90
        |), tot AS (
        |  SELECT doc_id, COUNT(*) AS n_sh FROM test GROUP BY 1
        |), hits AS (
        |  SELECT doc_id, COUNT(*) AS n_contam FROM test
        |  WHERE sh IN (SELECT sh FROM train) GROUP BY 1
        |)
        |SELECT t.doc_id, t.n_sh, COALESCE(h.n_contam, 0) AS n_contam,
        |  CAST(COALESCE(h.n_contam, 0) AS DOUBLE) / t.n_sh AS contam_ratio
        |FROM tot t LEFT JOIN hits h USING (doc_id)""".stripMargin,

    "q56_dup_clusters" ->
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
        |)
        |SELECT src AS doc_id, least(src, min(dst)) AS cluster
        |FROM reach GROUP BY src""".stripMargin,

    // q74: q55's shingle CTEs at k=5 with a (source, shingle) HAVING —
    // the Spark side keys on md5 digests of the shingles, which changes
    // nothing about the counts (same distinct sets), so raw-shingle SQL
    // is the honest oracle. Docs with <5 words have no 5-shingles and are
    // absent from both sides by construction.
    "q74_boilerplate_ngrams" ->
      """WITH d AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 5
        |), sh AS (
        |  SELECT doc_id, source,
        |    unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
        |                          FOR i IN range(1, len(w)-3)])) AS sh
        |  FROM d
        |), common AS (
        |  SELECT source, sh FROM sh GROUP BY 1, 2 HAVING COUNT(*) >= 5
        |), tot AS (
        |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1
        |), boiler AS (
        |  SELECT s.doc_id, COUNT(*) AS n_boiler
        |  FROM sh s JOIN common c USING (source, sh) GROUP BY 1
        |)
        |SELECT t.doc_id, t.n_sh, COALESCE(b.n_boiler, 0) AS n_boiler,
        |  CAST(COALESCE(b.n_boiler, 0) AS DOUBLE) / t.n_sh AS boiler_ratio
        |FROM tot t LEFT JOIN boiler b USING (doc_id)""".stripMargin,

    // q80: distinct (source, shingle) sets at k=3; md5 digesting on the
    // Spark side changes no counts, so raw-shingle SQL is the oracle.
    "q80_source_overlap" ->
      """WITH d AS (
        |  SELECT source, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3
        |), ss AS (
        |  SELECT DISTINCT source, sh FROM (
        |    SELECT source,
        |      unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)])) AS sh
        |    FROM d
        |  )
        |), sizes AS (
        |  SELECT source, COUNT(*) AS n_sh FROM ss GROUP BY 1
        |), inter AS (
        |  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
        |  FROM ss a JOIN ss b ON a.sh = b.sh AND a.source < b.source
        |  GROUP BY 1, 2
        |)
        |SELECT sa.source AS source_a, sb.source AS source_b,
        |  sa.n_sh AS n_a, sb.n_sh AS n_b,
        |  COALESCE(i.n_common, 0) AS n_common,
        |  CAST(COALESCE(i.n_common, 0) AS DOUBLE) /
        |    (sa.n_sh + sb.n_sh - COALESCE(i.n_common, 0)) AS jaccard
        |FROM sizes sa JOIN sizes sb ON sa.source < sb.source
        |LEFT JOIN inter i ON i.source_a = sa.source AND i.source_b = sb.source""".stripMargin,

    // q94: same shingle CTE family as q55/q74 (md5-digested word-3-grams),
    // then first-occurrence min per shingle and a per-doc prior-fraction.
    "q94_ngram_novelty" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3
        |), sh0 AS (
        |  SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)])) AS sh
        |  FROM d
        |), sh AS (
        |  SELECT doc_id, md5(sh) AS sh FROM sh0
        |), f AS (
        |  SELECT sh, MIN(doc_id) AS first_doc FROM sh GROUP BY 1
        |)
        |SELECT s.doc_id, COUNT(*) AS n_sh,
        |  CAST(SUM(CASE WHEN f.first_doc < s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_prior,
        |  CAST(1.0 AS DOUBLE)
        |    - CAST(SUM(CASE WHEN f.first_doc < s.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        |      / COUNT(*) AS novelty
        |FROM sh s JOIN f USING (sh)
        |GROUP BY s.doc_id""".stripMargin,

    // q99: distinct names -> last-token block -> in-block levenshtein;
    // DuckDB's levenshtein matches Spark's (unit edit costs).
    "q99_fuzzy_match" ->
      """WITH names AS (
        |  SELECT p_name, COUNT(*) AS n_rows FROM part GROUP BY 1
        |), nb AS (
        |  SELECT p_name, n_rows, string_split(p_name, ' ')[-1] AS blk FROM names
        |)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
        |  a.n_rows AS n_a, b.n_rows AS n_b
        |FROM nb a JOIN nb b ON a.blk = b.blk AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 3""".stripMargin,

    // q105: EXACT set-similarity join — the oracle is the ground-truth
    // quadratic (identical to q21's), because prefix filtering loses no
    // qualifying pair; a hash match here proves exact recall.
    "q105_prefix_simjoin" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE len(string_split(text, ' ')) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)])) AS sh
        |  FROM d
        |), cnt AS (
        |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jaccard
        |FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
        |WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.8""".stripMargin,

    // q112: directional containment — the oracle is the full quadratic
    // with a <> instead of <; same recall argument as q105.
    "q112_containment_join" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE len(string_split(text, ' ')) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)])) AS sh
        |  FROM d
        |), cnt AS (
        |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / ca.n_sh AS containment
        |FROM inter JOIN cnt ca ON doc_a = ca.doc_id
        |WHERE CAST(inter AS DOUBLE) / ca.n_sh >= 0.9""".stripMargin,

    // q144: the distinct train-position relation plays the bit array;
    // the all-k-positions rule is a join + count(=k); hex->int via the
    // '0x' cast idiom.
    "q144_bloom_screen" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3
        |), sh0 AS (
        |  SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)])) AS sh
        |  FROM d
        |), b AS (
        |  SELECT doc_id, sh,
        |    CAST('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100 AS bucket
        |  FROM sh0
        |), train AS (SELECT DISTINCT sh FROM b WHERE bucket < 80),
        |test AS (SELECT doc_id, sh FROM b WHERE bucket >= 90),
        |tp AS (
        |  SELECT DISTINCT CAST('0x' || SUBSTR(md5(CAST(j AS VARCHAR) || '|' || sh), 1, 12) AS BIGINT) % 262144 AS p
        |  FROM train, (SELECT unnest(range(0, 3)) AS j) js
        |), pass AS (
        |  SELECT doc_id, COUNT(*) AS n_pass FROM (
        |    SELECT t.doc_id, t.sh FROM (
        |      SELECT doc_id, sh,
        |        CAST('0x' || SUBSTR(md5(CAST(j AS VARCHAR) || '|' || sh), 1, 12) AS BIGINT) % 262144 AS p
        |      FROM test, (SELECT unnest(range(0, 3)) AS j) js
        |    ) t JOIN tp USING (p)
        |    GROUP BY 1, 2 HAVING COUNT(*) = 3
        |  ) GROUP BY 1
        |), ex AS (
        |  SELECT doc_id, COUNT(*) AS n_exact FROM test WHERE sh IN (SELECT sh FROM train) GROUP BY 1
        |)
        |SELECT t.doc_id, COUNT(*) AS n_sh,
        |  COALESCE(MAX(pass.n_pass), 0) AS n_pass,
        |  COALESCE(MAX(ex.n_exact), 0) AS n_exact,
        |  COALESCE(MAX(pass.n_pass), 0) - COALESCE(MAX(ex.n_exact), 0) AS n_false_pos
        |FROM test t LEFT JOIN pass ON t.doc_id = pass.doc_id LEFT JOIN ex ON t.doc_id = ex.doc_id
        |GROUP BY 1""".stripMargin,

    // q195: q56's recursive-CTE connected components, finished with the
    // canonical election (n_chars desc, doc_id asc per cluster).
    "q195_canonical_docs" ->
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
        |), labeled AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS cluster FROM reach GROUP BY src
        |), m AS (
        |  SELECT l.cluster, l.doc_id, dd.n_chars,
        |    COUNT(*) OVER (PARTITION BY l.cluster) AS n_members,
        |    row_number() OVER (PARTITION BY l.cluster ORDER BY dd.n_chars DESC, l.doc_id) AS rk
        |  FROM labeled l JOIN documents dd USING (doc_id)
        |)
        |SELECT cluster, doc_id AS rep_doc, n_chars AS rep_chars, n_members
        |FROM m WHERE rk = 1""".stripMargin,

    // q196: q22's verified-pair CTEs, then positional grams, diagonal
    // alignment, and a gaps-and-islands longest-run per pair.
    "q196_dup_spans" ->
      """WITH d AS (
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
        |), pos AS (
        |  SELECT doc_id, u.p AS p, u.sh AS sh
        |  FROM (
        |    SELECT doc_id, unnest([{'p': i, 'sh': w[i] || ' ' || w[i+1] || ' ' || w[i+2]} FOR i IN range(1, len(w)-1)]) AS u
        |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |    WHERE len(w) >= 3)
        |), matches AS (
        |  SELECT p.doc_a, p.doc_b, a.p AS pa, a.p - b.p AS d
        |  FROM pairs p
        |  JOIN pos a ON a.doc_id = p.doc_a
        |  JOIN pos b ON b.doc_id = p.doc_b AND b.sh = a.sh
        |), runs AS (
        |  SELECT doc_a, doc_b, d,
        |    pa - row_number() OVER (PARTITION BY doc_a, doc_b, d ORDER BY pa) AS island,
        |    pa
        |  FROM matches
        |), agg AS (
        |  SELECT doc_a, doc_b, d, island, COUNT(*) AS run_len, MIN(pa) AS a_start
        |  FROM runs GROUP BY 1, 2, 3, 4
        |), best AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_a, doc_b ORDER BY run_len DESC, d, a_start) AS rk
        |  FROM agg
        |)
        |SELECT doc_a, doc_b, run_len, run_len + 2 AS span_words, a_start, a_start - d AS b_start
        |FROM best WHERE rk = 1""".stripMargin,

    // q198: exact tier by text md5; near tier reuses the q22 band CTEs
    // restricted to delta×corpus by the q55 bucket formula.
    "q198_delta_dedup" ->
      """WITH bkt AS (
        |  SELECT doc_id, text,
        |    ( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 100 AS bucket
        |  FROM documents
        |), d AS (
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
        |  SELECT DISTINCT a.doc_id AS delta_id, b.doc_id AS corpus_id
        |  FROM keys a JOIN keys b ON a.band = b.band AND a.bkey = b.bkey
        |  JOIN bkt ba ON ba.doc_id = a.doc_id AND ba.bucket >= 95
        |  JOIN bkt bc ON bc.doc_id = b.doc_id AND bc.bucket < 95
        |), near AS (
        |  SELECT DISTINCT c.delta_id AS doc_id
        |  FROM cand c JOIN d da ON c.delta_id = da.doc_id JOIN d db ON c.corpus_id = db.doc_id
        |  WHERE CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE)
        |    / (len(da.shs) + len(db.shs) - len(list_intersect(da.shs, db.shs))) >= 0.8
        |), ex AS (
        |  SELECT DISTINCT dd.doc_id FROM bkt dd
        |  WHERE dd.bucket >= 95 AND md5(dd.text) IN (SELECT md5(text) FROM bkt WHERE bucket < 95)
        |)
        |SELECT dl.doc_id,
        |  CASE WHEN ex.doc_id IS NOT NULL THEN 'exact'
        |       WHEN near.doc_id IS NOT NULL THEN 'near'
        |       ELSE 'unique' END AS verdict
        |FROM (SELECT doc_id FROM bkt WHERE bucket >= 95) dl
        |LEFT JOIN ex ON dl.doc_id = ex.doc_id
        |LEFT JOIN near ON dl.doc_id = near.doc_id""".stripMargin,

    // q200: truth = q21's quadratic at the LSH threshold, computed on the
    // deterministic 1000-doc md5 audit tier (Dedup.auditTier — at sf0.01's
    // 500 docs the tier IS the corpus, so this SQL exercises the full
    // semantics); candidates and verified reuse the q22 CTEs tier-scoped;
    // three scalar counts and two ratios.
    "q200_lsh_recall_audit" ->
      """WITH tier AS (
        |  SELECT doc_id, text FROM documents
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 1000
        |), d AS (
        |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS shs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM tier)
        |  WHERE len(w) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(shs) AS sh FROM d
        |), cnt AS (
        |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), truth AS (
        |  SELECT doc_a, doc_b
        |  FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
        |  WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.8
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
        |  SELECT doc_a, doc_b
        |  FROM cand JOIN d da ON doc_a = da.doc_id JOIN d db ON doc_b = db.doc_id
        |  WHERE CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE)
        |    / (len(da.shs) + len(db.shs) - len(list_intersect(da.shs, db.shs))) >= 0.8
        |)
        |SELECT
        |  (SELECT COUNT(*) FROM truth) AS n_truth,
        |  (SELECT COUNT(*) FROM cand) AS n_candidates,
        |  (SELECT COUNT(*) FROM verified) AS n_verified,
        |  CAST((SELECT COUNT(*) FROM verified) AS DOUBLE) / nullif(CAST((SELECT COUNT(*) FROM truth) AS DOUBLE), 0) AS recall,
        |  CAST((SELECT COUNT(*) FROM verified) AS DOUBLE) / nullif(CAST((SELECT COUNT(*) FROM cand) AS DOUBLE), 0) AS precision
        |FROM (SELECT 1) one""".stripMargin,

    // q201: the streaming corpus-probe's batch twin — q198's bucket/band
    // CTEs, emitting verified (stream-doc, corpus-doc) pairs with exact
    // Jaccard instead of per-doc verdicts.
    "q201_corpus_neardup_probe" ->
      """WITH bkt AS (
        |  SELECT doc_id,
        |    ( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 100 AS bucket
        |  FROM documents
        |), d AS (
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
        |), pairs AS (
        |  SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS corpus_id
        |  FROM keys a JOIN keys b ON a.band = b.band AND a.bkey = b.bkey
        |  JOIN bkt ba ON ba.doc_id = a.doc_id AND ba.bucket >= 95
        |  JOIN bkt bc ON bc.doc_id = b.doc_id AND bc.bucket < 95
        |)
        |SELECT p.doc_id, p.corpus_id,
        |  CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE)
        |    / (len(da.shs) + len(db.shs) - len(list_intersect(da.shs, db.shs))) AS jaccard
        |FROM pairs p JOIN d da ON p.doc_id = da.doc_id JOIN d db ON p.corpus_id = db.doc_id
        |WHERE CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE)
        |    / (len(da.shs) + len(db.shs) - len(list_intersect(da.shs, db.shs))) >= 0.8""".stripMargin,

    "q217_dedup_sweep" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE len(string_split(text, ' ')) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)])) AS sh
        |  FROM d
        |), cnt AS (
        |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pj AS (
        |  SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jaccard
        |  FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
        |), t AS (
        |  SELECT unnest([0.3, 0.5, 0.7, 0.8, 0.9]) AS threshold
        |), sw AS (
        |  SELECT t.threshold, pj.doc_a, pj.doc_b FROM t JOIN pj ON pj.jaccard >= t.threshold
        |), ps AS (
        |  SELECT threshold, COUNT(*) AS n_pairs, COUNT(DISTINCT doc_b) AS n_dropped
        |  FROM sw GROUP BY 1
        |), ms AS (
        |  SELECT threshold, COUNT(DISTINCT doc_id) AS n_docs_affected FROM (
        |    SELECT threshold, doc_a AS doc_id FROM sw
        |    UNION ALL
        |    SELECT threshold, doc_b AS doc_id FROM sw
        |  ) GROUP BY 1
        |)
        |SELECT t.threshold,
        |  CAST(COALESCE(ps.n_pairs, 0) AS BIGINT) AS n_pairs,
        |  CAST(COALESCE(ps.n_dropped, 0) AS BIGINT) AS n_dropped,
        |  CAST(COALESCE(ms.n_docs_affected, 0) AS BIGINT) AS n_docs_affected
        |FROM t LEFT JOIN ps USING (threshold) LEFT JOIN ms USING (threshold)""".stripMargin,

    // q222: q195's minhash CTE, then per banding config one band explode
    // + per-bucket counts — candidate volume is Σ n(n−1)/2 over buckets,
    // no pair ever materialized (the planner prices the join it avoids).
    "q222_lsh_cost_planner" ->
      """WITH d AS (
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
        |), k81 AS (
        |  SELECT t.band, CASE t.band
        |    WHEN 0 THEN md5(mh0) WHEN 1 THEN md5(mh1) WHEN 2 THEN md5(mh2)
        |    WHEN 3 THEN md5(mh3) WHEN 4 THEN md5(mh4) WHEN 5 THEN md5(mh5)
        |    WHEN 6 THEN md5(mh6) ELSE md5(mh7) END AS bkey
        |  FROM mh, range(0, 8) t(band)
        |), k42 AS (
        |  SELECT t.band, CASE t.band
        |    WHEN 0 THEN md5(mh0 || '|' || mh1) WHEN 1 THEN md5(mh2 || '|' || mh3)
        |    WHEN 2 THEN md5(mh4 || '|' || mh5) ELSE md5(mh6 || '|' || mh7) END AS bkey
        |  FROM mh, range(0, 4) t(band)
        |), k24 AS (
        |  SELECT t.band, CASE t.band
        |    WHEN 0 THEN md5(mh0 || '|' || mh1 || '|' || mh2 || '|' || mh3)
        |    ELSE md5(mh4 || '|' || mh5 || '|' || mh6 || '|' || mh7) END AS bkey
        |  FROM mh, range(0, 2) t(band)
        |), b81 AS (SELECT band, bkey, COUNT(*) AS n FROM k81 GROUP BY 1, 2),
        |   b42 AS (SELECT band, bkey, COUNT(*) AS n FROM k42 GROUP BY 1, 2),
        |   b24 AS (SELECT band, bkey, COUNT(*) AS n FROM k24 GROUP BY 1, 2)
        |SELECT CAST(8 AS BIGINT) AS bands, CAST(1 AS BIGINT) AS rows_per_band,
        |  COUNT(*) AS n_buckets,
        |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons,
        |  MAX(n) AS max_bucket, CAST(SUM(n * (n - 1)) // 2 AS BIGINT) AS n_candidates
        |FROM b81
        |UNION ALL
        |SELECT CAST(4 AS BIGINT), CAST(2 AS BIGINT), COUNT(*),
        |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  MAX(n), CAST(SUM(n * (n - 1)) // 2 AS BIGINT)
        |FROM b42
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(4 AS BIGINT), COUNT(*),
        |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  MAX(n), CAST(SUM(n * (n - 1)) // 2 AS BIGINT)
        |FROM b24""".stripMargin,

    // q227: q56's recursive-CTE connected components, rolled up into the
    // cluster-size distribution.
    "q227_cluster_sizes" ->
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
        |), cl AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS cluster
        |  FROM reach GROUP BY src
        |), sz AS (
        |  SELECT cluster, COUNT(*) AS cluster_size FROM cl GROUP BY 1
        |)
        |SELECT cluster_size, COUNT(*) AS n_clusters,
        |  CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
        |FROM sz GROUP BY 1""".stripMargin,

    // q234: q22's verified LSH pair CTEs at threshold 0.8 (the shared
    // dedup pair relation — round 18 moved this audit off the quadratic
    // truth, the repo's only super-linear chain) + q40's md5-nibble
    // split, rolled up by (split_a, split_b).
    "q234_split_leakage" ->
      """WITH d AS (
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
        |), p AS (
        |  SELECT doc_a, doc_b
        |  FROM cand JOIN d da ON doc_a = da.doc_id JOIN d db ON doc_b = db.doc_id
        |  WHERE CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE)
        |    / (len(da.shs) + len(db.shs) - len(list_intersect(da.shs, db.shs))) >= 0.8
        |), sp AS (
        |  SELECT doc_id, CASE WHEN bucket < 80 THEN 'train'
        |                      WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split
        |  FROM (
        |    SELECT doc_id,
        |      ( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |      + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |      + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |      + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 100 AS bucket
        |    FROM documents
        |  )
        |)
        |SELECT sa.split AS split_a, sb.split AS split_b, COUNT(*) AS n_pairs,
        |  sa.split <> sb.split AS is_leak
        |FROM p JOIN sp sa ON p.doc_a = sa.doc_id JOIN sp sb ON p.doc_b = sb.doc_id
        |GROUP BY 1, 2, 4""".stripMargin,

    // q251: content-defined chunking — cut after each 8-char window
    // whose md5 starts with '0', md5 chunk fingerprints; per source the
    // within-source dup share plus the cross-source chunk-dup share
    // (instances whose fingerprint spans >1 distinct source).
    "q251_cdc_chunks" ->
      """WITH d AS (
        |  SELECT doc_id, source, text, length(text) AS l FROM documents
        |  WHERE length(text) >= 1
        |), cu AS (
        |  SELECT doc_id, source, text,
        |    list_sort(list_distinct(
        |      [i + 7 FOR i IN range(1, greatest(l - 6, 1))
        |       IF substr(md5(substr(text, CAST(i AS INT), 8)), 1, 1) = '0']
        |      || [l])) AS cuts
        |  FROM d
        |), ch AS (
        |  SELECT source,
        |    md5(substr(text,
        |      CAST((CASE WHEN j = 1 THEN 0 ELSE cuts[CAST(j AS INT) - 1] END) + 1 AS INT),
        |      CAST(cuts[CAST(j AS INT)]
        |        - (CASE WHEN j = 1 THEN 0 ELSE cuts[CAST(j AS INT) - 1] END) AS INT))) AS fp,
        |    cuts[CAST(j AS INT)]
        |      - (CASE WHEN j = 1 THEN 0 ELSE cuts[CAST(j AS INT) - 1] END) AS clen
        |  FROM (SELECT source, text, cuts,
        |          unnest(range(1, len(cuts) + 1)) AS j
        |        FROM cu) t
        |), pf AS (
        |  SELECT source, fp, COUNT(*) AS n, SUM(clen) AS chars
        |  FROM ch GROUP BY 1, 2
        |), ns AS (
        |  SELECT fp, COUNT(*) AS nsrc FROM pf GROUP BY 1
        |)
        |SELECT source, CAST(SUM(n) AS BIGINT) AS n_chunks,
        |  COUNT(*) AS n_distinct,
        |  CAST(SUM(chars) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
        |    AS mean_chunk_len,
        |  1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
        |    AS dup_chunk_share,
        |  CAST(SUM(CASE WHEN nsrc > 1 THEN n ELSE 0 END) AS BIGINT)
        |    AS n_cross_chunks,
        |  CAST(SUM(CASE WHEN nsrc > 1 THEN n ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(n) AS DOUBLE) AS cross_dup_share
        |FROM pf JOIN ns USING (fp) GROUP BY 1""".stripMargin,

    // q255: Pearson degree assortativity over the q22 verified near-dup
    // edges, symmetrised; exact integer moments, one trailing division.
    "q255_dup_assortativity" ->
      """WITH d AS (
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
        |), pairs AS (
        |  SELECT doc_a, doc_b
        |  FROM (SELECT doc_a, doc_b,
        |          len(list_intersect(da.shs, db.shs)) AS inter,
        |          len(da.shs) AS n_a, len(db.shs) AS n_b
        |        FROM cand JOIN d da ON doc_a = da.doc_id
        |        JOIN d db ON doc_b = db.doc_id)
        |  WHERE CAST(inter AS DOUBLE) / (n_a + n_b - inter) >= 0.8
        |), deg AS (
        |  SELECT dd, COUNT(*) AS deg FROM (
        |    SELECT doc_a AS dd FROM pairs UNION ALL SELECT doc_b FROM pairs)
        |  GROUP BY 1
        |), e AS (
        |  SELECT da.deg AS x, db.deg AS y
        |  FROM pairs JOIN deg da ON pairs.doc_a = da.dd
        |  JOIN deg db ON pairs.doc_b = db.dd
        |), xy AS (
        |  SELECT x, y FROM e UNION ALL SELECT y, x FROM e
        |), m AS (
        |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx,
        |    SUM(x * y) AS sxy
        |  FROM xy
        |)
        |SELECT CAST(n // 2 AS BIGINT) AS n_edges,
        |  CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS mean_degree,
        |  CAST(CAST(n * sxy - sx * sx AS VARCHAR) AS DOUBLE)
        |    / nullif(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE), 0.0)
        |    AS assortativity
        |FROM m""".stripMargin,

    // q257: exact-substring dedup — positional 8-token window md5
    // fingerprints; shared iff min(doc_id) <> max(doc_id) per
    // fingerprint; per-doc interval union of [p, p+7] via
    // gaps-and-islands (break on gap > 8); longest span elected with
    // smallest-start tie-break, char offset from the token array.
    "q257_exact_substring" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 8
        |), pos AS (
        |  SELECT doc_id, len(w) AS n_tokens, i AS p,
        |    md5(array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')) AS fp
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i FROM t)
        |), dup AS (
        |  SELECT fp FROM pos GROUP BY fp HAVING MIN(doc_id) <> MAX(doc_id)
        |), sp AS (
        |  SELECT pos.doc_id, pos.n_tokens, pos.p FROM pos JOIN dup USING (fp)
        |), isl AS (
        |  SELECT doc_id, n_tokens, p,
        |    SUM(CASE WHEN prev IS NOT NULL AND p - prev > 8 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY p
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM (SELECT doc_id, n_tokens, p,
        |          lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
        |        FROM sp)
        |), spans AS (
        |  SELECT doc_id, n_tokens, island,
        |    MIN(p) AS s, MAX(p) + 7 AS e
        |  FROM isl GROUP BY 1, 2, 3
        |), ranked AS (
        |  SELECT doc_id, n_tokens, s, e - s + 1 AS span_tokens,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY e - s + 1 DESC, s ASC) AS rk
        |  FROM spans
        |), agg AS (
        |  SELECT doc_id, n_tokens, COUNT(*) AS n_spans,
        |    SUM(span_tokens) AS dup_tokens,
        |    MAX(CASE WHEN rk = 1 THEN s END) AS top_s,
        |    MAX(CASE WHEN rk = 1 THEN span_tokens END) AS top_len
        |  FROM ranked GROUP BY 1, 2
        |)
        |SELECT a.doc_id, CAST(a.n_tokens AS BIGINT) AS n_tokens,
        |  CAST(a.n_spans AS BIGINT) AS n_spans,
        |  CAST(a.dup_tokens AS BIGINT) AS dup_tokens,
        |  CAST(a.dup_tokens AS DOUBLE) / CAST(a.n_tokens AS DOUBLE)
        |    AS dup_token_share,
        |  CAST(a.top_s AS BIGINT) AS top_span_start,
        |  CAST(a.top_len AS BIGINT) AS top_span_tokens,
        |  CAST(CASE WHEN a.top_s = 1 THEN 1
        |    ELSE length(array_to_string(t.w[1:CAST(a.top_s AS INT) - 1], ' ')) + 2
        |    END AS BIGINT) AS top_span_char_start
        |FROM agg a JOIN t USING (doc_id)""".stripMargin,

    // q258: byte-level ingest dedup probe — delta docs (md5 bucket >=
    // 95) CDC-chunked and probed against the distinct chunk fingerprints
    // of the standing corpus (bucket < 95); per-doc hit/byte rollup.
    "q258_cdc_ingest_probe" ->
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS l,
        |    ( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 100 AS bucket
        |  FROM documents WHERE length(text) >= 1
        |), cu AS (
        |  SELECT doc_id, bucket, text,
        |    list_sort(list_distinct(
        |      [i + 7 FOR i IN range(1, greatest(l - 6, 1))
        |       IF substr(md5(substr(text, CAST(i AS INT), 8)), 1, 1) = '0']
        |      || [l])) AS cuts
        |  FROM d
        |), ch AS (
        |  SELECT doc_id, bucket,
        |    md5(substr(text,
        |      CAST((CASE WHEN j = 1 THEN 0 ELSE cuts[CAST(j AS INT) - 1] END) + 1 AS INT),
        |      CAST(cuts[CAST(j AS INT)]
        |        - (CASE WHEN j = 1 THEN 0 ELSE cuts[CAST(j AS INT) - 1] END) AS INT))) AS fp,
        |    cuts[CAST(j AS INT)]
        |      - (CASE WHEN j = 1 THEN 0 ELSE cuts[CAST(j AS INT) - 1] END) AS clen
        |  FROM (SELECT doc_id, bucket, text, cuts,
        |          unnest(range(1, len(cuts) + 1)) AS j
        |        FROM cu) t
        |), idx AS (
        |  SELECT DISTINCT fp FROM ch WHERE bucket < 95
        |)
        |SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |  CAST(SUM(CASE WHEN i.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hit,
        |  CAST(SUM(c.clen) AS BIGINT) AS n_chars,
        |  CAST(SUM(CASE WHEN i.fp IS NOT NULL THEN c.clen ELSE 0 END) AS BIGINT)
        |    AS dup_chars,
        |  CAST(SUM(CASE WHEN i.fp IS NOT NULL THEN c.clen ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(c.clen) AS DOUBLE) AS dup_char_share
        |FROM ch c LEFT JOIN idx i ON c.fp = i.fp
        |WHERE c.bucket >= 95
        |GROUP BY 1""".stripMargin,

    // q259: exact-substring scrub — q257's shared spans cut from every
    // document (all occurrences), kept tokens re-joined by spaces;
    // untouched docs pass through with removed_tokens = 0.
    "q259_exact_scrub" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), pos AS (
        |  SELECT doc_id, i AS p,
        |    md5(array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')) AS fp
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i
        |        FROM t WHERE len(w) >= 8)
        |), dup AS (
        |  SELECT fp FROM pos GROUP BY fp HAVING MIN(doc_id) <> MAX(doc_id)
        |), sp AS (
        |  SELECT pos.doc_id, pos.p FROM pos JOIN dup USING (fp)
        |), isl AS (
        |  SELECT doc_id, p,
        |    SUM(CASE WHEN prev IS NOT NULL AND p - prev > 8 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY p
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM (SELECT doc_id, p,
        |          lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
        |        FROM sp)
        |), cuts AS (
        |  SELECT doc_id, list({'s': s, 'e': e}) AS cs
        |  FROM (SELECT doc_id, island, MIN(p) AS s, MAX(p) + 7 AS e
        |        FROM isl GROUP BY 1, 2)
        |  GROUP BY 1
        |)
        |SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
        |  CAST(len(t.w) - len(kept) AS BIGINT) AS removed_tokens,
        |  -- DuckDB: array_to_string([]) is NULL; Spark concat_ws is ''
        |  COALESCE(array_to_string(kept, ' '), '') AS text_clean
        |FROM (
        |  SELECT t.doc_id, t.w,
        |    CASE WHEN c.cs IS NULL THEN t.w ELSE
        |      [t.w[i] FOR i IN range(1, len(t.w) + 1)
        |       IF len(list_filter(c.cs, x -> i >= x.s AND i <= x.e)) = 0]
        |    END AS kept
        |  FROM t LEFT JOIN cuts c USING (doc_id)
        |) t""".stripMargin,

    // q260: cross-source chunk-flow matrix — self-join of the
    // (source, fp) distinct CDC chunk relation on fp, source_a <
    // source_b; per pair the shared-fingerprint count and each side's
    // byte mass on those fingerprints.
    "q260_chunk_flow" ->
      """WITH d AS (
        |  SELECT doc_id, source, text, length(text) AS l FROM documents
        |  WHERE length(text) >= 1
        |), cu AS (
        |  SELECT doc_id, source, text,
        |    list_sort(list_distinct(
        |      [i + 7 FOR i IN range(1, greatest(l - 6, 1))
        |       IF substr(md5(substr(text, CAST(i AS INT), 8)), 1, 1) = '0']
        |      || [l])) AS cuts
        |  FROM d
        |), ch AS (
        |  SELECT source,
        |    md5(substr(text,
        |      CAST((CASE WHEN j = 1 THEN 0 ELSE cuts[CAST(j AS INT) - 1] END) + 1 AS INT),
        |      CAST(cuts[CAST(j AS INT)]
        |        - (CASE WHEN j = 1 THEN 0 ELSE cuts[CAST(j AS INT) - 1] END) AS INT))) AS fp,
        |    cuts[CAST(j AS INT)]
        |      - (CASE WHEN j = 1 THEN 0 ELSE cuts[CAST(j AS INT) - 1] END) AS clen
        |  FROM (SELECT source, text, cuts,
        |          unnest(range(1, len(cuts) + 1)) AS j
        |        FROM cu) t
        |), pf AS (
        |  SELECT source, fp, SUM(clen) AS chars FROM ch GROUP BY 1, 2
        |)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_shared_fp,
        |  CAST(SUM(a.chars) AS BIGINT) AS chars_a,
        |  CAST(SUM(b.chars) AS BIGINT) AS chars_b
        |FROM pf a JOIN pf b ON a.fp = b.fp AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin,

    // q274: token-precision ingest probe — delta docs (q258's md5 bucket
    // >= 95) probed against the corpus window-fp index; md5 windows here
    // vs the KR rolling kernel in Spark (independent families, same hit
    // set); longest hit run via gaps-and-islands over hit windows.
    "q274_substring_probe" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w,
        |    ( (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) ) % 100 AS bucket
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 8
        |), pos AS (
        |  SELECT doc_id, bucket, i AS p,
        |    md5(array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')) AS fp
        |  FROM (SELECT doc_id, bucket, w, unnest(range(1, len(w) - 6)) AS i FROM t)
        |), corp AS (
        |  SELECT DISTINCT fp FROM pos WHERE bucket < 95
        |), probed AS (
        |  SELECT d.doc_id, d.p, (c.fp IS NOT NULL) AS hit
        |  FROM (SELECT * FROM pos WHERE bucket >= 95) d
        |  LEFT JOIN corp c USING (fp)
        |), tot AS (
        |  SELECT doc_id, COUNT(*) AS n_windows,
        |    SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS n_hit
        |  FROM probed GROUP BY 1
        |), runs AS (
        |  SELECT doc_id, MAX(run) AS top_run FROM (
        |    SELECT doc_id, isl, COUNT(*) AS run FROM (
        |      SELECT doc_id, p,
        |        p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS isl
        |      FROM probed WHERE hit)
        |    GROUP BY 1, 2)
        |  GROUP BY 1
        |)
        |SELECT t.doc_id, CAST(t.n_windows AS BIGINT) AS n_windows,
        |  CAST(t.n_hit AS BIGINT) AS n_hit,
        |  CAST(t.n_hit AS DOUBLE) / CAST(t.n_windows AS DOUBLE) AS hit_share,
        |  CAST(coalesce(r.top_run, 0) AS BIGINT) AS top_run_windows,
        |  CAST(CASE WHEN coalesce(r.top_run, 0) > 0
        |       THEN coalesce(r.top_run, 0) + 7 ELSE 0 END AS BIGINT)
        |    AS top_run_tokens
        |FROM tot t LEFT JOIN runs r USING (doc_id)""".stripMargin,

    // q289: q259's scrub with the reference set = the eval tier
    // (doc_id % 10 = 3); train docs only in the output. The oracle keeps
    // per-window md5 as the independent fingerprint family.
    "q289_decontam_scrub" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |), pos AS (
        |  SELECT doc_id, i AS p,
        |    md5(array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')) AS fp
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i
        |        FROM t WHERE len(w) >= 8)
        |), ev AS (
        |  SELECT DISTINCT fp FROM pos WHERE doc_id % 10 = 3
        |), sp AS (
        |  SELECT pos.doc_id, pos.p FROM pos JOIN ev USING (fp)
        |  WHERE pos.doc_id % 10 <> 3
        |), isl AS (
        |  SELECT doc_id, p,
        |    SUM(CASE WHEN prev IS NOT NULL AND p - prev > 8 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY p
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM (SELECT doc_id, p,
        |          lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
        |        FROM sp)
        |), cuts AS (
        |  SELECT doc_id, list({'s': s, 'e': e}) AS cs
        |  FROM (SELECT doc_id, island, MIN(p) AS s, MAX(p) + 7 AS e
        |        FROM isl GROUP BY 1, 2)
        |  GROUP BY 1
        |)
        |SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
        |  CAST(len(t.w) - len(kept) AS BIGINT) AS removed_tokens,
        |  COALESCE(array_to_string(kept, ' '), '') AS text_clean
        |FROM (
        |  SELECT t.doc_id, t.w,
        |    CASE WHEN c.cs IS NULL THEN t.w ELSE
        |      [t.w[i] FOR i IN range(1, len(t.w) + 1)
        |       IF len(list_filter(c.cs, x -> i >= x.s AND i <= x.e)) = 0]
        |    END AS kept
        |  FROM t LEFT JOIN cuts c USING (doc_id)
        |  WHERE t.doc_id % 10 <> 3
        |) t""".stripMargin,

    // q292: q56's verified pair graph feeds BOTH the component closure
    // (membership) and the q283 fixed-point PageRank (authority); the
    // election takes (rank desc, doc_id) per cluster.
    "q292_authority_canon" ->
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
        |), sym2 AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs
        |), deg2 AS (
        |  SELECT src, COUNT(*) AS outdeg FROM sym2 GROUP BY 1
        |), p0 AS (
        |  SELECT src AS node, CAST(1000000000 AS HUGEINT) AS r FROM deg2
        |), p1 AS (
        |  SELECT s.dst AS node, 150000000 + (85 * SUM(r.r // d2.outdeg)) // 100 AS r
        |  FROM sym2 s JOIN deg2 d2 ON d2.src = s.src JOIN p0 r ON r.node = s.src
        |  GROUP BY 1
        |), p2 AS (
        |  SELECT s.dst AS node, 150000000 + (85 * SUM(r.r // d2.outdeg)) // 100 AS r
        |  FROM sym2 s JOIN deg2 d2 ON d2.src = s.src JOIN p1 r ON r.node = s.src
        |  GROUP BY 1
        |), p3 AS (
        |  SELECT s.dst AS node, 150000000 + (85 * SUM(r.r // d2.outdeg)) // 100 AS r
        |  FROM sym2 s JOIN deg2 d2 ON d2.src = s.src JOIN p2 r ON r.node = s.src
        |  GROUP BY 1
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
        |), jn AS (
        |  SELECT m.doc_id, m.cluster, CAST(p3.r AS BIGINT) AS rank_ppb
        |  FROM mem m JOIN p3 ON p3.node = m.doc_id
        |)
        |SELECT cluster, doc_id AS rep_doc, rank_ppb AS rep_rank_ppb,
        |  CAST(n_members AS BIGINT) AS n_members
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster
        |      ORDER BY rank_ppb DESC, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY cluster) AS n_members
        |  FROM jn
        |) WHERE rn = 1""".stripMargin,

    // q294: q200's CTEs verbatim (including the 1000-doc md5 audit tier)
    // with both Jaccard gates at 0.5 — the second operating point that
    // moves when band math explodes (or silently narrows) the candidate
    // stream.
    "q294_lsh_recall_audit_t05" ->
      """WITH tier AS (
        |  SELECT doc_id, text FROM documents
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 1000
        |), d AS (
        |  SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS shs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM tier)
        |  WHERE len(w) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(shs) AS sh FROM d
        |), cnt AS (
        |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), truth AS (
        |  SELECT doc_a, doc_b
        |  FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
        |  WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.5
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
        |  SELECT doc_a, doc_b
        |  FROM cand JOIN d da ON doc_a = da.doc_id JOIN d db ON doc_b = db.doc_id
        |  WHERE CAST(len(list_intersect(da.shs, db.shs)) AS DOUBLE)
        |    / (len(da.shs) + len(db.shs) - len(list_intersect(da.shs, db.shs))) >= 0.5
        |)
        |SELECT
        |  (SELECT COUNT(*) FROM truth) AS n_truth,
        |  (SELECT COUNT(*) FROM cand) AS n_candidates,
        |  (SELECT COUNT(*) FROM verified) AS n_verified,
        |  CAST((SELECT COUNT(*) FROM verified) AS DOUBLE) / nullif(CAST((SELECT COUNT(*) FROM truth) AS DOUBLE), 0) AS recall,
        |  CAST((SELECT COUNT(*) FROM verified) AS DOUBLE) / nullif(CAST((SELECT COUNT(*) FROM cand) AS DOUBLE), 0) AS precision
        |FROM (SELECT 1) one""".stripMargin,

    // q295: the incremental update must equal the FULL recompute - q22's
    // oracle verbatim is the strongest possible check of the
    // decomposition pairs(corpus) UNION pairs(delta) UNION cross pairs.
    "q295_delta_pair_update" ->
      """WITH d AS (
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
        |)
        |SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / (n_a + n_b - inter) AS jaccard
        |FROM verified
        |WHERE CAST(inter AS DOUBLE) / (n_a + n_b - inter) >= 0.8""".stripMargin,

    // q299: the q289 window/island machinery aggregated per
    // (train source, eval source) cell. Per-window md5 on the oracle
    // side (the independent fingerprint family — same hit set as the
    // KR kernel); islands partition by (doc, eval_source) so a span
    // contaminated by two eval sources counts in both cells.
    "q299_contamination_matrix" ->
      """WITH t AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
        |), pos AS (
        |  SELECT doc_id, source, i AS p,
        |    md5(array_to_string(w[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')) AS fp
        |  FROM (SELECT doc_id, source, w, unnest(range(1, len(w) - 6)) AS i
        |        FROM t WHERE len(w) >= 8)
        |), ev AS (
        |  SELECT DISTINCT fp, source AS eval_source FROM pos WHERE doc_id % 10 = 3
        |), hits AS (
        |  SELECT pos.doc_id, pos.source AS train_source, ev.eval_source, pos.p
        |  FROM pos JOIN ev USING (fp) WHERE pos.doc_id % 10 <> 3
        |), isl AS (
        |  SELECT doc_id, train_source, eval_source, p,
        |    SUM(CASE WHEN prev IS NOT NULL AND p - prev > 8 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id, eval_source ORDER BY p
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM (SELECT doc_id, train_source, eval_source, p,
        |          lag(p) OVER (PARTITION BY doc_id, eval_source ORDER BY p) AS prev
        |        FROM hits)
        |), agg AS (
        |  SELECT train_source, eval_source, doc_id, island,
        |    MIN(p) AS s, MAX(p) + 7 AS e, COUNT(*) AS nw
        |  FROM isl GROUP BY 1, 2, 3, 4
        |)
        |SELECT train_source, eval_source,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(SUM(nw) AS BIGINT) AS n_windows,
        |  CAST(SUM(e - s + 1) AS BIGINT) AS covered_tokens
        |FROM agg GROUP BY 1, 2""".stripMargin,

    // q300: the q22 verified-pair chain + eval-boundary orientation +
    // the per-source-cell aggregate. Pair orientation is canonical
    // (doc_a < doc_b), so a crossing pair counts once with its
    // train/eval roles resolved per row.
    "q300_neardup_contamination" ->
      """WITH d AS (
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
        |), pr AS (
        |  SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / (n_a + n_b - inter) AS jaccard
        |  FROM verified
        |  WHERE CAST(inter AS DOUBLE) / (n_a + n_b - inter) >= 0.8
        |), x AS (
        |  SELECT CASE WHEN doc_a % 10 = 3 THEN doc_b ELSE doc_a END AS train_doc,
        |         CASE WHEN doc_a % 10 = 3 THEN doc_a ELSE doc_b END AS eval_doc,
        |         jaccard
        |  FROM pr WHERE (doc_a % 10 = 3) <> (doc_b % 10 = 3)
        |)
        |SELECT ts.source AS train_source, es.source AS eval_source,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  CAST(COUNT(DISTINCT x.train_doc) AS BIGINT) AS n_train_docs,
        |  MAX(CAST(floor(jaccard * 1e6) AS BIGINT)) AS max_jaccard_micro
        |FROM x JOIN documents ts ON ts.doc_id = x.train_doc
        |JOIN documents es ON es.doc_id = x.eval_doc
        |GROUP BY 1, 2""".stripMargin,

    // q301: q200's tier CTE + two count profiles; shares/ratio are double
    // divisions of exact counts (deterministic IEEE on both engines).
    "q301_audit_tier_profile" ->
      """WITH tier AS (
        |  SELECT doc_id FROM documents
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 1000
        |), c AS (
        |  SELECT source, COUNT(*) AS n_corpus FROM documents GROUP BY 1
        |), t AS (
        |  SELECT d.source, COUNT(*) AS n_tier
        |  FROM documents d JOIN tier USING (doc_id) GROUP BY 1
        |), tot AS (
        |  SELECT (SELECT COUNT(*) FROM documents) AS total_corpus,
        |         (SELECT COUNT(*) FROM tier) AS total_tier
        |)
        |SELECT c.source, c.n_corpus, COALESCE(t.n_tier, 0) AS n_tier,
        |  CAST(c.n_corpus AS DOUBLE) / total_corpus AS corpus_share,
        |  CAST(COALESCE(t.n_tier, 0) AS DOUBLE) / total_tier AS tier_share,
        |  (CAST(COALESCE(t.n_tier, 0) AS DOUBLE) / total_tier)
        |    / (CAST(c.n_corpus AS DOUBLE) / total_corpus) AS rep_ratio
        |FROM c LEFT JOIN t ON c.source = t.source, tot""".stripMargin,

    // q303: the q21 quadratic CTEs over the 1000-doc tier at t=0.8, then
    // single-row Horvitz-Thompson arithmetic (pair inclusion probability
    // m(m-1)/(n(n-1)) under a uniform size-m doc sample, inverted).
    "q303_dup_rate_estimate" ->
      """WITH tier AS (
        |  SELECT doc_id, text FROM documents
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 1000
        |), d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM tier WHERE len(string_split(text, ' ')) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)])) AS sh
        |  FROM d
        |), cnt AS (
        |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), p AS (
        |  SELECT COUNT(*) AS n_tier_pairs FROM (
        |    SELECT 1
        |    FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
        |    WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.8)
        |), m AS (SELECT COUNT(*) AS n_tier_docs FROM tier),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT n.n_docs, m.n_tier_docs, p.n_tier_pairs,
        |  CAST(n.n_docs * (n.n_docs - 1) AS DOUBLE)
        |    / (m.n_tier_docs * (m.n_tier_docs - 1)) AS scale_factor,
        |  CAST(p.n_tier_pairs AS DOUBLE)
        |    * CAST(n.n_docs * (n.n_docs - 1) AS DOUBLE)
        |    / (m.n_tier_docs * (m.n_tier_docs - 1)) AS est_corpus_pairs,
        |  CAST(p.n_tier_pairs AS DOUBLE) * 2.0 / m.n_tier_docs AS tier_dup_incidence
        |FROM n, m, p""".stripMargin,

    // q304: the q303 chain kept at PAIR level, endpoint degrees for the
    // one-shared-doc joint-inclusion count, then the closed-form HT
    // variance — π factors built ratio-by-ratio exactly as the Spark
    // side does so the doubles agree bit-exactly.
    "q304_dup_rate_ci" ->
      """WITH tier AS (
        |  SELECT doc_id, text FROM documents
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 1000
        |), d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM tier WHERE len(string_split(text, ' ')) >= 3
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)])) AS sh
        |  FROM d
        |), cnt AS (
        |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), tp AS (
        |  SELECT doc_a, doc_b
        |  FROM inter JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
        |  WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.8
        |), p AS (SELECT COUNT(*) AS n_tier_pairs FROM tp),
        |deg AS (
        |  SELECT dd, COUNT(*) AS c FROM (
        |    SELECT doc_a AS dd FROM tp UNION ALL SELECT doc_b FROM tp)
        |  GROUP BY dd
        |), a AS (
        |  SELECT CAST(COALESCE(SUM(c * (c - 1)), 0) AS BIGINT) AS adj_ordered FROM deg
        |), m AS (SELECT COUNT(*) AS n_tier_docs FROM tier),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |v AS (
        |  SELECT n.n_docs, m.n_tier_docs, p.n_tier_pairs, a.adj_ordered,
        |    p.n_tier_pairs * (p.n_tier_pairs - 1) - a.adj_ordered AS disj_ordered,
        |    (CAST(m.n_tier_docs AS DOUBLE) / n.n_docs)
        |      * (CAST(m.n_tier_docs - 1 AS DOUBLE) / (n.n_docs - 1)) AS p2,
        |    (CAST(m.n_tier_docs AS DOUBLE) / n.n_docs)
        |      * (CAST(m.n_tier_docs - 1 AS DOUBLE) / (n.n_docs - 1))
        |      * (CAST(m.n_tier_docs - 2 AS DOUBLE) / (n.n_docs - 2)) AS p3,
        |    (CAST(m.n_tier_docs AS DOUBLE) / n.n_docs)
        |      * (CAST(m.n_tier_docs - 1 AS DOUBLE) / (n.n_docs - 1))
        |      * (CAST(m.n_tier_docs - 2 AS DOUBLE) / (n.n_docs - 2))
        |      * (CAST(m.n_tier_docs - 3 AS DOUBLE) / (n.n_docs - 3)) AS p4,
        |    CAST(p.n_tier_pairs AS DOUBLE)
        |      * CAST(n.n_docs * (n.n_docs - 1) AS DOUBLE)
        |      / (m.n_tier_docs * (m.n_tier_docs - 1)) AS est_corpus_pairs
        |  FROM n, m, p, a
        |), w AS (
        |  SELECT *,
        |    (CAST(n_tier_pairs AS DOUBLE) * (1.0 - p2)) / (p2 * p2)
        |      + (CAST(adj_ordered AS DOUBLE) * (p3 - p2 * p2)) / (p3 * (p2 * p2))
        |      + (CAST(disj_ordered AS DOUBLE) * (p4 - p2 * p2)) / (p4 * (p2 * p2))
        |      AS var_est
        |  FROM v
        |)
        |SELECT n_docs, n_tier_docs, n_tier_pairs, adj_ordered, disj_ordered,
        |  est_corpus_pairs, var_est,
        |  SQRT(GREATEST(var_est, 0.0)) AS se_est,
        |  CASE WHEN est_corpus_pairs > 0.0
        |    THEN SQRT(GREATEST(var_est, 0.0)) / est_corpus_pairs END AS rel_se
        |FROM w""".stripMargin,
  )
}
