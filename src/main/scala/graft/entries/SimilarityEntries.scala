package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Advanced, Corpus, Dedup, Multimodal, Prep, Quality, Relational, Similarity, TextAnalysis, Warehouse}
import graft.sources.Tables

/** Similarity family: `SparkEntry.queries` registrations + their DuckDB
  * oracles (round-17 verdict task 6 — the 8k-line single-file registry
  * split per family; `SparkEntry` folds every family back into the one
  * driver-contract map, and OracleCoverageSpec still guards that every
  * query has its oracle).
  */
private[graft] object SimilarityEntries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_ann_topk" -> ((s, d) => Similarity.annBruteForceTopK(s, d)),
    "q25_emb_neardup_lsh" -> ((s, d) => Similarity.nearDupLsh(s, d)),
    "q35_ann_ivf" -> (Similarity.annIvf _),
    // oracle: the fixed iters=2 Lloyd loop unrolled into a CTE chain
    // (see the q61 oracleSql entry); semantics also verified by
    // SimilaritySpec's planted-cluster recall + determinism tests
    "q61_ann_ivf_trained" -> ((s, d) => Similarity.annIvfTrained(s, d)),
    "q79_emb_quantize" -> ((s, d) => Similarity.quantizeInt8(s, d)),
    "q81_lang_centroid" -> ((s, d) => Similarity.langCentroids(s, d)),
    "q84_sparse_topk" -> ((s, d) => Similarity.sparseLexicalTopK(s, d)),
    "q140_quantile_codebook" -> ((s, d) => Similarity.quantileCodebook(s, d)),
    "q191_semantic_decontam" -> ((s, d) => Similarity.semanticDecontam(s, d)),
    "q204_semdedup" -> ((s, d) => Similarity.semDedup(s, d)),
    "q206_cluster_keywords" -> ((s, d) => Similarity.clusterKeywords(s, d)),
    "q208_cluster_purity" -> ((s, d) => Similarity.clusterPurity(s, d)),
    "q212_pq_encode" -> ((s, d) => Similarity.pqEncode(s, d)),
    "q213_pq_adc_topk" -> ((s, d) => Similarity.pqAdcTopK(s, d)),
    "q214_coreset_coverage" -> ((s, d) => Similarity.coresetCoverage(s, d)),
    "q215_jl_distortion" -> ((s, d) => Similarity.jlDistortion(s, d)),
    "q218_pq_staleness" -> ((s, d) => Similarity.pqStaleness(s, d)),
    "q221_embedding_hygiene" -> ((s, d) => Similarity.embeddingHygiene(s, d)),
    "q225_shard_plan" -> ((s, d) => Similarity.shardPlan(s, d)),
    "q229_embedding_covariance" -> ((s, d) => Similarity.embeddingCovariance(s, d)),
    "q230_pca_power" -> ((s, d) => Similarity.pcaPower(s, d)),
    "q231_modality_alignment" -> ((s, d) => Similarity.modalityAlignment(s, d)),
    "q235_ivf_recall" -> ((s, d) => Similarity.ivfRecallAudit(s, d)),
    "q243_hybrid_rrf" -> ((s, d) => Similarity.hybridRrf(s, d)),
    "q250_reciprocal_nn" -> ((s, d) => Similarity.reciprocalNn(s, d)),
    "q270_margin_pairs" -> ((s, d) => Similarity.marginPairs(s, d)),
    "q271_centroid_outliers" -> ((s, d) => Similarity.centroidOutliers(s, d)),
    "q275_hard_negatives" -> ((s, d) => Similarity.hardNegatives(s, d)),
    "q288_diverse_select" -> ((s, d) => Similarity.diverseSelect(s, d)),
    // q296: q295's embedding-side twin — the codebook trains once per
    // generation on the standing corpus tier and serves from the derived
    // store; ingest assignment touches the 5% delta only
    "q296_delta_assign" -> ((s, d) => Similarity.deltaAssign(s, d)),
    // q297: exact MRR/recall of cosine retrieval against the
    // embeddings' class labels — the space-quality eval the semantic
    // dedup / diversity / hard-negative operators all inherit
    "q297_retrieval_eval" -> ((s, d) => Similarity.retrievalEval(s, d)),
    // q298: the retrain trigger for the q296 serving pattern — per-cell
    // cosine between the standing (corpus-tier) codebook and today's
    // full retrain; both codebooks are shared derived artifacts, the
    // audit itself is an nCells-row join
    "q298_codebook_drift" -> ((s, d) => Similarity.codebookDrift(s, d)),
  )

  def oracleSql: Map[String, String] = Map(

    "q24_ann_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10
        |), pairs AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(q.qe[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS dot,
        |    SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS na,
        |    SUM(CAST(floor(CAST(q.qe[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(q.qe[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS nq
        |  FROM embeddings e, q, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |  WHERE e.vec_id != q.query_id
        |  GROUP BY 1, 2
        |), c AS (
        |  SELECT query_id, neighbor_id, CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nq AS DOUBLE))) AS cosine FROM pairs
        |)
        |SELECT query_id, neighbor_id, cosine, "rank" FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS "rank" FROM c
        |) WHERE "rank" <= 10""".stripMargin,

    "q25_emb_neardup_lsh" ->
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
        |SELECT vec_a, vec_b, cosine FROM cos WHERE cosine >= 0.4""".stripMargin,

    "q35_ann_ivf" ->
      """WITH qn AS (
        |  SELECT e.vec_id, SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS n2
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |  GROUP BY 1
        |), dots AS (
        |  SELECT e.vec_id AS va, c.vec_id AS vb,
        |    SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(c.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS dot
        |  FROM embeddings e JOIN embeddings c ON c.vec_id < 8,
        |  LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |  GROUP BY 1, 2
        |), vc AS (
        |  SELECT d.va AS vec_id, d.vb AS cid,
        |    CAST(d.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS ccos
        |  FROM dots d JOIN qn na ON na.vec_id = d.va JOIN qn nb ON nb.vec_id = d.vb
        |), assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM vc
        |  ) WHERE rn = 1
        |), probe AS (
        |  SELECT vec_id AS query_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
        |    FROM vc WHERE vec_id < 10
        |  ) WHERE rn <= 2
        |), cand AS (
        |  SELECT p.query_id, a.vec_id AS neighbor_id
        |  FROM probe p JOIN assign a ON a.cid = p.cid WHERE a.vec_id != p.query_id
        |), nd AS (
        |  SELECT c.query_id, c.neighbor_id,
        |    SUM(CAST(floor(CAST(eq.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(en.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS dot
        |  FROM cand c JOIN embeddings eq ON eq.vec_id = c.query_id JOIN embeddings en ON en.vec_id = c.neighbor_id,
        |  LATERAL (SELECT unnest(range(1, len(eq.embedding) + 1)) AS i) t
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT n.query_id, n.neighbor_id,
        |    CAST(n.dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nn.n2 AS DOUBLE))) AS cosine
        |  FROM nd n JOIN qn nq ON nq.vec_id = n.query_id JOIN qn nn ON nn.vec_id = n.neighbor_id
        |)
        |SELECT query_id, neighbor_id, cosine, "rank" FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS "rank" FROM scored
        |) WHERE "rank" <= 5""".stripMargin,

    // q61: the fixed iters=2 Lloyd loop (Similarity.kmeansCentroids)
    // unrolled into a non-recursive CTE chain. Centroids live as
    // (cid, pos, m) rows; every dot product / norm is the same int64
    // fixed-point sum (floor(x*1e8+0.5)) as Similarity.scala:216 and
    // FixedPointDot, so assignments, means, and the final ranking
    // reproduce bit-for-bit. Two rounds of (argmax-cosine assign with cid
    // tiebreak -> per-(cell,dim) fixed-point mean cast to FLOAT), then
    // the identical probe/score/rank phase as q35.
    "q61_ann_ivf_trained" ->
      """WITH qe AS (
        |  SELECT e.vec_id, i AS pos,
        |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |), vn AS (
        |  SELECT vec_id, SUM(qx * qx) AS n2 FROM qe GROUP BY 1
        |), qc0 AS (
        |  SELECT vec_id AS cid, pos, qx AS qm FROM qe WHERE vec_id < 8
        |), cn0 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc0 GROUP BY 1
        |), d1 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc0 c ON c.pos = q.pos GROUP BY 1, 2
        |), a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d1 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn0 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m1 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a1 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc1 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m1
        |), cn1 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc1 GROUP BY 1
        |), d2 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc1 c ON c.pos = q.pos GROUP BY 1, 2
        |), a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d2 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn1 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m2 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a2 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc2 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m2
        |), cn2t AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc2 GROUP BY 1
        |), d3 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc2 c ON c.pos = q.pos GROUP BY 1, 2
        |), vc AS (
        |  SELECT d.vec_id, d.cid,
        |    CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) AS ccos
        |  FROM d3 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn2t c ON c.cid = d.cid
        |), assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM vc
        |  ) WHERE rn = 1
        |), probe AS (
        |  SELECT vec_id AS query_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
        |    FROM vc WHERE vec_id < 10
        |  ) WHERE rn <= 2
        |), cand AS (
        |  SELECT p.query_id, a.vec_id AS neighbor_id
        |  FROM probe p JOIN assign a ON a.cid = p.cid WHERE a.vec_id != p.query_id
        |), nd AS (
        |  SELECT c.query_id, c.neighbor_id, SUM(qa.qx * qb.qx) AS dot
        |  FROM cand c JOIN qe qa ON qa.vec_id = c.query_id
        |  JOIN qe qb ON qb.vec_id = c.neighbor_id AND qb.pos = qa.pos
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT n.query_id, n.neighbor_id,
        |    CAST(n.dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nn.n2 AS DOUBLE))) AS cosine
        |  FROM nd n JOIN vn nq ON nq.vec_id = n.query_id JOIN vn nn ON nn.vec_id = n.neighbor_id
        |)
        |SELECT query_id, neighbor_id, cosine, "rank" FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS "rank" FROM scored
        |) WHERE "rank" <= 5""".stripMargin,

    // q79: every value is an elementwise double function of one row's
    // array — round() is spelled floor(x + 0.5) on both engines so the
    // .5 boundary branches identically, and within-row fold order is
    // fixed, so doubles hash-match exactly.
    "q79_emb_quantize" ->
      """WITH x AS (
        |  SELECT vec_id, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS xd
        |  FROM embeddings
        |), m AS (
        |  SELECT vec_id, xd, list_min(xd) AS mn, list_max(xd) AS mx FROM x
        |), s AS (
        |  SELECT vec_id, xd, mn, mx, (mx - mn) / 255.0 AS scale FROM m
        |)
        |SELECT vec_id, mn, mx, scale,
        |  CAST(CASE WHEN scale = 0 THEN 0
        |    ELSE list_sum(list_transform(xd,
        |      e -> CAST(floor((e - mn) / scale + 0.5) AS BIGINT))) END AS BIGINT) AS q_sum,
        |  CASE WHEN scale = 0 THEN 0.0
        |    ELSE list_max(list_transform(xd,
        |      e -> abs(e - (mn + floor((e - mn) / scale + 0.5) * scale)))) END AS max_err
        |FROM s""".stripMargin,

    // q81: same 1e8 fixed-point quantization as the IVF trainer (q61),
    // so the per-dimension sums are exact integers and the one double
    // division at the end is bit-identical on both engines.
    "q81_lang_centroid" ->
      """WITH qe AS (
        |  SELECT e.vec_id, CAST(i AS INT) AS pos,
        |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |)
        |SELECT d.lang, q.pos, COUNT(*) AS n_vecs,
        |  CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS centroid
        |FROM qe q JOIN documents d ON d.doc_id = q.vec_id
        |GROUP BY 1, 2""".stripMargin,

    // q84: dots and norms are exact integer tf sums; sqrt and the one
    // division are correctly-rounded IEEE doubles, and the rank order
    // (cos_sim DESC, doc_id) is total — same determinism story as q24/q61.
    "q84_sparse_topk" ->
      """WITH tf AS (
        |  SELECT doc_id, word, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        |  ) GROUP BY 1, 2
        |), n2 AS (
        |  SELECT doc_id, SUM(tf * tf) AS n2 FROM tf GROUP BY 1
        |), dots AS (
        |  SELECT q.doc_id AS query_id, d.doc_id, SUM(q.tf * d.tf) AS dot
        |  FROM tf q JOIN tf d USING (word)
        |  WHERE q.doc_id < 10 AND d.doc_id <> q.doc_id
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT s.query_id, s.doc_id,
        |    CAST(s.dot AS DOUBLE) /
        |      (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS cos_sim
        |  FROM dots s
        |  JOIN n2 a ON a.doc_id = s.query_id
        |  JOIN n2 b ON b.doc_id = s.doc_id
        |)
        |SELECT query_id, doc_id, cos_sim, CAST(rnk AS INT) AS rnk FROM (
        |  SELECT query_id, doc_id, cos_sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, doc_id) AS rnk
        |  FROM scored
        |) WHERE rnk <= 5""".stripMargin,

    // q140: pure rank arithmetic and float PICKS — no float math for
    // engines to round differently.
    "q140_quantile_codebook" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(i - 1 AS INT) AS dim, embedding[i] AS x
        |  FROM embeddings em, LATERAL (SELECT unnest(range(1, len(em.embedding) + 1)) AS i) t
        |), r AS (
        |  SELECT vec_id, dim, x,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY dim ORDER BY x, vec_id) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY dim) AS BIGINT) AS n
        |  FROM e
        |), c AS (
        |  SELECT dim, x, rn, ((rn - 1) * 16) // n AS code FROM r
        |), b AS (
        |  SELECT dim, code, x, rn,
        |    CAST(COUNT(*) OVER (PARTITION BY dim, code) AS BIGINT) AS size,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY dim, code ORDER BY rn) AS BIGINT) AS lrn
        |  FROM c
        |), m AS (
        |  SELECT dim, code, x, size,
        |    MAX(CASE WHEN lrn = (size + 1) // 2 THEN x END) OVER (PARTITION BY dim, code) AS med
        |  FROM b
        |)
        |SELECT dim, CAST(code AS BIGINT) AS code, COUNT(*) AS n_members,
        |  CAST(MIN(x) AS DOUBLE) AS lo, CAST(MAX(x) AS DOUBLE) AS hi,
        |  CAST(MAX(med) AS DOUBLE) AS centroid
        |FROM m GROUP BY 1, 2""".stripMargin,

    // q191: the q24 fixed-point cosine kernel against the vec_id%50
    // eval slice, max per training vector, same 0.35 flag line.
    "q191_semantic_decontam" ->
      """WITH t AS (
        |  SELECT vec_id AS test_id, embedding AS te FROM embeddings WHERE vec_id % 50 = 0
        |), pairs AS (
        |  SELECT e.vec_id, t.test_id,
        |    SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(t.te[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS dot,
        |    SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS na,
        |    SUM(CAST(floor(CAST(t.te[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(t.te[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS nt
        |  FROM embeddings e, t, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) l
        |  WHERE e.vec_id % 50 != 0
        |  GROUP BY 1, 2
        |), c AS (
        |  SELECT vec_id,
        |    MAX(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nt AS DOUBLE)))) AS max_cos
        |  FROM pairs GROUP BY 1
        |)
        |SELECT vec_id, max_cos FROM c WHERE max_cos >= 0.35""".stripMargin,

    // q204: SemDedup. The training/assignment chain (qe … assign) is the
    // q61 unrolled fixed-point Lloyd loop verbatim — same k=8, iters=2 —
    // then within-cluster pairwise fixed-point cosine and the
    // lowest-id-wins drop at tau=0.4.
    "q204_semdedup" ->
      """WITH qe AS (
        |  SELECT e.vec_id, i AS pos,
        |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |), vn AS (
        |  SELECT vec_id, SUM(qx * qx) AS n2 FROM qe GROUP BY 1
        |), qc0 AS (
        |  SELECT vec_id AS cid, pos, qx AS qm FROM qe WHERE vec_id < 8
        |), cn0 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc0 GROUP BY 1
        |), d1 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc0 c ON c.pos = q.pos GROUP BY 1, 2
        |), a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d1 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn0 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m1 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a1 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc1 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m1
        |), cn1 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc1 GROUP BY 1
        |), d2 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc1 c ON c.pos = q.pos GROUP BY 1, 2
        |), a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d2 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn1 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m2 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a2 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc2 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m2
        |), cn2t AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc2 GROUP BY 1
        |), d3 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc2 c ON c.pos = q.pos GROUP BY 1, 2
        |), vc AS (
        |  SELECT d.vec_id, d.cid,
        |    CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) AS ccos
        |  FROM d3 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn2t c ON c.cid = d.cid
        |), assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM vc
        |  ) WHERE rn = 1
        |), mp AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb
        |  FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
        |), pd AS (
        |  SELECT mp.va, mp.vb, SUM(qa.qx * qb.qx) AS dot
        |  FROM mp JOIN qe qa ON qa.vec_id = mp.va
        |  JOIN qe qb ON qb.vec_id = mp.vb AND qb.pos = qa.pos
        |  GROUP BY 1, 2
        |), drp AS (
        |  SELECT DISTINCT pd.vb AS vec_id
        |  FROM pd JOIN vn na ON na.vec_id = pd.va JOIN vn nb ON nb.vec_id = pd.vb
        |  WHERE CAST(pd.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= 0.4
        |)
        |SELECT a.vec_id, a.cid, (d.vec_id IS NULL) AS keep
        |FROM assign a LEFT JOIN drp d ON d.vec_id = a.vec_id""".stripMargin,

    // q206: cluster keywords by lift. Training/assignment chain
    // (qe … assign) = the q61/q204 unrolled fixed-point Lloyd loop
    // verbatim (k=8, iters=2); lift = (c_cw/n_c)/(c_w/N) over exact
    // counts — three correctly-rounded double ops, identical in both
    // engines — ranked per cluster with the word tiebreak, support
    // floor c_cw >= 3, top 5.
    "q206_cluster_keywords" ->
      """WITH qe AS (
        |  SELECT e.vec_id, i AS pos,
        |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |), vn AS (
        |  SELECT vec_id, SUM(qx * qx) AS n2 FROM qe GROUP BY 1
        |), qc0 AS (
        |  SELECT vec_id AS cid, pos, qx AS qm FROM qe WHERE vec_id < 8
        |), cn0 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc0 GROUP BY 1
        |), d1 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc0 c ON c.pos = q.pos GROUP BY 1, 2
        |), a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d1 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn0 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m1 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a1 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc1 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m1
        |), cn1 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc1 GROUP BY 1
        |), d2 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc1 c ON c.pos = q.pos GROUP BY 1, 2
        |), a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d2 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn1 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m2 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a2 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc2 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m2
        |), cn2t AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc2 GROUP BY 1
        |), d3 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc2 c ON c.pos = q.pos GROUP BY 1, 2
        |), vc AS (
        |  SELECT d.vec_id, d.cid,
        |    CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) AS ccos
        |  FROM d3 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn2t c ON c.cid = d.cid
        |), assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM vc
        |  ) WHERE rn = 1
        |), wds AS (
        |  SELECT doc_id AS vec_id, unnest(string_split(text, ' ')) AS word FROM documents
        |), cw AS (
        |  SELECT a.cid, w.word, COUNT(*) AS c_cw
        |  FROM wds w JOIN assign a ON a.vec_id = w.vec_id GROUP BY 1, 2
        |), ct AS (
        |  SELECT cid, CAST(SUM(c_cw) AS BIGINT) AS n_c FROM cw GROUP BY 1
        |), wt AS (
        |  SELECT word, CAST(SUM(c_cw) AS BIGINT) AS c_w FROM cw GROUP BY 1
        |), nt AS (
        |  SELECT CAST(SUM(c_cw) AS BIGINT) AS n_total FROM cw
        |), scored AS (
        |  SELECT cw.cid, cw.word, cw.c_cw,
        |    (CAST(cw.c_cw AS DOUBLE) / CAST(ct.n_c AS DOUBLE)) /
        |      (CAST(wt.c_w AS DOUBLE) / CAST(nt.n_total AS DOUBLE)) AS lift
        |  FROM cw JOIN ct USING (cid) JOIN wt USING (word) CROSS JOIN nt
        |  WHERE cw.c_cw >= 3
        |)
        |SELECT cid, rk, word, c_cw, lift FROM (
        |  SELECT *, row_number() OVER (PARTITION BY cid ORDER BY lift DESC, word) AS rk FROM scored
        |) WHERE rk <= 5""".stripMargin,

    // q208: cluster purity audit. Training/assignment chain (qe … assign)
    // = the q61/q204/q206 unrolled fixed-point Lloyd loop verbatim (k=8,
    // iters=2); majority = rank-1 by (cnt DESC, label ASC), purity = one
    // correctly-rounded division.
    "q208_cluster_purity" ->
      """WITH qe AS (
        |  SELECT e.vec_id, i AS pos,
        |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |), vn AS (
        |  SELECT vec_id, SUM(qx * qx) AS n2 FROM qe GROUP BY 1
        |), qc0 AS (
        |  SELECT vec_id AS cid, pos, qx AS qm FROM qe WHERE vec_id < 8
        |), cn0 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc0 GROUP BY 1
        |), d1 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc0 c ON c.pos = q.pos GROUP BY 1, 2
        |), a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d1 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn0 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m1 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a1 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc1 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m1
        |), cn1 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc1 GROUP BY 1
        |), d2 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc1 c ON c.pos = q.pos GROUP BY 1, 2
        |), a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d2 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn1 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m2 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a2 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc2 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m2
        |), cn2t AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc2 GROUP BY 1
        |), d3 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc2 c ON c.pos = q.pos GROUP BY 1, 2
        |), vc AS (
        |  SELECT d.vec_id, d.cid,
        |    CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) AS ccos
        |  FROM d3 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn2t c ON c.cid = d.cid
        |), assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM vc
        |  ) WHERE rn = 1
        |), cl AS (
        |  SELECT a.cid, e.label, COUNT(*) AS cnt
        |  FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id GROUP BY 1, 2
        |), tot AS (
        |  SELECT cid, CAST(SUM(cnt) AS BIGINT) AS n_members FROM cl GROUP BY 1
        |), mj AS (
        |  SELECT cid, label AS majority_label, cnt AS n_majority FROM (
        |    SELECT cid, label, cnt, row_number() OVER (PARTITION BY cid ORDER BY cnt DESC, label) AS rn FROM cl
        |  ) WHERE rn = 1
        |)
        |SELECT t.cid, t.n_members, m.majority_label, m.n_majority,
        |  CAST(m.n_majority AS DOUBLE) / CAST(t.n_members AS DOUBLE) AS purity
        |FROM tot t JOIN mj m ON m.cid = t.cid""".stripMargin,

    "q212_pq_encode" ->
      """WITH dists AS (
        |  SELECT e.vec_id, s.sub, c.vec_id AS code, SUM(l.df * l.df) AS qdist
        |  FROM embeddings e
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS sub) s
        |  JOIN embeddings c ON c.vec_id < 16
        |  CROSS JOIN (SELECT unnest(range(1, 17)) AS i) d,
        |  LATERAL (SELECT
        |    CAST(floor(CAST(e.embedding[s.sub * 16 + d.i] AS DOUBLE) * 1e4 + 0.5) AS BIGINT)
        |    - CAST(floor(CAST(c.embedding[s.sub * 16 + d.i] AS DOUBLE) * 1e4 + 0.5) AS BIGINT) AS df) l
        |  GROUP BY 1, 2, 3
        |), enc AS (
        |  SELECT vec_id, sub, code, qdist FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY qdist, code) AS rn
        |    FROM dists
        |  ) WHERE rn = 1
        |)
        |SELECT CAST(sub AS INT) AS subspace, code, COUNT(*) AS n_assigned,
        |  CAST(SUM(qdist) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e8 AS avg_sqerr
        |FROM enc GROUP BY 1, 2""".stripMargin,

    "q213_pq_adc_topk" ->
      """WITH dists AS (
        |  SELECT e.vec_id, s.sub, c.vec_id AS code, SUM(l.df * l.df) AS qdist
        |  FROM embeddings e
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS sub) s
        |  JOIN embeddings c ON c.vec_id < 16
        |  CROSS JOIN (SELECT unnest(range(1, 17)) AS i) d,
        |  LATERAL (SELECT
        |    CAST(floor(CAST(e.embedding[s.sub * 16 + d.i] AS DOUBLE) * 1e4 + 0.5) AS BIGINT)
        |    - CAST(floor(CAST(c.embedding[s.sub * 16 + d.i] AS DOUBLE) * 1e4 + 0.5) AS BIGINT) AS df) l
        |  GROUP BY 1, 2, 3
        |), enc AS (
        |  SELECT vec_id, sub, code FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY qdist, code) AS rn
        |    FROM dists
        |  ) WHERE rn = 1
        |), lut AS (
        |  SELECT vec_id AS query_id, sub, code, qdist AS qd FROM dists WHERE vec_id < 10
        |), adc AS (
        |  SELECT l.query_id, e.vec_id AS neighbor_id,
        |    CAST(SUM(l.qd) AS DOUBLE) / 1e8 AS adc_sqdist
        |  FROM enc e JOIN lut l ON e.sub = l.sub AND e.code = l.code
        |  WHERE e.vec_id != l.query_id
        |  GROUP BY 1, 2
        |)
        |SELECT query_id, neighbor_id, adc_sqdist, "rank" FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_sqdist, neighbor_id) AS "rank"
        |  FROM adc
        |) WHERE "rank" <= 10""".stripMargin,

    "q214_coreset_coverage" ->
      """WITH hp AS (
        |  SELECT p, i,
        |    CASE WHEN substr(md5(p || ':' || i), 1, 1) IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END AS s
        |  FROM range(0, 6) tp(p), range(1, 65) ti(i)
        |), proj AS (
        |  SELECT e.vec_id, hp.p,
        |    CASE WHEN SUM(CAST(floor(CAST(e.embedding[hp.i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * hp.s) >= 0 THEN '1' ELSE '0' END AS bit
        |  FROM embeddings e, hp GROUP BY 1, 2
        |), sig AS (
        |  SELECT vec_id, string_agg(bit, '' ORDER BY p) AS bucket FROM proj GROUP BY vec_id
        |), reps AS (
        |  SELECT MIN(vec_id) AS rep_id FROM sig GROUP BY bucket
        |), rcos AS (
        |  SELECT e.vec_id, r.rep_id,
        |    CAST(SUM(q.qa * q.qb) AS DOUBLE) /
        |      (sqrt(CAST(SUM(q.qa * q.qa) AS DOUBLE)) * sqrt(CAST(SUM(q.qb * q.qb) AS DOUBLE))) AS cosine
        |  FROM embeddings e
        |  JOIN reps r ON TRUE
        |  JOIN embeddings er ON er.vec_id = r.rep_id,
        |  LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t,
        |  LATERAL (SELECT
        |    CAST(floor(CAST(e.embedding[t.i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qa,
        |    CAST(floor(CAST(er.embedding[t.i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qb) q
        |  GROUP BY 1, 2
        |), nearest AS (
        |  SELECT vec_id, rep_id, cosine FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, rep_id) AS rn
        |    FROM rcos
        |  ) WHERE rn = 1
        |)
        |SELECT rep_id, COUNT(*) AS n_covered, MIN(cosine) AS min_cos,
        |  CAST(SUM(CASE WHEN cosine >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_close
        |FROM nearest GROUP BY rep_id""".stripMargin,

    "q215_jl_distortion" ->
      """WITH hp AS (
        |  SELECT p, i,
        |    CASE WHEN substr(md5(p || ':' || i), 1, 1) IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END AS s
        |  FROM range(0, 16) tp(p), range(1, 65) ti(i)
        |), e40 AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 40
        |), proj AS (
        |  SELECT e.vec_id, hp.p,
        |    SUM(hp.s * CAST(floor(CAST(e.embedding[hp.i] AS DOUBLE) * 1e4 + 0.5) AS BIGINT)) AS y
        |  FROM e40 e, hp GROUP BY 1, 2
        |), pcos AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    CAST(SUM(pa.y * pb.y) AS DOUBLE) /
        |      (sqrt(CAST(SUM(pa.y * pa.y) AS DOUBLE)) * sqrt(CAST(SUM(pb.y * pb.y) AS DOUBLE))) AS cos_proj
        |  FROM e40 a
        |  JOIN e40 b ON a.vec_id < b.vec_id
        |  JOIN proj pa ON pa.vec_id = a.vec_id
        |  JOIN proj pb ON pb.vec_id = b.vec_id AND pb.p = pa.p
        |  GROUP BY 1, 2
        |), ocos AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    CAST(SUM(q.qa * q.qb) AS DOUBLE) /
        |      (sqrt(CAST(SUM(q.qa * q.qa) AS DOUBLE)) * sqrt(CAST(SUM(q.qb * q.qb) AS DOUBLE))) AS cos_orig
        |  FROM e40 a
        |  JOIN e40 b ON a.vec_id < b.vec_id,
        |  LATERAL (SELECT unnest(range(1, len(a.embedding) + 1)) AS i) t,
        |  LATERAL (SELECT
        |    CAST(floor(CAST(a.embedding[t.i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qa,
        |    CAST(floor(CAST(b.embedding[t.i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qb) q
        |  GROUP BY 1, 2
        |)
        |SELECT o.vec_a, o.vec_b, o.cos_orig, p.cos_proj,
        |  p.cos_proj - o.cos_orig AS distortion
        |FROM ocos o JOIN pcos p ON o.vec_a = p.vec_a AND o.vec_b = p.vec_b""".stripMargin,

    "q218_pq_staleness" ->
      """WITH dists AS (
        |  SELECT e.vec_id, s.sub, c.vec_id AS code, SUM(l.df * l.df) AS qdist
        |  FROM embeddings e
        |  CROSS JOIN (SELECT unnest(range(0, 4)) AS sub) s
        |  JOIN embeddings c ON c.vec_id % 2 = 0 AND c.vec_id < 64
        |  CROSS JOIN (SELECT unnest(range(1, 17)) AS i) d,
        |  LATERAL (SELECT
        |    CAST(floor(CAST(e.embedding[s.sub * 16 + d.i] AS DOUBLE) * 1e4 + 0.5) AS BIGINT)
        |    - CAST(floor(CAST(c.embedding[s.sub * 16 + d.i] AS DOUBLE) * 1e4 + 0.5) AS BIGINT) AS df) l
        |  GROUP BY 1, 2, 3
        |), enc AS (
        |  SELECT vec_id, sub, qdist, vec_id % 2 = 1 AS is_delta FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY qdist, code) AS rn
        |    FROM dists
        |  ) WHERE rn = 1
        |), agg AS (
        |  SELECT CAST(sub AS INT) AS subspace,
        |    CAST(SUM(CASE WHEN NOT is_delta THEN 1 ELSE 0 END) AS BIGINT) AS n_index,
        |    CAST(SUM(CASE WHEN is_delta THEN 1 ELSE 0 END) AS BIGINT) AS n_delta,
        |    CAST(SUM(CASE WHEN NOT is_delta THEN qdist ELSE 0 END) AS DOUBLE)
        |      / CAST(SUM(CASE WHEN NOT is_delta THEN 1 ELSE 0 END) AS DOUBLE) / 1e8 AS err_index,
        |    CAST(SUM(CASE WHEN is_delta THEN qdist ELSE 0 END) AS DOUBLE)
        |      / CAST(SUM(CASE WHEN is_delta THEN 1 ELSE 0 END) AS DOUBLE) / 1e8 AS err_delta
        |  FROM enc GROUP BY sub
        |)
        |SELECT subspace, n_index, n_delta, err_index, err_delta,
        |  err_delta / nullif(err_index, 0) AS staleness_ratio
        |FROM agg""".stripMargin,

    // q221: norms are exact int64 on the 1e8 grid (per-element quantized
    // squares, integer-summed), one correctly-rounded sqrt per row —
    // empty arrays coalesce to 0 (DuckDB list_sum of [] is NULL, the JVM
    // fold is 0), non-finite vectors get NULL norms in both engines.
    "q221_embedding_hygiene" ->
      """WITH v AS (
        |  SELECT label, len(embedding) AS dim,
        |    len(list_filter(embedding, e -> NOT isfinite(e))) > 0 AS bad,
        |    embedding
        |  FROM embeddings
        |), n AS (
        |  SELECT label, dim, bad,
        |    CASE WHEN NOT bad THEN CAST(floor(sqrt(CAST(coalesce(
        |      list_sum(list_transform(embedding,
        |        e -> CAST(floor(CAST(e AS DOUBLE) * 1e8 + 0.5) AS BIGINT)
        |           * CAST(floor(CAST(e AS DOUBLE) * 1e8 + 0.5) AS BIGINT))),
        |      0) AS DOUBLE)) + 0.5) AS BIGINT) END AS norm_fp
        |  FROM v
        |)
        |SELECT label, COUNT(*) AS n_vecs, MIN(dim) AS dim_min, MAX(dim) AS dim_max,
        |  CAST(SUM(CASE WHEN norm_fp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_vecs,
        |  CAST(SUM(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite_vecs,
        |  COUNT(norm_fp) AS n_finite,
        |  MIN(norm_fp) AS norm_min_fp, MAX(norm_fp) AS norm_max_fp,
        |  CAST(SUM(norm_fp) AS BIGINT) AS norm_sum_fp,
        |  CAST(SUM(norm_fp) AS DOUBLE) / CAST(COUNT(norm_fp) AS DOUBLE) / 1e8 AS norm_mean
        |FROM n GROUP BY label""".stripMargin,

    // q225: q208's unrolled fixed-point Lloyd assignment chain verbatim
    // (k=8, iters=2), then rank-striped cell→shard placement over the
    // 8-row count table.
    "q225_shard_plan" ->
      """WITH qe AS (
        |  SELECT e.vec_id, i AS pos,
        |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |), vn AS (
        |  SELECT vec_id, SUM(qx * qx) AS n2 FROM qe GROUP BY 1
        |), qc0 AS (
        |  SELECT vec_id AS cid, pos, qx AS qm FROM qe WHERE vec_id < 8
        |), cn0 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc0 GROUP BY 1
        |), d1 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc0 c ON c.pos = q.pos GROUP BY 1, 2
        |), a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d1 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn0 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m1 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a1 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc1 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m1
        |), cn1 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc1 GROUP BY 1
        |), d2 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc1 c ON c.pos = q.pos GROUP BY 1, 2
        |), a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d2 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn1 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m2 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a2 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc2 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m2
        |), cn2t AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc2 GROUP BY 1
        |), d3 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc2 c ON c.pos = q.pos GROUP BY 1, 2
        |), vc AS (
        |  SELECT d.vec_id, d.cid,
        |    CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) AS ccos
        |  FROM d3 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn2t c ON c.cid = d.cid
        |), assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM vc
        |  ) WHERE rn = 1
        |), counts AS (
        |  SELECT cid, COUNT(*) AS n_vecs FROM assign GROUP BY 1
        |), striped AS (
        |  SELECT cid, n_vecs,
        |    (row_number() OVER (ORDER BY n_vecs DESC, cid) - 1) % 4 AS shard
        |  FROM counts
        |), tot AS (
        |  SELECT CAST(SUM(n_vecs) AS BIGINT) AS n_total FROM counts
        |)
        |SELECT s.shard, COUNT(*) AS n_cells,
        |  CAST(SUM(s.n_vecs) AS BIGINT) AS n_vecs, t.n_total,
        |  CAST(SUM(s.n_vecs) AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS share,
        |  CAST(SUM(s.n_vecs) AS DOUBLE) / CAST(t.n_total AS DOUBLE) * 4 AS imbalance
        |FROM striped s CROSS JOIN tot t
        |GROUP BY s.shard, t.n_total""".stripMargin,

    // q229: exact integer moments on the 1e4 grid; cov is the one double
    // division (n*sxy - sx*sy)/n^2/1e8 in the same op order both engines.
    "q229_embedding_covariance" ->
      """WITH qe AS (
        |  SELECT e.vec_id, i AS pos,
        |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e4 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |), pr AS (
        |  SELECT a.pos - 1 AS i, b.pos - 1 AS j, a.qx * b.qx AS xy, a.qx AS x, b.qx AS y
        |  FROM qe a JOIN qe b ON a.vec_id = b.vec_id AND a.pos <= b.pos
        |)
        |SELECT i, j, COUNT(*) AS n, CAST(SUM(xy) AS BIGINT) AS sxy,
        |  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |  CAST(COUNT(*) * CAST(SUM(xy) AS BIGINT) - CAST(SUM(x) AS BIGINT) * CAST(SUM(y) AS BIGINT) AS DOUBLE)
        |    / CAST(COUNT(*) * COUNT(*) AS DOUBLE) / 1e8 AS cov
        |FROM pr GROUP BY 1, 2""".stripMargin,

    // q230: q229's moment chain, downscaled (floor(c/2^30+0.5) in double
    // -- exact power-of-two scaling), mirrored to the full matrix, then
    // 4 unrolled power-iteration steps; norms via exact HUGEINT sums
    // with the VARCHAR->DOUBLE parse (DuckDB's direct HUGEINT cast is
    // not correctly rounded past 2^53).
    "q230_pca_power" ->
      """WITH qe AS (
        |  SELECT e.vec_id, i AS pos,
        |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e4 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |), pr AS (
        |  SELECT a.pos - 1 AS i, b.pos - 1 AS j, a.qx * b.qx AS xy, a.qx AS x, b.qx AS y
        |  FROM qe a JOIN qe b ON a.vec_id = b.vec_id AND a.pos <= b.pos
        |), cu AS (
        |  SELECT i, j, CAST(floor(CAST(COUNT(*) * CAST(SUM(xy) AS BIGINT)
        |      - CAST(SUM(x) AS BIGINT) * CAST(SUM(y) AS BIGINT) AS DOUBLE)
        |      / 1073741824.0 + 0.5) AS BIGINT) AS c
        |  FROM pr GROUP BY 1, 2
        |), cm AS (
        |  SELECT i, j, c FROM cu
        |  UNION ALL
        |  SELECT j AS i, i AS j, c FROM cu WHERE i <> j
        |), v0 AS (
        |  SELECT CAST(i AS INT) AS vi, CAST(1000000 AS BIGINT) AS val FROM range(0, 64) t(i)
|), w1 AS (
        |  SELECT m.i, CAST(SUM(m.c * v.val) AS BIGINT) AS w
        |  FROM cm m JOIN v0 v ON m.j = v.vi GROUP BY m.i
        |), n1 AS (
        |  SELECT SUM(CAST(w AS HUGEINT) * w) AS n2 FROM w1
        |), v1 AS (
        |  SELECT CAST(w1.i AS INT) AS vi,
        |    CAST(floor(CAST(w AS DOUBLE)
        |      / sqrt(nullif(CAST(CAST(n2 AS VARCHAR) AS DOUBLE), 0.0)) * 1e6 + 0.5) AS BIGINT) AS val
        |  FROM w1, n1
|), w2 AS (
        |  SELECT m.i, CAST(SUM(m.c * v.val) AS BIGINT) AS w
        |  FROM cm m JOIN v1 v ON m.j = v.vi GROUP BY m.i
        |), n2 AS (
        |  SELECT SUM(CAST(w AS HUGEINT) * w) AS n2 FROM w2
        |), v2 AS (
        |  SELECT CAST(w2.i AS INT) AS vi,
        |    CAST(floor(CAST(w AS DOUBLE)
        |      / sqrt(nullif(CAST(CAST(n2 AS VARCHAR) AS DOUBLE), 0.0)) * 1e6 + 0.5) AS BIGINT) AS val
        |  FROM w2, n2
|), w3 AS (
        |  SELECT m.i, CAST(SUM(m.c * v.val) AS BIGINT) AS w
        |  FROM cm m JOIN v2 v ON m.j = v.vi GROUP BY m.i
        |), n3 AS (
        |  SELECT SUM(CAST(w AS HUGEINT) * w) AS n2 FROM w3
        |), v3 AS (
        |  SELECT CAST(w3.i AS INT) AS vi,
        |    CAST(floor(CAST(w AS DOUBLE)
        |      / sqrt(nullif(CAST(CAST(n2 AS VARCHAR) AS DOUBLE), 0.0)) * 1e6 + 0.5) AS BIGINT) AS val
        |  FROM w3, n3
|), w4 AS (
        |  SELECT m.i, CAST(SUM(m.c * v.val) AS BIGINT) AS w
        |  FROM cm m JOIN v3 v ON m.j = v.vi GROUP BY m.i
        |), n4 AS (
        |  SELECT SUM(CAST(w AS HUGEINT) * w) AS n2 FROM w4
        |), v4 AS (
        |  SELECT CAST(w4.i AS INT) AS vi,
        |    CAST(floor(CAST(w AS DOUBLE)
        |      / sqrt(nullif(CAST(CAST(n2 AS VARCHAR) AS DOUBLE), 0.0)) * 1e6 + 0.5) AS BIGINT) AS val
        |  FROM w4, n4
|), cv AS (
        |  SELECT m.i, CAST(SUM(m.c * v.val) AS BIGINT) AS cv
        |  FROM cm m JOIN v4 v ON m.j = v.vi GROUP BY m.i
        |), num AS (
        |  SELECT SUM(CAST(cv.cv AS HUGEINT) * v.val) AS num FROM cv JOIN v4 v ON cv.i = v.vi
        |), den AS (
        |  SELECT CAST(SUM(val * val) AS BIGINT) AS den FROM v4
        |), tr AS (
        |  SELECT CAST(SUM(c) AS BIGINT) AS tr FROM cm WHERE i = j
        |)
        |SELECT v.vi AS dim, CAST(v.val AS DOUBLE) / 1e6 AS loading,
        |  CAST(CAST(num.num AS VARCHAR) AS DOUBLE) / nullif(CAST(den.den AS DOUBLE), 0.0)
        |    / nullif(CAST(tr.tr AS DOUBLE), 0.0) AS var_share
        |FROM v4 v CROSS JOIN num CROSS JOIN den CROSS JOIN tr""".stripMargin,

    // q231: exact HUGEINT moments, VARCHAR->DOUBLE parses (DuckDB's
    // direct HUGEINT cast is not correctly rounded past 2^53, Spark's
    // BigDecimal path is).
    "q231_modality_alignment" ->
      """WITH nf AS (
        |  SELECT vec_id AS doc_id,
        |    CAST(floor(sqrt(CAST(coalesce(list_sum(list_transform(embedding,
        |      e -> CAST(floor(CAST(e AS DOUBLE) * 1e8 + 0.5) AS BIGINT)
        |         * CAST(floor(CAST(e AS DOUBLE) * 1e8 + 0.5) AS BIGINT))), 0) AS DOUBLE))
        |      + 0.5) AS BIGINT) AS norm_fp
        |  FROM embeddings
        |), j AS (
        |  SELECT d.lang, d.n_chars, nf.norm_fp
        |  FROM documents d JOIN nf USING (doc_id)
        |), m AS (
        |  SELECT lang, COUNT(*) AS n,
        |    SUM(CAST(n_chars AS HUGEINT)) AS sx,
        |    SUM(CAST(norm_fp AS HUGEINT)) AS sy,
        |    SUM(CAST(n_chars AS HUGEINT) * norm_fp) AS sxy,
        |    SUM(CAST(n_chars AS HUGEINT) * n_chars) AS sxx,
        |    SUM(CAST(norm_fp AS HUGEINT) * norm_fp) AS syy
        |  FROM j GROUP BY 1
        |)
        |SELECT lang, n,
        |  CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
        |    / sqrt(nullif(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
        |                  * CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE), 0.0)) AS corr,
        |  CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) AS mean_chars,
        |  CAST(CAST(sy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE) / 1e8 AS mean_norm
        |FROM m""".stripMargin,

    // q235: q61's trained-IVF chain (verbatim, through `scored`) + the
    // exact brute-force top-5 from the shared qe/vn moments, rolled into
    // per-query recall@5.
    "q235_ivf_recall" ->
      """WITH qe AS (
        |  SELECT e.vec_id, i AS pos,
        |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |), vn AS (
        |  SELECT vec_id, SUM(qx * qx) AS n2 FROM qe GROUP BY 1
        |), qc0 AS (
        |  SELECT vec_id AS cid, pos, qx AS qm FROM qe WHERE vec_id < 8
        |), cn0 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc0 GROUP BY 1
        |), d1 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc0 c ON c.pos = q.pos GROUP BY 1, 2
        |), a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d1 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn0 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m1 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a1 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc1 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m1
        |), cn1 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc1 GROUP BY 1
        |), d2 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc1 c ON c.pos = q.pos GROUP BY 1, 2
        |), a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d2 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn1 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m2 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a2 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc2 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m2
        |), cn2t AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc2 GROUP BY 1
        |), d3 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN qc2 c ON c.pos = q.pos GROUP BY 1, 2
        |), vc AS (
        |  SELECT d.vec_id, d.cid,
        |    CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) AS ccos
        |  FROM d3 d JOIN vn v ON v.vec_id = d.vec_id JOIN cn2t c ON c.cid = d.cid
        |), assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM vc
        |  ) WHERE rn = 1
        |), probe AS (
        |  SELECT vec_id AS query_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
        |    FROM vc WHERE vec_id < 10
        |  ) WHERE rn <= 2
        |), cand AS (
        |  SELECT p.query_id, a.vec_id AS neighbor_id
        |  FROM probe p JOIN assign a ON a.cid = p.cid WHERE a.vec_id != p.query_id
        |), nd AS (
        |  SELECT c.query_id, c.neighbor_id, SUM(qa.qx * qb.qx) AS dot
        |  FROM cand c JOIN qe qa ON qa.vec_id = c.query_id
        |  JOIN qe qb ON qb.vec_id = c.neighbor_id AND qb.pos = qa.pos
        |  GROUP BY 1, 2
        |), scored AS (
        |  SELECT n.query_id, n.neighbor_id,
        |    CAST(n.dot AS DOUBLE) / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nn.n2 AS DOUBLE))) AS cosine
        |  FROM nd n JOIN vn nq ON nq.vec_id = n.query_id JOIN vn nn ON nn.vec_id = n.neighbor_id
        |)
        |, ivf AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT s.query_id, s.neighbor_id,
        |      row_number() OVER (PARTITION BY s.query_id ORDER BY s.cosine DESC, s.neighbor_id) AS rn
        |    FROM scored s
        |  ) WHERE rn <= 5
        |), bfd AS (
        |  SELECT qa.vec_id AS query_id, qb.vec_id AS neighbor_id, SUM(qa.qx * qb.qx) AS dot
        |  FROM qe qa JOIN qe qb ON qb.pos = qa.pos AND qb.vec_id != qa.vec_id
        |  WHERE qa.vec_id < 10 GROUP BY 1, 2
        |), bf AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT d.query_id, d.neighbor_id,
        |      row_number() OVER (PARTITION BY d.query_id
        |        ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(vq.n2 AS DOUBLE)) * sqrt(CAST(vb.n2 AS DOUBLE))) DESC, d.neighbor_id) AS rn
        |    FROM bfd d JOIN vn vq ON vq.vec_id = d.query_id JOIN vn vb ON vb.vec_id = d.neighbor_id
        |  ) WHERE rn <= 5
        |), hits AS (
        |  SELECT bf.query_id, COUNT(*) AS n_hit
        |  FROM bf JOIN ivf ON bf.query_id = ivf.query_id AND bf.neighbor_id = ivf.neighbor_id
        |  GROUP BY 1
        |), tru AS (
        |  SELECT query_id, COUNT(*) AS n_truth FROM bf GROUP BY 1
        |)
        |SELECT t.query_id, t.n_truth,
        |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
        |  CAST(coalesce(h.n_hit, 0) AS DOUBLE) / nullif(CAST(t.n_truth AS DOUBLE), 0.0) AS recall
        |FROM tru t LEFT JOIN hits h USING (query_id)""".stripMargin,

    "q243_hybrid_rrf" ->
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
        |  SELECT doc_id,
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
        |), lex AS (
        |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS lex_rank
        |  FROM sc WHERE score > 0 QUALIFY lex_rank <= 64
        |), q AS (
        |  SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
        |), pairs AS (
        |  SELECT e.vec_id AS doc_id,
        |    SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(q.qe[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS dot,
        |    SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS na,
        |    SUM(CAST(floor(CAST(q.qe[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(q.qe[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS nq
        |  FROM embeddings e, q, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |  WHERE e.vec_id != 0
        |  GROUP BY 1
        |), dense AS (
        |  SELECT doc_id, CAST(row_number() OVER (
        |      ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nq AS DOUBLE))) DESC, doc_id) AS INT) AS dense_rank
        |  FROM pairs QUALIFY dense_rank <= 64
        |)
        |SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id, l.lex_rank, d.dense_rank,
        |  (COALESCE(1.0 / (60 + l.lex_rank), 0.0) + COALESCE(1.0 / (60 + d.dense_rank), 0.0)) AS rrf
        |FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
        |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,

    // q250: reciprocal (best-buddy) nearest neighbours inside the q25
    // LSH buckets — per-vector argmax with smaller-id tie-break, then
    // the mutuality self-join.
    "q250_reciprocal_nn" ->
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
        |), directed AS (
        |  SELECT vec_a AS src, vec_b AS nbr, cosine FROM cos
        |  UNION ALL
        |  SELECT vec_b, vec_a, cosine FROM cos
        |), best AS (
        |  SELECT src, nbr, cosine FROM (
        |    SELECT src, nbr, cosine,
        |      row_number() OVER (PARTITION BY src
        |        ORDER BY cosine DESC, nbr ASC) AS rn
        |    FROM directed)
        |  WHERE rn = 1
        |)
        |SELECT x.src AS vec_a, x.nbr AS vec_b, x.cosine AS cosine
        |FROM best x JOIN best y
        |  ON x.src = y.nbr AND x.nbr = y.src AND x.src < x.nbr""".stripMargin,

    // q270: CSLS/ratio-margin pairs — q250's LSH+fixed-point-cosine
    // chain, cosines floored to the 1e6 grid, μk kept as an unreduced
    // (sum, count), one positive HUGEINT division on the common
    // denominator (mirrors Spark's DECIMAL(38,0) div exactly).
    "q270_margin_pairs" ->
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
        |), cosm AS (
        |  SELECT vec_a, vec_b, CAST(floor(cosine * 1e6) AS BIGINT) AS cos_micro FROM cos
        |), directed AS (
        |  SELECT vec_a AS src, vec_b AS nbr, cos_micro FROM cosm
        |  UNION ALL
        |  SELECT vec_b, vec_a, cos_micro FROM cosm
        |), topk AS (
        |  SELECT src, SUM(cos_micro) AS msum, COUNT(*) AS mn FROM (
        |    SELECT src, cos_micro,
        |      row_number() OVER (PARTITION BY src
        |        ORDER BY cos_micro DESC, nbr ASC) AS rn
        |    FROM directed)
        |  WHERE rn <= 3 GROUP BY src
        |), scored AS (
        |  SELECT c.vec_a, c.vec_b, c.cos_micro,
        |    CAST((2000000::HUGEINT * c.cos_micro * a.mn * b.mn)
        |      // (CAST(a.msum AS HUGEINT) * b.mn + CAST(b.msum AS HUGEINT) * a.mn)
        |      AS BIGINT) AS margin_micro
        |  FROM cosm c
        |  JOIN topk a ON a.src = c.vec_a
        |  JOIN topk b ON b.src = c.vec_b
        |  WHERE c.cos_micro > 0
        |    AND CAST(a.msum AS HUGEINT) * b.mn + CAST(b.msum AS HUGEINT) * a.mn > 0
        |)
        |SELECT vec_a, vec_b, cos_micro, margin_micro
        |FROM scored WHERE margin_micro >= 1020000""".stripMargin,

    // q271: centroid-distance outliers — common-denominator squared
    // distance in HUGEINT (mirrors DECIMAL(38,0)), per-label rank via
    // row_number (Spark recovers it from the bucketedPrefix global
    // rank), one VARCHAR-routed double division for the reported d2.
    "q271_centroid_outliers" ->
      """WITH q AS (
        |  SELECT vec_id, label, i AS pos,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS x
        |  FROM embeddings,
        |  LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) t
        |), s AS (
        |  SELECT label, pos, SUM(x) AS s FROM q GROUP BY 1, 2
        |), n AS (
        |  SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1
        |), d AS (
        |  SELECT q.vec_id, q.label,
        |    SUM((CAST(q.x AS HUGEINT) * n.n - s.s)
        |      * (CAST(q.x AS HUGEINT) * n.n - s.s)) AS d2num,
        |    MAX(n.n) AS n
        |  FROM q JOIN s USING (label, pos) JOIN n USING (label)
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT vec_id, label,
        |    CAST(CAST(d2num AS VARCHAR) AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * n * 1e16) AS d2,
        |    CAST(row_number() OVER (PARTITION BY label
        |      ORDER BY d2num DESC, vec_id) AS BIGINT) AS rank,
        |    n
        |  FROM d
        |)
        |SELECT vec_id, label, d2, rank,
        |  rank <= (n * 1 + 99) // 100 AS flagged
        |FROM r""".stripMargin,

    // q275: hard negatives — the q250 LSH + fixed-point-cosine chain,
    // band-filtered on the 1e6 grid, per-anchor top-3 by row_number.
    "q275_hard_negatives" ->
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
        |    CAST(floor(1e6 *
        |      CAST(SUM(CAST(floor(CAST(ea.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(eb.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE) /
        |      (sqrt(CAST(SUM(CAST(floor(CAST(ea.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(ea.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE)) *
        |       sqrt(CAST(SUM(CAST(floor(CAST(eb.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(eb.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE)))) AS BIGINT) AS cos_micro
        |  FROM cand c
        |  JOIN embeddings ea ON c.vec_a = ea.vec_id
        |  JOIN embeddings eb ON c.vec_b = eb.vec_id,
        |  LATERAL (SELECT unnest(range(1, len(ea.embedding) + 1)) AS i) t
        |  GROUP BY 1, 2
        |), band AS (
        |  SELECT * FROM cos WHERE cos_micro >= 300000 AND cos_micro < 900000
        |), directed AS (
        |  SELECT vec_a AS anchor, vec_b AS negative, cos_micro FROM band
        |  UNION ALL
        |  SELECT vec_b, vec_a, cos_micro FROM band
        |)
        |SELECT anchor, negative, cos_micro, CAST(rank AS BIGINT) AS rank
        |FROM (
        |  SELECT anchor, negative, cos_micro,
        |    row_number() OVER (PARTITION BY anchor
        |      ORDER BY cos_micro DESC, negative ASC) AS rank
        |  FROM directed)
        |WHERE rank <= 3""".stripMargin,

    // q288: diversity-first selection — q214's md5 hyperplane cells,
    // within-cell vec_id rank, first K of the (round, cell) total order;
    // one global cumulative window stands in for bucketedPrefix.
    "q288_diverse_select" ->
      """WITH hp AS (
        |  SELECT p, i,
        |    CASE WHEN substr(md5(p || ':' || i), 1, 1) IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END AS s
        |  FROM range(0, 6) tp(p), range(1, 65) ti(i)
        |), proj AS (
        |  SELECT e.vec_id, hp.p,
        |    CASE WHEN SUM(CAST(floor(CAST(e.embedding[hp.i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * hp.s) >= 0 THEN '1' ELSE '0' END AS bit
        |  FROM embeddings e, hp GROUP BY 1, 2
        |), sig AS (
        |  SELECT vec_id, string_agg(bit, '' ORDER BY p) AS bucket FROM proj GROUP BY vec_id
        |), rnk AS (
        |  SELECT vec_id, bucket,
        |    ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) AS r
        |  FROM sig
        |), gl AS (
        |  SELECT s.bucket, s.r, e.label,
        |    ROW_NUMBER() OVER (ORDER BY s.r, s.bucket) AS grank
        |  FROM rnk s JOIN embeddings e ON e.vec_id = s.vec_id
        |)
        |SELECT label, COUNT(*) AS n_selected,
        |  CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_cells,
        |  CAST(MAX(r) AS INT) AS max_round
        |FROM gl WHERE grank <= 300 GROUP BY 1""".stripMargin,

    // q296: the q204 Lloyd CTE chain restricted to the standing corpus
    // tier (md5 bucket < 95 — the q295 split), then ONE argmax assignment
    // of the delta tier against the trained centroids. Init replicates
    // the trainer: the first 8 vec_ids OF THE CORPUS TIER (a seed that
    // hashes into the delta is absent — k shrinks identically on both
    // engines).
    "q296_delta_assign" ->
      """WITH bkt AS (
        |  SELECT vec_id,
        |    ( (instr('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 4, 1)) - 1) ) % 100 AS bucket
        |  FROM embeddings
        |), qe AS (
        |  SELECT e.vec_id, i AS pos,
        |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |), qec AS (
        |  SELECT qe.* FROM qe JOIN bkt ON bkt.vec_id = qe.vec_id WHERE bkt.bucket < 95
        |), qed AS (
        |  SELECT qe.* FROM qe JOIN bkt ON bkt.vec_id = qe.vec_id WHERE bkt.bucket >= 95
        |), vnc AS (
        |  SELECT vec_id, SUM(qx * qx) AS n2 FROM qec GROUP BY 1
        |), vnd AS (
        |  SELECT vec_id, SUM(qx * qx) AS n2 FROM qed GROUP BY 1
        |), qc0 AS (
        |  SELECT vec_id AS cid, pos, qx AS qm FROM qec WHERE vec_id < 8
        |), cn0 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc0 GROUP BY 1
        |), d1 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qec q JOIN qc0 c ON c.pos = q.pos GROUP BY 1, 2
        |), a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d1 d JOIN vnc v ON v.vec_id = d.vec_id JOIN cn0 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m1 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a1 a JOIN qec q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc1 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m1
        |), cn1 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc1 GROUP BY 1
        |), d2 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qec q JOIN qc1 c ON c.pos = q.pos GROUP BY 1, 2
        |), a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM d2 d JOIN vnc v ON v.vec_id = d.vec_id JOIN cn1 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), m2 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM a2 a JOIN qec q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), qc2 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM m2
        |), cn2t AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM qc2 GROUP BY 1
        |), d3 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qed q JOIN qc2 c ON c.pos = q.pos GROUP BY 1, 2
        |)
        |SELECT vec_id, cid FROM (
        |  SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |    ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |  FROM d3 d JOIN vnd v ON v.vec_id = d.vec_id JOIN cn2t c ON c.cid = d.cid
        |) WHERE rn = 1""".stripMargin,

    // q297: the q24 exact top-k chain + label relevance; both metrics
    // are integer floor divisions on the micro grid, so the hash gate
    // sees exact longs on both engines.
    "q297_retrieval_eval" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qe, label AS ql FROM embeddings WHERE vec_id < 10
        |), pairs AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(q.qe[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS dot,
        |    SUM(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS na,
        |    SUM(CAST(floor(CAST(q.qe[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) * CAST(floor(CAST(q.qe[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)) AS nq
        |  FROM embeddings e, q, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |  WHERE e.vec_id != q.query_id
        |  GROUP BY 1, 2
        |), c AS (
        |  SELECT query_id, neighbor_id, CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nq AS DOUBLE))) AS cosine FROM pairs
        |), topk AS (
        |  SELECT query_id, neighbor_id, "rank" FROM (
        |    SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS "rank" FROM c
        |  ) WHERE "rank" <= 10
        |), rel AS (
        |  SELECT t.query_id, q.ql, t."rank",
        |    CASE WHEN e.label = q.ql THEN 1 ELSE 0 END AS is_rel
        |  FROM topk t JOIN q ON q.query_id = t.query_id
        |  JOIN embeddings e ON e.vec_id = t.neighbor_id
        |), per AS (
        |  SELECT query_id, ql, CAST(SUM(is_rel) AS BIGINT) AS n_rel_at_k,
        |    MIN(CASE WHEN is_rel = 1 THEN "rank" END) AS first_rank
        |  FROM rel GROUP BY 1, 2
        |), cs AS (
        |  SELECT label, COUNT(*) AS n_label FROM embeddings GROUP BY 1
        |)
        |SELECT p.query_id,
        |  p.n_rel_at_k,
        |  COALESCE(p.first_rank, 0) AS first_rel_rank,
        |  COALESCE(1000000 // p.first_rank, 0) AS mrr_micro,
        |  cs.n_label - 1 AS n_rel_total,
        |  CASE WHEN least(cs.n_label - 1, 10) = 0 THEN 0
        |       ELSE (p.n_rel_at_k * 1000000) // least(cs.n_label - 1, 10) END AS recall_at_k_micro
        |FROM per p JOIN cs ON cs.label = p.ql""".stripMargin,

    // q298: TWO Lloyd chains (the q204 CTE trained on all vectors, the
    // q296 chain trained on the corpus tier), then the per-cid cosine
    // between the two trained codebooks. The final centroids on each
    // side are the iteration-2 means re-quantized (qc2* CTEs) — exactly
    // what the Spark side's fixed-point cosine sees after the float
    // arrays round-trip the derived-store parquet.
    "q298_codebook_drift" ->
      """WITH bkt AS (
        |  SELECT vec_id,
        |    ( (instr('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |    + (instr('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 2, 1)) - 1) * 256
        |    + (instr('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 3, 1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 4, 1)) - 1) ) % 100 AS bucket
        |  FROM embeddings
        |), qe AS (
        |  SELECT e.vec_id, i AS pos,
        |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qx
        |  FROM embeddings e, LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) t
        |), vn AS (
        |  SELECT vec_id, SUM(qx * qx) AS n2 FROM qe GROUP BY 1
        |), fqc0 AS (
        |  SELECT vec_id AS cid, pos, qx AS qm FROM qe WHERE vec_id < 8
        |), fcn0 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM fqc0 GROUP BY 1
        |), fd1 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN fqc0 c ON c.pos = q.pos GROUP BY 1, 2
        |), fa1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM fd1 d JOIN vn v ON v.vec_id = d.vec_id JOIN fcn0 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), fm1 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM fa1 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), fqc1 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM fm1
        |), fcn1 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM fqc1 GROUP BY 1
        |), fd2 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qe q JOIN fqc1 c ON c.pos = q.pos GROUP BY 1, 2
        |), fa2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM fd2 d JOIN vn v ON v.vec_id = d.vec_id JOIN fcn1 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), fm2 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM fa2 a JOIN qe q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), fqc2 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM fm2
        |), qec AS (
        |  SELECT qe.* FROM qe JOIN bkt ON bkt.vec_id = qe.vec_id WHERE bkt.bucket < 95
        |), vnc AS (
        |  SELECT vec_id, SUM(qx * qx) AS n2 FROM qec GROUP BY 1
        |), sqc0 AS (
        |  SELECT vec_id AS cid, pos, qx AS qm FROM qec WHERE vec_id < 8
        |), scn0 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM sqc0 GROUP BY 1
        |), sd1 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qec q JOIN sqc0 c ON c.pos = q.pos GROUP BY 1, 2
        |), sa1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM sd1 d JOIN vnc v ON v.vec_id = d.vec_id JOIN scn0 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), sm1 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM sa1 a JOIN qec q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), sqc1 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM sm1
        |), scn1 AS (
        |  SELECT cid, SUM(qm * qm) AS cn2 FROM sqc1 GROUP BY 1
        |), sd2 AS (
        |  SELECT q.vec_id, c.cid, SUM(q.qx * c.qm) AS dot
        |  FROM qec q JOIN sqc1 c ON c.pos = q.pos GROUP BY 1, 2
        |), sa2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT d.vec_id, d.cid, row_number() OVER (PARTITION BY d.vec_id
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(CAST(v.n2 AS DOUBLE)) * sqrt(CAST(c.cn2 AS DOUBLE))) DESC, d.cid) AS rn
        |    FROM sd2 d JOIN vnc v ON v.vec_id = d.vec_id JOIN scn1 c ON c.cid = d.cid
        |  ) WHERE rn = 1
        |), sm2 AS (
        |  SELECT a.cid, q.pos,
        |    CAST(CAST(SUM(q.qx) AS DOUBLE) / (COUNT(*) * 1e8) AS FLOAT) AS m
        |  FROM sa2 a JOIN qec q ON q.vec_id = a.vec_id GROUP BY 1, 2
        |), sqc2 AS (
        |  SELECT cid, pos, CAST(floor(CAST(m AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS qm FROM sm2
        |), fn AS (
        |  SELECT cid, SUM(qm * qm) AS n2 FROM fqc2 GROUP BY 1
        |), sn AS (
        |  SELECT cid, SUM(qm * qm) AS n2 FROM sqc2 GROUP BY 1
        |), dt AS (
        |  SELECT f.cid, SUM(f.qm * s.qm) AS dot
        |  FROM fqc2 f JOIN sqc2 s ON s.cid = f.cid AND s.pos = f.pos GROUP BY 1
        |)
        |SELECT COALESCE(fn.cid, sn.cid) AS cid,
        |  fn.cid IS NOT NULL AS in_full,
        |  sn.cid IS NOT NULL AS in_standing,
        |  CASE WHEN fn.cid IS NOT NULL AND sn.cid IS NOT NULL
        |       THEN CAST(dt.dot AS DOUBLE) / (sqrt(CAST(fn.n2 AS DOUBLE)) * sqrt(CAST(sn.n2 AS DOUBLE))) END AS cosine
        |FROM fn FULL OUTER JOIN sn ON sn.cid = fn.cid
        |LEFT JOIN dt ON dt.cid = COALESCE(fn.cid, sn.cid)""".stripMargin,
  )
}
