package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Caches
import graft.functions.{BoundedTopK, FixedPoint, GramMoments, Scored, Text, Vectors}
import graft.sources.Tables

/** Similarity search over the embedding column (`array<float>` 64-dim).
  *
  * Three paths, per the north star:
  *  - `annBruteForceTopK`: exact top-k for a bounded query set — the
  *    correctness baseline. Queries broadcast; the corpus side never
  *    shuffles, so this scales to any corpus size (cost = one pass).
  *  - `nearDupLsh`: random-hyperplane LSH bucketing (deterministic,
  *    md5-derived planes) → per-bucket candidate pairs → exact cosine
  *    verification. The all-pairs join is confined to buckets.
  *  - `annIvf`: coarse-quantizer cell probing — per-query cost bounded by
  *    the probed cells, the 100×-corpus scale path.
  *
  * All dot products/norms are exact int64 fixed-point sums evaluated by
  * the codegen'd `FixedPointDot` expression (graft.functions.FixedPoint) —
  * a tight primitive loop inside whole-stage codegen, bit-identical to
  * the `Vectors` higher-order-function formulation and to the DuckDB
  * oracle. Squared norms are precomputed per vector, so the per-pair work
  * is a single dot product over the raw float arrays (half the shuffle
  * width of quantized long arrays).
  */
object Similarity {

  /** vec_id, raw embedding, and its precomputed fixed-point squared norm,
    * spread across the full shuffle width (the source may arrive in few
    * partitions — one small file locally, coarse splits at scale; explicit
    * N so AQE can't re-coalesce, see Dedup.docShingleSets).
    */
  private def prepared(emb: DataFrame): DataFrame =
    emb
      .repartition(shuffleWidth(emb), col("vec_id"))
      .select(col("vec_id"), col("embedding"),
        FixedPoint.normSqF(col("embedding")).as("n2"))

  /** Exact cosine top-k neighbours for queries `vec_id < nQueries`.
    *
    * Scoring: queries broadcast, the corpus never shuffles — one pass.
    * Ranking: a map-side-combined bounded-top-k aggregate
    * (graft.functions.BoundedTopK via ObjectHashAggregate) instead of a
    * `row_number` window, so the exchange carries at most k rows per
    * (map task × query) — O(partitions·k) per query — rather than every
    * scored |corpus|×|queries| row. Same total order (cosine DESC,
    * neighbor ASC), bit-identical output, survives a 100× corpus.
    */
  def annBruteForceTopK(emb: DataFrame, k: Int, nQueries: Int): DataFrame = {
    val e = prepared(emb)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("n2").as("qn2"))
    val pairs = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        Vectors.cosineFromParts(
          FixedPoint.dotF(col("embedding"), col("qe")), col("n2"), col("qn2")).as("cosine"))
    val topk = udaf(new BoundedTopK(k), ExpressionEncoder[Scored]())
    pairs
      .groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("cosine")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(
        col("query_id"),
        col("t.neighborId").as("neighbor_id"),
        col("t.cosine").as("cosine"),
        (col("pos") + 1).as("rank"))
  }

  def annBruteForceTopK(
      s: SparkSession, dir: String,
      k: Int = 10, nQueries: Int = 10): DataFrame =
    annBruteForceTopK(Tables.embeddings(s, dir), k, nQueries)

  /** Retrieval-quality audit (q297): exact MRR@k and recall@k of cosine
    * retrieval against the embeddings' own class labels — the eval a
    * pipeline runs before trusting an embedding space for curation
    * (semantic dedup, diversity selection, hard-negative mining all
    * inherit the space's neighborhood quality). Relevance for query q =
    * "neighbor carries q's label"; retrieval = the exact q24 top-k
    * (brute force IS the ceiling the ANN variants are audited against in
    * q235, so the eval measures the SPACE, not an index's recall).
    *
    * Determinism: both metrics live on the micro grid as integer floor
    * divisions — mrr_micro = 1e6 div first_rel_rank, recall_at_k_micro =
    * n_rel_at_k·1e6 div min(n_rel_total, k) — no float accumulation, so
    * DuckDB lands on identical longs. A query with no relevant neighbor
    * in the corpus (singleton label) reports zeros, not NULL poison.
    *
    * Scale: the q24 contract carries the cost — queries broadcast, one
    * corpus pass, BoundedTopK caps the ranking exchange at k rows per
    * (map task × query). Everything after is nQueries·k rows joined to
    * the label relation (one semi-bounded lookup join) and the |labels|-
    * row class-size aggregate; nothing downstream is corpus-scaled.
    */
  def retrievalEval(emb: DataFrame, k: Int = 10, nQueries: Int = 10): DataFrame = {
    val labels = emb.select(col("vec_id"), col("label"))
    val top = annBruteForceTopK(emb, k, nQueries)
    // nQueries·k rows: the label lookups broadcast THIS side, the corpus
    // label relation streams — one pass, no corpus shuffle
    val rel = top
      .join(labels.select(col("vec_id").as("query_id"), col("label").as("ql")), "query_id")
      .join(labels.select(col("vec_id").as("neighbor_id"), col("label").as("nl")), "neighbor_id")
      .withColumn("is_rel", (col("ql") === col("nl")).cast("long"))
    val classSizes = labels.groupBy(col("label")).agg(count(lit(1)).as("n_label"))
    rel
      .groupBy(col("query_id"), col("ql"))
      .agg(
        sum(col("is_rel")).as("n_rel_at_k"),
        min(when(col("is_rel") === 1L, col("rank"))).as("first_rank"))
      .join(broadcast(classSizes.select(col("label").as("ql"), col("n_label"))), Seq("ql"))
      .select(
        col("query_id"),
        col("n_rel_at_k"),
        coalesce(col("first_rank").cast("long"), lit(0L)).as("first_rel_rank"),
        coalesce(expr("1000000L div first_rank"), lit(0L)).as("mrr_micro"),
        (col("n_label") - 1L).as("n_rel_total"),
        when(least(col("n_label") - 1L, lit(k.toLong)) === 0L, lit(0L))
          .otherwise(expr(s"n_rel_at_k * 1000000L div least(n_label - 1L, ${k}L)"))
          .as("recall_at_k_micro"))
  }

  def retrievalEval(s: SparkSession, dir: String): DataFrame =
    retrievalEval(Tables.embeddings(s, dir), k = 10, nQueries = 10)

  /** Near-duplicate vector pairs via hyperplane-LSH buckets, verified with
    * exact cosine >= threshold. Recall is bucket-limited by design (the
    * scale path); the bucketing is deterministic so results are exactly
    * reproducible.
    */
  def nearDupLsh(emb: DataFrame, nPlanes: Int, threshold: Double, dims: Int): DataFrame = {
    val sig = prepared(emb)
      .withColumn("bucket", Vectors.lshBucketF(col("embedding"), nPlanes, dims))
    // shuffle_hash: a planner-chosen broadcast would evaluate the whole
    // norm+bucket pipeline single-threaded in the broadcast-build thread,
    // and the signature relation could never broadcast at real corpus
    // scale anyway (see Dedup.ngramJaccard).
    sig.as("a").hint("shuffle_hash")
      .join(sig.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"),
        col("b.vec_id").as("vec_b"),
        Vectors.cosineFromParts(
          FixedPoint.dotF(col("a.embedding"), col("b.embedding")),
          col("a.n2"), col("b.n2")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  def nearDupLsh(
      s: SparkSession, dir: String,
      nPlanes: Int = 8, threshold: Double = 0.4): DataFrame =
    nearDupLsh(Tables.embeddings(s, dir), nPlanes, threshold, dims = 64)

  /** IVF-style ANN (the cell-probe scale path): a small coarse quantizer
    * (here: the first `nCells` vectors as centroids, broadcast) assigns
    * every vector to its nearest cell in ONE pass; each query probes only
    * its `nProbe` closest cells and ranks members there. Recall is
    * cell-limited by design; cost per query drops from |corpus| to
    * |probed cells|. Everything is argmax over the exact fixed-point
    * cosine with id tiebreaks, so results reproduce bit-for-bit in the
    * oracle.
    */
  def annIvf(
      emb: DataFrame,
      nCells: Int, nProbe: Int, k: Int, nQueries: Int): DataFrame = {
    val e = Caches.track(prepared(emb))
    val cents = e.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("n2").as("cn2"))
    ivfProbe(e, cents, nProbe, k, nQueries)
  }

  /** Cell-probe search against a given coarse quantizer `cents`
    * (cid, ce: array<float>, cn2): assign every vector to its best cell in
    * one broadcast pass, probe each query's `nProbe` closest cells, rank
    * candidates by exact cosine. Shared by the untrained (first-k
    * centroids) and k-means-trained IVF variants.
    */
  private def ivfProbe(
      e: DataFrame, cents: DataFrame,
      nProbe: Int, k: Int, nQueries: Int): DataFrame = {
    // every vector × every centroid: broadcast the tiny centroid side.
    // Persisted (caller-released) because BOTH the assign branch and the
    // probes branch below consume it: without the persist the probes
    // branch re-derives it (cheap — its vec_id < nQueries filter pushes
    // below the crossJoin — but a second pass nonetheless); with it the
    // vec×cell scoring runs exactly once. The cached relation is narrow
    // (id, id, double) × |corpus|·|cells| rows, bounded by the small,
    // fixed cell count.
    val vc = Caches.track(e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        Vectors.cosineFromParts(
          FixedPoint.dotF(col("embedding"), col("ce")), col("n2"), col("cn2")).as("ccos")))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    val assign = vc.withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"))
    // each query probes its nProbe closest cells (reuses the same vc)
    val probes = vc.filter(col("vec_id") < nQueries)
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") <= nProbe)
      .select(col("vec_id").as("query_id"), col("cid"))
    // candidate pairs feed two semi-joins + the scored join below;
    // persist so the probe-assign join runs once (caller-released)
    val cands = Caches.track(probes.hint("shuffle_hash")
      .join(assign.hint("shuffle_hash"), "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id")))
    // left-semi-restrict the WIDE embedding relation to ids actually in
    // the candidate set BEFORE the scored joins (the minhashLsh pattern,
    // Dedup.minhashLsh): only candidate rows — probe-bounded, a tiny
    // fraction of the corpus — carry their float arrays into the
    // verification exchanges. No join hint on purpose: the build side is
    // a cheap id projection of the persisted cands, so a planner-chosen
    // broadcast is the scale-correct plan — it leaves the huge embedding
    // side entirely unshuffled.
    val q = e
      .join(cands.select(col("query_id").as("vec_id")), Seq("vec_id"), "left_semi")
      .select(col("vec_id").as("query_id"),
        col("embedding").as("qe"), col("n2").as("qn2"))
    val n = e
      .join(cands.select(col("neighbor_id").as("vec_id")), Seq("vec_id"), "left_semi")
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ne"), col("n2").as("nn2"))
    val scored = cands
      .join(q.hint("shuffle_hash"), "query_id")
      .join(n.hint("shuffle_hash"), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        Vectors.cosineFromParts(
          FixedPoint.dotF(col("qe"), col("ne")), col("qn2"), col("nn2")).as("cosine"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
  }

  def annIvf(s: SparkSession, dir: String): DataFrame =
    annIvf(Tables.embeddings(s, dir), nCells = 8, nProbe = 2, k = 5, nQueries = 10)

  /** Deterministic Lloyd k-means over the embedding corpus — the trained
    * coarse quantizer for IVF. Initialization is the first `k` vectors
    * (deterministic); each iteration assigns every vector to its
    * highest-cosine centroid (broadcast pass, window keyed by
    * high-cardinality vec_id) and recomputes centroids as per-dimension
    * means.
    *
    * Determinism: the mean is computed over int64 FIXED-POINT sums
    * (exact, aggregation-order independent) and only then divided — so
    * the trained centroids are bit-identical across runs, partitionings,
    * and cluster sizes, unlike a naive float-sum mean. Centroids are
    * lineage-truncated per iteration (localCheckpoint) so the plan stays
    * O(1) in the iteration count. A cell that loses all members drops out
    * (k shrinks) rather than carrying a stale centroid.
    *
    * Returns (cid, ce: array<float>).
    */
  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int): DataFrame =
    // shared derived artifact: the Lloyd loop makes `iters` full corpus
    // passes and its k-row result feeds q61's probe, q235's audit, and
    // the q204-family assignment build — trained once per (input
    // generation, k, iters). Float arrays roundtrip parquet exactly.
    graft.Derived.materialized(emb.sparkSession,
      s"kmeans_cents_c${k}_i$iters", Seq(emb)) {
      kmeansCentroidsInline(emb, k, iters)
    }

  private[graft] def kmeansCentroidsInline(
      emb: DataFrame, k: Int, iters: Int): DataFrame = {
    val e = Caches.track(prepared(emb))
    var cents = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("n2").as("cn2"))
      .transform(graft.Checkpoints.truncate(_))
    (1 to iters).foreach { _ =>
      val vc = e.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"), col("embedding"),
          Vectors.cosineFromParts(
            FixedPoint.dotF(col("embedding"), col("ce")), col("n2"), col("cn2")).as("ccos"))
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cid"))
      val assign = vc.withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
        .select(col("cid"), col("embedding"))
      // per-(cell, dimension) exact fixed-point sums: one explode, one
      // map-side-combined hash aggregate; the result is k × dims rows
      val sums = assign
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(
          sum(floor(col("x").cast("double") * 1e8 + 0.5).cast("long")).as("s"),
          count(lit(1)).as("n"))
      cents = sums
        .groupBy(col("cid"))
        .agg(sort_array(collect_list(struct(
          col("pos"),
          (col("s").cast("double") / (col("n") * 1e8)).cast("float").as("m")))).as("pm"))
        .select(col("cid"), transform(col("pm"), p => p.getField("m")).as("ce"))
        .withColumn("cn2", FixedPoint.normSqF(col("ce")))
        .transform(graft.Checkpoints.truncate(_))
    }
    cents.select(col("cid"), col("ce"))
  }

  /** IVF search with a k-means-trained quantizer: train `nCells` centroids
    * for `iters` Lloyd iterations, then cell-probe search (ivfProbe).
    * Trained cells track the data distribution, so at a fixed probe budget
    * recall beats the untrained first-k quantizer. The fixed `iters = 2`
    * loop unrolls into a non-recursive SQL CTE chain, so the DuckDB
    * oracle reproduces training bit-for-bit (see the q61 entry in
    * SparkEntry.oracleSql); SimilaritySpec additionally checks
    * planted-cluster recall and run-to-run determinism.
    */
  def annIvfTrained(
      emb: DataFrame,
      nCells: Int, iters: Int, nProbe: Int, k: Int, nQueries: Int): DataFrame = {
    val cents = kmeansCentroids(emb, nCells, iters)
      .withColumn("cn2", FixedPoint.normSqF(col("ce")))
    ivfProbe(Caches.track(prepared(emb)), cents, nProbe, k, nQueries)
  }

  def annIvfTrained(s: SparkSession, dir: String): DataFrame =
    annIvfTrained(Tables.embeddings(s, dir),
      nCells = 8, iters = 2, nProbe = 2, k = 5, nQueries = 10)

  /** Per-vector int8 range quantization — the storage-side step of an
    * embedding pipeline (4× smaller than float32 before any index is
    * built): q_i = round((x_i − min) / scale) with scale = (max − min)/255,
    * reported with the max absolute dequantization error and the quantized
    * checksum.
    *
    * Scale: a pure per-row projection — every value is an elementwise
    * function of that row's array, no shuffle, no state, whole-stage
    * codegen over the array lambdas. Determinism: floats widen to double
    * (exact), and round() is spelled floor(x + 0.5) so both engines take
    * the identical branch at .5 boundaries; within-row fold order is
    * fixed, so the double sums are bit-stable under any partitioning.
    */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val xd = transform(col("embedding"), e => e.cast("double"))
    emb
      .select(col("vec_id"), xd.as("xd"))
      .select(col("vec_id"), col("xd"),
        array_min(col("xd")).as("mn"), array_max(col("xd")).as("mx"))
      .select(col("vec_id"), col("xd"), col("mn"), col("mx"),
        ((col("mx") - col("mn")) / 255.0d).as("scale"))
      .select(
        col("vec_id"), col("mn"), col("mx"), col("scale"),
        // scale = 0 (constant vector) would make every (x-mn)/scale a
        // 0/0 NaN; by convention such a vector quantizes to code 0
        // everywhere with zero error
        when(col("scale") === 0.0d, lit(0L))
          .otherwise(aggregate(col("xd"), lit(0L),
            (acc, e) => acc + floor((e - col("mn")) / col("scale") + 0.5d).cast("long")))
          .as("q_sum"),
        when(col("scale") === 0.0d, lit(0.0d))
          .otherwise(array_max(transform(col("xd"),
            e => abs(e - (col("mn") +
              floor((e - col("mn")) / col("scale") + 0.5d) * col("scale"))))))
          .as("max_err"))
  }

  def quantizeInt8(s: SparkSession, dir: String): DataFrame =
    quantizeInt8(Tables.embeddings(s, dir))

  /** Per-language embedding centroids: dimension-wise means of each
    * language's vectors (embeddings tied to documents by vec_id =
    * doc_id) — the profiling table behind cluster drift checks and
    * language-conditioned retrieval.
    *
    * Long form (lang, pos, n_vecs, centroid) rather than one array row
    * per language: the aggregate is then a plain high-cardinality
    * (lang × dim) hash agg — map-side combined, no per-group array
    * state, no collect. Sums run in the same 1e8 fixed-point used by the
    * IVF trainer, so the means are bit-identical across partitionings
    * and engines; the single double division at the end is exact given
    * an exact numerator and denominator.
    */
  def langCentroids(docs: DataFrame, emb: DataFrame): DataFrame =
    emb
      .join(docs.select(col("doc_id").as("vec_id"), col("lang")), Seq("vec_id"))
      .select(col("lang"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("lang"), (col("pos") + 1).as("pos"),
        floor(col("x").cast("double") * 1e8 + 0.5d).cast("long").as("qx"))
      .groupBy(col("lang"), col("pos"))
      .agg(count(lit(1)).as("n_vecs"),
        (sum(col("qx")).cast("double") / (count(lit(1)) * 1e8)).as("centroid"))

  def langCentroids(s: SparkSession, dir: String): DataFrame =
    langCentroids(Tables.documents(s, dir), Tables.embeddings(s, dir))

  /** Sparse LEXICAL top-k similarity: cosine over term-frequency vectors,
    * computed through posting-list joins — similarity search with no
    * embeddings at all, the retrieval path that works before any encoder
    * exists (and the candidate generator BM25 systems are built on).
    *
    * The sparse trick is that the dot product only needs terms the query
    * and candidate SHARE: joining the query's tf rows to the corpus tf
    * relation on `word` enumerates exactly the nonzero products, so
    * per-query cost is Σ_w df(w) over the query's words — never a pass
    * over the corpus. At a real vocabulary, compose with q78's df band
    * (drop stopword postings) to keep that sum small; this corpus's
    * 31-word vocabulary is the degenerate worst case and still bounded
    * by the query count. Ranking reuses the BoundedTopK aggregate
    * (O(partitions·k) exchange per query, same total order as q24).
    * Determinism: dots and norms are exact integer sums; sqrt and one
    * division are correctly-rounded IEEE ops, identical on both engines.
    */
  def sparseLexicalTopK(docs: DataFrame, k: Int = 5, nQueries: Int = 10): DataFrame = {
    import graft.functions.Text
    val tf = Caches.track(docs
      .repartition(shuffleWidth(docs), col("doc_id"))
      .select(col("doc_id"), explode(Text.words(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf")))
    val norms = tf.groupBy(col("doc_id")).agg(sum(col("tf") * col("tf")).as("n2"))
    val qtf = tf.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("word"), col("tf").as("tf_q"))
    // shuffle_hash: both sides derive from the cached tf relation — a
    // broadcast build would run that pipeline single-threaded
    val dots = qtf.hint("shuffle_hash")
      .join(tf.hint("shuffle_hash"), Seq("word"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("tf_q") * col("tf")).as("dot"))
    val scored = dots
      .join(norms.select(col("doc_id").as("query_id"), col("n2").as("qn2")), Seq("query_id"))
      .join(norms, Seq("doc_id"))
      .select(col("query_id"), col("doc_id"),
        (col("dot").cast("double") /
          (sqrt(col("qn2").cast("double")) * sqrt(col("n2").cast("double"))))
          .as("cos_sim"))
    val topk = udaf(new BoundedTopK(k), ExpressionEncoder[Scored]())
    scored
      .groupBy(col("query_id"))
      .agg(topk(col("doc_id"), col("cos_sim")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.neighborId").as("doc_id"),
        col("t.cosine").as("cos_sim"), (col("pos") + 1).as("rnk"))
  }

  def sparseLexicalTopK(s: SparkSession, dir: String): DataFrame =
    sparseLexicalTopK(Tables.documents(s, dir))

  /** Per-dimension equal-frequency quantization codebook (the NF4-style
    * alternative to q79's range quantization): each dimension's values
    * sort into `codes` equal-population bins — `code = (rank−1)·codes
    * div n`, pure integers — and the codebook entry is the bin's
    * nearest-rank median value with its [lo, hi] span. NO float
    * arithmetic anywhere: ranks only compare values, and lo/hi/centroid
    * are PICKS of existing floats (cast to double once for output), so
    * the result is bit-stable under any partitioning — the property
    * range quantization can't give you when bins must hold equal mass.
    *
    * Ties split across bin boundaries by (value, vec_id) order —
    * deterministic, and the only consistent choice when a value run
    * straddles an equal-mass cut.
    *
    * Scale: the per-dim rank is a 64-way-parallel in-partition sort of
    * the exploded relation — the honest exact-answer cost. At corpus
    * scales where a per-dim sort is too hot, the production path is
    * sampled boundaries per dim (q88's broadcast idiom on a reservoir),
    * trading exact equal mass for a bounded-error split; this operator
    * is the exact ground truth that path gets audited against.
    */
  def quantileCodebook(emb: DataFrame, codes: Int = 16): DataFrame = {
    val exploded = emb.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("dim", "x")))
    val byDim = Window.partitionBy(col("dim"))
    val ranked = exploded
      .withColumn("rn",
        row_number().over(byDim.orderBy(col("x"), col("vec_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(byDim).cast("long"))
      .withColumn("code", expr(s"((rn - 1) * $codes) div n"))
    val byBin = Window.partitionBy(col("dim"), col("code"))
    ranked
      .withColumn("size", count(lit(1)).over(byBin).cast("long"))
      .withColumn("lrn", row_number().over(byBin.orderBy(col("rn"))).cast("long"))
      .withColumn("med",
        max(when(col("lrn") === expr("(size + 1) div 2"), col("x"))).over(byBin))
      .groupBy(col("dim"), col("code"))
      .agg(count(lit(1)).as("n_members"),
        min(col("x")).cast("double").as("lo"),
        max(col("x")).cast("double").as("hi"),
        max(col("med")).cast("double").as("centroid"))
  }

  def quantileCodebook(s: SparkSession, dir: String): DataFrame =
    quantileCodebook(Tables.embeddings(s, dir))

  /** Semantic decontamination: flag training vectors whose best cosine
    * against a held-out evaluation set reaches `threshold` — the
    * embedding-space complement of the shingle-overlap check (q55), for
    * paraphrased leakage that shares no exact n-grams. The eval set is a
    * deterministic id-residue slice (`vec_id % modulo == 0`, the same
    * engine-portable convention as the md5 split family) and BROADCASTS:
    * the training corpus is scored in one pass without ever shuffling,
    * and the per-vector max partial-aggregates to one row per vector per
    * task before the exchange. Cost at 100 TB = |corpus| · |eval| dot
    * products, map-side — the eval set is the small, fixed side by
    * construction, so this stays a single broadcast-scan at any corpus
    * size. Exact fixed-point arithmetic end-to-end (FixedPointDot), so
    * the flagged set is bit-identical to the DuckDB oracle.
    */
  def semanticDecontam(emb: DataFrame, modulo: Int, threshold: Double): DataFrame = {
    val e = prepared(emb)
    val eval = e.filter(col("vec_id") % modulo === 0)
      .select(col("vec_id").as("test_id"), col("embedding").as("te"), col("n2").as("tn2"))
    e.filter(col("vec_id") % modulo =!= 0)
      .crossJoin(broadcast(eval))
      .select(
        col("vec_id"),
        Vectors.cosineFromParts(
          FixedPoint.dotF(col("embedding"), col("te")), col("n2"), col("tn2")).as("cosine"))
      .groupBy(col("vec_id"))
      .agg(max(col("cosine")).as("max_cos"))
      .filter(col("max_cos") >= threshold)
  }

  def semanticDecontam(s: SparkSession, dir: String): DataFrame =
    semanticDecontam(Tables.embeddings(s, dir), modulo = 50, threshold = 0.35)

  /** SemDedup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): k-means-cluster the
    * embedding space, then prune near-duplicates WITHIN each cluster —
    * pairwise cosine is only ever computed between co-clustered vectors,
    * so the quadratic term is bounded by cluster size, not corpus size.
    * Keep policy is the repo's deterministic "lowest id wins" (q52's
    * `keeper` convention): a vector is dropped iff some smaller-id
    * co-clustered vector sits at cosine ≥ `tau` to it.
    *
    * Training reuses `kmeansCentroids` (fixed-point Lloyd, iters
    * unrolled in the q61 oracle), and the full-corpus assignment is the
    * trainer's own argmax-cosine/cid-tiebreak step, so the DuckDB oracle
    * reproduces clustering bit-for-bit. Pair cosines are exact
    * fixed-point (FixedPointDot), so the τ cut lands identically in both
    * engines.
    *
    * Scale: nCells grows with the corpus (SemDedup's own contract —
    * cluster population stays roughly constant), so the within-cluster
    * self-join is linear-in-corpus work with a bounded quadratic factor.
    * The membership self-join and the dropped-id join are pinned
    * `shuffle_hash`: both sides scale with the corpus/dup population, so
    * a broadcast build is a hard failure at the 100 TB regime (the
    * round-9 canonicalDocs lesson), while shuffle-hash on `cid` /
    * `vec_id` stays balanced because cluster sizes are bounded. Only the
    * nCells-row centroid table broadcasts — a constant.
    */
  /** Full-corpus nearest-centroid assignment (vec_id, cid): the trainer's
    * own argmax-cosine/cid-tiebreak step over the final centroids, shared
    * by semDedup / clusterKeywords / clusterPurity. One pass over the
    * corpus against the broadcast nCells-row centroid table; the per-vec
    * argmax is a WindowGroupLimit-pruned rank-1 window.
    */
  private def kmeansAssign(emb: DataFrame, nCells: Int, iters: Int): DataFrame =
    // shared derived artifact (round-16 pattern): the Lloyd training +
    // full-corpus argmax is recomputed identically by semDedup (q204),
    // clusterKeywords (q206), clusterPurity (q208), shardPlan (q225) and
    // diverseSelect (q288) — one build per (input generation, nCells,
    // iters), every consumer scans the (vec_id, cid) relation
    graft.Derived.materialized(emb.sparkSession,
      s"kmeans_assign_c${nCells}_i$iters", Seq(emb)) {
      kmeansAssignInline(emb, nCells, iters)
    }

  private[graft] def kmeansAssignInline(
      emb: DataFrame, nCells: Int, iters: Int): DataFrame = {
    val e = Caches.track(prepared(emb))
    val cents = kmeansCentroids(emb, nCells, iters)
      .withColumn("cn2", FixedPoint.normSqF(col("ce")))
    val vc = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        Vectors.cosineFromParts(
          FixedPoint.dotF(col("embedding"), col("ce")), col("n2"), col("cn2")).as("ccos"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    vc.withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"))
  }

  /** Incremental centroid assignment for a crawl delta (q296) — q295's
    * embedding-side twin: the codebook is trained ONCE per input
    * generation on the STANDING corpus tier (md5 bucket < 95, the q295
    * split) and served from the derived store; the arriving delta tier
    * (bucket >= 95) is assigned by one broadcast-argmax pass over the
    * DELTA ALONE. The corpus is never re-read by the assignment — at
    * 100 TB the nightly Lloyd job owns the corpus passes and every
    * ingest batch pays only |delta| × nCells row-local cosines, which is
    * how a production quantizer actually serves ingest (train nightly,
    * assign per batch). The Derived fingerprint covers the corpus
    * FILTER plan, so this codebook can never collide with the
    * full-corpus q204 centroids under one artifact name.
    *
    * Init follows the trainer: the first `nCells` vec_ids OF THE CORPUS
    * TIER — a seed vector that hashes into the delta is simply absent
    * (k shrinks), deterministically on both engines.
    */
  def deltaAssign(emb: DataFrame, nCells: Int = 8, iters: Int = 2): DataFrame = {
    val bucketed = emb.withColumn("bucket", Corpus.hashBucket(col("vec_id")))
    val delta = prepared(bucketed.filter(col("bucket") >= 95).drop("bucket"))
    val cents = standingCentroids(emb, nCells, iters)
      .withColumn("cn2", FixedPoint.normSqF(col("ce")))
    val vc = delta.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        Vectors.cosineFromParts(
          FixedPoint.dotF(col("embedding"), col("ce")), col("n2"), col("cn2")).as("ccos"))
    // argmax by max-of-struct (tie-break ccos DESC, cid ASC ≡ max of
    // (ccos, -cid)) — a map-side-combinable aggregate instead of a
    // per-key window sort, the q195/q296-monitor discipline
    vc.groupBy(col("vec_id"))
      .agg(max(struct(col("ccos"), (-col("cid")).as("neg_cid"))).as("m"))
      .select(col("vec_id"), (-col("m.neg_cid")).as("cid"))
  }

  def deltaAssign(s: SparkSession, dir: String): DataFrame =
    deltaAssign(Tables.embeddings(s, dir))

  /** The standing (corpus-tier, md5 bucket < 95) Lloyd codebook as a
    * shared derived artifact. Distinct artifact NAME, not just a
    * distinct plan fingerprint: the build gate pins build wall-times BY
    * NAME, so the corpus-tier train must not merge its seconds into the
    * full-corpus kmeans_cents pin (the lsh_pairs_corpus95 convention).
    */
  private def standingCentroids(emb: DataFrame, nCells: Int, iters: Int): DataFrame = {
    val bucketed = emb.withColumn("bucket", Corpus.hashBucket(col("vec_id")))
    val corpus = bucketed.filter(col("bucket") < 95).drop("bucket")
    // fingerprint on the FILTERED relation, not the parent table: the
    // plan half of the key then covers the tier split itself, so editing
    // the split predicate re-keys the artifact instead of silently
    // serving a codebook trained on the old tier from a persisted store
    graft.Derived.materialized(emb.sparkSession,
      s"kmeans_cents_corpus95_c${nCells}_i$iters", Seq(corpus)) {
      kmeansCentroidsInline(corpus, nCells, iters)
    }
  }

  /** Codebook drift audit (q298) — the retrain trigger for the q296
    * serving pattern: per cell, the cosine between the STANDING codebook
    * (trained on the corpus tier, the one ingest assigns against) and
    * the codebook a full retrain would produce today. Cells near 1.0 →
    * the standing quantizer still speaks for the whole corpus; a
    * drifted or missing cell (a seed that exists in only one training
    * set — reported via the presence flags, never silently dropped) is
    * the signal to promote a retrain. Both codebooks are shared derived
    * artifacts (the q204-family full train, q296's corpus95 train), so
    * the audit itself is an nCells-row join — at 100 TB this query
    * costs nothing beyond the builds the pipeline already pays.
    */
  def codebookDrift(emb: DataFrame, nCells: Int = 8, iters: Int = 2): DataFrame = {
    val full = kmeansCentroids(emb, nCells, iters)
      .select(col("cid"), col("ce").as("cf"))
    val standing = standingCentroids(emb, nCells, iters)
      .select(col("cid"), col("ce").as("cs"))
    full.join(standing, Seq("cid"), "full_outer")
      .select(col("cid"),
        col("cf").isNotNull.as("in_full"),
        col("cs").isNotNull.as("in_standing"),
        when(col("cf").isNotNull && col("cs").isNotNull,
          Vectors.cosineFromParts(
            FixedPoint.dotF(col("cf"), col("cs")),
            FixedPoint.normSqF(col("cf")), FixedPoint.normSqF(col("cs"))))
          .as("cosine"))
  }

  def codebookDrift(s: SparkSession, dir: String): DataFrame =
    codebookDrift(Tables.embeddings(s, dir))

  def semDedup(emb: DataFrame, nCells: Int, iters: Int, tau: Double): DataFrame = {
    val e = Caches.track(prepared(emb))
    val assign = Caches.track(kmeansAssign(emb, nCells, iters))
    val members = assign.join(e, Seq("vec_id"))
    val a = members.select(col("cid"), col("vec_id").as("va"),
      col("embedding").as("ea"), col("n2").as("na"))
    val b = members.select(col("cid"), col("vec_id").as("vb"),
      col("embedding").as("eb"), col("n2").as("nb"))
    val dropped = a.hint("shuffle_hash").join(b.hint("shuffle_hash"), Seq("cid"))
      .filter(col("va") < col("vb"))
      .filter(Vectors.cosineFromParts(
        FixedPoint.dotF(col("ea"), col("eb")), col("na"), col("nb")) >= tau)
      .select(col("vb").as("vec_id"))
      .distinct()
      .withColumn("drop", lit(true))
    assign.hint("shuffle_hash")
      .join(dropped.hint("shuffle_hash"), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        coalesce(!col("drop"), lit(true)).as("keep"))
  }

  def semDedup(s: SparkSession, dir: String): DataFrame =
    semDedup(Tables.embeddings(s, dir), nCells = 8, iters = 2, tau = 0.4)

  /** Cluster keyword extraction (the c-TF-IDF idea behind topic-labelled
    * data curation, on the repo's exact grid): k-means-cluster the
    * embedding space, join members back to their documents, and surface
    * each cluster's top-`k` most OVER-REPRESENTED words by lift —
    * (c_cw/n_c) / (c_w/N), in-cluster frequency over corpus frequency —
    * with a `minCount` support floor so hapax noise can't top the list.
    * Lift is three correctly-rounded double operations over exact integer
    * counts (the q24-cosine discipline — no logs, no accumulated
    * doubles), so ranking and the k-cut land identically in DuckDB.
    *
    * Scale: the corpus-sized work is the word explode + the (cid, word)
    * hash agg (map-side combined) and the vocabulary-keyed totals join —
    * pinned `shuffle_hash` because a vocabulary scales with the corpus
    * and must never broadcast. The per-cluster totals (nCells rows) and
    * the grand total are constant-size broadcasts. The top-k window
    * partitions by cid over the support-filtered cluster vocabulary
    * (≤ n_c/minCount rows per cluster, bounded because cluster
    * population is bounded under corpus-scaled nCells) and the rk<=k
    * filter lets WindowGroupLimit prune to per-partition heaps before
    * any full sort.
    */
  def clusterKeywords(docs: DataFrame, emb: DataFrame, nCells: Int,
                      iters: Int, k: Int, minCount: Long): DataFrame = {
    val assign = kmeansAssign(emb, nCells, iters)
    val words = docs
      .repartition(shuffleWidth(docs), col("doc_id"))
      .select(col("doc_id").as("vec_id"), explode(Text.words(col("text"))).as("word"))
    val cw = Caches.track(words
      .join(assign, Seq("vec_id"))
      .groupBy(col("cid"), col("word"))
      .agg(count(lit(1)).as("c_cw")))
    val cTot = cw.groupBy(col("cid")).agg(sum(col("c_cw")).as("n_c"))
    val wTot = cw.groupBy(col("word")).agg(sum(col("c_cw")).as("c_w"))
    val nTot = cTot.agg(sum(col("n_c")).as("n_total"))
    val scored = cw.filter(col("c_cw") >= minCount)
      .hint("shuffle_hash")
      .join(wTot.hint("shuffle_hash"), Seq("word"))
      .join(broadcast(cTot), Seq("cid"))
      .crossJoin(broadcast(nTot))
      .select(col("cid"), col("word"), col("c_cw"),
        ((col("c_cw").cast("double") / col("n_c").cast("double")) /
          (col("c_w").cast("double") / col("n_total").cast("double"))).as("lift"))
    val wTop = Window.partitionBy(col("cid"))
      .orderBy(col("lift").desc, col("word"))
    scored.withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
      .select(col("cid"), col("rk").cast("long").as("rk"),
        col("word"), col("c_cw"), col("lift"))
  }

  def clusterKeywords(s: SparkSession, dir: String): DataFrame =
    clusterKeywords(Tables.documents(s, dir), Tables.embeddings(s, dir),
      nCells = 8, iters = 2, k = 5, minCount = 3L)

  /** Clustering-quality audit: per k-means cell, the member count, the
    * majority ground-truth label (the embeddings' `label` column), and
    * purity = majority share — the evaluation every curation pipeline
    * runs before trusting cluster-level decisions (SemDedup pruning,
    * cluster keywords, topic caps). Majority election is the repo's
    * max-of-struct idiom — (cnt, -label, label), so ties break toward the
    * SMALLEST label with no per-cluster window at all. Purity is one
    * correctly-rounded division of exact counts.
    *
    * Scale: assignment is the shared one-pass kmeansAssign; the audit
    * itself is two map-side-combined hash aggregates over (cid, label) —
    * at most nCells × |labels| rows ever shuffle.
    */
  def clusterPurity(emb: DataFrame, nCells: Int, iters: Int): DataFrame = {
    val cl = kmeansAssign(emb, nCells, iters)
      .join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
      .groupBy(col("cid"), col("label"))
      .agg(count(lit(1)).as("cnt"))
    cl.groupBy(col("cid"))
      .agg(
        sum(col("cnt")).as("n_members"),
        max(struct(col("cnt"), (-col("label")).as("negl"), col("label").as("l"))).as("m"))
      .select(col("cid"), col("n_members"),
        col("m.l").as("majority_label"), col("m.cnt").as("n_majority"),
        (col("m.cnt").cast("double") / col("n_members").cast("double")).as("purity"))
  }

  def clusterPurity(s: SparkSession, dir: String): DataFrame =
    clusterPurity(Tables.embeddings(s, dir), nCells = 8, iters = 2)

  /** Product quantization's fixed-point grid — deliberately COARSER than
    * the 1e8 exact-cosine grid so every ADC distance sum stays an exact
    * integer inside a double (see FixedPointSqDist's scaladoc). */
  private val PqScale = 1e4

  /** Per-subspace views of an embedding relation: one row per (id, sub)
    * carrying the `dsub`-dim sub-vector slice. */
  private def pqSubvecs(e: DataFrame, m: Int, dsub: Int, idCol: String): DataFrame =
    e.select(col(idCol), col("embedding"),
        explode(array((0 until m).map(lit(_)): _*)).as("sub"))
      .select(col(idCol), col("sub"),
        slice(col("embedding"), col("sub") * dsub + 1, lit(dsub)).as("svec"))

  /** The PQ codebook: the first `codes` vectors' sub-vectors per subspace
    * (the q35 first-k quantizer discipline — deterministic, no training
    * pass), m × codes rows: a true constant, broadcast everywhere. */
  private def pqCodebook(e: DataFrame, m: Int, dsub: Int, codes: Int): DataFrame =
    pqSubvecs(
      e.filter(col("vec_id") < codes)
        .select(col("vec_id").as("code"), col("embedding")),
      m, dsub, "code")
      .select(col("sub"), col("code"), col("svec").as("cvec"))

  /** Nearest-code assignment per (vector, subspace): exact fixed-point
    * squared L2 on the PQ grid, argmin tie-broken code ASC via a
    * map-side-combined min-of-struct (NOT a window: the pre-argmin
    * relation is |corpus|·m·codes rows, and a window would shuffle all of
    * them; the partial min leaves ≤ 1 row per (vec, sub) per map task). */
  private def pqAssign(e: DataFrame, m: Int, codes: Int, dims: Int): DataFrame = {
    val dsub = dims / m
    pqSubvecs(e, m, dsub, "vec_id")
      .join(broadcast(pqCodebook(e, m, dsub, codes)), Seq("sub"))
      .select(col("vec_id"), col("sub"), col("code"),
        FixedPoint.sqDistF(col("svec"), col("cvec"), PqScale).as("qdist"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("qdist"), col("code"))).as("best"))
      .select(col("vec_id"), col("sub"),
        col("best.code").as("code"), col("best.qdist").as("qdist"))
  }

  /** Product-quantization encode audit (q212): assign every vector's m
    * sub-vectors to their nearest codebook entries and report, per
    * (subspace, code), the population and mean squared reconstruction
    * error — the table an ANN pipeline reads to spot dead codes and
    * unbalanced cells before committing to a codebook.
    *
    * Scale: the corpus is touched once; the codebook is m·codes rows
    * (constant, broadcast); the only exchanges are the map-side-combined
    * argmin (≤ m rows per vector after partial agg) and the final
    * m·codes-row audit agg. The mean divides exact int64 sums — the
    * double division is the last step, identical in both engines.
    */
  def pqEncode(emb: DataFrame, m: Int = 4, codes: Int = 16, dims: Int = 64): DataFrame = {
    require(m > 0 && dims % m == 0, s"dims ($dims) must be divisible by m ($m)")
    val e = emb.repartition(shuffleWidth(emb), col("vec_id"))
    pqAssign(e, m, codes, dims)
      .groupBy(col("sub"), col("code"))
      .agg(count(lit(1)).as("n_assigned"), sum(col("qdist")).as("sdist"))
      .select(col("sub").as("subspace"), col("code"), col("n_assigned"),
        (col("sdist").cast("double") / col("n_assigned").cast("double") / lit(1e8))
          .as("avg_sqerr"))
  }

  def pqEncode(s: SparkSession, dir: String): DataFrame =
    pqEncode(Tables.embeddings(s, dir))

  /** PQ asymmetric-distance ANN (q213) — the IVF-PQ scale path's ranking
    * half: the corpus lives as m small code ids per vector (the
    * compressed resident form — 4 bytes/vector here vs 256 for the raw
    * floats), each query precomputes an exact (sub, code) → distance
    * lookup table against the codebook, and scoring a corpus vector is m
    * table lookups + adds — no float math per pair.
    *
    * Exactness: LUT entries are int64 on the PQ grid; an ADC sum of m of
    * them stays ≤ ~6e10, an exact integer in a double, so ranking through
    * BoundedTopK's double score is bit-identical to the oracle's BIGINT
    * sum (ties broken neighbor ASC in both). Scale: the encoded corpus
    * never reshuffles after the one argmin pass; the LUT relation is
    * nQueries·m·codes rows (constant, broadcast); the ranking exchange is
    * BoundedTopK-bounded to k rows per (map task × query).
    */
  def pqAdcTopK(
      emb: DataFrame,
      m: Int = 4, codes: Int = 16, dims: Int = 64,
      k: Int = 10, nQueries: Int = 10): DataFrame = {
    require(m > 0 && dims % m == 0, s"dims ($dims) must be divisible by m ($m)")
    val dsub = dims / m
    val e = Caches.track(emb.repartition(shuffleWidth(emb), col("vec_id")))
    // per-vector code word: codes ordered by subspace (array_sort on the
    // (sub, code) struct = sub ASC), the PQ-compressed corpus
    val enc = pqAssign(e, m, codes, dims)
      .groupBy(col("vec_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code")))),
        x => x.getField("code")).as("codes"))
    val qsv = pqSubvecs(
      e.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding")),
      m, dsub, "query_id")
    // LUT rows → per-query nested array lut[sub][code] (both levels
    // ordered by array_sort on the leading struct field)
    val lut = qsv
      .join(broadcast(pqCodebook(e, m, dsub, codes)), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        FixedPoint.sqDistF(col("svec"), col("cvec"), PqScale).as("qd"))
      .groupBy(col("query_id"), col("sub"))
      .agg(transform(
        array_sort(collect_list(struct(col("code"), col("qd")))),
        x => x.getField("qd")).as("row"))
      .groupBy(col("query_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("row")))),
        x => x.getField("row")).as("lut"))
    val adc = (0 until m).map { s =>
      element_at(element_at(col("lut"), s + 1),
        element_at(col("codes"), s + 1).cast("int") + 1).cast("double")
    }.reduce(_ + _)
    val topk = udaf(new BoundedTopK(k), ExpressionEncoder[Scored]())
    enc.crossJoin(broadcast(lut))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), adc.as("adcq"))
      .groupBy(col("query_id"))
      .agg(topk(col("vec_id"), -col("adcq")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.neighborId").as("neighbor_id"),
        (-col("t.cosine") / lit(1e8)).as("adc_sqdist"),
        (col("pos") + 1).as("rank"))
  }

  def pqAdcTopK(s: SparkSession, dir: String): DataFrame =
    pqAdcTopK(Tables.embeddings(s, dir))

  /** Coreset / k-center coverage audit (q214): deterministic LSH-cell
    * representatives (min vec_id per occupied cell — the cheap, fully
    * distributed stand-in for greedy k-center seeding) and, for every
    * corpus vector, its cosine to the NEAREST representative. Reported
    * per representative: population it covers, its coverage radius
    * (k-center's objective — the worst cosine among vectors it covers),
    * and how many of those sit above a 0.5 "well-covered" bar. This is
    * the audit a curation pipeline runs on a diversity-sampled coreset:
    * dead centers, oversubscribed centers, and under-covered regions all
    * read straight off the table.
    *
    * Exactness: per-vector nearest-rep is an argmax over the exact
    * fixed-point cosine (tie rep ASC) via a map-side-combined
    * min-of-struct; the per-rep outputs are counts and a MIN — no double
    * summation, so no float-accumulation-order hazard. Scale: reps are
    * ≤ 2^nPlanes rows (constant, broadcast twice); the corpus is touched
    * twice (bucket pass, coverage pass) and never self-joins.
    */
  def coresetCoverage(emb: DataFrame, nPlanes: Int = 6, dims: Int = 64): DataFrame = {
    val e = Caches.track(prepared(emb)
      .withColumn("bucket", Vectors.lshBucketF(col("embedding"), nPlanes, dims)))
    val repIds = e.groupBy(col("bucket")).agg(min(col("vec_id")).as("rep_id"))
      .select(col("rep_id"))
    val reps = e.join(broadcast(repIds), col("vec_id") === col("rep_id"))
      .select(col("rep_id"), col("embedding").as("re"), col("n2").as("rn2"))
    e.crossJoin(broadcast(reps))
      .select(col("vec_id"),
        struct(
          (-Vectors.cosineFromParts(
            FixedPoint.dotF(col("embedding"), col("re")), col("n2"), col("rn2")))
            .as("neg"),
          col("rep_id")).as("cand"))
      .groupBy(col("vec_id"))
      .agg(min(col("cand")).as("best"))
      .select(col("vec_id"), col("best.rep_id").as("rep_id"),
        (-col("best.neg")).as("cos"))
      .groupBy(col("rep_id"))
      .agg(
        count(lit(1)).as("n_covered"),
        min(col("cos")).as("min_cos"),
        sum(when(col("cos") >= 0.5, 1L).otherwise(0L)).as("n_close"))
  }

  def coresetCoverage(s: SparkSession, dir: String): DataFrame =
    coresetCoverage(Tables.embeddings(s, dir))

  /** Johnson–Lindenstrauss random-projection distortion audit (q215):
    * project every vector onto `dProj` deterministic ±1 hyperplanes (the
    * md5 family the LSH buckets already use) on the 1e4 grid, then, for a
    * DECLARED bounded audit tier (`vec_id < nAudit`, the lshRecallAudit
    * discipline), compare each pair's projected cosine against its exact
    * full-dimension cosine. This is the measurement a pipeline runs
    * before swapping 64-dim embeddings for a 4× cheaper 16-dim sketch in
    * its near-dup and clustering stages: the distortion column IS the
    * decision input.
    *
    * Exactness: projections are exact int64 sign-sums on the 1e4 grid
    * (|y_j| ≤ ~1e6, so a 16-dim projected dot ≤ ~2e13 — inside int64 AND
    * double's exact-integer range); both cosines are exact-integer ratios
    * evaluated identically in the oracle. Scale: the projection is a
    * stateless per-row map (a production materialization is one
    * shuffle-free pass over the corpus); the quadratic pair comparison
    * exists only inside the bounded audit tier, which Catalyst prunes to
    * before projecting anything.
    */
  def jlDistortion(
      emb: DataFrame,
      dProj: Int = 16, dims: Int = 64, nAudit: Int = 40): DataFrame = {
    val qv = Vectors.quantVecAt(col("embedding"), 1e4)
    val proj = array((0 until dProj).map(j =>
      Vectors.dotQ(qv, Vectors.hyperplaneSigns(j, dims))): _*)
    val e = Caches.track(emb
      .filter(col("vec_id") < nAudit)
      .select(col("vec_id"), col("embedding"), proj.as("proj"),
        FixedPoint.normSqF(col("embedding")).as("n2"))
      .withColumn("pn2", Vectors.normSqQ(col("proj"))))
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
      col("proj").as("pa"), col("n2").as("na"), col("pn2").as("pna"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      col("proj").as("pb"), col("n2").as("nb"), col("pn2").as("pnb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        Vectors.cosineFromParts(
          FixedPoint.dotF(col("ea"), col("eb")), col("na"), col("nb")).as("cos_orig"),
        Vectors.cosineFromParts(
          Vectors.dotQ(col("pa"), col("pb")), col("pna"), col("pnb")).as("cos_proj"))
      .withColumn("distortion", col("cos_proj") - col("cos_orig"))
  }

  def jlDistortion(s: SparkSession, dir: String): DataFrame =
    jlDistortion(Tables.embeddings(s, dir))

  /** PQ index staleness monitor (q218): the corpus splits into the
    * INDEXED population (even vec_ids — the vectors the codebook was
    * built for) and the DELTA (odd vec_ids — arrivals since), both
    * encoded against the SAME index-side codebook. Per subspace:
    * population and mean squared reconstruction error on each side, and
    * the delta/index error ratio — the number an ANN serving pipeline
    * watches to decide when distribution shift has outgrown the codebook
    * and a re-train is due (a fresh codebook reconstructs fresh data
    * well; a stale one shows the delta error pulling away from the
    * index error).
    *
    * Scale: identical shape to pqEncode — one corpus pass, constant
    * codebook broadcast, map-side argmin; the split is a stateless
    * parity projection, so the monitor costs exactly one encode run.
    * The ratio divides two exact-int-derived doubles — the same division
    * both engines round identically.
    */
  def pqStaleness(
      emb: DataFrame, m: Int = 4, codes: Int = 32, dims: Int = 64): DataFrame = {
    require(m > 0 && dims % m == 0, s"dims ($dims) must be divisible by m ($m)")
    val e = Caches.track(emb.repartition(shuffleWidth(emb), col("vec_id")))
    val dsub = dims / m
    // codebook from the INDEXED side only: first `codes` even vec_ids
    val cb = pqSubvecs(
      e.filter(col("vec_id") % 2 === 0 && col("vec_id") < 2L * codes)
        .select(col("vec_id").as("code"), col("embedding")),
      m, dsub, "code")
      .select(col("sub"), col("code"), col("svec").as("cvec"))
    val assigned = pqSubvecs(e, m, dsub, "vec_id")
      .join(broadcast(cb), Seq("sub"))
      .select(col("vec_id"), col("sub"), col("code"),
        FixedPoint.sqDistF(col("svec"), col("cvec"), PqScale).as("qdist"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("qdist"), col("code"))).as("best"))
      .select(col("vec_id"), col("sub"), col("best.qdist").as("qdist"),
        (col("vec_id") % 2 === 1).as("is_delta"))
    assigned
      .groupBy(col("sub"))
      .agg(
        sum(when(!col("is_delta"), 1L).otherwise(0L)).as("n_index"),
        sum(when(!col("is_delta"), col("qdist")).otherwise(0L)).as("s_index"),
        sum(when(col("is_delta"), 1L).otherwise(0L)).as("n_delta"),
        sum(when(col("is_delta"), col("qdist")).otherwise(0L)).as("s_delta"))
      .select(col("sub").as("subspace"), col("n_index"), col("n_delta"),
        (col("s_index").cast("double") / col("n_index").cast("double") / lit(1e8))
          .as("err_index"),
        (col("s_delta").cast("double") / col("n_delta").cast("double") / lit(1e8))
          .as("err_delta"))
      .withColumn("staleness_ratio",
        // nullif-guarded (the q200 discipline): a degenerate corpus where
        // the codebook IS the index population has err_index = 0; NULL is
        // the well-defined "no baseline" answer in both engines
        when(col("err_index") =!= 0.0, col("err_delta") / col("err_index")))
  }

  def pqStaleness(s: SparkSession, dir: String): DataFrame =
    pqStaleness(Tables.embeddings(s, dir))

  /** Embedding hygiene audit (q221): the per-label vector-health rollup a
    * pipeline runs before any index build or ANN query trusts the
    * embedding column — dimension consistency (a ragged dim breaks every
    * dot product downstream), zero vectors (cosine against them is
    * undefined), non-finite elements (one NaN poisons a whole centroid),
    * and the norm distribution (a norm drift is the first symptom of a
    * mis-scaled encoder push).
    *
    * Scale: one column-pruned pass, one map-side-combined aggregate —
    * zero joins, zero windows; cost is the cheapest possible query over
    * the table, per the audit doctrine above. Norms are exact int64 on
    * the 1e8 grid (`FixedPointDot` n², integer-summed per row, then one
    * correctly-rounded sqrt per ROW — not per aggregate — so every
    * aggregated value is an exact integer and the means divide
    * identically in both engines).
    */
  def embeddingHygiene(emb: DataFrame): DataFrame = {
    val perVec = emb
      .select(col("label"), size(col("embedding")).as("dim"),
        exists(col("embedding"),
          e => isnan(e) || abs(e) === lit(Float.PositiveInfinity)).as("bad"),
        col("embedding"))
      // norm on the 1e8 grid: sqrt of the exact int64 Σq² (grid 1e16).
      // NULL for non-finite vectors — their "norm" is meaningless and the
      // quantized sum of a NaN is engine-dependent (JVM casts NaN→0,
      // DuckDB errors); norm stats cover healthy vectors only.
      .select(col("label"), col("dim"), col("bad"),
        when(!col("bad"),
          floor(sqrt(FixedPoint.normSqF(col("embedding")).cast("double")) + 0.5)
            .cast("long")).as("norm_fp"))
    perVec
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        min(col("dim")).as("dim_min"),
        max(col("dim")).as("dim_max"),
        sum(when(col("norm_fp") === 0L, 1L).otherwise(0L)).as("n_zero_vecs"),
        sum(when(col("bad"), 1L).otherwise(0L)).as("n_nonfinite_vecs"),
        count(col("norm_fp")).as("n_finite"),
        min(col("norm_fp")).as("norm_min_fp"),
        max(col("norm_fp")).as("norm_max_fp"),
        sum(col("norm_fp")).as("norm_sum_fp"))
      .withColumn("norm_mean",
        col("norm_sum_fp").cast("double") / col("n_finite").cast("double") / lit(1e8))
  }

  def embeddingHygiene(s: SparkSession, dir: String): DataFrame =
    embeddingHygiene(Tables.embeddings(s, dir))

  /** IVF shard planner (q225): assign the index's coarse cells to
    * `nShards` serving shards by rank-striping — cells ranked by
    * population descending, shard = (rank−1) mod nShards — and report
    * each shard's cell count, vector population, share, and imbalance
    * (share · nShards; 1.0 = perfectly balanced). Striping puts the 1st,
    * (n+1)th, (2n+1)th… largest cells on different shards, which bounds
    * the worst shard far tighter than hash placement when cell sizes are
    * skewed — and cell skew is the norm (real embedding spaces cluster).
    *
    * Scale: the corpus cost is exactly one assignment pass (the shared
    * q61/q204/q208 k-means chain); everything after operates on the
    * nCells-row count table — the ranking window is bounded by the CELL
    * count (the bucketedPrefix bucket-totals discipline), never the
    * corpus.
    */
  def shardPlan(
      emb: DataFrame, nCells: Int = 8, iters: Int = 2, nShards: Int = 4): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    // cached: the totals and the per-shard rollup both read the
    // nCells-row table; a recompute would re-run the k-means chain
    val counts = Caches.track(
      kmeansAssign(emb, nCells, iters)
        .groupBy(col("cid")).agg(count(lit(1)).as("n_vecs")))
    val striped = counts
      .withColumn("rk",
        row_number().over(Window.orderBy(col("n_vecs").desc, col("cid"))))
      .withColumn("shard", ((col("rk") - 1) % nShards).cast("long"))
    val tot = counts.agg(sum(col("n_vecs")).as("n_total"))
    striped.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_cells"), sum(col("n_vecs")).as("n_vecs"))
      .crossJoin(broadcast(tot))
      .select(col("shard"), col("n_cells"), col("n_vecs"), col("n_total"),
        (col("n_vecs").cast("double") / col("n_total").cast("double")).as("share"),
        (col("n_vecs").cast("double") / col("n_total").cast("double") * nShards)
          .as("imbalance"))
  }

  def shardPlan(s: SparkSession, dir: String): DataFrame =
    shardPlan(Tables.embeddings(s, dir))

  /** Exact embedding covariance matrix (q229): the upper triangle of
    * cov(X) over the corpus — the input every whitening / PCA /
    * Mahalanobis-distance step needs. Entries are exact integer moments
    * on the 1e4 grid (cov = (n·Σxy − Σx·Σy) / n², one double division at
    * the end), so the matrix is bit-identical across engines,
    * partitionings, and reruns — no float-summation drift.
    *
    * Scale: one corpus pass; each row expands to its dims·(dims+1)/2
    * upper-triangle products which immediately enter a map-side-combined
    * aggregate — the shuffle carries ≤ 2080 rows per map task (64 dims),
    * independent of corpus size. Headroom: the MOMENTS are int64-safe to
    * n ≈ 2·10⁹ vectors (|q| ≤ 2·10⁴ ⇒ Σxy ≤ 4·10⁸·n), but the final
    * n·Σxy and Σx·Σy products carry an extra factor of n — int64 would
    * overflow them at n ~ 1.5·10⁵ worst-case — so the combine is done in
    * DECIMAL(38,0) (exact to 10³⁸, n ≈ 10¹⁰ worst-case) with one double
    * conversion at the end; past that, shard by vec-range and merge the
    * (n, sxy, sx, sy) partials — they are exactly mergeable by design.
    */
  def embeddingCovariance(emb: DataFrame, dims: Int = 64): DataFrame = {
    // one-pass typed aggregate (graft.functions.GramMoments): each map
    // task quantizes locally and ships ONE 16 KB moment buffer; the
    // prior transform/flatten/explode composition paid ~dims²/2
    // interpreted struct allocations per row (HOFs are excluded from
    // whole-stage codegen) and 2080 shuffle rows per task — bit-identical
    // output (integer sums are order-independent), ~4× the wall time
    val gram = udaf(new GramMoments(dims, 1e4),
      ExpressionEncoder[Array[Float]]())
    emb.agg(gram(col("embedding")).as("g"))
      .select(explode(col("g")).as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"), col("e.n").as("n"),
        col("e.sxy").as("sxy"), col("e.sx").as("sx"), col("e.sy").as("sy"))
      .withColumn("cov", {
        // exact DECIMAL(38,0) combine: n·Σxy and Σx·Σy overflow int64 at
        // n ~ 1.5e5 vectors worst-case; decimal is exact to 1e38 and the
        // single double conversion at the end is identical to DuckDB's
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val n = col("n").cast(dec)
        ((n * col("sxy").cast(dec) - col("sx").cast(dec) * col("sy").cast(dec))
          .cast("double") / (n * n).cast("double")) / lit(1e8)
      })
  }

  def embeddingCovariance(s: SparkSession, dir: String): DataFrame =
    embeddingCovariance(Tables.embeddings(s, dir))

  /** Top principal component by fixed-point power iteration (q230):
    * `iters` deterministic matrix-vector steps over the exact integer
    * covariance moments (q229), from a fixed uniform start vector —
    * output is the unit loading per dimension plus the component's
    * variance share (Rayleigh quotient ÷ trace). Every step re-rounds
    * onto the 1e6 grid through the same correctly-rounded double ops in
    * both engines (norms are exact Σw² in DECIMAL(38,0) before the one
    * sqrt), so the iterate — including its sign, which is whatever the
    * fixed start converges to — is bit-identical across engines,
    * partitionings, and reruns.
    *
    * Scale: the corpus is touched exactly once (the covariance pass);
    * every iteration joins the dims²-row matrix with the dims-row
    * vector — constant-bounded work, broadcast scalars for the norms.
    * The moment downscale (÷2³⁰, floor(x/2³⁰+0.5) in double — exact
    * power-of-two scaling, identical rounding both engines) buys int64
    * headroom for the matrix-vector products; eigendirections are
    * scale-free so the result is unchanged.
    */
  def pcaPower(emb: DataFrame, dims: Int = 64, iters: Int = 4): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(iters > 0, s"iters must be positive, got $iters")
    val session = emb.sparkSession
    // localCheckpoint (the kmeansCentroids discipline): the broadcast
    // norm subqueries and the matrix-vector jobs would otherwise RACE to
    // materialize the covariance before any of them caches it — an
    // eager dims²-row checkpoint runs the corpus pass exactly once
    val cov = embeddingCovariance(emb, dims)
      .select(col("i"), col("j"), {
        // same DECIMAL(38,0) combine as the covariance output: the
        // n·Σxy − Σx·Σy numerator overflows int64 at n ~ 1.5e5 vectors
        val dec = DecimalType(38, 0)
        floor((col("n").cast(dec) * col("sxy").cast(dec) -
            col("sx").cast(dec) * col("sy").cast(dec)).cast("double") /
          lit(1073741824.0) + 0.5).cast("long").as("c")
      })
      .transform(graft.Checkpoints.truncate(_))
    val full = cov.unionAll(cov.filter(col("i") =!= col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("c")))
    var v: DataFrame = session.range(dims.toLong)
      .select(col("id").cast("int").as("vi"), lit(1000000L).as("val"))
    for (_ <- 1 to iters) {
      val w = full.join(v, col("j") === col("vi"))
        .groupBy(col("i")).agg(sum(col("c") * col("val")).as("w"))
      val n2 = w.agg(sum(col("w").cast(DecimalType(38, 0)) * col("w")).as("n2"))
      v = w.crossJoin(broadcast(n2))
        .select(col("i").cast("int").as("vi"),
          floor(col("w").cast("double") /
            sqrt(nullif(col("n2").cast("double"), lit(0.0))) * 1e6 + 0.5)
            .cast("long").as("val"))
        .transform(graft.Checkpoints.truncate(_))
    }
    val vc = v
    val cv = full.join(vc, col("j") === col("vi"))
      .groupBy(col("i")).agg(sum(col("c") * col("val")).as("cv"))
    val num = cv.join(vc, col("i") === col("vi"))
      .agg(sum(col("cv").cast(DecimalType(38, 0)) * col("val")).as("num"))
    val den = vc.agg(sum(col("val") * col("val")).as("den"))
    val tr = full.filter(col("i") === col("j")).agg(sum(col("c")).as("tr"))
    vc.crossJoin(broadcast(num)).crossJoin(broadcast(den)).crossJoin(broadcast(tr))
      .select(col("vi").as("dim"),
        (col("val").cast("double") / 1e6).as("loading"),
        (col("num").cast("double") / nullif(col("den").cast("double"), lit(0.0)) /
          nullif(col("tr").cast("double"), lit(0.0))).as("var_share"))
  }

  def pcaPower(s: SparkSession, dir: String): DataFrame =
    pcaPower(Tables.embeddings(s, dir))

  /** Cross-modal alignment audit (q231): per-language exact-moment
    * Pearson correlation between document length and embedding norm over
    * the doc⋈embedding join — the encoder-saturation check (a healthy
    * encoder's norm drifts with input length; a collapsed or
    * length-clipped one doesn't). Norms are exact int64 on the 1e8 grid
    * (one correctly-rounded sqrt per row); all moments accumulate as
    * DECIMAL(38,0) (Σ norm² passes 2⁶³) with the one double conversion
    * per term at the end — the q97 exact-moment discipline, so the
    * correlation is bit-identical across engines and partitionings.
    *
    * Scale: column-pruned scans on both sides, one equi-join on the id,
    * one map-side-combined aggregate to |langs| rows. Nothing else.
    */
  def modalityAlignment(docs: DataFrame, emb: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d = DecimalType(38, 0)
    val joined = docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .join(emb.select(col("vec_id").as("doc_id"),
        floor(sqrt(FixedPoint.normSqF(col("embedding")).cast("double")) + 0.5)
          .cast("long").as("norm_fp")), "doc_id")
    joined.groupBy(col("lang")).agg(
      count(lit(1)).as("n"),
      sum(col("n_chars").cast(d)).as("sx"),
      sum(col("norm_fp").cast(d)).as("sy"),
      // per-row products stay inside int64 (chars ≤ ~1e5 × norm ≤ ~1e10)
      sum((col("n_chars") * col("norm_fp")).cast(d)).as("sxy"),
      sum((col("n_chars") * col("n_chars")).cast(d)).as("sxx"),
      // norm² passes 2⁶³ — cast BEFORE the multiply
      sum(col("norm_fp").cast(d) * col("norm_fp")).as("syy"))
      .select(col("lang"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt(nullif(
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
              (col("n") * col("syy") - col("sy") * col("sy")).cast("double"),
            lit(0.0)))).as("corr"),
        (col("sx").cast("double") / col("n").cast("double")).as("mean_chars"),
        (col("sy").cast("double") / col("n").cast("double") / 1e8).as("mean_norm"))
  }

  def modalityAlignment(s: SparkSession, dir: String): DataFrame =
    modalityAlignment(Tables.documents(s, dir), Tables.embeddings(s, dir))

  /** Hybrid lexical+dense retrieval fusion (q243): reciprocal-rank fusion
    * of the BM25 keyword list ([[Corpus.bm25Scores]]) and the dense
    * cosine list against a probe embedding, the standard two-tower
    * retrieval combiner (RRF, Cormack et al. SIGIR'09):
    * `rrf(d) = Σ_lists 1/(60 + rank_list(d))`, summed over the lists
    * that retrieved `d` in their top-`kList`.
    *
    * Determinism: both ranks are integers from total orders
    * (score DESC, id ASC), each reciprocal is one double division of
    * exact integers, and the two-term sum is evaluated left-to-right —
    * bit-identical in any engine.
    *
    * Scale: each side ranks through the map-side-bounded
    * [[graft.functions.BoundedTopK]] aggregate (k rows per map task
    * cross the exchange — never a global sort of the scored corpus); the
    * fusion join touches ≤ 2·kList rows, and the final top-`kOut` is a
    * bounded TakeOrderedAndProject. The corpus is scanned once per
    * modality, everything downstream is constant-size.
    */
  def hybridRrf(
      docs: DataFrame, emb: DataFrame,
      terms: Seq[String] = Seq("spark", "merge", "window"),
      queryVec: Long = 0L, kList: Int = 64, kOut: Int = 20): DataFrame = {
    val topk = udaf(new BoundedTopK(kList), ExpressionEncoder[Scored]())
    def ranked(scored: DataFrame, id: String, score: String, rank: String) =
      scored
        .agg(topk(col(id), col(score)).as("top"))
        .select(posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("t.neighborId").as("doc_id"), (col("pos") + 1).as(rank))
    val lex = ranked(
      Corpus.bm25Scores(docs, terms), "doc_id", "score", "lex_rank")
    val e = prepared(emb)
    val q = e.filter(col("vec_id") === queryVec)
      .select(col("embedding").as("qe"), col("n2").as("qn2"))
    val dense = ranked(
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= queryVec)
        .select(col("vec_id"), Vectors.cosineFromParts(
          FixedPoint.dotF(col("embedding"), col("qe")),
          col("n2"), col("qn2")).as("cosine")),
      "vec_id", "cosine", "dense_rank")
    lex.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("dense_rank"),
        (coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("dense_rank")), lit(0.0)))
          .as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(kOut)
  }

  def hybridRrf(s: SparkSession, dir: String): DataFrame =
    hybridRrf(Tables.documents(s, dir), Tables.embeddings(s, dir))

  /** Reciprocal-nearest-neighbour pairs (q250): within the LSH candidate
    * set, `(a, b)` is emitted iff `b` is `a`'s single best candidate AND
    * `a` is `b`'s — the "best-buddy" criterion near-dup pipelines use as
    * a higher-precision alternative to a raw cosine threshold (a pair
    * that is mutually closest is a duplicate candidate even when the
    * corpus-wide threshold would drown it in hub neighbours; a one-sided
    * neighbour of a hub vector is not). Ties break deterministically to
    * the smaller neighbour id via lexicographic `max(struct(cosine,
    * -nbr))` on the exact fixed-point cosine.
    *
    * Scale: candidates come from the q25 banded-LSH bucket join (never
    * all-pairs), the per-vector argmax is one hash aggregate over the
    * candidate edges, and the mutuality check is a self-equijoin of the
    * |vectors|-row best-edge relation on the reversed key pair. The
    * quadratic stays inside buckets, exactly like nearDupLsh.
    */
  def reciprocalNn(emb: DataFrame, nPlanes: Int, dims: Int): DataFrame = {
    val sig = prepared(emb)
      .withColumn("bucket", Vectors.lshBucketF(col("embedding"), nPlanes, dims))
    val pairs = sig.as("a").hint("shuffle_hash")
      .join(sig.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        Vectors.cosineFromParts(
          FixedPoint.dotF(col("a.embedding"), col("b.embedding")),
          col("a.n2"), col("b.n2")).as("cosine"))
    val directed = pairs
      .select(col("va").as("src"), col("vb").as("nbr"), col("cosine"))
      .unionAll(pairs
        .select(col("vb").as("src"), col("va").as("nbr"), col("cosine")))
    val best = Caches.track(directed
      .groupBy(col("src"))
      .agg(max(struct(col("cosine"), (-col("nbr")).as("neg"))).as("m"))
      .select(col("src"), (-col("m.neg")).as("nbr"), col("m.cosine").as("cosine")))
    best.as("x").hint("shuffle_hash")
      .join(best.as("y"),
        col("x.src") === col("y.nbr") && col("x.nbr") === col("y.src") &&
          col("x.src") < col("x.nbr"))
      .select(col("x.src").as("vec_a"), col("x.nbr").as("vec_b"),
        col("x.cosine").as("cosine"))
  }

  def reciprocalNn(s: SparkSession, dir: String): DataFrame =
    reciprocalNn(Tables.embeddings(s, dir), nPlanes = 8, dims = 64)

  /** Ratio-margin candidate pairs (q270) — the hubness-corrected
    * similarity criterion of CSLS (Lample et al. 2018) / the
    * margin-based bitext miner (Artetxe & Schwenk 2019): a pair
    * qualifies not by its RAW cosine but by how far the cosine stands
    * above BOTH endpoints' local neighbourhoods,
    * `margin(x,y) = cos(x,y) / ((μₖ(x) + μₖ(y))/2)` with μₖ the mean
    * cosine of a vector's k best candidates. Hub vectors (close to
    * everything) have high μₖ and stop winning every pairing; isolated
    * genuine matches clear the bar at modest absolute cosine. q250 keeps
    * only mutual TOP-1 edges; this keeps EVERY edge that clears the
    * locally-normalised margin — the recall-side complement.
    *
    * Exactness: cosines land on the 1e6 grid (`floor(cos·1e6)`, the
    * deterministic double from exact fixed-point parts), μₖ stays an
    * UNREDUCED (sum, count) pair, and the margin is one positive integer
    * division on the common denominator,
    * `(2e6·cos·nₐ·n_b) div (sumₐ·n_b + sum_b·nₐ)` in DECIMAL(38,0) —
    * no negative division anywhere (pairs require cos > 0 and a positive
    * denominator), so Spark's truncating `div` and DuckDB's `//` agree.
    *
    * Scale: candidates from the banded-LSH bucket join (never
    * all-pairs); μₖ is one partitioned top-k window over the candidate
    * edges; the margin join is two shuffle_hash equijoins on vec ids.
    */
  def marginPairs(emb: DataFrame, nPlanes: Int = 8, dims: Int = 64,
      k: Int = 3, marginThresholdMicro: Long = 1020000L): DataFrame = {
    val sig = prepared(emb)
      .withColumn("bucket", Vectors.lshBucketF(col("embedding"), nPlanes, dims))
    val pairs = Caches.track(sig.as("a").hint("shuffle_hash")
      .join(sig.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        floor(Vectors.cosineFromParts(
          FixedPoint.dotF(col("a.embedding"), col("b.embedding")),
          col("a.n2"), col("b.n2")) * 1e6).cast("long").as("cos_micro")))
    val directed = pairs
      .select(col("va").as("src"), col("vb").as("nbr"), col("cos_micro"))
      .unionAll(pairs
        .select(col("vb").as("src"), col("va").as("nbr"), col("cos_micro")))
    val bySrc = Window.partitionBy(col("src"))
      .orderBy(col("cos_micro").desc, col("nbr"))
    val mtk = directed
      .withColumn("rn", row_number().over(bySrc))
      .filter(col("rn") <= k)
      .groupBy(col("src"))
      .agg(sum(col("cos_micro")).as("msum"), count(lit(1)).as("mn"))
    pairs.filter(col("cos_micro") > 0)
      .hint("shuffle_hash")
      .join(mtk.select(col("src").as("va"), col("msum").as("sum_a"),
        col("mn").as("n_a")), "va")
      .hint("shuffle_hash")
      .join(mtk.select(col("src").as("vb"), col("msum").as("sum_b"),
        col("mn").as("n_b")), "vb")
      .filter(col("sum_a") * col("n_b") + col("sum_b") * col("n_a") > 0)
      .withColumn("margin_micro", expr(
        """(cast(2000000 as decimal(38,0)) * cos_micro * n_a * n_b)
          |  div (cast(sum_a as decimal(38,0)) * n_b
          |       + cast(sum_b as decimal(38,0)) * n_a)""".stripMargin))
      .filter(col("margin_micro") >= marginThresholdMicro)
      .select(col("va").as("vec_a"), col("vb").as("vec_b"),
        col("cos_micro"), col("margin_micro"))
  }

  def marginPairs(s: SparkSession, dir: String): DataFrame =
    marginPairs(Tables.embeddings(s, dir))

  /** Centroid-distance outlier screen (q271): per label group, every
    * vector's squared distance to its group's EXACT fixed-point
    * centroid, the group-wise descending rank, and a flag on the top
    * `outlierPct`% — the embedding-space poison/mislabel screen (a
    * vector far from everything that shares its label is a labeling
    * error, an adversarial insert, or a degenerate embedding; the
    * hygiene audit q221 catches NaN/zero pathologies, this catches the
    * geometrically wrong).
    *
    * Exactness: the centroid is never materialised as floats — distance
    * uses the common denominator, `d2num = Σ_i (qᵢ·n − sᵢ)²` in
    * DECIMAL(38,0) (qᵢ the 1e8 fixed-point coord, sᵢ the group's exact
    * per-dimension sum, n the group size), which orders identically to
    * d² within a group; the reported `d2` is the one double division
    * `d2num / (n²·1e16)`.
    *
    * Scale: the group rank does NOT ride a per-label window (few labels
    * = single-partition windows over fact-scaled groups). Instead the
    * GLOBAL rank over (label, d2num desc, vec_id) rides
    * `Advanced.bucketedPrefix`, and the per-label rank is recovered by
    * subtracting each label's start offset — a |labels|-row cumulative
    * join (the bounded relation where an unpartitioned window is fine).
    */
  def centroidOutliers(emb: DataFrame, outlierPct: Int = 1,
      buckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val q = Caches.track(emb
      .select(col("vec_id"), col("label"),
        Vectors.quantVec(col("embedding")).as("q")))
    val sums = q
      .select(col("label"), posexplode(col("q")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
    val cents = sums.groupBy(col("label"))
      .agg(sort_array(collect_list(struct(col("pos"), col("s")))).as("ps"),
        max(col("n")).as("n"))
      .select(col("label"), transform(col("ps"), p => p.getField("s")).as("svec"),
        col("n"))
    val d = q.join(broadcast(cents), "label")
      .withColumn("d2num", expr(
        """aggregate(
          |  zip_with(q, svec, (a, b) -> cast(a as decimal(38,0)) * n - b),
          |  cast(0 as decimal(38,0)), (acc, v) -> acc + v * v)""".stripMargin))
      .select(col("vec_id"), col("label"), col("n"), col("d2num"))
    val ranked = Advanced.bucketedPrefix(d,
      Seq(col("label"), col("d2num").desc, col("vec_id")), buckets)(
      spec => count(lit(1)).over(
        spec.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
      count(lit(1)),
      spec => coalesce(sum(col("tot")).over(spec), lit(0L)),
      (run, off) => run + off)
    // per-label start offsets: a |labels|-row relation — the bounded
    // place where an unpartitioned cumulative window is the right tool
    val offs = d.groupBy(col("label")).agg(count(lit(1)).as("ln"))
      .withColumn("loff", coalesce(sum(col("ln")).over(
        Window.orderBy(col("label"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("label"), col("loff"))
    ranked.join(broadcast(offs), "label")
      .withColumn("rank", col("prefix") - col("loff"))
      .select(col("vec_id"), col("label"),
        (col("d2num").cast("double") /
          (col("n").cast("double") * col("n") * 1e16)).as("d2"),
        col("rank"),
        (col("rank") <= expr(s"(n * $outlierPct + 99) div 100")).as("flagged"))
  }

  def centroidOutliers(s: SparkSession, dir: String): DataFrame =
    centroidOutliers(Tables.embeddings(s, dir))

  /** Hard-negative mining (q275): for every anchor vector, its top-k
    * most-similar candidates inside a similarity BAND — close enough to
    * be confusable (`cos ≥ lo`), not so close they are duplicates
    * (`cos < hi`, the near-dup cutoff). These (anchor, hard-negative)
    * pairs are the contrastive-training fuel embedding models are
    * fine-tuned on: random negatives are trivially separable and teach
    * nothing; band-mined ones sit on the decision boundary. The hi
    * cutoff matters as much as lo — a duplicate mined as a "negative"
    * is a poisoned label (it IS the anchor's positive).
    *
    * Exactness: the fixed-point cosine on the 1e6 grid (the q270
    * convention), per-anchor rank by (cos_micro desc, negative id) —
    * fully deterministic. Scale: candidates from the banded-LSH bucket
    * join (never all-pairs); the per-anchor top-k is one partitioned
    * window over the band-filtered candidate edges (bounded per anchor
    * by construction).
    */
  def hardNegatives(emb: DataFrame, nPlanes: Int = 8, dims: Int = 64,
      loMicro: Long = 300000L, hiMicro: Long = 900000L,
      k: Int = 3): DataFrame = {
    val sig = prepared(emb)
      .withColumn("bucket", Vectors.lshBucketF(col("embedding"), nPlanes, dims))
    val pairs = sig.as("a").hint("shuffle_hash")
      .join(sig.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        floor(Vectors.cosineFromParts(
          FixedPoint.dotF(col("a.embedding"), col("b.embedding")),
          col("a.n2"), col("b.n2")) * 1e6).cast("long").as("cos_micro"))
      .filter(col("cos_micro") >= loMicro && col("cos_micro") < hiMicro)
    val directed = pairs
      .select(col("va").as("anchor"), col("vb").as("negative"), col("cos_micro"))
      .unionAll(pairs
        .select(col("vb").as("anchor"), col("va").as("negative"), col("cos_micro")))
    val byAnchor = Window.partitionBy(col("anchor"))
      .orderBy(col("cos_micro").desc, col("negative"))
    directed
      .withColumn("rank", row_number().over(byAnchor))
      .filter(col("rank") <= k)
      .select(col("anchor"), col("negative"), col("cos_micro"),
        col("rank").cast("long").as("rank"))
  }

  def hardNegatives(s: SparkSession, dir: String): DataFrame =
    hardNegatives(Tables.embeddings(s, dir))

  /** IVF recall audit (q235): per-query recall@k of the trained-IVF
    * probe (q61) against the exact brute-force top-k (q24) — the q200
    * discipline applied to the ANN index: an approximate index ships
    * with its measured recall, not a hoped-for one. Unlike q200's
    * quadratic ground truth, the exact side here is the BOUNDED query
    * tier (nQueries × corpus, one broadcast pass), so this audit runs at
    * full corpus scale.
    */
  def ivfRecallAudit(
      emb: DataFrame,
      nCells: Int = 8, iters: Int = 2, nProbe: Int = 2,
      k: Int = 5, nQueries: Int = 10): DataFrame = {
    // cached: the per-query truth counts and the hit semi-join both read it
    val truth = Caches.track(
      annBruteForceTopK(emb, k, nQueries).select(col("query_id"), col("neighbor_id")))
    val approx = annIvfTrained(emb, nCells, iters, nProbe, k, nQueries)
      .select(col("query_id"), col("neighbor_id"))
    val hits = truth.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    truth.groupBy(col("query_id")).agg(count(lit(1)).as("n_truth"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_truth"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") /
          nullif(col("n_truth").cast("double"), lit(0.0))).as("recall"))
  }

  def ivfRecallAudit(s: SparkSession, dir: String): DataFrame =
    ivfRecallAudit(Tables.embeddings(s, dir))

  /** Diversity-first selection under a budget (q288): the embedding-space
    * complement of q285's quality-first greedy — when the training budget
    * is K examples, taking the K highest-scored ones collapses onto the
    * densest region; a diversity-first pass ROUND-ROBINS the embedding
    * space instead. Vectors land in deterministic LSH cells (the q214
    * hyperplane family); within a cell they rank by vec_id; the admitted
    * set is the first K rows of the TOTAL order (round, cell) — i.e. one
    * representative from every occupied cell, then a second from every
    * cell, ... until the budget is spent. This is greedy k-center's
    * cheap distributed stand-in, made exact and engine-independent.
    *
    * Scale: one cell-keyed window ranks within cells (cells shrink as
    * nPlanes grows — pick nPlanes ~ log2(corpus/cell_target)); the global
    * rank is the ONE order-dependent step and rides
    * [[Advanced.bucketedPrefix]]; output aggregates to |labels| rows.
    */
  def diverseSelect(emb: DataFrame, k: Long = 300L, nPlanes: Int = 6,
      dims: Int = 64, buckets: Int = 32): DataFrame = {
    val cells = emb
      .repartition(shuffleWidth(emb), col("vec_id"))
      .select(col("vec_id"), col("label"),
        Vectors.lshBucketF(col("embedding"), nPlanes, dims).as("cell"))
    val ranked = cells.withColumn("r", row_number().over(
      Window.partitionBy(col("cell")).orderBy(col("vec_id"))))
    // NB: the cell column must not be named "bucket" — bucketedPrefix
    // claims that name for its internal range-partition id
    Advanced.bucketedPrefix(ranked, Seq(col("r"), col("cell")), buckets)(
      spec => count(lit(1)).over(
        spec.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
      count(lit(1)),
      spec => coalesce(sum(col("tot")).over(spec), lit(0L)),
      (run, off) => run + off)
      .filter(col("prefix") <= k)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_selected"),
        countDistinct(col("cell")).as("n_cells"),
        max(col("r")).as("max_round"))
  }

  def diverseSelect(s: SparkSession, dir: String): DataFrame =
    diverseSelect(Tables.embeddings(s, dir))
}
