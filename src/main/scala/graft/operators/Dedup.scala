package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Caches
import graft.functions.Text
import graft.sources.Tables

/** Document deduplication for training-data pipelines, at four fidelity
  * levels: exact (content hash), n-gram Jaccard (ground truth for near-dup),
  * MinHash+LSH (the scale path: candidates via banded signature buckets,
  * verified with true Jaccard), and SimHash signatures.
  *
  * Every operator is a DataFrame-in/DataFrame-out transform over a
  * `(doc_id, text)` corpus; the `(SparkSession, dir)` overloads bind the
  * testdata `documents` table for the driver contract.
  *
  * All hashing is md5-based so every stage is reproducible in any engine —
  * the DuckDB oracles compute identical signatures, buckets, and pairs.
  *
  * Scale design: nothing here is all-pairs except the explicitly-named
  * ground-truth operator. MinHash/LSH cost is O(docs × shingles) for
  * signatures (embarrassingly parallel projections) plus per-bucket joins;
  * the shuffle keys (shingle, band+key) are high-cardinality so partitions
  * stay balanced.
  */
object Dedup {

  /** Exact dedup by content hash: one row per distinct text, keeper = min
    * doc_id, n = group size. Pure hash-aggregate, one shuffle with map-side
    * partial aggregation.
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))

  def exact(s: SparkSession, dir: String): DataFrame =
    exact(Tables.documents(s, dir))

  /** Per-doc distinct word-3-gram sets: (doc_id [, carry...], shs array,
    * n_sh). Repartitioned by doc_id BEFORE the shingling: the source may
    * arrive in few partitions (one small parquet file locally; coarse
    * splits at scale), and shingling multiplies the data ~50× — spreading
    * docs across the full shuffle-partition count first keeps the hash
    * work on every core instead of one. `carry` columns ride through for
    * callers that cannot join them back (a streaming frame cannot
    * self-join) — same mechanism as bandKeys. The repartition is skipped
    * on streaming frames (hash partitioning of a micro-batch is the
    * stream's own concern; an explicit exchange is not supported there).
    */
  def docShingleSets(docs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    // explicit N: an un-pinned repartition gets AQE-coalesced back to
    // ~1 partition at small scale, serializing the hash work
    val spread =
      if (docs.isStreaming) docs
      else docs.repartition(shuffleWidth(docs), col("doc_id"))
    spread
      .select((col("doc_id") +: carry.map(col)) :+ Text.words(col("text")).as("w"): _*)
      .filter(size(col("w")) >= 3)
      .select((col("doc_id") +: carry.map(col)) :+ Text.shingles(col("w")).as("shs"): _*)
      .withColumn("n_sh", size(col("shs")))
  }

  def docShingleSets(s: SparkSession, dir: String): DataFrame =
    docShingleSets(Tables.documents(s, dir))


  /** (doc_id, shingle) pairs: distinct word-3-grams per document.
    * `explode_outer`, deliberately: plain `explode` makes Catalyst emit an
    * implicit `size(shs) > 0 AND isnotnull(shs)` filter and push it below
    * the repartition with the full shingle expression inlined — the
    * heaviest (interpreted, higher-order) work then runs on the narrow
    * pre-shuffle side. The `size(w) >= 3` guard already guarantees a
    * non-empty shingle set, so outer-explode is semantically identical
    * and generates no filter at all.
    */
  def docShingles(docs: DataFrame): DataFrame =
    docShingleSets(docs)
      .select(col("doc_id"), explode_outer(col("shs")).as("sh"))

  def docShingles(s: SparkSession, dir: String): DataFrame =
    docShingles(Tables.documents(s, dir))

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

  /** The lowest threshold any corpus-level truth consumer operates at
    * (q217's sweep floor): the ONE mined pair artifact every stricter
    * cut derives from by a filtered scan (see [[ngramJaccard]]). */
  private[graft] val ngramTruthBase = 0.3

  /** Ground-truth near-dup pairs: docs sharing >=1 shingle, true Jaccard >=
    * threshold. The shingle self-join is the honest quadratic-in-collisions
    * baseline; use `minhashLsh` at scale.
    */
  def ngramJaccard(docs: DataFrame, threshold: Double): DataFrame =
    // shared derived artifact (round-16 pattern): one build per (input
    // generation, threshold). Round 19: thresholds ABOVE the 0.3 sweep
    // base DERIVE from the base artifact by a filtered scan instead of
    // re-running the quadratic shingle self-join (the tierTruth chain
    // convention) — exact, because the inline chain's very last step is
    // `jaccard >= threshold` over the same pair relation, so
    // inline(t) ≡ inline(base).filter(jaccard ≥ t) for every t ≥ base,
    // row for row, jaccard values included. One corpus mine per
    // generation now serves q21's t0.5 AND q217's whole sweep.
    graft.Derived.materialized(docs.sparkSession,
      s"ngram_jaccard_t${graft.Derived.paramKey(threshold)}", Seq(docs)) {
      if (threshold > ngramTruthBase)
        ngramJaccard(docs, ngramTruthBase).filter(col("jaccard") >= threshold)
      else ngramJaccardInline(docs, threshold)
    }

  private[graft] def ngramJaccardInline(docs: DataFrame, threshold: Double): DataFrame = {
    // the shingle set feeds both self-join sides and the per-doc counts;
    // persist so the explode+shingle scan runs once, not three times
    // (caller-released, see graft.Caches)
    val sh = Caches.track(docShingles(docs))
    // shuffle_hash: never broadcast the shingle relation — it cannot
    // broadcast at real scale, and a broadcast build here would execute
    // the whole shingle pipeline in a single thread before the cache is
    // materialized. A shuffled hash join builds per-partition maps in
    // parallel (AQE may still downgrade to broadcast AFTER the parallel
    // shuffle ran, which is fine).
    val inter = sh.as("a").hint("shuffle_hash")
      .join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    withJaccard(inter, shingleCounts(sh))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  def ngramJaccard(s: SparkSession, dir: String, threshold: Double = 0.5): DataFrame =
    ngramJaccard(Tables.documents(s, dir), threshold)

  /** Dedup threshold-sensitivity sweep (q217): the pair Jaccards are
    * computed ONCE — read from the shared `ngram_jaccard_t<min>` Derived
    * artifact (built once per input generation by the q21 chain) — then
    * every candidate threshold reads its consequences off that one
    * relation: dup pairs at or above the cut, documents touched by any
    * such pair, and documents the min-id keep rule would drop (those
    * with a smaller-id counterpart). This is the ablation table a
    * curation pipeline consults to pick its dedup aggressiveness: one
    * standing pair table instead of one quadratic mine per candidate
    * threshold per run.
    *
    * Scale: everything after the artifact scan is pair-population-scale
    * × a constant threshold count; the distinct counts are two-phase
    * hash aggregates. Thresholds that catch nothing still appear,
    * zero-filled, via the left join from the constant threshold
    * relation — a sweep table with silently missing rows would misread
    * as "no data" rather than "no dups".
    */
  def dedupSweep(
      docs: DataFrame,
      thresholds: Seq[Double] = Seq(0.3, 0.5, 0.7, 0.8, 0.9)): DataFrame = {
    require(thresholds.nonEmpty, "dedupSweep needs at least one threshold")
    import docs.sparkSession.implicits._
    // The pair relation at the sweep's LOWEST cut is the shared Derived
    // truth artifact (round 19) — pairs below thresholds.min fail every
    // sweep filter, so restricting to the ≥ min artifact before the
    // explode is an identity, and the quadratic shingle self-join stops
    // re-running inside every sweep rep. In-memory inputs keep the
    // inline single-pass plan (the materialized fallback).
    val pairs = ngramJaccard(docs, thresholds.min)
    val swept = Caches.track(
      pairs
        .select(col("doc_a"), col("doc_b"), col("jaccard"),
          explode(array(thresholds.map(lit(_)): _*)).as("threshold"))
        .filter(col("jaccard") >= col("threshold")))
    val pairStats = swept.groupBy(col("threshold"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("doc_b")).as("n_dropped"))
    val members = swept
      .select(col("threshold"),
        explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .groupBy(col("threshold"))
      .agg(countDistinct(col("doc_id")).as("n_docs_affected"))
    thresholds.toDF("threshold")
      .join(pairStats, Seq("threshold"), "left")
      .join(members, Seq("threshold"), "left")
      .na.fill(0L, Seq("n_pairs", "n_dropped", "n_docs_affected"))
  }

  def dedupSweep(s: SparkSession, dir: String): DataFrame =
    dedupSweep(Tables.documents(s, dir))

  /** LSH candidate pairs + true-Jaccard verification (the scale path).
    * Docs land in the same bucket when one full band of `rowsPerBand`
    * consecutive minhashes matches; candidates are verified with exact
    * Jaccard and filtered at `threshold`. With 4 bands × 2 rows, a pair at
    * Jaccard 0.8 is caught with prob 1-(1-0.8^2)^4 ≈ 0.98.
    *
    * minhash_i = lexicographic min over shingles of a 32-bit slice of
    * md5("g:shingle"), g = i/4 — md5s sliced into 8 fixed-width hex
    * hashes (fixed width ⇒ string min ≡ numeric min; portable to any
    * engine with md5). Signatures are per-row `array_min(transform(...))`
    * projections over the doc's shingle SET — embarrassingly parallel,
    * zero shuffle, no k-way row explosion. Band keys derive columnar
    * from the signature row.
    *
    * Verification joins the (small) candidate set against per-doc shingle
    * SETS and computes `array_intersect` per pair — no second pass over
    * the full (doc, shingle) relation, no big-side shuffle. At scale the
    * candidate side is the skew risk, not the corpus side; per-pair cost
    * is bounded by document length.
    */
  /** (doc_id [, carry...], band, bkey) LSH band keys from per-doc shingle
    * sets — every step a stateless per-row projection (minhashes are
    * array_min over the shingle array, band keys are md5 concats), so
    * this is safe on STREAMING frames too. `carry` columns ride through
    * the band explode for callers that cannot join them back afterwards
    * (a stream cannot self-join); batch callers pass none and keep rows
    * narrow.
    */
  private[graft] def bandKeys(
      shSets: DataFrame,
      bands: Int, rowsPerBand: Int,
      carry: Seq[String] = Nil): DataFrame = {
    require(bands * rowsPerBand <= 8, "8 minhash slices available (2 md5s x 4)")
    val k = bands * rowsPerBand
    // two md5 arrays materialized once per doc in their own projection
    // (a non-cheap alias consumed 4x is not inlined by CollapseProject),
    // then 8 slice-mins read them without recomputing any hash
    val hashed = shSets.select(
      (col("doc_id") +: carry.map(col)) :+
        transform(col("shs"), sh => md5(concat(lit("0:"), sh))).as("h0") :+
        transform(col("shs"), sh => md5(concat(lit("1:"), sh))).as("h1"): _*)
    val mhCols = (0 until k).map { i =>
      array_min(transform(col(s"h${i / 4}"), h =>
        substring(h, 1 + 8 * (i % 4), 8))).as(s"mh$i")
    }
    val sig = hashed.select((col("doc_id") +: carry.map(col)) ++ mhCols: _*)
    val bandStructs = (0 until bands).map { b =>
      struct(
        lit(b.toLong).as("band"),
        md5(concat_ws("|",
          (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*)).as("bkey"))
    }
    sig
      .select((col("doc_id") +: carry.map(col)) :+
        explode(array(bandStructs: _*)).as("bk"): _*)
      .select((col("doc_id") +: carry.map(col)) :+
        col("bk.band").as("band") :+ col("bk.bkey").as("bkey"): _*)
  }

  /** The verified near-dup pair relation as a SHARED derived artifact
    * (the round-16 co-purchase treatment applied to the LSH family):
    * q22's output feeds q56's components, q195's election, q196's spans,
    * q255's assortativity, q286's survivor mixture, and q292's two
    * superstep families — identical deterministic pairs every time, so
    * the chain is materialized once per (input generation, banding,
    * threshold) through [[graft.Derived]] and every consumer scans the
    * build. At 100 TB this is the nightly dup-pairs dataset a curation
    * pipeline shares across its passes, not six re-minings of the
    * corpus. In-memory inputs (unit tests, streaming batches) have no
    * content fingerprint and run [[minhashLshInline]] directly; the
    * inline chain also carries the plan pins (PlanShapeSpec asserts the
    * BUILD plan's shape there, since the consumer-side plan is a scan).
    */
  def minhashLsh(
      docs: DataFrame,
      bands: Int, rowsPerBand: Int,
      threshold: Double): DataFrame =
    graft.Derived.materialized(docs.sparkSession,
      s"lsh_pairs_b${bands}r${rowsPerBand}_t${graft.Derived.paramKey(threshold)}",
      Seq(docs)) {
      // round 18: when artifacts exist at all (file-backed inputs), the
      // FULL pair artifact builds by the q295 decomposition — standing
      // corpus95 pairs ∪ delta-internal ∪ verified cross — reusing the
      // corpus95 pair and band-key artifacts the incremental operators
      // build anyway. LSH membership is pair-local, so the union is the
      // full mine row for row (q295's oracle is q22's full-recompute SQL
      // verbatim and hash-matches); the sweep stops paying one full mine
      // AND a 95% re-mine per generation. In-memory inputs (unit tests,
      // streaming batches) keep the single-pass inline plan — for them
      // the decomposition's nested fallbacks would all run inline anyway.
      if (graft.Derived.fingerprints(docs.sparkSession, Seq(docs)).isDefined)
        deltaPairUpdate(docs, bands, rowsPerBand, threshold)
      else minhashLshInline(docs, bands, rowsPerBand, threshold)
    }

  private[graft] def minhashLshInline(
      docs: DataFrame,
      bands: Int, rowsPerBand: Int,
      threshold: Double): DataFrame =
    minhashLshFromSets(Caches.track(docShingleSets(docs)),
      bands, rowsPerBand, threshold)

  /** The band self-join + verification over an ALREADY-CACHED shingle-set
    * relation — the seam that lets deltaPairUpdate mine the delta tier
    * with the shingle cache it already holds instead of building a second
    * identical cache (two InMemoryRelations over the same 5% explode).
    */
  private def minhashLshFromSets(
      shSets: DataFrame,
      bands: Int, rowsPerBand: Int,
      threshold: Double): DataFrame = {
    val keys = bandKeys(shSets, bands, rowsPerBand)
    // shuffle_hash everywhere below: every frame derives from the cached
    // shingle pipeline, and a planner-chosen broadcast would execute that
    // pipeline single-threaded in the broadcast-build thread (see
    // ngramJaccard). Shuffled hash joins keep every stage parallel; AQE
    // may still convert to broadcast after the parallel shuffle ran.
    // candidate pairs feed three consumers (two semi-joins + the pair
    // join); persist so the band self-join runs once (caller-released)
    val cands = Caches.track(keys.as("a").hint("shuffle_hash")
      .join(keys.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct())
    verifyCandidates(shSets, cands, threshold)
  }

  /** True-Jaccard verification of an LSH candidate pair set — the tail of
    * `minhashLsh`, factored out so `lshRecallAudit` can verify a
    * candidate frame it already computed instead of paying the band
    * self-join twice.
    *
    * Left-semi-restrict the WIDE shingle-set relation to candidate ids
    * BEFORE the pair joins (the embeddingNearDup pattern): only candidate
    * rows — typically a tiny fraction of the corpus — carry their shingle
    * arrays into the verification exchanges, instead of shuffling every
    * doc's array twice. These two joins intentionally carry NO
    * shuffle_hash hint (unlike everything else here): their build side
    * is a cheap id projection of the PERSISTED cands — materialized by
    * the pair join below, not recomputed — so a planner-chosen broadcast
    * is the scale-correct plan: it leaves the wide shingle side entirely
    * unshuffled.
    */
  private def verifyCandidates(
      shSets: DataFrame, cands: DataFrame, threshold: Double): DataFrame = {
    val setsA = shSets
      .join(cands.select(col("doc_a").as("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("doc_a"), col("shs").as("sh_a"), col("n_sh").as("n_a"))
    val setsB = shSets
      .join(cands.select(col("doc_b").as("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("doc_b"), col("shs").as("sh_b"), col("n_sh").as("n_b"))
    cands.hint("shuffle_hash")
      .join(setsA.hint("shuffle_hash"), "doc_a")
      .join(setsB.hint("shuffle_hash"), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  def minhashLsh(
      s: SparkSession, dir: String,
      bands: Int = 4, rowsPerBand: Int = 2,
      threshold: Double = 0.8): DataFrame =
    minhashLsh(Tables.documents(s, dir), bands, rowsPerBand, threshold)

  /** 32-bit SimHash signature per document from distinct words: bit j is
    * the sign of the weighted vote where each word contributes ±1 from bit
    * j of (the first 8 hex chars of) its md5. Emitted as a 32-char bit
    * string, MSB (j=0) first — portable across engines.
    *
    * Each word's md5 prefix is parsed ONCE into a 32-bit integer, and the
    * 32 per-bit votes are 32 parallel `sum` aggregates in a single hash
    * aggregate — no 32× row explosion, one shuffle keyed by doc_id, and
    * map-side partial aggregation reduces each partition to one row per
    * doc before it moves. (Bit j of the big-endian 32-bit prefix == the
    * reference nibble formula `(nibble(j/4) >> (3-j%4)) & 1`.)
    */
  def simhash(docs: DataFrame): DataFrame = {
    val wordsDf = docs
      // spread the ~50× word explosion (see docShingleSets; explicit N)
      .repartition(shuffleWidth(docs), col("doc_id"))
      .select(col("doc_id"),
        explode(array_distinct(Text.words(col("text")))).as("w"))
      .select(col("doc_id"),
        conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long").as("n"))
    val voteCols = (0 until 32).map { j =>
      sum(shiftright(col("n"), 31 - j).bitwiseAND(1) * 2 - 1).as(s"v$j")
    }
    wordsDf.groupBy(col("doc_id")).agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"),
        concat((0 until 32).map(j =>
          when(col(s"v$j") >= 0, "1").otherwise("0")): _*).as("simhash"))
  }

  def simhash(s: SparkSession, dir: String): DataFrame =
    simhash(Tables.documents(s, dir))

  /** Embedding-cosine near-duplicate DOCUMENTS: semantic dedup, the layer
    * that catches paraphrases n-gram methods miss. Candidate pairs come
    * from hyperplane-LSH buckets over the embedding column (the scale
    * path — never all-pairs), verified with exact cosine >= threshold,
    * then restricted to ids present in the document corpus (left-semi
    * joins: nothing from the corpus is shuffled wide) and annotated with
    * the dedup verdict (keeper = least id).
    */
  def embeddingNearDup(docs: DataFrame, emb: DataFrame,
                       nPlanes: Int, threshold: Double, dims: Int): DataFrame = {
    val ids = docs.select(col("doc_id"))
    Similarity.nearDupLsh(emb, nPlanes, threshold, dims)
      .join(ids.select(col("doc_id").as("vec_a")), Seq("vec_a"), "left_semi")
      .join(ids.select(col("doc_id").as("vec_b")), Seq("vec_b"), "left_semi")
      .select(
        col("vec_a").as("doc_a"), col("vec_b").as("doc_b"), col("cosine"),
        least(col("vec_a"), col("vec_b")).as("keeper"))
  }

  def embeddingNearDup(s: SparkSession, dir: String): DataFrame =
    embeddingNearDup(Tables.documents(s, dir), Tables.embeddings(s, dir),
      nPlanes = 8, threshold = 0.4, dims = 64)

  /** Benchmark-contamination check: for every TEST-split document, how
    * many of its word-3-grams also occur anywhere in the TRAIN split —
    * the decontamination pass every serious training pipeline runs before
    * evaluation. Splits come from the deterministic hash bucket
    * (Corpus.splitAssign semantics), computed INLINE on the shingle rows:
    * a pure function of doc_id, so no join against a split table at all.
    *
    * Scale: the train side collapses to DISTINCT shingles (hash-agg,
    * map-side combined); the test side left-semi-joins it keyed by
    * shingle — high-cardinality key, balanced partitions, and the
    * left-semi means train shingles are never duplicated per match.
    *
    * Round-9 A/B note: two alternatives were measured at sf0.1 and both
    * lost to this shape — dropping the train-side distinct (1.37 s best
    * vs 1.16 s; the map-side combine pays for itself), and an asymmetric
    * broadcast screen (distinct TEST shingles broadcast into a map-side
    * semi over the train scan, intersection broadcast back — 1.47 s
    * best: two extra stage barriers dominate at this scale). The
    * broadcast shape remains the right rewrite if an eval set is ever
    * tiny relative to a corpus too large to shuffle, but at any scale
    * where the train shingle exchange fits the cluster, this pinned
    * plan's single symmetric semi-join is both simpler and faster.
    */
  def contamination(docs: DataFrame): DataFrame = {
    val tagged = Caches.track(docShingles(docs)
      .withColumn("bucket", Corpus.hashBucket(col("doc_id"))))
    val trainSh = tagged.filter(col("bucket") < 80).select(col("sh")).distinct()
    val testSh = tagged.filter(col("bucket") >= 90).select(col("doc_id"), col("sh"))
    val totals = testSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val hits = testSh.hint("shuffle_hash")
      .join(trainSh.hint("shuffle_hash"), Seq("sh"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contam"))
    totals.join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_sh"),
        coalesce(col("n_contam"), lit(0L)).as("n_contam"),
        (coalesce(col("n_contam"), lit(0L)).cast("double") / col("n_sh"))
          .as("contam_ratio"))
  }

  def contamination(s: SparkSession, dir: String): DataFrame =
    contamination(Tables.documents(s, dir))

  /** Connected components over the MinHash-LSH near-duplicate graph:
    * groups transitive duplicate chains (A~B, B~C ⇒ {A,B,C}) into
    * clusters labelled by their least doc_id — the final "keep one per
    * cluster" step of corpus dedup, where pairwise verdicts alone would
    * keep both ends of a chain.
    *
    * Algorithm: iterative min-label propagation (each doc takes the min
    * of its own label and its neighbours' labels) to a fixpoint — the
    * standard Spark formulation of small-diameter connected components.
    * Duplicate clusters have tiny diameters (they are near-cliques: every
    * member shares most shingles), so convergence takes a handful of
    * supersteps; the driver loop moves no row data, only the converged
    * flag. Each superstep is one edge-keyed join + one hash-agg, both on
    * the (tiny relative to corpus) duplicate-pair graph, not the corpus.
    */
  def dupClusters(
      docs: DataFrame,
      bands: Int, rowsPerBand: Int,
      threshold: Double,
      maxIters: Int = 20): DataFrame =
    // shared derived artifact (round-19, the lsh_pairs/round-16 pattern):
    // the component superstep loop over the verified pair graph is
    // re-run identically by q56 (the membership itself), q195's
    // canonical election, q227's size histogram and q286's dedup-adjusted
    // mixture — one build per (input generation, parameters), every
    // consumer scans the (doc_id, cluster) labelling, which is exactly
    // the standing table a production dedup pipeline maintains anyway.
    // In-memory inputs (unit tests, streaming batches) keep the inline
    // superstep plan via the Derived fingerprint fallback.
    graft.Derived.materialized(docs.sparkSession,
      s"dup_clusters_b${bands}r${rowsPerBand}_t${graft.Derived.paramKey(threshold)}_i$maxIters",
      Seq(docs)) {
      dupClustersFromPairs(
        minhashLsh(docs, bands, rowsPerBand, threshold)
          .select(col("doc_a"), col("doc_b")),
        shuffleWidth(docs), maxIters)
    }

  /** The superstep component loop on an ALREADY-BUILT verified pair
    * relation — factored out so q292 can share one LSH chain between
    * the membership and the authority passes. */
  private[operators] def dupClustersFromPairs(
      pairs: DataFrame, maxWidth: Int, maxIters: Int = 20): DataFrame = {
    val rawEdges = pairs
      .unionAll(pairs.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
      .persist()
    // size superstep shuffles to the GRAPH, not the corpus: the dup graph
    // is corpus-size × dup-rate, often orders of magnitude smaller, and
    // each superstep pays per-partition scheduling overhead — one
    // partition per ~500k edges, capped at the session width. When the
    // pair relation is a Derived parquet artifact (every qNN consumer),
    // the count reads footers driver-side — no eager Spark job at plan
    // construction; in-memory pairs (unit tests) keep the count action.
    // A filtered file-backed view would over-count, which only
    // over-widens and, for the emptiness shortcut below, costs at most
    // one no-op superstep before the fixpoint test converges.
    val edgeCount = graft.Derived.parquetRowCount(pairs).map(2L * _)
      .getOrElse(rawEdges.count())
    val width = math.max(1L,
      math.min(maxWidth.toLong, edgeCount / 500000L + 1L)).toInt
    // edges are the static probe side of every superstep's join: hash-
    // partition by dst ONCE before caching so the cached partitioning
    // satisfies each iteration's join and only the label side moves
    val edges = rawEdges.repartition(width, col("dst")).persist()
    // Labels are LINEAGE-TRUNCATED each superstep (Checkpoints.truncate:
    // localCheckpoint, or reliable checkpoint() on a durable dir when
    // spark.graft.checkpointDir is set — executor loss mid-superstep
    // cannot kill the job on a real cluster), not
    // persist/unpersist-chained: unpersisting an iteration's cache entry
    // cascades through the CacheManager and silently rebuilds every
    // dependent cached plan from raw lineage — i.e. re-runs the whole LSH
    // chain per superstep. Truncation also keeps the plan size O(1) in
    // the iteration count instead of growing a join per superstep.
    // initial labels fold the first propagation step into the label
    // construction itself (label = min(self, direct neighbours)) — for
    // clique-shaped clusters (the common case: near-dups share most
    // shingles, so most pairs are direct edges) this converges in ONE
    // verification superstep
    var labels = edges.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("cluster"))
      .withColumnRenamed("src", "doc_id")
      .transform(graft.Checkpoints.truncate(_))
    // Convergence: labels are min-monotone (each superstep can only lower
    // them), so the fixpoint is reached exactly when the label SUM stops
    // decreasing — one scalar per superstep, no compare-join. One
    // superstep = one edge join + one min-aggregate.
    var prevSum: java.math.BigDecimal = null
    // an empty dup graph is already at its (empty) fixpoint — the sum
    // probe would return NULL forever and never satisfy the equality test,
    // so skip the loop outright instead of burning maxIters no-op jobs
    var converged = edgeCount == 0L
    var iter = 0
    while (!converged && iter < maxIters) {
      val propagated = edges
        .join(labels.select(col("doc_id").as("dst"), col("cluster")), "dst")
        .select(col("src").as("doc_id"), col("cluster"))
      // lazy checkpoint: the convergence aggregate right below is the one
      // action that materializes it — one job per superstep, not two
      val next = labels.unionAll(propagated)
        .groupBy(col("doc_id")).agg(min(col("cluster")).as("cluster"))
        .transform(graft.Checkpoints.truncate(_, eager = false))
      val s = next.agg(sum(col("cluster").cast("decimal(38,0)")).as("s"))
        .head().getDecimal(0)
      labels = next
      // s == null means ZERO labels: an empty fixpoint, converged by
      // definition. This arm matters when the footer-based edgeCount
      // over-counted a filtered file-backed view down to emptiness —
      // without it the NULL sum never equals anything and the loop
      // burns maxIters before throwing.
      converged = s == null || (prevSum != null && s.compareTo(prevSum) == 0)
      prevSum = s
      iter += 1
    }
    edges.unpersist()
    rawEdges.unpersist()
    // labels at iter == maxIters without a detected fixpoint are NOT the
    // transitive closure — a path-shaped dup chain of diameter > maxIters
    // would still carry intermediate labels. Cluster membership decides
    // which documents get DELETED downstream, so fail loudly rather than
    // return silently-partial components.
    if (!converged) throw new IllegalStateException(
      s"dupClusters did not converge within $maxIters supersteps; the dup " +
        "graph has a component of diameter > maxIters (not clique-shaped " +
        "near-dups) — raise maxIters or lower the pairing threshold")
    labels
  }

  def dupClusters(s: SparkSession, dir: String): DataFrame =
    dupClusters(Tables.documents(s, dir), bands = 4, rowsPerBand = 2, threshold = 0.8)

  /** Boilerplate mass per document (the C4/RefinedWeb "repeated passage"
    * quality signal): the fraction of a document's distinct word-5-grams
    * that also occur in ≥ `minDocs` documents of the SAME source — nav
    * bars, license footers, and template text repeat across a crawl
    * source, while genuine prose does not. Dedup removes whole duplicate
    * documents; this finds duplicated REGIONS inside otherwise-unique
    * documents, the part of curation dedup alone can't do.
    *
    * Scale: one explode feeds one map-side-combined hash agg keyed by
    * (source, shingle) — each doc contributes a shingle at most once
    * (distinct within doc), so `count(*)` IS the distinct-doc count and
    * no expensive count-distinct state is needed. Documents with fewer
    * than `k` words have no k-shingles and are DROPPED from the output
    * (no n_sh=0 row) — same contract as the other shingle operators;
    * callers wanting full-corpus coverage left-join this result back to
    * the doc table. The common-shingle set
    * (tiny: only shingles crossing the threshold) joins back against the
    * per-doc shingles keyed by the same high-cardinality key, left-semi
    * so common shingles are never duplicated per match. Shingles travel
    * as md5 digests, not raw 5-gram strings, so shuffle rows stay fixed
    * width.
    */
  def boilerplate(docs: DataFrame, k: Int = 5, minDocs: Int = 5): DataFrame = {
    val sh = Caches.track(docs
      .repartition(shuffleWidth(docs), col("doc_id"))
      .select(col("doc_id"), col("source"), Text.words(col("text")).as("w"))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"), col("source"),
        explode_outer(Text.shingles(col("w"), k)).as("sh"))
      .select(col("doc_id"), col("source"), md5(col("sh")).as("sh")))
    val common = sh
      .groupBy(col("source"), col("sh"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("source"), col("sh"))
    val totals = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val boiler = sh.hint("shuffle_hash")
      .join(common.hint("shuffle_hash"), Seq("source", "sh"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_boiler"))
    totals.join(boiler, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_sh"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        (coalesce(col("n_boiler"), lit(0L)).cast("double") / col("n_sh"))
          .as("boiler_ratio"))
  }

  def boilerplate(s: SparkSession, dir: String): DataFrame =
    boilerplate(Tables.documents(s, dir))

  /** Bloom-filter shingle screen with MEASURED false positives — the
    * O(1)-per-probe fast path in front of exact decontamination (q55,
    * same 80/90 split and word-3-gram shingles): every train shingle
    * inserts `k` md5-derived bit positions into an `m`-bit filter; a
    * test shingle "passes" when all `k` of its positions are occupied.
    * Exactly representable everywhere: the filter IS the distinct
    * train-position relation, and the bit test is a join + count(=k).
    * Per test document the output carries the bloom verdict (n_pass)
    * NEXT TO the exact left-semi truth (n_exact), so n_false_pos
    * measures the empirical FP rate of the (m, k) design on real data —
    * the number q55's exact join would pay to verify. Position and
    * digest keys are high-cardinality md5 values; the position relation
    * is ≤ k·|train shingles| longs, the thing a real deployment ships
    * as a bitmap broadcast.
    */
  def bloomScreen(docs: DataFrame, mBits: Long = 1L << 18, k: Int = 3): DataFrame = {
    def pos(j: Int) =
      conv(substring(md5(concat(lit(s"$j|"), col("sh"))), 1, 12), 16, 10)
        .cast("long") % mBits
    val tagged = Caches.track(docShingles(docs)
      .withColumn("bucket", Corpus.hashBucket(col("doc_id"))))
    val trainPos = tagged.filter(col("bucket") < 80).select(col("sh")).distinct()
      .select(explode(array((0 until k).map(pos): _*)).as("p")).distinct()
    val testSh = Caches.track(
      tagged.filter(col("bucket") >= 90).select(col("doc_id"), col("sh")))
    val passed = testSh
      .select(col("doc_id"), col("sh"), explode(array((0 until k).map(pos): _*)).as("p"))
      .hint("shuffle_hash").join(trainPos.hint("shuffle_hash"), "p")
      .groupBy(col("doc_id"), col("sh")).agg(count(lit(1)).as("hits"))
      .filter(col("hits") === k)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_pass"))
    val exact = testSh
      .join(tagged.filter(col("bucket") < 80).select(col("sh")).distinct(),
        Seq("sh"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_exact"))
    testSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      .join(passed, Seq("doc_id"), "left")
      .join(exact, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_pass"), lit(0L)).as("n_pass"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        (coalesce(col("n_pass"), lit(0L)) - coalesce(col("n_exact"), lit(0L)))
          .as("n_false_pos"))
  }

  def bloomScreen(s: SparkSession, dir: String): DataFrame =
    bloomScreen(Tables.documents(s, dir))

  /** Pairwise shingle-set Jaccard BETWEEN sources: how much of each
    * crawl/source's content overlaps each other source — the
    * corpus-composition view of dedup (is "web2" a mirror of "web"?
    * does the books source leak into the crawl?), where doc-level dedup
    * only answers the per-pair question.
    *
    * Scale: the only corpus-sized work is one distinct over (source,
    * shingle-digest) — map-side combined, high-cardinality key. Pair
    * enumeration then collapses the relation to ONE ROW PER SHINGLE
    * first (collect_set of its sources — state bounded by the source
    * count, tens), and explodes the (sources choose 2) pairs from that
    * array: the same pairs a shingle-keyed self-join would emit, minus
    * the second full shuffle of the relation and the join build. The
    * explode feeds a map-side-combined pair count, so the only rows that
    * ever move are (shingle, source-array) once and the tiny pair
    * partials. The final cross join runs on the per-source size table
    * (tens of rows). Shingles travel as md5 digests (fixed width);
    * counts are digest-set counts, identical to raw-shingle counts.
    */
  def sourceOverlap(docs: DataFrame, k: Int = 3): DataFrame = {
    val ss = Caches.track(docs
      // same hazard as docShingleSets: the source may arrive in few
      // partitions and shingling multiplies rows ~50x — spread first
      .repartition(shuffleWidth(docs), col("doc_id"))
      .select(col("source"), Text.words(col("text")).as("w"))
      .filter(size(col("w")) >= k)
      .select(col("source"), explode_outer(Text.shingles(col("w"), k)).as("sh"))
      .select(col("source"), md5(col("sh")).as("sh"))
      .distinct())
    val sizes = ss.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
    val inter = ss
      .groupBy(col("sh")).agg(collect_set(col("source")).as("srcs"))
      .filter(size(col("srcs")) >= 2)
      .select(explode(col("srcs")).as("source_a"), col("srcs"))
      .select(col("source_a"), explode(col("srcs")).as("source_b"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_common"))
    sizes.select(col("source").as("source_a"), col("n_sh").as("n_a"))
      .crossJoin(sizes.select(col("source").as("source_b"), col("n_sh").as("n_b")))
      .filter(col("source_a") < col("source_b"))
      .join(inter, Seq("source_a", "source_b"), "left")
      .select(
        col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        (coalesce(col("n_common"), lit(0L)).cast("double") /
          (col("n_a") + col("n_b") - coalesce(col("n_common"), lit(0L))))
          .as("jaccard"))
  }

  def sourceOverlap(s: SparkSession, dir: String): DataFrame =
    sourceOverlap(Tables.documents(s, dir))

  /** Per-document n-gram novelty against everything "earlier" in the
    * corpus: the fraction of a doc's word-3-gram shingles whose FIRST
    * occurrence (min doc_id) is in a strictly earlier document. This is
    * the incremental-crawl dedup signal — "how much of this page have we
    * already ingested?" — scored per doc instead of per pair, so it never
    * enumerates pairs at all.
    *
    * Scale shape: shingles are md5-digested (fixed 32-byte shuffle keys
    * instead of arbitrary-length text), the first-seen table is ONE
    * map-side-combined min() aggregate on the shingle key, and the join
    * back to the per-doc shingle rows reuses that same key, so the agg
    * output and the probe side are co-partitioned — one logical shuffle
    * of the shingle stream, then a per-doc count agg. Docs under 3 words
    * have no shingles and carry no row (same contract as q21/q55).
    */
  def ngramNovelty(docs: DataFrame): DataFrame = {
    val sh = docShingles(docs).select(col("doc_id"), md5(col("sh")).as("sh"))
    val first = sh.groupBy(col("sh")).agg(min(col("doc_id")).as("first_doc"))
    sh.join(first, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_sh"),
        sum(when(col("first_doc") < col("doc_id"), 1L).otherwise(0L)).as("n_prior"))
      .withColumn("novelty",
        lit(1.0) - col("n_prior").cast("double") / col("n_sh"))
  }

  def ngramNovelty(s: SparkSession, dir: String): DataFrame =
    ngramNovelty(Tables.documents(s, dir))

  /** Blocked fuzzy entity matching (record linkage): candidate merge
    * pairs among distinct entity names within edit distance `maxDist`,
    * with per-name record counts so a merge's blast radius is visible.
    *
    * The scale discipline is the order of operations: (1) collapse rows
    * to DISTINCT names first — one hash agg turns N records into the
    * (orders-of-magnitude smaller) entity vocabulary, so the quadratic
    * step never sees row counts; (2) block by a cheap deterministic key
    * (the name's last token) so the self-join is quadratic only within a
    * block, never across the vocabulary; (3) `levenshtein` — a codegen'd
    * built-in, not a UDF — runs only on pairs that survive both. Skewed
    * blocks are the operator's known hazard; the block key is the knob
    * (swap in a (token, length-band) composite to split a hot block).
    */
  def fuzzyNameMatch(part: DataFrame, maxDist: Int = 3): DataFrame = {
    val names = part.groupBy(col("p_name")).agg(count(lit(1)).as("n_rows"))
      .withColumn("blk", element_at(split(col("p_name"), " "), -1))
    val a = names.select(col("blk"), col("p_name").as("name_a"), col("n_rows").as("n_a"))
    val b = names.select(col("blk"), col("p_name").as("name_b"), col("n_rows").as("n_b"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"), col("n_a"), col("n_b"))
  }

  def fuzzyNameMatch(s: SparkSession, dir: String): DataFrame =
    fuzzyNameMatch(Tables.part(s, dir))

  /** EXACT set-similarity join by prefix filtering (the AllPairs/PPJoin
    * family): every pair with true shingle Jaccard ≥ `threshold`, with
    * certainty — unlike MinHash-LSH (q22), whose banding can miss pairs.
    * The filter is the classic prefix property: order each doc's
    * shingles by a canonical global order (ascending document frequency,
    * rarest first), take the first |s| − ceil(t·|s|) + 1 of them; any
    * qualifying pair MUST share a token inside both prefixes (a pair
    * sharing none has intersection ≤ ceil(t·|s|) − 1 < the t·|s| the
    * threshold forces), so joining prefix rows to prefix rows loses
    * nothing.
    *
    * Scale shape: the self-join runs on the PREFIX relation — a
    * (1−t)-fraction of the shingle stream concentrated on RARE tokens,
    * so per-token collision lists are short where frequency is high and
    * the quadratic never touches hot tokens' full posting lists.
    * Candidates are distinct pairs semi-verified by one co-partitioned
    * intersection count. LSH stays the cheaper probabilistic path; this
    * is the recall-guaranteed one — both in the library, the threshold
    * decides which a pipeline uses.
    */
  /** The rarity-ranked shingle stream (doc_id, sh, rn, n_sh): every
    * token's global-rarity rank within its doc — df from a
    * count-over-partition window (one exchange of the shingle stream
    * instead of agg+join-back), rn from the per-doc rarity window.
    * THRESHOLD-INDEPENDENT, so the two exact-similarity joins (q105
    * prefix at 0.8, q112 containment at 0.9) share ONE build through
    * [[graft.Derived]] (the lsh_cands convention): each query then pays
    * its prefix filter as a scan predicate instead of re-running both
    * corpus-scale window passes. Skew note: a boilerplate shingle
    * concentrates its rows in one window partition exactly as it would
    * concentrate in the join's probe partition — neither variant dodges
    * hot keys; at 100 TB both want the boilerplate operator (q74) run
    * first to strip mass-repeated shingles. In-memory inputs fall back
    * to the inline chain.
    */
  private def rarityRanked(docs: DataFrame, sets: DataFrame): DataFrame =
    graft.Derived.materialized(docs.sparkSession,
      "shingle_rarity_ranks", Seq(docs)) {
      // the caller's already-tracked shingle-set cache feeds the build
      // (round-18 ADVICE): the inline fallback for in-memory inputs no
      // longer re-pays the shingle explode, and a file-backed build
      // reads through the same cache — identical values either way
      val sh = sets.select(col("doc_id"), col("n_sh"),
        explode_outer(col("shs")).as("sh"))
      val byRarity = Window.partitionBy(col("doc_id"))
        .orderBy(col("df"), col("sh"))
      sh.withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh"))))
        .withColumn("rn", row_number().over(byRarity))
        .select(col("doc_id"), col("sh"), col("rn"), col("n_sh"))
    }

  def prefixSimJoin(docs: DataFrame, threshold: Double): DataFrame = {
    val sets = Caches.track(docShingleSets(docs))
    // n_sh rides along through the explode, so the prefix filter needs
    // no per-doc counts join at all.
    // persisted: both sides of the self-join read the SAME materialized
    // prefix relation — without this the rank chain (or artifact scan +
    // filter) is paid twice, once per join side
    val prefix = Caches.track(rarityRanked(docs, sets)
      // ceil guard: t*n for integral products (0.8 is not binary-exact)
      // can land a hair ABOVE the integer and ceil one too high,
      // shortening the prefix below the safe bound — shave an epsilon
      // so the error can only LENGTHEN the prefix (more candidates,
      // never a lost pair)
      .filter(col("rn") <=
        col("n_sh") - ceil(lit(threshold) * col("n_sh") - lit(1e-6)) + 1)
      .select(col("doc_id"), col("sh"), col("rn"), col("n_sh")))
    // the join carries two further EXACT pruning rules from the PPJoin
    // family (false positives are fine — verification kills them — but
    // neither rule can drop a qualifying pair, so the epsilon slack on
    // the float boundaries errs toward keeping):
    //  - length filter: J >= t forces min(n_a,n_b) >= t * max(n_a,n_b)
    //  - positional filter: a qualifying pair's EARLIEST shared token
    //    (in the global rarity order) sits inside both prefixes and has
    //    no shared token before it, so 1 + min(tokens remaining after
    //    it) bounds the true intersection from above; a pair none of
    //    whose join rows meets the required t/(1+t)*(n_a+n_b) overlap
    //    cannot qualify
    val eps = 1e-9
    val need =
      lit(threshold / (1 + threshold)) * (col("a.n_sh") + col("b.n_sh")) - eps
    val candidates = prefix.as("a").hint("shuffle_hash")
      .join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          col("a.n_sh") >= lit(threshold) * col("b.n_sh") - eps &&
          col("b.n_sh") >= lit(threshold) * col("a.n_sh") - eps &&
          lit(1) + least(col("a.n_sh") - col("a.rn"),
            col("b.n_sh") - col("b.rn")) >= need)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // verification by set intersection on the (already materialized)
    // per-doc shingle ARRAYS: each candidate pair is checked in a single
    // projection — no (pair × shingle) row explosion, no re-shuffle of
    // the full shingle stream per pair (that path cost 3× the rest of
    // the query combined)
    candidates
      .join(sets.select(col("doc_id").as("doc_a"),
        col("shs").as("shs_a"), col("n_sh").as("n_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"),
        col("shs").as("shs_b"), col("n_sh").as("n_b")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("shs_a"), col("shs_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  def prefixSimJoin(s: SparkSession, dir: String): DataFrame =
    prefixSimJoin(Tables.documents(s, dir), threshold = 0.8)

  /** Directional containment join: pairs where at least `threshold` of
    * doc_a's shingles also appear in doc_b — the quote/subset detector
    * (Jaccard misses a short doc embedded in a long one: the union term
    * drowns it). Exact, like q105, and by the same prefix argument
    * applied one-sidedly: containment ≥ t forces |A∩B| ≥ ceil(t·|A|),
    * so if A shares NO token of its |A| − ceil(t·|A|) + 1 rarest with
    * B, the remaining overlap is ≤ ceil(t·|A|) − 1 — too small. Only
    * the CONTAINED side gets a prefix (the container legitimately has
    * arbitrary size), so candidates come from A-prefix × full shingle
    * stream — the rare-token concentration keeps the hot posting lists
    * out of the join. Verification is one array_intersect per candidate
    * against the materialized shingle sets. Both directions emit
    * independently (a ≈ b yields two rows); self-pairs never form.
    */
  def containmentJoin(docs: DataFrame, threshold: Double): DataFrame = {
    val sets = Caches.track(docShingleSets(docs))
    // every token's global rarity rank within its doc — the shared
    // rarity-rank artifact (see rarityRanked): the contained side
    // filters it to a prefix, the container side keeps all tokens but
    // uses the rank in the positional bound below
    val ranked = Caches.track(rarityRanked(docs, sets))
    val prefix = ranked
      // ceil guard: t*n for integral products (0.8 is not binary-exact)
      // can land a hair ABOVE the integer and ceil one too high,
      // shortening the prefix below the safe bound — shave an epsilon
      // so the error can only LENGTHEN the prefix (more candidates,
      // never a lost pair)
      .filter(col("rn") <=
        col("n_sh") - ceil(lit(threshold) * col("n_sh") - lit(1e-6)) + 1)
    // positional bound, both sides (exact — same earliest-shared-token
    // argument as q105: that token has no shared token before it in
    // EITHER doc, so 1 + min(tokens after it here, tokens after it
    // there) caps the true intersection; required mass is t·|A|):
    val need = lit(threshold) * col("a.n_sh") - lit(1e-9)
    val candidates = prefix.as("a").hint("shuffle_hash")
      .join(ranked.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") =!= col("b.doc_id") &&
          col("b.n_sh") >= need &&
          lit(1) + least(col("a.n_sh") - col("a.rn"),
            col("b.n_sh") - col("b.rn")) >= need)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    candidates
      .join(sets.select(col("doc_id").as("doc_a"),
        col("shs").as("shs_a"), col("n_sh").as("n_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("shs").as("shs_b")),
        Seq("doc_b"))
      .withColumn("containment",
        size(array_intersect(col("shs_a"), col("shs_b"))).cast("double") /
          col("n_a"))
      .filter(col("containment") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("containment"))
  }

  def containmentJoin(s: SparkSession, dir: String): DataFrame =
    containmentJoin(Tables.documents(s, dir), threshold = 0.9)

  /** Canonical-document selection: the "keep one per cluster" decision
    * that finishes a dedup pass. For every near-dup cluster (q56's
    * connected components over the MinHash-LSH graph), elect the member
    * with the most content — max n_chars, ties to the smallest doc_id —
    * as the cluster's representative, alongside the member count.
    *
    * Scale: the cluster relation is the dup GRAPH's vertex set — smaller
    * than the corpus, but it scales WITH the dup population (20–50% of a
    * 100 TB crawl), so it must never be forced to broadcast: billions of
    * member rows would blow past the broadcast ceiling and OOM the
    * driver in exactly the regime this operator targets. The n_chars
    * lookup is therefore a shuffle_hash-pinned equi-join on doc_id
    * (per-partition build maps in parallel; AQE may still locally
    * downgrade to broadcast when the membership happens to be tiny,
    * which is fine). The election itself is one hash aggregate over
    * cluster members using max-of-struct — (n_chars, -doc_id) under
    * struct ordering IS (n_chars desc, doc_id asc) — so no window, no
    * per-cluster sort, map-side combined.
    */
  def canonicalDocs(
      docs: DataFrame,
      bands: Int, rowsPerBand: Int,
      threshold: Double): DataFrame = {
    val members = dupClusters(docs, bands, rowsPerBand, threshold)
    docs.select(col("doc_id"), col("n_chars"))
      .join(members.hint("shuffle_hash"), Seq("doc_id"))
      .groupBy(col("cluster"))
      .agg(
        count(lit(1)).as("n_members"),
        max(struct(col("n_chars"), (-col("doc_id")).as("neg_id"))).as("best"))
      .select(col("cluster"), (-col("best.neg_id")).as("rep_doc"),
        col("best.n_chars").as("rep_chars"), col("n_members"))
  }

  def canonicalDocs(s: SparkSession, dir: String): DataFrame =
    canonicalDocs(Tables.documents(s, dir), bands = 4, rowsPerBand = 2, threshold = 0.8)

  /** Near-duplicate SPAN detection: for each verified near-dup pair
    * (q22's MinHash-LSH output), find the longest run of consecutive
    * shared word-3-grams and where it sits in both documents — the
    * n-gram approximation of suffix-array substring dedup, which tells a
    * curation pipeline WHAT to cut (the shared boilerplate span) rather
    * than only which documents overlap.
    *
    * Mechanics: positional (non-distinct) 3-grams per document; matches
    * between a pair align on the diagonal d = pos_a − pos_b (a shared
    * span advances both positions in lockstep, so its matches share one
    * diagonal); within each (pair, d) the classic gaps-and-islands
    * row_number difference groups consecutive positions into runs, and
    * the longest run wins (ties: smallest d, then smallest start).
    *
    * Scale: positional grams are computed ONLY for documents that appear
    * in some verified pair — a semi-join restricts the corpus scan
    * first, so the position relation is bounded by the dup set, never
    * the corpus. Both the dup-id set and the pair list scale with the
    * dup POPULATION (20–50% of a 100 TB crawl — billions of rows), so
    * neither is broadcast-hinted: the semi-join and the pair join are
    * shuffle_hash-pinned equi-joins (parallel per-partition builds; AQE
    * still downgrades to broadcast locally when a run's dup set is
    * actually tiny). Within-doc repeated grams fan the position join
    * out quadratically PER REPEATED GRAM, but only inside a single
    * pair's rows — bounded by document length, not corpus size.
    */
  def dupSpans(
      docs: DataFrame,
      bands: Int, rowsPerBand: Int,
      threshold: Double): DataFrame = {
    val k = 3
    val pairs = Caches.track(
      minhashLsh(docs, bands, rowsPerBand, threshold)
        .select(col("doc_a"), col("doc_b")))
    val dupIds = pairs.select(col("doc_a").as("doc_id"))
      .unionAll(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val posGrams = Caches.track(docs
      .join(dupIds.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .filter(size(col("w")) >= k)
      // kernel A/B (round 13, 100× amplified docs, best-of-2 warm): raw
      // positional trigram strings 14.82 s vs KrWindowFp 16.58 s — at
      // k=3 the window concat is three short words and the raw string is
      // NARROWER than the 39-char dual-KR fp, so the rolling kernel that
      // wins q257's k=8 anchor pass (10×) loses here; the raw kernel ships
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(1, size(w) - 2), " +
          "i -> concat_ws(' ', w[i-1], w[i], w[i+1]))")).as(Seq("p0", "sh")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("sh")))
    val matches = posGrams
      .join(pairs.hint("shuffle_hash"), col("doc_id") === col("doc_a"))
      .select(col("doc_a"), col("doc_b"), col("p").as("pa"), col("sh"))
      .join(posGrams.select(col("doc_id").as("doc_b"),
        col("p").as("pb"), col("sh")), Seq("doc_b", "sh"))
      .withColumn("d", col("pa") - col("pb"))
    val byDiag = Window.partitionBy(col("doc_a"), col("doc_b"), col("d"))
      .orderBy(col("pa"))
    val runs = matches
      .withColumn("island", col("pa") - row_number().over(byDiag))
      .groupBy(col("doc_a"), col("doc_b"), col("d"), col("island"))
      .agg(count(lit(1)).as("run_len"), min(col("pa")).as("a_start"))
    val byPair = Window.partitionBy(col("doc_a"), col("doc_b"))
      .orderBy(col("run_len").desc, col("d"), col("a_start"))
    runs
      .withColumn("rk", row_number().over(byPair))
      .filter(col("rk") === 1)
      .select(col("doc_a"), col("doc_b"), col("run_len"),
        (col("run_len") + (k - 1)).as("span_words"),
        col("a_start"), (col("a_start") - col("d")).as("b_start"))
  }

  def dupSpans(s: SparkSession, dir: String): DataFrame =
    dupSpans(Tables.documents(s, dir), bands = 4, rowsPerBand = 2, threshold = 0.8)

  /** Incremental (delta) dedup: classify each document of a NEW ingestion
    * batch against the standing corpus as an exact duplicate (byte-equal
    * text), a near-duplicate (shares an LSH band bucket with a corpus doc
    * AND true Jaccard ≥ threshold), or unique — the decision a continuous
    * 100 TB pipeline makes per crawl drop, where re-deduplicating the
    * whole corpus per batch is off the table. The batch is the top 5% of
    * the deterministic hash-bucket split (the same splitAssign primitive
    * as q40/q55), the corpus the other 95%.
    *
    * Scale: every join is keyed and delta-bounded. Exact: the delta's
    * text fingerprints semi-probe the corpus fingerprint relation (key =
    * md5, high-cardinality, map-side distinct). Near: band keys are
    * computed for both sides, joined on (band, bkey) — the LSH index join
    * — and only candidate pairs carry shingle sets into verification
    * (the minhashLsh discipline). The corpus-side index computations are
    * one pass each; in a production incremental pipeline both (fp and
    * band-key relations) would be standing tables maintained per batch,
    * which this operator's join shapes are exactly the maintenance
    * queries for.
    */
  def deltaDedup(
      docs: DataFrame,
      bands: Int, rowsPerBand: Int,
      threshold: Double): DataFrame = {
    val bucketed = docs.withColumn("bucket", Corpus.hashBucket(col("doc_id")))
    // cached: the delta text feeds the exact-tier probe, the shingle
    // pass, and the final verdict join (the corpus side deliberately is
    // NOT cached — it is touched only inside the standing-index builds
    // below, once per input generation)
    val delta = Caches.track(bucketed.filter(col("bucket") >= 95).drop("bucket"))
    val corpus = bucketed.filter(col("bucket") < 95).drop("bucket")
    // round 18: both corpus-side indexes become the STANDING tables the
    // scaladoc promises ("in a production incremental pipeline both
    // would be standing tables maintained per batch") — Derived
    // artifacts per input generation (the q295 corpus95 convention).
    // Every probe run then pays delta-sized work plus two index scans,
    // never a corpus-sized md5/shingle/band pass per batch. Candidates
    // and verdicts are identical: the artifacts hold exactly the
    // relations the inline plan computed.
    // exact tier: delta fingerprints semi-probe the standing corpus
    // fp index (distinct is free for a semi-join and shrinks the scan)
    val corpusFp = graft.Derived.materialized(docs.sparkSession,
      "exact_fp_corpus95", Seq(docs)) {
      corpus.select(md5(col("text")).as("fp")).distinct()
    }
    val exactIds = delta
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .join(corpusFp.hint("shuffle_hash"), Seq("fp"), "left_semi")
      .select(col("doc_id"))
    // near tier: delta band keys probe the standing corpus band-key
    // index, then exact-Jaccard verification on candidates only
    val shDelta = Caches.track(docShingleSets(delta))
    val deltaKeys = bandKeys(shDelta, bands, rowsPerBand)
    val corpusKeys = graft.Derived.materialized(docs.sparkSession,
      s"lsh_bandkeys_corpus95_b${bands}r$rowsPerBand", Seq(docs)) {
      bandKeys(docShingleSets(corpus), bands, rowsPerBand)
    }
    val cands = Caches.track(deltaKeys.as("a").hint("shuffle_hash")
      .join(corpusKeys.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey"))
      .select(col("a.doc_id").as("delta_id"), col("b.doc_id").as("corpus_id"))
      .distinct())
    val setsD = shDelta
      .join(cands.select(col("delta_id").as("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("delta_id"), col("shs").as("sh_d"), col("n_sh").as("n_d"))
    // corpus shingle arrays exist ONLY for candidate docs: the semi-join
    // runs on the raw text relation BEFORE the shingle projection, so
    // non-candidate corpus docs are never shingled at probe time at all.
    // CACHED deliberately, though read once: inlined into the three-way
    // verification join this subtree replans pathologically (measured
    // 5.3 s vs 1.4 s at sf0.1 — the cache is a planning boundary, the
    // same boundary the former full-corpus shingle cache provided)
    val setsC = Caches.track(docShingleSets(
      corpus.join(cands.select(col("corpus_id").as("doc_id")),
        Seq("doc_id"), "left_semi"))
      .select(col("doc_id").as("corpus_id"), col("shs").as("sh_c"), col("n_sh").as("n_c")))
    val nearIds = cands.hint("shuffle_hash")
      .join(setsD.hint("shuffle_hash"), "delta_id")
      .join(setsC.hint("shuffle_hash"), "corpus_id")
      .withColumn("inter", size(array_intersect(col("sh_d"), col("sh_c"))))
      .filter(col("inter").cast("double") /
        (col("n_d") + col("n_c") - col("inter")) >= threshold)
      .select(col("delta_id").as("doc_id")).distinct()
    delta.select(col("doc_id"))
      .join(exactIds.withColumn("is_exact", lit(1)), Seq("doc_id"), "left")
      .join(nearIds.withColumn("is_near", lit(1)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("is_exact") === 1, "exact")
          .when(col("is_near") === 1, "near")
          .otherwise("unique").as("verdict"))
  }

  def deltaDedup(s: SparkSession, dir: String): DataFrame =
    deltaDedup(Tables.documents(s, dir), bands = 4, rowsPerBand = 2, threshold = 0.8)

  /** Incremental pair-relation maintenance (q295): when a crawl delta
    * lands, the standing verified-pair artifact must not be rebuilt by
    * re-mining the whole corpus — the update decomposes exactly as
    *
    *   pairs(corpus ∪ delta) = pairs(corpus)            — the STANDING artifact
    *                         ∪ pairs(delta)             — tiny, delta-internal
    *                         ∪ cross(delta ⋈ corpus)    — delta band keys PROBE
    *                                                      the corpus band index
    *
    * because LSH membership is per-pair local (a pair collides iff its
    * two band-key sets intersect — adding unrelated documents changes
    * nothing). The operator materializes the corpus side once through
    * [[graft.Derived]] (the 95% md5 bucket tier, the q198/q258 split
    * convention), mines the ≤5% delta inline, probes the corpus band
    * keys with the delta's, and verifies cross candidates with the same
    * true-Jaccard test — then proves the decomposition by RETURNING the
    * union, whose DuckDB oracle is q22's FULL-recompute SQL verbatim: an
    * incremental result that hash-equals the from-scratch mining.
    *
    * Scale: the corpus is touched once per generation (the artifact
    * build); each delta pays delta-sized shingle/band work plus one
    * band-keyed probe join against the corpus index — the cost a 100 TB
    * nightly ingest actually budgets for, linear in the delta, never in
    * the corpus.
    */
  def deltaPairUpdate(
      docs: DataFrame,
      bands: Int = 4, rowsPerBand: Int = 2,
      threshold: Double = 0.8): DataFrame = {
    val bucketed = docs.withColumn("bucket", Corpus.hashBucket(col("doc_id")))
    val corpus = bucketed.filter(col("bucket") < 95).drop("bucket")
    val delta = bucketed.filter(col("bucket") >= 95).drop("bucket")
    // the standing corpus-internal pairs: one build per input generation.
    // The fingerprint input is the PARENT table (Seq(docs)), so the plan
    // half of the key is the same as the full-corpus minhashLsh
    // artifact's — collision is prevented by the distinct
    // `lsh_pairs_corpus95_` artifact NAME, which also keeps the build
    // gate pinning this tier's wall time separately (round-18 ADVICE
    // comment fix)
    val standing = graft.Derived.materialized(docs.sparkSession,
      s"lsh_pairs_corpus95_b${bands}r${rowsPerBand}_t${graft.Derived.paramKey(threshold)}",
      Seq(docs)) {
      minhashLshInline(corpus, bands, rowsPerBand, threshold)
    }
    val shDelta = Caches.track(docShingleSets(delta))
    // cross candidates: delta band keys probe the corpus band-key index —
    // since round 18 the STANDING Derived artifact shared with q198
    // (deltaDedup), so the corpus-side shingle+md5 band pass is paid once
    // per input generation, not once per probe run. The md5 bucket split
    // is not id-ordered, so canonicalize (doc_a < doc_b) with
    // least/greatest. shuffle_hash: both sides scale with their tier,
    // nothing may broadcast (the minhashLsh discipline).
    val corpusKeys = graft.Derived.materialized(docs.sparkSession,
      s"lsh_bandkeys_corpus95_b${bands}r$rowsPerBand", Seq(docs)) {
      bandKeys(docShingleSets(corpus), bands, rowsPerBand)
    }
    val crossCands = Caches.track(
      bandKeys(shDelta, bands, rowsPerBand).as("d").hint("shuffle_hash")
        .join(corpusKeys.as("c"),
          col("d.band") === col("c.band") && col("d.bkey") === col("c.bkey"))
        .select(least(col("d.doc_id"), col("c.doc_id")).as("doc_a"),
          greatest(col("d.doc_id"), col("c.doc_id")).as("doc_b"))
        .distinct())
    // verification shingle arrays: the delta's (cached above) plus ONLY
    // the candidate corpus docs' — the semi-join runs on raw text BEFORE
    // the shingle projection, so non-candidate corpus docs are never
    // shingled at probe time (they were shingled once, in the builds)
    val candIds = crossCands.select(col("doc_a").as("doc_id"))
      .unionByName(crossCands.select(col("doc_b").as("doc_id"))).distinct()
    val shCorpusCands = docShingleSets(
      corpus.join(candIds, Seq("doc_id"), "left_semi"))
    val crossVerified = verifyCandidates(
      Caches.track(shCorpusCands.unionByName(shDelta)), crossCands, threshold)
    standing
      // delta-internal mining reuses the shDelta cache held above — the
      // plain inline call would build a second identical InMemoryRelation
      .unionByName(minhashLshFromSets(shDelta, bands, rowsPerBand, threshold))
      .unionByName(crossVerified)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  def deltaPairUpdate(s: SparkSession, dir: String): DataFrame =
    deltaPairUpdate(Tables.documents(s, dir))

  /** Batch twin of streaming/StreamingOps.nearDupAgainstCorpus — the
    * same stream-vs-static-corpus MinHash-LSH probe, expressed over the
    * deterministic 95/5 bucket split (the same splitAssign primitive as
    * deltaDedup): the top-5% bucket plays the arriving stream, the rest
    * the standing corpus, and each "stream" document is matched to
    * every corpus document it is a verified near-dup of, with the exact
    * Jaccard. This gives the streaming operator's semantics a
    * driver-gated DuckDB oracle; StreamingOpsSpec asserts the streaming
    * form emits exactly these (doc_id, corpus_id, jaccard) rows on the
    * same data.
    *
    * Shape mirrors the streaming plan deliberately: the corpus index
    * (band keys joined back to shingle sets) is built once; the stream
    * side CARRIES its shingle sets through the band explode (a stream
    * cannot self-join to fetch its arrays back, so neither does the
    * twin); one equi-join on (band, bkey); exact per-pair verification
    * in the join projection; multi-band duplicate pairs collapsed by
    * distinct — the batch analog of dropDuplicatesWithinWatermark.
    * shuffle_hash on the index side: the corpus index scales with the
    * corpus and must never be presumed broadcastable (AQE may still
    * downgrade when it is actually small).
    */
  def corpusNearDupProbe(
      docs: DataFrame,
      bands: Int, rowsPerBand: Int,
      threshold: Double): DataFrame = {
    val shSets = Caches.track(docShingleSets(
      docs.withColumn("bucket", Corpus.hashBucket(col("doc_id"))),
      carry = Seq("bucket")))
    val corpusSets = shSets.filter(col("bucket") < 95)
    val corpusIdx = bandKeys(corpusSets, bands, rowsPerBand)
      .join(corpusSets.select(col("doc_id"), col("shs"), col("n_sh")), Seq("doc_id"))
      .select(col("band"), col("bkey"), col("doc_id").as("corpus_id"),
        col("shs").as("corpus_shs"), col("n_sh").as("corpus_n"))
    bandKeys(shSets.filter(col("bucket") >= 95), bands, rowsPerBand,
        carry = Seq("shs", "n_sh"))
      .join(corpusIdx.hint("shuffle_hash"), Seq("band", "bkey"))
      .withColumn("inter", size(array_intersect(col("shs"), col("corpus_shs"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_sh") + col("corpus_n") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id"), col("corpus_id"), col("jaccard"))
      .distinct()
  }

  def corpusNearDupProbe(s: SparkSession, dir: String): DataFrame =
    corpusNearDupProbe(Tables.documents(s, dir), bands = 4, rowsPerBand = 2, threshold = 0.8)

  /** LSH candidate-stage audit: how much of the TRUE near-dup pair set
    * (ground-truth n-gram Jaccard ≥ threshold, q21's honest quadratic)
    * does the banded MinHash index actually surface, and how dirty is the
    * candidate stream it surfaces — the recall/precision meta-measurement
    * that justifies (bands, rowsPerBand) before trusting LSH dedup at a
    * scale where the ground truth is uncomputable. Because minhashLsh
    * verifies candidates with the same true-Jaccard test, its output IS
    * truth ∩ candidates: recall = |verified|/|truth| and precision =
    * |verified|/|candidates| need no pair-set join at all — three counts.
    *
    * One row out; the three inputs are each already-audited plans (the
    * quadratic truth baseline is the one intentionally non-scale-path
    * input, exactly why this audit runs on a sample tier, not the corpus).
    */
  def lshRecallAudit(
      docs: DataFrame,
      bands: Int, rowsPerBand: Int,
      threshold: Double,
      auditCap: Int = 0): DataFrame = {
    // the audit runs on a bounded deterministic doc tier when auditCap
    // > 0 (see auditTier): the quadratic ground truth is the one
    // intentionally non-scale-path input here, and a FRACTIONAL tier
    // only shrinks its constant — (0.2n)² is still n² — while a capped
    // tier makes the truth O(cap²) flat at any corpus size. Recall and
    // precision are RATIOS over pairs, and a uniform doc sample keeps
    // every true pair with the same probability (cap/n)², so the
    // tier-scoped estimate is unbiased for the corpus-wide one. A cap at
    // or above the corpus size IS the full audit (the equivalence
    // DedupSpec pins), so small inputs lose nothing; auditCap = 0 keeps
    // the exhaustive full-corpus path for callers who insist.
    val tier = if (auditCap > 0) auditTier(docs, auditCap) else docs
    val tag = if (auditCap > 0) s"audit${auditCap}_" else ""
    val truth = tierTruth(tier, tag, threshold)
      .select(col("doc_a"), col("doc_b"))
    val shSets = Caches.track(docShingleSets(tier))
    // the candidate pair set is THRESHOLD-INDEPENDENT (bands alone
    // decide it), so the two audit operating points (q200 at 0.8, q294
    // at 0.5) share one derived build; within a build the band keys are
    // computed once and the self-join + distinct runs a single time.
    // Band keys are per-doc projections, so candidates over the tier
    // are EXACTLY the full candidate set restricted to tier pairs —
    // tier-scoping the build loses no audit fidelity
    val cands = Caches.track(graft.Derived.materialized(docs.sparkSession,
      s"lsh_cands_${tag}b${bands}r$rowsPerBand", Seq(tier)) {
      val keys = bandKeys(shSets, bands, rowsPerBand)
      keys.as("a").hint("shuffle_hash")
        .join(keys.as("b"),
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
    })
    val verified = verifyCandidates(shSets, cands, threshold)
      .select(col("doc_a"), col("doc_b"))
    // nullif guards: on a dup-free corpus n_truth/n_candidates are 0 and
    // a bare division yields NaN in Spark but may differ in other
    // engines — NULL recall/precision is the well-defined cross-engine
    // answer for "no denominator"
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(cands.agg(count(lit(1)).as("n_candidates")))
      .crossJoin(verified.agg(count(lit(1)).as("n_verified")))
      .select(col("n_truth"), col("n_candidates"), col("n_verified"),
        (col("n_verified").cast("double") /
          nullif(col("n_truth").cast("double"), lit(0.0))).as("recall"),
        (col("n_verified").cast("double") /
          nullif(col("n_candidates").cast("double"), lit(0.0))).as("precision"))
  }

  /** The quadratic Jaccard ground truth over a doc tier at `threshold`,
    * as the shared Derived artifact `ngram_jaccard_<tag>t<threshold>`
    * (q200/q294/q303/q304 all read these). Round 18: thresholds ABOVE
    * the 0.5 operating point DERIVE from the 0.5-base artifact by a
    * filtered scan instead of re-running the quadratic shingle
    * self-join — exact, because the inline chain's very last step is
    * `jaccard >= threshold` over the same pair relation, so
    * inline(t) ≡ inline(0.5).filter(jaccard ≥ t) for every t ≥ 0.5 row
    * for row, jaccard values included (DedupSpec pins it on a planted
    * corpus). The t0p8 build drops from a second quadratic pass to one
    * artifact scan.
    */
  private def tierTruth(tier: DataFrame, tag: String, threshold: Double): DataFrame =
    graft.Derived.materialized(tier.sparkSession,
      s"ngram_jaccard_${tag}t${graft.Derived.paramKey(threshold)}", Seq(tier)) {
      if (threshold > 0.5) tierTruth(tier, tag, 0.5).filter(col("jaccard") >= threshold)
      else ngramJaccardInline(tier, threshold)
    }

  /** Deterministic bounded audit tier: the `cap` documents with the
    * smallest md5(doc_id) (doc_id tiebreak — total order, so the tier is
    * identical in any engine). An md5 order is a uniform random-but-
    * reproducible permutation, so the tier is a uniform doc sample of
    * fixed SIZE — unlike a percent bucket (`hashBucket < p`), whose cost
    * share is a fixed FRACTION and therefore keeps the quadratic truth's
    * exponent. TakeOrdered(cap) is one corpus scan + a per-partition
    * top-cap merge: linear, no full sort, no shuffle of doc payloads
    * beyond the survivors.
    */
  private[graft] def auditTier(docs: DataFrame, cap: Int): DataFrame =
    docs.orderBy(md5(col("doc_id").cast("string")), col("doc_id")).limit(cap)

  /** Driver binding: audits on the 1000-doc tier — at the sf0.01
    * correctness scale (500 docs) the cap exceeds the corpus, so the
    * tier IS the full corpus and the oracle exercises the exhaustive
    * semantics; at bench/scale sizes the truth build is O(cap²) flat.
    */
  def lshRecallAudit(s: SparkSession, dir: String): DataFrame =
    lshRecallAudit(Tables.documents(s, dir), bands = 4, rowsPerBand = 2,
      threshold = 0.8, auditCap = 1000)

  /** Audit-tier representativeness profile (q301): per source, how the
    * md5 audit tier's composition compares to the corpus — doc counts,
    * both shares, and their ratio. The audit OF the audit: the recall
    * audits (q200/q294) read the tier estimate as the corpus number,
    * which is licensed by the tier being a uniform sample; this table is
    * what a reviewer checks before trusting that (a source absent from
    * the tier reads rep_ratio 0 and is immediately visible).
    *
    * Scale: the tier is a bounded TakeOrdered (cap rows); its ids
    * broadcast into a semi-join against the corpus scan, both counts are
    * map-side-combined aggregates, totals ride single-row broadcast
    * cross joins; output is |sources| rows.
    */
  def auditTierProfile(docs: DataFrame, cap: Int = 1000): DataFrame = {
    val tierIds = auditTier(docs, cap).select(col("doc_id"))
    val corpus = docs.groupBy(col("source")).agg(count(lit(1)).as("n_corpus"))
    val tier = docs.join(broadcast(tierIds), Seq("doc_id"), "left_semi")
      .groupBy(col("source")).agg(count(lit(1)).as("n_tier"))
    corpus.join(tier, Seq("source"), "left")
      .na.fill(0L, Seq("n_tier"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("total_corpus"))))
      .crossJoin(broadcast(tierIds.agg(count(lit(1)).as("total_tier"))))
      .select(col("source"), col("n_corpus"), col("n_tier"),
        (col("n_corpus").cast("double") / col("total_corpus")).as("corpus_share"),
        (col("n_tier").cast("double") / col("total_tier")).as("tier_share"),
        ((col("n_tier").cast("double") / col("total_tier")) /
          (col("n_corpus").cast("double") / col("total_corpus"))).as("rep_ratio"))
  }

  def auditTierProfile(s: SparkSession, dir: String): DataFrame =
    auditTierProfile(Tables.documents(s, dir))

  /** Corpus dup-rate estimator from the audit tier (q303): the
    * statistical payoff of the bounded tier — the quadratic truth over
    * `cap` uniformly-sampled docs gives an UNBIASED estimate of the
    * corpus-wide true near-dup pair count, because every corpus pair
    * survives the doc sample with the same probability
    * p = (cap/n)·((cap−1)/(n−1)) (sampling without replacement; the
    * naive (cap/n)² is biased high by exactly the n−1 factor). Emits the
    * tier observation, the inverse inclusion probability, the estimate,
    * and the per-doc dup incidence rate inside the tier — the number a
    * curation pipeline quotes ("~K duplicate pairs at Jaccard ≥ t")
    * without ever paying the corpus quadratic.
    *
    * One row out; when cap ≥ n the scale factor is exactly 1 and the
    * "estimate" IS the exact corpus count (the sf0.01 oracle regime).
    *
    * Scale: the tier truth is the shared O(cap²) derived artifact the
    * recall audits already build; everything else is single-row
    * arithmetic over three broadcast counts.
    */
  def dupRateEstimate(
      docs: DataFrame, threshold: Double, cap: Int = 1000): DataFrame = {
    val tier = auditTier(docs, cap)
    val truth = tierTruth(tier, s"audit${cap}_", threshold)
    val tierPairs = truth.agg(count(lit(1)).as("n_tier_pairs"))
    val tierDocs = tier.agg(count(lit(1)).as("n_tier_docs"))
    val corpusDocs = docs.agg(count(lit(1)).as("n_docs"))
    // pair inclusion prob under a uniform size-m doc sample of n docs:
    // m(m−1) / (n(n−1)); its inverse scales the tier count up. Exact
    // integer products, one double division at the end.
    corpusDocs.crossJoin(broadcast(tierDocs)).crossJoin(broadcast(tierPairs))
      .select(
        col("n_docs"), col("n_tier_docs"), col("n_tier_pairs"),
        ((col("n_docs") * (col("n_docs") - lit(1L))).cast("double") /
          (col("n_tier_docs") * (col("n_tier_docs") - lit(1L)))).as("scale_factor"),
        (col("n_tier_pairs").cast("double") *
          (col("n_docs") * (col("n_docs") - lit(1L))).cast("double") /
          (col("n_tier_docs") * (col("n_tier_docs") - lit(1L)))).as("est_corpus_pairs"),
        (col("n_tier_pairs").cast("double") * 2.0 /
          col("n_tier_docs")).as("tier_dup_incidence"))
  }

  def dupRateEstimate(s: SparkSession, dir: String): DataFrame =
    dupRateEstimate(Tables.documents(s, dir), threshold = 0.8)

  /** Design-based standard error for the q303 dup-rate estimate (q304):
    * the exact Horvitz–Thompson variance ESTIMATOR of the corpus
    * dup-pair total under the md5 doc tier — the number that turns the
    * point estimate into "K ± se pairs" a reviewer can actually act on.
    *
    * The tier is a uniform size-m doc sample of n docs, so a PAIR of
    * docs survives with π₂ = (m/n)·((m−1)/(n−1)), and a pair OF TRUE
    * PAIRS survives with a probability that depends only on how many
    * docs the two pairs share: π₂ again (same pair), π₃ (one shared
    * endpoint, 3 distinct docs), π₄ (disjoint, 4 docs). The
    * Horvitz–Thompson variance estimator therefore collapses to three
    * closed-form coefficients times three integer counts readable off
    * the OBSERVED tier truth alone:
    *
    *   V̂ = T·(1−π₂)/π₂² + A·(π₃−π₂²)/(π₃·π₂²) + D·(π₄−π₂²)/(π₄·π₂²)
    *
    * with T = observed true pairs, A = ordered pairs of true pairs
    * sharing exactly one doc (Σ_d deg(d)·(deg(d)−1) over pair-endpoint
    * degrees — dup pairs cluster, and that clustering is exactly what
    * inflates the variance), D = T·(T−1) − A the ordered disjoint
    * count. When cap ≥ n every π is exactly 1 and V̂ is exactly 0 — the
    * estimate is a census (the sf0.01 oracle regime exercises this
    * branch; the sf0.1 cross-scale check exercises the real-subsample
    * branch). The π products are built as ratios-of-doubles factor by
    * factor ((m−k)/(n−k) for k = 0..3) because n(n−1)(n−2)(n−3)
    * overflows int64 already at n ≈ 56k; the factor order is fixed and
    * mirrored in the oracle so the doubles agree bit-exactly.
    *
    * Scale: rides the SAME shared tier-truth artifact as q200/q303 (no
    * new build); the only new work is one endpoint-degree aggregate over
    * the O(cap²)-bounded pair list plus single-row arithmetic.
    */
  def dupRateCi(
      docs: DataFrame, threshold: Double, cap: Int = 1000): DataFrame = {
    val tier = auditTier(docs, cap)
    val truth = tierTruth(tier, s"audit${cap}_", threshold)
    val tierPairs = truth.agg(count(lit(1)).as("n_tier_pairs"))
    // ordered same-endpoint pairs of true pairs: Σ_d deg·(deg−1)
    val adj = truth
      .select(explode(array(col("doc_a"), col("doc_b"))).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("deg"))
      .agg(coalesce(sum(col("deg") * (col("deg") - lit(1L))), lit(0L))
        .as("adj_ordered"))
    val tierDocs = tier.agg(count(lit(1)).as("n_tier_docs"))
    val corpusDocs = docs.agg(count(lit(1)).as("n_docs"))

    val m = col("n_tier_docs")
    val n = col("n_docs")
    def f(k: Int): org.apache.spark.sql.Column =
      (m - lit(k.toLong)).cast("double") / (n - lit(k.toLong))
    val p2 = f(0) * f(1)
    val p3 = p2 * f(2)
    val p4 = p3 * f(3)
    val tD = col("n_tier_pairs").cast("double")
    val aD = col("adj_ordered").cast("double")
    val disjD = col("disj_ordered").cast("double")
    val varEst =
      (tD * (lit(1.0) - p2)) / (p2 * p2) +
        (aD * (p3 - p2 * p2)) / (p3 * (p2 * p2)) +
        (disjD * (p4 - p2 * p2)) / (p4 * (p2 * p2))
    val est = (col("n_tier_pairs").cast("double") *
      (n * (n - lit(1L))).cast("double") /
      (m * (m - lit(1L))))

    corpusDocs.crossJoin(broadcast(tierDocs))
      .crossJoin(broadcast(tierPairs)).crossJoin(broadcast(adj))
      .withColumn("disj_ordered",
        col("n_tier_pairs") * (col("n_tier_pairs") - lit(1L)) -
          col("adj_ordered"))
      .select(
        col("n_docs"), col("n_tier_docs"), col("n_tier_pairs"),
        col("adj_ordered"), col("disj_ordered"),
        est.as("est_corpus_pairs"),
        varEst.as("var_est"),
        sqrt(greatest(varEst, lit(0.0))).as("se_est"),
        when(est > lit(0.0),
          sqrt(greatest(varEst, lit(0.0))) / est).as("rel_se"))
  }

  def dupRateCi(s: SparkSession, dir: String): DataFrame =
    dupRateCi(Tables.documents(s, dir), threshold = 0.8)

  /** LSH banding cost planner (q222): for each candidate (bands,
    * rows-per-band) split of the 8-slice minhash signature, the candidate
    * volume the band self-join WOULD generate — `Σ_buckets n·(n−1)/2` —
    * plus bucket-shape stats, all from per-bucket COUNTS. No pair is ever
    * materialized: choosing banding parameters by running the join is the
    * quadratic blowup the planner exists to avoid, so its own cost must
    * be bucket-count-bounded — one shingle pass, then per config one
    * band explode + one count aggregate. That is what makes it runnable
    * on the full 100 TB corpus rather than a sample: wider bands (fewer
    * rows per band) collide more → more candidates → higher recall, and
    * this query prices that trade exactly.
    */
  def lshCostPlanner(
      docs: DataFrame,
      configs: Seq[(Int, Int)] = Seq((8, 1), (4, 2), (2, 4))): DataFrame = {
    require(configs.nonEmpty, "at least one (bands, rowsPerBand) config")
    val shSets = Caches.track(docShingleSets(docs))
    configs.map { case (b, r) =>
      bandKeys(shSets, b, r)
        .groupBy(col("band"), col("bkey")).agg(count(lit(1)).as("n"))
        .agg(
          count(lit(1)).as("n_buckets"),
          sum(when(col("n") === 1L, 1L).otherwise(0L)).as("n_singletons"),
          max(col("n")).as("max_bucket"),
          // Σ n(n−1) summed as exact int64, halved once (always even)
          sum(col("n") * (col("n") - lit(1L))).as("pair2"))
        .select(lit(b.toLong).as("bands"), lit(r.toLong).as("rows_per_band"),
          col("n_buckets"), col("n_singletons"), col("max_bucket"),
          expr("pair2 div 2").as("n_candidates"))
    }.reduce(_.unionAll(_))
  }

  def lshCostPlanner(s: SparkSession, dir: String): DataFrame =
    lshCostPlanner(Tables.documents(s, dir))

  /** Dup-cluster size distribution (q227): how many near-dup clusters of
    * each size the corpus carries, and how many documents they absorb —
    * the one-table summary a dedup report leads with (a corpus dominated
    * by pairs dedups very differently from one with thousand-document
    * template clusters, and the cluster-size tail decides whether
    * canonical election output is review-able at all).
    *
    * Scale: everything after `dupClusters` aggregates the (doc, cluster)
    * labelling — two map-side-combined aggregates over the dup
    * population, output bounded by the distinct cluster sizes.
    */
  def clusterSizeHistogram(
      docs: DataFrame,
      bands: Int, rowsPerBand: Int, threshold: Double): DataFrame =
    dupClusters(docs, bands, rowsPerBand, threshold)
      .groupBy(col("cluster")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))

  def clusterSizeHistogram(s: SparkSession, dir: String): DataFrame =
    clusterSizeHistogram(
      Tables.documents(s, dir), bands = 4, rowsPerBand = 2, threshold = 0.8)

  /** Split-leakage audit (q234): how many verified near-dup pairs CROSS
    * the train/valid/test boundary (q40's hash split) — the eval-
    * integrity number: every cross-split pair is a validation answer the
    * model can memorize from train. Reported per (split_a, split_b)
    * combination with the leak flag, so the report shows both the safe
    * within-split mass and the leaking cross-split mass. (q232's
    * group-integral folds exist precisely to drive this to zero when
    * dups concentrate within sources.)
    *
    * Scale: the pair relation is the SHARED verified LSH pair artifact
    * (`minhashLsh` — banded candidates verified with exact Jaccard,
    * never all-pairs), the same relation the dedup pass itself acts on.
    * That is deliberate, and it changed in round 18: the quadratic
    * ground truth this audit used to ride was the repo's only
    * super-linear build chain (SCALE_r17 exponent 1.05), unpayable at
    * real corpus scale, and the leakage a pipeline must fix is exactly
    * the leakage its own dedup relation can SEE — a pair the banding
    * misses (≈2% at 0.8 with 4x2 bands) is invisible to the scrub
    * regardless, and the tier-scoped recall audit (q200/q294) prices
    * that miss rate separately. The split columns are per-row md5
    * projections joined onto the pair endpoints by id.
    */
  def splitLeakage(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val pairs = minhashLsh(docs, bands = 4, rowsPerBand = 2, threshold)
      .select(col("doc_a"), col("doc_b"))
    val splits = Corpus.splitAssign(docs).select(col("doc_id"), col("split"))
    pairs
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("is_leak", col("split_a") =!= col("split_b"))
  }

  def splitLeakage(s: SparkSession, dir: String): DataFrame =
    splitLeakage(Tables.documents(s, dir))

  /** Content-defined chunking dedup profile (q251): split every document
    * at CONTENT-derived boundaries — a cut after each 8-char window
    * whose md5 starts with the hex digit '0' (expected chunk ≈ 16 + 7
    * chars) — then measure, per source, two dup signals: the
    * WITHIN-SOURCE share (`dup_chunk_share`: chunk instances beyond the
    * source's own distinct fingerprints — intra-source template mass)
    * and the CROSS-SOURCE share (`cross_dup_share`: chunk instances
    * whose fingerprint appears in more than one distinct source — the
    * boilerplate that travels between crawls, which per-source dedup
    * can never see). This is the rolling-hash CDC idea storage dedup is
    * built on (LBFS/rsync family): unlike fixed-width chunking (q59),
    * an insertion shifts only the chunks it touches, so shared passages
    * land on IDENTICAL chunk fingerprints wherever they sit in the
    * document — the byte-level complement of the shingle near-dup
    * family.
    *
    * Determinism: boundaries are md5-string prefix tests (no arithmetic
    * at all), fingerprints are md5 of the exact substring; the three
    * ratios are single double divisions of exact counts.
    *
    * Scale: the per-position window hash is the q38 winnowing kernel's
    * cost class, evaluated per row with zero joins; chunk instances
    * collapse FIRST to the (source, fp) distinct relation (map-side
    * combined), so the corpus-wide fingerprint-spread aggregate and the
    * join that carries it back are both keyed on the far smaller
    * distinct relation — shuffle_hash on the high-cardinality fp key,
    * never a broadcast (the fingerprint universe scales with corpus
    * bytes). `n_distinct` is the (source, fp) row count, so no
    * countDistinct pass remains. Docs shorter than the 8-char window
    * have no interior windows and are profiled as one whole-document
    * chunk.
    */
  /** Row-local CDC chunk relation: `(doc_id, carry..., fp, clen)` — one
    * row per content-defined chunk (the q251 boundary rule: cut after
    * each 8-char window whose md5 starts with '0'), fingerprinted by
    * md5 of the exact substring. Pure HOF projections, zero joins, zero
    * state — the kernel [[cdcChunks]], [[cdcIngestProbe]], and the
    * streaming ingest monitor all share, so their chunks are the same
    * chunks by construction.
    */
  private[graft] def cdcChunkRelation(
      docs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val cs = carry.map(col)
    docs
      .filter(length(col("text")) >= 1)
      // NB: guard the window sequence — Spark's sequence(1, 0) counts
      // DOWN to [1, 0] instead of yielding the empty array DuckDB's
      // range(1, 1) does, so sub-window docs must short-circuit
      .withColumn("cuts", expr(
        """array_sort(array_distinct(concat(
          |  case when length(text) >= 8 then
          |    transform(
          |      filter(sequence(1, length(text) - 7),
          |        i -> substring(md5(substring(text, i, 8)), 1, 1) = '0'),
          |      i -> i + 7)
          |  else cast(array() as array<int>) end,
          |  array(length(text)))))""".stripMargin))
      .withColumn("prevs",
        expr("concat(array(0), slice(cuts, 1, size(cuts) - 1))"))
      .select((col("doc_id") +: cs) :+ explode(expr(
        "zip_with(prevs, cuts, (p, c) -> substring(text, cast(p + 1 as int), cast(c - p as int)))"))
        .as("chunk"): _*)
      .select((col("doc_id") +: cs) :+ md5(col("chunk")).as("fp") :+
        length(col("chunk")).as("clen"): _*)
  }

  def cdcChunks(docs: DataFrame): DataFrame = {
    val perFp = Caches.track(
      cdcChunkRelation(
        docs.repartition(shuffleWidth(docs), col("doc_id")),
        carry = Seq("source"))
      .groupBy(col("source"), col("fp"))
      .agg(count(lit(1)).as("n"), sum(col("clen")).as("chars")))
    // fingerprint spread: perFp is keyed (source, fp), so the per-fp row
    // count IS the number of distinct sources carrying that chunk
    val spread = perFp.groupBy(col("fp")).agg(count(lit(1)).as("ns"))
    perFp.hint("shuffle_hash")
      .join(spread.hint("shuffle_hash"), Seq("fp"))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_chunks"),
        count(lit(1)).as("n_distinct"),
        sum(col("chars")).as("n_chars"),
        sum(when(col("ns") > 1, col("n")).otherwise(0L)).as("n_cross_chunks"))
      .select(col("source"), col("n_chunks"), col("n_distinct"),
        (col("n_chars").cast("double") / col("n_chunks").cast("double"))
          .as("mean_chunk_len"),
        (lit(1.0) - col("n_distinct").cast("double") /
          col("n_chunks").cast("double")).as("dup_chunk_share"),
        col("n_cross_chunks"),
        (col("n_cross_chunks").cast("double") / col("n_chunks").cast("double"))
          .as("cross_dup_share"))
  }

  def cdcChunks(s: SparkSession, dir: String): DataFrame =
    cdcChunks(Tables.documents(s, dir))

  /** Byte-level ingest dedup probe (q258): each document of an arriving
    * delta batch (top 5% of the md5 hash-bucket split — the q198
    * deltaDedup batching) has its CDC chunks probed against the standing
    * corpus's chunk-fingerprint index, and reports how much of its BYTE
    * mass already exists in the corpus: `n_chunks/n_chars` (the doc's
    * chunk profile), `n_hit/dup_chars` (chunks whose fingerprint the
    * corpus already holds), and the `dup_char_share` an admission filter
    * thresholds on. Finer than [[deltaDedup]]'s verdict tiers — a doc
    * that is 60% boilerplate-by-bytes but no near-dup of any single
    * corpus doc shows up HERE and nowhere else. The streaming arm
    * (`StreamingOps.cdcChunkMonitor`) runs the identical kernel against
    * the same index shape on the ingest path.
    *
    * Scale: the corpus index is one distinct-aggregate over the corpus
    * chunk relation — in production a STANDING table maintained per
    * admitted batch (this probe's join is exactly the maintenance
    * read); the probe side is delta-bounded; the fp equi-join is
    * shuffle_hash on the high-cardinality fingerprint key (the index
    * scales with corpus bytes — never broadcast); the per-doc rollup is
    * one map-side-combined hash aggregate over delta chunks.
    */
  def cdcIngestProbe(docs: DataFrame): DataFrame = {
    val bucketed = docs
      .withColumn("bucket", Corpus.hashBucket(col("doc_id")))
      .select(col("doc_id"), col("text"), col("bucket"))
    // the corpus chunk-fingerprint index IS the standing table the
    // scaladoc promises ("maintained per admitted batch") — since round
    // 18 it is a Derived artifact (the q295 corpus95 convention): the
    // corpus-side CDC pass (len(text) md5 probes per doc — the single
    // most expensive term of this operator) is paid once per input
    // generation and every later probe run scans the index, exactly the
    // read a production ingest pipeline budgets. The probe side stays
    // delta-bounded and inline. Results are identical: the index is the
    // same distinct fp relation the inline plan computed.
    val corpusIdx = graft.Derived.materialized(docs.sparkSession,
      "cdc_fp_corpus95", Seq(docs)) {
      cdcChunkRelation(bucketed.filter(col("bucket") < 95))
        .select(col("fp")).distinct()
    }.withColumn("hit", lit(1))
    cdcChunkRelation(
      bucketed.filter(col("bucket") >= 95)
        .repartition(shuffleWidth(docs), col("doc_id")))
      .hint("shuffle_hash")
      .join(corpusIdx, Seq("fp"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hit"),
        sum(col("clen")).as("n_chars"),
        sum(when(col("hit") === 1, col("clen")).otherwise(0))
          .cast("long").as("dup_chars"))
      .select(col("doc_id"), col("n_chunks"), col("n_hit"),
        col("n_chars"), col("dup_chars"),
        (col("dup_chars").cast("double") / col("n_chars").cast("double"))
          .as("dup_char_share"))
  }

  /** Token-precision ingest dedup probe (q274): arriving (delta) docs'
    * k-token KR window fingerprints probed against the standing corpus's
    * fingerprint index — the exact-substring counterpart of the
    * byte-level CDC probe (q258): q258 answers "which BYTES of this doc
    * already exist", this answers "which ≥k-TOKEN passages already
    * exist", per doc: window count, hit count, hit share, and the
    * longest CONSECUTIVE hit run in tokens (a long run = a verbatim
    * lift from the corpus; scattered singleton hits = common phrases).
    * The registered split is the q258 md5-bucket rule (bucket ≥ 95 is
    * the 5% delta). The streaming twin (`StreamingOps.dupSpanMonitor`)
    * applies the identical probe at ingest.
    *
    * Scale: the corpus index is one DISTINCT over the linear fp
    * relation (built once, reused across micro-batches in the streaming
    * twin); the probe side stays delta-sized; the run-length pass is
    * gaps-and-islands over HIT windows only (bounded by per-doc dup
    * mass). Anchor fingerprints ride the O(n) KR rolling kernel; the
    * oracle probes per-window md5 instead — two independent fingerprint
    * families must agree on the hit set.
    */
  def exactSubstringProbe(docs: DataFrame, k: Int = 8): DataFrame = {
    val bucketed = docs
      .withColumn("bucket", Corpus.hashBucket(col("doc_id")))
      .select(col("doc_id"), col("text"), col("bucket"))
    def fps(df: DataFrame): DataFrame = df
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"),
        posexplode(graft.functions.KrWindowFp.krWindowFp(col("w"), k))
          .as(Seq("p0", "fp")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("fp"))
    // the corpus window-fp index is the STANDING table the scaladoc
    // promises ("built once, reused across micro-batches") — a Derived
    // artifact since round 18 (the q258 convention): the corpus-side KR
    // pass is paid once per input generation, every probe run scans it
    val corpusIdx = graft.Derived.materialized(docs.sparkSession,
      s"kr_fp_corpus95_k$k", Seq(docs)) {
      fps(bucketed.filter(col("bucket") < 95)).select(col("fp")).distinct()
    }.withColumn("hit", lit(1))
    val probed = Caches.track(fps(
      bucketed.filter(col("bucket") >= 95)
        .repartition(shuffleWidth(docs), col("doc_id")))
      .hint("shuffle_hash")
      .join(corpusIdx, Seq("fp"), "left"))
    val totals = probed.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hit"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val topRun = probed.filter(col("hit") === 1)
      .withColumn("isl", col("p") - row_number().over(byDoc))
      .groupBy(col("doc_id"), col("isl"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col("doc_id"))
      .agg(max(col("run")).as("top_run"))
    totals.join(topRun, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_windows").cast("double"))
          .as("hit_share"),
        coalesce(col("top_run"), lit(0L)).as("top_run_windows"),
        when(coalesce(col("top_run"), lit(0L)) > 0,
          coalesce(col("top_run"), lit(0L)) + lit(k - 1))
          .otherwise(0L).as("top_run_tokens"))
  }

  def exactSubstringProbe(s: SparkSession, dir: String): DataFrame =
    exactSubstringProbe(Tables.documents(s, dir))

  def cdcIngestProbe(s: SparkSession, dir: String): DataFrame =
    cdcIngestProbe(Tables.documents(s, dir))

  /** Dup-graph degree assortativity (q255): the Pearson correlation of
    * endpoint degrees across the verified near-dup edges (q22) — the
    * one-number answer to "is my duplication a few TEMPLATE HUBS fanning
    * out (disassortative, r < 0: high-degree nodes attach to low-degree
    * leaves) or MIRRORED CLUSTERS (assortative, r > 0: copies of copies
    * link to each other)". The two regimes want different cures — hub
    * boilerplate is a per-source strip (q74), clique mirrors are
    * canonical-doc election (q195) — so the audit runs before choosing.
    *
    * Computed over the symmetrised edge list (each edge contributes both
    * orientations, the standard undirected-assortativity convention, so
    * the x- and y-moments coincide): exact integer degree moments in
    * DECIMAL(38,0), one double division at the end — the q244/q249
    * closed-form discipline. NULL when the graph has no degree variance
    * (every node the same degree).
    *
    * Scale: degrees are one hash aggregate over the edge endpoints; the
    * degree table scales with the node count, so it attaches back onto
    * the edges via shuffle_hash equijoins on the endpoint keys (never a
    * broadcast); the final moment aggregate is map-side combined down to
    * a single row.
    */
  def dupAssortativity(
      docs: DataFrame,
      bands: Int = 4, rowsPerBand: Int = 2, threshold: Double = 0.8): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val pairs = Caches.track(
      minhashLsh(docs, bands, rowsPerBand, threshold)
        .select(col("doc_a"), col("doc_b")))
    val deg = Caches.track(pairs.select(col("doc_a").as("d"))
      .unionAll(pairs.select(col("doc_b").as("d")))
      .groupBy(col("d")).agg(count(lit(1)).as("deg")))
    val e = pairs
      .hint("shuffle_hash")
      .join(deg.select(col("d").as("doc_a"), col("deg").as("da")), "doc_a")
      .hint("shuffle_hash")
      .join(deg.select(col("d").as("doc_b"), col("deg").as("db")), "doc_b")
    val xy = e.select(col("da").as("x"), col("db").as("y"))
      .unionAll(e.select(col("db").as("x"), col("da").as("y")))
    val m = xy.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(dec)).as("sx"),
      sum((col("x") * col("x")).cast(dec)).as("sxx"),
      sum((col("x") * col("y")).cast(dec)).as("sxy"))
    // symmetric edge list: sy = sx and syy = sxx, so Pearson reduces to
    // (n*sxy - sx^2) / (n*sxx - sx^2)
    val num = col("n") * col("sxy") - col("sx") * col("sx")
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    m.select((col("n") / 2).cast("long").as("n_edges"),
      (col("sx").cast("double") / col("n").cast("double")).as("mean_degree"),
      (num.cast("double") / nullif(den.cast("double"), lit(0.0)))
        .as("assortativity"))
  }

  def dupAssortativity(s: SparkSession, dir: String): DataFrame =
    dupAssortativity(Tables.documents(s, dir))

  /** Exact-substring dedup (q257): token-precision shared-passage
    * detection — for every document, the exact token mass covered by
    * some passage of ≥ `k` tokens that ALSO appears verbatim in another
    * document, with per-doc span counts and the longest span's token and
    * character offsets. This is the suffix-array "remove any ≥k-token
    * passage shared between documents" modality (the standard companion
    * to MinHash in training-data pipelines — MinHash drops whole
    * near-dup documents, this finds the verbatim passages INSIDE
    * otherwise-distinct documents), re-expressed join-wise:
    *
    *  1. positional `k`-token window fingerprints per document — the
    *     codegen'd dual Karp–Rabin rolling kernel
    *     (`functions/KrWindowFp`): each token md5-hashed ONCE, then two
    *     independent 61-bit polynomial hashes rolled in O(n) per doc.
    *     The round-13 A/B vs the previous per-window md5
    *     (`transform(sequence…, i -> md5(concat_ws(' ', slice(w,i,k))))`)
    *     on the cached 100× token relation: md5 5.913 s vs KR 0.589 s
    *     (best-of-2 after warmup, local[32]) — 10× on the anchor pass;
    *     at sf0.1 the two are a wash (0.179 vs 0.183 s, scan-bound).
    *     122 fingerprint bits ⇒ collision expectation ~1e-11 at 1e13
    *     windows: equal fingerprints are equal runs for dedup purposes,
    *     same as md5. The DuckDB oracle deliberately KEEPS per-window
    *     md5 — an independent fingerprint family must produce the same
    *     shared-window set, so the gate also audits collision-freeness;
    *  2. a fingerprint is SHARED iff it occurs in ≥ 2 distinct
    *     documents — decided per fingerprint by `min(doc_id) ≠
    *     max(doc_id)` in one map-side-combined aggregate (no
    *     countDistinct, no pair join);
    *  3. a token is duplicated iff some shared window covers it, so
    *     per-doc coverage is the interval union of `[p, p+k-1]` over
    *     shared positions `p`: classic gaps-and-islands — a new span
    *     starts when the gap to the previous shared position exceeds
    *     `k` (coverage would break). Every maximal shared passage of
    *     length L ≥ k is exactly an island of L-k+1 consecutive shared
    *     positions.
    *
    * Token precision is exact BY CONSTRUCTION for the dup mass: a
    * passage of ≥ k tokens shared between two docs makes all of its
    * windows shared, and conversely every shared window sits inside a
    * shared passage of ≥ k tokens. (Adjacent islands closer than k
    * merge into one reported span — coverage, not partnership, is the
    * contract: the span is the region to CUT.) Output carries only
    * documents with at least one shared span — at 100 TB the result
    * scales with the dup population, not the corpus.
    *
    * Scale: the position relation is one row per token (the word-explode
    * cost class, linear); the shared-fingerprint filter is one hash
    * aggregate + a fingerprint-keyed left-semi shuffle_hash join (the
    * fingerprint universe scales with corpus tokens — never broadcast);
    * the island windows partition by doc_id over SHARED positions only
    * (bounded by per-doc dup mass); the char-offset join attaches the
    * one elected top span per doc back to the doc's token array by
    * doc_id equi-join. Never all-pairs, nothing single-partition.
    *
    * Reference scope: the reference engine has no dedup surface at all
    * (`script/TributeStreamingJob.py` is a streaming-ETL job); this
    * operator is part of the training-data extension surface.
    */
  def exactSubstringDedup(docs: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 2, s"a shared-run length needs k >= 2 tokens, got $k")
    val toks = Caches.track(docs
      .repartition(shuffleWidth(docs), col("doc_id"))
      .select(col("doc_id"), Text.words(col("text")).as("w"))
      .filter(size(col("w")) >= k))
    val pos = Caches.track(toks
      .select(col("doc_id"), size(col("w")).as("n_tokens"),
        posexplode(graft.functions.KrWindowFp.krWindowFp(col("w"), k))
          .as(Seq("p0", "fp")))
      .select(col("doc_id"), col("n_tokens"), (col("p0") + 1).as("p"), col("fp")))
    val sharedFp = pos.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select(col("fp"))
    val shared = pos
      .join(sharedFp.hint("shuffle_hash"), Seq("fp"), "left_semi")
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val spans = shared
      .withColumn("brk",
        when(col("p") - lag(col("p"), 1).over(byDoc) > k, 1).otherwise(0))
      .withColumn("island", sum(col("brk"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("n_tokens"), col("island"))
      .agg(min(col("p")).as("s"), (max(col("p")) + lit(k - 1)).as("e"))
    val perDoc = spans
      .withColumn("span_tokens", col("e") - col("s") + 1)
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_tokens")).cast("long").as("dup_tokens"),
        max(struct(col("span_tokens"), (-col("s")).as("ns"))).as("top"))
    perDoc
      .hint("shuffle_hash")
      .join(toks, Seq("doc_id"))
      .select(col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("n_spans"),
        col("dup_tokens"),
        (col("dup_tokens").cast("double") / col("n_tokens").cast("double"))
          .as("dup_token_share"),
        (-col("top.ns")).cast("long").as("top_span_start"),
        col("top.span_tokens").cast("long").as("top_span_tokens"),
        when(col("top.ns") === -1, lit(1L)).otherwise(
          length(concat_ws(" ",
            slice(col("w"), lit(1), (-col("top.ns")) - 1))).cast("long") + 2L)
          .as("top_span_char_start"))
  }

  def exactSubstringDedup(s: SparkSession, dir: String): DataFrame =
    exactSubstringDedup(Tables.documents(s, dir))

  /** Exact-substring SCRUB (q259): the removal transform that [[q257
    * exactSubstringDedup]] measures — every token covered by a shared
    * ≥`k`-token window is cut from the document, ALL occurrences in all
    * documents (the suffix-array dedup policy for training corpora:
    * a verbatim passage the corpus holds twice should train zero times,
    * not once — leaving one copy re-weights boilerplate by its document
    * frequency). Emits the full corpus: untouched documents pass through
    * with `removed_tokens = 0`, scrubbed ones carry the cleaned text
    * (kept tokens re-joined by single spaces, consistent with the
    * corpus's single-space tokenisation).
    *
    * Mechanics: the q257 span relation (shared-position islands) is
    * collected per doc into a BOUNDED array of (start, end) intervals —
    * bounded by per-doc dup-span count, never corpus-sized — left-joined
    * back onto the corpus by doc_id, and one `filter` HOF keeps the
    * tokens no interval covers. Row-local after the join; the heavy
    * lifting (anchor aggregate, semi-join, islands) is exactly q257's
    * plan and scales the same way.
    */
  def exactSubstringScrub(docs: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 2, s"a shared-run length needs k >= 2 tokens, got $k")
    val toks = docs
      .repartition(shuffleWidth(docs), col("doc_id"))
      .select(col("doc_id"), Text.words(col("text")).as("w"))
    val pos = toks
      .filter(size(col("w")) >= k)
      .select(col("doc_id"),
        posexplode(graft.functions.KrWindowFp.krWindowFp(col("w"), k))
          .as(Seq("p0", "fp")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("fp"))
    val sharedFp = pos.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select(col("fp"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val spans = pos
      .join(sharedFp.hint("shuffle_hash"), Seq("fp"), "left_semi")
      .withColumn("brk",
        when(col("p") - lag(col("p"), 1).over(byDoc) > k, 1).otherwise(0))
      .withColumn("island", sum(col("brk"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("p")).as("s"), (max(col("p")) + lit(k - 1)).as("e"))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("s"), col("e"))).as("cuts"))
    toks
      .hint("shuffle_hash")
      .join(spans, Seq("doc_id"), "left")
      .withColumn("kept", when(col("cuts").isNull, col("w")).otherwise(
        expr("filter(w, (x, i) -> !exists(cuts, c -> i + 1 >= c.s AND i + 1 <= c.e))")))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        (size(col("w")) - size(col("kept"))).cast("long").as("removed_tokens"),
        concat_ws(" ", col("kept")).as("text_clean"))
  }

  def exactSubstringScrub(s: SparkSession, dir: String): DataFrame =
    exactSubstringScrub(Tables.documents(s, dir))

  /** Eval-set decontamination scrub (q289): q259's exact-substring
    * surgery with the reference set swapped from "any other doc" to the
    * EVAL TIER (doc_id ≡ 3 mod 10 — the held-out 10%) — the
    * decontamination pass a training pipeline actually runs so the
    * benchmark answers don't sit verbatim inside the training text
    * (GPT-3-style n-gram decontamination, k = 8 whitespace tokens,
    * surgical window removal rather than whole-doc drops). Only TRAIN
    * docs are output; an eval window occurring in train text marks a
    * [p, p+k-1] interval, overlapping intervals merge by the q257
    * gaps-and-islands rule, and the covered tokens are cut.
    *
    * Scale: identical to q259 — the KR rolling-fingerprint Expression
    * is the per-token linear term; the eval fp relation scales with the
    * EVAL tier (a fixed fraction); the semi-join and islands shuffle
    * matched windows only.
    */
  /** The held-out eval tier: doc_id ≡ 3 mod 10. ONE definition — the
    * rule is a cross-query contract (q289's scrub, q299's heat matrix,
    * and q300's near-dup matrix must agree on the boundary, and every
    * DuckDB oracle hardcodes `% 10 = 3`); per-operator copies could
    * silently desynchronize under a future tier change. */
  private def evalTier(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c % 10 === 3

  def decontamScrub(docs: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 2, s"a contamination run needs k >= 2 tokens, got $k")
    val toks = docs
      .repartition(shuffleWidth(docs), col("doc_id"))
      .select(col("doc_id"), Text.words(col("text")).as("w"))
    val pos = toks
      .filter(size(col("w")) >= k)
      .select(col("doc_id"),
        posexplode(graft.functions.KrWindowFp.krWindowFp(col("w"), k))
          .as(Seq("p0", "fp")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("fp"))
    val evalFp = pos.filter(evalTier(col("doc_id"))).select(col("fp")).distinct()
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val spans = pos
      .filter(!evalTier(col("doc_id")))
      .join(evalFp.hint("shuffle_hash"), Seq("fp"), "left_semi")
      .withColumn("brk",
        when(col("p") - lag(col("p"), 1).over(byDoc) > k, 1).otherwise(0))
      .withColumn("island", sum(col("brk"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("p")).as("s"), (max(col("p")) + lit(k - 1)).as("e"))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("s"), col("e"))).as("cuts"))
    toks
      .filter(!evalTier(col("doc_id")))
      .hint("shuffle_hash")
      .join(spans, Seq("doc_id"), "left")
      .withColumn("kept", when(col("cuts").isNull, col("w")).otherwise(
        expr("filter(w, (x, i) -> !exists(cuts, c -> i + 1 >= c.s AND i + 1 <= c.e))")))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        (size(col("w")) - size(col("kept"))).cast("long").as("removed_tokens"),
        concat_ws(" ", col("kept")).as("text_clean"))
  }

  def decontamScrub(s: SparkSession, dir: String): DataFrame =
    decontamScrub(Tables.documents(s, dir))

  /** Contamination heat matrix (q299): q289 tells you WHAT to cut; this
    * is the report a curation team reads to decide what to FIX —
    * per (train source, eval source) cell: contaminated train docs,
    * matched windows, and the merged-island token mass that eval slice
    * covers in that train slice. A hot row means a train source is
    * scraping benchmark text (fix the crawler); a hot column means an
    * eval set has leaked widely (retire the benchmark). Cells are
    * independent by design: a span contaminated by two eval sources
    * counts in both cells, because fixing one source must not hide the
    * other's leak.
    *
    * Scale: the q289 contract — the KR rolling-fingerprint Expression is
    * the per-token linear term, the eval fp relation scales with the
    * eval tier, and only MATCHED windows shuffle into the
    * (doc, eval_source)-partitioned island windows; the matrix itself is
    * |sources|² rows. shuffle_hash on the fp join: both sides scale with
    * their tier, nothing may broadcast.
    */
  def contaminationMatrix(docs: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 2, s"a contamination run needs k >= 2 tokens, got $k")
    val toks = docs
      .repartition(shuffleWidth(docs), col("doc_id"))
      .select(col("doc_id"), col("source"), Text.words(col("text")).as("w"))
    val pos = toks
      .filter(size(col("w")) >= k)
      .select(col("doc_id"), col("source"),
        posexplode(graft.functions.KrWindowFp.krWindowFp(col("w"), k))
          .as(Seq("p0", "fp")))
      .select(col("doc_id"), col("source"), (col("p0") + 1).as("p"), col("fp"))
    // (fp, eval_source) distinct: a window hits a given eval SOURCE once
    // no matter how many of that source's docs carry it
    val evalFp = pos.filter(evalTier(col("doc_id")))
      .select(col("fp"), col("source").as("eval_source")).distinct()
    val hits = pos.filter(!evalTier(col("doc_id")))
      .hint("shuffle_hash")
      .join(evalFp.hint("shuffle_hash"), Seq("fp"))
      .select(col("doc_id"), col("source").as("train_source"),
        col("eval_source"), col("p"))
    val byKey = Window.partitionBy(col("doc_id"), col("eval_source"))
      .orderBy(col("p"))
    hits
      .withColumn("brk",
        when(col("p") - lag(col("p"), 1).over(byKey) > k, 1).otherwise(0))
      .withColumn("island", sum(col("brk"))
        .over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("train_source"), col("eval_source"),
        col("doc_id"), col("island"))
      .agg(min(col("p")).as("s"), (max(col("p")) + lit(k - 1)).as("e"),
        count(lit(1)).as("nw"))
      .groupBy(col("train_source"), col("eval_source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        sum(col("nw")).as("n_windows"),
        sum(col("e") - col("s") + 1).cast("long").as("covered_tokens"))
  }

  def contaminationMatrix(s: SparkSession, dir: String): DataFrame =
    contaminationMatrix(Tables.documents(s, dir))

  /** Near-dup contamination matrix (q300) — q299's LSH-verified twin:
    * q299 counts VERBATIM leakage (exact 8-token windows); this counts
    * whole-document near-dups crossing the eval boundary (a paraphrased
    * or lightly-edited benchmark copy carries no exact window but still
    * poisons the eval). Per (train source, eval source) cell: the
    * verified pair count, the distinct contaminated train docs, and the
    * worst (max) Jaccard on the micro grid. Pairs come from the SHARED
    * q22 dup-pair artifact — at 100 TB this report costs two key-only
    * lookups and a |sources|²-row aggregate on top of the relation the
    * dedup pass already built.
    *
    * The eval tier is q289/q299's (doc_id ≡ 3 mod 10); pair orientation
    * is canonical (doc_a < doc_b), so a crossing pair is counted once
    * with its train/eval roles resolved per row, never double.
    */
  def nearDupContamination(
      docs: DataFrame,
      bands: Int = 4, rowsPerBand: Int = 2,
      threshold: Double = 0.8): DataFrame = {
    val pairs = minhashLsh(docs, bands, rowsPerBand, threshold)
    val src = docs.select(col("doc_id"), col("source"))
    val oriented = pairs
      .filter(evalTier(col("doc_a")) =!= evalTier(col("doc_b")))
      .select(
        when(evalTier(col("doc_a")), col("doc_b")).otherwise(col("doc_a")).as("train_doc"),
        when(evalTier(col("doc_a")), col("doc_a")).otherwise(col("doc_b")).as("eval_doc"),
        col("jaccard"))
    oriented
      .join(src.select(col("doc_id").as("train_doc"), col("source").as("train_source")).hint("shuffle_hash"), Seq("train_doc"))
      .join(src.select(col("doc_id").as("eval_doc"), col("source").as("eval_source")).hint("shuffle_hash"), Seq("eval_doc"))
      .groupBy(col("train_source"), col("eval_source"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("train_doc")).as("n_train_docs"),
        max(floor(col("jaccard") * 1e6).cast("long")).as("max_jaccard_micro"))
  }

  def nearDupContamination(s: SparkSession, dir: String): DataFrame =
    nearDupContamination(Tables.documents(s, dir))

  /** Authority-based canonical election (q292): q195 elects a dup
    * cluster's representative by CONTENT SIZE (max n_chars); this
    * operator elects by GRAPH AUTHORITY — fixed-point PageRank
    * (q283's kernel) over the verified dup-pair graph itself, so the
    * most-linked copy of a page survives and mirrors die, the selection
    * rule a crawl-dedup pass actually wants (the canonical URL is the
    * one everything else duplicates, not the one with the most
    * boilerplate appended). One LSH chain feeds BOTH passes: the pair
    * relation is cached and shared by the component supersteps
    * (membership) and the rank supersteps (authority); the election is
    * the q195 max-of-struct aggregate on (rank_ppb, −doc_id).
    *
    * Scale: everything after the LSH chain runs on the dup graph
    * (corpus × dup-rate); both superstep families shuffle the edge
    * relation only; no window, no corpus self-join.
    */
  def authorityCanon(docs: DataFrame): DataFrame = {
    val pairs = Caches.track(
      minhashLsh(docs, bands = 4, rowsPerBand = 2, threshold = 0.8)
        .select(col("doc_a"), col("doc_b")))
    // membership from the shared dup_clusters artifact (round-19):
    // dupClusters(docs, 4, 2, 0.8) IS dupClustersFromPairs over this
    // same pair relation by definition, so q292 stops re-running the
    // component supersteps the artifact already holds; only the rank
    // supersteps still walk the edges here
    val members = dupClusters(docs, bands = 4, rowsPerBand = 2, threshold = 0.8)
    val ranks = Advanced.pageRank(
      pairs.select(col("doc_a").as("a"), col("doc_b").as("b")))
      .select(col("part").as("doc_id"), col("rank_ppb"))
    members
      .join(ranks.hint("shuffle_hash"), Seq("doc_id"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("rank_ppb"), (-col("doc_id")).as("neg_id"))).as("best"))
      .select(col("cluster"), (-col("best.neg_id")).as("rep_doc"),
        col("best.rank_ppb").as("rep_rank_ppb"), col("n_members"))
  }

  def authorityCanon(s: SparkSession, dir: String): DataFrame =
    authorityCanon(Tables.documents(s, dir))

  /** Cross-source chunk-flow matrix (q260): for every PAIR of sources,
    * how many distinct CDC chunk fingerprints they both carry and how
    * much byte mass those shared chunks occupy on each side — the
    * "who shares boilerplate with whom" table that turns q251's
    * per-source cross-dup SHARE into an actionable flow: a pair with
    * heavy one-directional mass is a mirror/syndication relationship, a
    * clique of pairs sharing the same mass is a common template.
    *
    * Scale: the pair relation is a self-equijoin of the (source, fp)
    * DISTINCT relation on fp — per fingerprint that is
    * `ns·(ns−1)/2` pairs, bounded by the SOURCE count squared (a fixed
    * catalog number), never by corpus bytes; output is at most
    * |sources|² rows. The join is shuffle_hash on the high-cardinality
    * fp key; per-side char masses ride the same distinct relation.
    */
  def chunkFlowMatrix(docs: DataFrame): DataFrame = {
    val perFp = Caches.track(
      cdcChunkRelation(
        docs.repartition(shuffleWidth(docs), col("doc_id")),
        carry = Seq("source"))
      .groupBy(col("source"), col("fp"))
      .agg(sum(col("clen")).as("chars")))
    perFp.as("a").hint("shuffle_hash")
      .join(perFp.as("b"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared_fp"),
        sum(col("a.chars")).as("chars_a"),
        sum(col("b.chars")).as("chars_b"))
  }

  def chunkFlowMatrix(s: SparkSession, dir: String): DataFrame =
    chunkFlowMatrix(Tables.documents(s, dir))
}
