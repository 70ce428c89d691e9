package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Dedup

/** Unit coverage for the dedup family on a synthetic corpus with planted
  * exact and near duplicates (oracle-independent sanity; the DuckDB hash
  * gate covers the testdata surface).
  */
class DedupSpec extends SparkSpec {

  private def corpus: DataFrame = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    Seq(
      (0L, base),
      (1L, base), // exact duplicate of 0
      (2L, base.replace("today", "tonight")), // near-dup: 1 word differs
      (3L, "completely different text about spark catalyst optimizer rules and codegen stages"),
      (4L, "short text"), // < 3 words after split? ("short text" = 2 words -> excluded from shingles)
      (5L, "another unrelated document discussing minhash banding and jaccard estimation theory"),
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts under one keeper") {
    val out = Dedup.exact(corpus).collect()
    assert(out.length === 5) // 6 docs, one exact-dup pair
    val dupGroup = out.find(_.getAs[Long]("n") == 2L).get
    assert(dupGroup.getAs[Long]("keeper") === 0L)
  }

  test("ngram jaccard finds the exact pair at 1.0 and the near pair above 0.5") {
    val pairs = Dedup.ngramJaccard(corpus, threshold = 0.5).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    assert(pairs((0L, 1L)) === 1.0)
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) > 0.5 && pairs((0L, 2L)) < 1.0)
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minhash LSH candidates are a subset of ground truth at the same threshold") {
    val truth = Dedup.ngramJaccard(corpus, threshold = 0.8).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val lsh = Dedup.minhashLsh(corpus, bands = 4, rowsPerBand = 2, threshold = 0.8)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(lsh.subsetOf(truth), s"LSH produced non-truth pairs: ${lsh diff truth}")
    // an exact duplicate shares every minhash, hence every band: always caught
    assert(lsh.contains((0L, 1L)))
  }

  test("simhash: identical docs share signatures; near-dups are close in hamming distance") {
    val sig = Dedup.simhash(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("simhash")).toMap
    assert(sig.values.forall(s => s.length == 32 && s.forall(c => c == '0' || c == '1')))
    assert(sig(0L) === sig(1L))
    def hamming(a: String, b: String): Int = a.zip(b).count { case (x, y) => x != y }
    val near = hamming(sig(0L), sig(2L))
    val far = hamming(sig(0L), sig(3L))
    assert(near < far, s"near-dup hamming $near should be < unrelated $far")
  }

  /** Scala-side twin of Corpus.hashBucket (md5 16-bit prefix % 100) for
    * picking doc ids with known split membership.
    */
  private def bucketOf(id: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(4)
    java.lang.Long.parseLong(hex, 16) % 100
  }

  test("contamination: a test-split copy of a train-split doc is fully contaminated") {
    import spark.implicits._
    val trainId = (0L to 500L).find(bucketOf(_) < 80).get
    val testId = (0L to 500L).find(bucketOf(_) >= 90).get
    val cleanTestId = (testId + 1 to 900L).find(bucketOf(_) >= 90).get
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val d = Seq(
      (trainId, shared),
      (testId, shared), // every shingle also in train → ratio 1.0
      (cleanTestId, "unrelated words entirely disjoint vocabulary sequence"),
    ).toDF("doc_id", "text")
    val m = Dedup.contamination(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_sh"), r.getAs[Long]("n_contam"), r.getAs[Double]("contam_ratio")))
      .toMap
    assert(m.keySet === Set(testId, cleanTestId)) // only test-split docs reported
    assert(m(testId) === ((6L, 6L, 1.0)))
    assert(m(cleanTestId) === ((4L, 0L, 0.0)))
  }

  test("dupClusters groups a transitive near-dup chain under the least id") {
    import spark.implicits._
    // 40-word docs: one changed word at an end shifts jaccard only to
    // ~0.95, and 8 one-row bands catch a 0.95 pair unless all 8 minhash
    // slices deterministically disagree ((1-0.95)^8 — md5-deterministic,
    // verified stable by this test)
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val chain1 = base.replace("w40", "x40")
    val chain2 = chain1.replace("w1 ", "x1 ")
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val d = Seq(
      (10L, base), (11L, chain1), (12L, chain2), // one chain
      (20L, other), (21L, other),                // exact pair, separate cluster
      (30L, "totally disjoint singleton document with enough words here"),
    ).toDF("doc_id", "text")
    val clusters = Dedup.dupClusters(d, bands = 8, rowsPerBand = 1, threshold = 0.8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    assert(clusters(10L) === 10L)
    assert(clusters(11L) === 10L)
    assert(clusters(12L) === 10L) // transitive: even if (10,12) missed pairwise
    assert(clusters(20L) === 20L)
    assert(clusters(21L) === 20L)
    assert(!clusters.contains(30L)) // singletons aren't in the dup graph
  }

  test("canonicalDocs elects the longest member per cluster, ties to least id") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, length}
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val longer = base.replace("w40", "x40 and some extra trailing words")
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val d = Seq(
      (10L, base), (11L, longer),  // near-dup pair; 11 has more chars
      (20L, other), (21L, other),  // exact pair; equal chars → least id
    ).toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
    val got = Dedup.canonicalDocs(d, bands = 8, rowsPerBand = 1, threshold = 0.8)
      .collect()
      .map(r => r.getAs[Long]("cluster") ->
        (r.getAs[Long]("rep_doc"), r.getAs[Long]("n_members")))
      .toMap
    assert(got === Map(10L -> ((11L, 2L)), 20L -> ((20L, 2L))))
  }

  test("dupSpans finds the longest shared run and its offsets in both docs") {
    import spark.implicits._
    val shared = (1 to 30).map(i => s"s$i").mkString(" ")
    val d = Seq(
      (1L, s"$shared a1"),  // shared run at word positions 1..30
      (2L, s"b1 $shared"),  // shared run at word positions 2..31
    ).toDF("doc_id", "text")
    val rows = Dedup.dupSpans(d, bands = 8, rowsPerBand = 1, threshold = 0.8).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("doc_a") === 1L)
    assert(r.getAs[Long]("doc_b") === 2L)
    // 28 consecutive shared 3-grams = a 30-word shared span
    assert(r.getAs[Long]("run_len") === 28L)
    assert(r.getAs[Long]("span_words") === 30L)
    assert(r.getAs[Long]("a_start") === 1L)
    assert(r.getAs[Long]("b_start") === 2L)
  }

  test("deltaDedup classifies exact, near, and unique delta docs") {
    import spark.implicits._
    val corpusId = (0L to 500L).find(bucketOf(_) < 95).get
    val deltaIds = (0L to 3000L).filter(bucketOf(_) >= 95).take(3)
    val Seq(dExact, dNear, dUniq) = deltaIds
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = base.replace("w40", "x40")
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val d = Seq(
      (corpusId, base),
      (dExact, base),   // byte-equal to a corpus doc
      (dNear, near),    // jaccard ~0.95 vs corpus doc
      (dUniq, other),   // nothing shared
    ).toDF("doc_id", "text")
    val got = Dedup.deltaDedup(d, bands = 8, rowsPerBand = 1, threshold = 0.8)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(got === Map(dExact -> "exact", dNear -> "near", dUniq -> "unique"))
  }

  test("lshRecallAudit: full recall on a corpus whose one true pair is caught") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, base), (2L, base), // exact dup pair: jaccard 1.0, every band collides
      (3L, (1 to 40).map(i => s"z$i").mkString(" ")),
    ).toDF("doc_id", "text")
    val r = Dedup.lshRecallAudit(d, bands = 8, rowsPerBand = 1, threshold = 0.8)
      .collect().head
    assert(r.getAs[Long]("n_truth") === 1L)
    assert(r.getAs[Long]("n_verified") === 1L)
    assert(r.getAs[Double]("recall") === 1.0)
    assert(r.getAs[Double]("precision") > 0.0)
  }

  test("lshRecallAudit threshold monotonicity: 0.5 vs 0.8 rows obey the band-math invariants") {
    import spark.implicits._
    // planted structure around both operating points: an exact pair
    // (j=1.0, above both), a mid pair (j≈0.6 — above 0.5, below 0.8),
    // and a singleton
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val mid = ((1 to 28).map(i => s"w$i") ++ (29 to 40).map(i => s"y$i"))
      .mkString(" ")
    val d = Seq((1L, base), (2L, base), (3L, mid),
      (4L, (1 to 40).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    def audit(t: Double) =
      Dedup.lshRecallAudit(d, bands = 8, rowsPerBand = 1, threshold = t)
        .collect().head
    val (r05, r08) = (audit(0.5), audit(0.8))
    // candidates come from the BANDS alone — the threshold must not move
    // them (a threshold-dependent candidate stage is the band-math
    // regression this second operating point exists to catch)
    assert(r05.getAs[Long]("n_candidates") === r08.getAs[Long]("n_candidates"))
    // truth and verified both grow monotonically as the gate loosens,
    // and verified never exceeds either bound
    assert(r05.getAs[Long]("n_truth") >= r08.getAs[Long]("n_truth"))
    assert(r05.getAs[Long]("n_verified") >= r08.getAs[Long]("n_verified"))
    assert(r05.getAs[Long]("n_verified") <= r05.getAs[Long]("n_truth"))
    assert(r05.getAs[Long]("n_verified") <= r05.getAs[Long]("n_candidates"))
    // the planted mid doc separates the two rows exactly: only the
    // exact pair clears 0.8, while BOTH of mid's pairings with the
    // exact twins (j≈0.52 each) join it above 0.5
    assert(r08.getAs[Long]("n_truth") === 1L)
    assert(r05.getAs[Long]("n_truth") === 3L)
    assert(r05.getAs[Double]("recall") === 1.0,
      "8x1 banding catches every pair at or above j=0.5 on this corpus")
  }

  test("audit-tier recall ≡ full recall when the cap covers the corpus; tier artifacts get their own names") {
    import spark.implicits._
    // round-17 verdict task 1: the quadratic ground truth is bounded to a
    // deterministic md5 audit tier. A cap at or above the corpus size
    // makes the tier the WHOLE corpus, so the tier-scoped audit must be
    // row-identical to the exhaustive full-corpus path on a planted
    // corpus — the equivalence that licenses reading the tier estimate
    // as the corpus recall at scales where the full truth is unpayable.
    val root = java.nio.file.Files.createTempDirectory("dedup-tier").toString
    val in = s"$root/docs.parquet"
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val mid = ((1 to 28).map(i => s"w$i") ++ (29 to 40).map(i => s"y$i"))
      .mkString(" ")
    ((1L to 6L).map(i => (i, base)) ++ Seq((7L, mid)) ++
      (8L to 20L).map(i => (i, (1 to 40).map(j => s"z${i}_$j").mkString(" "))))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    spark.conf.set("spark.graft.derived.root", s"$root/store")
    try {
      def docs = spark.read.parquet(in)
      def row(capped: Boolean) = {
        val scope = Caches.open()
        try Dedup.lshRecallAudit(docs, bands = 4, rowsPerBand = 2,
          threshold = 0.8, auditCap = if (capped) 1000 else 0)
          .collect().head
        finally scope.release()
      }
      val (tier, full) = (row(capped = true), row(capped = false))
      assert(tier.toSeq === full.toSeq,
        s"cap>=corpus must reproduce the exhaustive audit: $tier vs $full")
      assert(tier.getAs[Long]("n_truth") > 0L, "planted corpus must have truth pairs")
      // the tier artifacts must live under their OWN names — a shared
      // name would merge their build seconds into the full build's pin
      val names = new java.io.File(s"$root/store").listFiles()
        .map(_.getName).filter(!_.startsWith(".")).toSeq
      assert(names.exists(_.startsWith("ngram_jaccard_audit1000_t0p8_")),
        s"tier truth artifact missing its audit-tagged name: $names")
      assert(names.exists(_.startsWith("ngram_jaccard_t0p8_")),
        s"full truth artifact must keep its untagged name: $names")
      assert(names.exists(_.startsWith("lsh_cands_audit1000_b4r2_")),
        s"tier candidate artifact missing its audit-tagged name: $names")
      // a SMALL cap restricts the audit to the tier docs exactly: the
      // result equals the full audit run over auditTier(docs, cap)
      val small = {
        val scope = Caches.open()
        try Dedup.lshRecallAudit(docs, bands = 4, rowsPerBand = 2,
          threshold = 0.8, auditCap = 5).collect().head
        finally scope.release()
      }
      val manual = {
        val scope = Caches.open()
        // in-memory copy of the tier -> inline path, no artifact clash
        val tierDocs = Dedup.auditTier(docs, 5).collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq.toDF("doc_id", "text")
        try Dedup.lshRecallAudit(tierDocs, bands = 4, rowsPerBand = 2,
          threshold = 0.8).collect().head
        finally scope.release()
      }
      assert(small.toSeq === manual.toSeq,
        s"capped audit must equal the full audit over the tier docs: $small vs $manual")
    } finally spark.conf.unset("spark.graft.derived.root")
  }

  test("auditTierProfile: exact counts per source, shares sum to 1, absent source reads zero") {
    import spark.implicits._
    // 40 docs, skewed sources; cap 10 so the tier is a strict subset
    val docs = (1L to 40L).map { i =>
      (i, s"doc $i body", if (i <= 30) "big" else if (i <= 39) "mid" else "rare")
    }.toDF("doc_id", "text", "source")
    val rows = Dedup.auditTierProfile(docs, cap = 10).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(4)))).toMap
    // ground truth straight from the tier definition
    val tierIds = Dedup.auditTier(docs, 10).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(tierIds.size === 10)
    def expect(src: String, lo: Long, hi: Long) =
      ((lo to hi).count(tierIds), (lo to hi).size.toLong)
    val (bigT, bigN) = expect("big", 1L, 30L)
    assert(rows("big") === ((bigN, bigT.toLong, bigT / 10.0)))
    val (midT, midN) = expect("mid", 31L, 39L)
    assert(rows("mid") === ((midN, midT.toLong, midT / 10.0)))
    // every source appears even when the tier misses it entirely
    assert(rows.contains("rare"))
    assert(rows.values.map(_._2).sum === 10L, "tier counts must total the cap")
    assert(math.abs(rows.values.map(_._3).sum - 1.0) < 1e-12,
      "tier shares must sum to 1")
  }

  test("dupRateEstimate: exact when the cap covers the corpus; Horvitz-Thompson scaling when it doesn't") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    // 3 exact twins of one doc -> C(3,2)=3 true pairs at t=0.8; 17 unique
    val docs = ((1L to 3L).map(i => (i, base)) ++
      (4L to 20L).map(i => (i, (1 to 40).map(j => s"u${i}_$j").mkString(" "))))
      .toDF("doc_id", "text")
    val full = Dedup.dupRateEstimate(docs, threshold = 0.8, cap = 1000)
      .collect().head
    assert(full.getAs[Long]("n_docs") === 20L)
    assert(full.getAs[Long]("n_tier_docs") === 20L)
    assert(full.getAs[Long]("n_tier_pairs") === 3L)
    assert(full.getAs[Double]("scale_factor") === 1.0,
      "cap >= corpus must make the estimate exact")
    assert(full.getAs[Double]("est_corpus_pairs") === 3.0)
    // a strict subsample: the estimate is tier pairs x n(n-1)/(m(m-1))
    val part = Dedup.dupRateEstimate(docs, threshold = 0.8, cap = 8)
      .collect().head
    val m = part.getAs[Long]("n_tier_docs")
    assert(m === 8L)
    val expFactor = (20.0 * 19.0) / (m * (m - 1)).toDouble
    assert(part.getAs[Double]("scale_factor") === expFactor)
    // same operation ORDER as the column expression (p·N)/M, not p·(N/M):
    // double arithmetic is deterministic only per association
    assert(part.getAs[Double]("est_corpus_pairs") ===
      part.getAs[Long]("n_tier_pairs").toDouble * (20.0 * 19.0) /
        (m * (m - 1)).toDouble)
  }

  test("dupRateCi: zero variance in the census regime; closed-form HT variance on a strict subsample") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    // census regime: 3 exact twins (a pair triangle: T=3, every endpoint
    // degree 2 -> A=6 ordered, D=0) + 17 unique docs, cap >= corpus
    val docs = ((1L to 3L).map(i => (i, base)) ++
      (4L to 20L).map(i => (i, (1 to 40).map(j => s"u${i}_$j").mkString(" "))))
      .toDF("doc_id", "text")
    val census = Dedup.dupRateCi(docs, threshold = 0.8, cap = 1000)
      .collect().head
    assert(census.getAs[Long]("n_tier_pairs") === 3L)
    assert(census.getAs[Long]("adj_ordered") === 6L)
    assert(census.getAs[Long]("disj_ordered") === 0L)
    assert(census.getAs[Double]("var_est") === 0.0,
      "cap >= corpus is a census: every joint inclusion prob is exactly 1")
    assert(census.getAs[Double]("se_est") === 0.0)
    assert(census.getAs[Double]("rel_se") === 0.0)

    // subsample regime on an all-twins corpus: ANY size-8 md5 tier has
    // T=C(8,2)=28, deg(d)=7 for all 8 docs -> A=8*7*6=336 ordered,
    // D=28*27-336=420 — the closed form is independent of which docs
    // the md5 order picks
    val twins = (1L to 20L).map(i => (i, base)).toDF("doc_id", "text")
    val sub = Dedup.dupRateCi(twins, threshold = 0.8, cap = 8)
      .collect().head
    assert(sub.getAs[Long]("n_docs") === 20L)
    assert(sub.getAs[Long]("n_tier_docs") === 8L)
    assert(sub.getAs[Long]("n_tier_pairs") === 28L)
    assert(sub.getAs[Long]("adj_ordered") === 336L)
    assert(sub.getAs[Long]("disj_ordered") === 420L)
    // the same factor order as the column expressions — double
    // arithmetic is deterministic only per association
    val p2 = (8.0 / 20.0) * (7.0 / 19.0)
    val p3 = p2 * (6.0 / 18.0)
    val p4 = p3 * (5.0 / 17.0)
    val varExp =
      (28.0 * (1.0 - p2)) / (p2 * p2) +
        (336.0 * (p3 - p2 * p2)) / (p3 * (p2 * p2)) +
        (420.0 * (p4 - p2 * p2)) / (p4 * (p2 * p2))
    assert(sub.getAs[Double]("var_est") === varExp)
    val estExp = 28.0 * (20.0 * 19.0) / 56.0
    assert(sub.getAs[Double]("est_corpus_pairs") === estExp)
    assert(sub.getAs[Double]("se_est") ===
      math.sqrt(math.max(varExp, 0.0)))
    assert(sub.getAs[Double]("rel_se") ===
      math.sqrt(math.max(varExp, 0.0)) / estExp)
    // degenerate by design: on an all-twins corpus EVERY size-8 tier
    // reads T=28, so the estimator is constant and its true variance is
    // 0 — the three-class estimator must agree up to float residue
    assert(math.abs(sub.getAs[Double]("var_est")) < 1e-6)

    // mixed composition: twin groups of size 10 and 6 among 40 docs,
    // cap=15 — T/A/D now depend on which docs the md5 order picked, so
    // derive them INDEPENDENTLY by replaying the public tier and
    // enumerating within-group pairs, then hold the operator to the
    // closed form over those independently-derived counts
    val mixed = ((1L to 10L).map(i => (i, base)) ++
      (11L to 16L).map(i => (i, (1 to 40).map(j => s"t$j").mkString(" "))) ++
      (17L to 40L).map(i => (i, (1 to 40).map(j => s"v${i}_$j").mkString(" "))))
      .toDF("doc_id", "text")
    val tierIds = Dedup.auditTier(mixed, 15)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val g1 = tierIds.count(_ <= 10L)
    val g2 = tierIds.count(i => i >= 11L && i <= 16L)
    assert(g1 >= 2 || g2 >= 2,
      "md5 draw left no twin pair in the tier — enlarge the groups")
    val expT = g1.toLong * (g1 - 1) / 2 + g2.toLong * (g2 - 1) / 2
    // every tier member of a group of size k has pair-degree k-1
    val expA = g1.toLong * (g1 - 1) * (g1 - 2) + g2.toLong * (g2 - 1) * (g2 - 2)
    val expD = expT * (expT - 1) - expA
    val mix = Dedup.dupRateCi(mixed, threshold = 0.8, cap = 15)
      .collect().head
    assert(mix.getAs[Long]("n_tier_pairs") === expT)
    assert(mix.getAs[Long]("adj_ordered") === expA)
    assert(mix.getAs[Long]("disj_ordered") === expD)
    val q2 = (15.0 / 40.0) * (14.0 / 39.0)
    val q3 = q2 * (13.0 / 38.0)
    val q4 = q3 * (12.0 / 37.0)
    val varMix =
      (expT.toDouble * (1.0 - q2)) / (q2 * q2) +
        (expA.toDouble * (q3 - q2 * q2)) / (q3 * (q2 * q2)) +
        (expD.toDouble * (q4 - q2 * q2)) / (q4 * (q2 * q2))
    assert(mix.getAs[Double]("var_est") === varMix)
    assert(mix.getAs[Double]("se_est") === math.sqrt(math.max(varMix, 0.0)))

    // empty-truth regime: all-unique corpus, strict subsample -> every
    // count 0, variance 0, rel_se NULL (no division by a zero estimate)
    val uniq = (1L to 20L)
      .map(i => (i, (1 to 40).map(j => s"v${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val none = Dedup.dupRateCi(uniq, threshold = 0.8, cap = 8)
      .collect().head
    assert(none.getAs[Long]("n_tier_pairs") === 0L)
    assert(none.getAs[Long]("adj_ordered") === 0L)
    assert(none.getAs[Long]("disj_ordered") === 0L)
    assert(none.getAs[Double]("var_est") === 0.0)
    assert(none.getAs[Double]("se_est") === 0.0)
    assert(none.isNullAt(none.fieldIndex("rel_se")))
  }

  test("deltaPairUpdate equals the from-scratch mining, with all three pair classes present") {
    import spark.implicits._
    // 200 docs in 10 heavy dup groups: the ~5% md5 delta tier is
    // guaranteed members, so corpus-internal, delta-internal (if two
    // delta docs share a group) and cross pairs all arise
    val docs = (1L to 200L)
      .map(i => (i, (1 to 30).map(j => s"g${i % 10}w$j").mkString(" ")))
      .toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        math.round(r.getAs[Double]("jaccard") * 1e9))).toSet
    val incremental = pairSet(Dedup.deltaPairUpdate(docs))
    val full = pairSet(Dedup.minhashLshInline(
      docs, bands = 4, rowsPerBand = 2, threshold = 0.8))
    graft.Caches.releaseAll()
    assert(incremental === full,
      s"decomposition diverged: extra=${incremental -- full} missing=${full -- incremental}")
    // not vacuous: the delta tier holds docs and contributes cross pairs
    import org.apache.spark.sql.functions.{col => c}
    val deltaIds = docs
      .withColumn("b", graft.operators.Corpus.hashBucket(c("doc_id")))
      .filter(c("b") >= 95).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(deltaIds.nonEmpty, "the md5 split left the delta tier empty")
    assert(full.exists { case (a, b, _) =>
      deltaIds.contains(a) ^ deltaIds.contains(b) },
      "no cross pair — the equality proves nothing about the probe leg")
  }

  test("dupClusters on a corpus with zero dup pairs returns empty without iterating") {
    import spark.implicits._
    // every doc disjoint → empty dup graph; the empty graph is its own
    // fixpoint, so the superstep loop must be skipped outright (the sum
    // probe is NULL on empty labels and would never satisfy the equality
    // convergence test — this used to burn all maxIters no-op jobs)
    val d = (1 to 4)
      .map(i => (i.toLong, (1 to 40).map(j => s"u${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    assert(Dedup.dupClusters(d, bands = 4, rowsPerBand = 2, threshold = 0.8,
      maxIters = 1000).count() === 0L)
    // generous bound: 1000 skipped supersteps would take minutes; the
    // short-circuited path is a handful of jobs
    assert((System.nanoTime() - t0) / 1e9 < 60.0)
  }

  test("embedding near-dup restricts pairs to corpus ids and picks the least keeper") {
    import spark.implicits._
    val dims = 16
    val v = Seq.tabulate(dims)(i => (math.sin(i + 1) * 0.4).toFloat)
    val vNear = v.updated(3, v(3) + 1e-4f)
    val vOther = Seq.tabulate(dims)(i => (math.cos(i * 3 + 1) * 0.4).toFloat)
    // vec 9's near-dup partner (vec 1) is NOT in the document corpus →
    // that pair must be filtered out
    val emb = Seq(0L -> v, 9L -> vNear, 1L -> vNear, 5L -> vOther)
      .toDF("vec_id", "embedding")
    val docs = Seq((0L, "a"), (9L, "b"), (5L, "c")).toDF("doc_id", "text")
    val pairs = Dedup.embeddingNearDup(docs, emb,
      nPlanes = 4, threshold = 0.999, dims = dims)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("keeper")))
    assert(pairs.toSeq === Seq((0L, 9L, 0L)))
  }

  test("boilerplate flags a planted repeated footer within one source only") {
    import spark.implicits._
    val footer = "all rights reserved by the example corpus publishing company"
    // 5 web docs share the footer (minDocs=5 → its shingles are common);
    // the books doc has the SAME footer but is alone in its source → the
    // per-source grouping must NOT flag it; one unique doc, one short doc
    val d = (0L until 5L).map(i =>
      (i, s"unique prose number $i about topic ${i * 7} and subject ${i * 13} $footer", "web")) ++
      Seq(
        (5L, s"a lone book manuscript with entirely original content inside $footer", "books"),
        (6L, "completely unique web text with no repeated template material at all", "web"),
        (7L, "too short", "web")) // < 5 words → dropped, no output row
    val out = Dedup.boilerplate(
        d.toDF("doc_id", "text", "source"), k = 5, minDocs = 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_sh"), r.getAs[Long]("n_boiler"), r.getAs[Double]("boiler_ratio"))).toMap

    assert(!out.contains(7L)) // short doc has no 5-shingles
    assert(out(6L)._2 === 0L && out(6L)._3 === 0.0) // unique doc: nothing flagged
    assert(out(5L)._2 === 0L) // footer is unique WITHIN 'books' → not boilerplate there
    // every footer-carrying web doc has exactly the footer's 5-shingles
    // flagged: a 9-word footer yields 5 five-grams, all common across the
    // 5 docs (the prose words before it differ per doc)
    (0L until 5L).foreach { i =>
      val (nSh, nBoiler, ratio) = out(i)
      assert(nBoiler === 5L, s"doc $i: expected the 5 footer shingles, got $nBoiler")
      assert(ratio === 5.0 / nSh)
    }
  }

  test("sourceOverlap: pairwise shingle jaccard with zero-overlap pairs present") {
    import spark.implicits._
    val d = Seq(
      (0L, "a b c d", "srcA"), // shingles {abc, bcd}
      (1L, "x y z", "srcA"),   // {xyz} -> A = 3 shingles
      (2L, "a b c e", "srcB"), // {abc, bce} -> B = 2
      (3L, "p q r", "srcC"),   // {pqr} -> C = 1
    ).toDF("doc_id", "text", "source")
    val m = Dedup.sourceOverlap(d).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("n_common"), r.getAs[Double]("jaccard"))).toMap
    assert(m.size === 3) // all pairs appear, even with zero overlap
    assert(m(("srcA", "srcB")) === ((3L, 2L, 1L, 1.0 / 4.0))) // share "a b c"
    assert(m(("srcA", "srcC")) === ((3L, 1L, 0L, 0.0)))
    assert(m(("srcB", "srcC")) === ((2L, 1L, 0L, 0.0)))
  }

  test("ngramNovelty: earliest doc is fully novel, a later exact copy fully prior, short docs dropped") {
    import spark.implicits._
    val d = Seq(
      (10L, "a b c d e"),     // first occurrence of all its shingles
      (20L, "a b c d e"),     // exact copy -> every shingle first seen in 10
      (30L, "a b c q r s"),   // {abc} prior (from 10), {bcq,cqr,qrs} novel
      (40L, "tiny one"),      // <3 words -> no shingles, no row
    ).toDF("doc_id", "text")
    val m = Dedup.ngramNovelty(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_sh"), r.getAs[Long]("n_prior"),
          r.getAs[Double]("novelty"))).toMap
    assert(m.keySet === Set(10L, 20L, 30L))
    assert(m(10L) === ((3L, 0L, 1.0)))
    assert(m(20L) === ((3L, 3L, 0.0)))
    assert(m(30L) === ((4L, 1L, 0.75)))
  }

  test("prefixSimJoin equals the ground-truth quadratic exactly (recall guarantee)") {
    // planted corpus has exact dups, near-dups and disjoint docs; the
    // prefix-filtered result must be IDENTICAL to the all-pairs truth,
    // not merely similar — that is the property LSH cannot offer
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    for (t <- Seq(0.3, 0.5, 0.9)) {
      val scope = Caches.open()
      try {
        val truth = pairs(Dedup.ngramJaccard(corpus, threshold = t))
        val got = pairs(Dedup.prefixSimJoin(corpus, threshold = t))
        assert(got === truth, s"prefix filter lost or invented pairs at t=$t")
      } finally scope.release()
    }
  }

  test("containmentJoin equals the naive quadratic containment (recall guarantee)") {
    import org.apache.spark.sql.functions._
    // naive directional truth: full shingle self-join, no prefix filter
    def truth(t: Double) = {
      val sets = Dedup.docShingleSets(corpus)
      val sh = sets.select(col("doc_id"), explode_outer(col("shs")).as("sh"))
      sh.as("a").join(sh.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") =!= col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
        .join(sets.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
        .withColumn("containment", col("inter").cast("double") / col("n_a"))
        .filter(col("containment") >= t)
        .select(col("doc_a"), col("doc_b"), col("containment"))
    }
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("containment"))).toSet
    for (t <- Seq(0.5, 0.9)) {
      val scope = Caches.open()
      try {
        assert(pairs(Dedup.containmentJoin(corpus, t)) === pairs(truth(t)),
          s"prefix filter lost or invented containment pairs at t=$t")
      } finally scope.release()
    }
  }

  test("fuzzyNameMatch: distinct-first, blocked by last token, thresholded distance") {
    import spark.implicits._
    val d = Seq(
      (1L, "cold widget"), (2L, "cold widget"), (3L, "cold widget"), // 3 records, 1 entity
      (4L, "gold widget"),    // dist 1 from "cold widget", same block
      (5L, "cold bolt"),      // different block — never compared
      (6L, "purple widget"),  // same block, dist 5 from both — over threshold
    ).toDF("p_partkey", "p_name")
    val pairs = Dedup.fuzzyNameMatch(d, maxDist = 3).collect()
    assert(pairs.length === 1)
    val p = pairs.head
    assert(p.getAs[String]("name_a") === "cold widget")
    assert(p.getAs[String]("name_b") === "gold widget")
    assert(p.getAs[Int]("dist") === 1)
    assert(p.getAs[Long]("n_a") === 3L) // merge blast radius: 3 records
    assert(p.getAs[Long]("n_b") === 1L)
  }

  test("bloomScreen: never misses an exact hit, counts only test-split docs") {
    val out = graft.operators.Dedup.bloomScreen(
      graft.sources.Tables.documents(spark, sf001)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nSh, nPass, nExact, nFp) = (r.getAs[Long]("n_sh"),
        r.getAs[Long]("n_pass"), r.getAs[Long]("n_exact"), r.getAs[Long]("n_false_pos"))
      // a Bloom filter has no false negatives: every exact member passes
      assert(nPass >= nExact, s"doc ${r.getLong(0)}: pass $nPass < exact $nExact")
      assert(nFp === nPass - nExact)
      assert(nPass <= nSh)
    }
    // the planted near-dups guarantee real cross-split shingle overlap
    assert(out.map(_.getAs[Long]("n_exact")).sum > 0L)
  }

  test("dedupSweep: hand-computed retention at each threshold, zero-filled empty cuts") {
    import spark.implicits._
    // pairs: (0,1) jaccard 1.0 (identical), (0,2) and (1,2) jaccard 1/3
    // (share shingle 'a b c'), doc 3 dup-free
    val docs = Seq(
      (0L, "a b c d"),
      (1L, "a b c d"),
      (2L, "a b c x"),
      (3L, "z y w v")
    ).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dedup.dedupSweep(d).collect()
        .map(r => (r.getAs[Double]("threshold"), r.getAs[Long]("n_pairs"),
          r.getAs[Long]("n_dropped"), r.getAs[Long]("n_docs_affected")))
        .sortBy(_._1)
    val got = run(docs)
    assert(got.toSeq === Seq(
      (0.3, 3L, 2L, 3L),   // all three pairs; docs 1,2 lose to a smaller id
      (0.5, 1L, 1L, 2L),   // only the identical pair survives the cut
      (0.7, 1L, 1L, 2L),
      (0.8, 1L, 1L, 2L),
      (0.9, 1L, 1L, 2L)))
    graft.Caches.releaseAll()
    assert(run(docs.repartition(5)).toSeq === got.toSeq,
      "sweep must be partition-invariant")
    graft.Caches.releaseAll()
  }

  test("clusterSizeHistogram: planted clusters roll up by threshold") {
    // the near-dup pair (0,2) sits at jaccard 11/13 ≈ 0.846: at 0.9 only
    // the exact pair {0,1} clusters; at 0.8 doc 2 joins into a 3-cluster
    def run(t: Double) = {
      val out = Dedup.clusterSizeHistogram(corpus, bands = 4, rowsPerBand = 2, threshold = t)
        .collect()
        .map(r => (r.getAs[Long]("cluster_size"), r.getAs[Long]("n_clusters"),
          r.getAs[Long]("n_docs"))).sortBy(_._1)
      graft.Caches.releaseAll()
      out
    }
    assert(run(0.9).toSeq === Seq((2L, 1L, 2L)))
    assert(run(0.8).toSeq === Seq((3L, 1L, 3L)))
  }

  test("splitLeakage: pairs classified by their endpoints' hash splits") {
    import org.apache.spark.sql.functions.col
    // the near-dup group {0,1,2} (jaccard >= 0.8 pairwise) classifies by
    // each doc's md5-bucket split; cross-check against splitAssign itself
    val splits = graft.operators.Corpus.splitAssign(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val expected = Seq((0L, 1L), (0L, 2L), (1L, 2L))
      .groupBy { case (a, b) => (splits(a), splits(b)) }
      .map { case ((sa, sb), ps) => (sa, sb, ps.size.toLong, sa != sb) }
      .toSet
    val got = Dedup.splitLeakage(corpus, threshold = 0.8).collect()
      .map(r => (r.getAs[String]("split_a"), r.getAs[String]("split_b"),
        r.getAs[Long]("n_pairs"), r.getAs[Boolean]("is_leak"))).toSet
    graft.Caches.releaseAll()
    assert(got === expected)
    assert(got.map(_._3).sum === 3L, "all verified pairs classified")
  }

  test("lshCostPlanner: count-derived candidate volume equals the materialized band join") {
    val docs = corpus
    val got = Dedup.lshCostPlanner(docs).collect()
      .map(r => (r.getAs[Long]("bands"), r.getAs[Long]("rows_per_band")) ->
        ((r.getAs[Long]("n_buckets"), r.getAs[Long]("n_singletons"),
          r.getAs[Long]("max_bucket"), r.getAs[Long]("n_candidates")))).toMap
    graft.Caches.releaseAll()
    assert(got.keySet === Set((8L, 1L), (4L, 2L), (2L, 4L)))
    // the planner promises: n_candidates = the pair count the band
    // self-join WOULD produce (pre-distinct) — check by running that join
    for (((b, r), (nBuckets, nSingle, maxBucket, nCand)) <- got) {
      val keys = Dedup.bandKeys(
        Dedup.docShingleSets(docs), b.toInt, r.toInt)
      import org.apache.spark.sql.functions.col
      val actual = keys.as("a").join(keys.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id")).count()
      assert(nCand === actual, s"config ($b,$r)")
      assert(maxBucket >= 2L, s"planted dups must collide somewhere ($b,$r)")
      assert(nBuckets >= nSingle)
    }
  }

  test("cdcChunks: plain-JVM CDC replay — boundaries, fingerprints, dup mass; shift-invariant shared passage") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def chunksOf(text: String): Seq[String] = {
      val interior = (1 to math.max(text.length - 7, 0))
        .filter(i => md5hex(text.substring(i - 1, i + 7)).startsWith("0"))
        .map(_ + 7)
      val cuts = (interior :+ text.length).distinct.sorted
      cuts.zip(0 +: cuts.dropRight(1)).map { case (c, p) => text.substring(p, c) }
    }
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val texts = Seq(
      (0L, "s", shared),
      (1L, "s", "PREFIX INSERTED HERE " + shared), // shifted copy of the passage
      (2L, "s", "tiny"),                           // sub-window doc: one chunk
      (3L, "s", "completely different content with no overlap at all whatsoever"),
      (4L, "t", shared + " TRAILING EDIT"))        // cross-SOURCE shifted copy
    val docs = texts.map { case (id, src, t) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(texts.flatMap(t => chunksOf(t._3)).flatten.size ===
      texts.map(_._3.length).sum,
      "chunks must partition every document exactly")
    // plain-JVM recompute of the full profile, cross-source spread included
    val bySource = texts.groupBy(_._2).view.mapValues(_.flatMap(t => chunksOf(t._3)))
    val spread = texts.flatMap { case (_, src, t) =>
      chunksOf(t).distinct.map(c => (md5hex(c), src)) }
      .distinct.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val expected = bySource.map { case (src, cs) =>
      val fps = cs.map(md5hex)
      val nCross = fps.count(spread(_) > 1).toLong
      src -> ((fps.size.toLong, fps.distinct.size.toLong,
        cs.map(_.length).sum.toDouble / fps.size,
        1.0 - fps.distinct.size.toDouble / fps.size,
        nCross, nCross.toDouble / fps.size))
    }.toMap
    assert(expected("s")._5 > 0L && expected("t")._5 > 0L,
      "the planted passage must realign into cross-source chunk hits")
    for (parts <- Seq(1, 3)) {
      val got = Dedup.cdcChunks(docs.repartition(parts)).collect()
        .map(r => r.getAs[String]("source") ->
          ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_distinct"),
            r.getAs[Double]("mean_chunk_len"),
            r.getAs[Double]("dup_chunk_share"),
            r.getAs[Long]("n_cross_chunks"),
            r.getAs[Double]("cross_dup_share")))).toMap
      graft.Caches.releaseAll()
      assert(got === expected, s"CDC profile diverged at $parts partitions")
    }
    // the CDC contract itself: the shared passage must contribute at
    // least one identical chunk from both its shifted and unshifted copy
    val c0 = chunksOf(texts(0)._2).toSet
    val c1 = chunksOf(texts(1)._2).toSet
    assert((c0 intersect c1).nonEmpty,
      "content-defined cuts must realign after an insertion")
  }

  test("exactSubstringDedup: planted shared passages at shifted offsets — exact token mass, span election, char offsets") {
    import spark.implicits._
    // a 12-token passage planted into two docs at DIFFERENT offsets, and
    // a second 9-token passage shared by docs 0 and 2 — k=8 windows
    val passage = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"   // 12 tokens
    val passage2 = "one two three four five six seven eight nine"                                // 9 tokens
    val d0 = s"$passage filler0a fillerX fillerY $passage2"            // both passages
    val d1 = s"lead1 lead2 lead3 $passage tail1 tail2"                 // passage shifted by 3
    val d2 = s"$passage2 mid1 mid2 mid3 mid4 mid5 mid6 mid7 mid8"      // passage2 at front
    val d3 = "unique0 " + (1 to 20).map(i => s"unique$i").mkString(" ")// no shared runs
    // within-doc repetition only: an 8-token run repeated INSIDE one doc
    // must NOT count (cross-document semantics)
    val rep = "r1 r2 r3 r4 r5 r6 r7 r8"
    val d4 = s"$rep $rep zzz1 zzz2 zzz3"
    val texts = Seq(0L -> d0, 1L -> d1, 2L -> d2, 3L -> d3, 4L -> d4)
    val docs = texts.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

    // plain-JVM recompute of the contract
    def wordsOf(t: String) = t.split(" ").toSeq
    val grams = texts.map { case (id, t) =>
      id -> wordsOf(t).sliding(8).zipWithIndex
        .map { case (g, i) => (i + 1, g.mkString(" ")) }.toSeq
    }.toMap
    val byGram = grams.toSeq.flatMap { case (id, gs) => gs.map { case (_, g) => (g, id) } }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val expected = texts.flatMap { case (id, t) =>
      val sharedPs = grams(id).collect { case (p, g) if byGram(g).size >= 2 => p }
      if (sharedPs.isEmpty) None else {
        val islands = sharedPs.foldLeft(Vector.empty[Vector[Int]]) { (acc, p) =>
          if (acc.nonEmpty && p - acc.last.last <= 8) acc.init :+ (acc.last :+ p)
          else acc :+ Vector(p)
        }
        val spans = islands.map(is => (is.head, is.last + 7 - is.head + 1))
        val (topS, topLen) = spans.maxBy { case (s, len) => (len, -s) }
        val w = wordsOf(t)
        val charStart = if (topS == 1) 1L else w.take(topS - 1).mkString(" ").length + 2L
        Some(id -> ((w.size.toLong, spans.size.toLong, spans.map(_._2.toLong).sum,
          topS.toLong, topLen.toLong, charStart)))
      }
    }.toMap
    assert(expected.keySet === Set(0L, 1L, 2L), "planted dups only; d3/d4 excluded")
    // the shifted copy carries the same dup TOKEN MASS as the original passage
    assert(expected(1L)._3 === 12L)

    val got = Dedup.exactSubstringDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_spans"),
          r.getAs[Long]("dup_tokens"), r.getAs[Long]("top_span_start"),
          r.getAs[Long]("top_span_tokens"), r.getAs[Long]("top_span_char_start")))).toMap
    graft.Caches.releaseAll()
    assert(got === expected, "per-doc span profile diverged from the JVM recompute")
    // char offset sanity against the raw text: the elected span's first
    // token must start exactly there
    for ((id, t) <- texts if got.contains(id)) {
      val (_, _, _, topS, _, charStart) = got(id)
      val tok = wordsOf(t)(topS.toInt - 1)
      assert(t.substring(charStart.toInt - 1).startsWith(tok),
        s"doc $id: char offset $charStart must land on token '$tok'")
    }
  }

  test("exactSubstringScrub: shared spans cut from ALL occurrences, untouched docs pass through verbatim") {
    import spark.implicits._
    val passage = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima" // 12 tokens
    val d0 = s"$passage tail0a tail0b"
    val d1 = s"lead1 lead2 $passage"
    val d2 = "all unique content here nothing shared with anyone at all ok fine"
    val texts = Seq(0L -> d0, 1L -> d1, 2L -> d2)
    val docs = texts.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Dedup.exactSubstringScrub(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("removed_tokens"),
          r.getAs[String]("text_clean")))).toMap
    graft.Caches.releaseAll()
    // BOTH copies of the passage are cut (train-zero-times policy)
    assert(got(0L) === ((14L, 12L, "tail0a tail0b")))
    assert(got(1L) === ((14L, 12L, "lead1 lead2")))
    // untouched doc passes through byte-identical, zero removed
    assert(got(2L) === ((12L, 0L, d2)))
  }

  test("decontamScrub: eval passages cut from train docs only; eval tier absent; train-train overlap untouched") {
    import spark.implicits._
    val passage = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima" // 12 tokens
    val trainShared = "one two three four five six seven eight nine ten" // 10 tokens
    val texts = Seq(
      3L -> s"evalprefix $passage",              // 3 % 10 == 3: the EVAL doc
      1L -> s"$passage traintail",               // contaminated train doc
      2L -> s"lead $trainShared",                // train-train overlap pair...
      4L -> s"$trainShared tail",                // ...must NOT be scrubbed
      5L -> "all unique content here nothing shared with anyone at all",
    )
    val docs = texts.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Dedup.decontamScrub(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("removed_tokens"),
          r.getAs[String]("text_clean")))).toMap
    graft.Caches.releaseAll()
    // the eval tier never appears in the scrubbed output
    assert(!got.contains(3L), "eval docs must not be emitted")
    // the contaminated train doc loses exactly the eval passage
    assert(got(1L) === ((13L, 12L, "traintail")))
    // train-train shared runs are NOT this operator's business (q259 is)
    assert(got(2L) === ((11L, 0L, s"lead $trainShared")))
    assert(got(4L) === ((11L, 0L, s"$trainShared tail")))
    assert(got(5L)._2 === 0L)
  }

  test("authorityCanon: the path center wins the election by rank, not by content size") {
    import spark.implicits._
    // A(101) — B(102) — C(103): B near-dups both ends, A vs C drops
    // below the 0.8 verify bar (A–B: 1 changed shingle, 47/49 = 0.96;
    // B–C: 5, 43/53 = 0.81; A–C: 6, 42/54 = 0.78), so the dup graph is
    // a PATH and B (degree 2) carries the highest fixed-point PageRank
    // — the authority election must pick B, whatever the text sizes.
    val base = (1 to 50).map(i => s"w$i")
    val a = base.mkString(" ")
    val b = (base.dropRight(1) :+ "zzz").mkString(" ")
    val c = (base.take(19) ++ Seq("yy1", "yy2", "yy3") ++
      base.slice(22, 49) :+ "zzz").mkString(" ")
    val docs = Seq((101L, a), (102L, b), (103L, c)).map { case (id, t) =>
      (id, t, "en", "s", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Dedup.authorityCanon(docs).collect()
    graft.Caches.releaseAll()
    assert(got.length === 1, s"one path cluster expected: ${got.toSeq}")
    val r = got.head
    assert(r.getAs[Long]("cluster") === 101L)
    assert(r.getAs[Long]("rep_doc") === 102L,
      s"the degree-2 center must win the authority election: $r")
    assert(r.getAs[Long]("n_members") === 3L)
    // exact fixed-point replay on the path: 3 supersteps, ppb grid
    assert(r.getAs[Long]("rep_rank_ppb") === 1741625000L)
  }

  test("chunkFlowMatrix: shared chunk fingerprints per source pair with per-side byte mass") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def chunksOf(text: String): Seq[String] = {
      val interior = (1 to math.max(text.length - 7, 0))
        .filter(i => md5hex(text.substring(i - 1, i + 7)).startsWith("0"))
        .map(_ + 7)
      val cuts = (interior :+ text.length).distinct.sorted
      cuts.zip(0 +: cuts.dropRight(1)).map { case (c, p) => text.substring(p, c) }
    }
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val texts = Seq(
      (0L, "sa", shared),
      (1L, "sb", "PREFIX BLOCK " + shared),
      (2L, "sc", "nothing in common with the others whatsoever truly"),
      (3L, "sa", shared + " and sa again"))
    val docs = texts.map { case (id, src, t) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // plain-JVM recompute: per (source, fp) char mass, pair on fp
    val pf = texts.flatMap { case (_, src, t) => chunksOf(t).map(c => ((src, md5hex(c)), c.length.toLong)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expected = (for {
      ((sa, fa), ca) <- pf.toSeq; ((sb, fb), cb) <- pf.toSeq
      if fa == fb && sa < sb
    } yield ((sa, sb), (1L, ca, cb)))
      .groupBy(_._1).view.mapValues(vs =>
        (vs.size.toLong, vs.map(_._2._2).sum, vs.map(_._2._3).sum)).toMap
    assert(expected.contains(("sa", "sb")), "planted passage must link sa and sb")
    assert(!expected.keySet.exists { case (a, b) => a == "sc" || b == "sc" },
      "the unshared source must appear in no pair")
    val got = Dedup.chunkFlowMatrix(docs).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        ((r.getAs[Long]("n_shared_fp"), r.getAs[Long]("chars_a"),
          r.getAs[Long]("chars_b")))).toMap
    graft.Caches.releaseAll()
    assert(got === expected, "flow matrix diverged from the JVM recompute")
  }

  test("dupAssortativity equals the plain-JVM Pearson recompute over the q22 edges; cliques are NULL-variance") {
    // recompute over the test tables: same edges, moments in plain scala
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val pairs = Dedup.minhashLsh(docs, bands = 4, rowsPerBand = 2, threshold = 0.8)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    graft.Caches.releaseAll()
    assert(pairs.nonEmpty, "sf0.001 must contain near-dup edges")
    val deg = pairs.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val xy = pairs.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a))) }
    val n = xy.size.toLong
    val sx = xy.map(_._1).sum; val sxx = xy.map(t => t._1 * t._1).sum
    val sxy = xy.map(t => t._1 * t._2).sum
    val expected = (n * sxy - sx * sx).toDouble / (n * sxx - sx * sx).toDouble
    val row = Dedup.dupAssortativity(docs).collect().head
    graft.Caches.releaseAll()
    assert(row.getAs[Long]("n_edges") === pairs.length.toLong)
    assert(row.getAs[Double]("mean_degree") === sx.toDouble / n)
    assert(row.getAs[Double]("assortativity") === expected,
      "moment pass diverged from the JVM recompute")

    // a pure clique has zero degree variance -> NULL assortativity
    import spark.implicits._
    val clique = (0L to 3L).map(i => (i, "same same same text here ok", "en", "s", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val c = Dedup.dupAssortativity(clique).collect().head
    graft.Caches.releaseAll()
    assert(c.getAs[Long]("n_edges") === 6L, "K4 must yield all 6 edges")
    assert(c.isNullAt(c.fieldIndex("assortativity")),
      "equal-degree graph must yield NULL, not NaN or 0")
  }

  test("contaminationMatrix: hand cells — per eval-source islands, dedup across eval docs, clean sources absent") {
    import spark.implicits._
    // eval tier = doc_id % 10 == 3; k = 3 keeps the hand windows small.
    // Train doc 1 carries one 4-token passage from evalA (windows p3, p4
    // merge into one island covering "a b c d") and one 3-token passage
    // from evalB (p9); doc 23 duplicates evalA's passage so the
    // (fp, eval_source) dedup is exercised; train doc 2 is clean.
    val docs = Seq(
      (3L, "a b c d e", "evalA"),
      (23L, "a b c d zz", "evalA"),
      (13L, "x y z w", "evalB"),
      (1L, "q1 q2 a b c d q3 q4 x y z", "s1"),
      (2L, "m1 m2 m3 m4 m5 m6", "s2")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.contaminationMatrix(docs, k = 3).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      ("s1", "evalA") -> ((1L, 2L, 4L)),
      ("s1", "evalB") -> ((1L, 1L, 3L))),
      s"hand matrix mismatch: $got")
  }

  test("nearDupContamination: only eval-boundary-crossing verified pairs count, roles oriented") {
    import spark.implicits._
    // doc 3 (eval) is an exact copy of train doc 5 -> one crossing pair
    // at jaccard 1.0; docs 1/2 are a TRAIN-TRAIN dup pair and must not
    // appear; doc 13 (eval) is clean
    val docs = Seq(
      (3L, "alpha beta gamma delta epsilon", "evalA"),
      (5L, "alpha beta gamma delta epsilon", "s1"),
      (1L, "uno dos tres cuatro cinco seis", "s1"),
      (2L, "uno dos tres cuatro cinco seis", "s1"),
      (13L, "zeta eta theta iota kappa", "evalB")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.nearDupContamination(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(("s1", "evalA") -> ((1L, 1L, 1000000L))),
      s"only the crossing pair may count, train-train dups excluded: $got")
  }

  test("ngram truth at t >= 0.5 equals the 0.5 truth filtered at t (round-18 artifact derivation)") {
    import spark.implicits._
    // plant a MID-BAND pair: an interior word change kills 3 shingles,
    // so (0, 6) lands at jaccard 9/15 = 0.6 — in the 0.5 truth, out of
    // the 0.8 one (the derivation must actually filter something here)
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val planted = corpus.unionByName(
      Seq((6L, base.replace("jumps", "leaps"))).toDF("doc_id", "text"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard"))).toSet
    val t08 = rows(Dedup.ngramJaccard(planted, threshold = 0.8))
    val t05 = rows(Dedup.ngramJaccard(planted, threshold = 0.5))
    assert(t08 === t05.filter(_._3 >= 0.8),
      s"t=0.8 truth must equal t=0.5 truth filtered: $t08 vs $t05")
    assert(t05.exists(t => t._1 == 0L && t._2 == 6L && t._3 < 0.8),
      s"planted mid-band pair missing from the 0.5 truth: $t05")
  }

  test("ngram truth 0.3-base chain equals the direct mine at every sweep threshold (round-19 derivation)") {
    import spark.implicits._
    // the round-18 mid-band plant plus a LOW-BAND pair: two interior
    // word changes put (0, 7) at jaccard 7/17 ≈ 0.41 — inside the 0.3
    // base, outside every stricter cut, so the chain's base filter and
    // each derived threshold filter all separate something here
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val planted = corpus.unionByName(Seq(
      (6L, base.replace("jumps", "leaps")),
      (7L, base.replace("jumps", "leaps").replace("river", "creek")))
      .toDF("doc_id", "text"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard"))).toSet
    for (t <- Seq(0.3, 0.5, 0.7, 0.8, 0.9)) {
      val scope = Caches.open()
      try {
        // ngramJaccard(t > 0.3) formulates as base-mine + filter (the
        // q217/q21 shared-artifact chain); the direct inline mine at t
        // is the retired shape — they must agree pair for pair, jaccard
        // values included
        val chained = rows(Dedup.ngramJaccard(planted, threshold = t))
        val direct = rows(Dedup.ngramJaccardInline(planted, threshold = t))
        assert(chained === direct, s"chain != direct mine at t=$t")
      } finally scope.release()
    }
    val t03 = rows(Dedup.ngramJaccard(planted, threshold = 0.3))
    assert(t03.exists(t => t._1 == 0L && t._2 == 7L && t._3 < 0.5),
      s"planted low-band pair missing from the 0.3 base: $t03")
  }
}
