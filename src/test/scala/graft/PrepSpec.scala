package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{Prep, Relational}

/** Unit coverage for dataset-preparation operators (clean, quality filter,
  * stratified sample, bigram LM) and the set/pivot/outer-join relational
  * additions, on corpora with hand-computable truth.
  */
class PrepSpec extends SparkSpec {

  private def docs: DataFrame = {
    import spark.implicits._
    Seq(
      (0L, "The quick, brown fox!", "en", "web", 21L),
      (1L, "a b", "en", "web", 3L),
      (2L, "plain lower text with several simple words here now ten", "en", "books", 56L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Scala twin of the operator's md5 lottery (first 12 hex of
    * md5(doc_id)) so expected winners are computable in the test.
    */
  private def lotteryOf(id: Long): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)

  test("domainCap keeps at most k per source, in md5-lottery order") {
    import spark.implicits._
    val d = (0L to 9L).map(i => (i, s"text $i", "en", "big", 6L))
      .++(Seq((100L, "t", "en", "small", 1L), (101L, "t", "en", "small", 1L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Prep.domainCap(d, k = 3).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Long]("rk")))
    val bigWinners = (0L to 9L).sortBy(lotteryOf).take(3)
    assert(got.filter(_._1 == "big").sortBy(_._3).map(_._2).toSeq === bigWinners)
    // a source under the cap keeps everything, still lottery-ranked
    val smallWinners = Seq(100L, 101L).sortBy(lotteryOf)
    assert(got.filter(_._1 == "small").sortBy(_._3).map(_._2).toSeq === smallWinners)
    assert(got.length === 5)
  }

  test("mixtureWeights: exact budget reconciliation and alpha=1/4 weights") {
    import spark.implicits._
    // token counts by construction: 4, 2, 1 (split on single space)
    val d = Seq(
      (0L, "a b c d", "en", "s1", 7L),
      (1L, "e f", "en", "s2", 3L),
      (2L, "g", "en", "s3", 1L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Prep.mixtureWeights(d, budgetTokens = 101L).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("w_int"),
          r.getAs[Long]("alloc_tokens"), r.getAs[Double]("epochs")))
      .toMap
    def wInt(n: Long): Long = math.floor(math.sqrt(math.sqrt(n.toDouble)) * 1e6).toLong
    assert(rows("s1")._1 === 4L && rows("s1")._2 === wInt(4))
    assert(rows("s2")._1 === 2L && rows("s2")._2 === wInt(2))
    assert(rows("s3")._1 === 1L && rows("s3")._2 === wInt(1))
    // allocations reconcile EXACTLY to the budget (largest remainder)
    assert(rows.values.map(_._3).sum === 101L)
    // epochs is the single-division ratio
    rows.values.foreach { case (n, _, alloc, ep) =>
      assert(ep === alloc.toDouble / n)
    }
  }

  test("repetitionRatios: duplicate word and bigram mass with hand-computed truth") {
    import spark.implicits._
    val d = Seq(
      (0L, "a a a b", "en", "web", 7L),      // 4 words, 2 distinct; bigrams: "a a","a a","a b" → 3, 2 distinct
      (1L, "x", "en", "web", 1L),            // single word: bigram ratio defined 0.0
      (2L, "p q r s", "en", "web", 7L),      // all distinct
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = Prep.repetitionRatios(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_words"), r.getAs[Double]("dup_word_ratio"),
          r.getAs[Double]("dup_bigram_ratio"))).toMap
    assert(m(0L) === ((4, 0.5, 1.0 / 3.0)))
    assert(m(1L) === ((1, 0.0, 0.0)))
    assert(m(2L) === ((4, 0.0, 0.0)))
  }

  test("piiScrub redacts emails, phones, and digit runs with audit counts") {
    import spark.implicits._
    val d = Seq(
      (0L, "mail bob@example.com or call 555-123-4567 room 42", "en", "web", 49L),
      (1L, "no pii here at all", "en", "web", 18L),
      (2L, "ids 7 8 9 and a.b-c@d.org twice a.b-c@d.org", "en", "web", 43L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = Prep.piiScrub(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_emails"), r.getAs[Int]("n_phones"), r.getAs[Int]("n_numbers"))).toMap
    assert(m(0L) === ((1, 1, 1))) // 42 survives; digits inside email/phone don't count
    assert(m(1L) === ((0, 0, 0)))
    assert(m(2L) === ((2, 0, 3)))
    // fingerprint changes only when something was redacted
    val fp = Prep.piiScrub(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("scrubbed_fp")).toMap
    import org.apache.spark.sql.functions.{col, md5}
    val rawFp = d.select(col("doc_id"), md5(col("text")).as("fp")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp")).toMap
    assert(fp(0L) !== rawFp(0L))
    assert(fp(1L) === rawFp(1L))
  }

  test("mixtureSample downsamples the dominant source toward the smallest") {
    import spark.implicits._
    // 400 docs from "crawl", 25 from "curated": crawl keeps ~sqrt(25/400)=25%
    val d = ((0L until 400L).map(i => (i, s"t$i", "en", "crawl", 5L)) ++
      (1000L until 1025L).map(i => (i, s"t$i", "en", "curated", 5L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = Prep.mixtureSample(d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Double]("keep_rate")))
    val bySource = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySource("curated") === 25) // smallest source keeps everything
    val crawlKept = bySource.getOrElse("crawl", 0)
    // hash-bucketed 25% rate: expect ~100 of 400, generous band
    assert(crawlKept > 60 && crawlKept < 140, s"crawl kept $crawlKept of 400")
    assert(kept.filter(_._2 == "crawl").forall(_._3 === 0.25))
    // determinism: same docs kept on a repartitioned input
    val kept2 = Prep.mixtureSample(d.repartition(13)).collect()
      .map(r => r.getAs[Long]("doc_id")).sorted
    assert(kept2.toSeq === kept.map(_._1).sorted.toSeq)
  }

  test("chunk: overlapping windows cover the doc with a short tail") {
    import spark.implicits._
    val text500 = "ab" * 250 // 500 chars
    val d = Seq((0L, text500, "en", "web", 500L), (1L, "tiny", "en", "web", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Prep.chunk(d, chunkSize = 200, overlap = 50).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_off")) -> r.getAs[Int]("chunk_len"))
      .toMap
    // stride 150, stop at len-overlap=450: offsets 1, 151, 301 — and the
    // last window (301..500) reaches the end, so coverage is complete
    assert(rows.keys.filter(_._1 == 0L).map(_._2).toSeq.sorted === Seq(1, 151, 301))
    assert(rows((0L, 1)) === 200)
    assert(rows((0L, 301)) === 200)
    val lastCovered = rows.keys.filter(_._1 == 0L).map(o => o._2 + rows(o) - 1).max
    assert(lastCovered === 500)
    // a doc shorter than one window still yields exactly one chunk
    assert(rows.keys.filter(_._1 == 1L).map(_._2).toSeq === Seq(1))
    assert(rows((1L, 1)) === 4)
  }

  test("lmScore: mean conditional bigram probability under the corpus LM") {
    import spark.implicits._
    val d = Seq(
      (0L, "a b", "en", "web", 3L),
      (1L, "a b", "en", "web", 3L),
      (2L, "a c", "en", "web", 3L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    // LM: p(b|a) = 2/3, p(c|a) = 1/3
    val m = Prep.lmScore(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("lm_score"))).toMap
    assert(m(0L)._1 === 1L)
    assert(math.abs(m(0L)._2 - 2.0 / 3.0) < 1e-12)
    assert(math.abs(m(2L)._2 - 1.0 / 3.0) < 1e-12)
    // the common phrasing scores higher than the rare one
    assert(m(0L)._2 > m(2L)._2)
  }

  test("textClean lowercases, strips punctuation, collapses runs") {
    val m = Prep.textClean(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Int]("n_raw"), r.getAs[Int]("n_clean"))).toMap
    assert(m(0L) === (("the quick brown fox", 21, 19)))
    assert(m(1L) === (("a b", 3, 3)))
  }

  test("qualityFilter emits keep verdict with comma-joined reasons") {
    val m = Prep.qualityFilter(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), r.getAs[String]("reasons"))).toMap
    // doc 0: 21 chars (<50), 4 words (<10); punct 2/21 = 0.095 is under the
    // 0.10 high_punct line
    assert(m(0L)._1 === false)
    assert(m(0L)._2 === "too_short,few_words")
    // doc 2: 56 chars (>=50), 10 words (not <10), no punctuation → keep
    assert(m(2L) === ((true, "")))
  }

  test("bigramLm counts adjacent pairs with conditional probability") {
    import spark.implicits._
    val d = Seq(
      (0L, "a b a b c", "en", "w", 9L),
      (1L, "a", "en", "w", 1L), // 1-word doc contributes nothing
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = Prep.bigramLm(d).collect()
      .map(r => r.getAs[String]("bigram") -> (r.getAs[Long]("n"), r.getAs[Double]("p_cond"))).toMap
    // bigrams: a b, b a, a b, b c → c(a b)=2, c(b a)=1, c(b c)=1
    assert(m("a b") === ((2L, 1.0)))          // P(b|a) = 2/2
    assert(m("b a") === ((1L, 0.5)))          // P(a|b) = 1/2
    assert(m("b c") === ((1L, 0.5)))
    assert(m.size === 3)
  }

  test("stratified sample keeps a deterministic per-language subset") {
    val a = Prep.stratifiedSample(docs).collect().map(_.getAs[Long]("doc_id")).sorted
    val b = Prep.stratifiedSample(docs).collect().map(_.getAs[Long]("doc_id")).sorted
    assert(a === b)
  }

  test("intersect/except split users by event-type membership") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("prep-events").toString
    // ts is int64 nanos in the driver's events parquet (see Sources.events)
    Seq(
      (1L, 1700000000L * 1000000000L, 10L, "click", 1.0, "{}"),
      (2L, 1700000000L * 1000000000L, 10L, "purchase", 1.0, "{}"),
      (3L, 1700000000L * 1000000000L, 20L, "click", 1.0, "{}"),
      (4L, 1700000000L * 1000000000L, 30L, "purchase", 1.0, "{}"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val both = Relational.intersectUsers(spark, dir).collect().map(_.getLong(0)).sorted
    val only = Relational.exceptUsers(spark, dir).collect().map(_.getLong(0)).sorted
    assert(both === Array(10L))
    assert(only === Array(20L))
  }

  test("packSequences matches an independent greedy pack per shard, incl. the straddle rule") {
    // small budget on the real corpus → many sequences, many straddling docs
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val budget = 50
    val out = Prep.packSequences(docs, budget = budget, shards = 4).collect()
    assert(out.length === docs.count()) // every doc packed exactly once

    var sawStraddle = false
    out.groupBy(_.getAs[Int]("shard")).foreach { case (shard, rows) =>
      // replay the greedy pack in plain Scala: walk the shard in doc_id
      // order; a doc's sequence is where its FIRST token lands
      var cum = 0L
      rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        val n = r.getAs[Long]("n_tokens")
        val expectedSeq = (cum / budget).toInt
        assert(r.getAs[Int]("seq_id") === expectedSeq,
          s"shard $shard doc ${r.getAs[Long]("doc_id")}: seq mismatch")
        if (cum / budget != (cum + n - 1) / budget) sawStraddle = true
        cum += n
      }
    }
    // the invariant above is only interesting if boundary-straddling docs
    // actually occurred (they must, with 50-token budgets and real docs)
    assert(sawStraddle, "no document straddled a budget boundary — test too weak")
  }

  test("curationFunnel: stages shrink monotonically and splits reconcile to the sample") {
    val m = graft.operators.Prep.curationFunnel(
      graft.sources.Tables.documents(spark, sf001)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("1_all") >= m("2_quality"))
    assert(m("2_quality") >= m("3_dedup"))
    assert(m("3_dedup") >= m("4_sampled"))
    val splits = m.collect { case (k, v) if k.startsWith("5_") => v }.sum
    assert(splits === m("4_sampled"), s"splits must partition the sample: $m")
    // the salted split hash must actually spread (the unsalted bucket
    // would put every sampled doc in train)
    assert(m.keys.count(_.startsWith("5_")) >= 2, s"degenerate split: $m")
  }

  test("dsirWeights: target-language docs score higher and the score is partition-invariant") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val w = graft.operators.Prep.dsirWeights(docs)
    val byDoc = w.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("mean_lr"), r.getAs[Double]("dsir_weight")))
      .toMap
    // every doc with >= 2 words scores; mean_lr is bounded by 1 because
    // target ⊆ raw forces every bucket ratio <= 10^6 on the integer grid
    assert(byDoc.nonEmpty)
    byDoc.values.foreach { case (n, ml, dw) =>
      assert(n > 0L); assert(ml > 0.0 && ml <= 1.0); assert(dw > 0.0)
    }
    // the signal: the target slice ('en') must out-score every other
    // language on average — that is the entire point of the operator
    val langOf = docs.select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byLang = byDoc.toSeq.groupBy { case (id, _) => langOf(id) }
      .map { case (l, xs) => l -> xs.map(_._2._3).sum / xs.size }
    val (en, rest) = (byLang("en"), byLang.filter(_._1 != "en").values)
    rest.foreach(r => assert(en > r, s"en=$en must beat $byLang"))
    // bit-identical under a different input partitioning (the exactness
    // contract: integer lr sums are aggregation-order-independent)
    val re = graft.operators.Prep.dsirWeights(docs.repartition(7)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("mean_lr"), r.getAs[Double]("dsir_weight")))
      .toMap
    assert(re === byDoc)
  }

  test("filterSweep: hand-computed bins, clamped top bin, cumulative retention from best down") {
    import spark.implicits._
    // scores: 'the cat' = 1/2 -> bin 10; 'the the' = 1 -> clamps to 19
    // (floor(1.0*20)=20 is out of range); 'cat dog bird' = 0 -> bin 0.
    val docs = Seq(
      (0L, "the cat"),
      (1L, "the the"),
      (2L, "cat dog bird")
    ).toDF("doc_id", "text")
    val got = Prep.filterSweep(docs, nBins = 20).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Double]("score_lo"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("cum_docs"), r.getAs[Long]("cum_tokens")))
      .sortBy(-_._1)
    assert(got.toSeq === Seq(
      (19L, 0.95, 1L, 2L, 1L, 2L),
      (10L, 0.5, 1L, 2L, 2L, 4L),
      (0L, 0.0, 1L, 3L, 3L, 7L)))
    // real corpus: retention reconciles — the worst bin's cumulative row
    // carries the whole corpus
    val full = Prep.filterSweep(
      graft.sources.Tables.documents(spark, sf0001)).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n_docs"), r.getAs[Long]("cum_docs")))
    assert(full.map(_._2).sum === 500L)
    assert(full.minBy(_._1)._3 === 500L)
  }

  test("curriculumOrder: dense band-major global rank, partition-invariant") {
    import spark.implicits._
    // even ids stopword-rich (bin 6), odd ids stopword-free (bin 0)
    val docs = (0L until 40L)
      .map(i => (i, if (i % 2 == 0) "the a x" else "x y z"))
      .toDF("doc_id", "text")
    def run(d: DataFrame) = {
      val out = Prep.curriculumOrder(d, nBins = 10, buckets = 4).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bin"),
          r.getAs[Long]("curriculum_rank")))
        .sortBy(_._3)
      graft.Caches.releaseAll()
      out
    }
    val got = run(docs)
    assert(got.map(_._3).toSeq === (1L to 40L), "rank must be dense 1..n")
    assert(got.map(_._2).sliding(2).forall(p => p.head >= p.last),
      "bands must be non-increasing in rank order (best band first)")
    assert(got.take(20).forall(_._1 % 2 == 0),
      "all stopword-rich docs must precede the stopword-free band")
    assert(run(docs.repartition(7)).toSeq === got.toSeq,
      "curriculum must be partition-invariant")
  }

  test("groupKFold: groups stay whole, folds stripe by size rank") {
    import spark.implicits._
    // sources sized 5,4,3,2,1; k=2 -> ranks 1..5 stripe to folds 0,1,0,1,0
    val docs = Seq("a" -> 5, "b" -> 4, "c" -> 3, "d" -> 2, "e" -> 1)
      .flatMap { case (s, n) => Seq.fill(n)(s) }
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "source")
    val got = Prep.groupKFold(docs, k = 2).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("fold")))).toMap
    assert(got === Map(
      "a" -> ((5L, 0L)), "b" -> ((4L, 1L)), "c" -> ((3L, 0L)),
      "d" -> ((2L, 1L)), "e" -> ((1L, 0L))))
    // striping balances better than worst-case: fold doc totals 9 vs 6
    val totals = got.values.groupBy(_._2).view.mapValues(_.map(_._1).sum).toMap
    assert(totals === Map(0L -> 9L, 1L -> 6L))
  }

  test("rebalancePlan: exact factors to the majority label") {
    import spark.implicits._
    val embs = (Seq.fill(6)(0) ++ Seq.fill(3)(1) ++ Seq.fill(2)(2))
      .zipWithIndex.map { case (l, i) => (i.toLong, Seq(1f), l) }
      .toDF("vec_id", "embedding", "label")
    val got = Prep.rebalancePlan(embs).collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("target"),
          r.getAs[Long]("factor_fp"), r.getAs[Double]("oversample_extra")))).toMap
    graft.Caches.releaseAll()
    assert(got === Map(
      0 -> ((6L, 6L, 1000000L, 0.0)),
      1 -> ((3L, 6L, 2000000L, 1.0)),
      2 -> ((2L, 6L, 3000000L, 2.0))))
  }

  test("effectiveTokens: 1/n attribution of exact-dup token mass, partition-invariant") {
    import spark.implicits._
    // "a b" ×2 in web + ×1 in books (3 copies globally, 2 tokens);
    // "c d e" unique to web (3 tokens)
    val d = Seq(
      (1L, "a b", "en", "web", 3L),
      (2L, "a b", "en", "web", 3L),
      (3L, "a b", "de", "books", 3L),
      (4L, "c d e", "en", "web", 5L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    for (parts <- Seq(1, 3)) {
      val got = Prep.effectiveTokens(d.repartition(parts)).collect()
        .map(r => r.getAs[String]("source") ->
          ((r.getAs[Long]("raw_docs"), r.getAs[Long]("raw_tokens"),
            r.getAs[Long]("distinct_texts"), r.getAs[Long]("eff_tokens_micro"))))
        .toMap
      assert(got === Map(
        // web: floor(1e6·2·2/3) + floor(1e6·3·1/1) = 1333333 + 3000000
        "web" -> ((3L, 7L, 2L, 4333333L)),
        // books: floor(1e6·2·1/3)
        "books" -> ((1L, 2L, 1L, 666666L))),
        s"accounting diverged at $parts partitions: $got")
    }
  }

  test("packSweep matches a plain-Scala replay of q73's pack at every budget") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val budgets = Seq(16, 50, 200, 1000)
    val got = Prep.packSweep(docs, budgets = budgets, shards = 4).collect()
      .map(r => r.getAs[Long]("budget") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("n_straddled"), r.getAs[Long]("n_seqs"),
          r.getAs[Long]("straddle_micro"), r.getAs[Long]("util_micro"))))
      .toMap
    graft.Caches.releaseAll()
    // replay: same shard function and doc_id-ordered greedy pack as the
    // q73 spec above, swept over the budgets in plain Scala
    val base = Prep.packSequences(docs, budget = 50, shards = 4).collect()
      .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens")))
    val totalTokens = base.map(_._3).sum
    val nDocs = base.length.toLong
    for (b <- budgets) {
      var straddled = 0L
      var nSeqs = 0L
      base.groupBy(_._1).foreach { case (_, rows) =>
        var cum = 0L
        rows.sortBy(_._2).foreach { case (_, _, n) =>
          if (n >= 1 && cum / b != (cum + n - 1) / b) straddled += 1
          cum += n
        }
        if (cum >= 1) nSeqs += (cum - 1) / b + 1
      }
      val expected = ((nDocs, totalTokens, straddled, nSeqs,
        1000000L * straddled / nDocs, 1000000L * totalTokens / (nSeqs * b)))
      assert(got(b.toLong) === expected, s"budget $b: ${got(b.toLong)} vs $expected")
      assert(straddled >= 1, s"budget $b straddled nothing — test too weak")
    }
    // monotonicity of the planning signal across NESTED budgets (50 |
    // 200 | 1000: every larger-budget boundary is also a smaller-budget
    // boundary, so crossings can only shrink — NOT true of 16 vs 1000)
    assert(got(1000L)._3 <= got(200L)._3 && got(200L)._3 <= got(50L)._3)
  }

  test("admissionAudit: each rule fires alone, multi-reason docs sort tags, clean docs admit") {
    import spark.implicits._
    val d = Seq(
      (0L, "a perfectly ordinary clean document here", "en", "web", 40L),
      (1L, "too short", "en", "web", 9L),                       // too_short
      (2L, "please merge the branch into main now", "en", "web", 37L), // blocklist
      (3L, "loop loop loop loop loop loop", "en", "web", 29L),  // repetition
      (4L, "contact bob@example.com for the details today", "en", "web", 45L), // pii
      // short AND blocklisted AND pii -> sorted tag list
      (5L, "spill a@b.co", "en", "web", 12L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Prep.admissionAudit(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("reasons"), r.getAs[Boolean]("admitted")))).toMap
    assert(got(0L) === (("", true)))
    assert(got(1L) === (("too_short", false)))
    assert(got(2L) === (("blocklist", false)))
    assert(got(3L) === (("repetition", false)))
    assert(got(4L) === (("pii", false)))
    assert(got(5L) === (("blocklist,pii,too_short", false)),
      "multi-reason tags must be sorted and comma-joined")
  }

  test("blocklistScreen: exact-token hits, phrase hits, distinct terms; no substring Scunthorpe matches") {
    import spark.implicits._
    val d = Seq(
      // "slow" x2 + phrase "hash value" x1 -> 3 hits, 2 distinct terms
      (0L, "slow path slow hash value store", "en", "web", 31L),
      // "slowly" must NOT match "slow" (token-exact, not substring)
      (1L, "slowly merged values", "en", "web", 20L),
      // phrase split across different positions: "table scan" once;
      // "scan table" is NOT the phrase
      (2L, "scan table then table scan", "en", "web", 26L),
      (3L, "clean text entirely", "en", "web", 19L),
      // single word doc: no bigrams, word terms still screened
      (4L, "spill", "en", "web", 5L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Prep.blocklistScreen(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_hits"), r.getAs[Long]("n_terms"),
          r.getAs[Boolean]("flagged")))).toMap
    assert(got(0L) === ((3L, 2L, true)))
    assert(got(1L) === ((0L, 0L, false)), "substring matches are forbidden")
    assert(got(2L) === ((1L, 1L, true)))
    assert(got(3L) === ((0L, 0L, false)))
    assert(got(4L) === ((1L, 1L, true)))
    assert(got.size === 5, "clean docs must still appear with zero counts")
  }

  test("epochPlan: both cap branches exercised; columns recompute in BigInt from the q194 chain; corpus parity") {
    import spark.implicits._
    // big source ~1000 tokens, small ~10: the tau=0.25 weights give the
    // small source far more budget per token, so it caps while big stays
    // under — both branches of `capped`/`wasted` live in one corpus
    val texts =
      (0L until 10L).map(i => (i, Seq.fill(100)("w").mkString(" "), "big")) :+
      ((10L, Seq.fill(10)("w").mkString(" "), "small"))
    val docs = texts.toDF("doc_id", "text", "source")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
    def replay(rows: Seq[(String, Long)], budget: Long): Map[String, (Long, Long, Long, Boolean, Long, Long)] = {
      val w = rows.map { case (s, t) =>
        (s, t, math.floor(math.sqrt(math.sqrt(t.toDouble)) * 1e6).toLong)
      }
      val wTot = w.map(_._3).sum
      val based = w.map { case (s, t, wi) =>
        (s, t, budget * wi / wTot, budget * wi % wTot)
      }
      val residual = budget - based.map(_._3).sum
      val ranked = based.sortBy { case (s, _, _, rem) => (-rem, s) }.zipWithIndex
      ranked.map { case ((s, t, base, _), i) =>
        val alloc = base + (if (i + 1 <= residual) 1L else 0L)
        val e = (BigInt(1000000L) * alloc / t).toLong
        val eff = (BigInt(4L) * t * e / (e + 4000000L)).toLong
        s -> ((t, alloc, e, e > 4000000L, math.max(alloc - 4 * t, 0L), eff))
      }.toMap
    }
    val exp = replay(Seq("big" -> 1000L, "small" -> 10L), 1000000L)
    val got = Prep.epochPlan(docs).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("alloc_tokens"),
          r.getAs[Long]("epochs_micro"), r.getAs[Boolean]("capped"),
          r.getAs[Long]("wasted_tokens"),
          r.getAs[Long]("effective_tokens")))).toMap
    graft.Caches.releaseAll()
    assert(got === exp)
    // the default budget repeats BOTH sources past 4 epochs here — the
    // branch split needs per-source assertions, not luck
    assert(got("small")._4, "small source must be repeat-capped")
    assert(got("small")._5 > 0, "capped source must show wasted mass")
    // effective tokens saturate below the R*·T ceiling
    got.foreach { case (s, (t, _, _, _, _, eff)) =>
      assert(eff <= 4 * t, s"$s effective mass past the R* ceiling") }
    // corpus parity against the same replay
    val corpus = graft.sources.Tables.documents(spark, sf0001)
    val rows = corpus.collect().map(r =>
      r.getAs[String]("source") ->
        r.getAs[String]("text").split(" ", -1).length.toLong)
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }.toSeq
    val expC = replay(rows, 1000000L)
    val gotC = Prep.epochPlan(corpus).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("alloc_tokens"),
          r.getAs[Long]("epochs_micro"), r.getAs[Boolean]("capped"),
          r.getAs[Long]("wasted_tokens"),
          r.getAs[Long]("effective_tokens")))).toMap
    graft.Caches.releaseAll()
    assert(gotC === expC, "corpus epoch plan diverged from the BigInt replay")
  }

  test("shardManifest: snake order matches a plain-Scala replay; bucket-count invariant; shards token-balanced on the corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val texts = (0L until 50L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(40))("w").mkString(" ")
    }
    val base = texts.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
    // plain-Scala replay: sort by (n_tok desc, doc_id), snake-stripe over 8
    val exp = texts.map { case (id, t) => (id, t.split(" ", -1).length.toLong) }
      .sortBy { case (id, n) => (-n, id) }.zipWithIndex
      .map { case ((id, n), i) =>
        val shard = if ((i / 8) % 2 == 0) i % 8 else 7 - i % 8
        id -> ((n, i.toLong + 1L, shard.toLong))
      }.toMap
    for (buckets <- Seq(3, 32)) {
      val got = Prep.shardManifest(base, shards = 8, buckets = buckets)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_tok"), r.getAs[Long]("rank"),
            r.getAs[Long]("shard")))).toMap
      graft.Caches.releaseAll()
      assert(got === exp, s"shardManifest diverged at buckets=$buckets")
    }
    // on the real corpus the snake stripe must balance token mass:
    // any two shard sums differ by at most one cycle's spread <= 2*max
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val m = Prep.shardManifest(docs).collect()
    graft.Caches.releaseAll()
    val sums = m.groupBy(_.getAs[Long]("shard"))
      .map { case (s, rs) => s -> rs.map(_.getAs[Long]("n_tok")).sum }
    val maxTok = m.map(_.getAs[Long]("n_tok")).max
    assert(sums.keySet === (0L until 8L).toSet, s"empty shard: $sums")
    assert(sums.values.max - sums.values.min <= 2 * maxTok,
      s"shards unbalanced past the stripe bound: $sums (max doc $maxTok)")
  }

  test("clusterSplit: exact-dup copies land in the same split; lottery spreads on the corpus") {
    import spark.implicits._
    // three copies of one text under different ids/sources, one other text
    val d = Seq(
      (1L, "shared passage", "en", "web", 14L),
      (2L, "shared passage", "en", "books", 14L),
      (3L, "shared passage", "de", "web", 14L),
      (4L, "another text", "en", "web", 12L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Prep.clusterSplit(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("cluster_key"), r.getAs[String]("split")))).toMap
    assert(got.size === 4, "every doc gets exactly one assignment")
    assert(got(1L) === got(2L) && got(2L) === got(3L),
      s"dup copies must share cluster AND split: $got")
    assert(got(1L)._1 !== got(4L)._1)
    // on the real corpus the 80/10/10 lottery must actually spread
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val n = docs.count().toDouble
    val bySplit = Prep.clusterSplit(docs).groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set("train", "val", "test"), s"degenerate: $bySplit")
    assert(bySplit("train") / n > 0.7 && bySplit("train") / n < 0.9,
      s"train share off the 80% lottery: $bySplit")
  }

  test("budgetSelect: greedy inclusive boundary, density order, doc_id tie-break") {
    import spark.implicits._
    // densities: d1 = 1e6 (4 distinct / 4), d2 = 1e6 (2/2),
    // d3 = 500000 (2/4), d4 = 333333 (1/3)
    val docs = Seq(
      (1L, "a b c d", "s1"),
      (2L, "x y", "s2"),
      (3L, "a a b b", "s1"),
      (4L, "z z z", "s2"),
    ).toDF("doc_id", "text", "source")
    // order: d1 (tie 1e6, id 1), d2 (tie 1e6, id 2), d3, d4
    // budget 10: cum 4, 6, 10, 13 -> docs 1,2,3 admitted (inclusive <=)
    val got = Prep.budgetSelect(docs, budgetTokens = 10L, buckets = 2)
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_admitted"), r.getAs[Long]("tokens_admitted"),
          r.getAs[Long]("worst_density_admitted")))).toMap
    graft.Caches.releaseAll()
    assert(got === Map("s1" -> ((2L, 8L, 500000L)), "s2" -> ((1L, 2L, 1000000L))))
    // budget 9 excludes doc 3 (cum 10 > 9) — the boundary doc does NOT
    // partially fit; budget 13 admits everything
    val g9 = Prep.budgetSelect(docs, budgetTokens = 9L, buckets = 2).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_admitted")).toMap
    graft.Caches.releaseAll()
    assert(g9 === Map("s1" -> 1L, "s2" -> 1L))
    val g13 = Prep.budgetSelect(docs, budgetTokens = 13L, buckets = 2).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_admitted")).toMap
    graft.Caches.releaseAll()
    assert(g13 === Map("s1" -> 2L, "s2" -> 2L))
  }

  test("budgetSelect: bucket count never changes the admitted set") {
    val ref = Prep.budgetSelect(graft.sources.Tables.documents(spark, sf001))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    graft.Caches.releaseAll()
    for (b <- Seq(1, 7)) {
      val got = Prep.budgetSelect(graft.sources.Tables.documents(spark, sf001),
          buckets = b)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      graft.Caches.releaseAll()
      assert(got === ref, s"bucketed prefix diverged at buckets=$b")
    }
    assert(ref.map(_._3).sum <= 20000L, "admitted token mass must respect the budget")
    assert(ref.nonEmpty)
  }

  test("dedupMixture: planted dup pair collapses its source's mass; allocation reconciles on kept tokens") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "A", 30L),
      (2L, "alpha beta gamma delta epsilon", "A", 30L), // exact near-dup of 1
      (3L, "one two three four five six", "B", 27L),
      (4L, "seven eight nine ten eleven twelve", "B", 34L),
    ).toDF("doc_id", "text", "source", "n_chars")
    val got = Prep.dedupMixture(docs, budgetTokens = 1000L).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    graft.Caches.releaseAll()
    val a = got("A"); val b = got("B")
    assert(a.getAs[Long]("n_docs_raw") === 2L && a.getAs[Long]("n_docs_kept") === 1L)
    assert(a.getAs[Long]("n_tokens_raw") === 10L && a.getAs[Long]("n_tokens_kept") === 5L)
    assert(a.getAs[Long]("dup_token_share_micro") === 500000L)
    assert(b.getAs[Long]("n_docs_kept") === 2L && b.getAs[Long]("n_tokens_kept") === 12L)
    assert(b.getAs[Long]("dup_token_share_micro") === 0L)
    // exact largest-remainder reconciliation on the KEPT mass
    assert(got.values.map(_.getAs[Long]("alloc_tokens")).sum === 1000L)
    // the dedup must shift allocation toward the un-dup'd source
    assert(b.getAs[Long]("alloc_tokens") > a.getAs[Long]("alloc_tokens"))
  }

  test("targetMixture: hand-checked water level, cap spill, remainder hand-out, over-budget case") {
    import spark.implicits._
    def mk(rows: (String, Int)*) = rows.toSeq.flatMap { case (l, tok) =>
      Seq((l, ("w " * tok).trim)) // tok single-char words
    }.toDF("lang", "text")
    val docs = mk("a" -> 2, "b" -> 5, "c" -> 100, "d" -> 100)
    def run(b: Long) = Prep.targetMixture(docs, budgetTokens = b).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("alloc_tokens"), r.getAs[Boolean]("capped")))).toMap
    val g27 = run(27L); graft.Caches.releaseAll()
    assert(g27 === Map("a" -> ((2L, true)), "b" -> ((5L, true)),
      "c" -> ((10L, false)), "d" -> ((10L, false))))
    // one remainder token goes to the lexicographically first uncapped lang
    val g28 = run(28L); graft.Caches.releaseAll()
    assert(g28("c") === ((11L, false)) && g28("d") === ((10L, false)))
    // budget above total availability: everyone capped at avail
    val gBig = run(10000L); graft.Caches.releaseAll()
    assert(gBig === Map("a" -> ((2L, true)), "b" -> ((5L, true)),
      "c" -> ((100L, true)), "d" -> ((100L, true))))
  }

  test("targetMixture equals iterative water-filling on the real corpus; budget reconciles exactly") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val budget = 500000L
    val got = Prep.targetMixture(docs, budget).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("avail_tokens"), r.getAs[Long]("alloc_tokens")))).toMap
    graft.Caches.releaseAll()
    // reference: repeat "spread the remaining budget evenly over uncapped
    // langs; cap any that overflow" until stable, then hand the division
    // remainder to the lexicographically first uncapped langs
    val avail = got.view.mapValues(_._1).toMap
    var capped = Set.empty[String]
    var stable = false
    val bp = math.min(budget, avail.values.sum)
    while (!stable) {
      val m = avail.size - capped.size
      val r = bp - capped.toSeq.map(avail).sum
      val newly = avail.keys.filterNot(capped)
        .filter(l => m > 0 && avail(l) <= r / m).toSet
      if (newly.subsetOf(capped) || m == 0) stable = true
      capped ++= newly
      if (newly.isEmpty) stable = true
    }
    val m = avail.size - capped.size
    val r = bp - capped.toSeq.map(avail).sum
    val uncappedSorted = avail.keys.filterNot(capped).toSeq.sorted
    val exp = avail.map { case (l, a) =>
      if (capped(l)) l -> a
      else l -> (r / m + (if (uncappedSorted.indexOf(l) < r % m) 1L else 0L))
    }
    assert(got.view.mapValues(_._2).toMap === exp,
      "closed-form level must equal iterative water-filling")
    assert(got.values.map(_._2).sum === bp, "allocation must reconcile exactly")
    got.foreach { case (l, (a, al)) =>
      assert(al <= a, s"$l allocated past its availability") }
  }
}
