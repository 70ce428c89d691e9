package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Corpus

/** Unit coverage for the corpus-preparation operators (vocab, splits,
  * quantiles, sketch profile) on a synthetic corpus with known counts.
  */
class CorpusSpec extends SparkSpec {

  private def corpus: DataFrame = {
    import spark.implicits._
    Seq(
      (0L, "alpha beta alpha", "en", "web", 16L),
      (1L, "alpha gamma", "en", "web", 11L),
      (2L, "beta beta beta", "en", "books", 14L),
      (3L, "delta", "fr", "web", 5L),
      (4L, "alpha delta epsilon", "fr", "web", 19L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("heavyHitters is exact even when Misra-Gries eviction fires") {
    import spark.implicits._
    // one hot bigram dominating a long tail of distinct fillers: with
    // k=3 the sketch keeps only 6 counters per partition, far fewer than
    // the distinct-bigram count, so the decrement-all path runs — and the
    // recount must still output exactly the single-pass answer
    val hot = Seq.fill(80)("x y").mkString(" ")
    val tail = (1 to 50).map(i => s"f$i").mkString(" ")
    val d = Seq((0L, s"$hot $tail")).toDF("doc_id", "text")
    val words = (s"$hot $tail").split(" ").toSeq
    val exact = words.sliding(2).map(_.mkString(" ")).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = exact.values.sum
    val expect = exact.filter { case (_, c) => c * 3 >= n }
    val got = Corpus.heavyHitters(d, k = 3).collect()
      .map(r => r.getAs[String]("gram") -> r.getAs[Long]("cnt")).toMap
    assert(got === expect)
    assert(expect.nonEmpty) // the fixture actually has heavy hitters
    assert(exact.size > 6)  // and more distinct grams than sketch slots
  }

  test("vocabCoverage: two-pass prefix equals the hand-computed cumulative mass") {
    import spark.implicits._
    val d = Seq((0L, "a b a b a c"), (1L, "a b d e")).toDF("doc_id", "text")
    val grams = Seq("a b", "b a", "a b", "b a", "a c", "a b", "b d", "d e")
    val cnt = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ranked = cnt.toSeq.sortBy { case (g, c) => (-c, g) }
    val total = grams.size.toDouble
    val cum = ranked.scanLeft(0L) { case (acc, (_, c)) => acc + c }.drop(1)
    val got = Corpus.vocabCoverage(d, sizes = Seq(1L, 2L, 4L)).collect()
      .map(r => r.getAs[Long]("vocab_size") ->
        (r.getAs[String]("boundary_gram"), r.getAs[Double]("coverage")))
      .toMap
    assert(got.keySet === Set(1L, 2L, 4L))
    Seq(1, 2, 4).foreach { size =>
      assert(got(size.toLong)._1 === ranked(size - 1)._1)
      assert(got(size.toLong)._2 === cum(size - 1) / total)
    }
  }

  test("vocabTopK counts term and document frequency with a deterministic cut") {
    val top = Corpus.vocabTopK(corpus, 2).collect()
      .map(r => (r.getAs[String]("word"), r.getAs[Long]("n"), r.getAs[Long]("n_docs")))
    // beta: 4 occurrences in 2 docs; alpha: 4 occurrences in 3 docs — tie on
    // n broken by word asc, so alpha ranks first
    assert(top.toSeq === Seq(("alpha", 4L, 3L), ("beta", 4L, 2L)))
  }

  test("oovRate flags exactly the tokens outside the deterministic top-k vocabulary") {
    // vocab size 2 -> {alpha, beta} (tie on n=4 broken by word asc puts
    // alpha first; both survive the cut). web tokens: alpha beta alpha |
    // alpha gamma | delta | alpha delta epsilon = 9, oov {gamma, delta,
    // delta, epsilon} = 4; books: beta x3 = 3 tokens, 0 oov.
    val r = Corpus.oovRate(corpus, 2).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"), r.getAs[Double]("oov_rate"))).toMap
    assert(r("web") === ((9L, 4L, 4.0 / 9.0)))
    assert(r("books") === ((3L, 0L, 0.0)))
  }

  test("splitAssign is deterministic, complete, and within bucket bounds") {
    val a = Corpus.splitAssign(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("bucket"), r.getAs[String]("split"))).toMap
    val b = Corpus.splitAssign(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("bucket"), r.getAs[String]("split"))).toMap
    assert(a === b)
    assert(a.size === 5)
    a.values.foreach { case (bucket, split) =>
      assert(bucket >= 0 && bucket < 100)
      val expected = if (bucket < 80) "train" else if (bucket < 90) "valid" else "test"
      assert(split === expected)
    }
  }

  test("lengthQuantiles picks exact rank-order statistics per language") {
    val q = Corpus.lengthQuantiles(corpus).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("p25"), r.getAs[Long]("p50"), r.getAs[Long]("p95"), r.getAs[Long]("n_docs"))).toMap
    // en sorted n_chars: 11, 14, 16 -> p25=ceil(0.75)=rn1=11, p50=ceil(1.5)=rn2=14, p95=ceil(2.85)=rn3=16
    assert(q("en") === ((11L, 14L, 16L, 3L)))
    // fr sorted: 5, 19 -> p25=rn1=5, p50=rn1=5, p95=rn2=19
    assert(q("fr") === ((5L, 5L, 19L, 2L)))
  }

  test("tfidfTopTerms ranks rare-but-frequent terms first with deterministic ties") {
    val rows = Corpus.tfidfTopTerms(corpus, k = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rnk")) ->
        (r.getAs[String]("word"), r.getAs[Long]("tf"), r.getAs[Long]("df"),
          r.getAs[Double]("score"))).toMap
    // doc0: alpha tf=2 df=3 (0.667) beats beta tf=1 df=2 (0.5)
    assert(rows((0L, 1))._1 === "alpha")
    assert(rows((0L, 1))._4 === 2.0 / 3.0)
    assert(rows((0L, 2))._1 === "beta")
    // doc1: gamma is unique to the doc (score 1.0) and outranks corpus-wide alpha
    assert(rows((1L, 1)) === (("gamma", 1L, 1L, 1.0)))
    // doc4: epsilon (1.0) > delta (0.5) > alpha (0.333)
    assert(Seq(1, 2, 3).map(r => rows((4L, r))._1) === Seq("epsilon", "delta", "alpha"))
  }

  test("freqSpectrum counts words per occurrence frequency") {
    val m = Corpus.freqSpectrum(corpus).collect()
      .map(r => r.getAs[Long]("freq") -> r.getAs[Long]("n_words")).toMap
    // gamma+epsilon once, delta twice, alpha+beta four times
    assert(m === Map(1L -> 2L, 2L -> 1L, 4L -> 2L))
  }

  test("sketchProfile approximates exact distinct counts on a small corpus") {
    val df = Corpus.sketchProfile(corpus)
    // scalar percentile columns (no array cells — consumers and the
    // verification harness sort/compare plain numerics)
    assert(df.schema("len_p50").dataType.typeName !== "array")
    assert(df.schema("len_p95").dataType.typeName !== "array")
    val p = Corpus.sketchProfile(corpus).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("ndv_text"),
          r.getAs[Number]("len_p50").longValue(), r.getAs[Number]("len_p95").longValue())).toMap
    assert(p("web")._1 === 4L) // HLL is exact at this cardinality
    assert(p("web")._2 === 4L)
    assert(p("books")._1 === 1L)
    assert(p("books")._2 === 1L)
    // percentile_approx is exact at this size: p50 <= p95, within data range
    assert(p("web")._3 <= p("web")._4)
  }

  test("invertedIndex bands the vocabulary and caps sorted postings") {
    // dfs over the 5-doc corpus: alpha 3 (docs 0,1,4), beta 2 (0,2),
    // delta 2 (3,4), gamma/epsilon 1; maxDfFrac 0.95 -> cap floor(4.75)=4
    val m = Corpus.invertedIndex(corpus, minDf = 2, maxDfFrac = 0.95, maxPostings = 2)
      .collect()
      .map(r => r.getAs[String]("word") ->
        (r.getAs[Long]("df"), r.getAs[String]("postings"))).toMap
    assert(m.keySet === Set("alpha", "beta", "delta")) // hapaxes banded out
    assert(m("alpha") === ((3L, "0,1"))) // df counts ALL docs, postings cap at 2
    assert(m("beta") === ((2L, "0,2")))
    assert(m("delta") === ((2L, "3,4")))
  }

  test("invertedIndex drops corpus-wide stopwords via the relative cap") {
    import spark.implicits._
    val d = Seq(
      (0L, "omni red"), (1L, "omni blue"), (2L, "omni red"),
      (3L, "omni blue"), (4L, "omni red"),
    ).toDF("doc_id", "text")
    // omni df=5 > floor(5*0.95)=4 -> out; red df=3, blue df=2 stay
    val words = Corpus.invertedIndex(d, minDf = 2, maxDfFrac = 0.95, maxPostings = 20)
      .collect().map(_.getAs[String]("word")).toSet
    assert(words === Set("red", "blue"))
  }

  test("featureHashEmbed matches a plain-JVM signed-hash recompute, duplicates included") {
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val dims = 64
    val expected = corpus.collect()
      .flatMap { r =>
        r.getAs[String]("text").split(" ", -1).map { w =>
          val hex = md5Hex(w)
          val pos = (java.lang.Long.parseLong(hex.substring(0, 12), 16) % dims).toInt
          val sgn = if (Integer.parseInt(hex.substring(12, 13), 16) % 2 == 0) 1L else -1L
          ((r.getAs[Long]("doc_id"), pos), sgn)
        }
      }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val got = Corpus.featureHashEmbed(corpus, dims).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("pos")) -> r.getAs[Long]("value"))
      .toMap
    assert(got === expected)
    // doc 0 "alpha beta alpha": duplicate alpha must contribute twice
    val alphaPos = (java.lang.Long.parseLong(md5Hex("alpha").substring(0, 12), 16) % dims).toInt
    val alphaSgn = if (Integer.parseInt(md5Hex("alpha").substring(12, 13), 16) % 2 == 0) 1L else -1L
    if (alphaPos != (java.lang.Long.parseLong(md5Hex("beta").substring(0, 12), 16) % dims).toInt)
      assert(got((0L, alphaPos)) === 2L * alphaSgn)
  }

  test("bigramLift ranks the planted collocation first with hand-checked counts") {
    import spark.implicits._
    // "new york" always together (4x); "new" and "york" never co-occur
    // otherwise; "the cat" co-occurs but both words are common elsewhere
    val d = Seq(
      (0L, "new york is big"), (1L, "new york at night"),
      (2L, "see new york now"), (3L, "in new york today"),
      (4L, "the cat sat on the mat"), (5L, "the cat ate the fish"),
      (6L, "the dog and the cat"),
    ).toDF("doc_id", "text")
    val rows = Corpus.bigramLift(d, minCount = 3, k = 5).collect()
      .map(r => r.getAs[String]("bigram") ->
        (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Double]("lift")))
    val m = rows.toMap
    // totals: 7 docs, 32 words, 25 bigram slots
    assert(m("new york") === ((4L, 4L, 4L,
      (4.0 / 25) / ((4.0 / 32) * (4.0 / 32)))))
    assert(m("the cat") === ((3L, 6L, 3L,
      (3.0 / 25) / ((6.0 / 32) * (3.0 / 32)))))
    // the exclusive pair must out-lift the common-word pair
    assert(rows.head._1 === "new york")
    assert(m("new york")._4 > m("the cat")._4)
  }

  test("bpePairCounts weights character pairs by word frequency over the vocabulary") {
    import spark.implicits._
    val d = Seq((0L, "ab ab abc x")).toDF("doc_id", "text")
    val m = Corpus.bpePairCounts(d, topK = 10).collect()
      .map(r => r.getAs[String]("pair") -> r.getAs[Long]("n")).toMap
    // "ab" occurs twice as a word (1 pair each) and once inside "abc";
    // "bc" once inside "abc"; the 1-char word "x" contributes nothing
    assert(m === Map("ab" -> 3L, "bc" -> 1L))
  }

  test("lengthDeciles assigns boundary-based buckets; ties share the lower decile") {
    import spark.implicits._
    // ten distinct lengths 1..10: boundary_d = d, so decile(v) = v
    val d = (1L to 10L).map(i => (i, i)).toDF("doc_id", "n_chars")
    val m = Corpus.lengthDeciles(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("decile")).toMap
    assert(m === (1L to 10L).map(i => i -> i.toInt).toMap)

    // all-equal scores: every boundary equals the score, nothing is
    // strictly below it -> everyone lands in decile 1
    val flat = (1L to 8L).map(i => (i, 42L)).toDF("doc_id", "n_chars")
    val deciles = Corpus.lengthDeciles(flat).collect().map(_.getAs[Int]("decile")).toSet
    assert(deciles === Set(1))
  }

  test("property: lengthDeciles equals a plain-Scala boundary recompute on random multisets") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 5) {
      val n = 20 + rnd.nextInt(200)
      // heavy ties on purpose: values drawn from a small range
      val rows = (0L until n).map(i => (i, (rnd.nextInt(12) + 1).toLong))
      val expected = {
        val sorted = rows.map(_._2).sorted
        val bounds = (1 to 9).map(d => sorted(math.ceil(n * d / 10.0).toInt - 1))
        rows.map { case (id, v) => id -> (1 + bounds.count(_ < v)) }.toMap
      }
      val got = Corpus.lengthDeciles(rows.toDF("doc_id", "n_chars")).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("decile")).toMap
      assert(got === expected, s"trial $trial (n=$n)")
    }
  }

  test("property: bpePairCounts equals a plain-Scala recompute on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val alphabet = "abcd"
    def word() = (0 until 1 + rnd.nextInt(5))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (trial <- 0 until 3) {
      val texts = (0L until 30L).map(i =>
        (i, (0 until 3 + rnd.nextInt(10)).map(_ => word()).mkString(" ")))
      val expected = texts
        .flatMap(_._2.split(" ", -1))
        .filter(_.length >= 2)
        .flatMap(w => w.sliding(2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = Corpus.bpePairCounts(texts.toDF("doc_id", "text"), topK = 1000)
        .collect().map(r => r.getAs[String]("pair") -> r.getAs[Long]("n")).toMap
      assert(got === expected, s"trial $trial")
    }
  }

  test("lengthGini: uniform lengths score exactly 0, concentrated mass approaches 1") {
    import spark.implicits._
    val d = (
      (1L to 10L).map(i => (i, "uni", 500L)) ++            // all equal -> G = 0
        ((11L to 19L).map(i => (i, "skew", 1L)) :+ ((20L, "skew", 991L)))
    ).toDF("doc_id", "source", "n_chars")
    val m = Corpus.lengthGini(d).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("gini"))).toMap
    assert(m("uni") === ((10L, 0.0)))
    // rank formula by hand: s0 = 1000, s1 = 9*10/2*1 + 10*991 = 9955
    // G = 2*9955/(10*1000) - 11/10 = 1.991 - 1.1 = 0.891
    assert(m("skew")._1 === 10L)
    assert(math.abs(m("skew")._2 - 0.891) < 1e-12)
  }

  test("quantileNormalize: per-source fractions map onto the global score ladder") {
    import spark.implicits._
    // source a: 2 docs (fractions 1/2, 1), source b: 4 docs (1/4..1);
    // global sorted scores: 10,20,30,40,50,60 (N=6).
    // a/doc1 f=1/2 -> global rank ceil(6/2)=3 -> 30; a/doc2 f=1 -> 60.
    // b ranks 1..4 -> targets ceil(6/4)=2, 3, ceil(18/4)=5, 6 -> 20,30,50,60.
    val d = Seq(
      (1L, "a", 25L), (2L, "a", 60L),
      (3L, "b", 10L), (4L, "b", 20L), (5L, "b", 40L), (6L, "b", 50L)
    ).toDF("doc_id", "source", "n_chars")
    // global ladder is over ALL docs: 10,20,25,40,50,60
    val out = Corpus.quantileNormalize(d).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // recompute expected by hand against the actual ladder:
    // a: rn 1,2 of 2 -> targets 3, 6 -> 25, 60
    // b: rn 1..4 of 4 -> targets 2, 3, 5, 6 -> 20, 25, 50, 60
    assert(out === Map(1L -> 25L, 2L -> 60L,
      3L -> 20L, 4L -> 25L, 5L -> 50L, 6L -> 60L))
  }

  test("sourceDivergence: TV distance by hand, zero drift for corpus-typical sources") {
    import spark.implicits._
    // a and b are identical ('alpha alpha'), c is disjoint ('zulu zulu'):
    // corpus = 4 alpha + 2 zulu (N=6). For a (n=2):
    //   bucket(alpha): |2*6 - 4*2| = 4; bucket(zulu): |0 - 2*2| = 4
    //   tv = 8 / (2*2*6) = 1/3. For c: |0-4*2| + |2*6-2*2| = 16 -> 2/3.
    val d = Seq(
      (0L, "alpha alpha", "en", "a", 11L),
      (1L, "alpha alpha", "en", "b", 11L),
      (2L, "zulu zulu", "en", "c", 9L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Corpus.sourceDivergence(d).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_words"), r.getAs[Double]("tv"))).toMap
    assert(out("a") === ((2L, 8.0 / (2.0 * 2.0 * 6.0))))
    assert(out("b") === out("a"))
    assert(out("c") === ((2L, 16.0 / (2.0 * 2.0 * 6.0))))
    // on the real corpus: bounded in [0,1], bit-stable under repartition
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val full = Corpus.sourceDivergence(docs).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("tv")).toMap
    assert(full.nonEmpty)
    full.values.foreach(tv => assert(tv >= 0.0 && tv <= 1.0))
    val re = Corpus.sourceDivergence(docs.repartition(7)).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("tv")).toMap
    assert(re === full)
  }

  test("bpeLearn: hand-traced merges incl. the odd-run greedy-disjoint case") {
    import spark.implicits._
    // corpus: 'aaaa' x3, 'aaa' x1, 'ab' x2.
    // step 1: (a,a) = 3*3 + 2*1 = 11 beats (a,b) = 2 -> merge 'aa'.
    //   greedy-disjoint on 'aaaa' (match run 1,2,3 -> select 1,3): [aa, aa]
    //   on 'aaa' (run 1,2 -> select 1): [aa, a]  <- odd run: NOT [a, aa]
    // step 2: (aa,aa) = 3 beats (aa,a) = 1 and (a,b) = 2 -> 'aaaa'.
    // step 3: (a,b) = 2 beats (aa,a) = 1 -> 'ab'.
    val docs = Seq(
      (0L, "aaaa aaaa aaaa aaa"),
      (1L, "ab ab")
    ).toDF("doc_id", "text")
    val out = Corpus.bpeLearn(docs, nMerges = 3).collect()
      .map(r => (r.getAs[Long]("merge_step"), r.getAs[String]("t1"),
        r.getAs[String]("t2"), r.getAs[Long]("pair_count"),
        r.getAs[String]("new_token"))).sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, "a", "a", 11L, "aa"),
      (2L, "aa", "aa", 3L, "aaaa"),
      (3L, "a", "b", 2L, "ab")))
    // partition-invariance: integer weights + deterministic tiebreaks
    val re = Corpus.bpeLearn(docs.repartition(5), nMerges = 3).collect()
      .map(r => (r.getAs[Long]("merge_step"), r.getAs[String]("t1"),
        r.getAs[String]("t2"), r.getAs[Long]("pair_count"),
        r.getAs[String]("new_token"))).sortBy(_._1)
    assert(re.toSeq === out.toSeq)
  }

  test("bpeTokenize: hand-traced fertility on the bpeLearn corpus, split by source") {
    import spark.implicits._
    // same corpus as the bpeLearn hand-trace, now with sources. Learned
    // merges: aa, aaaa, ab. Final segmentations:
    //   'aaaa' -> [aaaa] (1 tok), 'aaa' -> [aa, a] (2), 'ab' -> [ab] (1).
    // srcA: aaaa x3 + aaa x1 -> 4 words, 5 tokens, 15 chars.
    // srcB: ab x2          -> 2 words, 2 tokens,  4 chars.
    val docs = Seq(
      (0L, "aaaa aaaa aaaa aaa", "srcA"),
      (1L, "ab ab", "srcB")
    ).toDF("doc_id", "text", "source")
    val out = Corpus.bpeTokenize(docs, nMerges = 3).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars"),
        r.getAs[Double]("tokens_per_word"), r.getAs[Double]("chars_per_token")))
      .sortBy(_._1)
    assert(out.toSeq === Seq(
      ("srcA", 4L, 5L, 15L, 1.25, 3.0),
      ("srcB", 2L, 2L, 4L, 1.0, 2.0)))
    // partition-invariance (integer counts + deterministic merge argmax)
    val re = Corpus.bpeTokenize(docs.repartition(5), nMerges = 3).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars"),
        r.getAs[Double]("tokens_per_word"), r.getAs[Double]("chars_per_token")))
      .sortBy(_._1)
    assert(re.toSeq === out.toSeq)
  }

  test("applyMerge: per-word array fold equals a sequential greedy fold on 200 random words") {
    import spark.implicits._
    // reference: the textbook sequential greedy-disjoint merge
    def refMerge(toks: List[String], t1: String, t2: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == t1 && toks(i + 1) == t2) {
          out += (t1 + t2); i += 2
        } else { out += toks(i); i += 1 }
      }
      out.toList
    }
    val rnd = new scala.util.Random(42L)
    // tiny alphabet -> dense repeats -> long match runs (the hard case)
    val words = (1 to 200).map { i =>
      s"w$i" -> List.fill(1 + rnd.nextInt(12))(if (rnd.nextBoolean()) "a" else "b")
    }
    val toks = words.map { case (w, ts) => (w, 1L, ts) }
      .toDF("word", "n_word", "toks")
    for ((t1, t2) <- Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"))) {
      val got = Corpus.applyMerge(toks, t1, t2).collect()
        .map(r => r.getAs[String]("word") ->
          r.getAs[scala.collection.Seq[String]]("toks").toList).toMap
      val expected = words.map { case (w, ts) => w -> refMerge(ts, t1, t2) }.toMap
      assert(got === expected, s"divergence from the sequential fold for pair ($t1,$t2)")
    }
  }

  test("sourceManifest: hand-computed card with a planted dup and a language tie") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b", "en", "A"),
      (1L, "a b", "en", "A"), // exact dup of 0
      (2L, "c d e", "en", "A"),
      (3L, "f g", "fr", "A"),
      (4L, "h i", "de", "B"), // tie with en below: struct max picks "en"
      (5L, "j k l m", "en", "B"),
    ).map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Corpus.sourceManifest(docs).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars"),
          r.getAs[Long]("n_langs"), r.getAs[String]("top_lang"),
          r.getAs[Double]("top_lang_share"), r.getAs[Long]("n_distinct_texts"),
          r.getAs[Double]("dup_rate")))).toMap
    assert(got("A") === ((4L, 9L, 14L, 2L, "en", 0.75, 3L, 0.25)))
    assert(got("B") === ((2L, 6L, 10L, 2L, "en", 0.5, 2L, 0.0)))
  }

  test("manifestMerge: incremental card equals the full recompute, incl. cross-batch dups") {
    import spark.implicits._
    val full = Seq(
      (0L, "a b", "en", "A"),
      (1L, "a b", "en", "A"),    // dup of 0 — same batch
      (2L, "c d e", "en", "A"),
      (3L, "f g", "fr", "A"),
      (10L, "a b", "en", "A"),   // delta: dup of a BASE doc
      (20L, "new delta text", "de", "B"),
      (30L, "new delta text", "de", "B"), // delta-internal dup
      (4L, "h i", "de", "B"),
    ).map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val base = full.filter($"doc_id" % 10 =!= 0)
    val delta = full.filter($"doc_id" % 10 === 0)
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(_.toSeq.map(String.valueOf)).map(_.mkString("|")).sorted.toSeq
    val merged = canon(Corpus.manifestMerge(base, delta))
    graft.Caches.releaseAll()
    assert(merged === canon(Corpus.sourceManifest(full)))
  }

  test("lmFluency: hand-checked add-one bigram scores; repeated phrasing scores more fluent") {
    import spark.implicits._
    // corpus bigrams: "a b" x3 (docs 10,11,12), "a z" x1 (doc 13)
    // heads: a x4 -> n1(a)=4; V (distinct heads) = 1
    val docs = Seq(
      (10L, "a b"), (11L, "a b"), (12L, "a b"), (13L, "a z"),
      (14L, "solo"), // single word: no bigrams, absent from output
    ).toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
    val out = Corpus.lmFluency(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("mean_inv_p")))).toMap
    graft.Caches.releaseAll()
    assert(out.keySet === Set(10L, 11L, 12L, 13L))
    // "a b": inv_p = floor(1e6*(4+1)/(3+1))/1e6 = 1.25
    assert(out(10L) === ((1L, 1.25)))
    // "a z": floor(1e6*5/2)/1e6 = 2.5 — rarer continuation, less fluent
    assert(out(13L) === ((1L, 2.5)))
    assert(out(13L)._2 > out(10L)._2)
  }

  test("lmFluency and repetitionProfile: partition-invariant and equal to a plain-JVM recompute on a random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    val vocabPool = Vector("a", "b", "c", "dd", "ee", "fff", "gg", "hh", "ii", "jj")
    val texts = (0L until 40L).map { id =>
      val n = 2 + rnd.nextInt(30)
      id -> Seq.fill(n)(vocabPool(rnd.nextInt(vocabPool.length))).mkString(" ")
    }
    val base = texts.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))

    // plain-JVM twin of the add-one bigram LM score
    val bigrams = texts.flatMap { case (id, t) =>
      val w = t.split(" ", -1); w.sliding(2).filter(_.length == 2)
        .map(p => (id, p(0) + " " + p(1), p(0))).toSeq
    }
    val n12 = bigrams.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val n1 = bigrams.groupBy(_._3).map { case (k, v) => k -> v.size.toLong }
    val v = n1.size.toLong
    val expFluency = bigrams.groupBy(_._1).map { case (id, bs) =>
      val s = bs.map { case (_, bg, w1) =>
        (1000000L * (n1(w1) + v)) / (n12(bg) + 1L)
      }.sum
      id -> ((bs.size.toLong, s.toDouble / bs.size.toDouble / 1e6))
    }
    val expRep = bigrams.groupBy(_._1).map { case (id, bs) =>
      val cnt = bs.groupBy(_._2).map(_._2.size.toLong)
      val tot = cnt.sum; val top = cnt.max
      val dup = cnt.filter(_ >= 2).sum
      id -> ((tot, top.toDouble / tot.toDouble, dup.toDouble / tot.toDouble,
        top.toDouble / tot.toDouble > 0.20))
    }

    for (parts <- Seq(1, 7)) {
      val docs = base.repartition(parts)
      val gotF = Corpus.lmFluency(docs).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("mean_inv_p")))).toMap
      graft.Caches.releaseAll()
      assert(gotF === expFluency, s"lmFluency diverged at $parts partitions")
      val gotR = Corpus.repetitionProfile(docs).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_grams"), r.getAs[Double]("top_share"),
            r.getAs[Double]("dup_share"), r.getAs[Boolean]("flagged")))).toMap
      assert(gotR === expRep, s"repetitionProfile diverged at $parts partitions")
    }
  }

  test("knFluency: hand-checked Kneser–Ney scores; continuation mass beats add-one's blindness") {
    import spark.implicits._
    // bigram tokens: "a b" x3, "a z" x1, "z b" x1
    // types B=3; heads: a(c1=4,nc1=2), z(c1=1,nc1=1); hists: b(nh2=2), z(nh2=1)
    val docs = Seq(
      (10L, "a b"), (11L, "a b"), (12L, "a b"), (13L, "a z"), (14L, "z b"),
      (15L, "solo"), // single word: no bigrams, absent from output
    ).toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
    val out = Corpus.knFluency(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("mean_inv_kn")))).toMap
    graft.Caches.releaseAll()
    assert(out.keySet === Set(10L, 11L, 12L, 13L, 14L))
    // "a b": floor(4e6*4*3 / (max(12-3,0)*3 + 3*2*2)) = floor(48e6/39) = 1230769
    assert(out(10L) === ((1L, 1.230769)))
    // "a z": floor(48e6 / (1*3 + 3*2*1)) = floor(48e6/9) = 5333333
    assert(out(13L) === ((1L, 5.333333)))
    // "z b": floor(4e6*1*3 / (1*3 + 3*1*2)) = floor(12e6/9) = 1333333
    assert(out(14L) === ((1L, 1.333333)))
    // the rare continuation "z" is the least fluent; "z b" (rare head but
    // common continuation "b") sits close to the common bigram — the
    // continuation-probability behavior add-one smoothing cannot express
    assert(out(13L)._2 > out(14L)._2 && out(14L)._2 > out(10L)._2)
  }

  test("knFluency: partition-invariant and equal to a plain-JVM BigInt recompute on a random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val vocabPool = Vector("a", "b", "c", "dd", "ee", "fff", "gg", "hh", "ii", "jj")
    val texts = (0L until 40L).map { id =>
      val n = 2 + rnd.nextInt(30)
      id -> Seq.fill(n)(vocabPool(rnd.nextInt(vocabPool.length))).mkString(" ")
    }
    val base = texts.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
    val bigrams = texts.flatMap { case (id, t) =>
      val w = t.split(" ", -1); w.sliding(2).filter(_.length == 2)
        .map(p => (id, p(0) + " " + p(1), p(0), p(1))).toSeq
    }
    val c12 = bigrams.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    // keys is a SET — .toSeq before mapping to counts, or equal counts
    // would dedupe and understate c1
    val heads = c12.keys.toSeq.groupBy(_.split(" ")(0)).map { case (w1, ks) =>
      w1 -> ((ks.map(c12).sum, ks.size.toLong))
    }
    val hists = c12.keys.toSeq.groupBy(_.split(" ")(1)).map { case (w2, ks) =>
      w2 -> ks.size.toLong
    }
    val bTypes = c12.size.toLong
    val exp = bigrams.groupBy(_._1).map { case (id, bs) =>
      val s = bs.map { case (_, bg, w1, w2) =>
        val (c1, nc1) = heads(w1)
        val num = BigInt(4000000L) * c1 * bTypes
        val den = BigInt(math.max(4L * c12(bg) - 3L, 0L)) * bTypes +
          BigInt(3L) * nc1 * hists(w2)
        (num / den).toLong
      }.sum
      id -> ((bs.size.toLong, s.toDouble / bs.size.toDouble / 1e6))
    }
    for (parts <- Seq(1, 7)) {
      val got = Corpus.knFluency(base.repartition(parts)).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("mean_inv_kn")))).toMap
      graft.Caches.releaseAll()
      assert(got === exp, s"knFluency diverged at $parts partitions")
    }
  }

  test("repetitionProfile: exact shares and the 0.20 top-share flag") {
    import spark.implicits._
    val docs = Seq(
      // 4 bigrams: "x y","y x","x y","y x" -> top 2/4, dup 4/4, flagged
      (0L, "x y x y x"),
      // 4 distinct bigrams -> top 1/4 = 0.25, dup 0, still flagged (>0.2)
      (1L, "a b c d e"),
      // 9 bigrams, all distinct -> top 1/9 < 0.2, not flagged
      (2L, "p q r s t u v w x y"),
    ).toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
    val out = Corpus.repetitionProfile(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Double]("top_share"),
          r.getAs[Double]("dup_share"), r.getAs[Boolean]("flagged")))).toMap
    assert(out(0L) === ((4L, 0.5, 1.0, true)))
    assert(out(1L) === ((4L, 0.25, 0.0, true)))
    assert(out(2L)._1 === 9L)
    assert(!out(2L)._4)
  }

  /** Plain-JVM reference of the exact-integer BM25 (same expression tree
    * as the operator: per-term one double division of exact integers,
    * cross-term sum folded left-to-right).
    */
  private def refBm25(
      texts: Map[Long, String], terms: Seq[String]): Map[Long, Double] = {
    val toks = texts.view.mapValues(_.split(" ").toSeq).toMap
    val n = BigInt(texts.size)
    val s = BigInt(toks.values.map(_.size).sum)
    val df = terms.map(t => t -> BigInt(toks.values.count(_.contains(t)))).toMap
    toks.map { case (id, ws) =>
      val dl = BigInt(ws.size)
      val score = terms.map { t =>
        val tf = BigInt(ws.count(_ == t))
        if (tf == 0) 0.0
        else {
          val num = (2 * n - 2 * df(t) + 1) * (tf * s * 22)
          val den = (2 * df(t) + 1) * (s * tf * 10 + s * 3 + dl * n * 9)
          num.doubleValue / den.doubleValue
        }
      }.reduceLeft(_ + _)
      id -> score
    }.filter(_._2 > 0)
  }

  test("bm25TopDocs: hand-checked exact-integer scores, ranking, and tf audit columns") {
    val docs = corpus // N=5, S=12; df(alpha)=3, df(beta)=2
    val out = Corpus.bm25TopDocs(docs, Seq("alpha", "beta"), k = 3).collect()
      .map(r => r.getAs[Int]("rnk") ->
        ((r.getAs[Long]("doc_id"), r.getAs[Long]("dl"),
          r.getAs[Long]("tf_alpha"), r.getAs[Long]("tf_beta"),
          r.getAs[Double]("score")))).toMap
    // alpha idf = 5/7, beta idf = 7/5 (rational RSJ surrogate, 2N-2df+1 / 2df+1)
    val d0 = 2640.0 / 2877.0 + 1848.0 / 1455.0 // "alpha beta alpha"
    val d2 = 0.0 + 5544.0 / 2655.0             // "beta beta beta"
    val d1 = 1320.0 / 1722.0                   // "alpha gamma"
    assert(out(1) === ((0L, 3L, 2L, 1L, d0)))
    assert(out(2) === ((2L, 3L, 0L, 3L, d2)))
    assert(out(3) === ((1L, 2L, 1L, 0L, d1)))
    assert(out.size === 3) // doc3 has no query term, doc4 is cut at k=3
    graft.Caches.releaseAll()
  }

  test("bm25Scores: partition-invariant and equal to the plain-JVM exact-integer recompute") {
    import spark.implicits._
    val vocab = Vector("spark", "merge", "window", "scan", "join", "sort", "agg")
    val rnd = new scala.util.Random(4242)
    val texts = (0L until 60L).map { id =>
      id -> Seq.fill(3 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }.toMap
    val expected = refBm25(texts, Seq("spark", "merge", "window"))
    for (parts <- Seq(1, 3, 7)) {
      val docs = texts.toSeq.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars").repartition(parts)
      val got = Corpus.bm25Scores(docs).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
      assert(got === expected, s"bm25Scores diverged at $parts partitions")
      graft.Caches.releaseAll()
    }
  }

  test("nbPredict: hand-computed micro scores, argmin, and the class-name tie-break") {
    import spark.implicits._
    // train: newsy = {alpha:3, beta:2, gamma:1} (N=6),
    //        webby = {zig:2, zag:3, boom:1}     (N=6), V = 6
    // unseen = 1e6 * (6 + 6) = 12e6 for both classes
    val train = Seq(
      (0L, "alpha beta alpha", "newsy"), (1L, "alpha beta gamma", "newsy"),
      (2L, "zig zag zig", "webby"), (3L, "zag zag boom", "webby"),
    ).toDF("doc_id", "text", "source")
    // doc 10 "alpha beta": newsy = 2*12e6 + (12e6 div 4 - 12e6) + (12e6 div 3 - 12e6)
    //                            = 24e6 - 9e6 - 8e6 = 7e6 < webby 24e6
    // doc 11 "zig zag zag": webby = 36e6 - 8e6 - 2*9e6 = 10e6 < newsy 36e6
    // doc 12 "qqq www": both 24e6 -> tie -> lexicographically first class
    val test = Seq(
      (10L, "alpha beta", "x"), (11L, "zig zag zag", "x"), (12L, "qqq www", "x"),
    ).toDF("doc_id", "text", "source")
    for (parts <- Seq(1, 3)) {
      val got = Corpus.nbPredict(train.repartition(parts), test.repartition(parts))
        .collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted")).toMap
      graft.Caches.releaseAll()
      assert(got === Map(10L -> "newsy", 11L -> "webby", 12L -> "newsy"),
        s"nbPredict diverged at $parts partitions: $got")
    }
  }

  test("cmFrequencyAudit: cells match a plain-JVM count-min replay, estimates never undercount") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def h(i: Int, w: Int, word: String): Int =
      Integer.parseInt(md5hex(s"cm$i|$word").take(4), 16) % w
    val texts = Seq(
      (0L, "ox ox ox ox zeta"), (1L, "ox pig pig emu"), (2L, "emu emu zeta pig ox"),
      (3L, "ant bee cat dog elk fox"), (4L, "ox pig emu zeta ant bee"))
    val docs = texts.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // plain-JVM replay: exact counts, 4x64 cells, min-of-rows estimates
    val counts = texts.flatMap(_._2.split(" ")).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val (d, w, k) = (4, 64, 5)
    val cells = counts.toSeq
      .flatMap { case (word, n) => (0 until d).map(i => (i, h(i, w, word)) -> n) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val probes = counts.toSeq.sortBy { case (wd, n) => (-n, wd) }.take(k)
    val expected = probes.map { case (word, n) =>
      val est = (0 until d).map(i => cells((i, h(i, w, word)))).min
      word -> ((n, est, est - n))
    }.toMap
    for (parts <- Seq(1, 3)) {
      val got = graft.operators.Corpus
        .cmFrequencyAudit(docs.repartition(parts), d, w, k).collect()
        .map(r => r.getAs[String]("word") ->
          ((r.getAs[Long]("n"), r.getAs[Long]("cm_est"),
            r.getAs[Long]("overcount")))).toMap
      graft.Caches.releaseAll()
      assert(got === expected, s"CM audit diverged at $parts partitions")
      got.values.foreach { case (n, est, over) =>
        assert(est >= n && over === est - n, "CM must never undercount")
      }
    }
  }

  test("zipfSlope: hand-replayed decade fit on a constructed spectrum") {
    import spark.implicits._
    // source "s": frequencies 8,4,2,2,1,1,1,1 ->
    //   spec: x=3:1, x=2:1, x=1:2, x=0:4
    //   ccdf (desc): x=3 -> 1, x=2 -> 2, x=1 -> 4, x=0 -> 8
    //   y = floor(log2(ccdf)): 0, 1, 2, 3 — a perfect line, slope -1,
    //   zipf_s = 1, r2 = 1
    val words =
      Seq.fill(8)("w8") ++ Seq.fill(4)("w4") ++
        Seq.fill(2)("wa") ++ Seq.fill(2)("wb") ++ Seq("r1", "r2", "r3", "r4")
    val docs = words.grouped(4).zipWithIndex.map { case (g, i) =>
      (i.toLong, g.mkString(" "), "en", "s", 10L)
    }.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
    for (parts <- Seq(1, 3)) {
      val got = graft.operators.Corpus.zipfSlope(docs.repartition(parts))
        .collect().map(r => r.getAs[String]("source") ->
          ((r.getAs[Long]("n_decades"), r.getAs[Double]("slope"),
            r.getAs[Double]("zipf_s"), r.getAs[Double]("r2")))).toMap
      assert(got === Map("s" -> ((4L, -1.0, 1.0, 1.0))),
        s"zipf fit diverged at $parts partitions: $got")
    }
  }

  test("lmAffinity: hand-computed 2x2 matrix, self- and cross-LM pricing") {
    import spark.implicits._
    // newsy LM: bigrams {a b:1, a z:1}, heads {a:2}, V=1
    // webby LM: bigrams {z z:1}, heads {z:1}, V=1
    // inv_p(a b | newsy) = 1e6*(2+1) div 2 = 1.5e6 (same for a z)
    // any bigram under a foreign LM with unseen head = 1e6*(0+1) div 1
    val docs = Seq(
      (0L, "a b", "en", "newsy", 3L), (1L, "a z", "en", "newsy", 3L),
      (2L, "z z", "en", "webby", 3L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    for (parts <- Seq(1, 3)) {
      val got = Corpus.lmAffinityFractionPinned(docs.repartition(parts), samplePct = 100)
        .collect()
        .map(r => (r.getAs[String]("source"), r.getAs[String]("lm")) ->
          ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("mean_inv_p")))).toMap
      graft.Caches.releaseAll()
      assert(got === Map(
        ("newsy", "newsy") -> ((2L, 1.5)), ("newsy", "webby") -> ((2L, 1.0)),
        ("webby", "webby") -> ((1L, 1.0)), ("webby", "newsy") -> ((1L, 1.0))),
        s"affinity matrix diverged at $parts partitions: $got")
    }
  }

  test("lmAffinityBudget at a full budget is bit-identical to the full-population pct path") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val pct = Corpus.lmAffinityFractionPinned(docs, samplePct = 100).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("mean_inv_p")))).toMap
    graft.Caches.releaseAll()
    // sampleMicro = 1e6 keeps every doc, so the two hash widths converge
    val bud = Corpus.lmAffinityBudget(docs, 1000000L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("mean_inv_p")))).toMap
    graft.Caches.releaseAll()
    assert(bud === pct, "full-budget and full-pct scoring must agree bit-for-bit")
    // and a partial budget actually subsamples (the contract's point)
    val part = Corpus.lmAffinityBudget(docs, 250000L).collect()
      .map(r => r.getAs[Long]("n_bigrams")).sum
    graft.Caches.releaseAll()
    val full = pct.values.map(_._1).sum
    assert(part > 0 && part < full,
      s"a 25% budget must probe a strict non-empty subset: $part vs $full")
  }

  test("nbConfusion on the test tables: folds cover the corpus, predictions come from the trained fold") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val n = docs.count()
    val conf = Corpus.nbConfusion(docs).collect()
    graft.Caches.releaseAll()
    val scored = conf.map(_.getAs[Long]("n")).sum
    // every test-fold doc gets exactly one prediction; the md5 split is
    // roughly balanced, never the degenerate all-train/all-test fold
    assert(scored > n / 4 && scored < 3 * n / 4,
      s"test fold $scored of $n is not a plausible half")
    val sources = docs.select("source").distinct().collect()
      .map(_.getString(0)).toSet
    for (r <- conf) {
      assert(sources(r.getAs[String]("source")))
      assert(sources(r.getAs[String]("predicted")))
    }
  }
}
