package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.DataFrame

import graft.operators.{Corpus, Prep, Relational, Similarity}

/** Cross-scale oracle consistency: the driver's DuckDB gate runs at ONE
  * scale (sf0.01), so a scale-dependent divergence — decimal widening, a
  * sampling boundary, a KMV exact→estimate transition, fixed-point
  * accumulation — could pass today and fail at 10×. This spec recomputes
  * the most hash-sensitive queries with an INDEPENDENT implementation
  * (plain JVM: BigDecimal, MessageDigest md5, int64 fixed-point, driver
  * loops — none of Spark's expression evaluation) and requires exact
  * equality at TWO data scales per query.
  *
  * Scale choice: documents/embeddings are identical at sf0.001 and
  * sf0.01 (500 rows each) and only grow at sf0.1 (5000 docs / 2000
  * vectors), so document/embedding queries compare sf0.001 vs sf0.1;
  * the lineitem-based q02 compares sf0.001 (6k rows) vs sf0.01 (60k).
  */
class CrossSfOracleSpec extends SparkSpec {

  // ---- the independent primitive layer (no Spark evaluation) ----

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  /** Corpus.hashBucket twin: 16-bit md5 prefix of the id's decimal string,
    * mod 100. */
  private def bucket(id: Long): Long =
    java.lang.Long.parseLong(md5Hex(id.toString).substring(0, 4), 16) % 100

  /** Corpus.h48 twin: 48-bit md5 prefix of the raw string. */
  private def h48(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 12), 16)

  /** Spark's double→decimal(18,2) cast twin: shortest-decimal repr of the
    * double, rounded HALF_UP at scale 2. */
  private def dec2(d: Double): JBigDecimal =
    JBigDecimal.valueOf(d).setScale(2, RoundingMode.HALF_UP)

  /** FixedPointDot twin. */
  private def qdot(a: Array[Float], b: Array[Float]): Long = {
    var acc = 0L
    var i = 0
    while (i < a.length) {
      acc += math.floor(a(i).toDouble * 1e8 + 0.5).toLong *
        math.floor(b(i).toDouble * 1e8 + 0.5).toLong
      i += 1
    }
    acc
  }

  private def cosine(dot: Long, n2a: Long, n2b: Long): Double =
    dot.toDouble / (math.sqrt(n2a.toDouble) * math.sqrt(n2b.toDouble))

  private def docs(dir: String): Seq[(Long, String, String, String, Long)] =
    graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))

  // ---- q02: exact decimal aggregation over lineitem ----

  test("q02 agg_pricing_summary matches a BigDecimal recompute at sf0.001 and sf0.01") {
    for (dir <- Seq(sf0001, sf001)) {
      val rows = graft.sources.Tables.lineitem(spark, dir)
        .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount")
        .collect()
      case class Acc(var qty: JBigDecimal = JBigDecimal.ZERO,
                     var price: JBigDecimal = JBigDecimal.ZERO,
                     var disc: JBigDecimal = JBigDecimal.ZERO,
                     var discPrice: JBigDecimal = JBigDecimal.ZERO,
                     var n: Long = 0L)
      val acc = scala.collection.mutable.LinkedHashMap.empty[(String, String), Acc]
      rows.foreach { r =>
        val a = acc.getOrElseUpdate((r.getString(0), r.getString(1)), Acc())
        a.qty = a.qty.add(dec2(r.getDouble(2)))
        a.price = a.price.add(dec2(r.getDouble(3)))
        a.disc = a.disc.add(dec2(r.getDouble(4)))
        a.discPrice = a.discPrice.add(dec2(r.getDouble(3)).multiply(dec2(1.0 - r.getDouble(4))))
        a.n += 1
      }
      val expected = acc.map { case ((rf, ls), a) =>
        (rf, ls, a.qty.doubleValue, a.price.doubleValue,
          a.discPrice.doubleValue, a.disc.doubleValue / a.n, a.n)
      }.toSet
      val got = Relational.aggPricingSummary(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getLong(6))).toSet
      assert(got === expected, s"q02 diverged from the BigDecimal recompute at $dir")
    }
  }

  // ---- q42: KMV sketch + deterministic-sample quantiles ----

  test("q42 sketch_profile matches a plain-JVM KMV recompute at sf0.001 and sf0.1") {
    val k = 64
    val samplePct = 12
    def kmv(hashes: Iterable[Long]): Long = {
      val distinct = hashes.to(scala.collection.immutable.SortedSet)
      if (distinct.size < k) distinct.size.toLong
      else ((k - 1).toLong << 48) / distinct.take(k).last
    }
    for (dir <- Seq(sf0001, sf01)) {
      val ds = docs(dir)
      val bySrc = ds.groupBy(_._4)
      val expected = bySrc.map { case (src, rs) =>
        val sample = rs.filter(r => bucket(r._1) < samplePct)
          .map(r => (r._5, r._1)).sorted.map(_._1)
        def at(p: Double): Option[Long] =
          if (sample.isEmpty) None
          else Some(sample(math.ceil(sample.size * p).toInt - 1))
        (src, rs.size.toLong,
          kmv(rs.map(r => h48(r._2))), kmv(rs.map(r => h48(r._3))),
          at(0.50), at(0.95),
          if (sample.isEmpty) None else Some(sample.size.toLong))
      }.toSet
      val got = Corpus.sketchProfileKmv(spark, dir).collect().map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), opt(4), opt(5), opt(6))
      }.toSet
      assert(got === expected, s"q42 diverged from the KMV recompute at $dir")
    }
  }

  // ---- q51: bigram counts + windowed conditional probability ----

  test("q51 bigram_lm matches a driver-side count recompute at sf0.001 and sf0.1") {
    for (dir <- Seq(sf0001, sf01)) {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      docs(dir).foreach { case (_, text, _, _, _) =>
        val w = text.split(" ", -1)
        if (w.length >= 2)
          (0 until w.length - 1).foreach { i =>
            val bg = w(i) + " " + w(i + 1)
            counts(bg) = counts.getOrElse(bg, 0L) + 1L
          }
      }
      val byW1 = counts.toSeq.groupBy(_._1.split(" ", 2)(0))
        .map { case (w1, bgs) => w1 -> bgs.map(_._2).sum }
      val expected = counts.map { case (bg, n) =>
        (bg, n, n.toDouble / byW1(bg.split(" ", 2)(0)))
      }.toSet
      val got = Prep.bigramLm(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === expected, s"q51 diverged from the count recompute at $dir")
    }
  }

  // ---- q66: temperature-weighted mixture sampling ----

  test("q66 mixture_sample matches a driver-side rate recompute at sf0.001 and sf0.1") {
    for (dir <- Seq(sf0001, sf01)) {
      val ds = docs(dir)
      val nSrc = ds.groupBy(_._4).map { case (s, rs) => s -> rs.size.toLong }
      val nMin = nSrc.values.min
      val rate = nSrc.map { case (s, n) => s -> math.sqrt(nMin.toDouble / n) }
      val expected = ds.flatMap { case (id, _, _, src, _) =>
        val r = rate(src)
        if (bucket(id).toDouble < r * 100.0) Some((id, src, r)) else None
      }.toSet
      val got = Prep.mixtureSample(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(got === expected, s"q66 diverged from the rate recompute at $dir")
    }
  }

  // ---- q61: fixed-point Lloyd k-means + IVF cell-probe search ----

  test("q61 ann_ivf_trained matches a driver-side Lloyd+probe recompute at sf0.001 and sf0.1") {
    val (nCells, iters, nProbe, k, nQueries) = (8, 2, 2, 5, 10)
    for (dir <- Seq(sf0001, sf01)) {
      val emb = graft.sources.Tables.embeddings(spark, dir)
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
      val n2 = emb.map { case (id, v) => id -> qdot(v, v) }.toMap
      val vecs = emb.toMap

      // training: first-nCells init, two exact-arithmetic Lloyd iterations
      var cents: Seq[(Long, Array[Float], Long)] = emb.filter(_._1 < nCells)
        .map { case (id, v) => (id, v, n2(id)) }
      for (_ <- 1 to iters) {
        val members = emb.map { case (id, v) =>
          // argmax cosine, ties to the smallest cid — Spark's
          // (ccos DESC, cid ASC) row_number ordering
          val best = cents.map { case (cid, ce, cn2) =>
            (cosine(qdot(v, ce), n2(id), cn2), cid)
          }.sortBy(t => (-t._1, t._2)).head
          (best._2, v)
        }
        cents = members.groupBy(_._1).toSeq.sortBy(_._1).map { case (cid, ms) =>
          val dims = ms.head._2.length
          val m = Array.tabulate(dims) { d =>
            val s = ms.map(x => math.floor(x._2(d).toDouble * 1e8 + 0.5).toLong).sum
            (s.toDouble / (ms.size * 1e8)).toFloat
          }
          (cid, m, qdot(m, m))
        }
      }

      // probe: assign every vector, each query probes nProbe cells, exact
      // cosine rank with (cosine DESC, neighbor_id ASC) tie-break
      def rankedCells(id: Long): Seq[Long] = cents
        .map { case (cid, ce, cn2) => (cosine(qdot(vecs(id), ce), n2(id), cn2), cid) }
        .sortBy(t => (-t._1, t._2)).map(_._2)
      val assign = emb.map { case (id, _) => id -> rankedCells(id).head }.toMap
      val expected = emb.map(_._1).filter(_ < nQueries).flatMap { q =>
        val probed = rankedCells(q).take(nProbe).toSet
        val cands = emb.map(_._1).filter(v => v != q && probed.contains(assign(v)))
        cands.map(v => (cosine(qdot(vecs(q), vecs(v)), n2(q), n2(v)), v))
          .sortBy(t => (-t._1, t._2)).take(k).zipWithIndex
          .map { case ((cos, v), i) => (q, v, cos, i + 1) }
      }.toSet
      val got = Similarity.annIvfTrained(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(got === expected, s"q61 diverged from the Lloyd+probe recompute at $dir")
    }
  }

  // ---- q79: elementwise int8 quantization ----

  test("q79 emb_quantize matches a plain-JVM recompute at sf0.001 and sf0.1") {
    for (dir <- Seq(sf0001, sf01)) {
      val emb = graft.sources.Tables.embeddings(spark, dir)
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val expected = emb.map { case (id, v) =>
        val xd = v.map(_.toDouble)
        val (mn, mx) = (xd.min, xd.max)
        val scale = (mx - mn) / 255.0
        val qSum = if (scale == 0.0) 0L
          else xd.map(e => math.floor((e - mn) / scale + 0.5).toLong).sum
        val maxErr = if (scale == 0.0) 0.0
          else xd.map(e =>
            math.abs(e - (mn + math.floor((e - mn) / scale + 0.5) * scale))).max
        (id, mn, mx, scale, qSum, maxErr)
      }.toSet
      val got = Similarity.quantizeInt8(graft.sources.Tables.embeddings(spark, dir))
        .collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("mn"),
          r.getAs[Double]("mx"), r.getAs[Double]("scale"),
          r.getAs[Long]("q_sum"), r.getAs[Double]("max_err"))).toSet
      assert(got === expected, s"q79 diverged from the plain-JVM recompute at $dir")
    }
  }

  // ---- q82: signed feature-hashing embeddings ----

  test("q82 feature_hash_embed matches a plain-JVM signed-hash recompute at sf0.001 and sf0.1") {
    val dims = 64
    for (dir <- Seq(sf0001, sf01)) {
      val expected = docs(dir)
        .flatMap { case (id, text, _, _, _) =>
          text.split(" ", -1).map { w =>
            val hex = md5Hex(w)
            val pos = (java.lang.Long.parseLong(hex.substring(0, 12), 16) % dims).toInt
            val sgn = if (Integer.parseInt(hex.substring(12, 13), 16) % 2 == 0) 1L else -1L
            ((id, pos), sgn)
          }
        }
        .groupBy(_._1).map { case ((id, pos), vs) => (id, pos, vs.map(_._2).sum) }
        .toSet
      val got = Corpus.featureHashEmbed(graft.sources.Tables.documents(spark, dir), dims)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("pos"), r.getAs[Long]("value")))
        .toSet
      assert(got === expected, s"q82 diverged from the signed-hash recompute at $dir")
    }
  }

  // ---- q81: fixed-point per-language centroids ----

  test("q81 lang_centroid matches a fixed-point recompute at sf0.001 and sf0.1") {
    for (dir <- Seq(sf0001, sf01)) {
      val lang = docs(dir).map(d => d._1 -> d._3).toMap
      val emb = graft.sources.Tables.embeddings(spark, dir)
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .filter(e => lang.contains(e._1))
      val expected = emb
        .flatMap { case (id, v) =>
          v.zipWithIndex.map { case (x, i) =>
            ((lang(id), i + 1), math.floor(x.toDouble * 1e8 + 0.5).toLong) }
        }
        .groupBy(_._1).map { case ((lg, pos), xs) =>
          (lg, pos, xs.length.toLong, xs.map(_._2).sum.toDouble / (xs.length * 1e8))
        }.toSet
      val got = Similarity.langCentroids(spark, dir).collect()
        .map(r => (r.getAs[String]("lang"), r.getAs[Int]("pos"),
          r.getAs[Long]("n_vecs"), r.getAs[Double]("centroid"))).toSet
      assert(got === expected, s"q81 diverged from the fixed-point recompute at $dir")
    }
  }

  // ---- q97: exact-moment OLS/correlation over lineitem ----

  test("q97 regression_stats matches a BigInteger-moments recompute bit-exactly at sf0.001 and sf0.1") {
    import java.math.BigInteger
    for (dir <- Seq(sf0001, sf01)) {
      val rows = graft.sources.Tables.lineitem(spark, dir)
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
      def cents(d: Double): BigInteger =
        dec2(d).movePointRight(2).toBigIntegerExact()
      case class M(var n: Long = 0L,
                   var sx: BigInteger = BigInteger.ZERO,
                   var sy: BigInteger = BigInteger.ZERO,
                   var sxx: BigInteger = BigInteger.ZERO,
                   var sxy: BigInteger = BigInteger.ZERO,
                   var syy: BigInteger = BigInteger.ZERO)
      val acc = scala.collection.mutable.HashMap.empty[String, M]
      rows.foreach { r =>
        val m = acc.getOrElseUpdate(r.getString(0), M())
        val (x, y) = (cents(r.getDouble(1)), cents(r.getDouble(2)))
        m.n += 1
        m.sx = m.sx.add(x); m.sy = m.sy.add(y)
        m.sxx = m.sxx.add(x.multiply(x))
        m.sxy = m.sxy.add(x.multiply(y))
        m.syy = m.syy.add(y.multiply(y))
      }
      val expected = acc.map { case (flag, m) =>
        val nB = BigInteger.valueOf(m.n)
        // same op order as the operator: exact integer combination,
        // one correctly-rounded double conversion, then IEEE ops
        val cov = nB.multiply(m.sxy).subtract(m.sx.multiply(m.sy)).doubleValue
        val vx = nB.multiply(m.sxx).subtract(m.sx.multiply(m.sx)).doubleValue
        val vy = nB.multiply(m.syy).subtract(m.sy.multiply(m.sy)).doubleValue
        val slope = cov / vx
        val intercept = (m.sy.doubleValue - cov / vx * m.sx.doubleValue) / m.n.toDouble / 100.0
        val corr = cov / (math.sqrt(vx) * math.sqrt(vy))
        (flag, m.n, slope, intercept, corr)
      }.toSet
      val got = graft.operators.Advanced.regressionStats(
        graft.sources.Tables.lineitem(spark, dir)).collect()
        .map(r => (r.getAs[String]("l_returnflag"), r.getAs[Long]("n"),
          r.getAs[Double]("slope"), r.getAs[Double]("intercept"),
          r.getAs[Double]("corr"))).toSet
      assert(got === expected, s"q97 diverged from the exact-moment recompute at $dir")
    }
  }

  // ---- q102/q103: exact-micros event-time arithmetic ----

  /** TIMESTAMP_NTZ → epoch micros with plain java.time arithmetic — no
    * Spark expression evaluation, so a regression in the ns→µs source
    * conversion (the double-division bug this round fixed) reappears as
    * a diff here. */
  private def micros(t: java.time.LocalDateTime): Long =
    t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L

  private def eventsUs(dir: String): Seq[(Long, Long, String, Long)] =
    graft.sources.Tables.events(spark, dir)
      .select("event_id", "user_id", "event_type", "ts")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        micros(r.getAs[java.time.LocalDateTime](3))))

  test("q116 max_drawdown matches a running-peak recompute at sf0.001 and sf0.01") {
    for (dir <- Seq(sf0001, sf001)) {
      val os = graft.sources.Tables.orders(spark, dir)
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
        .collect().toSeq
        .map(r => (r.getLong(0), micros(r.getAs[java.time.LocalDateTime](1)),
          r.getLong(2), r.getDouble(3)))
      val expected = os.groupBy(_._1).map { case (ck, rows) =>
        val sorted = rows.sortBy(r => (r._2, r._3))
        var peak = Long.MinValue; var dd = Long.MinValue
        sorted.foreach { r =>
          val c = dec2(r._4).movePointRight(2).longValueExact()
          peak = math.max(peak, c); dd = math.max(dd, peak - c)
        }
        (ck, rows.length.toLong, dd.toDouble / 100.0)
      }.toSet
      val got = graft.operators.Advanced.maxDrawdown(
        graft.sources.Tables.orders(spark, dir)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === expected, s"q116 diverged from the running-peak recompute at $dir")
    }
  }

  test("q120 allocate_cents matches a largest-remainder recompute at sf0.001 and sf0.01") {
    for (dir <- Seq(sf0001, sf001)) {
      val li = graft.sources.Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_linenumber", "l_quantity").collect().toSeq
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      val os = graft.sources.Tables.orders(spark, dir)
        .select("o_orderkey", "o_totalprice").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val expected: Map[(Long, Int), Long] = li.groupBy(_._1).flatMap {
        case (ok, items) =>
          os.get(ok).toSeq.flatMap { tp =>
            val totalC = dec2(tp).movePointRight(2).longValueExact()
            val qs = items.map { case (_, ln, q) =>
              (ln, dec2(q).movePointRight(2).longValueExact()) }
            val qSum = qs.map(_._2).sum
            val base = qs.map { case (ln, qc) =>
              (ln, Math.floorDiv(totalC * qc, qSum), Math.floorMod(totalC * qc, qSum)) }
            val residual = totalC - base.map(_._2).sum
            base.sortBy { case (ln, _, rem) => (-rem, ln) }.zipWithIndex.map {
              case ((ln, b, _), i) => ((ok, ln), b + (if (i < residual) 1L else 0L)) }
          }
      }
      val got = graft.operators.Advanced.allocateProportional(
        graft.sources.Tables.lineitem(spark, dir),
        graft.sources.Tables.orders(spark, dir)).collect()
        .map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
      assert(got === expected, s"q120 diverged from the allocation recompute at $dir")
    }
  }

  test("q130 state_dwell matches a lead-gap recompute at sf0.001 and sf0.1") {
    for (dir <- Seq(sf0001, sf01)) {
      val expected = eventsUs(dir)
        .groupBy(_._2)
        .toSeq.flatMap { case (_, es) =>
          val sorted = es.sortBy(e => (e._4, e._1))
          sorted.zip(sorted.drop(1)).map { case (a, b) => (a._3, b._4 - a._4) }
        }
        .groupBy(_._1).map { case (tpe, gaps) =>
          val tot = gaps.map(_._2).sum
          (tpe, gaps.length.toLong, tot, tot.toDouble / gaps.length)
        }.toSet
      val got = graft.operators.Advanced.stateDwell(
        graft.sources.Tables.events(spark, dir)).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got === expected, s"q130 diverged from the lead-gap recompute at $dir")
    }
  }

  test("q102 event_throttle matches a java.time recompute at sf0.001 and sf0.1") {
    for (dir <- Seq(sf0001, sf01)) {
      val gap = 1800L * 1000000L
      val expected = eventsUs(dir)
        .groupBy(e => (e._2, e._3))
        .flatMap { case (_, es) =>
          val sorted = es.sortBy(e => (e._4, e._1))
          sorted.zip(None +: sorted.map(e => Some(e._4)))
            .collect { case (e, prev) if prev.forall(p => e._4 - p >= gap) => e }
        }
        .map(e => (e._1, e._2, e._3, e._4)).toSet
      val got = graft.operators.Advanced.throttleEvents(
        graft.sources.Tables.events(spark, dir)).collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
          r.getAs[String]("event_type"), r.getAs[Long]("us"))).toSet
      assert(got === expected, s"q102 diverged from the java.time recompute at $dir")
    }
  }

  test("q103 conversion_latency matches a rank-formula recompute at sf0.001 and sf0.1") {
    for (dir <- Seq(sf0001, sf01)) {
      val byUser = eventsUs(dir)
        .filter(e => e._3 == "signup" || e._3 == "purchase")
        .groupBy(_._2)
      val converted = byUser.flatMap { case (uid, es) =>
        val s = es.filter(_._3 == "signup").map(_._4).minOption
        val p = es.filter(_._3 == "purchase").map(_._4).minOption
        for (su <- s; pu <- p if pu >= su) yield {
          val cohortUs = java.time.LocalDateTime
            .ofEpochSecond(su / 1000000L, 0, java.time.ZoneOffset.UTC)
            .withDayOfMonth(1).toLocalDate.atStartOfDay
            .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
          (cohortUs, pu - su, uid)
        }
      }.toSeq
      val expected = converted.groupBy(_._1).map { case (cohortUs, xs) =>
        val sorted = xs.sortBy(x => (x._2, x._3)).map(_._2)
        val n = sorted.length
        def at(p: Double) = sorted(math.ceil(n * p).toInt - 1)
        (cohortUs, n.toLong, at(0.5), at(0.9))
      }.toSet
      val got = graft.operators.Advanced.conversionLatency(
        graft.sources.Tables.events(spark, dir)).collect()
        .map(r => (r.getAs[java.sql.Timestamp]("cohort").toInstant.getEpochSecond * 1000000L,
          r.getAs[Long]("n_converted"), r.getAs[Long]("median_us"),
          r.getAs[Long]("p90_us"))).toSet
      assert(got === expected, s"q103 diverged from the rank recompute at $dir")
    }
  }

  // ---- q194: integerized alpha=1/4 weights + largest-remainder budget ----

  test("q194 mixture_weights matches a plain-JVM allocation recompute at sf0.001 and sf0.1") {
    val budget = 1000000L
    for (dir <- Seq(sf0001, sf01)) {
      val perSource = docs(dir).groupBy(_._4).map { case (src, rs) =>
        val nTokens = rs.map(_._2.split(" ", -1).length.toLong).sum
        (src, rs.size.toLong, nTokens,
          math.floor(math.sqrt(math.sqrt(nTokens.toDouble)) * 1e6).toLong)
      }.toSeq
      val wTot = perSource.map(_._4).sum
      val based = perSource.map { case (src, nd, nt, w) =>
        (src, nd, nt, w, budget * w / wTot, budget * w % wTot)
      }
      val residual = budget - based.map(_._5).sum
      val expected = based
        .sortBy { case (src, _, _, _, _, rem) => (-rem, src) }.zipWithIndex
        .map { case ((src, nd, nt, w, b, _), i) =>
          val alloc = b + (if (i < residual) 1L else 0L)
          (src, nd, nt, w, alloc, alloc.toDouble / nt)
        }.toSet
      val got = Prep.mixtureWeights(graft.sources.Tables.documents(spark, dir), budget)
        .collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("w_int"),
          r.getAs[Long]("alloc_tokens"), r.getAs[Double]("epochs"))).toSet
      assert(got === expected, s"q194 diverged from the allocation recompute at $dir")
      assert(got.toSeq.map(_._5).sum === budget, s"q194 budget must reconcile at $dir")
    }
  }

  // ---- q197/q199: bigram heavy hitters and coverage curve ----

  private def bigramCounts(dir: String): (collection.Map[String, Long], Long) = {
    val cnt = scala.collection.mutable.HashMap.empty[String, Long].withDefaultValue(0L)
    var n = 0L
    docs(dir).foreach { case (_, text, _, _, _) =>
      val w = text.split(" ", -1)
      var i = 0
      while (i < w.length - 1) {
        cnt(w(i) + " " + w(i + 1)) += 1; n += 1; i += 1
      }
    }
    (cnt, n)
  }

  test("q197 heavy_hitters matches a single-pass count recompute at sf0.001 and sf0.1") {
    val k = 1000
    for (dir <- Seq(sf0001, sf01)) {
      val (cnt, n) = bigramCounts(dir)
      val expected = cnt.collect {
        case (g, c) if c * k >= n => (g, c, c.toDouble / n)
      }.toSet
      val got = Corpus.heavyHitters(graft.sources.Tables.documents(spark, dir), k)
        .collect()
        .map(r => (r.getAs[String]("gram"), r.getAs[Long]("cnt"),
          r.getAs[Double]("freq"))).toSet
      assert(got === expected, s"q197 diverged from the count recompute at $dir")
      assert(got.nonEmpty, s"q197 fixture must have heavy hitters at $dir")
    }
  }

  test("q199 vocab_coverage matches a cumulative-mass recompute at sf0.001 and sf0.1") {
    val sizes = Seq(50L, 100L, 200L, 400L, 800L)
    for (dir <- Seq(sf0001, sf01)) {
      val (cnt, n) = bigramCounts(dir)
      val ranked = cnt.toSeq.sortBy { case (g, c) => (-c, g) }
      val cums = ranked.scanLeft(0L) { case (acc, (_, c)) => acc + c }.drop(1)
      val expected = sizes.filter(_ <= ranked.size).map { s =>
        (s, ranked(s.toInt - 1)._1, cums(s.toInt - 1).toDouble / n)
      }.toSet
      val got = Corpus.vocabCoverage(graft.sources.Tables.documents(spark, dir), sizes)
        .collect()
        .map(r => (r.getAs[Long]("vocab_size"), r.getAs[String]("boundary_gram"),
          r.getAs[Double]("coverage"))).toSet
      assert(got === expected, s"q199 diverged from the cumulative recompute at $dir")
      assert(got.size === sizes.size, s"q199 must emit every size at $dir")
    }
  }

  // ---- q203: DSIR importance weights on the integer lr grid ----

  test("q203 dsir_weights matches an integer-grid recompute at sf0.001 and sf0.1") {
    val nBuckets = 256
    for (dir <- Seq(sf0001, sf01)) {
      // per-(doc, bucket) bigram counts with the 16-bit md5 prefix bucket
      val db = scala.collection.mutable.HashMap.empty[(Long, Long), Long].withDefaultValue(0L)
      val langOf = scala.collection.mutable.HashMap.empty[Long, String]
      docs(dir).foreach { case (id, text, lang, _, _) =>
        langOf(id) = lang
        val w = text.split(" ", -1)
        var i = 0
        while (i < w.length - 1) {
          val b = java.lang.Long.parseLong(
            md5Hex(w(i) + " " + w(i + 1)).substring(0, 4), 16) % nBuckets
          db((id, b)) += 1; i += 1
        }
      }
      val r = scala.collection.mutable.HashMap.empty[Long, Long].withDefaultValue(0L)
      val t = scala.collection.mutable.HashMap.empty[Long, Long].withDefaultValue(0L)
      var bigR = 0L; var bigT = 0L
      db.foreach { case ((id, b), c) =>
        r(b) += c; bigR += c
        if (langOf(id) == "en") { t(b) += c; bigT += c }
      }
      val lr = (0L until nBuckets.toLong).map(b => b -> ((t(b) + 1L) * 1000000L) / (r(b) + 1L)).toMap
      val expected = db.groupBy(_._1._1).map { case (id, m) =>
        val s = m.map { case ((_, b), c) => c * lr(b) }.sum
        val n = m.values.sum
        val meanLr = s.toDouble / (n.toDouble * 1e6)
        (id, (n, meanLr,
          meanLr * ((bigR + nBuckets).toDouble / (bigT + nBuckets).toDouble)))
      }
      val got = Prep.dsirWeights(graft.sources.Tables.documents(spark, dir))
        .collect()
        .map(r => (r.getAs[Long]("doc_id"),
          (r.getAs[Long]("n_bigrams"), r.getAs[Double]("mean_lr"),
            r.getAs[Double]("dsir_weight")))).toMap
      assert(got === expected, s"q203 diverged from the integer-grid recompute at $dir")
      assert(got.nonEmpty, s"q203 fixture must produce weights at $dir")
    }
  }

  // ---- q229: exact fixed-point covariance moments ----

  test("q229 embedding_covariance matches a plain-JVM moments recompute at sf0.001 and sf0.1") {
    val dims = 64
    for (dir <- Seq(sf0001, sf01)) {
      val q = spark.read.parquet(s"$dir/embeddings.parquet")
        .select("embedding").collect()
        .map(_.getSeq[Float](0).toArray
          .map(x => math.floor(x.toDouble * 1e4 + 0.5).toLong))
      val n = q.length.toLong
      val sx = Array.ofDim[Long](dims)
      q.foreach { r => var i = 0; while (i < dims) { sx(i) += r(i); i += 1 } }
      val expected = (for (i <- 0 until dims; j <- i until dims) yield {
        var sxy = 0L
        q.foreach(r => sxy += r(i) * r(j))
        val cov = (n * sxy - sx(i) * sx(j)).toDouble / (n * n).toDouble / 1e8
        (i, j) -> ((n, sxy, sx(i), sx(j), cov))
      }).toMap
      val got = Similarity.embeddingCovariance(
        graft.sources.Tables.embeddings(spark, dir), dims).collect()
        .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
          ((r.getAs[Long]("n"), r.getAs[Long]("sxy"), r.getAs[Long]("sx"),
            r.getAs[Long]("sy"), r.getAs[Double]("cov")))).toMap
      assert(got === expected, s"q229 diverged from the JVM moments recompute at $dir")
      assert(got.size === dims * (dims + 1) / 2)
    }
  }

  // ---- q230: fixed-point power iteration over the exact moments ----

  test("q230 pca_power matches a plain-JVM power-iteration recompute at sf0.001 and sf0.1") {
    val dims = 64
    val iters = 4
    for (dir <- Seq(sf0001, sf01)) {
      val q = spark.read.parquet(s"$dir/embeddings.parquet")
        .select("embedding").collect()
        .map(_.getSeq[Float](0).toArray
          .map(x => math.floor(x.toDouble * 1e4 + 0.5).toLong))
      val n = q.length.toLong
      val sx = Array.ofDim[Long](dims)
      q.foreach { r => var i = 0; while (i < dims) { sx(i) += r(i); i += 1 } }
      // downscaled symmetric covariance numerator, the DECIMAL(38,0)
      // combine mirrored with BigInt then the same double floor
      val c = Array.ofDim[Long](dims, dims)
      for (i <- 0 until dims; j <- i until dims) {
        var sxy = 0L
        q.foreach(r => sxy += r(i) * r(j))
        val num = BigInt(n) * sxy - BigInt(sx(i)) * sx(j)
        val cc = math.floor(num.toDouble / 1073741824.0 + 0.5).toLong
        c(i)(j) = cc; c(j)(i) = cc
      }
      // v0 = 1e6 everywhere; each step: w = C·v (int64), n2 = Σw² exact,
      // v = floor(w / sqrt(n2) * 1e6 + 0.5) — same op order as the plan
      var v = Array.fill(dims)(1000000L)
      for (_ <- 1 to iters) {
        val w = Array.tabulate(dims) { i =>
          var acc = 0L; var j = 0
          while (j < dims) { acc += c(i)(j) * v(j); j += 1 }; acc
        }
        val n2 = w.map(x => BigInt(x) * x).sum
        v = w.map(x =>
          math.floor(x.toDouble / math.sqrt(n2.toDouble) * 1e6 + 0.5).toLong)
      }
      val cv = Array.tabulate(dims) { i =>
        var acc = 0L; var j = 0
        while (j < dims) { acc += c(i)(j) * v(j); j += 1 }; acc
      }
      val num = (0 until dims).map(i => BigInt(cv(i)) * v(i)).sum
      val den = (0 until dims).map(i => v(i) * v(i)).sum
      val tr = (0 until dims).map(i => c(i)(i)).sum
      val expected = (0 until dims).map { i =>
        i -> ((v(i).toDouble / 1e6,
          num.toDouble / den.toDouble / tr.toDouble))
      }.toMap
      val got = Similarity.pcaPower(
        graft.sources.Tables.embeddings(spark, dir), dims, iters).collect()
        .map(r => r.getAs[Int]("dim") ->
          ((r.getAs[Double]("loading"), r.getAs[Double]("var_share")))).toMap
      assert(got === expected, s"q230 diverged from the JVM power-iteration recompute at $dir")
      assert(got.size === dims)
    }
  }

  // ---- q231: per-language exact-moment Pearson over the doc⋈emb join ----

  test("q231 modality_alignment matches a BigInt moments recompute at sf0.001 and sf0.1") {
    for (dir <- Seq(sf0001, sf01)) {
      val chars = docs(dir).map { case (id, _, lang, _, nChars) => id -> ((lang, nChars)) }.toMap
      val norms = spark.read.parquet(s"$dir/embeddings.parquet")
        .select("vec_id", "embedding").collect()
        .map { r =>
          val e = r.getSeq[Float](1).toArray
          r.getLong(0) -> math.floor(math.sqrt(qdot(e, e).toDouble) + 0.5).toLong
        }.toMap
      case class M(var n: Long = 0L, var sx: BigInt = 0, var sy: BigInt = 0,
                   var sxy: BigInt = 0, var sxx: BigInt = 0, var syy: BigInt = 0)
      val acc = scala.collection.mutable.HashMap.empty[String, M]
      norms.foreach { case (id, norm) =>
        chars.get(id).foreach { case (lang, nc) =>
          val m = acc.getOrElseUpdate(lang, M())
          m.n += 1; m.sx += nc; m.sy += norm
          // per-row products are int64 in the plan; the SUM is decimal
          m.sxy += nc * norm; m.sxx += nc * nc
          m.syy += BigInt(norm) * norm
        }
      }
      val expected = acc.map { case (lang, m) =>
        val den = (BigInt(m.n) * m.sxx - m.sx * m.sx).toDouble *
          (BigInt(m.n) * m.syy - m.sy * m.sy).toDouble
        val corr =
          if (den == 0.0) None
          else Some((BigInt(m.n) * m.sxy - m.sx * m.sy).toDouble / math.sqrt(den))
        lang -> ((m.n, corr,
          m.sx.toDouble / m.n.toDouble,
          m.sy.toDouble / m.n.toDouble / 1e8))
      }.toMap
      val got = Similarity.modalityAlignment(
        graft.sources.Tables.documents(spark, dir),
        graft.sources.Tables.embeddings(spark, dir)).collect()
        .map(r => r.getAs[String]("lang") ->
          ((r.getAs[Long]("n"),
            Option(r.getAs[java.lang.Double]("corr")).map(_.doubleValue),
            r.getAs[Double]("mean_chars"), r.getAs[Double]("mean_norm")))).toMap
      assert(got === expected, s"q231 diverged from the BigInt moments recompute at $dir")
      assert(got.nonEmpty, s"q231 must cover the language set at $dir")
    }
  }
}
