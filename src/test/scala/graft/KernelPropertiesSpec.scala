package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GramMoments, KMinValues, MisraGries, BoundedTopK, Scored}

/** Randomized property tests (fixed seeds — fully reproducible) for the
  * three bounded aggregation kernels the oracle-exactness story leans on.
  * Each property is the precise claim the operators rely on:
  *
  *  - KMinValues: the sketch state is a pure FUNCTION OF THE INPUT SET —
  *    any partitioning of the stream, any merge order, any duplication
  *    yields the identical buffer (that is what makes q42/q209
  *    hash-matchable against a SQL recompute), exact below k.
  *  - BoundedTopK: per-partition reduce + arbitrary-order merge equals
  *    the brute-force global sort's top k under the total order
  *    (cosine DESC, neighborId ASC) — the map-side-bounded top-k used by
  *    q24/q190/q193 never loses a winner at a partition boundary.
  *  - MisraGries.offer: estimates never exceed true counts, undercount
  *    is bounded by n/(cap+1), and every element with true count
  *    > n/(cap+1) SURVIVES — the candidate-completeness guarantee that
  *    makes q197's two-pass exact heavy hitters exact.
  */
class KernelPropertiesSpec extends AnyFunSuite {

  private val Trials = 100

  /** Split xs into 1..5 random chunks. */
  private def chunks[A](rnd: scala.util.Random, xs: List[A]): List[List[A]] = {
    if (xs.isEmpty) List(Nil)
    else {
      val n = 1 + rnd.nextInt(5)
      val marks = List.fill(xs.length)(rnd.nextInt(n))
      (0 until n).toList.map(i => xs.zip(marks).collect { case (x, m) if m == i => x })
    }
  }

  private def kmvFold(k: KMinValues, xs: List[Long]): (Int, List[Long]) =
    xs.foldLeft(k.zero)(k.reduce)

  test("KMinValues: partition- and merge-order-invariant, duplication-idempotent, exact below k") {
    val rnd = new scala.util.Random(20260814L)
    val kmv = new KMinValues(8)
    (1 to Trials).foreach { _ =>
      val n = rnd.nextInt(60)
      val xs = List.fill(n)(rnd.nextLong(1L << 48))
      val whole = kmvFold(kmv, xs)
      // any partitioning + any merge order
      val parts = chunks(rnd, xs).map(kmvFold(kmv, _))
      val shuffled = rnd.shuffle(parts)
      assert(shuffled.foldLeft(kmv.zero)(kmv.merge) === whole)
      // duplicating arbitrary elements never changes the sketch
      val dup = xs ++ rnd.shuffle(xs).take(rnd.nextInt(n + 1))
      assert(kmvFold(kmv, rnd.shuffle(dup)) === whole)
      // exact below k
      val distinct = xs.distinct
      if (distinct.length < 8)
        assert(kmv.finish(whole) === distinct.length.toLong)
      // buffer is always the k smallest distinct values (held
      // descending since round 19) with its size tracked exactly
      assert(whole._2.reverse === distinct.sorted.take(8))
      assert(whole._1 === math.min(distinct.length, 8))
    }
  }

  test("BoundedTopK: bounded merge equals the brute-force global top k at any partitioning") {
    val rnd = new scala.util.Random(987654321L)
    val agg = new BoundedTopK(5)
    (1 to Trials).foreach { _ =>
      val n = rnd.nextInt(50)
      // coarse scores force plenty of ties -> the id tiebreak is exercised
      val xs = List.fill(n)(Scored(rnd.nextInt(20).toLong, rnd.nextInt(5) / 4.0))
      val expected = xs.sortBy(s => (-s.cosine, s.neighborId)).take(5)
      val parts = chunks(rnd, xs).map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(parts).foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) === expected)
    }
  }

  test("MisraGries.offer: never overcounts, undercount <= n/(cap+1), heavy elements survive") {
    val rnd = new scala.util.Random(1234567L)
    val cap = 8
    (1 to Trials).foreach { _ =>
      val n = rnd.nextInt(400)
      // skewed domain: a few hot keys + a long tail
      val xs = List.fill(n)(
        if (rnd.nextBoolean()) s"hot${rnd.nextInt(3)}" else s"cold${rnd.nextInt(200)}")
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      xs.foreach(MisraGries.offer(m, _, cap))
      val truth = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val bound = n.toDouble / (cap + 1)
      m.foreach { case (g, est) =>
        assert(est <= truth(g), s"overcount for $g: $est > ${truth(g)}")
        assert(truth(g) - est <= bound, s"undercount beyond n/(cap+1) for $g")
      }
      truth.foreach { case (g, c) =>
        if (c > bound)
          assert(m.contains(g), s"heavy element $g (count $c > $bound) evicted")
      }
      assert(m.size <= cap, "counter map exceeded cap")
    }
  }

  test("GramMoments: partition- and merge-order-invariant, equals the sequential reference") {
    val rnd = new scala.util.Random(20260814L)
    val dims = 6
    val gram = new GramMoments(dims, 1e4)
    def fold(xs: List[Array[Float]]) = xs.foldLeft(gram.zero)(gram.reduce)
    def canon(s: graft.functions.GramState) =
      (s.n, s.sx.toSeq, s.sxy.toSeq)
    (1 to Trials).foreach { _ =>
      val n = rnd.nextInt(40)
      val xs = List.fill(n)(Array.fill(dims)((rnd.nextFloat() - 0.5f) * 4f))
      // sequential reference on exact integers
      val q = xs.map(_.map(x => math.floor(x.toDouble * 1e4 + 0.5).toLong))
      val refSx = (0 until dims).map(i => q.map(_(i)).sum)
      val refSxy = for (i <- 0 until dims; j <- i until dims)
        yield q.map(r => r(i) * r(j)).sum
      val whole = canon(fold(xs))
      assert(whole === ((n.toLong, refSx, refSxy.toSeq)))
      // any partitioning + any merge order reproduces the same state
      val parts = chunks(rnd, xs).map(fold)
      val merged = rnd.shuffle(parts).foldLeft(gram.zero)(gram.merge)
      assert(canon(merged) === whole)
      // finish emits the full upper triangle consistently with the state
      val entries = gram.finish(fold(xs))
      assert(entries.length === dims * (dims + 1) / 2)
      entries.foreach { e =>
        assert(e.n === n.toLong)
        assert(e.sx === refSx(e.i) && e.sy === refSx(e.j))
      }
      assert(entries.map(_.sxy) === refSxy)
    }
    // ragged input is a loud failure, never a silent truncation
    intercept[IllegalArgumentException] {
      gram.reduce(gram.zero, Array.fill(dims - 1)(0f))
    }
  }
}
