package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Priority sampling (Duffield–Lund–Thorup) as a typed `Aggregator` — the
  * WEIGHTED counterpart of [[BottomKQuantile]]'s uniform bottom-k: keep
  * the k+1 highest-priority `(weight, hash)` pairs, where the priority of
  * an item is `w / u` for a uniform draw `u` — here the deterministic
  * md5-derived `u = (h+1) / 2^48`, so the whole sample is a pure function
  * of the input multiset (any partitioning, any merge order). From the
  * sample, any subset-sum `Σ w` estimates unbiasedly as
  * `Σ_{top-k} max(w_i, τ)` with `τ` = the (k+1)-th priority — the
  * near-optimal fixed-size weighted summary (heavy items enter with
  * probability 1, light items proportionally to weight), which is what
  * lets a 100 TB catalog answer "how many tokens does this source/
  * predicate hold" from k rows per group instead of a full scan.
  *
  * Exactness discipline: priorities are compared as the FLOORED 128-bit
  * integer `w·2⁶⁴ div (h+1)` (ties broken by `(h, w)`), which any engine
  * with 128-bit or DECIMAL(38) integers reproduces bit-for-bit — a
  * float-valued priority would let two engines disagree on who makes the
  * sample at near-ties. The estimator itself also never needs a float
  * until the last step: `max(w_i, τ)` cross-multiplies to
  * `max(w_i·2¹⁶·(h_τ+1), w_τ·2⁶⁴)` — exact integers below 10²⁵, summed
  * exactly in DECIMAL(38,0) — and one final double division by
  * `2¹⁶·(h_τ+1)` lands both engines on the identical double.
  *
  * Below k+1 distinct pairs the sample IS the data and the subset-sum is
  * exact. Set semantics on (w, h) make re-delivered rows no-ops, the
  * [[KMinValues]]/[[BottomKQuantile]] idempotence contract.
  *
  * Output: the sample as (w, h) pairs in priority order (highest first),
  * at most k+1 entries — the (k+1)-th is the threshold row τ.
  */
final class PrioritySample(k: Int)
    extends Aggregator[(Long, Long), (Int, List[(Long, Long)]), Seq[(Long, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  private def prio(p: (Long, Long)): BigInt =
    (BigInt(p._1) << 64) / (BigInt(p._2) + 1)

  /** Canonical order: floored priority DESC, then hash ASC, weight ASC —
    * the exact order a SQL engine sorts `w·2⁶⁴ div (h+1)` in. */
  private def before(a: (Long, Long), b: (Long, Long)): Boolean = {
    val pa = prio(a); val pb = prio(b)
    if (pa != pb) pa > pb
    else if (a._2 != b._2) a._2 < b._2
    else a._1 < b._1
  }

  /** Buffer: (size, entries in REJECTION order — lowest priority first).
    * The kept set is identical to the former best-first list; holding it
    * reversed puts the rejection threshold at `head`, so the
    * steady-state test (a full buffer whose worst entry beats p) stops
    * walking k cons cells per row (`lengthCompare(k+1)` + `last` were
    * O(k) per input — the round-19 [[KMinValues]]/[[BottomKQuantile]]
    * representation change, guide §1.2, applied to the one sketch it
    * deferred on). `before` is a strict total order on (w, h) pairs
    * (the tie-break covers both fields), so span/duplicate/cap behave
    * exactly as the best-first `span`/`take(k+1)` did, mirrored; a full
    * buffer reached past the rejection test guarantees p beats `head`,
    * so the dropped `tail` head is never p itself.
    */
  private def insert(b: (Int, List[(Long, Long)]), p: (Long, Long)): (Int, List[(Long, Long)]) = {
    val (sz, rev) = b
    if (sz >= k + 1 && !before(p, rev.head)) b
    else {
      val (worse, rest) = rev.span(q => before(p, q))
      if (rest.headOption.contains(p)) b
      else if (sz >= k + 1) (sz, (worse ::: p :: rest).tail)
      else (sz + 1, worse ::: p :: rest)
    }
  }

  override def zero: (Int, List[(Long, Long)]) = (0, Nil)
  override def reduce(b: (Int, List[(Long, Long)]), p: (Long, Long)): (Int, List[(Long, Long)]) =
    insert(b, p)
  override def merge(b1: (Int, List[(Long, Long)]),
      b2: (Int, List[(Long, Long)])): (Int, List[(Long, Long)]) =
    b2._2.foldLeft(b1)(insert)
  /** Output order is unchanged: priority DESC (highest first). */
  override def finish(b: (Int, List[(Long, Long)])): Seq[(Long, Long)] = b._2.reverse

  override def bufferEncoder: Encoder[(Int, List[(Long, Long)])] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
}
