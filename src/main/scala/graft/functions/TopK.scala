package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate in a per-group top-k. */
final case class Scored(neighborId: Long, cosine: Double)

/** Bounded per-group top-k as a typed `Aggregator` — the scale-safe
  * replacement for `row_number() over (partition by group)` + filter when
  * the pre-window row count is unbounded (e.g. |corpus| × |queries| scored
  * pairs feeding a per-query top-k).
  *
  * Why not the window: a window's exchange moves EVERY input row into
  * |groups| partitions before any row can be discarded — at 100× corpus
  * that is a handful of reducers each sorting tens of millions of rows.
  * This aggregate is map-side combined (ObjectHashAggregate plans a
  * partial pass before the exchange), so each map task contributes at most
  * k rows per group to the shuffle: exchange volume drops from
  * O(|corpus|·|queries|) to O(partitions·k·|queries|), and no reducer ever
  * sorts more than partitions·k rows per group.
  *
  * The buffer is a best-first sorted list capped at k (insertion into a
  * ≤k list — k is small; no heap needed). Total order (cosine DESC,
  * neighborId ASC) makes the result deterministic and bit-identical to the
  * `row_number`-over-total-order formulation it replaces. The comparison
  * goes through `Double.compare`, not IEEE `>`: IEEE makes NaN incomparable
  * (both directions false), which would turn the insert position — and
  * therefore the surviving k — into a function of row arrival order.
  * `Double.compare` ranks NaN above every other value, matching how both
  * Spark and DuckDB order NaN in a DESC sort.
  */
final class BoundedTopK(k: Int)
    extends Aggregator[Scored, (Int, List[Scored]), Seq[Scored]] {
  require(k > 0, s"k must be positive, got $k")

  private def beats(a: Scored, b: Scored): Boolean = {
    val c = java.lang.Double.compare(a.cosine, b.cosine)
    c > 0 || (c == 0 && a.neighborId < b.neighborId)
  }

  /** Buffer: (size, WORST-first list) — same kept set as the former
    * best-first list; the steady-state rejection (full buffer whose
    * worst entry beats x) reads `head` and the tracked size instead of
    * walking k cons cells per row (the KMinValues round-19
    * representation). A full buffer drops its head (the worst) on
    * insert — the former `take(k)` from the best end. */
  private def insert(b: (Int, List[Scored]), x: Scored): (Int, List[Scored]) = {
    val (sz, wf) = b
    if (sz >= k && beats(wf.head, x)) b
    else {
      val (pre, post) = wf.span(beats(x, _))
      if (sz >= k) (sz, (pre ::: x :: post).tail)
      else (sz + 1, pre ::: x :: post)
    }
  }

  override def zero: (Int, List[Scored]) = (0, Nil)
  override def reduce(b: (Int, List[Scored]), x: Scored): (Int, List[Scored]) =
    insert(b, x)
  override def merge(b1: (Int, List[Scored]), b2: (Int, List[Scored])): (Int, List[Scored]) =
    b2._2.foldLeft(b1)(insert)
  override def finish(b: (Int, List[Scored])): Seq[Scored] = b._2.reverse

  override def bufferEncoder: Encoder[(Int, List[Scored])] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}
