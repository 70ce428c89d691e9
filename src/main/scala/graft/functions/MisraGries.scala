package graft.functions

/** The Misra–Gries update step shared by the batch heavy-hitter pass
  * (operators/Corpus.heavyHitters, per partition) and the streaming
  * monitor (streaming/StreamingOps.heavyHitterMonitor, per shard) — ONE
  * implementation so the invariants both proofs lean on (every retained
  * count is a lower bound; any key with frequency > n/(cap+1) of the
  * offered stream is retained) cannot silently diverge between the two
  * call sites.
  */
object MisraGries {

  /** Offer one element to a bounded counter map: increment if present,
    * insert if below `cap`, otherwise run the decrement-all eviction
    * (drop counters that reach zero; the offered element is NOT
    * inserted). The eviction sweep is O(cap) but fires at most once per
    * `cap` insertions, so the amortized cost per offer is O(1).
    */
  def offer(m: scala.collection.mutable.HashMap[String, Long], g: String, cap: Int): Unit =
    m.get(g) match {
      case Some(c) => m.update(g, c + 1)
      case None if m.size < cap => m.update(g, 1L)
      case None =>
        val dead = m.iterator.collect { case (k, 1L) => k }.toList
        dead.foreach(m.remove)
        m.keysIterator.toList.foreach(k => m.update(k, m(k) - 1))
    }
}
