package graft

/** The caller-owned cache contract (graft.Caches): operators persist
  * intermediates that outlive their (lazy) return value; the caller
  * releases them after the terminal action, exactly as Verify and Bench
  * do. A long-lived session running many queries must not accumulate
  * pinned RDDs.
  *
  * Uses q22 (minhashLsh) and q35 (annIvf) — operators that persist but do
  * NOT localCheckpoint (localCheckpoint pins RDDs by design and releases
  * them via the ContextCleaner on GC, not via unpersist).
  */
class CacheLifecycleSpec extends SparkSpec {

  private def pinned: Int = spark.sparkContext.getPersistentRDDs.size

  private def awaitReleased(floor: Int = 0): Int = {
    // unpersist is issued with blocking = false; give the async block
    // removal a moment before asserting. localCheckpoint RDDs pinned by
    // EARLIER suites release via GC + ContextCleaner, so nudge the
    // collector each poll or a full-suite run can flake here.
    val deadline = System.nanoTime() + 10_000_000_000L
    while (pinned > floor && System.nanoTime() < deadline) {
      System.gc()
      Thread.sleep(50)
    }
    pinned
  }

  test("operator caches are tracked and fully released after the terminal action") {
    Caches.releaseAll()
    spark.catalog.clearCache()
    assert(awaitReleased() === 0, "dirty session before the test")

    // the INLINE chain: the shared-artifact wrapper returns a plain scan
    // on reuse, so the cache-tracking contract is pinned on the builder
    val dedup = operators.Dedup.minhashLshInline(
      graft.sources.Tables.documents(spark, sf0001),
      bands = 4, rowsPerBand = 2, threshold = 0.8)
    dedup.write.format("noop").mode("overwrite").save()
    assert(pinned > 0, "minhashLsh should persist its shingle/candidate relations")
    Caches.releaseAll()
    assert(awaitReleased() === 0,
      s"caches leaked after releaseAll: ${spark.sparkContext.getPersistentRDDs}")

    val ivf = operators.Similarity.annIvf(spark, sf0001)
    ivf.write.format("noop").mode("overwrite").save()
    assert(pinned > 0, "annIvf should persist the prepared embedding relation")
    Caches.releaseAll()
    assert(awaitReleased() === 0,
      s"caches leaked after releaseAll: ${spark.sparkContext.getPersistentRDDs}")
  }

  test("releaseAll is idempotent and safe on an empty registry") {
    Caches.releaseAll()
    Caches.releaseAll()
    assert(awaitReleased() === 0)
  }

  test("scopes isolate two queries in flight: releasing one leaves the other pinned") {
    Caches.releaseAll()
    spark.catalog.clearCache()
    assert(awaitReleased() === 0, "dirty session before the test")

    // query A: opened scope on this thread, built AND materialized
    val scopeA = Caches.open()
    try {
      operators.Dedup.minhashLshInline(
        graft.sources.Tables.documents(spark, sf0001),
        bands = 4, rowsPerBand = 2, threshold = 0.8)
        .write.format("noop").mode("overwrite").save()
      val pinnedA = pinned
      assert(pinnedA > 0, "minhashLsh should persist its intermediates")

      // query B: its own scope on its own thread (a concurrent session)
      @volatile var scopeB: Caches.Scope = null
      @volatile var failure: Throwable = null
      val tb = new Thread(() => {
        try {
          scopeB = Caches.open()
          operators.Similarity.annIvf(spark, sf0001)
            .write.format("noop").mode("overwrite").save()
        } catch { case t: Throwable => failure = t }
      })
      tb.start()
      tb.join()
      assert(failure === null, s"query B failed: $failure")
      assert(pinned > pinnedA, "annIvf should persist additional relations")

      // releasing B must drop ONLY B's caches: A's stay pinned
      scopeB.release()
      assert(awaitReleased(floor = pinnedA) === pinnedA,
        s"B's release touched A's caches: ${spark.sparkContext.getPersistentRDDs}")
    } finally scopeA.release()
    assert(awaitReleased() === 0,
      s"caches leaked after both releases: ${spark.sparkContext.getPersistentRDDs}")
  }
}
