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

  private def awaitReleased(): Int = {
    // unpersist is issued with blocking = false; give the async block
    // removal a moment before asserting
    val deadline = System.nanoTime() + 10_000_000_000L
    while (pinned > 0 && System.nanoTime() < deadline) Thread.sleep(50)
    pinned
  }

  test("operator caches are tracked and fully released after the terminal action") {
    Caches.releaseAll()
    spark.catalog.clearCache()
    assert(awaitReleased() === 0, "dirty session before the test")

    val dedup = operators.Dedup.minhashLsh(spark, sf0001)
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
}
