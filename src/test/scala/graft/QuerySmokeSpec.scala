package graft

/** Executes EVERY registered query once at sf0.001 — the other half of
  * the no-query-lands-without-one-run rule. OracleCoverageSpec proves a
  * query HAS an oracle; this spec proves it RUNS: an analysis-time error
  * (like the unresolved-column bug that shipped in q75's first version)
  * fails the build here, long before the driver's correctness gate sees
  * it. One shared session, one scoped cache per query, smallest SF —
  * the whole sweep costs about a minute.
  */
class QuerySmokeSpec extends SparkSpec {

  test("entry (the driver's flagship smoke) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val scope = Caches.open()
      try {
        val n = fn(spark, sf0001).count()
        assert(n >= 0)
      } finally scope.release()
    }
  }
}
