package graft

import graft.operators.TextAnalysis

/** Invariant coverage for the text-analysis evaluation operators (the
  * per-row q16–q19 projections are covered by the DuckDB oracle gate).
  */
class TextAnalysisSpec extends SparkSpec {

  test("langidConfusion: rows partition each label, recalls sum to 1") {
    val got = TextAnalysis.langidConfusion(spark, sf0001).collect()
      .map(r => (r.getAs[String]("labelled"), r.getAs[String]("predicted"),
        r.getAs[Long]("n"), r.getAs[Long]("n_labelled"),
        r.getAs[Double]("recall")))
    graft.Caches.releaseAll()
    assert(got.map(_._3).sum === 500L, "every document lands in one cell")
    got.groupBy(_._1).foreach { case (lab, rows) =>
      val nLab = rows.head._4
      assert(rows.forall(_._4 === nLab))
      assert(rows.map(_._3).sum === nLab,
        s"cells of $lab must partition its $nLab docs")
      assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-12,
        s"recalls of $lab must sum to 1")
    }
    // the matrix reports the classifier, it does not promise accuracy:
    // only the label vocabulary is pinned
    assert(got.map(_._2).toSet.subsetOf(Set("en", "es", "fr", "de", "und")))
  }
}
