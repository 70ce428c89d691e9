package graft

import org.apache.spark.sql.functions._

import graft.functions.PrioritySample
import graft.operators.Quality

/** Priority sampling (q241): determinism under any split/merge order,
  * exactness below the sample bound, and estimator sanity above it.
  */
class PrioritySampleSpec extends SparkSpec {

  test("aggregator: merge of split buffers equals the single-pass sample, any split, any order") {
    val agg = new PrioritySample(2) // keeps top-3 by priority
    val pairs = Seq(
      (50L, 900L), (500L, 800L), (5L, 10L), (300L, 200L),
      (7L, 700000000000L), (500L, 800L)) // duplicate pair absorbed
    val single = pairs.foldLeft(agg.zero)(agg.reduce)
    for (cut <- 0 to pairs.length; rev <- Seq(false, true)) {
      val (l, r) = pairs.splitAt(cut)
      val (lp, rp) = if (rev) (l.reverse, r.reverse) else (l, r)
      val merged = agg.merge(
        lp.foldLeft(agg.zero)(agg.reduce),
        rp.foldLeft(agg.zero)(agg.reduce))
      assert(merged === single, s"split at $cut (rev=$rev) diverged")
    }
    val sample = agg.finish(single)
    assert(sample.length === 3, "buffer must cap at k+1")
    assert(single._1 === 3, "tracked size must match the kept entries")
    // priorities w*2^64/(h+1): the tiny-hash row (5, 10) dominates, the
    // huge-hash row (7, 7e11) has the smallest priority of the kept set?
    // — verify the canonical order is by the floored priority
    val prios = sample.map(p => (BigInt(p._1) << 64) / (BigInt(p._2) + 1))
    assert(prios === prios.sorted.reverse, "sample must be priority-descending")
  }

  test("below k+1 distinct pairs the estimate is the exact subset sum (err_ratio = 1)") {
    import spark.implicits._
    val docs = (1 to 10).map(i => (i.toLong, s"src", 100L * i))
      .toDF("doc_id", "source", "n_chars")
    val row = Quality.massEstimate(docs).collect().head
    assert(row.getAs[Long]("total_chars") === 5500L)
    assert(row.getAs[Long]("sample_n") === 10L)
    assert(row.getAs[Double]("est_chars") === 5500.0)
    assert(row.getAs[Double]("err_ratio") === 1.0)
  }

  test("above k the estimate is partition-invariant and lands inside the priority-sampling error band") {
    // the registered k=16 demo: every 25-doc source takes the estimate
    // path at the driver's own sf
    val docs = graft.sources.Tables.documents(spark, sf001)
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val base = canon(Quality.massEstimate(docs, k = 16))
    assert(canon(Quality.massEstimate(docs.repartition(1), k = 16)) === base)
    assert(canon(Quality.massEstimate(docs.repartition(13, col("doc_id")), k = 16)) === base)

    val rows = Quality.massEstimate(docs, k = 16).collect()
    assert(rows.forall(_.getAs[Long]("sample_n") === 16L),
      "every sf0.01 source must exceed the k=16 sample bound")
    rows.foreach { r =>
      val ratio = r.getAs[Double]("err_ratio")
      assert(ratio > 0.6 && ratio < 1.4,
        s"source ${r.getAs[String]("source")} estimate off by ${ratio}x " +
          s"(k=16 priority sampling on near-uniform weights should sit inside 40%)")
    }
  }
}
