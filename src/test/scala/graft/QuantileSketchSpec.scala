package graft

import org.apache.spark.sql.functions._

import graft.functions.BottomKQuantile
import graft.operators.Quality

/** The mergeable quantile sketch (q239/q240): determinism under any
  * partitioning (the property that makes it oracle-checkable AND safe to
  * pre-aggregate), exactness below k, and rank-error sanity above k.
  */
class QuantileSketchSpec extends SparkSpec {

  test("aggregator: merge of split buffers equals the single-pass sketch, any split, any order") {
    val agg = new BottomKQuantile(4)
    val pairs = Seq(
      (900L, 10L), (100L, 70L), (500L, 30L), (300L, 20L),
      (700L, 50L), (200L, 40L), (100L, 70L)) // duplicate pair absorbed
    val single = pairs.foldLeft(agg.zero)(agg.reduce)
    for (cut <- 0 to pairs.length; rev <- Seq(false, true)) {
      val (l, r) = pairs.splitAt(cut)
      val (lp, rp) = if (rev) (l.reverse, r.reverse) else (l, r)
      val merged = agg.merge(
        lp.foldLeft(agg.zero)(agg.reduce),
        rp.foldLeft(agg.zero)(agg.reduce))
      assert(merged === single, s"split at $cut (rev=$rev) diverged")
    }
    // k=4 smallest by (h, v): hashes 100,200,300,500 -> values sorted
    assert(agg.finish(single) === Seq(20L, 30L, 40L, 70L))
  }

  test("below k the sketch is exact: every pick equals the nearest-rank percentile") {
    import spark.implicits._
    // 10 rows, k=256 default -> sample == data
    val li = (1 to 10).map(i =>
      (i.toLong, 1L, s"$i.00", "R")).toDF(
      "l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag")
    val row = Quality.priceQuantileSketch(li).collect().head
    assert(row.getAs[Long]("n_rows") === 10L)
    assert(row.getAs[Long]("sample_n") === 10L)
    // values are 100..1000 cents; nearest-rank: p50 -> rank 5, p90 ->
    // rank 9, p99 -> rank 10
    assert(row.getAs[Long]("p50_c") === 500L)
    assert(row.getAs[Long]("p90_c") === 900L)
    assert(row.getAs[Long]("p99_c") === 1000L)
  }

  test("sketch output is invariant to input partitioning (sf0.001 lineitem)") {
    val li = graft.sources.Tables.lineitem(spark, sf0001)
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val base = canon(Quality.priceQuantileSketch(li))
    assert(canon(Quality.priceQuantileSketch(li.repartition(1))) === base)
    assert(canon(Quality.priceQuantileSketch(li.repartition(17, col("l_partkey")))) === base)
    assert(canon(Quality.priceQuantileSketch(
      li.repartitionByRange(5, col("l_extendedprice")))) === base)
  }

  test("above k the p50 pick sits within the 1/sqrt(k) rank band of the true median") {
    val li = graft.sources.Tables.lineitem(spark, sf0001)
    val est = Quality.priceQuantileSketch(li) // k = 256
      .filter(col("flag") === "N").collect().head
    assert(est.getAs[Long]("sample_n") === 256L, "above-k group must cap at k")
    val cents = li.filter(col("l_returnflag") === "N")
      .select((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long").as("c"))
    val n = cents.count()
    val below = cents.filter(col("c") <= est.getAs[Long]("p50_c")).count()
    val rankFrac = below.toDouble / n
    // sigma = sqrt(0.25/k) ~= 0.031; allow 4 sigma
    assert(math.abs(rankFrac - 0.5) < 0.13,
      s"p50 pick lands at rank fraction $rankFrac of the true distribution")
  }
}
