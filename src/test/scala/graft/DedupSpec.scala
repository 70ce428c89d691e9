package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Dedup

/** Unit coverage for the dedup family on a synthetic corpus with planted
  * exact and near duplicates (oracle-independent sanity; the DuckDB hash
  * gate covers the testdata surface).
  */
class DedupSpec extends SparkSpec {

  private def corpus: DataFrame = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    Seq(
      (0L, base),
      (1L, base), // exact duplicate of 0
      (2L, base.replace("today", "tonight")), // near-dup: 1 word differs
      (3L, "completely different text about spark catalyst optimizer rules and codegen stages"),
      (4L, "short text"), // < 3 words after split? ("short text" = 2 words -> excluded from shingles)
      (5L, "another unrelated document discussing minhash banding and jaccard estimation theory"),
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts under one keeper") {
    val out = Dedup.exact(corpus).collect()
    assert(out.length === 5) // 6 docs, one exact-dup pair
    val dupGroup = out.find(_.getAs[Long]("n") == 2L).get
    assert(dupGroup.getAs[Long]("keeper") === 0L)
  }

  test("ngram jaccard finds the exact pair at 1.0 and the near pair above 0.5") {
    val pairs = Dedup.ngramJaccard(corpus, threshold = 0.5).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    assert(pairs((0L, 1L)) === 1.0)
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) > 0.5 && pairs((0L, 2L)) < 1.0)
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minhash LSH candidates are a subset of ground truth at the same threshold") {
    val truth = Dedup.ngramJaccard(corpus, threshold = 0.8).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val lsh = Dedup.minhashLsh(corpus, bands = 4, rowsPerBand = 2, threshold = 0.8)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(lsh.subsetOf(truth), s"LSH produced non-truth pairs: ${lsh diff truth}")
    // an exact duplicate shares every minhash, hence every band: always caught
    assert(lsh.contains((0L, 1L)))
  }

  test("simhash: identical docs share signatures; near-dups are close in hamming distance") {
    val sig = Dedup.simhash(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("simhash")).toMap
    assert(sig.values.forall(s => s.length == 32 && s.forall(c => c == '0' || c == '1')))
    assert(sig(0L) === sig(1L))
    def hamming(a: String, b: String): Int = a.zip(b).count { case (x, y) => x != y }
    val near = hamming(sig(0L), sig(2L))
    val far = hamming(sig(0L), sig(3L))
    assert(near < far, s"near-dup hamming $near should be < unrelated $far")
  }

  test("embedding near-dup restricts pairs to corpus ids and picks the least keeper") {
    import spark.implicits._
    val dims = 16
    val v = Seq.tabulate(dims)(i => (math.sin(i + 1) * 0.4).toFloat)
    val vNear = v.updated(3, v(3) + 1e-4f)
    val vOther = Seq.tabulate(dims)(i => (math.cos(i * 3 + 1) * 0.4).toFloat)
    // vec 9's near-dup partner (vec 1) is NOT in the document corpus →
    // that pair must be filtered out
    val emb = Seq(0L -> v, 9L -> vNear, 1L -> vNear, 5L -> vOther)
      .toDF("vec_id", "embedding")
    val docs = Seq((0L, "a"), (9L, "b"), (5L, "c")).toDF("doc_id", "text")
    val pairs = Dedup.embeddingNearDup(docs, emb,
      nPlanes = 4, threshold = 0.999, dims = dims)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("keeper")))
    assert(pairs.toSeq === Seq((0L, 9L, 0L)))
  }
}
