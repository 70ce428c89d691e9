package graft

/** The scale-smoke amplifier's structural contract: N× amplification must
  * grow dup structure LINEARLY, which requires every copy's character
  * bijection to be distinct — the round-11 rotation family repeated every
  * 26 copies, giving each document ~mult/26 EXACT cross-copy duplicates at
  * 100× and quadratic (not crawl-like) dup growth.
  */
class ScaleSmokeSpec extends SparkSpec {

  test("amplifyDocs bijections are pairwise distinct past 26 copies — no cross-copy exact dups") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghijklmnopqrstuvwxyz", "en", "web", 26L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val texts = ScaleSmoke.amplifyDocs(docs, 60)
      .select($"text").as[String].collect()
    assert(texts.length === 60)
    assert(texts.distinct.length === 60,
      "each copy must apply a DISTINCT bijection (rotations repeat at 26)")
  }

  test("amplifyDocs copy 0 is the identity and copies 1-25 keep the rotation family") {
    import spark.implicits._
    val docs = Seq((1L, "abc", "en", "web", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val byId = ScaleSmoke.amplifyDocs(docs, 3)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(byId(1L) === "abc", "copy 0 must be the untouched original")
    assert(byId(100000001L) === "bcd", "copy 1 must be the +1 rotation")
    assert(byId(200000001L) === "cde", "copy 2 must be the +2 rotation")
  }
}
