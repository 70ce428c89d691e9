package graft

import org.apache.spark.sql.functions._

import graft.functions.Winnow

/** The codegen'd winnowing kernel must be BIT-IDENTICAL to the built-in
  * composition it replaced (and thus to the unchanged q38 oracle):
  * `array_min(transform(sequence(1, greatest(len-k+1, 1)), i =>
  * md5(substr(text, i, k))))`.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def builtin(k: Int) =
    array_min(transform(
      sequence(lit(1), greatest(length(col("text")) - (k - 1), lit(1))),
      i => md5(col("text").substr(i, lit(k)))))

  private def check(texts: Seq[String], k: Int): Unit = {
    val df = texts.toDF("text")
      .select(col("text"),
        builtin(k).as("expect"), Winnow.minGramMd5(col("text"), k).as("got"))
    df.collect().foreach { r =>
      assert(r.getString(2) === r.getString(1), s"text=${r.getString(0)} k=$k")
    }
  }

  test("kernel matches the built-in composition on ASCII, short, and empty text") {
    check(Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaa", // degenerate: all windows equal
      "short", // shorter than k → single whole-text window
      "", // empty → md5("")
      "exactly8", // exactly one full window at k=8
      "exactly9!"), k = 8)
  }

  test("kernel windows are CHARACTER windows on multibyte text, like substr") {
    check(Seq(
      "héllo wörld — ünïcödé text with émphasis",
      "日本語のテキストです、これはテストです",
      "mixed ascii と 日本語 and emoji éèê",
      "ß" * 20), k = 8)
  }

  test("kernel matches the built-in composition on 200 random mixed-unicode strings") {
    val rnd = new scala.util.Random(13)
    // whole codepoints (the emoji is a surrogate pair — never split it)
    val alphabet = "abc XYZ09.,!äöüß日本語🙂€—\n\t".codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))
    val texts = Seq.tabulate(200) { _ =>
      val len = rnd.nextInt(40)
      Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    for (k <- Seq(1, 4, 8)) check(texts, k)
  }

  test("kernel matches on the real corpus at sf0.001 for k=8 and k=3") {
    for (k <- Seq(8, 3)) {
      val docs = graft.sources.Tables.documents(spark, sf0001)
      val diff = docs.select(
        builtin(k).as("expect"),
        Winnow.minGramMd5(col("text"), k).as("got"))
        .filter(col("expect") =!= col("got"))
        .count()
      assert(diff === 0L, s"k=$k mismatches")
    }
  }
}
