package graft

import java.nio.file.{Files, Paths}

/** Per-query bench comparison against the committed baseline.
  *
  * Round 6 showed single-sample cross-round totals drift ±20% on a shared
  * box — neither a regression nor a win was provable. The fix has two
  * halves: Bench.scala reports best-of-3 rep minima per query (steady
  * state, JIT excluded), and this tool diffs any bench JSON line against
  * `BASELINE_QUERIES.json` (the committed per-query minima snapshot) so a
  * real plan regression shows up as a per-query ratio, not as noise in a
  * 70-query total.
  *
  * Usage: `runMain graft.BenchDiff BASELINE_QUERIES.json bench_out.json`
  * Both files just need to contain `"qNN":seconds` pairs (the Bench
  * stdout line verbatim works). Exit code 1 if any shared query regressed
  * beyond 1.5× — loose enough to ignore residual machine noise on
  * sub-100ms queries, tight enough to catch a lost broadcast or a new
  * unpruned scan.
  */
object BenchDiff {
  private val Entry = """"(q\d+)":\s*([0-9.]+)""".r

  def parse(s: String): Map[String, Double] =
    Entry.findAllMatchIn(s).map(m => m.group(1) -> m.group(2).toDouble).toMap

  def main(args: Array[String]): Unit = {
    val Array(basePath, curPath) = args.take(2)
    val base = parse(Files.readString(Paths.get(basePath)))
    val cur = parse(Files.readString(Paths.get(curPath)))
    val shared = (base.keySet & cur.keySet).toSeq.sorted
    if (shared.isEmpty) {
      System.err.println("no shared qNN keys between baseline and current")
      sys.exit(2)
    }
    val rows = shared.map { q => (q, base(q), cur(q), cur(q) / base(q)) }
    println(f"${"query"}%-6s ${"base"}%9s ${"cur"}%9s ${"ratio"}%7s")
    rows.sortBy(-_._4).foreach { case (q, b, c, r) =>
      val flag = if (r > 1.5) "  << REGRESSION" else if (r < 0.67) "  << win" else ""
      println(f"$q%-6s $b%9.3f $c%9.3f $r%7.2f$flag")
    }
    val (tb, tc) = (rows.map(_._2).sum, rows.map(_._3).sum)
    println(f"TOTAL  $tb%9.3f $tc%9.3f ${tc / tb}%7.2f  (${rows.size} shared queries)")
    val missing = (base.keySet -- cur.keySet).toSeq.sorted
    val added = (cur.keySet -- base.keySet).toSeq.sorted
    if (missing.nonEmpty) println(s"missing vs baseline: ${missing.mkString(",")}")
    if (added.nonEmpty) println(s"new vs baseline: ${added.mkString(",")}")
    if (rows.exists(_._4 > 1.5)) sys.exit(1)
  }
}
