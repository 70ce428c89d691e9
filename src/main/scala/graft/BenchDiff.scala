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
  * Usage: `runMain graft.BenchDiff [BASELINE_QUERIES.json] [bench.json]`
  * (defaults: the committed baseline vs BENCH_FULL.json — the full-name
  * per-query history Bench writes on every sweep, so round N+1 diffs
  * round N without re-parsing sbt tails). Both files just need to
  * contain `"qNN":seconds` or `"qNN_full_name":seconds` pairs — full
  * names are normalized to their qNN prefix, so BENCH_FULL.json,
  * BENCH_LOCAL_r{N}.json, and the Bench stdout line all parse and
  * cross-compare. Exit code 1 if any shared query regressed beyond
  * 1.5× — loose enough to ignore residual machine noise on sub-100ms
  * queries, tight enough to catch a lost broadcast or a new unpruned
  * scan.
  */
object BenchDiff {
  private val Entry = """"(q\d+)[A-Za-z0-9_]*":\s*([0-9.]+)""".r
  private val BuildsObj = """"builds"\s*:\s*\{([^}]*)\}""".r
  private val BuildEntry = """"([A-Za-z0-9_]+)":\s*([0-9.]+)""".r

  def parse(s: String): Map[String, Double] =
    Entry.findAllMatchIn(s).map(m => m.group(1) -> m.group(2).toDouble).toMap

  /** Derived-artifact build wall times (the "builds" object both
    * BENCH_FULL.json and BASELINE_QUERIES.json carry since round 17),
    * keyed "build:<artifact>" so they diff alongside queries without
    * colliding with the qNN namespace. */
  def parseBuilds(s: String): Map[String, Double] =
    BuildsObj.findFirstMatchIn(s).map { obj =>
      BuildEntry.findAllMatchIn(obj.group(1))
        .map(m => s"build:${m.group(1)}" -> m.group(2).toDouble).toMap
    }.getOrElse(Map.empty)

  def main(args: Array[String]): Unit = {
    val basePath = args.lift(0).getOrElse("BASELINE_QUERIES.json")
    val curPath = args.lift(1).getOrElse("BENCH_FULL.json")
    val baseText = Files.readString(Paths.get(basePath))
    val curText = Files.readString(Paths.get(curPath))
    val base = parse(baseText) ++ parseBuilds(baseText)
    val cur = parse(curText) ++ parseBuilds(curText)
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
