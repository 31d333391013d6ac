package graft.tools

/** Dev tool: human-readable cross-round drift report between two full
  * bench artifacts (target/BENCH_full.json shape) — the comparison the
  * r16 judge assembled by hand from the two artifacts, now one command:
  *
  *   DriftReport <prev.json> <cur.json> [topN]
  *
  * Parses each artifact's per-query minima and read canaries, runs the
  * SAME classifier the bench embeds ([[graft.Bench.classifyDrift]]),
  * and prints the verdict plus the top movers in both directions so a
  * "drifted-*" verdict can be traced to named queries. No Spark
  * session — pure file parsing.
  */
object DriftReport {

  private val minRe =
    """"([^"]+)":\{"min":([0-9.]+)""".r
  private val readRe =
    """"canary_(pre|post)":\{"read":(-?[0-9.]+)""".r

  private[graft] def parseFull(text: String)
      : (Double, Map[String, Double]) = {
    // two artifact shapes: target/BENCH_full.json carries
    // "name":{"min":X,...} per query plus canary_pre/post;
    // BENCH_prev.json carries flat "name":X pairs after "queries":{
    // plus its own "read" field — accept either
    val full = minRe.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    val qs =
      if (full.nonEmpty) full
      else {
        val at = text.indexOf("\"queries\":{")
        if (at < 0) Map.empty[String, Double]
        else """"([^"]+)":([0-9.]+)""".r.findAllMatchIn(text.substring(at))
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    val reads = readRe.findAllMatchIn(text)
      .map(_.group(2).toDouble).filter(_ >= 0).toSeq
    val read =
      if (reads.nonEmpty) reads.min
      // flat (BENCH_prev.json) shape: anchor to the boot_id-adjacent
      // pair the writer emits, same as Bench.parsePrev (ADVICE r17) —
      // a stray nested `"read":` in a future field must not shadow it
      // and silently diverge the CLI from the bench's own parser
      else """"boot_id":"[^"]*","read":(-?[0-9.]+)""".r
        .findFirstMatchIn(text)
        .map(_.group(1).toDouble).getOrElse(-1.0)
    (read, qs)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: DriftReport <prev BENCH_full.json> <cur BENCH_full.json> [topN]")
    val topN = if (args.length > 2) args(2).toInt else 10
    def load(p: String) = parseFull(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))))
    val (prevRead, prev) = load(args(0))
    val (curRead, cur) = load(args(1))
    val d = graft.Bench.classifyDrift(prev, cur, prevRead, curRead)
    println(f"shared queries: ${d.n}  (prev ${prev.size}, cur ${cur.size})")
    println(f"read canary:    prev $prevRead%.3f -> cur $curRead%.3f " +
      f"(ratio ${d.canary}%.3f)")
    println(f"median ratio:   ${d.median}%.3f   residual " +
      f"(canary divided out): ${d.residual}%.3f")
    println(s"verdict:        ${d.verdict}")
    println(s"movers (>1.5x canary-normalized): ${d.movers}" +
      d.top.map { case (q, x) => f" $q ${x}%.2fx" }.mkString)
    val ratios = prev.keys.filter(k => prev(k) > 0 && cur.contains(k))
      .map(k => (k, cur(k) / prev(k), prev(k), cur(k))).toSeq
    def row(t: (String, Double, Double, Double)): String =
      f"  ${t._1}%-40s ${t._3}%7.3f -> ${t._4}%7.3f  (${t._2}%5.2fx)"
    println(s"top $topN slower:")
    ratios.sortBy(-_._2).take(topN).foreach(t => println(row(t)))
    println(s"top $topN faster:")
    ratios.sortBy(_._2).take(topN).foreach(t => println(row(t)))
  }
}
