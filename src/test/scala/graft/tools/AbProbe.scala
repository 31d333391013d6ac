package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: interleaved A/B timing of declared queries under two
  * SESSION configurations in one JVM — the only protocol that survives
  * this sandbox's I/O weather bands (probe-to-probe comparisons across
  * separate JVMs see ±30% canary swings; interleaving puts both arms
  * under the same weather and the same JIT state).
  *
  *   AbProbe <sfDir> <confKey=valA|valB> <query> [query ...]
  *
  * Arm A = session with confKey=valA, arm B = confKey=valB. Each query
  * is warmed once per arm, then timed over `GRAFT_AB_PASSES` (default
  * 3) alternating passes; per-query MIN per arm is reported (the
  * bench's own min-of-passes steady-state convention).
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: AbProbe <sfDir> <k=a|b> <query>...")
    val sfDir = args(0)
    val Array(key, vals) = args(1).split("=", 2)
    val Array(va, vb) = vals.split("\\|", 2)
    val wanted = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("GRAFT_AB_PASSES", "3").toInt
    val base = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    base.sparkContext.setLogLevel("WARN")
    val sa = base.newSession(); sa.conf.set(key, va)
    val sb = base.newSession(); sb.conf.set(key, vb)

    val qs = graft.SparkEntry.allQueries.filter(q => wanted(q.name))
    def run(s: SparkSession, q: graft.GraftQuery): Double = {
      val t0 = System.nanoTime()
      try {
        q.run(s, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[ab] ${q.name} failed: ${e.getMessage}")
        // a fast failure must NOT win the min-of-passes comparison —
        // NaN poisons that query's min and the TOTAL, so a broken arm
        // reads as broken, not fast (round-19 ADVICE)
        Double.NaN
      }
    }
    // warm both arms (JIT + codegen + table caches per session)
    qs.foreach { q => run(sa, q); run(sb, q) }
    val mins = scala.collection.mutable.Map[String, (Double, Double)]()
    for (p <- 1 to passes) {
      System.gc()
      qs.foreach { q =>
        // alternate arm order per pass: running second is systematically
        // warmer (JIT, page cache), so a fixed order biases one arm
        val (ta, tb) =
          if (p % 2 == 1) { val a = run(sa, q); val b = run(sb, q); (a, b) }
          else { val b = run(sb, q); val a = run(sa, q); (a, b) }
        val (pa, pb) = mins.getOrElse(q.name,
          (Double.MaxValue, Double.MaxValue))
        mins(q.name) = (math.min(pa, ta), math.min(pb, tb))
      }
    }
    var (suma, sumb) = (0.0, 0.0)
    qs.foreach { q =>
      val (ta, tb) = mins(q.name)
      suma += ta; sumb += tb
      println(f"[ab] ${q.name}%-28s A=$ta%7.3f B=$tb%7.3f  B/A=${tb / ta}%5.2f")
    }
    println(f"[ab] TOTAL A=$suma%.3f B=$sumb%.3f  B/A=${sumb / suma}%5.2f  ($key: A=$va B=$vb)")
    base.stop()
  }
}
