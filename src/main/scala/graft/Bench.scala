package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Queries are executed through the `noop` sink, not `count()` — count lets
  * Catalyst prune every non-grouping column and skip the aggregate math,
  * which would under-report; noop materializes the full result columns.
  */
object Bench {

  /** Regime adjudication, pure so the spec pins the table (see main for
    * the signal rationale): `unknown` on a failed READ canary,
    * `inflated` on a failed start-load fence / post-canary degradation
    * (read >30% or write >50% over pre — the r14 evening band was
    * WRITE-side D-state flush with healthy reads, so the write canary
    * participates; its threshold is wider because fsync timing is
    * noisier) / same-container READ floor >30% over baseline, `shifted`
    * on a DIFFERENT container whose stable READ floor is >15% off the
    * baseline (container comparison stays read-only: the read canary is
    * the stable axis the r15 swap was adjudicated on), else `healthy`.
    *
    * The write canary deliberately has NO floor-vs-baseline check: a
    * lucky-low adopted write floor (writeback absorbing all four
    * baseline-run writes) would permanently classify honest
    * fsync-bound runs as inflated with no self-heal path — inflated
    * runs never refresh the baseline and the ratchet only moves down.
    * The in-run post-vs-pre signal is baseline-free and catches flush
    * load that evolves during the run; write degradation that is steady
    * across an ENTIRE run and across runs is a documented blind spot of
    * any single-artifact scheme (the read canary and load fence still
    * bound it). A failed write canary (-1) simply drops the write
    * signals — reads alone still classify. `baseline` is (boot_id,
    * read, write) from BENCH_canary_baseline.json, already filtered to
    * the matching sf.
    */
  private[graft] def classifyRegime(loadOk: Boolean, preRead: Double,
      postRead: Double, baseline: Option[(String, Double, Double)],
      bootId: String, preWrite: Double = -1.0,
      postWrite: Double = -1.0): String =
    if (preRead < 0 || postRead < 0) "unknown"
    else {
      val readMin = math.min(preRead, postRead)
      val writeOk = preWrite >= 0 && postWrite >= 0
      val degraded = postRead > preRead * 1.3 ||
        (writeOk && postWrite > preWrite * 1.5)
      if (!loadOk || degraded) "inflated"
      else baseline match {
        case Some((bid, bread, _)) if bid == bootId && bid.nonEmpty =>
          if (readMin > bread * 1.3) "inflated" else "healthy"
        case Some((_, bread, _)) =>
          if (math.abs(readMin - bread) / bread > 0.15) "shifted"
          else "healthy"
        case None => "healthy"
      }
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Probe mode: SPARK_GRAFT_ONLY=qB7,q28 restricts the run to the named
    // queries (short qNN prefixes or full names) — for steady-state
    // regression probes without paying the full-suite wall time. The
    // driver never sets it, so round artifacts are always the full set.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    // Load fence: a benchmark started on an already-busy host measures
    // the neighbors, not the engine (two past round artifacts recorded
    // 1.3-3.4x phantom regressions that vanished on an idle re-run).
    // Record the 1-min load average at start and flag the artifact —
    // readings taken with load_ok=false should be discarded in favor of
    // SCALE.md's clean-run numbers.
    val load1 = try {
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    } catch { case _: Throwable => -1.0 }
    val nCpu = Runtime.getRuntime.availableProcessors
    // idle threshold: anything over half the cores already running when
    // the bench starts will contend with the 32 task threads
    val loadOk = load1 < 0 || load1 <= nCpu * 0.5
    if (!loadOk)
      System.err.println(f"[bench] WARNING: start load1=$load1%.1f on " +
        s"$nCpu cpus — timings will include neighbor contention")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // I/O-regime canary: a FIXED read (full scan of the largest base
    // table through noop) and a FIXED write (2M-row parquet overwrite,
    // the flush-sensitive side — the r14 evening band was D-state
    // flush load with idle CPU), each min-of-2, plus the raw
    // /proc/loadavg, captured BEFORE the warmup and AFTER the last
    // timed pass. A band where the canaries and the trivial tail
    // inflate uniformly is host weather; a regression confined to
    // specific queries with flat canaries is code. This makes
    // dual-band adjudication self-contained in the artifact (r14
    // needed a manual vmstat session).
    def loadavg(): String = try {
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).trim
    } catch { case _: Throwable => "" }
    def canary(): (Double, Double, String) = {
      // a FAILED canary must record -1, not its time-to-exception: a
      // fast failure reads as "healthy I/O" and flips the dual-band
      // adjudication to exactly the wrong verdict
      def readOnce(): Double = {
        val t0 = System.nanoTime()
        try {
          spark.read.parquet(s"$sfDir/lineitem.parquet")
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case _: Throwable => -1.0 }
      }
      def writeOnce(): Double = {
        val t0 = System.nanoTime()
        try {
          spark.range(2000000L)
            .selectExpr("id", "id * 37 % 1000 AS k",
              "CAST(id AS STRING) AS s")
            .write.mode("overwrite").parquet("target/bench_canary.parquet")
          (System.nanoTime() - t0) / 1e9
        } catch { case _: Throwable => -1.0 }
      }
      def minOk(a: Double, b: Double): Double =
        if (a < 0 || b < 0) -1.0 else math.min(a, b)
      (minOk(readOnce(), readOnce()),
        minOk(writeOnce(), writeOnce()), loadavg())
    }
    val canaryPre = canary()

    // Untimed warm-up pass over the full query set: JIT compilation (C2
    // churning under 32 concurrent task threads) and janino codegen of a
    // fresh JVM otherwise land on RANDOM queries, measured as 10-30% noise
    // swings between identical runs. One pass compiles every hot path;
    // the timed pass below then measures steady-state engine throughput —
    // standard harness methodology (JMH warmup iterations).
    // Budgets scale with the query count (the set has grown across
    // rounds; fixed cutoffs tuned for 67 queries silently skipped the
    // refinement pass once the first pass naturally summed past them).
    val benchQueries = SparkEntry.allQueries.filter(q => only.forall(sel =>
      sel.contains(q.name) || sel.contains(q.name.takeWhile(_ != '_'))))
    val nQueries = benchQueries.size
    val warmBudgetSec = math.max(100L, nQueries * 2L)
    val warmDeadline = System.nanoTime() + warmBudgetSec * 1000000000L
    benchQueries.foreach { q =>
      // on a degraded host, cap warmup rather than blow the wall budget —
      // un-warmed queries just measure slightly colder
      if (System.nanoTime() < warmDeadline) {
        try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    }

    // Two timed passes, per-query minimum: transient host-level stalls
    // (GC, scheduler, VM neighbors) land on random queries and inflate a
    // single pass by up to 30%; the min of two independent passes is the
    // steady-state throughput the engine actually sustains. Each pass
    // starts on a clean heap so the previous pass's garbage doesn't
    // bill a major GC to whichever query trips it.
    def timedPass(): Seq[(String, Double)] = {
      System.gc()
      benchQueries.map { q =>
        val t0 = System.nanoTime()
        try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        }
        q.name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val p1 = timedPass().toMap
    // On a healthy host pass 1 sums to well under 2s/query; if the
    // machine is badly degraded, skip the refinement pass rather than
    // risk the harness's wall budget — min-of-one is just pass 1.
    val p2 = if (p1.values.sum < nQueries * 2.0) timedPass().toMap else p1
    val canaryPost = canary()

    // Regime self-classification (VERDICT r15 #5): the artifact carries
    // its own verdict, so a band shift needs no judge-side vmstat
    // archaeology. Three signals:
    //   - inflated: the start load failed the fence, the POST read
    //     canary sits >30% above the pre one (the host degraded DURING
    //     the run; the opposite direction is just JIT warm-in — the pre
    //     canary runs on a cold JVM and is systematically slower), or —
    //     same container as the recorded baseline — the canary floor
    //     sits >30% above it: neighbor weather, discard the band.
    //   - shifted: a DIFFERENT container (boot_id) whose stable canary
    //     floor differs >15% from the recorded baseline — the r15 swap
    //     case: container drift, compare ratios not absolutes.
    //   - healthy: everything else.
    // The baseline is a COMMITTED file {boot_id, read, write} refreshed
    // from the first non-inflated full run on each container, so the
    // next artifact on the same host classifies against a measured
    // reference rather than its own run.
    val bootId = try {
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        "/proc/sys/kernel/random/boot_id"))).trim
    } catch { case _: Throwable => "" }
    // the read canary scans $sfDir/lineitem, so a baseline only means
    // something at the SAME sf — a mismatched record is ignored and
    // (on a healthy run) replaced
    val basePath = java.nio.file.Paths.get("BENCH_canary_baseline.json")
    val baseline: Option[(String, Double, Double)] = try {
      val t = new String(java.nio.file.Files.readAllBytes(basePath))
      val re = (""""boot_id":"([^"]*)".*"read":([0-9.]+)""" +
        """.*"write":([0-9.]+).*"sf":"([^"]*)"""").r
      re.findFirstMatchIn(t).collect {
        case m if m.group(4) == sfDir =>
          (m.group(1), m.group(2).toDouble, m.group(3).toDouble) }
    } catch { case _: Throwable => None }
    val readPair = Seq(canaryPre._1, canaryPost._1)
    val regime: String =
      classifyRegime(loadOk, canaryPre._1, canaryPost._1, baseline, bootId,
        canaryPre._2, canaryPost._2)
    // refresh rules: adopt the floor on the first non-inflated full run
    // of a container (recording the shift is the artifact's job — the
    // regime field flags it once), then RATCHET DOWN on any later run
    // with a lower floor, so a first run that happened to be stably
    // degraded self-heals instead of poisoning the baseline forever.
    // A failed write canary (-1) must never be written: it would not
    // re-parse and would silently disable adjudication for good.
    val readMin = readPair.min
    val writeMin = Seq(canaryPre._2, canaryPost._2).min
    val adoptNew = !baseline.exists(_._1 == bootId)
    // per-FIELD ratchet: each floor only ever moves down on its own
    // evidence — a run with a better read but a transiently-worse write
    // must not raise the committed write floor (and vice versa)
    val (keepRead, keepWrite) = baseline match {
      case Some((bid, br, bw)) if bid == bootId =>
        (math.min(readMin, br), math.min(writeMin, bw))
      case _ => (readMin, writeMin)
    }
    val ratchet = baseline.exists(b => b._1 == bootId &&
      (keepRead < b._2 || keepWrite < b._3))
    val refresh = only.isEmpty && regime != "inflated" &&
      regime != "unknown" && bootId.nonEmpty && writeMin >= 0 &&
      (adoptNew || ratchet)
    if (refresh) {
      try java.nio.file.Files.writeString(basePath,
        s"""{"boot_id":"$bootId","read":${"%.3f".formatLocal(
          java.util.Locale.ROOT, keepRead)},"write":${"%.3f".formatLocal(
          java.util.Locale.ROOT, keepWrite)},"sf":"$sfDir"}""" + "\n")
      catch { case _: Throwable => () }
    }

    val results = benchQueries
      .map(q => q.name -> math.min(p1(q.name), p2(q.name)))
    // The driver parses this line from a 2000-char log tail (measured:
    // BENCH_r03's "tail" field is exactly 2000 chars and all three rounds
    // recorded "parsed": null). 3-decimal values plus qNN-prefix keys keep
    // the full 84-query line ~1.1 KB — inside the window with headroom.
    // Full query names remain in CORRECTNESS_r*.json; qNN is the unique
    // prefix of each.
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    require(results.map(_._1.takeWhile(_ != '_')).distinct.size ==
      results.size, "bench short keys collide — fix query numbering")
    val qs = results.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // stdout stays numeric-compact (2000-char tail window); the raw
    // loadavg strings live in the file twin below
    def canaryJson(c: (Double, Double, String), full: Boolean): String =
      s"""{"read":${fmt(c._1)},"write":${fmt(c._2)}""" +
        (if (full) s""","loadavg":"${c._3}"}""" else "}")
    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
        s""""load_ok":$loadOk,"load1":${fmt(load1)},"regime":"$regime",""" +
        s""""canary_pre":${canaryJson(canaryPre, full = false)},""" +
        s""""canary_post":${canaryJson(canaryPost, full = false)},""" +
        s""""queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // File twin of the stdout contract: the driver captures stdout from a
    // 2000-char log tail, which has truncated the artifact three rounds
    // running ("parsed": null + a cut-off summary). target/BENCH_full.json
    // carries the SAME two-run minima under FULL query names plus both
    // per-pass readings, so adjudication can always read an intact
    // artifact off disk. Full runs only — a SPARK_GRAFT_ONLY probe can't
    // clobber the last full-suite numbers.
    if (only.isEmpty) {
      val fullQs = results.map { case (k, v) =>
        s""""$k":{"min":${fmt(v)},"p1":${fmt(p1(k))},"p2":${fmt(p2(k))}}"""
      }.mkString("{", ",", "}")
      val fullJson =
        s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
          s""""load_ok":$loadOk,"load1":${fmt(load1)},""" +
          s""""regime":"$regime","boot_id":"$bootId",""" +
          baseline.map { case (bid, br, bw) =>
            s""""canary_baseline":{"boot_id":"$bid","read":${fmt(br)},""" +
              s""""write":${fmt(bw)}},""" }.getOrElse("") +
          s""""canary_pre":${canaryJson(canaryPre, full = true)},""" +
          s""""canary_post":${canaryJson(canaryPost, full = true)},""" +
          s""""n_queries":$nQueries,"queries":$fullQs,"sf":"$sfDir"}"""
      try {
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("target/bench_last.json"), json)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("target/BENCH_full.json"), fullJson)
      } catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
