package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.functions.PhoneticOps
import graft.operators.{Density, Eval, Multimodal}

/** Round-6 batch 5: classifier eval (AUC/calibration), RIFF/WAVE
  * decode, DBSCAN, and the Soundex pipeline.
  */
class EvalSpec extends SparkTestBase {

  test("Eval.binaryAuc: hand-computed tie case; block-count invariant") {
    import spark.implicits._
    // positives: 0.9, 0.8, 0.8, 0.4 · negatives: 0.8, 0.3, 0.3, 0.1
    // pair count = #(p>n) + 0.5·#(p=n) = 14 of 16 -> AUC 0.875
    val df = Seq((0.9, true), (0.8, true), (0.8, true), (0.4, true),
      (0.8, false), (0.3, false), (0.3, false), (0.1, false))
      .toDF("s", "y")
    val r = Eval.binaryAuc(df, col("s"), col("y")).collect()(0)
    assert(r.getLong(0) == 4 && r.getLong(1) == 4)
    assert(r.getDouble(2) == 0.875)
    // two-phase blocking is an implementation detail: 1 block == many
    val r1 = Eval.binaryAuc(df, col("s"), col("y"), nBlocks = 1)
      .collect()(0)
    assert(r1.getDouble(2) == 0.875, "nBlocks must not change AUC")
    // degenerate: all scores equal -> AUC exactly 0.5
    val flat = Seq((1.0, true), (1.0, false), (1.0, true), (1.0, false))
      .toDF("s", "y")
    assert(Eval.binaryAuc(flat, col("s"), col("y"))
      .collect()(0).getDouble(2) == 0.5)
  }

  test("Eval.calibrationBins: bin edges, clamp, exact fractions") {
    import spark.implicits._
    val df = Seq((0.05, false), (0.15, true), (0.95, true), (1.0, true))
      .toDF("s", "y") // 1.0 clamps into the last bin
    val rows = Eval.calibrationBins(df, col("s"), col("y"), 0.0, 1.0, 10)
      .orderBy("bin").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 9L))
    val byBin = rows.map(r => r.getLong(0) ->
      (r.getDouble(1), r.getLong(2), r.getDouble(4))).toMap
    assert(byBin(0L) == ((0.0, 1L, 0.0)))
    assert(byBin(1L) == ((0.1, 1L, 1.0)))
    assert(byBin(9L) == ((0.9, 2L, 1.0)))
    intercept[IllegalArgumentException](
      Eval.calibrationBins(df, col("s"), col("y"), 1.0, 0.0, 10))
  }

  /** Little-endian WAV builder for the decoder tests. */
  private def wav(channels: Int, rate: Int, samples: Seq[Int],
      magic: String = "RIFF", fmtTag: Int = 1, bits: Int = 16,
      junkChunk: Boolean = false, truncate: Int = 0): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >> 16) & 0xFFFF) }
    def tag(t: String): Unit = out.write(t.getBytes("US-ASCII"))
    val dataLen = samples.length * 2
    val junkLen = if (junkChunk) 8 + 3 + 1 else 0 // odd size, padded
    tag(magic); w32(36 + junkLen + dataLen); tag("WAVE")
    if (junkChunk) { tag("LIST"); w32(3); out.write(Array[Byte](1, 2, 3, 0)) }
    tag("fmt "); w32(16); w16(fmtTag); w16(channels); w32(rate)
    w32(rate * channels * bits / 8); w16(channels * bits / 8); w16(bits)
    tag("data"); w32(dataLen)
    samples.foreach(w16)
    val bytes = out.toByteArray
    if (truncate > 0) bytes.dropRight(truncate) else bytes
  }

  test("Multimodal.decodeWav: chunk walk, stereo stats, poison bytes") {
    // stereo, ch0 = [1000, -1000, 1000], ch1 = [0, 0, 0], junk chunk
    // before fmt exercises the real RIFF traversal
    val b = wav(2, 8000, Seq(1000, 0, -1000, 0, 1000, 0), junkChunk = true)
    val w = Multimodal.decodeWav(b).get
    assert(w.channels == 2 && w.sampleRate == 8000 && w.nFrames == 3)
    assert(w.peakAbs == 1000 && w.zeroCross == 2) // ch0 sign flips only
    assert(math.abs(w.meanAmp - 1000.0 / 6) < 1e-12)
    assert(math.abs(w.rms - math.sqrt(3e6 / 6)) < 1e-9)
    // quarantine paths: wrong magic, compressed fmt, 8-bit, truncated
    assert(Multimodal.decodeWav(wav(1, 8000, Seq(1), magic = "RIFX")).isEmpty)
    assert(Multimodal.decodeWav(wav(1, 8000, Seq(1), fmtTag = 3)).isEmpty)
    assert(Multimodal.decodeWav(wav(1, 8000, Seq(1), bits = 8)).isEmpty)
    assert(Multimodal.decodeWav(wav(1, 8000, Seq(1, 2, 3), truncate = 2))
      .isEmpty)
    assert(Multimodal.decodeWav(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("Density.dbscan: core/border/noise roles on a hand graph") {
    import spark.implicits._
    val pts = (1L to 8L).toDF("id")
    // K4 clique {1,2,3,4}; 5 hangs off 1; {7,8} an isolated pair; 6 alone
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L), (7L, 8L)).toDF("id_a", "id_b")
    val r = Density.dbscan(pts, "id", pairs, "id_a", "id_b", minPts = 4)
      .collect()
      .map(x => x.getLong(0) -> (x.getString(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toMap
    for (i <- 1L to 4L) assert(r(i) == (("core", 1L)), s"node $i")
    assert(r(5L) == (("border", 1L)))
    assert(r(6L) == (("noise", -1L)))
    assert(r(7L) == (("noise", -1L)), "pair below minPts is noise")
    assert(r(8L) == (("noise", -1L)))
    // at minPts=2 the {7,8} pair becomes its own cluster
    val r2 = Density.dbscan(pts, "id", pairs, "id_a", "id_b", minPts = 2)
      .collect()
      .map(x => x.getLong(0) -> (x.getString(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).toMap
    assert(r2(7L) == (("core", 7L)) && r2(8L) == (("core", 7L)))
    assert(r2(5L) == (("core", 1L)), "5 has one neighbor -> core at minPts=2")
    assert(r2(6L) == (("noise", -1L)))
    intercept[IllegalArgumentException](
      Density.dbscan(pts, "id", pairs, "id_a", "id_b", minPts = 0))
  }

  test("Eval.binaryAucBy: per-slice statistics, undefined slices null") {
    import spark.implicits._
    val df = Seq(
      // slice "a": the binaryAuc hand case (AUC 0.875)
      ("a", 0.9, true), ("a", 0.8, true), ("a", 0.8, true),
      ("a", 0.4, true), ("a", 0.8, false), ("a", 0.3, false),
      ("a", 0.3, false), ("a", 0.1, false),
      // slice "b": perfectly separated -> 1.0
      ("b", 2.0, true), ("b", 1.0, false),
      // slice "c": no negatives -> undefined
      ("c", 1.0, true), ("c", 2.0, true))
      .toDF("g", "s", "y")
    val rows = Eval.binaryAucBy(df, col("g"), col("s"), col("y"))
      .orderBy("group").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(rows.toSeq == Seq(("a", 4L, 4L, 0.875),
      ("b", 1L, 1L, 1.0), ("c", 2L, 0L, null)))
  }

  test("Multimodal.audioFp56 + decodePcm0: frame energies, gradients") {
    // 114 mono samples: first 57 loud (1000), last 57 quiet (10).
    // Frame 28 straddles the boundary (samples 56,57), so the energy
    // envelope descends twice: 27->28 and 28->29 — exactly bits 27,28.
    val loudQuiet = Seq.fill(57)(1000) ++ Seq.fill(57)(10)
    val b = wav(1, 8000, loudQuiet)
    val samples = Multimodal.decodePcm0(b).get
    assert(samples.length == 114 && samples(0) == 1000 &&
      samples(113) == 10)
    val fp = Multimodal.audioFp56(samples).get
    assert(fp == ((1L << 27) | (1L << 28)), s"fp bits: ${fp.toBinaryString}")
    // rising envelope: every bit 0; falling: every bit 1
    assert(Multimodal.audioFp56((1 to 114).toArray).contains(0L))
    assert(Multimodal.audioFp56((114 to 1 by -1).toArray)
      .contains((1L << 56) - 1))
    // too short -> None; stereo channel-0 extraction
    assert(Multimodal.audioFp56(Array.fill(56)(5)).isEmpty)
    val st = wav(2, 8000, Seq(7, -9, 8, -9, 9, -9)) // ch0 = 7,8,9
    assert(Multimodal.decodePcm0(st).get.toSeq == Seq(7, 8, 9))
  }

  test("Eval.prCurve: hand-computed confusion table per threshold") {
    import spark.implicits._
    val df = Seq((3.0, true), (2.0, false), (2.0, true), (1.0, false))
      .toDF("s", "y")
    val rows = Eval.prCurve(df, col("s"), col("y")).orderBy("threshold")
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7)))
    assert(rows.toSeq == Seq(
      (1.0, 4L, 2L, 2L, 0L, 0.5, 1.0, 0.666667),
      (2.0, 3L, 2L, 1L, 0L, 0.666667, 1.0, 0.8),
      (3.0, 1L, 1L, 0L, 1L, 1.0, 0.5, 0.666667)))
    // block-count invariance again: the prefix machinery is transparent
    val one = Eval.prCurve(df, col("s"), col("y"), nBlocks = 1)
      .orderBy("threshold").collect().map(_.getLong(2)).toSeq
    assert(one == Seq(2L, 2L, 1L))
  }

  test("Eval.ece: integer-exact deviation sum, single final division") {
    import spark.implicits._
    val df = Seq((0.05, false), (0.15, true), (0.95, true), (0.95, true))
      .toDF("p", "y")
    // bin0: |0-500| = 500; bin1: |10000-1500| = 8500;
    // bin9: |20000-19000| = 1000  ->  10000 / (4*10000) = 0.25
    val r = Eval.ece(df, col("p"), col("y"), bins = 10).collect()(0)
    assert(r.getLong(0) == 4 && r.getLong(1) == 3)
    assert(r.getDouble(2) == 0.25)
    // perfectly calibrated degenerate case
    val perfect = Seq((1.0, true), (0.0, false)).toDF("p", "y")
    assert(Eval.ece(perfect, col("p"), col("y"), 10)
      .collect()(0).getDouble(2) == 0.0)
  }

  test("Multimodal.dhash56: monotone gradients, box averaging, floors") {
    // 9x7 grid, blocks are single pixels: rising ramp -> no bit set;
    // falling ramp -> all 56 bits set
    val rising = Array.tabulate(9 * 7)(i => i % 9)
    assert(Multimodal.dhash56(9, 7, rising).contains(0L))
    val falling = Array.tabulate(9 * 7)(i => 8 - i % 9)
    assert(Multimodal.dhash56(9, 7, falling)
      .contains((1L << 56) - 1), "all-descending must set all 56 bits")
    // 18x14: 2x2 box means preserve the ramp direction
    val rising2 = Array.tabulate(18 * 14)(i => i % 18)
    assert(Multimodal.dhash56(18, 14, rising2).contains(0L))
    // below the grid -> None
    assert(Multimodal.dhash56(8, 7, new Array[Int](56)).isEmpty)
    assert(Multimodal.dhash56(9, 6, new Array[Int](54)).isEmpty)
    // decodeGray: P6 pixels become integer-mean thirds
    val p6 = ("P6\n1 1\n255\n").getBytes("US-ASCII") ++
      Array[Byte](10, 20, 31) // (10+20+31)/3 = 20
    val g = Multimodal.decodeGray(p6)
    assert(g.contains((1, 1, Array(20))) ||
      g.exists { case (w, h, px) => w == 1 && h == 1 && px(0) == 20 })
  }

  test("Dedup.codeHammingPairs: pigeonhole recall, threshold, guards") {
    import spark.implicits._
    val codes = Seq((1L, 0L), (2L, 1L), (3L, (1L << 10) - 1))
      .toDF("id", "code") // ham(1,2)=1, ham(1,3)=10, ham(2,3)=9
    val pairs = graft.operators.Dedup.codeHammingPairs(
      codes, "id", "code", bits = 56, maxHamming = 2, bandsCount = 4)
      .select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs == Seq((1L, 2L, 1)))
    intercept[IllegalArgumentException](
      graft.operators.Dedup.codeHammingPairs(
        codes, "id", "code", 56, maxHamming = 4, bandsCount = 4))
    intercept[IllegalArgumentException](
      graft.operators.Dedup.codeHammingPairs(
        codes, "id", "code", 56, maxHamming = 2, bandsCount = 5))
    // maxPosting: band values shared by the six all-zero codes go hot
    // and are dropped everywhere; docs 7/8 share a COLD band-1 value
    // (5) on top of differing low bits, so their pair survives the cap
    val many = ((1L to 6L).map(i => (i, 0L)) :+
      (7L, 3L + (5L << 14)) :+ (8L, 2L + (5L << 14)))
      .toDF("id", "code")
    val capped = graft.operators.Dedup.codeHammingPairs(
      many, "id", "code", 56, maxHamming = 2, bandsCount = 4,
      maxPosting = 5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((7L, 8L)),
      s"expected only the cold-band pair: $capped")
    // uncapped control: the all-zero clique comes back
    val full = graft.operators.Dedup.codeHammingPairs(
      many, "id", "code", 56, maxHamming = 2, bandsCount = 4)
      .count()
    assert(full == 15 + 1, s"uncapped pair count: $full") // C(6,2)+1
  }

  test("Drift.ksStatistic: step-function max, identical and disjoint") {
    import spark.implicits._
    import graft.operators.Drift
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(2.0, 3.0, 4.0).toDF("v")
    val r = Drift.ksStatistic(a, b, col("v")).collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 3)
    assert(r.getDouble(2) == 0.333333) // max |F_a - F_b| = 1/3
    assert(Drift.ksStatistic(a, a, col("v")).collect()(0)
      .getDouble(2) == 0.0, "identical samples must give KS 0")
    val far = Seq(50.0, 60.0).toDF("v")
    assert(Drift.ksStatistic(a, far, col("v")).collect()(0)
      .getDouble(2) == 1.0, "disjoint supports must give KS 1")
    // block transparency
    assert(Drift.ksStatistic(a, b, col("v"), nBlocks = 1).collect()(0)
      .getDouble(2) == 0.333333)
  }

  test("Eval.ndcgAtK: perfect, reversed, and missing-doc orders") {
    import spark.implicits._
    def run(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("q_id", "cand_id", "rank")
    val ideal = run(Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L)))
    def ndcg(test: org.apache.spark.sql.DataFrame) =
      Eval.ndcgAtK(ideal, test, 3).collect()(0)
    val perfect = ndcg(run(Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))))
    assert(perfect.getLong(1) == 3 && perfect.getDouble(2) == 1.0)
    // reversed: DCG = 1*w(1) + 2*w(2) + 3*w(3), IDCG = 3w(1)+2w(2)+1w(3)
    def w(d: Int) = math.log(2.0) / math.log(d + 1.0)
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    val rev = ndcg(run(Seq((1L, 30L, 1L), (1L, 20L, 2L), (1L, 10L, 3L))))
    assert(rev.getDouble(2) ==
      r4((1 * w(1) + 2 * w(2) + 3 * w(3)) / (3 * w(1) + 2 * w(2) + 1 * w(3))))
    // a miss (doc 99 not in ideal) contributes zero gain
    val miss = ndcg(run(Seq((1L, 10L, 1L), (1L, 99L, 2L), (1L, 20L, 3L))))
    assert(miss.getLong(1) == 2)
    assert(miss.getDouble(2) ==
      r4((3 * w(1) + 0 * w(2) + 2 * w(3)) / (3 * w(1) + 2 * w(2) + 1 * w(3))))
  }

  test("Eval.rbo: identical 1-p^k, hand overlap, disjoint empty") {
    import spark.implicits._
    def run(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("q_id", "cand_id", "rank")
    val a = run(Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L)))
    // identical rankings: RBO@k = 1 - p^k (truncated form)
    val same = Eval.rbo(a, a, k = 3, p = 0.5).collect()(0)
    assert(same.getLong(1) == 3 && same.getDouble(2) == 0.875)
    // A=[a,b,c] vs B=[a,c,x]: shared a(m=1), c(m=3) ->
    // 0.5*(1 + 0.5/2 + 0.25*2/3) = 0.7083
    val b = run(Seq((1L, 10L, 1L), (1L, 30L, 2L), (1L, 99L, 3L)))
    val part = Eval.rbo(a, b, k = 3, p = 0.5).collect()(0)
    assert(part.getLong(1) == 2 && part.getDouble(2) == 0.7083)
    // disjoint runs share nothing -> query absent
    val c = run(Seq((1L, 77L, 1L), (1L, 88L, 2L), (1L, 99L, 3L)))
    assert(Eval.rbo(a, c, k = 3, p = 0.5).count() == 0)
    intercept[IllegalArgumentException](Eval.rbo(a, b, 3, 1.0))
    intercept[IllegalArgumentException](Eval.rbo(a, b, 0, 0.5))
  }

  test("Privacy.lDiversity: homogeneous groups flagged, diverse pass") {
    import spark.implicits._
    val df = Seq(
      ("z1", "s1"), ("z1", "s1"), ("z1", "s1"), // big but homogeneous
      ("z2", "s1"), ("z2", "s2"), ("z2", "s3")) // diverse
      .toDF("zip", "diag")
    val r = graft.operators.Privacy.lDiversity(
      df, Seq("zip" -> col("zip")), col("diag"), l = 2)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getBoolean(3))).toMap
    assert(r("z1") == ((3L, 1L, false)), "homogeneous group must fail")
    assert(r("z2") == ((3L, 3L, true)))
    intercept[IllegalArgumentException](graft.operators.Privacy
      .lDiversity(df, Seq.empty, col("diag"), 2))
  }

  test("Robust.welchTTest: hand-computed statistic and Welch df") {
    import spark.implicits._
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(2.0, 4.0, 6.0).toDF("v")
    val r = graft.operators.Robust.welchTTest(a, b, col("v")).collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 3)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 4.0)
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    // cents stats: va=10000, vb=40000; se² = 50000/3
    val sea = 10000.0 / 3
    val seb = 40000.0 / 3
    assert(r.getDouble(4) == r4((200.0 - 400.0) / math.sqrt(sea + seb)))
    val df = (sea + seb) * (sea + seb) /
      (sea * sea / 2 + seb * seb / 2)
    assert(r.getDouble(5) == math.floor(df * 100.0 + 0.5) / 100.0)
  }

  test("Timeseries.cusumDaily: telescoped recurrence equals the " +
    "sequential definition; alarms fire above h") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val ev = Seq(
      (ts("2024-01-01 10:00:00"), 10.0),
      (ts("2024-01-02 10:00:00"), 10.0),
      (ts("2024-01-03 10:00:00"), 20.0),
      (ts("2024-01-04 10:00:00"), 5.0))
      .toDF("ts", "v")
    val r = graft.operators.Timeseries.cusumDaily(
      ev, "ts", col("v"), targetCents = 1000L, slackCents = 0L,
      hCents = 800L)
      .orderBy("day").collect()
      .map(x => (x.getDouble(3), x.getBoolean(4)))
    // devs 0,0,+10,-5 -> S = 0,0,10,5 (units); alarm only at S=10 > 8
    assert(r.toSeq == Seq((0.0, false), (0.0, false), (10.0, true),
      (5.0, false)))
    // dip below zero resets: S never goes negative
    val ev2 = Seq((ts("2024-01-01 10:00:00"), 1.0),
      (ts("2024-01-02 10:00:00"), 30.0)).toDF("ts", "v")
    val r2 = graft.operators.Timeseries.cusumDaily(
      ev2, "ts", col("v"), 1000L, 0L, 800L)
      .orderBy("day").collect().map(_.getDouble(3))
    assert(r2.toSeq == Seq(0.0, 20.0),
      "negative drift must reset to zero, not carry")
  }

  test("Fusion.mmrSelect: diversity beats a redundant runner-up; " +
    "ties break on min id; short pools truncate") {
    import spark.implicits._
    val cands = Seq(
      // a and b point the same way; c is orthogonal with lower rel
      (1L, 1L, 0.90, Seq(1.0, 0.0)),
      (1L, 2L, 0.89, Seq(1.0, 0.001)),
      (1L, 3L, 0.50, Seq(0.0, 1.0)))
      .toDF("q_id", "cand_id", "rel", "v")
    val picks = graft.operators.Fusion.mmrSelect(
      cands, k = 2, lambda = 0.7, mu = 0.3)
      .orderBy("step").collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    // step 2: b scores 0.7*0.89-0.3*~1 = 0.32; c scores 0.35 -> c wins
    assert(picks.toSeq == Seq((1, 1L), (2, 3L)),
      s"diversity should beat the near-duplicate: ${picks.toSeq}")
    // exact ties (same rel, same vector) break on min cand_id
    val tied = Seq((2L, 9L, 0.8, Seq(1.0, 0.0)),
      (2L, 4L, 0.8, Seq(1.0, 0.0))).toDF("q_id", "cand_id", "rel", "v")
    val t = graft.operators.Fusion.mmrSelect(tied, 1, 0.7, 0.3)
      .collect()(0)
    assert(t.getLong(2) == 4L, "tie must break on the smaller id")
    // k larger than the pool: emit the whole pool, stop
    assert(graft.operators.Fusion.mmrSelect(tied, 5, 0.7, 0.3)
      .count() == 2)
  }

  test("Fusion.packContext: rank-prefix fits the budget, overflow " +
    "truncates, later smaller chunks are NOT back-filled") {
    import spark.implicits._
    val ranked = Seq(
      ("q1", 1L, 101L, 30L), ("q1", 2L, 102L, 30L),
      ("q1", 3L, 103L, 30L), // overflows at 90 > 64
      ("q1", 4L, 104L, 1L), // would fit, but prefix semantics skip it
      ("q2", 1L, 201L, 100L)) // first chunk alone busts the budget
      .toDF("query", "rank", "doc_id", "tokens")
    val out = graft.operators.Fusion.packContext(ranked, budget = 64)
      .select("query", "rank", "cum_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("q1", 1L, 30L), ("q1", 2L, 60L)),
      s"prefix semantics violated: $out")
    intercept[IllegalArgumentException](
      graft.operators.Fusion.packContext(ranked, 0))
  }

  test("Robust.bucketJackknife: CI brackets the mean, positive SE, " +
    "partitioning-invariant") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, (i % 97).toDouble))
      .toDF("id", "v")
    val r = graft.operators.Robust.bucketJackknife(
      df, col("id"), col("v"), buckets = 20).collect()(0)
    assert(r.getLong(0) == 1000)
    val (mean, se, lo, hi) = (r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4))
    assert(se > 0 && lo < mean && mean < hi)
    assert(hi - lo < 10.0, s"CI implausibly wide: [$lo, $hi]")
    // hash bucketing is data-deterministic: physical layout irrelevant
    val r8 = graft.operators.Robust.bucketJackknife(
      df.repartition(8), col("id"), col("v"), buckets = 20).collect()(0)
    assert(r8.getDouble(2) == se && r8.getDouble(3) == lo)
    intercept[IllegalArgumentException](
      graft.operators.Robust.bucketJackknife(df, col("id"), col("v"), 1))
  }

  test("Similarity.simplifiedSilhouette: separated clusters score " +
    "near 1, centroid points exactly 1, straddlers near 0") {
    import spark.implicits._
    // centroids (ids % 5 == 0): id0 at [0,0], id5 at [10,0]
    val emb = Seq(
      (0L, Seq(0.0f, 0.0f)), (5L, Seq(10.0f, 0.0f)),
      (1L, Seq(0.1f, 0.0f)), (2L, Seq(-0.1f, 0.0f)),
      (6L, Seq(10.1f, 0.0f)),
      (7L, Seq(5.2f, 0.0f))) // straddler, slightly nearer c5
      .toDF("vec_id", "embedding")
    val r = graft.operators.Similarity.simplifiedSilhouette(
      emb, "vec_id", "embedding", centroidEvery = 5)
      .orderBy("cell").collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    // cell 0: id0 (s=1), id1/id2 (a=0.1, b=9.9 / 10.1)
    val s1 = (9.9 - 0.1) / 9.9
    val s2 = (10.1 - 0.1) / 10.1
    assert(r(0L)._1 == 3 && r(0L)._2 == r4((1.0 + s1 + s2) / 3))
    // cell 5: id5 (s=1), id6 (a=0.1, b=10.1), id7 (a=4.8, b=5.2)
    val s6 = (10.1 - 0.1) / 10.1
    val s7 = (5.2 - 4.8) / 5.2
    assert(r(5L)._1 == 3 && r(5L)._2 == r4((1.0 + s6 + s7) / 3))
  }

  test("PhoneticOps.soundex: textbook codes incl. the H/W rule") {
    import spark.implicits._
    val in = Seq("Robert", "Rupert", "Ashcraft", "Tymczak", "Pfister",
      "Honeyman", "robert", "  12 3!", "").toDF("w")
    val out = in.select(col("w"), PhoneticOps.soundex(col("w")).as("c"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out("Robert") == "R163" && out("Rupert") == "R163")
    assert(out("Ashcraft") == "A261", "s/c across H must merge (H/W rule)")
    assert(out("Tymczak") == "T522")
    assert(out("Pfister") == "P236", "first-letter code dedups into F")
    assert(out("Honeyman") == "H555")
    assert(out("robert") == "R163", "case-insensitive")
    assert(out("  12 3!") == null && out("") == null)
  }

  test("Multimodal.decimatePcm: every-k-th samples at rate/k, k=1 " +
    "identity, stereo dropped") {
    import spark.implicits._
    def wav(rate: Int, channels: Int, samples: Seq[Int]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      def le16(v: Int): Unit = {
        bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF)
      }
      def le32(v: Int): Unit = { le16(v & 0xFFFF); le16(v >>> 16) }
      val dataLen = samples.length * 2
      bos.write("RIFF".getBytes("US-ASCII")); le32(36 + dataLen)
      bos.write("WAVEfmt ".getBytes("US-ASCII"))
      le32(16); le16(1); le16(channels)
      le32(rate); le32(rate * 2 * channels); le16(2 * channels); le16(16)
      bos.write("data".getBytes("US-ASCII")); le32(dataLen)
      samples.foreach(le16)
      bos.toByteArray
    }
    val mono = wav(8000, 1, Seq(100, -200, 300, -400, 500, -600))
    val stereo = wav(8000, 2, Seq(1, 2, 3, 4))
    val media = Seq(
      (1L, mono, "audio/wav", mono.length.toLong),
      (2L, stereo, "audio/wav", stereo.length.toLong))
      .toDF("doc_id", "media", "mime", "n_bytes")
    val dec = Multimodal.decimatePcm(media, 2)
    val rows = dec.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L),
      "stereo input must be dropped")
    val outBytes = rows(0).getAs[Array[Byte]](1)
    val info = Multimodal.decodeWav(outBytes).get
    assert(info.sampleRate == 4000 && info.nFrames == 3)
    assert(Multimodal.decodePcm0(outBytes).get.toSeq ==
      Seq(100, 300, 500), "kept samples must be positions 0,2,4")
    // k=1 round-trips the canonical mono header and all samples
    val id = Multimodal.decimatePcm(media.filter(col("doc_id") === 1), 1)
      .collect()(0).getAs[Array[Byte]](1)
    assert(java.util.Arrays.equals(id, mono), "k=1 must be identity")
    intercept[IllegalArgumentException](Multimodal.decimatePcm(media, 0))
  }

  test("Multimodal.resizeGray: identity at equal dims, drop below " +
    "target, and dHash commutes with resize-to-hash-grid") {
    import spark.implicits._
    def p5(w: Int, h: Int, f: Int => Int): Array[Byte] =
      (s"P5\n$w $h\n255\n".getBytes("UTF-8").toSeq ++
        (0 until w * h).map(i => f(i).toByte)).toArray
    val img = p5(18, 14, i => (i * 37) % 251)
    val tiny = p5(4, 3, _ => 5)
    val media = Seq(
      (1L, img, "image/x-portable-graymap", img.length.toLong),
      (2L, tiny, "image/x-portable-graymap", tiny.length.toLong))
      .toDF("doc_id", "media", "mime", "n_bytes")
    // identity: resizing to the source dims returns the same pixels
    val same = Multimodal.resizeGray(media.filter(col("doc_id") === 1),
      18, 14).select("media").collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(same, img), "identity resize drifted")
    // below-target images are dropped (quarantine discipline)
    val out = Multimodal.resizeGray(media, 9, 7)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L), "sub-target image must be dropped")
    // commutation: dHash's internal 9x7 downsample of a 9x7 input is
    // the identity, so hash(resize(img, 9, 7)) == hash(img) — the
    // shared-kernel guarantee (boxDownsample under both paths)
    val direct = Multimodal.dhashImages(media.filter(col("doc_id") === 1))
      .collect()(0).dhash
    val viaResize = Multimodal.dhashImages(
      Multimodal.resizeGray(media.filter(col("doc_id") === 1), 9, 7))
      .collect()(0).dhash
    assert(direct.nonEmpty && direct == viaResize,
      s"dHash/resize kernel drift: $direct vs $viaResize")
  }

  test("Multimodal.frameSampleDhash: self-delimiting frame scan " +
    "samples every k-th frame, mixes P5/P6, nulls sub-grid frames, " +
    "and stops at garbage keeping decoded frames") {
    import spark.implicits._
    def p5(w: Int, h: Int, f: Int => Int): Array[Byte] =
      (s"P5\n$w $h\n255\n".getBytes("UTF-8").toSeq ++
        (0 until w * h).map(i => f(i).toByte)).toArray
    def p6(w: Int, h: Int, f: Int => Int): Array[Byte] =
      (s"P6\n$w $h\n255\n".getBytes("UTF-8").toSeq ++
        (0 until 3 * w * h).map(i => f(i / 3).toByte)).toArray
    val fA = p5(18, 14, i => i % 251)        // frame 0 (sampled)
    val fB = p6(18, 14, i => (i * 7) % 249)  // frame 1 (skipped, RGB)
    val fC = p5(18, 14, i => (i * 3) % 247)  // frame 2 (sampled)
    val fSmall = p5(4, 3, _ => 9)            // frame 3: below 9x7 grid
    val clean = (1L, fA ++ fB ++ fC, "video/x-pnm-frames",
      (fA.length + fB.length + fC.length).toLong)
    // doc 2: a valid frame, then garbage — scan stops, frame 0 kept
    val garbled = (2L, fA ++ Array[Byte]('X', 'Y', 'Z'),
      "video/x-pnm-frames", (fA.length + 3).toLong)
    // doc 3: sampled frame below the dHash grid -> null hash row
    val tiny = (3L, fSmall ++ fA, "video/x-pnm-frames",
      (fSmall.length + fA.length).toLong)
    val media = Seq(clean, garbled, tiny)
      .toDF("doc_id", "media", "mime", "n_bytes")
    val out = Multimodal.frameSampleDhash(media, everyK = 2)
      .collect().map(r => (r.doc_id, r.frame_idx, r.dhash))
      .sortBy(x => (x._1, x._2))
    val expA = Multimodal.decodeGray(fA)
      .flatMap { case (w, h, px) => Multimodal.dhash56(w, h, px) }
    val expC = Multimodal.decodeGray(fC)
      .flatMap { case (w, h, px) => Multimodal.dhash56(w, h, px) }
    assert(expA.nonEmpty && expC.nonEmpty)
    assert(out.toSeq == Seq(
      (1L, 0, expA), (1L, 2, expC),   // doc 1: frames 0,2 (1 skipped)
      (2L, 0, expA),                  // doc 2: stop at garbage
      (3L, 0, None)),                 // doc 3: sub-grid frame -> null
      s"frame scan mismatch: ${out.mkString(",")}")
    intercept[IllegalArgumentException](
      Multimodal.frameSampleDhash(media, 0))
  }

  test("Eval.aucDelong: degenerate label mixes null the statistics; " +
    "the quantize-first cap rejects continuous scores") {
    import spark.implicits._
    // all-positive frame: n1=4, n0=0 -> auc AND se/ci null (empty
    // class: no point estimate, binaryAucBy's convention)
    val onlyPos = Seq((0.9, true), (0.8, true), (0.7, true), (0.4, true))
      .toDF("s", "y")
    val r = Eval.aucDelong(onlyPos, col("s"), col("y")).collect()(0)
    assert(r.getLong(0) == 4 && r.getLong(1) == 0)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4) &&
      r.isNullAt(5), s"empty class must null auc/se/ci: $r")
    // one positive ranked above two negatives: the POINT estimate is
    // well-defined (AUC 1.0, matching binaryAuc) but the DeLong
    // variance divisor n1-1 = 0 -> se/ci null
    val onePos = Seq((0.9, true), (0.8, false), (0.7, false))
      .toDF("s", "y")
    val r1 = Eval.aucDelong(onePos, col("s"), col("y")).collect()(0)
    assert(r1.getDouble(2) == 1.0,
      s"single-positive point estimate must match binaryAuc: $r1")
    assert(Eval.binaryAuc(onePos, col("s"), col("y"))
      .collect()(0).getDouble(2) == 1.0)
    assert(r1.isNullAt(3) && r1.isNullAt(4) && r1.isNullAt(5),
      s"variance needs 2 per class -> se/ci null: $r1")
    // unquantized caller: 500 distinct doubles vs a cap of 100 fails
    // fast instead of folding a single-task array
    val continuous = (1 to 500)
      .map(i => (i / 500.0 + 1e-9 * i, i % 2 == 0)).toDF("s", "y")
    val ex = intercept[IllegalArgumentException](
      Eval.aucDelong(continuous, col("s"), col("y"),
        maxDistinctScores = 100))
    assert(ex.getMessage.contains("quantize"), ex.getMessage)
    // same contract on the isotonic driver fit
    val ex2 = intercept[IllegalArgumentException](
      Eval.isotonicBlocksFromPartials(
        Eval.scorePartials(continuous, col("s"), col("y")),
        maxDistinctScores = 100))
    assert(ex2.getMessage.contains("quantize"), ex2.getMessage)
  }

  test("Eval.splitConformalBy: calibration-only groups keep their " +
    "interval with n_test=0/null coverage; test-only groups are " +
    "omitted") {
    import spark.implicits._
    // group "a": calibration AND test rows; group "b": calibration
    // only; group "c": test only (no predictor -> omitted)
    val rows =
      (1 to 20).map(i => ("a", i.toDouble, i % 2 == 0)) ++
      (1 to 20).map(i => ("b", i.toDouble, true)) ++
      (1 to 20).map(i => ("c", i.toDouble, false))
    val df = rows.toDF("g", "v", "cal")
    val out = Eval.splitConformalBy(df, col("g"), col("v"),
      col("cal"), alpha = 0.1).orderBy("g").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b"),
      s"expected groups a,b only: ${out.mkString(",")}")
    val a = out(0)
    assert(a.getAs[Long]("n_test") == 10 &&
      !a.isNullAt(a.fieldIndex("coverage")))
    val b = out(1)
    assert(b.getAs[Long]("n_cal") == 20 &&
      b.getAs[Long]("n_test") == 0 &&
      b.isNullAt(b.fieldIndex("coverage")) &&
      !b.isNullAt(b.fieldIndex("qhat")),
      s"calibration-only group must keep qhat with null coverage: $b")
  }

  test("Robust.bucketJackknife: a single occupied bucket nulls the " +
    "error bar instead of emitting NaN") {
    import spark.implicits._
    // one distinct id -> every row hashes to the same bucket
    val df = (1 to 50).map(_ => (7L, 3.5)).toDF("id", "v")
    val r = graft.operators.Robust.bucketJackknife(
      df, col("id"), col("v"), buckets = 20).collect()(0)
    assert(r.getLong(0) == 50 && r.getDouble(1) == 3.5)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4),
      s"single-bucket SE/CI must be null: $r")
  }
}
