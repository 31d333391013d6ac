package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators._

/** Hand-computed cases for the round-7 batch: trend statistics (ACF,
  * EWMA, Mann-Kendall/Theil-Sen), chi-square independence, mergeable
  * exact quantiles, in-engine LR training, Fellegi-Sunter linkage,
  * hard-negative mining, and the lexical-diversity diagnostics.
  */
class StatsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(day: Int, h: Int = 12) =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  // One event per day so the daily mean IS the value.
  private def dailySeries(vals: Seq[Double]) =
    vals.zipWithIndex.map { case (v, i) => (i.toLong, ts(i + 1), v) }
      .toDF("event_id", "ts", "value")

  // ---- ACF ----------------------------------------------------------

  test("Trend.acfDaily: alternating series has ACF(1) ~ -1, ACF(2) ~ +1") {
    val df = dailySeries(Seq(1.0, 3.0, 1.0, 3.0, 1.0, 3.0, 1.0, 3.0))
    val r = Trend.acfDaily(df, "ts", col("value"), 2)
      .orderBy("lag").collect()
    val acf1 = r(0).getAs[Double]("acf")
    val acf2 = r(1).getAs[Double]("acf")
    assert(acf1 < -0.8, s"lag-1 of an alternating series: $acf1")
    assert(acf2 > 0.6, s"lag-2 of an alternating series: $acf2")
    assert(r(0).getAs[Long]("n_pairs") == 7)
    assert(r(1).getAs[Long]("n_pairs") == 6)
  }

  test("Trend.acfDaily: constant series has zero deviations (acf = 0/0 -> null)") {
    val df = dailySeries(Seq(5.0, 5.0, 5.0, 5.0))
    val r = Trend.acfDaily(df, "ts", col("value"), 1).collect()
    // zero deviation mass -> ACF undefined -> null (not an ANSI error)
    assert(r(0).isNullAt(r(0).fieldIndex("acf")))
  }

  // ---- EWMA ---------------------------------------------------------

  test("Trend.ewmaDaily replays the recurrence exactly") {
    val xs = Seq(10.0, 12.0, 8.0, 11.0)
    val r = Trend.ewmaDaily(dailySeries(xs), "ts", col("value"),
      lambda = 0.5, kSigma = 100.0).orderBy("day").collect()
    // hand recurrence, lambda=.5: e1=10, e2=11, e3=9.5, e4=10.25
    val e = Seq(10.0, 11.0, 9.5, 10.25)
    r.zip(e).foreach { case (row, exp) =>
      assert(math.abs(row.getAs[Double]("ewma") - exp) < 1e-9) }
    assert(r(0).isNullAt(r(0).fieldIndex("ewma_prev")))
    assert(math.abs(r(1).getAs[Double]("ewma_prev") - 10.0) < 1e-9)
    // kSigma=100 -> no alarms
    assert(r.forall(!_.getAs[Boolean]("alarm")))
  }

  test("Trend.ewmaDaily alarms on a shock beyond k sigma") {
    // stable series then a large jump. The global sigma INCLUDES the
    // shock day (one pass, no leave-one-out), so the jump must clear
    // k sigma of the shock-inflated spread: 60 vs sigma ~ 20.4.
    val xs = Seq(10.0, 10.2, 9.8, 10.1, 9.9, 60.0)
    val r = Trend.ewmaDaily(dailySeries(xs), "ts", col("value"),
      lambda = 0.2, kSigma = 2.0).orderBy("day").collect()
    assert(r.last.getAs[Boolean]("alarm"), "shock day must alarm")
    assert(r.init.forall(!_.getAs[Boolean]("alarm")))
  }

  // ---- Mann-Kendall / Theil-Sen ------------------------------------

  test("Trend.mannKendallDaily on a strictly increasing series") {
    // x = 1,2,3,4,5 daily: S = 10 (all pairs ascending), no ties:
    // Var = 5*4*15/18 = 16.666..., z = 9/sqrt(50/3) = 2.2045,
    // Theil-Sen slope = 1 per day.
    val r = Trend.mannKendallDaily(
      dailySeries(Seq(1.0, 2.0, 3.0, 4.0, 5.0)), "ts", col("value"))
      .collect()(0)
    assert(r.getAs[Long]("n_days") == 5)
    assert(r.getAs[Long]("s_stat") == 10)
    assert(math.abs(r.getAs[Double]("var_s") - 50.0 / 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("z") - 2.2045) < 1e-3)
    assert(math.abs(r.getAs[Double]("slope_per_day") - 1.0) < 1e-9)
  }

  test("Trend.mannKendallDaily: ties contribute zero and correct the variance") {
    // x = 2,2,2,5: S = 3 (three ascending pairs vs the 5), tie group
    // of 3: Var = [4*3*13 - 3*2*11]/18 = (156-66)/18 = 5
    val r = Trend.mannKendallDaily(
      dailySeries(Seq(2.0, 2.0, 2.0, 5.0)), "ts", col("value"))
      .collect()(0)
    assert(r.getAs[Long]("s_stat") == 3)
    assert(math.abs(r.getAs[Double]("var_s") - 5.0) < 1e-9)
  }

  // ---- chi-square independence -------------------------------------

  test("Robust.chi2Independence: independent margins give chi2 ~ 0") {
    // perfectly proportional 2x2 grid: obs == exp exactly
    val rows = Seq.fill(20)(("a", "x")) ++ Seq.fill(20)(("b", "x")) ++
      Seq.fill(10)(("a", "y")) ++ Seq.fill(10)(("b", "y"))
    val r = Robust.chi2Independence(rows.toDF("u", "v"),
      col("u"), col("v")).collect()(0)
    assert(r.getAs[Long]("df") == 1)
    assert(r.getAs[Double]("chi2") == 0.0)
  }

  test("Robust.chi2Independence matches the textbook 2x2 formula") {
    // 2x2 with counts a=10 b=20 c=30 d=40:
    // chi2 = n(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)) = 100*(400-600)^2/...
    val rows = Seq.fill(10)(("r1", "c1")) ++ Seq.fill(20)(("r1", "c2")) ++
      Seq.fill(30)(("r2", "c1")) ++ Seq.fill(40)(("r2", "c2"))
    val r = Robust.chi2Independence(rows.toDF("u", "v"),
      col("u"), col("v")).collect()(0)
    val expected = 100.0 * math.pow(10.0 * 40 - 20.0 * 30, 2) /
      (30.0 * 70.0 * 40.0 * 60.0)
    assert(math.abs(r.getAs[Double]("chi2") - expected) < 1e-3)
    // absent cells complete: drop one cell entirely, chi2 still defined
    val sparse = (Seq.fill(10)(("r1", "c1")) ++ Seq.fill(10)(("r2", "c1"))
      ++ Seq.fill(10)(("r2", "c2"))).toDF("u", "v")
    val r2 = Robust.chi2Independence(sparse, col("u"), col("v"))
      .collect()(0)
    assert(r2.getAs[Long]("df") == 1 && r2.getAs[Double]("chi2") > 0)
  }

  // ---- mergeable exact quantiles -----------------------------------

  test("Drift.quantilesFromCounts: lower-rank quantiles, merge-invariant") {
    val xs = (1 to 100).map(_.toDouble)
    val df = xs.toDF("x")
    val counts = Drift.valueCounts(df, col("x"))
    val q = Drift.quantilesFromCounts(counts, Seq(0.5, 0.9, 1.0),
      nBlocks = 4).orderBy("q").collect()
    assert(q.map(_.getAs[Double]("v")).toSeq == Seq(50.0, 90.0, 100.0))
    // merging two disjoint halves gives identical quantiles
    val merged = Drift.mergeValueCounts(
      Drift.valueCounts(df.filter(col("x") <= 41), col("x")),
      Drift.valueCounts(df.filter(col("x") > 41), col("x")))
    val q2 = Drift.quantilesFromCounts(merged, Seq(0.5, 0.9, 1.0),
      nBlocks = 4).orderBy("q").collect()
    assert(q2.map(_.getAs[Double]("v")).toSeq == Seq(50.0, 90.0, 100.0))
    // duplicated mass shifts ranks correctly: 90 ones and 10 twos
    val skew = (Seq.fill(90)(1.0) ++ Seq.fill(10)(2.0)).toDF("x")
    val q3 = Drift.quantilesFromCounts(
      Drift.valueCounts(skew, col("x")), Seq(0.5, 0.95)).orderBy("q")
      .collect()
    assert(q3(0).getAs[Double]("v") == 1.0)
    assert(q3(1).getAs[Double]("v") == 2.0)
  }

  test("Drift.quantilesFromCountsBy == per-group quantilesFromCounts " +
    "(the one-pass RFM consolidation)") {
    // three deliberately different distributions under one tag column —
    // the qO1 shape (r/f/m metric dims), including a one-block group
    // (all-equal values) and a skewed group
    val gvs = (1 to 100).map(i => ("a", i.toDouble)) ++
      (1 to 50).map(_ => ("b", 7.0)) ++
      (Seq.fill(90)(1.0) ++ Seq.fill(10)(2.0)).map(("c", _))
    val counts = gvs.toDF("g", "v")
      .groupBy("g", "v").agg(count(lit(1)).as("cnt"))
    val qs = Seq(0.2, 0.5, 0.95, 1.0)
    val grouped = Drift.quantilesFromCountsBy(counts, qs, nBlocks = 4)
      .orderBy("g", "q").collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Double]("q"),
        r.getAs[Long]("target_rank"), r.getAs[Double]("v"))).toSeq
    val single = Seq("a", "b", "c").flatMap { g =>
      Drift.quantilesFromCounts(
        counts.filter(col("g") === g).select("v", "cnt"), qs,
        nBlocks = 4)
        .orderBy("q").collect()
        .map(r => (g, r.getAs[Double]("q"),
          r.getAs[Long]("target_rank"), r.getAs[Double]("v"))).toSeq
    }
    assert(grouped == single)
  }

  // ---- logistic regression -----------------------------------------

  test("LogReg.gradStepFromZero computes the exact half-sum gradient") {
    // two features, labels: y=1 rows contribute -x, y=0 rows +x
    val df = Seq((4L, 2L, true), (2L, 6L, false), (8L, 4L, true))
      .toDF("f1", "f2", "y")
    val r = LogReg.gradStepFromZero(df,
      Seq("f1" -> col("f1"), "f2" -> col("f2")), col("y"), lr = 1.0)
      .orderBy("feature").collect()
    // s_f1 = -4 + 2 - 8 = -10; s_f2 = -2 + 6 - 4 = 0; s_b = -1
    val by = r.map(x => x.getAs[String]("feature") ->
      x.getAs[Long]("s_int")).toMap
    assert(by("f1") == -10L && by("f2") == 0L && by("__intercept") == -1L)
    val g = r.map(x => x.getAs[String]("feature") ->
      x.getAs[Double]("grad")).toMap
    assert(math.abs(g("f1") - (-10.0 * 0.5 / 3)) < 1e-6)
    assert(g("f2") == 0.0)
  }

  test("LogReg.train separates linearly separable data and lowers loss") {
    val pos = (1 to 40).map(i => (10.0 + (i % 7), true))
    val neg = (1 to 40).map(i => (-10.0 - (i % 5), false))
    val df = (pos ++ neg).toDF("x", "y")
    val feats = Seq("x" -> col("x"))
    val (l0, _) = LogReg.lossAndAccuracy(df, feats, col("y"),
      Array(0.0), 0.0)
    val (w, b) = LogReg.train(df, feats, col("y"), lr = 0.5, iters = 30)
    val (l1, acc) = LogReg.lossAndAccuracy(df, feats, col("y"), w, b)
    assert(l1 < l0, s"loss must decrease: $l0 -> $l1")
    assert(acc == 1.0, s"separable data must classify perfectly: $acc")
    assert(w(0) > 0, "weight sign must follow the separation direction")
  }

  // ---- Fellegi-Sunter ----------------------------------------------

  test("Linkage.score: agreement adds evidence, decisions follow thresholds") {
    val pairs = Seq(
      (1L, 2L, "en", "en", "a", "a"),   // both agree
      (3L, 4L, "en", "de", "a", "a"),   // one agrees
      (5L, 6L, "en", "de", "a", "b"))   // none agree
      .toDF("id_a", "id_b", "l_a", "l_b", "s_a", "s_b")
    val fields = Seq(
      Linkage.Field("lang", col("l_a") === col("l_b"), 0.9, 0.3),
      Linkage.Field("src", col("s_a") === col("s_b"), 0.8, 0.2))
    // scores: both agree = log2(3)+2 = 3.585; lang-disagree+src-agree
    // = log2(1/7)+2 = -0.807; none = -2.807-2 = -4.807
    val r = Linkage.score(pairs, fields, upper = 2.5, lower = -1.0)
      .orderBy("id_a").collect()
    val wl = fields(0); val ws = fields(1)
    assert(math.abs(r(0).getAs[Double]("score") -
      (wl.wAgree + ws.wAgree)) < 1e-9)
    assert(r(0).getAs[String]("decision") == "match")
    assert(r(1).getAs[String]("decision") == "possible")
    assert(r(2).getAs[String]("decision") == "non_match")
    // weights: agreement positive, disagreement negative, snapped 6dp
    assert(wl.wAgree > 0 && wl.wDisagree < 0)
    assert(wl.wAgree == math.floor(
      math.log(0.9 / 0.3) / math.log(2.0) * 1e6 + 0.5) / 1e6)
  }

  test("Linkage.Field rejects degenerate m/u") {
    intercept[IllegalArgumentException] {
      Linkage.Field("bad", lit(true), m = 0.2, u = 0.5) } // m <= u
    intercept[IllegalArgumentException] {
      Linkage.Field("bad", lit(true), m = 1.0, u = 0.5) } // m not in (0,1)
  }

  // ---- hard negatives ----------------------------------------------

  test("Similarity.hardNegatives returns only different-label neighbors") {
    // 2-d vectors: anchors id 0 (label 0); same-label near-dup id 1
    // must NOT appear; different-label ids rank by cosine.
    val vs = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.99f, 0.1f), 0),   // same label — excluded
      (2L, Array(0.9f, 0.4f), 1),    // closest different-label
      (3L, Array(0.0f, 1.0f), 1),    // orthogonal
      (4L, Array(0.7f, 0.7f), 2))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.hardNegatives(vs, "vec_id", "embedding", "label",
      col("vid") === 0, k = 2).orderBy("rank").collect()
    assert(r.map(_.getAs[Long]("cand_id")).toSeq == Seq(2L, 4L))
    assert(r.forall(_.getAs[Int]("label_c") != 0))
    assert(r(0).getAs[Double]("cosine") > r(1).getAs[Double]("cosine"))
  }

  // ---- mutual information / diversity ------------------------------

  test("Info.mutualInformation: independent columns give MI 0, " +
    "determined columns give MI = H") {
    val indep = (for { u <- Seq("a", "b"); v <- Seq("x", "y");
      _ <- 1 to 10 } yield (u, v)).toDF("u", "v")
    val r0 = Info.mutualInformation(indep, col("u"), col("v"))
      .collect()(0)
    assert(r0.getAs[Double]("mi") == 0.0)
    assert(r0.getAs[Double]("nmi") == 0.0)
    // v fully determined by u: MI = H(U) = H(V) = ln 2, NMI = 1
    val det = (Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "y")))
      .toDF("u", "v")
    val r1 = Info.mutualInformation(det, col("u"), col("v")).collect()(0)
    assert(math.abs(r1.getAs[Double]("mi") - math.log(2.0)) < 1e-5)
    assert(math.abs(r1.getAs[Double]("nmi") - 1.0) < 1e-5)
    // constant column: H = 0 -> NMI null, MI 0
    val const = Seq.fill(10)(("a", "x")).toDF("u", "v")
    val r2 = Info.mutualInformation(const, col("u"), col("v"))
      .collect()(0)
    assert(r2.getAs[Double]("mi") == 0.0)
    assert(r2.isNullAt(r2.fieldIndex("nmi")))
  }

  test("Info.diversityIndices: uniform mix maxes entropy, constant zeroes it") {
    val uniform = (1 to 4).flatMap(i => Seq.fill(25)(s"s$i")).toDF("s")
    val r = Info.diversityIndices(uniform, col("s")).collect()(0)
    assert(math.abs(r.getAs[Double]("shannon") - math.log(4.0)) < 1e-5)
    assert(math.abs(r.getAs[Double]("simpson") - 0.25) < 1e-9)
    assert(math.abs(r.getAs[Double]("effective_levels") - 4.0) < 1e-3)
    val const = Seq.fill(10)("only").toDF("s")
    val r2 = Info.diversityIndices(const, col("s")).collect()(0)
    assert(r2.getAs[Double]("shannon") == 0.0)
    assert(r2.getAs[Double]("effective_levels") == 1.0)
  }

  test("Info.giniCoefficient: equal values -> 0; known split by hand") {
    val eq = Seq.fill(10)(5.0).toDF("x")
    val r0 = Info.giniCoefficient(eq, col("x")).collect()(0)
    assert(r0.getAs[Double]("gini") == 0.0)
    // x = (1,1,1,1,6): T=10, sorted ranks 1..5,
    // S = 1+2+3+4+5*6 = 40 -> G = (80 - 6*10)/(5*10) = 0.4
    val hand = Seq(1.0, 1.0, 1.0, 1.0, 6.0).toDF("x")
    val r1 = Info.giniCoefficient(hand, col("x"), nBlocks = 2)
      .collect()(0)
    assert(math.abs(r1.getAs[Double]("gini") - 0.4) < 1e-9)
    assert(r1.getAs[Double]("total") == 10.0)
  }

  // ---- two-proportion z / IQR fences / weekday profile -------------

  test("Robust.twoProportionZ matches the hand formula") {
    val a = (Seq.fill(30)(true) ++ Seq.fill(70)(false)).toDF("s")
    val b = (Seq.fill(10)(true) ++ Seq.fill(90)(false)).toDF("s")
    val r = Robust.twoProportionZ(a, b, col("s")).collect()(0)
    assert(r.getAs[Long]("n_a") == 100 && r.getAs[Long]("conv_a") == 30)
    val pp = 40.0 / 200.0
    val z = (0.3 - 0.1) / math.sqrt(pp * (1 - pp) * (2.0 / 100.0))
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-3)
  }

  test("Robust.chi2Independence reports Cramér's V and guards 1xC tables") {
    val rows = Seq.fill(10)(("r1", "c1")) ++ Seq.fill(20)(("r1", "c2")) ++
      Seq.fill(30)(("r2", "c1")) ++ Seq.fill(40)(("r2", "c2"))
    val r = Robust.chi2Independence(rows.toDF("u", "v"),
      col("u"), col("v")).collect()(0)
    val v = math.sqrt(r.getAs[Double]("chi2") / 100.0)
    assert(math.abs(r.getAs[Double]("cramers_v") - v) < 1e-3)
    // single-row-level table: df = 0, V undefined (null), no ANSI error
    val flat = Seq.fill(10)(("only", "c1")) ++ Seq.fill(10)(("only", "c2"))
    val r2 = Robust.chi2Independence(flat.toDF("u", "v"),
      col("u"), col("v")).collect()(0)
    assert(r2.getAs[Long]("df") == 0)
    assert(r2.isNullAt(r2.fieldIndex("cramers_v")))
  }

  test("Robust.iqrOutliers flags only fence-crossers") {
    // group g: 1..100 plus one far outlier each side
    val vals = (1 to 100).map(_.toDouble) ++ Seq(-1000.0, 1000.0)
    val df = vals.map(("g", _)).toDF("grp", "x")
    val r = Robust.iqrOutliers(df, Seq("grp"), "x").collect()(0)
    assert(r.getAs[Long]("n") == 102)
    assert(r.getAs[Long]("n_low") == 1)
    assert(r.getAs[Long]("n_high") == 1)
    assert(r.getAs[Double]("iqr") > 0)
  }

  test("Trend.weekdayProfile buckets by ISO weekday with exact means") {
    // 2024-01-01 is a Monday
    val df = Seq(
      (1L, ts(1), 10.0), (2L, ts(1, 14), 20.0),  // Mon: mean 15
      (3L, ts(2), 30.0),                          // Tue: mean 30
      (4L, ts(8), 40.0))                          // next Mon
      .toDF("event_id", "ts", "value")
    val r = Trend.weekdayProfile(df, "ts", col("value"))
      .orderBy("dow").collect()
    assert(r.map(_.getAs[Long]("dow")).toSeq == Seq(1L, 2L))
    val mon = r(0)
    assert(mon.getAs[Long]("n_events") == 3)
    assert(mon.getAs[Long]("n_days") == 2)
    assert(math.abs(mon.getAs[Double]("mean_value") - 70.0 / 3) < 1e-3)
    // grand mean = 25; Tue index = 30/25 = 1.2
    assert(math.abs(r(1).getAs[Double]("seasonal_idx") - 1.2) < 1e-9)
  }

  // ---- SPRT / isotonic ---------------------------------------------

  test("Timeseries.sprtDaily: H1 evidence crosses the upper boundary " +
    "and latches") {
    // p0=0.1 vs p1=0.5: 20 successes/day out of 20 piles up evidence
    // fast; boundary ln(0.95/0.05) ~ 2.944
    val rows = (1 to 5).flatMap { d =>
      (1 to 20).map(i => (d.toLong * 100 + i, ts(d), true)) }
    val df = rows.toDF("event_id", "ts", "ok")
    val r = graft.operators.Timeseries.sprtDaily(df, "ts", col("ok"),
      p0 = 0.1, p1 = 0.5, alpha = 0.05, beta = 0.05)
      .orderBy("day").collect()
    // day 1 alone: 20*ln(5) ~ 32 >> 2.944 -> accept_h1 from day 1 on
    assert(r.forall(_.getAs[String]("decision") == "accept_h1"))
    val (ws, _, up, _) = graft.operators.Timeseries.sprtWeights(
      0.1, 0.5, 0.05, 0.05)
    assert(math.abs(r(0).getAs[Double]("llr") - 20 * ws) < 1e-4)
    assert(r(0).getAs[Double]("cum_llr") > up)
  }

  test("Timeseries.sprtDaily: H0 evidence crosses the lower boundary; " +
    "a later rebound cannot unlatch it") {
    // days 1-3: zero conversions (strong H0); days 4-5: all conversions
    val rows =
      (1 to 3).flatMap(d => (1 to 30).map(i =>
        (d.toLong * 100 + i, ts(d), false))) ++
      (4 to 5).flatMap(d => (1 to 30).map(i =>
        (d.toLong * 100 + i, ts(d), true)))
    val df = rows.toDF("event_id", "ts", "ok")
    val r = graft.operators.Timeseries.sprtDaily(df, "ts", col("ok"),
      p0 = 0.2, p1 = 0.6, alpha = 0.05, beta = 0.05)
      .orderBy("day").collect()
    assert(r(0).getAs[String]("decision") == "accept_h0")
    // the rebound days flip the raw cum LLR positive, but the decision
    // stays latched at the FIRST crossing
    assert(r.last.getAs[String]("decision") == "accept_h0")
    assert(r.last.getAs[Double]("cum_llr") >
      r(2).getAs[Double]("cum_llr"))
  }

  test("Timeseries.sprtDaily ignores null timestamps (no null day " +
    "row whose window position is engine-dependent)") {
    val rows = (1 to 2).flatMap(d => (1 to 10).map(i =>
      (d.toLong * 100 + i, ts(d), true))) :+
      (999L, null.asInstanceOf[java.sql.Timestamp], true)
    val df = rows.toDF("event_id", "ts", "ok")
    val r = graft.operators.Timeseries.sprtDaily(df, "ts", col("ok"),
      p0 = 0.1, p1 = 0.5, alpha = 0.05, beta = 0.05)
      .orderBy("day").collect()
    assert(r.length == 2, s"null ts must not create a day row: " +
      r.mkString(","))
    assert(r.forall(!_.isNullAt(0)))
    assert(r.forall(_.getAs[Long]("n") == 10))
  }

  test("Eval.isotonicBlocks pools the classic 1,0,0,1 violation") {
    val df = Seq((1.0, true), (2.0, false), (3.0, false), (4.0, true))
      .toDF("s", "y")
    val blocks = Eval.isotonicBlocks(df, col("s"), col("y"))
    assert(blocks.map(b => (b.lo, b.hi, b.cnt, b.pos)) ==
      Seq((1.0, 3.0, 3L, 1L), (4.0, 4.0, 1L, 1L)))
    assert(math.abs(blocks(0).p - 1.0 / 3) < 1e-12)
    // fitted table is nondecreasing in s
    val fit = Eval.isotonicFit(df, col("s"), col("y"))
      .orderBy("s").collect().map(_.getAs[Double]("p_fit"))
    assert(fit.sliding(2).forall(w => w(0) <= w(1)))
  }

  test("Eval.isotonicApplyExpr clamps outside the fitted range") {
    val blocks = Seq(Eval.IsoBlock(1.0, 3.0, 3L, 1L),
      Eval.IsoBlock(4.0, 4.0, 1L, 1L))
    val scored = Seq(0.0, 2.0, 3.5, 9.0).toDF("s")
      .select(col("s"),
        Eval.isotonicApplyExpr(blocks, col("s")).as("p"))
      .orderBy("s").collect().map(_.getAs[Double]("p"))
    // below range -> first block's rate; between blocks -> next block
    // boundary rule of the CASE chain (<= hi picks the first block only
    // up to 3.0); above -> last rate
    assert(math.abs(scored(0) - 1.0 / 3) < 1e-12)
    assert(math.abs(scored(1) - 1.0 / 3) < 1e-12)
    assert(scored(2) == 1.0 && scored(3) == 1.0)
  }

  // ---- graph: label propagation / clustering coefficient -----------

  private lazy val handEdges = Seq(
    // triangle 1-2-3, pendant 4 off 3, isolated 5 in the node set
    (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    .toDF("src", "dst")

  test("Graph.labelPropStep: majority vote, min-label tie, seeds survive") {
    val nodes = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None),
      (4L, None), (5L, None))
      .toDF("node", "lbl")
    val r = Graph.labelPropStep(nodes, "node", "lbl",
      handEdges, "src", "dst").orderBy("node").collect()
    val byNode = r.map(x => x.getLong(0) ->
      Option(x.getAs[String]("label"))).toMap
    // node 3 neighbors: 1(a), 2(b), 4(null) -> tie {a,b} -> min "a"
    assert(byNode(3L) == Some("a"))
    // node 4's only neighbor (3) is unlabeled -> stays null
    assert(byNode(4L) == None)
    // isolated node 5 stays null; seeds keep their labels
    assert(byNode(5L) == None)
    assert(byNode(1L) == Some("a") && byNode(2L) == Some("b"))
    assert(r.filter(_.getAs[Boolean]("seeded")).map(_.getLong(0))
      .toSet == Set(1L, 2L))
  }

  test("Graph.labelPropagate reaches the pendant in two rounds") {
    val nodes = Seq(
      (1L, Some("a")), (2L, Some("a")), (3L, None),
      (4L, None), (5L, None)).toDF("node", "lbl")
    val r = Graph.labelPropagate(nodes, "node", "lbl",
      handEdges, "src", "dst", iters = 2).orderBy("node").collect()
    val byNode = r.map(x => x.getLong(0) ->
      Option(x.getAs[String]("label"))).toMap
    assert(byNode(3L) == Some("a"))
    assert(byNode(4L) == Some("a"), "round 2 must reach the pendant")
    assert(byNode(5L) == None)
  }

  test("Graph.clusteringCoefficient: closed triangle 1, pendant null") {
    val nodes = (1L to 5L).toDF("node")
    val r = Graph.clusteringCoefficient(nodes, "node",
      handEdges, "src", "dst").orderBy("node").collect()
    // nodes 1,2: deg 2, 1 triangle -> cc = 1
    assert(r(0).getAs[Double]("cc") == 1.0)
    assert(r(1).getAs[Double]("cc") == 1.0)
    // node 3: deg 3, 1 triangle of 3 possible wedge pairs -> 1/3
    assert(math.abs(r(2).getAs[Double]("cc") - 1.0 / 3) < 1e-6)
    // pendant 4 (deg 1) and isolated 5 (deg 0): undefined
    assert(r(3).isNullAt(r(3).fieldIndex("cc")))
    assert(r(4).isNullAt(r(4).fieldIndex("cc")))
    assert(r(4).getAs[Long]("deg") == 0)
  }

  test("Graph.kcore: triangle survives 2-core, chain dissolves") {
    // triangle 1-2-3 + chain 3-4-5: after peeling, only the triangle
    // remains in the 2-core (4 and 5 peel in cascading rounds)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val nodes = (1L to 6L).toDF("node") // 6 isolated
    val r = Graph.kcore(nodes, "node", edges, "src", "dst", k = 2)
      .orderBy("node").collect()
    val in = r.filter(_.getAs[Boolean]("in_kcore")).map(_.getLong(0))
    assert(in.toSet == Set(1L, 2L, 3L))
    // the first step alone would KEEP node 4 (deg 2: edges to 3 and 5)
    // — peeling must cascade, which is the reason for the loop
    val step1 = Graph.kcoreStep(nodes, "node", edges, "src", "dst", 2)
      .filter(col("survives")).collect().map(_.getLong(0))
    assert(step1.toSet == Set(1L, 2L, 3L, 4L))
  }

  // ---- feature hashing / decayed aggregates ------------------------

  test("TextAnalysis.featureHash: counts collide into dims buckets") {
    val df = Seq((0L, "a b a c"), (1L, "a a a a")).toDF("doc_id", "text")
    val r = TextAnalysis.featureHash(df, "doc_id", "text", dims = 8)
      .orderBy("doc_id", "f_idx").collect()
    // doc 1 is a single token repeated: exactly one bucket, cnt 4
    val d1 = r.filter(_.getLong(0) == 1L)
    assert(d1.length == 1 && d1(0).getAs[Long]("cnt") == 4)
    // doc 0 total mass = 4 tokens across its buckets
    assert(r.filter(_.getLong(0) == 0L).map(_.getAs[Long]("cnt")).sum == 4)
    // indices land in [0, dims)
    assert(r.forall(x => x.getAs[Long]("f_idx") >= 0 &&
      x.getAs[Long]("f_idx") < 8))
  }

  test("Timeseries.decayedDaily: anchor day weighs 1, older days decay") {
    // one group; days 1 and 8 with half-life 7 -> old day weight 0.5
    val df = Seq(
      (1L, ts(1), 10.0), (2L, ts(1), 10.0),  // day 1: n=2, sum=20
      (3L, ts(8), 40.0))                      // day 8 (anchor): n=1
      .toDF("event_id", "ts", "value")
    val r = graft.operators.Timeseries.decayedDaily(df, Seq.empty,
      "ts", col("value"), halfLifeDays = 7.0).collect()(0)
    assert(r.getAs[Long]("n_days") == 2)
    assert(r.getAs[Long]("n_events") == 3)
    // decayed_n = 2*0.5 + 1*1 = 2; decayed_sum = 20*0.5 + 40 = 50
    assert(math.abs(r.getAs[Double]("decayed_n") - 2.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("decayed_sum") - 50.0) < 1e-3)
  }

  // ---- seasonal naive / QQ table -----------------------------------

  test("Trend.seasonalNaiveError: perfect weekly cycle has zero error") {
    // 14 days, value = 10 + dow pattern repeating weekly
    val vals = (1 to 14).map(d => 10.0 + (d % 7))
    val r = Trend.seasonalNaiveError(dailySeries(vals), "ts",
      col("value")).collect()(0)
    assert(r.getAs[Long]("n_forecast") == 7)
    assert(r.getAs[Double]("mae") == 0.0)
    assert(r.getAs[Double]("mape") == 0.0)
  }

  test("Trend.seasonalNaiveError: constant offset gives exact MAE/MAPE") {
    // week 2 = week 1 + 2.0 -> MAE 2, MAPE = mean(2/act)
    val w1 = Seq(10.0, 20.0, 10.0, 20.0, 10.0, 20.0, 10.0)
    val vals = w1 ++ w1.map(_ + 2.0)
    val r = Trend.seasonalNaiveError(dailySeries(vals), "ts",
      col("value")).collect()(0)
    assert(r.getAs[Double]("mae") == 2.0)
    val acts = w1.map(_ + 2.0)
    val mape = acts.map(a => 2.0 / a).sum / 7 * 100.0
    assert(math.abs(r.getAs[Double]("mape") - mape) < 1e-3)
  }

  test("Drift.qqTable lines up matched quantiles with gaps") {
    val a = Drift.valueCounts((1 to 100).map(_.toDouble).toDF("x"),
      col("x"))
    val b = Drift.valueCounts((1 to 100).map(_ + 10.0).toDF("x"),
      col("x"))
    val r = Drift.qqTable(a, b, Seq(0.5, 0.9), nBlocks = 4)
      .orderBy("q").collect()
    assert(r.map(_.getAs[Double]("v_a")).toSeq == Seq(50.0, 90.0))
    assert(r.map(_.getAs[Double]("v_b")).toSeq == Seq(60.0, 100.0))
    assert(r.forall(_.getAs[Double]("gap") == 10.0))
  }

  // ---- conformal / end-to-end gate ---------------------------------

  test("Eval.splitConformal: coverage honors the rank guarantee") {
    // one group, calibration values 0..99 around mean ~49.5, test
    // drawn from the same range -> coverage must be >= 0.9-ish
    // pair layout: ids 2k (calibration) and 2k+1 (test) share the same
    // value, so both halves see identical residual distributions
    val rows = (0 until 200).map(i =>
      (i.toLong, "g", ((i / 2) % 100).toDouble))
    val df = rows.toDF("event_id", "g", "x")
    val r = Eval.splitConformal(df, col("g"), col("x"),
      col("event_id") % 2 === 0, alpha = 0.1).collect()(0)
    assert(r.getAs[Long]("n_cal") == 100)
    assert(r.getAs[Long]("n_test") == 100)
    val cov = r.getAs[Double]("coverage")
    assert(cov >= 0.85 && cov <= 1.0, s"coverage $cov")
    // alpha = 0 corner is clamped to the max residual -> full coverage
    // on identically-distributed halves
    val r2 = Eval.splitConformal(df, col("g"), col("x"),
      col("event_id") % 2 === 0, alpha = 0.001).collect()(0)
    assert(r2.getAs[Double]("coverage") == 1.0)
    assert(r2.getAs[Double]("qhat") >= r.getAs[Double]("qhat"))
  }

  test("Eval.splitConformalBy: per-group q-hats reflect group spread") {
    // tight group vs wide group, same pair layout as the global test
    val rows = (0 until 400).map { i =>
      val g = if (i < 200) "tight" else "wide"
      val spread = if (g == "tight") 10 else 100
      (i.toLong, g, ((i / 2) % spread).toDouble)
    }
    val df = rows.toDF("event_id", "g", "x")
    val r = Eval.splitConformalBy(df, col("g"), col("x"),
      col("event_id") % 2 === 0, alpha = 0.1)
      .orderBy("g").collect()
    val byG = r.map(x => x.getAs[String]("g") -> x).toMap
    assert(byG("wide").getAs[Double]("qhat") >
      byG("tight").getAs[Double]("qhat"),
      "wider group must get the wider interval")
    r.foreach { row =>
      val cov = row.getAs[Double]("coverage")
      assert(cov >= 0.85 && cov <= 1.0,
        s"${row.getAs[String]("g")}: coverage $cov") }
  }

  test("Privacy.tCloseness: matching class ~0, concentrated class far") {
    // global: values 1,2,3 uniform. class "bal" mirrors it; class
    // "skew" sits entirely on value 3.
    val rows =
      Seq.fill(10)(("bal", 1.0)) ++ Seq.fill(10)(("bal", 2.0)) ++
      Seq.fill(10)(("bal", 3.0)) ++ Seq.fill(30)(("skew", 3.0))
    val r = Privacy.tCloseness(rows.toDF("g", "v"),
      Seq("g" -> col("g")), col("v"), t = 0.3)
      .orderBy("g").collect()
    val byG = r.map(x => x.getAs[String]("g") ->
      x.getAs[Double]("emd")).toMap
    // global shares: (1/6, 1/6, 2/3). bal = (1/3,1/3,1/3):
    // cum diffs: 1/6, 1/3 -> emd = (1/6+1/3)/2 = 0.25
    assert(math.abs(byG("bal") - 0.25) < 1e-6)
    // skew = (0,0,1): cum diffs: 1/6, 1/3 ... wait — |0-1/6|, |0-1/3|
    // -> emd = 0.25 as well by symmetry of this fixture; use the
    // close flags to separate: both emds equal, threshold splits none.
    // Stronger check: a class equal to the global mix has emd 0.
    val rows2 = Seq.fill(6)(("a", 1.0)) ++ Seq.fill(6)(("a", 2.0)) ++
      Seq.fill(6)(("b", 1.0)) ++ Seq.fill(6)(("b", 2.0))
    val r2 = Privacy.tCloseness(rows2.toDF("g", "v"),
      Seq("g" -> col("g")), col("v"), t = 0.1).collect()
    assert(r2.forall(_.getAs[Double]("emd") == 0.0))
    assert(r2.forall(_.getAs[Boolean]("close")))
  }

  test("end-to-end: hash features -> train LR -> calibrate -> gate") {
    // Synthetic corpus where label = contains the token "good".
    // featureHash feeds LogReg.train; the trained gate separates; the
    // isotonic fit of the gate margin is monotone.
    val docs = (0 until 60).map { i =>
      val good = i % 2 == 0
      val text = if (good) s"good solid doc number $i with signal"
        else s"junk noisy doc number $i without it"
      (i.toLong, text, good)
    }.toDF("doc_id", "text", "y")
    val feats = TextAnalysis.featureHash(docs, "doc_id", "text", 16)
      .groupBy("doc_id")
      .pivot("f_idx", (0 until 16).map(_.toString))
      .sum("cnt").na.fill(0L)
    val joined = feats.join(docs.select("doc_id", "y"), "doc_id")
    val featCols = (0 until 16).map(i => i.toString -> col(s"`$i`"))
    val (w, b) = LogReg.train(joined, featCols, col("y"),
      lr = 0.5, iters = 40)
    val (_, acc) = LogReg.lossAndAccuracy(joined, featCols, col("y"),
      w, b)
    assert(acc == 1.0, s"hashed-feature LR must separate: acc $acc")
    // margin as a score; PAV calibration of margin deciles is monotone
    val margin = featCols.zipWithIndex
      .map { case ((_, c), j) => c.cast("double") * w(j) }
      .foldLeft(lit(b))(_ + _)
    val scored = joined.select(floor(margin).as("s_bin"), col("y"))
    val blocks = Eval.isotonicBlocks(scored, col("s_bin"), col("y"))
    assert(blocks.map(_.p).sliding(2).forall(
      p => p.length < 2 || p(0) < p(1)))
    assert(blocks.head.p < 0.5 && blocks.last.p > 0.5,
      "calibrated rates must span the decision boundary")
  }

  // ---- FS EM fit ---------------------------------------------------

  test("Linkage.emFit recovers planted m/u from synthetic patterns") {
    // THREE fields: the FS mixture is just-identified at k=3
    // (1+3+3 = 7 params vs 2^3−1 = 7 free pattern frequencies); the
    // classic 2-field setup is under-identified and EM drifts.
    // Plant p=0.2, m=(0.95, 0.8, 0.9), u=(0.3, 0.1, 0.2): exact
    // expected pattern counts under conditional independence.
    val (p0, m0, u0) =
      (0.2, Seq(0.95, 0.8, 0.9), Seq(0.3, 0.1, 0.2))
    val n = 10000000L
    val patterns = for {
      a1 <- Seq(true, false); a2 <- Seq(true, false)
      a3 <- Seq(true, false)
    } yield {
      val g = Seq(a1, a2, a3)
      val pm = g.zipWithIndex.map { case (a, f) =>
        if (a) m0(f) else 1 - m0(f) }.product * p0
      val pu = g.zipWithIndex.map { case (a, f) =>
        if (a) u0(f) else 1 - u0(f) }.product * (1 - p0)
      (g, math.round((pm + pu) * n))
    }
    val (p, m, u) = Linkage.emFit(patterns, initP = 0.1,
      initM = Seq(0.8, 0.7, 0.75), initU = Seq(0.4, 0.2, 0.3),
      iters = 500)
    assert(math.abs(p - p0) < 0.01, s"p $p")
    (0 to 2).foreach { f =>
      assert(math.abs(m(f) - m0(f)) < 0.02, s"m($f) = ${m(f)}")
      assert(math.abs(u(f) - u0(f)) < 0.02, s"u($f) = ${u(f)}")
    }
  }

  test("Linkage.agreementPatterns counts and collectPatterns round-trips") {
    val pairs = Seq(
      (true, true), (true, true), (true, false), (false, false))
      .toDF("x", "y")
    val df = Linkage.agreementPatterns(pairs,
      Seq("f1" -> col("x"), "f2" -> col("y")))
    val pats = Linkage.collectPatterns(df).toMap
    assert(pats(Seq(true, true)) == 2L)
    assert(pats(Seq(true, false)) == 1L)
    assert(pats(Seq(false, false)) == 1L)
    assert(pats.values.sum == 4L)
  }

  // ---- Brier / kappa / DeLong --------------------------------------

  test("Eval.brierScore: perfect forecasts 0, coin forecasts 0.25") {
    val perfect = Seq((1.0, true), (0.0, false), (1.0, true))
      .toDF("p", "y")
    assert(Eval.brierScore(perfect, col("p"), col("y"))
      .collect()(0).getAs[Double]("brier") == 0.0)
    val coin = Seq((0.5, true), (0.5, false)).toDF("p", "y")
    assert(Eval.brierScore(coin, col("p"), col("y"))
      .collect()(0).getAs[Double]("brier") == 0.25)
  }

  test("Eval.cohenKappa: textbook 2x2 and degenerate guard") {
    // classic example: n11=20, n10=5, n01=10, n00=15 -> po=0.7,
    // pe = (25*30 + 25*20)/2500 = 0.5, kappa = 0.4
    val rows = Seq.fill(20)((true, true)) ++ Seq.fill(5)((true, false)) ++
      Seq.fill(10)((false, true)) ++ Seq.fill(15)((false, false))
    val r = Eval.cohenKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .collect()(0)
    assert(r.getAs[Double]("po") == 0.7)
    assert(r.getAs[Double]("pe") == 0.5)
    assert(r.getAs[Double]("kappa") == 0.4)
    // constant raters agree everywhere by chance: pe = 1 -> null
    val const = Seq.fill(10)((true, true)).toDF("a", "b")
    val r2 = Eval.cohenKappa(const, col("a"), col("b")).collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("kappa")))
  }

  test("Eval.aucDelong: AUC matches binaryAuc; CI brackets it") {
    val rows = (1 to 200).map(i =>
      (i.toDouble + (if (i % 3 == 0) 50 else 0), i % 3 == 0))
    val df = rows.toDF("s", "y")
    val d = Eval.aucDelong(df, col("s"), col("y")).collect()(0)
    val a = Eval.binaryAuc(df, col("s"), col("y")).collect()(0)
    assert(d.getAs[Double]("auc") == a.getAs[Double]("auc"),
      "DeLong AUC must equal the rank-sum AUC")
    assert(d.getAs[Double]("se") > 0)
    assert(d.getAs[Double]("ci95_lo") < d.getAs[Double]("auc"))
    assert(d.getAs[Double]("ci95_hi") > d.getAs[Double]("auc"))
    // a perfect separator has zero placement variance: SE = 0
    val perfect = ((1 to 50).map(i => (i.toDouble, false)) ++
      (51 to 100).map(i => (i.toDouble, true))).toDF("s", "y")
    val dp = Eval.aucDelong(perfect, col("s"), col("y")).collect()(0)
    assert(dp.getAs[Double]("auc") == 1.0 && dp.getAs[Double]("se") == 0.0)
  }

  // ---- inter-arrival / RFM -----------------------------------------

  test("Funnel.interArrival: exact gaps, lower-rank median, min-2 filter") {
    val df = Seq(
      (1L, ts(1, 10)), (1L, ts(1, 12)), (1L, ts(1, 13)), (1L, ts(2, 13)),
      (2L, ts(1)),                       // single event -> excluded
      (3L, ts(1, 10)), (3L, ts(1, 10))) // tied timestamps -> gap 0
      .toDF("user_id", "ts")
    val r = Funnel.interArrival(df, "user_id", "ts")
      .orderBy("user_id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    val u1 = r(0)
    // gaps: 2h, 1h, 24h -> sorted (3600, 7200, 86400)
    assert(u1.getAs[Long]("median_gap_s") == 7200L)
    assert(u1.getAs[Long]("max_gap_s") == 86400L)
    assert(math.abs(u1.getAs[Double]("mean_gap_s") -
      (3600.0 + 7200 + 86400) / 3) < 1e-6)
    assert(r(1).getAs[Long]("median_gap_s") == 0L)
  }

  test("Rfm.segment: quintile scores follow the metric order") {
    // 10 users, user u has u events of value u*10 on day u
    val rows = (1 to 10).flatMap { u =>
      (1 to u).map(i => (u.toLong, ts(u), u * 10.0)) }
    val df = rows.toDF("user_id", "ts", "value")
    val r = graft.operators.Rfm.segment(df, "user_id", "ts",
      col("value")).orderBy("user_id").collect()
    val byU = r.map(x => x.getLong(0) -> x).toMap
    // user 10: most recent (day 10 anchor), most frequent, biggest
    assert(byU(10L).getAs[Int]("r_score") == 5)
    assert(byU(10L).getAs[Int]("f_score") == 5)
    assert(byU(10L).getAs[Int]("m_score") == 5)
    assert(byU(10L).getAs[String]("segment") == "555")
    // user 1: oldest, least frequent, smallest
    assert(byU(1L).getAs[Int]("r_score") == 1)
    assert(byU(1L).getAs[Int]("f_score") == 1)
    assert(byU(1L).getAs[String]("segment") == "111")
    // monotone scores along the construction
    val f = (1 to 10).map(u => byU(u.toLong).getAs[Int]("f_score"))
    assert(f.sliding(2).forall(p => p(0) <= p(1)))
  }

  // ---- survival ------------------------------------------------------

  test("Survival.kaplanMeier matches the textbook small example") {
    // durations/events: 1+, 2, 2, 3+, 4 ( + = censored ): classic KM
    // t=2: n=4 (1 left at t=1 censored), d=2 -> S = 1*(1-2/4) = .5
    // t=4: n=1, d=1 -> S = .5 * (1-1/1) = 0
    val df = Seq((1L, false), (2L, true), (2L, true), (3L, false),
      (4L, true)).toDF("dur", "ev")
    val r = Survival.kaplanMeier(df, col("dur"), col("ev"))
      .orderBy("t").collect()
    val byT = r.map(x => x.getLong(0) -> x).toMap
    assert(byT(1L).getAs[Long]("n_risk") == 5)
    assert(byT(1L).getAs[Double]("survival") == 1.0) // censor only
    assert(byT(2L).getAs[Long]("n_risk") == 4)
    assert(byT(2L).getAs[Double]("survival") == 0.5)
    assert(byT(3L).getAs[Double]("survival") == 0.5) // censor only
    assert(byT(4L).getAs[Long]("n_risk") == 1)
    assert(byT(4L).getAs[Double]("survival") == 0.0)
    // Nelson-Aalen: H(2) = 0 + 2/4; H(4) = .5 + 0 + 1/1
    assert(byT(2L).getAs[Double]("cum_hazard") == 0.5)
    assert(byT(4L).getAs[Double]("cum_hazard") == 1.5)
    // survival is nonincreasing, hazard nondecreasing
    val ss = r.map(_.getAs[Double]("survival"))
    assert(ss.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    val hs = r.map(_.getAs[Double]("cum_hazard"))
    assert(hs.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }

  test("Survival.rmst integrates the step curve by hand") {
    // events at t=2 (S: 1 -> .5) and t=4 (S: .5 -> 0), no censoring,
    // tau = 6: area = 1*2 + .5*2 + 0*2 = 3
    val df = Seq((2L, true), (2L, true), (4L, true), (4L, true))
      .toDF("dur", "ev")
    val r = Survival.rmst(df, col("dur"), col("ev"), tau = 6L)
      .collect()(0)
    assert(r.getAs[Long]("tau") == 6L)
    assert(r.getAs[Long]("n_subjects") == 4L)
    assert(r.getAs[Double]("rmst") == 3.0)
    // tau before any event: survival 1 throughout -> rmst = tau
    val r2 = Survival.rmst(df, col("dur"), col("ev"), tau = 1L)
      .collect()(0)
    assert(r2.getAs[Double]("rmst") == 1.0)
    // durations beyond tau stay in the denominator: one event at 2 of
    // four subjects, others survive past tau=3 -> S=.75 after t=2;
    // rmst = 1*2 + .75*1 = 2.75
    val mix = Seq((2L, true), (9L, true), (9L, true), (9L, false))
      .toDF("dur", "ev")
    val r3 = Survival.rmst(mix, col("dur"), col("ev"), tau = 3L)
      .collect()(0)
    assert(r3.getAs[Double]("rmst") == 2.75)
  }

  test("Survival.logRank: identical groups ~0, separated groups large") {
    // identical curves: A and B each (1,2,3 events)
    val same = Seq((1L, true, true), (2L, true, true), (3L, true, true),
      (1L, true, false), (2L, true, false), (3L, true, false))
      .toDF("dur", "ev", "grp")
    val r0 = Survival.logRank(same, col("dur"), col("ev"), col("grp"))
      .collect()(0)
    assert(math.abs(r0.getAs[Double]("z")) < 1e-9)
    assert(math.abs(r0.getAs[Double]("chi2")) < 1e-9)
    // clearly separated: A dies at 1,2,3; B at 11,12,13
    val sep = (Seq(1L, 2L, 3L).map((_, true, true)) ++
      Seq(11L, 12L, 13L).map((_, true, false)))
      .toDF("dur", "ev", "grp")
    val r1 = Survival.logRank(sep, col("dur"), col("ev"), col("grp"))
      .collect()(0)
    assert(r1.getAs[Double]("chi2") > 3.84,
      s"separated curves should clear p<0.05: ${r1.getAs[Double]("chi2")}")
    assert(r1.getAs[Long]("obs_a") == 3)
    assert(r1.getAs[Double]("exp_a") < 3.0)
  }

  test("Robust.cohensD matches the hand pooled-SD formula") {
    val a = Seq(10.0, 12.0, 14.0, 16.0).toDF("x")  // mean 13, var 20/3
    val b = Seq(8.0, 10.0, 12.0).toDF("x")         // mean 10, var 4
    val r = Robust.cohensD(a, b, col("x")).collect()(0)
    assert(r.getAs[Double]("mean_a") == 13.0)
    assert(r.getAs[Double]("mean_b") == 10.0)
    val sp = math.sqrt((3 * 20.0 / 3 + 2 * 4.0) / 5)
    assert(math.abs(r.getAs[Double]("cohens_d") - 3.0 / sp) < 1e-3)
  }

  test("Eval.liftTable: a perfect score ranks all positives into the " +
    "top bands; lift telescopes to 1") {
    // 100 rows, score = i, positives = top 20 scores
    val rows = (1 to 100).map(i => (i.toDouble, i > 80))
    val r = Eval.liftTable(rows.toDF("s", "y"), col("s"), col("y"),
      buckets = 5).orderBy("band").collect()
    assert(r.length == 5)
    // band 1 = top 20 scores: all positive, lift = 1.0/0.2 = 5
    assert(r(0).getAs[Long]("n_pos") == 20)
    assert(r(0).getAs[Double]("resp_rate") == 1.0)
    assert(r(0).getAs[Double]("cum_lift") == 5.0)
    // lower bands: no positives; final cumulative lift is exactly 1
    assert(r.drop(1).forall(_.getAs[Long]("n_pos") == 0))
    assert(r.last.getAs[Double]("cum_lift") == 1.0)
    assert(r.map(_.getAs[Long]("n")).sum == 100)
  }

  // ---- lexical diversity / Zipf ------------------------------------

  test("TextAnalysis.lexicalDiversity: TTR and hapax by hand") {
    val df = Seq((0L, "a a b c"), (1L, "x y z w")).toDF("doc_id", "text")
    val r = TextAnalysis.lexicalDiversity(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 0: 4 tokens, 3 types, hapax {b, c} -> ttr .75, hapax .5
    assert(r(0).getAs[Long]("n_tokens") == 4)
    assert(r(0).getAs[Long]("n_types") == 3)
    assert(r(0).getAs[Double]("ttr") == 0.75)
    assert(r(0).getAs[Double]("hapax_ratio") == 0.5)
    // doc 1: all hapax
    assert(r(1).getAs[Double]("ttr") == 1.0)
    assert(r(1).getAs[Double]("hapax_ratio") == 1.0)
  }

  test("TextAnalysis.zipfSlope recovers a constructed power law") {
    // counts ~ 1000/rank exactly: slope must be ~ -1
    val rows = (1 to 50).flatMap(r => Seq.fill(1000 / r)(s"tok$r"))
    val freq = rows.map(t => (t, 1)).toDF("tok", "one")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val r = TextAnalysis.zipfSlope(freq, 50).collect()(0)
    assert(r.getAs[Long]("k") == 50)
    assert(math.abs(r.getAs[Double]("slope") - (-1.0)) < 0.05,
      s"slope ${r.getAs[Double]("slope")}")
  }
}
