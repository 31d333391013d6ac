package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust-statistics data-quality screens — the outlier-detection
  * member of the monitoring family ([[Drift]]: distribution shift,
  * [[Skew]]: hot keys). Mean/stddev screens break on the exact data
  * they are supposed to catch (a single 10^9 outlier drags the mean);
  * median/MAD have a 50% breakdown point.
  */
object Robust {

  /** Per-group MAD outlier summary: rows whose |x − median| exceeds
    * `c` · MAD (MAD = median of absolute deviations from the group
    * median; c ≈ 3 for the conventional "roughly 4.5σ under
    * normality" screen, via MAD ≈ 0.6745σ).
    *
    * Exact medians (Spark's interpolating `percentile`), not sketches:
    * this is the oracle-checkable screen; the sketch path for
    * quantiles at scale is [[HistSketch]]. Two grouped aggregations +
    * two broadcast-sized joins back (the per-group summary frame is
    * |groups| rows); the detail pass is scan-speed.
    *
    * Output: groupCols..., n, med, mad, n_outliers.
    */
  /** Benford first-significant-digit screen — the aberrant-source
    * detector for naturally-skewed magnitude columns (amounts, counts,
    * durations): genuine multi-scale data follows
    * P(d) = log10(1 + 1/d); fabricated, truncated, or unit-mangled
    * feeds don't. Reported per (group, digit) with the group's
    * chi-square statistic against Benford so a monitor thresholds one
    * number (χ² df=8: > 20.1 ⇒ p < 0.01).
    *
    * The first digit comes from the INTEGER cents string — integer
    * decimal rendering is exact and engine-portable, where
    * floor(x/10^floor(log10 x)) can mis-digit at power-of-ten
    * boundaries under FP log. Zero values carry no leading digit and
    * are excluded (n counts participating rows).
    *
    * Scale: one groupBy to |groups|×9 rows; the digit completion and
    * χ² are bounded-frame operations over that table.
    *
    * Output: groupCols..., digit (1-9), obs_n, n, obs_share,
    * exp_share, chi2 (same value on each of the group's 9 rows).
    */
  def benfordScreen(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = floor(abs(col(valueCol)) * 100 + 0.5).cast("long")
    val base = df.withColumn("__c", cents).filter(col("__c") > 0)
      .withColumn("digit",
        substring(col("__c").cast("string"), 1, 1).cast("int"))
    val counts = base.groupBy((groupCols.map(col) :+ col("digit")): _*)
      .agg(count(lit(1)).as("obs_n"))
    // complete the 1..9 digit frame per group: absent digits are real
    // evidence ((0 − exp)²/exp) and must not vanish from the χ².
    // Exploding a constant sequence off the (aggregated) group list
    // needs no join for the completion — 9 rows per group, no
    // cross-join node in the plan
    val groups = counts.select(groupCols.map(col): _*).distinct()
    val full = groups
      .select((groupCols.map(col) :+
        explode(sequence(lit(1), lit(9))).as("digit")): _*)
      .join(counts, groupCols :+ "digit", "left")
      .withColumn("obs_n", coalesce(col("obs_n"), lit(0L)))
    val w = Window.partitionBy(groupCols.map(col): _*)
    val expShare = log10(lit(1.0) + lit(1.0) / col("digit"))
    full
      .withColumn("n", sum(col("obs_n")).over(w))
      .withColumn("obs_share", col("obs_n") / col("n"))
      .withColumn("exp_share", expShare)
      .withColumn("chi2",
        sum((col("obs_share") - col("exp_share")) *
          (col("obs_share") - col("exp_share")) / col("exp_share"))
          .over(w) * col("n"))
  }

  def madOutlierSummary(df: DataFrame, groupCols: Seq[String],
      valueCol: String, c: Double): DataFrame = {
    require(c > 0, "c > 0")
    val x = col(valueCol).cast("double")
    val med = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(x, lit(0.5)).as("med"))
    val dev = df.join(broadcast(med), groupCols)
      .withColumn("__dev", abs(x - col("med")))
    val mad = dev.groupBy(groupCols.map(col): _*)
      .agg(percentile(col("__dev"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), groupCols)
      .groupBy((groupCols.map(col) :+ col("med") :+ col("mad")): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col("__dev") > lit(c) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select((groupCols.map(col) :+ col("n") :+ col("med") :+
        col("mad") :+ col("n_outliers")): _*)
  }

  /** Welch's unequal-variance t statistic between two samples — the
    * A/B experimentation primitive (did the treatment shift the
    * metric?), with the Welch–Satterthwaite degrees of freedom.
    *
    * Each side collapses to THREE integer-exact numbers (count, sum of
    * 1e-2-snapped "cents", sum of squared cents — partial-aggregation
    * order cannot perturb integer sums), and every derived double
    * (means, sample variances, t, df) is one fixed expression tree
    * over those six — identical in any IEEE engine, so the rounded
    * outputs hash-compare. The t statistic is scale-invariant, so
    * computing in cents changes nothing; means are reported in units.
    *
    * Output: one row (n_a, n_b, mean_a, mean_b (4 dp), t_stat (4 dp),
    * df_welch (2 dp)).
    */
  /** Hash-bucket (delete-a-group) jackknife for the standard error of
    * a mean — deterministic error bars without RNG: rows land in B
    * near-equal buckets by a salted portable hash of their id, each
    * bucket's LEAVE-ONE-OUT mean is one exact-integer-sums division,
    * and SE² = (B−1)/B · Σ(loo_b − loo̅)². With hash buckets standing
    * in for random groups, this is the textbook grouped jackknife —
    * reproducible across runs and engines because the grouping is a
    * hash, not a shuffle.
    *
    * Scale shape: one aggregate to B rows, then bounded-frame math.
    * Determinism: the two B-term double folds run over the
    * bucket-sorted array (the [[Eval.ndcgAtK]] convention), so both
    * engines execute the same IEEE op sequence.
    *
    * Output: one row (n, mean (4 dp), se_jack (6 dp), ci_lo, ci_hi —
    * mean ± 1.96·se, 4 dp).
    */
  def bucketJackknife(df: DataFrame, idCol: Column, value: Column,
      buckets: Int = 50): DataFrame = {
    require(buckets >= 2, "need >= 2 buckets")
    import graft.functions.TextOps
    val byB = df
      .select(pmod(TextOps.hash32(
          concat(lit("jk:"), idCol.cast("string"))), lit(buckets))
          .as("b"),
        floor(value.cast("double") * 100 + 0.5).cast("long").as("c"))
      .filter(col("c").isNotNull)
      .groupBy("b").agg(count(lit(1)).as("nb"), sum("c").as("sb"))
    val tot = byB.agg(sum("nb").as("n"), sum("sb").as("s"),
      count(lit(1)).as("bn"))
    val loo = byB.crossJoin(broadcast(tot))
      .withColumn("loo",
        // n == nb iff this is the only occupied bucket — the 0/0
        // leave-one-out mean is null here (ANSI-safe), and the bn < 2
        // guard below nulls the SE/CI built from it
        when(col("n") === col("nb"), lit(null).cast("double"))
          .otherwise((col("s") - col("sb")).cast("double") /
            (col("n") - col("nb")).cast("double")))
    val arr = loo.agg(first("n").as("n"), first("s").as("s"),
      first("bn").as("bn"),
      array_sort(collect_list(struct(col("b"), col("loo"))))
        .as("byB"))
    def r4(c: Column) = floor(c * 10000.0 + 0.5) / 10000.0
    arr
      .withColumn("loomean",
        aggregate(col("byB"), lit(0.0),
          (acc, e) => acc + e.getField("loo")) / col("bn"))
      .withColumn("se",
        sqrt(aggregate(col("byB"), lit(0.0), (acc, e) =>
          acc + (e.getField("loo") - col("loomean")) *
            (e.getField("loo") - col("loomean"))) *
          (col("bn") - 1.0) / col("bn")))
      .select(col("n").cast("long").as("n"),
        r4(col("s") / col("n") / 100.0).as("mean"),
        // one occupied bucket (single distinct id, or pathological key
        // skew on tiny input) leaves every leave-one-out mean 0/0 —
        // null the error bar rather than emitting NaN
        when(col("bn") < 2, lit(null).cast("double"))
          .otherwise(floor(col("se") / 100.0 * 1e6 + 0.5) / 1e6)
          .as("se_jack"),
        when(col("bn") < 2, lit(null).cast("double"))
          .otherwise(
            r4((col("s") / col("n") - lit(1.96) * col("se")) / 100.0))
          .as("ci_lo"),
        when(col("bn") < 2, lit(null).cast("double"))
          .otherwise(
            r4((col("s") / col("n") + lit(1.96) * col("se")) / 100.0))
          .as("ci_hi"))
  }

  def welchTTest(a: DataFrame, b: DataFrame, value: Column): DataFrame = {
    def stats(df: DataFrame, t: String) =
      df.select(floor(value.cast("double") * 100 + 0.5).cast("long")
          .as("c"))
        .filter(col("c").isNotNull)
        .agg(count(lit(1)).cast("double").as(s"n$t"),
          sum("c").cast("double").as(s"s$t"),
          sum(col("c") * col("c")).cast("double").as(s"q$t"))
    val j = stats(a, "a").crossJoin(stats(b, "b"))
    val ma = col("sa") / col("na")
    val mb = col("sb") / col("nb")
    val va = (col("qa") - col("sa") * col("sa") / col("na")) /
      (col("na") - 1)
    val vb = (col("qb") - col("sb") * col("sb") / col("nb")) /
      (col("nb") - 1)
    val sea = va / col("na")
    val seb = vb / col("nb")
    def r4(c: Column) = floor(c * 10000.0 + 0.5) / 10000.0
    j.select(col("na").cast("long").as("n_a"),
      col("nb").cast("long").as("n_b"),
      r4(ma / 100.0).as("mean_a"), r4(mb / 100.0).as("mean_b"),
      r4((ma - mb) / sqrt(sea + seb)).as("t_stat"),
      (floor((sea + seb) * (sea + seb) /
        (sea * sea / (col("na") - 1) + seb * seb / (col("nb") - 1))
        * 100.0 + 0.5) / 100.0).as("df_welch"))
  }

  /** Cohen's d effect size between two samples — the
    * practical-significance companion to [[welchTTest]]'s p-value
    * machinery (a tiny p on 10^9 rows can mean a trivial effect):
    * d = (x̄_a − x̄_b)/s_pooled with the pooled SD
    * √(((n_a−1)s_a² + (n_b−1)s_b²)/(n_a+n_b−2)). Same integer-cent
    * moment discipline as Welch: one aggregate per side, every derived
    * double a fixed expression tree.
    * Output: one row — n_a, n_b, mean_a (4 dp), mean_b (4 dp),
    * cohens_d (4 dp).
    */
  def cohensD(a: DataFrame, b: DataFrame, value: Column): DataFrame = {
    def stats(df: DataFrame, t: String) =
      df.select(floor(value.cast("double") * 100 + 0.5).cast("long")
          .as("c"))
        .filter(col("c").isNotNull)
        .agg(count(lit(1)).cast("double").as(s"n$t"),
          sum("c").cast("double").as(s"s$t"),
          sum(col("c") * col("c")).cast("double").as(s"q$t"))
    val j = stats(a, "a").crossJoin(stats(b, "b"))
    val ma = col("sa") / col("na")
    val mb = col("sb") / col("nb")
    val va = (col("qa") - col("sa") * col("sa") / col("na")) /
      (col("na") - 1)
    val vb = (col("qb") - col("sb") * col("sb") / col("nb")) /
      (col("nb") - 1)
    val sp = sqrt(((col("na") - 1) * va + (col("nb") - 1) * vb) /
      (col("na") + col("nb") - 2))
    def r4(c: Column) = floor(c * 10000.0 + 0.5) / 10000.0
    j.select(col("na").cast("long").as("n_a"),
      col("nb").cast("long").as("n_b"),
      r4(ma / 100.0).as("mean_a"), r4(mb / 100.0).as("mean_b"),
      r4((ma - mb) / sp).as("cohens_d"))
  }

  /** Pearson χ² test of independence between two categorical columns —
    * the A/B-categorical sibling of [[welchTTest]] (means) and the
    * same statistic [[benfordScreen]] computes against a FIXED
    * expected law, here against the data's own margins: is the
    * distribution of `b` the same in every level of `a`?
    *
    * expected(i,j) = row_i·col_j/n; χ² = Σ (obs−exp)²/exp with
    * df = (R−1)(C−1). A double Σ over cells is order-dependent, so
    * each cell's contribution is SNAPPED to integer 1e-6 units and the
    * total is an exact BIGINT sum (the qL0 discipline — same trick as
    * the ACF deviations), un-snapped by one final division.
    *
    * Shape: one hash aggregate to the |R×C| contingency frame, margins
    * as two bounded re-aggregations joined back (broadcast-sized), one
    * bounded total. Absent cells (obs = 0) still contribute exp — they
    * are completed via the margins' cross join (R·C rows, bounded).
    *
    * Output: one row — n, r_levels, c_levels, df, chi2 (4 dp).
    */
  def chi2Independence(df: DataFrame, a: Column, b: Column): DataFrame = {
    // the contingency table is |levels_a × levels_b|-bounded by design
    // — fence it once: the row-margin, column-margin, total and grid
    // legs otherwise each re-evaluate the cell aggregation AND the
    // corpus scan under it (4 scans in the round-19 qM1 plan audit;
    // guide §2.4). Bounded tier per the Fence policy (same class as
    // cut points and sketch registers).
    val cells = graft.plans.Fence.bounded(
      df.select(a.cast("string").as("av"),
          b.cast("string").as("bv"))
        .filter(col("av").isNotNull && col("bv").isNotNull)
        .groupBy("av", "bv").agg(count(lit(1)).as("o")))
    val rowM = cells.groupBy("av").agg(sum("o").as("rm"))
    val colM = cells.groupBy("bv").agg(sum("o").as("cm"))
    val tot = cells.agg(sum("o").as("n"))
    // complete grid: margins cross join (bounded R·C), left join obs
    val grid = rowM.crossJoin(broadcast(colM)).crossJoin(broadcast(tot))
      .join(cells, Seq("av", "bv"), "left")
      .withColumn("obs", coalesce(col("o"), lit(0L)))
      .withColumn("exp",
        col("rm").cast("double") * col("cm") / col("n"))
      .withColumn("contrib6",
        floor((col("obs") - col("exp")) * (col("obs") - col("exp")) /
          col("exp") * 1000000.0 + 0.5).cast("long"))
    grid.agg(
        first(col("n")).as("n"),
        countDistinct("av").as("r_levels"),
        countDistinct("bv").as("c_levels"),
        sum("contrib6").as("s6"))
      .withColumn("chi2_raw", col("s6").cast("double") / 1000000.0)
      .select(col("n"), col("r_levels"), col("c_levels"),
        ((col("r_levels") - 1) * (col("c_levels") - 1)).as("df"),
        (floor(col("chi2_raw") * 10000.0 + 0.5) / 10000.0).as("chi2"),
        // Cramér's V effect size: sqrt(chi2 / (n·min(R−1, C−1)));
        // null on a degenerate 1×C / R×1 table instead of an ANSI
        // division error
        when(least(col("r_levels") - 1, col("c_levels") - 1) <= 0,
          lit(null).cast("double"))
          .otherwise(floor(sqrt(col("chi2_raw") /
            (col("n") * least(col("r_levels") - 1, col("c_levels") - 1)))
            * 10000.0 + 0.5) / 10000.0).as("cramers_v"))
  }

  /** Two-proportion z-test — the A/B primitive for CONVERSION-style
    * binary outcomes, beside [[welchTTest]] for means: pooled-variance
    * z = (p_a − p_b)/√(p̂(1−p̂)(1/n_a + 1/n_b)). One conditional-sum
    * aggregate per side (integer counts, exact); every derived double
    * is one fixed expression tree.
    * Output: one row — n_a, conv_a, n_b, conv_b, p_a (4 dp), p_b
    * (4 dp), z (4 dp).
    */
  def twoProportionZ(a: DataFrame, b: DataFrame, success: Column)
      : DataFrame = {
    def side(df: DataFrame, t: String) =
      df.agg(count(lit(1)).as(s"n_$t"),
        sum(when(success, 1L).otherwise(0L)).as(s"conv_$t"))
    val j = side(a, "a").crossJoin(side(b, "b"))
    val pa = col("conv_a").cast("double") / col("n_a")
    val pb = col("conv_b").cast("double") / col("n_b")
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    def r4(c: Column) = floor(c * 10000.0 + 0.5) / 10000.0
    j.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      r4(pa).as("p_a"), r4(pb).as("p_b"),
      r4((pa - pb) / sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))).as("z"))
  }

  /** Per-group Tukey-fence (IQR) outlier summary — the box-plot screen
    * beside the MAD screen: fences at Q1 − k·IQR / Q3 + k·IQR
    * (k = 1.5 conventional). Exact interpolating quartiles (Spark
    * `percentile`, the [[madOutlierSummary]] oracle convention —
    * DuckDB `quantile_cont` matches); the detail pass is one
    * broadcast-join + conditional sum at scan speed.
    * Output: groupCols..., n, q1 (4 dp), q3 (4 dp), iqr (4 dp),
    * n_low, n_high.
    */
  def iqrOutliers(df: DataFrame, groupCols: Seq[String],
      valueCol: String, k: Double = 1.5): DataFrame = {
    val base = df.select((groupCols.map(col) :+
      col(valueCol).cast("double").as("__x")): _*)
      .filter(col("__x").isNotNull)
    val qs = base.groupBy(groupCols.map(col): _*)
      .agg(percentile(col("__x"), lit(0.25)).as("q1r"),
        percentile(col("__x"), lit(0.75)).as("q3r"))
    def r4(c: Column) = floor(c * 10000.0 + 0.5) / 10000.0
    base.join(broadcast(qs), groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        first("q1r").as("q1r"), first("q3r").as("q3r"),
        sum(when(col("__x") <
          col("q1r") - lit(k) * (col("q3r") - col("q1r")), 1L)
          .otherwise(0L)).as("n_low"),
        sum(when(col("__x") >
          col("q3r") + lit(k) * (col("q3r") - col("q1r")), 1L)
          .otherwise(0L)).as("n_high"))
      .select((groupCols.map(col) :+ col("n") :+
        r4(col("q1r")).as("q1") :+ r4(col("q3r")).as("q3") :+
        r4(col("q3r") - col("q1r")).as("iqr") :+
        col("n_low") :+ col("n_high")): _*)
  }
}
