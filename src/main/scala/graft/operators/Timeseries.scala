package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.SafeOps

/** Time-series repair and history operators over an event stream: daily
  * gap-filling with linear interpolation, and SCD-2 (slowly-changing-
  * dimension type 2) validity-range compression of per-day states.
  *
  * Scale shape (both): aggregate to the (key, day) grain first — one
  * shuffle — then everything else is per-key windows over that already-
  * reduced frame. Gap days are synthesized MAP-SIDE from each observed
  * row's lead() via sequence+explode (bounded by `maxGapDays`), never by
  * joining a dense calendar spine against the corpus: a spine join would
  * shuffle |keys|×|days| rows to fill gaps that are typically a small
  * fraction of the grid.
  */
object Timeseries {

  /** Daily per-key value series with interior gaps filled by linear
    * interpolation between the surrounding observed days.
    *
    * Output: one row per key per day from its first to its last observed
    * day — `user_id, day, filled, is_observed`. Interior gaps longer than
    * `maxGapDays` are left unfilled (the observed endpoints still emit):
    * at scale an unbounded sequence() on a pathological key (two events a
    * decade apart) would explode one row into thousands.
    *
    * The daily aggregate is stable-rounded BEFORE interpolating so the
    * interpolation arithmetic runs on exactly-reproducible inputs (raw
    * double partial-agg sums are association-order-dependent).
    */
  def dailyGapFill(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, maxGapDays: Int = 90): DataFrame = {
    val obs = df
      .groupBy(col(keyCol).as("user_id"),
        to_date(col(tsCol)).as("day"))
      .agg(SafeOps.stableRound4(sum(valueCol)).as("v"))
    val w = Window.partitionBy("user_id").orderBy("day")
    val led = obs
      .withColumn("nday", lead("day", 1).over(w))
      .withColumn("nv", lead("v", 1).over(w))
      .withColumn("gap", datediff(col("nday"), col("day")))
    // each observed row emits itself plus its interior gap days (none
    // when the gap exceeds maxGapDays — only the endpoints appear)
    led
      .withColumn("d", explode(when(
          col("gap").isNotNull && col("gap") <= maxGapDays,
          sequence(col("day"), date_sub(col("nday"), 1)))
        .otherwise(array(col("day")))))
      .select(col("user_id"), col("d").as("day"),
        SafeOps.stableRound4(
          when(col("d") === col("day"), col("v"))
            .otherwise(col("v") + (col("nv") - col("v")) *
              datediff(col("d"), col("day")) / col("gap")))
          .as("filled"),
        (col("d") === col("day")).as("is_observed"))
  }

  /** SCD-2 change history: compress each key's per-day states into
    * validity ranges, keeping only the days where the state CHANGED.
    *
    * State of a day = the value of the key's LAST event that day
    * (ordered by (ts, event id) so concurrent-timestamp ties are
    * deterministic). Output: `user_id, valid_from, valid_to, value,
    * is_current` — `valid_to` is the next change's day (exclusive),
    * null on the current row.
    *
    * Values are stable-rounded before the change comparison: the filter
    * is an equality on doubles and must agree bit-for-bit with any
    * re-computation of the same history.
    */
  def scd2(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy("user_id", "day")
      .orderBy(col("ts").desc, col("eid").desc)
    val daily = df
      .select(col(keyCol).as("user_id"), to_date(col(tsCol)).as("day"),
        col(tsCol).as("ts"), col(idCol).as("eid"),
        col(valueCol).as("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("day"),
        SafeOps.stableRound4(col("value")).as("value"))
    val byDay = Window.partitionBy("user_id").orderBy("day")
    val changed = daily
      .withColumn("prev", lag("value", 1).over(byDay))
      .filter(col("prev").isNull || col("prev") =!= col("value"))
    changed
      .withColumn("valid_to", lead("day", 1).over(byDay))
      .select(col("user_id"), col("day").as("valid_from"),
        col("valid_to"), col("value"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Greedy cooldown deduplication: per key, keep an event only if at
    * least `cooldown` has elapsed since the last KEPT event — the
    * notification-throttling / temporal-near-dup semantics. This is NOT
    * expressible as a plain window over lag(): whether an event is kept
    * depends on which earlier events were kept, a sequential decision.
    * (lag-based suppression would re-anchor on suppressed events: three
    * events at t, t+0.6c, t+1.2c keep {t, t+1.2c} here, but lag-based
    * keeps only {t} because each event is within c of its predecessor.)
    *
    * Scale shape: ONE shuffle on the key; events collect into a
    * (ts, id)-sorted array — the same per-key-activity bound
    * sessionization and [[Funnel.stages]] already assume — and the kept
    * set is a left fold with the kept-array as state. Timestamps fold
    * as exact integer microseconds, so the keep/suppress decision is
    * bit-identical in any engine.
    *
    * Output: one row per kept event — key, ts, id.
    */
  def cooldownDedup(df: DataFrame, keyCols: Seq[String], tsCol: String,
      idCol: String, cooldownSec: Long): DataFrame = {
    val cdUs = cooldownSec * 1000000L
    val evs = df.select(
        struct(keyCols.map(col): _*).as("k"),
        struct(unix_micros(col(tsCol)).as("t"),
          col(idCol).as("eid")).as("e"))
      .groupBy("k")
      .agg(sort_array(collect_list(col("e"))).as("evs"))
    // fold state = the kept array; seed with a typed empty slice so the
    // accumulator's struct type matches the elements'
    val kept = aggregate(col("evs"), slice(col("evs"), 1, 0),
      (acc, e) => when(
        size(acc) === 0 ||
          e.getField("t") - element_at(acc, -1).getField("t") >= cdUs,
        concat(acc, array(e))).otherwise(acc))
    val flat = evs.select(col("k"), explode(kept).as("e"))
    val keyOut = keyCols.map(n => col("k").getField(n).as(n))
    flat.select(keyOut :+
      timestamp_micros(col("e.t")).as(tsCol) :+
      col("e.eid").as(idCol): _*)
  }

  /** The custom-physical-operator form of [[cooldownDedup]]
    * (graft.plans.CooldownDedupExec): identical greedy semantics, but
    * instead of folding a per-key collected array it requires (key, ts,
    * id) clustering+ordering from the planner and streams each
    * partition with O(1) state — bounded memory even when one key holds
    * a large share of the corpus. Emits the kept rows with ALL input
    * columns (a filter, not a reshape).
    */
  def cooldownDedupStreamed(df: DataFrame, keyCols: Seq[String],
      tsCol: String, idCol: String, cooldownSec: Long): DataFrame = {
    val spark = df.sparkSession
    // idempotent planner registration for sessions built without
    // GraftExtensions (the spark.sql.extensions route injects it too)
    if (!spark.experimental.extraStrategies
        .contains(graft.plans.CooldownStrategy)) {
      spark.experimental.extraStrategies =
        graft.plans.CooldownStrategy +: spark.experimental.extraStrategies
    }
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.PushFilterThroughCooldown)) {
      spark.experimental.extraOptimizations =
        graft.plans.PushFilterThroughCooldown +:
          spark.experimental.extraOptimizations
    }
    val analyzed = df.queryExecution.analyzed
    def attr(n: String) = analyzed.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    org.apache.spark.sql.GraftPlanBridge.ofRows(spark,
      graft.plans.CooldownDedup(keyCols.map(attr), attr(tsCol),
        attr(idCol), cooldownSec * 1000000L, analyzed))
  }

  /** One-sided CUSUM control chart over a daily metric — changepoint
    * detection for pipeline monitoring (has the ingest mix shifted
    * upward?): S_t = max(0, S_{t−1} + (x̄_t − target − slack)), alarm
    * when S_t > h.
    *
    * The recurrence LOOKS sequential, but with P_t = Σ_{i≤t} dev_i it
    * telescopes to S_t = P_t − min_{i≤t} P_i — two running windows over
    * the DAILY frame, which the first aggregate has already reduced to
    * |days| rows (the qC2 bounded-frame convention: the unpartitioned
    * windows run over an aggregated input, never the corpus).
    *
    * Determinism: daily sums are integer cents; x̄ is one division;
    * the running sum adds in day order on both engines. target/slack/h
    * are in cents.
    *
    * Output per day: day, n, xbar (4 dp, units), s_pos (4 dp, units),
    * alarm.
    */
  /** Time-decayed per-group aggregates: exponentially-decayed event
    * count and value sum with half-life `halfLifeDays`, anchored at
    * the newest day in the data — the "recent activity" rollup a
    * freshness-weighted mixture or trending-source ranking reads
    * instead of raw lifetime totals.
    *
    * Determinism: the stream reduces to per-(group, day) integer-cent
    * sums first; each day's decay factor exp(−ln2·age/h) is SNAPPED to
    * 6 dp (computed in-engine on both sides — identical input doubles,
    * 6-dp snap absorbing any libm ulp), and the per-group Σ over days
    * folds in day order (bounded by the calendar).
    *
    * Output per group: groupCols..., n_days, n_events, decayed_n
    * (4 dp), decayed_sum (4 dp, units).
    */
  def decayedDaily(df: DataFrame, groupCols: Seq[String], tsCol: String,
      value: Column, halfLifeDays: Double): DataFrame = {
    require(halfLifeDays > 0, "halfLifeDays must be positive")
    val daily = df
      .select((groupCols.map(col) :+ to_date(col(tsCol)).as("day") :+
        floor(value.cast("double") * 100 + 0.5).cast("long").as("c")): _*)
      .filter(col("c").isNotNull)
      .groupBy((groupCols.map(col) :+ col("day")): _*)
      .agg(count(lit(1)).as("n"), sum("c").as("sc"))
    val anchor = daily.agg(max("day").as("d0"))
    val weighted = daily.crossJoin(broadcast(anchor))
      .withColumn("w",
        floor(exp(datediff(col("day"), col("d0")).cast("double") *
          lit(math.log(2.0) / halfLifeDays)) * 1000000.0 + 0.5)
          / 1000000.0)
    def r4(c: Column) = floor(c * 10000.0 + 0.5) / 10000.0
    weighted
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("day"), col("n"),
        col("sc"), col("w")))).as("ds"))
      .select((groupCols.map(col) :+
        size(col("ds")).cast("long").as("n_days") :+
        aggregate(col("ds"), lit(0L),
          (a, s) => a + s.getField("n")).as("n_events") :+
        r4(aggregate(col("ds"), lit(0.0),
          (a, s) => a + s.getField("n") * s.getField("w")))
          .as("decayed_n") :+
        r4(aggregate(col("ds"), lit(0.0),
          (a, s) => a + s.getField("sc") * s.getField("w")) / 100.0)
          .as("decayed_sum")): _*)
  }

  /** Wald's sequential probability ratio test over a daily Bernoulli
    * stream — the always-monitoring A/B sibling of [[cusumDaily]]
    * (level shifts) for CONVERSION outcomes: after each day the
    * cumulative log-likelihood ratio of H1: p = p1 vs H0: p = p0 is
    * compared against ln((1−β)/α) (accept H1) and ln(β/(1−α)) (accept
    * H0); in between the test continues. Once a boundary is crossed the
    * decision is latched (the sequential contract: sampling stops).
    *
    * Determinism: daily (n, conv) are exact integers; the per-day LLR
    * is conv·ln(p1/p0) + (n−conv)·ln((1−p1)/(1−p0)) with BOTH log
    * weights SNAPPED to 6-dp driver literals (the [[Linkage]]
    * discipline), so the cumulative sum adds identical doubles in day
    * order on both engines; boundaries are snapped literals too.
    *
    * Shape: one aggregate to the bounded daily frame; the running sum
    * and the latch (min crossing day) are bounded-frame windows.
    * Output per day: day, n, conv, llr (6 dp), cum_llr (6 dp),
    * decision ('accept_h1' | 'accept_h0' | 'continue').
    */
  /** The four snapped SPRT constants: (wS, wF, upper, lower) —
    * success/failure LLR weights and the Wald decision boundaries.
    * Exposed so oracle SQL can interpolate the IDENTICAL literals.
    */
  def sprtWeights(p0: Double, p1: Double, alpha: Double, beta: Double)
      : (Double, Double, Double, Double) = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p1 != p0,
      "p0, p1 must be distinct probabilities in (0,1)")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      "alpha, beta must be in (0,1)")
    def snap6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    (snap6(math.log(p1 / p0)),
      snap6(math.log((1 - p1) / (1 - p0))),
      snap6(math.log((1 - beta) / alpha)),
      snap6(math.log(beta / (1 - alpha))))
  }

  def sprtDaily(df: DataFrame, tsCol: String, success: Column,
      p0: Double, p1: Double, alpha: Double, beta: Double): DataFrame = {
    val (wS, wF, up, lo) = sprtWeights(p0, p1, alpha, beta)
    val daily = df
      .select(to_date(col(tsCol)).as("day"),
        when(success, 1L).otherwise(0L).as("s"))
      // a null timestamp would otherwise become a null day row whose
      // position in the running-sum window is engine-dependent (Spark
      // sorts nulls first, DuckDB last) — drop it before the window
      .filter(col("day").isNotNull)
      .groupBy("day")
      .agg(count(lit(1)).as("n"), sum("s").as("conv"))
      .withColumn("llr_raw",
        col("conv") * lit(wS) + (col("n") - col("conv")) * lit(wF))
    val wRun = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    def r6(c: Column) = floor(c * 1000000.0 + 0.5) / 1000000.0
    // latch: the FIRST boundary crossing freezes the decision. The two
    // boundaries cannot cross on the same day (upper > 0 > lower), so
    // the earlier crossing day decides.
    val cum = daily
      .withColumn("cum_raw", sum("llr_raw").over(wRun))
      .withColumn("d_up",
        min(when(col("cum_raw") >= up, col("day"))).over(wRun))
      .withColumn("d_lo",
        min(when(col("cum_raw") <= lo, col("day"))).over(wRun))
    cum.select(col("day"), col("n"), col("conv"),
      r6(col("llr_raw")).as("llr"),
      r6(col("cum_raw")).as("cum_llr"),
      when(col("d_up").isNull && col("d_lo").isNull, "continue")
        .when(col("d_lo").isNull ||
          (col("d_up").isNotNull && col("d_up") <= col("d_lo")),
          "accept_h1")
        .otherwise("accept_h0").as("decision"))
  }

  def cusumDaily(df: DataFrame, tsCol: String, value: Column,
      targetCents: Long, slackCents: Long, hCents: Long): DataFrame = {
    val daily = df
      .select(to_date(col(tsCol)).as("day"),
        floor(value.cast("double") * 100 + 0.5).cast("long").as("c"))
      .filter(col("c").isNotNull)
      .groupBy("day")
      .agg(count(lit(1)).as("n"), sum("c").as("sc"))
      .withColumn("dev",
        col("sc") / col("n") - lit(targetCents.toDouble) -
          lit(slackCents.toDouble))
    val wRun = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    def r4(c: Column) = floor(c * 10000.0 + 0.5) / 10000.0
    daily
      .withColumn("p", sum("dev").over(wRun))
      .withColumn("s", col("p") - least(min("p").over(wRun), lit(0.0)))
      .select(col("day"), col("n"),
        r4(col("sc") / col("n") / 100.0).as("xbar"),
        r4(col("s") / 100.0).as("s_pos"),
        (col("s") > hCents.toDouble).as("alarm"))
  }
}
