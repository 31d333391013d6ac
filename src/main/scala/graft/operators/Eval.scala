package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-evaluation operators for the quality-gate stage of a
  * curation pipeline: once a quality model scores every document
  * (TextAnalysis.qualityScore / the linear gate), these measure whether
  * the scores are any good — exact ROC AUC and a reliability
  * (calibration) table — as distributed aggregations, not a driver-side
  * sklearn call over a collect().
  *
  * Scale shape: both operators aggregate per DISTINCT SCORE first, so
  * everything after the first groupBy is bounded by the score
  * cardinality, not the corpus. The AUC prefix sum over score groups
  * uses the same two-phase block trick as [[Order.globalIndex]] /
  * [[Pack]]: min/max-derived range blocks (monotonic in score), a
  * per-block count frame (|blocks| rows, the only single-partition
  * window), then block-local cumulative sums in parallel — no global
  * one-task sort at any point.
  */
object Eval {

  /** Exact ROC AUC via the Mann-Whitney rank-sum identity with
    * average ranks for ties:
    *
    *   AUC = (R_pos − nPos·(nPos+1)/2) / (nPos·nNeg)
    *
    * where R_pos is the sum over positives of their average rank under
    * ascending score order. Ties get the average rank of their run —
    * the identity AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻),
    * which is what a trapezoidal ROC integration yields.
    *
    * Determinism: every per-score term is an integer multiple of 0.5
    * (counts and count-halves), so the double sums are exact regardless
    * of partial-aggregation order; the single final division is one
    * IEEE op — reproducible across engines, safe to hash-compare.
    *
    * Output: one row (n_pos, n_neg, auc) with `auc` rounded to 6 dp
    * (stable floor form).
    */
  def binaryAuc(df: DataFrame, score: Column, label: Column,
      nBlocks: Int = 256): DataFrame = {
    require(nBlocks > 0, "nBlocks must be > 0")
    // Per-distinct-score partials: everything downstream is bounded by
    // score cardinality. Label is coerced to {0,1} here (fails closed:
    // null labels count as negative).
    val byScore = df
      .select(score.cast("double").as("s"),
        when(label, 1L).otherwise(0L).as("y"))
      .filter(col("s").isNotNull)
      .groupBy("s")
      .agg(count(lit(1)).as("cnt"), sum("y").as("pos"))

    // Two-phase prefix sum over ascending score: range blocks derived
    // from the (tiny, broadcast) min/max, monotonic in s, so block-local
    // cumulative counts + per-block start offsets equal the global
    // cumulative count.
    val bounds = byScore.agg(min("s").as("lo"), max("s").as("hi"))
    val blocked = byScore.crossJoin(broadcast(bounds))
      .withColumn("block",
        when(col("hi") === col("lo"), lit(0L)).otherwise(
          least(lit(nBlocks - 1L), floor(
            (col("s") - col("lo")) / (col("hi") - col("lo")) * nBlocks)
            .cast("long"))))
    val wBlocks = Window.orderBy("block")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = blocked.groupBy("block")
      .agg(sum("cnt").as("bn"))
      .select(col("block"),
        coalesce(sum("bn").over(wBlocks), lit(0L)).as("boff"))
    val wIn = Window.partitionBy("block").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = blocked.join(broadcast(offsets), "block")
      .withColumn("before",
        col("boff") + coalesce(sum("cnt").over(wIn), lit(0L)))
      // average rank of this score's run = before + (cnt+1)/2
      .withColumn("rpos_term",
        col("pos") * (col("before") + (col("cnt") + 1L) / 2.0))

    ranked.agg(
      sum("pos").as("np"),
      (sum("cnt") - sum("pos")).as("nn"),
      sum("rpos_term").as("rpos"))
      .select(col("np").cast("long").as("n_pos"),
        col("nn").cast("long").as("n_neg"),
        (floor((col("rpos") - col("np") * (col("np") + 1L) / 2.0) /
          (col("np") * col("nn")) * 1e6 + 0.5) / 1e6).as("auc"))
  }

  /** Reliability (calibration) table: equal-width score bins over
    * [lo, hi], each bin reporting volume, mean score, and the observed
    * positive rate. The standard post-gate diagnostic — a well-ranked
    * (high-AUC) quality score can still be badly calibrated, which
    * matters when the gate threshold is chosen on the raw score.
    *
    * Mean score sums exactly: scores are snapped to integer "cents"
    * (4 dp) before summing, so partial-aggregation order cannot perturb
    * the result — the same integer-sums convention the bench queries use
    * for money columns. One aggregation pass; output is ≤ `bins` rows.
    *
    * Output: bin, lo_edge (4 dp), n, mean_score (4 dp), frac_pos (6 dp).
    */
  def calibrationBins(df: DataFrame, score: Column, label: Column,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins > 0, "bins must be > 0")
    require(hi > lo, "hi must exceed lo")
    val width = (hi - lo) / bins
    val s = score.cast("double")
    df.select(s.as("s"), when(label, 1L).otherwise(0L).as("y"))
      .filter(col("s").isNotNull && col("s") >= lo && col("s") <= hi)
      .withColumn("bin",
        least(lit(bins - 1L),
          floor((col("s") - lo) / width).cast("long")))
      .withColumn("s4", floor(col("s") * 10000.0 + 0.5).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("s4").as("ssum"),
        sum("y").as("npos"))
      .select(col("bin"),
        (floor((lit(lo) + col("bin") * width) * 10000.0 + 0.5) /
          10000.0).as("lo_edge"),
        col("n"),
        (floor(col("ssum") / col("n").cast("double") / 10000.0 *
          10000.0 + 0.5) / 10000.0).as("mean_score"),
        (floor(col("npos") / col("n").cast("double") * 1e6 + 0.5) /
          1e6).as("frac_pos"))
  }
}
