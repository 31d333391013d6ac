package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel / sequential-pattern analysis over an event stream: how far
  * each user progressed through an ordered step sequence (view → click →
  * purchase), where a later step only counts after an earlier one.
  *
  * Scale shape: ONE shuffle on the user key; each user's events collect
  * into an array sorted by (ts, event_id) — bounded by per-user activity,
  * the same bound sessionization already assumes — and the stage count is
  * a left fold over that array (the subsequence-matching scan), evaluated
  * per row. No self-joins, no per-step passes: a k-step funnel costs the
  * same one shuffle as a 2-step funnel. The oracle deliberately uses the
  * other classic formulation (per-step min-chaining with row-tuple
  * comparisons) so the two algorithms check each other.
  */
object Funnel {

  /** Per-user inter-arrival-time profile: gaps between consecutive
    * events in epoch seconds — the cadence signal behind churn scoring
    * and bot detection (human gaps are heavy-tailed; scripted traffic
    * is metronomic). One user-partitioned sort (the sessionization
    * bound); gaps are exact integer seconds; the per-user median is
    * the lower-rank element of the user-bounded sorted gap array, so
    * every output is integer-derived with at most one division.
    * Tied timestamps are order-ambiguous, but the gap MULTISET is
    * invariant under permuting equal keys, so the aggregates are
    * deterministic anyway.
    * Output per user (≥ 2 events): user_id, n_events, mean_gap_s
    * (4 dp), median_gap_s, max_gap_s.
    */
  def interArrival(df: DataFrame, userCol: String, tsCol: String)
      : DataFrame = {
    val evs = df
      .select(col(userCol).as("user_id"),
        unix_timestamp(col(tsCol)).as("sec"))
      .filter(col("sec").isNotNull && col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(col("sec"))).as("ts"))
      .filter(col("n_events") >= 2)
    def r4(c: Column) = floor(c * 10000.0 + 0.5) / 10000.0
    evs
      .withColumn("gaps", sort_array(zip_with(
        slice(col("ts"), lit(2), size(col("ts")) - 1),
        slice(col("ts"), lit(1), size(col("ts")) - 1),
        (a, b) => a - b)))
      .select(col("user_id"), col("n_events"),
        r4(aggregate(col("gaps"), lit(0L), (a, g) => a + g)
          .cast("double") / (col("n_events") - 1)).as("mean_gap_s"),
        element_at(col("gaps"),
          ceil((col("n_events") - 1).cast("double") / 2).cast("int"))
          .as("median_gap_s"),
        element_at(col("gaps"), -1).as("max_gap_s"))
  }

  /** Output: user_id, stage (0..steps.length — steps completed in
    * order), n_events (user's total event count).
    */
  def stages(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val evs = df.select(col(userCol).as("user_id"),
        struct(col(tsCol).as("ts"), col(idCol).as("eid"),
          col(typeCol).as("t")).as("e"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(col("e"))).as("evs"),
        count(lit(1)).as("n_events"))
    // fold state = stages matched so far; advance when the next event
    // matches the CURRENT step (conditions keyed on acc are disjoint)
    val stage = aggregate(col("evs"), lit(0), (acc, e) => {
      val t = e.getField("t")
      steps.zipWithIndex.foldLeft(acc) { case (els, (s, i)) =>
        when(acc === i && t === s, lit(i + 1)).otherwise(els)
      }
    })
    evs.select(col("user_id"), stage.cast("long").as("stage"),
      col("n_events"))
  }
}
