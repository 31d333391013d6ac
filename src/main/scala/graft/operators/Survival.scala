package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Survival analysis over right-censored durations — time-to-event for
  * the event stream (days until first purchase, time to churn, job
  * time-to-failure): the Kaplan-Meier survival estimator
  * S(t) = Π_{t_i ≤ t} (1 − d_i/n_i) and the Nelson-Aalen cumulative
  * hazard H(t) = Σ_{t_i ≤ t} d_i/n_i, with the standard convention
  * that subjects censored at t are still at risk AT t.
  *
  * Scale shape: subjects reduce to the |distinct durations| frame in
  * one aggregate (day-granularity durations are calendar-bounded;
  * quantize finer clocks first — the value-count contract); at-risk
  * counts come from one cumulative pass and the product/sum fold runs
  * over the bounded sorted array. Determinism: d and n are exact
  * integers, each factor (1 − d/n) is one division, and the fold
  * multiplies/adds in duration order on both engines (the oracle
  * replays it with a recursive CTE — identical expression tree).
  */
object Survival {

  /** `df` carries one row per SUBJECT: `duration` (non-negative
    * integer time units) and `event` (true = event observed, false =
    * right-censored at that duration).
    * Output per distinct duration: t, n_risk, n_event, n_censored,
    * survival (6 dp), cum_hazard (6 dp).
    */
  def kaplanMeier(df: DataFrame, duration: Column, event: Column)
      : DataFrame = {
    val subjects = df.select(duration.cast("long").as("t"),
        when(event, 1L).otherwise(0L).as("e"))
      .filter(col("t").isNotNull && col("t") >= 0)
    val byT = subjects.groupBy("t")
      .agg(sum("e").as("d"), sum(lit(1L) - col("e")).as("c"))
    def r6(c: Column) = floor(c * 1000000.0 + 0.5) / 1000000.0
    byT
      .agg(sort_array(collect_list(
        struct(col("t"), col("d"), col("c")))).as("xs"),
        sum(col("d") + col("c")).as("n_total"))
      .select(explode(aggregate(
        col("xs"),
        struct(col("n_total").as("at_risk"),
          lit(1.0).as("s"), lit(0.0).as("h"),
          array().cast(
            "array<struct<t:bigint,n_risk:bigint,n_event:bigint," +
              "n_censored:bigint,s:double,h:double>>").as("rows")),
        (acc, x) => {
          val s = acc.getField("s") *
            (lit(1.0) - x.getField("d").cast("double") /
              acc.getField("at_risk"))
          val h = acc.getField("h") +
            x.getField("d").cast("double") / acc.getField("at_risk")
          struct(
            (acc.getField("at_risk") - x.getField("d") -
              x.getField("c")).as("at_risk"),
            s.as("s"), h.as("h"),
            concat(acc.getField("rows"), array(struct(
              x.getField("t").as("t"),
              acc.getField("at_risk").as("n_risk"),
              x.getField("d").as("n_event"),
              x.getField("c").as("n_censored"),
              s.as("s"), h.as("h")))).as("rows"))
        },
        acc => acc.getField("rows"))).as("r"))
      .select(col("r.t").as("t"), col("r.n_risk").as("n_risk"),
        col("r.n_event").as("n_event"),
        col("r.n_censored").as("n_censored"),
        r6(col("r.s")).as("survival"),
        r6(col("r.h")).as("cum_hazard"))
  }
}
