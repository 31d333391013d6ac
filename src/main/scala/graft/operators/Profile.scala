package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling + declarative quality contracts — the "know what
  * you just ingested" layer a pipeline runs before anything expensive:
  * a per-column profile table and a named-expectation runner (the
  * Deequ/Great-Expectations shape, as plain aggregates).
  */
object Profile {

  /** Long-format per-column profile: one row per profiled column with
    * row/null/distinct counts and min/max rendered as strings (so one
    * schema fits every column type). One aggregation pass over the
    * table — all 4·|cols| aggregates ride a single partial-aggregated
    * job, no per-column scans.
    *
    * `n_distinct` is exact (`count_distinct`) — right for
    * profile-sized tables and for the oracle; at corpus scale swap in
    * the mergeable [[Hll]] estimate per column (same output shape,
    * documented trade).
    *
    * Output: column, n, n_null, n_distinct, min_s, max_s.
    */
  def profileTable(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // unpivot the one wide row into the long format via a struct array
    val entries = array(cols.map(c => struct(
      lit(c).as("column"),
      col("__n").as("n"),
      (col("__n") - col(s"__nn_$c")).as("n_null"),
      col(s"__nd_$c").as("n_distinct"),
      col(s"__mn_$c").as("min_s"),
      col(s"__mx_$c").as("max_s"))): _*)
    wide.select(explode(entries).as("e")).select("e.*")
  }

  /** Declarative expectation suite: each check is a NAME and a row
    * predicate that every row must satisfy; the report counts
    * violations per check in ONE pass (a conditional sum per check —
    * no per-check scans, no row explosion).
    *
    * Output: check, n, n_violations, pass — the table a pipeline
    * gates on (`pass = false` rows block the downstream write).
    */
  def expectations(df: DataFrame, checks: Seq[(String, Column)])
      : DataFrame = {
    require(checks.nonEmpty, "declare at least one expectation")
    val aggs: Seq[Column] = checks.map { case (name, pred) =>
      sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L))
        .as(s"__v_$name")
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = array(checks.map { case (name, _) => struct(
      lit(name).as("check"),
      col("__n").as("n"),
      col(s"__v_$name").as("n_violations"),
      (col(s"__v_$name") === 0L).as("pass"))
    }: _*)
    wide.select(explode(entries).as("e")).select("e.*")
  }
}
