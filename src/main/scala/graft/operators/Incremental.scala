package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate-view maintenance for the daily-append layout —
  * the Spark-native upgrade to the reference's recreate-the-view-daily
  * model (schema/README.md's per-day parser appends; every
  * views/website SQL rollup recomputes its full history on each
  * deploy): keep the view as MERGEABLE PARTIAL STATES, aggregate only
  * the new partition, and sum-merge — the refresh cost is O(new day),
  * not O(history). The same mergeable-state discipline as the sketch
  * family ([[Hll]]/[[CountMin]]/[[HistSketch]]), applied to plain
  * algebraic aggregates.
  *
  * State columns are the classic algebraic decompositions: cnt, sum,
  * min, max (and sum of squares for variance). AVG and stddev are NOT
  * state — they re-derive at read time ([[readView]]); storing them
  * would make states non-mergeable.
  *
  * At 100 TB: the standing state is |groups| rows; each refresh
  * shuffles only the new partition's partial aggregates. Persist the
  * state with the streaming screens' versioned rename-promoted layout
  * ([[graft.streaming.Ingest]]) for exactly-once refreshes.
  */
object Incremental {

  /** Partial-state aggregate of one batch/partition:
    * (groupCols..., cnt, sum_v, min_v, max_v, sum_sq).
    */
  def aggregateState(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(x).as("cnt"), sum(x).as("sum_v"),
        min(x).as("min_v"), max(x).as("max_v"),
        sum(x * x).as("sum_sq"))
  }

  /** Merge state tables (same groupCols): union + re-reduce. Sound for
    * any merge tree — every state column is
    * associative/commutative-mergeable.
    */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String])
      : DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col): _*)
      .agg(sum("cnt").as("cnt"), sum("sum_v").as("sum_v"),
        min("min_v").as("min_v"), max("max_v").as("max_v"),
        sum("sum_sq").as("sum_sq"))

  /** Presentation view over a state table: derived avg (and the
    * population variance, clamped at 0 against FP cancellation).
    */
  def readView(state: DataFrame): DataFrame =
    state
      .withColumn("avg_v", col("sum_v") / col("cnt"))
      .withColumn("var_v",
        greatest(lit(0.0),
          col("sum_sq") / col("cnt") - pow(col("sum_v") / col("cnt"), 2)))
}
