package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-bin histogram quantile sketch — the quantile member of the
  * mergeable-table family ([[Hll]]: cardinality, [[CountMin]]:
  * frequency, [[HeavyHitters]]: top-k): values bin into `bins`
  * equal-width cells over [lo, hi) (out-of-range clamps to the edge
  * bins), the sketch is a (group, bin, cnt) table merging by SUM, and
  * any quantile reads off the cumulative counts with error bounded by
  * half a bin width. Spark's own `percentile_approx` answers one-shot
  * queries better; this shape exists for the INCREMENTAL lifecycle —
  * per-day/per-shard histogram tables that merge and re-answer without
  * rescanning, exactly like the HLL registers.
  *
  * Everything is integer/fixed-grid arithmetic plus one FP division
  * identical on both engines, so the DuckDB oracle reproduces the
  * ESTIMATES bit-for-bit. The rank cut uses the FP-safe
  * `ceil(q·n − 1e-9)` bound (the prefix-filter convention) so a
  * product like 0.9·600 = 540.0000…06 cannot shift the rank.
  */
object HistSketch {

  /** (groupCols..., bin, cnt); bin = clamp(floor((v−lo)/width)). */
  def sketch(df: DataFrame, groupCols: Seq[String], value: Column,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1 && hi > lo, "need bins >= 1 and hi > lo")
    val width = (hi - lo) / bins
    val bin = least(lit(bins - 1L), greatest(lit(0L),
      floor((value.cast("double") - lit(lo)) / lit(width)).cast("long")))
    df.filter(value.isNotNull)
      .select((groupCols.map(col) :+ bin.as("bin")): _*)
      .groupBy((groupCols.map(col) :+ col("bin")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketch tables built with the same geometry: union + sum. */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String])
      : DataFrame =
    a.unionByName(b)
      .groupBy((groupCols.map(col) :+ col("bin")): _*)
      .agg(sum("cnt").as("cnt"))

  /** Quantile estimates (bin midpoints) per group for each q in `qs`.
    * Windows partition per group over ≤ `bins` rows — sketch-sized
    * frames, never data-sized. Output: groupCols..., q, est.
    */
  def quantiles(sk: DataFrame, groupCols: Seq[String], qs: Seq[Double],
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must be in (0, 1]")
    val width = (hi - lo) / bins
    val wCum = Window.partitionBy(groupCols.map(col): _*).orderBy("bin")
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    sk.withColumn("cum", sum("cnt").over(wCum))
      .withColumn("n", sum("cnt").over(wAll))
      .withColumn("q", explode(lit(qs.toArray)))
      .filter(col("cum") >= ceil(col("q") * col("n") - lit(1e-9)))
      .groupBy((groupCols.map(col) :+ col("q")): _*)
      .agg(min("bin").as("bin"))
      .select((groupCols.map(col) :+ col("q") :+
        (lit(lo) + (col("bin") + lit(0.5)) * lit(width)).as("est")): _*)
  }
}
