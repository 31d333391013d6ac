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
}
