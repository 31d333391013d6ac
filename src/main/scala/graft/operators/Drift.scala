package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between two binned count tables —
  * the reusable core of the qB2 drift gate, shaped for the streaming
  * screen: both inputs are already-aggregated histograms (|bins| rows,
  * broadcast-sized), so the math is a full-outer join of two tiny
  * frames no matter how large the corpora that produced them were.
  * Laplace +1 smoothing keeps one-sided bins finite; contributions are
  * exact expressions over integer counts.
  */
object Drift {

  /** Per-bin PSI contributions. Inputs: (bin, n) tables. Output:
    * bin, n_a, n_b, psi.
    */
  def psiContributions(a: DataFrame, b: DataFrame): DataFrame = {
    val counts = a.select(col("bin"), col("n").as("n_a"))
      .join(b.select(col("bin"), col("n").as("n_b")), Seq("bin"),
        "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
    val tot = counts.agg(sum("n_a").as("t_a"), sum("n_b").as("t_b"),
      count(lit(1)).as("nbins"))
    val pa = (col("n_a") + 1).cast("double") /
      (col("t_a") + col("nbins")).cast("double")
    val pb = (col("n_b") + 1).cast("double") /
      (col("t_b") + col("nbins")).cast("double")
    counts.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_a"), col("n_b"),
        ((pa - pb) * log(pa / pb)).as("psi"))
  }

  /** Headline PSI: the summed contributions (driver-side over the tiny
    * bin frame). Common reading: < 0.1 stable, 0.1–0.25 moderate
    * shift, > 0.25 action.
    */
  def psiTotal(a: DataFrame, b: DataFrame): Double =
    // coalesce: sum over zero rows is null (both histograms empty) —
    // an empty-vs-empty comparison has zero drift, not an NPE
    psiContributions(a, b).agg(coalesce(sum("psi"), lit(0.0)))
      .collect()(0).getDouble(0)
}
