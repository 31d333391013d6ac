package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine logistic-regression training — closing the loop on the
  * [[TextAnalysis.linearGate]] scan-speed scorer: the gate's weight
  * vector no longer has to arrive from outside the engine; it can be
  * TRAINED on a labeled sample with the same distributed shape every
  * iterative operator here uses (the Lloyd/[[Pca]] pattern: the model
  * is a bounded driver artifact, each step is ONE whole-data aggregate
  * job with the current weights riding in as literals, and the driver
  * loops over a fixed iteration count — never over data).
  *
  * Full-batch gradient descent on the standard cross-entropy loss:
  * ∇_j = (1/n)·Σ x_j·(σ(w·x) − y), w ← w − lr·∇. Features are
  * caller-provided numeric columns plus an implicit intercept.
  *
  * Determinism: the per-step Σ over rows is a double sum whose
  * partial-aggregation order varies, so [[train]] is spec-locked by
  * behavior (loss decreases, separable data converges), not bitwise.
  * The FIRST step from w = 0 is special: σ(0) = 0.5 exactly, so
  * ∇_j·n = Σ x_j·(0.5 − y) = 0.5·Σ x_j·(1 − 2y) — an INTEGER sum when
  * the features are integer-valued — and [[gradStepFromZero]] exposes
  * it as the oracle-checkable query surface (exact BIGINT sums, one
  * final division each).
  */
object LogReg {

  /** The exact first gradient-descent step from w = 0 over
    * integer-valued feature columns. Output: one row per feature
    * (plus `__intercept`) — feature, n, s_int (Σ x_j·(1−2y), exact),
    * grad (6 dp), w_after (6 dp, = −lr·grad before rounding).
    */
  def gradStepFromZero(df: DataFrame, features: Seq[(String, Column)],
      label: Column, lr: Double): DataFrame = {
    require(features.nonEmpty, "need at least one feature")
    val yc = when(label, 1L).otherwise(0L)
    val withF = df.select(
      (features.map { case (n, c) =>
        c.cast("long").as(s"f_$n") } :+ yc.as("y")): _*)
    val aggs = features.map { case (n, _) =>
      sum(col(s"f_$n") * (lit(1L) - col("y") * 2)).as(s"s_$n")
    } :+ sum(lit(1L) - col("y") * 2).as("s___intercept") :+
      count(lit(1)).as("n")
    val row = withF.agg(aggs.head, aggs.tail: _*)
    val names = features.map(_._1) :+ "__intercept"
    val perFeature = names.map { n =>
      val sCol = if (n == "__intercept") col("s___intercept")
        else col(s"s_$n")
      struct(lit(n).as("feature"), col("n").as("n"),
        sCol.as("s_int"))
    }
    def r6(c: Column) = floor(c * 1000000.0 + 0.5) / 1000000.0
    row.select(explode(array(perFeature: _*)).as("r"))
      .select(col("r.feature").as("feature"), col("r.n").as("n"),
        col("r.s_int").as("s_int"))
      .withColumn("grad",
        r6(col("s_int").cast("double") * 0.5 / col("n")))
      .withColumn("w_after",
        r6(col("s_int").cast("double") * 0.5 / col("n") * lit(-lr)))
  }

  /** Full-batch GD training. Each iteration is one aggregate job over
    * the featurized frame (cached once); weights (|features|+1
    * doubles) live on the driver and ride into the job as literals —
    * the bounded-artifact loop shape. Returns (weights, bias) after
    * `iters` steps.
    */
  def train(df: DataFrame, features: Seq[(String, Column)],
      label: Column, lr: Double, iters: Int): (Array[Double], Double) = {
    require(iters >= 0, "iters must be >= 0")
    val yc = when(label, 1.0).otherwise(0.0)
    val withF0 = df.select(
      (features.map { case (n, c) =>
        c.cast("double").as(s"f_$n") } :+ yc.as("y")): _*)
      .filter(features.map(f => col(s"f_${f._1}").isNotNull)
        .reduce(_ && _))
      // corpus-sized featurized frame, re-aggregated every epoch ->
      // durable stage fence (epochs survive executor loss)
    val withF = graft.plans.Fence.corpus(withF0, "logreg_features")
    val k = features.size
    var w = Array.fill(k)(0.0)
    var b = 0.0
    var it = 0
    while (it < iters) {
      val margin = features.zipWithIndex
        .map { case ((n, _), j) => col(s"f_$n") * w(j) }
        .foldLeft(lit(b): Column)(_ + _)
      val p = lit(1.0) / (lit(1.0) + exp(-margin))
      val err = p - col("y")
      val aggs = features.map { case (n, _) =>
        sum(col(s"f_$n") * err).as(s"g_$n") } :+
        sum(err).as("g__b") :+ count(lit(1)).as("n")
      val r = withF.agg(aggs.head, aggs.tail: _*).head()
      val n = r.getAs[Long]("n").toDouble
      w = features.zipWithIndex.map { case ((nm, _), j) =>
        w(j) - lr * r.getAs[Double](s"g_$nm") / n }.toArray
      b = b - lr * r.getAs[Double]("g__b") / n
      it += 1
    }
    (w, b)
  }

  /** Mean cross-entropy loss and accuracy of (w, b) on the frame —
    * the train-loop's progress metric, one aggregate job.
    */
  def lossAndAccuracy(df: DataFrame, features: Seq[(String, Column)],
      label: Column, w: Array[Double], b: Double): (Double, Double) = {
    val yc = when(label, 1.0).otherwise(0.0)
    val margin = features.zipWithIndex
      .map { case ((_, c), j) => c.cast("double") * w(j) }
      .foldLeft(lit(b): Column)(_ + _)
    val p = lit(1.0) / (lit(1.0) + exp(-margin))
    val eps = 1e-12
    val r = df.select(yc.as("y"), p.as("p"))
      .agg(
        avg(-(col("y") * log(col("p") + eps) +
          (lit(1.0) - col("y")) * log(lit(1.0) - col("p") + eps)))
          .as("loss"),
        avg(when((col("p") >= 0.5) === (col("y") === 1.0), 1.0)
          .otherwise(0.0)).as("acc"))
      .head()
    (r.getAs[Double]("loss"), r.getAs[Double]("acc"))
  }
}
