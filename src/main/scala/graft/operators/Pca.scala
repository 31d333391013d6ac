package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Distributed top-principal-component extraction over an embedding
  * column — the standard embedding post-process (centering + dominant
  * direction, cf. "All-but-the-Top", Mu & Viswanath 2018) a training
  * pipeline runs before indexing or whitening.
  *
  * Scale shape ("statistics fit, the data doesn't"): ONE partial-
  * aggregated pass ships a (d + d²)-element moment buffer per partition
  * (mean and E[xxᵀ] together — d=64 → 33 KB buffers, independent of
  * corpus size); the covariance eigenvector is power-iterated DRIVER-
  * side on the d×d matrix (a bounded artifact, like the IVF codebook);
  * scoring is a zero-shuffle per-row projection with the component as a
  * literal. The corpus is read exactly twice (moments, scores) and
  * never shuffled.
  *
  * Cross-engine determinism (the qC0 oracle replays this in SQL):
  * covariance entries round to 1e-6 and each iterate to 1e-9 — the
  * same per-stage fixpoint rounding PageRank/k-means use — so
  * partial-aggregation sum order can't drift the eigenvector; the
  * all-positive deterministic init (1/√d) pins the sign.
  */
object Pca {

  private def round(x: Double, grid: Double): Double =
    math.floor(x * grid + 0.5) / grid

  /** The dominant covariance eigenvector after `iters` power
    * iterations. Returns (mean rounded 1e-6, component rounded 1e-9).
    *
    * The moment pass is mapPartitions on purpose — the one sanctioned
    * use (genuine per-partition imperative state): building the d+d²
    * outer-product row through nested `transform` HOFs is
    * CodegenFallback-interpreted, allocates a d²-element array PER ROW,
    * and measured 60× slower at sf0.1. Here each partition folds its
    * rows into one primitive moment array (d + d² multiply-adds per
    * row, zero per-row allocation) and ships exactly one buffer — the
    * classic treeAggregate shape, O(partitions · d²) driver merge.
    */
  def topComponent(df: DataFrame, vecCol: String, dim: Int,
      iters: Int = 3): (Array[Double], Array[Double]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = df
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .as[Seq[Double]]
      .mapPartitions { it =>
        val sums = new Array[Double](dim + dim * dim)
        var n = 0L
        it.foreach { v =>
          if (v != null && v.length >= dim) {
            var i = 0
            while (i < dim) {
              val xi = v(i)
              sums(i) += xi
              var j = 0
              val base = dim + i * dim
              while (j < dim) { sums(base + j) += xi * v(j); j += 1 }
              i += 1
            }
            n += 1
          }
        }
        Iterator((sums, n))
      }.collect()
    val row = new Array[Double](dim + dim * dim)
    var n = 0L
    parts.foreach { case (s, pn) =>
      var i = 0
      while (i < row.length) { row(i) += s(i); i += 1 }
      n += pn
    }
    require(n > 0, "empty input")
    val mean = Array.tabulate(dim)(i => round(row(i) / n, 1e6))
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      round(row(dim + i * dim + j) / n - mean(i) * mean(j), 1e6)
    }
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim) { i =>
        var s = 0.0
        var j = 0
        while (j < dim) { s += cov(i)(j) * v(j); j += 1 }
        s
      }
      val nrm = math.sqrt(w.map(x => x * x).sum)
      // zero covariance (all vectors identical): the iterate vanishes;
      // keep the current direction instead of dividing 0/0 into NaNs
      if (nrm > 0.0) v = w.map(x => round(x / nrm, 1e9))
    }
    (mean, v)
  }

  /** Per-row projection onto the top component: (id, pc1) with pc1 the
    * centered dot product, 4-dp rounded.
    */
  def topComponentScores(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, iters: Int = 3): DataFrame = {
    GraftFunctions.registerAll(df.sparkSession)
    val (mean, v) = topComponent(df, vecCol, dim, iters)
    val centered = zip_with(
      transform(col(vecCol), x => x.cast("double")),
      typedLit(mean.toSeq), (a, b) => a - b)
    df.select(col(idCol).as("vec_id"),
      graft.functions.SafeOps.stableRound4(
        GraftFunctions.vecDot(centered, typedLit(v.toSeq))).as("pc1"))
  }
}
