package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy screens for training-data releases — the release-side
  * companion to [[TextAnalysis]]'s PII flag/redact kernels: those find
  * identifiers INSIDE text; these bound what the release's metadata
  * columns reveal about individuals.
  *
  * K-anonymity (Sweeney 2002): a row's quasi-identifier combination
  * must be shared by at least k rows, or it is re-identifiable by
  * joining the release against outside data.
  */
object Privacy {

  /** Two-level k-anonymity screen with a generalization fallback:
    *
    *   - level 0: the row's EXACT quasi-identifier tuple occurs ≥ k
    *     times — release at full precision;
    *   - level 1: otherwise, if its GENERALIZED tuple (the caller's
    *     coarsening — truncated zip, year-only date, bucketed value)
    *     occurs ≥ k times among the rows that FAILED level 0 — release
    *     at the generalized precision;
    *   - level 2: otherwise suppress (route to quarantine).
    *
    * Level-1 groups are counted over level-0 FAILURES only — the rows
    * that would actually be published at that granularity — which is
    * the conservative count for the generalized release (level-0 rows
    * are published at full precision and are not hidden behind the
    * generalized value).
    *
    * Scale shape: two partitioned window counts over the
    * quasi-identifier tuples — no self-joins, no corpus-wide window,
    * partial-aggregation-free but partition-bounded (each frame is one
    * QI group). Skewed QI groups (a single huge segment) are exactly
    * the rows that pass level 0 cheaply.
    *
    * Output: rowId column, anon_level (0/1/2), group_n (the count that
    * decided the level — the level-1 candidate count for suppressed
    * rows).
    */
  def kAnonymize(df: DataFrame, idCol: String, exact: Seq[Column],
      general: Seq[Column], k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).as("row_id"),
      struct(exact: _*).as("__q0"), struct(general: _*).as("__q1"))
    val n0 = count(lit(1)).over(Window.partitionBy(col("__q0")))
    val withN0 = base.withColumn("__n0", n0)
    val n1 = count(when(col("__n0") < k, 1))
      .over(Window.partitionBy(col("__q1")))
    withN0.withColumn("__n1", n1)
      .select(col("row_id"),
        when(col("__n0") >= k, lit(0))
          .when(col("__n1") >= k, lit(1))
          .otherwise(lit(2)).as("anon_level"),
        when(col("__n0") >= k, col("__n0")).otherwise(col("__n1"))
          .as("group_n"))
  }

  /** l-diversity screen — k-anonymity's complement: a QI group can be
    * large (k-anonymous) yet publish a single sensitive value for
    * everyone in it (the homogeneity attack). Each quasi-identifier
    * group must carry ≥ l DISTINCT sensitive values to release.
    *
    * One hash aggregate over the QI tuple (count + count distinct);
    * at corpus scale swap the exact distinct for the HLL sketch per
    * group if the sensitive domain is large — the screen only needs
    * "≥ l", which the sketch answers with bounded error.
    *
    * Output: the quasi columns + n, n_sensitive, diverse (≥ l).
    */
  def lDiversity(df: DataFrame, quasi: Seq[(String, Column)],
      sensitive: Column, l: Int): DataFrame = {
    require(l >= 1, "l >= 1")
    require(quasi.nonEmpty, "need at least one quasi-identifier")
    df.select(quasi.map { case (n, c) => c.as(n) } :+
        sensitive.as("__s"): _*)
      .groupBy(quasi.map(q => col(q._1)): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col("__s")).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }

  /** t-closeness screen (Li, Li & Venkatasubramanian 2007) for an
    * ORDERED sensitive attribute — the skewness-attack check
    * [[lDiversity]] misses (a class can be diverse yet still
    * concentrated in the sensitive tail): each quasi-class's sensitive
    * distribution must sit within Earth-Mover's-Distance `t` of the
    * GLOBAL distribution. For an ordered attribute with m values the
    * EMD is (1/(m−1))·Σ_i |Σ_{j≤i}(p_j − q_j)| — cumulative
    * share-difference mass.
    *
    * Shape: one global value-count aggregate (m rows, broadcast), one
    * (class × value) count aggregate completed against the global
    * value list (absent cells contribute p_j = 0), a class-PARTITIONED
    * cumulative window in value order, one bounded per-class
    * re-aggregation. Shares are one-division rationals; the cumulative
    * sums add in the same value order on both engines.
    *
    * Output per class: quasi..., n, emd (6 dp), close (emd ≤ t).
    */
  def tCloseness(df: DataFrame, quasi: Seq[(String, Column)],
      sensitive: Column, t: Double): DataFrame = {
    require(t > 0, "t must be positive")
    require(quasi.nonEmpty, "need at least one quasi-identifier")
    import org.apache.spark.sql.expressions.Window
    val base = graft.plans.Fence.corpus(
      df.select(quasi.map { case (n, c) => c.as(n) } :+
          sensitive.cast("double").as("__s"): _*)
        .filter(col("__s").isNotNull),
      "tclose_base")
    val qCols = quasi.map(_._1)
    val global = base.groupBy("__s").agg(count(lit(1)).as("gc"))
    val gTot = global.agg(sum("gc").as("gn"),
      count(lit(1)).as("m"))
    val classes = base.groupBy(qCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val cells = base.groupBy((qCols.map(col) :+ col("__s")): _*)
      .agg(count(lit(1)).as("cc"))
    // complete: every class × every global value
    val grid = classes.crossJoin(broadcast(global))
      .join(cells, qCols :+ "__s", "left")
      .withColumn("pc", coalesce(col("cc"), lit(0L)))
    val wC = Window.partitionBy(qCols.map(col): _*).orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, 0)
    def r6(c: Column) = floor(c * 1000000.0 + 0.5) / 1000000.0
    grid.crossJoin(broadcast(gTot))
      .withColumn("d",
        col("pc").cast("double") / col("n") -
          col("gc").cast("double") / col("gn"))
      .withColumn("cum", sum("d").over(wC))
      .groupBy((qCols.map(col) :+ col("n") :+ col("m")): _*)
      // Σ|cum| folds in value order (bounded m rows per class) so the
      // double sum is order-pinned on both engines
      .agg(sort_array(collect_list(struct(col("__s"), col("cum"))))
        .as("cs"))
      .select((qCols.map(col) :+ col("n") :+
        when(col("m") <= 1, lit(0.0))
          .otherwise(r6(aggregate(col("cs"), lit(0.0),
            (a, s) => a + abs(s.getField("cum"))) / (col("m") - 1)))
          .as("emd")): _*)
      .withColumn("close", col("emd") <= t)
  }
}
