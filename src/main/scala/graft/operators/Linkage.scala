package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record-linkage scoring (Fellegi &
  * Sunter 1969) — the decision layer that sits on top of the blocking
  * and verification machinery already here ([[Blocking]] candidate
  * generation, the qF1 Jaccard verify): each candidate pair gets a
  * log-likelihood-ratio score Σ_f w_f, where an agreeing field f
  * contributes log2(m_f/u_f) and a disagreeing one
  * log2((1−m_f)/(1−u_f)) (m = P(agree | match), u = P(agree |
  * non-match)), and two thresholds cut the score line into
  * match / possible (clerical review) / non-match.
  *
  * Scale shape: pure per-pair projection over the CANDIDATE frame —
  * the blocking stage already bounded it to O(n·w); no additional
  * shuffle, no corpus scan. The m/u parameters are bounded driver
  * artifacts (in production estimated by EM over a sample; here
  * caller-supplied), riding in as literals like every other model
  * artifact in the repo.
  *
  * Determinism: the field weights are SNAPPED to 6-dp literals on the
  * driver before entering the plan, so both engines sum identical
  * constants in the same fixed fold order; the score is that exact
  * finite sum, safe to compare unrounded.
  */
object Linkage {

  /** One linkage field: name, per-pair agreement predicate, and the
    * (m, u) conditional-agreement probabilities.
    */
  final case class Field(name: String, agree: Column, m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1, s"$name: m,u must be in (0,1)")
    require(m > u, s"$name: m must exceed u for agreement to be evidence")
    /** 6-dp-snapped agreement weight (log2 m/u). */
    def wAgree: Double =
      math.floor(math.log(m / u) / math.log(2.0) * 1e6 + 0.5) / 1e6
    /** 6-dp-snapped disagreement weight (log2 (1−m)/(1−u), negative). */
    def wDisagree: Double =
      math.floor(math.log((1 - m) / (1 - u)) / math.log(2.0) * 1e6 + 0.5) / 1e6
  }

  /** Score candidate pairs. `pairs` carries whatever join keys the
    * caller's agreement predicates reference. Output: pairs' columns
    * + per-field agreement flags (agree_<name>) + score + decision
    * ('match' | 'possible' | 'non_match').
    */
  def score(pairs: DataFrame, fields: Seq[Field],
      upper: Double, lower: Double): DataFrame = {
    require(fields.nonEmpty, "need at least one field")
    require(upper >= lower, "upper threshold must be >= lower")
    val flagged = fields.foldLeft(pairs) { (df, f) =>
      df.withColumn(s"agree_${f.name}", coalesce(f.agree, lit(false)))
    }
    val scoreCol = fields.map { f =>
      when(col(s"agree_${f.name}"), lit(f.wAgree))
        .otherwise(lit(f.wDisagree))
    }.reduce(_ + _)
    flagged.withColumn("score", scoreCol)
      .withColumn("decision",
        when(col("score") >= upper, "match")
          .when(col("score") <= lower, "non_match")
          .otherwise("possible"))
  }

  /** Agreement-pattern frequency table over candidate pairs: one row
    * per boolean pattern (agree_f1, ..., agree_fk) with its count —
    * the SUFFICIENT STATISTIC for Fellegi-Sunter parameter estimation
    * (2^k rows regardless of pair volume; k fields ⇒ ≤ 2^k patterns).
    * Nulls fail closed to disagreement, like [[score]].
    */
  def agreementPatterns(pairs: DataFrame,
      agreements: Seq[(String, Column)]): DataFrame = {
    require(agreements.nonEmpty, "need at least one field")
    val flagged = agreements.foldLeft(pairs) { case (df, (n, c)) =>
      df.withColumn(s"agree_$n", coalesce(c, lit(false)))
    }
    flagged
      .groupBy(agreements.map { case (n, _) => col(s"agree_$n") }: _*)
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** EM estimation of the Fellegi-Sunter parameters (match prevalence
    * p, per-field m/u) from an agreement-pattern table, assuming
    * conditional independence of fields given match status — the
    * standard unsupervised fit (Winkler 1988). Pure DRIVER arithmetic
    * over the ≤ 2^k pattern rows ([[agreementPatterns]] did the one
    * distributed pass): each iteration is an E-step posterior per
    * pattern and closed-form M-step updates. Deterministic — patterns
    * are processed in sorted order, all inputs exact longs.
    *
    * Returns (p, m, u) after `iters` rounds from the given starting
    * point (starting m > u keeps the match/non-match labeling from
    * swapping — the standard identifiability convention).
    */
  def emFit(patterns: Seq[(Seq[Boolean], Long)], initP: Double,
      initM: Seq[Double], initU: Seq[Double], iters: Int)
      : (Double, Seq[Double], Seq[Double]) = {
    require(patterns.nonEmpty, "empty pattern table")
    val k = patterns.head._1.size
    require(initM.size == k && initU.size == k, "m/u arity mismatch")
    require(patterns.forall(_._1.size == k), "ragged patterns")
    require(iters >= 0, "iters must be >= 0")
    val sorted = patterns.sortBy(_._1.map(b => if (b) "1" else "0")
      .mkString)
    val total = sorted.map(_._2).sum.toDouble
    var p = initP
    var m = initM.toArray
    var u = initU.toArray
    var it = 0
    while (it < iters) {
      // E-step: posterior match probability per pattern
      val post = sorted.map { case (g, n) =>
        val lm = g.zipWithIndex.map { case (a, f) =>
          if (a) m(f) else 1 - m(f) }.product * p
        val lu = g.zipWithIndex.map { case (a, f) =>
          if (a) u(f) else 1 - u(f) }.product * (1 - p)
        (g, n, lm / (lm + lu))
      }
      // M-step: closed-form updates
      val wSum = post.map { case (_, n, w) => n * w }.sum
      p = wSum / total
      m = Array.tabulate(k) { f =>
        post.map { case (g, n, w) => if (g(f)) n * w else 0.0 }.sum /
          wSum }
      u = Array.tabulate(k) { f =>
        post.map { case (g, n, w) =>
          if (g(f)) n * (1 - w) else 0.0 }.sum / (total - wSum) }
      it += 1
    }
    (p, m.toSeq, u.toSeq)
  }

  /** Collect an [[agreementPatterns]] frame into the driver form
    * [[emFit]] consumes (bounded: ≤ 2^k rows).
    */
  def collectPatterns(patternDf: DataFrame): Seq[(Seq[Boolean], Long)] = {
    val flagCols = patternDf.columns.filter(_.startsWith("agree_"))
    patternDf.collect().map { r =>
      (flagCols.map(c => r.getAs[Boolean](c)).toSeq,
        r.getAs[Long]("n_pairs"))
    }.toSeq
  }
}
