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
}
