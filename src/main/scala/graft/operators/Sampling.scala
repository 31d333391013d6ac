package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Deterministic stratified sampling — the data-mixing primitive of a
  * training pipeline ("keep 30% of crawl, 100% of books, 50% of en, …").
  *
  * Membership is decided by a portable salted hash of the row id, NOT
  * `rand()`: the sample is reproducible across engines, runs, executors,
  * and repartitions, and stable under re-ingestion — appending new rows
  * never flips the decision for existing ones (the property that keeps a
  * resumed pipeline consistent with its earlier shards).
  *
  * Scale: a pure per-row projection + filter — no shuffle, no state; the
  * rate table is a broadcast-sized CASE chain folded into the scan.
  */
object Sampling {

  /** Keep each row iff hash(salt:id) mod 10000 < rate(stratum)·10000.
    * `rates` maps stratum values to [0,1] keep-rates; unlisted strata use
    * `defaultRate`. Adds `bucket` (the hash draw in [0,10000)) so the
    * decision is auditable downstream.
    */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = "sample"): DataFrame = {
    require((defaultRate +: rates.values.toSeq).forall(r => r >= 0 && r <= 1),
      "rates must be in [0,1]")
    val bucket = pmod(TextOps.hash32(
      concat(lit(s"$salt:"), col(idCol).cast("string"))), lit(10000))
    val rateCol: Column = rates.foldLeft(lit(defaultRate)) {
      case (acc, (stratum, r)) =>
        when(col(stratumCol) === stratum, lit(r)).otherwise(acc)
    }
    // floor(x + 0.5): a bare cast truncates the IEEE product, so a rate
    // like 0.57 (double 5699.999...) would yield threshold 5699 instead
    // of the documented rate·10000 = 5700
    df.withColumn("bucket", bucket)
      .filter(col("bucket") < floor(rateCol * 10000.0 + 0.5).cast("long"))
  }

  /** Mixture upsampling with replacement — the "books ×2.5, crawl ×0.4"
    * epoch-weighting step of a training mix. Every row is replicated
    * floor(weight) times plus one more iff its salted hash draw lands
    * under frac(weight) — so expected copies = weight exactly, decided
    * deterministically per row (reproducible, repartition-stable, and
    * append-stable like [[stratified]]).
    *
    * Scale: per-row `explode(sequence(...))` — no shuffle; the weight
    * table is a literal CASE chain folded into the scan.
    *
    * Output: the input row + copy_idx (1..n_copies); rows with zero
    * copies are dropped.
    */
  def upsample(df: DataFrame, idCol: String, stratumCol: String,
      weights: Map[String, Double], defaultWeight: Double,
      salt: String = "mix"): DataFrame = {
    require((defaultWeight +: weights.values.toSeq).forall(_ >= 0),
      "weights must be >= 0")
    val draw = pmod(TextOps.hash32(
      concat(lit(s"$salt:"), col(idCol).cast("string"))), lit(10000))
    val wCol: Column = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (stratum, w)) =>
        when(col(stratumCol) === stratum, lit(w)).otherwise(acc)
    }
    val copies = floor(wCol).cast("long") +
      when(draw < floor((wCol - floor(wCol)) * 10000.0 + 0.5).cast("long"),
        1L).otherwise(0L)
    df.withColumn("n_copies", copies)
      .filter(col("n_copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(1L), col("n_copies"))))
      .drop("n_copies")
  }
}
