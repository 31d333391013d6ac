package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4 / builder contract "skewed
  * keys → salting or AQE skew-join").
  *
  * AQE's skew-join handling covers joins; heavily-skewed *aggregations*
  * (a handful of hot group keys holding most rows — the classic shape of
  * per-site or per-AS rollups at 100 TB) still funnel one key into one
  * task. `saltedAgg` runs the classic two-phase rewrite: salt the key,
  * partially aggregate per (key, salt), then combine per key — legal for
  * any algebraic aggregate (sum/count/min/max).
  */
object Skew {

  /** Two-phase salted aggregation: partial per (keys, salt) then final per
    * keys. `partials` maps output column name → (row-level partial
    * expression, salt-level combiner over the partial column).
    * Example: count → (lit(1L) summed, sum of partials); sum(x) →
    * (sum(x), sum).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int)(
      partials: Seq[(String, Column, String => Column)]): DataFrame = {
    require(saltBuckets > 1, "saltBuckets must be > 1")
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head._2.as(s"__p_${partials.head._1}"),
        partials.tail.map(p => p._2.as(s"__p_${p._1}")): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(partials.head._3(s"__p_${partials.head._1}")
        .as(partials.head._1),
        partials.tail.map(p => p._3(s"__p_${p._1}").as(p._1)): _*)
  }

  /** Convenience: salted count + sum over one value column. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBuckets: Int = 16): DataFrame =
    saltedAgg(df, keys, saltBuckets)(Seq(
      ("cnt", count(lit(1)), c => sum(col(c))),
      ("total", sum(col(valueCol)), c => sum(col(c)))))

  /** Salted equi-join for a skewed fact side that AQE can't fix (AQE
    * splits oversized SHUFFLE partitions, but only post-shuffle and only
    * within one stage — persistent hot keys re-skew every downstream
    * stage, and a broadcast is off the table when the dim side is too
    * big). Classic rewrite: salt the fact key into `saltBuckets`
    * sub-keys, replicate each dim row once per bucket, equi-join on
    * (key, salt). The hot key's rows now spread over `saltBuckets` tasks
    * at the cost of a `saltBuckets`x dim replication — use for
    * large-fact x medium-dim joins with a known-skewed fact.
    *
    * Inner and left-outer only (replication preserves their semantics:
    * each fact row still matches exactly the dim rows of its key).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      saltBuckets: Int = 16, joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 1, "saltBuckets must be > 1")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"unsupported join type for salting: $joinType")
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)).cast("int"))
    // shuffle-pin the replicated dim: hash co-partitioning on
    // (key, salt) is the whole point — letting AQE broadcast the
    // replicas would just multiply the broadcast by saltBuckets
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
      .hint("shuffle_hash")
    saltedFact.join(replicatedDim, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Hot-key detection in ONE pass via Count-Min sketch — the decision
    * input the salting rewrites need. At 100 TB you cannot afford a full
    * `groupBy(key).count()` (that shuffle IS the skew problem) just to
    * learn which keys are hot; the CMS aggregates map-side into a fixed
    * `depth×width` counter grid (mergeable, no shuffle of data rows) and
    * the driver then probes only the candidate keys.
    *
    * `candidates`: keys worth probing — typically a cheap distinct sample
    * or domain knowledge. CMS never under-counts, so every truly-hot key
    * is returned (one-sided error); an over-threshold estimate for a cold
    * key can occur with probability ~1/e^depth and at worst wastes one
    * salt decision.
    *
    * Returns candidate keys whose estimated count ≥ threshold, with
    * estimates.
    */
  def hotKeys(df: DataFrame, keyCol: String, candidates: Seq[String],
      threshold: Long, eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): Seq[(String, Long)] = {
    val cms = df.select(col(keyCol).cast("string").as("k"))
      .stat.countMinSketch("k", eps, confidence, seed)
    candidates.flatMap { k =>
      val est = cms.estimateCount(k)
      if (est >= threshold) Some(k -> est) else None
    }
  }
}
