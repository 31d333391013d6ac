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

  /** Temperature-scaled mixture sampling (the multilingual-LM recipe:
    * p_s ∝ c_s^α with α<1 flattens the stratum distribution so
    * low-resource strata keep proportionally more). Per-stratum keep
    * rate = min(1, targetFraction·N·c_s^α / (Σ_t c_t^α · c_s)), decided
    * per row by the same portable salted hash as [[stratified]].
    *
    * α is fixed at 0.5 so the power is `sqrt` — IEEE-correctly-rounded
    * in every engine — and the per-stratum √c is FIXED-POINTED to 1e-6
    * (`floor(sqrt(c)·10⁶)` as an integer) before the cross-strata sum:
    * a raw double Σ√c would depend on summation order and could flip a
    * row at the keep-threshold boundary between engines/runs. With
    * integer sums, every arithmetic step is bit-reproducible.
    *
    * Scale: two tiny aggregates (|strata| rows) + a broadcast join of
    * the rates back onto the corpus — one map-side decision per row, no
    * corpus shuffle.
    */
  def temperatureMixture(df: DataFrame, idCol: String, stratumCol: String,
      targetFraction: Double, salt: String = "temp"): DataFrame = {
    require(targetFraction > 0 && targetFraction <= 1,
      "targetFraction must be in (0,1]")
    val counts = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("c"))
      .withColumn("sp", floor(sqrt(col("c")) * 1e6).cast("long"))
    val tot = counts.agg(sum("c").as("n_total"),
      sum("sp").as("sum_sp"))
    val rates = counts.crossJoin(broadcast(tot))
      .select(col("stratum"),
        // (T·(N/c))·(sp/SP): divide-before-multiply keeps every
        // operand under 2^53 (an SP·c integer product would overflow
        // long at corpus scale) and the op sequence identical in any
        // IEEE engine
        least(lit(1.0), lit(targetFraction) *
          (col("n_total").cast("double") / col("c").cast("double")) *
          (col("sp").cast("double") / col("sum_sp").cast("double")))
          .as("rate"))
    val bucket = pmod(TextOps.hash32(
      concat(lit(s"$salt:"), col(idCol).cast("string"))), lit(10000))
    df.join(broadcast(rates), col(stratumCol) === col("stratum"))
      .withColumn("bucket", bucket)
      .filter(col("bucket") <
        floor(col("rate") * 10000.0 + 0.5).cast("long"))
      .drop("stratum")
  }

  /** Weighted sampling WITHOUT replacement, k per stratum
    * (Efraimidis–Spirakis via exponential keys): draw u ~ hash-uniform
    * (0,1], keep the k smallest e = -ln(u)/w. Rows with weight w are
    * selected with probability proportional to w, no row twice, and the
    * sample is reproducible and stable under re-ingestion (each row's
    * key never changes; only the rank-k cutoff can).
    *
    * Scale: one window per stratum — Spark's WindowGroupLimit plants a
    * partial top-k BEFORE the exchange for row_number()<=k filters, so
    * the shuffle carries ≤k rows per stratum per input partition, not
    * the corpus.
    */
  def weightedSampleK(df: DataFrame, idCol: String, stratumCol: String,
      weight: Column, k: Int, salt: String = "wsample"): DataFrame = {
    val u = (pmod(TextOps.hash32(concat(lit(s"$salt:"),
      col(idCol).cast("string"))), lit(1000000)) + 1) / 1000000.0
    val keyed = df.withColumn("w", weight)
      .filter(col("w") > 0)
      .withColumn("e", -log(u) / col("w"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol).orderBy(col("e"), col(idCol))
    keyed.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
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

  /** Leakage-free per-key TEMPORAL train/eval split: within each key the
    * first num/den fraction of time-ordered rows are "train", the rest
    * "eval" — the split an evaluation needs when the model must never
    * see a key's future (a hash split like q59 leaks later events of a
    * training user into eval). The boundary is pure integer arithmetic
    * (rn·den ≤ num·n), so there is no ceil-of-a-double edge to disagree
    * on across engines, and ties order by (ts, id) deterministically.
    *
    * Scale: one key-partitioned window pass (rank + per-key total in
    * the same window shuffle); per-key state is the sort, bounded by
    * per-key activity like every sessionization-shaped op here.
    */
  def temporalSplit(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, num: Int, den: Int): DataFrame = {
    require(num >= 0 && den > 0 && num <= den,
      "split fraction must be a rational in [0, 1]")
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(keyCol)
    val ordered = byKey.orderBy(col(tsCol), col(idCol))
    df.withColumn("rn", row_number().over(ordered).cast("long"))
      .withColumn("n", count(lit(1)).over(byKey))
      .withColumn("split",
        when(col("rn") * den <= col("n") * num, "train")
          .otherwise("eval"))
      .drop("rn", "n")
  }

  /** Leakage-safe train/val/test split: assignment by salted hash of
    * the document's dedup CANONICAL id, so every member of a duplicate
    * component lands in the same split. A plain per-doc hash split
    * (q59) contaminates evaluation: a near-dup of a training document
    * lands in test with probability (1 − train share), and at
    * web-corpus duplication rates that is a large, systematic
    * test-set leak — the complement of [[temporalSplit]]'s
    * future-leak guard, for the duplication axis.
    *
    * `canonical`: a (doc_id, canonical) mapping — exact-hash keep-min
    * groups or [[Dedup.canonicalAssignment]]'s component output; docs
    * absent from the mapping are their own canonical (left join +
    * coalesce). Buckets are integer thousandths of the portable hash
    * ([[TextOps.hash32]] of salt|canonical), so the assignment is
    * reproducible in any engine and stable under re-partitioning.
    *
    * Scale: one shuffle join on doc_id (the mapping is corpus-sized —
    * never broadcast) + a scan-speed bucket projection.
    *
    * Output: doc_id, canonical, bucket (0-999), split.
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String,
      canonical: DataFrame, splits: Seq[(String, Double)],
      salt: String = "split"): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split ratios must sum to 1")
    val thresholds = splits.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.round(c * 1000.0))
    val bucket = pmod(TextOps.hash32(
      concat(lit(salt + "|"), col("canonical").cast("string"))), lit(1000L))
    val labeled = splits.map(_._1).zip(thresholds)
      .foldRight(lit(null).cast("string")) { case ((name, hi), els) =>
        when(col("bucket") < hi, name).otherwise(els)
      }
    docs.select(col(idCol).as("doc_id"))
      .join(canonical.select(col("doc_id"), col("canonical")),
        Seq("doc_id"), "left")
      .withColumn("canonical", coalesce(col("canonical"), col("doc_id")))
      .withColumn("bucket", bucket)
      .withColumn("split", labeled)
  }

  /** Temperature-weighted domain mixture plan — the "how much of each
    * source goes into the next training run" table (the UL2/PaLM-style
    * mixing rule: target share ∝ tokens^T, T<1 flattening the head so a
    * dominant crawl source doesn't drown the small curated ones; T=1 is
    * proportional, T=0 uniform).
    *
    * For each stratum: its token mass, temperature share, target token
    * budget, the sampling rate that hits the target (rate > 1 ⇒ the
    * source repeats), and the epoch count ⌈rate⌉ a loader needs.
    *
    * Scale: one partial-aggregated groupBy to the |strata|-row table,
    * then the Σ tokens^T normalizer joins back as a broadcast scalar —
    * the corpus is scanned exactly once, everything downstream is
    * bounded by |strata|.
    *
    * Output: stratum, toks, share, target_toks, rate, epochs — ordered
    * upstream of any caller's ORDER BY only by the grouping hash, so
    * callers sort.
    */
  def mixturePlan(df: DataFrame, stratumCol: String, textCol: String,
      temperature: Double, budgetTokens: Long): DataFrame = {
    require(temperature >= 0.0, "temperature must be non-negative")
    val perSource = df
      .groupBy(col(stratumCol).as("stratum"))
      .agg(sum(size(TextOps.tokens(col(textCol))).cast("long")).as("toks"))
      .withColumn("w", pow(col("toks").cast("double"), lit(temperature)))
    val total = perSource.agg(sum("w").as("w_total"))
    perSource.crossJoin(broadcast(total))
      .select(
        col("stratum"), col("toks"),
        graft.functions.SafeOps.stableRound4(col("w") / col("w_total"))
          .as("share"),
        floor(lit(budgetTokens.toDouble) * (col("w") / col("w_total")) +
          lit(0.5)).cast("long").as("target_toks"))
      .withColumn("rate",
        graft.functions.SafeOps.stableRound4(
          col("target_toks").cast("double") / col("toks")))
      .withColumn("epochs",
        ceil(col("target_toks").cast("double") / col("toks")).cast("long"))
  }

  /** Deterministic contrastive NEGATIVE sampling: k pseudo-random
    * corpus negatives per probe row — the pair-assembly step of
    * contrastive/embedding training (in-batch negatives aside, hard
    * pipelines persist explicit negatives with the example).
    *
    * The naive form joins probes × corpus and ranks per probe — a cross
    * join, dead at corpus scale. This ranks the corpus ONCE in a salted
    * pseudo-random global order ([[Order.globalIndex]] — the two-phase
    * block ranking, no global window), gives each probe a block of k+1
    * CONSECUTIVE positions starting at its own hash draw mod N, and
    * equi-joins those positions back against the ranked corpus:
    * O(probes·k) join rows total. The +1 spare covers the probe itself
    * landing inside its own block (filtered, first k kept). Fully
    * reproducible across runs/engines: both the corpus order and each
    * probe's start are portable salted hashes.
    *
    * Output: probe_id, neg_rank (1..k), neg_id.
    */
  def negatives(docs: DataFrame, idCol: String, isProbe: Column, k: Int,
      salt: String = "neg"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "k must be positive")
    val idx = Order.globalIndex(docs, idCol, salt)
      .select(col("doc_id"), col("pos"))
    val nRow = idx.agg(count(lit(1)).as("n"))
    val cand = docs.filter(isProbe).select(col(idCol).as("probe_id"))
      .crossJoin(broadcast(nRow))
      .withColumn("start", pmod(TextOps.hash32(
        concat(lit(s"$salt:probe:"), col("probe_id").cast("string"))),
        col("n")))
      .select(col("probe_id"), col("n"), col("start"),
        explode(sequence(lit(0L), lit(k.toLong))).as("j"))
      .withColumn("pos", pmod(col("start") + col("j"), col("n")))
    val w = Window.partitionBy("probe_id").orderBy("j")
    cand.join(idx.hint("shuffle_hash"), Seq("pos"))
      .filter(col("doc_id") =!= col("probe_id"))
      .withColumn("neg_rank", row_number().over(w).cast("long"))
      .filter(col("neg_rank") <= k)
      .select(col("probe_id"), col("neg_rank"), col("doc_id").as("neg_id"))
  }
}
