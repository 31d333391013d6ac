package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter-accelerated exact-dup screening of a new batch against a
  * standing corpus — the join-avoidance pattern for incremental ingestion:
  * instead of anti-joining today's crawl against 10^11 standing hashes
  * (a corpus-sized shuffle every day), the standing hashes aggregate ONCE
  * into a fixed-size Bloom sketch (distributed build, map-side merged),
  * the batch probes it at scan speed, and only the bloom-POSITIVE rows
  * (true dups + an fpp-sized sliver of false positives) pay the exact
  * confirmation join. Output is exact — the bloom only routes rows, the
  * confirm join removes its false positives.
  *
  * Sizing invariant: the sketch is ~1.2 bytes/item at 1% fpp, built
  * distributedly but held on the driver and broadcast — 10^9 standing
  * docs ≈ 1.2 GB, the practical ceiling for one sketch. Beyond that,
  * shard the corpus and screen against per-shard sketches (same code,
  * bounded pieces). `expectedItems` is that budget knob, not a guess.
  *
  * The probe is a Scala UDF (non-codegen) by design: Spark's own
  * BloomFilterMightContain expression is internal to runtime filtering,
  * and the probe's per-row cost (two hashes + bit tests) dwarfs the
  * interpretation overhead — the win here is the removed shuffle, which
  * PlanSpec-style assertions can't miss.
  */
object BloomScreen {

  /** Screen rows where `isNew` against the rest of `df` by exact content
    * hash. Output: doc_id, is_dup (confirmed exact duplicate of at least
    * one old row — no false positives survive).
    */
  def exactScreen(df: DataFrame, idCol: String, textCol: String,
      isNew: Column, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    // Fenced once (3 small columns/row): the bloom build plus three
    // consumers below would otherwise re-scan and re-hash the corpus
    // four times. NULL text hashes to null and can never be an exact
    // dup of anything — dropped from the old side, screened as
    // not-dup on the new side (the probe also null-guards).
    val hashed = graft.plans.Fence.corpus(
      df.select(col(idCol).as("doc_id"),
        md5(col(textCol)).as("h"), isNew.as("is_new")),
      "bloom_hashed")
    val old = hashed.filter(!col("is_new") && col("h").isNotNull)
    val bloom = old.stat.bloomFilter("h", math.max(expectedItems, 1L), fpp)
    val bc = df.sparkSession.sparkContext.broadcast(bloom)
    val probe = udf((h: String) =>
      h != null && bc.value.mightContainString(h))
    val newRows = hashed.filter(col("is_new"))
    // only bloom-positive candidates reach the exchange; the semi join
    // confirms against the true hash set (fpp-sized false-positive cost)
    val confirmed = newRows.filter(probe(col("h")))
      .hint("shuffle_hash")
      .join(old.select(col("h")).distinct().hint("shuffle_hash"),
        Seq("h"), "left_semi")
      .select(col("doc_id"), lit(true).as("is_dup"))
    newRows.select(col("doc_id"))
      .join(confirmed.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"))
  }
}
