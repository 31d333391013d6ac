package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD'03 §4) — the MOSS algorithm: hash every k-token shingle,
  * slide a window of w consecutive hashes, select each window's
  * minimum (rightmost on ties), keep the distinct (position, hash)
  * selections. The guarantee that makes it a dedup primitive: any
  * match of at least w+k−1 tokens between two documents shares at
  * least one selected fingerprint, while the fingerprint density is
  * ~2/(w+1) — a tunable, position-aware sample, unlike MinHash (which
  * estimates whole-document similarity) or the dup-span cutters
  * (which need exact block equality).
  *
  * Scale shape: fingerprint selection is a per-row HOF pipeline
  * (shingle → hash → windowed argmin → distinct) — zero shuffles,
  * whole-stage codegen, fused into the scan. Pair generation is the
  * standard capped inverted index ([[Dedup.ngramJaccardPairs]]'s
  * shape): shuffle on the fingerprint hash, never a corpus broadcast.
  *
  * Short-document convention: a doc with 0 < n < w shingle hashes
  * gets one degenerate window over all of them (≥ 1 fingerprint per
  * non-trivial doc); docs shorter than k tokens have none.
  */
object Winnow {

  /** Exploded fingerprint table: (doc_id, pos, fp) — `pos` is the
    * 0-based shingle position the fingerprint was selected at, `fp`
    * the portable 32-bit shingle hash ([[TextOps.hash32]] form).
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(k >= 1, "k >= 1 (shingle width)")
    require(w >= 1, "w >= 1 (window width)")
    // the one-pass codegen kernel (shingle hash → window argmin →
    // distinct, packed (pos<<32)|hash) — an HOF formulation interprets
    // every window step per row; semantics are identical and the
    // oracle replays them as the windowed frame-min + rightmost join
    graft.functions.GraftFunctions.registerAll(df.sparkSession)
    df.select(col(idCol).as("doc_id"),
        explode(call_function("winnow_select",
          TextOps.tokens(col(textCol)), lit(k), lit(w))).as("pk"))
      .select(col("doc_id"),
        shiftright(col("pk"), 32).cast("int").as("pos"),
        col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("fp"))
  }

  /** Candidate pairs sharing fingerprints: capped inverted index on
    * the fingerprint hash (`maxPosting` drops boilerplate fingerprints
    * shared by more than that many docs — the [[Dedup]] hot-key
    * guard), shuffle-pinned self-join, shared-count per pair.
    * Output: doc_a, doc_b, shared_fps.
    */
  def sharedFingerprintPairs(fps: DataFrame,
      maxPosting: Int = Int.MaxValue): DataFrame = {
    val inv0 = fps.select(col("doc_id"), col("fp")).distinct()
    val pruned =
      if (maxPosting == Int.MaxValue) inv0
      else {
        val hot = inv0.groupBy("fp").agg(count(lit(1)).as("n"))
          .filter(col("n") > maxPosting)
        inv0.join(hot, Seq("fp"), "left_anti")
      }
    val inv = pruned.hint("shuffle_hash")
    inv.as("x").join(inv.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
  }
}
