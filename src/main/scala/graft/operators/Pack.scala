package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch assembly: concatenate every
  * document's tokens in doc-id order and split the stream every
  * `contextLen` tokens (the standard pretraining packing — documents
  * straddle pack boundaries rather than leaving pad waste).
  *
  * The core is a GLOBAL running token offset per document. The naive form
  * is `sum(ntok) OVER (ORDER BY doc_id)` — an unpartitioned window, i.e.
  * every row through ONE task: a non-starter at 100 TB. This implements
  * the classic two-phase distributed prefix sum instead:
  *
  *   1. bucket docs into ordered blocks (`block = doc_id div blockLen` —
  *      any order-preserving range bucketing works);
  *   2. per-block token totals (one partial-aggregated shuffle of
  *      |blocks| rows) → running block offsets (a window over the TINY
  *      aggregated frame — the only single-partition step, bounded by
  *      |corpus| / blockLen rows, and broadcast back);
  *   3. within-block running sums (window partitioned by block — fully
  *      parallel) + the block offset = the global offset.
  *
  * Result is identical to the global window because `block` is monotonic
  * in `doc_id`, so (block asc, doc_id asc) IS the global doc order.
  */
object Pack {

  /** Pack-segment assignment: one output row per (document, pack) overlap.
    *
    * Output: doc_id, pack_id, seg_start (offset of the segment inside the
    * pack), seg_tokens (tokens the doc contributes to that pack). A doc
    * spanning k boundaries emits k+1 rows. Docs with zero tokens are
    * dropped (they occupy no stream positions).
    */
  def packSequences(df: DataFrame, idCol: String, nTok: Column,
      contextLen: Long, blockLen: Long): DataFrame = {
    require(contextLen > 0 && blockLen > 0, "contextLen/blockLen must be > 0")
    // Materialize the 3-long-per-doc frame once: both phases below read
    // it, and a lazy frame would re-evaluate the ENTIRE upstream chain
    // (e.g. q86's dedup gate + sampling) per consumer. 24 bytes/doc —
    // the cheapest possible fence.
    val docs0 = df
      .select(col(idCol).cast("long").as("doc_id"), nTok.cast("long").as("ntok"))
      .filter(col("ntok") > 0)
      .withColumn("block", expr(s"doc_id div $blockLen"))
    val docs = graft.plans.Fence.corpus(docs0, "pack_docs")

    // Phase 2: block totals → running offsets. |blocks| rows only; the
    // single-partition window here is over the aggregated frame, never
    // the corpus (PlanSpec asserts the corpus-side window partitions by
    // block).
    val wBlocks = Window.orderBy("block")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = docs.groupBy("block").agg(sum("ntok").as("btok"))
      .select(col("block"),
        coalesce(sum("btok").over(wBlocks), lit(0L)).as("boff"))

    // Phase 3: within-block prefix + block offset = global stream offset.
    val wIn = Window.partitionBy("block").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withStart = docs.join(broadcast(offsets), "block")
      .withColumn("start",
        col("boff") + coalesce(sum("ntok").over(wIn), lit(0L)))

    // A doc covering stream positions [start, start+ntok) overlaps packs
    // floor(start/C) .. floor((start+ntok-1)/C); emit each overlap with
    // its in-pack offset and length.
    withStart
      .withColumn("pack_id", explode(sequence(
        expr(s"start div $contextLen"),
        expr(s"(start + ntok - 1) div $contextLen"))))
      .select(col("doc_id"), col("pack_id"),
        (greatest(col("start"), col("pack_id") * contextLen) -
          col("pack_id") * contextLen).as("seg_start"),
        (least(col("start") + col("ntok"), (col("pack_id") + 1) * contextLen) -
          greatest(col("start"), col("pack_id") * contextLen))
          .as("seg_tokens"))
  }

  /** Size-balanced bin assignment: row i goes to bin
    * floor(cumBytes(i) / targetBytes) in id order — the scheduling
    * primitive for multimodal/GPU batch assembly ("fill each batch to
    * ~64 MB of payload") and for size-bounded shard writes. Unlike
    * [[packSequences]] rows are atomic (a row never splits across bins),
    * so a bin can exceed the target by at most one row's size.
    *
    * Same two-phase distributed prefix sum; the per-row frame is
    * materialized once ([[packSequences]]'s fence rationale).
    *
    * Output: doc_id, bytes, bin.
    */
  def binPackBySize(df: DataFrame, idCol: String, bytesCol: Column,
      targetBytes: Long, blockLen: Long): DataFrame = {
    require(targetBytes > 0 && blockLen > 0,
      "targetBytes/blockLen must be > 0")
    val rows0 = df
      .select(col(idCol).cast("long").as("doc_id"),
        bytesCol.cast("long").as("bytes"))
      .withColumn("block", expr(s"doc_id div $blockLen"))
    val rows = graft.plans.Fence.corpus(rows0, "pack_rows")
    val wBlocks = Window.orderBy("block")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = rows.groupBy("block").agg(sum("bytes").as("bb"))
      .select(col("block"),
        coalesce(sum("bb").over(wBlocks), lit(0L)).as("boff"))
    val wIn = Window.partitionBy("block").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    rows.join(broadcast(offsets), "block")
      .withColumn("start",
        col("boff") + coalesce(sum("bytes").over(wIn), lit(0L)))
      .select(col("doc_id"), col("bytes"),
        expr(s"start div $targetBytes").as("bin"))
  }
}
