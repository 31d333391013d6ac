package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Sliding-window document chunking — the retrieval/embedding prep step
  * (RAG corpora, long-document encoders): each document becomes
  * overlapping windows of `window` tokens taken every `stride` tokens.
  *
  * Scale: a pure per-row flatMap (`explode` of a `sequence` of start
  * offsets) — no shuffle, no state, stays inside whole-stage codegen.
  * Chunk identity is a portable content hash so downstream exact-dedup of
  * chunks (the common follow-on) needs no re-tokenization.
  */
object Chunk {

  /** One row per (doc, window start). Output: doc_id, chunk_idx,
    * chunk_start (token offset), n_chunk_tokens, chunk_hash (32-bit
    * portable hash of the space-joined window).
    */
  def slidingWindows(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, "window/stride must be > 0")
    val toks = TextOps.tokens(col(textCol))
    df.select(col(idCol).as("doc_id"), toks.as("toks"))
      .withColumn("start",
        explode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)),
          lit(stride))))
      .select(col("doc_id"),
        (col("start") / stride).cast("long").as("chunk_idx"),
        col("start").cast("long").as("chunk_start"),
        slice(col("toks"), col("start") + 1, lit(window)).as("w"))
      .select(col("doc_id"), col("chunk_idx"), col("chunk_start"),
        size(col("w")).cast("long").as("n_chunk_tokens"),
        TextOps.hash32(array_join(col("w"), " ")).as("chunk_hash"))
  }
}
