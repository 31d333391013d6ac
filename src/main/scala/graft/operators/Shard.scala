package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Deterministic shard assignment + publish manifest — the sink-side
  * bookkeeping of a reproducible dataset release: every row maps to a
  * shard by a salted content-independent hash of its id (stable across
  * engines, runs, and repartitions — the same property the train/test
  * splitter guarantees), and the manifest summarizes each shard with a
  * count, a byte total, and an order-independent content checksum a
  * consumer can re-derive to detect corruption or drift.
  *
  * Scale shape: assignment is a scan-side projection (no shuffle);
  * the manifest is one partial-aggregating groupBy to |shards| rows.
  * The checksum is BIT_XOR of the 32-bit content hashes — XOR is
  * commutative/associative and overflow-free, so it is row-order and
  * partitioning independent, and any engine computes the identical
  * value (contrast SUM, which overflows BIGINT differently per engine
  * at extreme row counts).
  */
object Shard {

  /** Salted deterministic shard id in [0, nShards). */
  def shardId(id: Column, nShards: Int): Column =
    pmod(TextOps.hash32(concat(lit("shard:"), id.cast("string"))),
      lit(nShards.toLong))

  /** Rows with their shard assignment appended. */
  def assign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, "need at least one shard")
    df.withColumn("shard_id", shardId(col(idCol), nShards))
  }

  /** Per-shard publish manifest.
    * Output: shard_id, n_docs, bytes (sum of `bytes`), checksum
    * (BIT_XOR of the salted 32-bit `content` hashes).
    */
  def manifest(df: DataFrame, idCol: String, bytes: Column,
      content: Column, nShards: Int): DataFrame =
    assign(df, idCol, nShards)
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(bytes).as("bytes"),
        bit_xor(TextOps.hash32(concat(lit("content:"), content)))
          .as("checksum"))
}
