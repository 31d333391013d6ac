package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Deterministic global shuffle order — the training-order assignment
  * step: every example gets a contiguous position [0, N) in a
  * pseudo-random but fully reproducible order (salted portable hash),
  * so shards written by independent executors line up with the order a
  * trainer will read, across reruns and engines.
  *
  * The naive form is `row_number() OVER (ORDER BY h)` — a global sort
  * funneled through ONE task. This uses the same two-phase shape as
  * [[Pack]]: the 32-bit hash space is range-bucketed into `nBlocks`
  * order-preserving blocks, per-block counts are aggregated (|blocks|
  * rows), block start offsets come from a prefix sum over that tiny
  * frame (the only single-partition step), and each block then ranks its
  * own rows in parallel. Identical to the global row_number because the
  * block id is monotonic in the hash.
  */
object Order {

  /** Output: doc_id, h (the salted hash draw), pos (contiguous [0, N)
    * global position in (h, doc_id) order).
    */
  def globalIndex(df: DataFrame, idCol: String, salt: String = "shuffle",
      nBlocks: Int = 1024): DataFrame = {
    require(nBlocks > 0, "nBlocks must be > 0")
    val blockWidth = (1L << 32) / nBlocks + 1
    // Materialized once (3 longs/row): the counts phase and the ranking
    // phase both read it; lazy, the upstream would evaluate twice.
    val rows0 = df.select(col(idCol).as("doc_id"))
      .withColumn("h", TextOps.hash32(
        concat(lit(s"$salt:"), col("doc_id").cast("string"))))
      .withColumn("block", (col("h") / blockWidth).cast("long"))
    val rows = graft.plans.Fence.corpus(rows0, "order_rows")

    val wBlocks = Window.orderBy("block")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = rows.groupBy("block").agg(count(lit(1)).as("bn"))
      .select(col("block"),
        coalesce(sum("bn").over(wBlocks), lit(0L)).as("boff"))

    val wIn = Window.partitionBy("block").orderBy("h", "doc_id")
    rows.join(broadcast(offsets), "block")
      .withColumn("pos",
        col("boff") + row_number().over(wIn).cast("long") - 1L)
      .select(col("doc_id"), col("h"), col("pos"))
  }
}
