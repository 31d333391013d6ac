package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD'95) — the
  * entity-resolution candidate generator: sort the corpus by a blocking
  * key, slide a window of `w` ranks, and emit only pairs within the
  * window. Near-identical records sort adjacently, so O(n·w) candidate
  * pairs replace the O(n²) cross product that exact blocking keys are
  * too brittle to prevent (typo in the key → different block → pair
  * lost; in sorted order it's still a neighbor).
  *
  * Scale shape: the global rank comes from a RANGE-partitioned
  * two-phase ranking — `repartitionByRange` on the key, a per-range
  * local row_number (window frames bounded by the RANGE PARTITION, a
  * planned size, never the corpus), and a broadcast prefix-sum of the
  * per-range counts for the offsets ([[Pack]]/[[Order]]'s shape
  * generalized to arbitrary sort keys). The neighbor join is then an
  * equi-join on rank: each row explodes to its `w` forward offsets —
  * O(n·w) rows — and matches rank-to-rank; no window function ever
  * sees two rows of different ranges. The rank output is a pure
  * function of the (key, id) total order, so partition boundaries
  * (and the range sampler) cannot affect results.
  */
object Blocking {

  /** Global 0-based rank of every row under (key, id) — range-
    * partitioned two-phase ranking, no corpus-wide window. Output:
    * original columns + `rank`.
    */
  def globalRank(df: DataFrame, idCol: String, key: Column,
      nRanges: Int = 64): DataFrame = {
    // per-row frame (the whole input + 2 cols) — corpus-sized; the
    // range-partition ids are COMPUTED INTO the rows before the fence,
    // so the durable read-back preserves them as plain values
    val keyed = graft.plans.Fence.corpus(
      df.withColumn("__bk", key)
        .repartitionByRange(nRanges, col("__bk"), col(idCol))
        .withColumn("__part", spark_partition_id()),
      "rank_keyed")
    val wParts = Window.orderBy("__part")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy("__part")
      .agg(count(lit(1)).as("pn"))
      .select(col("__part"),
        coalesce(sum("pn").over(wParts), lit(0L)).as("poff"))
    val wIn = Window.partitionBy("__part")
      .orderBy(col("__bk"), col(idCol))
    keyed.join(broadcast(offsets), "__part")
      .withColumn("rank",
        col("poff") + row_number().over(wIn).cast("long") - 1L)
      .drop("__part", "poff")
  }

  /** Candidate pairs within `w` ranks of each other under the blocking
    * key's sort order. Output: id_a, id_b (id_a the lower-ranked), the
    * two keys, and `gap` (rank distance, 1..w).
    */
  def sortedNeighborhood(df: DataFrame, idCol: String, key: Column,
      w: Int, nRanges: Int = 64): DataFrame = {
    require(w >= 1, "window w must be >= 1")
    val ranked = globalRank(df, idCol, key, nRanges)
      .select(col(idCol).as("id"), col("__bk").as("bk"), col("rank"))
    val fwd = ranked.select(col("id").as("id_a"), col("bk").as("key_a"),
        col("rank"),
        explode(sequence(col("rank") + 1, col("rank") + w)).as("nrank"))
      .withColumn("gap", (col("nrank") - col("rank")).cast("long"))
    fwd.hint("shuffle_hash")
      .join(ranked.hint("shuffle_hash")
          .select(col("id").as("id_b"), col("bk").as("key_b"),
            col("rank").as("nrank")),
        Seq("nrank"))
      .select(col("id_a"), col("id_b"), col("key_a"), col("key_b"),
        col("gap"))
  }
}
