package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — the multi-dimensional file-skipping
  * lever: sorting a table by the bit-interleaved value of two scan keys
  * keeps rows close in BOTH dimensions close in file order, so min/max
  * row-group stats prune a 2-D range predicate the way a linear sort
  * only prunes its leading key. At 100 TB this is the difference between
  * "a (partkey, suppkey) range scan reads every file" and "it reads the
  * O(√files) files whose Z-range intersects the query rectangle"
  * (same motivation as Catalog.ctas's single-key sort — this is the
  * two-key generalization).
  *
  * The Z-value is an unrolled literal-shift expression (every shift
  * amount is a Scala-side constant), so it stays inside whole-stage
  * codegen; the layout itself is one range repartition + intra-partition
  * sort — the standard write-side shuffle a CTAS already pays.
  */
object Layout {

  /** Morton interleave of two bucketized non-negative keys: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. Inputs must fit in
    * `bits` bits (callers bucketize first — e.g. `pmod(key, 1 << bits)`);
    * the guard null-outs out-of-range inputs rather than silently
    * producing a colliding value.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val max = 1L << bits
    val interleaved = (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(1L), 2 * i) +
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(1L), 2 * i + 1)
    }.reduce(_ + _)
    when(a >= 0 && a < max && b >= 0 && b < max, interleaved)
  }

  /** Z-order layout: cluster `df` into `partitions` output files by the
    * Morton value of the two bucketized keys. Range repartition (sampled
    * bounds, like any global sort) + within-partition sort gives each
    * output file a tight contiguous Z-range — the property min/max
    * pruning needs. Returns the frame WITH the `z` column so callers
    * can audit the ranges; drop it before writing if undesired.
    */
  def zorderLayout(df: DataFrame, aCol: String, bCol: String, bits: Int,
      partitions: Int): DataFrame = {
    val withZ = df.withColumn("z",
      zValue(col(aCol), col(bCol), bits))
    withZ.repartitionByRange(partitions, col("z"))
      .sortWithinPartitions("z")
  }
}
