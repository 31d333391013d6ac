package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the payload of the
  * latest right row whose `tsCol` is <= the left row's `tsCol`, per key.
  *
  * The reference has no as-of operator (SURVEY.md §2.3 "not present"), but
  * it is the canonical temporal-enrichment primitive a training-data
  * pipeline needs (attach the most recent annotation/config/label to every
  * sample). Spark has no built-in either, so this is the composed form the
  * build contract prefers over a custom physical operator: union the two
  * sides, one partitioned sort, and a running `last(ignoreNulls)` window —
  * exactly ONE shuffle on the key columns, O(n log n) per partition.
  *
  * The naive alternative — `left.join(right, keys && right.ts <= left.ts)`
  * then top-1 per left row — materializes O(|left| x |matching right|)
  * intermediate rows before the window prunes them; at 100 TB with
  * long-lived keys that is quadratic blowup. The union form never creates
  * a row that wasn't in an input.
  *
  * Tie rule: a right row at exactly left.ts applies (right sorts before
  * left at equal ts via the side tag — same semantics as DuckDB
  * `ASOF JOIN ... ON l.ts >= r.ts`). Right rows must be unique per
  * (keys, ts); pre-deduplicate with a top-1 window if they are not.
  */
object AsOfJoin {

  /** @param left      rows to enrich (all columns preserved)
    * @param right     lookup stream; only `keys`, `tsCol`, `valueCols` read
    * @param keys      equi-join key columns (same names both sides)
    * @param tsCol     event-time column (same name both sides)
    * @param valueCols right payload columns to attach (null when no right
    *                  row is at-or-before the left row)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, valueCols: Seq[String]): DataFrame = {
    val collisions = valueCols.toSet intersect left.columns.toSet
    require(collisions.isEmpty,
      s"right payload columns collide with left columns: " +
        s"${collisions.mkString(", ")} — rename before joining")
    val rightSide = right.select(
      (keys :+ tsCol).map(col) ++
        valueCols.map(c => col(c).as(s"_asof_$c")): _*)
      .withColumn("_asof_side", lit(0))
    val leftSide = left.withColumn("_asof_side", lit(1))
    // unionByName(allowMissingColumns): left payload columns are null on
    // right rows and vice versa — the window below fills across.
    val unioned = leftSide.unionByName(rightSide, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"_asof_$c",
        last(col(s"_asof_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("_asof_side") === 1)
      .drop("_asof_side")
      .select((left.columns.map(col) ++
        valueCols.map(c => col(s"_asof_$c").as(c))).toIndexedSeq: _*)
  }
}
