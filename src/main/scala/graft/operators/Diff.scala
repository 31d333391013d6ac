package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — the dataset-versioning primitive: given two
  * snapshots of the same logical table, emit every key that was added,
  * removed, or changed, with the list of columns that changed. The
  * counterpart to the upsert merge (q77): merge applies a delta, diff
  * derives one — together they round-trip a table through versions
  * (ingest audits, regression gates between pipeline runs, CDC
  * backfills).
  *
  * Scale shape: one full-outer sort-merge join on the key — one shuffle
  * per side, the minimum for comparing two corpus-sized relations; no
  * broadcast (neither snapshot is small). Column comparison is
  * null-safe (`<=>`), so NULL→value and value→NULL both count as
  * changes; unchanged keys are filtered before anything downstream.
  */
object Diff {

  /** Output: keyCols…, status ∈ {added, removed, changed},
    * changed_cols (empty for added/removed, sorted by cmpCols order).
    * With `withPayload` the delta also carries `new_vals` (cur's
    * compare-struct; null for removed rows), making it an applyable CDC
    * delta: old − removed − changed ∪ (added ∪ changed).new_vals == cur
    * — the reconstruction invariant OperatorsSpec asserts.
    */
  def snapshotDiff(old: DataFrame, cur: DataFrame,
      keyCols: Seq[String], cmpCols: Seq[String],
      withPayload: Boolean = false): DataFrame = {
    require(cmpCols.nonEmpty, "cmpCols must be non-empty")
    val o = old.select(
      (keyCols.map(col) :+
        struct(cmpCols.map(col): _*).as("_old") :+
        lit(true).as("_in_old")): _*)
    val c = cur.select(
      (keyCols.map(col) :+
        struct(cmpCols.map(col): _*).as("_cur") :+
        lit(true).as("_in_cur")): _*)
    val joined = o.join(c, keyCols, "full_outer")
    val status = when(col("_in_old").isNull, "added")
      .when(col("_in_cur").isNull, "removed")
      .otherwise("changed")
    val changedCols = when(col("_in_old").isNull || col("_in_cur").isNull,
      array().cast("array<string>"))
      .otherwise(concat(cmpCols.map(n =>
        when(!(col("_old").getField(n) <=> col("_cur").getField(n)),
          array(lit(n))).otherwise(array().cast("array<string>"))): _*))
    val base = keyCols.map(col) :+
      status.as("status") :+
      changedCols.as("changed_cols")
    val out = if (withPayload) base :+ col("_cur").as("new_vals") else base
    joined
      .filter(col("_in_old").isNull || col("_in_cur").isNull ||
        !(col("_old") <=> col("_cur")))
      .select(out: _*)
  }
}
