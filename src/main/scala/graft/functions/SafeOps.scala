package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** BigQuery SAFE_* null-semantics, centralized (SURVEY.md §7.4 risk 2).
  *
  * The reference leans on three "null instead of error" behaviors:
  *   - SAFE_DIVIDE (11 uses, e.g. reference transform/web100.sql:87):
  *     x/0 → NULL;
  *   - `[SAFE_OFFSET(i)]` 0-based array access (ndt7_joined.template.sql:8-16):
  *     out-of-range → NULL;
  *   - `[SAFE_ORDINAL(n)]` 1-based access (extended_ndt7_downloads.sql:16):
  *     out-of-range → NULL.
  *
  * Spark's `element_at` is 1-based and *throws* under ANSI mode, so these
  * wrappers are the only sanctioned access path — never inline the raw
  * builtins in view code. All are thin Column combinators: they stay inside
  * whole-stage codegen, nothing here is a UDF.
  */
object SafeOps {

  /** x / y, NULL when y is 0 or NULL (BigQuery SAFE_DIVIDE). */
  def safeDivide(x: Column, y: Column): Column =
    when(y.isNull || y === 0, lit(null)).otherwise(x / y)

  /** 0-based array access, NULL out of range (BigQuery [SAFE_OFFSET(i)]). */
  def safeOffset(arr: Column, i: Column): Column =
    get(arr, i) // Spark `get` is 0-based and null-safe by definition

  /** 1-based array access, NULL out of range (BigQuery [SAFE_ORDINAL(n)]). */
  def safeOrdinal(arr: Column, n: Column): Column =
    get(arr, n - 1)

  /** Last element of an array, NULL when empty — the reference's
    * `arr[SAFE_ORDINAL(ARRAY_LENGTH(arr))]` idiom for "final snapshot"
    * (extended_ndt7_downloads.sql:16) and its equivalent
    * `ARRAY_REVERSE(arr)[SAFE_OFFSET(0)]` (ndt7_joined.template.sql:8).
    */
  def arrayLast(arr: Column): Column =
    get(arr, size(arr) - 1)

  /** Engine-stable 4-digit rounding for non-negative doubles:
    * floor(x·10⁴ + 0.5)/10⁴. Spark's `round` re-parses the double's
    * shortest decimal string (BigDecimal.valueOf) while DuckDB rounds the
    * raw binary value — on exact .xxxx5 boundaries they disagree
    * (observed: 0.57505 → 0.5751 vs 0.575). This formula is plain double
    * arithmetic, bit-identical in any engine given the same input.
    */
  def stableRound4(x: Column): Column =
    floor(x * 10000.0 + 0.5) / 10000.0

  /** Geometric mean aggregate: EXP(AVG(LN(x))) exactly as the reference
    * computes it (functions/ops.ndt7_geomean_autonode.sql:19-25).
    * Caller is responsible for filtering x > 0 (the reference guards
    * LossRate > 0 the same way, ops.ndt7_geomean_autonode.sql:37).
    */
  def geomean(x: Column): Column = exp(avg(log(x)))
}
