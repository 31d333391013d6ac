package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Phonetic keys for blocking — American Soundex, composed ENTIRELY from
  * codegen'd built-ins (`translate` + literal-pattern `regexp_replace`),
  * no UDF and no custom expression.
  *
  * Two deliberate constraints shape the construction:
  *   - RE2-safe: no backreference patterns (`([1-6])\1`), so the exact
  *     same pipeline runs verbatim in RE2-based engines — the DuckDB
  *     oracle applies the IDENTICAL steps, generated from the same loop
  *     ([[soundexSql]]), making parity hold by construction rather than
  *     by hoping two independent soundex implementations agree on the
  *     H/W edge cases (they famously don't; Spark's built-in `soundex`
  *     follows Hive's variant, which drops the H/W rule).
  *   - Letter-code runs collapse per digit (`11+ -> 1`, six literal
  *     patterns) and the H/W rule (`1[9]+1 -> 1`: same code separated
  *     only by H/W is coded once) is applied before run-collapse, twice,
  *     which resolves alternating chains up to depth the rule is defined
  *     for (BHBHB); vowel-separated repeats stay distinct because `0`
  *     blocks the run.
  *
  * Mapping: A,E,I,O,U,Y→0 · B,F,P,V→1 · C,G,J,K,Q,S,X,Z→2 · D,T→3 ·
  * L→4 · M,N→5 · R→6 · H,W→9 (marker). Result: first letter + first
  * three surviving codes, zero-padded; non-alphabetic input → null.
  */
object PhoneticOps {

  private val letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val codes = "01230129022455012623019202"

  /** Soundex code of `name` (case-insensitive; non-letters stripped). */
  def soundex(name: Column): Column = {
    val u = upper(regexp_replace(name, "[^A-Za-z]", ""))
    val t0 = translate(u, letters, codes)
    // H/W rule twice, then per-digit run collapse, then drop 0/9.
    val hw = (1 to 2).foldLeft(t0) { (acc, _) =>
      (1 to 6).foldLeft(acc) { (a, d) =>
        regexp_replace(a, s"$d[9]+$d", s"$d")
      }
    }
    val collapsed = (1 to 6).foldLeft(hw) { (a, d) =>
      regexp_replace(a, s"$d$d+", s"$d")
    }
    val digits = translate(collapsed, "09", "")
    val fcode = substring(t0, 1, 1)
    val tail = when(fcode.between("1", "6"), substring(digits, 2, 3))
      .otherwise(substring(digits, 1, 3))
    when(length(u) === 0, lit(null.asInstanceOf[String]))
      .otherwise(concat(substring(u, 1, 1), rpad(tail, 3, "0")))
  }

  /** The same pipeline as a DuckDB SQL expression over `expr` —
    * generated from the same constants and loop bounds, so the oracle
    * cannot drift from the Spark side.
    */
  def soundexSql(expr: String): String = {
    val u = s"upper(regexp_replace($expr, '[^A-Za-z]', '', 'g'))"
    val t0 = s"translate($u, '$letters', '$codes')"
    var acc = t0
    for (_ <- 1 to 2; d <- 1 to 6)
      acc = s"regexp_replace($acc, '$d[9]+$d', '$d', 'g')"
    for (d <- 1 to 6)
      acc = s"regexp_replace($acc, '$d$d+', '$d', 'g')"
    val digits = s"translate($acc, '09', '')"
    val fcode = s"substring($t0, 1, 1)"
    val tail = s"CASE WHEN $fcode BETWEEN '1' AND '6' " +
      s"THEN substring($digits, 2, 3) ELSE substring($digits, 1, 3) END"
    s"CASE WHEN length($u) = 0 THEN NULL " +
      s"ELSE substring($u, 1, 1) || rpad($tail, 3, '0') END"
  }
}
