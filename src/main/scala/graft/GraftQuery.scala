package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: the Spark implementation plus (when SQL-expressible)
  * the ANSI/DuckDB oracle that must hash-match it on the same parquet inputs.
  *
  * Conventions that keep the hash-compare deterministic (SURVEY.md §5.3):
  *   - every floating-point output column is rounded with the stable
  *     floor form `floor(x·10^N + 0.5)/10^N` in BOTH the Spark code and
  *     the oracle SQL (raw double sums are not bitwise-reproducible
  *     across partial-aggregation orders, and engine round() semantics
  *     diverge on exact .5 decimal boundaries — see SafeOps.stableRound4);
  *   - aggregate / computed columns carry identical aliases on both sides
  *     (the driver sorts columns by name before hashing);
  *   - results with per-row identity carry an ORDER BY on a unique key;
  *   - no ANY_VALUE over multi-valued groups, no approx sketches, no
  *     unsorted collect_list.
  */
final case class GraftQuery(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
