package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity join over short strings (names, titles,
  * URLs) — the string-metric member of the pair-generation family
  * ([[Dedup]]: set similarity, [[Similarity]]: vector similarity,
  * [[Blocking]]: order proximity). Ed-Join's q-gram prefix scheme
  * (Xiao, Wang, Lin, VLDB'08): strings within edit distance d share a
  * q-gram inside their (d·q + 1)-length prefixes under any fixed
  * global gram order — d edits destroy at most d·q distinct grams, so
  * an empty prefix intersection needs more than d·q missing grams.
  *
  * Pipeline (all exact — pruning only shrinks the candidate set):
  *   1. padded character q-gram hash sets per string, sorted by hash
  *      value (the global order), computed at scan speed;
  *   2. inverted index over PREFIX grams only, shuffle-pinned
  *      self-join — never a corpus broadcast, and the index carries
  *      (d·q+1) entries per string, not the full gram set;
  *   3. length filter (|len(a) − len(b)| ≤ d is necessary) and the
  *      count filter |Ga ∩ Gb| ≥ max(|Ga|, |Gb|) − d·q (each edit
  *      touches at most q distinct grams);
  *   4. exact Levenshtein verification on survivors only (the O(n·m)
  *      DP runs per candidate pair, never per corpus pair).
  *
  * Output: id_a, id_b, dist (≤ maxDist).
  */
object Edits {

  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 1, "maxDist >= 1")
    require(q >= 1, "q >= 1 (gram width)")
    val pad = "#" * (q - 1)
    val padded = concat(lit(pad), col("s"), lit(pad))
    // distinct sorted gram hashes; padding gives len(s) + q - 1 grams,
    // so any non-empty string has a non-empty set
    val grams = array_sort(array_distinct(transform(
      sequence(lit(0), length(padded) - q),
      i => conv(substring(md5(substring(padded, i + 1, lit(q))), 1, 8),
        16, 10).cast("long"))))
    val sets = df
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull && length(col("s")) >= 1)
      .withColumn("g", grams)
      .withColumn("sz", size(col("g")))
      .localCheckpoint() // the prefix join probes this twice
    val prefixLen = maxDist * q + 1
    val pref = sets.select(col("id"), col("s"), col("g"), col("sz"),
      explode(slice(col("g"), 1, prefixLen)).as("pg"))
    val cand = pref.as("x").hint("shuffle_hash")
      .join(pref.as("y").hint("shuffle_hash"),
        col("x.pg") === col("y.pg") && col("x.id") < col("y.id") &&
          abs(length(col("x.s")) - length(col("y.s"))) <= maxDist)
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(first(col("x.s")).as("sa"), first(col("y.s")).as("sb"),
        first(col("x.g")).as("ga"), first(col("y.g")).as("gb"),
        first(col("x.sz")).as("sza"), first(col("y.sz")).as("szb"))
    cand
      .withColumn("common", size(array_intersect(col("ga"), col("gb"))))
      .filter(col("common") >=
        greatest(col("sza"), col("szb")) - maxDist * q)
      .withColumn("dist", levenshtein(col("sa"), col("sb")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
