package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Frequent-pair mining over documents-as-baskets (the A-Priori
  * first rung, Agrawal & Srikant VLDB'94): which token pairs co-occur
  * in at least `minSupport` documents — topic/template signals, common
  * boilerplate bigrams-at-distance, features for dedup blocking.
  *
  * Scale shape — downward closure FIRST: a pair can only reach support
  * s if BOTH items do, so the item stream prunes against the frequent-
  * item table (one partial-aggregated groupBy of |distinct tokens|
  * rows) before any pair exists. The pair generator is then a per-doc
  * self-join bounded by (frequent tokens per doc)², not (all
  * tokens)² — the same hot-key discipline as the dedup inverted
  * indexes — and the pair aggregate partial-combines map-side, so the
  * exchange carries one row per DISTINCT surviving pair per partition,
  * never per occurrence.
  */
object Itemsets {

  /** Doc-level co-occurring token pairs with support ≥ `minSupport`.
    * Output: tok_a, tok_b (lexicographic, a < b), support.
    *
    * `maxDocItems` is the hot-basket guard (the [[Dedup]] family's
    * `maxPosting` idiom): a single pathological doc with B surviving
    * items emits B²/2 pairs from one row, so baskets above the cap
    * keep only their `maxDocItems` lexicographically-first frequent
    * tokens (deterministic, so capped runs reproduce). The default
    * (Int.MaxValue) is exact; the declared oracle query runs uncapped.
    */
  def frequentPairs(df: DataFrame, idCol: String, textCol: String,
      minSupport: Int, maxDocItems: Int = Int.MaxValue): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    require(maxDocItems >= 2, "maxDocItems must be >= 2")
    val items = df.select(col(idCol).as("doc_id"),
      explode(array_distinct(TextOps.tokens(col(textCol)))).as("tok"))
    val frequent = items.groupBy("tok")
      .agg(count(lit(1)).as("df_"))
      .filter(col("df_") >= minSupport)
      .select("tok")
      .hint("shuffle_hash")
    val survivors = items.hint("shuffle_hash")
      .join(frequent, Seq("tok"))
    val pruned =
      if (maxDocItems == Int.MaxValue) survivors
      else {
        // per-doc window frames are basket-sized, never corpus-sized
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("tok")
        survivors.withColumn("__rk", row_number().over(w))
          .filter(col("__rk") <= maxDocItems)
          .drop("__rk")
      }
    pruned.as("x").hint("shuffle_hash")
      .join(pruned.as("y").hint("shuffle_hash"),
        col("x.doc_id") === col("y.doc_id") &&
          col("x.tok") < col("y.tok"))
      .groupBy(col("x.tok").as("tok_a"), col("y.tok").as("tok_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  /** [[frequentPairs]] plus doc-level pointwise mutual information:
    * PMI(a,b) = ln(P(a,b) / (P(a)·P(b))) with document-frequency
    * probabilities — the association score that separates "co-occur
    * because both are everywhere" (PMI ≈ 0, stopword pairs) from
    * "co-occur because they belong together" (PMI ≫ 0, collocations).
    * Same pruned pair generator; one extra broadcast-sized join
    * against the |frequent items| df table. The ratio is exact long
    * arithmetic until the final division, so both engines feed ln the
    * identical double.
    *
    * Output: tok_a, tok_b, support, pmi.
    */
  def pmiPairs(df: DataFrame, idCol: String, textCol: String,
      minSupport: Int): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    val items = df.select(col(idCol).as("doc_id"),
      explode(array_distinct(TextOps.tokens(col(textCol)))).as("tok"))
    val nDocs = df.select(col(idCol)).distinct().count()
    val freq = items.groupBy("tok")
      .agg(count(lit(1)).as("df_"))
      .filter(col("df_") >= minSupport)
      .hint("shuffle_hash")
    val pruned = items.hint("shuffle_hash")
      .join(freq.select("tok"), Seq("tok"))
    pruned.as("x").hint("shuffle_hash")
      .join(pruned.as("y").hint("shuffle_hash"),
        col("x.doc_id") === col("y.doc_id") &&
          col("x.tok") < col("y.tok"))
      .groupBy(col("x.tok").as("tok_a"), col("y.tok").as("tok_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .join(broadcast(freq.select(col("tok").as("tok_a"),
        col("df_").as("df_a"))), Seq("tok_a"))
      .join(broadcast(freq.select(col("tok").as("tok_b"),
        col("df_").as("df_b"))), Seq("tok_b"))
      .select(col("tok_a"), col("tok_b"), col("support"),
        log((col("support") * lit(nDocs)).cast("double") /
          (col("df_a") * col("df_b"))).as("pmi"))
  }
}
