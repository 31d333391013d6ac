package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval (lexical + dense legs).
  *
  * Reciprocal-rank fusion: each leg contributes 1/(c + rank) for every
  * (query, doc) pair it ranked; a doc missing from a leg contributes
  * nothing there. RRF needs no score calibration between legs — only
  * ranks — which is why it is the default fusion for mixing BM25/BoW
  * scores with embedding cosines, whose scales are incomparable.
  *
  * Scale shape: every input leg is already a bounded per-query top-k'
  * (|queries|·k' rows regardless of corpus size), so the union +
  * groupBy here shuffles O(|queries|·k'·legs) rows total and the
  * per-query ranking window sees at most k'·legs rows — nothing in the
  * fusion step grows with the corpus.
  */
object Fusion {

  /** Fuse ranked legs by reciprocal rank. Each leg must expose columns
    * (query, doc_id, rank); ranks are 1-based per query. Output:
    * query, doc_id, rrf (stable-rounded to 4 dp), legs_hit, rank —
    * the per-query top-k by rounded score, ties broken on doc_id so
    * the cut is deterministic across engines.
    */
  def rrf(legs: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(legs.nonEmpty, "need at least one ranked leg")
    require(c > 0, "the rank-smoothing constant must be positive")
    val unioned = legs
      .map(_.select(col("query"), col("doc_id"), col("rank")))
      .reduce(_.unionByName(_))
    val fused = unioned
      .groupBy("query", "doc_id")
      .agg(
        graft.functions.SafeOps
          .stableRound4(sum(lit(1.0) / (lit(c) + col("rank"))))
          .as("rrf"),
        count(lit(1)).as("legs_hit"))
    val w = Window.partitionBy("query")
      .orderBy(col("rrf").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
