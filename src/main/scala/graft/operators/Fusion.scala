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

  /** Token-budget context assembly — the last RAG stage before the
    * prompt: from each query's ranked chunks, keep the rank-order
    * PREFIX whose cumulative token count fits the budget (truncate-at-
    * overflow semantics — the skip-and-continue variant is a
    * sequential conditional cumsum with no window decomposition, and
    * packing a lower-ranked chunk past a higher-ranked overflow is
    * rarely what a prompt builder wants anyway).
    *
    * Input must carry (query, rank, tokens); one bounded window per
    * query (the retrieval stage already cut to top-k). Output: input
    * columns + cum_tokens, filtered to the fitting prefix.
    */
  def packContext(ranked: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, "budget must be > 0")
    val w = Window.partitionBy("query").orderBy("rank")
      .rowsBetween(Window.unboundedPreceding, 0)
    ranked.withColumn("cum_tokens", sum("tokens").over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** One re-rank input row: a candidate with its relevance and vector. */
  case class MmrCand(q_id: Long, cand_id: Long, rel: Double,
      v: Seq[Double])

  /** One selected row: candidate + its 1-based selection step. */
  case class MmrPick(q_id: Long, step: Int, cand_id: Long)

  /** MMR (maximal marginal relevance) diversified re-ranking — the RAG
    * re-rank stage between retrieval and the context window: from each
    * query's candidate pool, greedily pick k docs maximizing
    * λ·rel − μ·max_{s∈selected} cos(c, s) — relevance traded against
    * redundancy, so near-duplicate passages don't crowd the context.
    *
    * The greedy loop is inherently sequential PER QUERY, but each
    * query's pool is already a bounded top-C from retrieval — so this
    * is `flatMapGroups` over q_id (tier-(d) per-group imperative logic,
    * the documented last resort, justified here: k dependent argmax
    * steps have no window/join decomposition), C² cosines per query,
    * zero corpus access. Exactly one shuffle on q_id.
    *
    * Determinism: λ and μ are passed SEPARATELY (callers write 0.7/0.3,
    * never 1−0.7 — engines agree on literals, not on derived
    * arithmetic); dots and norms accumulate ascending over the vector
    * dims (matching SQL list_sum order); argmax ties break on min
    * cand_id. An unrolled per-step SQL replay picks identical docs.
    *
    * Output: q_id, step (1-based), cand_id.
    */
  def mmrSelect(cands: DataFrame, k: Int, lambda: Double, mu: Double)
      : DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = cands.sparkSession
    import spark.implicits._
    cands.select(col("q_id").cast("long"), col("cand_id").cast("long"),
        col("rel").cast("double"),
        transform(col("v"), x => x.cast("double")).as("v"))
      .as[MmrCand]
      .groupByKey(_.q_id)
      .flatMapGroups { (qid, it) =>
        val pool = it.toArray.sortBy(_.cand_id)
        val n = pool.length
        val norm = pool.map { c =>
          var s = 0.0
          var i = 0
          while (i < c.v.length) { s += c.v(i) * c.v(i); i += 1 }
          math.sqrt(s)
        }
        def cos(a: Int, b: Int): Double = {
          var s = 0.0
          var i = 0
          val va = pool(a).v
          val vb = pool(b).v
          while (i < va.length) { s += va(i) * vb(i); i += 1 }
          s / (norm(a) * norm(b))
        }
        val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
        val picks = scala.collection.mutable.ArrayBuffer.empty[MmrPick]
        var step = 1
        while (step <= math.min(k, n)) {
          var best = -1
          var bestScore = Double.NegativeInfinity
          var c = 0
          while (c < n) {
            if (!selected.contains(c)) {
              var msim = 0.0
              var any = false
              selected.foreach { s =>
                val sim = cos(c, s)
                if (!any || sim > msim) { msim = sim; any = true }
              }
              val score = lambda * pool(c).rel -
                (if (any) mu * msim else 0.0)
              // strict > with ascending cand_id scan = min-id tie-break
              if (score > bestScore) { bestScore = score; best = c }
            }
            c += 1
          }
          selected += best
          picks += MmrPick(qid, step, pool(best).cand_id)
          step += 1
        }
        picks.iterator
      }
      .toDF("q_id", "step", "cand_id")
  }
}
