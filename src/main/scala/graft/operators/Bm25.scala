package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{SafeOps, TextOps}

/** Okapi BM25 ranked retrieval (Robertson & Zaragoza 2009) — the classic
  * lexical relevance score, and the retrieval baseline every RAG /
  * training-data search stack still reports against:
  *
  *   score(q,d) = Σ_{t∈q} idf(t) · tf(t,d)·(k1+1) /
  *                          (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
  *   idf(t)     = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5))
  *
  * Execution shape, designed for a corpus-scale candidate set:
  *
  *   - per-term tf lands as ONE codegen'd HOF column per query term on
  *     the scan — no token explode, no (doc, term) shuffle; the term
  *     list is a bounded query artifact like the sampling-rate tables;
  *   - corpus stats (N, avgdl, per-term df) partial-aggregate to a
  *     single row that broadcasts back — the corpus is scanned once;
  *   - all queries score in the SAME pass (literal struct array +
  *     explode, map-side), so q queries cost one scan, not q scans;
  *   - top-k runs two-phase like Pack/Order: per-(query, doc_id mod 64)
  *     block ranks first (bounded partitions), then the global rank
  *     sees ≤ 64·k rows per query — never a corpus-sized window
  *     partition, even with a handful of distinct query keys.
  *
  * Ranking compares the 4-dp floor-ROUNDED score (both engines rank
  * identical values; raw double sums are not bit-reproducible), ties
  * broken by doc_id.
  *
  * Output: query, doc_id, score (4-dp), rank (1..k); only docs matching
  * ≥1 query term (integer-exact hit test, not score > 0).
  */
object Bm25 {

  def topK(df: DataFrame, idCol: String, textCol: String,
      queries: Seq[(String, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "need at least one query with at least one term")
    val allTerms = queries.flatMap(_._2).distinct

    val base = df.select(col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    val withTf = allTerms.zipWithIndex.foldLeft(base) {
      case (acc, (t, i)) => acc.withColumn(s"tf_$i",
        size(filter(col("toks"), x => x === t)).cast("double"))
    }.drop("toks")

    val statAggs =
      count(lit(1)).cast("double").as("n_docs") +:
        avg(col("dl")).as("avgdl") +:
        allTerms.indices.map(i =>
          sum((col(s"tf_$i") > 0).cast("long")).cast("double").as(s"df_$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)

    val scored = withTf.crossJoin(broadcast(stats))
    val perQuery = queries.map { case (qname, terms) =>
      val contribs = terms.map { t =>
        val i = allTerms.indexOf(t)
        val idf = log(lit(1.0) +
          (col("n_docs") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5))
        val denom = col(s"tf_$i") +
          lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
        idf * col(s"tf_$i") * lit(k1 + 1.0) / denom
      }
      val hits = terms.map(t => col(s"tf_${allTerms.indexOf(t)}"))
        .reduce(_ + _)
      struct(lit(qname).as("query"),
        SafeOps.stableRound4(contribs.reduce(_ + _)).as("score"),
        hits.cast("long").as("hits"))
    }
    val exploded = scored
      .select(col("doc_id"), explode(array(perQuery: _*)).as("qs"))
      .select(col("qs.query").as("query"), col("doc_id"),
        col("qs.score").as("score"), col("qs.hits").as("hits"))
      .filter(col("hits") > 0).drop("hits")

    val order = Seq(col("score").desc, col("doc_id").asc)
    val blocked = Window.partitionBy(col("query"),
      pmod(col("doc_id"), lit(64))).orderBy(order: _*)
    val global = Window.partitionBy(col("query")).orderBy(order: _*)
    exploded
      .withColumn("rb", row_number().over(blocked))
      .filter(col("rb") <= k).drop("rb")
      .withColumn("rank", row_number().over(global).cast("long"))
      .filter(col("rank") <= k)
  }
}
