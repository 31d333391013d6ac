package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitters sketch as a typed Aggregator — the
  * frequency-sketch class next to the library's bloom (membership),
  * MinHash (similarity), and SimHash (distance) sketches.
  *
  * Why not a plain groupBy-count at 100 TB: counting every distinct
  * token/URL/domain materializes |vocabulary| rows — web-scale token
  * streams have billions of distinct values, nearly all of them
  * singletons that no curation decision ever reads. The MG sketch keeps
  * a bounded k-entry map per partition and per group; the exchange
  * carries O(groups × k) entries, never the vocabulary.
  *
  * Guarantees (Misra & Gries 1982; merge per Agarwal et al., "Mergeable
  * Summaries", PODS'12):
  *   - every item with true frequency > n/(k+1) is present in the sketch;
  *   - each reported count c_est satisfies c_true − n/(k+1) ≤ c_est ≤
  *     c_true (undercount only);
  *   - when k ≥ |distinct items| no decrement ever fires and every count
  *     is EXACT — the regime the DuckDB oracle checks on the fixtures,
  *     while the bound covers the capped regime at scale.
  *
  * Merge sums the two maps then re-caps to the k largest entries,
  * subtracting the (k+1)-st count — the mergeable-summaries rule that
  * keeps the combined error within the summed bounds, valid for any
  * merge tree Spark's partial aggregation happens to build.
  */
object HeavyHitters {

  final class MisraGriesAgg(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0, "sketch capacity must be positive")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], item: String)
        : Map[String, Long] =
      b.get(item) match {
        case Some(c) => b.updated(item, c + 1)
        case None if b.size < k => b.updated(item, 1L)
        case None =>
          // classic MG decrement: drop every counter by one (the new
          // item's single occurrence cancels against them), shedding
          // zeroed entries. O(k) only when the map is full of distinct
          // values — amortized O(1) per stream item.
          b.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long])
        : Map[String, Long] = {
      val combined =
        if (a.size >= b.size) b.foldLeft(a) { case (m, (t, c)) =>
          m.updated(t, m.getOrElse(t, 0L) + c) }
        else merge(b, a)
      if (combined.size <= k) combined
      else {
        // subtract the (k+1)-st largest count, keep what stays positive
        // (ties at the threshold fall to zero and drop with it)
        val thresh = combined.valuesIterator.toArray
          .sortInPlaceWith(_ > _).apply(k)
        combined.flatMap { case (t, c) =>
          if (c > thresh) Some(t -> (c - thresh)) else None }
      }
    }

    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Global top-`topN` heavy hitters of `itemCol` under a k-entry MG
    * sketch. Output: item, est_count, rank — (est_count desc, item asc)
    * total order. Exact counts whenever k ≥ |distinct itemCol|.
    */
  def top(df: DataFrame, itemCol: String, k: Int, topN: Int): DataFrame = {
    val agg = udaf(new MisraGriesAgg(k))
    df.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
      .agg(agg(col("item")).as("sketch"))
      .select(explode(col("sketch")).as(Seq("item", "est_count")))
      .orderBy(col("est_count").desc, col("item").asc)
      .limit(topN)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("est_count").desc, col("item").asc)).cast("long"))
  }
}
