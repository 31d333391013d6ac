package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top-k rows per group as a typed Aggregator (UDAF).
  *
  * The window form (`row_number().over(partitionBy(g).orderBy(v.desc))`
  * then `rn <= k`) sorts EVERY row of every group before discarding all
  * but k — at 100 TB that is a full shuffle + per-partition sort of the
  * dataset to keep a handful of rows per key. This Aggregator keeps a
  * bounded k-element buffer per group with map-side partial aggregation:
  * each executor reduces its local rows to <= k per key before the
  * shuffle, so the exchange carries O(groups x k) rows, not O(n).
  *
  * SURVEY §2.10 notes the reference needs no UDAF; this one exists for
  * the training-pipeline surface (top-k samples per bucket, hardest
  * examples per shard) and doubles as the library's Aggregator example.
  *
  * Determinism: ties on the score break by smallest id — the (score
  * desc, id asc) total order, same as a window oracle's tie-break.
  */
object TopK {

  type Entry = (Double, Long) // (score, id)

  /** Insert keeping the buffer sorted by (score desc, id asc), bounded
    * at k. Linear in k — k is small by construction.
    */
  private def insert(buf: List[Entry], e: Entry, k: Int): List[Entry] = {
    def outranks(a: Entry, b: Entry): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    val (pre, post) = buf.span(x => outranks(x, e))
    val merged = pre ::: e :: post
    if (merged.lengthCompare(k) > 0) merged.take(k) else merged
  }

  final class TopKAgg(k: Int)
      extends Aggregator[Entry, List[Entry], Seq[Entry]] {
    override def zero: List[Entry] = Nil
    override def reduce(b: List[Entry], e: Entry): List[Entry] =
      insert(b, e, k)
    override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
      b.foldLeft(a)((acc, e) => insert(acc, e, k))
    override def finish(r: List[Entry]): Seq[Entry] = r
    override def bufferEncoder: Encoder[List[Entry]] =
      ExpressionEncoder[List[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] =
      ExpressionEncoder[Seq[Entry]]()
  }

  /** Grouped top-k: one row per kept entry with its 1-based rank.
    * Output: groupCol, id, score, rank.
    */
  def perGroup(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val agg = udaf(new TopKAgg(k))
    df.groupBy(col(groupCol))
      .agg(agg(col(scoreCol).cast("double"),
        col(idCol).cast("long")).as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("rank0", "e")))
      .select(col(groupCol), col("e._2").as("id"),
        col("e._1").as("score"), (col("rank0") + 1).cast("long").as("rank"))
  }
}
