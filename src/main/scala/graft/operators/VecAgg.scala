package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Element-wise vector aggregation (mean pooling) as a typed Aggregator.
  *
  * The explode-and-regroup alternative (`posexplode` → `groupBy(group,
  * dim)` → `avg` → `collect_list`) shuffles dim× the corpus rows and
  * needs a second shuffle to reassemble vectors. This Aggregator keeps
  * one running (sums[dim], count) buffer per group with map-side partial
  * aggregation: each executor collapses its rows to one buffer per key
  * before the exchange, so the shuffle carries O(groups) buffers — at
  * 100 TB the difference between moving the corpus twice and moving a
  * few KB per group.
  *
  * Used for cluster centroids (k-means steps, IVF codebook training),
  * per-source embedding profiles, and chunk→document pooling.
  */
object VecAgg {

  /** (sums[0..dim), count) running buffer; mean = sums/count at finish. */
  final class VecMeanAgg(dim: Int)
      extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {
    override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)
    override def reduce(b: (Array[Double], Long), v: Seq[Double])
        : (Array[Double], Long) = {
      if (v == null) return b // null vectors contribute nothing
      val (sums, n) = b
      var i = 0
      val m = math.min(dim, v.length)
      while (i < m) { sums(i) += v(i); i += 1 }
      (sums, n + 1)
    }
    override def merge(a: (Array[Double], Long), b: (Array[Double], Long))
        : (Array[Double], Long) = {
      var i = 0
      while (i < dim) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
    override def finish(r: (Array[Double], Long)): Seq[Double] =
      if (r._2 == 0L) Seq.empty
      else r._1.map(_ / r._2).toSeq
    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      ExpressionEncoder[(Array[Double], Long)]()
    override def outputEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }

  /** Mean vector per group. Output: groupCol, centroid (array<double>),
    * n_members.
    */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String,
      dim: Int): DataFrame = {
    val agg = udaf(new VecMeanAgg(dim))
    df.groupBy(col(groupCol))
      .agg(agg(col(vecCol)).as("centroid"),
        count(lit(1)).as("n_members"))
  }
}
