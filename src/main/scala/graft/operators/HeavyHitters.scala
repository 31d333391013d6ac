package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Misra-Gries heavy-hitters sketches over DataFrames — the
  * frequency-sketch class next to the library's bloom (membership),
  * MinHash (similarity), and SimHash (distance) sketches. The sketch
  * itself is the native Catalyst aggregate
  * [[graft.functions.MisraGriesSketchExpr]] (`mg_sketch`), which reads
  * items straight off the InternalRow — no encoder bridge, no kryo
  * buffer blobs.
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

  /** Global top-`topN` heavy hitters of `itemCol` under a k-entry MG
    * sketch. Output: item, est_count, rank — (est_count desc, item asc)
    * total order. Exact counts whenever k ≥ |distinct itemCol|.
    */
  def top(df: DataFrame, itemCol: String, k: Int, topN: Int): DataFrame = {
    require(k > 0, "sketch capacity must be positive")
    GraftFunctions.registerAll(df.sparkSession)
    def agg(c: org.apache.spark.sql.Column) = GraftFunctions.mgSketch(c, k)
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

  /** Per-group top-`topN` heavy hitters — one MG sketch per group key
    * (the per-domain/per-source hot-token monitor). Identical
    * guarantees per group; the exchange carries O(groups × k) sketch
    * entries via partial aggregation, and the ranking window's frames
    * are sketch-sized (≤ k rows per group), never data-sized.
    * Output: groupCols..., item, est_count, rank.
    */
  def topPerGroup(df: DataFrame, groupCols: Seq[String],
      itemCol: String, k: Int, topN: Int): DataFrame = {
    require(k > 0, "sketch capacity must be positive")
    GraftFunctions.registerAll(df.sparkSession)
    def agg(c: org.apache.spark.sql.Column) = GraftFunctions.mgSketch(c, k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("est_count").desc, col("item").asc)
    df.select((groupCols.map(col) :+
        col(itemCol).cast("string").as("item")): _*)
      .filter(col("item").isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col("item")).as("sketch"))
      .select((groupCols.map(col) :+
        explode(col("sketch")).as(Seq("item", "est_count"))): _*)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topN)
  }

  /** Two-pass CERTIFIED-exact top-N — how exact heavy hitters are
    * computed at 100 TB without ever counting the vocabulary:
    *
    *   1. one MG sketch pass produces ≤ k CANDIDATE items (any item
    *      with true frequency > n/(k+1) is guaranteed present);
    *   2. a second pass counts ONLY the candidates exactly (broadcast
    *      membership filter on the scan + one |candidates|-bounded
    *      aggregate — no vocabulary-sized state anywhere);
    *   3. the result self-certifies: an absent item has frequency
    *      ≤ n/(k+1), so whenever the N-th exact candidate count
    *      exceeds n/(k+1), NO absent item could displace it —
    *      `certified` reports that bound check, turning a sketch
    *      heuristic into a proof or an explicit "grow k" signal.
    *
    * Output: item, cnt (exact), rank, certified.
    */
  def topExact(df: DataFrame, itemCol: String, k: Int, topN: Int)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
    require(k > 0, "sketch capacity must be positive")
    GraftFunctions.registerAll(df.sparkSession)
    // pass 1: sketch AND stream length in the same job — the MG pass
    // scans everything anyway, so n is free
    val first = items
      .agg(GraftFunctions.mgSketch(col("item"), k).as("sketch"),
        count(lit(1)).as("n"))
      .collect()(0)
    val n = first.getLong(1)
    val candidates = first.getMap[String, Long](0).keys.toSeq // ≤ k
    // pass 2: exact recount of candidates only. A broadcast SEMI-join
    // keeps the membership test a hash probe; `isin` over up to k
    // collected literals compiles a k-ary expression (measured 8 s at
    // k=32768 on the bench vs ~1 s for the join).
    val exact = items
      .join(broadcast(candidates.toDF("item")), Seq("item"), "left_semi")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item").asc)
      .limit(topN)
      .collect() // ≤ topN rows — a bounded artifact
    // certified iff (a) a FULL topN was reported — fewer rows mean the
    // sketch may have evicted items that an absent-item slot would
    // otherwise hide behind — AND (b) the weakest reported count beats
    // the absent-item ceiling n/(k+1). Driver-side, so the recount job
    // runs exactly once no matter how often the result is consumed.
    val certified = exact.length == topN && exact.nonEmpty &&
      exact.map(_.getLong(1)).min.toDouble > n.toDouble / (k + 1).toDouble
    exact.zipWithIndex
      .map { case (r, i) =>
        (r.getString(0), r.getLong(1), (i + 1).toLong, certified) }
      .toSeq.toDF("item", "cnt", "rank", "certified")
  }
}
