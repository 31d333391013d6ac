package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized point-in-interval join — the 100 TB path for "annotate
  * each point with the interval that contains it" (the reference's
  * IP-range → geo/ASN annotation shape, annotation-service lookups
  * keyed by address range).
  *
  * A pure range predicate (`p BETWEEN lo AND hi`) has no equi key, so
  * Catalyst can only plan a broadcast-nested-loop or cartesian join —
  * O(|points|·|intervals|) comparisons, a non-starter when both sides
  * are large. The standard rewrite: quantize the domain into
  * fixed-width buckets, explode each interval to the buckets it
  * overlaps, map each point to its single bucket, hash-join on the
  * bucket id, and re-check the exact range as a residual. Cost becomes
  * O(|points| + |intervals|·span/W) shuffled rows with an ordinary
  * shuffled hash join — linear, partitionable, AQE-skew-splittable.
  *
  * Pathological wide intervals (a /0 default route spanning the whole
  * domain) would explode into span/W bucket rows; `maxBucketsPerInterval`
  * diverts them to a broadcast residual-only leg instead (they are few
  * by assumption — wide catch-all ranges are rare in real range tables,
  * and they broadcast precisely because they are few).
  */
object IntervalJoin {

  /** Floor division by a positive width, exact in long arithmetic for
    * negative values too (`pmod` is non-negative, so the numerator is
    * divisible by `w`). `(c / w).cast(long)` via doubles would corrupt
    * epochs past 2^53; integer `div` truncates toward zero.
    */
  private def fdiv(c: org.apache.spark.sql.Column, w: Long) =
    ((c - pmod(c, lit(w))) / lit(w)).cast("long")

  /** Join `points` (each row one domain value in `pointCol`, long-ish)
    * against `intervals` (closed ranges `[loCol, hiCol]`) on
    * containment. Output = point columns ++ interval columns, one row
    * per (point row, containing interval) pair.
    *
    * `joinType`: "inner" or "left" (a point keeps exactly one bucket
    * row, so left semantics survive bucketization; interval-preserving
    * right/full would duplicate multi-bucket intervals and are
    * rejected). The wide-interval broadcast split composes only with
    * "inner" (a left join would need a second pass to re-null the
    * narrow-unmatched rows); pass `maxBucketsPerInterval = 0` to
    * disable the split when left semantics are required.
    *
    * `bucketWidth`: domain units per bucket. Pick ~ the median interval
    * span: each interval then lands in 1–2 buckets while a point still
    * probes exactly one.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long, joinType: String = "inner",
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // a negative cap would route every interval down BOTH legs (the >0
    // guard skips the narrow filter while the wide filter matches all),
    // duplicating every pair
    require(maxBucketsPerInterval >= 0,
      "maxBucketsPerInterval must be >= 0 (0 disables the split)")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"unsupported join type for bucketized interval join: $joinType")
    require(joinType == "inner" || maxBucketsPerInterval == 0,
      "the wide-interval broadcast split composes with inner only; " +
        "pass maxBucketsPerInterval = 0 for left")

    val p = points.withColumn("__ij_b", fdiv(col(pointCol), bucketWidth))
    val iv = intervals.filter(col(loCol) <= col(hiCol))
      .withColumn("__ij_lob", fdiv(col(loCol), bucketWidth))
      .withColumn("__ij_hib", fdiv(col(hiCol), bucketWidth))

    val residual = col(pointCol) >= col(loCol) &&
      col(pointCol) <= col(hiCol)

    val narrowIv =
      (if (maxBucketsPerInterval > 0)
        iv.filter(col("__ij_hib") - col("__ij_lob") <
          lit(maxBucketsPerInterval.toLong))
      else iv)
        .withColumn("__ij_b",
          explode(sequence(col("__ij_lob"), col("__ij_hib"))))
        .drop("__ij_lob", "__ij_hib")

    // both sides are corpus-sized by contract (points AND ranges scale)
    // — pin the shuffled hash join so AQE can't broadcast a side off a
    // small-SF size estimate; a genuinely tiny interval table belongs
    // in an ordinary broadcast join, not this operator
    val narrow = p.hint("shuffle_hash")
      .join(narrowIv.hint("shuffle_hash"),
        p("__ij_b") === narrowIv("__ij_b") && residual, joinType)
      .drop("__ij_b")

    if (maxBucketsPerInterval == 0) narrow
    else {
      val wideIv = iv.filter(col("__ij_hib") - col("__ij_lob") >=
        lit(maxBucketsPerInterval.toLong))
        .drop("__ij_lob", "__ij_hib")
      // Residual-only leg: no equi key by construction, so broadcast
      // is the plan — legal because wide catch-all intervals are
      // assumed rare (that assumption is the split's contract).
      val wide = p.drop("__ij_b")
        .join(broadcast(wideIv), residual, "inner")
      narrow.unionByName(wide)
    }
  }

  /** INTERVAL × INTERVAL overlap join, bucketized. Emits one row per
    * overlapping pair (closed-interval overlap: `l.lo ≤ r.hi AND
    * r.lo ≤ l.hi`) — session-overlap, measurement-window intersection,
    * range-vs-range reconciliation.
    *
    * Both sides explode to their bucket ranges and hash-join on the
    * bucket id. A pair that overlaps across k shared buckets would
    * surface k times; instead of a `distinct()` (a full extra shuffle
    * of the OUTPUT, which is the largest frame in the plan), each pair
    * is emitted only from its OWNER bucket — the first bucket both
    * occupy, `max(lo_bucket_l, lo_bucket_r)`. For genuinely
    * overlapping intervals `max(l.lo, r.lo)` lies in both, and floor
    * division is monotone, so the owner bucket is always a shared
    * bucket: exactly one copy survives, for free, inside the join
    * condition.
    *
    * Wide intervals (≥ `maxBucketsPerInterval` buckets) would explode
    * the index; they divert to broadcast residual-only legs (wide-left
    * × all-right, wide-right × narrow-left — wide×wide lands in the
    * first leg only, so nothing double-counts). Contract as in
    * [[pointInInterval]]: catch-all ranges are rare, which is what
    * makes them broadcastable.
    */
  def intervalOverlap(left: DataFrame, loL: String, hiL: String,
      right: DataFrame, loR: String, hiR: String,
      bucketWidth: Long, maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerInterval >= 0,
      "maxBucketsPerInterval must be >= 0 (0 disables the split)")
    require(Set(loL, hiL).intersect(Set(loR, hiR)).isEmpty,
      "bound column names must differ between the two sides (the " +
        "overlap residual references both by name)")
    val l0 = left.filter(col(loL) <= col(hiL))
      .withColumn("__ol_lob", fdiv(col(loL), bucketWidth))
      .withColumn("__ol_hib", fdiv(col(hiL), bucketWidth))
    val r0 = right.filter(col(loR) <= col(hiR))
      .withColumn("__or_lob", fdiv(col(loR), bucketWidth))
      .withColumn("__or_hib", fdiv(col(hiR), bucketWidth))
    val overlap = col(loL) <= col(hiR) && col(loR) <= col(hiL)

    def wideOf(df: DataFrame, lob: String, hib: String) =
      df.filter(col(hib) - col(lob) >= lit(maxBucketsPerInterval.toLong))
    def narrowOf(df: DataFrame, lob: String, hib: String) =
      if (maxBucketsPerInterval > 0)
        df.filter(col(hib) - col(lob) < lit(maxBucketsPerInterval.toLong))
      else df

    val lN = narrowOf(l0, "__ol_lob", "__ol_hib")
      .withColumn("__ol_b",
        explode(sequence(col("__ol_lob"), col("__ol_hib"))))
    val rN = narrowOf(r0, "__or_lob", "__or_hib")
      .withColumn("__or_b",
        explode(sequence(col("__or_lob"), col("__or_hib"))))
    val narrow = lN.hint("shuffle_hash")
      .join(rN.hint("shuffle_hash"),
        lN("__ol_b") === rN("__or_b") && overlap &&
          // owner-bucket dedup: emit from the first shared bucket only
          lN("__ol_b") === greatest(lN("__ol_lob"), rN("__or_lob")))
      .drop("__ol_b", "__or_b", "__ol_lob", "__ol_hib",
        "__or_lob", "__or_hib")

    if (maxBucketsPerInterval == 0) narrow
    else {
      val lW = wideOf(l0, "__ol_lob", "__ol_hib")
        .drop("__ol_lob", "__ol_hib")
      val rW = wideOf(r0, "__or_lob", "__or_hib")
        .drop("__or_lob", "__or_hib")
      val rAll = r0.drop("__or_lob", "__or_hib")
      val lNarrowPlain = narrowOf(l0, "__ol_lob", "__ol_hib")
        .drop("__ol_lob", "__ol_hib")
      val wideL = broadcast(lW).join(rAll, overlap, "inner")
      val wideR = lNarrowPlain.join(broadcast(rW), overlap, "inner")
      narrow.unionByName(wideL).unionByName(wideR)
    }
  }
}
