package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's parameterized TABLE FUNCTION surface re-expressed as
  * DataFrame-returning Scala defs (SURVEY.md §2.10, §3.3).
  *
  * Reference: `functions/ops.ndt7_download_pdf_autonode.sql` builds a
  * log-spaced histogram by CROSS JOINing every sample with every bin and
  * summing a 0/1 indicator (O(n·bins)), then normalizes with a
  * partition-total window (pdf) and a running-sum window (cdf).
  *
  * Here the cross join is rewritten to direct O(n) bin assignment
  * (`floor((log10(x) − log10(xmin)) / step)`) — at 100 TB the cross-join
  * form multiplies the fact table by the bin count before aggregating,
  * while direct assignment is one map + one small-key aggregation. Empty
  * bins are restored by a tiny groups×bins frame (broadcast), preserving
  * the reference's "every bin present" output shape
  * (ops.ndt7_download_pdf_autonode.sql:39-56). The windows then run over
  * ≤(groups·bins) rows — constant-size, no skew.
  */
object Ops {

  /** Number of log bins for a given range/step, matching the reference's
    * `GENERATE_ARRAY(LOG(xmin,10), LOG(xmax,10), step)` edge count minus 1.
    */
  def numLogBins(xmin: Double, xmax: Double, step: Double): Int =
    math.floor((math.log10(xmax) - math.log10(xmin)) / step).toInt

  /** Log-spaced pdf + cdf of `valueCol` per `groupCol`.
    *
    * Output: groupCol, bin, bin_cnt, xright, pdf, cdf — one row per
    * (group, bin) incl. empty bins, like the reference TVF.
    */
  def logPdfCdf(df: DataFrame, valueCol: String, groupCol: String,
      xmin: Double, xmax: Double, step: Double): DataFrame = {
    val spark = df.sparkSession
    val nb = numLogBins(xmin, xmax, step)
    require(nb > 0, s"empty histogram: [$xmin,$xmax] step $step")

    val lgMin = log10(lit(xmin))
    val bin = least(
      floor((log10(col(valueCol)) - lgMin) / step), lit(nb - 1))
      .cast("int").as("bin")

    // O(n) bin assignment + partial-aggregated count: the only pass over
    // the (potentially 100 TB) fact table.
    val counts = df
      .filter(col(valueCol).between(xmin, xmax))
      .groupBy(col(groupCol), bin)
      .agg(count(lit(1)).as("bin_cnt"))

    // groups × bins completeness frame — tiny, broadcast.
    val bins = spark.range(nb).select(col("id").cast("int").as("bin"))
    val frame = df.select(groupCol).distinct().crossJoin(broadcast(bins))

    val full = frame
      .join(counts, Seq(groupCol, "bin"), "left")
      .withColumn("bin_cnt", coalesce(col("bin_cnt"), lit(0L)))

    val byGroup = Window.partitionBy(groupCol)
    val running = byGroup.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    full
      .withColumn("pdf_raw", col("bin_cnt") / sum("bin_cnt").over(byGroup))
      .select(
        col(groupCol), col("bin"), col("bin_cnt"),
        (floor((pow(10.0, lgMin + (col("bin") + 1) * step)) * 1000000.0 + 0.5) / 1000000.0).as("xright"),
        (floor((col("pdf_raw")) * 1000000.0 + 0.5) / 1000000.0).as("pdf"),
        (floor((sum("pdf_raw").over(running)) * 1000000.0 + 0.5) / 1000000.0).as("cdf"))
  }

  /** Geometric mean of `valueCol` per group — the reference's
    * ops.ndt7_geomean TVF (EXP(AVG(LN(x))), guarded to x > 0:
    * functions/ops.ndt7_geomean_autonode.sql:19-25,37).
    */
  def geomean(df: DataFrame, valueCol: String, groupCols: Seq[String])
      : DataFrame =
    df.filter(col(valueCol) > 0)
      .groupBy(groupCols.map(col): _*)
      .agg((floor((exp(avg(log(col(valueCol))))) * 10000.0 + 0.5) / 10000.0).as("geomean"),
        count(lit(1)).as("cnt"))

  /** Exact grouped deciles via distributed rank selection.
    *
    * Spark's `percentile()` aggregate buffers a value->count map that is
    * O(distinct values) PER GROUP and merges + sorts it on a single
    * reducer per group — a driver-sized memory hazard on high-cardinality
    * measures at 100 TB. This form instead ranks rows with a partitioned
    * Tungsten sort (spillable, distributed), keeps ONLY the <= 2 rows
    * that bracket each decile position (rank arithmetic in the filter),
    * and interpolates — identical values, data-scale work replaced by a
    * sort + a 22-rows-per-group reshape.
    *
    * Tradeoff, measured: with FEW groups the window exchange serializes
    * into one task per group (sf0.1 local[32]: slower than percentile's
    * 32-way partial aggregation), so the benched query keeps
    * `percentile`. With MANY groups and high-cardinality measures the
    * picture inverts — percentile's per-group value->count map is the
    * memory hazard and this form's sort spills gracefully. Pick by
    * group-count x cardinality, not by habit.
    *
    * Interpolation matches `percentile`/`quantile_cont`: position
    * q*(n-1) with q the IEEE double of i/10, result
    * v_lo + (v_hi - v_lo) * frac.
    *
    * Output: groupCol, idx (0..10), qv — same shape as decilesApprox.
    */
  def decilesByRank(df: DataFrame, valueCol: String, groupCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sortW = Window.partitionBy(groupCol).orderBy(col("v"))
    val allW = Window.partitionBy(groupCol)
    val ranked = df
      .select(col(groupCol), col(valueCol).cast("double").as("v"))
      .withColumn("rn", row_number().over(sortW))
      .withColumn("n", count(lit(1)).over(allW))
    def pos(i: Int) = (col("n") - 1).cast("double") * lit(i / 10.0)
    val needed = (0 to 10).map { i =>
      val lo = floor(pos(i))
      (col("rn") - 1 === lo) || (col("rn") - 1 === lo + 1)
    }.reduce(_ || _)
    ranked.filter(needed)
      .groupBy(col(groupCol))
      .agg(map_from_entries(collect_list(struct(col("rn"), col("v"))))
        .as("mp"), first("n").as("n"))
      .select(col(groupCol), explode(sequence(lit(0), lit(10))).as("idx"),
        col("mp"), col("n"))
      .withColumn("pos", (col("n") - 1).cast("double") *
        (col("idx").cast("double") / 10.0))
      .withColumn("lo", floor(col("pos")).cast("long"))
      .withColumn("frac", col("pos") - col("lo").cast("double"))
      .withColumn("vlo", element_at(col("mp"), (col("lo") + 1).cast("int")))
      .withColumn("vhi", element_at(col("mp"), (col("lo") + 2).cast("int")))
      .select(col(groupCol), col("idx"),
        when(col("frac") === 0.0, col("vlo"))
          .otherwise(col("vlo") + (col("vhi") - col("vlo")) * col("frac"))
          .as("qv"))
  }

  /** Approximate grouped deciles — the scale path for A5. The oracle-
    * checked queries use exact `percentile` (deterministic across
    * engines, SURVEY §5.3); at 100 TB exact percentiles need a full sort
    * per group, while `percentile_approx` is a fixed-size mergeable
    * sketch. Same output shape as the exact form.
    */
  def decilesApprox(df: DataFrame, valueCol: String, groupCol: String,
      accuracy: Int = 10000): DataFrame =
    df.groupBy(col(groupCol))
      .agg(percentile_approx(col(valueCol),
        lit((0 to 10).map(_ / 10.0).toArray), lit(accuracy)).as("qs"))
      .select(col(groupCol), posexplode(col("qs")).as(Seq("idx", "qv")))

  /** Approximate distinct counts — the scale path for the exact
    * COUNT(DISTINCT) surface (q52). Exact multi-distinct plans an Expand
    * (one input row per distinct aggregate) plus a shuffle keyed on the
    * distinct value; at 100 TB the HLL++ sketch is a fixed-size mergeable
    * buffer with map-side partial aggregation instead. Sketches are not
    * cross-engine deterministic, so this is spec-tested for its error
    * envelope rather than oracle-hashed (SURVEY §5.3 rule).
    */
  def approxDistinct(df: DataFrame, groupCol: String, valueCols: Seq[String],
      relativeSD: Double = 0.01): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("cnt"),
        valueCols.map(c =>
          approx_count_distinct(col(c), relativeSD).as(s"approx_$c")): _*)

  /** The reference's "complete" TVF pattern: the union of the same
    * computation over two populations, tagged by source
    * (functions/ops.ndt7_download_pdf_complete.sql:10-17).
    */
  def logPdfCdfComplete(a: DataFrame, aTag: String, b: DataFrame, bTag: String,
      valueCol: String, groupCol: String,
      xmin: Double, xmax: Double, step: Double): DataFrame =
    logPdfCdf(a, valueCol, groupCol, xmin, xmax, step)
      .withColumn("src", lit(aTag))
      .unionAll(
        logPdfCdf(b, valueCol, groupCol, xmin, xmax, step)
          .withColumn("src", lit(bTag)))

  /** The reference's `mask BOOL` TVF argument
    * (functions/ops.ndt7_upload_pdf_autonode.sql:8,29): when set, samples
    * whose masking metric falls inside a known measurement-artifact band
    * are excluded before binning (`IF(mask, NOT a.MeanThroughputMbps
    * BETWEEN 0.42 AND 0.43, TRUE)` — an ndt7-upload artifact spike), so
    * published distributions re-aggregate over the surviving samples
    * only. The reference always masks on MeanThroughputMbps even when
    * plotting another field, hence the separate `maskCol` (defaults to
    * `valueCol`). NULL masking metrics are excluded under mask, like the
    * reference's three-valued NOT BETWEEN.
    */
  def logPdfCdfMasked(df: DataFrame, valueCol: String, groupCol: String,
      xmin: Double, xmax: Double, step: Double, mask: Boolean,
      maskCol: String = null,
      bandLo: Double = 0.42, bandHi: Double = 0.43): DataFrame = {
    val mc = Option(maskCol).getOrElse(valueCol)
    val in = if (mask) df.filter(!col(mc).between(bandLo, bandHi)) else df
    logPdfCdf(in, valueCol, groupCol, xmin, xmax, step)
  }
}
