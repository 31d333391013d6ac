package graft.views

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SafeOps

/** The raw → intermediate → unified view chain (SURVEY.md §3.2), as
  * `DataFrame => DataFrame` transforms.
  *
  * Reference shape: `extended_ndt7_downloads`
  * (/root/reference/views/ndt_intermediate/extended_ndt7_downloads.sql)
  * takes raw ndt7 rows — nested `raw.Download.ServerMeasurements[]` with
  * TCPInfo counters — and produces the standard-columns row: final
  * snapshot via array-last (:16), test_duration (:20), validity flags
  * (:106-119), the `a` summary struct (:86-94). `unified_downloads`
  * (/root/reference/views/ndt/unified_downloads.sql:86-104) then UNION
  * ALLs the per-era branches, computes IsValidBest from `filter.*`, keeps
  * valid rows and projects `* EXCEPT (filter)`.
  *
  * Input contract for [[extendedDownloads]] (the ndt7-era analog):
  *   id STRING, date DATE, parser STRUCT<...>, server STRUCT<...>,
  *   client STRUCT<...>,
  *   raw STRUCT<Download: STRUCT<UUID: STRING, StartTime: TIMESTAMP,
  *     CongestionControl: STRING,
  *     ServerMeasurements: ARRAY<STRUCT<ElapsedTime: BIGINT,  // µs
  *       TCPInfo: STRUCT<BytesAcked: BIGINT, MinRTT: BIGINT,  // µs
  *         BytesRetrans: BIGINT, BytesSent: BIGINT>>>>>
  *
  * At 100 TB: every step is a per-row projection (no shuffle); the union
  * is metadata-only; the date partition filter prunes before any of it
  * runs (enforced by graft.plans.PartitionFilterCheck).
  */
object UnifiedViews {

  /** Intermediate view: reshape one era's raw rows into the standard
    * columns + validity filter. Mirrors extended_ndt7_downloads.sql.
    */
  def extendedDownloads(raw: DataFrame): DataFrame = {
    val meas = col("raw.Download.ServerMeasurements")
    val fin = SafeOps.arrayLast(meas) // FinalSnapshot idiom (:16)
    val elapsedUs = fin.getField("ElapsedTime")
    val bytesAcked = fin.getField("TCPInfo").getField("BytesAcked")
    val bytesSent = fin.getField("TCPInfo").getField("BytesSent")
    val bytesRetrans = fin.getField("TCPInfo").getField("BytesRetrans")
    val minRttUs = fin.getField("TCPInfo").getField("MinRTT")
    val durationMs = (elapsedUs / 1000L).cast("long")

    raw
      // Valid-UUID guard, the earliest predicate in the reference (:24-27)
      .filter(col("raw.Download.UUID").isNotNull &&
        !col("raw.Download.UUID").isin("", "ERROR_DISCOVERING_UUID"))
      .withColumn("a", struct(
        col("raw.Download.UUID").as("UUID"),
        col("raw.Download.StartTime").as("TestTime"),
        col("raw.Download.CongestionControl").as("CongestionControl"),
        // MeanThroughputMbps = bytes·8 / elapsed(µs): both µs and Mbps
        // carry the 1e6, so the ratio needs no further scaling (:88).
        (SafeOps.safeDivide(bytesAcked * 8.0, elapsedUs.cast("double")))
          .as("MeanThroughputMbps"),
        (minRttUs.cast("double") / 1000.0).as("MinRTT"),
        SafeOps.safeDivide(bytesRetrans.cast("double"),
          bytesSent.cast("double")).as("LossRate")))
      .withColumn("filter", struct(
        (size(meas) > 0).as("IsComplete"),
        col("parser.ArchiveURL").rlike("mlab[1-3]-[a-z]{3}[0-9c][0-9t]")
          .as("IsProduction"), // site-name regex (:69-70)
        lit(false).as("IsError"),
        graft.functions.GraftFunctions.isPrivateIp(col("client.IP"))
          .isNotNull.and(coalesce(
            graft.functions.GraftFunctions.isPrivateIp(col("client.IP")),
            lit(false))).as("IsOAM"), // RFC1918 check (:61-67)
        lit(false).as("IsPlatformAnomaly"),
        (bytesAcked < StandardColumns.MinTransferBytes).as("IsSmall"),
        (durationMs < StandardColumns.MinDurationMs).as("IsShort"),
        (durationMs > StandardColumns.MaxDurationMs).as("IsLong")))
      .select("id", "date", "parser", "server", "client", "a", "filter")
  }

  /** IsValidBest (unified_downloads.sql:47-60): complete, production,
    * non-error, non-OAM, non-anomalous, and inside the size/duration
    * window.
    */
  def isValidBest: Column =
    col("filter.IsComplete") && col("filter.IsProduction") &&
      !col("filter.IsError") && !col("filter.IsOAM") &&
      !col("filter.IsPlatformAnomaly") && !col("filter.IsSmall") &&
      !col("filter.IsShort") && !col("filter.IsLong")

  /** Unified view: positional UNION ALL of era branches (all already in
    * standard-columns shape), validity filter, `* EXCEPT (filter)`.
    * `applyFilter=false` is the `_nofilter` variant the reference
    * generates with sed (create_dataset_views.sh:107-108).
    */
  def unifiedDownloads(branches: Seq[DataFrame],
      applyFilter: Boolean = true): DataFrame = {
    require(branches.nonEmpty, "unifiedDownloads: no branches")
    val unioned = branches.reduce(_ unionAll _)
    val kept = if (applyFilter) unioned.filter(isValidBest) else unioned
    kept.drop("filter") // SELECT * EXCEPT (filter)  (:102)
  }

  /** GraftFunctions registration is needed for the IsOAM predicate. */
  def prepare(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.functions.GraftFunctions.registerAll(spark)
}
