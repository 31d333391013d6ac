package graft.views

import java.sql.{Date, Timestamp}

/** The reference's "Standard Top-level Columns" contract as case classes
  * (SURVEY.md §1.3; /root/reference/transform/web100.sql:14-21 defines the
  * ordering `id, date, parser, server, client, a, raw`; the `a` summary
  * struct per /root/reference/views/ndt_intermediate/
  * extended_ndt7_downloads.sql:86-94).
  *
  * These model the *unified* row every modern table/view exposes; typed
  * `Dataset[UnifiedRow]` use sites get compile-time field checks while the
  * SQL surface sees the identical StructType.
  */
final case class ParserInfo(
    Version: String,
    Time: Timestamp,
    ArchiveURL: String,
    Filename: String)

final case class GeoInfo(
    ContinentCode: String,
    CountryCode: String,
    City: String,
    Latitude: Double,
    Longitude: Double)

final case class NetworkInfo(
    ASNumber: Long,
    ASName: String)

final case class EndpointInfo(
    IP: String,
    Port: Long,
    Geo: GeoInfo,
    Network: NetworkInfo)

/** The stable summary struct `a` (extended_ndt7_downloads.sql:86-94). */
final case class Summary(
    UUID: String,
    TestTime: Timestamp,
    CongestionControl: String,
    MeanThroughputMbps: Double,
    MinRTT: Double,
    LossRate: Double)

/** The cleaning-predicate struct `filter`
  * (extended_ndt7_downloads.sql:106-119): validity flags the unified view
  * combines into IsValidBest and then projects away.
  */
final case class ValidityFilter(
    IsComplete: Boolean,
    IsProduction: Boolean,
    IsError: Boolean,
    IsOAM: Boolean,
    IsPlatformAnomaly: Boolean,
    IsSmall: Boolean,
    IsShort: Boolean,
    IsLong: Boolean)

final case class UnifiedRow(
    id: String,
    date: Date,
    parser: ParserInfo,
    server: EndpointInfo,
    client: EndpointInfo,
    a: Summary,
    filter: ValidityFilter)

object StandardColumns {
  /** Validity-window constants (extended_ndt7_downloads.sql:113-115):
    * tests under 8 kB are "small", under 9 s "short", over 60 s "long".
    */
  val MinTransferBytes: Long = 8192L
  val MinDurationMs: Long = 9000L
  val MaxDurationMs: Long = 60000L
}
