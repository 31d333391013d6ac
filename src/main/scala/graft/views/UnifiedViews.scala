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

  /** Name/Value pair list type shared by every era's ClientMetadata /
    * ServerMetadata (the reference's modernized-metadata shape,
    * extended_web100_downloads.sql:53-66).
    */
  val MetaPairsType = "array<struct<Name:string,Value:string>>"

  /** Site-name production regex (extended_ndt7_downloads.sql:69-70). */
  private def isProductionArchive(url: Column): Column =
    url.rlike("mlab[1-3]-[a-z]{3}[0-9c][0-9t]")

  /** The reference's OAM client-IP list (script-exporter VMs, e2e-test
    * addresses — extended_ndt7_downloads.sql:51-58; one shared list here
    * where the reference carries slight per-era variants).
    */
  val OamIps: Seq[String] = Seq(
    "35.193.254.117", "35.225.75.192", "35.192.37.249",
    "23.228.128.99", "2605:a601:f1ff:fffe::99",
    "45.56.98.222", "2600:3c03::f03c:91ff:fe33:819",
    "35.202.153.90", "35.188.150.110")

  private def isOamClient(ip: Column): Column = ip.isin(OamIps: _*)

  /** The deprecated-but-still-filtered RFC1918 check
    * (extended_ndt7_downloads.sql:60-67), its own flag beside IsOAM as in
    * the reference.
    */
  private def isRfc1918Client(ip: Column): Column =
    coalesce(graft.functions.GraftFunctions.isPrivateIp(ip), lit(false))

  /** Does a dotted field path resolve in this frame's schema? Arrays are
    * traversed into their element type. Used for flags whose source
    * counters only exist in some archive eras.
    */
  private def hasPath(df: DataFrame, path: String): Boolean = {
    import org.apache.spark.sql.types.{ArrayType, DataType, StructType}
    def walk(dt: DataType, parts: List[String]): Boolean = (dt, parts) match {
      case (_, Nil) => true
      case (ArrayType(e, _), _) => walk(e, parts)
      case (s: StructType, head :: rest) if s.fieldNames.contains(head) =>
        walk(s(head).dataType, rest)
      case _ => false
    }
    walk(StructType(df.schema.fields), path.split('.').toList)
  }

  /** Optional field of `raw.Download`: present → pass through, absent →
    * typed null (older archives predate client metadata).
    */
  private def optDownloadField(raw: DataFrame, field: String): Column =
    if (hasPath(raw, s"raw.Download.$field")) col(s"raw.Download.$field")
    else lit(null).cast(MetaPairsType)

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
        lit("Download").as("Direction"), // (:89)
        col("raw.Download.CongestionControl").as("CongestionControl"),
        // MeanThroughputMbps = bytes·8 / elapsed(µs): both µs and Mbps
        // carry the 1e6, so the ratio needs no further scaling (:88).
        (SafeOps.safeDivide(bytesAcked * 8.0, elapsedUs.cast("double")))
          .as("MeanThroughputMbps"),
        (minRttUs.cast("double") / 1000.0).as("MinRTT"),
        SafeOps.safeDivide(bytesRetrans.cast("double"),
          bytesSent.cast("double")).as("LossRate")))
      // metadata struct (:96-103): view name, protocol, client/server
      // metadata passed through from raw, parser provenance array
      .withColumn("metadata", struct(
        lit("extended_ndt7_downloads").as("View"),
        concat(lit("ndt7"),
          when(col("client.IP").contains(":"), lit("-IPv6"))
            .otherwise(lit("-IPv4")),
          when(col("server.Port") === 443, lit("-WSS"))
            .when(col("server.Port") === 80, lit("-WS"))
            .otherwise(lit("-unknown"))).as("Protocol"), // (:42-48)
        optDownloadField(raw, "ClientMetadata").as("ClientMetadata"),
        optDownloadField(raw, "ServerMetadata").as("ServerMetadata"),
        array(col("parser")).as("Tables")))
      .withColumn("filter", struct(
        (size(meas) > 0).as("IsComplete"),
        isProductionArchive(col("parser.ArchiveURL")).as("IsProduction"),
        lit(false).as("IsError"),
        isOamClient(col("client.IP")).as("IsOAM"),
        isRfc1918Client(col("client.IP")).as("_IsRFC1918"),
        lit(false).as("IsPlatformAnomaly"),
        (bytesAcked < StandardColumns.MinTransferBytes).as("IsSmall"),
        (durationMs < StandardColumns.MinDurationMs).as("IsShort"),
        (durationMs > StandardColumns.MaxDurationMs).as("IsLong"),
        // "early_exit" IN (SELECT Name FROM UNNEST(ClientMetadata)) (:40)
        (if (hasPath(raw, "raw.Download.ClientMetadata"))
          coalesce(exists(col("raw.Download.ClientMetadata"),
            m => m.getField("Name") === "early_exit"), lit(false))
        else lit(false)).as("IsEarlyExit"),
        // Obsolete congestion flags, still feeding IsValid2021 (:72-75)
        (if (hasPath(raw, "raw.Download.ServerMeasurements.TCPInfo.TotalRetrans"))
          coalesce(fin.getField("TCPInfo").getField("TotalRetrans") > 0,
            lit(false))
        else lit(false)).as("_IsCongested"),
        (if (hasPath(raw, "raw.Download.ServerMeasurements.TCPInfo.RTT"))
          coalesce(
            fin.getField("TCPInfo").getField("RTT") >
              fin.getField("TCPInfo").getField("MinRTT") * 2 &&
              fin.getField("TCPInfo").getField("RTT") > 1000, lit(false))
        else lit(false)).as("_IsBloated")))
      .select("id", "date", "parser", "server", "client", "a", "metadata",
        "filter")
  }

  /** ndt5-era intermediate view: the join-enriched branch. The raw table
    * carries the S2C control record; the TCP counters live in a SEPARATE
    * same-grain raw table, LEFT JOINed USING (date, id) so tests without
    * a tcpinfo row survive with IsComplete=false — the reference shape at
    * extended_ndt5_downloads.sql:76-81.
    *
    * At 100 TB this is a raw↔raw shuffle join on (date, id) — both sides
    * are date-partitioned, so the join only pairs within a date partition
    * and each side must arrive pre-filtered by the same date window
    * (PartitionFilterCheck's contract); nothing here is broadcastable.
    *
    * Input contracts:
    *   raw: id, date, parser, server, client, raw STRUCT<
    *     S2C: STRUCT<UUID, StartTime, EndTime, ClientIP, Error>,
    *     Control: STRUCT<Protocol, MessageProtocol,
    *       ClientMetadata/ServerMetadata: MetaPairsType>>
    *   tcpinfo: id, date, parser, FinalSnapshot STRUCT<
    *     CongestionAlgorithm, TCPInfo: STRUCT<BytesAcked, BytesSent,
    *       BytesRetrans, MinRTT(µs)>>
    *
    * (The reference's raw ndt5 table carries a precomputed `a` summary;
    * our raw contract has none, so the summary is derived in-view from
    * FinalSnapshot — same output schema.)
    */
  def extendedNdt5Downloads(raw: DataFrame, tcpinfo: DataFrame): DataFrame = {
    // Valid-S2C guard (extended_ndt5_downloads.sql:19-21)
    val dl = raw.filter(col("raw.S2C").isNotNull &&
      col("raw.S2C.UUID").isNotNull &&
      !col("raw.S2C.UUID").isin("", "ERROR_DISCOVERING_UUID"))
    val tcp = tcpinfo.select(col("date"), col("id"),
      col("parser").as("TCPparser"), col("FinalSnapshot"))
    val joined = dl.join(tcp, Seq("date", "id"), "left") // (:76-81)
    val fin = col("FinalSnapshot")
    val tcpi = fin.getField("TCPInfo")
    val durationMs = // TIMESTAMP_DIFF(EndTime, StartTime, MILLISECOND) (:16)
      unix_millis(col("raw.S2C.EndTime").cast("timestamp")) -
        unix_millis(col("raw.S2C.StartTime").cast("timestamp"))
    val acked = tcpi.getField("BytesAcked")
    joined.select(col("id"), col("date"), col("parser"), col("server"),
      col("client"),
      struct(
        col("raw.S2C.UUID").as("UUID"),
        col("raw.S2C.StartTime").as("TestTime"),
        lit("Download").as("Direction"),
        fin.getField("CongestionAlgorithm").as("CongestionControl"),
        SafeOps.safeDivide(acked * 8.0, (durationMs * 1000L).cast("double"))
          .as("MeanThroughputMbps"),
        (tcpi.getField("MinRTT").cast("double") / 1000.0).as("MinRTT"),
        SafeOps.safeDivide(tcpi.getField("BytesRetrans").cast("double"),
          tcpi.getField("BytesSent").cast("double")).as("LossRate"))
        .as("a"),
      struct(
        lit("extended_ndt5_downloads").as("View"),
        // CONCAT("ndt5-", IPv4/IPv6, Protocol[, "-"MessageProtocol]) (:37-44)
        concat(lit("ndt5-"),
          when(col("raw.S2C.ClientIP").contains(":"), lit("IPv6-"))
            .otherwise(lit("IPv4-")),
          col("raw.Control.Protocol"),
          when(col("raw.Control.Protocol") === "plain",
            concat(lit("-"), col("raw.Control.MessageProtocol")))
            .otherwise(lit(""))).as("Protocol"),
        col("raw.Control.ClientMetadata").as("ClientMetadata"),
        col("raw.Control.ServerMetadata").as("ServerMetadata"),
        array(col("parser"), col("TCPparser")).as("Tables")) // (:103)
        .as("metadata"),
      struct(
        fin.isNotNull.as("IsComplete"), // FinalSnapshot IS NOT NULL (:110)
        isProductionArchive(col("parser.ArchiveURL")).as("IsProduction"),
        (col("raw.S2C.Error").isNotNull && col("raw.S2C.Error") =!= "")
          .as("IsError"), // (:15)
        isOamClient(col("client.IP")).as("IsOAM"),
        isRfc1918Client(col("client.IP")).as("_IsRFC1918"),
        lit(false).as("IsPlatformAnomaly"),
        (acked < StandardColumns.MinTransferBytes).as("IsSmall"),
        (durationMs < StandardColumns.MinDurationMs).as("IsShort"),
        (durationMs > StandardColumns.MaxDurationMs).as("IsLong"),
        lit(false).as("IsEarlyExit"), // not supported for ndt5 (:119)
        // (TotalRetrans > 0), (RTT > 2·MinRTT AND RTT > 1000) (:71-74)
        (if (hasPath(tcpinfo, "FinalSnapshot.TCPInfo.TotalRetrans"))
          coalesce(tcpi.getField("TotalRetrans") > 0, lit(false))
        else lit(false)).as("_IsCongested"),
        (if (hasPath(tcpinfo, "FinalSnapshot.TCPInfo.RTT"))
          coalesce(tcpi.getField("RTT") > tcpi.getField("MinRTT") * 2 &&
            tcpi.getField("RTT") > 1000, lit(false))
        else lit(false)).as("_IsBloated"))
        .as("filter"))
  }

  /** web100-era intermediate view: the metadata-synthesis branch. The old
    * flat connection/snap counters are modernized in-view: ClientMetadata
    * and ServerMetadata are BUILT as literal Name/Value struct arrays
    * (`array(struct(lit(...), col(...)))`) — the
    * extended_web100_downloads.sql:53-66 idiom.
    *
    * Input contract: id, date, parser, server, client, raw STRUCT<
    *   connection: STRUCT<data_direction, client_application,
    *     client_browser, client_hostname, client_ip, server_hostname,
    *     server_ip, websockets, tls, start_time>,
    *   web100: STRUCT<snap: STRUCT<Duration, State, SndLimTimeRwin,
    *     SndLimTimeCwnd, SndLimTimeSnd (µs), HCThruOctetsAcked,
    *     MinRTT(ms), SegsRetrans, SegsOut>>>
    */
  def extendedWeb100Downloads(raw: DataFrame): DataFrame = {
    val conn = col("raw.connection")
    val snap = col("raw.web100.snap")
    // downloads only (data_direction = 1, :16)
    val dl = raw.filter(conn.getField("data_direction") === 1)
    // Time transferring data, ms (:39-41)
    val measurementMs = (snap.getField("SndLimTimeRwin") +
      snap.getField("SndLimTimeCwnd") + snap.getField("SndLimTimeSnd")) *
      0.001
    val acked = snap.getField("HCThruOctetsAcked")
    val isComplete = snap.getField("Duration").isNotNull && // (:28-35)
      snap.getField("State").isNotNull &&
      conn.getField("server_ip").isNotNull &&
      conn.getField("client_ip").isNotNull &&
      snap.getField("SndLimTimeRwin").isNotNull &&
      snap.getField("SndLimTimeCwnd").isNotNull &&
      snap.getField("SndLimTimeSnd").isNotNull
    dl.select(col("id"), col("date"), col("parser"), col("server"),
      col("client"),
      struct(
        col("id").as("UUID"), // web100 predates UUIDs; id stands in
        conn.getField("start_time").as("TestTime"),
        lit("Download").as("Direction"),
        lit("reno").as("CongestionControl"), // (:104)
        SafeOps.safeDivide(acked * 0.008, measurementMs)
          .as("MeanThroughputMbps"), // (:106)
        (snap.getField("MinRTT") * 1.0).as("MinRTT"),
        SafeOps.safeDivide(snap.getField("SegsRetrans").cast("double"),
          snap.getField("SegsOut").cast("double")).as("LossRate"))
        .as("a"),
      struct(
        lit("extended_web100_downloads").as("View"),
        // CONCAT("Web100", IPv, WSS/WS/SSL/PLAIN) (:44-50)
        concat(lit("Web100"),
          when(conn.getField("client_ip").contains(":"), lit("-IPv6"))
            .otherwise(lit("-IPv4")),
          when(conn.getField("websockets"),
            when(conn.getField("tls"), lit("-WSS")).otherwise(lit("-WS")))
            .otherwise(
              when(conn.getField("tls"), lit("-SSL"))
                .otherwise(lit("-PLAIN")))).as("Protocol"),
        // the array(struct(lit Name, col Value)) literal idiom (:53-61)
        array(
          struct(lit("client_application").as("Name"),
            conn.getField("client_application").as("Value")),
          struct(lit("client_browser").as("Name"),
            conn.getField("client_browser").as("Value")),
          struct(lit("client_hostname").as("Name"),
            conn.getField("client_hostname").as("Value")))
          .as("ClientMetadata"),
        array( // (:62-65)
          struct(lit("server_hostname").as("Name"),
            conn.getField("server_hostname").as("Value")),
          struct(lit("server_ip").as("Name"),
            conn.getField("server_ip").as("Value"))).as("ServerMetadata"),
        array(col("parser")).as("Tables")).as("metadata"),
      struct(
        isComplete.as("IsComplete"),
        isProductionArchive(col("parser.ArchiveURL")).as("IsProduction"),
        lit(false).as("IsError"), // (:37)
        isOamClient(col("client.IP")).as("IsOAM"),
        isRfc1918Client(col("client.IP")).as("_IsRFC1918"),
        lit(false).as("IsPlatformAnomaly"),
        (acked < StandardColumns.MinTransferBytes).as("IsSmall"),
        (measurementMs < StandardColumns.MinDurationMs).as("IsShort"),
        (measurementMs > StandardColumns.MaxDurationMs).as("IsLong"),
        lit(false).as("IsEarlyExit"), // not present in web100 data (:130)
        // OctetsRetrans > 0; SmoothedRTT > 2·MinRTT AND > 1000 (:88-91)
        (if (hasPath(raw, "raw.web100.snap.OctetsRetrans"))
          coalesce(snap.getField("OctetsRetrans") > 0, lit(false))
        else lit(false)).as("_IsCongested"),
        (if (hasPath(raw, "raw.web100.snap.SmoothedRTT"))
          coalesce(
            snap.getField("SmoothedRTT") > snap.getField("MinRTT") * 2 &&
              snap.getField("SmoothedRTT") > 1000, lit(false))
        else lit(false)).as("_IsBloated"))
        .as("filter"))
  }

  /** IsValidBest (unified_downloads.sql:47-60): complete, production,
    * non-error, non-OAM, non-anomalous, inside the size/duration window
    * (short tests rescued by early-exit), and not RFC1918.
    */
  def isValidBest: Column =
    col("filter.IsComplete") && col("filter.IsProduction") &&
      !col("filter.IsError") && !col("filter.IsOAM") &&
      !col("filter.IsPlatformAnomaly") && !col("filter.IsSmall") &&
      (!col("filter.IsShort") || col("filter.IsEarlyExit")) &&
      !col("filter.IsLong") && !col("filter._IsRFC1918")

  /** IsValid2023 (unified_downloads.sql:62-73): the pre-early-exit
    * understanding — IsValidBest without the rescue clause.
    */
  def isValid2023: Column =
    col("filter.IsComplete") && col("filter.IsProduction") &&
      !col("filter.IsError") && !col("filter.IsOAM") &&
      !col("filter.IsPlatformAnomaly") && !col("filter.IsSmall") &&
      !col("filter.IsShort") && !col("filter.IsLong") &&
      !col("filter._IsRFC1918")

  /** IsValid2021 (unified_downloads.sql:75-88): pre-2022 semantics,
    * additionally requiring evidence the path was actually stressed
    * (congested or bloated).
    */
  def isValid2021: Column =
    isValid2023 && (col("filter._IsCongested") || col("filter._IsBloated"))

  /** Unified view: positional UNION ALL of era branches (all already in
    * standard-columns shape), the three IsValid* vintages as columns,
    * validity filter, `* EXCEPT (filter)`. `applyFilter=false` is the
    * `_nofilter` variant the reference generates with sed
    * (create_dataset_views.sh:107-108).
    */
  def unifiedDownloads(branches: Seq[DataFrame],
      applyFilter: Boolean = true): DataFrame = {
    require(branches.nonEmpty, "unifiedDownloads: no branches")
    val unioned = branches.reduce(_ unionAll _)
      .withColumn("IsValidBest", isValidBest)
      .withColumn("IsValid2023", isValid2023)
      .withColumn("IsValid2021", isValid2021)
    val kept =
      if (applyFilter) unioned.filter(col("IsValidBest")) else unioned
    kept.drop("filter") // SELECT * EXCEPT (filter)  (:102)
  }

  // ------------------------------------------------------------------
  // Upload direction (views/ndt_intermediate/extended_*_uploads.sql +
  // views/ndt/unified_uploads.sql). Same standard-columns machinery as
  // downloads with the upload-specific semantics:
  //   - a.CongestionControl is the literal 'Unknown'
  //     (extended_ndt7_uploads.sql:82 — etl-schema#95);
  //   - a.LossRate is NULL — the receiver cannot disambiguate
  //     reordering from loss (extended_ndt7_uploads.sql:85);
  //   - test_duration is EndTime−StartTime, not the final snapshot's
  //     ElapsedTime (extended_ndt7_uploads.sql:19);
  //   - IsSmall keys on TCPInfo.BytesReceived (:105);
  //   - no early-exit rescue in IsValidBest (unified_uploads.sql:47-58);
  //   - client/server structs are REBUILT: IP/Port relocated from the
  //     raw record and Geo.Region masked to NULL
  //     (extended_ndt7_uploads.sql:113-167 — etl#1069 region mask).
  // ------------------------------------------------------------------

  /** Upload-side production regex (extended_ndt7_uploads.sql:66-67) —
    * note it is NOT the downloads regex: plain `[0-9][0-9]`, no `c`/`t`
    * site-suffix classes.
    */
  private def isProductionArchiveUpload(url: Column): Column =
    url.rlike("mlab[1-3]-[a-z][a-z][a-z][0-9][0-9]")

  /** web100-era OAM list (extended_web100_uploads.sql:73-76) — only the
    * early OAM devices; shorter than [[OamIps]] (no GCE script-exporter
    * sandbox VM, no GKE e2e IPs).
    */
  val Web100OamIps: Seq[String] = Seq(
    "45.56.98.222", "35.192.37.249", "35.225.75.192", "23.228.128.99",
    "2600:3c03::f03c:91ff:fe33:819", "2605:a601:f1ff:fffe::99")

  /** The 17-field Geo struct rebuilt with Region masked to NULL
    * (extended_ndt7_uploads.sql:118-136 — etl#1069: "eliminate region
    * mask once parser does this"). Field order matters: the unified
    * union is positional.
    */
  def maskedGeo(geo: Column): Column = {
    val head = Seq("ContinentCode", "CountryCode", "CountryCode3",
      "CountryName").map(f => geo.getField(f).as(f))
    val tail = Seq("Subdivision1ISOCode", "Subdivision1Name",
      "Subdivision2ISOCode", "Subdivision2Name", "MetroCode", "City",
      "AreaCode", "PostalCode", "Latitude", "Longitude",
      "AccuracyRadiusKm", "Missing").map(f => geo.getField(f).as(f))
    struct(head ++ (lit(null).cast("string").as("Region") +: tail): _*)
  }

  /** The upload `a` summary struct (extended_ndt7_uploads.sql:78-86):
    * fixed Direction/CongestionControl, NULL LossRate.
    */
  private def uploadSummary(uuid: Column, testTime: Column, mbps: Column,
      minRttMs: Column): Column =
    struct(uuid.as("UUID"), testTime.as("TestTime"),
      lit("Upload").as("Direction"),
      lit("Unknown").as("CongestionControl"),
      mbps.as("MeanThroughputMbps"), minRttMs.as("MinRTT"),
      lit(null).cast("double").as("LossRate"))

  /** The upload filter struct (extended_ndt7_uploads.sql:98-111): the
    * congestion-evidence flags are hard false — an upload's sender-side
    * counters aren't visible to the receiver.
    */
  private def uploadFilter(isComplete: Column, isProduction: Column,
      isError: Column, isOam: Column, isRfc1918: Column,
      isPlatformAnomaly: Column, recvBytes: Column,
      durationMs: Column): Column =
    struct(
      isComplete.as("IsComplete"), isProduction.as("IsProduction"),
      isError.as("IsError"), isOam.as("IsOAM"),
      isRfc1918.as("_IsRFC1918"),
      isPlatformAnomaly.as("IsPlatformAnomaly"),
      (recvBytes < StandardColumns.MinTransferBytes).as("IsSmall"),
      (durationMs < StandardColumns.MinDurationMs * 1.0).as("IsShort"),
      (durationMs > StandardColumns.MaxDurationMs * 1.0).as("IsLong"),
      lit(false).as("IsEarlyExit"), // not supported for uploads (:108)
      lit(false).as("_IsCongested"), lit(false).as("_IsBloated"))

  /** Rebuilt client struct: IP/Port relocated from the raw record
    * (etl-schema#141), Geo region-masked (extended_ndt7_uploads.sql:
    * 113-138).
    */
  private def uploadClient(ip: Column, port: Column, geo: Column,
      network: Column): Column =
    struct(ip.as("IP"), port.as("Port"), maskedGeo(geo).as("Geo"),
      network.as("Network"))

  /** Rebuilt server struct, with Site/Machine kept beside the relocated
    * IP/Port (extended_ndt7_uploads.sql:140-167).
    */
  private def uploadServer(ip: Column, port: Column, site: Column,
      machine: Column, geo: Column, network: Column): Column =
    struct(ip.as("IP"), port.as("Port"), site.as("Site"),
      machine.as("Machine"), maskedGeo(geo).as("Geo"),
      network.as("Network"))

  /** ndt7-era upload intermediate view
    * (extended_ndt7_uploads.sql). Input contract: the downloads shape
    * with `raw.Upload` in place of `raw.Download` plus the raw-level
    * address fields the upload views relocate:
    *   raw STRUCT<ClientIP, ClientPort, ServerIP, ServerPort,
    *     Upload: STRUCT<UUID, StartTime, EndTime,
    *       ClientMetadata/ServerMetadata: MetaPairsType,
    *       ServerMeasurements: ARRAY<STRUCT<ElapsedTime,
    *         TCPInfo: STRUCT<BytesReceived, MinRTT(µs)>>>>>
    * and client/server carrying Geo + Network (+ server Site/Machine).
    * Per-row projection only — no shuffle at any scale.
    */
  def extendedNdt7Uploads(raw: DataFrame): DataFrame = {
    val meas = col("raw.Upload.ServerMeasurements")
    val fin = SafeOps.arrayLast(meas) // FinalSnapshot (:16)
    val recv = fin.getField("TCPInfo").getField("BytesReceived")
    // TIMESTAMP_DIFF(EndTime, StartTime, MILLISECOND) * 1.0  (:19)
    val durationMs =
      (unix_millis(col("raw.Upload.EndTime").cast("timestamp")) -
        unix_millis(col("raw.Upload.StartTime").cast("timestamp"))) * 1.0
    raw
      .filter(col("raw.Upload").isNotNull && // valid-C2S guard (:23-26)
        col("raw.Upload.UUID").isNotNull &&
        !col("raw.Upload.UUID").isin("", "ERROR_DISCOVERING_UUID"))
      .select(col("id"), col("date"),
        uploadSummary(
          col("raw.Upload.UUID"), col("raw.Upload.StartTime"),
          // Receiver-side throughput: BytesReceived·8 over µs (:83)
          SafeOps.safeDivide(recv * 8.0, durationMs * 1000.0),
          fin.getField("TCPInfo").getField("MinRTT").cast("double")
            / 1000.0).as("a"),
        struct(
          lit("extended_ndt7_uploads").as("View"),
          concat(lit("ndt7"), // (:40-45), on the raw-level ClientIP
            when(col("raw.ClientIP").contains(":"), lit("-IPv6"))
              .otherwise(lit("-IPv4")),
            when(col("raw.ServerPort") === 443, lit("-WSS"))
              .when(col("raw.ServerPort") === 80, lit("-WS"))
              .otherwise(lit("-unknown"))).as("Protocol"),
          col("raw.Upload.ClientMetadata").as("ClientMetadata"),
          col("raw.Upload.ServerMetadata").as("ServerMetadata"),
          array(col("parser")).as("Tables")).as("metadata"),
        uploadFilter(
          isComplete = fin.isNotNull, // (:37)
          isProduction =
            isProductionArchiveUpload(col("parser.ArchiveURL")),
          isError = lit(false), // ndt-server#317 TODO in reference (:17)
          isOam = isOamClient(col("raw.ClientIP")),
          isRfc1918 = isRfc1918Client(col("raw.ClientIP")),
          isPlatformAnomaly = lit(false),
          recvBytes = recv, durationMs = durationMs).as("filter"),
        uploadClient(col("raw.ClientIP"), col("raw.ClientPort"),
          col("client.Geo"), col("client.Network")).as("client"),
        uploadServer(col("raw.ServerIP"), col("raw.ServerPort"),
          col("server.Site"), col("server.Machine"), col("server.Geo"),
          col("server.Network")).as("server"))
  }

  /** ndt5-era upload intermediate view (extended_ndt5_uploads.sql):
    * C2S control record LEFT JOINed with the separate tcpinfo raw table
    * USING (date, id) (:70-72). Upload-specific quirk kept faithfully:
    * _IsRFC1918 tests the SERVER address, not the client
    * (extended_ndt5_uploads.sql:57-63), so RFC1918 clients are NOT
    * excluded in this era. Same 100 TB shape as the downloads twin:
    * date-partition-aligned shuffle join, nothing broadcastable.
    *
    * Input contracts: raw as the downloads ndt5 shape with raw.C2S
    * carrying UUID/StartTime/EndTime/ClientIP/ClientPort/ServerIP/
    * ServerPort/Error; tcpinfo with
    * FinalSnapshot.TCPInfo.{BytesReceived, MinRTT(µs)}.
    */
  def extendedNdt5Uploads(raw: DataFrame, tcpinfo: DataFrame): DataFrame = {
    val ul = raw.filter(col("raw.C2S").isNotNull && // (:19-21)
      col("raw.C2S.UUID").isNotNull &&
      !col("raw.C2S.UUID").isin("", "ERROR_DISCOVERING_UUID"))
    val tcp = tcpinfo.select(col("date"), col("id"),
      col("parser").as("TCPparser"), col("FinalSnapshot"))
    val joined = ul.join(tcp, Seq("date", "id"), "left")
    val fin = col("FinalSnapshot")
    val tcpi = fin.getField("TCPInfo")
    val durationMs = // (:16)
      (unix_millis(col("raw.C2S.EndTime").cast("timestamp")) -
        unix_millis(col("raw.C2S.StartTime").cast("timestamp"))) * 1.0
    val recv = tcpi.getField("BytesReceived")
    joined.select(col("id"), col("date"),
      uploadSummary(
        col("raw.C2S.UUID"), col("raw.C2S.StartTime"),
        SafeOps.safeDivide(recv * 8.0, durationMs * 1000.0),
        tcpi.getField("MinRTT").cast("double") / 1000.0).as("a"),
      struct(
        lit("extended_ndt5_uploads").as("View"),
        concat(lit("ndt5-"), // (:39-44)
          when(col("raw.C2S.ClientIP").contains(":"), lit("IPv6-"))
            .otherwise(lit("IPv4-")),
          col("raw.Control.Protocol"),
          when(col("raw.Control.Protocol") === "plain",
            concat(lit("-"), col("raw.Control.MessageProtocol")))
            .otherwise(lit(""))).as("Protocol"),
        col("raw.Control.ClientMetadata").as("ClientMetadata"),
        col("raw.Control.ServerMetadata").as("ServerMetadata"),
        array(col("parser"), col("TCPparser")).as("Tables")) // (:95)
        .as("metadata"),
      uploadFilter(
        isComplete = fin.isNotNull, // (:36)
        isProduction =
          isProductionArchiveUpload(col("parser.ArchiveURL")),
        isError = (col("raw.C2S.Error").isNotNull &&
          col("raw.C2S.Error") =!= ""), // (:15)
        isOam = isOamClient(col("raw.C2S.ClientIP")),
        // the reference checks the SERVER address here (:57-63)
        isRfc1918 = isRfc1918Client(col("raw.C2S.ServerIP")),
        isPlatformAnomaly = lit(false),
        recvBytes = recv, durationMs = durationMs).as("filter"),
      uploadClient(col("raw.C2S.ClientIP"), col("raw.C2S.ClientPort"),
        col("client.Geo"), col("client.Network")).as("client"),
      uploadServer(col("raw.C2S.ServerIP"), col("raw.C2S.ServerPort"),
        col("server.Site"), col("server.Machine"), col("server.Geo"),
        col("server.Network")).as("server"))
  }

  /** web100-era upload intermediate view (extended_web100_uploads.sql):
    * data_direction = 0 (:16), the 7-entry modernized ClientMetadata
    * (:50-58), throughput over the SYN-to-snap connection duration
    * (:103), anomaly screen on the impossible-byte-count rule (:38-40),
    * the era-specific short OAM list on connection_spec.remote_ip, and
    * Site/Machine regex-extracted from the server hostname (:163-164).
    *
    * Input contract: the downloads web100 shape plus
    * raw.connection.{client_kernel_version, client_os, client_version,
    * server_kernel_version} and raw.web100.connection_spec.{remote_ip,
    * remote_port, local_ip, local_port}.
    */
  def extendedWeb100Uploads(raw: DataFrame): DataFrame = {
    val conn = col("raw.connection")
    val snap = col("raw.web100.snap")
    val spec = col("raw.web100.connection_spec")
    val ul = raw.filter(conn.getField("data_direction") === 0) // (:16)
    // SYN to final snap, ms — includes setup (:43)
    val connDurMs = snap.getField("Duration") * 0.001
    val recv = snap.getField("HCThruOctetsReceived")
    val isComplete = snap.getField("Duration").isNotNull && // (:24-31)
      snap.getField("State").isNotNull &&
      conn.getField("server_ip").isNotNull &&
      conn.getField("client_ip").isNotNull &&
      snap.getField("SndLimTimeRwin").isNotNull &&
      snap.getField("SndLimTimeCwnd").isNotNull &&
      snap.getField("SndLimTimeSnd").isNotNull
    def metaPair(name: String, value: Column) =
      struct(lit(name).as("Name"), value.as("Value"))
    ul.select(col("id"), col("date"),
      uploadSummary(
        col("id"), // web100 predates UUIDs; id stands in
        conn.getField("start_time"),
        SafeOps.safeDivide(recv * 0.008, connDurMs), // (:103)
        snap.getField("MinRTT") * 1.0).as("a"),
      struct(
        lit("extended_web100_uploads").as("View"),
        concat(lit("Web100"), // (:64-70)
          when(conn.getField("client_ip").contains(":"), lit("-IPv6"))
            .otherwise(lit("-IPv4")),
          when(conn.getField("websockets"),
            when(conn.getField("tls"), lit("-WSS")).otherwise(lit("-WS")))
            .otherwise(
              when(conn.getField("tls"), lit("-SSL"))
                .otherwise(lit("-PLAIN")))).as("Protocol"),
        array( // the 7-entry modernized list (:50-58)
          metaPair("client_application",
            conn.getField("client_application")),
          metaPair("client_browser", conn.getField("client_browser")),
          metaPair("client_hostname", conn.getField("client_hostname")),
          metaPair("client_ip", conn.getField("client_ip")),
          metaPair("client_kernel_version",
            conn.getField("client_kernel_version")),
          metaPair("client_os", conn.getField("client_os")),
          metaPair("client_version", conn.getField("client_version")))
          .as("ClientMetadata"),
        array( // (:59-62)
          metaPair("server_hostname", conn.getField("server_hostname")),
          metaPair("server_ip", conn.getField("server_ip")),
          metaPair("server_kernel_version",
            conn.getField("server_kernel_version")))
          .as("ServerMetadata"),
        array(col("parser")).as("Tables")).as("metadata"),
      uploadFilter(
        isComplete = isComplete,
        isProduction =
          isProductionArchiveUpload(col("parser.ArchiveURL")),
        isError = lit(false), // (:33)
        isOam = spec.getField("remote_ip").isin(Web100OamIps: _*),
        isRfc1918 =
          isRfc1918Client(spec.getField("remote_ip")), // (:79-85)
        // ~10 Gb/s for 24 h — clearly bogus (:38-40)
        isPlatformAnomaly = recv > 1e14,
        recvBytes = recv, durationMs = connDurMs).as("filter"),
      uploadClient(spec.getField("remote_ip"),
        spec.getField("remote_port"), col("client.Geo"),
        col("client.Network")).as("client"),
      uploadServer(spec.getField("local_ip"),
        spec.getField("local_port"),
        regexp_extract(conn.getField("server_hostname"),
          "mlab[1-4].([a-z][a-z][a-z][0-9][0-9t])", 1).as("Site"),
        regexp_extract(conn.getField("server_hostname"),
          "(mlab[1-4])", 1).as("Machine"),
        col("server.Geo"), col("server.Network")).as("server"))
  }

  /** Upload IsValidBest (unified_uploads.sql:47-58) — the downloads
    * expression WITHOUT the early-exit rescue of IsShort (early exit is
    * not supported for upload tests).
    */
  def isValidBestUpload: Column =
    col("filter.IsComplete") && col("filter.IsProduction") &&
      !col("filter.IsError") && !col("filter.IsOAM") &&
      !col("filter.IsPlatformAnomaly") && !col("filter.IsSmall") &&
      !col("filter.IsShort") && !col("filter.IsLong") &&
      !col("filter._IsRFC1918")

  /** Upload IsValid2021 (unified_uploads.sql:60-71) — textually the same
    * predicate list as [[isValidBestUpload]] in the reference; both
    * columns are exposed because the published schema carries both.
    */
  def isValid2021Upload: Column = isValidBestUpload

  /** Unified uploads (unified_uploads.sql:42-90): positional UNION ALL
    * of the era branches, the two IsValid* vintages, validity filter,
    * `* EXCEPT (filter)`. Same metadata-only-union / per-branch
    * partition-pruning properties as [[unifiedDownloads]].
    */
  def unifiedUploads(branches: Seq[DataFrame],
      applyFilter: Boolean = true): DataFrame = {
    require(branches.nonEmpty, "unifiedUploads: no branches")
    val unioned = branches.reduce(_ unionAll _)
      .withColumn("IsValidBest", isValidBestUpload)
      .withColumn("IsValid2021", isValid2021Upload)
    val kept =
      if (applyFilter) unioned.filter(col("IsValidBest")) else unioned
    kept.drop("filter") // SELECT * EXCEPT (filter)  (:88)
  }

  /** The 2021-09-22 dated pin (unified_uploads_20210922x.sql): the
    * pre-vintage-columns output shape — era branches unioned WITHOUT
    * the IsValidBest/IsValid2021 columns, validity applied from the
    * filter flags, `* EXCEPT (filter)`. (The reference's 2021-era
    * intermediates carried IsValidBest inside `filter`; ours derive it
    * from the same flags at union time — identical rows, pinned output
    * schema.) The downloads twin (unified_downloads_20210922x.sql) is
    * the same projection over the downloads branches with
    * [[isValidBest]].
    */
  def unifiedUploads20210922x(branches: Seq[DataFrame]): DataFrame = {
    require(branches.nonEmpty, "unifiedUploads20210922x: no branches")
    branches.reduce(_ unionAll _)
      .filter(isValidBestUpload)
      .drop("filter")
  }

  /** GraftFunctions registration is needed for the IsOAM predicate. */
  def prepare(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.functions.GraftFunctions.registerAll(spark)
}
