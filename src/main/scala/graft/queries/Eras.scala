package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.views.UnifiedViews

/** The full multi-era unified read path (unified_downloads.sql:86-98): a
  * scan-only ndt7 branch ∪ a join-enriched ndt5 branch (separate tcpinfo
  * raw table LEFT JOINed in, extended_ndt5_downloads.sql:76-81) ∪ a
  * metadata-synthesizing web100 branch (literal Name/Value struct arrays,
  * extended_web100_downloads.sql:53-66) — three heterogeneous branch
  * provenances through one positional UNION ALL, with the consumer's date
  * window applied ONCE on the unified output and pushed by Catalyst into
  * every era's scan leg (the property that makes the union shape viable
  * at 100 TB: each branch prunes its own partitions).
  *
  * The raw inputs are synthesized per-row from `orders` (each era a
  * disjoint o_orderkey % 3 slice; the tcpinfo table a second scan of the
  * same slice), so the oracle is a closed form over the same table. The
  * branch `date` column carries the source partition column (a midnight
  * timestamp in this testdata) so the unified date predicate stays
  * pushable; the presentation cast to DATE happens in the final select,
  * after filtering — the same order a partitioned table gives for free.
  */
object Eras {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val k = col("o_orderkey")
  private val c = col("o_custkey")

  // Shared synthetic fields (identical closed forms in the oracle).
  private val acked: Column = floor(col("o_totalprice") * 100) % 100000L
  private val rtt: Column = c % 50L + 1L
  private val clientIp: Column = when(k % 7 === 0, lit("10.0.0.1"))
    .when(k % 17 === 0, lit("2001:db8::1"))
    .otherwise(lit("203.0.113.5"))
  private val archiveUrl: Column =
    when(k % 10 =!= 0, lit("gs://archive/mlab2-abc01-x.tgz"))
      .otherwise(lit("gs://archive/other.tgz"))
  private def parserCol(version: String, filename: String): Column =
    struct(lit(version).as("Version"), col("o_orderdate").as("Time"),
      archiveUrl.as("ArchiveURL"), lit(filename).as("Filename"))
  private val serverCol: Column =
    struct(lit("1.2.3.4").as("IP"), lit(443L).as("Port"))
  private val clientCol: Column =
    struct(clientIp.as("IP"), lit(5201L).as("Port"))
  private def idCol(era: String): Column =
    concat(lit(era + "-"), k.cast("string"))

  /** ndt7-era raw rows (o_orderkey ≡ 0 mod 3): nested ServerMeasurements
    * with the final snapshot carrying the real counters (incl. the
    * TotalRetrans/RTT pair feeding the obsolete IsValid2021 flags), and
    * an `early_exit` ClientMetadata entry on every 23rd test.
    */
  private def ndt7Raw(orders: DataFrame): DataFrame = {
    def m(elapsed: Column, retrans: Column) = struct(
      elapsed.as("ElapsedTime"),
      struct(acked.as("BytesAcked"), (rtt * 1000L).as("MinRTT"),
        retrans.as("BytesRetrans"), (acked + 1000L).as("BytesSent"),
        retrans.as("TotalRetrans"),
        when(k % 12 === 0, rtt * 5000L).otherwise(rtt * 1500L).as("RTT"))
        .as("TCPInfo"))
    def metaPair(name: Column, value: Column) =
      struct(name.as("Name"), value.as("Value"))
    orders.filter(k % 3 === 0).select(
      idCol("ndt7").as("id"), col("o_orderdate").as("date"),
      parserCol("v1", "f.tgz").as("parser"), serverCol.as("server"),
      clientCol.as("client"),
      struct(struct(
        idCol("ndt7").as("UUID"),
        col("o_orderdate").as("StartTime"),
        lit("bbr").as("CongestionControl"),
        when(k % 23 === 0, array(
          metaPair(lit("client_name"), col("o_orderpriority")),
          metaPair(lit("early_exit"), lit("1"))))
          .otherwise(array(
            metaPair(lit("client_name"), col("o_orderpriority"))))
          .as("ClientMetadata"),
        array(metaPair(lit("server_hostname"), lit("mlab2.example")))
          .as("ServerMetadata"),
        array(
          m(lit(500000L), lit(0L)), // mid-test snapshot, superseded
          m((k % 80 + 10L) * 1000000L, (k % 4) * 25L))
          .as("ServerMeasurements")).as("Download")).as("raw"))
  }

  /** ndt5-era raw rows (≡ 1 mod 3): S2C control record only — counters
    * come from [[ndt5TcpInfo]].
    */
  private def ndt5Raw(orders: DataFrame): DataFrame =
    orders.filter(k % 3 === 1).select(
      idCol("ndt5").as("id"), col("o_orderdate").as("date"),
      parserCol("v1", "f.tgz").as("parser"), serverCol.as("server"),
      clientCol.as("client"),
      struct(
        struct(
          when(k % 11 === 0, lit("")).otherwise(idCol("ndt5")).as("UUID"),
          col("o_orderdate").as("StartTime"),
          expr("timestampadd(SECOND, CAST(o_orderkey % 80 AS INT), " +
            "o_orderdate)").as("EndTime"),
          clientIp.as("ClientIP"),
          when(k % 13 === 0, lit("err")).otherwise(lit("")).as("Error"))
          .as("S2C"),
        struct(
          when(k % 2 === 0, lit("wss")).otherwise(lit("plain"))
            .as("Protocol"),
          lit("json").as("MessageProtocol"),
          array(
            struct(lit("client_name").as("Name"),
              col("o_orderpriority").as("Value")),
            struct(lit("client_os").as("Name"),
              col("o_orderstatus").as("Value"))).as("ClientMetadata"),
          array(struct(lit("server_hostname").as("Name"),
            lit("mlab2.example").as("Value"))).as("ServerMetadata"))
          .as("Control")).as("raw"))

  /** The separate tcpinfo raw table for the ndt5 era: ~1/5 of tests have
    * no row (k % 5 == 4), exercising the LEFT join's IsComplete=false
    * path. `dateWindow` mirrors the partition filter the reference
    * requires on every raw-table scan — a LEFT join's right side can't
    * receive the unified predicate from Catalyst (pushing into the
    * preserved side's complement isn't inferred), so the view supplies it.
    */
  private def ndt5TcpInfo(orders: DataFrame,
      dateWindow: Column): DataFrame =
    orders.filter(k % 3 === 1 && k % 5 =!= 4).filter(dateWindow)
      .select(
        idCol("ndt5").as("id"), col("o_orderdate").as("date"),
        parserCol("v2", "tcp.tgz").as("parser"),
        struct(lit("cubic").as("CongestionAlgorithm"),
          struct(acked.as("BytesAcked"), (acked + 1000L).as("BytesSent"),
            ((k % 2) * 50L).as("BytesRetrans"), (rtt * 1000L).as("MinRTT"),
            ((k % 2) * 5L).as("TotalRetrans"),
            when(k % 6 === 0, rtt * 4000L).otherwise(rtt * 1000L).as("RTT"))
            .as("TCPInfo")).as("FinalSnapshot"))

  /** web100-era raw rows (≡ 2 mod 3): flat connection/snap counters. */
  private def web100Raw(orders: DataFrame): DataFrame =
    orders.filter(k % 3 === 2).select(
      idCol("web100").as("id"), col("o_orderdate").as("date"),
      parserCol("v1", "f.tgz").as("parser"), serverCol.as("server"),
      clientCol.as("client"),
      struct(
        struct(
          when(k % 9 === 0, lit(0L)).otherwise(lit(1L))
            .as("data_direction"),
          col("o_orderpriority").as("client_application"),
          col("o_orderstatus").as("client_browser"),
          concat(lit("host-"), (k % 5).cast("string"))
            .as("client_hostname"),
          clientIp.as("client_ip"),
          lit("mlab2.example").as("server_hostname"),
          lit("1.2.3.4").as("server_ip"),
          (k % 2 === 0).as("websockets"),
          (c % 2 === 0).as("tls"),
          col("o_orderdate").as("start_time")).as("connection"),
        struct(struct(
          ((k % 40) * 1000000L + 500000L).as("Duration"),
          lit(1L).as("State"),
          ((k % 40) * 500000L).as("SndLimTimeRwin"),
          ((k % 40) * 400000L).as("SndLimTimeCwnd"),
          ((k % 40) * 100000L).as("SndLimTimeSnd"),
          acked.as("HCThruOctetsAcked"),
          rtt.as("MinRTT"),
          (c % 3).as("SegsRetrans"),
          ((k % 97) + 50L).as("SegsOut"),
          (c % 4).as("OctetsRetrans"),
          when(c % 5 === 0, rtt * 3 + 1200L).otherwise(rtt)
            .as("SmoothedRTT")).as("snap")).as("web100"))
        .as("raw"))

  private def round4(x: Column): Column =
    floor(x * 10000.0 + 0.5) / 10000.0

  /** One pair of window bounds, applied to whichever date column a leg
    * exposes — the unified `date` and the tcpinfo leg's `o_orderdate`
    * predicates are derived from the same constants so they can't drift
    * (a drifted tcpinfo window would silently join rows outside the
    * consumer window, and no row-count check would catch it).
    */
  private val (dateLo, dateHi) = ("1993-01-01", "1997-01-01")
  private def windowOn(c: Column): Column =
    c >= lit(dateLo).cast("timestamp") && c < lit(dateHi).cast("timestamp")

  /** The consumer's date window, on the unified `date` column. */
  private val dateWindow: Column = windowOn(col("date"))

  /** The three era branches in the reference union's per-branch column
    * list (unified_downloads.sql:86-91), consumed by q69.
    */
  private def unifiedBranches(s: SparkSession, d: String): Seq[DataFrame] = {
    UnifiedViews.prepare(s)
    val orders = t(s, d, "orders")
    Seq(
      UnifiedViews.extendedDownloads(ndt7Raw(orders)),
      UnifiedViews.extendedNdt5Downloads(ndt5Raw(orders),
        ndt5TcpInfo(orders, windowOn(col("o_orderdate")))),
      UnifiedViews.extendedWeb100Downloads(web100Raw(orders)))
      .map(_.select("id", "date", "a", "metadata", "client", "server",
        "filter"))
  }

  val all: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q69_three_era_unified",
      "Three-era unified chain: scan-only ndt7 ∪ join-enriched ndt5 " +
        "(separate tcpinfo raw table, LEFT USING(date,id)) ∪ " +
        "metadata-literal web100, one date window pushed into every leg " +
        "(U1+J1+P4+P6+S1; unified_downloads.sql:86-98).",
      (s, d) => {
        UnifiedViews.unifiedDownloads(unifiedBranches(s, d))
          .filter(dateWindow)
          .select(col("id"), to_date(col("date")).as("date"),
            col("metadata.View").as("view_name"),
            col("metadata.Protocol").as("protocol"),
            size(col("metadata.Tables")).cast("long").as("n_tables"),
            array_join(col("metadata.ClientMetadata.Value"), "|")
              .as("meta_vals"),
            col("a.CongestionControl").as("cc"),
            round4(col("a.MeanThroughputMbps")).as("mbps"),
            round4(col("a.MinRTT")).as("min_rtt"),
            round4(col("a.LossRate")).as("loss_rate"))
          .orderBy("id")
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey AS k, o_custkey AS c,
             |    CAST(o_orderdate AS DATE) AS d,
             |    o_orderpriority AS pri, o_orderstatus AS st,
             |    CAST(floor(o_totalprice * 100) AS BIGINT) % 100000 AS acked,
             |    o_custkey % 50 + 1 AS rtt
             |  FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1993-01-01'
             |    AND o_orderdate < TIMESTAMP '1997-01-01'
             |    AND o_orderkey % 10 != 0 AND o_orderkey % 7 != 0),
             |u AS (
             |  SELECT 'ndt7-' || CAST(k AS VARCHAR) AS id, d,
             |    'extended_ndt7_downloads' AS view_name,
             |    'ndt7' || CASE WHEN k % 17 = 0 THEN '-IPv6'
             |      ELSE '-IPv4' END || '-WSS' AS protocol,
             |    CAST(1 AS BIGINT) AS n_tables,
             |    CASE WHEN k % 23 = 0 THEN pri || '|1' ELSE pri END
             |      AS meta_vals,
             |    'bbr' AS cc,
             |    (acked * 8.0) / CAST((k % 80 + 10) * 1000000 AS DOUBLE)
             |      AS mbps,
             |    rtt * 1.0 AS min_rtt,
             |    CAST((k % 4) * 25 AS DOUBLE) / CAST(acked + 1000 AS DOUBLE)
             |      AS loss_rate
             |  FROM base
             |  WHERE k % 3 = 0 AND acked >= 8192 AND k % 80 <= 50
             |  UNION ALL
             |  SELECT 'ndt5-' || CAST(k AS VARCHAR), d,
             |    'extended_ndt5_downloads',
             |    'ndt5-' || CASE WHEN k % 17 = 0 THEN 'IPv6-'
             |      ELSE 'IPv4-' END ||
             |      CASE WHEN k % 2 = 0 THEN 'wss' ELSE 'plain-json' END,
             |    CAST(2 AS BIGINT),
             |    pri || '|' || st,
             |    'cubic',
             |    (acked * 8.0) / CAST((k % 80) * 1000 * 1000 AS DOUBLE),
             |    rtt * 1.0,
             |    CAST((k % 2) * 50 AS DOUBLE) / CAST(acked + 1000 AS DOUBLE)
             |  FROM base
             |  WHERE k % 3 = 1 AND k % 11 != 0 AND k % 13 != 0
             |    AND k % 5 != 4 AND acked >= 8192
             |    AND k % 80 BETWEEN 9 AND 60
             |  UNION ALL
             |  SELECT 'web100-' || CAST(k AS VARCHAR), d,
             |    'extended_web100_downloads',
             |    'Web100' || CASE WHEN k % 17 = 0 THEN '-IPv6'
             |      ELSE '-IPv4' END ||
             |      CASE WHEN k % 2 = 0 THEN
             |        CASE WHEN c % 2 = 0 THEN '-WSS' ELSE '-WS' END
             |      ELSE
             |        CASE WHEN c % 2 = 0 THEN '-SSL' ELSE '-PLAIN' END END,
             |    CAST(1 AS BIGINT),
             |    pri || '|' || st || '|host-' || CAST(k % 5 AS VARCHAR),
             |    'reno',
             |    (acked * 0.008) / (((k % 40) * 1000000) * 0.001),
             |    rtt * 1.0,
             |    CAST(c % 3 AS DOUBLE) / CAST((k % 97) + 50 AS DOUBLE)
             |  FROM base
             |  WHERE k % 3 = 2 AND k % 9 != 0 AND acked >= 8192
             |    AND k % 40 >= 9)
             |SELECT id, d AS date, view_name, protocol, n_tables, meta_vals,
             |  cc,
             |  floor(mbps * 10000.0 + 0.5) / 10000.0 AS mbps,
             |  floor(min_rtt * 10000.0 + 0.5) / 10000.0 AS min_rtt,
             |  floor(loss_rate * 10000.0 + 0.5) / 10000.0 AS loss_rate
             |FROM u ORDER BY id""".stripMargin))
  )
}
