package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.views.UnifiedViews

/** Composite view-chain queries — multi-operator chains mirroring the
  * reference's two most intricate views (SURVEY.md §3.2, §7.1 step 6).
  */
object Composite {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[GraftQuery] = Seq(

    // The wehe/scamper hop-annotation chain
    // (views/wehe/scamper1_hopannotation2.sql:26-52): CROSS JOIN UNNEST
    // the per-row hop array (J4), LEFT JOIN each hop to the annotation
    // table (J7, broadcastable side), ARRAY_AGG the annotated hops back
    // in order (A4), then rebuild the nested struct with
    // * REPLACE/EXCEPT surgery (P3). Here: an order's lineitems are the
    // "hops", part is the annotation table.
    GraftQuery(
      "q28_hop_annotation_chain",
      "Composite: build nested rows, explode the array, per-element left " +
        "join to a broadcast annotation dim, re-collect in order, nested " +
        "struct REPLACE, flatten (J4+J7+A4+P3).",
      (s, d) => {
        // 1. nested input rows: one row per order with an ordered hop array
        val nested = t(s, d, "lineitem")
          .groupBy("l_orderkey")
          .agg(sort_array(collect_list(struct(
            col("l_linenumber").as("hop_no"),
            col("l_partkey").as("partkey"),
            col("l_quantity").as("qty")))).as("nodes"))
          .select(col("l_orderkey"),
            struct(lit("v1").as("Version"), col("nodes")).as("raw"))
        // 2. explode hops (CROSS JOIN UNNEST). Shuffle hygiene: drop the
        // hop array from `raw` BEFORE the explode→agg round trip — the
        // re-collect below rebuilds it, so carrying `raw.nodes` through
        // the second shuffle would double-ship every hop payload (at
        // 100 TB that's the difference between shuffling metadata and
        // shuffling the dataset twice).
        val hops = nested.select(col("l_orderkey"),
          col("raw").dropFields("nodes").as("raw"),
          explode(col("raw.nodes")).as("hop"))
        // 3. per-hop annotation join (annotation side broadcast)
        val ann = hops.join(
          broadcast(t(s, d, "part").select(
            col("p_partkey"), col("p_brand"))),
          col("hop.partkey") === col("p_partkey"), "left")
        // 4. re-collect annotated hops in hop order; sum qty here with the
        // native SUM partial-aggregate rather than a per-array HOF later
        val rebuilt = ann
          .groupBy("l_orderkey")
          .agg(first(col("raw")).as("raw"),
            // struct field order IS the sort key: hop_no with partkey/qty
            // tie-breaks (hop_no alone is not unique within an order)
            sort_array(collect_list(struct(
              col("hop.hop_no").as("hop_no"),
              col("hop.partkey").as("partkey"),
              col("hop.qty").as("qty"),
              col("p_brand").as("brand")))).as("ann_nodes"),
            sum(col("hop.qty")).as("qty_sum"))
          // 5. * REPLACE: graft the annotated array onto the carried struct
          .withColumn("raw", col("raw").withField("exp_nodes", col("ann_nodes")))
        // 6. flatten deterministically for the oracle. No interpreted HOFs:
        // `arr.field` extraction and array_join are codegen'd, unlike
        // transform()/aggregate() which are CodegenFallback in Spark 4.
        rebuilt.select(
          col("l_orderkey"),
          size(col("raw.exp_nodes")).cast("long").as("n_hops"),
          array_join(col("raw.exp_nodes.brand"), ",").as("brands"),
          (floor(col("qty_sum") * 10000.0 + 0.5) / 10000.0).as("qty_total"))
          .orderBy("l_orderkey")
      },
      Some("""SELECT l_orderkey, count(*) AS n_hops,
             |  string_agg(p_brand, ','
             |    ORDER BY l_linenumber, l_partkey, l_quantity) AS brands,
             |  (floor((sum(l_quantity)) * 10000.0 + 0.5) / 10000.0) AS qty_total
             |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
             |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)),

    // The website decile-dedup rollup
    // (views/website/entry07_platform_decile_downloads_dedup_daily_after
    // .sql:40-94): best-test-per-client-per-day via ROW_NUMBER (W1), then
    // grouped deciles over the deduped set (A5), exploded WITH OFFSET.
    GraftQuery(
      "q29_dedup_decile_rollup",
      "Composite: window dedup (top-1 per user per day) feeding grouped " +
        "exact deciles, exploded with position (W1→A5→posexplode).",
      (s, d) => {
        val best = t(s, d, "events")
          .withColumn("day", to_date(col("ts")))
          .withColumn("rn", row_number().over(
            Window.partitionBy("user_id", "day")
              .orderBy(col("value").desc, col("event_id").asc)))
          .filter(col("rn") === 1)
        best.groupBy("event_type")
          .agg(expr("percentile(value, array(0.0,0.1,0.2,0.3,0.4,0.5," +
            "0.6,0.7,0.8,0.9,1.0))").as("qs"))
          .select(col("event_type"),
            posexplode(col("qs")).as(Seq("idx", "qv")))
          .select(col("event_type"), col("idx"), (floor((col("qv")) * 10000.0 + 0.5) / 10000.0).as("qv"))
          .orderBy("event_type", "idx")
      },
      Some("""WITH best AS (
             |  SELECT * FROM (
             |    SELECT event_type, value, row_number() OVER (
             |      PARTITION BY user_id, CAST(ts AS DATE)
             |      ORDER BY value DESC, event_id) AS rn
             |    FROM events) WHERE rn = 1),
             |g AS (
             |  SELECT event_type, quantile_cont(value,
             |    [0.0,0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9,1.0]) AS qs
             |  FROM best GROUP BY event_type)
             |SELECT event_type, CAST(r.range AS INT) AS idx,
             |  (floor((qs[CAST(r.range AS INT) + 1]) * 10000.0 + 0.5) / 10000.0) AS qv
             |FROM g, range(11) r ORDER BY event_type, idx""".stripMargin)),

    // The full raw → extended → unified chain (SURVEY §3.2, the flagship
    // read path) over driver data: events are reshaped into ndt7-form
    // nested rows (per-user ServerMeasurements arrays with TCPInfo
    // counters), then run through the real UnifiedViews transforms —
    // array-last final snapshot, throughput/RTT summary struct, validity
    // flags (production regex, RFC1918 OAM, size/duration window),
    // IsValidBest, * EXCEPT (filter). The oracle replicates the chain's
    // arithmetic closed-form.
    GraftQuery(
      "q42_unified_chain",
      "End-to-end unified-downloads chain: nested ndt7-shape build → " +
        "extendedDownloads → unifiedDownloads (S1+P3+P4+P8+P10+A4+U1 in " +
        "one plan).",
      (s, d) => {
        UnifiedViews.prepare(s)
        val ev = t(s, d, "events")
        val perUser = ev.groupBy("user_id").agg(
          sort_array(collect_list(struct(
            col("ts"), col("event_id"), col("value")))).as("evs"),
          min("ts").as("t0"))
        val raw = perUser.select(
          concat(lit("uuid-"), col("user_id").cast("string")).as("id"),
          to_date(col("t0")).as("date"),
          struct(lit("v1").as("Version"), col("t0").as("Time"),
            when(pmod(col("user_id"), lit(10)) =!= 0,
              lit("gs://archive/mlab2-abc01-x.tgz"))
              .otherwise(lit("gs://archive/other.tgz")).as("ArchiveURL"),
            lit("f.tgz").as("Filename")).as("parser"),
          struct(lit("1.2.3.4").as("IP"), lit(443L).as("Port")).as("server"),
          struct(
            when(pmod(col("user_id"), lit(7)) === 0, lit("10.0.0.1"))
              .otherwise(lit("203.0.113.5")).as("IP"),
            lit(5201L).as("Port")).as("client"),
          struct(struct(
            concat(lit("uuid-"), col("user_id").cast("string")).as("UUID"),
            col("t0").as("StartTime"),
            lit("bbr").as("CongestionControl"),
            transform(col("evs"), (e, i) => struct(
              ((i + 1).cast("long") * 500000L).as("ElapsedTime"),
              struct(
                ((i + 1).cast("long") * 50000L +
                  floor(e.getField("value") * 100).cast("long"))
                  .as("BytesAcked"),
                (pmod(col("user_id"), lit(50)) * 1000L + 1000L).as("MinRTT"),
                lit(0L).as("BytesRetrans"),
                ((i + 1).cast("long") * 50000L +
                  floor(e.getField("value") * 100).cast("long") + 1000L)
                  .as("BytesSent")).as("TCPInfo")))
              .as("ServerMeasurements")).as("Download")).as("raw"))
        val unified = UnifiedViews.unifiedDownloads(
          Seq(UnifiedViews.extendedDownloads(raw)))
        unified.select(col("id"), col("date"),
          (floor((col("a.MeanThroughputMbps")) * 10000.0 + 0.5) / 10000.0).as("mbps"),
          (floor((col("a.MinRTT")) * 10000.0 + 0.5) / 10000.0).as("min_rtt"),
          col("a.LossRate").as("loss_rate"))
          .orderBy("id")
      },
      Some("""WITH per_user AS (
             |  SELECT user_id, count(*) AS n, min(ts) AS t0
             |  FROM events GROUP BY user_id),
             |last_ev AS (
             |  SELECT user_id, value AS vlast FROM (
             |    SELECT user_id, value, row_number() OVER (
             |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
             |    FROM events) WHERE rn = 1),
             |m AS (
             |  SELECT p.user_id, n, t0,
             |    CAST(floor(vlast * 100) AS BIGINT) AS vh
             |  FROM per_user p JOIN last_ev l ON p.user_id = l.user_id)
             |SELECT 'uuid-' || CAST(user_id AS VARCHAR) AS id,
             |  CAST(t0 AS DATE) AS date,
             |  (floor(((n * 50000 + vh) * 8 / (n * 500000.0)) * 10000.0 + 0.5) / 10000.0) AS mbps,
             |  (floor(((user_id % 50 * 1000 + 1000) / 1000.0) * 10000.0 + 0.5) / 10000.0) AS min_rtt,
             |  CAST(0.0 AS DOUBLE) AS loss_rate
             |FROM m
             |WHERE n >= 18 AND n <= 120
             |  AND user_id % 10 != 0 AND user_id % 7 != 0
             |ORDER BY id""".stripMargin)),

    // Structured Streaming's unified API: the same transform object
    // (graft.streaming.Ingest.windowedCounts) runs on batch DataFrames —
    // here oracle-checked in batch mode; InfraSpec runs it as a real
    // stream with watermark + AvailableNow trigger (SURVEY §2.9).
    GraftQuery(
      "q44_windowed_counts",
      "Tumbling 1-hour window counts per key via the streaming module's " +
        "transform, executed batch-mode (unified batch/stream API).",
      (s, d) => graft.streaming.Ingest.windowedCounts(
        t(s, d, "events"), "ts", "event_type")
        .select(col("window_start").cast("timestamp_ntz").as("window_start"),
          col("event_type"), col("cnt"),
          (floor(col("total_value") * 10000.0 + 0.5) / 10000.0)
            .as("total_value"))
        .orderBy("window_start", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
             |  count(*) AS cnt,
             |  floor(sum(value) * 10000.0 + 0.5) / 10000.0 AS total_value
             |FROM events GROUP BY 1, 2
             |ORDER BY window_start, event_type""".stripMargin)),

    // Custom stateful sessionization via flatMapGroupsWithState
    // (graft.streaming.Sessionize): typed per-user session state, batch
    // path here oracle-checked against the SQL gaps-and-islands
    // formulation — two execution models, identical sessions.
    GraftQuery(
      "q45_sessionize",
      "Session windows (30-min inactivity gap) via typed " +
        "flatMapGroupsWithState; oracle uses lag()+running-sum islands.",
      (s, d) => graft.streaming.Sessionize.sessionsDf(
        t(s, d, "events"), gapMinutes = 30)
        .select(col("user_id"),
          col("session_start").cast("timestamp_ntz").as("session_start"),
          col("session_end").cast("timestamp_ntz").as("session_end"),
          col("n_events"),
          (floor(col("total_value") * 10000.0 + 0.5) / 10000.0)
            .as("total_value"))
        .orderBy("user_id", "session_start"),
      Some("""WITH flagged AS (
             |  SELECT user_id, event_id, ts, value,
             |    CASE WHEN lag(ts) OVER w IS NULL OR
             |      ts - lag(ts) OVER w > INTERVAL 30 MINUTE
             |      THEN 1 ELSE 0 END AS new_sess
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT *, sum(new_sess) OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM flagged)
             |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
             |  CAST(count(*) AS INT) AS n_events,
             |  floor(sum(value) * 10000.0 + 0.5) / 10000.0 AS total_value
             |FROM sess GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin))
  )
}
