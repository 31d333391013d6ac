package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.{GraftFunctions, SafeOps}
import graft.ops.Ops

/** Scalar-function surface + table-function (TVF) queries
  * (SURVEY.md §2.8, §2.10, §2.2 P8/P10/P11, §2.1 S4).
  */
object Functions {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // Histogram parameters for the flagship pdf/cdf TVF query: the full
  // price range so every value lands in a bin (clamped at the top edge).
  private val PdfXmin = 1.0
  private val PdfXmax = 200000.0
  private val PdfStep = 0.1
  private val PdfNb = Ops.numLogBins(PdfXmin, PdfXmax, PdfStep)

  // Uploads-direction TVF window (q71): metric is a synthetic Mbps in
  // [~0.01, ~1.05], so the reference's 0.42-0.43 artifact band is
  // populated and mask=true visibly changes the histogram.
  private val UpXmin = 0.005
  private val UpXmax = 2.0
  private val UpStep = 0.1
  private val UpNb = Ops.numLogBins(UpXmin, UpXmax, UpStep)

  val all: Seq[GraftQuery] = Seq(

    // The flagship TVF: log-histogram pdf+cdf (reference
    // functions/ops.ndt7_download_pdf_autonode.sql — J5 rewritten O(n),
    // W2 pdf normalize, W3 cdf running sum; SURVEY §4 "histogram via
    // cross join" scale note).
    GraftQuery(
      "q20_ops_pdf_cdf",
      "Parameterized TVF: log-spaced histogram with pdf (partition-total " +
        "window) and cdf (running-sum window); cross-join form rewritten " +
        "to O(n) direct bin assignment (J5→, W2, W3, TVF).",
      (s, d) => Ops.logPdfCdf(t(s, d, "lineitem"), "l_extendedprice",
        "l_returnflag", PdfXmin, PdfXmax, PdfStep)
        .orderBy("l_returnflag", "bin"),
      Some(s"""WITH counts AS (
              |  SELECT l_returnflag,
              |    LEAST(CAST(floor((log10(l_extendedprice) - log10(${PdfXmin}))
              |      / ${PdfStep}) AS INT), ${PdfNb - 1}) AS bin,
              |    count(*) AS bin_cnt
              |  FROM lineitem
              |  WHERE l_extendedprice BETWEEN ${PdfXmin} AND ${PdfXmax}
              |  GROUP BY 1, 2),
              |frame AS (
              |  SELECT g.l_returnflag, CAST(r.range AS INT) AS bin
              |  FROM (SELECT DISTINCT l_returnflag FROM lineitem) g,
              |       range(${PdfNb}) r),
              |fullb AS (
              |  SELECT f.l_returnflag, f.bin,
              |    COALESCE(c.bin_cnt, 0) AS bin_cnt
              |  FROM frame f LEFT JOIN counts c
              |    ON c.l_returnflag = f.l_returnflag AND c.bin = f.bin),
              |pdf_t AS (
              |  SELECT l_returnflag, bin, bin_cnt,
              |    bin_cnt / (sum(bin_cnt) OVER (PARTITION BY l_returnflag))
              |      AS pdf_raw
              |  FROM fullb)
              |SELECT l_returnflag, bin, bin_cnt,
              |  (floor((power(10, log10(${PdfXmin}) + (bin + 1) * ${PdfStep})) * 1000000.0 + 0.5) / 1000000.0)
              |    AS xright,
              |  (floor((pdf_raw) * 1000000.0 + 0.5) / 1000000.0) AS pdf,
              |  (floor((sum(pdf_raw) OVER (PARTITION BY l_returnflag ORDER BY bin
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 1000000.0 + 0.5) / 1000000.0) AS cdf
              |FROM pdf_t ORDER BY l_returnflag, bin""".stripMargin)),

    // The uploads-direction TVF with the mask argument
    // (functions/ops.ndt7_upload_pdf_autonode.sql:8,29): mask=true drops
    // the 0.42-0.43 Mbps measurement-artifact band before binning, and
    // the histogram re-aggregates over the survivors.
    GraftQuery(
      "q71_ops_upload_pdf_masked",
      "Uploads pdf/cdf TVF, mask=true: the 0.42-0.43 Mbps artifact band " +
        "is excluded before binning; same O(n) bin assignment and window " +
        "pair as q20 (TVF mask arg).",
      (s, d) => Ops.logPdfCdfMasked(
        t(s, d, "lineitem")
          .withColumn("upload_mbps", col("l_extendedprice") / 100000.0),
        "upload_mbps", "l_returnflag", UpXmin, UpXmax, UpStep, mask = true)
        .orderBy("l_returnflag", "bin"),
      Some(s"""WITH src AS (
              |  SELECT l_returnflag, l_extendedprice / 100000.0 AS m
              |  FROM lineitem
              |  WHERE NOT (l_extendedprice / 100000.0 BETWEEN 0.42 AND 0.43)),
              |counts AS (
              |  SELECT l_returnflag,
              |    LEAST(CAST(floor((log10(m) - log10(${UpXmin}))
              |      / ${UpStep}) AS INT), ${UpNb - 1}) AS bin,
              |    count(*) AS bin_cnt
              |  FROM src
              |  WHERE m BETWEEN ${UpXmin} AND ${UpXmax}
              |  GROUP BY 1, 2),
              |frame AS (
              |  SELECT g.l_returnflag, CAST(r.range AS INT) AS bin
              |  FROM (SELECT DISTINCT l_returnflag FROM src) g,
              |       range(${UpNb}) r),
              |fullb AS (
              |  SELECT f.l_returnflag, f.bin,
              |    COALESCE(c.bin_cnt, 0) AS bin_cnt
              |  FROM frame f LEFT JOIN counts c
              |    ON c.l_returnflag = f.l_returnflag AND c.bin = f.bin),
              |pdf_t AS (
              |  SELECT l_returnflag, bin, bin_cnt,
              |    bin_cnt / (sum(bin_cnt) OVER (PARTITION BY l_returnflag))
              |      AS pdf_raw
              |  FROM fullb)
              |SELECT l_returnflag, bin, bin_cnt,
              |  (floor((power(10, log10(${UpXmin}) + (bin + 1) * ${UpStep})) * 1000000.0 + 0.5) / 1000000.0)
              |    AS xright,
              |  (floor((pdf_raw) * 1000000.0 + 0.5) / 1000000.0) AS pdf,
              |  (floor((sum(pdf_raw) OVER (PARTITION BY l_returnflag ORDER BY bin
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 1000000.0 + 0.5) / 1000000.0) AS cdf
              |FROM pdf_t ORDER BY l_returnflag, bin""".stripMargin)),

    // P8 regex predicates + extraction (REGEXP_CONTAINS 36×,
    // REGEXP_EXTRACT 20× in the reference, e.g.
    // extended_web100_downloads.sql:164-165)
    GraftQuery(
      "q21_regex",
      "rlike filter + regexp_extract projection (P8); patterns restricted " +
        "to the RE2∩Java-safe subset (SURVEY §7.4 risk 3).",
      (s, d) => t(s, d, "part")
        .filter(col("p_name").rlike("^(cold|large) "))
        .withColumn("material", regexp_extract(col("p_name"), " ([a-z]+)$", 1))
        .groupBy("p_type", "material")
        .agg(count(lit(1)).as("cnt"),
          (floor((avg("p_retailprice")) * 10000.0 + 0.5) / 10000.0).as("avg_price"))
        .orderBy("p_type", "material"),
      Some("""SELECT p_type, regexp_extract(p_name, ' ([a-z]+)$', 1) AS material,
             |  count(*) AS cnt, (floor((avg(p_retailprice)) * 10000.0 + 0.5) / 10000.0) AS avg_price
             |FROM part WHERE regexp_matches(p_name, '^(cold|large) ')
             |GROUP BY 1, 2 ORDER BY p_type, material""".stripMargin)),

    // SAFE_DIVIDE / SAFE_OFFSET / SAFE_ORDINAL null semantics
    // (transform/web100.sql:87; ndt7_joined.template.sql:8-16;
    // extended_ndt7_downloads.sql:16)
    GraftQuery(
      "q22_safe_ops",
      "SAFE_DIVIDE null-on-zero + SAFE_ORDINAL/SAFE_OFFSET null-out-of-" +
        "range + array-last idiom, via graft.functions.SafeOps.",
      (s, d) => {
        val parts = split(col("o_orderpriority"), "-")
        t(s, d, "orders")
          .select(
            col("o_orderkey"),
            SafeOps.safeOrdinal(parts, lit(2)).as("prio_word"),
            SafeOps.safeOffset(parts, lit(9)).as("missing"),
            SafeOps.arrayLast(parts).as("last_word"),
            (floor((SafeOps.safeDivide(
              col("o_totalprice"),
              when(col("o_orderstatus") === "P", 0.0).otherwise(2.0))) * 10000.0 + 0.5) / 10000.0)
              .as("half_price"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  str_split(o_orderpriority, '-')[2] AS prio_word,
             |  str_split(o_orderpriority, '-')[10] AS missing,
             |  str_split(o_orderpriority, '-')[len(str_split(o_orderpriority, '-'))]
             |    AS last_word,
             |  (floor((o_totalprice / nullif(CASE WHEN o_orderstatus = 'P'
             |    THEN 0.0 ELSE 2.0 END, 0)) * 10000.0 + 0.5) / 10000.0) AS half_price
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Date/time function family (TIMESTAMP_TRUNC, UNIX_MICROS,
    // TIMESTAMP_DIFF — hourly_downloads_after.sql:76,
    // msak/throughput1_downloads.sql:44,10)
    GraftQuery(
      "q23_time_ops",
      "date_trunc to hour, unix_micros, millisecond diff via integer " +
        "division (time family; integer div avoids FP drift).",
      (s, d) => t(s, d, "events")
        .select(
          col("event_id"),
          // timestamp_ntz: parquet gets isAdjustedToUTC=false/us — the
          // exact Arrow type DuckDB's date_trunc returns (tz-naive).
          date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"),
          unix_micros(col("ts")).as("micros"),
          expr("(unix_micros(ts) - unix_micros(date_trunc('hour', ts))) div 1000")
            .as("ms_into_hour"))
        .orderBy("event_id"),
      Some("""SELECT event_id, date_trunc('hour', ts) AS hour,
             |  epoch_us(ts) AS micros,
             |  (epoch_us(ts) - epoch_us(date_trunc('hour', ts))) // 1000
             |    AS ms_into_hour
             |FROM events ORDER BY event_id""".stripMargin)),

    // P10 NET.* RFC1918 predicate via native Catalyst expressions
    // (extended_ndt7_downloads.sql:61-67)
    GraftQuery(
      "q24_net_ip",
      "NET.SAFE_IP_FROM_STRING / IP_TRUNC composed into the RFC1918 " +
        "check as codegen'd Catalyst expressions (P10); NULL on " +
        "unparseable input, boundary cases 172.16/12 included.",
      (s, d) => {
        GraftFunctions.registerAll(s)
        val ip = when(pmod(col("user_id"), lit(4)) === 0,
            concat(lit("10."), pmod(col("user_id"), lit(200)).cast("string"),
              lit("."), pmod(col("event_id"), lit(250)).cast("string"),
              lit(".7")))
          .when(pmod(col("user_id"), lit(4)) === 1,
            concat(lit("172."),
              (lit(16) + pmod(col("user_id"), lit(20))).cast("string"),
              lit(".0.1")))
          .when(pmod(col("user_id"), lit(4)) === 2,
            concat(lit("192.168."),
              pmod(col("event_id"), lit(256)).cast("string"), lit(".9")))
          .otherwise(when(pmod(col("event_id"), lit(5)) === 0, lit("not-an-ip"))
            .otherwise(concat(lit("203.0."),
              pmod(col("event_id"), lit(113)).cast("string"), lit(".5"))))
        t(s, d, "events")
          .select(col("event_id"), ip.as("ip"))
          .withColumn("is_private", GraftFunctions.isPrivateIp(col("ip")))
          .orderBy("event_id")
      },
      Some("""WITH ips AS (
             |  SELECT event_id,
             |    CASE
             |      WHEN user_id % 4 = 0 THEN '10.' || CAST(user_id % 200 AS VARCHAR)
             |        || '.' || CAST(event_id % 250 AS VARCHAR) || '.7'
             |      WHEN user_id % 4 = 1 THEN '172.' || CAST(16 + user_id % 20 AS VARCHAR)
             |        || '.0.1'
             |      WHEN user_id % 4 = 2 THEN '192.168.' || CAST(event_id % 256 AS VARCHAR)
             |        || '.9'
             |      WHEN event_id % 5 = 0 THEN 'not-an-ip'
             |      ELSE '203.0.' || CAST(event_id % 113 AS VARCHAR) || '.5'
             |    END AS ip
             |  FROM events),
             |parts AS (
             |  SELECT event_id, ip,
             |    TRY_CAST(string_split(ip, '.')[1] AS INT) AS p1,
             |    TRY_CAST(string_split(ip, '.')[2] AS INT) AS p2,
             |    TRY_CAST(string_split(ip, '.')[3] AS INT) AS p3,
             |    TRY_CAST(string_split(ip, '.')[4] AS INT) AS p4,
             |    len(string_split(ip, '.')) AS np
             |  FROM ips)
             |SELECT event_id, ip,
             |  CASE WHEN np != 4 OR p1 IS NULL OR p2 IS NULL OR p3 IS NULL
             |       OR p4 IS NULL OR p1 > 255 OR p2 > 255 OR p3 > 255 OR p4 > 255
             |    THEN NULL
             |    ELSE (p1 = 10 OR (p1 = 172 AND p2 BETWEEN 16 AND 31)
             |          OR (p1 = 192 AND p2 = 168)) END AS is_private
             |FROM parts ORDER BY event_id""".stripMargin)),

    // P3/P4/P5 struct construction + withField/dropFields surgery
    // (wehe/scamper1_hopannotation2.sql:46-52 * REPLACE nested rebuild;
    // extended_ndt7_downloads.sql:86-175 struct shaping)
    GraftQuery(
      "q25_struct_ops",
      "STRUCT build, withField add, dropFields remove (BigQuery " +
        "* REPLACE / * EXCEPT nested surgery), flattened for the oracle " +
        "(P3, P4, P5).",
      (s, d) => t(s, d, "orders")
        // P5: whole-row-as-struct (the reference's `PreComputeNDT7 AS
        // _internal202402` idiom, extended_ndt7_downloads.sql:177)
        .withColumn("_internal", struct(col("*")))
        .withColumn("a", struct(
          col("_internal.o_orderkey").as("id"),
          col("_internal.o_totalprice").as("total"),
          col("o_orderpriority").as("prio")))
        .withColumn("a", col("a")
          .withField("total_r", (floor((col("a.total")) + 0.5)))
          .dropFields("total"))
        .select(col("a.id").as("id"), col("a.prio").as("prio"),
          col("a.total_r").as("total_r"))
        .orderBy("id"),
      Some("""SELECT o_orderkey AS id, o_orderpriority AS prio,
             |  CAST(floor((o_totalprice) + 0.5) AS BIGINT) AS total_r
             |FROM orders ORDER BY id""".stripMargin)),

    // S4 wildcard-family scan (views/statistics/v0_cities.sql:1)
    GraftQuery(
      "q26_wildcard_glob",
      "Path-glob scan unioning every suffix-matched file (S4).",
      (s, d) => Tables.loadGlob(s, d, "par*.parquet")
        .groupBy("p_brand")
        .agg(count(lit(1)).as("cnt"),
          (floor((sum("p_retailprice")) * 10000.0 + 0.5) / 10000.0).as("total_price"))
        .orderBy("p_brand"),
      Some("""SELECT p_brand, count(*) AS cnt,
             |  (floor((sum(p_retailprice)) * 10000.0 + 0.5) / 10000.0) AS total_price
             |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // P11 correlated IN over an array → exists() higher-order function
    // (extended_ndt7_downloads.sql:40; SURVEY §4 "prefer exists() HOF,
    // no decorrelated join")
    GraftQuery(
      "q27_exists_hof",
      "IN (SELECT ... FROM UNNEST(arr)) compiled to exists(arr, pred) — " +
        "no join, no decorrelation (P11).",
      (s, d) => t(s, d, "documents")
        .withColumn("has_spark",
          exists(split(col("text"), " "), w => w === "spark"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("has_spark"), 1).otherwise(0)).as("n_spark"))
        .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN list_contains(string_split(text, ' '), 'spark')
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n_spark
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // Semi-structured extraction: schema-on-read over the JSON props
    // column via from_json with a DECLARED schema (typed, codegen'd,
    // null on malformed — the production path; get_json_object's
    // per-path string probing re-parses per call). Extracted values
    // flow straight into a relational rollup.
    GraftQuery(
      "qB0_json_props",
      "JSON schema-on-read: from_json('k BIGINT') over events.props, " +
        "rolled up per event_type (count, sum, mean of the extracted " +
        "field).",
      (s, d) => t(s, d, "events").select(
        col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum("k").as("sum_k"),
          (floor((avg("k")) * 10000.0 + 0.5) / 10000.0).as("avg_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
             |    AS BIGINT) AS sum_k,
             |  floor((avg(CAST(json_extract_string(props, '$.k')
             |    AS BIGINT))) * 10000.0 + 0.5) / 10000.0 AS avg_k
             |FROM events GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // Null-preserving explode: docs with no PII matches must SURVIVE
    // the unnest with a null match (an inner explode silently drops
    // them — the classic lost-rows bug in extraction pipelines). DuckDB
    // has no outer unnest; the oracle emulates it by padding empty
    // match lists with [NULL].
    GraftQuery(
      "qB4_explode_outer",
      "explode_outer over per-doc email matches: zero-match docs kept " +
        "with a null match, with per-doc match ordinals.",
      (s, d) => t(s, d, "documents").select(col("doc_id"),
        posexplode_outer(expr("regexp_extract_all(text, " +
          "'[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\\\.[a-zA-Z]+', 0)"))
          .as(Seq("match_idx", "email")))
        .select(col("doc_id"),
          coalesce(col("match_idx").cast("long"), lit(-1L))
            .as("match_idx"),
          col("email"))
        .orderBy("doc_id", "match_idx"),
      Some("""WITH m AS (
             |  SELECT doc_id, regexp_extract_all(text,
             |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]+')
             |    AS matches
             |  FROM documents),
             |p AS (
             |  SELECT doc_id,
             |    CASE WHEN len(matches) = 0
             |      THEN [CAST(NULL AS VARCHAR)] ELSE matches END AS ms
             |  FROM m),
             |u AS (
             |  SELECT doc_id, unnest(ms) AS email,
             |    CAST(generate_subscripts(ms, 1) - 1 AS BIGINT)
             |      AS match_idx
             |  FROM p)
             |SELECT doc_id,
             |  CASE WHEN email IS NULL THEN -1 ELSE match_idx END
             |    AS match_idx,
             |  email
             |FROM u ORDER BY doc_id, match_idx""".stripMargin))
  )
}
