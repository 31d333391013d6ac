package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Core relational operator surface (SURVEY.md §2.1–§2.7).
  *
  * Each query re-expresses one operator family the reference's views use
  * (citations inline), over the driver's TPC-H-ish tables. The Spark side is
  * declarative DataFrame code — Catalyst owns pushdown, pruning, join
  * strategy; `broadcast()` hints mark the small dimension sides the way the
  * reference relies on BigQuery to treat annotation tables
  * (views/autoload_v2_ndt/ndt7_joined.template.sql:49-51).
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[GraftQuery] = Seq(

    // S1 pass-through scan (views/ndt_raw/ndt7.sql:3 and ~50 more)
    GraftQuery(
      "q01_scan_region",
      "Pass-through table scan with projection + final ORDER BY (S1, O1).",
      (s, d) => t(s, d, "region")
        .select(col("r_regionkey"), col("r_name"))
        .orderBy("r_regionkey"),
      Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")),

    // P1/P7/P9 projection + NULL/membership/range predicates
    // (views/ndt_intermediate/extended_ndt7_downloads.sql:24-27,44)
    GraftQuery(
      "q02_filter_project",
      "Predicate stack: BETWEEN on timestamp, IN list, numeric range; " +
        "projection with computed column (P1, P7, P9).",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"),
          lit("1997-12-31 23:59:59").cast("timestamp")) &&
          col("l_returnflag").isin("A", "N") &&
          col("l_discount").between(0.02, 0.08))
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          (floor((col("l_extendedprice") * (lit(1) - col("l_discount"))) * 10000.0 + 0.5) / 10000.0)
            .as("net_price"))
        // l_linenumber is NOT unique within an order — total order needs
        // the value columns as tie-breaks (driver may hash rows in order)
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "net_price"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity,
             |  (floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) / 10000.0) AS net_price
             |FROM lineitem
             |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01'
             |    AND TIMESTAMP '1997-12-31 23:59:59'
             |  AND l_returnflag IN ('A','N')
             |  AND l_discount BETWEEN 0.02 AND 0.08
             |ORDER BY l_orderkey, l_linenumber, l_quantity, net_price"""
        .stripMargin)),

    // A1/A2 multi-key hash aggregate (TPC-H Q1 shape; reference analog:
    // website/entry07_*_after.sql:81-82 GROUP BY date, hostname)
    GraftQuery(
      "q03_agg_pricing_summary",
      "Multi-key GROUP BY with sum/avg/count, map-side partial agg (A1, A2).",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          (floor((sum("l_quantity")) * 10000.0 + 0.5) / 10000.0).as("sum_qty"),
          (floor((sum("l_extendedprice")) * 10000.0 + 0.5) / 10000.0).as("sum_base_price"),
          (floor((sum(col("l_extendedprice") * (lit(1) - col("l_discount")))) * 10000.0 + 0.5) / 10000.0)
            .as("sum_disc_price"),
          (floor((avg("l_quantity")) * 10000.0 + 0.5) / 10000.0).as("avg_qty"),
          (floor((avg("l_discount")) * 1000000.0 + 0.5) / 1000000.0).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  (floor((sum(l_quantity)) * 10000.0 + 0.5) / 10000.0) AS sum_qty,
             |  (floor((sum(l_extendedprice)) * 10000.0 + 0.5) / 10000.0) AS sum_base_price,
             |  (floor((sum(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5) / 10000.0) AS sum_disc_price,
             |  (floor((avg(l_quantity)) * 10000.0 + 0.5) / 10000.0) AS avg_qty,
             |  (floor((avg(l_discount)) * 1000000.0 + 0.5) / 1000000.0) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // J1 LEFT equi-join then aggregate
    // (extended_ndt5_downloads.sql:76-78 ndt5 ⟕ tcpinfo)
    GraftQuery(
      "q04_join_left_agg",
      "LEFT outer equi-join preserving unmatched left rows, then grouped " +
        "count/sum/count-distinct (J1).",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_mktsegment")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          countDistinct(col("c_custkey")).as("n_customers"),
          (floor((sum("o_totalprice")) * 10000.0 + 0.5) / 10000.0).as("total_price"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment,
             |  count(o_orderkey) AS n_orders,
             |  count(DISTINCT c_custkey) AS n_customers,
             |  (floor((sum(o_totalprice)) * 10000.0 + 0.5) / 10000.0) AS total_price
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // J3/J6 multi-key join with computed/cast keys
    // (wehe/clientXputs1.sql:7-12 joins on CAST(historyCount AS INT64))
    GraftQuery(
      "q05_join_computed_key",
      "Equi-join on a computed key incl. a cast (J3, J6). floor() on both " +
        "sides pins truncation semantics (DuckDB CAST rounds, Spark truncates).",
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "part"),
          col("l_partkey") === col("p_partkey") &&
            pmod(floor(col("l_quantity")).cast("long"), lit(10)) ===
            pmod(col("p_size").cast("long"), lit(10)))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("cnt"),
          (floor((sum("l_extendedprice")) * 10000.0 + 0.5) / 10000.0).as("sum_price"))
        .orderBy("p_brand"),
      Some("""SELECT p_brand, count(*) AS cnt,
             |  (floor((sum(l_extendedprice)) * 10000.0 + 0.5) / 10000.0) AS sum_price
             |FROM lineitem JOIN part
             |  ON l_partkey = p_partkey
             | AND CAST(floor(l_quantity) AS BIGINT) % 10 = CAST(p_size AS BIGINT) % 10
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // J2/J7 star join with broadcast small dimensions
    // (ndt7_joined.template.sql:49-51: fact ⟕ small annotation table)
    GraftQuery(
      "q06_join_dims_broadcast",
      "Fact-to-dimensions star join; dims broadcast so the 100 TB fact side " +
        "never shuffles (J2, J7 + SURVEY §4 join strategy).",
      (s, d) => t(s, d, "lineitem")
        .join(broadcast(t(s, d, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          (floor((sum(col("l_extendedprice") * (lit(1) - col("l_discount")))) * 10000.0 + 0.5) / 10000.0)
            .as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name,
             |  (floor((sum(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5) / 10000.0) AS revenue,
             |  count(*) AS cnt
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    // J8 equi-join + range (theta) residual
    // (msak/throughput1_downloads.sql:40-45: join then time-bound filter)
    GraftQuery(
      "q07_theta_join",
      "Mixed equi + range join condition: equi key carries the shuffle, the " +
        "inequality is a post-join residual (J8).",
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"), (floor((sum("l_quantity")) * 10000.0 + 0.5) / 10000.0).as("qty"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS cnt,
             |  (floor((sum(l_quantity)) * 10000.0 + 0.5) / 10000.0) AS qty
             |FROM lineitem JOIN orders
             |  ON l_orderkey = o_orderkey
             | AND l_shipdate >= o_orderdate
             | AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // W1 row_number dedup, keep best row per key
    // (website/entry07_*_after.sql:40-46 best-test-per-client)
    GraftQuery(
      "q08_window_dedup_top1",
      "ROW_NUMBER() OVER (PARTITION BY key ORDER BY metric DESC, id) = 1 — " +
        "the reference's dedup idiom (W1, O3). Tie-broken for determinism.",
      (s, d) => t(s, d, "events")
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id")
            .orderBy(col("value").desc, col("event_id").asc)))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id"),
      Some("""SELECT user_id, event_id, event_type, value FROM (
             |  SELECT *, row_number() OVER (
             |    PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
             |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // W2 partition-total normalization
    // (functions/ops.ndt7_download_pdf_autonode.sql:65)
    GraftQuery(
      "q09_window_share",
      "value / SUM(value) OVER (PARTITION BY group) — pdf normalization (W2).",
      (s, d) => t(s, d, "events")
        .select(col("event_id"), col("event_type"),
          (floor((col("value") /
            sum("value").over(Window.partitionBy("event_type"))) * 1000000.0 + 0.5) / 1000000.0)
            .as("share"))
        .orderBy("event_id"),
      Some("""SELECT event_id, event_type,
             |  (floor((value / sum(value) OVER (PARTITION BY event_type)) * 1000000.0 + 0.5) / 1000000.0) AS share
             |FROM events ORDER BY event_id""".stripMargin)),

    // W3 running sum with explicit ROWS frame (CDF)
    // (functions/ops.ndt7_download_pdf_autonode.sql:75)
    GraftQuery(
      "q10_window_running",
      "SUM OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING..CURRENT ROW) — the " +
        "reference's CDF running sum (W3).",
      (s, d) => t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          (floor((sum("value").over(
            Window.partitionBy("user_id")
              .orderBy(col("ts"), col("event_id"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))) * 10000.0 + 0.5) / 10000.0)
            .as("running_total"))
        .orderBy("user_id", "event_id"),
      Some("""SELECT user_id, event_id,
             |  (floor((sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 10000.0 + 0.5) / 10000.0)
             |    AS running_total
             |FROM events ORDER BY user_id, event_id""".stripMargin)),

    // U1 positional UNION ALL with first-branch naming
    // (views/ndt/unified_downloads.sql:86-98)
    GraftQuery(
      "q11_union_positional",
      "Positional UNION ALL of era branches; column names come from the " +
        "first branch (U1).",
      (s, d) => {
        val o = t(s, d, "orders")
        val open = o.filter(col("o_orderstatus") === "O")
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"),
            lit("open").as("src"))
        val closed = o.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_totalprice"), lit("closed"))
        open.unionAll(closed).orderBy("k", "src")
      },
      Some("""SELECT o_orderkey AS k, o_totalprice AS v, 'open' AS src
             |FROM orders WHERE o_orderstatus = 'O'
             |UNION ALL
             |SELECT o_orderkey, o_totalprice, 'closed'
             |FROM orders WHERE o_orderstatus = 'F'
             |ORDER BY k, src""".stripMargin)),

    // U2 UNION ALL BY NAME, schema-drift tolerant
    // (views/create_autojoin_dataset_views.sh:85)
    GraftQuery(
      "q12_union_by_name",
      "unionByName(allowMissingColumns=true): branches with different column " +
        "order and a column missing on one side → NULL-filled (U2).",
      (s, d) => {
        val b1 = t(s, d, "nation")
          .select(col("n_nationkey").cast("int").as("k"),
            col("n_name").as("name"))
        val b2 = t(s, d, "region")
          .select(col("r_name").as("name"),
            (col("r_regionkey") + 100).cast("int").as("k"),
            col("r_regionkey").cast("int").as("extra"))
        b1.unionByName(b2, allowMissingColumns = true).orderBy("k")
      },
      Some("""SELECT CAST(n_nationkey AS INT) AS k, n_name AS name FROM nation
             |UNION ALL BY NAME
             |SELECT r_name AS name, CAST(r_regionkey + 100 AS INT) AS k,
             |       CAST(r_regionkey AS INT) AS extra FROM region
             |ORDER BY k""".stripMargin)),

    // A5 exact grouped quantiles + UNNEST WITH OFFSET
    // (entry07_*_after.sql:75,86: APPROX_QUANTILES then deciles WITH OFFSET;
    //  exact percentile keeps the oracle deterministic — SURVEY §5.3)
    GraftQuery(
      "q13_deciles",
      "Grouped exact deciles (array) exploded with position — " +
        "posexplode = UNNEST WITH OFFSET (A5 + array ops). Scale " +
        "alternatives: Ops.decilesByRank (rank selection, no O(distinct) " +
        "buffer) and Ops.decilesApprox (sketch), spec-tested.",
      // cpuFloor: the exact-percentile partial aggregation builds
      // per-group value buffers over the whole scan — CPU-dense map
      // work that serializes on a single-split input (round-18 A/B:
      // 1.26-1.36x; no-op at cluster scale, see Parallel.cpuFloor)
      (s, d) => graft.plans.Parallel.cpuFloor(
          t(s, d, "lineitem"), "l_orderkey")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, array(0.0,0.1,0.2,0.3,0.4," +
          "0.5,0.6,0.7,0.8,0.9,1.0))").as("qs"))
        .select(col("l_returnflag"), posexplode(col("qs")).as(Seq("idx", "qv")))
        .select(col("l_returnflag"), col("idx"),
          (floor((col("qv")) * 10000.0 + 0.5) / 10000.0).as("qv"))
        .orderBy("l_returnflag", "idx"),
      Some("""WITH g AS (
             |  SELECT l_returnflag,
             |    quantile_cont(l_extendedprice,
             |      [0.0,0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9,1.0]) AS qs
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, CAST(r.range AS INT) AS idx,
             |  (floor((qs[CAST(r.range AS INT) + 1]) * 10000.0 + 0.5) / 10000.0) AS qv
             |FROM g, range(11) r ORDER BY l_returnflag, idx""".stripMargin)),

    // A6 geometric mean EXP(AVG(LN(x)))
    // (functions/ops.ndt7_geomean_autonode.sql:19-25)
    GraftQuery(
      "q14_geomean",
      "Geometric mean via EXP(AVG(LN(x))) exactly as the reference computes " +
        "it (A6).",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_extendedprice") > 0)
        .groupBy("l_linestatus")
        .agg((floor((exp(avg(log(col("l_extendedprice"))))) * 10000.0 + 0.5) / 10000.0).as("geomean"),
          count(lit(1)).as("cnt"))
        .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
             |  (floor((exp(avg(ln(l_extendedprice)))) * 10000.0 + 0.5) / 10000.0) AS geomean,
             |  count(*) AS cnt
             |FROM lineitem WHERE l_extendedprice > 0
             |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    // A7 HAVING post-aggregate filter (msak/throughput1_downloads.sql:10)
    GraftQuery(
      "q15_having",
      "GROUP BY + HAVING: post-aggregation filter (A7).",
      (s, d) => t(s, d, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt"),
          (floor((sum("o_totalprice")) * 10000.0 + 0.5) / 10000.0).as("total"))
        .where(col("cnt") >= 5)
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey, count(*) AS cnt,
             |  (floor((sum(o_totalprice)) * 10000.0 + 0.5) / 10000.0) AS total
             |FROM orders GROUP BY o_custkey HAVING count(*) >= 5
             |ORDER BY o_custkey""".stripMargin)),

    // A8 two-level re-aggregation
    // (msak/throughput1_downloads.sql:28-48 then 51-64)
    GraftQuery(
      "q16_reagg_two_level",
      "Per-entity aggregate re-aggregated at a coarser key — the msak " +
        "multi-stream pattern (A8).",
      (s, d) => {
        val perCust = t(s, d, "orders")
          .groupBy("o_custkey")
          .agg(sum("o_totalprice").as("cust_total"))
        perCust
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg((floor((avg("cust_total")) * 10000.0 + 0.5) / 10000.0).as("avg_cust_total"),
            count(lit(1)).as("n_cust"))
          .orderBy("c_mktsegment")
      },
      Some("""WITH per_cust AS (
             |  SELECT o_custkey, sum(o_totalprice) AS cust_total
             |  FROM orders GROUP BY o_custkey)
             |SELECT c_mktsegment,
             |  (floor((avg(cust_total)) * 10000.0 + 0.5) / 10000.0) AS avg_cust_total,
             |  count(*) AS n_cust
             |FROM per_cust JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // A9/P6 conditional expressions feeding aggregates
    // (ops.ndt7_download_pdf_autonode.sql:44,53; extended_ndt7_downloads.sql:44-48)
    GraftQuery(
      "q17_conditional_agg",
      "CASE WHEN as group key + IF-guarded aggregate inputs (A9, P6).",
      (s, d) => t(s, d, "lineitem")
        .withColumn("qband",
          when(col("l_quantity") < 10, "low")
            .when(col("l_quantity") < 25, "mid")
            .otherwise("high"))
        .groupBy("l_returnflag", "qband")
        .agg(
          sum(when(col("l_discount") > 0.05, 1).otherwise(0))
            .as("high_disc_cnt"),
          (floor((sum(when(col("l_linestatus") === "F",
            col("l_extendedprice")).otherwise(0.0))) * 10000.0 + 0.5) / 10000.0).as("f_price"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "qband"),
      Some("""SELECT l_returnflag,
             |  CASE WHEN l_quantity < 10 THEN 'low'
             |       WHEN l_quantity < 25 THEN 'mid' ELSE 'high' END AS qband,
             |  CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS high_disc_cnt,
             |  (floor((sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice
             |            ELSE 0 END)) * 10000.0 + 0.5) / 10000.0) AS f_price,
             |  count(*) AS cnt
             |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // A4 ARRAY_AGG with pinned order (wehe/scamper1_hopannotation2.sql:40-43;
    // sorted + joined to a scalar so the hash compare is engine-neutral)
    GraftQuery(
      "q18_collect_sorted",
      "collect_list sorted then joined to a string — deterministic " +
        "ARRAY_AGG (A4, SURVEY §5.3 nondeterminism rule).",
      (s, d) => t(s, d, "events")
        .groupBy("user_id")
        .agg(
          array_join(sort_array(collect_list(col("event_type"))), ",")
            .as("types"),
          count(lit(1)).as("n"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
             |  string_agg(event_type, ',' ORDER BY event_type) AS types,
             |  count(*) AS n
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // A3 ANY_VALUE over a functionally-determined group
    // (msak/throughput1_downloads.sql:34-35)
    GraftQuery(
      "q19_anyvalue",
      "ANY_VALUE where the group determines the value (deterministic) (A3).",
      (s, d) => t(s, d, "nation")
        .join(t(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_nationkey")
        .agg(any_value(col("r_name")).as("region_name"),
          count(lit(1)).as("cnt"))
        .orderBy("n_nationkey"),
      Some("""SELECT n_nationkey, any_value(r_name) AS region_name,
             |  count(*) AS cnt
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |GROUP BY n_nationkey ORDER BY n_nationkey""".stripMargin))
  )
}
