package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Widened operator surface beyond the reference's minimum.
  *
  * SURVEY.md §2 notes several families the reference never uses but that
  * "Catalyst has built-in if we later widen the surface" (§2.3 semi/anti,
  * §2.4 DISTINCT aggregates / GROUPING SETS / CUBE / ROLLUP, §2.5 lead/lag/
  * ntile + RANGE frames, §2.6 LIMIT/top-k, §2.7 INTERSECT/EXCEPT). A user
  * switching from the reference gets them here as first-class, oracle-checked
  * operators, plus the as-of join (graft.operators.AsOfJoin) — the temporal
  * enrichment primitive neither the reference nor stock Spark ships.
  *
  * Scale notes are inline per query; the common rules: aggregates are
  * partial-aggregated map-side, top-k is TakeOrderedAndProject (never a
  * global sort), and the as-of join is one shuffle with no row explosion.
  */
object Extended {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[GraftQuery] = Seq(

    // LEFT SEMI — "does a match exist" without duplicating or widening
    // rows (the decorrelated EXISTS). At scale: shuffle on the key, but
    // the build side stores keys only.
    GraftQuery(
      "q46_semi_join",
      "LEFT SEMI join: suppliers with at least one high-quantity " +
        "lineitem — EXISTS without row duplication.",
      (s, d) => t(s, d, "supplier")
        .join(t(s, d, "lineitem").filter(col("l_quantity") >= 45)
          .select(col("l_suppkey")),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
        .orderBy("s_suppkey"),
      Some("""SELECT s_suppkey, s_name, s_nationkey FROM supplier
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |  WHERE l_suppkey = s_suppkey AND l_quantity >= 45)
             |ORDER BY s_suppkey""".stripMargin)),

    // LEFT ANTI — NOT EXISTS as a join (null-safe, unlike NOT IN).
    GraftQuery(
      "q47_anti_join",
      "LEFT ANTI join: customers with no orders — NOT EXISTS as a " +
        "null-safe join.",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // ROLLUP: detail -> subtotal -> grand total in ONE aggregation pass
    // (Catalyst Expand + single shuffle, not three scans self-unioned).
    GraftQuery(
      "q48_rollup",
      "GROUP BY ROLLUP(flag, status) with grouping_id — hierarchy of " +
        "subtotals in one Expand+aggregate pass.",
      (s, d) => t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          grouping_id().cast("long").as("gid"),
          (floor((sum("l_quantity")) * 10000.0 + 0.5) / 10000.0).as("sum_qty"),
          count(lit(1)).as("cnt"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             |  (floor((sum(l_quantity)) * 10000.0 + 0.5) / 10000.0) AS sum_qty,
             |  count(*) AS cnt
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)),

    // CUBE: all 2^k grouping combinations, still one pass.
    GraftQuery(
      "q49_cube",
      "GROUP BY CUBE(flag, status): every grouping-set combination with " +
        "grouping_id disambiguation.",
      (s, d) => t(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
          grouping_id().cast("long").as("gid"),
          (floor((sum("l_extendedprice")) * 10000.0 + 0.5) / 10000.0).as("sum_price"),
          count(lit(1)).as("cnt"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             |  (floor((sum(l_extendedprice)) * 10000.0 + 0.5) / 10000.0) AS sum_price,
             |  count(*) AS cnt
             |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)),

    // lead/lag/ntile: the neighboring-row analytics the reference's window
    // surface lacks (SURVEY §2.5 "no lead/lag/ntile"). Values are copied,
    // not computed — bitwise-exact across engines, no rounding needed.
    GraftQuery(
      "q50_lead_lag_ntile",
      "lag/lead neighbor values + ntile(4) quartile per user timeline.",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        t(s, d, "events").select(
          col("event_id"), col("user_id"),
          lag("value", 1).over(w).as("prev_v"),
          lead("value", 1).over(w).as("next_v"),
          ntile(4).over(w).cast("long").as("quartile"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  lag(value, 1) OVER w AS prev_v,
             |  lead(value, 1) OVER w AS next_v,
             |  ntile(4) OVER w AS quartile
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY event_id""".stripMargin)),

    // RANGE frame: trailing 1-hour sum keyed by event time, not row
    // count. Integer microseconds + integer cents on both sides — a
    // RANGE-frame double sum would hit segment-tree-vs-streaming FP
    // association differences across engines.
    GraftQuery(
      "q51_range_frame",
      "RANGE BETWEEN 1h PRECEDING: trailing event-time window sum " +
        "(integer micros/cents for cross-engine determinism).",
      (s, d) => {
        val base = t(s, d, "events").select(
          col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"),
          floor(col("value") * 100).cast("long").as("cents"))
        val w = Window.partitionBy("user_id").orderBy(col("us"))
          .rangeBetween(-3600L * 1000000L, 0L)
        base.select(col("event_id"), col("user_id"), col("us"),
          sum("cents").over(w).as("cents_1h"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, epoch_us(ts) AS us,
             |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER (
             |    PARTITION BY user_id ORDER BY epoch_us(ts)
             |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS cents_1h
             |FROM events ORDER BY event_id""".stripMargin)),

    // DISTINCT aggregates (SURVEY §2.4 "not present"): Catalyst plans
    // these as a two-phase Expand/aggregate; the exact forms are the
    // oracle gate, approx_count_distinct (HLL) is the 100 TB path
    // (OpsSpec covers the sketch's error envelope).
    GraftQuery(
      "q52_distinct_agg",
      "COUNT(DISTINCT)/SUM(DISTINCT) per group — multi-distinct " +
        "aggregation in one pass.",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          (floor((sum_distinct(col("l_quantity"))) * 10000.0 + 0.5) / 10000.0)
            .as("qty_distinct_sum"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  count(DISTINCT l_suppkey) AS n_supp,
             |  count(DISTINCT l_partkey) AS n_part,
             |  (floor((sum(DISTINCT l_quantity)) * 10000.0 + 0.5) / 10000.0)
             |    AS qty_distinct_sum,
             |  count(*) AS cnt
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Global top-k: ORDER BY + LIMIT plans as TakeOrderedAndProject —
    // per-partition heaps + driver merge of k rows, never a global sort.
    // (SURVEY §2.6: the reference has no LIMIT anywhere; any real
    // consumer of it does.)
    GraftQuery(
      "q53_topk_limit",
      "Global top-100 by price via ORDER BY+LIMIT " +
        "(TakeOrderedAndProject, no full sort).",
      (s, d) => t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
        .limit(100),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
             |FROM lineitem
             |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
             |LIMIT 100""".stripMargin)),

    // INTERSECT / EXCEPT set semantics (dedup built in), tagged and
    // unioned so one query covers both.
    GraftQuery(
      "q54_set_ops",
      "INTERSECT + EXCEPT (set semantics): high-quantity supplier keys " +
        "vs low-nation suppliers, tagged per membership.",
      (s, d) => {
        val a = t(s, d, "lineitem").filter(col("l_quantity") >= 48)
          .select(col("l_suppkey").as("suppkey"))
        val b = t(s, d, "supplier").filter(col("s_nationkey") < 10)
          .select(col("s_suppkey").as("suppkey"))
        a.intersect(b).withColumn("tag", lit("both"))
          .unionAll(a.except(b).withColumn("tag", lit("high_qty_only")))
          .orderBy("suppkey", "tag")
      },
      Some("""SELECT suppkey, 'both' AS tag FROM (
             |  SELECT l_suppkey AS suppkey FROM lineitem WHERE l_quantity >= 48
             |  INTERSECT
             |  SELECT s_suppkey FROM supplier WHERE s_nationkey < 10)
             |UNION ALL
             |SELECT suppkey, 'high_qty_only' AS tag FROM (
             |  SELECT l_suppkey AS suppkey FROM lineitem WHERE l_quantity >= 48
             |  EXCEPT
             |  SELECT s_suppkey FROM supplier WHERE s_nationkey < 10)
             |ORDER BY suppkey, tag""".stripMargin)),

    // PIVOT with an explicit value list: explicit values keep it one pass
    // with no values-discovery job — the only form that scales (implicit
    // pivot first runs a distinct over the pivot column).
    GraftQuery(
      "q55_pivot",
      "PIVOT on return flag (explicit value list, single-pass " +
        "filtered aggregation per cell).",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(floor((sum("l_quantity")) * 10000.0 + 0.5) / 10000.0)
        .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
             |  (floor((sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END))
             |    * 10000.0 + 0.5) / 10000.0) AS "A",
             |  (floor((sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END))
             |    * 10000.0 + 0.5) / 10000.0) AS "N",
             |  (floor((sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END))
             |    * 10000.0 + 0.5) / 10000.0) AS "R"
             |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    // The as-of join operator (graft.operators.AsOfJoin): every 10th
    // event is an "annotation"; each event picks up the latest annotation
    // value at-or-before its timestamp per user. Oracle is DuckDB's
    // native ASOF LEFT JOIN — two completely different mechanisms, same
    // rows.
    GraftQuery(
      "q56_asof_join",
      "Backward as-of join (union + one sort + running last_value; no " +
        "range-join row explosion) vs DuckDB native ASOF JOIN.",
      (s, d) => {
        val ev = t(s, d, "events")
        val dedupW = Window.partitionBy("user_id", "ts")
          .orderBy(col("event_id").desc)
        val ann = ev.filter(pmod(col("event_id"), lit(10)) === 0)
          .withColumn("rn", row_number().over(dedupW))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("ts"), col("value").as("ann_value"))
        graft.operators.AsOfJoin.backward(
          ev.select(col("event_id"), col("user_id"), col("ts")),
          ann, Seq("user_id"), "ts", Seq("ann_value"))
          .select(col("event_id"), col("user_id"), col("ann_value"))
          .orderBy("event_id")
      },
      Some("""WITH ann AS (
             |  SELECT user_id, ts, value AS ann_value,
             |    row_number() OVER (PARTITION BY user_id, ts
             |      ORDER BY event_id DESC) AS rn
             |  FROM events WHERE event_id % 10 = 0),
             |a AS (SELECT user_id, ts, ann_value FROM ann WHERE rn = 1)
             |SELECT e.event_id, e.user_id, a.ann_value
             |FROM events e ASOF LEFT JOIN a
             |  ON e.user_id = a.user_id AND e.ts >= a.ts
             |ORDER BY e.event_id""".stripMargin)),

    // Top-k per group via the bounded-buffer Aggregator
    // (graft.operators.TopK): map-side partial aggregation ships
    // O(groups x k) rows through the shuffle instead of sorting all of
    // them the way the oracle's window formulation must.
    GraftQuery(
      "q57_topk_per_group",
      "Top-3 priciest lineitems per return flag via a typed UDAF " +
        "Aggregator (bounded heap, partial-agg) vs window row_number.",
      (s, d) => graft.operators.TopK.perGroup(
        t(s, d, "lineitem").select(col("l_returnflag"),
          // unique row id: 10*orderkey+linenumber (linenumber in 1..7)
          (col("l_orderkey") * 10 + col("l_linenumber")).as("row_id"),
          col("l_extendedprice")),
        "l_returnflag", "row_id", "l_extendedprice", k = 3)
        .orderBy("l_returnflag", "rank"),
      Some("""SELECT l_returnflag, id, score, rank FROM (
             |  SELECT l_returnflag,
             |    l_orderkey * 10 + l_linenumber AS id,
             |    l_extendedprice AS score,
             |    row_number() OVER (PARTITION BY l_returnflag
             |      ORDER BY l_extendedprice DESC,
             |               l_orderkey * 10 + l_linenumber) AS rank
             |  FROM lineitem)
             |WHERE rank <= 3 ORDER BY l_returnflag, rank""".stripMargin)),

    // The SQL-string entry point: the reference's consumers write SQL
    // against named views (S1 "registered as a view"); here the SAME
    // text runs through spark.sql over Tables.registerViews and through
    // the DuckDB oracle. Catalyst plans SQL and DataFrame code
    // identically — this query exists to pin the API surface, not a new
    // operator.
    GraftQuery(
      "q65_sql_surface",
      "spark.sql over registered views: identical SQL text on both " +
        "engines (nation-customer rollup with windowed share).",
      (s, d) => {
        Tables.registerViews(s, d)
        // 10000.0D: Spark SQL parses a bare decimal literal as DECIMAL
        // (BIGINT/DECIMAL division then yields decimal128 output, which
        // the oracle compare rejects); the D suffix pins DOUBLE — the
        // same type the DataFrame API's Scala literals produce.
        s.sql("""
          |SELECT n_name,
          |  count(*) AS cnt,
          |  floor(sum(c_acctbal) * 10000.0D + 0.5D) / 10000.0D AS total_bal,
          |  floor(sum(c_acctbal) / sum(sum(c_acctbal)) OVER ()
          |    * 10000.0D + 0.5D) / 10000.0D AS bal_share
          |FROM customer JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name ORDER BY n_name""".stripMargin)
      },
      Some("""SELECT n_name,
             |  count(*) AS cnt,
             |  floor(sum(c_acctbal) * 10000.0 + 0.5) / 10000.0 AS total_bal,
             |  floor(sum(c_acctbal) / sum(sum(c_acctbal)) OVER ()
             |    * 10000.0 + 0.5) / 10000.0 AS bal_share
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // Explicit GROUPING SETS — arbitrary grouping combinations, the form
    // ROLLUP/CUBE are sugar for. Spark exposes it only through SQL text,
    // so this rides the spark.sql surface; same one-pass Expand plan.
    GraftQuery(
      "q66_grouping_sets",
      "GROUP BY GROUPING SETS ((flag),(status),()) via spark.sql — " +
        "arbitrary set list, one Expand pass, grouping_id disambiguation.",
      (s, d) => {
        Tables.registerViews(s, d)
        s.sql("""
          |SELECT l_returnflag, l_linestatus,
          |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
          |  floor(sum(l_quantity) * 10000.0D + 0.5D) / 10000.0D AS sum_qty,
          |  count(*) AS cnt
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             |  floor(sum(l_quantity) * 10000.0 + 0.5) / 10000.0 AS sum_qty,
             |  count(*) AS cnt
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
             |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)),

    // The salted-aggregation rewrite under the correctness gate: the
    // two-phase (key, salt) -> key plan must be bit-identical to the
    // plain GROUP BY for algebraic aggregates. Counts are integers and
    // the double sum is floor-rounded like every other float output.
    GraftQuery(
      "q67_salted_agg",
      "Skew.saltedCountSum (two-phase salted rewrite) vs plain GROUP BY " +
        "— the skew-mitigation path is semantically transparent.",
      (s, d) => graft.operators.Skew.saltedCountSum(
        t(s, d, "lineitem"), Seq("l_returnflag"), "l_quantity",
        saltBuckets = 16)
        .select(col("l_returnflag"), col("cnt"),
          (floor(col("total") * 10000.0 + 0.5) / 10000.0).as("total"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(*) AS cnt,
             |  floor(sum(l_quantity) * 10000.0 + 0.5) / 10000.0 AS total
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // The remaining ranked-window family: percent_rank, cume_dist,
    // nth_value, first_value — relative standing within a partition.
    // The (price, key) compound order makes every row its own peer
    // group, so RANGE-vs-ROWS default-frame differences between
    // engines vanish and the rank ratios are exact rationals.
    GraftQuery(
      "qB1_rank_stats",
      "percent_rank / cume_dist / first_value / nth_value(2) per " +
        "order-priority partition, deterministic compound ordering.",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, d, "orders").select(
          col("o_orderkey"), col("o_orderpriority"),
          (floor((percent_rank().over(w)) * 10000.0 + 0.5) / 10000.0)
            .as("pr"),
          (floor((cume_dist().over(w)) * 10000.0 + 0.5) / 10000.0)
            .as("cd"),
          first_value(col("o_totalprice")).over(w).as("cheapest"),
          nth_value(col("o_totalprice"), 2).over(w).as("second"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderpriority,
             |  floor((percent_rank() OVER w) * 10000.0 + 0.5) / 10000.0
             |    AS pr,
             |  floor((cume_dist() OVER w) * 10000.0 + 0.5) / 10000.0
             |    AS cd,
             |  first_value(o_totalprice) OVER w AS cheapest,
             |  nth_value(o_totalprice, 2) OVER w AS second
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderpriority
             |  ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_orderkey""".stripMargin))
  )
}
