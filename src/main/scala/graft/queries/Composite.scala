package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

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
        // 2. explode hops (CROSS JOIN UNNEST)
        val hops = nested.select(col("l_orderkey"), col("raw"),
          explode(col("raw.nodes")).as("hop"))
        // 3. per-hop annotation join (annotation side broadcast)
        val ann = hops.join(
          broadcast(t(s, d, "part").select(
            col("p_partkey"), col("p_brand"))),
          col("hop.partkey") === col("p_partkey"), "left")
        // 4. re-collect annotated hops in hop order
        val rebuilt = ann
          .groupBy("l_orderkey")
          .agg(first(col("raw")).as("raw"),
            // struct field order IS the sort key: hop_no with partkey/qty
            // tie-breaks (hop_no alone is not unique within an order)
            sort_array(collect_list(struct(
              col("hop.hop_no").as("hop_no"),
              col("hop.partkey").as("partkey"),
              col("hop.qty").as("qty"),
              col("p_brand").as("brand")))).as("ann_nodes"))
          // 5. * REPLACE: drop raw.nodes, graft the annotated array
          .withColumn("raw", col("raw").dropFields("nodes")
            .withField("exp_nodes", col("ann_nodes")))
        // 6. flatten deterministically for the oracle
        rebuilt.select(
          col("l_orderkey"),
          size(col("raw.exp_nodes")).as("n_hops"),
          array_join(transform(col("raw.exp_nodes"),
            h => h.getField("brand")), ",").as("brands"),
          round(aggregate(col("raw.exp_nodes"), lit(0.0d),
            (acc, h) => acc + h.getField("qty")), 4).as("qty_total"))
          .orderBy("l_orderkey")
      },
      Some("""SELECT l_orderkey, count(*) AS n_hops,
             |  string_agg(p_brand, ','
             |    ORDER BY l_linenumber, l_partkey, l_quantity) AS brands,
             |  round(sum(l_quantity), 4) AS qty_total
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
          .select(col("event_type"), col("idx"), round(col("qv"), 4).as("qv"))
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
             |  round(qs[CAST(r.range AS INT) + 1], 4) AS qv
             |FROM g, range(11) r ORDER BY event_type, idx""".stripMargin))
  )
}
