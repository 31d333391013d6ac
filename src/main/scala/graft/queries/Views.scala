package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.catalog.ReferenceViews

/** Oracle-checked queries over the NAMED reference view surface
  * ([[graft.catalog.ReferenceViews]] — every view name
  * create_dataset_views.sh deploys, as real dataset-qualified catalog
  * views). Each query deploys the manifest (cheap: catalog-only DDL,
  * no jobs) and reads through the PUBLIC names a reference user would
  * query — the unified/statistics/union chains each traverse 3-4
  * stacked views, so these queries oracle-check the whole deployed
  * lineage, not just the leaf.
  *
  * The DuckDB oracles rebuild the same lineage from the shared
  * [[ReferenceViews.archiveColumns]] template (one builder, two
  * renderings), so the synthetic raw-layer mapping cannot drift
  * between engines.
  */
object ViewSurface {

  /** The archive CTE in DuckDB dialect — same column builder the Spark
    * base view renders, so both engines derive identical raw rows. */
  private val duckArchive: String =
    "archive AS (SELECT " +
      ReferenceViews.archiveColumns("CAST(ts AS DATE)",
        m => s"CAST($m AS VARCHAR)").mkString(", ") +
      " FROM events)"

  /** unified_downloads' row set, in DuckDB: the three extended legs
    * share one filter once view_name is derived from the datatype. */
  private val duckUnifiedDownloads: String =
    s"""WITH $duckArchive,
       |dl AS (
       |  SELECT date, id, user_id,
       |    'extended_' || datatype || '_downloads' AS view_name,
       |    mbps, min_rtt, continent_code, country_code, region_code,
       |    city, us_state, us_county, asn
       |  FROM archive
       |  WHERE experiment = 'ndt'
       |    AND datatype IN ('ndt5', 'ndt7', 'web100')
       |    AND direction = 'download'
       |    AND ${ReferenceViews.validPredicate})""".stripMargin

  private def deployed(s: SparkSession, d: String): Unit = {
    ReferenceViews.deploy(s, d)
    ()
  }

  private def r4(c: org.apache.spark.sql.Column) =
    floor(c * 10000.0 + 0.5) / 10000.0

  val all: Seq[GraftQuery] = Seq(

    // S7+S2+U1+P6 over the deployed manifest: the statistics ladder's
    // country grain, read through statistics.v0_countries — which
    // stacks on ndt.unified_downloads -> ndt_intermediate.extended_* ->
    // ndt.{ndt5,ndt7,web100} -> ndt_raw/base_tables -> archive: a
    // five-level deployed-view lineage resolved by name.
    GraftQuery(
      "qR0_stats_countries_view",
      "statistics.v0_countries from the deployed reference-view " +
        "manifest: per-(continent, country, date) download rollups " +
        "through the full unified chain (5 stacked views).",
      (s, d) => {
        deployed(s, d)
        s.table("statistics.v0_countries")
          .orderBy("continent_code", "country_code", "date")
      },
      Some(s"""$duckUnifiedDownloads
              |SELECT continent_code, country_code, date,
              |  COUNT(*) AS dl_tests,
              |  FLOOR(AVG(mbps) * 10000 + 0.5) / 10000 AS dl_mean_mbps,
              |  FLOOR(MIN(mbps) * 10000 + 0.5) / 10000 AS dl_min_mbps,
              |  FLOOR(MAX(mbps) * 10000 + 0.5) / 10000 AS dl_max_mbps
              |FROM dl
              |GROUP BY continent_code, country_code, date
              |ORDER BY continent_code, country_code, date""".stripMargin)),

    // The unified view itself, row-level: every valid download row with
    // its era branch name — the reference's primary public surface
    // (ndt.unified_downloads).
    GraftQuery(
      "qR1_unified_downloads_view",
      "ndt.unified_downloads row-level through the deployed manifest: " +
        "era branch (view_name), throughput and rtt per valid " +
        "download, resolved by catalog name.",
      (s, d) => {
        deployed(s, d)
        s.table("ndt.unified_downloads")
          .select(col("date"), col("id"), col("view_name"),
            r4(col("mbps")).as("mbps"), col("min_rtt"))
          .orderBy("id")
      },
      Some(s"""$duckUnifiedDownloads
              |SELECT date, id, view_name,
              |  FLOOR(mbps * 10000 + 0.5) / 10000 AS mbps, min_rtt
              |FROM dl ORDER BY id""".stripMargin)),

    // The legacy/dynamic union trio: ndt.ndt7_union strips the per-leg
    // tag columns with `* EXCEPT` and unions the autoload fleet with
    // the legacy fleet (ndt/ndt7_union.sql:5-7) — every ndt7 row
    // appears once per fleet.
    GraftQuery(
      "qR2_ndt7_union_view",
      "ndt.ndt7_union through the deployed manifest: per-(direction, " +
        "site) counts and throughput extremes over the two-fleet " +
        "EXCEPT-union.",
      (s, d) => {
        deployed(s, d)
        s.table("ndt.ndt7_union")
          .groupBy("direction", "site")
          .agg(count(lit(1)).as("n"), r4(min("mbps")).as("lo"),
            r4(max("mbps")).as("hi"))
          .orderBy("direction", "site")
      },
      Some(s"""WITH $duckArchive,
              |n7 AS (SELECT * FROM archive
              |  WHERE experiment = 'ndt' AND datatype = 'ndt7'),
              |u AS (SELECT * FROM n7 UNION ALL SELECT * FROM n7)
              |SELECT direction, site, COUNT(*) AS n,
              |  FLOOR(MIN(mbps) * 10000 + 0.5) / 10000 AS lo,
              |  FLOOR(MAX(mbps) * 10000 + 0.5) / 10000 AS hi
              |FROM u GROUP BY direction, site
              |ORDER BY direction, site""".stripMargin)),

    // U3+S7 over the deployed LEGACY surface (make_views.sh's
    // lineage, the reference's second deploy script): the public
    // release link resolves rc/alias -> ndt_downloads -> sensible ->
    // all -> exhaustive (a legacySQL COMMA-UNION of the ETL and PLX
    // eras, the PLX side itself a comma-union of two bottom tables)
    // -> archive — six stacked views, two dialect-translated
    // comma-unions, and the script's "add the ndt.iupui. prefix
    // back" quirk, all replayed relationally by the oracle.
    GraftQuery(
      "qS3_legacy_lineage_view",
      "release.ndt_downloads_legacysql through the deployed legacySQL " +
        "lineage: public alias link over the six-view stacked chain " +
        "with two translated comma-unions and the hostname-prefix " +
        "quirk.",
      (s, d) => {
        graft.catalog.LegacyViews.deploy(s, d)
        s.table("release.ndt_downloads_legacysql")
          .select(col("test_id"), col("partition_date"),
            r4(col("mbps")).as("mbps"), col("min_rtt"), col("site"),
            col("country_code"))
          .orderBy("test_id")
      },
      Some(s"""WITH $duckArchive,
              |nweb AS (SELECT * FROM archive
              |  WHERE experiment = 'ndt' AND datatype = 'web100'),
              |ex AS (
              |  SELECT id AS test_id, date AS partition_date,
              |    direction, mbps, min_rtt,
              |    'ndt.iupui.' || site AS site, country_code
              |  FROM nweb WHERE date >= DATE '2024-01-16'
              |  UNION ALL
              |  SELECT id, date, direction, mbps, min_rtt, site,
              |    country_code
              |  FROM nweb WHERE date < DATE '2024-01-16')
              |SELECT test_id, partition_date,
              |  FLOOR(mbps * 10000 + 0.5) / 10000 AS mbps, min_rtt,
              |  site, country_code
              |FROM ex
              |WHERE mbps IS NOT NULL
              |  AND site != '13' AND site != 'ndt.iupui.13'
              |  AND min_rtt >= 2 AND min_rtt < 45
              |  AND direction = 'download' AND mbps >= 1
              |ORDER BY test_id""".stripMargin)),

    // The standardSQL sibling lineage (views_standardsql/
    // make_views.sh + create_named_views.sh): same seven-view stack
    // in the standard dialect, deployed under plain names into the
    // same datasets, with the faithful dialect differences — standard
    // common_etl reads through the NAMED-VIEW mapping surface
    // (ndt.web100) with the era WHERE commented out, and standard
    // ndt_exhaustive carries the PLX union inside a block comment, so
    // the stack serves ALL web100 rows (both eras) with the
    // ndt.iupui. prefix applied to every row.
    GraftQuery(
      "qS4_standard_lineage_view",
      "release.ndt_uploads through the deployed standardSQL lineage: " +
        "public alias link over the stacked chain, named-view source " +
        "mapping, prefix on every row (the dialect twin of qS3).",
      (s, d) => {
        graft.catalog.StandardViews.deploy(s, d)
        s.table("release.ndt_uploads")
          .select(col("test_id"), col("partition_date"),
            r4(col("mbps")).as("mbps"), col("min_rtt"), col("site"),
            col("country_code"))
          .orderBy("test_id")
      },
      Some(s"""WITH $duckArchive,
              |nweb AS (SELECT * FROM archive
              |  WHERE experiment = 'ndt' AND datatype = 'web100'),
              |ce AS (
              |  SELECT id AS test_id, date AS partition_date,
              |    direction, mbps, min_rtt,
              |    'ndt.iupui.' || site AS site, country_code
              |  FROM nweb)
              |SELECT test_id, partition_date,
              |  FLOOR(mbps * 10000 + 0.5) / 10000 AS mbps, min_rtt,
              |  site, country_code
              |FROM ce
              |WHERE mbps IS NOT NULL
              |  AND site != '13' AND site != 'ndt.iupui.13'
              |  AND min_rtt >= 2 AND min_rtt < 45
              |  AND direction = 'upload' AND mbps >= 1
              |ORDER BY test_id""".stripMargin)))
}
