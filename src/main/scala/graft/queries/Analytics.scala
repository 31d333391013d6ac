package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.SafeOps
import graft.operators.{Sampling, Timeseries}

/** Time-series / reshaping analytics (round 4): daily gap-filling with
  * linear interpolation, SCD-2 change-history compression, and UNPIVOT.
  *
  * Same oracle-parity conventions as the other modules: stable
  * floor-rounding on every float output on BOTH sides, identical
  * aliases, unique-key ORDER BY.
  */
object Analytics {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[GraftQuery] = Seq(

    // Gap-filling: ~36% of (user, day) cells have a purchase; the rest
    // interpolate. The Spark side synthesizes gap days map-side from
    // each observed row's lead() — no calendar-spine join.
    GraftQuery(
      "q95_gapfill_interp",
      "Daily per-user purchase series with interior gaps linearly " +
        "interpolated between observed days (map-side sequence+explode " +
        "from lead(), maxGap-clamped; no dense-spine join).",
      (s, d) => Timeseries.dailyGapFill(
        t(s, d, "events").filter(col("event_type") === "purchase"),
        "user_id", "ts", "value", maxGapDays = 90)
        .orderBy("user_id", "day"),
      Some("""WITH obs AS (
             |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             |    floor(sum(value) * 10000.0 + 0.5) / 10000.0 AS v
             |  FROM events WHERE event_type = 'purchase'
             |  GROUP BY 1, 2),
             |led AS (
             |  SELECT user_id, day, v,
             |    lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nday,
             |    lead(v) OVER (PARTITION BY user_id ORDER BY day) AS nv
             |  FROM obs),
             |g AS (
             |  SELECT *, date_diff('day', day, nday) AS gap FROM led),
             |ex AS (
             |  SELECT user_id, day, v, nv, gap,
             |    CAST(unnest(CASE WHEN gap IS NOT NULL AND gap <= 90
             |      THEN generate_series(day, nday - 1, INTERVAL 1 DAY)
             |      ELSE [CAST(day AS TIMESTAMP)] END) AS DATE) AS d
             |  FROM g)
             |SELECT user_id, d AS day,
             |  floor((CASE WHEN d = day THEN v
             |    ELSE v + (nv - v) * date_diff('day', day, d) * 1.0 / gap
             |    END) * 10000.0 + 0.5) / 10000.0 AS filled,
             |  d = day AS is_observed
             |FROM ex ORDER BY user_id, day""".stripMargin)),

    // SCD-2: the per-day state is the day's LAST event value
    // ((ts, event_id)-ordered); consecutive equal states compress into
    // one validity range.
    GraftQuery(
      "q96_scd2_history",
      "SCD-2 change history of each user's per-day last event value: " +
        "rows only where the state changed, with [valid_from, valid_to) " +
        "ranges and an is_current flag.",
      (s, d) => Timeseries.scd2(
        t(s, d, "events"), "user_id", "ts", "event_id", "value")
        .orderBy("user_id", "valid_from"),
      Some("""WITH ranked AS (
             |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             |    value,
             |    row_number() OVER (
             |      PARTITION BY user_id, date_trunc('day', ts)
             |      ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events),
             |daily AS (
             |  SELECT user_id, day,
             |    floor(value * 10000.0 + 0.5) / 10000.0 AS value
             |  FROM ranked WHERE rn = 1),
             |ch AS (
             |  SELECT user_id, day, value,
             |    lag(value) OVER (PARTITION BY user_id ORDER BY day)
             |      AS prev
             |  FROM daily),
             |f AS (
             |  SELECT user_id, day, value FROM ch
             |  WHERE prev IS NULL OR prev != value)
             |SELECT user_id, day AS valid_from,
             |  lead(day) OVER (PARTITION BY user_id ORDER BY day)
             |    AS valid_to,
             |  value,
             |  lead(day) OVER (PARTITION BY user_id ORDER BY day) IS NULL
             |    AS is_current
             |FROM f ORDER BY user_id, valid_from""".stripMargin)),

    // UNPIVOT/melt: wide per-nation metrics to long (nation, metric,
    // val) rows — the reshaping half of the PIVOT already covered in
    // Extended (q53).
    GraftQuery(
      "q97_unpivot_metrics",
      "UNPIVOT of per-nation customer metrics (count, total balance, " +
        "avg balance) from wide to long via Dataset.unpivot.",
      (s, d) => t(s, d, "customer")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).cast("double").as("n_cust"),
          SafeOps.stableRound4(sum("c_acctbal")).as("total_bal"),
          SafeOps.stableRound4(avg("c_acctbal")).as("avg_bal"))
        .unpivot(Array(col("c_nationkey")),
          Array(col("n_cust"), col("total_bal"), col("avg_bal")),
          "metric", "val")
        .orderBy("c_nationkey", "metric"),
      Some("""SELECT c_nationkey, metric, CAST(val AS DOUBLE) AS val
             |FROM (UNPIVOT (
             |    SELECT c_nationkey,
             |      CAST(count(*) AS DOUBLE) AS n_cust,
             |      floor(sum(c_acctbal) * 10000.0 + 0.5) / 10000.0
             |        AS total_bal,
             |      floor(avg(c_acctbal) * 10000.0 + 0.5) / 10000.0
             |        AS avg_bal
             |    FROM customer GROUP BY 1)
             |  ON n_cust, total_bal, avg_bal INTO NAME metric VALUE val)
             |ORDER BY c_nationkey, metric""".stripMargin)),

    // Temperature-scaled mixture: α=0.5 flattens the language
    // distribution; √c is fixed-pointed to 1e-6 before the cross-strata
    // sum so the keep-rate arithmetic is bit-reproducible (see
    // Sampling.temperatureMixture).
    GraftQuery(
      "q98_temperature_mixture",
      "Temperature-scaled (alpha=0.5) language-mixture sampling at " +
        "target fraction 0.3: per-lang keep rates from fixed-point " +
        "sqrt-counts, decided per row by the portable salted hash.",
      (s, d) => Sampling.temperatureMixture(
        t(s, d, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang", targetFraction = 0.3, salt = "temp")
        .select(col("doc_id"), col("lang"),
          SafeOps.stableRound4(col("rate")).as("rate"),
          col("bucket").cast("long").as("bucket"))
        .orderBy("doc_id"),
      Some("""WITH c AS (
             |  SELECT lang, count(*) AS c,
             |    CAST(floor(sqrt(count(*)) * 1000000.0) AS BIGINT) AS sp
             |  FROM documents GROUP BY lang),
             |tot AS (
             |  SELECT CAST(sum(c) AS BIGINT) AS n_total,
             |    CAST(sum(sp) AS BIGINT) AS sum_sp
             |  FROM c),
             |r AS (
             |  SELECT lang, least(1.0, 0.3 *
             |      (CAST(tot.n_total AS DOUBLE) / CAST(c.c AS DOUBLE)) *
             |      (CAST(c.sp AS DOUBLE) / CAST(tot.sum_sp AS DOUBLE)))
             |    AS rate
             |  FROM c, tot),
             |h AS (
             |  SELECT d.doc_id, d.lang, r.rate,
             |    ('0x' || substr(md5('temp:' ||
             |      CAST(d.doc_id AS VARCHAR)),1,8))::BIGINT % 10000
             |      AS bucket
             |  FROM documents d JOIN r ON d.lang = r.lang)
             |SELECT doc_id, lang,
             |  floor(rate * 10000.0 + 0.5) / 10000.0 AS rate,
             |  CAST(bucket AS BIGINT) AS bucket
             |FROM h
             |WHERE bucket < CAST(floor(rate * 10000.0 + 0.5) AS BIGINT)
             |ORDER BY doc_id""".stripMargin)),

    // Weighted sampling without replacement: 10 docs per language,
    // P(select) ∝ ln(1+n_chars), via Efraimidis–Spirakis exponential
    // keys on the deterministic hash draw.
    GraftQuery(
      "q99_weighted_sample_k",
      "Weighted sampling without replacement (10 per lang, weight " +
        "ln(1+n_chars)) via Efraimidis-Spirakis exponential keys; " +
        "WindowGroupLimit keeps the top-k shuffle at k rows/partition.",
      (s, d) => Sampling.weightedSampleK(
        t(s, d, "documents").select(col("doc_id"), col("lang"),
          col("n_chars")),
        "doc_id", "lang", weight = log(lit(1.0) + col("n_chars")),
        k = 10, salt = "wsample")
        .select(col("doc_id"), col("lang"),
          SafeOps.stableRound4(col("w")).as("w"),
          SafeOps.stableRound4(col("e")).as("e"),
          col("rank").cast("long").as("rank"))
        .orderBy("lang", "rank"),
      Some("""WITH keyed AS (
             |  SELECT doc_id, lang, ln(1.0 + n_chars) AS w,
             |    -ln((('0x' || substr(md5('wsample:' ||
             |        CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 1000000
             |        + 1) / 1000000.0) / ln(1.0 + n_chars) AS e
             |  FROM documents WHERE ln(1.0 + n_chars) > 0),
             |ranked AS (
             |  SELECT doc_id, lang, w, e,
             |    row_number() OVER (PARTITION BY lang
             |      ORDER BY e, doc_id) AS rank
             |  FROM keyed)
             |SELECT doc_id, lang,
             |  floor(w * 10000.0 + 0.5) / 10000.0 AS w,
             |  floor(e * 10000.0 + 0.5) / 10000.0 AS e,
             |  CAST(rank AS BIGINT) AS rank
             |FROM ranked WHERE rank <= 10
             |ORDER BY lang, rank""".stripMargin))
  )
}
