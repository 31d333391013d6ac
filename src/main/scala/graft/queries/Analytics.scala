package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.{GraftFunctions, SafeOps}
import graft.operators.{Dedup, Diff, Graph, Sampling, Similarity, Timeseries}

/** Time-series / graph / versioning analytics (round 4): daily
  * gap-filling with linear interpolation, SCD-2 change-history
  * compression, UNPIVOT, mixture sampling, containment dedup, PageRank,
  * sparse-cosine pairs, snapshot diffing, cooldown dedup, char-entropy
  * scoring, and winsorization.
  *
  * Same oracle-parity conventions as the other modules: stable
  * floor-rounding on every float output on BOTH sides, identical
  * aliases, unique-key ORDER BY.
  */
object Analytics {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // qB9's stopword OR-chain (same list LlmOps builds), for the qC4
  // gate oracle.
  private val allStopwordsSql = graft.operators.TextAnalysis
    .StopwordProfiles.flatMap(_._2).distinct
    .map(w => s"t = '$w'").mkString(" OR ")

  // q31's shingle-set CTE (LlmOps.duckShingleSets), shared by the
  // containment and PageRank oracles.
  private val duckShingleSets =
    """sets AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      list_transform(range(1, len(string_split(text,' ')) - 1),
      |        i -> string_split(text,' ')[i] || ' ' ||
      |             string_split(text,' ')[i+1] || ' ' ||
      |             string_split(text,' ')[i+2]),
      |      g -> ('0x' || substr(md5(g),1,8))::BIGINT)) AS sh
      |  FROM documents
      |  WHERE len(string_split(text,' ')) >= 3)""".stripMargin

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
             |ORDER BY lang, rank""".stripMargin)),

    // Asymmetric containment: |A∩B|/|A| flags quote-inclusion and
    // sub-document copies that a symmetric Jaccard threshold misses.
    GraftQuery(
      "qA0_containment_pairs",
      "Directed 3-gram containment pairs (|A intersect B| / |A| >= 0.6) " +
        "via the shingle inverted index — catches short docs quoted " +
        "inside long ones where Jaccard ~ |A|/|B| stays tiny.",
      (s, d) => Dedup.containmentPrefixPairs(
        t(s, d, "documents"), "doc_id", "text", n = 3, threshold = 0.6)
        .select(col("doc_a"), col("doc_b"),
          SafeOps.stableRound4(col("containment")).as("containment"))
        .orderBy("doc_a", "doc_b"),
      Some(s"""WITH $duckShingleSets,
              |p AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |    len(list_intersect(a.sh, b.sh)) AS common,
              |    len(a.sh) AS sa
              |  FROM sets a JOIN sets b ON a.doc_id != b.doc_id)
              |SELECT doc_a, doc_b,
              |  floor((CAST(common AS DOUBLE) / sa) * 10000.0 + 0.5)
              |    / 10000.0 AS containment
              |FROM p WHERE CAST(common AS DOUBLE) / sa >= 0.6
              |ORDER BY doc_a, doc_b""".stripMargin)),

    // PageRank over the near-dup pair graph: centrality-based canonical
    // scoring. The oracle unrolls the same three fixed-point iterations
    // over the all-pairs edge set.
    GraftQuery(
      "qA1_pagerank_dedup_graph",
      "3-iteration PageRank (damping 0.85, 1e-9 per-round fixpoint) " +
        "over the symmetrized 3-gram-Jaccard near-dup graph, all docs " +
        "as nodes; rel_rank = rank x n.",
      (s, d) => {
        val docs = t(s, d, "documents")
        val pairs = Dedup.ngramJaccardPrefixPairs(
          docs, "doc_id", "text", n = 3, threshold = 0.5)
        val edges = pairs.select(col("doc_a").as("src"),
            col("doc_b").as("dst"))
          .union(pairs.select(col("doc_b"), col("doc_a")))
        Graph.pageRank(docs, "doc_id", edges, "src", "dst",
          iterations = 3, damping = 0.85)
          .select(col("node").as("doc_id"),
            SafeOps.stableRound4(col("rel_rank")).as("rel_rank"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $duckShingleSets,
              |pr AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |    len(list_intersect(a.sh, b.sh)) AS common,
              |    len(a.sh) AS sa, len(b.sh) AS sb
              |  FROM sets a JOIN sets b ON a.doc_id < b.doc_id),
              |pp AS (
              |  SELECT doc_a, doc_b FROM pr
              |  WHERE CAST(common AS DOUBLE)/(sa+sb-common) >= 0.5),
              |e AS (SELECT doc_a AS a, doc_b AS b FROM pp
              |  UNION ALL SELECT doc_b, doc_a FROM pp),
              |deg AS (SELECT a, count(*) AS deg FROM e GROUP BY a),
              |nn AS (SELECT count(*) AS n FROM documents),
              |r0 AS (SELECT doc_id AS node,
              |    CAST(1.0 AS DOUBLE)/(SELECT n FROM nn) AS r
              |  FROM documents),
              |c1 AS (SELECT e.b AS dst, sum(r.r / d.deg) AS m
              |  FROM e JOIN r0 r ON e.a = r.node
              |  JOIN deg d ON e.a = d.a GROUP BY e.b),
              |r1 AS (SELECT r0.node, floor((
              |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
              |      / (SELECT n FROM nn)
              |    + CAST(0.85 AS DOUBLE) * coalesce(c1.m,
              |        CAST(0.0 AS DOUBLE)))
              |    * 1000000000.0 + 0.5) / 1000000000.0 AS r
              |  FROM r0 LEFT JOIN c1 ON r0.node = c1.dst),
              |c2 AS (SELECT e.b AS dst, sum(r.r / d.deg) AS m
              |  FROM e JOIN r1 r ON e.a = r.node
              |  JOIN deg d ON e.a = d.a GROUP BY e.b),
              |r2 AS (SELECT r1.node, floor((
              |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
              |      / (SELECT n FROM nn)
              |    + CAST(0.85 AS DOUBLE) * coalesce(c2.m,
              |        CAST(0.0 AS DOUBLE)))
              |    * 1000000000.0 + 0.5) / 1000000000.0 AS r
              |  FROM r1 LEFT JOIN c2 ON r1.node = c2.dst),
              |c3 AS (SELECT e.b AS dst, sum(r.r / d.deg) AS m
              |  FROM e JOIN r2 r ON e.a = r.node
              |  JOIN deg d ON e.a = d.a GROUP BY e.b),
              |r3 AS (SELECT r2.node, floor((
              |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
              |      / (SELECT n FROM nn)
              |    + CAST(0.85 AS DOUBLE) * coalesce(c3.m,
              |        CAST(0.0 AS DOUBLE)))
              |    * 1000000000.0 + 0.5) / 1000000000.0 AS r
              |  FROM r2 LEFT JOIN c3 ON r2.node = c3.dst)
              |SELECT node AS doc_id,
              |  floor((r * (SELECT n FROM nn)) * 10000.0 + 0.5)
              |    / 10000.0 AS rel_rank
              |FROM r3 ORDER BY doc_id""".stripMargin)),

    // Sparse bag-of-words cosine: pairs are scored only on SHARED
    // terms via the posting-list self-join — the third pair-generation
    // family next to set-overlap (Jaccard/containment) and dense
    // embeddings. Integer dot product + integer-norm square roots keep
    // the double bit-identical across engines.
    GraftQuery(
      "qA2_sparse_cosine_pairs",
      "All-pairs TF cosine >= 0.9 over the token inverted index " +
        "(integer dot / sqrt of integer norms — engine-exact), " +
        "shuffle-pinned posting self-join, maxPosting=1000 stopword " +
        "guard (a token in >1000 docs fans out >10^6 pairs while " +
        "carrying the least signal; both engines drop the same terms).",
      (s, d) => Similarity.sparseCosinePairs(
        t(s, d, "documents"), "doc_id", "text", threshold = 0.9,
        maxPosting = 1000)
        .select(col("doc_a"), col("doc_b"), col("dotp"),
          SafeOps.stableRound4(col("cosine")).as("cosine"))
        .orderBy("doc_a", "doc_b"),
      Some("""WITH tf0 AS (
             |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
             |  FROM (SELECT doc_id,
             |          unnest(string_split(text, ' ')) AS tok
             |        FROM documents)
             |  WHERE tok != '' GROUP BY doc_id, tok),
             |tf AS (
             |  SELECT * FROM tf0 WHERE tok NOT IN (
             |    SELECT tok FROM tf0 GROUP BY tok
             |    HAVING count(*) > 1000)),
             |nrm AS (
             |  SELECT doc_id, CAST(sum(tf*tf) AS BIGINT) AS n2
             |  FROM tf GROUP BY doc_id),
             |p AS (
             |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
             |    CAST(sum(x.tf * y.tf) AS BIGINT) AS dotp
             |  FROM tf x JOIN tf y
             |    ON x.tok = y.tok AND x.doc_id < y.doc_id
             |  GROUP BY 1, 2)
             |SELECT doc_a, doc_b, dotp,
             |  floor((CAST(dotp AS DOUBLE) /
             |      sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)))
             |    * 10000.0 + 0.5) / 10000.0 AS cosine
             |FROM p
             |JOIN nrm na ON p.doc_a = na.doc_id
             |JOIN nrm nb ON p.doc_b = nb.doc_id
             |WHERE CAST(dotp AS DOUBLE) /
             |    sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))
             |  >= 0.9
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Snapshot diff: the derive-a-delta side of dataset versioning
    // (q77 snapshot_merge is the apply side). Two synthetic snapshots
    // of orders — ~1% of keys dropped from each side, price bumped on
    // the 11-divisible keys — diffed into added/removed/changed rows.
    GraftQuery(
      "qA3_snapshot_diff",
      "Dataset-version diff of two orders snapshots: full-outer " +
        "sort-merge on the key, null-safe per-column compare, " +
        "changed-column list; unchanged keys filtered before output.",
      (s, d) => {
        val orders = t(s, d, "orders")
        val old = orders.filter(col("o_orderkey") % 97 =!= 3)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 11 === 0, col("o_totalprice") + 1.0)
              .otherwise(col("o_totalprice")))
        val cur = orders.filter(col("o_orderkey") % 89 =!= 5)
        Diff.snapshotDiff(old, cur, Seq("o_orderkey"),
          Seq("o_orderstatus", "o_totalprice"))
          // comma-joined for the oracle compare (list physical types
          // diverge across engines; same convention as q18/q28)
          .withColumn("changed_cols", array_join(col("changed_cols"), ","))
          .orderBy("o_orderkey")
      },
      Some("""WITH old AS (
             |  SELECT o_orderkey, o_orderstatus,
             |    CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1.0
             |         ELSE o_totalprice END AS o_totalprice
             |  FROM orders WHERE o_orderkey % 97 != 3),
             |cur AS (
             |  SELECT o_orderkey, o_orderstatus, o_totalprice
             |  FROM orders WHERE o_orderkey % 89 != 5)
             |SELECT coalesce(old.o_orderkey, cur.o_orderkey)
             |    AS o_orderkey,
             |  CASE WHEN old.o_orderkey IS NULL THEN 'added'
             |       WHEN cur.o_orderkey IS NULL THEN 'removed'
             |       ELSE 'changed' END AS status,
             |  CASE WHEN old.o_orderkey IS NULL
             |         OR cur.o_orderkey IS NULL
             |       THEN ''
             |       ELSE array_to_string(CAST(
             |         (CASE WHEN old.o_orderstatus IS DISTINCT FROM
             |                    cur.o_orderstatus
             |               THEN ['o_orderstatus'] ELSE [] END ||
             |          CASE WHEN old.o_totalprice IS DISTINCT FROM
             |                    cur.o_totalprice
             |               THEN ['o_totalprice'] ELSE [] END)
             |         AS VARCHAR[]), ',') END AS changed_cols
             |FROM old FULL OUTER JOIN cur
             |  ON old.o_orderkey = cur.o_orderkey
             |WHERE old.o_orderkey IS NULL OR cur.o_orderkey IS NULL
             |   OR old.o_orderstatus IS DISTINCT FROM cur.o_orderstatus
             |   OR old.o_totalprice IS DISTINCT FROM cur.o_totalprice
             |ORDER BY o_orderkey""".stripMargin)),

    // Greedy cooldown dedup: keep an event only if >= 7 days past the
    // last KEPT event of the same (user, type) — a sequential decision
    // no plain window expresses. The Spark fold and the DuckDB
    // list-reduce both run on exact integer microseconds.
    GraftQuery(
      "qA4_cooldown_dedup",
      "Per-(user, event_type) greedy 7-day cooldown dedup: one key " +
        "shuffle, (ts, id)-sorted array, kept-set left fold on exact " +
        "integer microseconds.",
      (s, d) => Timeseries.cooldownDedup(
        t(s, d, "events"), Seq("user_id", "event_type"), "ts",
        "event_id", cooldownSec = 7L * 86400L)
        // timestamp_ntz: parquet gets isAdjustedToUTC=false/us, same
        // physical type as DuckDB's make_timestamp (q23 convention)
        .withColumn("ts", col("ts").cast("timestamp_ntz"))
        .orderBy("user_id", "event_type", "ts", "event_id"),
      // Oracle: recursive frontier — each round keeps, per key, the
      // (t, eid)-least event >= last kept + cooldown (a list-fold
      // formulation would be natural, but DuckDB 1.0's reduce()
      // corrupts list accumulators past ~12 elements).
      Some("""WITH RECURSIVE ev AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS t,
             |    event_id AS eid
             |  FROM events),
             |first AS (
             |  SELECT user_id, event_type, t, eid FROM (
             |    SELECT *, row_number() OVER (
             |      PARTITION BY user_id, event_type
             |      ORDER BY t, eid) AS rn FROM ev) WHERE rn = 1),
             |kept AS (
             |  SELECT user_id, event_type, t, eid FROM first
             |  UNION ALL
             |  SELECT k.user_id, k.event_type, nxt.t, nxt.eid
             |  FROM kept k JOIN LATERAL (
             |    SELECT min({'t': e.t, 'eid': e.eid}) AS m
             |    FROM ev e
             |    WHERE e.user_id = k.user_id
             |      AND e.event_type = k.event_type
             |      AND e.t >= k.t + 604800000000
             |  ) s ON s.m IS NOT NULL
             |  CROSS JOIN LATERAL (
             |    SELECT s.m.t AS t, s.m.eid AS eid) nxt)
             |SELECT user_id, event_type, make_timestamp(t) AS ts,
             |  eid AS event_id
             |FROM kept
             |ORDER BY user_id, event_type, ts, event_id""".stripMargin)),

    // Character-entropy quality signal: per-row codegen'd kernel — the
    // naive formulation (explode to one row per CHARACTER, groupBy)
    // shuffles a corpus-sized char stream; the kernel is a projection
    // at scan speed. The oracle IS that naive formulation, with an
    // ORDER BY ch list-sum mirroring the kernel's ascending-code-point
    // accumulation so the doubles match bit-for-bit.
    GraftQuery(
      "qA5_char_entropy",
      "Shannon entropy (nats) of each doc's character distribution — " +
        "low-entropy = repeated-char / mashed text reject signal; " +
        "per-row kernel vs explode+groupBy oracle.",
      (s, d) => {
        GraftFunctions.registerAll(s)
        t(s, d, "documents").select(col("doc_id"), col("n_chars"),
          SafeOps.stableRound4(
            GraftFunctions.charEntropy(col("text"))).as("entropy"))
          .orderBy("doc_id")
      },
      Some("""WITH ch AS (
             |  SELECT doc_id, unnest(string_split(text, '')) AS c
             |  FROM documents),
             |cnt AS (
             |  SELECT doc_id, c, CAST(count(*) AS BIGINT) AS cnt
             |  FROM ch GROUP BY 1, 2),
             |agg AS (
             |  SELECT doc_id, sum(cnt) AS n,
             |    list_sum(list(cnt * ln(cnt) ORDER BY c)) AS s
             |  FROM cnt GROUP BY doc_id)
             |SELECT d.doc_id, d.n_chars,
             |  floor((ln(a.n) - a.s / a.n) * 10000.0 + 0.5) / 10000.0
             |    AS entropy
             |FROM documents d JOIN agg a ON d.doc_id = a.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // Winsorization: per-group p10/p90 clipping of a signal column —
    // the robust normalization step before mixing quality scores across
    // heterogeneous sources. Group bounds are a |langs|-row frame →
    // broadcast join back; the corpus never shuffles for the clip.
    GraftQuery(
      "qA6_winsorize",
      "Per-language p10/p90 winsorized n_chars: exact interpolated " +
        "percentile bounds (q13 convention), broadcast bounds join, " +
        "clip as a per-row projection.",
      (s, d) => {
        val docs = t(s, d, "documents")
        val bounds = docs.groupBy("lang").agg(
          expr("percentile(n_chars, 0.1)").as("lo"),
          expr("percentile(n_chars, 0.9)").as("hi"))
        docs.join(broadcast(bounds), Seq("lang"))
          .select(col("doc_id"), col("lang"), col("n_chars"),
            SafeOps.stableRound4(
              least(greatest(col("n_chars").cast("double"), col("lo")),
                col("hi"))).as("clipped"))
          .orderBy("doc_id")
      },
      Some("""WITH b AS (
             |  SELECT lang, quantile_cont(n_chars, 0.1) AS lo,
             |    quantile_cont(n_chars, 0.9) AS hi
             |  FROM documents GROUP BY lang)
             |SELECT doc_id, d.lang, n_chars,
             |  floor((least(greatest(CAST(n_chars AS DOUBLE), lo), hi))
             |    * 10000.0 + 0.5) / 10000.0 AS clipped
             |FROM documents d JOIN b ON d.lang = b.lang
             |ORDER BY doc_id""".stripMargin)),

    // Distribution-drift monitor: PSI (population stability index)
    // contributions of the order-value distribution, pre-1998 vs
    // after — the pipeline-regression gate between two ingestion
    // periods. Bin counts are exact integers; +1 Laplace smoothing
    // keeps one-sided bins finite; emitted per bin (the headline PSI
    // is the consumer's sum, keeping every output an order-free exact
    // expression).
    GraftQuery(
      "qB2_drift_psi",
      "Per-bin PSI contributions of o_totalprice (50k bins), " +
        "pre-1998 vs 1998+ orders: exact counts, Laplace-smoothed " +
        "shares, (pA-pB)*ln(pA/pB).",
      (s, d) => {
        val orders = t(s, d, "orders")
          .withColumn("bin",
            floor(col("o_totalprice") / 50000.0).cast("long"))
          .withColumn("is_a", col("o_orderdate") < "1998-01-01")
        val counts = orders.groupBy("bin").agg(
          sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"),
          sum(when(!col("is_a"), 1L).otherwise(0L)).as("n_b"))
        val tot = counts.agg(
          sum("n_a").as("t_a"), sum("n_b").as("t_b"),
          count(lit(1)).as("nbins"))
        counts.crossJoin(broadcast(tot))
          .select(col("bin"), col("n_a"), col("n_b"),
            SafeOps.stableRound4(
              (((col("n_a") + 1).cast("double") /
                (col("t_a") + col("nbins")).cast("double")) -
                ((col("n_b") + 1).cast("double") /
                  (col("t_b") + col("nbins")).cast("double"))) *
                log(((col("n_a") + 1).cast("double") /
                  (col("t_a") + col("nbins")).cast("double")) /
                  ((col("n_b") + 1).cast("double") /
                    (col("t_b") + col("nbins")).cast("double"))))
              .as("psi"))
          .orderBy("bin")
      },
      Some("""WITH b AS (
             |  SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT)
             |      AS bin,
             |    CAST(sum(CASE WHEN o_orderdate < DATE '1998-01-01'
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(sum(CASE WHEN o_orderdate < DATE '1998-01-01'
             |      THEN 0 ELSE 1 END) AS BIGINT) AS n_b
             |  FROM orders GROUP BY 1),
             |t AS (
             |  SELECT CAST(sum(n_a) AS BIGINT) AS t_a,
             |    CAST(sum(n_b) AS BIGINT) AS t_b,
             |    CAST(count(*) AS BIGINT) AS nbins
             |  FROM b)
             |SELECT bin, n_a, n_b,
             |  floor(((CAST(n_a + 1 AS DOUBLE) / (t_a + nbins) -
             |          CAST(n_b + 1 AS DOUBLE) / (t_b + nbins)) *
             |    ln((CAST(n_a + 1 AS DOUBLE) / (t_a + nbins)) /
             |       (CAST(n_b + 1 AS DOUBLE) / (t_b + nbins))))
             |    * 10000.0 + 0.5) / 10000.0 AS psi
             |FROM b, t ORDER BY bin""".stripMargin)),

    // First-order Markov transition matrix of the event stream — the
    // behavioral-sequence summary next to funnels (q92) and retention
    // (q93). One user-key window pass for the lag; the matrix itself is
    // |types|² rows. Probabilities are exact count ratios.
    GraftQuery(
      "qB3_transition_matrix",
      "Per-user event-type transition counts and probabilities " +
        "(lag window, (ts, id)-ordered), |types|^2-row output.",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val byPrev = org.apache.spark.sql.expressions.Window
          .partitionBy("prev")
        t(s, d, "events")
          .select(col("user_id"), col("event_type"),
            lag("event_type", 1).over(w).as("prev"))
          .filter(col("prev").isNotNull)
          .groupBy(col("prev"), col("event_type").as("cur"))
          .agg(count(lit(1)).as("n"))
          .select(col("prev"), col("cur"), col("n"),
            SafeOps.stableRound4(col("n").cast("double") /
              sum("n").over(byPrev).cast("double")).as("p"))
          .orderBy("prev", "cur")
      },
      Some("""WITH tr AS (
             |  SELECT lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev,
             |    event_type AS cur
             |  FROM events),
             |c AS (
             |  SELECT prev, cur, CAST(count(*) AS BIGINT) AS n
             |  FROM tr WHERE prev IS NOT NULL GROUP BY prev, cur)
             |SELECT prev, cur, n,
             |  floor((CAST(n AS DOUBLE) /
             |    CAST(sum(n) OVER (PARTITION BY prev) AS DOUBLE))
             |    * 10000.0 + 0.5) / 10000.0 AS p
             |FROM c ORDER BY prev, cur""".stripMargin)),

    // Rolling 7-day distinct users — COUNT(DISTINCT) isn't a window
    // function in any engine, so the exact form uses the
    // explode-to-windows trick: dedup to (day, user) pairs first (the
    // big reduction), then each pair fans out to the <=7 window-end
    // days it contributes to, and a plain distinct count lands per day.
    // Scale: the fan-out multiplies the ALREADY-DEDUPED day grain, not
    // the event stream; the sketch alternative (hll_sketch_agg per day
    // + rolling union) trades exactness for a constant-size state.
    GraftQuery(
      "qB6_rolling_distinct",
      "Exact trailing-7-day distinct active users per day: dedup to " +
        "(day, user), explode each pair to its covered window ends, " +
        "one distinct count per day.",
      (s, d) => {
        val pairs = t(s, d, "events")
          .select(to_date(col("ts")).as("day"), col("user_id"))
          .distinct()
        pairs
          .select(explode(sequence(col("day"),
            date_add(col("day"), 6))).as("win_day"), col("user_id"))
          .groupBy("win_day")
          .agg(countDistinct(col("user_id")).as("active_7d"))
          // clip partial windows past the data's edge
          .join(broadcast(pairs.agg(max("day").as("max_day"))),
            col("win_day") <= col("max_day"))
          .select(col("win_day"), col("active_7d"))
          .orderBy("win_day")
      },
      Some("""WITH p AS (
             |  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE)
             |      AS day, user_id
             |  FROM events),
             |x AS (
             |  SELECT CAST(unnest(generate_series(day,
             |      day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE)
             |      AS win_day,
             |    user_id
             |  FROM p),
             |m AS (SELECT max(day) AS max_day FROM p)
             |SELECT win_day,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS active_7d
             |FROM x, m WHERE win_day <= max_day
             |GROUP BY win_day ORDER BY win_day""".stripMargin)),

    // The reference's before/after A/B validation convention
    // (entry07_platform_decile_downloads_dedup_daily_{before,after}.sql:
    // same body, pinned date windows + site regexes, deployed side by
    // side) plus the diff query a platform operator runs over the pair.
    // Here: one templated rollup, two pinned variants via
    // ViewRegistry.pinnedVariants, full-outer diff of their outputs.
    GraftQuery(
      "qB8_ab_variant_diff",
      "Before/after paired view variants (pinned date window + priority " +
        "regex) deployed from one template, then diffed per order " +
        "status: counts and 2-dp totals side by side.",
      (s, d) => {
        import graft.catalog.{ViewDef, ViewRegistry}
        t(s, d, "orders").createOrReplaceTempView("ba_orders")
        val reg = new ViewRegistry(s)
        val base = ViewDef("ba_rollup",
          """SELECT o_orderstatus AS grp,
            |  CAST(count(*) AS BIGINT) AS n,
            |  floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS total
            |FROM ba_orders
            |WHERE CAST(o_orderdate AS DATE)
            |    BETWEEN DATE '{{.Start}}' AND DATE '{{.End}}'
            |  AND o_orderpriority RLIKE '{{.PrioRegex}}'
            |GROUP BY o_orderstatus""".stripMargin)
        val variants = reg.pinnedVariants(base, Seq(
          "before" -> Map("Start" -> "1995-01-01", "End" -> "1995-06-30",
            "PrioRegex" -> "^[1-3]-"),
          "after" -> Map("Start" -> "1995-07-01", "End" -> "1995-12-31",
            "PrioRegex" -> "^[1-5]-")))
        reg.deployAll(variants)
        s.sql(
          """SELECT coalesce(b.grp, a.grp) AS grp,
            |  CAST(coalesce(b.n, 0) AS BIGINT) AS n_before,
            |  CAST(coalesce(a.n, 0) AS BIGINT) AS n_after,
            |  coalesce(b.total, CAST(0 AS DOUBLE)) AS total_before,
            |  coalesce(a.total, CAST(0 AS DOUBLE)) AS total_after
            |FROM ba_rollup_before b
            |FULL OUTER JOIN ba_rollup_after a ON b.grp = a.grp
            |ORDER BY grp""".stripMargin)
      },
      Some("""WITH b AS (
             |  SELECT o_orderstatus AS grp, count(*) AS n,
             |    floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS total
             |  FROM orders
             |  WHERE CAST(o_orderdate AS DATE)
             |      BETWEEN DATE '1995-01-01' AND DATE '1995-06-30'
             |    AND regexp_matches(o_orderpriority, '^[1-3]-')
             |  GROUP BY o_orderstatus),
             |a AS (
             |  SELECT o_orderstatus AS grp, count(*) AS n,
             |    floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS total
             |  FROM orders
             |  WHERE CAST(o_orderdate AS DATE)
             |      BETWEEN DATE '1995-07-01' AND DATE '1995-12-31'
             |    AND regexp_matches(o_orderpriority, '^[1-5]-')
             |  GROUP BY o_orderstatus)
             |SELECT coalesce(b.grp, a.grp) AS grp,
             |  CAST(coalesce(b.n, 0) AS BIGINT) AS n_before,
             |  CAST(coalesce(a.n, 0) AS BIGINT) AS n_after,
             |  coalesce(b.total, CAST(0 AS DOUBLE)) AS total_before,
             |  coalesce(a.total, CAST(0 AS DOUBLE)) AS total_after
             |FROM b FULL OUTER JOIN a ON b.grp = a.grp
             |ORDER BY grp""".stripMargin)),

    // Vocabulary-growth (Heaps' law) curve over 3-gram shingles — the
    // corpus-sizing signal: how many distinct n-grams a 10%/20%/.../100%
    // deterministic sample of the corpus contains. Each gram reduces to
    // its FIRST-occurrence decile (min over a salted doc hash) — one
    // gram-key groupBy — and the curve is a running sum over the 10-row
    // decile histogram. Sub-linear growth = novelty saturating (more
    // data mostly repeats); near-linear = still discovering (more data
    // keeps paying).
    GraftQuery(
      "qC2_vocab_growth",
      "Heaps-law novelty curve: distinct 3-gram shingles in " +
        "deterministic 10%-step corpus prefixes (per-gram min " +
        "first-occurrence decile, running-summed).",
      (s, d) => {
        val docs = t(s, d, "documents")
        GraftFunctions.registerAll(s)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy("decile")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        docs
          .select(pmod(graft.functions.TextOps.hash32(
              concat(lit("vg:"), col("doc_id").cast("string"))), lit(10))
              .as("decile"),
            explode(graft.functions.GraftFunctions.wordNgrams(
              col("text"), 3)).as("g"))
          .groupBy("g").agg(min(col("decile")).as("first_decile"))
          .groupBy(col("first_decile").as("decile"))
          .agg(count(lit(1)).as("new_grams"))
          .select(col("decile"), col("new_grams"),
            sum("new_grams").over(w).as("vocab_size"))
          .orderBy("decile")
      },
      Some("""WITH g AS (
             |  SELECT ('0x' || substr(md5('vg:' ||
             |      CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 10 AS decile,
             |    unnest(list_transform(
             |      range(1, len(string_split(text,' ')) - 1),
             |      i -> string_split(text,' ')[i] || ' ' ||
             |           string_split(text,' ')[i+1] || ' ' ||
             |           string_split(text,' ')[i+2])) AS gram
             |  FROM documents
             |  WHERE len(string_split(text,' ')) >= 3),
             |fd AS (
             |  SELECT gram, min(decile) AS first_decile FROM g
             |  GROUP BY gram),
             |h AS (
             |  SELECT first_decile AS decile,
             |    CAST(count(*) AS BIGINT) AS new_grams
             |  FROM fd GROUP BY first_decile)
             |SELECT decile, new_grams,
             |  CAST(sum(new_grams) OVER (ORDER BY decile
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
             |FROM h ORDER BY decile""".stripMargin)),

    // Leakage-free evaluation split: per user, train on the first 4/5 of
    // time-ordered events, eval on the rest. A hash split (q59) would
    // leak a training user's FUTURE events into eval; the temporal split
    // is what honest per-user forecasting/evaluation needs. Integer
    // boundary arithmetic — no FP ceil edge between engines.
    GraftQuery(
      "qC3_temporal_split",
      "Per-user temporal 80/20 train/eval split of the event stream " +
        "(rank*den <= num*count integer boundary, (ts, id) tie-break).",
      (s, d) => Sampling.temporalSplit(
        t(s, d, "events"), "user_id", "ts", "event_id", num = 4, den = 5)
        .select(col("user_id"), col("event_id"), col("split"))
        .orderBy("user_id", "event_id"),
      Some("""SELECT user_id, event_id,
             |  CASE WHEN rn * 5 <= n * 4 THEN 'train' ELSE 'eval' END
             |    AS split
             |FROM (
             |  SELECT user_id, event_id,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS rn,
             |    count(*) OVER (PARTITION BY user_id) AS n
             |  FROM events)
             |ORDER BY user_id, event_id""".stripMargin)),

    // Round-5 flagship chain: model-based quality gate -> sequence
    // packing. The gate is the trained linear classifier (qB9), packing
    // the two-phase prefix sum (q72) — each stage individually
    // oracle-checked; this runs them end-to-end the way a curated
    // corpus build would.
    GraftQuery(
      "qC4_gated_pack",
      "Curated-corpus assembly: keep docs the linear quality model " +
        "accepts (logit >= 0), pack the survivors' token stream at " +
        "context 256, summarize per pack.",
      (s, d) => {
        val docs = t(s, d, "documents")
        GraftFunctions.registerAll(s)
        val kept = graft.operators.TextAnalysis.linearGate(
          docs, "doc_id", "text",
          bias = -0.5, wLogTokens = 0.35, wAvgTokenLen = -0.1,
          wPunct = -2.0, wStop = 1.5, wRep = -1.2)
          .filter(col("keep")).select("doc_id")
        val gated = docs.join(kept.hint("shuffle_hash"),
          Seq("doc_id"), "left_semi")
        graft.operators.Pack.packSequences(gated, "doc_id",
          size(graft.functions.TextOps.tokens(col("text"))),
          contextLen = 256, blockLen = 100)
          .groupBy("pack_id")
          .agg(count(lit(1)).as("n_docs"),
            sum("seg_tokens").as("n_tokens"))
          .orderBy("pack_id")
      },
      Some(s"""WITH m AS (
              |  SELECT doc_id, text, length(text) AS n_chars,
              |    len(string_split(text,' ')) AS n_tokens,
              |    len(list_distinct(string_split(text,' ')))
              |      AS n_distinct,
              |    len(list_filter(string_split(text,' '),
              |      t -> $allStopwordsSql)) AS stop_hits,
              |    length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
              |      AS punct_chars
              |  FROM documents),
              |f AS (
              |  SELECT doc_id, text, n_tokens,
              |    floor(CAST(n_chars - (n_tokens - 1) AS DOUBLE)
              |      / n_tokens * 10000 + 0.5) / 10000 AS avg_token_len,
              |    floor(CAST(punct_chars AS DOUBLE) / n_chars
              |      * 10000 + 0.5) / 10000 AS punct_ratio,
              |    floor(CAST(stop_hits AS DOUBLE) / n_tokens
              |      * 10000 + 0.5) / 10000 AS stop_ratio,
              |    floor(CAST(n_tokens - n_distinct AS DOUBLE) / n_tokens
              |      * 10000 + 0.5) / 10000 AS rep_ratio
              |  FROM m),
              |keep AS (
              |  SELECT doc_id, text FROM f
              |  WHERE floor((-0.5 + 0.35 * ln(CAST(n_tokens AS DOUBLE) + 1)
              |    - 0.1 * avg_token_len - 2.0 * punct_ratio
              |    + 1.5 * stop_ratio - 1.2 * rep_ratio)
              |    * 10000 + 0.5) / 10000 >= 0),
              |tk AS (
              |  SELECT doc_id, len(string_split(text,' ')) AS ntok
              |  FROM keep),
              |c AS (
              |  SELECT doc_id, ntok,
              |    CAST(coalesce(sum(ntok) OVER (ORDER BY doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              |      AS BIGINT) AS strt
              |  FROM tk WHERE ntok > 0),
              |seg AS (
              |  SELECT doc_id, ntok, strt,
              |    unnest(range(strt // 256, (strt + ntok - 1) // 256 + 1))
              |      AS pack_id
              |  FROM c)
              |SELECT pack_id, CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(least(strt+ntok, (pack_id+1)*256)
              |    - greatest(strt, pack_id*256)) AS BIGINT) AS n_tokens
              |FROM seg GROUP BY pack_id ORDER BY pack_id""".stripMargin)),

    // Bucketized point-in-interval join: the IP-range → annotation
    // shape (annotation-service address-range lookups). A raw range
    // predicate would plan a nested-loop; the operator quantizes the
    // domain (W=256), explodes each interval to its 1–4 buckets,
    // hash-joins on the bucket id, and residual-checks the range.
    // The oracle is the PLAIN range join — bucketization must be
    // invisible in the result.
    GraftQuery(
      "qE0_interval_annotate",
      "Orders annotated by containing supplier key-range via the " +
        "bucketized interval join (W=256) — result equal to the " +
        "nested-loop range join it replaces.",
      (s, d) => {
        val iv = t(s, d, "supplier").select(
          col("s_suppkey").cast("long").as("range_id"),
          (col("s_suppkey").cast("long") * 550L).as("lo"),
          (col("s_suppkey").cast("long") * 550L + 50L +
            (col("s_suppkey").cast("long") % 7L) * 120L).as("hi"))
        val pts = t(s, d, "orders")
          .select(col("o_orderkey").cast("long").as("okey"),
            col("o_totalprice"))
        graft.operators.IntervalJoin.pointInInterval(
            pts, "okey", iv, "lo", "hi", bucketWidth = 256L)
          .groupBy("range_id")
          .agg(count(lit(1)).as("cnt"),
            min("okey").as("min_key"), max("okey").as("max_key"),
            SafeOps.stableRound4(sum("o_totalprice")).as("sum_price"))
          .orderBy("range_id")
      },
      Some("""WITH iv AS (
             |  SELECT CAST(s_suppkey AS BIGINT) AS range_id,
             |    CAST(s_suppkey AS BIGINT) * 550 AS lo,
             |    CAST(s_suppkey AS BIGINT) * 550 + 50 +
             |      (CAST(s_suppkey AS BIGINT) % 7) * 120 AS hi
             |  FROM supplier)
             |SELECT range_id, CAST(count(*) AS BIGINT) AS cnt,
             |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
             |  CAST(max(o_orderkey) AS BIGINT) AS max_key,
             |  floor(sum(o_totalprice) * 10000.0 + 0.5) / 10000.0
             |    AS sum_price
             |FROM orders JOIN iv
             |  ON o_orderkey >= lo AND o_orderkey <= hi
             |GROUP BY range_id ORDER BY range_id""".stripMargin)),

    // Interval × interval overlap via the owner-bucket trick: each
    // overlapping pair is emitted from exactly one shared bucket
    // (max of the two lo-buckets), so no distinct() pass over the
    // output. Oracle: the plain quadratic overlap join.
    GraftQuery(
      "qE2_interval_overlap",
      "Supplier key-ranges overlap-joined against customer key-ranges " +
        "through the bucketized interval-overlap join (W=512, " +
        "owner-bucket dedup) — equal to the plain range-overlap join.",
      (s, d) => {
        val sup = t(s, d, "supplier").select(
          col("s_suppkey").cast("long").as("range_id"),
          (col("s_suppkey").cast("long") * 550L).as("lo"),
          (col("s_suppkey").cast("long") * 550L + 50L +
            (col("s_suppkey").cast("long") % 7L) * 120L).as("hi"))
        val cust = t(s, d, "customer").select(
          col("c_custkey").cast("long").as("cust_id"),
          (col("c_custkey").cast("long") * 37L).as("clo"),
          (col("c_custkey").cast("long") * 37L + 20L +
            (col("c_custkey").cast("long") % 5L) * 30L).as("chi"))
        graft.operators.IntervalJoin.intervalOverlap(
            sup, "lo", "hi", cust, "clo", "chi", bucketWidth = 512L)
          .groupBy("range_id")
          .agg(count(lit(1)).as("n_overlaps"),
            min("cust_id").as("min_cust"),
            max("cust_id").as("max_cust"))
          .orderBy("range_id")
      },
      Some("""WITH sup AS (
             |  SELECT CAST(s_suppkey AS BIGINT) AS range_id,
             |    CAST(s_suppkey AS BIGINT) * 550 AS lo,
             |    CAST(s_suppkey AS BIGINT) * 550 + 50 +
             |      (CAST(s_suppkey AS BIGINT) % 7) * 120 AS hi
             |  FROM supplier),
             |cust AS (
             |  SELECT CAST(c_custkey AS BIGINT) AS cust_id,
             |    CAST(c_custkey AS BIGINT) * 37 AS clo,
             |    CAST(c_custkey AS BIGINT) * 37 + 20 +
             |      (CAST(c_custkey AS BIGINT) % 5) * 30 AS chi
             |  FROM customer),
             |ov AS (
             |  SELECT range_id, cust_id FROM sup JOIN cust
             |    ON lo <= chi AND clo <= hi)
             |SELECT range_id, CAST(count(*) AS BIGINT) AS n_overlaps,
             |  CAST(min(cust_id) AS BIGINT) AS min_cust,
             |  CAST(max(cust_id) AS BIGINT) AS max_cust
             |FROM ov GROUP BY range_id ORDER BY range_id""".stripMargin)),

    // Triangle counting over qA1's near-dup graph: degree-ordered edge
    // orientation (out-degree bounded by O(sqrt(|E|)) at any hub), so
    // wedges are out-neighbor pairs and each triangle closes exactly
    // once. The oracle counts the same triangles with the plain
    // x<y<z three-way join — different algorithm, identical counts.
    GraftQuery(
      "qE6_triangle_count",
      "Per-doc triangle counts over the 3-gram-Jaccard (t=0.5) " +
        "near-dup graph via degree-ordered wedge closing; isolated " +
        "docs report 0.",
      (s, d) => {
        val docs = t(s, d, "documents")
        val pairs = Dedup.ngramJaccardPrefixPairs(
          docs, "doc_id", "text", n = 3, threshold = 0.5)
        Graph.triangleCount(docs, "doc_id", pairs, "doc_a", "doc_b")
          .withColumnRenamed("node", "doc_id")
          .orderBy("doc_id")
      },
      Some(s"""WITH $duckShingleSets,
              |pr AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |    len(list_intersect(a.sh, b.sh)) AS common,
              |    len(a.sh) AS sa, len(b.sh) AS sb
              |  FROM sets a JOIN sets b ON a.doc_id < b.doc_id),
              |und AS (
              |  SELECT doc_a AS u, doc_b AS v FROM pr
              |  WHERE CAST(common AS DOUBLE)/(sa+sb-common) >= 0.5),
              |tr AS (
              |  SELECT e1.u AS x, e1.v AS y, e2.v AS z
              |  FROM und e1
              |  JOIN und e2 ON e2.u = e1.u AND e2.v > e1.v
              |  JOIN und e3 ON e3.u = e1.v AND e3.v = e2.v),
              |pn AS (SELECT unnest([x, y, z]) AS node FROM tr),
              |cnt AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri
              |  FROM pn GROUP BY node)
              |SELECT d.doc_id,
              |  CAST(coalesce(cnt.n_tri, 0) AS BIGINT) AS n_tri
              |FROM documents d LEFT JOIN cnt ON cnt.node = d.doc_id
              |ORDER BY d.doc_id""".stripMargin))
  )
}
