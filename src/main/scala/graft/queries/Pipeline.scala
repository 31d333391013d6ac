package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.{GraftFunctions, TextOps}
import graft.operators.{BloomScreen, Chunk, Dedup, Funnel, Order, Pack,
  Sampling, Similarity, TextAnalysis, VecAgg}

/** Training-pipeline assembly + analytics operators (round 4): sequence
  * packing, stratified sampling + upsampling, incremental dedup,
  * vocabulary encoding + surprisal, embedding pooling / quantization,
  * snapshot merge, k-means refinement, chunking, dup-span stats +
  * cutting, global shuffle order, Bloom screening, text normalization,
  * bin packing, SQL-kernel surface, TF-IDF, funnel, cohort retention,
  * and the corpus-build flagship chain (q86).
  *
  * Same oracle-parity conventions as LlmOps (stable floor-rounding on
  * float outputs, identical aliases both sides, DuckDB lambdas 1-indexed).
  */
object Pipeline {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // qC0/qC6's shared power-iteration chain: element rows -> 1e-6-rounded
  // mean + covariance -> three unrolled iterations with 1e-9 per-iterate
  // rounding (mirrors Pca.topComponent bit for bit).
  private val duckPcaV3 =
    """e AS (
      |  SELECT vec_id, u.i - 1 AS i, CAST(u.x AS DOUBLE) AS x
      |  FROM (SELECT vec_id, unnest(list_transform(embedding,
      |      (x, i) -> {'x': x, 'i': i})) AS u
      |    FROM embeddings)),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
      |m AS (
      |  SELECT i, floor(sum(x) / (SELECT n FROM n)
      |    * 1000000 + 0.5) / 1000000 AS mi
      |  FROM e GROUP BY i),
      |cov AS (
      |  SELECT a.i AS i, b.i AS j,
      |    floor((sum(a.x * b.x) / (SELECT n FROM n)
      |      - ma.mi * mb.mi) * 1000000 + 0.5) / 1000000 AS c
      |  FROM e a JOIN e b ON a.vec_id = b.vec_id
      |  JOIN m ma ON ma.i = a.i JOIN m mb ON mb.i = b.i
      |  GROUP BY a.i, b.i, ma.mi, mb.mi),
      |v0 AS (SELECT i, 0.125 AS vj FROM m),
      |w1 AS (SELECT c.i AS i, sum(c.c * v0.vj) AS w
      |  FROM cov c JOIN v0 ON c.j = v0.i GROUP BY c.i),
      |v1 AS (SELECT i, floor(w / sqrt((SELECT sum(w * w) FROM w1))
      |  * 1000000000 + 0.5) / 1000000000 AS vj FROM w1),
      |w2 AS (SELECT c.i AS i, sum(c.c * v1.vj) AS w
      |  FROM cov c JOIN v1 ON c.j = v1.i GROUP BY c.i),
      |v2 AS (SELECT i, floor(w / sqrt((SELECT sum(w * w) FROM w2))
      |  * 1000000000 + 0.5) / 1000000000 AS vj FROM w2),
      |w3 AS (SELECT c.i AS i, sum(c.c * v2.vj) AS w
      |  FROM cov c JOIN v2 ON c.j = v2.i GROUP BY c.i),
      |v3 AS (SELECT i, floor(w / sqrt((SELECT sum(w * w) FROM w3))
      |  * 1000000000 + 0.5) / 1000000000 AS vj FROM w3)""".stripMargin

  private val duckVecNorm =
    """v AS (SELECT vec_id,
      |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, v,
      |  sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM v)""".stripMargin

  // q32's signature/band construction, shared by the incremental oracle.
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

  private val duckBandRows =
    """sigs AS (
      |  SELECT doc_id, sh,
      |    list_transform(range(0,32), j ->
      |      list_min(list_transform(sh, h ->
      |        (h*(2*j+1) + (j*j*31+7)) % 2147483647))) AS sig
      |  FROM sets),
      |bandrows AS (
      |  SELECT doc_id, sh, CAST(b.range AS INT) AS band_idx,
      |    array_to_string(list_transform(
      |      sig[b.range*4+1 : b.range*4+4],
      |      x -> CAST(x AS VARCHAR)), '-') AS band_key
      |  FROM sigs, range(0,8) b)""".stripMargin

  val all: Seq[GraftQuery] = Seq(

    // Packing: concatenate all docs' tokens in id order, split every 512.
    // The Spark side is the two-phase distributed prefix sum (no
    // unpartitioned window over the corpus); the oracle is the naive
    // global running sum — same arithmetic, different execution shape.
    GraftQuery(
      "q72_pack_sequences",
      "Sequence packing at context 512 via two-phase distributed prefix " +
        "sum (block totals -> broadcast offsets -> per-block windows); " +
        "one row per doc x pack overlap.",
      (s, d) => Pack.packSequences(
        t(s, d, "documents"), "doc_id",
        size(TextOps.tokens(col("text"))), contextLen = 512, blockLen = 100)
        .orderBy("doc_id", "pack_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, len(string_split(text,' ')) AS ntok
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, ntok,
             |    CAST(coalesce(sum(ntok) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS strt
             |  FROM tk WHERE ntok > 0),
             |seg AS (
             |  SELECT doc_id, ntok, strt,
             |    unnest(range(strt // 512, (strt + ntok - 1) // 512 + 1))
             |      AS pack_id
             |  FROM c)
             |SELECT doc_id, pack_id,
             |  greatest(strt, pack_id*512) - pack_id*512 AS seg_start,
             |  least(strt+ntok, (pack_id+1)*512) - greatest(strt, pack_id*512)
             |    AS seg_tokens
             |FROM seg ORDER BY doc_id, pack_id""".stripMargin)),

    // Deterministic data mixing: per-stratum keep-rates decided by a
    // salted portable hash, reproducible across engines/runs/repartitions.
    GraftQuery(
      "q73_stratified_sample",
      "Stratified deterministic sampling: keep 35% of en, 80% of zh, " +
        "60% otherwise, by salted md5 hash — pure scan-speed filter.",
      (s, d) => Sampling.stratified(
        t(s, d, "documents"), "doc_id", "lang",
        rates = Map("en" -> 0.35, "zh" -> 0.8), defaultRate = 0.6)
        .select(col("doc_id"), col("lang"), col("bucket"))
        .orderBy("doc_id"),
      Some("""WITH h AS (
             |  SELECT doc_id, lang,
             |    ('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)),1,8))::BIGINT
             |      % 10000 AS bucket
             |  FROM documents)
             |SELECT doc_id, lang, bucket FROM h
             |WHERE bucket < CAST(floor(
             |  CASE lang WHEN 'en' THEN 0.35 WHEN 'zh' THEN 0.8
             |    ELSE 0.6 END * 10000.0 + 0.5) AS BIGINT)
             |ORDER BY doc_id""".stripMargin)),

    // Incremental dedup: today's batch (doc_id % 10 = 0) screened against
    // the standing corpus — new->old band joins only, never corpus x
    // corpus.
    GraftQuery(
      "q74_incremental_dedup",
      "Incremental MinHash-LSH dedup: new batch vs existing corpus via " +
        "asymmetric band-bucket join (256-cap on band buckets); per " +
        "new doc the smallest matching old id at jaccard >= 0.5.",
      // maxBucket=256: same hot-bucket guard (and same oracle-replayed
      // exclusion) as q32 — the round-12 ov probe melted the uncapped
      // band join at exp 2.0/decade; no sf0.01 bucket reaches the cap
      (s, d) => Dedup.minhashLshIncremental(
        t(s, d, "documents"), "doc_id", "text",
        isNew = col("doc_id") % 10 === 0,
        shingleN = 3, bands = 8, rowsPerBand = 4, threshold = 0.5,
        maxBucket = 256)
        .orderBy("doc_id"),
      Some(s"""WITH $duckShingleSets,
              |$duckBandRows,
              |hot AS (
              |  SELECT band_idx, band_key FROM bandrows
              |  GROUP BY band_idx, band_key HAVING count(*) > 256),
              |prunedb AS (
              |  SELECT b.* FROM bandrows b ANTI JOIN hot h
              |    ON b.band_idx = h.band_idx AND b.band_key = h.band_key),
              |newb AS (SELECT * FROM prunedb WHERE doc_id % 10 = 0),
              |oldb AS (SELECT * FROM prunedb WHERE doc_id % 10 != 0),
              |cand AS (
              |  SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS old_id,
              |    x.sh AS sha, y.sh AS shb
              |  FROM newb x JOIN oldb y
              |    ON x.band_idx = y.band_idx AND x.band_key = y.band_key),
              |m AS (
              |  SELECT doc_id, min(old_id) AS dup_of,
              |    count(*) AS n_matches
              |  FROM cand
              |  WHERE CAST(len(list_intersect(sha, shb)) AS DOUBLE) /
              |    (len(sha)+len(shb)-len(list_intersect(sha, shb))) >= 0.5
              |  GROUP BY doc_id)
              |SELECT d.doc_id, m.dup_of,
              |  CAST(coalesce(m.n_matches, 0) AS BIGINT) AS n_matches,
              |  m.dup_of IS NOT NULL AS is_dup
              |FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
              |WHERE d.doc_id % 10 = 0 ORDER BY d.doc_id""".stripMargin)),

    // Vocabulary encoding: ids against the corpus top-100 vocab. The
    // vocab is a bounded driver collect (like the IVF codebook); encoding
    // itself is the zero-shuffle vocab_encode kernel — the explode->join->
    // regroup alternative shuffles the full token stream twice.
    GraftQuery(
      "q75_token_ids",
      "Token-id encoding against the corpus top-100 vocabulary " +
        "(id = frequency rank, OOV = 0) via the codegen'd vocab_encode " +
        "kernel — per-row projection, no token-stream shuffle.",
      (s, d) => {
        val docs = t(s, d, "documents")
        // same shared vocab derivation as q84/q60 (one token-stream pass)
        val vocab = TextAnalysis
          .topVocab(TextAnalysis.tokenFreq(docs, "text"), 100).map(_._1)
        GraftFunctions.registerAll(s)
        docs.select(col("doc_id"),
          GraftFunctions.vocabEncode(TextOps.tokens(col("text")), vocab)
            .as("ids"))
          .select(col("doc_id"),
            array_join(transform(col("ids"), _.cast("string")), ",")
              .as("ids_str"),
            size(col("ids")).cast("long").as("n_tokens"),
            size(filter(col("ids"), _ === 0)).cast("long").as("n_oov"))
          .orderBy("doc_id")
      },
      Some("""WITH tf AS (
             |  SELECT tok, count(*) AS cnt FROM (
             |    SELECT unnest(string_split(text,' ')) AS tok
             |    FROM documents)
             |  WHERE tok != '' GROUP BY tok),
             |vocab AS (
             |  SELECT tok,
             |    CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS INT)
             |      AS id
             |  FROM tf ORDER BY cnt DESC, tok LIMIT 100),
             |pt AS (
             |  SELECT doc_id,
             |    unnest(list_transform(string_split(text,' '),
             |      (x,i) -> {'tok': x, 'pos': i})) AS u
             |  FROM documents),
             |m AS (
             |  SELECT pt.doc_id, pt.u.pos AS pos,
             |    coalesce(v.id, 0) AS id
             |  FROM pt LEFT JOIN vocab v ON pt.u.tok = v.tok)
             |SELECT doc_id,
             |  string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos) AS ids_str,
             |  CAST(count(*) AS BIGINT) AS n_tokens,
             |  CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_oov
             |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Mean pooling per cluster over NORMALIZED vectors — the VecAgg
    // Aggregator ships O(clusters) buffers, not dim x corpus rows.
    GraftQuery(
      "q76_embedding_pool",
      "Per-cluster mean pooling of normalized embeddings via the VecAgg " +
        "partial-aggregated buffer UDAF (vec_id % 16 clusters).",
      (s, d) => {
        GraftFunctions.registerAll(s)
        val base = t(s, d, "embeddings").select(
          (col("vec_id") % 16).as("cluster"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        val u = base.withColumn("nrm",
          sqrt(GraftFunctions.vecDot(col("v"), col("v"))))
          .select(col("cluster"),
            transform(col("v"), x => x / col("nrm")).as("u"))
        VecAgg.meanPool(u, "cluster", "u", 64)
          .select(col("cluster"),
            posexplode(col("centroid")).as(Seq("dim", "x")),
            col("n_members"))
          .select(col("cluster"), col("dim"),
            (floor(col("x") * 10000.0 + 0.5) / 10000.0).as("c"),
            col("n_members"))
          .orderBy("cluster", "dim")
      },
      Some(s"""WITH $duckVecNorm,
              |u AS (SELECT vec_id % 16 AS cluster,
              |  list_transform(v, x -> x/nrm) AS u FROM n),
              |pe AS (SELECT cluster,
              |  unnest(list_transform(u, (x,i) -> {'d': i, 'x': x})) AS s
              |  FROM u)
              |SELECT cluster, CAST(s.d - 1 AS INT) AS dim,
              |  floor(avg(s.x) * 10000.0 + 0.5) / 10000.0 AS c,
              |  CAST(count(*) AS BIGINT) AS n_members
              |FROM pe GROUP BY cluster, s.d ORDER BY cluster, dim""".stripMargin)),

    // Snapshot merge (SCD-latest upsert): base corpus + delta batch,
    // keep the highest-version row per key — one partial-aggregated
    // max_by shuffle, no window sort of the corpus.
    GraftQuery(
      "q77_snapshot_merge",
      "Snapshot upsert merge: base (v1) + delta (v2, doc_id % 7 = 0) -> " +
        "latest row per key via max_by aggregation (no window sort).",
      (s, d) => {
        val docs = t(s, d, "documents")
        val base = docs.select(col("doc_id"), col("text"), col("lang"),
          col("source"), lit(1L).as("version"))
        val delta = docs.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"),
            concat(col("text"), lit(" updated")).as("text"), col("lang"),
            lit("delta").as("source"), lit(2L).as("version"))
        base.unionByName(delta).groupBy("doc_id")
          .agg(max("version").as("version"),
            max_by(col("source"), col("version")).as("source"),
            max_by(md5(col("text")), col("version")).as("text_hash"))
          .orderBy("doc_id")
      },
      Some("""WITH base AS (
             |  SELECT doc_id, text, lang, source,
             |    CAST(1 AS BIGINT) AS version FROM documents),
             |delta AS (
             |  SELECT doc_id, text || ' updated' AS text, lang,
             |    'delta' AS source, CAST(2 AS BIGINT) AS version
             |  FROM documents WHERE doc_id % 7 = 0),
             |u AS (SELECT * FROM base UNION ALL SELECT * FROM delta)
             |SELECT doc_id, max(version) AS version,
             |  arg_max(source, version) AS source,
             |  arg_max(md5(text), version) AS text_hash
             |FROM u GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // One Lloyd step of IVF codebook training: per-row argmin assignment
    // (zero shuffles) + per-cell mean via VecAgg (O(cells) shuffle).
    GraftQuery(
      "q78_kmeans_step",
      "K-means refinement step over the every-73rd-id codebook: argmin " +
        "cell assignment (kernel) then per-cell member mean (VecAgg).",
      (s, d) => Similarity.kmeansStep(
        t(s, d, "embeddings"), "vec_id", "embedding",
        centroidEvery = graft.operators.Similarity.adaptiveEvery(
          graft.Tables.rowCount(s, d, "embeddings")), dim = 64)
        .select(col("cell"),
          posexplode(col("centroid")).as(Seq("dim", "x")),
          col("n_members"))
        .select(col("cell"), col("dim"),
          (floor(col("x") * 10000.0 + 0.5) / 10000.0).as("c"),
          col("n_members"))
        .orderBy("cell", "dim"),
      Some(s"""WITH $duckVecNorm,
              |ce AS (SELECT greatest(73, CAST(ceil(count(*) / 512.0)
              |    AS BIGINT)) AS e FROM embeddings),
              |c AS (SELECT vec_id AS cid, v AS cv, nrm*nrm AS cn2
              |  FROM n WHERE vec_id % (SELECT e FROM ce) = 0),
              |a0 AS (
              |  SELECT n.vec_id, n.v, n.nrm, c.cid,
              |    (n.nrm*n.nrm - 2*list_sum(list_transform(range(1,65),
              |      i -> n.v[i]*c.cv[i])) + c.cn2) AS d2
              |  FROM n, c),
              |cells AS (SELECT vec_id, v, cid AS cell FROM (
              |  SELECT *, row_number() OVER (PARTITION BY vec_id
              |    ORDER BY d2, cid) AS rn FROM a0) WHERE rn = 1),
              |pe AS (SELECT cell,
              |  unnest(list_transform(v, (x,i) -> {'d': i, 'x': x})) AS s
              |  FROM cells)
              |SELECT cell, CAST(s.d - 1 AS INT) AS dim,
              |  floor(avg(s.x) * 10000.0 + 0.5) / 10000.0 AS c,
              |  CAST(count(*) AS BIGINT) AS n_members
              |FROM pe GROUP BY cell, s.d ORDER BY cell, dim""".stripMargin)),

    // Full Lloyd loop (2 rounds): round-1 means are fixed-pointed to
    // 1e-9, re-embedded as the round-2 codebook, and the corpus
    // re-assigns against them — the oracle unrolls both rounds with the
    // same rounding so every distance comparison runs on bit-identical
    // inputs (the qA1 PageRank convention).
    GraftQuery(
      "qA8_kmeans_train",
      "2-iteration k-means training over the every-73rd-id seed " +
        "codebook: argmin assign -> cell means -> re-embed (1e-9 " +
        "fixed-point) -> re-assign; two narrow passes per round.",
      (s, d) => Similarity.kmeansTrain(
        t(s, d, "embeddings"), "vec_id", "embedding",
        centroidEvery = graft.operators.Similarity.adaptiveEvery(
          graft.Tables.rowCount(s, d, "embeddings")), dim = 64, iterations = 2)
        .select(col("cell"),
          posexplode(col("centroid")).as(Seq("dim", "x")),
          col("n_members"))
        .select(col("cell"), col("dim"),
          (floor(col("x") * 10000.0 + 0.5) / 10000.0).as("c"),
          col("n_members"))
        .orderBy("cell", "dim"),
      Some(s"""WITH $duckVecNorm,
              |ce AS (SELECT greatest(73, CAST(ceil(count(*) / 512.0)
              |    AS BIGINT)) AS e FROM embeddings),
              |c0 AS (SELECT vec_id AS cid, v AS cv, nrm*nrm AS cn2
              |  FROM n WHERE vec_id % (SELECT e FROM ce) = 0),
              |a0 AS (
              |  SELECT n.vec_id, n.v, n.nrm, c0.cid,
              |    (n.nrm*n.nrm - 2*list_sum(list_transform(range(1,65),
              |      i -> n.v[i]*c0.cv[i])) + c0.cn2) AS d2
              |  FROM n, c0),
              |cells1 AS (SELECT vec_id, v, nrm, cid AS cell FROM (
              |  SELECT *, row_number() OVER (PARTITION BY vec_id
              |    ORDER BY d2, cid) AS rn FROM a0) WHERE rn = 1),
              |pe1 AS (SELECT cell,
              |  unnest(list_transform(v, (x,i) -> {'d': i, 'x': x})) AS s
              |  FROM cells1),
              |m1 AS (SELECT cell, s.d AS d,
              |  floor(avg(s.x) * 1000000000.0 + 0.5) / 1000000000.0 AS x
              |  FROM pe1 GROUP BY cell, s.d),
              |c1 AS (SELECT cell AS cid, list(x ORDER BY d) AS cv
              |  FROM m1 GROUP BY cell),
              |c1n AS (SELECT cid, cv,
              |  list_sum(list_transform(cv, x -> x*x)) AS cn2 FROM c1),
              |a1 AS (
              |  SELECT n.vec_id, n.v, c1n.cid,
              |    (n.nrm*n.nrm - 2*list_sum(list_transform(range(1,65),
              |      i -> n.v[i]*c1n.cv[i])) + c1n.cn2) AS d2
              |  FROM n, c1n),
              |cells2 AS (SELECT vec_id, v, cid AS cell FROM (
              |  SELECT *, row_number() OVER (PARTITION BY vec_id
              |    ORDER BY d2, cid) AS rn FROM a1) WHERE rn = 1),
              |pe2 AS (SELECT cell,
              |  unnest(list_transform(v, (x,i) -> {'d': i, 'x': x})) AS s
              |  FROM cells2)
              |SELECT cell, CAST(s.d - 1 AS INT) AS dim,
              |  floor(avg(s.x) * 10000.0 + 0.5) / 10000.0 AS c,
              |  CAST(count(*) AS BIGINT) AS n_members
              |FROM pe2 GROUP BY cell, s.d ORDER BY cell, dim""".stripMargin)),

    // Sliding-window chunking (RAG/encoder prep): 32-token windows every
    // 24 tokens — a per-row flatMap at scan speed, zero shuffles.
    GraftQuery(
      "q79_chunk_sliding",
      "Sliding-window chunking: 32-token windows, stride 24, content-" +
        "hashed per chunk — pure per-row explode, no shuffle.",
      (s, d) => Chunk.slidingWindows(
        t(s, d, "documents"), "doc_id", "text", window = 32, stride = 24)
        .orderBy("doc_id", "chunk_idx"),
      Some("""WITH tk AS (
             |  SELECT doc_id, string_split(text,' ') AS toks
             |  FROM documents),
             |st AS (
             |  SELECT doc_id, toks,
             |    unnest(range(0, greatest(len(toks)-1, 0)+1, 24)) AS strt
             |  FROM tk),
             |w AS (SELECT doc_id, strt, toks[strt+1 : strt+32] AS w FROM st)
             |SELECT doc_id, CAST(strt // 24 AS BIGINT) AS chunk_idx,
             |  CAST(strt AS BIGINT) AS chunk_start,
             |  CAST(len(w) AS BIGINT) AS n_chunk_tokens,
             |  ('0x' || substr(md5(array_to_string(w,' ')),1,8))::BIGINT
             |    AS chunk_hash
             |FROM w ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Substring-level dedup signal: positional 5-grams occurring in >= 2
    // distinct docs; per-doc duplicated-coverage fraction.
    GraftQuery(
      "q80_dup_ngram_spans",
      "Exact duplicated-5-gram coverage per doc (Lee et al.-style " +
        "substring dedup signal): one gram-hash groupBy + same-key join " +
        "back, shuffle-pinned.",
      (s, d) => Dedup.dupNgramStats(
        t(s, d, "documents"), "doc_id", "text", n = 5, minDocs = 2)
        .orderBy("doc_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, string_split(text,' ') AS toks
             |  FROM documents),
             |e AS (
             |  SELECT doc_id, unnest(list_transform(range(0, len(toks)-4),
             |    i -> ('0x' || substr(md5(
             |      array_to_string(toks[i+1 : i+5],' ')),1,8))::BIGINT))
             |    AS g
             |  FROM tk),
             |fr AS (
             |  SELECT g FROM e GROUP BY g
             |  HAVING count(DISTINCT doc_id) >= 2),
             |per AS (
             |  SELECT e.doc_id, count(*) AS n_grams,
             |    sum(CASE WHEN fr.g IS NOT NULL THEN 1 ELSE 0 END) AS n_dup
             |  FROM e LEFT JOIN fr ON e.g = fr.g GROUP BY e.doc_id)
             |SELECT d.doc_id,
             |  CAST(coalesce(per.n_grams, 0) AS BIGINT) AS n_grams,
             |  CAST(coalesce(per.n_dup, 0) AS BIGINT) AS n_dup_grams,
             |  floor(CASE WHEN coalesce(per.n_grams, 0) = 0 THEN 0.0
             |    ELSE coalesce(per.n_dup, 0) * 1.0 / per.n_grams END
             |    * 10000.0 + 0.5) / 10000.0 AS dup_fraction
             |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // Deterministic global shuffle order via the two-phase rank (hash
    // range-bucketed blocks; only the |blocks| offsets frame is ever
    // single-partition). Oracle is the naive global row_number.
    GraftQuery(
      "q81_global_shuffle",
      "Deterministic training order: contiguous global position in " +
        "salted-hash order via block-bucketed two-phase ranking.",
      (s, d) => Order.globalIndex(
        t(s, d, "documents"), "doc_id", salt = "shuffle", nBlocks = 64)
        .orderBy("doc_id"),
      Some("""WITH h AS (
             |  SELECT doc_id,
             |    ('0x' || substr(md5('shuffle:' ||
             |      CAST(doc_id AS VARCHAR)),1,8))::BIGINT AS h
             |  FROM documents)
             |SELECT doc_id, h,
             |  CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT)
             |    AS pos
             |FROM h ORDER BY doc_id""".stripMargin)),

    // Mixture upsampling with replacement: en x2.5, zh x0.4, else x1.0 —
    // expected copies = weight, decided by deterministic hash draw.
    GraftQuery(
      "q82_upsample_mixture",
      "Epoch-weighted mixture upsampling (en x2.5, zh x0.4, default " +
        "x1.0): floor(w) copies + one more under the fractional hash " +
        "draw — per-row explode, reproducible.",
      (s, d) => Sampling.upsample(
        t(s, d, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang",
        weights = Map("en" -> 2.5, "zh" -> 0.4), defaultWeight = 1.0)
        .select(col("doc_id"), col("lang"), col("copy_idx"))
        .orderBy("doc_id", "copy_idx"),
      Some("""WITH w AS (
             |  SELECT doc_id, lang,
             |    CASE lang WHEN 'en' THEN 2.5 WHEN 'zh' THEN 0.4
             |      ELSE 1.0 END AS wt,
             |    ('0x' || substr(md5('mix:' ||
             |      CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 10000 AS draw
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, lang,
             |    CAST(floor(wt) AS BIGINT) +
             |      CASE WHEN draw < CAST(floor((wt - floor(wt)) * 10000.0
             |        + 0.5) AS BIGINT) THEN 1 ELSE 0 END AS n
             |  FROM w)
             |SELECT doc_id, lang,
             |  CAST(unnest(range(1, n+1)) AS BIGINT) AS copy_idx
             |FROM c WHERE n > 0 ORDER BY doc_id, copy_idx""".stripMargin)),

    // Apply side of q80: tokens covered by any duplicated 5-gram are cut;
    // the unique remainder is re-hashed. Corpus text never shuffles —
    // only gram hashes and position sets do.
    GraftQuery(
      "q83_cut_dup_spans",
      "Duplicated-span removal (ExactSubstr treatment): cut every token " +
        "covered by a 5-gram shared across docs; output the cleaned " +
        "remainder's hash and removal counts.",
      (s, d) => Dedup.cutDupSpans(
        t(s, d, "documents"), "doc_id", "text", n = 5, minDocs = 2)
        .orderBy("doc_id"),
      Some("""WITH tk AS (
             |  SELECT doc_id, string_split(text,' ') AS toks
             |  FROM documents),
             |e AS (
             |  SELECT doc_id, u.p AS p, u.g AS g FROM (
             |    SELECT doc_id, unnest(list_transform(range(0, len(toks)-4),
             |      i -> {'p': i, 'g': ('0x' || substr(md5(
             |        array_to_string(toks[i+1 : i+5],' ')),1,8))::BIGINT}))
             |      AS u
             |    FROM tk)),
             |fr AS (
             |  SELECT g FROM e GROUP BY g
             |  HAVING count(DISTINCT doc_id) >= 2),
             |cv AS (
             |  SELECT doc_id, c FROM (
             |    SELECT e.doc_id AS doc_id, unnest(range(e.p, e.p + 5)) AS c
             |    FROM e JOIN fr ON e.g = fr.g)
             |  GROUP BY doc_id, c),
             |covs AS (
             |  SELECT doc_id, count(*) AS n_removed, list(c) AS cov
             |  FROM cv GROUP BY doc_id)
             |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
             |  CAST(coalesce(covs.n_removed, 0) AS BIGINT) AS n_removed,
             |  ('0x' || substr(md5(coalesce(array_to_string(
             |    list_filter(t.toks, (x, i) -> NOT list_contains(
             |      coalesce(covs.cov, CAST([] AS BIGINT[])), i - 1)),
             |    ' '), '')),1,8))::BIGINT AS clean_hash
             |FROM tk t LEFT JOIN covs ON t.doc_id = covs.doc_id
             |ORDER BY t.doc_id""".stripMargin)),

    // Unigram surprisal scoring: -mean ln p(token) under the corpus
    // unigram LM (top-100 vocab, OOV smoothed to 1/total). The frequency
    // table rides in as a literal logprob array indexed by vocab_encode's
    // ids — scoring is a per-row projection, no token-stream shuffle.
    GraftQuery(
      "q84_unigram_surprisal",
      "Per-doc unigram surprisal (-mean ln p) under the corpus top-100 " +
        "unigram LM with 1/total OOV smoothing, via vocab_encode ids -> " +
        "broadcast logprob lookup.",
      (s, d) => {
        val docs = t(s, d, "documents")
        GraftFunctions.registerAll(s)
        // ONE token-stream pass (the fenced tf aggregate); the total and
        // the top-100 are then two tiny jobs over the |vocab|-row frame
        // instead of two more corpus scans
        val tf = graft.plans.Fence.corpus(
          TextAnalysis.tokenFreq(docs, "text"), "pipe_tf")
        val total = tf.agg(coalesce(sum("cnt"), lit(0L)))
          .collect()(0).getLong(0)
        val top = TextAnalysis.topVocab(tf, 100)
        val vocab = top.map(_._1)
        val lps = math.log(1.0 / total) +:
          top.map(t2 => math.log(t2._2.toDouble / total))
        docs.select(col("doc_id"),
          GraftFunctions.vocabEncode(TextOps.tokens(col("text")), vocab)
            .as("ids"))
          .select(col("doc_id"),
            size(col("ids")).cast("long").as("n_tokens"),
            (floor(-aggregate(
              transform(col("ids"),
                id => element_at(lit(lps.toArray), id + 1)),
              lit(0.0), (acc, x) => acc + x) / size(col("ids"))
              * 10000.0 + 0.5) / 10000.0).as("surprisal"))
          .orderBy("doc_id")
      },
      Some("""WITH alltok AS (
             |  SELECT doc_id, unnest(string_split(text,' ')) AS tok
             |  FROM documents),
             |tf AS (
             |  SELECT tok, count(*) AS cnt FROM alltok
             |  WHERE tok != '' GROUP BY tok),
             |tot AS (SELECT sum(cnt) AS total FROM tf),
             |vocab AS (
             |  SELECT tok, cnt FROM tf ORDER BY cnt DESC, tok LIMIT 100),
             |lp AS (
             |  SELECT a.doc_id,
             |    CASE WHEN v.tok IS NULL
             |      THEN ln(1.0 / (SELECT total FROM tot))
             |      ELSE ln(v.cnt * 1.0 / (SELECT total FROM tot)) END AS l
             |  FROM alltok a LEFT JOIN vocab v ON a.tok = v.tok)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |  floor((-avg(l)) * 10000.0 + 0.5) / 10000.0 AS surprisal
             |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Bigram LM surprisal with Stupid Backoff (Brants et al. 2007) —
    // the CCNet-style perplexity filter one rung up from q84's unigram:
    // S(w2|w1) = c(w1 w2)/c(w1) when the bigram is in the table, else
    // 0.4 * P(w2). The LM is two bounded driver artifacts (top-100
    // vocab + top-200 bigram table) riding into codegen as literals;
    // scoring is a per-row projection over vocab_encode ids — the
    // token stream shuffles once (bigram counting), never for scoring.
    GraftQuery(
      "qC1_bigram_surprisal",
      "Per-doc bigram surprisal (-mean ln S) under a top-200 bigram LM " +
        "with Stupid Backoff (0.4 * unigram, 1/total OOV), scored as a " +
        "per-row projection over encoded ids.",
      (s, d) => {
        val docs = t(s, d, "documents")
        GraftFunctions.registerAll(s)
        val tf = graft.plans.Fence.corpus(
          TextAnalysis.tokenFreq(docs, "text"), "pipe_tf")
        val total = tf.agg(coalesce(sum("cnt"), lit(0L)))
          .collect()(0).getLong(0)
        val top = TextAnalysis.topVocab(tf, 100)
        val vocab = top.map(_._1)
        val uniLp = math.log(1.0 / total) +:
          top.map(t2 => math.log(t2._2.toDouble / total))
        // encoded ids reused by bigram counting AND scoring — fence it
        val idsDf = graft.plans.Fence.corpus(
          docs.select(col("doc_id"),
            GraftFunctions.vocabEncode(TextOps.tokens(col("text")), vocab)
              .as("ids")), "pipe_ids")
        val n1 = greatest(size(col("ids")) - 1, lit(0))
        // adjacent-pair key a*101+b (ids 0..100): monotone in (a, b),
        // so the (count desc, key) top-k tie-break equals (c, a, b)
        val pairCol = zip_with(slice(col("ids"), lit(1), n1),
          slice(col("ids"), lit(2), n1), (a, b) => a * 101 + b)
        val bigrams = idsDf.select(explode(pairCol).as("p"))
          .filter(col("p") >= 101 && col("p") % 101 =!= 0) // both in vocab
          .groupBy("p").agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("p")).limit(200)
          .collect().map(r => r.getInt(0) -> r.getLong(1))
        val uniCnt = top.map(_._2)
        val bigramLp: Map[Int, Double] = bigrams.map { case (p, c) =>
          p -> math.log(c.toDouble / uniCnt(p / 101 - 1))
        }.toMap
        val ln04 = math.log(0.4)
        idsDf
          .withColumn("ls", transform(pairCol, p => coalesce(
            element_at(typedLit(bigramLp), p),
            lit(ln04) + element_at(lit(uniLp.toArray), p % 101 + 1))))
          .select(col("doc_id"),
            size(col("ls")).cast("long").as("n_pairs"),
            when(size(col("ls")) === 0, 0.0).otherwise(
              floor(-aggregate(col("ls"), lit(0.0), (a, x) => a + x) /
                size(col("ls")) * 10000.0 + 0.5) / 10000.0)
              .as("surprisal"))
          .orderBy("doc_id")
      },
      Some("""WITH alltok AS (
             |  SELECT doc_id, u.t AS tok, u.i AS pos
             |  FROM (SELECT doc_id, unnest(list_transform(
             |      string_split(text,' '), (t, i) -> {'t': t, 'i': i}))
             |      AS u
             |    FROM documents)),
             |tf AS (SELECT tok, count(*) AS cnt FROM alltok
             |  WHERE tok != '' GROUP BY tok),
             |tot AS (SELECT sum(cnt) AS total FROM tf),
             |vocab AS (
             |  SELECT tok, cnt,
             |    CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS INT)
             |      AS id
             |  FROM tf ORDER BY cnt DESC, tok LIMIT 100),
             |pairs AS (
             |  SELECT a.doc_id, a.tok AS w1, b.tok AS w2
             |  FROM alltok a JOIN alltok b
             |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
             |big AS (
             |  SELECT v1.id AS ia, v2.id AS ib, v1.cnt AS ca,
             |    count(*) AS c
             |  FROM pairs p
             |  JOIN vocab v1 ON p.w1 = v1.tok
             |  JOIN vocab v2 ON p.w2 = v2.tok
             |  GROUP BY v1.id, v2.id, v1.cnt
             |  ORDER BY c DESC, ia, ib LIMIT 200),
             |sc AS (
             |  SELECT p.doc_id,
             |    CASE WHEN g.c IS NOT NULL THEN ln(g.c * 1.0 / g.ca)
             |      ELSE ln(0.4) + CASE WHEN v2.tok IS NULL
             |        THEN ln(1.0 / (SELECT total FROM tot))
             |        ELSE ln(v2.cnt * 1.0 / (SELECT total FROM tot)) END
             |    END AS l
             |  FROM pairs p
             |  LEFT JOIN vocab v1 ON p.w1 = v1.tok
             |  LEFT JOIN vocab v2 ON p.w2 = v2.tok
             |  LEFT JOIN big g ON g.ia = v1.id AND g.ib = v2.id)
             |SELECT d.doc_id,
             |  CAST(coalesce(s.np, 0) AS BIGINT) AS n_pairs,
             |  coalesce(s.sp, 0.0) AS surprisal
             |FROM documents d LEFT JOIN (
             |  SELECT doc_id, count(*) AS np,
             |    floor((-avg(l)) * 10000.0 + 0.5) / 10000.0 AS sp
             |  FROM sc GROUP BY doc_id) s ON d.doc_id = s.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // Bloom-gated exact screening: only bloom-positive candidates pay the
    // confirmation join; output is exact (the oracle is a plain EXISTS).
    GraftQuery(
      "q85_bloom_screen",
      "Bloom-accelerated exact-dup screen of the new batch (doc_id % 10 " +
        "= 0) against the standing corpus: sketch probe at scan speed, " +
        "confirm join only for candidates — output exact.",
      (s, d) => BloomScreen.exactScreen(
        t(s, d, "documents"), "doc_id", "text",
        isNew = col("doc_id") % 10 === 0,
        expectedItems = 10000L, fpp = 0.01)
        .orderBy("doc_id"),
      Some("""SELECT d.doc_id,
             |  EXISTS(SELECT 1 FROM documents o
             |    WHERE o.doc_id % 10 != 0 AND md5(o.text) = md5(d.text))
             |    AS is_dup
             |FROM documents d WHERE d.doc_id % 10 = 0
             |ORDER BY d.doc_id""".stripMargin)),

    // Round-4 flagship chain: substring-dedup gate -> deterministic
    // mixture sampling -> sequence packing -> per-pack summary. Every
    // stage is individually oracle-checked (q80, q73, q72); this runs
    // them end-to-end the way a corpus build would.
    GraftQuery(
      "q86_corpus_build",
      "Training-corpus assembly: drop docs >= 50% covered by duplicated " +
        "5-grams, stratified-sample the rest (en 80%, else 90%), pack " +
        "the survivors' token stream at context 512, summarize per pack.",
      (s, d) => {
        val docs = t(s, d, "documents")
        val keep = Dedup.dupNgramStats(docs, "doc_id", "text", n = 5)
          .filter(col("dup_fraction") < 0.5).select("doc_id")
        val gated = docs.join(keep.hint("shuffle_hash"),
          Seq("doc_id"), "left_semi")
        val sampled = Sampling.stratified(gated, "doc_id", "lang",
          rates = Map("en" -> 0.8), defaultRate = 0.9, salt = "corpus")
        Pack.packSequences(sampled, "doc_id",
          size(graft.functions.TextOps.tokens(col("text"))),
          contextLen = 512, blockLen = 100)
          .groupBy("pack_id")
          .agg(count(lit(1)).as("n_docs"),
            sum("seg_tokens").as("n_tokens"))
          .orderBy("pack_id")
      },
      Some("""WITH tk AS (
             |  SELECT doc_id, string_split(text,' ') AS toks
             |  FROM documents),
             |e AS (
             |  SELECT doc_id, unnest(list_transform(range(0, len(toks)-4),
             |    i -> ('0x' || substr(md5(
             |      array_to_string(toks[i+1 : i+5],' ')),1,8))::BIGINT))
             |    AS g
             |  FROM tk),
             |fr AS (
             |  SELECT g FROM e GROUP BY g
             |  HAVING count(DISTINCT doc_id) >= 2),
             |per AS (
             |  SELECT e.doc_id, count(*) AS n_grams,
             |    sum(CASE WHEN fr.g IS NOT NULL THEN 1 ELSE 0 END) AS n_dup
             |  FROM e LEFT JOIN fr ON e.g = fr.g GROUP BY e.doc_id),
             |keep AS (
             |  SELECT d.doc_id, d.lang, d.text FROM documents d
             |  LEFT JOIN per ON d.doc_id = per.doc_id
             |  WHERE floor(CASE WHEN coalesce(per.n_grams, 0) = 0 THEN 0.0
             |    ELSE coalesce(per.n_dup, 0) * 1.0 / per.n_grams END
             |    * 10000.0 + 0.5) / 10000.0 < 0.5),
             |samp AS (
             |  SELECT doc_id, text FROM keep
             |  WHERE ('0x' || substr(md5('corpus:' ||
             |      CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 10000
             |    < CAST(floor(CASE lang WHEN 'en' THEN 0.8 ELSE 0.9 END
             |        * 10000.0 + 0.5) AS BIGINT)),
             |tk2 AS (
             |  SELECT doc_id, len(string_split(text,' ')) AS ntok
             |  FROM samp),
             |c AS (
             |  SELECT doc_id, ntok,
             |    CAST(coalesce(sum(ntok) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS strt
             |  FROM tk2 WHERE ntok > 0),
             |seg AS (
             |  SELECT doc_id, ntok, strt,
             |    unnest(range(strt // 512, (strt + ntok - 1) // 512 + 1))
             |      AS pack_id
             |  FROM c)
             |SELECT pack_id, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(least(strt+ntok, (pack_id+1)*512)
             |    - greatest(strt, pack_id*512)) AS BIGINT) AS n_tokens
             |FROM seg GROUP BY pack_id ORDER BY pack_id""".stripMargin)),

    // Int8 scalar quantization of embeddings (4x storage cut for ANN
    // shards): per-vector min/max affine map to 0..255, deterministic
    // floor(+0.5) rounding. Pure per-row projection, zero shuffles.
    GraftQuery(
      "q87_embedding_quantize",
      "Per-vector int8 scalar quantization: affine map to 0..255 with " +
        "position-weighted checksum and max reconstruction error — " +
        "scan-speed projection.",
      (s, d) => {
        // Stage intermediates as named columns: reusing a Column value
        // inlines its whole expression at every use site, so mn/scale
        // would otherwise re-evaluate per ELEMENT inside the transform
        // lambdas — O(dim²) interpreted work per row (measured 15.9 s at
        // sf0.1; staged: sub-second).
        val base = t(s, d, "embeddings")
          .select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("v"))
          .select(col("vec_id"), col("v"), array_min(col("v")).as("mn"),
            ((array_max(col("v")) - array_min(col("v"))) / 255.0)
              .as("scale"))
          .select(col("vec_id"), col("v"), col("mn"), col("scale"),
            transform(col("v"), x =>
              when(col("scale") === 0.0, lit(0L))
                .otherwise(floor((x - col("mn")) / col("scale") + 0.5)
                  .cast("long"))).as("q"))
        base.select(
          col("vec_id"),
          aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("q_sum"),
          aggregate(zip_with(col("q"),
              sequence(lit(1), size(col("v"))).cast("array<long>"),
              (qi, i) => qi * i),
            lit(0L), (acc, x) => acc + x).as("q_checksum"),
          (floor(aggregate(
            zip_with(col("q"), col("v"), (qi, xi) =>
              abs(col("mn") + qi * col("scale") - xi)),
            lit(0.0), (acc, x) => greatest(acc, x)) * 10000.0 + 0.5)
            / 10000.0).as("max_err"))
          .orderBy("vec_id")
      },
      Some("""WITH v AS (
             |  SELECT vec_id,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |  FROM embeddings),
             |b AS (
             |  SELECT vec_id, v, list_min(v) AS mn,
             |    (list_max(v) - list_min(v)) / 255.0 AS scale
             |  FROM v),
             |q AS (
             |  SELECT vec_id, v, mn, scale,
             |    list_transform(v, x -> CASE WHEN scale = 0 THEN 0
             |      ELSE CAST(floor((x - mn) / scale + 0.5) AS BIGINT)
             |      END) AS q
             |  FROM b)
             |SELECT vec_id,
             |  CAST(list_sum(q) AS BIGINT) AS q_sum,
             |  CAST(list_sum(list_transform(q, (x, i) -> x * i))
             |    AS BIGINT) AS q_checksum,
             |  floor(list_max(list_transform(range(1, len(v) + 1),
             |    i -> abs(mn + q[i] * scale - v[i]))) * 10000.0 + 0.5)
             |    / 10000.0 AS max_err
             |FROM q ORDER BY vec_id""".stripMargin)),

    // Text normalization: the canonicalization pass before exact dedup —
    // lowercase, strip non-alphanumerics, collapse whitespace.
    GraftQuery(
      "q88_text_normalize",
      "Canonical text normalization (lowercase, punctuation -> space, " +
        "whitespace collapse) with normalized hash and token count — " +
        "scan-speed projection.",
      (s, d) => {
        val norm = trim(regexp_replace(regexp_replace(
          lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
        t(s, d, "documents").select(
          col("doc_id"),
          graft.functions.TextOps.hash32(norm).as("norm_hash"),
          when(norm === "", 0L)
            .otherwise(size(split(norm, " "))).cast("long")
            .as("n_norm_tokens"))
          .orderBy("doc_id")
      },
      Some("""WITH n AS (
             |  SELECT doc_id, trim(regexp_replace(regexp_replace(
             |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))
             |    AS nt
             |  FROM documents)
             |SELECT doc_id,
             |  ('0x' || substr(md5(nt),1,8))::BIGINT AS norm_hash,
             |  CAST(CASE WHEN nt = '' THEN 0
             |    ELSE len(string_split(nt, ' ')) END AS BIGINT)
             |    AS n_norm_tokens
             |FROM n ORDER BY doc_id""".stripMargin)),

    // The injected-kernel SQL surface: graft's native expressions called
    // from PURE SQL TEXT (GraftExtensions injectFunction route) — the
    // kernel's sequential fold matches DuckDB's list_sum order exactly.
    GraftQuery(
      "q89_sql_kernels",
      "Native kernels via SQL text: vec_dot squared-norm and stop_hits " +
        "over registered views — the SparkSessionExtensions function " +
        "surface under the correctness gate.",
      (s, d) => {
        graft.Tables.registerViews(s, d)
        graft.functions.GraftFunctions.registerAll(s)
        s.sql("""
          |SELECT doc_id,
          |  CAST(stop_hits(split(text, ' '), 'the,and,of,to,a')
          |    AS BIGINT) AS hits,
          |  CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens
          |FROM documents ORDER BY doc_id""".stripMargin)
          .unionByName(
            s.sql("""
              |SELECT vec_id + 1000000 AS doc_id,
              |  CAST(floor(vec_dot(
              |      transform(embedding, x -> CAST(x AS DOUBLE)),
              |      transform(embedding, x -> CAST(x AS DOUBLE)))
              |    * 10000.0D + 0.5D) AS BIGINT) AS hits,
              |  CAST(size(embedding) AS BIGINT) AS n_tokens
              |FROM embeddings ORDER BY doc_id""".stripMargin))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    len(list_filter(string_split(text, ' '),
             |      t -> list_contains(['the','and','of','to','a'], t)))
             |      AS hits,
             |    len(string_split(text, ' ')) AS n_tokens
             |  FROM documents),
             |e AS (
             |  SELECT vec_id + 1000000 AS doc_id,
             |    CAST(floor(list_sum(list_transform(embedding,
             |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
             |      * 10000.0 + 0.5) AS BIGINT) AS hits,
             |    len(embedding) AS n_tokens
             |  FROM embeddings)
             |SELECT doc_id, CAST(hits AS BIGINT) AS hits,
             |  CAST(n_tokens AS BIGINT) AS n_tokens
             |FROM (SELECT * FROM d UNION ALL SELECT * FROM e)
             |ORDER BY doc_id""".stripMargin)),

    // Size-balanced bin assignment (GPU-batch / shard-write scheduling):
    // fill each bin to ~4 KB of payload in id order, rows atomic.
    GraftQuery(
      "q90_binpack_bytes",
      "Byte-balanced bin packing: bin = payload-stream start offset div " +
        "4096, via the two-phase prefix sum; per-bin doc/byte summary.",
      (s, d) => Pack.binPackBySize(
        t(s, d, "documents"), "doc_id", length(col("text")),
        targetBytes = 4096L, blockLen = 100L)
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"), sum("bytes").as("n_bytes"))
        .orderBy("bin"),
      Some("""WITH b AS (
             |  SELECT doc_id, length(text) AS bytes,
             |    CAST(coalesce(sum(length(text)) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS strt
             |  FROM documents)
             |SELECT strt // 4096 AS bin,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(bytes) AS BIGINT) AS n_bytes
             |FROM b GROUP BY bin ORDER BY bin""".stripMargin)),

    // TF-IDF top terms per document — the retrieval-side text
    // representation: per-doc term frequencies (one groupBy), corpus
    // document frequencies (one groupBy on the term), idf join back on
    // the term key (shuffle-pinned — the term table is corpus-sized at
    // scale), top-5 per doc via the partial-group-limit window.
    GraftQuery(
      "q91_tfidf_topterms",
      "Top-5 TF-IDF terms per doc: tf x ln(N/df), deterministic " +
        "(tfidf desc, term) tie-break, WindowGroupLimit-bounded top-k.",
      (s, d) => {
        val docs = t(s, d, "documents")
        val n = docs.count()
        val terms = docs
          .select(col("doc_id"),
            explode(TextOps.tokens(col("text"))).as("tok"))
          .filter(col("tok") =!= "")
        val tf = terms.groupBy("doc_id", "tok")
          .agg(count(lit(1)).as("tf"))
        val dfreq = terms.select("doc_id", "tok").distinct()
          .groupBy("tok").agg(count(lit(1)).as("df"))
          .hint("shuffle_hash")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id")
          .orderBy(col("tfidf_raw").desc, col("tok"))
        tf.hint("shuffle_hash").join(dfreq, Seq("tok"))
          .withColumn("tfidf_raw",
            col("tf") * log(lit(n.toDouble) / col("df")))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("doc_id"), col("rank"), col("tok"),
            (floor(col("tfidf_raw") * 10000.0 + 0.5) / 10000.0)
              .as("tfidf"))
          .orderBy("doc_id", "rank")
      },
      Some("""WITH terms AS (
             |  SELECT doc_id, tok FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |    FROM documents)
             |  WHERE tok != ''),
             |tf AS (
             |  SELECT doc_id, tok, count(*) AS tf
             |  FROM terms GROUP BY doc_id, tok),
             |dfreq AS (
             |  SELECT tok, count(*) AS df FROM (
             |    SELECT DISTINCT doc_id, tok FROM terms)
             |  GROUP BY tok),
             |n AS (SELECT count(*) AS n FROM documents),
             |scored AS (
             |  SELECT tf.doc_id, tf.tok,
             |    tf.tf * ln((SELECT n FROM n) * 1.0 / dfreq.df)
             |      AS tfidf_raw
             |  FROM tf JOIN dfreq ON tf.tok = dfreq.tok),
             |ranked AS (
             |  SELECT doc_id, tok, tfidf_raw,
             |    CAST(row_number() OVER (PARTITION BY doc_id
             |      ORDER BY tfidf_raw DESC, tok) AS BIGINT) AS rank
             |  FROM scored)
             |SELECT doc_id, rank, tok,
             |  floor(tfidf_raw * 10000.0 + 0.5) / 10000.0 AS tfidf
             |FROM ranked WHERE rank <= 5
             |ORDER BY doc_id, rank""".stripMargin)),

    // Funnel progression per user: one user-key shuffle + array fold on
    // the Spark side vs per-step min-chaining in the oracle — two
    // different classic algorithms checking each other.
    GraftQuery(
      "q92_funnel_stages",
      "view -> click -> purchase funnel progression per user via a " +
        "single-shuffle ordered-array fold (ties broken by event_id).",
      (s, d) => Funnel.stages(t(s, d, "events"),
        "user_id", "ts", "event_id", "event_type",
        steps = Seq("view", "click", "purchase"))
        .orderBy("user_id"),
      Some("""WITH e AS (
             |  SELECT user_id, ts, event_id, event_type FROM events),
             |r1 AS (
             |  SELECT user_id, ts, event_id FROM (
             |    SELECT user_id, ts, event_id, row_number() OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |    FROM e WHERE event_type = 'view') WHERE rn = 1),
             |r2 AS (
             |  SELECT user_id, ts, event_id FROM (
             |    SELECT e.user_id, e.ts, e.event_id, row_number() OVER (
             |      PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
             |    FROM e JOIN r1 ON e.user_id = r1.user_id
             |    WHERE e.event_type = 'click'
             |      AND (e.ts, e.event_id) > (r1.ts, r1.event_id))
             |  WHERE rn = 1),
             |r3 AS (
             |  SELECT user_id, ts, event_id FROM (
             |    SELECT e.user_id, e.ts, e.event_id, row_number() OVER (
             |      PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
             |    FROM e JOIN r2 ON e.user_id = r2.user_id
             |    WHERE e.event_type = 'purchase'
             |      AND (e.ts, e.event_id) > (r2.ts, r2.event_id))
             |  WHERE rn = 1)
             |SELECT u.user_id,
             |  CAST(CASE WHEN r3.user_id IS NOT NULL THEN 3
             |    WHEN r2.user_id IS NOT NULL THEN 2
             |    WHEN r1.user_id IS NOT NULL THEN 1
             |    ELSE 0 END AS BIGINT) AS stage,
             |  CAST(count(*) AS BIGINT) AS n_events
             |FROM e u
             |LEFT JOIN r1 ON u.user_id = r1.user_id
             |LEFT JOIN r2 ON u.user_id = r2.user_id
             |LEFT JOIN r3 ON u.user_id = r3.user_id
             |GROUP BY u.user_id, r1.user_id, r2.user_id, r3.user_id
             |ORDER BY u.user_id""".stripMargin)),

    // Cohort retention matrix: users cohorted by signup week, counted
    // distinct per week offset — two partial-aggregated groupBys and one
    // pinned user-key join.
    GraftQuery(
      "q93_cohort_retention",
      "Weekly cohort retention: signup-week cohorts x week offset -> " +
        "distinct active users (offset >= 0).",
      (s, d) => {
        val events = t(s, d, "events")
        val cohorts = events.filter(col("event_type") === "signup")
          .groupBy("user_id")
          .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
        events.select(col("user_id"),
            date_trunc("week", col("ts")).as("week"))
          .hint("shuffle_hash")
          .join(cohorts.hint("shuffle_hash"), Seq("user_id"))
          .withColumn("week_offset",
            (datediff(col("week"), col("cohort_week")) / 7)
              .cast("long"))
          .filter(col("week_offset") >= 0)
          .groupBy("cohort_week", "week_offset")
          .agg(count_distinct(col("user_id")).as("n_users"))
          .select(col("cohort_week").cast("timestamp_ntz").as("cohort_week"),
            col("week_offset"), col("n_users"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH cohorts AS (
             |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
             |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
             |act AS (
             |  SELECT e.user_id, c.cohort_week,
             |    datediff('day', c.cohort_week,
             |      date_trunc('week', e.ts)) // 7 AS week_offset
             |  FROM events e JOIN cohorts c ON e.user_id = c.user_id)
             |SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
             |  CAST(week_offset AS BIGINT) AS week_offset,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM act WHERE week_offset >= 0
             |GROUP BY cohort_week, week_offset
             |ORDER BY cohort_week, week_offset""".stripMargin)),

    // Real binary-container round trip: synthesize GRFT header + payload,
    // parse it back with byte-level built-ins (magic, BE u16 fields,
    // payload digest). The pixel codec stays stubbed; the container layer
    // — the engine-owned part of multimodal ingestion — is genuine.
    GraftQuery(
      "q94_media_container",
      "Binary container pack/parse round trip: GRFT magic + big-endian " +
        "u16 dims + payload, parsed via the hex projection — codegen'd " +
        "built-ins, no UDF.",
      (s, d) => {
        val docs = t(s, d, "documents")
        val media = graft.operators.Multimodal.packContainer(
          docs, "doc_id", encode(col("text"), "UTF-8"),
          width = col("doc_id") % 64 + 1, height = col("doc_id") % 48 + 1)
        graft.operators.Multimodal.parseContainer(media)
          .orderBy("doc_id")
      },
      Some("""WITH enc AS (
             |  SELECT doc_id, ('GRFT'::BLOB ||
             |    from_hex(lpad(to_hex(doc_id % 64 + 1), 4, '0')) ||
             |    from_hex(lpad(to_hex(doc_id % 48 + 1), 4, '0')) ||
             |    text::BLOB) AS media
             |  FROM documents),
             |hx AS (
             |  SELECT doc_id, upper(hex(media)) AS hs,
             |    octet_length(media) AS nb
             |  FROM enc)
             |SELECT doc_id,
             |  substring(hs, 1, 8) = '47524654' AS magic_ok,
             |  ('0x' || substring(hs, 9, 4))::BIGINT AS width,
             |  ('0x' || substring(hs, 13, 4))::BIGINT AS height,
             |  CAST(nb - 8 AS BIGINT) AS payload_bytes,
             |  md5(substring(hs, 17)) AS payload_md5
             |FROM hx ORDER BY doc_id""".stripMargin)),

    // REAL image decode end-to-end: P6 PPM bytes are synthesized per doc
    // (ASCII header + deterministic RGB samples), then parsed back by the
    // pure-JVM netpbm decoder inside mapPartitions — header fields AND
    // per-channel pixel means checked against the oracle's closed form.
    // Every 37th doc gets a corrupt magic, exercising the decoded=false
    // quarantine path (poison bytes must not kill the partition).
    GraftQuery(
      "qF6_ppm_decode",
      "Pure-JVM PPM decode round trip under mapPartitions: synthesized " +
        "P6 images -> real header parse + per-channel pixel means, " +
        "corrupt-magic rows surviving as decoded=false.",
      (s, d) => {
        import graft.functions.SafeOps
        val w = col("doc_id") % 5 + 2
        val h = col("doc_id") % 3 + 2
        val n = (w * h * 3).cast("int")
        val payloadHex = array_join(
          transform(sequence(lit(0), n - 1),
            j => lpad(hex(pmod(col("doc_id") + j, lit(256))), 2, "0")), "")
        val magic = when(col("doc_id") % 37 === 0, lit("P7\n"))
          .otherwise(lit("P6\n"))
        val header = concat(magic, w.cast("string"), lit(" "),
          h.cast("string"), lit("\n255\n"))
        val media = concat(encode(header, "UTF-8"), unhex(payloadHex))
        val mediaTbl = t(s, d, "documents").select(col("doc_id"),
          media.as("media"), lit("image/x-portable-pixmap").as("mime"),
          octet_length(media).cast("long").as("n_bytes"))
        graft.operators.Multimodal.decodeImages(mediaTbl)
          .select(col("doc_id"), col("decoded"), col("format").as("fmt"),
            col("width"), col("height"),
            SafeOps.stableRound4(col("mean_r")).as("mean_r"),
            SafeOps.stableRound4(col("mean_g")).as("mean_g"),
            SafeOps.stableRound4(col("mean_b")).as("mean_b"))
          .orderBy("doc_id")
      },
      Some("""WITH base AS (
             |  SELECT doc_id, doc_id % 5 + 2 AS w, doc_id % 3 + 2 AS h,
             |    doc_id % 37 = 0 AS corrupt
             |  FROM documents),
             |px AS (
             |  SELECT doc_id, w, h, corrupt,
             |    list_avg(list_transform(range(0, w*h),
             |      p -> (doc_id + 3*p) % 256)) AS mr,
             |    list_avg(list_transform(range(0, w*h),
             |      p -> (doc_id + 3*p + 1) % 256)) AS mg,
             |    list_avg(list_transform(range(0, w*h),
             |      p -> (doc_id + 3*p + 2) % 256)) AS mb
             |  FROM base)
             |SELECT doc_id, NOT corrupt AS decoded,
             |  CASE WHEN corrupt THEN 'unknown' ELSE 'ppm' END AS fmt,
             |  CASE WHEN corrupt THEN NULL
             |    ELSE CAST(w AS INTEGER) END AS width,
             |  CASE WHEN corrupt THEN NULL
             |    ELSE CAST(h AS INTEGER) END AS height,
             |  CASE WHEN corrupt THEN NULL
             |    ELSE floor(mr * 10000.0 + 0.5) / 10000.0 END AS mean_r,
             |  CASE WHEN corrupt THEN NULL
             |    ELSE floor(mg * 10000.0 + 0.5) / 10000.0 END AS mean_g,
             |  CASE WHEN corrupt THEN NULL
             |    ELSE floor(mb * 10000.0 + 0.5) / 10000.0 END AS mean_b
             |FROM px ORDER BY doc_id""".stripMargin)),

    // Top-principal-component projection (All-but-the-Top-style
    // embedding post-process): one partial-aggregated moment pass
    // (d + d² buffer), driver-side power iteration on the bounded d×d
    // covariance with per-stage fixpoint rounding (the PageRank/k-means
    // convention), zero-shuffle projection. The oracle replays the
    // same three unrolled iterations in SQL.
    GraftQuery(
      "qC0_pca_top_component",
      "Per-vector projection onto the dominant covariance eigenvector " +
        "(3 power iterations, covariance 1e-6 / iterate 1e-9 rounded, " +
        "deterministic 1/sqrt(d) init).",
      (s, d) => graft.operators.Pca.topComponentScores(
        t(s, d, "embeddings"), "vec_id", "embedding", dim = 64)
        .orderBy("vec_id"),
      Some(s"""WITH $duckPcaV3
              |SELECT e.vec_id,
              |  floor(sum((e.x - m.mi) * v3.vj) * 10000 + 0.5) / 10000
              |    AS pc1
              |FROM e JOIN m ON e.i = m.i JOIN v3 ON v3.i = e.i
              |GROUP BY e.vec_id ORDER BY e.vec_id""".stripMargin)),

    // All-but-the-Top, applied: remove the dominant component and report
    // how much vector mass it carried — norm before/after per vector via
    // the closed form |c - (c·v)v|² = |c|² − (c·v)²/|v|². Same bounded
    // eigenvector artifact as qC0; still a zero-shuffle projection.
    GraftQuery(
      "qC6_pca_residual",
      "Residual norms after removing the top principal component " +
        "(closed-form |c|^2 - pc1^2/|v|^2, 4-dp), per vector.",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        GraftFunctions.registerAll(s)
        val (mean, v) = graft.operators.Pca.topComponent(
          emb, "embedding", dim = 64)
        val vv = {
          var sU = 0.0
          var i = 0
          while (i < v.length) { sU += v(i) * v(i); i += 1 }
          sU
        }
        val centered = zip_with(
          transform(col("embedding"), x => x.cast("double")),
          typedLit(mean.toSeq), (a, b) => a - b)
        emb
          .withColumn("c", centered)
          .withColumn("sq", GraftFunctions.vecDot(col("c"), col("c")))
          .withColumn("pc1",
            GraftFunctions.vecDot(col("c"), typedLit(v.toSeq)))
          .select(col("vec_id"),
            (floor(sqrt(col("sq")) * 10000.0 + 0.5) / 10000.0)
              .as("norm_orig"),
            (floor(sqrt(greatest(
              col("sq") - col("pc1") * col("pc1") / lit(vv), lit(0.0)))
              * 10000.0 + 0.5) / 10000.0).as("norm_resid"))
          .orderBy("vec_id")
      },
      Some(s"""WITH $duckPcaV3,
              |vv AS (SELECT sum(vj * vj) AS vv FROM v3),
              |p AS (
              |  SELECT e.vec_id,
              |    sum((e.x - m.mi) * v3.vj) AS pc1,
              |    sum((e.x - m.mi) * (e.x - m.mi)) AS sq
              |  FROM e JOIN m ON e.i = m.i JOIN v3 ON v3.i = e.i
              |  GROUP BY e.vec_id)
              |SELECT vec_id,
              |  floor(sqrt(sq) * 10000.0 + 0.5) / 10000.0 AS norm_orig,
              |  floor(sqrt(greatest(
              |      sq - pc1 * pc1 / (SELECT vv FROM vv), 0.0))
              |    * 10000.0 + 0.5) / 10000.0 AS norm_resid
              |FROM p ORDER BY vec_id""".stripMargin))
  )
}
