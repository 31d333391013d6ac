package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan regression guards: the scale properties SCALE.md claims
  * (pushdown, pruning, broadcast dims, zero-exchange top-k, one-shuffle
  * as-of) asserted against the actual planned output, so a refactor that
  * silently de-optimizes a plan fails CI, not a 100 TB run.
  *
  * Assertions read the pre-execution plan string (AQE initial plan) —
  * stable across runs, no data execution needed beyond tiny sf0.001.
  */
class PlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def planOf(name: String): String = {
    val q = SparkEntry.allQueries.find(_.name == name).get
    plan(q.run(spark, sf))
  }

  test("q02: filters are pushed to the parquet scan and columns pruned") {
    val p = planOf("q02_filter_project")
    assert(p.contains("PushedFilters: [") && p.contains("IsNotNull"),
      s"no pushed filters in:\n$p")
    // 11-column lineitem must not be read in full for this projection
    assert(!p.contains("l_comment") && p.contains("ReadSchema"))
  }

  test("q06: dimension joins are broadcast, the fact side never shuffles " +
    "for them") {
    val p = planOf("q06_join_dims_broadcast")
    assert(p.contains("BroadcastHashJoin"), s"no BHJ in:\n$p")
  }

  test("q53: global top-k plans as TakeOrderedAndProject with zero " +
    "exchanges") {
    val p = planOf("q53_topk_limit")
    assert(p.contains("TakeOrderedAndProject"), s"no TakeOrdered in:\n$p")
    assert(!p.contains("Exchange"), s"unexpected exchange in:\n$p")
  }

  test("CooldownDedupExec plans as the custom node with one exchange " +
    "and no aggregation buffers") {
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val p = plan(graft.operators.Timeseries.cooldownDedupStreamed(
      events, Seq("user_id", "event_type"), "ts", "event_id", 60L))
    // SparkPlan.nodeName strips the Exec suffix in explain output
    assert(p.contains("CooldownDedup "), s"custom node missing:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).length -
      "ReusedExchange".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$p")
    // the whole point vs the fold form: no ObjectHashAggregate holding
    // per-key event arrays
    assert(!p.contains("ObjectHashAggregate"), s"aggregation buffer in:\n$p")
  }

  test("PushFilterThroughCooldown: key-only filters reach the scan " +
    "below the custom node; event-level filters stay above") {
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val deduped = graft.operators.Timeseries.cooldownDedupStreamed(
      events, Seq("user_id", "event_type"), "ts", "event_id", 60L)
    // key-only predicate: pushed through the node into the parquet scan
    val pKey = plan(deduped.filter(col("user_id") === 7L))
    assert(pKey.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)]"),
      s"key filter not pushed to scan:\n$pKey")
    // value predicate must NOT move below (it would change which events
    // anchor the greedy fold)
    val pVal = plan(deduped.filter(col("value") > 1.0))
    assert(!pVal.contains("PushedFilters: [IsNotNull(value)"),
      s"value filter wrongly pushed below the dedup:\n$pVal")
    // and semantics commute for the key filter
    val before = graft.operators.Timeseries.cooldownDedupStreamed(
      events.filter(col("user_id") === 7L),
      Seq("user_id", "event_type"), "ts", "event_id", 60L)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val after = deduped.filter(col("user_id") === 7L)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(before == after && before.nonEmpty)
  }

  test("AsOfJoin.backward plans exactly one shuffle") {
    import spark.implicits._
    val left = Seq((1L, "k", 5L)).toDF("id", "k", "ts")
    val right = Seq(("k", 3L, 1.0)).toDF("k", "ts", "v")
    val p = plan(graft.operators.AsOfJoin.backward(
      left, right, Seq("k"), "ts", Seq("v")))
    val exchanges = "Exchange".r.findAllIn(p).length -
      "ReusedExchange".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$p")
  }

  test("pair-generating self-joins shuffle on the key, never broadcast " +
    "the corpus index") {
    for (name <- Seq("q31_dedup_ngram_jaccard", "q32_dedup_minhash_lsh",
        "q43_simhash_pairs", "q70_dedup_embedding_lsh",
        "q80_dup_ngram_spans", "qA2_sparse_cosine_pairs",
        "qG1_edit_distance_pairs")) {
      val p = planOf(name)
      assert(p.contains("ShuffledHashJoin"), s"$name lost its hint:\n$p")
      // legitimate broadcasts: a LeftAnti hot-key screen (maxPosting)
      // builds on the tiny over-threshold token list, and qG1's
      // gram-document-frequency table is bounded by the q-gram
      // universe (alphabet^q) regardless of corpus size — never the
      // corpus-sized posting index itself
      // (the df build appears once per self-join side: 2 BHJ nodes)
      val allowedBhj = if (name == "qG1_edit_distance_pairs") 2 else 0
      val corpusBroadcasts = p.linesIterator
        .filter(_.contains("BroadcastHashJoin"))
        .filterNot(_.contains("LeftAnti")).size
      assert(corpusBroadcasts <= allowedBhj,
        s"$name broadcasts its index:\n$p")
    }
  }

  test("q20: histogram binning is O(n) — no cartesian over the data side") {
    val p = planOf("q20_ops_pdf_cdf")
    // the only nested-loop join allowed is the bins completeness frame
    // (broadcast of a constant-sized bins x groups frame)
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("q64: IVF cell assignment is a per-row projection — no corpus " +
    "shuffle, no nested-loop join, subtree plans once") {
    val p = planOf("q64_ann_ivf_topk")
    assert(p.contains("argmin_cell"), s"cell kernel not in plan:\n$p")
    assert(!p.contains("hashpartitioning(vid"),
      s"corpus shuffled on vid:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"codebook nested-loop survived:\n$p")
    // the only window is the final per-query top-k, not cell assignment
    val windows = "Window".r.findAllIn(p).length
    assert("RunningWindowFunction|WindowGroupLimit|Window".r
      .findAllIn(p).nonEmpty && !p.contains("partitionBy(vid"),
      s"cell-assign window survived:\n$p")
    assert(windows <= 4, s"expected only the top-k window, plan:\n$p")
  }

  test("q69: the unified date window pushes into every era's scan leg") {
    // 4 scans of the partition column: ndt7, ndt5, web100 branches get
    // the consumer's post-union filter via Catalyst pushdown; the ndt5
    // tcpinfo side carries it from the view (left-join right side).
    // Inspect scan-node metadata, not the plan string — the rendered
    // PushedFilters list is truncated per node.
    import org.apache.spark.sql.execution.FileSourceScanExec
    val q = SparkEntry.allQueries.find(_.name == "q69_three_era_unified").get
    val scans = q.run(spark, sf).queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec => s.metadata.getOrElse("PushedFilters", "")
    }
    assert(scans.length == 4, s"expected 4 era scan legs, got $scans")
    scans.foreach { pf =>
      assert(pf.contains("GreaterThanOrEqual(o_orderdate") &&
        pf.contains("LessThan(o_orderdate"),
        s"date window missing from a scan leg: $pf")
    }
  }

  test("q72: pack prefix-sum windows partition by block; block offsets " +
    "are broadcast back, never shuffling the corpus") {
    val p = planOf("q72_pack_sequences")
    // the corpus-side running sum must be partitioned (by block); the
    // only unpartitioned window is over the aggregated |blocks| frame
    assert(p.contains("windowspecdefinition(block"),
      s"corpus window not partitioned by block:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"block offsets not broadcast:\n$p")
  }

  test("q74: the incremental band index materializes once — the " +
    "shingle/MinHash pipeline is not evaluated per join side") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val q = SparkEntry.allQueries.find(_.name == "q74_incremental_dedup").get
    val plan = q.run(spark, sf).queryExecution.sparkPlan
    val fileScans = plan.collect { case s: FileSourceScanExec => s }
    // round 11: the band index is a durable STAGE table, so both join
    // sides read the staged parquet (cheap columnar re-scans — the
    // qQ1/qQ4 shape) and the only source scan is the id-only base of
    // the final left join. The expensive shingle/MinHash pipeline ran
    // exactly once, inside the stage write.
    val (staged, source) = fileScans.partition(
      _.metadata.getOrElse("Location", "").contains("lsh_inc_bands"))
    assert(staged.length == 2 && source.length == 1,
      s"expected 2 staged + 1 source scans, got ${staged.length}/" +
        s"${source.length}:\n$plan")
    // the one source scan must be the id-only projection, proving the
    // text/shingle pipeline is not re-evaluated outside the stage
    assert(source.head.schema.fieldNames.toSeq == Seq("doc_id"),
      s"source scan reads more than doc_id: ${source.head.schema}")
  }

  test("q81: global-order ranking windows partition by block with " +
    "offsets broadcast — the corpus is never globally sorted") {
    val p = planOf("q81_global_shuffle")
    assert(p.contains("windowspecdefinition(block"),
      s"rank window not partitioned by block:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"block offsets not broadcast:\n$p")
  }

  test("q86: the pack-input fence holds — the dedup-gate upstream " +
    "evaluates once, not once per prefix-sum phase") {
    val q = SparkEntry.allQueries.find(_.name == "q86_corpus_build").get
    val p = q.run(spark, sf).queryExecution.executedPlan.toString
    // round 11: the pack-input fence is the durable stage writer — the
    // plan reads the staged pack_docs parquet, and the dedup-gate
    // upstream ran once, inside the stage write
    assert(p.contains("target/stage/") && p.contains("pack_docs"),
      s"pack input not staged:\n$p")
    val ex = "Exchange ".r.findAllIn(p).length
    assert(ex <= 8, s"q86 exchange count regressed to $ex (fence lost?)")
  }

  test("qD8: the salted join shuffles on (key, salt) — the replicated " +
    "dim is never broadcast") {
    val p = planOf("qD8_salted_join")
    assert(p.contains("ShuffledHashJoin"), s"no shuffled hash join:\n$p")
    // the salt exists to spread a hot key across reducers; a broadcast
    // of saltBuckets dim copies would defeat it silently
    assert(!p.contains("BroadcastHashJoin"), s"dim side broadcast:\n$p")
  }

  test("global sweep: no declared query plans a cartesian product, an " +
    "unapproved nested-loop join, or an unpartitioned corpus window") {
    import org.apache.spark.sql.catalyst.optimizer.BuildLeft
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    // a BNLJ whose broadcast side is NOT structurally bounded (no
    // aggregate beneath) is allowed only where the design bounds it:
    //  - q20/q71: constant-size (bins x groups) completeness frame
    //  - q35/qA7/qB5/qD4: ANN broadcast side is the query set — bounded
    //    by the isQuery predicate by design (the corpus side streams;
    //    qD4's dense leg is the q35 kernel under the RRF fusion)
    //  - q34: documented brute-force baseline; q70 (LSH-bucketed) is the
    //    100 TB path for the same semantics
    val bnljAllowed = Set("q20_ops_pdf_cdf", "q71_ops_upload_pdf_masked",
      "q35_ann_brute_topk", "qA7_ann_recall", "qJ1_ann_ndcg", "qJ2_rbo",
      "qJ6_mmr_rerank",
      // qL2: hard-negative mining broadcasts the ANCHOR set — bounded
      // by the isAnchor predicate by design, the same q35 license; the
      // corpus side streams once
      "qL2_hard_negatives",
      // qK4: silhouette's broadcast side is the seed-predicate codebook
      // — bounded by construction, the ivfTopK justification
      "qK4_silhouette",
      "qB5_ann_ivf_multiprobe",
      "q34_dedup_embedding", "qD4_hybrid_rrf",
      // qH6: DBSCAN's pair generator is pluggable; the declared query
      // feeds it the documented brute-force generator (q34's kernel) so
      // the oracle's neighbor sets are exact — the 100 TB path swaps in
      // embeddingLshPairs and the clustering core is unchanged
      "qH6_dbscan",
      // the bucketized interval joins divert >=maxBucketsPerInterval-
      // wide intervals to a residual-only broadcast leg — that leg IS
      // a nested loop by design, over the filtered wide set, which the
      // operator's contract bounds (catch-all ranges are rare; the
      // bucket join carries everything else)
      "qE0_interval_annotate", "qE2_interval_overlap")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for (q <- SparkEntry.allQueries) {
      val p = q.run(spark, sf).queryExecution.sparkPlan
      if (p.collectFirst { case c: CartesianProductExec => c }.nonEmpty)
        failures += s"${q.name}: CartesianProduct"
      // a BNLJ broadcasting an AGGREGATED frame (1-row totals, per-group
      // rates, max-day clips) is bounded by |groups| — fine at any scale
      val unboundedBnlj = p.collect {
        case j: BroadcastNestedLoopJoinExec =>
          val build = if (j.buildSide == BuildLeft) j.left else j.right
          build.collectFirst { case a: BaseAggregateExec => a }.isEmpty
      }.exists(identity)
      if (unboundedBnlj && !bnljAllowed(q.name))
        failures += s"${q.name}: BroadcastNestedLoopJoin over a " +
          "non-aggregated build side"
      // a window with no PARTITION BY runs on ONE task — legal only over
      // an already-aggregated (bounded) input, e.g. the |blocks| offset
      // frames of the two-phase prefix sums
      val unpartitioned: Seq[SparkPlan] = p.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w
      }
      for (w <- unpartitioned)
        if (w.collectFirst { case a: BaseAggregateExec => a }.isEmpty)
          failures += s"${q.name}: unpartitioned window over " +
            "non-aggregated input"
    }
    assert(failures.isEmpty,
      s"100x-scale plan invariants violated:\n${failures.mkString("\n")}")
  }

  test("unpartitioned-window lint: every empty-partition WindowExec in a " +
    "declared plan is pinned by name and count (VERDICT r15 #7)") {
    // The single-task window shape is legal ONLY over an
    // already-aggregated frame bounded at |groups| rows (the global
    // sweep asserts the aggregate-beneath structure); this lint pins
    // WHICH queries carry one and HOW MANY, so a future query that
    // "just needs a global row_number" over corpus-scale input fails
    // review here instead of shipping a one-task sort. The pinned set
    // is the global-ordering statistics family: ranks over score
    // distributions (AUC, PR, lift, KS, QQ, conformal), sequential
    // scans over per-step aggregates (CUSUM, SPRT, ACF, vocab growth),
    // and the two-phase pack/shuffle block-offset frames — all
    // |groups|-bounded by construction.
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    val pinned = Map(
      "q65_sql_surface" -> 1, "q72_pack_sequences" -> 1,
      "q81_global_shuffle" -> 1, "q86_corpus_build" -> 1,
      "q90_binpack_bytes" -> 1, "qC2_vocab_growth" -> 1,
      "qC4_gated_pack" -> 1, "qD7_heavy_hitters" -> 1,
      "qD9_negative_sample" -> 1, "qE9_sorted_neighborhood" -> 2,
      "qF1_er_chain" -> 2, "qH3_binary_auc" -> 1, "qH8_pr_curve" -> 1,
      "qJ0_ks_drift" -> 1, "qJ5_cusum" -> 2, "qK6_zipf_slope" -> 1,
      // qK7 r19: both |days|-bounded windows (day-rank + the mean fold
      // order) now run INSIDE the eager bounded fence of the deviation
      // frame (Trend.acfDaily), so the censused final plan no longer
      // carries them — the windows themselves are unchanged and still
      // aggregate-bounded (OPTIMIZATION_r19.md §2.4 sweep)
      "qL3_quantiles_merged" -> 1, "qL9_gini" -> 1,
      "qL4_fellegi_sunter" -> 2, "qM2_sprt" -> 3,
      // qM9 r18: the side-tagged grouped quantile pass partitions both
      // prefix-sum windows by the side tag — the 2 global windows the
      // r15 census pinned are GONE (OPTIMIZATION_r18.md §4)
      "qN0_conformal" -> 1, "qN1_fs_patterns" -> 2, "qO6_lift_table" -> 1)
    val census = SparkEntry.allQueries.flatMap { q =>
      val n = q.run(spark, sf).queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w
      }.size
      if (n > 0) Some(q.name -> n) else None
    }.toMap
    val drift = (census.keySet ++ pinned.keySet).toSeq.sorted.flatMap { k =>
      (census.getOrElse(k, 0), pinned.getOrElse(k, 0)) match {
        case (c, p) if c == p => None
        case (c, p) => Some(s"$k: planned $c empty-partition windows, pinned $p")
      }
    }
    assert(drift.isEmpty,
      s"empty-partition window census drifted:\n${drift.mkString("\n")}")
  }

  test("exchange-count pins: the most expensive queries keep their " +
    "audited shuffle shapes") {
    // Pinned at the audited round-6 counts (SCALE.md shapes). A future
    // refactor that silently adds exchanges to a hot query fails here
    // instead of surfacing as a bench regression. Counts are of
    // planned Exchange nodes minus reuses, on the sf0.001 plan.
    val pins: Seq[(String, Int)] = Seq(
      // post-fence register/distinct aggregates — all exchanges carry
      // the deduped (shard, item) set or 2^p-row register tables, never
      // the raw gram stream (the corpus is shingled ONCE, in the fence)
      "qE7_hll_overlap" -> 12,
      "qF0_exact_heavy_hitters" -> 1, // pass-2 broadcast-semi recount plan
      "qF3_grouped_hitters" -> 2,  // per-group MG sketch agg + sketch-sized ranking
      "qE3_hll_cardinality" -> 6,  // register groupBy O(groups x 2^p) + exact rider
      "qC2_vocab_growth" -> 3,     // one gram-key groupBy + 10-row decile window
      "q28_hop_annotation_chain" -> 3, // broadcast annotation joins; U+agg exchanges
      // qA1 re-audited round 12 after the bucketed-stage migration:
      // edge table AND node set staged bucketed (src / node), so both
      // per-round joins meet HashPartitioning on every side and each
      // of the 3 PageRank rounds contributes exactly ONE exchange (the
      // groupBy(dst) contribution aggregate) + 1 final ORDER BY range
      // exchange. The deg join is shuffle-pinned and colocated (zero
      // exchanges); no exchange ever carries the rank table.
      "qA1_pagerank_dedup_graph" -> 4,
      "qB7_dedup_jaccard_prefix" -> 8, // the round-5 8-exchange
      // restructure; re-audited r12 after the df-ordered default flip:
      // still 8 — the df aggregate/join/window run inside the fenced
      // jpp_prefix stage write, so the declared plan reads staged
      // prefix scans and keeps its shape
      "q58_dedup_canonical" -> 3,  // post-loop canonical join
      "qF5_unified_uploads" -> 2,  // per-row era projections + ndt5 tcpinfo join
      "qF8_hll64_cardinality" -> 6, // register groupBy + exact rider (qE3's shape)
      // round-6 batch-5 heavies (audited this round):
      "qH6_dbscan" -> 7,  // pair gen + degree + CC rounds' label joins
                          // (r12: -1, edgesSymmetric skips a swap leg)
      "qH9_dhash_pairs" -> 4,  // band shuffle pair + dedup + order
      "qI2_audio_fp_pairs" -> 4, // same banded shape as qH9
      "qH3_binary_auc" -> 11, // score partials + block offsets frames
      "qJ0_ks_drift" -> 12,   // tagged-union partials + offsets frames
      // round-7 heavies (audited this round; every exchange carries a
      // bounded frame — value-count/block-offset tables, daily frames,
      // |R×C| grids, candidate blocks — never the raw corpus):
      "qM9_qq_table" -> 30,        // 2× quantile block prefix sums
      "qN0_conformal" -> 24,       // means + residual-rank prefix sum
      "qL3_quantiles_merged" -> 20, // 2 half-counts + merge + prefix sum
      "qK7_acf" -> 17,             // daily frame + lag equi-join legs
      // qM4 re-audited round 12: labelPropStep fences its undirected
      // edge set (the prefix pair generation previously executed TWICE
      // — once per explode direction); the declared plan is now 2
      // nbr-key shuffles of the staged edge scan's two explode legs +
      // vote groupBy(node,nl) + winner groupBy(node) + label join
      // shuffle + final ORDER BY — every exchange carries an edge- or
      // label-sized frame, never the shingle stream
      "qM4_label_prop_step" -> 6,
      "qN1_fs_patterns" -> 14,     // blocking rank + pattern aggregate
      "qL5_mutual_information" -> 13, // cells + margins + sorted folds
      "qL4_fellegi_sunter" -> 13,  // blocking rank + two field joins
      "qL0_chi2_independence" -> 12, // cells + margins + grid complete
      "qM5_clustering_coeff" -> 8, // fenced und + degree + wedge joins
      // round-8 (audited this round):
      "qO9_dbscan_lsh" -> 7, // bucket equi-join pair gen + qH6 core
                             // (r12: -1, edgesSymmetric skips a swap leg)
      "qO7_uploads_decile_rollup" -> 3, // dedup window + decile agg + era join
      "qP0_dhash_pairs_capped" -> 8, // hot screen + anti + banded self-join
      "qP1_audio_fp_pairs_wide" -> 8, // same capped shape, 14-bit bands
      "qP2_countmin_salted" -> 11, // sketch cells + probe joins + truth rider
      "qP3_dhash_screen" -> 8,  // index hot screen + band probe + argmin
      "qP4_video_frame_sample" -> 1, // one scan pass + order
      "qP5_video_neardup" -> 6, // inverted index self-join + pair agg
      "qP6_media_corpus_build" -> 3, // capped pairs + CC post-join
      "qP7_image_resize" -> 2, // thumbnail decode + n_bytes join
      // round-9 web queries (audited round 10, post stage-writer):
      "qQ1_html_gopher_chain" -> 1, // stage scan + order only
      "qQ4_web_corpus_build" -> 4, // 1 hash-key dedup shuffle + 2 broadcast + order
      // round-12 additions (audited this round; every exchange carries
      // a pair/edge/node/rollup-sized frame — the gram stream lives in
      // the fenced jpp/cpp stages):
      "qE6_triangle_count" -> 7,  // staged-und orient + wedge/closing joins
      "qA0_containment_pairs" -> 8, // prefix+full legs, cand distinct, verify
      "q68_training_batch" -> 5,  // capped bands + CC post-join + split rank
      "qN7_kcore_step" -> 15, // 2 prefix legs + cand + 2 verify + und
                              // distinct + 2 semi legs + degree + join + order
      "qR0_stats_countries_view" -> 2, // stats rollup + order over the view stack
      "qR1_unified_downloads_view" -> 1, // unified scan + order
      "qR2_ndt7_union_view" -> 2, // union group rollup + order
      "qR4_embedding_screen" -> 5, // bucket probe join + min agg + left join + order
      // round-13 addition (audited via PinAudit at declaration time):
      // qA0's cpp machinery behind the C4 gate — the gate itself is a
      // per-row HOF pass and adds no exchange
      "qS0_gated_containment" -> 8,
      // round-14 additions (PinAudit at declaration time): qS1 net 8 —
      // the df gate's aggregate + anti-join live in the fenced
      // gated-sets stage, so the declared plan is qS0's cpp shape over
      // the staged read; qS2 net 1 — union of two pruned scans + the
      // final order (the dialect shim is a string rewrite, zero plan
      // cost)
      "qS1_df_gated_containment" -> 8,
      "qS2_legacy_comma_union" -> 1,
      // the six-view legacy lineage collapses to a filtered union of
      // two archive scans + the final order — stacked views cost no
      // exchanges
      "qS3_legacy_lineage_view" -> 1,
      // round-15 (PinAudit at declaration): the standardSQL twin
      // collapses further — ONE pruned archive scan + the final order;
      // Catalyst eliminates the named-view annotation LEFT JOIN
      // outright because ann_value is never selected (deduped right
      // side => join removable), exactly the plan a stacked view
      // lineage should cost
      "qS4_standard_lineage_view" -> 1)
    val failures = pins.flatMap { case (name, cap) =>
      val p = planOf(name)
      val n = "Exchange ".r.findAllIn(p).length -
        "ReusedExchange ".r.findAllIn(p).length
      if (n > cap) Some(s"$name: $n exchanges (pinned <= $cap)") else None
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("TopK aggregator partial-aggregates map-side") {
    val p = planOf("q57_topk_per_group")
    // ObjectHashAggregate appears twice: partial + final
    val n = "ObjectHashAggregate".r.findAllIn(p).length
    assert(n >= 2, s"expected partial+final ObjectHashAggregate:\n$p")
  }

  test("Parallel.cpuFloor: fires only when splits < floor, keyed on " +
    "the given key, value-identical, off under the audited scale " +
    "shape's conf") {
    // dedicated sessions so the conf differs per arm; the shared suite
    // session runs floor-off (SparkTestBase) and is not disturbed here
    val on = spark.newSession()
    on.conf.set("graft.scan.parallelismFloor", "4")
    val off = spark.newSession()
    off.conf.set("graft.scan.parallelismFloor", "0")
    val li = graft.plans.Parallel.cpuFloor(
      graft.Tables.load(on, sf, "lineitem"), "l_orderkey")
    val liOff = graft.plans.Parallel.cpuFloor(
      graft.Tables.load(off, sf, "lineitem"), "l_orderkey")
    // single-file fixture: 1 split < 4 -> the floor's repartition fires
    assert(li.rdd.getNumPartitions == 4,
      s"floor should lift 1 split to 4, got ${li.rdd.getNumPartitions}")
    assert(liOff.rdd.getNumPartitions == 1,
      "floor=0 must leave the raw scan split count")
    assert(plan(li).contains("REPARTITION_BY_NUM") &&
      plan(li).contains("l_orderkey"),
      s"floor exchange missing or mis-keyed:\n${plan(li)}")
    assert(!plan(liOff).contains("Exchange"),
      s"floor=0 must plan a bare scan:\n${plan(liOff)}")
    // an input already at/above the floor is returned untouched
    val wide = graft.Tables.load(on, sf, "lineitem").repartition(8)
    assert(graft.plans.Parallel.cpuFloor(wide, "l_orderkey")
      .rdd.getNumPartitions == 8,
      "cpuFloor must be a no-op when partitions >= floor")
    // the floor is partitioning-only: bit-identical content
    assert(li.count() == liOff.count())
    val s1 = li.selectExpr("sum(hash(l_orderkey, l_partkey, l_quantity))")
      .head.getLong(0)
    val s2 = liOff.selectExpr("sum(hash(l_orderkey, l_partkey, l_quantity))")
      .head.getLong(0)
    assert(s1 == s2, "floored scan changed table content")
  }

  test("Parallel.cpuFloor: no-op on exchange-bearing plans (the plan-" +
    "build materialization trap)") {
    val on = spark.newSession()
    on.conf.set("graft.scan.parallelismFloor", "16")
    // a shuffle-bearing frame: the partition probe (df.rdd) would
    // materialize the aggregation under AQE at plan-build time, so the
    // floor must return it untouched without probing
    val shuffled = graft.Tables.load(on, sf, "lineitem")
      .groupBy("l_orderkey").count()
    val out = graft.plans.Parallel.cpuFloor(shuffled, "l_orderkey")
    assert(out eq shuffled,
      "cpuFloor must return an exchange-bearing frame untouched")
  }

  test("Stage.materializeBucketed: adaptive bucket count is size-" +
    "derived (small scan -> 1 bucket), capped at shuffle partitions, " +
    "and the explicit count still wins") {
    import graft.plans.Stage
    val s = spark.newSession()
    // empty buckets write no file, so count buckets from the catalog's
    // bucketSpec, not the staged directory
    def numBuckets(sess: org.apache.spark.sql.SparkSession,
        frag: String): Int = {
      val id = sess.sessionState.catalog.listTables("default")
        .filter(_.table.contains(frag)).maxBy(_.table)
      sess.sessionState.catalog.getTableMetadata(id)
        .bucketSpec.get.numBuckets
    }
    // KB-sized scan-shaped input: the optimizer's estimate is accurate
    // and far below the per-bucket target -> ONE bucket, so iterative
    // consumers run 1-task rounds instead of numShufflePartitions-task
    // micro-stages (scale-adaptive partitioning, guide §2)
    val tiny = graft.Tables.load(s, sf, "region").select(
      col("r_regionkey").cast("long").as("k"), col("r_name"))
    val small = Stage.materializeBucketed(tiny, "adapt_small", "k")
    assert(numBuckets(s, "adapt_small") == 1,
      s"tiny input should stage as 1 bucket")
    // a tiny per-bucket target forces the cap: never more buckets than
    // the session's shuffle parallelism (the pre-adaptive default)
    val s2 = spark.newSession()
    s2.conf.set("graft.stage.bucketTargetBytes", "1")
    Stage.materializeBucketed(
      graft.Tables.load(s2, sf, "region").select(
        col("r_regionkey").cast("long").as("k")), "adapt_capped", "k")
    assert(numBuckets(s2, "adapt_capped") ==
      s2.sessionState.conf.numShufflePartitions,
      "estimate above target*cap must clamp to numShufflePartitions")
    // explicit bucket count bypasses the estimate entirely
    Stage.materializeBucketed(tiny, "adapt_explicit", "k", buckets = 3)
    assert(numBuckets(s, "adapt_explicit") == 3,
      "explicit bucket count must be honored")
    // content identical through the adaptive path
    assert(small.orderBy("k").collect().toSeq ==
      tiny.orderBy("k").collect().toSeq)
    // post-write compact: an INFLATED estimate (cross-join plan) lands
    // on the cap, but the actual staged bytes are tiny -> the stage is
    // rewritten at the derived count (1 bucket) and the over-scattered
    // original reclaimed
    import s.implicits._
    val inflated = s.range(0, 100000).toDF("k")
      .crossJoin(s.range(0, 50).toDF("j"))
      .filter(col("k") < 3 && col("j") < 3)
      .select((col("k") * 100 + col("j")).as("k"))
    val compacted = Stage.materializeBucketed(inflated, "adapt_infl", "k")
    assert(numBuckets(s, "adapt_infl_c") == 1,
      "tiny actual bytes under an inflated estimate must compact to 1")
    assert(compacted.count() == 9,
      "compacted stage must carry the original rows")
  }
}
