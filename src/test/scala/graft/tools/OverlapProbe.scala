package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import org.apache.spark.sql.functions._
import graft.{SparkEntry, Tables}
import graft.operators.Dedup

/** Round-12 adversarial scale probe (test scope, not part of the suite):
  *
  *  1. the OVERLAPPING-boilerplate corpora (`GenScale ov`) against the
  *     prefix-pair generators — the value-ordered prefix samples a
  *     corpus-wide hot shingle into ~(1-t) of prefixes, so its
  *     candidate block grows ∝ posting², while the df-ordered prefix
  *     sorts it LAST and out of every prefix: the probe measures both,
  *     one decade for the melt demo, two decades for the survivor;
  *  2. the never-probed query families (q32/q74 bands, qC7 semdedup,
  *     qE5/qB5 IVF, qG5/qF9 winnowing, qE9 sorted-neighborhood) at
  *     sf0.1 → sf1 → sf10 on the standard disjoint shards.
  *
  * Round-13 legs: `graph` (the iterative text-graph loops qA1/qE6/
  * qM4/qM5/qN7 at ov decades — rounds x durable-stage I/O, previously
  * unprobed), `dbscan` (qH6/qO9 on the standard shards, embeddings
  * grow with sf), `gated` (qS0's boilerplate-gated containment chain
  * on the ov corpus — the posture SCALE.md prescribes, demonstrated),
  * `aborder` (per-QUERY A/B of the df-order default via
  * -Dgraft.dedup.valueOrder, VERDICT r12 #2), `screens` (end-to-end
  * micro-batch cost of the web/ANN screens against decade-scale
  * standing indexes on the layered layout).
  *
  * Round-14 legs: `prune` (per-batch wall + task input bytes of the
  * web/ANN screens at decades, pruning off vs AutoPrune — the
  * read-side bound, measured), `screens2` (the minhash + media
  * screens' end-to-end decade rows, the r13 web/ANN table's
  * siblings; media runs maxPosting=64 so every measured trigger
  * exercises the hot-band sidecar).
  *
  * Round-15 legs: `pruneengage` (AutoPrune's ENGAGE regime — a
  * 2^26-row synthetic web-screen index, the floor where auto-N turns
  * on, wall pruned vs unpruned across a batch-size sweep;
  * self-generating, needs no GenScale corpus; NOT in `all` — it seeds
  * two 67M-row indexes and runs ~17 min on its own; read-bytes
  * companion: [[EngageReadDiag]] on a preserved base copy, because
  * the task-level input meter under-reports the standing scan inside
  * foreachBatch), `screens2cap` (the minhash decade rows at
  * maxPosting=64 — every measured trigger takes its exclusion from
  * the band_key sidecar).
  *
  * Usage: Test/runMain graft.tools.OverlapProbe
  *   [jppv|jppdf|cpp|band|queries|graph|dbscan|gated|gatedov|dfgated|
  *    aborder|screens|prune|screens2|screens2cap|pruneengage|all]
  * The ov legs need `GenScale ov`; gatedov needs `GenScale ovl`;
  * dbscan/aborder/screens/prune/screens2 need `GenScale` (+ sf10).
  * Legs whose corpus is missing are SKIPPED with a message instead of
  * crashing an hours-long run.
  * Results recorded in SCALE.md round-12/13/14 sections.
  */
object OverlapProbe {
  def main(args: Array[String]): Unit = {
    val which = if (args.isEmpty) Set("all") else args.toSet
    // each (dir, file) names the table the leg actually READS — an
    // OR over file types would pass the guard on documents and still
    // crash an embeddings leg mid-run (round-13 review find)
    def want(k: String) = which.contains("all") || which.contains(k)
    def wantWith(k: String, needs: (String, String)*): Boolean = {
      val w = want(k)
      val missing = needs.filterNot { case (d, f) =>
        new java.io.File(s"$d/$f").exists() }
      if (w && missing.nonEmpty)
        println(s"[ov] SKIP $k: missing " + missing.map {
          case (d, f) => s"$d/$f" }.mkString(", ") +
          " (run GenScale first)")
      w && missing.isEmpty
    }
    def docsIn(dirs: String*) = dirs.map(_ -> "documents.parquet")
    def embIn(dirs: String*) = dirs.map(_ -> "embeddings.parquet")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String, runs: Int = 2)(mk: => DataFrame): Unit = {
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[ov] $label%-34s min ${times.min}%7.2f s  " +
        s"(${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    def docs(dir: String) = Tables.load(spark, dir, "documents")
    val (small, mid, sf1, sf10) = ("target/ov/small", "target/ov/mid",
      "target/ov/sf1", "target/ov/sf10")

    if (wantWith("jppv", docsIn(small, mid): _*)) {
      // value-ordered melt demo: ONE decade only (the sf1 run would be
      // the 10^9-candidate block this probe exists to demonstrate)
      // dfOrdered = false EXPLICITLY: the round-12 default flip made
      // df-order the default, so an implicit call here would measure
      // df order under a "value-ordered" label and the SCALE.md melt
      // numbers would stop being reproducible (ADVICE r12)
      timed("jpp value-ordered ov-small") {
        Dedup.ngramJaccardPrefixPairs(docs(small), "doc_id", "text",
          3, 0.5, dfOrdered = false)
      }
      timed("jpp value-ordered ov-mid") {
        Dedup.ngramJaccardPrefixPairs(docs(mid), "doc_id", "text",
          3, 0.5, dfOrdered = false)
      }
    }
    if (wantWith("jppdf", docsIn(mid, sf1, sf10): _*)) {
      timed("jpp df-ordered ov-mid") {
        Dedup.ngramJaccardPrefixPairs(docs(mid), "doc_id", "text",
          3, 0.5, dfOrdered = true)
      }
      timed("jpp df-ordered ov-sf1") {
        Dedup.ngramJaccardPrefixPairs(docs(sf1), "doc_id", "text",
          3, 0.5, dfOrdered = true)
      }
      timed("jpp df-ordered ov-sf10") {
        Dedup.ngramJaccardPrefixPairs(docs(sf10), "doc_id", "text",
          3, 0.5, dfOrdered = true)
      }
    }
    if (wantWith("cpp", docsIn(small, mid, sf1, sf10): _*)) {
      timed("cpp value-ordered ov-small") {
        Dedup.containmentPrefixPairs(docs(small), "doc_id", "text",
          3, 0.6, dfOrdered = false)
      }
      timed("cpp value-ordered ov-mid") {
        Dedup.containmentPrefixPairs(docs(mid), "doc_id", "text",
          3, 0.6, dfOrdered = false)
      }
      timed("cpp df-ordered ov-mid") {
        Dedup.containmentPrefixPairs(docs(mid), "doc_id", "text",
          3, 0.6, dfOrdered = true)
      }
      timed("cpp df-ordered ov-sf1") {
        Dedup.containmentPrefixPairs(docs(sf1), "doc_id", "text",
          3, 0.6, dfOrdered = true)
      }
      timed("cpp df-ordered ov-sf10") {
        Dedup.containmentPrefixPairs(docs(sf10), "doc_id", "text",
          3, 0.6, dfOrdered = true)
      }
    }
    if (wantWith("band", docsIn(mid, sf1, sf10): _*)) {
      // UNCAPPED melted at exp 2.0/decade (4.5 -> 538 s, recorded in
      // SCALE.md): boilerplate-dominated docs share band keys across
      // every shard, so bucket occupancy grows ∝ n. The declared
      // queries now carry maxBucket=256 — measure the capped shape.
      for ((name, dir) <- Seq("ov-mid" -> mid, "ov-sf1" -> sf1,
          "ov-sf10" -> sf10))
        timed(s"minhash bands cap256 $name") {
          Dedup.minhashLshPairs(docs(dir), "doc_id", "text",
            shingleN = 3, bands = 8, rowsPerBand = 4, threshold = 0.5,
            maxBucket = 256)
        }
    }
    if (wantWith("graph", docsIn(mid, sf1, sf10): _*)) {
      // the iterative graph loops: generators are probed, the LOOPS
      // (rounds x durable-stage I/O, pointer-jumping convergence on
      // boilerplate-dense components) were not (VERDICT r12 #2)
      for (qn <- Seq("qA1_pagerank_dedup_graph", "qE6_triangle_count",
          "qM4_label_prop_step", "qM5_clustering_coeff",
          "qN7_kcore_step")) {
        val q = SparkEntry.allQueries.find(_.name == qn).get
        // untimed warm-up on the smallest corpus: the staged-loop
        // plans pay ~20 s of first-execution janino codegen
        q.run(spark, mid).write.format("noop").mode("overwrite").save()
        for ((label, dir) <- Seq("ov-mid" -> mid, "ov-sf1" -> sf1,
            "ov-sf10" -> sf10))
          timed(s"$qn @$label")(q.run(spark, dir))
      }
    }
    if (wantWith("dbscan", embIn("/root/repo/target/sf1", "/root/repo/target/sf10"): _*)) {
      // DBSCAN loops run over embeddings (the ov corpus has none);
      // the standard shards grow embeddings with sf, which is the
      // rounds-x-stage-I/O axis these loops were never probed on
      // qH6 (EXACT dbscan) stops at sf1 BY DESIGN: its neighbor
      // stage is all-pairs exact cosine, so the true answer itself is
      // ~p*n^2 pairs (p ~ 0.8% at t=0.3) -- 1.5e9 pairs at sf10 OOMs
      // an 8g JVM on the ANSWER, not on an index defect. qO9 is the
      // declared scale path (LSH cells); it runs the full range.
      for ((qn, dirs) <- Seq(
          "qH6_dbscan" -> Seq(
            "sf0.1" -> "/root/testdata/sf0.1",
            "sf1" -> "/root/repo/target/sf1"),
          "qO9_dbscan_lsh" -> Seq(
            "sf0.1" -> "/root/testdata/sf0.1",
            "sf1" -> "/root/repo/target/sf1",
            "sf10" -> "/root/repo/target/sf10"))) {
        val q = SparkEntry.allQueries.find(_.name == qn).get
        q.run(spark, "/root/testdata/sf0.1")
          .write.format("noop").mode("overwrite").save()
        for ((label, dir) <- dirs)
          timed(s"$qn @$label")(q.run(spark, dir))
      }
    }
    if (wantWith("gated", docsIn(mid, sf1, sf10): _*)) {
      // the declared boilerplate-gated containment chain on the ov
      // corpus: the C4 gate strips the shared tail BEFORE pairing --
      // this is the <0.5/decade operating shape the cpp adjudication
      // promises (ungated cpp is output-bound linear on ov)
      val q = SparkEntry.allQueries.find(_.name == "qS0_gated_containment").get
      for ((label, dir) <- Seq("ov-mid" -> mid, "ov-sf1" -> sf1,
          "ov-sf10" -> sf10))
        timed(s"qS0_gated_containment @$label")(q.run(spark, dir))
    }
    if (wantWith("gatedov", docsIn("target/ovl/mid", "target/ovl/sf1", "target/ovl/sf10"): _*)) {
      // the SAME gate -> containment composition as qS0, run directly
      // on the line-structured ovl corpora (GenScale ovl: boilerplate
      // tail on its own unterminated line, the separable web shape the
      // posture presumes): the C4 line gate drops the tail, so the
      // pair stage sees salted-disjoint shingles only -- this is the
      // <0.5/decade operating shape the cpp adjudication promises.
      import graft.operators.{Dedup => D, TextAnalysis}
      for ((label, dir) <- Seq("ovl-mid" -> "target/ovl/mid",
          "ovl-sf1" -> "target/ovl/sf1", "ovl-sf10" -> "target/ovl/sf10"))
        timed(s"gated cpp chain $label") {
          val cleaned = TextAnalysis.c4LineFilters(
            docs(dir).select(col("doc_id"), col("text")),
            "doc_id", "text")
            .where(col("n_kept_lines") > 0)
            .select(col("doc_id"),
              regexp_replace(col("clean_text"), "\n", " ").as("text"))
          D.containmentPrefixPairs(cleaned, "doc_id", "text",
            n = 3, threshold = 0.6)
        }
    }
    if (wantWith("dfgated", docsIn(mid, sf1, sf10): _*)) {
      // the INLINE-boilerplate posture on the RAW ov corpus (VERDICT
      // r13 #8): every ov doc shares 10 corpus-wide hot shingles with
      // NO line structure — qS0's line gate has nothing to strip, but
      // the df gate drops them by measurement before pairing; this is
      // the declared qS1 composition (threshold 0.6, frac 0.5)
      for ((label, dir) <- Seq("ov-mid" -> mid, "ov-sf1" -> sf1,
          "ov-sf10" -> sf10)) {
        timed(s"df-gated cpp $label") {
          Dedup.containmentPrefixPairsDfGated(docs(dir), "doc_id",
            "text", 3, 0.6, maxDfFrac = 0.5)
        }
        // output size is the adjudication evidence: post-gate true
        // pairs are ov's WITHIN-shard near-dup structure x shards
        // (cross-shard overlap is only the now-dropped tail), so the
        // answer itself grows ~linearly with n — an exact operator
        // cannot emit fewer rows than the answer
        val n = Dedup.containmentPrefixPairsDfGated(docs(dir), "doc_id",
          "text", 3, 0.6, maxDfFrac = 0.5).count()
        println(s"[ov]   df-gated pairs $label = $n")
      }
    }
    if (want("aborder")) {
      // per-QUERY A/B of the df-order default (VERDICT r12 #2: the
      // operator-grain A/B said FREE, the consuming queries regressed
      // 13-29%) -- flip the JVM default between passes, same session
      val qs = Seq("qA0_containment_pairs", "qA1_pagerank_dedup_graph",
        "qE6_triangle_count", "qM4_label_prop_step",
        "qM5_clustering_coeff", "qN7_kcore_step")
      for (valueOrder <- Seq(false, true)) {
        System.setProperty("graft.dedup.valueOrder", valueOrder.toString)
        val tag = if (valueOrder) "value" else "df"
        for (qn <- qs) {
          val q = SparkEntry.allQueries.find(_.name == qn).get
          // untimed warm-up, the Bench discipline: the staged-loop
          // plans pay ~20 s of janino codegen on their first JVM
          // execution, which otherwise lands in run 1 of the A/B
          q.run(spark, "/root/testdata/sf0.1")
            .write.format("noop").mode("overwrite").save()
          timed(s"$qn order=$tag @sf0.1")(
            q.run(spark, "/root/testdata/sf0.1"))
        }
      }
      System.clearProperty("graft.dedup.valueOrder")
    }
    if (wantWith("screens", (docsIn(mid, sf1, sf10) ++ embIn("/root/repo/target/sf1", "/root/repo/target/sf10")): _*)) {
      // end-to-end micro-batch cost of the streaming screens against
      // decade-scale standing indexes: the CORPUS arrives first (one
      // batch per part file under maxFilesPerTrigger=1 — at ov-sf10
      // that is ~32 leading corpus batches, realistically crossing a
      // mid-ingest compaction), then three FIXED 500-row drops, which
      // are therefore the LAST THREE batch ids in the report line;
      // per-batch durations come from recentProgress.
      // With the layered merge the small batches pay the screen JOIN
      // (one read of the standing state) plus an O(batch) delta write
      // -- never an index rewrite; the delta/base byte split is
      // printed to prove it.
      import graft.streaming.Ingest
      def report(label: String,
          q: org.apache.spark.sql.streaming.StreamingQuery,
          idxDir: String): Unit = {
        val batches = q.recentProgress
          .map(p => f"b${p.batchId}%d:${p.batchDuration / 1000.0}%.2fs")
          .mkString(" ")
        val layers = new java.io.File(idxDir).listFiles()
          .filter(_.getName.startsWith("v_")).sortBy(_.getName)
          .map(d => s"${d.getName.drop(19)}=" +
            s"${d.listFiles().filter(_.isFile).map(_.length()).sum / 1024}KB")
          .mkString(" ")
        println(s"[ov] $label  $batches  layers[$layers]")
      }
      for ((label, dir) <- Seq("ov-mid" -> mid, "ov-sf1" -> sf1,
          "ov-sf10" -> sf10)) {
        val corpus = docs(dir).select(col("doc_id"), col("text"))
        val root = java.nio.file.Files
          .createTempDirectory("scrprobe").toFile.getAbsolutePath
        def page(c: org.apache.spark.sql.Column) =
          concat(lit("<html><body><p>"), c, lit("</p></body></html>"))
        // drop0 = the corpus (builds the standing index); drops 1-3 =
        // 500 docs each, half exact duplicates, half novel
        corpus.select(col("doc_id"), page(col("text")).as("html"))
          .write.parquet(s"$root/in/drop0")
        for (k <- 1 to 3)
          corpus.limit(250)
            .select((col("doc_id") + 1000000000000L + 10000000L * k).as("doc_id"),
              col("text"))
            .unionAll(corpus.limit(250)
              .select((col("doc_id") + 2000000000000L + 10000000L * k).as("doc_id"),
                concat(col("text"), lit(s" novel tail $k")).as("text")))
            .select(col("doc_id"), page(col("text")).as("html"))
            .repartition(1).write.parquet(s"$root/in/drop$k")
        val schema = spark.read.parquet(s"$root/in/drop1").schema
        val stream = Ingest.streamTable(spark, s"$root/in/drop*",
          schema, maxFilesPerTrigger = 1)
        val q = Ingest.startWebScreen(stream, "doc_id", "html",
          idxDir = s"$root/idx", outDir = s"$root/out",
          checkpointDir = s"$root/ck")
        q.awaitTermination(600000)
        report(s"webscreen 500-doc batches $label", q, s"$root/idx")
      }
      // ANN screen at embedding decades (standard shards)
      for ((label, dir) <- Seq(
          "sf0.1" -> "/root/testdata/sf0.1",
          "sf1" -> "/root/repo/target/sf1",
          "sf10" -> "/root/repo/target/sf10")) {
        val emb = Tables.load(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val root = java.nio.file.Files
          .createTempDirectory("annprobe").toFile.getAbsolutePath
        val planes = graft.operators.Similarity.adaptivePlanes(emb.count())
        val seedIndex = graft.operators.Dedup.embeddingLshIndex(
          emb, "vec_id", "embedding", planes).localCheckpoint()
        // drops 1-3: 500 vectors each, duplicates of the corpus (the
        // screen's match path); the seed folds into batch 0's base
        for (k <- 1 to 3)
          emb.limit(500)
            .select((col("vec_id") + 1000000000000L + 10000000L * k).as("vec_id"),
              col("embedding"))
            .repartition(1).write.parquet(s"$root/in/drop$k")
        val schema = spark.read.parquet(s"$root/in/drop1").schema
        val stream = Ingest.streamTable(spark, s"$root/in/drop*",
          schema, maxFilesPerTrigger = 1)
        val q = Ingest.startAnnScreen(stream, "vec_id", "embedding",
          seedIndex, planes, threshold = 0.95,
          idxDir = s"$root/idx", outDir = s"$root/out",
          checkpointDir = s"$root/ck")
        q.awaitTermination(600000)
        report(s"annscreen 500-vec batches $label", q, s"$root/idx")
      }
    }
    // ---- round-14 legs --------------------------------------------
    // shared bytes-read meter for the prune/screens2 legs: task input
    // bytes accumulate on the listener bus; snapshots sleep past the
    // bus lag, so per-window deltas are honest to ~the last task
    lazy val bytesRead = {
      val acc = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val tm = te.taskMetrics
            if (tm != null) { acc.addAndGet(tm.inputMetrics.bytesRead); () }
          }
        })
      acc
    }
    def measured(label: String)(body: => Double): Unit = {
      Thread.sleep(1200); val b0 = bytesRead.get
      val t0 = System.nanoTime()
      val batchSec = body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1200); val b1 = bytesRead.get
      println(f"[ov] $label%-52s wall ${wall}%6.2f s  " +
        f"batch ${batchSec}%6.2f s  read ${(b1 - b0) / 1048576.0}%9.1f MB")
    }
    def await(q: org.apache.spark.sql.streaming.StreamingQuery): Double = {
      // 1h cap: an AvailableNow query terminates on its own; a cap a
      // big seed can outrun would leave the stream RUNNING while the
      // protocol moves on (the 2^27 engage seed outran a 10-min cap —
      // every row after it was garbage), so a breach now fails loudly
      // instead of corrupting every subsequent measurement
      if (!q.awaitTermination(3600000))
        sys.error(s"stream ${q.name} outran the await cap; " +
          "measurements past this point would be invalid")
      q.recentProgress.lastOption.map(_.batchDuration / 1000.0)
        .getOrElse(-1.0)
    }
    def page(c: org.apache.spark.sql.Column) =
      concat(lit("<html><body><p>"), c, lit("</p></body></html>"))
    def tmpRoot(tag: String) = java.nio.file.Files
      .createTempDirectory(tag).toFile.getAbsolutePath

    if (wantWith("prune", docsIn(mid, sf1, sf10): _*)) {
      // read-side bound at decades (VERDICT r14 #2): the standing
      // index is seeded as ONE compacted bucket-partitioned base
      // (drop0 = the whole corpus in one batch, compactEvery=2 so the
      // seed batch compacts); drops 1-3 restart the screen with
      // compactEvery=999 so every measured batch is a pure
      // pruned-read + screen + delta write — per-batch wall AND task
      // input bytes, pruning off vs AutoPrune
      import graft.streaming.Ingest
      bytesRead.get // install the listener before the first window
      // manual N=64: AutoPrune DECLINES at these index sizes by
      // design (the first run of this leg, with the old 256-row
      // target, measured the small-bucket regime as a 2-4x loss —
      // SCALE.md r14 — which is what set the auto floor); the manual
      // leg keeps a regression watch on the prune machinery overhead
      for ((label, dir) <- Seq("ov-mid" -> mid, "ov-sf1" -> sf1,
          "ov-sf10" -> sf10); pruneN <- Seq(0, 64)) {
        val tag = if (pruneN == 0) "off" else s"n$pruneN"
        val corpus = docs(dir).select(col("doc_id"), col("text"))
        val root = tmpRoot("pruneweb")
        corpus.select(col("doc_id"), page(col("text")).as("html"))
          .write.parquet(s"$root/in/drop0")
        val schema = spark.read.parquet(s"$root/in/drop0").schema
        def screen(ce: Int): Double = await(Ingest.startWebScreen(
          Ingest.streamTable(spark, s"$root/in/drop*", schema),
          "doc_id", "html", s"$root/idx", s"$root/out", s"$root/ck",
          compactEvery = ce, pruneBuckets = pruneN))
        screen(2) // corpus batch -> compacted (partitioned) base
        for (k <- 1 to 3) {
          corpus.limit(250)
            .select((col("doc_id") + 1000000000000L + 10000000L * k).as("doc_id"),
              col("text"))
            .unionAll(corpus.limit(250)
              .select((col("doc_id") + 2000000000000L + 10000000L * k).as("doc_id"),
                concat(col("text"), lit(s" novel tail $k")).as("text")))
            .select(col("doc_id"), page(col("text")).as("html"))
            .repartition(1).write.parquet(s"$root/in/drop$k")
          measured(s"webscreen prune=$tag drop$k @$label")(screen(999))
        }
        println(s"[ov]   web @$label prune=$tag layout N = " +
          Ingest.standingIndexPruneN(spark, s"$root/idx"))
      }
      // ANN screen: embeddings grow with sf on the standard shards
      for ((label, dir) <- Seq(
          "sf0.1" -> "/root/testdata/sf0.1",
          "sf1" -> "/root/repo/target/sf1",
          "sf10" -> "/root/repo/target/sf10")
            if new java.io.File(s"$dir/embeddings.parquet").exists();
          pruneN <- Seq(0, 64)) {
        val tag = if (pruneN == 0) "off" else s"n$pruneN"
        val emb = Tables.load(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val planes = graft.operators.Similarity.adaptivePlanes(emb.count())
        val seedEmpty = graft.operators.Dedup.embeddingLshIndex(
          emb.limit(0), "vec_id", "embedding", planes).localCheckpoint()
        val root = tmpRoot("pruneann")
        emb.write.parquet(s"$root/in/drop0")
        val schema = spark.read.parquet(s"$root/in/drop0").schema
        def screen(ce: Int): Double = await(Ingest.startAnnScreen(
          Ingest.streamTable(spark, s"$root/in/drop*", schema),
          "vec_id", "embedding", seedEmpty, planes, threshold = 0.95,
          idxDir = s"$root/idx", outDir = s"$root/out",
          checkpointDir = s"$root/ck",
          compactEvery = ce, pruneBuckets = pruneN))
        screen(2)
        for (k <- 1 to 3) {
          emb.limit(500)
            .select((col("vec_id") + 1000000000000L + 10000000L * k).as("vec_id"),
              col("embedding"))
            .repartition(1).write.parquet(s"$root/in/drop$k")
          measured(s"annscreen prune=$tag drop$k @$label")(screen(999))
        }
        println(s"[ov]   ann @$label prune=$tag layout N = " +
          Ingest.standingIndexPruneN(spark, s"$root/idx"))
      }
    }

    // explicitly requested only (never part of `all`): seeds two
    // 67M-row indexes, ~30-60 min on its own
    if (which.contains("pruneengage")) {
      // AutoPrune's ENGAGE regime, measured (VERDICT r14 #1): a
      // standing web-screen index at exactly the 2^26-row floor — the
      // smallest index where autoPruneN engages (N = 512, 128k-row
      // buckets) — seeded through the REAL lifecycle (drop0 = the
      // whole corpus in one batch, compactEvery=2 so the seed
      // compaction itself adopts auto-N), then measured drops at
      // three batch sizes with pruning AUTO vs OFF: per-batch wall +
      // task input bytes. The batch-size sweep (512/64/8 rows) maps
      // the 100 TB claim into the sandbox: the pruned read should
      // scale with the BATCH'S BUCKET SHARE (~62%/12%/1.6% of 512
      // buckets) while the unpruned read stays pinned at the full
      // index. Self-generating (no GenScale corpus needed).
      import graft.streaming.Ingest
      bytesRead.get // install the listener before the first window
      // -Dgraft.engage.rows=... shrinks the corpus for a mechanics
      // smoke (auto declines below the floor, but the whole protocol
      // still runs); the MEASUREMENT is the 2^26 default
      val nRows = sys.props.get("graft.engage.rows")
        .map(_.toLong).getOrElse(1L << 26)
      // honest labels when -Dgraft.engage.rows overrides the floor
      // (e.g. the 2^27 / N=1024 second engage point)
      val expo = 63 - java.lang.Long.numberOfLeadingZeros(nRows)
      // >= 25 chars after extraction (HtmlOps.MinBlockChars) and
      // unique per id => 2^26 distinct content hashes
      def baseText(c: org.apache.spark.sql.Column) =
        concat(lit("synthetic prune engage probe content block row "), c)
      // baseline (off) runs FIRST so residual JVM warmup lands on it,
      // keeping any pruned-side win conservative; each tag also gets
      // its own untimed warmup drop so the per-drop plan shapes are
      // janino-compiled before the measured windows
      for ((tag, pruneN) <- Seq("off" -> 0, "auto" -> Ingest.AutoPrune)) {
        val root = tmpRoot("pruneengage")
        spark.range(nRows).select(col("id").as("doc_id"),
            page(baseText(col("id"))).as("html"))
          .write.parquet(s"$root/in/drop0")
        val schema = spark.read.parquet(s"$root/in/drop0").schema
        def screen(ce: Int): Double = await(Ingest.startWebScreen(
          Ingest.streamTable(spark, s"$root/in/drop*", schema),
          "doc_id", "html", s"$root/idx", s"$root/out", s"$root/ck",
          compactEvery = ce, pruneBuckets = pruneN))
        measured(s"webscreen engage seed 2^$expo prune=$tag")(screen(2))
        def mkDrop(k: Int, bs: Int): Unit = {
          val half = bs / 2
          spark.range(half).select(
              (col("id") + 1000000000000L + 10000000L * k).as("doc_id"),
              baseText(col("id")).as("text"))
            .unionAll(spark.range(half).select(
              (col("id") + 2000000000000L + 10000000L * k).as("doc_id"),
              concat(baseText(col("id")), lit(s" novel tail $k"))
                .as("text")))
            .select(col("doc_id"), page(col("text")).as("html"))
            .repartition(1).write.parquet(s"$root/in/drop$k")
        }
        mkDrop(9, 512); screen(999) // untimed per-tag warmup
        for ((bs, k) <- Seq((512, 1), (512, 2), (64, 3), (64, 4),
            (8, 5), (8, 6))) {
          mkDrop(k, bs)
          measured(f"webscreen engage bs=$bs%3d drop$k prune=$tag")(
            screen(999))
        }
        println(s"[ov]   engage prune=$tag layout N = " +
          Ingest.standingIndexPruneN(spark, s"$root/idx"))
        Ingest.describeIndex(spark, s"$root/idx")
          .select("name", "kind", "live", "bytes", "files")
          .collect().foreach(r => println(s"[ov]   engage $tag idx: $r"))
        // reclaim the ~8 GB per tag before the next seed
        val rp = new org.apache.hadoop.fs.Path(root)
        rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(rp, true)
        ()
      }
    }

    if (wantWith("screens2cap", docsIn(mid, sf1, sf10): _*)) {
      // the CAPPED minhash screen's decade rows (VERDICT r14 #3):
      // same protocol as the screens2 minhash series with
      // maxPosting=64, so every measured trigger takes its hot-band
      // exclusion from the compaction sidecar (generalized to
      // band_key) instead of a second index aggregation
      // round-16 (VERDICT r15 #6): a CAP-SENSITIVITY grid around the
      // measured 64 — maxPosting 16 and 256 at the same decades, so the
      // exclusion's cost/benefit is demonstrably not a knife-edge at
      // the chosen cap (caps overridable: -Dgraft.screens2cap.caps)
      import graft.streaming.Ingest
      bytesRead.get
      val caps = sys.props.get("graft.screens2cap.caps")
        .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(16, 64, 256))
      for (cap <- caps;
          (label, dir) <- Seq("ov-mid" -> mid, "ov-sf1" -> sf1,
            "ov-sf10" -> sf10)) {
        val corpus = docs(dir).select(col("doc_id"), col("text"))
        val root = tmpRoot("mhscreencap")
        corpus.write.parquet(s"$root/in/drop0")
        val schema = spark.read.parquet(s"$root/in/drop0").schema
        val seedEmpty = graft.operators.Dedup.lshBandIndex(
          corpus.limit(0), "doc_id", "text", 3, 8, 4).localCheckpoint()
        def screen(ce: Int): Double = await(Ingest.startMinhashScreen(
          Ingest.streamTable(spark, s"$root/in/drop*", schema),
          "doc_id", "text", seedEmpty, 3, 8, 4, 0.5,
          s"$root/idx", s"$root/out", s"$root/ck", compactEvery = ce,
          maxPosting = cap))
        screen(2)
        for (k <- 1 to 3) {
          corpus.limit(250)
            .select((col("doc_id") + 1000000000000L + 10000000L * k).as("doc_id"),
              col("text"))
            .unionAll(corpus.limit(250)
              .select((col("doc_id") + 2000000000000L + 10000000L * k).as("doc_id"),
                concat(col("text"), lit(s" novel tail $k")).as("text")))
            .repartition(1).write.parquet(s"$root/in/drop$k")
          measured(s"minhashscreen cap=$cap drop$k @$label")(screen(999))
        }
        println(s"[ov]   minhash cap=$cap @$label sidecar = " +
          new java.io.File(s"$root/idx").listFiles()
            .map(_.getName).filter(_.contains(s"s_c$cap")).mkString(","))
        val rp = new org.apache.hadoop.fs.Path(root)
        rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(rp, true)
      }
    }

    if (wantWith("screens2", docsIn(mid, sf1, sf10): _*)) {
      // the minhash + media screens' end-to-end decade rows (VERDICT
      // r14 #4) — same protocol as the r13 web/ANN table: standing
      // index seeded from the corpus, then three 500-row drops (half
      // exact duplicates, half novel), per-batch wall + read bytes
      import graft.streaming.Ingest
      bytesRead.get
      for ((label, dir) <- Seq("ov-mid" -> mid, "ov-sf1" -> sf1,
          "ov-sf10" -> sf10)) {
        val corpus = docs(dir).select(col("doc_id"), col("text"))
        val root = tmpRoot("mhscreen")
        corpus.write.parquet(s"$root/in/drop0")
        val schema = spark.read.parquet(s"$root/in/drop0").schema
        val seedEmpty = graft.operators.Dedup.lshBandIndex(
          corpus.limit(0), "doc_id", "text", 3, 8, 4).localCheckpoint()
        def screen(ce: Int): Double = await(Ingest.startMinhashScreen(
          Ingest.streamTable(spark, s"$root/in/drop*", schema),
          "doc_id", "text", seedEmpty, 3, 8, 4, 0.5,
          s"$root/idx", s"$root/out", s"$root/ck", compactEvery = ce))
        screen(2)
        for (k <- 1 to 3) {
          corpus.limit(250)
            .select((col("doc_id") + 1000000000000L + 10000000L * k).as("doc_id"),
              col("text"))
            .unionAll(corpus.limit(250)
              .select((col("doc_id") + 2000000000000L + 10000000L * k).as("doc_id"),
                concat(col("text"), lit(s" novel tail $k")).as("text")))
            .repartition(1).write.parquet(s"$root/in/drop$k")
          measured(s"minhashscreen drop$k @$label")(screen(999))
        }
      }
      // media screen: deterministic P5 images synthesized per id (the
      // InfraSpec generator), corpus size matched to the doc decades;
      // maxPosting=64 exercises the compaction-time hot-band sidecar
      // on every measured trigger
      val mkImg = udf(graft.TestImages.p5 _)
      def imgs(ids: org.apache.spark.sql.DataFrame) = ids
        .select(col("doc_id"), mkImg(col("seed")).as("media"),
          lit("image/x-portable-graymap").as("mime"))
        .withColumn("n_bytes", octet_length(col("media")).cast("long"))
      for ((label, n) <- Seq("5k" -> 5000L, "50k" -> 50000L,
          "500k" -> 500000L)) {
        val root = tmpRoot("medscreen")
        imgs(spark.range(n).select(col("id").as("doc_id"),
            col("id").as("seed")))
          .write.parquet(s"$root/in/drop0")
        val schema = spark.read.parquet(s"$root/in/drop0").schema
        val seedEmpty = graft.operators.Dedup.codeBandIndex(
          spark.range(0).select(col("id").as("doc_id"),
            col("id").as("dhash")), "doc_id", "dhash", 56, 7)
          .localCheckpoint()
        def screen(ce: Int): Double = await(Ingest.startMediaScreen(
          Ingest.streamTable(spark, s"$root/in/drop*", schema),
          seedEmpty, 56, 6, 7, maxPosting = 64,
          idxDir = s"$root/idx", outDir = s"$root/out",
          checkpointDir = s"$root/ck", compactEvery = ce))
        screen(2)
        for (k <- 1 to 3) {
          imgs(spark.range(250).select(
              (col("id") + 1000000000000L + 10000000L * k).as("doc_id"),
              col("id").as("seed"))
            .unionAll(spark.range(250).select(
              (col("id") + 2000000000000L + 10000000L * k).as("doc_id"),
              (col("id") + 50000000L * k).as("seed"))))
            .repartition(1).write.parquet(s"$root/in/drop$k")
          measured(s"mediascreen drop$k @$label")(screen(999))
        }
      }
    }

    val explicitQs =
      which.filter(w => w.startsWith("q") && w != "queries").toSeq.sorted
    if (want("queries") || explicitQs.nonEmpty) {
      // never-probed declared families on the standard disjoint shards
      // (documents+embeddings only at sf10); pass query-name prefixes
      // to probe a subset
      val explicit = explicitQs
      val qs = if (explicit.nonEmpty) explicit.map(p =>
          SparkEntry.allQueries.find(_.name.startsWith(p)).get.name)
        else Seq("q32_dedup_minhash_lsh", "q74_incremental_dedup",
          "qC7_semdedup", "qE5_ann_ivf_pq", "qB5_ann_ivf_multiprobe",
          "qG5_winnow_pairs", "qF9_winnow_fingerprints",
          "qE9_sorted_neighborhood")
      for (qn <- qs; (label, dir) <- Seq(
          "sf0.1" -> "/root/testdata/sf0.1",
          "sf1" -> "/root/repo/target/sf1",
          "sf10" -> "/root/repo/target/sf10")) {
        val q = SparkEntry.allQueries.find(_.name == qn).get
        timed(s"$qn @$label")(q.run(spark, dir))
      }
    }
    spark.stop()
  }
}
