package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * Usage: Test/runMain graft.tools.OverlapProbe [jppv|jppdf|cpp|band|queries|all]
  * Results recorded in SCALE.md round-12 section.
  */
object OverlapProbe {
  def main(args: Array[String]): Unit = {
    val which = if (args.isEmpty) Set("all") else args.toSet
    def want(k: String) = which.contains("all") || which.contains(k)
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

    if (want("jppv")) {
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
    if (want("jppdf")) {
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
    if (want("cpp")) {
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
    if (want("band")) {
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
