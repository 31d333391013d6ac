package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Round-18 scale probe (test scope, not part of the suite): the PRICE
  * of the codebook value-skew rescue (VERDICT r17 Next #4).
  *
  * `Similarity.planBlocks` switches from uniform value-range blocks to
  * approxQuantile-balanced blocks when one uniform block holds >1/32 of
  * the candidates past the rebalance floor. The switch was spec'd
  * correct and balanced in r17, but its cost claim — "one extra
  * narrow-column pass" — was asserted, never measured. This probe
  * measures it on the adversarial corpus the rescue exists for:
  * `n − 1` densely packed vids in `[0, n)` plus ONE outlier at `2^40`,
  * which drags the uniform block width to `~2^30` and collapses every
  * dense id into block 0 (single-task ranking over the whole candidate
  * set). Rows carry a 64-char payload column beside `vid`, so the
  * quantile pass's column pruning is part of what's measured — the
  * "narrow" in the claim.
  *
  * Both legs run the REAL `codebookKept` end-to-end (counts job,
  * block planning, offsets, in-block rank, keep-filter join):
  *   - `rescued`: default floor — skew detected, quantile rebucket
  *     (the engage log lands on stderr, captured for SCALE.md);
  *   - `uniform`: floor forced to Long.MaxValue — the pre-rescue
  *     plan, ranking the collapsed block in one task.
  *
  * Corpora at 2^22 and 2^24 candidates (the verdict's asked-for
  * envelope), parquet-backed under target/rescue/ (self-generating;
  * deterministic vids satisfy planBlocks' re-execution precondition).
  * min-of-2 per leg after an untimed warmup, matching the other
  * probes' methodology. Results recorded in SCALE.md round-18.
  *
  * Usage: Test/runMain graft.tools.RescueProbe  (or the plain-java
  * launcher — no scalatest dependency). NEVER run concurrently with a
  * bench or another probe.
  */
object RescueProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus(log2n: Int): String = {
      val n = 1L << log2n
      val path = s"target/rescue/c$log2n.parquet"
      if (!new java.io.File(path).exists()) {
        println(s"[rescue] generating 2^$log2n adversarial corpus at $path")
        spark.range(n).select(
          // dense cluster [0, n-1) plus one outlier at 2^40: uniform
          // width (2^40/1024 ≈ 2^30) swallows the whole cluster into
          // block 0 — the exact collapse the rescue detects
          when(col("id") === n - 1, lit(1L << 40))
            .otherwise(col("id")).as("vid"),
          // payload wide enough that skipping it is visible in the
          // quantile pass (the "narrow-column" part of the claim)
          rpad(conv(col("id"), 10, 16), 64, "x").as("payload"))
          .write.mode("overwrite").parquet(path)
      }
      path
    }

    def timed(label: String, runs: Int = 2)(work: => Long): Unit = {
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val kept = work
        ((System.nanoTime() - t0) / 1e9, kept)
      }
      println(f"[rescue] $label%-28s min ${times.map(_._1).min}%7.2f s  " +
        s"(${times.map(t => f"${t._1}%.2f").mkString(", ")})  " +
        s"kept=${times.head._2}")
    }

    for (log2n <- Seq(22, 24)) {
      val path = corpus(log2n)
      val cands = spark.read.parquet(path)
      val maxCentroids = 1024
      def run(floor: Long): Long =
        Similarity.codebookKept(cands, maxCentroids, floor).count()
      // untimed warmup (JIT + codegen), rescued path
      run(1L << 20)
      timed(s"2^$log2n rescued (quantile)") { run(1L << 20) }
      timed(s"2^$log2n uniform (collapsed)") { run(Long.MaxValue) }
    }
    spark.stop()
  }
}
