package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Parallelism floor for CPU-bound generator/decoder stages (guide
  * §2.5, the "one unsplittable input" case): a single-row-group parquet
  * file — or any single-task upstream — caps the whole downstream map
  * stage at one core, which starves per-row work (digest-based media
  * synthesis, image/audio decode, per-token hashing) that costs orders
  * of magnitude more than the scan feeding it.
  *
  * [[cpuFloor]] redistributes on a KEY COLUMN (deterministic and
  * retry-safe — no round-robin pre-sort pass) to the session's
  * parallelism, ONLY when the frame has fewer partitions than that: at
  * cluster scale the input's split count already exceeds the core
  * count and the floor is a no-op, so it adapts to the data instead of
  * encoding a local[32] constant. Call it on the LIGHTWEIGHT frame
  * (ids, keys) *below* the expensive derivation, never on generated
  * payloads — §8's rule: move a few bytes of proxy per row, then let
  * the heavy bytes be born already distributed. (The round-18 A/B that
  * motivated this measured 1.2-2.3x on the media family when the floor
  * sits under the md5 synthesis, and a 15-25% LOSS when it sits above
  * it — the payload shuffle plus a serialized generator.)
  *
  * RAW-SCAN-ONLY BY CONSTRUCTION (round-18 ADVICE): counting a frame's
  * partitions via `df.rdd` would, under AQE, materialize every
  * upstream query stage at plan-build time — and the later
  * `repartition` would silently re-execute them all. The floor
  * therefore NO-OPS unless the optimized plan is scan-shaped
  * (projections/filters over a leaf): anything else already crossed or
  * will cross a shuffle, so its parallelism is the session's anyway,
  * and the partition probe stays a metadata-only operation on the
  * plans the floor is for. (The gate reads the LOGICAL plan — the
  * physical `sparkPlan` is pre-EnsureRequirements and carries no
  * exchanges to look for.)
  *
  * `graft.scan.parallelismFloor` (session conf) overrides the floor
  * target; 0 disables.
  */
object Parallel {

  import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, Project, SubqueryAlias}

  def cpuFloor(df: DataFrame, key: String): DataFrame = {
    val spark = df.sparkSession
    val p = spark.conf.getOption("graft.scan.parallelismFloor")
      .map(_.toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)
    if (p <= 0 || df.isStreaming) return df
    // scan-shape gate BEFORE the rdd probe — see the scaladoc
    val scanShaped = df.queryExecution.optimizedPlan.find {
      case _: Project | _: Filter | _: SubqueryAlias | _: LeafNode => false
      case _ => true
    }.isEmpty
    if (scanShaped && df.rdd.getNumPartitions < p)
      df.repartition(p, col(key))
    else df
  }
}
