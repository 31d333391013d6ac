package graft.plans

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame

/** Durable stage materialization — the WET-file semantics.
  *
  * A multi-stage curation chain (HTML extraction → quality gate →
  * dedup) needs a barrier after the expensive per-row extraction so
  * downstream legs rescan the *result* instead of re-evaluating the
  * extraction chain per reference. Production pipelines make that
  * barrier a table write: CommonCrawl materializes extracted text as
  * WET files next to the raw WARC, and the reference materializes
  * every parser stage as a date-partitioned table before its views
  * read it (ref: transform/web100.sql:8-13 CTAS pattern;
  * schema/README.md ingestion pipeline).
  *
  * `localCheckpoint()` is the wrong fence for that at cluster scale:
  * it truncates lineage AND pins the blocks in executor-local
  * storage, so an executor loss mid-job is unrecoverable and 100 TB
  * of extracted text must fit on executor disks. This writer is the
  * literal stage-table semantics instead — write the frame to
  * parquet under a configurable stage root and read it back:
  *
  *  - durable: blocks live on the stage filesystem, not in executor
  *    memory/disk — executor loss just re-reads the file splits;
  *  - lineage-free: the read-back plan is a plain columnar scan, so
  *    downstream self-joins/multi-leg reads cost one pruned parquet
  *    scan per leg (column pruning + predicate pushdown apply, which
  *    a checkpointed in-memory block never gives you);
  *  - cluster-ready: set `graft.stage.dir` to a shared filesystem
  *    (HDFS/S3/GCS) path in the session conf; the default keeps
  *    everything under the local build's scratch dir.
  *
  * The write preserves the upstream partitioning (one file per
  * partition); the read back re-splits by file size
  * (`spark.sql.files.maxPartitionBytes`), which is exactly what you
  * want when the staged stage is much smaller than its input (e.g.
  * extracted text vs raw HTML).
  */
object Stage {

  /** Conf key for the stage-table root directory. Point this at a
    * durable shared filesystem on a real cluster. */
  val DirKey = "graft.stage.dir"

  private val seq = new AtomicLong(0)

  /** Write `df` to `<stageDir>/<name>` as parquet and return a frame
    * reading it back. Eager (the write is an action) — this IS the
    * stage boundary. Overwrite mode: re-running the same query in the
    * same session replaces the prior stage output.
    */
  def materialize(df: DataFrame, name: String): DataFrame = {
    val spark = df.sparkSession
    val base = spark.conf.getOption(DirKey).getOrElse {
      // default: per-application scratch under the build target, so
      // concurrent test/bench JVMs never collide on a stage path
      s"target/stage/${spark.sparkContext.applicationId}"
    }
    val path = s"$base/$name"
    df.write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** [[materialize]] with a unique per-call suffix — for iterative
    * operators that fence a frame once per round inside one query
    * (each round's stage output must not clobber a prior round's
    * frame that is still being read). */
  def materializeUnique(df: DataFrame, name: String): DataFrame =
    materialize(df, s"${name}_${seq.incrementAndGet()}")
}
