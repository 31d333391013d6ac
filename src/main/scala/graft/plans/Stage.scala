package graft.plans

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

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
  *
  * Namespacing & lifetime: every session's stages live under
  * `<root>/<applicationId>[-<sessionUUID>]` — two concurrent drivers
  * (or two sessions in one application) sharing a configured stage
  * root can never overwrite each other's stage tables mid-read. The
  * per-session root is deleted on clean JVM shutdown (best-effort,
  * registered before Hadoop closes its FileSystems), so iterative
  * operators don't grow stage storage without bound; after a crash
  * the orphaned root is identifiable by its applicationId.
  */
object Stage {

  /** Conf key for the stage-table root directory. Point this at a
    * durable shared filesystem on a real cluster. */
  val DirKey = "graft.stage.dir"

  private val seq = new AtomicLong(0)
  private val cleanupRegistered = new ConcurrentHashMap[String, java.lang.Boolean]()

  /** Per-session stage root: configured roots are shared, so they get
    * the full application+session namespace (ADVICE r10); the local
    * default is already per-application scratch under the build
    * target, so concurrent test/bench JVMs never collide. */
  private def stageRoot(spark: SparkSession): String = {
    val base = spark.conf.getOption(DirKey) match {
      case Some(dir) =>
        // session discriminator: two SparkSessions in one application
        // (notebook forks, test suites) must not share stage paths
        s"$dir/${spark.sparkContext.applicationId}-" +
          Integer.toHexString(System.identityHashCode(spark))
      case None =>
        s"target/stage/${spark.sparkContext.applicationId}"
    }
    registerCleanup(spark, base)
    base
  }

  /** Delete this session's stage root on JVM shutdown. Registered via
    * Hadoop's ShutdownHookManager at a priority above the FileSystem
    * close hook (10), so the delete still has a live FS. Best-effort:
    * a crash leaves the root behind, which is the durability point. */
  private def registerCleanup(spark: SparkSession, base: String): Unit =
    if (cleanupRegistered.putIfAbsent(base, java.lang.Boolean.TRUE) == null) {
      val hconf = spark.sparkContext.hadoopConfiguration
      try {
        org.apache.hadoop.util.ShutdownHookManager.get.addShutdownHook(
          new Runnable {
            override def run(): Unit = try {
              val p = new Path(base)
              p.getFileSystem(hconf).delete(p, true)
              ()
            } catch { case _: Throwable => () }
          }, 50)
      } catch { case _: Throwable => () }
    }

  /** Write `df` to `<stageDir>/<name>` as parquet and return a frame
    * reading it back. Eager (the write is an action) — this IS the
    * stage boundary. Overwrite mode: re-running the same query in the
    * same session replaces the prior stage output, so a frame returned
    * by an EARLIER run must be fully consumed before the re-run (the
    * sequential bench/verify discipline); interactive callers that
    * hold results across re-runs should use [[materializeUnique]].
    */
  def materialize(df: DataFrame, name: String): DataFrame = {
    val spark = df.sparkSession
    val path = s"${stageRoot(spark)}/$name"
    val t0 = System.nanoTime()
    df.write.mode("overwrite").parquet(path)
    if (sys.env.contains("GRAFT_STAGE_DEBUG"))
      System.err.println(f"[stage] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.read.parquet(path)
  }

  /** [[materialize]] with a unique per-call suffix — for iterative
    * operators that fence a frame once per round inside one query
    * (each round's stage output must not clobber a prior round's
    * frame that is still being read). Superseded rounds are reclaimed
    * by the shutdown-hook cleanup of the session stage root. */
  def materializeUnique(df: DataFrame, name: String): DataFrame =
    materialize(df, s"${name}_${seq.incrementAndGet()}")

  /** [[materializeUnique]] for frames an iterative consumer probes on
    * the same key every round (connected-components / PageRank edge
    * tables): a plain parquet read-back loses the physical
    * partitioning, so every round's join would re-shuffle the edge
    * list — the one thing the old partitioned localCheckpoint avoided.
    * Bucketing is Spark's durable co-location primitive: the staged
    * table is written `bucketBy(buckets, bucketCol)` (an external
    * table — data under the stage root, metadata in the session's
    * in-memory catalog, both reclaimed with the session), and the
    * read-back scan reports HashPartitioning(bucketCol, buckets), so
    * each round shuffles only the (re-derived) rank/label table, never
    * the staged side. `buckets` defaults to the session's shuffle
    * parallelism so the probe side lands on the same partition count.
    */
  def materializeBucketed(df: DataFrame, name: String,
      bucketCol: String, buckets: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val nb = if (buckets > 0) buckets
      else spark.sessionState.conf.numShufflePartitions
    val unique = s"${name}_${seq.incrementAndGet()}"
    val path = s"${stageRoot(spark)}/$unique"
    val table = s"graft_stage_$unique"
    val t0 = System.nanoTime()
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(nb, bucketCol)
      .saveAsTable(table)
    if (sys.env.contains("GRAFT_STAGE_DEBUG"))
      System.err.println(f"[stage] $unique (bucketed) ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.table(table)
  }
}
