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
  * `<root>/<applicationId>-<sessionHash>` — two concurrent drivers
  * (or two sessions in one application) sharing a stage root can
  * never overwrite each other's stage tables mid-read, and bucketed
  * stage CATALOG names carry the same discriminator so a persistent
  * (Hive) metastore shared by two drivers never repoints one
  * driver's stage table at the other's path. The per-session root is
  * deleted on clean JVM shutdown (best-effort, registered before
  * Hadoop closes its FileSystems); after a crash the orphaned root
  * is identifiable by its applicationId. Within a session, iterative
  * operators additionally [[reclaim]] each superseded round's stage
  * eagerly (once the next round's write has committed), so stage
  * storage during a 10k-round BPE training run or a long HashMin
  * propagation is bounded by the LIVE rounds, not the total.
  */
object Stage {

  /** Conf key for the stage-table root directory. Point this at a
    * durable shared filesystem on a real cluster. */
  val DirKey = "graft.stage.dir"

  private val seq = new AtomicLong(0)
  private val cleanupRegistered = new ConcurrentHashMap[String, java.lang.Boolean]()

  /** Staged-frame registry for in-session reclamation: the exact
    * DataFrame returned by a materialize — identity-keyed (DataFrame
    * does not override equals) and weak, so holding the registry never
    * extends a staged frame's lifetime; the shutdown hook is the
    * backstop for anything the GC collected before [[reclaim]] ran. */
  private val stagedFrames: java.util.Map[DataFrame, (String, Option[String])] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[DataFrame, (String, Option[String])]())

  /** `applicationId-sessionHash`: the namespace that makes both stage
    * paths and bucketed-stage catalog names collision-free across
    * concurrent drivers AND across sessions within one application.
    * (private[graft]: ReferenceViews stamps the same discriminator as
    * the base-table binding's owner.) */
  private[graft] def sessionNs(spark: SparkSession): String =
    s"${spark.sparkContext.applicationId}-" +
      Integer.toHexString(System.identityHashCode(spark))

  /** Per-session stage root: the application+session namespace is
    * applied in BOTH branches (ADVICE r11 — the unconfigured default
    * previously omitted the session discriminator, so two sessions in
    * one application could clobber each other's same-name plain
    * stages under target/stage). */
  private def stageRoot(spark: SparkSession): String = {
    // ABSOLUTE path always: plain `DataFrameWriter.parquet` resolves a
    // relative path against the process cwd, but `saveAsTable`'s
    // `path` option resolves against the WAREHOUSE dir — a relative
    // root would scatter plain and bucketed stages across two trees
    // (and the shutdown cleanup would miss one of them)
    val base = spark.conf.getOption(DirKey) match {
      case Some(dir) => s"$dir/${sessionNs(spark)}"
      case None =>
        new java.io.File(s"target/stage/${sessionNs(spark)}")
          .getAbsolutePath
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
    val back = spark.read.parquet(path)
    stagedFrames.put(back, (path, None))
    back
  }

  /** [[materialize]] with a unique per-call suffix — for iterative
    * operators that fence a frame once per round inside one query
    * (each round's stage output must not clobber a prior round's
    * frame that is still being read). Iterative callers [[reclaim]]
    * each superseded round eagerly; the shutdown-hook cleanup of the
    * session stage root is the backstop. */
  def materializeUnique(df: DataFrame, name: String): DataFrame =
    materialize(df, s"${name}_${seq.incrementAndGet()}")

  /** Eagerly delete a superseded stage — the storage-bound for
    * iterative operators (ADVICE r11: a 10k-merge BPE run writes the
    * full word table once per round; without in-session reclamation
    * stage storage grows linearly with rounds until JVM exit).
    *
    * `df` must be the exact frame a materialize returned, and must no
    * longer be referenced by any un-executed plan — the calling
    * pattern is "write round N+1's stage (an action), THEN reclaim
    * round N". No-op for frames this writer didn't stage (safe to
    * call unconditionally in loops whose first input is the caller's
    * un-staged frame). Bucketed stages also drop their catalog entry,
    * so a persistent metastore never accumulates dangling tables. */
  def reclaim(df: DataFrame): Unit = {
    // NonFatal only (ADVICE r12): reclamation is best-effort — the
    // shutdown hook is the backstop — but an OutOfMemoryError or an
    // interrupt must propagate, and a reclamation that persistently
    // fails should at least be observable under GRAFT_STAGE_DEBUG
    import scala.util.control.NonFatal
    def debug(msg: => String): Unit =
      if (sys.env.contains("GRAFT_STAGE_DEBUG")) System.err.println(msg)
    val entry = stagedFrames.remove(df)
    if (entry != null) {
      val (path, table) = entry
      table.foreach { tbl =>
        try df.sparkSession.sql(s"DROP TABLE IF EXISTS `$tbl`")
        catch { case NonFatal(e) =>
          debug(s"[stage] reclaim DROP TABLE $tbl failed: $e") }
      }
      try {
        val p = new Path(path)
        p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
          .delete(p, true)
        debug(s"[stage] reclaimed $path")
      } catch { case NonFatal(e) =>
        debug(s"[stage] reclaim delete $path failed: $e") }
    }
  }

  /** Test/debug hook: the staged path behind a materialized frame
    * (None if `df` is not a live staged read-back). */
  private[graft] def stagedPath(df: DataFrame): Option[String] =
    Option(stagedFrames.get(df)).map(_._1)

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
    *
    * The input is repartitioned on `bucketCol` HERE, at the
    * chokepoint: a bucketed write emits one file per bucket PER TASK,
    * so an unrepartitioned upstream with T tasks writes up to T×nb
    * small files — thousands of tiny objects per stage at cluster
    * scale (VERDICT r11 #3). After the repartition each task owns
    * exactly one bucket's rows, so the stage is exactly `nb` files.
    *
    * The catalog name carries the application+session namespace, not
    * just the per-JVM seq: with a persistent (Hive) metastore, two
    * concurrent drivers both count seq from 1, and un-namespaced
    * names would let `saveAsTable(overwrite)` repoint the other
    * driver's stage table mid-read (ADVICE r11).
    */
  /** Bucket count for an adaptive (`buckets = 0`) bucketed stage:
    * size-derived instead of a flat numShufflePartitions, so a
    * KB-sized edge table (a 500-node local component graph) stages as
    * ONE bucket and every downstream propagation round runs 1-task
    * stages, while a TB-sized table at cluster scale still gets the
    * full shuffle parallelism (guide §2 — scale-adaptive partitioning,
    * not a local[32] constant). The size source is the optimizer's
    * estimate for the input plan, trusted only DOWNWARD: an inflated
    * join estimate (the common failure mode — Catalyst multiplies
    * selectivities up) simply hits the numShufflePartitions cap, which
    * is exactly the pre-round-19 behavior. The per-bucket target is
    * half the usual 64 MB advisory to absorb parquet-vs-in-memory
    * expansion when the estimate comes from a scan
    * (`graft.stage.bucketTargetBytes` overrides).
    */
  private def adaptiveBuckets(df: DataFrame): Int = {
    val spark = df.sparkSession
    val cap = spark.sessionState.conf.numShufflePartitions
    val target = spark.conf.getOption("graft.stage.bucketTargetBytes")
      .map(_.toLong).getOrElse(32L * 1024 * 1024)
    val est =
      try df.queryExecution.optimizedPlan.stats.sizeInBytes
      catch { case scala.util.control.NonFatal(_) => BigInt(-1) }
    if (est <= 0 || target <= 0) cap
    else ((est + target - 1) / target).min(cap).max(1).toInt
  }

  def materializeBucketed(df: DataFrame, name: String,
      bucketCol: String, buckets: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val nb = if (buckets > 0) buckets else adaptiveBuckets(df)
    val unique = s"${name}_${seq.incrementAndGet()}"
    val path = s"${stageRoot(spark)}/$unique"
    val table = ("graft_stage_" + sessionNs(spark) + "_" + unique)
      .replaceAll("[^a-zA-Z0-9_]", "_")
    val t0 = System.nanoTime()
    df.repartition(nb, df(bucketCol))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(nb, bucketCol)
      .saveAsTable(table)
    if (sys.env.contains("GRAFT_STAGE_DEBUG"))
      System.err.println(f"[stage] $unique (bucketed nb=$nb) ${(System.nanoTime() - t0) / 1e9}%.3f s")
    val back = spark.table(table)
    stagedFrames.put(back, (path, Some(table)))
    // POST-WRITE COMPACT for the adaptive path: when the estimate was
    // inflated (a pair-generator join plan) the stage landed on the
    // numShufflePartitions cap, and now the ACTUAL staged bytes are
    // known for free. If the stage turned out tiny (< 8 targets) and
    // clearly over-scattered (needed ≤ nb/4), rewrite it at the right
    // bucket count — a trivial re-read of KBs locally, so every
    // iterative round downstream runs 1-task stages instead of
    // cap-task micro-stages. A big stage (the 100 TB case) skips this
    // entirely: one filesystem stat is the only added cost, and the
    // original single write stands.
    if (buckets == 0 && nb > 1) {
      val target = spark.conf.getOption("graft.stage.bucketTargetBytes")
        .map(_.toLong).getOrElse(32L * 1024 * 1024)
      val actual = try {
        val p = new Path(path)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getContentSummary(p).getLength
      } catch { case scala.util.control.NonFatal(_) => -1L }
      if (target > 0 && actual >= 0 && actual < 8 * target) {
        val needed = math.max(1L, (actual + target - 1) / target).toInt
        if (needed * 4 <= nb) {
          val compacted =
            materializeBucketed(back, s"${name}_c", bucketCol, needed)
          reclaim(back)
          return compacted
        }
      }
    }
    back
  }
}
