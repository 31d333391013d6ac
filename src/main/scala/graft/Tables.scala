package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated test data.
  *
  * Mirrors the reference's raw-table layer (m-lab/etl-schema
  * `views/ndt_raw` pass-through scans — see SURVEY.md §2.1 S1): every
  * downstream operator reads through these entry points so that storage
  * layout (partitioning, glob resolution) is decided in exactly one place.
  *
  * At 100 TB these would be date-partitioned directories
  * (`.../table/date=YYYY-MM-DD/part-*.parquet`); the loader API is the same
  * either way — `spark.read.parquet` handles both a single file and a
  * partitioned directory tree, and Catalyst prunes partitions from `date`
  * predicates automatically.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // DataFrame handles memoized per (session, path): re-reading a table
  // otherwise re-lists the directory and re-reads parquet footers on every
  // query — a real catalog caches table metadata exactly like this. Keyed
  // by session so a stopped session's relations are never reused.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()

  /** Read one table from an sf directory.
    *
    * `events.ts` has shipped under two physical Parquet types across data
    * generations: INT64 TIMESTAMP(NANOS) — which Spark 4 rejects by
    * default, so it is read as raw nanos (legacy conf) and rebuilt with
    * *integer* division (nanosecond epochs exceed 2^53; double math would
    * corrupt them) — and plain TIMESTAMP(MICROS) without UTC adjustment,
    * which Spark reads as TIMESTAMP_NTZ. Both are normalized to a session
    * TimestampType column (sessions here run UTC, so the NTZ cast is
    * value-preserving) so every downstream operator sees one type.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.computeIfAbsent((System.identityHashCode(spark).toString,
      s"$sfDir/$name"), _ =>
        withScanFloor(spark, loadUncached(spark, sfDir, name), name))

  // Scan-parallelism floor for the two FACT tables (guide §2.5's "one
  // huge unsplittable file" case): a single-row-group parquet file is
  // one scan split, so every downstream map stage — parquet decode,
  // projections, partial aggregation — runs on ONE core while the rest
  // idle. When the scan has fewer splits than the session's
  // parallelism, redistribute on the table's primary key (unique →
  // uniform, and the common join key, so the introduced
  // HashPartitioning is reusable by downstream joins/aggregations
  // instead of forcing a second exchange). At cluster scale a
  // date-partitioned table has splits >> cores and this is a no-op —
  // the floor adapts to the data, it is not a local[32] constant.
  //
  // Scope, from the round-18 interleaved A/B (OPTIMIZATION_r18.md):
  // lineitem/orders map-heavy aggregates gain 1.1-1.4x; events,
  // embeddings and documents queries LOSE 10-40% — their heavy work is
  // already post-shuffle (fence-staged prefix/graph loops, per-group
  // windows), so the floor only adds an exchange and 32-task micro
  // stages ahead of every fence. The documents-derived media paths,
  // which do gain (up to 2.3x), get the floor on their lightweight
  // id frame inside the media builders instead
  // (graft.plans.Parallel.cpuFloor), below the expensive synthesis.
  // Dimension tables (region..part, customer, supplier) are excluded:
  // they are broadcast-sized by design and a shuffle ahead of a
  // broadcast build is pure overhead.
  private val scanFloorKey = Map(
    "lineitem" -> "l_orderkey",
    "orders" -> "o_orderkey")

  private def withScanFloor(spark: SparkSession, df: DataFrame,
      name: String): DataFrame =
    scanFloorKey.get(name) match {
      case Some(key) =>
        // conf-overridable for clusters whose scan-split floor should
        // differ from defaultParallelism; 0 disables the floor
        val p = spark.conf.getOption("graft.scan.parallelismFloor")
          .map(_.toInt)
          .getOrElse(spark.sparkContext.defaultParallelism)
        if (p > 0 && df.rdd.getNumPartitions < p)
          df.repartition(p, org.apache.spark.sql.functions.col(key))
        else df
      case None => df
    }

  // Corpus-stats surface: row counts memoized per (session, table).
  // Every corpus-adaptive parameter rule (LSH plane count, and any
  // future band/nlist tuning) reads n through here, so the scalar
  // count job runs once per session per table instead of once per
  // query invocation. A real catalog serves this from table
  // statistics; the parquet scan count is the local stand-in.
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      java.lang.Long]()

  /** Cached row count of one table (bounded driver artifact: a single
    * scalar aggregate job on first use, a map lookup afterwards). */
  def rowCount(spark: SparkSession, sfDir: String, name: String): Long =
    countCache.computeIfAbsent((System.identityHashCode(spark).toString,
      s"$sfDir/$name"), _ => load(spark, sfDir, name).count())

  private def loadUncached(spark: SparkSession, sfDir: String,
      name: String): DataFrame = {
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Register every table as a session temp view so the SQL-string API
    * (`spark.sql`) works against the same catalog names the DataFrame
    * queries use — the reference's consumers are SQL-first, and S1's
    * "registered as a view" contract is this call.
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Wildcard-family scan (reference: `FROM `...statistics.cities_2*``,
    * views/statistics/v0_cities.sql:1 — SURVEY §2.1 S4): a path glob that
    * unions every suffix-matched file/table by position.
    */
  def loadGlob(spark: SparkSession, sfDir: String, glob: String): DataFrame =
    spark.read.parquet(s"$sfDir/$glob")
}
