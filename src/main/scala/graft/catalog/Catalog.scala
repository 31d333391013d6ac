package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit, struct}
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Catalog-driven operations: the reference's introspection/codegen and
  * materialization entry points (SURVEY.md §2.1 S5/S6, §3.4).
  */
object Catalog {

  /** The autojoin-union codegen path
    * (/root/reference/views/create_autojoin_dataset_views.sh:31-92): the
    * reference queries INFORMATION_SCHEMA for `autoload_v2_<org>_ndt`
    * datasets, renders a per-org joined view, and appends `UNION ALL BY
    * NAME` branches into one union view. Here the same shape is ordinary
    * Scala: list catalog tables by regex, apply the per-table transform,
    * reduce with schema-drift-tolerant unionByName.
    */
  def autojoinUnion(spark: SparkSession, tablePattern: String,
      build: DataFrame => DataFrame = identity): DataFrame = {
    val names = spark.catalog.listTables().collect()
      .map(_.name).filter(_.matches(tablePattern)).sorted
    require(names.nonEmpty, s"no tables match $tablePattern")
    names.map(n => build(spark.table(n)))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** One-time partitioned materialization — the CTAS contract of
    * /root/reference/transform/web100.sql:8-13 (`CREATE TABLE IF NOT
    * EXISTS ... PARTITION BY date OPTIONS(require_partition_filter=true)
    * AS SELECT ...`): idempotent (Ignore mode = IF NOT EXISTS), laid out
    * by date, and registered as partition-filter-required so the
    * PartitionFilterCheck rule enforces the OPTIONS clause our storage
    * layer can't express natively.
    */
  def materializePartitioned(df: DataFrame, path: String,
      partitionCol: String = "date",
      requirePartitionFilter: Boolean = true): Unit = {
    df.write.mode(SaveMode.Ignore).partitionBy(partitionCol).parquet(path)
    if (requirePartitionFilter) {
      val name = path.reverse.takeWhile(_ != '/').reverse
      graft.plans.PartitionFilterRegistry.flag(name, partitionCol)
    }
  }

  /** Partition pseudo-column surfacing (S3): the reference re-exports
    * `_PARTITIONTIME` as `partition_date`
    * (/root/reference/views/ndt_raw/web100_legacy.sql:5-6). For a
    * date-partitioned Parquet table the partition value IS a column after
    * read; this alias makes the contract explicit.
    */
  def withPartitionDate(df: DataFrame, partitionCol: String = "date")
      : DataFrame =
    df.withColumn("partition_date", col(partitionCol).cast("date"))

  /** Bucketed materialization: co-locate a table on its join key so
    * repeated large-large joins on that key skip the shuffle entirely
    * (both sides read pre-hashed buckets; the join becomes a per-bucket
    * sort-merge with NO exchange — CatalogSpec asserts the plan). At
    * 100 TB this converts every recurring fact-fact join on the bucket
    * key from a full-data shuffle into a metadata decision, paid once at
    * write time. `sortBy` on the same key additionally lets the read
    * skip the per-bucket sort when bucket counts line up.
    */
  def materializeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .option("path",
        new java.io.File("spark-warehouse", table).getAbsolutePath)
      .saveAsTable(table)

  /** Compact a parquet directory to ~`targetFileMB` files per partition —
    * the small-files remedy for streaming/incremental appends (a year of
    * micro-batch appends leaves thousands of KB-sized files per date;
    * every reader then pays open/footer cost per file and the driver
    * pays listing). File count is computed from the actual byte size on
    * disk, the rewrite is one `repartition(n)` job — no data logic, safe
    * to run as maintenance on any partition. Returns files written.
    */
  def compact(spark: SparkSession, path: String, outPath: String,
      targetFileMB: Int = 512): Int = {
    val bytes = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) f.length else 0L
      walk(new java.io.File(path))
    }
    // ceiling division: floor would leave files up to ~2x the target
    // (1023 MB at target 512 -> one 1 GB file)
    val target = targetFileMB * 1024L * 1024L
    val n = math.max(1, ((bytes + target - 1) / target).toInt)
    spark.read.parquet(path).repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    n
  }

  /** Clustered write: range-partition + sort rows by `clusterCols` before
    * writing, so parquet row-group min/max statistics become selective —
    * a range predicate on the cluster key then skips whole row groups /
    * files at scan time (the poor-man's Z-order; for one key, exactly
    * Z-order). At 100 TB this is the difference between "pushdown prunes
    * row groups" being theoretical and actual: unsorted data has every
    * row group spanning the full key range, so min/max filters never
    * eliminate anything.
    */
  def writeClustered(df: DataFrame, outPath: String,
      clusterCols: Seq[String], files: Int): Unit =
    df.repartitionByRange(files, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(outPath)

  /** Read a table whose parquet files were written across schema eras
    * (columns added over time — the reference's per-era table problem,
    * `ndt7` vs `ndt5` vs `web100` generations, SURVEY §1.3). mergeSchema
    * unions footer schemas at planning time; rows from older files read
    * the added columns as null. Per-file schema stays pruned/pushed —
    * merging is a metadata operation, not a data rewrite.
    */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Conform a frame to a declared target schema (the reference's regime:
    * the schema JSON files declare the table, every era's rows are shaped
    * to it before landing — SURVEY §1.3). Recursive over structs and arrays of
    * structs: missing nullable fields materialize as typed nulls, present
    * fields are cast, extra fields are dropped. Pure projection — codegen
    * friendly, no shuffle, safe to run on every ingest batch.
    */
  def conformTo(df: DataFrame, target: StructType): DataFrame = {
    import org.apache.spark.sql.types.DataType
    // Normalize array containsNull to true throughout the target: the
    // element-wise rebuild (transform) always yields nullable elements
    // and Spark refuses to cast that away, so a strict REPEATED
    // (containsNull=false) target would make conformTo non-idempotent —
    // and a conform pass cannot conjure non-null guarantees anyway.
    def relax(dt: DataType): DataType = dt match {
      case StructType(fields) =>
        StructType(fields.map(f => f.copy(dataType = relax(f.dataType))))
      case ArrayType(e, _) => ArrayType(relax(e), containsNull = true)
      case other => other
    }
    def conformCol(source: Option[org.apache.spark.sql.types.DataType],
        path: Column, dt: org.apache.spark.sql.types.DataType): Column =
      (source, dt) match {
        case (Some(s: StructType), t: StructType) =>
          // guard on the source struct's nullness: struct(...) would turn
          // a NULL struct into {all-null fields} (and flip nullability),
          // breaking idempotence and value semantics
          org.apache.spark.sql.functions.when(path.isNotNull,
            struct(t.fields.map { f =>
              val sub = s.fields.find(_.name == f.name)
              conformCol(sub.map(_.dataType),
                path.getField(f.name), f.dataType).as(f.name)
            }.toSeq: _*))
        case (Some(ArrayType(s: StructType, _)), ArrayType(t: StructType, _)) =>
          // element-wise struct conform via transform (planning-time
          // generated; fine off the hot path — ingest shaping, not a
          // scan). No outer cast: element fields are cast individually,
          // and casting away the lambda's containsNull=true is rejected.
          org.apache.spark.sql.functions.transform(path,
            e => conformCol(Some(s), e, t))
        case (Some(_), t) => path.cast(t)
        case (None, t) => lit(null).cast(t)
      }
    val relaxed = relax(target).asInstanceOf[StructType]
    val srcFields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    df.select(relaxed.fields.map { f =>
      val src = srcFields.get(f.name)
      conformCol(src, if (src.isDefined) col(f.name) else lit(null),
        f.dataType).as(f.name)
    }.toSeq: _*)
  }
}
