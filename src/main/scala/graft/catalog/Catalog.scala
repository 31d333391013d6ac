package graft.catalog

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

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
}
