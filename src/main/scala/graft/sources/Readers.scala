package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Typed text-format ingestion — the shape of the reference's upstream
  * parser (JSONL test archives → typed BigQuery tables, schema declared
  * in the repo's JSON schema files; /root/reference/schema/README.md).
  *
  * Two rules, both about 100 TB behavior:
  *
  *  1. The schema is ALWAYS declared (BqSchema or StructType), never
  *     inferred: inference is a full extra pass over the data before the
  *     real read, and a schema that drifts with the sample is an outage,
  *     not a convenience.
  *  2. Malformed records are CAPTURED, not fatal and not dropped:
  *     PERMISSIVE mode + an explicit corrupt-record column lets the
  *     pipeline land good rows and quarantine bad ones in one pass
  *     (`FAILFAST` belongs in tests, not in a week-long backfill).
  */
object Readers {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else StructType(schema.fields :+
      StructField(CorruptCol, StringType, nullable = true))

  /** Newline-delimited JSON with a declared schema. Malformed lines land
    * with all data fields null and the raw line in `_corrupt_record`.
    */
  def jsonl(spark: SparkSession, path: String, schema: StructType)
      : DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** CSV with a declared schema. Same quarantine contract as `jsonl`. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** Columnar round-trip in ORC (Spark-native alongside parquet): same
    * declared-schema contract, no corrupt-record channel (binary formats
    * fail structurally, not per-record).
    */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Split a permissive read into (clean rows without the quarantine
    * column, quarantined records as (raw_record, partial_parse)).
    *
    * The bad side serializes the partially-parsed fields next to the raw
    * text — triage context, and it keeps the plan legal: Spark rejects
    * any query over a raw file scan whose referenced columns are ONLY
    * the internal corrupt-record column (e.g. a bare count() after the
    * filter); `to_json(struct(data cols))` keeps real columns referenced
    * no matter what the caller does downstream. Run it to a side-channel
    * sink; reprocess after a parser fix.
    */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    // Cache the parsed batch: Spark refuses corrupt-column-only queries
    // against the raw scan (both split sides end in one after column
    // pruning — this is the exact pattern its error message prescribes),
    // and both sides being consumed anyway makes this the natural
    // parse-once materialization point. Unpersist after sinking.
    val parsed = df.cache()
    val dataCols = parsed.columns.filterNot(_ == CorruptCol)
    val clean = parsed.filter(parsed(CorruptCol).isNull).drop(CorruptCol)
    val bad = parsed.filter(parsed(CorruptCol).isNotNull)
      .select(parsed(CorruptCol).as("raw_record"),
        org.apache.spark.sql.functions.to_json(
          org.apache.spark.sql.functions.struct(
            dataCols.map(parsed(_)).toSeq: _*)).as("partial_parse"))
    (clean, bad)
  }
}
