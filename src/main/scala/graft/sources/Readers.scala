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

  /** WET-style web-crawl archives (the Common Crawl text format an LLM
    * corpus actually ingests): concatenated records, each a "WARC/1.0"
    * header block (`WARC-Target-URI`, `WARC-Date`, ...) followed by a
    * blank line and the extracted text. Parsed via `binaryFile` — the
    * FILE is the natural parallel unit (crawl archives ship as ~150 MB
    * members; records inside one are sequential by construction), so
    * per-file imperative parsing here is the per-partition-logic case,
    * not a shuffle avoider. Records missing a URI header are quarantined
    * with a null uri rather than dropped (same capture-don't-crash
    * contract as the text readers).
    *
    * Output: file, rec_idx (order within file), uri, date, text.
    */
  def wet(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        val whole = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        // split on record markers; drop anything before the first
        whole.split("(?m)^WARC/1\\.0\\r?$").toSeq.drop(1).zipWithIndex
          .map { case (rec, idx) =>
            val parts = rec.split("\\r?\\n\\r?\\n", 2)
            val head = parts(0)
            val body = if (parts.length > 1) parts(1) else ""
            def header(name: String): Option[String] =
              head.linesIterator
                .find(_.toLowerCase.startsWith(name.toLowerCase + ":"))
                .map(_.split(":", 2)(1).trim)
            (file, idx.toLong, header("WARC-Target-URI").orNull,
              header("WARC-Date").orNull, body.trim)
          }
      }
      .toDF("file", "rec_idx", "uri", "date", "text")
  }

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
