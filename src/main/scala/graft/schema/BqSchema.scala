package graft.schema

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Loader for BigQuery-style JSON table schemas → Spark `StructType`.
  *
  * The reference defines every table as a JSON document of
  * `{name, type, mode, fields, description}` records
  * (/root/reference/schema/ndt.json:1-14 shows the shape; nested RECORDs
  * at :8-14, REPEATED RECORD time series at
  * /root/reference/schema/switch.json:7-11). This parser reproduces that
  * contract on Spark types per SURVEY.md §1.2:
  *
  *   STRING→StringType, INTEGER→LongType (BigQuery INT64), FLOAT→
  *   DoubleType, BOOLEAN→BooleanType, TIMESTAMP→TimestampType,
  *   DATE→DateType, BYTES→BinaryType, RECORD→StructType;
  *   mode REPEATED→ArrayType(..., containsNull=false), REQUIRED→
  *   nullable=false, NULLABLE (default)→nullable=true.
  *
  * Field descriptions carry over as metadata (key "description"), which is
  * what the reference's schema-sync tooling diffs
  * (/root/reference/schema/sync_tables_with_schema.sh:40-90).
  */
object BqSchema {

  def parse(json: String): StructType = {
    implicit val formats: Formats = DefaultFormats
    val ast = JsonMethods.parse(json)
    val fields = ast match {
      case JArray(fs) => fs
      case JObject(obj) => // tolerate {"fields": [...]} wrapping
        obj.collectFirst { case ("fields", JArray(fs)) => fs }
          .getOrElse(sys.error("BqSchema: no fields array"))
      case other => sys.error(s"BqSchema: unexpected root $other")
    }
    StructType(fields.map(toField))
  }

  def parseFile(path: String): StructType =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  private def toField(f: JValue): StructField = {
    implicit val formats: Formats = DefaultFormats
    val name = (f \ "name").extract[String]
    val typ = (f \ "type").extractOpt[String].getOrElse("STRING").toUpperCase
    val mode = (f \ "mode").extractOpt[String].getOrElse("NULLABLE").toUpperCase
    val desc = (f \ "description").extractOpt[String]

    val base: DataType = typ match {
      case "STRING" => StringType
      case "INTEGER" | "INT64" => LongType
      case "FLOAT" | "FLOAT64" => DoubleType
      case "BOOLEAN" | "BOOL" => BooleanType
      case "TIMESTAMP" => TimestampType
      case "DATE" => DateType
      case "BYTES" => BinaryType
      case "RECORD" | "STRUCT" =>
        val sub = (f \ "fields") match {
          case JArray(fs) => fs.map(toField)
          case _ => Nil
        }
        StructType(sub)
      case other => sys.error(s"BqSchema: unsupported type $other")
    }
    val (dt, nullable) = mode match {
      case "REPEATED" => (ArrayType(base, containsNull = false), true)
      case "REQUIRED" => (base, false)
      case _ => (base, true)
    }
    val meta = desc.map(d =>
      new MetadataBuilder().putString("description", d).build())
      .getOrElse(Metadata.empty)
    StructField(name, dt, nullable, meta)
  }

  /** Render a StructType back to the BigQuery JSON shape (round-trip aid
    * for schema-drift diffing, the analog of the reference's jq-structural
    * compare in sync_tables_with_schema.sh:60-90).
    */
  def toJson(st: StructType): String = {
    def fieldJson(f: StructField): String = {
      val (typ, mode, sub) = f.dataType match {
        case ArrayType(s: StructType, _) =>
          ("RECORD", "REPEATED", Some(s))
        case ArrayType(e, _) => (scalarName(e), "REPEATED", None)
        case s: StructType => ("RECORD", modeOf(f), Some(s))
        case e => (scalarName(e), modeOf(f), None)
      }
      val fieldsPart = sub
        .map(s => s""","fields":[${s.fields.map(fieldJson).mkString(",")}]""")
        .getOrElse("")
      val descPart =
        if (f.metadata.contains("description"))
          s""","description":"${f.metadata.getString("description")}""""
        else ""
      s"""{"name":"${f.name}","type":"$typ","mode":"$mode"$descPart$fieldsPart}"""
    }
    def modeOf(f: StructField) = if (f.nullable) "NULLABLE" else "REQUIRED"
    s"[${st.fields.map(fieldJson).mkString(",")}]"
  }

  private def scalarName(dt: DataType): String = dt match {
    case StringType => "STRING"
    case LongType | IntegerType => "INTEGER"
    case DoubleType | FloatType => "FLOAT"
    case BooleanType => "BOOLEAN"
    case TimestampType => "TIMESTAMP"
    case DateType => "DATE"
    case BinaryType => "BYTES"
    case other => sys.error(s"BqSchema.toJson: unsupported $other")
  }
}
