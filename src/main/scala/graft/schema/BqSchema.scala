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

  /** Structural local-vs-live drift report — the operationally useful
    * half of the reference's schema sync
    * (/root/reference/schema/sync_tables_with_schema.sh:60-90, whose jq
    * filter only answers equal/not-equal and leaves a human to read the
    * raw `diff`): which dotted field paths the local (checked-in) schema
    * ADDS over the live table, which live paths it REMOVED, and which
    * paths exist in both but changed type or mode (RETYPED — the case
    * additive `bq update` evolution cannot apply). Field order is
    * ignored, like the jq sort; descriptions are metadata, not
    * structure, so they don't participate.
    */
  final case class SchemaDiff(added: Seq[String], removed: Seq[String],
      retyped: Seq[(String, String, String)]) {
    def isEmpty: Boolean =
      added.isEmpty && removed.isEmpty && retyped.isEmpty
  }

  /** BigQuery-style rendering of one field's type+mode, the unit the
    * retyped report shows ("INTEGER REQUIRED" -> "STRING NULLABLE").
    */
  private def typeLabel(f: StructField): String = f.dataType match {
    case ArrayType(_: StructType, _) => "RECORD REPEATED"
    case ArrayType(e, _) => s"${scalarName(e)} REPEATED"
    case _: StructType =>
      s"RECORD ${if (f.nullable) "NULLABLE" else "REQUIRED"}"
    case e => s"${scalarName(e)} ${if (f.nullable) "NULLABLE" else "REQUIRED"}"
  }

  /** Struct interior of a field, if any (RECORD or REPEATED RECORD). */
  private def structOf(f: StructField): Option[StructType] =
    f.dataType match {
      case s: StructType => Some(s)
      case ArrayType(s: StructType, _) => Some(s)
      case _ => None
    }

  def diff(local: StructType, live: StructType): SchemaDiff = {
    val added = Seq.newBuilder[String]
    val removed = Seq.newBuilder[String]
    val retyped = Seq.newBuilder[(String, String, String)]
    def walk(prefix: String, loc: StructType, liv: StructType): Unit = {
      val locBy = loc.fields.map(f => f.name -> f).toMap
      val livBy = liv.fields.map(f => f.name -> f).toMap
      def path(n: String) = if (prefix.isEmpty) n else s"$prefix.$n"
      loc.fields.foreach { lf =>
        livBy.get(lf.name) match {
          case None => added += path(lf.name)
          case Some(vf) =>
            val (lt, vt) = (typeLabel(lf), typeLabel(vf))
            if (lt != vt) retyped += ((path(lf.name), vt, lt))
            else (structOf(lf), structOf(vf)) match {
              case (Some(ls), Some(vs)) => walk(path(lf.name), ls, vs)
              case _ => ()
            }
        }
      }
      liv.fields.foreach { vf =>
        if (!locBy.contains(vf.name)) removed += path(vf.name)
      }
    }
    walk("", local, live)
    SchemaDiff(added.result(), removed.result(), retyped.result())
  }
}
