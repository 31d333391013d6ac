package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, processed per-partition.
  *
  * The decode step is a clearly-marked deterministic STUB (the container
  * ships no image/audio codecs); everything around it — the schema shape
  * (binary payload + metadata struct), the `Dataset[T]` encoder plumbing,
  * the `mapPartitions` batch processing, partition sizing — is the real
  * engine surface and is exercised by tests and an oracle-checked query.
  *
  * At 100 TB: media bytes dominate row size, so these tables should be
  * stored with the binary column in its own Parquet column chunk (free
  * with columnar storage) and read with pushdown filters on metadata only;
  * `mapPartitions` keeps per-batch decoder state (a real codec would be
  * initialized once per partition, not per row).
  */
object Multimodal {

  /** One media row: payload + minimal typed metadata. */
  case class MediaRow(doc_id: Long, media: Array[Byte], mime: String,
      n_bytes: Long)

  /** "Decoded" features — in a real deployment width/height/frames come
    * from the codec; here they are deterministic functions of the bytes.
    */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: Long,
      mime: String, fake_width: Int, fake_height: Int)

  /** Wrap a text corpus as a media table: UTF-8 bytes as the payload.
    * (Stand-in for reading real image/audio bytes; schema is the point.)
    */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("media"),
      lit("text/plain").as("mime"),
      octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"))

  /** STUB decoder: a real implementation would hand `bytes` to a codec.
    * This fake is deterministic (first-64-byte weighted checksum) so the
    * pipeline around it is testable end-to-end.
    */
  def stubDecode(bytes: Array[Byte]): (Long, Int, Int) = {
    // ??? <- real codec goes here (image decode / audio PCM / video frames)
    var sum = 0L
    var i = 0
    val n = math.min(bytes.length, 64)
    while (i < n) { sum += (bytes(i) & 0xFF).toLong * (i + 1); i += 1 }
    val checksum = sum % 997
    (checksum, (checksum % 64).toInt + 1, (checksum % 48).toInt + 1)
  }

  /** Per-partition feature extraction over the media table — the
    * `mapPartitions` shape a real decoder needs (one decoder instance per
    * partition, streamed batches, no per-row setup).
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "mime", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        // per-partition decoder init happens here (stubbed)
        rows.map { r =>
          val (checksum, w, h) = stubDecode(r.media)
          MediaFeatures(r.doc_id, r.n_bytes, checksum, r.mime, w, h)
        }
      }
  }

  /** Pack payload bytes into a minimal binary container: 4-byte magic
    * "GRFT" + big-endian u16 width + u16 height + payload. Unlike the
    * pixel codec (stubbed — no codecs in the container), the CONTAINER
    * layer is real: header synthesis and parsing are honest byte-level
    * operations, the part of multimodal ingestion an engine actually
    * owns (magic validation, field extraction, payload slicing —
    * the same shape as RIFF/PNG/BMP headers).
    */
  def packContainer(df: DataFrame, idCol: String, payload: org.apache.spark.sql.Column,
      width: org.apache.spark.sql.Column, height: org.apache.spark.sql.Column)
      : DataFrame =
    // pmod 65536: u16 wrap is DEFINED; without it, lpad(hex(w), 4)
    // keeps the FIRST four hex chars of an oversized value — a garbage
    // field that still parses as valid
    df.select(col(idCol).cast("long").as("doc_id"),
      concat(lit("GRFT".getBytes("UTF-8")),
        unhex(lpad(hex(pmod(width.cast("long"), lit(65536L))), 4, "0")),
        unhex(lpad(hex(pmod(height.cast("long"), lit(65536L))), 4, "0")),
        payload).as("media"))

  /** Parse the container header back out of the binary column — real
    * byte-level parsing via the hex projection (codegen'd built-ins, no
    * UDF): magic check, big-endian u16 fields, payload length and a
    * payload digest. Output: doc_id, magic_ok, width, height,
    * payload_bytes, payload_md5.
    */
  def parseContainer(media: DataFrame): DataFrame =
    media
      .select(col("doc_id"), upper(hex(col("media"))).as("hs"),
        octet_length(col("media")).as("nb"))
      .select(col("doc_id"),
        (substring(col("hs"), 1, 8) === lit("47524654")).as("magic_ok"),
        conv(substring(col("hs"), 9, 4), 16, 10).cast("long").as("width"),
        conv(substring(col("hs"), 13, 4), 16, 10).cast("long").as("height"),
        (col("nb") - 8).cast("long").as("payload_bytes"),
        md5(substring(col("hs"), 17, Int.MaxValue)).as("payload_md5"))

  /** Deterministic frame-ish sampling stub: pick every `stride`-th byte
    * offset of the payload as a "frame" marker — exercises the
    * explode-to-frames schema (one row per sampled frame).
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.select(col("doc_id"), col("n_bytes"),
      posexplode(sequence(lit(0L),
        floor((col("n_bytes") - 1) / stride).cast("long")))
        .as(Seq("frame_idx", "frame_offset_raw")))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * stride).as("frame_offset"))
}
