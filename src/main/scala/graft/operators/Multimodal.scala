package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, processed per-partition.
  *
  * Decoding is split honestly by what pure JVM code can own: netpbm
  * (P6/P5) and uncompressed 24-bpp BMP are REALLY decoded
  * ([[decodeImage]] — header parse + per-channel pixel stats); formats
  * that need a codec library (JPEG/PNG/audio/video — none ship in this
  * environment) remain behind the clearly-marked deterministic
  * [[stubDecode]]. Everything around both — the schema shape (binary
  * payload + metadata struct), the `Dataset[T]` encoder plumbing, the
  * `mapPartitions` batch processing, partition sizing — is the real
  * engine surface and is exercised by tests and oracle-checked queries.
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

  /** Decoded-image record: header fields + per-channel pixel means.
    * For grayscale formats (P5) the three means are equal.
    */
  case class ImageInfo(format: String, width: Int, height: Int,
      meanR: Double, meanG: Double, meanB: Double)

  /** REAL (if deliberately minimal) image decoder — pure JVM, no codec
    * dependencies: binary PPM/PGM (P6/P5, the netpbm formats whose
    * header is ASCII tokens + raw samples) and uncompressed 24-bpp BMP
    * (little-endian header, BGR rows padded to 4 bytes, normally
    * bottom-up). Returns None on anything else — corrupt header, short
    * payload, unsupported variant — never throws on foreign bytes
    * (decoders sit behind `mapPartitions` on untrusted corpus data; a
    * poison row must not kill the partition).
    *
    * This replaces the earlier all-stub decode for the formats above;
    * [[stubDecode]] remains the documented stand-in for formats that
    * genuinely need a codec library (JPEG/PNG/audio/video).
    */
  def decodeImage(bytes: Array[Byte]): Option[ImageInfo] = {
    if (bytes.length >= 2 && bytes(0) == 'P'.toByte &&
      (bytes(1) == '6'.toByte || bytes(1) == '5'.toByte)) decodePnm(bytes)
    else if (bytes.length >= 54 && bytes(0) == 'B'.toByte &&
      bytes(1) == 'M'.toByte) decodeBmp(bytes)
    else None
  }

  /** PNM ASCII-token header scan shared by the stats decode, the
    * pixel-grid decode, and the frame-stream scanner: (rgb, width,
    * height, payload start). `off` is where the "P5"/"P6" magic sits —
    * frame streams parse in place, no per-frame tail copies; `start`
    * is absolute within `bytes`.
    */
  private def pnmHeader(bytes: Array[Byte], off: Int = 0)
      : Option[(Boolean, Int, Int, Int)] = {
    val rgb = bytes(off + 1) == '6'.toByte
    var i = off + 2
    // ASCII token scanner: whitespace-separated, '#' comments to EOL
    def nextInt(): Option[Int] = {
      while (i < bytes.length &&
        (bytes(i).toChar.isWhitespace || bytes(i) == '#'.toByte)) {
        if (bytes(i) == '#'.toByte)
          while (i < bytes.length && bytes(i) != '\n'.toByte) i += 1
        else i += 1
      }
      var v = 0L
      var any = false
      while (i < bytes.length && bytes(i) >= '0'.toByte &&
        bytes(i) <= '9'.toByte) {
        v = v * 10 + (bytes(i) - '0'.toByte); any = true; i += 1
        if (v > Int.MaxValue) return None
      }
      if (any) Some(v.toInt) else None
    }
    for {
      w <- nextInt()
      h <- nextInt()
      maxval <- nextInt()
      if w > 0 && h > 0 && maxval > 0 && maxval < 256
      // exactly ONE whitespace byte separates header from samples
      if i < bytes.length && bytes(i).toChar.isWhitespace
      start = i + 1
      chans = if (rgb) 3 else 1
      if bytes.length - start >= w.toLong * h * chans
    } yield (rgb, w, h, start)
  }

  private def decodePnm(bytes: Array[Byte]): Option[ImageInfo] = {
    for {
      (rgb, w, h, start) <- pnmHeader(bytes)
    } yield {
      var (sr, sg, sb) = (0L, 0L, 0L)
      var p = start
      val n = w * h
      var k = 0
      while (k < n) {
        if (rgb) {
          sr += bytes(p) & 0xFF; sg += bytes(p + 1) & 0xFF
          sb += bytes(p + 2) & 0xFF; p += 3
        } else { val v = (bytes(p) & 0xFF).toLong
          sr += v; sg += v; sb += v; p += 1 }
        k += 1
      }
      ImageInfo(if (rgb) "ppm" else "pgm", w, h,
        sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
    }
  }

  private def decodeBmp(bytes: Array[Byte]): Option[ImageInfo] = {
    def u16(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def i32(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
      ((bytes(o + 2) & 0xFF) << 16) | ((bytes(o + 3) & 0xFF) << 24)
    val pixelOff = i32(10)
    val w = i32(18)
    val hRaw = i32(22) // negative = top-down; means are order-invariant
    val h = math.abs(hRaw)
    val bpp = u16(28)
    val compression = i32(30)
    if (w <= 0 || h == 0 || bpp != 24 || compression != 0 ||
      pixelOff < 54) return None
    val rowBytes = ((w * 3 + 3) / 4) * 4 // rows pad to 4-byte boundary
    if (bytes.length.toLong < pixelOff.toLong + rowBytes.toLong * h)
      return None
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      val row = pixelOff + y * rowBytes
      while (x < w) {
        val p = row + x * 3 // BGR order
        sb += bytes(p) & 0xFF; sg += bytes(p + 1) & 0xFF
        sr += bytes(p + 2) & 0xFF
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    Some(ImageInfo("bmp", w, h,
      sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
  }

  /** Decoded-image features over a media table — same `mapPartitions`
    * shape as [[extractFeatures]] (per-partition decoder scope, streamed
    * rows), but through the REAL [[decodeImage]] path. Undecodable rows
    * survive with decoded=false and null dimensions — the screen-and-
    * route pattern (route failures to quarantine, not to an exception).
    */
  case class DecodedImage(doc_id: Long, decoded: Boolean, format: String,
      width: Option[Int], height: Option[Int], mean_r: Option[Double],
      mean_g: Option[Double], mean_b: Option[Double])

  def decodeImages(media: DataFrame): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "mime", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          decodeImage(r.media) match {
            case Some(info) => DecodedImage(r.doc_id, decoded = true,
              info.format, Some(info.width), Some(info.height),
              Some(info.meanR), Some(info.meanG), Some(info.meanB))
            case None => DecodedImage(r.doc_id, decoded = false,
              "unknown", None, None, None, None, None)
          }
        }
      }
  }

  /** Grayscale pixel grid for the perceptual-hash path: luminance per
    * pixel, row-major. P5 is direct; P6 uses the integer mean
    * (r+g+b)/3 — chosen over a weighted luma because integer-exact
    * thirds are reproducible in any engine's SQL, which is what lets
    * the dHash oracle replay the whole pipeline closed-form.
    */
  def decodeGray(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (!(bytes.length >= 2 && bytes(0) == 'P'.toByte &&
      (bytes(1) == '6'.toByte || bytes(1) == '5'.toByte))) return None
    pnmHeader(bytes).map { case (rgb, w, h, start) =>
      val px = new Array[Int](w * h)
      var k = 0
      while (k < w * h) {
        px(k) =
          if (rgb) {
            val p = start + 3 * k
            ((bytes(p) & 0xFF) + (bytes(p + 1) & 0xFF) +
              (bytes(p + 2) & 0xFF)) / 3
          } else bytes(start + k) & 0xFF
        k += 1
      }
      (w, h, px)
    }
  }

  /** 56-bit difference hash (dHash) of a grayscale grid: box-downsample
    * to a 9×7 cell grid (integer box partition `[t·dim/target,
    * (t+1)·dim/target)`, integer-mean cells), then one bit per
    * horizontal neighbor pair — set when cell(x) > cell(x+1). 8×7 = 56
    * bits, packed into a non-negative long (the same width discipline
    * as the 60-bit SimHash: staying under 63 bits keeps every engine's
    * signed-int64 arithmetic overflow-free, so oracles can rebuild the
    * hash with shifts and sums).
    *
    * dHash is the standard cheap perceptual image signature: gradient
    * signs survive brightness/contrast shifts and mild recompression,
    * so exact-equal or low-Hamming hashes flag visually-duplicate
    * images — the image-side analogue of SimHash for text.
    *
    * Requires w ≥ 9 and h ≥ 7 (each box must be non-empty).
    */
  /** Integer box downsample of a grayscale grid to outW×outH: target
    * cell (tx, ty) is the integer mean of source box
    * `[tx·w/outW, (tx+1)·w/outW) × [ty·h/outH, (ty+1)·h/outH)` — the
    * shared kernel under [[dhash56]] and [[resizeGray]] (one
    * implementation, so the resize path and the hash path cannot
    * drift). Requires w ≥ outW and h ≥ outH (non-empty boxes).
    */
  def boxDownsample(w: Int, h: Int, px: Array[Int], outW: Int,
      outH: Int): Option[Array[Int]] = {
    if (w < outW || h < outH || outW < 1 || outH < 1) return None
    val cells = new Array[Int](outW * outH)
    var ty = 0
    while (ty < outH) {
      val y0 = ty * h / outH
      val y1 = (ty + 1) * h / outH
      var tx = 0
      while (tx < outW) {
        val x0 = tx * w / outW
        val x1 = (tx + 1) * w / outW
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += px(y * w + x); x += 1 }
          y += 1
        }
        cells(ty * outW + tx) =
          (s / ((y1 - y0).toLong * (x1 - x0))).toInt
        tx += 1
      }
      ty += 1
    }
    Some(cells)
  }

  def dhash56(w: Int, h: Int, px: Array[Int]): Option[Long] = {
    boxDownsample(w, h, px, 9, 7).map { cells =>
      var hash = 0L
      var i = 0
      while (i < 56) {
        val ty = i / 8
        val tx = i % 8
        if (cells(ty * 9 + tx) > cells(ty * 9 + tx + 1)) hash |= 1L << i
        i += 1
      }
      hash
    }
  }

  /** Resize a grayscale media table to outW×outH via the integer box
    * downsample, re-encoded as P5 — the thumbnail/normalization step of
    * an image pipeline, exposed as a media→media transform so it
    * composes with every other media consumer ([[dhashImages]],
    * [[extractFeatures]], the screens). P6 (RGB) inputs pass through
    * [[decodeGray]]'s integer luma first, so resizing at the source
    * dimensions doubles as an RGB→grayscale converter. One
    * mapPartitions pass, no shuffle; undecodable or sub-target images
    * are dropped (quarantine discipline — the caller anti-joins to
    * find them).
    *
    * Upscaling is NOT supported: a box downsample has no pixels to
    * invent, so any image with w < outW or h < outH — including an
    * accidental upscale request — lands in the same dropped set as an
    * undecodable payload. Callers that must tell the two apart should
    * join against [[decodeImages]] (decoded=true + sub-target dims ⇒
    * "too small", decoded=false ⇒ "undecodable").
    */
  def resizeGray(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW >= 1 && outH >= 1, "target dims must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "mime", "n_bytes").as[MediaRow]
      .flatMap { r =>
        decodeGray(r.media).flatMap { case (w, h, px) =>
          boxDownsample(w, h, px, outW, outH).map { cells =>
            val header = s"P5\n$outW $outH\n255\n".getBytes("UTF-8")
            val out = new Array[Byte](header.length + cells.length)
            System.arraycopy(header, 0, out, 0, header.length)
            var i = 0
            while (i < cells.length) {
              out(header.length + i) = cells(i).toByte
              i += 1
            }
            MediaRow(r.doc_id, out, "image/x-portable-graymap",
              out.length.toLong)
          }
        }
      }.toDF()
  }

  /** Per-image dHash over a media table (mapPartitions, quarantine
    * shape). Output: doc_id, decoded, dhash (null when undecodable or
    * smaller than the 9×7 grid).
    */
  case class DHashRow(doc_id: Long, decoded: Boolean, dhash: Option[Long])

  def dhashImages(media: DataFrame): Dataset[DHashRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "mime", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val dh = decodeGray(r.media)
            .flatMap { case (w, h, px) => dhash56(w, h, px) }
          DHashRow(r.doc_id, dh.isDefined, dh)
        }
      }
  }

  /** One sampled video frame's perceptual hash. */
  case class FrameHash(doc_id: Long, frame_idx: Int, dhash: Option[Long])

  /** Frame-sample + feature-extract over "video" columns — the
    * multi-frame form of [[dhashImages]]: a video is a binary column of
    * CONCATENATED PNM frames (each self-delimiting: header + w·h or
    * 3·w·h payload), the standard shape after a container demux. The
    * scanner walks the byte stream frame by frame, keeps every
    * `everyK`-th frame (the training-pipeline sampling step — nobody
    * hashes all 30 fps), and emits the 56-bit dHash per kept frame.
    * Malformed bytes stop the scan for that document; frames already
    * decoded are kept (the quarantine discipline of the other
    * decoders).
    *
    * Scale shape: one mapPartitions pass, no shuffle; output is
    * ceil(frames/everyK) rows per video. Downstream the frame hashes
    * feed the SAME banded-Hamming machinery as still images
    * ([[graft.operators.Dedup.codeHammingPairs]]/
    * [[graft.operators.Dedup.codeHammingScreen]]) — near-dup VIDEO
    * detection is frame-hash set overlap.
    *
    * Output: doc_id, frame_idx (position in the stream), dhash (null
    * when the frame decodes but is below the 9×7 grid).
    */
  def frameSampleDhash(media: DataFrame, everyK: Int)
      : Dataset[FrameHash] = {
    require(everyK >= 1, "everyK must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "mime", "n_bytes").as[MediaRow]
      .flatMap { r =>
        val bytes = r.media
        val out = scala.collection.mutable.ArrayBuffer.empty[FrameHash]
        var off = 0
        var idx = 0
        var ok = true
        while (ok && off + 2 <= bytes.length) {
          val hdr =
            if (bytes(off) == 'P'.toByte &&
              (bytes(off + 1) == '5'.toByte ||
                bytes(off + 1) == '6'.toByte))
              pnmHeader(bytes, off) // parses in place, no tail copy
            else None
          hdr match {
            // pnmHeader only returns Some when the payload fits within
            // bytes, so `end` needs no re-check here
            case Some((rgb, w, h, start)) =>
              val end = start + (if (rgb) 3 else 1) * w * h
              if (idx % everyK == 0) {
                // only the SAMPLED frame is sliced out (decodeGray
                // wants a standalone image); skipped frames cost a
                // header parse and an offset bump
                val fb = java.util.Arrays.copyOfRange(bytes, off, end)
                val dh = decodeGray(fb)
                  .flatMap { case (w2, h2, px) => dhash56(w2, h2, px) }
                out += FrameHash(r.doc_id, idx, dh)
              }
              off = end
              idx += 1
            case _ => ok = false
          }
        }
        out
      }
  }

  /** Decoded-audio record: RIFF/WAVE header fields + PCM sample stats.
    * `zero_cross` counts sign changes on channel 0 (the standard cheap
    * voicing/noisiness feature); mean/RMS/peak run over all samples.
    */
  case class WavInfo(channels: Int, sampleRate: Int, bitsPerSample: Int,
      nFrames: Long, meanAmp: Double, rms: Double, peakAbs: Int,
      zeroCross: Long)

  /** REAL (deliberately minimal) audio decoder — pure JVM, no codec
    * dependencies: RIFF/WAVE containers holding integer PCM16
    * little-endian samples, the uncompressed format every audio
    * toolchain can emit. The chunk walk is a genuine RIFF traversal
    * (fmt / data located by iterating the chunk list, unknown chunks
    * skipped by their declared size — the same parsing a LIST/INFO or
    * fact chunk would need), not an offset hard-code. Returns None on
    * anything else — wrong magic, compressed formats, truncated data —
    * never throws on foreign bytes (same poison-row contract as
    * [[decodeImage]]).
    */
  /** Validated RIFF layout of a PCM16 WAV: where the samples live.
    * The single header walk shared by [[decodeWav]], [[decodePcm0]] and
    * [[decimatePcm]] — each clip is parsed exactly once per operator
    * pass, and the sample-stat walk (which [[decodeWav]] adds) never
    * runs for consumers that only need the raw samples.
    */
  private[graft] case class WavLayout(channels: Int, sampleRate: Int,
      bits: Int, dataOff: Int, nSamples: Int) {
    def nFrames: Int = nSamples / channels
  }

  private[graft] def parseWavLayout(bytes: Array[Byte]): Option[WavLayout] = {
    def u16(o: Int) = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def u32(o: Int) = (bytes(o) & 0xFF).toLong |
      ((bytes(o + 1) & 0xFF).toLong << 8) |
      ((bytes(o + 2) & 0xFF).toLong << 16) |
      ((bytes(o + 3) & 0xFF).toLong << 24)
    def tag(o: Int, t: String) =
      bytes.length >= o + 4 && new String(bytes, o, 4, "US-ASCII") == t
    if (bytes.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE"))
      return None
    // RIFF chunk walk: [id:4][size:4][payload:size, padded to even]
    var off = 12
    var fmtOff = -1
    var dataOff = -1
    var dataLen = 0L
    while (off + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
      val size = u32(off + 4)
      if (tag(off, "fmt ") && size >= 16) fmtOff = off + 8
      else if (tag(off, "data")) { dataOff = off + 8; dataLen = size }
      off += 8 + size.toInt + (size.toInt & 1)
      if (size > Int.MaxValue || off < 0) return None
    }
    if (fmtOff < 0 || dataOff < 0) return None
    val audioFormat = u16(fmtOff)
    val channels = u16(fmtOff + 2)
    val sampleRate = u32(fmtOff + 4).toInt
    val bits = u16(fmtOff + 14)
    if (audioFormat != 1 || bits != 16 || channels < 1 ||
      sampleRate <= 0) return None
    if (bytes.length < dataOff + dataLen || dataLen % (2L * channels) != 0)
      return None
    Some(WavLayout(channels, sampleRate, bits, dataOff, (dataLen / 2).toInt))
  }

  def decodeWav(bytes: Array[Byte]): Option[WavInfo] = parseWavLayout(bytes).map { lay =>
    val channels = lay.channels
    val dataOff = lay.dataOff
    val nSamples = lay.nSamples
    var sum = 0L
    var sumSq = 0L
    var peak = 0
    var zc = 0L
    var prevNeg = false
    var first = true
    var k = 0
    while (k < nSamples) {
      val o = dataOff + 2 * k
      val v = ((bytes(o) & 0xFF) | (bytes(o + 1) << 8)).toShort.toInt
      sum += v
      sumSq += v.toLong * v
      val a = math.abs(v)
      if (a > peak) peak = a
      if (k % channels == 0) { // channel 0 only
        val neg = v < 0
        if (!first && neg != prevNeg) zc += 1
        prevNeg = neg
        first = false
      }
      k += 1
    }
    WavInfo(channels, lay.sampleRate, lay.bits, nSamples.toLong / channels,
      sum.toDouble / nSamples, math.sqrt(sumSq.toDouble / nSamples),
      peak, zc)
  }

  /** Decoded-audio features over a media table — the same
    * `mapPartitions` screen-and-route shape as [[decodeImages]]: one
    * decoder scope per partition, undecodable rows quarantined with
    * decoded=false rather than thrown.
    */
  case class DecodedWav(doc_id: Long, decoded: Boolean,
      channels: Option[Int], sample_rate: Option[Int],
      n_frames: Option[Long], mean_amp: Option[Double],
      rms: Option[Double], peak_abs: Option[Int],
      zero_cross: Option[Long])

  def decodeWavs(media: DataFrame): Dataset[DecodedWav] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "mime", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          decodeWav(r.media) match {
            case Some(w) => DecodedWav(r.doc_id, decoded = true,
              Some(w.channels), Some(w.sampleRate), Some(w.nFrames),
              Some(w.meanAmp), Some(w.rms), Some(w.peakAbs),
              Some(w.zeroCross))
            case None => DecodedWav(r.doc_id, decoded = false,
              None, None, None, None, None, None, None)
          }
        }
      }
  }

  /** Canonical mono PCM16 RIFF/WAVE encoder — the single writer behind
    * [[decimatePcm]] and the test fixtures (one implementation, so the
    * encode and decode paths cannot drift). Samples are truncated to
    * their low 16 bits (two's complement wrap, the PCM16 contract).
    */
  private[graft] def writeWavMono16(rate: Int,
      samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bos = new java.io.ByteArrayOutputStream(44 + dataLen)
    def le16(v: Int): Unit = {
      bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF)
    }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16(v >>> 16) }
    bos.write("RIFF".getBytes("US-ASCII"))
    le32(36 + dataLen)
    bos.write("WAVEfmt ".getBytes("US-ASCII"))
    le32(16); le16(1); le16(1) // PCM, mono
    le32(rate); le32(rate * 2) // byte rate = rate * blockAlign
    le16(2); le16(16)          // blockAlign, bits
    bos.write("data".getBytes("US-ASCII"))
    le32(dataLen)
    samples.foreach(le16)
    bos.toByteArray
  }

  /** Decimate a mono PCM16 WAV media table by `everyK` — the audio
    * twin of [[resizeGray]]: keep every k-th sample, divide the header
    * sample rate by k, re-encode RIFF/WAVE. The
    * normalization/downsampling step of an audio pipeline (a real
    * deployment adds an anti-alias filter in the codec; the plumbing —
    * schema, one mapPartitions pass, media→media composition with
    * [[decodeWavs]]/[[audioFingerprints]] — is what this exercises).
    *
    * Dropped (quarantine discipline — anti-join the output against the
    * input to route them): undecodable bytes, non-mono clips, AND
    * clips whose sample rate is not divisible by `everyK` (an integral
    * output rate is part of the WAV contract; a production resampler
    * interpolates those instead of decimating).
    */
  def decimatePcm(media: DataFrame, everyK: Int): DataFrame = {
    require(everyK >= 1, "everyK must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "mime", "n_bytes").as[MediaRow]
      .flatMap { r =>
        for {
          lay <- parseWavLayout(r.media)
          if lay.channels == 1 && lay.sampleRate % everyK == 0
        } yield {
          // single header parse, then a stride copy straight out of the
          // payload bytes — no stats walk, no full-sample intermediate
          val kept = new Array[Int]((lay.nFrames + everyK - 1) / everyK)
          var i = 0
          while (i < kept.length) {
            val o = lay.dataOff + 2 * i * everyK
            kept(i) = ((r.media(o) & 0xFF) | (r.media(o + 1) << 8))
              .toShort.toInt
            i += 1
          }
          val out = writeWavMono16(lay.sampleRate / everyK, kept)
          MediaRow(r.doc_id, out, "audio/wav", out.length.toLong)
        }
      }.toDF()
  }

  /** Channel-0 PCM samples of a decoded WAV — the raw material for the
    * audio fingerprint (and any frame-level feature). Same validation
    * path as [[decodeWav]]; None on anything undecodable.
    */
  def decodePcm0(bytes: Array[Byte]): Option[Array[Int]] =
    parseWavLayout(bytes).map { lay =>
      // one header parse, one extraction pass — no stats walk
      val out = new Array[Int](lay.nFrames)
      var k = 0
      while (k < out.length) {
        val o = lay.dataOff + 2 * k * lay.channels // channel 0 of frame k
        out(k) = ((bytes(o) & 0xFF) | (bytes(o + 1) << 8)).toShort.toInt
        k += 1
      }
      out
    }

  /** 56-bit audio fingerprint: box-partition the channel-0 samples into
    * 57 frames (`[t·n/57, (t+1)·n/57)`, integer — the 1-D analogue of
    * [[dhash56]]'s box grid), take integer frame ENERGY (Σ v², exact in
    * int64 for 16-bit PCM up to ~2^33 samples/frame), and set one bit
    * per adjacent frame pair where energy(t) > energy(t+1). Energy-
    * envelope gradient signs survive gain changes and mild noise — the
    * cheap Shazam-family signature shape — and 56 bits keeps oracle
    * arithmetic signed-int64-safe, as with the image hash.
    *
    * Requires ≥ 57 samples (every frame non-empty).
    */
  def audioFp56(samples: Array[Int]): Option[Long] = {
    val n = samples.length
    if (n < 57) return None
    val energy = new Array[Long](57)
    var t = 0
    while (t < 57) {
      val a = t * n / 57
      val b = (t + 1) * n / 57
      var s = 0L
      var k = a
      while (k < b) { s += samples(k).toLong * samples(k); k += 1 }
      energy(t) = s
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < 56) {
      if (energy(i) > energy(i + 1)) fp |= 1L << i
      i += 1
    }
    Some(fp)
  }

  /** Per-clip audio fingerprints over a media table (mapPartitions,
    * quarantine shape). Output: doc_id, decoded, afp (null when
    * undecodable or shorter than 57 frames).
    */
  case class AudioFpRow(doc_id: Long, decoded: Boolean, afp: Option[Long])

  def audioFingerprints(media: DataFrame): Dataset[AudioFpRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media", "mime", "n_bytes").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val fp = decodePcm0(r.media).flatMap(audioFp56)
          AudioFpRow(r.doc_id, fp.isDefined, fp)
        }
      }
  }

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
