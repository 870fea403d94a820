package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-local
  * batches.
  *
  * The DECODE step is REAL for the two public uncompressed raster formats
  * a pure-JVM parser can own outright — P6 binary PPM and uncompressed
  * BMP: magic sniffing, header parse, dimensions, and a pixel-payload
  * checksum, written from the published format specs (netpbm / Windows
  * BITMAPINFOHEADER), no codec jars. Compressed formats (jpeg/png/webp/
  * mp4) fall back to a clearly-marked deterministic STUB — those codecs
  * don't exist in this container; a real deployment swaps [[stubDecode]]
  * for a codec call and everything else stays as-is. The Spark shape is
  * the production one throughout: binary column in, typed struct out,
  * `mapPartitions` batching (the Scala analog of `mapInPandas` — one
  * decoder init per partition, not per row), partition-size control
  * upstream, columnar metadata downstream.
  */
object Multimodal {

  case class MediaMeta(
      media_id: Long,
      n_bytes: Int,
      format: String,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: Long)

  /** Magic-sniffing decode: real P6-PPM / BMP parse when the payload is
    * one, deterministic stub otherwise (compressed formats — no codec
    * jars in this container). Malformed payloads that merely START with a
    * known magic fall through to the stub rather than failing the task:
    * at 10^9 payloads a poison byte string must degrade, not kill, the
    * pipeline (a production deployment would route them to the DLQ).
    */
  def decode(id: Long, bytes: Array[Byte]): MediaMeta =
    decodePpm(id, bytes).orElse(decodeBmp(id, bytes))
      .getOrElse(stubDecode(id, bytes))

  /** REAL from-scratch P6 (binary PPM, netpbm spec) parser: `P6` magic,
    * whitespace/`#`-comment-tolerant header (width, height, maxval ≤ 255),
    * exactly one whitespace byte, then `w*h*3` pixel bytes. `checksum` =
    * unsigned sum of the pixel bytes (an order-independent channel stat an
    * external engine can recompute). None when not a well-formed P6.
    */
  private[graft] def decodePpm(id: Long, bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var i = 2
    def isWs(c: Byte) = c == ' ' || c == '\n' || c == '\r' || c == '\t'
    def int(): Int = {
      // header whitespace, with '#'-to-end-of-line comments
      var inHeader = true
      while (inHeader && i < bytes.length) {
        if (bytes(i) == '#') {
          while (i < bytes.length && bytes(i) != '\n') i += 1
        } else if (isWs(bytes(i))) i += 1
        else inHeader = false
      }
      var v = 0
      var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9' &&
          v <= 214748363) {
        v = v * 10 + (bytes(i) - '0'); i += 1; any = true
      }
      if (any) v else -1
    }
    val w = int(); val h = int(); val maxval = int()
    // exactly one whitespace byte after maxval (netpbm spec) — anything
    // else means a malformed header, which must NOT parse as a P6
    if (i >= bytes.length || !isWs(bytes(i))) return None
    i += 1
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255 ||
        w.toLong * h * 3 != bytes.length - i) return None
    var sum = 0L
    var j = i
    while (j < bytes.length) { sum += bytes(j) & 0xff; j += 1 }
    Some(MediaMeta(id, bytes.length, "ppm", w, h, 1, sum))
  }

  /** REAL from-scratch BMP (Windows BITMAPINFOHEADER) parser: `BM` magic,
    * little-endian pixel-data offset at byte 10, width/height at 18/22
    * (height may be negative = top-down row order). `checksum` = unsigned
    * sum of the pixel-array bytes. None when not a plausible BMP.
    */
  private[graft] def decodeBmp(id: Long, bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    def le32(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    val dataOff = le32(10)
    val w = le32(18)
    val h = le32(22)
    if (w <= 0 || h == 0 || dataOff < 54 || dataOff > bytes.length) return None
    var sum = 0L
    var j = dataOff
    while (j < bytes.length) { sum += bytes(j) & 0xff; j += 1 }
    Some(MediaMeta(id, bytes.length, "bmp", w, math.abs(h), 1, sum))
  }

  /** Deterministic synthetic P6 PPM (id-parameterized dims, constant
    * pixel value): the oracle fixture for the REAL decoder — every
    * metadata field is recomputable arithmetically from the id by an
    * external engine (width = 1 + id mod 31, height = 1 + id mod 13,
    * pixel byte = id mod 256, so checksum = w·h·3·pixel).
    */
  def syntheticPpm(id: Long): Array[Byte] = {
    val w = (1L + Math.floorMod(id, 31L)).toInt
    val h = (1L + Math.floorMod(id, 13L)).toInt
    val v = Math.floorMod(id, 256L).toInt
    val header = s"P6\n$w $h\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    java.util.Arrays.fill(out, header.length, out.length, v.toByte)
    out
  }

  /** STUB decode: deterministic pseudo-metadata from the payload bytes.
    * A real deployment replaces this body with an actual codec call; the
    * signature and everything calling it stay as-is.
    */
  def stubDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    // ??? <- real codec goes here; deterministic fake below
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val fmt = (h & 3) match {
      case 0 => "jpeg"; case 1 => "png"; case 2 => "webp"; case _ => "mp4"
    }
    MediaMeta(id, bytes.length, fmt,
      width = 64 + math.abs(h % 1024).toInt,
      height = 64 + math.abs((h >> 10) % 1024).toInt,
      n_frames = if (fmt == "mp4") 1 + math.abs((h >> 20) % 240).toInt else 1,
      checksum = h)
  }

  /** Decode a (id, payload) dataset to typed metadata in partition-local
    * batches. `mapPartitions` so decoder state (a real codec context) is
    * initialized once per task, amortized over the whole partition.
    */
  def decodeMeta(media: Dataset[(Long, Array[Byte])]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codec context (for the compressed-format path) would init
      // here, once per partition; the PPM/BMP parsers are stateless
      it.map { case (id, bytes) => decode(id, bytes) }
    }
  }

  /** End-to-end shape over a DataFrame with (idCol: long, binCol: binary):
    * decode IN PLACE and return columnar metadata. No repartition by
    * default: the parquet scan already bounds partitions at
    * `spark.sql.files.maxPartitionBytes` (≤128 MB), so shuffling every
    * payload byte through an exchange before decode would move 100 TB of
    * media across the wire for nothing. Pass `partitions` explicitly only
    * when batch memory must be re-bounded (payload bytes per task ≈ input
    * bytes / partitions) — e.g. a narrow upstream filter left few, fat
    * partitions.
    */
  def extractMeta(df: DataFrame, idCol: String, binCol: String,
      partitions: Option[Int] = None): DataFrame = {
    import df.sparkSession.implicits._
    val base = df.select(col(idCol).cast("long"), col(binCol))
      .na.drop(Seq(binCol))
    val typed = partitions.fold(base)(n => base.repartition(n))
      .as[(Long, Array[Byte])]
    decodeMeta(typed).toDF()
  }
}
