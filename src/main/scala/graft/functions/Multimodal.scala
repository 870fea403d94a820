package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-local
  * batches.
  *
  * The DECODE step is a clearly-marked deterministic STUB — no image/audio
  * codec libraries exist in this container. Everything around it is the
  * real Spark shape a production pipeline needs: binary column in, typed
  * struct out, `mapPartitions` batching (the Scala analog of `mapInPandas`
  * batch processing — one decoder init per partition, not per row),
  * partition-size control upstream, and columnar metadata downstream.
  * Swapping `stubDecode` for a real codec is a one-function change.
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
      // real codec: init decoder context here, once per partition
      it.map { case (id, bytes) => stubDecode(id, bytes) }
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
