package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque binary columns with
  * typed metadata, decoded/feature-extracted per partition.
  *
  * The decode step is a clearly-marked DETERMINISTIC STUB (image/audio
  * libraries are absent in this environment) — but everything Spark-side is
  * real and scale-shaped: binary payload column, typed case-class Dataset,
  * mapPartitions batching (one decoder init per partition, the same shape
  * a JNI/FFmpeg/JPEG decoder needs), and partition sizing by payload bytes
  * rather than row count.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      doc_id: Long,
      media_type: String,
      payload: Array[Byte])

  /** Extracted features (decode-stub output). */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      payload_len: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: Long)

  /** Synthesizes a media table from the documents table: payload = UTF-8
    * bytes of the text, media_type round-robins image/audio/video. Stands
    * in for `spark.read.format("binaryFile")` / a parquet table with a
    * binary column.
    */
  def mediaFromDocuments(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Per-partition decode + feature extraction. The decoder handle is
    * created once per partition (the expensive part for a real codec) and
    * reused across the partition's rows.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val decoder = new StubDecoder // one init per partition, as a real codec needs
      it.map { rec =>
        val (w, h, frames, sum) = decoder.decode(rec.media_type, rec.payload)
        MediaFeatures(rec.doc_id, rec.media_type, rec.payload.length,
          w, h, frames, sum)
      }
    }
  }

  /** STUB DECODER — deterministic fake. A real implementation would wrap
    * an image/audio/video library here (and this is the only place that
    * changes); dimensions/frames are derived from payload bytes so results
    * are reproducible and testable.
    */
  final class StubDecoder {
    def decode(mediaType: String, payload: Array[Byte]): (Int, Int, Int, Long) = {
      var checksum = 0L
      var i = 0
      while (i < payload.length) { checksum = checksum * 31 + (payload(i) & 0xFF); i += 1 }
      val base = math.abs(checksum % 1024).toInt
      mediaType match {
        case "image" => (16 + base % 2048, 16 + (base * 7) % 2048, 1, checksum)
        case "audio" => (1, 0, 8000 + base * 16, checksum) // frames = samples
        case _       => (16 + base % 1920, 16 + (base * 3) % 1080, 24 + base % 240, checksum)
      }
    }
  }
}
