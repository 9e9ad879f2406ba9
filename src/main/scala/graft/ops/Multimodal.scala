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

  /** The production ingest path: raw media FILES via Spark's built-in
    * `binaryFile` source (streams file content as a binary column with
    * path/length/mtime metadata — no driver-side file handling, splits
    * distribute like any scan). media_type derives from the extension,
    * doc_id from an xxhash64 of the path (stable across re-ingests; a
    * catalog join can override). `pathGlobFilter` pre-filters at listing
    * time so a mixed directory only reads matching payloads.
    */
  def mediaFromBinaryDir(
      dir: String,
      glob: Option[String] = None)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    val reader = spark.read.format("binaryFile")
    val withGlob = glob.fold(reader)(g => reader.option("pathGlobFilter", g))
    val ext = lower(element_at(split(col("path"), "\\."), -1))
    withGlob.load(dir)
      .select(
        xxhash64(col("path")).as("doc_id"),
        when(ext.isin("jpg", "jpeg", "png", "gif", "bmp"), "image")
          .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
          .when(ext.isin("mp4", "mkv", "webm", "avi"), "video")
          .otherwise("binary").as("media_type"),
        col("content").as("payload"))
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

  /** One sampled frame of a video payload. */
  final case class FrameRecord(
      doc_id: Long,
      frame_idx: Int,
      payload_len: Int,
      frame_hash: Long)

  /** A resized media row (images only pass through resize). */
  final case class ResizedMedia(
      doc_id: Long,
      width: Int,
      height: Int,
      payload: Array[Byte])

  /** Frame sampling: every `everyN`-th frame of each VIDEO row, one
    * output row per sampled frame — the standard decimation before
    * vision-model feature extraction. flatMap shape: per-row output is
    * bounded by n_frames/everyN (never the whole video), non-video rows
    * emit nothing, and the decoder is initialized once per partition.
    * The frame "pixels" are a deterministic stub hash; a real codec
    * seeks+decodes here and ONLY here changes.
    */
  def sampleFrames(media: Dataset[MediaRecord], everyN: Int): Dataset[FrameRecord] = {
    require(everyN > 0)
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val decoder = new StubDecoder
      it.flatMap { rec =>
        if (rec.media_type != "video") Iterator.empty
        else {
          val (_, _, frames, sum) = decoder.decode(rec.media_type, rec.payload)
          Iterator.range(0, frames, everyN).map { f =>
            FrameRecord(rec.doc_id, f, rec.payload.length,
              sum * 1315423911L + f)
          }
        }
      }
    }
  }

  /** Aspect-preserving resize of IMAGE rows so max(width, height) ==
    * `maxDim` (smaller images upscale too — deterministic contract).
    * Integer arithmetic only; the resampled payload is a stub stride
    * slice standing in for the real pixel resample. Non-image rows are
    * dropped (resize is an image-pipeline stage).
    */
  def resizeImages(media: Dataset[MediaRecord], maxDim: Int): Dataset[ResizedMedia] = {
    require(maxDim > 0)
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val decoder = new StubDecoder
      it.flatMap { rec =>
        if (rec.media_type != "image") Iterator.empty
        else {
          val (w, h, _, _) = decoder.decode(rec.media_type, rec.payload)
          val (nw, nh) =
            if (w >= h) (maxDim, math.max(1, (h.toLong * maxDim / w).toInt))
            else (math.max(1, (w.toLong * maxDim / h).toInt), maxDim)
          // stub resample: stride-sliced payload, length scaled by area ratio
          val outLen = math.max(1,
            (rec.payload.length.toLong * nw * nh / (w.toLong * h)).toInt)
          val out = new Array[Byte](outLen)
          var i = 0
          while (i < outLen) {
            out(i) = rec.payload((i.toLong * rec.payload.length / outLen).toInt)
            i += 1
          }
          Iterator.single(ResizedMedia(rec.doc_id, nw, nh, out))
        }
      }
    }
  }

  /** One fixed-length audio chunk (sample-indexed window). */
  final case class AudioChunk(
      doc_id: Long,
      chunk_idx: Int,
      start_sample: Int,
      n_samples: Int,
      chunk_hash: Long)

  /** Fixed-length audio chunking with overlap — the Whisper-style
    * 30-second-window stage an ASR/audio-embedding pipeline runs between
    * decode and model: AUDIO rows only, one output row per window of
    * `chunkSamples` samples advancing by `chunkSamples − overlapSamples`.
    * flatMap shape like [[sampleFrames]]: per-row output is bounded by
    * n_samples/stride, non-audio rows emit nothing, decoder init once
    * per partition. The trailing partial window is emitted (models pad);
    * its `n_samples` records the true remainder so downstream padding is
    * explicit. Chunk "samples" are a stub hash — a real PCM slice
    * replaces only the hash line.
    */
  def chunkAudio(
      media: Dataset[MediaRecord],
      chunkSamples: Int,
      overlapSamples: Int = 0): Dataset[AudioChunk] = {
    require(chunkSamples > 0, "chunkSamples must be positive")
    require(overlapSamples >= 0 && overlapSamples < chunkSamples,
      "overlap must be in [0, chunkSamples)")
    val stride = chunkSamples - overlapSamples
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val decoder = new StubDecoder
      it.flatMap { rec =>
        if (rec.media_type != "audio") Iterator.empty
        else {
          val (_, _, samples, sum) = decoder.decode(rec.media_type, rec.payload)
          // windows starting every `stride` until the signal is covered;
          // a start inside the previous window's overlap only counts if
          // it contributes new samples (start < samples)
          Iterator.from(0).map(_ * stride).takeWhile(_ < samples).zipWithIndex
            .map { case (start, idx) =>
              val n = math.min(chunkSamples, samples - start)
              AudioChunk(rec.doc_id, idx, start, n,
                sum * 1315423911L + start)
            }
        }
      }
    }
  }

  /** A 64-bit perceptual image hash row. */
  final case class ImageHash(doc_id: Long, phash: Long)

  /** Perceptual image hash (average-hash variant of the pHash family):
    * decode → grayscale → 8×8 downsample → mean-threshold → 64 packed
    * sign bits.
    *
    * The decode is REAL for actual image payloads (r13): `javax.imageio`
    * ships with the JDK, so PNG/JPEG/GIF/BMP bytes decode to pixels and
    * the 8×8 luma grid is a true average-pool of Rec.601 luma
    * (integer arithmetic — (299R+587G+114B)/1000, cell boundaries
    * `floor(k·dim/8)`). Payloads ImageIO cannot decode (the synthetic
    * corpus's opaque bytes; exotic codecs absent from the JDK) fall back
    * to the original deterministic stub sampling — 64 evenly-sampled
    * payload bytes as the luma grid — so the plumbing stays testable
    * without codec fixtures. Locality either way: small pixel (or byte)
    * perturbations flip few luma cells, hence few bits — which is what
    * makes the Hamming blocking work. IMAGE rows only; one decoder init
    * per partition; ImageIO's disk cache is disabled (pure in-memory
    * decode, nothing written to executor tmp).
    */
  def imagePhash(media: Dataset[MediaRecord]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { rec =>
        if (rec.media_type != "image" || rec.payload.isEmpty) Iterator.empty
        else {
          val luma = lumaGrid8x8(rec.payload).getOrElse {
            val n = rec.payload.length
            Array.tabulate(64)(i =>
              rec.payload(((i.toLong * n) / 64).toInt) & 0xFF)
          }
          val mean = luma.sum / 64
          var h = 0L
          var i = 0
          while (i < 64) {
            if (luma(i) > mean) h |= (1L << i)
            i += 1
          }
          Iterator.single(ImageHash(rec.doc_id, h))
        }
      }
    }
  }

  /** Real decode path: payload bytes → 8×8 average-pooled integer luma
    * grid, or None when the bytes are not a decodable image (ImageIO
    * returns null / throws on garbage input — both map to the stub
    * fallback). Deterministic: PNG/BMP/GIF decode bit-exactly by spec;
    * a JPEG decodes identically within one JVM, and the hash tolerates
    * decoder drift by construction (a ±1 luma wobble flips at most the
    * cells sitting exactly on the mean). Cells are
    * `[floor(cy·h/8), floor((cy+1)·h/8))` — images smaller than 8×8
    * clamp to at least one pixel per cell. Bit order matches the stub:
    * bit i = cell (i div 8, i mod 8).
    */
  private[ops] def lumaGrid8x8(payload: Array[Byte]): Option[Array[Int]] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val grid = new Array[Int](64)
        var cy = 0
        while (cy < 8) {
          val y0 = (cy.toLong * h / 8).toInt
          val y1 = math.max((cy + 1).toLong * h / 8, y0 + 1).toInt
          var cx = 0
          while (cx < 8) {
            val x0 = (cx.toLong * w / 8).toInt
            val x1 = math.max((cx + 1).toLong * w / 8, x0 + 1).toInt
            var sum = 0L
            var y = y0
            while (y < math.min(y1, h)) {
              var x = x0
              while (x < math.min(x1, w)) {
                val rgb = img.getRGB(x, y)
                sum += (299L * ((rgb >> 16) & 0xFF) +
                  587L * ((rgb >> 8) & 0xFF) +
                  114L * (rgb & 0xFF)) / 1000L
                x += 1
              }
              y += 1
            }
            val n = (math.min(y1, h) - y0).toLong *
              (math.min(x1, w) - x0).toLong
            grid(cy * 8 + cx) = if (n > 0) (sum / n).toInt else 0
            cx += 1
          }
          cy += 1
        }
        Some(grid)
      }
    } catch { case _: Exception => None }

  /** Near-duplicate IMAGE pairs by pHash Hamming distance ≤ `maxHamming`
    * — [[graft.ops.Dedup.hammingPairs]] (the d04 pigeonhole blocking)
    * reused verbatim on the image hashes: visual dedup composes with the
    * text dedup ladder instead of growing its own candidate machinery.
    */
  def phashPairs(
      media: Dataset[MediaRecord],
      maxHamming: Int = 3,
      maxBucketSize: Int = 1024): DataFrame =
    graft.ops.Dedup.hammingPairs(
      imagePhash(media).toDF("id", "sh"), maxHamming, maxBucketSize)

  /** End-to-end visual dedup: pHash pairs → duplicate-cluster connected
    * components (d08's contraction machinery) → keep the min-id image
    * per visual cluster. Returns (doc_id, keep) for every IMAGE row —
    * the same admit/drop contract the text dedup ladder produces, so
    * multimodal corpora run ONE curation loop over both ladders.
    */
  def dedupImages(
      media: Dataset[MediaRecord],
      maxHamming: Int = 3): DataFrame = {
    import org.apache.spark.sql.DataFrame
    val hashes = imagePhash(media).toDF("doc_id", "phash")
    val pairs = phashPairs(media, maxHamming)
    val labels = graft.ops.Clusters
      .connectedComponents(pairs, "id_a", "id_b") // (id, label)
    hashes.join(labels, hashes("doc_id") === labels("id"), "left")
      .select(hashes("doc_id"),
        coalesce(col("cluster_id"), hashes("doc_id")).as("cluster"))
      .withColumn("keep", col("doc_id") === col("cluster"))
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
