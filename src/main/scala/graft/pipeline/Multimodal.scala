package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque binary payload + typed metadata. */
case class MediaRow(doc_id: Long, payload: Array[Byte], format: String,
    source: String)

/** Per-item extracted features. Byte-level fields are always present;
  * `width`/`height` are decoded for image formats (real `javax.imageio`
  * decode) and None for non-image payloads. */
case class MediaFeatures(doc_id: Long, n_bytes: Int, digest: String,
    format: String, width: Option[Int], height: Option[Int])

/** One sampled frame/chunk of a media payload. */
case class MediaFrame(doc_id: Long, frame_idx: Int, n_bytes: Int,
    digest: String)

/** Decoded audio stream properties; -1 sentinels for undecodable
  * payloads (a corrupt row must not kill a 100 TB ingest job). */
case class AudioFeatures(doc_id: Long, n_bytes: Int, digest: String,
    sample_rate: Int, channels: Int, n_frames: Long, duration_ms: Long)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in per-partition batches.
  *
  * IMAGE decode is REAL: `extractFeatures` runs the payload through the
  * JDK's `javax.imageio` (PNG/JPEG/GIF/BMP) and emits decoded pixel
  * dimensions — no external codec dependency. AUDIO decode is REAL for
  * WAV/PCM/AIFF/AU: `extractAudioFeatures` parses the stream with the
  * JDK's `javax.sound.sampled` (sample rate, channels, frame count,
  * duration) — again no external codec. VIDEO decode is the one
  * remaining **STUB** (the container ships no video codecs): those
  * payloads get deterministic byte-level features (length + md5) where a
  * real pipeline would decode frames. The plumbing — binary schema,
  * partition-batched `mapPartitions` with per-partition resource init
  * (the Scala analog of a Pandas UDF's batch shape), typed Dataset
  * output — is identical for all three; swapping the video stub for a
  * JNI/ONNX decoder changes only the map body.
  */
object Multimodal {

  /** Deterministic tiny PNG: a w×h RGB gradient, JDK-encoded. Fixture
    * generator for the image-decode path (query + specs) — decoded
    * dimensions are checkable, encoded byte size is codec-internal. */
  def pngPayload(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic little WAV file: 16-bit little-endian PCM,
    * `nFrames` frames at `sampleRate` Hz with `channels` channels,
    * samples an integer ramp — JDK-encoded (RIFF/WAVE container via
    * `javax.sound.sampled`). Fixture generator for the audio-decode
    * path: decoded stream properties are checkable against the
    * generation parameters. */
  def wavPayload(sampleRate: Int, nFrames: Int, channels: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false)
    val data = new Array[Byte](nFrames * channels * 2)
    var i = 0
    while (i < nFrames * channels) {
      val v = ((i * 257) % 32768).toShort
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL audio decode — pure JDK `javax.sound.sampled`, which parses
    * WAV/PCM (and AIFF/AU) containers without any external codec: sample
    * rate, channel count, frame count, and integer duration in ms.
    * Undecodable payloads yield -1 sentinels instead of failing the
    * partition. Same batch shape as [[extractFeatures]]: one digest per
    * partition, rows streamed, no collect. */
  def extractAudioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5") // per-partition init
      rows.map { r =>
        md.reset()
        val digest = md.digest(r.payload).map("%02x".format(_)).mkString
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          try {
            val f = ais.getFormat
            val frames = ais.getFrameLength
            val rate = f.getSampleRate.toLong
            val durMs = if (rate > 0) frames * 1000L / rate else -1L
            AudioFeatures(r.doc_id, r.payload.length, digest,
              f.getSampleRate.toInt, f.getChannels, frames, durMs)
          } finally ais.close()
        } catch {
          case _: Exception =>
            AudioFeatures(r.doc_id, r.payload.length, digest, -1, -1, -1L, -1L)
        }
      }
    }
  }

  /** Derive a media table from the documents fixture: payload = UTF-8
    * bytes standing in for encoded image/audio bytes. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("text/plain").as("format"),
      col("source"))

  /** Frame sampling: split each payload into fixed-size chunks — the
    * video-frame / audio-window decomposition shape. One input row fans
    * out to ceil(bytes/frameSize) typed frame rows, streamed per
    * partition (no per-row job, no collect). A real codec would decode
    * at timestamps; the chunking IS the plumbing being exercised. */
  def frameSample(media: Dataset[MediaRow], frameSize: Int = 64): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        r.payload.grouped(frameSize).zipWithIndex.map { case (chunk, i) =>
          md.reset()
          MediaFrame(r.doc_id, i, chunk.length,
            md.digest(chunk).map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** Resize STUB: truncate the payload to a byte budget, recording the
    * original size in place of real re-encoding (no codecs in this
    * container). Schema/partitioning/laziness are the real parts. */
  def resizeStub(media: Dataset[MediaRow], maxBytes: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(r =>
      if (r.payload.length <= maxBytes) r
      else r.copy(payload = r.payload.take(maxBytes)))
  }

  /** Batch feature extraction: one MessageDigest per partition (resource
    * init amortized over the batch — the mapInPandas pattern), rows
    * streamed, no collect. Image formats are ACTUALLY decoded
    * (javax.imageio) for pixel dimensions; audio has its own real
    * decoder ([[extractAudioFeatures]]); video decode is the remaining
    * stub (byte features only). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5") // per-partition init
      rows.map { r =>
        md.reset()
        val digest = md.digest(r.payload).map("%02x".format(_)).mkString
        val (w, h) =
          if (r.format.startsWith("image/")) {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.payload))
            if (img != null) (Some(img.getWidth), Some(img.getHeight))
            else (None, None) // undecodable/corrupt image payload
          } else (None, None) // STUB: video frame decode would go here
                              // (audio: see extractAudioFeatures — real)
        MediaFeatures(r.doc_id, r.payload.length, digest, r.format, w, h)
      }
    }
  }
}
