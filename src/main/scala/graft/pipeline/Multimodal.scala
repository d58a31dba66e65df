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

/** One DECODED video frame: pixel dimensions + 64-bit perceptual hash
  * (aHash). -1/0 sentinels for an undecodable frame — a corrupt frame
  * must not kill a 100 TB ingest job. */
case class VideoFrame(doc_id: Long, frame_idx: Int, width: Int,
    height: Int, ahash: Long)

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
  * duration) — again no external codec. VIDEO decode is REAL for
  * Motion-JPEG elementary streams (round 9, closing the last stub):
  * [[splitMjpegFrames]] walks the JPEG EOI markers (0xFFD9 — never a
  * raw byte inside entropy-coded data, where 0xFF is always
  * stuff-escaped) and each frame decodes through the same
  * `javax.imageio` path as still images. Inter-frame codecs (H.264/
  * VP9/AV1) genuinely require external decoders this container does
  * not ship and are OUT OF SCOPE by design, not stubbed: a real
  * deployment swaps [[videoFrames]]' per-frame ImageIO call for a
  * JNI/ffmpeg decode — the schema, the marker-walk batching, and the
  * per-partition resource shape all stay. The plumbing — binary
  * schema, partition-batched `mapPartitions` with per-partition
  * resource init (the Scala analog of a Pandas UDF's batch shape),
  * typed Dataset output — is identical for all three modalities.
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
          } else if (r.format == "video/x-motion-jpeg") {
            // real MJPEG decode: dimensions of the first frame
            splitMjpegFrames(r.payload).headOption
              .flatMap(f => Option(javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(f))))
              .map(img => (Some(img.getWidth), Some(img.getHeight)))
              .getOrElse((None, None))
          } else (None, None) // audio: see extractAudioFeatures — real;
                              // inter-frame video codecs: out of scope
        MediaFeatures(r.doc_id, r.payload.length, digest, r.format, w, h)
      }
    }
  }

  /** Deterministic pseudo-random PNG: pixel colors are a Weyl-mix hash
    * of (x, y, seed), so two payloads with the SAME seed+size are
    * pixel-identical while different seeds are decorrelated noise
    * (their perceptual hashes collide with ~2^-64 probability, unlike
    * smooth gradients where downsampling aliases sizes together).
    * Fixture generator for the perceptual-dedup path. */
  def noisyPngPayload(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // splitmix-style avalanche: plain Weyl mixing leaves adjacent
        // seeds correlated after box-averaging (seeds 3/4 landed at
        // Hamming 3 — caught by the oracle), so finalize properly
        var m = x * 73856093L ^ y * 19349663L ^ (seed * 0x9E3779B97F4A7C15L)
        m = (m ^ (m >>> 30)) * 0xBF58476D1CE4E5B9L
        m = (m ^ (m >>> 27)) * 0x94D049BB133111EBL
        m ^= m >>> 31
        img.setRGB(x, y, ((m >>> 16) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Split a Motion-JPEG elementary stream into its JPEG frames by a
    * REAL marker-segment walk (ITU T.81 §B): length-prefixed segments
    * (DQT/DHT/APPn — EXIF payloads and embedded thumbnails included)
    * are SKIPPED by their declared length, because their bodies may
    * legally contain 0xFF 0xD9; the byte-scan for the next marker runs
    * only inside entropy-coded scan data (after SOS), where every 0xFF
    * is stuff-escaped (0x00) or a restart marker 0xD0-0xD7 — so an
    * unescaped EOI there is always a true frame boundary. A raw
    * whole-stream EOI scan (the previous form) could cut a frame early
    * on real-world streams. Linear in the payload, zero copies beyond
    * the per-frame slices; malformed tails are dropped rather than
    * thrown (the per-frame decoder upstream already maps corrupt
    * frames to sentinels). */
  def splitMjpegFrames(payload: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val n = payload.length
    def u(i: Int) = payload(i) & 0xFF
    var start = 0
    var i = 0
    while (i < n - 1) {
      if (u(i) != 0xFF) { i += 1; start = i } // resync to a marker
      else u(i + 1) match {
        case 0xD8 => start = i; i += 2 // SOI: frame begins here
        case 0xD9 => // EOI: frame complete
          out += java.util.Arrays.copyOfRange(payload, start, i + 2)
          i += 2; start = i
        case 0xFF => i += 1 // fill byte
        case 0x01 | 0xD0 | 0xD1 | 0xD2 | 0xD3 | 0xD4 | 0xD5 | 0xD6 | 0xD7 =>
          i += 2 // TEM / bare RSTn: standalone, no length
        case 0xDA => // SOS: skip its header, then scan entropy-coded data
          if (i + 3 >= n) i = n
          else {
            i += 2 + ((u(i + 2) << 8) | u(i + 3))
            var done = false
            while (!done && i < n) {
              if (u(i) == 0xFF && i + 1 < n) {
                val b = u(i + 1)
                if (b == 0x00 || (b >= 0xD0 && b <= 0xD7)) i += 2 // stuffed/RST
                else done = true // real marker (EOI, DNL, next SOS…)
              } else i += 1
            }
          }
        case _ => // length-prefixed segment: skip body wholesale
          if (i + 3 >= n) i = n
          else i += 2 + ((u(i + 2) << 8) | u(i + 3))
      }
    }
    out.toSeq
  }

  /** Deterministic MJPEG fixture: `nFrames` noisy 16-bit-seeded frames
    * (the [[noisyPngPayload]] pixel generator), each JDK-JPEG-encoded
    * and concatenated — a genuine Motion-JPEG elementary stream. Same
    * (seed, frame count, size) ⇒ byte-identical stream. */
  def mjpegPayload(w: Int, h: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var m = x * 73856093L ^ y * 19349663L ^
            ((seed * 64 + f) * 0x9E3779B97F4A7C15L)
          m = (m ^ (m >>> 30)) * 0xBF58476D1CE4E5B9L
          m = (m ^ (m >>> 27)) * 0x94D049BB133111EBL
          m ^= m >>> 31
          img.setRGB(x, y, ((m >>> 16) & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      javax.imageio.ImageIO.write(img, "jpg", out)
      f += 1
    }
    out.toByteArray
  }

  /** REAL video frame extraction for MJPEG payloads: marker-walk the
    * stream, decode every `sampleEvery`-th frame through `javax.
    * imageio`, emit dimensions + the 64-bit perceptual aHash. Same
    * batch shape as the other decoders: rows streamed per partition,
    * corrupt frames yield sentinels instead of failing the job. An
    * inter-frame codec deployment swaps only the decode call. */
  def videoFrames(media: Dataset[MediaRow],
                  sampleEvery: Int = 1): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        splitMjpegFrames(r.payload).zipWithIndex
          .filter(_._2 % sampleEvery == 0)
          .map { case (frame, idx) =>
            try {
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(frame))
              if (img == null) VideoFrame(r.doc_id, idx, -1, -1, 0L)
              else VideoFrame(r.doc_id, idx, img.getWidth, img.getHeight,
                aHash64(img))
            } catch {
              case _: Exception => VideoFrame(r.doc_id, idx, -1, -1, 0L)
            }
          }
      }
    }
  }

  /** 64-bit average-hash (aHash) of a decoded image: downsample to an
    * 8×8 grid of mean luminances (integer box means over the pixel
    * rectangle each grid cell covers — exact, no float resampling),
    * then threshold each cell against the global mean. Bit i is set
    * when cell i is at or above the mean. The standard cheap perceptual
    * fingerprint: stable under small pixel perturbations, 64-bit
    * Hamming distance measures visual difference. */
  def aHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val cell = new Array[Long](64)
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        val x0 = gx * w / 8; val x1 = math.max((gx + 1) * w / 8, x0 + 1)
        val y0 = gy * h / 8; val y1 = math.max((gy + 1) * h / 8, y0 + 1)
        var s = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = img.getRGB(x, y)
            // integer luma: 2R + 5G + B (sums to 8 — shift, no division)
            s += (2L * ((rgb >> 16) & 0xff) + 5L * ((rgb >> 8) & 0xff) +
              (rgb & 0xff)) >> 3
            x += 1
          }
          y += 1
        }
        val n = (math.min(y1, h) - y0).toLong * (math.min(x1, w) - x0)
        cell(gy * 8 + gx) = if (n > 0) s / n else 0L
        gx += 1
      }
      gy += 1
    }
    val mean = cell.sum / 64
    var hash = 0L
    var i = 0
    while (i < 64) { if (cell(i) >= mean) hash |= (1L << i); i += 1 }
    hash
  }

  /** Decode → aHash, per-partition batched (the extractFeatures shape).
    * Undecodable payloads emit hash 0 with ok=false. */
  def imageAHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        if (img == null) (r.doc_id, 0L, false)
        else (r.doc_id, aHash64(img), true)
      }
    }.toDF("doc_id", "ahash", "ok")
  }

  /** Perceptual near-duplicate pair join over aHash fingerprints:
    * 4×16-bit band LSH (Hamming ≤ 3 flips at most 3 bands, so at least
    * one band survives untouched — the pigeonhole guarantee up to
    * maxHamming = 3 when banded 4 ways; larger radii trade recall) →
    * equi-join per band → dedup candidates → exact popcount verify.
    * Never all-pairs: candidate volume is Σ band-bucket sizes, the
    * MinHash-LSH shape applied to image fingerprints. */
  def phashPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    val bands = hashes.filter(col("ok"))
      .select(col("doc_id"), col("ahash"),
        explode(expr(
          "array(" + (0 until 4).map(b =>
            s"struct(${b} AS band, CAST(shiftright(ahash, ${b * 16}) & 65535 AS INT) AS bv)")
            .mkString(",") + ")")).as("bk"))
      .select(col("doc_id"), col("ahash"),
        col("bk.band").as("band"), col("bk.bv").as("bv"))
    val a = bands.select(col("band"), col("bv"),
      col("doc_id").as("a_id"), col("ahash").as("a_hash"))
    val b = bands.select(col("band"), col("bv"),
      col("doc_id").as("b_id"), col("ahash").as("b_hash"))
    a.join(b, Seq("band", "bv")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_hash").bitwiseXOR(col("b_hash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
