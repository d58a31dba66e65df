package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque binary payload + typed metadata. */
case class MediaRow(doc_id: Long, payload: Array[Byte], format: String,
    source: String)

/** Per-item extracted features (deterministic; see decode STUB note). */
case class MediaFeatures(doc_id: Long, n_bytes: Int, digest: String,
    format: String)

/** One sampled frame/chunk of a media payload. */
case class MediaFrame(doc_id: Long, frame_idx: Int, n_bytes: Int,
    digest: String)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in per-partition batches.
  *
  * The heavy codec step is a **STUB**: this container has no image/audio
  * libraries, so `extractFeatures` computes deterministic byte-level
  * features (length + md5) where a real pipeline would decode pixels /
  * samples. Everything around the stub — binary schema, partition-batched
  * `mapPartitions` with per-partition resource init (the Scala analog of a
  * Pandas UDF's batch shape), typed Dataset output — is real and tested;
  * swapping the stub for a JNI/ONNX decoder changes only the map body.
  */
object Multimodal {

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
    * streamed, no collect. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5") // per-partition init
      rows.map { r =>
        md.reset()
        val digest = md.digest(r.payload).map("%02x".format(_)).mkString
        // STUB: real decode (pixels/samples/frames) would happen here
        MediaFeatures(r.doc_id, r.payload.length, digest, r.format)
      }
    }
  }
}
