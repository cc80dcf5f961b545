package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns + typed metadata, with decode / feature-extraction
  * run batched per partition.
  *
  * The DECODE STEP IS A STUB (no image/audio libraries ship in this
  * container): `decodeStub` derives a deterministic fake feature vector
  * from the payload bytes. Everything around it — the schema, the
  * Dataset[T] typed boundary, the per-partition batching shape, the
  * partition-preserving plumbing — is real and tested; swapping the stub
  * for a JNI/ONNX decoder changes one function.
  *
  * Spark-side notes: in PySpark this is `mapInPandas` (arrow batches);
  * the Scala-native equivalent is a typed mapPartitions over an iterator
  * of rows, which keeps the exchange-free narrow execution and lets the
  * decoder amortize per-batch setup (model load, codec init) across the
  * partition.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)
  final case class MediaFeature(doc_id: Long, n_bytes: Int, digest: String, feature: Array[Float])

  /** Wrap documents as a fake media table: payload = utf-8 bytes. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      to_binary(col("text"), lit("utf-8")).as("payload"),
      lit("text/plain").as("mime"))

  /** STUB decoder: deterministic 8-dim feature from payload bytes.
    * ??? <- a real implementation decodes the media and runs a feature
    * extractor; per-partition setup cost amortizes over the iterator.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
    (0 until 8).map(i => ((md(i) & 0xff) / 255.0f)).toArray
  }

  /** The batched decode pass: one decoder instance per partition,
    * streaming through rows (constant memory, no collect).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition setup happens HERE (decoder/model init — stubbed
      // as ONE reused MessageDigest; `reset` after each digest call)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        // digest the payload ONCE per row; the hex id and the 8-dim
        // feature both derive from the same bytes (the payload hash is
        // the dominant per-row cost of this stub pass)
        val d = md.digest(r.payload)
        val feature = (0 until 8).map(i => ((d(i) & 0xff) / 255.0f)).toArray
        MediaFeature(r.doc_id, r.payload.length,
          d.map("%02x".format(_)).mkString, feature)
      }
    }
  }

  final case class Thumb(doc_id: Long, width: Int, height: Int,
                         n_bytes: Int, thumb: Array[Byte])

  /** STUB resize: deterministic w*h "thumbnail" bytes derived from the
    * payload by an md5 chain. ??? <- a real implementation decodes the
    * image and resamples; the OUTPUT CONTRACT (fixed w*h bytes per row,
    * one per input) is what downstream stages depend on and what the
    * spec pins.
    */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Byte](w * h)
    var seed = md.digest(payload)
    var i = 0
    while (i < out.length) {
      val take = math.min(16, out.length - i)
      System.arraycopy(seed, 0, out, i, take)
      i += take
      seed = md.digest(seed)
    }
    out
  }

  /** Batched resize pass: same narrow per-partition shape as decode —
    * the resampler (real ones carry per-partition codec state) streams
    * the iterator, never materializing the partition.
    */
  def resizeAll(spark: SparkSession, media: DataFrame, w: Int, h: Int): Dataset[Thumb] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map(r => Thumb(r.doc_id, w, h, r.payload.length, resizeStub(r.payload, w, h)))
    }
  }

  final case class FrameFeature(doc_id: Long, frame_idx: Int, feature: Array[Float])

  /** FRAME SAMPLING: treat the payload as a sequence of fixed-size
    * frames and emit a feature per every `stride`-th frame — the video
    * shape (one input row → many output rows). The 1→N expansion runs
    * INSIDE mapPartitions as a lazy flatMap over the iterator: a
    * 2-hour video never materializes all frames at once, and the stage
    * stays narrow (no shuffle; Spark's spill/batch machinery sees one
    * row at a time). Frame decode is the same documented stub seam.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int = 64, stride: Int = 4): Dataset[FrameFeature] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val nFrames = math.max(0, r.payload.length / frameBytes)
        (0 until nFrames by stride).iterator.map { f =>
          val frame = java.util.Arrays.copyOfRange(
            r.payload, f * frameBytes, (f + 1) * frameBytes)
          FrameFeature(r.doc_id, f, decodeStub(frame))
        }
      }
    }
  }
}
