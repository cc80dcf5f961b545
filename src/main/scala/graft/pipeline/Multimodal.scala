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
      // per-partition setup happens HERE (decoder/model init — stubbed)
      val digestOf = (b: Array[Byte]) =>
        java.security.MessageDigest.getInstance("MD5").digest(b)
          .map("%02x".format(_)).mkString
      rows.map { r =>
        MediaFeature(r.doc_id, r.payload.length, digestOf(r.payload), decodeStub(r.payload))
      }
    }
  }
}
