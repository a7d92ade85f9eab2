package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata extracted by a batched per-partition
  * decoder (charter north-star). The container ships no image/audio codecs,
  * so the decode kernel is a clearly-marked deterministic STUB — but the
  * Spark-side plumbing is real and tested: binary column in, typed struct
  * out, decoding batched per partition exactly where a JNI/FFmpeg/Pillow
  * kernel would sit on a production cluster.
  *
  * The stub arithmetic is intentionally SQL-expressible (byte length + first
  * byte) so even this path gets an exact DuckDB oracle.
  */
object Multimodal {

  /** Decoded media metadata row. */
  case class MediaMeta(doc_id: Long, width: Long, height: Long,
                       format: String, n_frames: Long)

  /** STUB decode kernel: a real implementation would hand `payload` to an
    * image/audio decoder. Deterministic fake derived from the payload bytes
    * — stable across runs, executors, and engines.
    */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
    val len = payload.length.toLong
    val first = if (payload.isEmpty) 0L else (payload(0) & 0xffL)
    MediaMeta(
      doc_id = docId,
      width = 64L + len % 577L,
      height = 32L + (first * 3L) % 719L,
      format = (len % 3L) match {
        case 0L => "jpeg"
        case 1L => "png"
        case _ => "webp"
      },
      n_frames = 1L + len % 24L)
  }

  /** Per-partition batched decode — the mapPartitions shape a vectorized
    * decoder needs (amortized codec init per partition, one pass over the
    * batch). Input must have columns (doc_id long, payload binary).
    */
  def extractMeta(media: DataFrame): DataFrame = {
    val ds: Dataset[(Long, Array[Byte])] =
      media.select(col("doc_id"), col("payload"))
        .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { rows =>
      // codec/session init would happen once per partition here
      rows.map { case (id, bytes) => decodeStub(id, bytes) }
    }(Encoders.product[MediaMeta]).toDF()
  }

  /** Fake media table from the documents fixture: UTF-8 bytes of the text
    * stand in for an encoded image payload.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
}
