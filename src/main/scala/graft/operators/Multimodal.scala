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

  /** Resize plumbing: target dimensions for a bounding-box fit
    * (aspect-preserving, never upscaling) computed from the decoded
    * metadata. A real implementation would hand (payload, new_w, new_h) to
    * the decoder's scaler; the dimension arithmetic here IS the production
    * logic and is pure IEEE-double, so it gets an exact SQL oracle.
    */
  def resizeMeta(media: DataFrame, maxW: Int = 256, maxH: Int = 256): DataFrame =
    extractMeta(media)
      .withColumn("scale",
        least(lit(1.0), lit(maxW.toDouble) / col("width"), lit(maxH.toDouble) / col("height")))
      .select(col("doc_id"), col("width"), col("height"),
        floor(col("width") * col("scale")).cast("long").as("new_width"),
        floor(col("height") * col("scale")).cast("long").as("new_height"))

  /** Frame sampling plumbing for video-like payloads: one output row per
    * sampled frame index (every `everyN`-th of the decoded `n_frames`),
    * with a deterministic per-frame fingerprint standing in for the decoded
    * frame bytes. The shape a real frame extractor needs — explode to
    * (doc, frame) grain WITHOUT shuffling the payload more than once; the
    * payload never rides the exploded rows, only its 32-char digest.
    * Fingerprint arithmetic is the portable md5-based
    * [[graft.functions.Hashing.h60]] so the DuckDB gate replicates it
    * exactly (a real decoder would emit frame bytes here anyway — the hash
    * choice is plumbing, not semantics).
    */
  def sampleFrames(media: DataFrame, everyN: Int = 4): DataFrame = {
    import graft.functions.Hashing.h60
    val meta = extractMeta(media).select(col("doc_id"), col("n_frames"))
    media.join(meta, Seq("doc_id"))
      // digest BELOW the generator: md5 runs once per payload, the exploded
      // frame rows carry only the 32-char digest
      .select(col("doc_id"), md5(col("payload")).as("payload_fp"), col("n_frames"))
      .select(col("doc_id"), col("payload_fp"),
        explode(sequence(lit(0L), col("n_frames") - 1L, lit(everyN.toLong))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        h60(concat_ws("-", col("payload_fp"), col("doc_id").cast("string"),
          col("frame_idx").cast("string"))).as("frame_hash"))
  }

  /** Feature-extraction plumbing: binary payload → dense `array<float>`
    * (the embedding a vision/audio model would produce — STUB arithmetic,
    * real schema/batching). Output feeds [[Similarity]] unchanged. Portable
    * hash arithmetic (see [[sampleFrames]]) — the digest is computed once
    * per payload, then each dimension hashes digest∥i.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    import graft.functions.Hashing.h60
    media.select(col("doc_id").as("vec_id"),
      graft.functions.ExprUtils.bindOnce(md5(col("payload"))) { digest =>
        transform(sequence(lit(0), lit(dim - 1)), i =>
          (pmod(h60(concat_ws("-", digest, i.cast("string"))), lit(2000L))
            .cast("double") / 1000.0 - 1.0).cast("float"))
      }.as("embedding"))
  }
}
