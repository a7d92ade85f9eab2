package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata extracted by a batched per-partition
  * decoder (charter north-star). Two kernel tiers share the same plumbing:
  *
  *  - REAL image kernels ([[decodeImage]], [[extractMetaImage]],
  *    [[resizeImage]], [[extractFeaturesImage]]) on the JDK's
  *    `javax.imageio` (PNG/JPEG/GIF/BMP decoders ship in every JRE — no
  *    added jars). Spec territory: the gate corpus carries no real media,
  *    so MultimodalSpec synthesizes deterministic PNGs/GIFs
  *    ([[synthesizePng]], [[synthesizeGif]]) and pins decoded
  *    metadata/rasters against the synthesis parameters, end-to-end into
  *    [[Similarity.bruteForceTopK]].
  *  - STUB kernel ([[decodeStub]]) for the DuckDB gate rows: intentionally
  *    SQL-expressible arithmetic (byte length + first byte) over the
  *    documents fixture's text bytes, because the oracle cannot decode
  *    PNG. The gate verifies the PLUMBING (schema, batching, explode
  *    shape, payload never riding exploded rows); the real-kernel specs
  *    verify the decode.
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

  // --- real image kernels (JDK javax.imageio) -------------------------------

  /** Magic-byte format sniff — lets the per-partition decoder cache ONE
    * ImageReader per format instead of running the ImageIO service lookup
    * per row (the codec-amortization a production kernel does with its
    * decoder contexts). */
  private def sniffFormat(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P'.toByte) "png"
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
    else if (b.length >= 3 && b(0) == 'G'.toByte && b(1) == 'I'.toByte &&
      b(2) == 'F'.toByte) "gif"
    else if (b.length >= 2 && b(0) == 'B'.toByte && b(1) == 'M'.toByte) "bmp"
    else "unknown"

  /** Per-partition decoder context: format-keyed ImageReader cache +
    * ImageIO's disk cache disabled (executor-local temp files for KB-sized
    * streams would be pure overhead). */
  private final class ImageCodec {
    javax.imageio.ImageIO.setUseCache(false)
    private val readers =
      scala.collection.mutable.Map.empty[String, javax.imageio.ImageReader]
    private def reader(fmt: String): javax.imageio.ImageReader =
      readers.getOrElseUpdate(fmt, {
        val it = javax.imageio.ImageIO.getImageReadersByFormatName(fmt)
        require(it.hasNext, s"no JDK ImageReader for format '$fmt'")
        it.next()
      })
    /** Header-only metadata read (dimensions + frame count without a full
      * raster decode — ImageReader reads just the stream header). */
    def meta(docId: Long, payload: Array[Byte]): MediaMeta = {
      val fmt = sniffFormat(payload)
      require(fmt != "unknown", s"doc $docId: payload is not a decodable image")
      val r = reader(fmt)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        r.setInput(iis)
        // allowSearch: walks the stream, so animated GIFs report their real
        // frame count (spec-pinned against synthesizeGif's nFrames)
        MediaMeta(docId, r.getWidth(0).toLong, r.getHeight(0).toLong, fmt,
          r.getNumImages(true).toLong)
      } finally iis.close()
    }
    /** Full first-frame raster decode. */
    def decode(docId: Long, payload: Array[Byte]): java.awt.image.BufferedImage = {
      val fmt = sniffFormat(payload)
      require(fmt != "unknown", s"doc $docId: payload is not a decodable image")
      val r = reader(fmt)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try { r.setInput(iis); r.read(0) } finally iis.close()
    }
    /** EVERY frame's raster, decoded with ONE stream setup (the per-frame
      * video/animation tier — `reader.read(i)` per frame index). The
      * frames are materialized before the stream closes; payloads are
      * KB-sized synthesized media, and a production kernel would stream
      * per frame with the same reader-reuse shape. */
    def decodeFrames(docId: Long,
                     payload: Array[Byte]): Seq[(Int, java.awt.image.BufferedImage)] = {
      val fmt = sniffFormat(payload)
      require(fmt != "unknown", s"doc $docId: payload is not a decodable image")
      val r = reader(fmt)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        r.setInput(iis)
        (0 until r.getNumImages(true)).map(i => (i, r.read(i)))
      } finally iis.close()
    }
  }

  /** Real image-decode kernel for one payload (spec/driver convenience —
    * the distributed paths amortize the codec via [[ImageCodec]] per
    * partition instead). */
  def decodeImage(docId: Long, payload: Array[Byte]): MediaMeta =
    new ImageCodec().meta(docId, payload)

  /** [[extractMeta]]'s real-kernel twin: same mapPartitions plumbing, the
    * decode is a genuine `javax.imageio` header read. */
  def extractMetaImage(media: DataFrame): DataFrame = {
    val ds: Dataset[(Long, Array[Byte])] =
      media.select(col("doc_id"), col("payload"))
        .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { rows =>
      val codec = new ImageCodec() // codec init once per partition
      rows.map { case (id, bytes) => codec.meta(id, bytes) }
    }(Encoders.product[MediaMeta]).toDF()
  }

  /** Real resize kernel: decode → bounding-box fit (the [[resizeMeta]]
    * arithmetic: aspect-preserving, never upscaling, floor'd — clamped to
    * ≥1 px) → nearest-neighbor resample → PNG re-encode. The resample is a
    * hand-rolled integer source-index loop (`sx = x·w/newW`), not an AWT
    * scaler op, so the output raster is bit-deterministic across JVMs.
    * Output: (doc_id, new_width, new_height, payload) with payload a real
    * PNG of the resized raster — MultimodalSpec decodes it back and pins
    * the dimensions.
    */
  def resizeImage(media: DataFrame, maxW: Int = 256, maxH: Int = 256): DataFrame = {
    val ds: Dataset[(Long, Array[Byte])] =
      media.select(col("doc_id"), col("payload"))
        .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { rows =>
      val codec = new ImageCodec()
      rows.map { case (id, bytes) =>
        val img = codec.decode(id, bytes)
        val (w, h) = (img.getWidth, img.getHeight)
        val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
        val nw = math.max(1, math.floor(w * scale).toInt)
        val nh = math.max(1, math.floor(h * scale).toInt)
        val out = new java.awt.image.BufferedImage(
          nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < nh) {
          var x = 0
          while (x < nw) { out.setRGB(x, y, img.getRGB(x * w / nw, y * h / nh)); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        (id, nw.toLong, nh.toLong, bos.toByteArray)
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong, Encoders.BINARY))
      .toDF("doc_id", "new_width", "new_height", "payload")
  }

  /** The integer core of the feature kernel: per grid-cell luminance sums
    * (ITU-R 601 luma ×1000) and pixel counts — exact Long arithmetic,
    * bit-deterministic regardless of pixel visit order. */
  private def cellSums(img: java.awt.image.BufferedImage,
                       grid: Int): (Array[Long], Array[Long]) = {
    val (w, h) = (img.getWidth, img.getHeight)
    val sums = new Array[Long](grid * grid)
    val counts = new Array[Long](grid * grid)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = ((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L +
          (rgb & 0xff) * 114L
        val cell = (y * grid / h) * grid + (x * grid / w)
        sums(cell) += lum
        counts(cell) += 1L
        x += 1
      }
      y += 1
    }
    (sums, counts)
  }

  /** Real feature kernel: decode → grid×grid mean-luminance vector in
    * [0,1] (the pooled-patch shape a vision embedding reduces to) — the
    * float view of [[cellSums]]. */
  private def imageFeatures(img: java.awt.image.BufferedImage,
                            grid: Int): Array[Float] = {
    val (sums, counts) = cellSums(img, grid)
    Array.tabulate(grid * grid) { i =>
      if (counts(i) == 0L) 0f
      else (sums(i).toDouble / (counts(i) * 255000.0)).toFloat
    }
  }

  /** Row shape of [[extractCellSums]]. */
  case class CellSumRow(doc_id: Long, cell: Long, lum_sum: Long, n_px: Long)

  /** The DECODED raster's per-cell integer luminance sums — the
    * oracle-facing view of the real feature kernel: every value is exact
    * Long arithmetic over real decoded pixels, so the DuckDB gate can
    * replicate it from the synthesis arithmetic alone (the
    * `multimodal_cellsums_png` row). Spark must actually decode the PNG
    * bytes to match — a wrong decode, wrong channel order, or wrong cell
    * binning hash-mismatches immediately. */
  def extractCellSums(media: DataFrame, grid: Int = 4): DataFrame = {
    val ds: Dataset[(Long, Array[Byte])] =
      media.select(col("doc_id"), col("payload"))
        .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { rows =>
      val codec = new ImageCodec()
      rows.flatMap { case (id, bytes) =>
        val (sums, counts) = cellSums(codec.decode(id, bytes), grid)
        (0 until grid * grid).iterator.filter(counts(_) > 0L)
          .map(c => CellSumRow(id, c.toLong, sums(c), counts(c)))
      }
    }(Encoders.product[CellSumRow]).toDF()
  }

  /** DENSE integer feature vector per image: the decoded raster's grid²
    * per-cell luminance sums as one `array<long>` column, cell-index
    * ordered — [[extractCellSums]] without the explode, the shape the
    * image-ANN tier indexes ([[ImageAnn]]). Exact Long arithmetic end to
    * end, so the retrieval gate built on it carries zero float hazard
    * (squared-L2 over exact integers). */
  def extractFeatureSums(media: DataFrame, grid: Int = 4): DataFrame = {
    val ds: Dataset[(Long, Array[Byte])] =
      media.select(col("doc_id"), col("payload"))
        .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { rows =>
      val codec = new ImageCodec()
      rows.map { case (id, bytes) =>
        FeatureSumRow(id, cellSums(codec.decode(id, bytes), grid)._1)
      }
    }(Encoders.product[FeatureSumRow]).toDF()
  }

  /** Row shape of [[extractFeatureSums]]. */
  case class FeatureSumRow(doc_id: Long, v: Array[Long])

  /** [[extractFeatures]]'s real-kernel twin: payload → decoded raster →
    * grid²-dim `array<float>` embedding, feeding [[Similarity]] unchanged
    * (MultimodalSpec runs it end-to-end into bruteForceTopK). */
  def extractFeaturesImage(media: DataFrame, grid: Int = 4): DataFrame = {
    val ds: Dataset[(Long, Array[Byte])] =
      media.select(col("doc_id"), col("payload"))
        .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { rows =>
      val codec = new ImageCodec()
      rows.map { case (id, bytes) =>
        FeatureRow(id, imageFeatures(codec.decode(id, bytes), grid))
      }
    }(Encoders.product[FeatureRow]).toDF()
  }

  /** Row shape of [[extractFeaturesImage]] (matches the embeddings table). */
  case class FeatureRow(vec_id: Long, embedding: Array[Float])

  /** Deterministic tiny PNG: every pixel a pure integer-hash function of
    * (docId, x, y) — the fixture for the real-kernel specs (the testdata
    * ships no media). */
  def synthesizePng(docId: Long, width: Int, height: Int): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = docId * 1315423911L ^ x.toLong * 2654435761L ^ y.toLong * 40503L
        img.setRGB(x, y, (v & 0xffffffL).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic animated GIF of `nFrames` synthesized frames (JDK GIF
    * writer, sequence API) — exercises the n_frames>1 branch of the real
    * meta kernel. */
  def synthesizeGif(docId: Long, width: Int, height: Int, nFrames: Int): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val v = (docId * 31L + f) * 1315423911L ^
              x.toLong * 2654435761L ^ y.toLong * 40503L
            img.setRGB(x, y, (v & 0xffffffL).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** 256-level gray palette — the IndexColorModel that makes the GIF tier
    * pixel-EXACT: GIF's LZW is lossless over indexed samples, so writing
    * TYPE_BYTE_INDEXED frames with an explicit palette round-trips every
    * pixel bit-for-bit through the JDK writer/reader (the TYPE_INT_RGB
    * path in [[synthesizeGif]] may palettize/dither arbitrary 24-bit
    * colors — fine for frame COUNTS, useless for decoded-pixel oracles). */
  private def grayPalette(): java.awt.image.IndexColorModel = {
    val g = Array.tabulate[Byte](256)(i => i.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** Deterministic animated GRAY GIF: frame f's pixel (x,y) is the 8-bit
    * hash `((docId·31+f)·1315423911 ⊻ x·2654435761 ⊻ y·40503) & 255` as a
    * gray level — pure integer arithmetic a SQL oracle replays, and
    * pixel-exact through encode/decode (see [[grayPalette]]). */
  def synthesizeGifGray(docId: Long, width: Int, height: Int,
                        nFrames: Int): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette())
        val raster = img.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val v = (docId * 31L + f) * 1315423911L ^
              x.toLong * 2654435761L ^ y.toLong * 40503L
            raster.setSample(x, y, 0, (v & 255L).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** The GIF synthesis parameters for doc `id` — shared by fixture, specs
    * and the SQL oracle: [[pngDims]]' dimensions, 2–5 frames. */
  def gifFrames(id: Long): Int = 2 + (id % 4L).toInt

  /** Synthesized animated-GIF media table over the documents fixture (the
    * [[pngMediaFromDocuments]] pattern at (doc, frame) grain). */
  def gifMediaFromDocuments(docs: DataFrame): DataFrame = {
    val ds: Dataset[Long] = docs.select(col("doc_id")).as(Encoders.scalaLong)
    ds.mapPartitions { ids =>
      ids.map { id =>
        val (w, h) = pngDims(id)
        (id, synthesizeGifGray(id, w, h, gifFrames(id)))
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("doc_id", "payload")
  }

  /** Row shape of [[extractFrameSums]]. */
  case class FrameSumRow(doc_id: Long, frame_idx: Long, width: Long,
                         height: Long, lum_sum: Long)

  /** Per-FRAME luminance sums over genuinely decoded rasters — the real
    * twin of [[sampleFrames]]'s plumbing stub: `reader.read(i)` extracts
    * each frame of the animated payload (one stream setup per payload,
    * codec cached per partition), and the per-frame sum is the same exact
    * Long arithmetic as [[cellSums]] at grid=1. Output rows are bounded by
    * docs × frames; the payload never rides them. A wrong per-frame
    * decode (frame order, palette, disposal) hash-mismatches the oracle,
    * which replays the synthesis arithmetic per frame index. */
  def extractFrameSums(media: DataFrame): DataFrame = {
    val ds: Dataset[(Long, Array[Byte])] =
      media.select(col("doc_id"), col("payload"))
        .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { rows =>
      val codec = new ImageCodec()
      rows.flatMap { case (id, bytes) =>
        codec.decodeFrames(id, bytes).iterator.map { case (f, img) =>
          FrameSumRow(id, f.toLong, img.getWidth.toLong, img.getHeight.toLong,
            cellSums(img, 1)._1(0))
        }
      }
    }(Encoders.product[FrameSumRow]).toDF()
  }

  /** Synthesized-PNG media table over the documents fixture: dimensions are
    * pure functions of doc_id, so specs can pin decoded metadata against
    * the synthesis parameters. Synthesis runs per partition (the encode is
    * the "ingest" a real media table already paid). */
  def pngMediaFromDocuments(docs: DataFrame): DataFrame =
    pngMediaFromDocuments(docs, 0L)

  /** [[pngMediaFromDocuments]] with a HASH SALT — the "edited image"
    * fixture (round 20, image-ANN lifecycle): the replaced payload for doc
    * `id` keeps its dimensions ([[pngDims]] of the original id — an edit
    * swaps content, not geometry) but hashes pixels from `id + hashSalt`,
    * so the decoded features shift deterministically and the SQL oracle
    * replays the v2 raster from the same arithmetic. */
  def pngMediaFromDocuments(docs: DataFrame, hashSalt: Long): DataFrame = {
    val ds: Dataset[Long] = docs.select(col("doc_id")).as(Encoders.scalaLong)
    ds.mapPartitions { ids =>
      ids.map { id =>
        val (w, h) = pngDims(id)
        (id, w.toLong, h.toLong, synthesizePng(id + hashSalt, w, h))
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong, Encoders.BINARY))
      .toDF("doc_id", "width", "height", "payload")
  }

  /** The synthesis dimensions for doc `id` — shared by fixture and specs. */
  def pngDims(id: Long): (Int, Int) =
    (16 + (id % 17L).toInt, 8 + (id % 13L).toInt)

  // --- real audio kernels (JDK javax.sound.sampled) --------------------------

  /** Decoded audio metadata row. */
  case class AudioMeta(doc_id: Long, sample_rate: Long, channels: Long,
                       bits: Long, n_samples: Long)

  /** Row shape of [[extractWavWindowSums]]. */
  case class WindowSumRow(doc_id: Long, window_idx: Long, n_smp: Long,
                          abs_sum: Long, sq_sum: Long)

  /** The WAV synthesis parameters for doc `id` — (sampleRate, nSamples),
    * shared by fixture, specs and the SQL oracle. */
  def wavParams(id: Long): (Int, Int) =
    (Array(8000, 11025, 16000, 22050)((id % 4L).toInt), 120 + (id % 101L).toInt)

  /** Sample i of doc d's synthesized PCM16 signal: the 16-bit hash
    * `((d·2654435761 ⊻ i·1315423911) & 65535) − 32768` — pure integer
    * arithmetic a SQL oracle replays, and lossless through PCM encode. */
  def wavSample(docId: Long, i: Long): Int =
    (((docId * 2654435761L) ^ (i * 1315423911L)) & 0xffffL).toInt - 32768

  /** Deterministic tiny WAV: mono 16-bit little-endian PCM whose samples are
    * [[wavSample]] — written through the JDK's `javax.sound.sampled` WAV
    * encoder (ships in every JRE — no added jars), the audio analog of
    * [[synthesizePng]]. PCM is lossless, so decoded samples round-trip
    * bit-exact. */
  def synthesizeWav(docId: Long, sampleRate: Int, nSamples: Int): Array[Byte] =
    encodeWav(Array.tabulate(nSamples)(i => wavSample(docId, i.toLong)), sampleRate)

  /** Signed 16-bit samples → a real WAV through the JDK encoder (mono,
    * little-endian PCM — the write half of the codec circle). */
  /** The WAVE reader/writer SPI providers, resolved ONCE per JVM.
    *
    * `AudioSystem.getAudioInputStream` / `AudioSystem.write` funnel EVERY
    * call through `JDK13Services.getProviders` — a synchronized static
    * provider lookup. Single-threaded that cost hides; once the codec
    * chains run n-way (r20 optimization: `Tables.keySorted` restored scan
    * parallelism) the lock serializes them — measured 77.5 s of summed
    * task time for 3.2 s of CPU on `multimodal_resample_wav` at 32 cores
    * (ProbeStages). Resolving the providers once and calling them directly
    * removes the static lock from the per-row path. AudioFileReader/Writer
    * implementations are stateless by SPI contract (AudioSystem itself
    * shares one instance across threads), and selection mirrors
    * AudioSystem's: first ServiceLoader provider that accepts the format
    * (the JDK ships exactly one WAVE provider). Bytes are produced by the
    * SAME provider code, so outputs are bit-identical — re-proven by the
    * oracle hash gate on all five `multimodal_*_wav` rows.
    */
  private lazy val wavReader: javax.sound.sampled.spi.AudioFileReader = {
    // tiny self-synthesized probe: 1 sample, 8 kHz — enough for a header parse
    val probe = encodeWavVia(null, Array(0), 8000)
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    var found: javax.sound.sampled.spi.AudioFileReader = null
    while (found == null && it.hasNext) {
      val r = it.next()
      try {
        r.getAudioFileFormat(new java.io.ByteArrayInputStream(probe))
        found = r
      } catch { case _: Exception => () }
    }
    require(found != null, "no AudioFileReader SPI provider recognizes WAVE")
    found
  }

  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    var found: javax.sound.sampled.spi.AudioFileWriter = null
    while (found == null && it.hasNext) {
      val w = it.next()
      if (w.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
        found = w
    }
    require(found != null, "no AudioFileWriter SPI provider supports WAVE")
    found
  }

  /** [[encodeWav]] body with an explicit writer (`null` = AudioSystem —
    * used only to build the one-time provider-selection probe, where the
    * resolved writer does not exist yet). */
  private def encodeWavVia(writer: javax.sound.sampled.spi.AudioFileWriter,
                           samples: Array[Int], sampleRate: Int): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    try {
      if (writer == null)
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      else
        writer.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    } finally ais.close()
    bos.toByteArray
  }

  private def encodeWav(samples: Array[Int], sampleRate: Int): Array[Byte] =
    encodeWavVia(wavWriter, samples, sampleRate)

  /** Synthesized-WAV media table over the documents fixture (the
    * [[pngMediaFromDocuments]] pattern for audio): sample rate and sample
    * count are pure functions of doc_id. */
  def wavMediaFromDocuments(docs: DataFrame): DataFrame = {
    val ds: Dataset[Long] = docs.select(col("doc_id")).as(Encoders.scalaLong)
    ds.mapPartitions { ids =>
      ids.map { id =>
        val (sr, n) = wavParams(id)
        (id, synthesizeWav(id, sr, n))
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("doc_id", "payload")
  }

  /** Genuine WAV decode through `javax.sound.sampled.AudioSystem`: parses
    * the RIFF/fmt header and streams the PCM frames back out as signed
    * 16-bit samples. Restricted to the mono/16-bit/little-endian shape the
    * synthesis writes — a real pipeline would transcode other shapes here.
    */
  private def decodeWav(docId: Long,
                        payload: Array[Byte]): (javax.sound.sampled.AudioFormat, Array[Int]) = {
    // direct SPI call — AudioSystem's static entry would re-run a
    // synchronized provider lookup per row (see wavReader)
    val ais = wavReader.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        !fmt.isBigEndian, s"doc $docId: expected mono 16-bit LE PCM, got $fmt")
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        out(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
        i += 1
      }
      (fmt, out)
    } finally ais.close()
  }

  /** [[extractMeta]]'s real AUDIO twin: same mapPartitions plumbing, the
    * decode is a genuine `javax.sound.sampled` WAV parse (header → rate /
    * channels / bits, frames → sample count). */
  def extractMetaWav(media: DataFrame): DataFrame = {
    val ds: Dataset[(Long, Array[Byte])] =
      media.select(col("doc_id"), col("payload"))
        .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        val (fmt, samples) = decodeWav(id, bytes)
        AudioMeta(id, fmt.getSampleRate.toLong, fmt.getChannels.toLong,
          fmt.getSampleSizeInBits.toLong, samples.length.toLong)
      }
    }(Encoders.product[AudioMeta]).toDF()
  }

  /** The DECODED signal's per-window integer energy sums — the audio analog
    * of [[extractCellSums]] and the integer core of an audio feature kernel
    * (RMS/peak are float views of these): per fixed `window`-sample window,
    * the sample count, Σ|s| and Σs² — exact Long arithmetic over really
    * decoded PCM, so the DuckDB gate replicates it from the synthesis
    * arithmetic alone. A wrong header parse, sample width, byte order, or
    * sign convention hash-mismatches immediately. */
  def extractWavWindowSums(media: DataFrame, window: Int = 64): DataFrame = {
    val ds: Dataset[(Long, Array[Byte])] =
      media.select(col("doc_id"), col("payload"))
        .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { rows =>
      rows.flatMap { case (id, bytes) =>
        val samples = decodeWav(id, bytes)._2
        samples.indices.groupBy(_ / window).toSeq.sortBy(_._1).iterator
          .map { case (w, idxs) =>
            var absSum = 0L; var sqSum = 0L
            idxs.foreach { i =>
              val s = samples(i).toLong
              absSum += math.abs(s); sqSum += s * s
            }
            WindowSumRow(id, w.toLong, idxs.size.toLong, absSum, sqSum)
          }
      }
    }(Encoders.product[WindowSumRow]).toDF()
  }

  /** Real audio resample kernel — [[resizeImage]]'s audio twin, the full
    * decode → transform → re-encode circle: genuine WAV decode, integer
    * decimation (every `factor`-th sample — the aliasing-naive decimator,
    * bit-deterministic by construction), re-encode at rate/factor through
    * the JDK WAV writer. Output (doc_id, payload) is a real WAV of the
    * decimated signal; the gate row re-DECODES it and window-sums the
    * samples, so the whole circle is load-bearing. */
  def resampleWav(media: DataFrame, factor: Int = 2): DataFrame = {
    require(factor >= 1, "decimation factor must be >= 1")
    val ds: Dataset[(Long, Array[Byte])] =
      media.select(col("doc_id"), col("payload"))
        .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        val (fmt, samples) = decodeWav(id, bytes)
        val out = Array.tabulate((samples.length + factor - 1) / factor)(
          i => samples(i * factor))
        (id, encodeWav(out, math.max(1, fmt.getSampleRate.toInt / factor)))
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("doc_id", "payload")
  }

  /** Row shape of [[extractWavZeroCrossings]]. */
  case class ZcrRow(doc_id: Long, n_samples: Long, n_zc: Long)

  /** Zero-crossing count over really decoded PCM — the classic
    * voiced/unvoiced audio heuristic, all exact integer logic: a crossing
    * is any adjacent pair where the `< 0` predicate flips. One number per
    * doc; same narrow codec pass as the window sums. */
  def extractWavZeroCrossings(media: DataFrame): DataFrame = {
    val ds: Dataset[(Long, Array[Byte])] =
      media.select(col("doc_id"), col("payload"))
        .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        val samples = decodeWav(id, bytes)._2
        var zc = 0L
        var i = 1
        while (i < samples.length) {
          if ((samples(i) < 0) != (samples(i - 1) < 0)) zc += 1L
          i += 1
        }
        ZcrRow(id, samples.length.toLong, zc)
      }
    }(Encoders.product[ZcrRow]).toDF()
  }

  /** [[extractFeaturesImage]]'s audio twin: decode → `dim` equal slices →
    * per-slice RMS in [0,1] (the pooled-energy shape an audio embedding
    * reduces to), feeding [[Similarity]] unchanged. */
  def extractFeaturesWav(media: DataFrame, dim: Int = 8): DataFrame = {
    val ds: Dataset[(Long, Array[Byte])] =
      media.select(col("doc_id"), col("payload"))
        .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { rows =>
      rows.map { case (id, bytes) =>
        val samples = decodeWav(id, bytes)._2
        val n = samples.length
        val feats = Array.tabulate(dim) { j =>
          val lo = j * n / dim; val hi = (j + 1) * n / dim
          if (hi <= lo) 0f
          else {
            var sq = 0L
            var i = lo
            while (i < hi) { val s = samples(i).toLong; sq += s * s; i += 1 }
            (math.sqrt(sq.toDouble / (hi - lo)) / 32768.0).toFloat
          }
        }
        FeatureRow(id, feats)
      }
    }(Encoders.product[FeatureRow]).toDF()
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
