package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Similarity}

/** Real-kernel multimodal coverage: deterministic PNG/GIF fixtures
  * synthesized in-test (the testdata ships no media), decoded by the
  * genuine javax.imageio kernels, pinned against the synthesis parameters
  * — end-to-end into bruteForceTopK. The DuckDB gate rows keep exercising
  * the SQL-expressible stub tier; this suite is where the decode itself is
  * verified.
  */
class MultimodalSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def docs = Tables.documents(spark, Sf0001).select("doc_id").limit(64)
  private lazy val media = Multimodal.pngMediaFromDocuments(docs).cache()

  test("synthesized PNGs decode to their synthesis dimensions (header-only meta read)") {
    val decoded = Multimodal.extractMetaImage(media.select("doc_id", "payload"))
      .as[(Long, Long, Long, String, Long)].collect()
    assert(decoded.length == 64)
    for ((id, w, h, fmt, nf) <- decoded) {
      val (ew, eh) = Multimodal.pngDims(id)
      assert(w == ew && h == eh, s"doc $id decoded ${w}x$h, synthesized ${ew}x$eh")
      assert(fmt == "png" && nf == 1L)
    }
  }

  test("animated GIF reports its real frame count through the same kernel") {
    val m = Multimodal.decodeImage(7L, Multimodal.synthesizeGif(7L, 12, 9, nFrames = 5))
    assert(m.width == 12L && m.height == 9L && m.format == "gif" && m.n_frames == 5L)
  }

  test("real resize: re-decoded raster has the bounding-box dimensions, never upscaled") {
    // synthesis dims: w in [16,32], h in [8,20] — maxW/maxH force a
    // downscale on wide/tall images and a no-op on already-small ones
    val (maxW, maxH) = (12, 12)
    val resized = Multimodal.resizeImage(media.select("doc_id", "payload"), maxW, maxH)
    // round-trip: decode the RESIZED payload, not just trust the columns
    val redecoded = Multimodal.extractMetaImage(resized.select("doc_id", "payload"))
      .select("doc_id", "width", "height").as[(Long, Long, Long)].collect()
      .map { case (id, w, h) => id -> ((w, h)) }.toMap
    val claimed = resized.select("doc_id", "new_width", "new_height")
      .as[(Long, Long, Long)].collect()
    assert(claimed.length == 64)
    for ((id, nw, nh) <- claimed) {
      val (w, h) = Multimodal.pngDims(id)
      val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
      val (ew, eh) = (math.max(1, math.floor(w * scale).toInt),
        math.max(1, math.floor(h * scale).toInt))
      assert(nw == ew && nh == eh, s"doc $id resized to ${nw}x$nh, expected ${ew}x$eh")
      assert(nw <= w && nh <= h, s"doc $id upscaled")
      val (dw, dh) = (redecoded(id)._1, redecoded(id)._2)
      assert(dw == ew && dh == eh, s"doc $id re-decoded ${dw}x$dh ≠ claimed ${ew}x$eh")
    }
  }

  test("real features end-to-end: decoded-pixel embeddings into bruteForceTopK, partition-stable") {
    val feats = Multimodal.extractFeaturesImage(media.select("doc_id", "payload"), grid = 4)
    val collected = feats.as[(Long, Seq[Float])].collect()
    assert(collected.length == 64)
    assert(collected.forall { case (_, v) =>
      v.length == 16 && v.forall(x => x >= 0f && x <= 1f)
    }, "luminance features must be 16-dim in [0,1]")
    // same rasters → same embeddings regardless of partitioning
    val repart = Multimodal
      .extractFeaturesImage(media.select("doc_id", "payload").repartition(7), grid = 4)
      .as[(Long, Seq[Float])].collect()
    assert(collected.sortBy(_._1).toSeq == repart.sortBy(_._1).toSeq)
    val probeIds = collected.map(_._1).sorted.take(3).toSeq
    val topk = Similarity.bruteForceTopK(feats, probeIds, k = 5)
      .as[(Long, Long, Double)].collect()
    assert(topk.length == probeIds.size * 5)
    assert(topk.forall { case (q, c, s) => q != c && s >= -1.0001 && s <= 1.0001 })
  }

  test("cell sums cover every pixel exactly once (the integer core the gate row replays)") {
    val sums = Multimodal.extractCellSums(media.select("doc_id", "payload"), grid = 4)
      .as[(Long, Long, Long, Long)].collect()
    val perDoc = sums.groupBy(_._1)
    assert(perDoc.size == 64)
    for ((id, rows) <- perDoc) {
      val (w, h) = Multimodal.pngDims(id)
      assert(rows.map(_._4).sum == w.toLong * h, s"doc $id pixel count off")
      assert(rows.length == 16, s"doc $id missing cells (w=$w h=$h >= grid)")
      // luma bound: 255*(299+587+114) = 255000 per pixel
      assert(rows.forall { case (_, _, lum, n) => lum >= 0L && lum <= 255000L * n })
    }
  }

  test("codec round-trip property: decode ∘ synthesize = identity on dims, down to 1x1") {
    for (id <- Seq(0L, 1L, 999L, 123456789L); w <- Seq(1, 2, 7, 33, 64); h <- Seq(1, 3, 17, 40)) {
      val m = Multimodal.decodeImage(id, Multimodal.synthesizePng(id, w, h))
      assert(m.width == w.toLong && m.height == h.toLong &&
        m.format == "png" && m.n_frames == 1L,
        s"round-trip broke at id=$id ${w}x$h: got ${m.width}x${m.height}")
    }
    for (f <- Seq(1, 2, 7)) {
      val m = Multimodal.decodeImage(5L, Multimodal.synthesizeGif(5L, 9, 5, f))
      assert(m.format == "gif" && m.n_frames == f.toLong)
    }
  }

  test("gray GIF frames: every frame decodes pixel-exact to the synthesis arithmetic") {
    // the property that makes multimodal_frames_gif oracle-able: indexed
    // gray GIF round-trips each FRAME's pixels bit-for-bit, so per-frame
    // sums computed from decoded rasters equal the synthesis replay
    val sums = Multimodal.extractFrameSums(
        Multimodal.gifMediaFromDocuments(docs.orderBy("doc_id")))
      .as[(Long, Long, Long, Long, Long)].collect()
    val byDoc = sums.groupBy(_._1)
    assert(byDoc.size == 64)
    for ((id, rows) <- byDoc) {
      val (ew, eh) = Multimodal.pngDims(id)
      val nf = Multimodal.gifFrames(id)
      assert(rows.length == nf, s"doc $id: ${rows.length} frames, synthesized $nf")
      for ((_, f, w, h, lum) <- rows) {
        assert(w == ew && h == eh, s"doc $id frame $f decoded ${w}x$h")
        // replay the synthesis arithmetic locally (gray luma = g*1000)
        var expected = 0L
        var y = 0
        while (y < eh) {
          var x = 0
          while (x < ew) {
            val g = ((id * 31L + f) * 1315423911L ^
              x.toLong * 2654435761L ^ y.toLong * 40503L) & 255L
            expected += g * 1000L
            x += 1
          }
          y += 1
        }
        assert(lum == expected,
          s"doc $id frame $f: decoded lum_sum $lum != synthesized $expected")
      }
    }
  }

  // --- real audio tier (javax.sound.sampled) --------------------------------

  private lazy val wavMedia = Multimodal.wavMediaFromDocuments(docs).cache()

  test("synthesized WAVs decode to their synthesis parameters (RIFF header parse)") {
    val decoded = Multimodal.extractMetaWav(wavMedia)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(decoded.length == 64)
    for ((id, sr, ch, bits, n) <- decoded) {
      val (esr, en) = Multimodal.wavParams(id)
      assert(sr == esr.toLong, s"doc $id decoded rate $sr, synthesized $esr")
      assert(ch == 1L && bits == 16L)
      assert(n == en.toLong, s"doc $id decoded $n samples, synthesized $en")
    }
  }

  test("decoded PCM samples round-trip the synthesis arithmetic bit-exact (window=1)") {
    // window=1 exposes every individual sample: |s| and s^2 per sample
    val one = wavMedia.filter($"doc_id" === 5L)
    val rows = Multimodal.extractWavWindowSums(one, window = 1)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._2)
    val (_, n) = Multimodal.wavParams(5L)
    assert(rows.length == n)
    for ((_, i, cnt, absSum, sqSum) <- rows) {
      val s = Multimodal.wavSample(5L, i).toLong
      assert(cnt == 1L && absSum == math.abs(s) && sqSum == s * s,
        s"sample $i: decoded (|s|=$absSum, s2=$sqSum) != synthesized s=$s")
    }
  }

  test("per-window energy sums match the synthesis replay for every doc") {
    val sums = Multimodal.extractWavWindowSums(wavMedia, window = 64)
      .as[(Long, Long, Long, Long, Long)].collect()
    val byDoc = sums.groupBy(_._1)
    assert(byDoc.size == 64)
    for ((id, rows) <- byDoc) {
      val (_, n) = Multimodal.wavParams(id)
      assert(rows.map(_._3).sum == n.toLong, s"doc $id sample count off")
      for ((_, w, cnt, absSum, sqSum) <- rows) {
        var (ea, eq, ec) = (0L, 0L, 0L)
        var i = w * 64L
        while (i < math.min((w + 1) * 64L, n.toLong)) {
          val s = Multimodal.wavSample(id, i).toLong
          ea += math.abs(s); eq += s * s; ec += 1L
          i += 1L
        }
        assert(cnt == ec && absSum == ea && sqSum == eq,
          s"doc $id window $w: ($cnt,$absSum,$sqSum) != ($ec,$ea,$eq)")
      }
    }
  }

  test("zero crossings match the synthesis replay for every doc") {
    val out = Multimodal.extractWavZeroCrossings(wavMedia)
      .as[(Long, Long, Long)].collect()
    assert(out.length == 64)
    for ((id, n, zc) <- out) {
      val (_, en) = Multimodal.wavParams(id)
      assert(n == en.toLong)
      val expected = (1 until en).count(i =>
        (Multimodal.wavSample(id, i) < 0) != (Multimodal.wavSample(id, i - 1) < 0))
      assert(zc == expected.toLong, s"doc $id: $zc crossings, synthesized $expected")
    }
  }

  test("resample circle: decimated WAV re-decodes to every 2nd synthesis sample") {
    val resampled = Multimodal.resampleWav(wavMedia, factor = 2)
    // meta of the re-encoded payload: halved rate, ceil(n/2) samples
    val meta = Multimodal.extractMetaWav(resampled)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(meta.length == 64)
    for ((id, sr, ch, bits, n) <- meta) {
      val (esr, en) = Multimodal.wavParams(id)
      assert(sr == (esr / 2).toLong && ch == 1L && bits == 16L)
      assert(n == ((en + 1) / 2).toLong, s"doc $id resampled to $n samples")
    }
    // sample values: window=1 pins each decimated sample = s(doc, 2i)
    val rows = Multimodal.extractWavWindowSums(
        resampled.filter($"doc_id" === 9L), window = 1)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._2)
    for ((_, i, _, absSum, sqSum) <- rows) {
      val s = Multimodal.wavSample(9L, 2L * i).toLong
      assert(absSum == math.abs(s) && sqSum == s * s,
        s"resampled sample $i != synthesis sample ${2 * i}")
    }
  }

  test("audio features end-to-end: per-slice RMS embeddings into bruteForceTopK, partition-stable") {
    val feats = Multimodal.extractFeaturesWav(wavMedia, dim = 8)
    val collected = feats.as[(Long, Seq[Float])].collect()
    assert(collected.length == 64)
    assert(collected.forall { case (_, v) =>
      v.length == 8 && v.forall(x => x >= 0f && x <= 1f)
    }, "RMS features must be 8-dim in [0,1]")
    val repart = Multimodal.extractFeaturesWav(wavMedia.repartition(7), dim = 8)
      .as[(Long, Seq[Float])].collect()
    assert(collected.sortBy(_._1).toSeq == repart.sortBy(_._1).toSeq)
    val topk = Similarity.bruteForceTopK(
        feats.select($"vec_id", $"embedding"), Seq(0L, 1L, 2L), k = 5)
      .as[(Long, Long, Double)].collect()
    assert(topk.length == 15)
    assert(topk.forall { case (q, c, s) => q != c && s >= -1.0001 && s <= 1.0001 })
  }

  test("stub tier unchanged: gate plumbing still runs on the text-bytes fixture") {
    val stub = Multimodal.extractMeta(
      Multimodal.mediaFromDocuments(Tables.documents(spark, Sf0001).limit(10)))
    assert(stub.count() == 10)
    assert(stub.columns.toSeq ==
      Seq("doc_id", "width", "height", "format", "n_frames"))
  }
}
