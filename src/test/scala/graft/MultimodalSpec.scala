package graft

import graft.engine.MultimodalOps
import org.apache.spark.sql.functions._

/** Multimodal plumbing: image decode is REAL (javax.imageio,
  * header-only); audio/video decode remains a documented stub. Tests
  * pin both the codec behavior on synthesized images and the
  * PLUMBING contracts — schema, determinism, fan-out shape,
  * feature-vector shape. */
class MultimodalSpec extends SparkSuite {

  /** Encode a solid WxH image with the JDK encoder — known-good bytes
    * for the decode assertions. */
  private def imageBytes(w: Int, h: Int, format: String,
                         imgType: Int = java.awt.image.BufferedImage.TYPE_INT_RGB): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, imgType)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, 0x3366cc)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  test("real PNG/JPEG decode: width/height/bands from known bytes (javax.imageio)") {
    assert(MultimodalOps.decodeImageHeader(imageBytes(1, 1, "png")) == Some((1, 1, 3)))
    assert(MultimodalOps.decodeImageHeader(imageBytes(7, 3, "png")) == Some((7, 3, 3)))
    assert(MultimodalOps.decodeImageHeader(imageBytes(16, 9, "jpg")) == Some((16, 9, 3)))
    // grayscale PNG carries 1 band
    assert(MultimodalOps.decodeImageHeader(imageBytes(4, 4, "png",
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)) == Some((4, 4, 1)))
    // non-image bytes: no reader claims them → None (stub fallback)
    assert(MultimodalOps.decodeImageHeader("plain text".getBytes("UTF-8")).isEmpty)
  }

  /** Encode a PCM WAV header+data with the JDK's own writer —
    * known-good bytes for the RIFF parser assertions. */
  private def wavBytes(sampleRate: Int, channels: Int, bits: Int,
                       nFrames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, bits, channels, true, false)
    val data = new Array[Byte](nFrames * channels * (bits / 8))
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real WAV decode: rate/bits/channels/duration from RIFF header bytes") {
    // 8 kHz mono 16-bit, 8000 frames = exactly 1000 ms
    assert(MultimodalOps.decodeWavHeader(wavBytes(8000, 1, 16, 8000)) ==
      Some((8000, 16, 1, 1000L)))
    // 44.1 kHz stereo 16-bit, 22050 frames = 500 ms
    assert(MultimodalOps.decodeWavHeader(wavBytes(44100, 2, 16, 22050)) ==
      Some((44100, 16, 2, 500L)))
    // 8-bit audio
    assert(MultimodalOps.decodeWavHeader(wavBytes(16000, 1, 8, 4000)) ==
      Some((16000, 8, 1, 250L)))
    // non-WAV bytes → None (stub fallback)
    assert(MultimodalOps.decodeWavHeader("plain text pretending to be audio x"
      .getBytes("UTF-8")).isEmpty)
    assert(MultimodalOps.decodeWavHeader(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("decodeAssets routes audio/* WAV payloads through the real RIFF parser") {
    import spark.implicits._
    val rows = Seq(
      (1L, "audio/wav", wavBytes(8000, 1, 16, 8000)),
      (2L, "audio/wav", Array[Byte](9, 9, 9))) // non-WAV → stub
    val out = MultimodalOps.decodeAssets(rows.toDF("asset_id", "mime", "payload"))
      .collect().map(a => a.asset_id -> a).toMap
    assert(out(1L).width == 8000 && out(1L).height == 16 &&
      out(1L).channels == 1 && out(1L).duration_ms == 1000L)
    assert(out(2L).width >= 160 && out(2L).duration_ms >= 1000L) // stub ranges
  }

  test("decodeAssets routes image/* through the real codec, rest through the stub") {
    import spark.implicits._
    val rows = Seq(
      (1L, "image/png", imageBytes(5, 2, "png")),
      (2L, "image/jpeg", imageBytes(8, 8, "jpg")),
      (3L, "audio/wav", Array[Byte](1, 2, 3, 4)),
      (4L, "image/png", "not actually a png".getBytes("UTF-8"))) // honest fallback
    val df = rows.toDF("asset_id", "mime", "payload")
    val out = MultimodalOps.decodeAssets(df).collect().map(a => a.asset_id -> a).toMap
    assert(out(1L).width == 5 && out(1L).height == 2 && out(1L).duration_ms == 0L)
    assert(out(2L).width == 8 && out(2L).height == 8 && out(2L).channels == 3)
    // audio: stub ranges (no JDK codec)
    assert(out(3L).width >= 160 && out(3L).duration_ms >= 1000L)
    // unreadable image payload: stub, not a crash
    assert(out(4L).width >= 160)
  }

  test("asset table carries binary payloads with typed metadata") {
    val a = MultimodalOps.assetTable(spark, sf)
    assert(a.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(a.select("mime").distinct().count() == 3)
  }

  test("decode is deterministic and preserves row count") {
    val assets = MultimodalOps.assetTable(spark, sf)
    val d1 = MultimodalOps.decodeAssets(assets).collect().sortBy(_.asset_id)
    val d2 = MultimodalOps.decodeAssets(assets).collect().sortBy(_.asset_id)
    assert(d1.length == assets.count())
    assert(d1.toSeq == d2.toSeq)
    assert(d1.forall(a => a.width >= 160 && a.height >= 120 && a.byte_len > 0))
  }

  test("feature extraction emits fixed-dim float vectors (ANN-compatible shape)") {
    val f = MultimodalOps.extractFeatures(MultimodalOps.assetTable(spark, sf), dim = 16)
    val lens = f.select(size(col("features"))).distinct().collect()
    assert(lens.length == 1 && lens.head.getInt(0) == 16)
  }

  test("frame sampling fans out video assets by duration, no shuffle of payloads") {
    val assets = MultimodalOps.assetTable(spark, sf)
    val frames = MultimodalOps.sampleFrames(assets, everyMs = 10000)
    val videos = MultimodalOps.decodeAssets(assets).toDF()
      .filter(col("mime") === "video/mp4")
    // every video contributes duration/10s + 1 frames
    val expected = videos
      .select(sum((col("duration_ms") / 10000).cast("long") + 1)).head().getLong(0)
    assert(frames.count() == expected)
    assert(frames.filter(col("ts_ms") > col("frame_no") * 10000).count() == 0)
  }

  test("resize rewrites dimensions and keeps binary contract") {
    val assets = MultimodalOps.assetTable(spark, sf)
    val r = MultimodalOps.resizeAssets(
      MultimodalOps.decodeAssets(assets), assets, 64, 48)
    assert(r.schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
    val dims = r.select("width", "height").distinct().collect()
    assert(dims.length == 1 && dims.head.getInt(0) == 64)
  }

  test("stats query aggregates only scalars per mime") {
    val m = MultimodalOps.qMultimodalMeta(spark, sf).collect()
    assert(m.length == 3)
    assert(m.map(_.getLong(1)).sum == graft.engine.Tables.documents(spark, sf).count())
  }

  test("real MP3 decode: frame walk yields rate/bitrate/channels/duration") {
    val mp3 = MultimodalOps.makeMp3(nFrames = 10)
    val Some((rate, kbps, ch, dur)) = MultimodalOps.decodeMp3Header(mp3)
    assert(rate == 44100 && kbps == 128 && ch == 2)
    assert(dur == 10L * 1152 * 1000 / 44100)
    // ID3v2 prefix is skipped
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 5) ++ new Array[Byte](5) ++ mp3
    assert(MultimodalOps.decodeMp3Header(id3).contains((rate, kbps, ch, dur)))
    // ASCII text can never sync (no 0xFF byte)
    assert(MultimodalOps.decodeMp3Header("plain text payload".getBytes).isEmpty)
    // truncated/garbage after a bad frame header rejects cleanly
    assert(MultimodalOps.decodeMp3Header(Array[Byte](0xff.toByte, 0x00, 0x00, 0x00)).isEmpty)
  }

  test("real MP4 decode: box walk yields dimensions/tracks/duration") {
    val mp4 = MultimodalOps.makeMp4(w = 640, h = 360, durationTicks = 2500L)
    val Some((w, h, tracks, dur)) = MultimodalOps.decodeMp4Header(mp4)
    assert(w == 640 && h == 360 && tracks == 1)
    assert(dur == 2500L) // timescale 1000 → ticks are ms
    // payloads that don't open with ftyp reject (text, WAV, MP3)
    assert(MultimodalOps.decodeMp4Header("not a movie at all".getBytes).isEmpty)
    assert(MultimodalOps.decodeMp4Header(MultimodalOps.makeWav(8000, 1, 16, 10)).isEmpty)
    assert(MultimodalOps.decodeMp4Header(MultimodalOps.makeMp3(3)).isEmpty)
  }

  test("decodeAssets routes MP3 audio and MP4 video through the real parsers") {
    import spark.implicits._
    val rows = Seq(
      MultimodalOps.Asset(1L, "audio/mpeg", MultimodalOps.makeMp3(20)),
      MultimodalOps.Asset(2L, "video/mp4", MultimodalOps.makeMp4(320, 240, 7000L)),
      MultimodalOps.Asset(3L, "video/mp4", "garbage video bytes".getBytes))
    val d = MultimodalOps.decodeAssets(rows.toDF("asset_id", "mime", "payload"))
      .collect().map(a => a.asset_id -> a).toMap
    assert(d(1L).width == 44100 && d(1L).height == 128 &&
      d(1L).duration_ms == 20L * 1152 * 1000 / 44100)
    assert(d(2L).width == 320 && d(2L).height == 240 && d(2L).duration_ms == 7000L)
    // unparseable video falls back to the deterministic stub
    val (sw, sh, _, sdur) = MultimodalOps.stubDecode("garbage video bytes".getBytes)
    assert(d(3L).width == sw && d(3L).height == sh && d(3L).duration_ms == sdur)
  }

  test("q_media_codecs: synthesized containers round-trip through real parsers") {
    val r = MultimodalOps.qMediaCodecs(spark, sf).collect()
    assert(r.length == graft.engine.Tables.documents(spark, sf).count())
    val byKind = r.groupBy(_.getString(1))
    assert(byKind.keySet == Set("image/png", "audio/wav", "audio/mpeg", "video/mp4"))
    byKind("audio/mpeg").foreach { row =>
      assert(row.getLong(3) == 44100 && row.getLong(5) == 2)
    }
    byKind("video/mp4").foreach { row =>
      assert(row.getLong(2) == 236 && row.getLong(6) >= 1000)
    }
  }

  test("media embed: top-k is deterministic, bounded, sorted by cosine") {
    val a = MultimodalOps.qMediaEmbed(spark, sf).collect()
    val b = MultimodalOps.qMediaEmbed(spark, sf).collect()
    assert(a.sameElements(b), "stub features must make the result deterministic")
    assert(a.length == 10)
    val sims = a.map(_.getDouble(1))
    assert(sims.sameElements(sims.sorted.reverse))
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
  }
}
