package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val media = Seq(
    (0L, "image", "fake-image-bytes-aaaa"),
    (1L, "image", "fake-image-bytes-bbbb-longer-payload"),
    (2L, "image", null.asInstanceOf[String])
  ).toDF("media_id", "modality", "content_str")
    .withColumn("content", when($"content_str".isNotNull, $"content_str".cast("binary")))
    .drop("content_str")

  test("withByteStats: length + digest, null-safe") {
    val out = Multimodal.withByteStats(media, "content").orderBy("media_id").collect()
    assert(out(0).getAs[Long]("n_bytes") == 21L)
    assert(out(0).getAs[String]("digest").length == 32)
    assert(out(2).isNullAt(out(2).fieldIndex("n_bytes")))
  }

  test("decodeImages: deterministic stub features, null passthrough, schema kept") {
    val out = Multimodal.decodeImages(media, "content")
    assert(out.columns.toSeq ==
      Seq("media_id", "modality", "content", "width", "height", "hist"))
    val rows = out.orderBy("media_id").collect()
    assert(rows(0).getAs[Int]("width") >= 64)
    val hist = rows(0).getAs[scala.collection.Seq[Double]]("hist")
    assert(hist.length == 4 && math.abs(hist.sum - 1.0) < 1e-9)
    assert(rows(2).isNullAt(rows(2).fieldIndex("width")))
    // deterministic across runs
    val again = Multimodal.decodeImages(media, "content").orderBy("media_id").collect()
    assert(again(0).getAs[Int]("width") == rows(0).getAs[Int]("width"))
  }

  test("REAL decode: hand-built P6 netpbm round-trips through the distributed stage") {
    // 2×2 RGB: red, green, blue, white
    val px = Array[Byte](
      255.toByte, 0, 0,   0, 255.toByte, 0,
      0, 0, 255.toByte,   255.toByte, 255.toByte, 255.toByte)
    val ppm = Multimodal.encodeNetpbm(Multimodal.RasterImage(2, 2, 3, px))
    val df = Seq((1L, ppm), (2L, "not an image".getBytes), (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "content")
    val out = Multimodal.decodeImagesReal(df, "content").orderBy("media_id").collect()
    assert(out(0).getAs[Int]("width") == 2 && out(0).getAs[Int]("height") == 2)
    assert(out(0).getAs[Int]("channels") == 3)
    val means = out(0).getAs[scala.collection.Seq[Double]]("chan_mean")
    // each channel: (255+0+0+255)/4/255 = 0.5
    assert(means.forall(m => math.abs(m - 0.5) < 1e-9))
    val hist = out(0).getAs[scala.collection.Seq[Double]]("gray_hist")
    assert(math.abs(hist.sum - 1.0) < 1e-9)
    assert(out(1).isNullAt(out(1).fieldIndex("width"))) // garbage → nulls
    assert(out(2).isNullAt(out(2).fieldIndex("width"))) // null → nulls
  }

  test("REAL decode: JDK ImageIO path (PNG) agrees with the netpbm path") {
    // build a 4×3 RGB gradient, encode as PNG via the JDK, decode both ways
    val w = 4; val h = 3
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, new java.awt.Color(x * 60, y * 80, 128).getRGB)
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", buf)) // PNG writer is in the JDK
    val png = buf.toByteArray
    val viaPng = Multimodal.decodeImage(png).get
    assert(viaPng.width == w && viaPng.height == h && viaPng.channels == 3)
    // identical raster through the P6 spelling
    val viaPpm = Multimodal.decodeImage(Multimodal.encodeNetpbm(viaPng)).get
    assert(viaPpm.pixels.toSeq == viaPng.pixels.toSeq)
    // resize: 2× nearest-neighbor keeps corner pixel values
    val big = Multimodal.resizeNearest(viaPng, 8, 6)
    assert(big.width == 8 && big.height == 6)
    assert(big.pixels(0) == viaPng.pixels(0)) // top-left preserved
    val (mBig, _) = Multimodal.imageFeatures(big)
    val (mOrig, _) = Multimodal.imageFeatures(viaPng)
    // nearest-neighbor 2× duplicates pixels exactly → identical means
    mBig.zip(mOrig).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  test("REAL audio decode: sine-wave WAV round-trips with the expected physics") {
    val sr = 8000
    val freq = 440.0
    val amp = 16384 // half scale
    val n = sr // 1 second
    val samples = Array.tabulate(n)(i =>
      (amp * math.sin(2 * math.Pi * freq * i / sr)).toShort)
    val wav = Multimodal.encodeWav(Multimodal.PcmAudio(sr, 1, samples))
    val df = Seq((1L, wav), (2L, "not audio".getBytes), (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "content")
    val out = Multimodal.decodeAudioReal(df, "content").orderBy("media_id").collect()
    val r = out(0)
    assert(r.getAs[Int]("sample_rate") == sr && r.getAs[Int]("channels") == 1)
    assert(math.abs(r.getAs[Double]("duration_s") - 1.0) < 1e-9)
    // RMS of a sine = A/√2; normalized by 32768
    assert(math.abs(r.getAs[Double]("rms") - amp / math.sqrt(2) / 32768.0) < 1e-3)
    // zero crossings of a 440 Hz tone ≈ 2f per second → 2f/sr per sample
    assert(math.abs(r.getAs[Double]("zcr") - 2 * freq / sr) < 1e-3)
    assert(out(1).isNullAt(out(1).fieldIndex("sample_rate")))
    assert(out(2).isNullAt(out(2).fieldIndex("sample_rate")))
    // direct round-trip
    val back = Multimodal.decodeWav(wav).get
    assert(back.samples.toSeq == samples.toSeq && back.sampleRate == sr)
  }

  test("decodeWav: malformed negative chunk size returns None, never loops") {
    // r2 ADVICE: sz=-8 made the chunk advance 8+sz+(sz&1) == 0 → infinite
    // loop with no exception for the catch-all to catch. Build a RIFF/WAVE
    // header followed by a junk chunk with size -8.
    val bb = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46464952).putInt(56).putInt(0x45564157)
    bb.putInt(0x4b4e554a /* "JUNK" */).putInt(-8)
    val malformed = bb.array()
    val done = java.util.concurrent.Executors.newSingleThreadExecutor()
    try {
      val fut = done.submit(new java.util.concurrent.Callable[Option[Multimodal.PcmAudio]] {
        def call() = Multimodal.decodeWav(malformed)
      })
      assert(fut.get(10, java.util.concurrent.TimeUnit.SECONDS).isEmpty)
    } finally done.shutdownNow()
    // sz=-9 exercises the (sz & 1) odd-padding path too
    val bb2 = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb2.putInt(0x46464952).putInt(56).putInt(0x45564157)
    bb2.putInt(0x4b4e554a).putInt(-9)
    assert(Multimodal.decodeWav(bb2.array()).isEmpty)
  }

  test("sampleFrames: n evenly spaced slices, reassembles prefix") {
    val frames = Multimodal.sampleFrames(media.filter($"media_id" === 1L), "content", "media_id", 4)
      .orderBy("frame_idx").collect()
    assert(frames.length == 4)
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 1, 2, 3))
    val total = frames.map(_.getAs[Array[Byte]]("frame_bytes").length).sum
    assert(total <= "fake-image-bytes-bbbb-longer-payload".length)
    assert(Multimodal.sampleFrames(media.filter($"media_id" === 2L), "content", "media_id", 4).count() == 0)
  }

  test("parseMp4Meta: v0 and v1 mvhd round-trip, garbage rejected") {
    val v0 = Multimodal.encodeMp4Stub("isom", timescale = 600, duration = 3000, nTracks = 2)
    assert(Multimodal.parseMp4Meta(v0) ===
      Some(Multimodal.Mp4Meta("isom", 600L, 5.0, 2)))
    val v1 = Multimodal.encodeMp4Stub("mp42", 90000, 450000L, 1, v1 = true)
    assert(Multimodal.parseMp4Meta(v1) ===
      Some(Multimodal.Mp4Meta("mp42", 90000L, 5.0, 1)))
    assert(Multimodal.parseMp4Meta(null).isEmpty)
    assert(Multimodal.parseMp4Meta("not an mp4 at all....".getBytes).isEmpty)
    assert(Multimodal.parseMp4Meta(v0.take(20)).isEmpty) // truncated moov
    // malformed size field must terminate, not hang (the WAV lesson)
    val evil = v0.clone(); evil(0) = 0xff.toByte
    assert(Multimodal.parseMp4Meta(evil).isEmpty)
  }

  test("probeVideoMeta: metadata appended, garbage rows preserved with nulls") {
    val vids = Seq(
      (1L, Multimodal.encodeMp4Stub("isom", 1000, 12500, 3)),
      (2L, "garbage".getBytes),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "content")
    val out = Multimodal.probeVideoMeta(vids, "content")
      .orderBy("media_id").collect()
    assert(out.length === 3)
    assert(out(0).getAs[String]("major_brand") === "isom")
    assert(out(0).getAs[Double]("duration_s") === 12.5)
    assert(out(0).getAs[Int]("n_tracks") === 3)
    assert(out(1).isNullAt(out(1).fieldIndex("duration_s")))
    assert(out(2).isNullAt(out(2).fieldIndex("major_brand")))
  }
}
