package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns + typed metadata, with decode / feature /
  * frame-sample stages as partition-wise batch transforms.
  *
  * IMAGE and AUDIO decode are REAL and dependency-free: netpbm (P5/P6)
  * is parsed directly, PNG/JPEG/BMP/GIF go through the JDK's own
  * `javax.imageio` (part of Java SE — no external codec library), and
  * RIFF/WAVE 16-bit PCM is parsed directly. VIDEO container METADATA is
  * also real (`parseMp4Meta`: ISO-BMFF box walk — brand, timescale,
  * duration, track count — the part corpus filtering needs); only video
  * FRAME decode and compressed audio remain STUBBED (`decodeStub`,
  * disclosed: the JDK ships no such codecs); the Spark-side plumbing —
  * schema, batched `mapPartitions` (one codec handle per partition, the
  * `mapInPandas` batch shape), null/garbage passthrough — is identical
  * for every modality, so swapping the stub for a JNI call changes one
  * function.
  */
object Multimodal {

  /** Canonical multimodal schema fragment. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Cheap whole-column binary ops (real, codegen'd): size + digest. */
  def withByteStats(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)).cast("long"))
      .withColumn("digest", md5(col(binCol)))

  private val decodedFields = Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("hist", ArrayType(DoubleType)))

  /** STUB decode: deterministic pseudo-dimensions + 4-bin byte histogram.
    * Replace the body with the real codec; the signature — bytes in,
    * (width, height, hist) out — is the contract the pipeline tests.
    */
  private[multimodal] def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Double]) = {
    if (bytes == null || bytes.isEmpty) return (0, 0, Array.fill(4)(0.0))
    val h = java.util.Arrays.hashCode(bytes)
    val width = 64 + math.abs(h % 1024)
    val height = 64 + math.abs((h / 1024) % 1024)
    val hist = new Array[Double](4)
    bytes.foreach(b => hist(((b & 0xff) >> 6)) += 1.0)
    val n = bytes.length.toDouble
    (width, height, hist.map(_ / n))
  }

  /** Decode stage: one batched pass per partition (the place a real
    * implementation amortizes codec/model initialization), appending
    * width/height/hist. Null content passes through as null features.
    */
  def decodeImages(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ decodedFields)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // real impl: open codec/library handle HERE, once per partition
      rows.map { r =>
        val bytes = r.get(binIdx).asInstanceOf[Array[Byte]]
        if (bytes == null) Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        else {
          val (w, h, hist) = decodeStub(bytes)
          Row.fromSeq(r.toSeq ++ Seq(w, h, hist.toSeq))
        }
      }
    }(enc)
  }

  /** Decoded raster: interleaved per-channel bytes, row-major. */
  final case class RasterImage(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  /** REAL image decode, pure JVM: netpbm P5 (gray) / P6 (RGB) parsed
    * directly; anything else handed to `javax.imageio` (PNG/JPEG/BMP/GIF
    * readers ship with the JDK). None for null/garbage bytes.
    */
  def decodeImage(bytes: Array[Byte]): Option[RasterImage] = {
    if (bytes == null || bytes.length < 8) return None
    if (bytes(0) == 'P' && (bytes(1) == '5' || bytes(1) == '6'))
      decodeNetpbm(bytes)
    else decodeViaImageIO(bytes)
  }

  private def decodeNetpbm(bytes: Array[Byte]): Option[RasterImage] =
    try {
      val channels = if (bytes(1) == '5') 1 else 3
      // header: magic, whitespace/comments, width, height, maxval, ONE ws
      var i = 2
      val vals = new Array[Int](3)
      var v = 0
      while (v < 3) {
        while (i < bytes.length &&
          (bytes(i).toChar.isWhitespace || bytes(i) == '#')) {
          if (bytes(i) == '#') while (i < bytes.length && bytes(i) != '\n') i += 1
          else i += 1
        }
        var x = 0
        while (i < bytes.length && bytes(i).toChar.isDigit) {
          x = x * 10 + (bytes(i) - '0'); i += 1
        }
        vals(v) = x; v += 1
      }
      i += 1 // single whitespace after maxval
      val (w, h, maxval) = (vals(0), vals(1), vals(2))
      val n = w * h * channels
      if (w <= 0 || h <= 0 || maxval != 255 || bytes.length - i < n) None
      else Some(RasterImage(w, h, channels,
        java.util.Arrays.copyOfRange(bytes, i, i + n)))
    } catch { case _: Exception => None }

  private def decodeViaImageIO(bytes: Array[Byte]): Option[RasterImage] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val hasColor = img.getColorModel.getNumColorComponents > 1
        val c = if (hasColor) 3 else 1
        val out = new Array[Byte](w * h * c)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val base = (y * w + x) * c
            if (c == 3) {
              out(base) = ((rgb >> 16) & 0xff).toByte
              out(base + 1) = ((rgb >> 8) & 0xff).toByte
              out(base + 2) = (rgb & 0xff).toByte
            } else out(base) = (rgb & 0xff).toByte
            x += 1
          }
          y += 1
        }
        Some(RasterImage(w, h, c, out))
      }
    } catch { case _: Exception => None }

  /** Nearest-neighbor resize — the cheap pre-embedding normalization pass. */
  def resizeNearest(img: RasterImage, newW: Int, newH: Int): RasterImage = {
    val out = new Array[Byte](newW * newH * img.channels)
    var y = 0
    while (y < newH) {
      val sy = math.min(img.height - 1, y * img.height / newH)
      var x = 0
      while (x < newW) {
        val sx = math.min(img.width - 1, x * img.width / newW)
        var c = 0
        while (c < img.channels) {
          out((y * newW + x) * img.channels + c) =
            img.pixels((sy * img.width + sx) * img.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    RasterImage(newW, newH, img.channels, out)
  }

  /** Per-channel mean in [0,1] + 16-bin grayscale histogram (normalized). */
  def imageFeatures(img: RasterImage): (Array[Double], Array[Double]) = {
    val means = new Array[Double](img.channels)
    val hist = new Array[Double](16)
    val nPix = img.width * img.height
    var p = 0
    while (p < nPix) {
      var gray = 0.0
      var c = 0
      while (c < img.channels) {
        val v = img.pixels(p * img.channels + c) & 0xff
        means(c) += v
        gray += v
        c += 1
      }
      hist(((gray / img.channels).toInt) >> 4) += 1.0
      p += 1
    }
    (means.map(_ / (nPix * 255.0)), hist.map(_ / nPix))
  }

  /** P6/P5 encoder (test fixtures + round-trips). */
  def encodeNetpbm(img: RasterImage): Array[Byte] = {
    val header = s"P${if (img.channels == 1) "5" else "6"}\n${img.width} ${img.height}\n255\n"
      .getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  private val realDecodedFields = Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("chan_mean", ArrayType(DoubleType)),
    StructField("gray_hist", ArrayType(DoubleType)))

  /** REAL decode stage: per-partition batched pass appending
    * width/height/channels/chan_mean/gray_hist; optional `resizeTo`
    * normalizes resolution before feature extraction (the
    * resize-then-featurize shape of an embedding pipeline).
    * Null/undecodable content → null features, row preserved.
    */
  def decodeImagesReal(df: DataFrame, binCol: String,
      resizeTo: Option[(Int, Int)] = None): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ realDecodedFields)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(binIdx).asInstanceOf[Array[Byte]]
        decodeImage(bytes) match {
          case Some(img0) =>
            val img = resizeTo.map { case (w, h) => resizeNearest(img0, w, h) }
              .getOrElse(img0)
            val (means, hist) = imageFeatures(img)
            Row.fromSeq(r.toSeq ++
              Seq(img.width, img.height, img.channels, means.toSeq, hist.toSeq))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null))
        }
      }
    }(enc)
  }

  /** Decoded PCM audio: interleaved 16-bit samples. */
  final case class PcmAudio(sampleRate: Int, channels: Int, samples: Array[Short])

  /** REAL audio decode, pure JVM: RIFF/WAVE with 16-bit PCM parsed
    * directly (the uncompressed interchange format; compressed codecs
    * stay stubbed — the JDK ships none). None for null/garbage bytes.
    */
  def decodeWav(bytes: Array[Byte]): Option[PcmAudio] =
    try {
      if (bytes == null || bytes.length < 44) return None
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      if (bb.getInt(0) != 0x46464952 /* RIFF */ ||
        bb.getInt(8) != 0x45564157 /* WAVE */ ) return None
      // walk chunks: fmt then data
      var pos = 12
      var sampleRate = 0
      var channels = 0
      var bitsPerSample = 0
      var pcm = false
      var samples: Array[Short] = null
      while (pos + 8 <= bytes.length && samples == null) {
        val id = bb.getInt(pos)
        val sz = bb.getInt(pos + 4)
        // Untrusted size field: negative sz (e.g. -8/-9) would make the
        // chunk advance `8 + sz + (sz & 1)` zero or negative and spin this
        // loop forever on a malformed chunk — garbage in must mean None
        // out, never a hung executor task (r2 ADVICE).
        if (sz < 0) return None
        if (id == 0x20746d66) { // "fmt "
          pcm = bb.getShort(pos + 8) == 1
          channels = bb.getShort(pos + 10)
          sampleRate = bb.getInt(pos + 12)
          bitsPerSample = bb.getShort(pos + 22)
        } else if (id == 0x61746164) { // "data"
          if (!pcm || bitsPerSample != 16 || channels <= 0 || sampleRate <= 0) return None
          val n = math.min(sz, bytes.length - pos - 8) / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = bb.getShort(pos + 8 + 2 * i); i += 1 }
        }
        pos += 8 + sz + (sz & 1)
      }
      if (samples == null) None else Some(PcmAudio(sampleRate, channels, samples))
    } catch { case _: Exception => None }

  /** Duration (s), RMS amplitude in [0,1], zero-crossing rate (per
    * sample, first channel) — the cheap pre-embedding audio features.
    */
  def audioFeatures(a: PcmAudio): (Double, Double, Double) = {
    val frames = a.samples.length / a.channels
    if (frames == 0) return (0.0, 0.0, 0.0)
    var sumSq = 0.0
    var crossings = 0
    var prev = 0
    var f = 0
    while (f < frames) {
      val s = a.samples(f * a.channels).toInt // first channel
      sumSq += s.toDouble * s
      if (f > 0 && ((s >= 0) != (prev >= 0))) crossings += 1
      prev = s
      f += 1
    }
    (frames.toDouble / a.sampleRate,
      math.sqrt(sumSq / frames) / 32768.0,
      crossings.toDouble / frames)
  }

  /** PCM16 WAV encoder (test fixtures + round-trips). */
  def encodeWav(a: PcmAudio): Array[Byte] = {
    val dataLen = a.samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0x46464952).putInt(36 + dataLen).putInt(0x45564157)
    bb.putInt(0x20746d66).putInt(16)
      .putShort(1).putShort(a.channels.toShort).putInt(a.sampleRate)
      .putInt(a.sampleRate * a.channels * 2).putShort((a.channels * 2).toShort).putShort(16)
    bb.putInt(0x61746164).putInt(dataLen)
    a.samples.foreach(bb.putShort)
    bb.array()
  }

  private val audioFields = Seq(
    StructField("sample_rate", IntegerType), StructField("channels", IntegerType),
    StructField("duration_s", DoubleType), StructField("rms", DoubleType),
    StructField("zcr", DoubleType))

  /** REAL audio decode stage (same batched per-partition shape as the
    * image path): appends sample_rate/channels/duration_s/rms/zcr;
    * null/undecodable content → null features, row preserved.
    */
  def decodeAudioReal(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ audioFields)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(binIdx).asInstanceOf[Array[Byte]]
        decodeWav(bytes) match {
          case Some(a) =>
            val (dur, rms, zcr) = audioFeatures(a)
            // Seq[Any]: a bare Seq(Int, Int, Double…) would WIDEN the
            // ints to Double and break the encoder's INT fields
            Row.fromSeq(r.toSeq ++ Seq[Any](a.sampleRate, a.channels, dur, rms, zcr))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null))
        }
      }
    }(enc)
  }

  case class Mp4Meta(majorBrand: String, timescale: Long, durationS: Double,
      nTracks: Int)

  /** REAL MP4/ISO-BMFF container metadata, pure JVM: walk the top-level
    * box list for `ftyp` (major brand) and `moov`, then `moov`'s
    * children for `mvhd` (version 0 and 1 layouts: timescale +
    * duration) and the `trak` count. This is the part of "video decode"
    * that needs no codec — duration/track metadata drives corpus
    * filtering and sampling decisions long before any frame is pixel-
    * decoded; FRAME decode itself stays a disclosed stub (the JDK ships
    * no video codec). None for null/garbage/truncated bytes — untrusted
    * size fields must never hang or overrun (the WAV lesson).
    */
  def parseMp4Meta(bytes: Array[Byte]): Option[Mp4Meta] =
    try {
      if (bytes == null || bytes.length < 16) return None
      val bb = java.nio.ByteBuffer.wrap(bytes) // ISO-BMFF is BIG-endian
      // walk a box list in [from, until): invoke f(boxType, bodyFrom, bodyUntil)
      def walk(from: Int, until: Int)(f: (Int, Int, Int) => Unit): Boolean = {
        var pos = from
        while (pos + 8 <= until) {
          val sz32 = bb.getInt(pos)
          val typ = bb.getInt(pos + 4)
          var bodyFrom = pos + 8
          val boxEnd: Long =
            if (sz32 == 0) until.toLong // box extends to end of enclosure
            else if (sz32 == 1) { // 64-bit largesize
              if (pos + 16 > until) return false
              bodyFrom = pos + 16
              pos.toLong + bb.getLong(pos + 8)
            } else pos.toLong + (sz32 & 0xffffffffL)
          if (boxEnd < bodyFrom || boxEnd > until) return false
          f(typ, bodyFrom, boxEnd.toInt)
          pos = boxEnd.toInt
        }
        true
      }
      var brand: String = null
      var moovFrom = -1
      var moovUntil = -1
      if (!walk(0, bytes.length) { (typ, from, end) =>
        if (typ == 0x66747970 && end - from >= 4) // "ftyp"
          brand = new String(bytes, from, 4, java.nio.charset.StandardCharsets.US_ASCII)
        else if (typ == 0x6d6f6f76) { moovFrom = from; moovUntil = end } // "moov"
      }) return None
      if (brand == null || moovFrom < 0) return None
      var timescale = 0L
      var duration = -1L
      var tracks = 0
      if (!walk(moovFrom, moovUntil) { (typ, from, end) =>
        if (typ == 0x6d766864) { // "mvhd"
          val v = bb.get(from) & 0xff
          if (v == 1 && end - from >= 4 + 28) {
            timescale = bb.getInt(from + 4 + 16) & 0xffffffffL
            duration = bb.getLong(from + 4 + 20)
          } else if (v == 0 && end - from >= 4 + 16) {
            timescale = bb.getInt(from + 4 + 8) & 0xffffffffL
            duration = bb.getInt(from + 4 + 12) & 0xffffffffL
          }
        } else if (typ == 0x7472616b) tracks += 1 // "trak"
      }) return None
      if (timescale <= 0 || duration < 0) return None
      Some(Mp4Meta(brand, timescale, duration.toDouble / timescale, tracks))
    } catch { case _: Exception => None }

  /** Minimal MP4 encoder (test fixtures): ftyp + moov(mvhd + empty
    * traks), mvhd version 0 or 1.
    */
  def encodeMp4Stub(brand: String, timescale: Int, duration: Long,
      nTracks: Int, v1: Boolean = false): Array[Byte] = {
    require(brand.length == 4, "brand must be 4 ASCII chars")
    val mvhdBody = if (v1) {
      val b = java.nio.ByteBuffer.allocate(4 + 28)
      b.put(1.toByte).put(Array[Byte](0, 0, 0)) // version 1, flags
      b.putLong(0L).putLong(0L).putInt(timescale).putLong(duration)
      b.array()
    } else {
      val b = java.nio.ByteBuffer.allocate(4 + 16)
      b.put(0.toByte).put(Array[Byte](0, 0, 0))
      b.putInt(0).putInt(0).putInt(timescale).putInt(duration.toInt)
      b.array()
    }
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + body.length)
      b.putInt(8 + body.length).put(typ.getBytes("US-ASCII")).put(body)
      b.array()
    }
    val traks = Array.fill(nTracks)(box("trak", Array.emptyByteArray))
    box("ftyp", brand.getBytes("US-ASCII") ++ new Array[Byte](4)) ++
      box("moov", box("mvhd", mvhdBody) ++ traks.flatten)
  }

  private val videoFields = Seq(
    StructField("major_brand", StringType), StructField("timescale", LongType),
    StructField("duration_s", DoubleType), StructField("n_tracks", IntegerType))

  /** Video container-metadata stage (same batched per-partition shape
    * as image/audio): appends major_brand/timescale/duration_s/n_tracks;
    * null/undecodable bytes → null features, row preserved.
    */
  def probeVideoMeta(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ videoFields)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(binIdx).asInstanceOf[Array[Byte]]
        parseMp4Meta(bytes) match {
          case Some(m) =>
            Row.fromSeq(r.toSeq ++ Seq(m.majorBrand, m.timescale, m.durationS, m.nTracks))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null, null))
        }
      }
    }(enc)
  }

  /** Frame-sampling stage for video-like content: emit `n` evenly spaced
    * byte-slices as frame rows (explode shape of a real frame sampler).
    */
  def sampleFrames(df: DataFrame, binCol: String, idCol: String, n: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", df.schema(idCol).dataType),
      StructField("frame_idx", IntegerType),
      StructField("frame_bytes", BinaryType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val idIdx = df.schema.fieldIndex(idCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.flatMap { r =>
      val bytes = r.get(binIdx).asInstanceOf[Array[Byte]]
      if (bytes == null || bytes.isEmpty) Iterator.empty
      else {
        val step = math.max(1, bytes.length / n)
        (0 until math.min(n, bytes.length)).iterator.map { i =>
          val lo = i * step
          val hi = math.min(bytes.length, lo + step)
          Row(r.get(idIdx), i, java.util.Arrays.copyOfRange(bytes, lo, hi))
        }
      }
    }(enc)
  }
}
