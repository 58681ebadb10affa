package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns + typed metadata, with decode / feature /
  * frame-sample stages as partition-wise batch transforms.
  *
  * The actual codec call is STUBBED (no image/audio libs in this
  * container): `decodeStub` derives a deterministic fake (dims + a
  * 4-bin byte histogram) from the bytes. The Spark-side plumbing —
  * schema, batched `mapPartitions` (one library-handle per partition,
  * the `mapInPandas` batch shape), partition sizing, null passthrough —
  * is real and tested; swapping the stub for a JNI/codec call changes
  * one function.
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
