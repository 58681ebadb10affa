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

  test("sampleFrames: n evenly spaced slices, reassembles prefix") {
    val frames = Multimodal.sampleFrames(media.filter($"media_id" === 1L), "content", "media_id", 4)
      .orderBy("frame_idx").collect()
    assert(frames.length == 4)
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 1, 2, 3))
    val total = frames.map(_.getAs[Array[Byte]]("frame_bytes").length).sum
    assert(total <= "fake-image-bytes-bbbb-longer-payload".length)
    assert(Multimodal.sampleFrames(media.filter($"media_id" === 2L), "content", "media_id", 4).count() == 0)
  }
}
