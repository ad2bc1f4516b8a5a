package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import Multimodal._

/** Multimodal plumbing: the decode itself is a documented
  * deterministic stub; what these tests pin down is the Spark-side
  * contract — schema, partition-local execution, one-to-many frame
  * sampling, fixed-width features. */
class MultimodalSpec extends AnyFunSuite {

  private def records = {
    val spark = TestSpark.spark
    import spark.implicits._
    Seq(
      MediaRecord(1L, "image", Array.tabulate(100)(_.toByte)),
      MediaRecord(2L, "video", Array.tabulate(50)(i => (i * 3).toByte)),
      MediaRecord(3L, "audio", Array(7.toByte, 8.toByte)),
      MediaRecord(4L, "unknown", Array.empty[Byte])).toDS()
  }

  test("decodeMeta yields deterministic typed metadata") {
    val m = decodeMeta(records).collect()
      .map(r => r.getLong(0) -> r).toMap
    val img = m(1L)
    assert(img.getLong(2) == 100L) // n_bytes
    assert(img.getInt(3) == 100 % 640 + 1) // width
    assert(img.getInt(4) == (100 * 31) % 480 + 1) // height
    val vid = m(2L)
    assert(vid.getInt(5) == 50 % 24 + 1) // n_frames = 3
    val aud = m(3L)
    assert(aud.getInt(6) == 8000 + (7 % 5) * 8000) // sample rate from b0
    assert(!m(4L).getBoolean(7)) // unknown kind: decode_ok = false
  }

  test("sampleFrames emits stride-spaced frame indices per video") {
    val frames = sampleFrames(decodeMeta(records), stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // video 2 has n_frames = 3 → indices 0, 2
    assert(frames == Set((2L, 0), (2L, 2)))
  }

  test("planResize fits within bounds, keeps aspect, never upscales") {
    val spark = TestSpark.spark
    import spark.implicits._
    val meta = Seq(
      (1L, 1280, 720),  // wide: width binds at 640 -> 640x360
      (2L, 720, 1280),  // tall: height binds at 480 -> 270x480
      (3L, 320, 200))   // already fits: untouched
      .toDF("media_id", "width", "height")
    val got = planResize(meta, maxW = 640, maxH = 480).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(3), r.getInt(4), r.getBoolean(5))).toMap
    assert(got(1L) == ((640, 360, true)))
    assert(got(2L) == ((270, 480, true)))
    assert(got(3L) == ((320, 200, false)))
  }

  test("extractFeatures is fixed-width and deterministic") {
    val f = extractFeatures(records).collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Float](1), r.getBoolean(2))).toMap
    assert(f.values.forall(_._1.length == 16))
    // none of these payloads decode as PNG → all on the stub path
    assert(f.values.forall(!_._2))
    assert(f(3L)._1(3) == 7.0f) // first byte
    assert(f(1L)._1(0) == 100.0f) // length
    assert(f(1L)._1.drop(4).forall(_ == 0f)) // stub pad to grid width
  }

  test("extractFeatures is REAL pixel-derived for decodable images") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 8x8 gray PNG via ImageIO: luma = (x * 16 + y * 2) so each 2x2
    // quadrant cell has an exactly computable mean
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 8; x <- 0 until 8)
      img.getRaster.setSample(x, y, 0, x * 16 + y * 2)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val ds = Seq(MediaRecord(9L, "image", bos.toByteArray)).toDS()
    val row = extractFeatures(ds).collect().head
    assert(row.getBoolean(2)) // pixel-derived, not the stub
    val feats = row.getSeq[Float](1)
    assert(feats.length == 16)
    // cell (i=0, j=0) covers x in 0..1, y in 0..1: mean of
    // {0, 2, 16, 18} = 9 exactly
    assert(feats(0) == 9.0f)
    // cell (i=3, j=0): x in 6..7, y in 0..1: mean of
    // {96, 98, 112, 114} = 105
    assert(feats(3) == 105.0f)
  }
}
