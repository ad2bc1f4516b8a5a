package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The header parser against REAL codec output: bytes produced by the
  * JDK's own PNG/JPEG encoders (the only real codecs in this
  * container), plus adversarial inputs for the marker walk. */
class ImageHeadersSpec extends AnyFunSuite {

  private def encoded(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"JDK has no $fmt writer")
    out.toByteArray
  }

  test("real PNG bytes from the JDK encoder") {
    assert(ImageHeaders.parse(encoded("png", 17, 9))
      .contains(("png", 17, 9)))
    assert(ImageHeaders.parse(encoded("png", 1920, 1080))
      .contains(("png", 1920, 1080)))
  }

  test("real JPEG bytes from the JDK encoder (walks JFIF/DQT/DHT)") {
    assert(ImageHeaders.parse(encoded("jpg", 33, 21))
      .contains(("jpeg", 33, 21)))
    assert(ImageHeaders.parse(encoded("jpg", 641, 479))
      .contains(("jpeg", 641, 479)))
  }

  test("truncated, empty, and non-image payloads parse to None") {
    val png = encoded("png", 10, 10)
    assert(ImageHeaders.parse(png.take(23)).isEmpty) // cut inside IHDR
    assert(ImageHeaders.parse(Array.emptyByteArray).isEmpty)
    assert(ImageHeaders.parse(null).isEmpty)
    assert(ImageHeaders.parse("just some text".getBytes).isEmpty)
    // JPEG SOI but garbage after — lost marker sync
    assert(ImageHeaders.parse(
      Array(0xff, 0xd8, 0x00, 0x11).map(_.toByte)).isEmpty)
    // JPEG that ends (EOI) before any SOF
    assert(ImageHeaders.parse(
      Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).isEmpty)
  }

  test("zero-length segment declarations don't loop forever") {
    // APP0 with declared length 1 (< 2 is impossible) must bail, not
    // spin or walk backwards
    assert(ImageHeaders.parse(
      Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x01, 0xff, 0xc0)
        .map(_.toByte)).isEmpty)
  }

  test("image_dims expression + SQL registration agree with the parser") {
    val s = TestSpark.spark
    import s.implicits._
    val rows = Seq(
      (1L, encoded("png", 321, 7)),
      (2L, encoded("jpg", 5, 1023)),
      (3L, "not an image".getBytes))
    val got = rows.toDF("id", "payload")
      .selectExpr("id", "image_dims(payload) AS d")
      .selectExpr("id", "d.kind AS kind", "d.width AS w", "d.height AS h")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(1)) -1 else r.getInt(2),
        if (r.isNullAt(1)) -1 else r.getInt(3))).toSet
    assert(got == Set((1L, "png", 321, 7), (2L, "jpeg", 5, 1023),
      (3L, null, -1, -1)))
  }

  test("StubCodec uses the real header path for images") {
    val png = encoded("png", 123, 45)
    val m = Multimodal.StubCodec.decode("image", png)
    assert((m.width, m.height, m.ok) == (123, 45, true))
  }
}
