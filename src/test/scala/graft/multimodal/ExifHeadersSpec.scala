package graft.multimodal

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

/** The EXIF orientation walk against hand-built JPEGs (both embedded
  * TIFF byte orders, built by INDEPENDENT arithmetic from the
  * parser's masked reads), real JDK encoder output for the no-EXIF
  * default, and fail-closed adversaries. */
class ExifHeadersSpec extends AnyFunSuite {

  private def be16(v: Int): Seq[Int] = Seq(v >> 8, v & 0xff)

  /** SOI + APP1(Exif + 26-byte TIFF with one IFD0 entry `tag`) +
    * SOF0(h, w) + EOI. */
  private def jpegWithExif(w: Int, h: Int, orient: Int, le: Boolean,
      tag: Int = 0x0112, typ: Int = 3, cnt: Int = 1): Array[Byte] = {
    def e16(v: Int): Seq[Int] =
      if (le) Seq(v & 0xff, v >> 8) else be16(v)
    def e32(v: Int): Seq[Int] =
      if (le) Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, v >>> 24)
      else Seq(v >>> 24, (v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff)
    val tiff =
      (if (le) Seq('I'.toInt, 'I'.toInt) else Seq('M'.toInt, 'M'.toInt)) ++
        e16(42) ++ e32(8) ++ e16(1) ++
        e16(tag) ++ e16(typ) ++ e32(cnt) ++ e16(orient) ++ e16(0) ++
        e32(0)
    val app1 = Seq(0xff, 0xe1) ++ be16(2 + 6 + tiff.length) ++
      "Exif".map(_.toInt) ++ Seq(0, 0) ++ tiff
    val sof = Seq(0xff, 0xc0, 0x00, 0x11, 0x08) ++ be16(h) ++ be16(w) ++
      Seq(0x03, 0x01, 0x11, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
    val out = new ByteArrayOutputStream()
    (Seq(0xff, 0xd8) ++ app1 ++ sof ++ Seq(0xff, 0xd9))
      .foreach(out.write)
    out.toByteArray
  }

  test("both embedded byte orders decode; 5-8 would transpose") {
    assert(ExifHeaders.parse(jpegWithExif(640, 480, 6, le = true))
      .contains((640, 480, 6)))
    assert(ExifHeaders.parse(jpegWithExif(640, 480, 6, le = false))
      .contains((640, 480, 6)))
    assert(ExifHeaders.parse(jpegWithExif(33, 7, 8, le = true))
      .contains((33, 7, 8)))
    assert(ExifHeaders.parse(jpegWithExif(33, 7, 1, le = false))
      .contains((33, 7, 1)))
  }

  test("no EXIF: real JDK encoder bytes default to orientation 1") {
    val img = new java.awt.image.BufferedImage(
      17, 11, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    assert(ExifHeaders.parse(out.toByteArray).contains((17, 11, 1)))
  }

  test("EXIF without the orientation tag defaults to 1; present " +
    "but malformed fails closed") {
    // a different tag (0x010F Make-ish but SHORT for simplicity)
    assert(ExifHeaders.parse(
      jpegWithExif(10, 20, 3, le = true, tag = 0x013B))
      .contains((10, 20, 1)))
    // orientation present with wrong type / count / range → None
    assert(ExifHeaders.parse(
      jpegWithExif(10, 20, 3, le = false, typ = 4)).isEmpty)
    assert(ExifHeaders.parse(
      jpegWithExif(10, 20, 3, le = true, cnt = 2)).isEmpty)
    assert(ExifHeaders.parse(
      jpegWithExif(10, 20, 0, le = true)).isEmpty)
    assert(ExifHeaders.parse(
      jpegWithExif(10, 20, 9, le = false)).isEmpty)
    // bad TIFF magic fails closed
    val bad = jpegWithExif(10, 20, 3, le = true)
    bad(12) = 'X'.toByte // TIFF starts at byte 12
    assert(ExifHeaders.parse(bad).isEmpty)
    // truncation mid-APP1 fails closed
    assert(ExifHeaders.parse(
      jpegWithExif(10, 20, 3, le = true).take(20)).isEmpty)
  }
}
