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

  test("real GIF bytes from the JDK encoder (LE screen descriptor)") {
    assert(ImageHeaders.parse(encoded("gif", 13, 7))
      .contains(("gif", 13, 7)))
    // dims above 255 exercise the little-endian high byte — a BE
    // read would see 290 = 0x0122 as 0x2201 = 8705
    assert(ImageHeaders.parse(encoded("gif", 290, 300))
      .contains(("gif", 290, 300)))
    // a signature-only fragment (no complete screen descriptor)
    assert(ImageHeaders.parse("GIF89a".getBytes ++ Array[Byte](5))
      .isEmpty)
  }

  private def webpBytes(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val size = 4 + 8 + payload.length
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    "RIFF".getBytes ++ le32(size) ++ "WEBP".getBytes ++
      fourcc.getBytes ++ le32(payload.length) ++ payload
  }

  test("WebP: VP8 lossy frame header, VP8L bit-packed dims, VP8X " +
      "canvas — all three forms") {
    // VP8 : frame tag (3) + sync + two LE u16s, 14-bit dims
    def vp8(w: Int, h: Int) = webpBytes("VP8 ",
      Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a,
        (w & 0xff).toByte, (w >> 8).toByte,
        (h & 0xff).toByte, (h >> 8).toByte))
    assert(ImageHeaders.parse(vp8(800, 600)).contains(("webp", 800, 600)))
    // scale bits set in the top 2 bits must be masked off
    assert(ImageHeaders.parse(vp8(800 | 0x4000, 600))
      .contains(("webp", 800, 600)))
    // VP8L: 0x2F then (w-1 | (h-1)<<14) packed LSB-first in 4 bytes
    def vp8l(w: Int, h: Int) = {
      val bits = (w - 1).toLong | ((h - 1).toLong << 14)
      webpBytes("VP8L", Array[Byte](0x2f,
        (bits & 0xff).toByte, ((bits >> 8) & 0xff).toByte,
        ((bits >> 16) & 0xff).toByte, ((bits >> 24) & 0xff).toByte))
    }
    assert(ImageHeaders.parse(vp8l(1, 1)).contains(("webp", 1, 1)))
    assert(ImageHeaders.parse(vp8l(16384, 300))
      .contains(("webp", 16384, 300)))
    // VP8X: 4 flag/reserved bytes + 24-bit LE canvas-minus-one
    def vp8x(w: Int, h: Int) = webpBytes("VP8X",
      Array[Byte](0, 0, 0, 0,
        ((w - 1) & 0xff).toByte, (((w - 1) >> 8) & 0xff).toByte,
        (((w - 1) >> 16) & 0xff).toByte,
        ((h - 1) & 0xff).toByte, (((h - 1) >> 8) & 0xff).toByte,
        (((h - 1) >> 16) & 0xff).toByte))
    assert(ImageHeaders.parse(vp8x(70000, 65537))
      .contains(("webp", 70000, 65537)))
    // bad sync code in a VP8 chunk → None
    assert(ImageHeaders.parse(webpBytes("VP8 ",
      Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2b,
        32, 0, 32, 0))).isEmpty)
  }

  test("real TIFF bytes from the JDK encoder") {
    // the JDK ImageIO TIFF plugin (present since JDK 9) is a real
    // third-party writer for the IFD walk
    assert(ImageHeaders.parse(encoded("tiff", 19, 11))
      .contains(("tiff", 19, 11)))
    assert(ImageHeaders.parse(encoded("tiff", 700, 300))
      .contains(("tiff", 700, 300)))
  }

  private def tiffBuilt(le: Boolean, w: Long, h: Long,
      shortHeight: Boolean = true): Array[Byte] = {
    def n(v: Long, bytes: Int): Seq[Int] = {
      val be = (0 until bytes).reverse.map(i => ((v >> (8 * i)) & 0xff).toInt)
      if (le) be.reverse else be
    }
    val bom = if (le) Seq('I'.toInt, 'I'.toInt) else Seq('M'.toInt, 'M'.toInt)
    val hVal = if (shortHeight) n(h, 2) ++ Seq(0, 0) else n(h, 4)
    val hTyp = if (shortHeight) 3 else 4
    (bom ++ n(42, 2) ++ n(8, 4) ++ n(2, 2) ++
      n(256, 2) ++ n(4, 2) ++ n(1, 4) ++ n(w, 4) ++
      n(257, 2) ++ n(hTyp, 2) ++ n(1, 4) ++ hVal ++
      n(0, 4)).map(_.toByte).toArray
  }

  test("TIFF: both byte orders, SHORT-inline and LONG dims, " +
      "fail-closed walks") {
    assert(ImageHeaders.parse(tiffBuilt(le = true, 70000, 12345))
      .contains(("tiff", 70000, 12345)))
    assert(ImageHeaders.parse(tiffBuilt(le = false, 70000, 12345))
      .contains(("tiff", 70000, 12345)))
    assert(ImageHeaders.parse(tiffBuilt(le = true, 9, 9,
      shortHeight = false)).contains(("tiff", 9, 9)))
    // 'II' magic with BE 42 (and vice versa) is not a TIFF
    val bad = tiffBuilt(le = true, 5, 5)
    bad(2) = 0; bad(3) = 42 // big-endian 42 under 'II'
    assert(ImageHeaders.parse(bad).isEmpty)
    // IFD entry table running past the buffer fails closed
    assert(ImageHeaders.parse(
      tiffBuilt(le = true, 5, 5).dropRight(20)).isEmpty)
    // zero width parses to None
    assert(ImageHeaders.parse(tiffBuilt(le = false, 0, 5)).isEmpty)
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

  /** JDK-encoded 24-bit BMP with per-pixel RGB set explicitly. */
  private def bmpWith(w: Int, h: Int,
      rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgb(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "bmp", out)
    out.toByteArray
  }

  test("bmpLevels: exact channel sums over real ImageIO BMP output " +
    "(odd width exercises row padding)") {
    // 3×2, width 3 → 9-byte rows padded to 12: a decoder that walks
    // without padding reads pad zeros as pixels and mis-sums
    val rgb = (x: Int, y: Int) => (x * 40 + y, 200 - x * 10, x + y * 90)
    val got = ImageHeaders.bmpLevels(bmpWith(3, 2, rgb))
    val px = for (y <- 0 until 2; x <- 0 until 3) yield rgb(x, y)
    assert(got.contains((3, 2, 6L,
      px.map(_._1.toLong).sum, px.map(_._2.toLong).sum,
      px.map(_._3.toLong).sum)))
  }

  test("bmpLevels: truncated payload counts only pixels present; " +
    "PNG/JPEG (compressed) and junk return None") {
    val full = bmpWith(2, 2, (x, y) => (10 * (x + 1), 20, 30))
    // drop the last row's worth + 1: bottom-up storage means the
    // LAST file row is the TOP image row — only present pixels count
    val cut = full.take(full.length - 9)
    val got = ImageHeaders.bmpLevels(cut)
    assert(got.isDefined && got.get._3 < 4L && got.get._3 > 0L)
    assert(ImageHeaders.bmpLevels(encoded("png", 8, 8)).isEmpty)
    assert(ImageHeaders.bmpLevels(encoded("jpg", 8, 8)).isEmpty)
    assert(ImageHeaders.bmpLevels("not an image".getBytes).isEmpty)
    assert(ImageHeaders.bmpLevels(null).isEmpty)
  }

  test("bmpLevels: a crafted header declaring 2^20 x 2^20 pixels on " +
    "a 60-byte payload returns immediately (walk bounded by bytes " +
    "present, not declared dimensions)") {
    // hand-build the 54-byte header: 'BM', dataOff=54, DIB=40,
    // w=h=2^20, planes=1, 24bpp, BI_RGB — plus 6 junk payload bytes
    val b = new Array[Byte](60)
    b(0) = 'B'; b(1) = 'M'
    def put32(i: Int, v: Long): Unit = for (k <- 0 until 4)
      b(i + k) = ((v >> (8 * k)) & 0xff).toByte
    def put16(i: Int, v: Int): Unit = { b(i) = (v & 0xff).toByte
      b(i + 1) = ((v >> 8) & 0xff).toByte }
    put32(10, 54); put32(14, 40)
    put32(18, 1L << 20); put32(22, 1L << 20)
    put16(26, 1); put16(28, 24); put32(30, 0)
    val t0 = System.nanoTime()
    val got = ImageHeaders.bmpLevels(b)
    val ms = (System.nanoTime() - t0) / 1e6
    // declared dims are reported, but only the 2 whole pixels whose
    // 3 bytes are present get summed — and the walk is instant, not
    // ~10^12 iterations (minutes-to-hours per row at SQL call sites)
    assert(got.isDefined && got.get._1 == (1 << 20) &&
      got.get._3 == 2L)
    assert(ms < 1000.0)
  }

  test("image_levels expression + SQL registration agree with the " +
    "plain-Scala decoder") {
    val s = TestSpark.spark
    import s.implicits._
    val bmp = bmpWith(4, 3, (x, y) => (x * 50, y * 80, (x + y) * 30))
    val rows = Seq((1L, bmp), (2L, encoded("png", 5, 5)))
    val got = rows.toDF("id", "payload")
      .selectExpr("id", "image_levels(payload) AS m")
      .selectExpr("id", "m.n_px AS n", "m.sum_r AS r", "m.sum_g AS g",
        "m.sum_b AS b")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(1)) -1L else r.getLong(2),
        if (r.isNullAt(1)) -1L else r.getLong(3),
        if (r.isNullAt(1)) -1L else r.getLong(4))).toSet
    val px = for (y <- 0 until 3; x <- 0 until 4)
      yield (x * 50L, y * 80L, (x + y) * 30L)
    assert(got == Set(
      (1L, 12L, px.map(_._1).sum, px.map(_._2).sum, px.map(_._3).sum),
      (2L, -1L, -1L, -1L, -1L)))
  }
}
