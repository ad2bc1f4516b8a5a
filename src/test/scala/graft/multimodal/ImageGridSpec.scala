package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

/** dHash fingerprint lane ([[ImageGrid]]): the luma-grid decode must
  * reproduce exact pixels on REAL encoder output (ImageIO: dynamic
  * Huffman, encoder-chosen filters), the fingerprint must be stable
  * across re-encodes of the same picture, move by a bounded number
  * of bits under a single-pixel edit, and refuse images too small
  * for the 9×8 grid. */
class ImageGridSpec extends AnyFunSuite {

  private def imageIoGray(w: Int, h: Int,
      v: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    // raw raster write — setRGB would colorspace-convert the sample
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, v(x, y) & 0xff)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def imageIoRgb(w: Int, h: Int,
      rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgb(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def ham(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) +
      java.lang.Long.bitCount(a._2 ^ b._2)

  test("lumaGrid reproduces exact pixels from a real gray encoder") {
    val w = 13; val h = 10
    def v(x: Int, y: Int): Int = (x * 31 + y * 13 + 7) % 256
    val Some((gw, gh, luma)) = ImageGrid.lumaGrid(imageIoGray(w, h, v))
    assert(gw == w && gh == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(luma(y * w + x) == v(x, y),
        s"pixel ($x,$y)")
  }

  test("lumaGrid sums r+g+b from a real truecolor encoder") {
    val w = 11; val h = 9
    def rgb(x: Int, y: Int) =
      ((x * 7) % 256, (y * 11) % 256, (x * y) % 256)
    val Some((gw, gh, luma)) = ImageGrid.lumaGrid(imageIoRgb(w, h, rgb))
    assert(gw == w && gh == h)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgb(x, y)
      assert(luma(y * w + x) == r + g + b, s"pixel ($x,$y)")
    }
  }

  test("dhash matches a direct reference computation") {
    val w = 14; val h = 11
    def v(x: Int, y: Int): Int = (x * 53 + y * 29 + x * y) % 256
    val png = imageIoGray(w, h, v)
    val Some((gw, gh, luma)) = ImageGrid.lumaGrid(png)
    val Some((hi, lo)) = ImageGrid.dhash64(gw, gh, luma)
    // independent reference: mean-of-cell doubles with an epsilon-free
    // comparison via exact rationals (BigInt cross-multiplication)
    val sums = Array.fill(8, 9)(BigInt(0))
    val cnts = Array.fill(8, 9)(BigInt(0))
    for (y <- 0 until h; x <- 0 until w) {
      val i = 9 * x / w; val j = 8 * y / h
      sums(j)(i) += v(x, y); cnts(j)(i) += 1
    }
    var refHi = 0L; var refLo = 0L
    for (j <- 0 until 8; i <- 0 until 8)
      if (sums(j)(i) * cnts(j)(i + 1) > sums(j)(i + 1) * cnts(j)(i)) {
        if (j < 4) refHi |= 1L << (j * 8 + i)
        else refLo |= 1L << ((j - 4) * 8 + i)
      }
    assert((hi, lo) == (refHi, refLo))
    assert(hi >= 0 && lo >= 0 && hi < (1L << 32) && lo < (1L << 32))
  }

  test("fingerprint is invariant across gray and rgb re-encodes") {
    val w = 16; val h = 12
    def v(x: Int, y: Int): Int = (x * 19 + y * 41) % 256
    val gray = ImageGrid.lumaGrid(imageIoGray(w, h, v)).get
    val rgb = ImageGrid.lumaGrid(
      imageIoRgb(w, h, (x, y) => (v(x, y), v(x, y), v(x, y)))).get
    // rgb luma is 3× the gray luma — comparisons are scale-invariant
    val a = ImageGrid.dhash64(gray._1, gray._2, gray._3).get
    val b = ImageGrid.dhash64(rgb._1, rgb._2, rgb._3).get
    assert(a == b)
  }

  test("single-pixel edit moves at most 2 bits") {
    val w = 18; val h = 16
    def v(x: Int, y: Int): Int = (x * 37 + y * 17) % 256
    val base = ImageGrid.lumaGrid(imageIoGray(w, h, v)).get
    val a = ImageGrid.dhash64(base._1, base._2, base._3).get
    // one pixel poked hard: only its cell's two comparisons can flip
    def v2(x: Int, y: Int): Int =
      if (x == 5 && y == 3) 255 else v(x, y)
    val ed = ImageGrid.lumaGrid(imageIoGray(w, h, v2)).get
    val b = ImageGrid.dhash64(ed._1, ed._2, ed._3).get
    assert(ham(a, b) <= 2)
  }

  test("images below the 9x8 grid are refused; other types null") {
    val small = imageIoGray(8, 8, (x, y) => (x + y) % 256)
    val g = ImageGrid.lumaGrid(small).get
    assert(ImageGrid.dhash64(g._1, g._2, g._3).isEmpty)
    assert(ImageGrid.dhashRow(small) == null)
    assert(ImageGrid.lumaGrid(Array[Byte](1, 2, 3)).isEmpty)
    assert(ImageGrid.lumaGrid(null).isEmpty)
    // palette/alpha color types are out of decode scope → None
    val argb = new BufferedImage(12, 10, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 10; x <- 0 until 12)
      argb.setRGB(x, y, (128 << 24) | (x * 20 << 16) | (y * 25 << 8))
    val out = new ByteArrayOutputStream()
    ImageIO.write(argb, "png", out)
    assert(ImageGrid.lumaGrid(out.toByteArray).isEmpty)
  }

  test("banded search exactness: ham <= 3 implies a shared band") {
    // the pigeonhole property mm_image_neardup's oracle relies on,
    // checked over a sweep of synthetic fingerprints with 0–3 edits
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val hi = rnd.nextLong() & 0xffffffffL
      val lo = rnd.nextLong() & 0xffffffffL
      val nFlip = rnd.nextInt(4)
      var h2 = hi; var l2 = lo
      for (_ <- 1 to nFlip) {
        val bit = rnd.nextInt(64)
        if (bit < 32) h2 ^= 1L << bit else l2 ^= 1L << (bit - 32)
      }
      def bands(h: Long, l: Long) =
        Seq(h & 0xffff, h >>> 16, l & 0xffff, l >>> 16)
      val shared = bands(hi, lo).zip(bands(h2, l2)).exists {
        case (x, y) => x == y
      }
      assert(ham((hi, lo), (h2, l2)) > 3 || shared)
    }
  }
}
