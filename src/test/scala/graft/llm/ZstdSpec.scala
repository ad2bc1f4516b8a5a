package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** The RFC 8878 frame walk ([[Zstd]]) pinned on hand-assembled
  * frames (independent of the fixture builder), the
  * encoder/decoder/closed-form triangle, and the fail-closed
  * boundary — Huffman-literals blocks (FSE compressed blocks decode
  * since round 15, see ZstdFseSpec), reserved descriptor bits,
  * content-size mismatches, truncation. */
class ZstdSpec extends AnyFunSuite {

  test("hand-assembled single-segment frame: raw 'ab' + RLE 'z'x4, " +
    "1-byte declared content size") {
    val b = Array[Byte](
      0x28, 0xb5.toByte, 0x2f, 0xfd.toByte, // magic LE
      0x20, // descriptor: single-segment, fcs width 1
      6, // declared content size
      0x10, 0x00, 0x00, // block hdr: raw, size 2, not last
      'a', 'b',
      0x23, 0x00, 0x00, // block hdr: RLE, size 4, last
      'z')
    val Some((f, s, l, cs, w)) = Zstd.parse(b)
    assert(f == 1 && s == 0 && l == 6 && w == 0)
    assert(cs == 'a'.toLong + 'b' + 4L * 'z')
  }

  test("hand-assembled skippable frame + windowed frame") {
    val b = Array[Byte](
      0x53, 0x2a, 0x4d, 0x18, // skippable magic 0x184D2A53 LE
      3, 0, 0, 0, 9, 9, 9, // 3-byte payload
      0x28, 0xb5.toByte, 0x2f, 0xfd.toByte,
      0x00, // descriptor: not single-segment, no fcs
      0x0a, // window: exponent 1, mantissa 2 → 2048 + 256*2
      0x09, 0x00, 0x00, // raw, size 1, last
      0x7f)
    val Some((f, s, l, cs, w)) = Zstd.parse(b)
    assert(f == 1 && s == 1 && l == 1 && cs == 0x7f && w == 2560)
  }

  test("triangle over docs 0..150: frame census, decoded byte sum, " +
    "window arithmetic round-trip the closed forms") {
    for (doc <- 0L to 150L) {
      val Some((f, s, l, cs, w)) = Zstd.parse(Zstd.stream(doc))
      assert(f == Zstd.nFramesOf(doc), s"doc $doc")
      assert(s == (if (Zstd.hasSkipOf(doc)) 1L else 0L))
      var el = 0L; var ec = 0L; var ew = 0L
      for (fr <- 0 until Zstd.nFramesOf(doc)) {
        val rl = Zstd.rawLenOf(doc, fr)
        el += rl + Zstd.rleLenOf(doc)
        ec += (0 until rl).map(k => Zstd.rawByteOf(doc, fr, k).toLong).sum
        ec += Zstd.rleLenOf(doc).toLong * Zstd.rleByteOf(doc, fr)
        if (!Zstd.singleOf(doc, fr)) {
          val wd = Zstd.windowByteOf(doc, fr)
          val base = 1L << (10 + (wd >> 3))
          ew += base + (base / 8) * (wd & 7)
        }
      }
      assert(l == el && cs == ec && w == ew, s"doc $doc")
    }
  }

  test("fail-closed: Huffman-literals block, reserved descriptor " +
    "bit, content-size mismatch, truncation, bad magic") {
    def frame(desc: Int, body: Array[Byte]): Array[Byte] =
      Array[Byte](0x28, 0xb5.toByte, 0x2f, 0xfd.toByte,
        desc.toByte) ++ body
    // compressed block whose literals are Huffman-coded (type 2) —
    // the remaining declared entropy boundary
    assert(Zstd.parse(frame(0x20, Array[Byte](1,
      0x0d, 0x00, 0x00, 0x02))).isEmpty)
    // reserved descriptor bit 3
    assert(Zstd.parse(frame(0x28, Array[Byte](1,
      0x09, 0x00, 0x00, 'x'))).isEmpty)
    // declared size 5, regenerated 1
    assert(Zstd.parse(frame(0x20, Array[Byte](5,
      0x09, 0x00, 0x00, 'x'))).isEmpty)
    val good = Zstd.stream(4L)
    assert(Zstd.parse(good.dropRight(1)).isEmpty)
    assert(Zstd.parse("junk".getBytes).isEmpty)
    assert(Zstd.parse(null).isEmpty)
  }
}
