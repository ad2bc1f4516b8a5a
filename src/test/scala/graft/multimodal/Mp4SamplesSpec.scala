package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The stsz/stco sample-table walk ([[VideoHeaders.parseSamples]])
  * pinned on hand-assembled nested boxes (independent of
  * [[Mp4Fixture]]'s builder), the encoder/decoder/closed-form
  * triangle over both stsz layouts, and the fail-closed boundary
  * (overrunning tables, nonzero versions, absent boxes). */
class Mp4SamplesSpec extends AnyFunSuite {

  private def u32(v: Long): Array[Byte] = Array(
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def box(typ: String, body: Array[Byte]): Array[Byte] =
    u32(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body

  private def nest(stsz: Array[Byte], stco: Array[Byte]): Array[Byte] =
    box("moov", box("trak", box("mdia", box("minf",
      box("stbl", box("stsz", stsz) ++ box("stco", stco))))))

  test("hand-assembled per-sample table: sizes [300, 100, 500], " +
    "two chunks") {
    val stsz = u32(0) ++ u32(0) ++ u32(3) ++
      u32(300) ++ u32(100) ++ u32(500)
    val stco = u32(0) ++ u32(2) ++ u32(16) ++ u32(416)
    val Some((n, s, m, c)) = VideoHeaders.parseSamples(nest(stsz, stco))
    assert((n, s, m, c) == ((3L, 900L, 500L, 2L)))
  }

  test("hand-assembled uniform layout: sample_size 250 x 7, no " +
    "per-sample table") {
    val stsz = u32(0) ++ u32(250) ++ u32(7)
    val stco = u32(0) ++ u32(1) ++ u32(16)
    val Some((n, s, m, c)) = VideoHeaders.parseSamples(nest(stsz, stco))
    assert((n, s, m, c) == ((7L, 1750L, 250L, 1L)))
  }

  test("triangle over docs 0..150: both layouts round-trip the " +
    "closed-form census") {
    for (doc <- 0L to 150L) {
      val Some((n, s, m, c)) =
        VideoHeaders.parseSamples(Mp4Fixture.stream(doc))
      val ns = Mp4Fixture.nsOf(doc)
      assert(n == ns && c == Mp4Fixture.chunksOf(doc), s"doc $doc")
      if (Mp4Fixture.uniformOf(doc)) {
        assert(s == Mp4Fixture.uniSizeOf(doc) * ns)
        assert(m == Mp4Fixture.uniSizeOf(doc))
      } else {
        val sizes = (0 until ns).map(k => Mp4Fixture.sizeOf(doc, k))
        assert(s == sizes.sum && m == sizes.max, s"doc $doc")
      }
    }
  }

  test("fail-closed: table overruns its box, nonzero stsz version, " +
    "missing stco, truncation") {
    // declares 5 samples but carries 2
    val overrun = u32(0) ++ u32(0) ++ u32(5) ++ u32(10) ++ u32(20)
    val stco = u32(0) ++ u32(1) ++ u32(16)
    assert(VideoHeaders.parseSamples(nest(overrun, stco)).isEmpty)
    val v1 = u32(0x01000000L) ++ u32(250) ++ u32(7)
    assert(VideoHeaders.parseSamples(nest(v1, stco)).isEmpty)
    // stco entry count overruns
    val badStco = u32(0) ++ u32(9) ++ u32(16)
    val okStsz = u32(0) ++ u32(250) ++ u32(7)
    assert(VideoHeaders.parseSamples(nest(okStsz, badStco)).isEmpty)
    // missing stco entirely
    val noStco = box("moov", box("trak", box("mdia", box("minf",
      box("stbl", box("stsz", okStsz))))))
    assert(VideoHeaders.parseSamples(noStco).isEmpty)
    assert(VideoHeaders.parseSamples(
      Mp4Fixture.stream(9L).dropRight(4)).isEmpty)
    assert(VideoHeaders.parseSamples(null).isEmpty)
  }
}
