package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Wasted-bits decode ([[AudioHeaders.parseFlacPcm]], §9.2.1)
  * pinned on HAND-ASSEMBLED bitstreams — the unary count, the
  * reduced coding width, and the shift-after-reconstruction order —
  * plus the encoder/decoder/closed-form triangle and the
  * width-exhaustion boundary. */
class FlacWastedSpec extends AnyFunSuite {

  private def head(ch: Int, total: Int): Array[Byte] = {
    val b = new Array[Byte](42)
    b(0) = 'f'; b(1) = 'L'; b(2) = 'a'; b(3) = 'C'
    b(4) = 0x80.toByte; b(7) = 34
    b(18) = (44100 >> 12).toByte
    b(19) = ((44100 >> 4) & 0xff).toByte
    b(20) = (((44100 & 0xf) << 4) | ((ch - 1) << 1) | 0).toByte
    b(21) = 0xf0.toByte
    b(25) = total.toByte
    b
  }

  private def bits(s: String): Array[Byte] = {
    val b = s.replaceAll("[^01]", "")
    assert(b.length % 8 == 0, s"${b.length} bits not byte-aligned")
    b.grouped(8).map(x => Integer.parseInt(x, 2).toByte).toArray
  }

  private def frameHdr(ch: Int, ns: Int): String = {
    def b8(v: Int) = (0 until 8).map(k => (v >> (7 - k)) & 1).mkString
    "11111111 11111000 01100000 " + b8((ch - 1) << 4) +
      " 00000000 " + b8(ns - 1) + " 00000000"
  }

  test("hand-built CONSTANT with 2 wasted bits: unary count, " +
    "14-bit coding width, left-shift restore") {
    // flag 1, unary "01" → k = 2; value 5 at 14 bits → samples 20
    val payload = head(1, 2) ++ bits(
      frameHdr(1, 2) +
        " 0 000000 1 01" + " 00000000000101" + // CONSTANT, 14-bit 5
        " 00000000 00000000") // 80 bits: aligned; zero CRC-16
    val Some((ch, rate, bw, nv, ssq, pk, cl)) =
      AudioHeaders.parseFlacPcm(payload)
    assert((ch, rate, bw, nv) == ((1, 44100, 16, 2L)))
    assert(ssq == 800L && pk == 20 && cl == 0L)
  }

  test("hand-built FIXED order 1 with 1 wasted bit: recurrence in " +
    "the shifted-down domain") {
    // k = 1 (flag 1, unary "1"); coded base [5, 7] at 15 bits via
    // warm-up 5 + residual +2 (param 2: q=1 rem 00) → samples 10, 14
    val payload = head(1, 2) ++ bits(
      frameHdr(1, 2) +
        " 0 001001 1 1" + // FIXED order 1, wasted k=1
        " 000000000000101" + // warm-up 5 (15-bit)
        " 00 0000 0010" + // method 0 | partition order 0 | param 2
        " 01 00" + // residual +2 → zigzag 4: q=1, rem 00
        " 00" + // alignment padding (94 payload bits)
        " 00000000 00000000")
    val Some((_, _, _, nv, ssq, pk, _)) =
      AudioHeaders.parseFlacPcm(payload)
    assert(nv == 2L && ssq == 100L + 196L && pk == 14)
  }

  test("wasted count consuming the whole sample width fails closed") {
    // k = 16 on a 16-bit stream: no real width survives
    val payload = head(1, 1) ++ bits(
      frameHdr(1, 1) +
        " 0 000000 1 000000000000000 1" + // unary 15 zeros → k = 16
        " 0000000000000000" + // would-be value
        " 00000000" + // filler to byte alignment
        " 00000000 00000000")
    assert(AudioHeaders.parseFlacPcm(payload).isEmpty)
  }

  test("encoder/decoder/closed-form triangle over 240 documents") {
    for (d <- 0L until 240L) {
      val Some((ch, rate, bw, nv, ssq, pk, cl)) =
        AudioHeaders.parseFlacPcm(FlacFixture.streamWasted(d))
      val ns = FlacFixture.nsOf(d)
      val k = FlacFixture.wastedOf(d)
      val samples = for (c <- 0 until FlacFixture.chOf(d);
        i <- 0 until ns) yield FlacFixture.sample(d, c, i) << k
      assert(ch == FlacFixture.chOf(d) &&
        rate == FlacFixture.rateOf(d) && bw == 16)
      assert(nv == samples.size.toLong, s"nv d=$d")
      assert(ssq == samples.map(s => s * s).sum, s"ssq d=$d")
      assert(pk == samples.map(math.abs).max, s"pk d=$d")
      assert(cl == 0L)
    }
  }
}
