package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Stereo-decorrelation decode ([[AudioHeaders.parseFlacPcm]],
  * §9.1.3) pinned on HAND-ASSEMBLED bitstreams — side-channel
  * widths, the three assignment reconstructions, and the mid/side
  * parity trick verified independently of [[FlacFixture]]'s
  * encoder — plus the encoder/decoder/closed-form triangle and the
  * reserved-assignment boundary. */
class FlacStereoSpec extends AnyFunSuite {

  private def head(total: Int): Array[Byte] = {
    val b = new Array[Byte](42)
    b(0) = 'f'; b(1) = 'L'; b(2) = 'a'; b(3) = 'C'
    b(4) = 0x80.toByte; b(7) = 34
    b(18) = (44100 >> 12).toByte
    b(19) = ((44100 >> 4) & 0xff).toByte
    b(20) = (((44100 & 0xf) << 4) | ((2 - 1) << 1) | 0).toByte
    b(21) = 0xf0.toByte // bits-1 = 15
    b(25) = total.toByte
  b
  }

  private def bits(s: String): Array[Byte] = {
    val b = s.replaceAll("[^01]", "")
    assert(b.length % 8 == 0, s"${b.length} bits not byte-aligned")
    b.grouped(8).map(x => Integer.parseInt(x, 2).toByte).toArray
  }

  private def b16(v: Long) =
    (0 until 16).map(k => (v >> (15 - k)) & 1).mkString
  private def b17(v: Long) =
    (0 until 17).map(k => (v >> (16 - k)) & 1).mkString

  /** Frame header: sync, 8-bit blocksize code, rate/size from
    * STREAMINFO, channel ASSIGNMENT nibble, frame 0, zero CRC-8. */
  private def frameHdr(chAsgn: Int, ns: Int): String = {
    def b8(v: Int) = (0 until 8).map(k => (v >> (7 - k)) & 1).mkString
    "11111111 11111000 01100000 " + b8(chAsgn << 4) +
      " 00000000 " + b8(ns - 1) + " 00000000"
  }

  private def verbatim16(vs: Seq[Long]) =
    " 0 000001 0 " + vs.map(v => b16(v & 0xffffL)).mkString(" ")
  private def verbatim17(vs: Seq[Long]) =
    " 0 000001 0 " + vs.map(v => b17(v & 0x1ffffL)).mkString(" ")

  test("hand-built mid/side frame: parity-restored LSB, 17-bit side") {
    // l = [5, -3], r = [2, 4] → mid = [3, 0], side = [3, -7]
    val payload = head(2) ++ bits(
      frameHdr(10, 2) +
        verbatim16(Seq(3, 0)) + verbatim17(Seq(3, -7)) +
        " 000000" + // alignment padding (2·(8+6+1+1) + 2·16+2·17 bits)
        " 00000000 00000000")
    val Some((ch, rate, bw, nv, ssq, pk, cl)) =
      AudioHeaders.parseFlacPcm(payload)
    assert((ch, rate, bw, nv) == ((2, 44100, 16, 4L)))
    assert(ssq == 25L + 4 + 9 + 16 && pk == 5 && cl == 0L)
  }

  test("hand-built left/side frame: right = left - side") {
    // l = [7, -2], side = [3, -6] → r = [4, 4]
    val payload = head(2) ++ bits(
      frameHdr(8, 2) +
        verbatim16(Seq(7, -2)) + verbatim17(Seq(3, -6)) +
        " 000000 00000000 00000000")
    val Some((_, _, _, nv, ssq, pk, _)) =
      AudioHeaders.parseFlacPcm(payload)
    assert(nv == 4L && ssq == 49L + 16 + 4 + 16 && pk == 7)
  }

  test("hand-built side/right frame: left = right + side, side is " +
    "the FIRST subframe") {
    // side = [3, -6], r = [4, 4] → l = [7, -2]
    val payload = head(2) ++ bits(
      frameHdr(9, 2) +
        verbatim17(Seq(3, -6)) + verbatim16(Seq(4, 4)) +
        " 000000 00000000 00000000")
    val Some((_, _, _, nv, ssq, pk, _)) =
      AudioHeaders.parseFlacPcm(payload)
    assert(nv == 4L && ssq == 49L + 16 + 4 + 16 && pk == 7)
  }

  test("reserved channel assignment 11 fails closed") {
    val payload = head(2) ++ bits(
      frameHdr(11, 2) +
        verbatim16(Seq(1, 2)) + verbatim16(Seq(3, 4)) +
        " 00000000 00000000")
    assert(AudioHeaders.parseFlacPcm(payload).isEmpty)
  }

  test("decorrelated assignment on a mono stream fails closed") {
    val mono = head(2)
    mono(20) = (((44100 & 0xf) << 4) | ((1 - 1) << 1) | 0).toByte
    val payload = mono ++ bits(
      frameHdr(10, 2) +
        verbatim16(Seq(3, 0)) + verbatim17(Seq(3, -7)) +
        " 000000 00000000 00000000")
    assert(AudioHeaders.parseFlacPcm(payload).isEmpty)
  }

  test("encoder/decoder/closed-form triangle over 240 documents — " +
    "all three assignments") {
    for (d <- 0L until 240L) {
      val Some((ch, rate, bw, nv, ssq, pk, cl)) =
        AudioHeaders.parseFlacPcm(FlacFixture.streamStereo(d))
      val ns = FlacFixture.nsOf(d)
      val samples = for (c <- 0 to 1; i <- 0 until ns)
        yield FlacFixture.sample(d, c, i)
      assert(ch == 2 && rate == FlacFixture.rateOf(d) && bw == 16)
      assert(nv == samples.size.toLong, s"nv d=$d")
      assert(ssq == samples.map(s => s * s).sum, s"ssq d=$d")
      assert(pk == samples.map(math.abs).max, s"pk d=$d")
      assert(cl == 0L)
    }
  }
}
