package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The FLAC uncoded-subframe decoder
  * ([[AudioHeaders.parseFlacPcm]]) on hand-assembled streams: sign
  * extension, CONSTANT block expansion, VERBATIM order, multi-frame
  * walks, and the fail-closed boundary (entropy-coded subframe
  * types, wasted bits, nonzero alignment padding, truncation). */
class FlacPcmSpec extends AnyFunSuite {

  /** STREAMINFO head for 16-bit, `ch` channels, `total` samples,
    * rate 44100, is-last set. */
  private def head(ch: Int, total: Int): Array[Byte] = {
    val b = new Array[Byte](42)
    b(0) = 'f'; b(1) = 'L'; b(2) = 'a'; b(3) = 'C'
    b(4) = 0x80.toByte // is-last | STREAMINFO
    b(7) = 34 // u24 length
    // bytes 18..25: rate(20) ch-1(3) bits-1(5) total(36)
    val rate = 44100
    b(18) = (rate >> 12).toByte
    b(19) = ((rate >> 4) & 0xff).toByte
    b(20) = (((rate & 0xf) << 4) | ((ch - 1) << 1) |
      ((16 - 1) >> 4)).toByte
    b(21) = ((((16 - 1) & 0xf) << 4) | 0).toByte
    b(22) = (total >> 24).toByte; b(23) = ((total >> 16) & 0xff).toByte
    b(24) = ((total >> 8) & 0xff).toByte; b(25) = (total & 0xff).toByte
    b
  }

  /** Frame: fixed blocking, 8-bit inline blocksize, geometry from
    * STREAMINFO, frame number 0, zero CRCs; `subs` are pre-packed
    * subframe byte runs (16-bit samples keep everything aligned). */
  private def frame(ch: Int, ns: Int, subs: Array[Byte]): Array[Byte] =
    Array[Byte](0xff.toByte, 0xf8.toByte, 0x60,
      ((ch - 1) << 4).toByte, 0, (ns - 1).toByte, 0) ++
      subs ++ Array[Byte](0, 0)

  private def verbatim(samples: Int*): Array[Byte] =
    Array[Byte](0x02) ++ samples.flatMap(s =>
      Seq(((s >> 8) & 0xff).toByte, (s & 0xff).toByte))

  private def constant(s: Int): Array[Byte] =
    Array[Byte](0x00, ((s >> 8) & 0xff).toByte, (s & 0xff).toByte)

  test("VERBATIM + CONSTANT: values, sign extension, block " +
    "expansion, meter") {
    // ch0 verbatim: 1, -2 (0xFFFE), 32767; ch1 constant -32768 × 3
    val b = head(2, 3) ++ frame(2, 3,
      verbatim(1, 0xfffe, 32767) ++ constant(0x8000))
    val Some((ch, rate, bits, nv, ssq, pk, cl)) =
      AudioHeaders.parseFlacPcm(b)
    assert((ch, rate, bits, nv) == ((2, 44100, 16, 6L)))
    // 1 + 4 + 32767² + 3 × 32768²
    assert(ssq == 1L + 4L + 32767L * 32767 + 3L * 32768L * 32768)
    assert(pk == 32768 && cl == 4L) // 32767 once, -32768 thrice
  }

  test("two frames accumulate to the STREAMINFO total") {
    val b = head(1, 4) ++ frame(1, 2, verbatim(10, 20)) ++
      frame(1, 2, verbatim(30, 40))
    val Some((_, _, _, nv, ssq, _, _)) = AudioHeaders.parseFlacPcm(b)
    assert(nv == 4L && ssq == 100L + 400 + 900 + 1600)
  }

  test("fail-closed: truncated LPC subframe, wasted bits, short " +
    "payload, total mismatch, bad sync") {
    // LPC order-1 subframe type (0b100000 -> header byte 0x40) now
    // DECODES (FlacLpcSpec) — this 3-byte stub truncates inside the
    // coefficient/residual walk and must still reject
    val lpcSub = Array[Byte](0x40, 0, 1)
    assert(AudioHeaders.parseFlacPcm(
      head(1, 1) ++ frame(1, 1, lpcSub)).isEmpty)
    // wasted-bits flag set (header byte 0x03 = VERBATIM | wasted)
    val wasted = Array[Byte](0x03, 0, 1)
    assert(AudioHeaders.parseFlacPcm(
      head(1, 1) ++ frame(1, 1, wasted)).isEmpty)
    // truncated mid-samples
    val whole = head(1, 2) ++ frame(1, 2, verbatim(1, 2))
    assert(AudioHeaders.parseFlacPcm(whole.dropRight(4)).isEmpty)
    // frame covers 2 but STREAMINFO declares 3
    assert(AudioHeaders.parseFlacPcm(
      head(1, 3) ++ frame(1, 2, verbatim(1, 2))).isEmpty)
    // sync code broken
    val bad = head(1, 1) ++ frame(1, 1, verbatim(5))
    bad(42) = 0x7f
    assert(AudioHeaders.parseFlacPcm(bad).isEmpty)
  }
}
