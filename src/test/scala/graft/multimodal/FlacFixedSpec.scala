package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** FIXED-subframe Rice decode ([[AudioHeaders.parseFlacPcm]]) pinned
  * on HAND-ASSEMBLED bitstreams — codewords computed by hand, so the
  * decoder is verified independently of [[FlacFixture]]'s encoder —
  * plus escape partitions, multi-partition layouts, the
  * encoder/decoder/closed-form triangle, and the fail-closed LPC /
  * reserved-method boundary. */
class FlacFixedSpec extends AnyFunSuite {

  private def head(ch: Int, total: Int, rate: Int = 44100)
      : Array[Byte] = {
    val b = new Array[Byte](42)
    b(0) = 'f'; b(1) = 'L'; b(2) = 'a'; b(3) = 'C'
    b(4) = 0x80.toByte; b(7) = 34
    b(18) = (rate >> 12).toByte
    b(19) = ((rate >> 4) & 0xff).toByte
    b(20) = (((rate & 0xf) << 4) | ((ch - 1) << 1) | 0).toByte
    b(21) = 0xf0.toByte // bits-1 = 15
    b(22) = (total >> 24).toByte; b(23) = ((total >> 16) & 0xff).toByte
    b(24) = ((total >> 8) & 0xff).toByte; b(25) = (total & 0xff).toByte
    b
  }

  /** "0100 1010 ..." (whitespace ignored) → bytes; must be
    * byte-aligned. */
  private def bits(s: String): Array[Byte] = {
    val b = s.replaceAll("[^01]", "")
    assert(b.length % 8 == 0, s"${b.length} bits not byte-aligned")
    b.grouped(8).map(x => Integer.parseInt(x, 2).toByte).toArray
  }

  /** Frame header: sync+fixed, 8-bit blocksize, geometry from
    * STREAMINFO, frame 0, zero CRC-8. */
  private def frameHdr(ch: Int, ns: Int): String = {
    def b8(v: Int) = (0 until 8).map(k => (v >> (7 - k)) & 1).mkString
    "11111111 11111000 01100000 " + b8((ch - 1) << 4) +
      " 00000000 " + b8(ns - 1) + " 00000000"
  }

  test("hand-built order-1 Rice subframe: warm-up, quotient/" +
    "remainder, zigzag, reconstruction") {
    // samples [5, 7, 6]: order-1 residuals [2, -1]; zigzag [4, 1];
    // param 2 → codes (q=1,rem=00) and (q=0,rem=01)
    val payload = head(1, 3) ++ bits(
      frameHdr(1, 3) +
        " 0 001001 0" + // pad | FIXED order 1 | no wasted bits
        " 00000000 00000101" + // warm-up 5 (16-bit)
        " 00 0000 0010" + // method 0 | partition order 0 | param 2
        " 01 00" + // residual +2 → zigzag 4: unary q=1, rem 00
        " 1 01" + // residual -1 → zigzag 1: unary q=0, rem 01
        " 0000000" + // zero alignment padding
        " 00000000 00000000") // CRC-16
    val Some((ch, rate, bitsW, nv, ssq, pk, cl)) =
      AudioHeaders.parseFlacPcm(payload)
    assert((ch, rate, bitsW, nv) == ((1, 44100, 16, 3L)))
    assert(ssq == 25L + 49 + 36 && pk == 7 && cl == 0L)
  }

  test("escape partition: raw-binary residuals at declared width") {
    // order 0, blocksize 2, param 1111 = escape, 3-bit raw: 2, -3
    val payload = head(1, 2) ++ bits(
      frameHdr(1, 2) +
        " 0 001000 0" + // FIXED order 0
        " 00 0000 1111" + // method 0 | p=0 | ESCAPE
        " 00011" + // raw width 3
        " 010 101" + // +2, -3 (two's complement)
        " 000" + // padding
        " 00000000 00000000")
    val Some((_, _, _, nv, ssq, pk, _)) =
      AudioHeaders.parseFlacPcm(payload)
    assert(nv == 2L && ssq == 4L + 9 && pk == 3)
  }

  test("two Rice partitions: partition 0 is order samples short") {
    // order 1, blocksize 4, p=1 → partition 0 has 1 residual,
    // partition 1 has 2. samples [10,11,13,12] → residuals [1,2,-1]
    // zigzag [2,4,1], params 1/1
    val payload = head(1, 4) ++ bits(
      frameHdr(1, 4) +
        " 0 001001 0" +
        " 00000000 00001010" + // warm-up 10
        " 00 0001" + // method 0 | partition order 1
        " 0001 01 0" + // part 0: param 1; +1 → zz 2: q=1, rem 0
        " 0001 001 0 1 1" + // part 1: +2 → zz 4: q=2 rem 0; -1 → zz 1: q=0 rem 1
        " 0" + // padding
        " 00000000 00000000")
    val Some((_, _, _, nv, ssq, pk, _)) =
      AudioHeaders.parseFlacPcm(payload)
    assert(nv == 4L && ssq == 100L + 121 + 169 + 144 && pk == 13)
  }

  test("fail-closed: reserved subframe type and reserved residual " +
    "method") {
    // type 000010 is reserved (§9.2: 2–7 unused) — LPC (1xxxxx) is
    // now a DECODED class, pinned in FlacLpcSpec
    val reservedType = head(1, 1) ++ bits(
      frameHdr(1, 1) + " 0 000010 0" + " 00000000 00000101" +
        " 0000000" + " 0" + " 00000000 00000000")
    assert(AudioHeaders.parseFlacPcm(reservedType).isEmpty)
    // reserved residual method 10 — rejected at the method read
    val reserved = head(1, 2) ++ bits(
      frameHdr(1, 2) +
        " 0 001000 0" + " 10" + " 000000" +
        " 00000000 00000000")
    assert(AudioHeaders.parseFlacPcm(reserved).isEmpty)
  }

  test("encoder/decoder/closed-form triangle: FlacFixture streams " +
    "decode to the formula meter for every order") {
    for (docId <- 0L to 24L) { // covers all 5 orders × both ch
      val (ch, ns) = (FlacFixture.chOf(docId), FlacFixture.nsOf(docId))
      val expected = for {
        c <- 0 until ch; i <- 0 until ns
      } yield FlacFixture.sample(docId, c, i)
      val Some((gch, grate, _, nv, ssq, pk, cl)) =
        AudioHeaders.parseFlacPcm(FlacFixture.stream(docId))
      assert(gch == ch && grate == FlacFixture.rateOf(docId))
      assert(nv == expected.size.toLong, s"doc $docId")
      assert(ssq == expected.map(v => v * v).sum, s"doc $docId")
      assert(pk == expected.max && cl == 0L, s"doc $docId")
    }
  }
}
