package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Layer-III side-info + scalefactor decode
  * ([[Mp3Headers.sideInfo]]) pinned on HAND-ASSEMBLED bitstreams —
  * field widths, branch layout, scfsi copy semantics, and the
  * part2_3_length skip verified independently of
  * [[Mp3SideFixture]]'s writer — plus the writer/parser/closed-form
  * triangle and the fail-closed boundaries. */
class Mp3SideInfoSpec extends AnyFunSuite {

  /** "0100 1010 ..." (whitespace ignored) → bytes, zero-padded to a
    * byte boundary. */
  private def bits(s: String): Array[Byte] = {
    val raw = s.replaceAll("[^01]", "")
    val b = raw + "0" * ((8 - raw.length % 8) % 8)
    b.grouped(8).map(x => Integer.parseInt(x, 2).toByte).toArray
  }

  /** Mono 128 kbps @ 48 kHz frame (384 bytes): header + the given
    * bit payload, zero-padded to frame length. */
  private def monoFrame(payload: String): Array[Byte] = {
    val body = bits(payload)
    val frame = new Array[Byte](384)
    frame(0) = 0xff.toByte; frame(1) = 0xfb.toByte
    frame(2) = 0x94.toByte // brIdx 9 (128 kbps), srIdx 1 (48 kHz)
    frame(3) = 0xc4.toByte // mono, original
    System.arraycopy(body, 0, frame, 4, body.length)
    frame
  }

  // granule-0 block shared by the hand cases: sfc 5 (slen 1/1),
  // part2 = 21 bits, filler 3 → p23 = 24
  private val g0Side =
    "000000011000" + // part2_3_length 24
      " 001100100" + // big_values 100
      " 11001000" + // global_gain 200
      " 0101 0" + // scalefac_compress 5 | long block
      " 00001 00010 00011" + // table selects 1, 2, 3
      " 0111 101" + // region0 7, region1 5
      " 1 0 1" // preflag, scalefac_scale, count1table_select
  // 21 one-bit scalefactors: bands 0–10 sum 7, bands 11–20 sum 5
  private val g0Sf = "10110101101 1001101001" + " 000" // + filler

  test("hand-built long/long frame: scfsi copy groups, slen tables," +
    " part2 skip") {
    // granule 1: sfc 8 (slen 2/1), scfsi 0101 → groups 1 and 3
    // copied from granule 0; part2 = 6·2 + 5·1 = 17, filler 2 → 19
    val side =
      "000000000" + // main_data_begin 0
        " 00000" + // private bits
        " 0101" + // scfsi
        g0Side +
        " 000000010011" + // p23 19
        " 000110010" + // big_values 50
        " 01100100" + // global_gain 100
        " 1000 0" + // sfc 8 | long
        " 00100 00101 00110" + // table selects 4, 5, 6
        " 0010 011" + // region0 2, region1 3
        " 0 1 0"
    val main = g0Sf +
      " 11 01 00 10 01 11" + // g1 group 0: 3,1,0,2,1,3 (slen 2)
      " 10110" + // g1 group 2: 1,0,1,1,0 (slen 1)
      " 00" // filler
    val Some(m) = Mp3Headers.sideInfo(monoFrame(side + main))
    assert(m.mainDataBegin == 0 && m.channels == 1)
    assert(m.scfsiMask == 5)
    assert(m.p23Sum == 43L && m.bigvSum == 150L && m.gainMax == 200)
    assert(m.bt1 == 0 && m.mixed1 == 0)
    assert(m.tselSum == 21L)
    assert(m.regSum == (7 * 8 + 5) + (2 * 8 + 3))
    assert(m.sbgSum == 0L && m.flagsSum == 7L)
    assert(m.part2Bits == 21L + 17L)
    // g0 sum 12; g1 = 10 (group 0) + 3 (copied bands 6–10)
    //   + 3 (group 2) + 2 (copied bands 16–20) = 18
    assert(m.sfSum == 30L && m.sfN == 42L)
  }

  test("hand-built short-block granule 1: 36-slot layout, subblock " +
    "gains, zero-width slen2") {
    // granule 1: wsf, block type 2, not mixed, sfc 4 → slen 3/0;
    // part2 = 18·3 = 54, filler 1 → p23 = 55; scfsi must be 0
    val side =
      "000000000 00000 0000" +
        g0Side +
        " 000000110111" + // p23 55
        " 000110010 01100100" + // big_values 50, gain 100
        " 0100 1" + // sfc 4 | window switching
        " 10 0" + // block type 2, not mixed
        " 01001 10001" + // table selects 9, 17
        " 111 000 101" + // subblock gains 7, 0, 5
        " 0 1 0"
    val g1Sf = (Seq(1, 2, 3, 4, 5, 6, 7, 0, 1, 2, 3, 4, 5, 6, 7, 0,
      1, 2).map(v => ("00" + v.toBinaryString).takeRight(3))
      .mkString(" ")) + " 0" // 18 slen-3 values + filler
    val Some(m) = Mp3Headers.sideInfo(monoFrame(side + g0Sf +
      " " + g1Sf))
    assert(m.bt1 == 2 && m.mixed1 == 0 && m.scfsiMask == 0)
    assert(m.sbgSum == 12L && m.tselSum == 6L + 9 + 17)
    assert(m.part2Bits == 21L + 54L)
    assert(m.sfSum == 12L + 59L && m.sfN == 21L + 36L)
  }

  test("part2_3_length below the transmitted scalefactor bits fails" +
    " closed") {
    // g0 p23 = 20 < part2 = 21 → the skip would be negative
    val side = "000000000 00000 0000" +
      "000000010100 001100100 11001000 0101 0" +
      " 00001 00010 00011 0111 101 1 0 1" +
      // granule 1 mirrors granule 0 (p23 24, valid)
      "000000011000 001100100 11001000 0101 0" +
      " 00001 00010 00011 0111 101 1 0 1"
    assert(Mp3Headers.sideInfo(monoFrame(side + g0Sf + " " + g0Sf))
      .isEmpty)
  }

  test("window switching with block type 0 fails closed") {
    val side = "000000000 00000 0000" + g0Side +
      "000000011000 001100100 11001000 0101 1" +
      " 00 0" + // block type 0: forbidden
      " 00001 00010 111 000 101 1 0 1"
    assert(Mp3Headers.sideInfo(monoFrame(side)).isEmpty)
  }

  test("set scfsi with a short-block granule 1 fails closed") {
    val side = "000000000 00000 1000" + g0Side +
      "000000110111 000110010 01100100 0100 1" +
      " 10 0 01001 10001 111 000 101 0 1 0"
    assert(Mp3Headers.sideInfo(monoFrame(side)).isEmpty)
  }

  test("truncated stream and non-MP3 bytes fail closed") {
    assert(Mp3Headers.sideInfo(null).isEmpty)
    assert(Mp3Headers.sideInfo(Array.fill[Byte](10)(0x41)).isEmpty)
    assert(Mp3Headers.sideInfo(
      monoFrame("000000000").take(12)).isEmpty)
  }

  test("nonzero main_data_begin reports -1 scalefactor fields, real" +
    " side-info fields") {
    // doc 14: divisible by 7 → mdb ≠ 0; even → stereo
    val Some(m) = Mp3Headers.sideInfo(Mp3SideFixture.stream(14))
    assert(m.mainDataBegin == Mp3SideFixture.mdbOf(14) &&
      m.mainDataBegin != 0)
    assert(m.channels == 2)
    assert(m.part2Bits == -1L && m.sfSum == -1L && m.sfN == -1L)
    assert(m.bigvSum == (0 to 1).flatMap(g => (0 to 1).map(c =>
      Mp3SideFixture.bigvOf(14, g, c).toLong)).sum)
  }

  // count1 hand case: big_values 0, count1table_select 1, mdb 0;
  // granule 0 sfc 5 (part2 21), granule 1 sfc 8 with scfsi 0000
  // (part2 11·2 + 10·1 = 32)
  private def count1Side(p23g0: Int, p23g1: Int) = {
    def b12(v: Int) = (0 until 12).map(k => (v >> (11 - k)) & 1).mkString
    "000000000 00000 0000" +
      b12(p23g0) + " 000000000 11001000 0101 0" +
      " 00001 00010 00011 0111 101 1 0 1" +
      b12(p23g1) + " 000000000 01100100 1000 0" +
      " 00100 00101 00110 0010 011 0 1 1"
  }
  private val g1Sf32 =
    "01 10 11 00 01 10 11 00 01 10 11" + " 1011 0100 11" // 22 + 10 bits

  test("hand-built count1 region: complement codes, sign bits, " +
    "exact part2_3 boundary") {
    // g0: quadruple 1010 (code 0101, signs 1,0) + 0000 (code 1111,
    // no signs) = 10 bits → p23 = 31; g1: quadruple 1111 (code 0000,
    // signs 1,1,0,1) = 8 bits → p23 = 40
    val main = "10110101101 1001101001" + " 0101 1 0 1111 " +
      g1Sf32 + " 0000 1101"
    val Some((nq, nz, nn, sv)) =
      Mp3Headers.count1Info(monoFrame(count1Side(31, 40) + main))
    assert(nq == 3L && nz == 6L && nn == 4L && sv == -2L)
  }

  test("count1 region ending mid-quadruple fails closed") {
    // p23 g0 = part2 + 3: three stray bits cannot hold a codeword
    val main = "10110101101 1001101001" + " 000 " + g1Sf32 + " 1111"
    assert(Mp3Headers.count1Info(
      monoFrame(count1Side(24, 36) + main)).isEmpty)
  }

  test("count1 quadruple whose sign bit falls past the region " +
    "fails closed") {
    // code 0101 → pattern 1010 needs two sign bits; region ends
    // right after the codeword
    val main = "10110101101 1001101001" + " 0101 " + g1Sf32 + " 1111"
    assert(Mp3Headers.count1Info(
      monoFrame(count1Side(25, 36) + main)).isEmpty)
  }

  test("count1 TABLE A decodes: the same region bits reinterpreted " +
    "under select 0 walk the 1-6-bit tree (and a mis-sized region " +
    "fails closed); nonzero big_values and a reservoir reject") {
    // flip count1table_select of granule 0 to 0 and size p23 for
    // the TABLE-A widths: quadruples 1010 ("00110" + 2 signs = 7
    // bits) and 0000 ("1", no signs) → part2 21 + 8 = 29; granule 1
    // quadruple 1111 ("000001" + 4 signs = 10 bits) → 32 + 10 = 42
    val sideA = "000000000 00000 0000" +
      "000000011101 000000000 11001000 0101 0" +
      " 00001 00010 00011 0111 101 1 0 0" + // c1t = 0: table A
      "000000101010 000000000 01100100 1000 0" +
      " 00100 00101 00110 0010 011 0 1 0"
    val mainA = "10110101101 1001101001" + " 00110 1 0 1 " +
      g1Sf32 + " 000001 1101"
    val Some((nq, nz, nn, sv)) =
      Mp3Headers.count1Info(monoFrame(sideA + mainA))
    assert(nq == 3L && nz == 6L && nn == 4L && sv == -2L)
    // one stray bit desynchronizes the tree walk → fail closed
    val sideABad = "000000000 00000 0000" +
      "000000011110 000000000 11001000 0101 0" +
      " 00001 00010 00011 0111 101 1 0 0" +
      "000000101010 000000000 01100100 1000 0" +
      " 00100 00101 00110 0010 011 0 1 0"
    assert(Mp3Headers.count1Info(
      monoFrame(sideABad + mainA)).isEmpty)
    // nonzero big_values: the variable-length region precedes count1
    val mainT1 = "10110101101 1001101001" + " 0101 1 0 1111 " +
      g1Sf32 + " 0000 1101"
    val sideBv = "000000000 00000 0000" +
      "000000011111 000000001 11001000 0101 0" +
      " 00001 00010 00011 0111 101 1 0 1" +
      "000000101000 000000000 01100100 1000 0" +
      " 00100 00101 00110 0010 011 0 1 1"
    assert(Mp3Headers.count1Info(monoFrame(sideBv + mainT1)).isEmpty)
    // nonzero main_data_begin: the region lives in prior frames
    val sideMdb = "000000001" + count1Side(31, 40).drop(9)
    assert(Mp3Headers.count1Info(monoFrame(sideMdb + mainT1)).isEmpty)
  }

  test("count1 writer/parser/closed-form triangle over 240 documents") {
    for (d <- 0L until 240L) {
      val Some((nq, nz, nn, sv)) =
        Mp3Headers.count1Info(Mp3SideFixture.streamCount1(d))
      val nch = Mp3SideFixture.nchOf(d)
      val gcs = for (g <- 0 to 1; c <- 0 until nch) yield (g, c)
      assert(nq == gcs.map { case (g, c) =>
        Mp3SideFixture.nqOf(d, g, c).toLong }.sum, s"nq d=$d")
      val quads = gcs.flatMap { case (g, c) =>
        (0 until Mp3SideFixture.nqOf(d, g, c)).map(q => (g, c, q)) }
      val vals = quads.flatMap { case (g, c, q) =>
        val pat = Mp3SideFixture.patOf(d, g, c, q)
        (0 to 3).collect {
          case k if ((pat >> (3 - k)) & 1) == 1 =>
            if (Mp3SideFixture.signOf(d, q, k) == 1) -1L else 1L
        }
      }
      assert(nz == vals.size.toLong, s"nz d=$d")
      assert(nn == vals.count(_ == -1L).toLong, s"nn d=$d")
      assert(sv == vals.sum, s"sv d=$d")
    }
  }

  test("count1 TABLE-A writer/parser/closed-form triangle over 240 " +
    "documents — census identical to the table-1 lane") {
    for (d <- 0L until 240L) {
      val a = Mp3Headers.count1Info(Mp3SideFixture.streamCount1A(d))
      val b = Mp3Headers.count1Info(Mp3SideFixture.streamCount1(d))
      assert(a.isDefined && a == b,
        s"table-A census diverged from table-1 for d=$d: $a vs $b")
    }
  }

  // big-values hand case (mono, 48 kHz): mdb 0, granule 0 long with
  // sfc 5 (part2 21), big_values 6, region counts 0/0 → boundaries
  // at pairs 2 and 4 (B.8 bands 4 and 8), tables 1/2/3 per region;
  // granule 1 long, sfc 8, big_values 0
  private def bvSide(p23g0: Int, bigv0: Int, tsel0: String) = {
    def b12(v: Int) = (0 until 12).map(k => (v >> (11 - k)) & 1).mkString
    def b9(v: Int) = (0 until 9).map(k => (v >> (8 - k)) & 1).mkString
    "000000000 00000 0000" +
      b12(p23g0) + " " + b9(bigv0) + " 11001000 0101 0 " +
      tsel0 + " 00010 00011 0000 000 1 0 1" +
      b12(32) + " 000000000 01100100 1000 0" +
      " 00100 00101 00110 0010 011 0 1 1"
  }
  // pairs: (1,0)-,(0,1)+ @t1; (2,1)+-,(0,0) @t2; (1,1)--,(2,2)++ @t3
  private val bvMain27 =
    "011 0010 0001001 1 0111 00000000"

  test("hand-built big-values region: per-region B.7 tables, region " +
    "boundaries at B.8 band edges, sign bits, exact exhaustion") {
    val main = "10110101101 1001101001 " + bvMain27 + " " + g1Sf32
    val Some((nr, np, nz, nn, sv)) = Mp3Headers.bigvaluesInfo(
      monoFrame(bvSide(48, 6, "00001") + main))
    assert(nr == 2L && np == 6L && nz == 8L && nn == 4L && sv == 3L)
  }

  test("big-values fails closed: unverified table select, inexact " +
    "region exhaustion, reservoir") {
    val main = "10110101101 1001101001 " + bvMain27 + " " + g1Sf32
    // region 0 coded with table 4 — outside the verified set
    assert(Mp3Headers.bigvaluesInfo(
      monoFrame(bvSide(48, 6, "00100") + main)).isEmpty)
    // one stray bit between the last pair and part2_3's end
    assert(Mp3Headers.bigvaluesInfo(
      monoFrame(bvSide(49, 6, "00001") + main)).isEmpty)
    // nonzero main_data_begin
    val sideMdb = "000000001" + bvSide(48, 6, "00001").drop(9)
    assert(Mp3Headers.bigvaluesInfo(monoFrame(sideMdb + main)).isEmpty)
  }

  test("B.7 table transcriptions are Kraft-complete and prefix-free " +
    "(construction self-check ran at class load)") {
    assert(Mp3Headers.BvTables.keySet == Set(1, 2, 3, 5))
    // decode really distinguishes x from y (asymmetric tables)
    assert(Mp3Headers.BvTables(2).dim == 3)
  }

  test("big-values writer/parser/closed-form triangle over 240 " +
    "documents") {
    for (d <- 0L until 240L) {
      val Some((nr, np, nz, nn, sv)) =
        Mp3Headers.bigvaluesInfo(Mp3SideFixture.streamBigvalues(d))
      val nch = Mp3SideFixture.nchOf(d)
      val gcs = for (g <- 0 to 1; c <- 0 until nch) yield (g, c)
      assert(nr == 2L * nch, s"nr d=$d")
      assert(np == gcs.map { case (g, c) =>
        Mp3SideFixture.npOf(d, g, c).toLong }.sum, s"np d=$d")
      val vals = gcs.flatMap { case (g, c) =>
        (0 until Mp3SideFixture.npOf(d, g, c)).flatMap { i =>
          val x = Mp3SideFixture.bvXOf(d, g, c, i)
          val y = Mp3SideFixture.bvYOf(d, g, c, i)
          Seq(
            if (x == 0) 0L
            else if (Mp3SideFixture.bvSxOf(d, g, c, i) == 1) -x.toLong
            else x.toLong,
            if (y == 0) 0L
            else if (Mp3SideFixture.bvSyOf(d, g, c, i) == 1) -y.toLong
            else y.toLong).filter(_ != 0L)
        }
      }
      assert(nz == vals.size.toLong, s"nz d=$d")
      assert(nn == vals.count(_ < 0).toLong, s"nn d=$d")
      assert(sv == vals.sum, s"sv d=$d")
    }
  }

  test("part3 combined-region triangle over 240 documents: the " +
    "big-values census + count1 census of the SAME frame, region " +
    "boundary implicit in codeword widths") {
    for (d <- 0L until 240L) {
      val Some((nr, np, nq, nz, nn, sv)) =
        Mp3Headers.part3Info(Mp3SideFixture.streamPart3(d))
      val nch = Mp3SideFixture.nchOf(d)
      val gcs = for (g <- 0 to 1; c <- 0 until nch) yield (g, c)
      assert(nr == 2L * nch, s"nr d=$d")
      assert(np == gcs.map { case (g, c) =>
        Mp3SideFixture.np3Of(d, g, c).toLong }.sum, s"np d=$d")
      assert(nq == gcs.map { case (g, c) =>
        Mp3SideFixture.nq3Of(d, g, c).toLong }.sum, s"nq d=$d")
      val bvVals = gcs.flatMap { case (g, c) =>
        (0 until Mp3SideFixture.np3Of(d, g, c)).flatMap { i =>
          val x = Mp3SideFixture.bvXOf(d, g, c, i)
          val y = Mp3SideFixture.bvYOf(d, g, c, i)
          Seq(
            if (x == 0) 0L
            else if (Mp3SideFixture.bvSxOf(d, g, c, i) == 1) -x.toLong
            else x.toLong,
            if (y == 0) 0L
            else if (Mp3SideFixture.bvSyOf(d, g, c, i) == 1) -y.toLong
            else y.toLong).filter(_ != 0L)
        }
      }
      val c1Vals = gcs.flatMap { case (g, c) =>
        (0 until Mp3SideFixture.nq3Of(d, g, c)).flatMap { q =>
          val pat = Mp3SideFixture.patOf(d, g, c, q)
          (0 to 3).collect {
            case k if ((pat >> (3 - k)) & 1) == 1 =>
              if (Mp3SideFixture.signOf(d, q, k) == 1) -1L else 1L
          }
        }
      }
      val vals = bvVals ++ c1Vals
      assert(nz == vals.size.toLong, s"nz d=$d")
      assert(nn == vals.count(_ < 0).toLong, s"nn d=$d")
      assert(sv == vals.sum, s"sv d=$d")
    }
  }

  test("writer/parser/closed-form triangle over 240 documents") {
    for (d <- 0L until 240L) {
      val Some(m) = Mp3Headers.sideInfo(Mp3SideFixture.stream(d))
      val nch = Mp3SideFixture.nchOf(d)
      val gcs = for (g <- 0 to 1; c <- 0 until nch) yield (g, c)
      assert(m.mainDataBegin == Mp3SideFixture.mdbOf(d), s"mdb d=$d")
      assert(m.channels == nch)
      assert(m.scfsiMask == (0 until nch).map(c =>
        Mp3SideFixture.scfsiOf(d, c) << (4 * c)).sum, s"scfsi d=$d")
      assert(m.p23Sum == gcs.map { case (g, c) =>
        Mp3SideFixture.p23Of(d, g, c).toLong }.sum, s"p23 d=$d")
      assert(m.bigvSum == gcs.map { case (g, c) =>
        Mp3SideFixture.bigvOf(d, g, c).toLong }.sum)
      assert(m.gainMax == gcs.map { case (g, c) =>
        Mp3SideFixture.gainOf(d, g, c) }.max)
      val wsf1 = Mp3SideFixture.wsfOf(d, 1)
      assert(m.bt1 == (if (wsf1 == 1) Mp3SideFixture.btOf(d) else 0))
      assert(m.mixed1 ==
        (if (wsf1 == 1) Mp3SideFixture.mixedOf(d) else 0))
      assert(m.flagsSum == gcs.map { case (g, c) =>
        Mp3SideFixture.preOf(d, g, c) * 4L +
          Mp3SideFixture.sfsOf(d, g, c) * 2 +
          Mp3SideFixture.c1tOf(d, g, c) }.sum)
      if (Mp3SideFixture.mdbOf(d) == 0)
        assert(m.part2Bits == gcs.map { case (g, c) =>
          Mp3SideFixture.part2BitsOf(d, g, c).toLong }.sum,
          s"part2 d=$d")
      else assert(m.part2Bits == -1L && m.sfSum == -1L)
    }
  }
}
