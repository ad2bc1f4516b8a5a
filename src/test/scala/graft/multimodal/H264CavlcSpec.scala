package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Chroma-DC CAVLC residual decode ([[H264Cavlc.decode]]): the
  * writer/parser/closed-form triangle, the table transcriptions'
  * structural self-checks, and the fail-closed boundaries against
  * the PCM lane's streams. */
class H264CavlcSpec extends AnyFunSuite {

  test("table transcriptions are Kraft-complete and prefix-free " +
    "(construction self-check ran at class load)") {
    assert(H264Cavlc.ChromaDcCoeffToken.code.length == 14)
    assert(H264Cavlc.TotalZerosChromaDc.keySet == Set(1, 2, 3))
    assert(H264Cavlc.RunBefore.keySet == (1 to 7).toSet)
  }

  test("writer/parser/closed-form triangle over 240 documents") {
    for (d <- 0L until 240L) {
      val Some((nMbs, nCoeffs, nT1, nNeg, sumLevels, sumTz)) =
        H264Cavlc.decode(H264Fixture.annexBCavlc(d))
      val mbs = H264Fixture.cavlcMbs(d)
      assert(nMbs == mbs.toLong, s"n_mbs d=$d")
      val blocks = for (mb <- 0 until mbs; u <- 0 to 1) yield (mb, u)
      assert(nCoeffs == blocks.map { case (mb, u) =>
        H264Fixture.cavlcTc(d, mb, u).toLong }.sum, s"n_coeffs d=$d")
      assert(nT1 == blocks.map { case (mb, u) =>
        H264Fixture.cavlcT1(d, mb, u).toLong }.sum, s"n_t1 d=$d")
      assert(sumTz == blocks.map { case (mb, u) =>
        H264Fixture.cavlcTz(d, mb, u).toLong }.sum, s"sum_tz d=$d")
      val vals = blocks.flatMap { case (mb, u) =>
        val t1 = H264Fixture.cavlcT1(d, mb, u)
        val nt = H264Fixture.cavlcTc(d, mb, u) - t1
        (0 until t1).map(j =>
          if (H264Fixture.cavlcTrailSign(d, mb, u, j) == 1) -1L
          else 1L) ++
          (0 until nt).map { j =>
            val a = H264Fixture.cavlcLevelAbs(d, mb, u, j).toLong
            if (H264Fixture.cavlcLevelNeg(d, mb, u, j) == 1) -a else a
          }
      }
      assert(nNeg == vals.count(_ < 0).toLong, s"n_neg d=$d")
      assert(sumLevels == vals.sum, s"sum_levels d=$d")
    }
  }

  test("luma tables load their construction self-checks: the full " +
    "62-entry 0<=nC<2 coeff_token column (2 declared unused 16-bit " +
    "leaves), total_zeros 1..15, run_before 1..6 plus the >6 column") {
    assert(H264Cavlc.LumaCoeffToken01.code.length == 62)
    assert(H264Cavlc.TotalZeros4x4.keySet == (1 to 15).toSet)
    assert(H264Cavlc.RunBefore.keySet == (1 to 7).toSet)
    // every (tc, t1) pair of the column is present exactly once
    val pairs = (0 until 62).map(e =>
      (H264Cavlc.LumaCoeffToken01.xs(e), H264Cavlc.LumaCoeffToken01.ys(e)))
    val expect = for (tc <- 0 to 16; t1 <- 0 to math.min(3, tc))
      yield (tc, t1)
    assert(pairs.sorted == expect.sorted)
    // total_zeros column tc has entries 0..16-tc
    for (tc <- 1 to 15)
      assert(H264Cavlc.TotalZeros4x4(tc).xs.sorted.toSeq ==
        (0 to 16 - tc), s"tc=$tc")
  }

  test("luma writer/parser/closed-form triangle over 240 documents " +
    "(full coeff_token column, level escapes, 4x4 total_zeros, " +
    "full run_before)") {
    for (d <- 0L until 240L) {
      val Some((nMbs, nCoeffs, nT1, nNeg, sumLevels, sumTz)) =
        H264Cavlc.decodeLuma(H264Fixture.annexBCavlcLuma(d))
      val mbs = H264Fixture.lumaMbs(d)
      assert(nMbs == mbs.toLong, s"n_mbs d=$d")
      val blocks = (0 until mbs).toSeq
      assert(nCoeffs == blocks.map(mb =>
        H264Fixture.lumaTc(d, mb).toLong).sum, s"n_coeffs d=$d")
      assert(nT1 == blocks.map(mb =>
        H264Fixture.lumaT1(d, mb).toLong).sum, s"n_t1 d=$d")
      assert(sumTz == blocks.map(mb =>
        H264Fixture.lumaTz(d, mb).toLong).sum, s"sum_tz d=$d")
      val vals = blocks.flatMap { mb =>
        val t1 = H264Fixture.lumaT1(d, mb)
        val nt = H264Fixture.lumaTc(d, mb) - t1
        (0 until t1).map(j =>
          if (H264Fixture.lumaTrailSign(d, mb, j) == 1) -1L else 1L) ++
          (0 until nt).map { j =>
            val a = H264Fixture.lumaLevelAbs(d, mb, j).toLong
            if (H264Fixture.lumaLevelNeg(d, mb, j) == 1) -a else a
          }
      }
      assert(nNeg == vals.count(_ < 0).toLong, s"n_neg d=$d")
      assert(sumLevels == vals.sum, s"sum_levels d=$d")
    }
    // the parameter space genuinely reaches the hard branches:
    // suffixLength init 1 (tc > 10, t1 < 3), the prefix-14 four-bit
    // escape (first level, sl=0, levelCode in [28,30)), and the
    // prefix-15 twelve-bit escape (levelCode >= 30)
    val cases = for (d <- 0L until 240L;
        mb <- 0 until H264Fixture.lumaMbs(d)) yield (d, mb)
    assert(cases.exists { case (d, mb) =>
      H264Fixture.lumaTc(d, mb) > 10 && H264Fixture.lumaT1(d, mb) < 3 })
    def firstLevelCode(d: Long, mb: Int): Int = {
      val t1 = H264Fixture.lumaT1(d, mb)
      if (H264Fixture.lumaTc(d, mb) - t1 < 1 ||
        H264Fixture.lumaTc(d, mb) > 10) -1
      else {
        val lc = (H264Fixture.lumaLevelAbs(d, mb, 0) - 1) * 2 +
          H264Fixture.lumaLevelNeg(d, mb, 0)
        if (t1 < 3) lc - 2 else lc
      }
    }
    assert(cases.exists { case (d, mb) =>
      val lc = firstLevelCode(d, mb); lc >= 28 && lc < 30 })
    assert(cases.exists { case (d, mb) => firstLevelCode(d, mb) >= 30 })
  }

  test("level_prefix >= 16 range extension decodes (hand-assembled " +
    "— outside the fixture's level range): tc=1, 16-zero prefix, " +
    "13-bit suffix 0 => levelCode 4128, level 2065") {
    // coeff_token (1,0) = 000101; 16 zeros + stop; suffix 0 (13
    // bits); total_zeros(tc=1) tz=0 = 1  => 0x14 0x00 0x02 0x00 0x08
    val r = new H264Headers.BitReader(
      Array[Byte](0x14, 0x00, 0x02, 0x00, 0x08))
    val b = H264Cavlc.residualBlock(r, H264Cavlc.LumaCoeffToken01, 16,
      H264Cavlc.TotalZeros4x4)
    assert(b != null, "prefix-16 block failed to decode")
    assert(b.tc == 1 && b.t1 == 0 && b.sum == 2065L && b.nNeg == 0L &&
      b.tz == 0, s"tc=${b.tc} sum=${b.sum}")
  }

  test("COMBINED lane triangle over 240 documents: real luma-DC + " +
    "two chroma-DC blocks per macroblock in one bitstream, region " +
    "boundary implicit in the codeword widths") {
    for (d <- 0L until 240L) {
      val Some((nMbs, nLuma, lumaSum, nChroma, chromaSum, nNeg,
        sumTz)) = H264Cavlc.decodeFull(H264Fixture.annexBCavlcFull(d))
      val mbs = H264Fixture.cavlcMbs(d)
      assert(nMbs == mbs.toLong)
      val lvals = (0 until mbs).flatMap { mb =>
        val t1 = H264Fixture.lumaT1(d, mb)
        val nt = H264Fixture.lumaTc(d, mb) - t1
        (0 until t1).map(j =>
          if (H264Fixture.lumaTrailSign(d, mb, j) == 1) -1L else 1L) ++
          (0 until nt).map { j =>
            val a = H264Fixture.lumaLevelAbs(d, mb, j).toLong
            if (H264Fixture.lumaLevelNeg(d, mb, j) == 1) -a else a
          }
      }
      val cvals = (for (mb <- 0 until mbs; u <- 0 to 1) yield (mb, u))
        .flatMap { case (mb, u) =>
          val t1 = H264Fixture.cavlcT1(d, mb, u)
          val nt = H264Fixture.cavlcTc(d, mb, u) - t1
          (0 until t1).map(j =>
            if (H264Fixture.cavlcTrailSign(d, mb, u, j) == 1) -1L
            else 1L) ++
            (0 until nt).map { j =>
              val a = H264Fixture.cavlcLevelAbs(d, mb, u, j).toLong
              if (H264Fixture.cavlcLevelNeg(d, mb, u, j) == 1) -a
              else a
            }
        }
      assert(nLuma == (0 until mbs).map(mb =>
        H264Fixture.lumaTc(d, mb).toLong).sum, s"n_luma d=$d")
      assert(lumaSum == lvals.sum, s"luma_sum d=$d")
      assert(nChroma == (for (mb <- 0 until mbs; u <- 0 to 1)
        yield H264Fixture.cavlcTc(d, mb, u).toLong).sum,
        s"n_chroma d=$d")
      assert(chromaSum == cvals.sum, s"chroma_sum d=$d")
      assert(nNeg == (lvals ++ cvals).count(_ < 0).toLong,
        s"n_neg d=$d")
      assert(sumTz == ((0 until mbs).map(mb =>
        H264Fixture.lumaTz(d, mb).toLong).sum +
        (for (mb <- 0 until mbs; u <- 0 to 1)
          yield H264Fixture.cavlcTz(d, mb, u).toLong).sum),
        s"sum_tz d=$d")
    }
    // cross-lane boundaries: the full decoder accepts a chroma-lane
    // stream (its luma DC is the empty codeword — a sub-class), but
    // the CHROMA decoder must refuse a full stream (real luma DC)
    // and the LUMA decoder must refuse it too (chroma CBP 1)
    assert(H264Cavlc.decodeFull(H264Fixture.annexBCavlc(5L)).isDefined)
    assert(H264Cavlc.decode(H264Fixture.annexBCavlcFull(5L)).isEmpty)
    assert(H264Cavlc.decodeLuma(H264Fixture.annexBCavlcFull(5L)).isEmpty)
    // desync adversaries: corrupt the residual region
    val good = H264Fixture.annexBCavlcFull(11L)
    var caught = 0
    for (off <- math.max(0, good.length - 16) until good.length - 1) {
      val bad = good.clone()
      bad(off) = (bad(off) ^ 0x10).toByte
      if (H264Cavlc.decodeFull(bad).isEmpty) caught += 1
    }
    assert(caught > 0, "no combined-region corruption was caught")
    assert(H264Cavlc.decodeFull(good.dropRight(2)).isEmpty)
    assert(H264Cavlc.decodeFull(null).isEmpty)
  }

  test("luma lane fail-closed: chroma-lane streams (mbt 5..8), PCM " +
    "streams, corrupted residual bits, truncation, multi-row " +
    "pictures") {
    assert(H264Cavlc.decodeLuma(H264Fixture.annexBCavlc(3L)).isEmpty)
    assert(H264Cavlc.decodeLuma(H264Fixture.annexBPcm(3L)).isEmpty)
    assert(H264Cavlc.decode(H264Fixture.annexBCavlcLuma(3L)).isEmpty)
    val good = H264Fixture.annexBCavlcLuma(7L)
    var caught = 0
    for (off <- math.max(0, good.length - 16) until good.length - 1) {
      val bad = good.clone()
      bad(off) = (bad(off) ^ 0x10).toByte
      if (H264Cavlc.decodeLuma(bad).isEmpty) caught += 1
    }
    assert(caught > 0, "no residual corruption was caught")
    assert(H264Cavlc.decodeLuma(good.dropRight(2)).isEmpty)
    assert(H264Cavlc.decodeLuma("not a video".getBytes).isEmpty)
    assert(H264Cavlc.decodeLuma(null).isEmpty)
    // a two-MB-row picture is outside the nC = 0 argument: the SPS
    // geometry gate must refuse it before any residual walk
    val sps2 = H264Fixture.escapeRbsp(H264Fixture.spsRbsp(
      H264Fixture.cavlcLumaParams(3L).copy(h = 32)))
    val slice = H264Fixture.escapeRbsp(H264Fixture.cavlcLumaSliceRbsp(3L))
    val twoRow = Array.concat(
      Array[Byte](0, 0, 0, 1, 0x67) ++ sps2,
      Array[Byte](0, 0, 0, 1, 0x68, 0xCE.toByte, 0x38, 0x80.toByte),
      Array[Byte](0, 0, 0, 1, 0x65) ++ slice)
    assert(H264Cavlc.decodeLuma(twoRow).isEmpty)
  }

  test("fail-closed boundaries: PCM streams (mb_type 25), corrupted " +
    "residual bits, truncation, non-H264 bytes") {
    // a PCM picture is NOT in the chroma-DC CAVLC class
    assert(H264Cavlc.decode(H264Fixture.annexBPcm(3L)).isEmpty)
    // ... and a CAVLC picture is not in the PCM class
    assert(H264Pcm.decode(H264Fixture.annexBCavlc(3L)).isEmpty)
    // flip a bit mid-residual: the walk desynchronizes and the
    // trailing check (or an in-walk guard) must catch it
    val good = H264Fixture.annexBCavlc(7L)
    var caught = 0
    for (off <- good.length - 6 until good.length - 1) {
      val bad = good.clone()
      bad(off) = (bad(off) ^ 0x10).toByte
      if (H264Cavlc.decode(bad).isEmpty) caught += 1
    }
    assert(caught > 0, "no residual corruption was caught")
    assert(H264Cavlc.decode(good.dropRight(2)).isEmpty)
    assert(H264Cavlc.decode("not a video".getBytes).isEmpty)
    assert(H264Cavlc.decode(null).isEmpty)
  }

  test("§9.2.2 suffixLength clauses apply SEQUENTIALLY: a first " +
    "level of |4| bumps suffixLength 0 → 1 → 2 before the second " +
    "level reads (hand-assembled bitstream, not the fixture)") {
    // tc=2, t1=0, levels +4 then +2, total_zeros 0:
    //   coeff_token (2,0)      = 000100
    //   level 0 (sl=0): lc=6−2=4 → prefix 4 → 00001    (then sl 0→1→2)
    //   level 1 (sl=2): lc=2 → prefix 0, suffix 10 → 110
    //   total_zeros(tc=2) = 0  → 1
    // = 0001 0000 0011 1010 = 0x10 0x3A (one pad bit)
    val r = new H264Headers.BitReader(Array[Byte](0x10, 0x3A))
    val b = H264Cavlc.chromaDcBlock(r)
    assert(b != null, "block failed to decode")
    assert(b.tc == 2 && b.t1 == 0 && b.nNeg == 0L && b.sum == 6L &&
      b.tz == 0, s"tc=${b.tc} t1=${b.t1} sum=${b.sum}")
    // an else-if decoder (sl stuck at 1) would read level 1's prefix
    // stop bit as a 1-bit suffix and desync — sum ≠ 6 or null
  }

  test("AC-lane tables load their construction self-checks: the " +
    "62-entry 2<=nC<4 coeff_token column (2 declared unused 14-bit " +
    "leaves) with every (tc, t1) pair exactly once") {
    assert(H264Cavlc.LumaCoeffToken23.code.length == 62)
    val pairs = (0 until 62).map(e =>
      (H264Cavlc.LumaCoeffToken23.xs(e), H264Cavlc.LumaCoeffToken23.ys(e)))
    val expect = for (tc <- 0 to 16; t1 <- 0 to math.min(3, tc))
      yield (tc, t1)
    assert(pairs.sorted == expect.sorted)
  }

  test("the decoder's transcribed §6.4.10.4 neighbour arrays match " +
    "an independent raster-coordinate derivation") {
    val xy = Array.tabulate(16)(i =>
      (2 * ((i >> 2) & 1) + (i & 1), 2 * ((i >> 3) & 1) + ((i >> 1) & 1)))
    val idx = xy.zipWithIndex.toMap
    for (b <- 0 until 16) {
      val (x, y) = xy(b)
      assert(H264Cavlc.LeftBlk(b) ==
        (if (x > 0) idx((x - 1, y)) else -1), s"LeftBlk($b)")
      assert(H264Cavlc.LeftEdge(b) ==
        (if (x == 0) idx((3, y)) else -1), s"LeftEdge($b)")
      assert(H264Cavlc.TopBlk(b) ==
        (if (y > 0) idx((x, y - 1)) else -1), s"TopBlk($b)")
    }
  }

  test("AC-lane writer/parser/closed-form triangle over 240 " +
    "documents: neighbour-routed coeff_token columns, sixteen AC " +
    "blocks + DC per macroblock, sum_nc pins the §9.2.1 arithmetic") {
    for (d <- 0L until 240L) {
      val Some((nMbs, nDc, dcSum, nAc, acSum, nT1, nNeg, sumTz,
        sumNc)) = H264Cavlc.decodeAc(H264Fixture.annexBCavlcAc(d))
      val mbs = H264Fixture.acMbs(d)
      assert(nMbs == mbs.toLong, s"n_mbs d=$d")
      def blockVals(t1: Int, tc: Int, sign: Int => Int,
          abs: Int => Int, neg: Int => Int): Seq[Long] =
        (0 until t1).map(j => if (sign(j) == 1) -1L else 1L) ++
          (0 until tc - t1).map { j =>
            val a = abs(j).toLong
            if (neg(j) == 1) -a else a
          }
      val dvals = (0 until mbs).flatMap { mb =>
        blockVals(H264Fixture.lumaT1(d, mb), H264Fixture.lumaTc(d, mb),
          H264Fixture.lumaTrailSign(d, mb, _),
          H264Fixture.lumaLevelAbs(d, mb, _),
          H264Fixture.lumaLevelNeg(d, mb, _))
      }
      val abs2 = for (mb <- 0 until mbs; b <- 0 until 16) yield (mb, b)
      val avals = abs2.flatMap { case (mb, b) =>
        blockVals(H264Fixture.acT1(d, mb, b), H264Fixture.acTc(d, mb, b),
          H264Fixture.acTrailSign(d, mb, b, _),
          H264Fixture.acLevelAbs(d, mb, b, _),
          H264Fixture.acLevelNeg(d, mb, b, _))
      }
      assert(nDc == (0 until mbs).map(mb =>
        H264Fixture.lumaTc(d, mb).toLong).sum, s"n_dc d=$d")
      assert(dcSum == dvals.sum, s"dc_sum d=$d")
      assert(nAc == abs2.map { case (mb, b) =>
        H264Fixture.acTc(d, mb, b).toLong }.sum, s"n_ac d=$d")
      assert(acSum == avals.sum, s"ac_sum d=$d")
      assert(nT1 == ((0 until mbs).map(mb =>
        H264Fixture.lumaT1(d, mb).toLong).sum +
        abs2.map { case (mb, b) =>
          H264Fixture.acT1(d, mb, b).toLong }.sum), s"n_t1 d=$d")
      assert(nNeg == (dvals ++ avals).count(_ < 0).toLong, s"n_neg d=$d")
      assert(sumTz == ((0 until mbs).map(mb =>
        H264Fixture.lumaTz(d, mb).toLong).sum +
        abs2.map { case (mb, b) =>
          H264Fixture.acTz(d, mb, b).toLong }.sum), s"sum_tz d=$d")
      assert(sumNc == ((0 until mbs).map(mb =>
        H264Fixture.acDcNc(d, mb).toLong).sum +
        abs2.map { case (mb, b) =>
          H264Fixture.acNc(d, mb, b).toLong }.sum), s"sum_nc d=$d")
    }
    // coverage proofs over the fixture space: the 2<=nC<4 column,
    // the nC>=8 FLC (both a real-coefficient and an empty block),
    // and cross-MB left neighbours all genuinely engage — and NO
    // reachable nC lands in the declared fail-closed [4,8) band
    // (the {0,1,2,3,15} closure argument, asserted not assumed)
    val all = for (d <- 0L until 240L; mb <- 0 until H264Fixture.acMbs(d);
      b <- 0 until 16) yield (d, mb, b)
    def nc(c: (Long, Int, Int)) = H264Fixture.acNc(c._1, c._2, c._3)
    assert(all.exists(c => nc(c) >= 2 && nc(c) < 4), "col 2<=nC<4 unused")
    assert(all.exists(c => nc(c) >= 8 &&
      H264Fixture.acTc(c._1, c._2, c._3) > 0), "FLC real block unused")
    assert(all.exists(c => nc(c) >= 8 &&
      H264Fixture.acTc(c._1, c._2, c._3) == 0), "FLC empty block unused")
    assert(all.forall(c => nc(c) < 4 || nc(c) >= 8),
      "a reachable nC landed in the declared fail-closed band")
    assert(all.exists { case (_, mb, b) =>
      mb > 0 && Set(0, 2, 8, 10).contains(b) },
      "no cross-MB left neighbour engaged")
    val dcs = for (d <- 0L until 240L;
      mb <- 0 until H264Fixture.acMbs(d)) yield (d, mb)
    assert(dcs.exists { case (d, mb) =>
      H264Fixture.acDcNc(d, mb) >= 8 }, "DC never routed to the FLC")
    assert(dcs.exists { case (d, mb) =>
      H264Fixture.acDcNc(d, mb) >= 2 && H264Fixture.acDcNc(d, mb) < 4 },
      "DC never routed to the 2<=nC<4 column")
  }

  test("AC lane fail-closed: the declared 4<=nC<8 column refuses " +
    "(hand-assembled: block 0 decodes tc=4, so block 1's nC is 4), " +
    "cross-lane streams, corruption, truncation, two-row geometry") {
    // hand-assemble a luma-CBP-15 slice whose AC block 0 has tc=4:
    // block 1's left neighbour census is then exactly 4 — inside the
    // declared band — and the decoder must refuse the stream rather
    // than guess a column
    val bw = new H264Fixture.BitWriter
    bw.ue(0); bw.ue(7); bw.ue(0) // first_mb, slice_type I, pps_id
    bw.u(4, 0); bw.ue(0); bw.u(4, 0) // frame_num, idr_pic_id, poc_lsb
    bw.bit(0); bw.bit(0); bw.se(0) // ref marking, slice_qp_delta
    bw.ue(13); bw.ue(0); bw.se(0) // mb_type I_16x16_0_0_1, icp, qpd
    bw.bit(1) // Intra16x16DCLevel: TotalCoeff 0 under nC = 0
    // AC block 0 under nC = 0: coeff_token (4,0), four +2 levels
    // (first levelCode 0 after the t1<3 shift), total_zeros 0
    val e40 = (0 until 62).find(e =>
      H264Cavlc.LumaCoeffToken01.xs(e) == 4 &&
        H264Cavlc.LumaCoeffToken01.ys(e) == 0).get
    bw.u(H264Cavlc.LumaCoeffToken01.len(e40),
      H264Cavlc.LumaCoeffToken01.code(e40))
    bw.bit(1) // level 0: levelCode 0
    for (_ <- 0 until 3) { bw.bit(0); bw.bit(1); bw.bit(0) } // lc 2, sl 1
    val tz0 = (0 until H264Cavlc.TotalZeros4x4(4).code.length).find(e =>
      H264Cavlc.TotalZeros4x4(4).xs(e) == 0).get
    bw.u(H264Cavlc.TotalZeros4x4(4).len(tz0),
      H264Cavlc.TotalZeros4x4(4).code(tz0))
    bw.stopAlign() // block 1 is never reached: nC = 4 refuses first
    val slice = H264Fixture.escapeRbsp(bw.bytes)
    val sps = H264Fixture.escapeRbsp(H264Fixture.spsRbsp(
      H264Fixture.cavlcAcParams(0L)))
    val banned = Array.concat(
      Array[Byte](0, 0, 0, 1, 0x67) ++ sps,
      Array[Byte](0, 0, 0, 1, 0x68, 0xCE.toByte, 0x38, 0x80.toByte),
      Array[Byte](0, 0, 0, 1, 0x65) ++ slice)
    assert(H264Cavlc.decodeAc(banned).isEmpty,
      "the declared 4<=nC<8 band did not fail closed")
    // cross-lane: every other lane's streams are outside this class
    assert(H264Cavlc.decodeAc(H264Fixture.annexBCavlcLuma(3L)).isEmpty)
    assert(H264Cavlc.decodeAc(H264Fixture.annexBCavlc(3L)).isEmpty)
    assert(H264Cavlc.decodeAc(H264Fixture.annexBCavlcFull(3L)).isEmpty)
    assert(H264Cavlc.decodeAc(H264Fixture.annexBPcm(3L)).isEmpty)
    assert(H264Cavlc.decodeLuma(H264Fixture.annexBCavlcAc(3L)).isEmpty)
    assert(H264Cavlc.decode(H264Fixture.annexBCavlcAc(3L)).isEmpty)
    assert(H264Cavlc.decodeFull(H264Fixture.annexBCavlcAc(3L)).isEmpty)
    // desync adversaries on the AC lane itself
    val good = H264Fixture.annexBCavlcAc(11L)
    var caught = 0
    for (off <- math.max(0, good.length - 16) until good.length - 1) {
      val bad = good.clone()
      bad(off) = (bad(off) ^ 0x10).toByte
      if (H264Cavlc.decodeAc(bad).isEmpty) caught += 1
    }
    assert(caught > 0, "no AC-region corruption was caught")
    assert(H264Cavlc.decodeAc(good.dropRight(2)).isEmpty)
    assert(H264Cavlc.decodeAc("not a video".getBytes).isEmpty)
    assert(H264Cavlc.decodeAc(null).isEmpty)
    // two-MB-row pictures are outside the top-edge argument
    val sps2 = H264Fixture.escapeRbsp(H264Fixture.spsRbsp(
      H264Fixture.cavlcAcParams(3L).copy(h = 32)))
    val slice2 = H264Fixture.escapeRbsp(H264Fixture.cavlcAcSliceRbsp(3L))
    val twoRow = Array.concat(
      Array[Byte](0, 0, 0, 1, 0x67) ++ sps2,
      Array[Byte](0, 0, 0, 1, 0x68, 0xCE.toByte, 0x38, 0x80.toByte),
      Array[Byte](0, 0, 0, 1, 0x65) ++ slice2)
    assert(H264Cavlc.decodeAc(twoRow).isEmpty)
  }

  test("the chroma 2x2-grid neighbour arrays match an independent " +
    "coordinate derivation") {
    for (c <- 0 until 4) {
      val (x, y) = (c % 2, c / 2)
      assert(H264Cavlc.CLeftBlk(c) ==
        (if (x > 0) y * 2 else -1), s"CLeftBlk($c)")
      assert(H264Cavlc.CLeftEdge(c) ==
        (if (x == 0) y * 2 + 1 else -1), s"CLeftEdge($c)")
      assert(H264Cavlc.CTopBlk(c) ==
        (if (y > 0) c - 2 else -1), s"CTopBlk($c)")
    }
  }

  test("COMPLETE-macroblock triangle over 240 documents: all four " +
    "residual classes real in one bitstream, both neighbour " +
    "censuses pinned by sum_nc") {
    for (d <- 0L until 240L) {
      val Some((nMbs, lumaDc, lumaAc, chromaDc, chromaAc, sumLv,
        nT1, nNeg, sumTz, sumNc)) =
        H264Cavlc.decodeMb(H264Fixture.annexBCavlcMb(d))
      val mbs = H264Fixture.acMbs(d)
      assert(nMbs == mbs.toLong, s"n_mbs d=$d")
      def blockVals(t1: Int, tc: Int, sign: Int => Int,
          abs: Int => Int, neg: Int => Int): Seq[Long] =
        (0 until t1).map(j => if (sign(j) == 1) -1L else 1L) ++
          (0 until tc - t1).map { j =>
            val a = abs(j).toLong
            if (neg(j) == 1) -a else a
          }
      val lumaB = (0 until mbs).toSeq
      val acB = for (mb <- 0 until mbs; b <- 0 until 16) yield (mb, b)
      val cdcB = for (mb <- 0 until mbs; u <- 0 to 1) yield (mb, u)
      val cacB = for (mb <- 0 until mbs; u <- 0 to 1; c <- 0 until 4)
        yield (mb, u, c)
      val vals =
        lumaB.flatMap(mb => blockVals(H264Fixture.lumaT1(d, mb),
          H264Fixture.lumaTc(d, mb), H264Fixture.lumaTrailSign(d, mb, _),
          H264Fixture.lumaLevelAbs(d, mb, _),
          H264Fixture.lumaLevelNeg(d, mb, _))) ++
        acB.flatMap { case (mb, b) =>
          blockVals(H264Fixture.acT1(d, mb, b),
            H264Fixture.acTc(d, mb, b),
            H264Fixture.acTrailSign(d, mb, b, _),
            H264Fixture.acLevelAbs(d, mb, b, _),
            H264Fixture.acLevelNeg(d, mb, b, _)) } ++
        cdcB.flatMap { case (mb, u) =>
          blockVals(H264Fixture.cavlcT1(d, mb, u),
            H264Fixture.cavlcTc(d, mb, u),
            H264Fixture.cavlcTrailSign(d, mb, u, _),
            H264Fixture.cavlcLevelAbs(d, mb, u, _),
            H264Fixture.cavlcLevelNeg(d, mb, u, _)) } ++
        cacB.flatMap { case (mb, u, c) =>
          blockVals(H264Fixture.cacT1(d, mb, u, c),
            H264Fixture.cacTc(d, mb, u, c),
            H264Fixture.cacTrailSign(d, mb, u, c, _),
            H264Fixture.cacLevelAbs(d, mb, u, c, _),
            H264Fixture.cacLevelNeg(d, mb, u, c, _)) }
      assert(lumaDc == lumaB.map(mb =>
        H264Fixture.lumaTc(d, mb).toLong).sum, s"luma_dc d=$d")
      assert(lumaAc == acB.map { case (mb, b) =>
        H264Fixture.acTc(d, mb, b).toLong }.sum, s"luma_ac d=$d")
      assert(chromaDc == cdcB.map { case (mb, u) =>
        H264Fixture.cavlcTc(d, mb, u).toLong }.sum, s"chroma_dc d=$d")
      assert(chromaAc == cacB.map { case (mb, u, c) =>
        H264Fixture.cacTc(d, mb, u, c).toLong }.sum, s"chroma_ac d=$d")
      assert(sumLv == vals.sum, s"sum_levels d=$d")
      assert(nNeg == vals.count(_ < 0).toLong, s"n_neg d=$d")
      assert(nT1 == (lumaB.map(mb =>
        H264Fixture.lumaT1(d, mb).toLong).sum +
        acB.map { case (mb, b) =>
          H264Fixture.acT1(d, mb, b).toLong }.sum +
        cdcB.map { case (mb, u) =>
          H264Fixture.cavlcT1(d, mb, u).toLong }.sum +
        cacB.map { case (mb, u, c) =>
          H264Fixture.cacT1(d, mb, u, c).toLong }.sum), s"n_t1 d=$d")
      assert(sumTz == (lumaB.map(mb =>
        H264Fixture.lumaTz(d, mb).toLong).sum +
        acB.map { case (mb, b) =>
          H264Fixture.acTz(d, mb, b).toLong }.sum +
        cdcB.map { case (mb, u) =>
          H264Fixture.cavlcTz(d, mb, u).toLong }.sum +
        cacB.map { case (mb, u, c) =>
          H264Fixture.cacTz(d, mb, u, c).toLong }.sum), s"sum_tz d=$d")
      assert(sumNc == (lumaB.map(mb =>
        H264Fixture.acDcNc(d, mb).toLong).sum +
        acB.map { case (mb, b) =>
          H264Fixture.acNc(d, mb, b).toLong }.sum +
        cacB.map { case (mb, u, c) =>
          H264Fixture.cacNc(d, mb, u, c).toLong }.sum), s"sum_nc d=$d")
    }
    // chroma-AC nC coverage: the 2<=nC<4 column, the FLC band, and
    // cross-MB chroma left neighbours engage; nothing reaches [4,8)
    val cs = for (d <- 0L until 240L; mb <- 0 until H264Fixture.acMbs(d);
      u <- 0 to 1; c <- 0 until 4) yield (d, mb, u, c)
    def cnc(x: (Long, Int, Int, Int)) =
      H264Fixture.cacNc(x._1, x._2, x._3, x._4)
    assert(cs.exists(x => cnc(x) >= 2 && cnc(x) < 4),
      "chroma col 2<=nC<4 unused")
    assert(cs.exists(x => cnc(x) >= 8), "chroma FLC unused")
    assert(cs.forall(x => cnc(x) < 4 || cnc(x) >= 8),
      "a chroma nC landed in the declared fail-closed band")
    assert(cs.exists { case (_, mb, _, c) =>
      mb > 0 && (c == 0 || c == 2) }, "no cross-MB chroma left")
    // cross-lane rejects + adversaries
    assert(H264Cavlc.decodeMb(H264Fixture.annexBCavlcAc(3L)).isEmpty)
    assert(H264Cavlc.decodeAc(H264Fixture.annexBCavlcMb(3L)).isEmpty)
    assert(H264Cavlc.decodeMb(H264Fixture.annexBCavlcFull(3L)).isEmpty)
    assert(H264Cavlc.decodeMb(H264Fixture.annexBPcm(3L)).isEmpty)
    val good = H264Fixture.annexBCavlcMb(11L)
    var caught = 0
    for (off <- math.max(0, good.length - 16) until good.length - 1) {
      val bad = good.clone()
      bad(off) = (bad(off) ^ 0x10).toByte
      if (H264Cavlc.decodeMb(bad).isEmpty) caught += 1
    }
    assert(caught > 0, "no complete-MB corruption was caught")
    assert(H264Cavlc.decodeMb(good.dropRight(2)).isEmpty)
    assert(H264Cavlc.decodeMb(null).isEmpty)
  }

  test("suffixLength adaptation really engages: some document emits " +
    "a level whose code needs a nonzero suffix, and decodes back") {
    // |level| = 4 with suffixLength 1 after a first level forces a
    // suffix bit; the triangle above already proves value fidelity —
    // here we just pin that the parameter space reaches that branch
    val hit = (0L until 240L).exists { d =>
      (0 until H264Fixture.cavlcMbs(d)).exists(mb => (0 to 1).exists {
        u =>
          val nt = H264Fixture.cavlcTc(d, mb, u) -
            H264Fixture.cavlcT1(d, mb, u)
          nt >= 2 // second non-trailing level decodes under sl ≥ 1
      })
    }
    assert(hit)
    // and the sequential-bump case (first level |4|, then a second
    // level under sl = 2) is in the fixture space too
    val seqHit = (0L until 240L).exists { d =>
      (0 until H264Fixture.cavlcMbs(d)).exists(mb => (0 to 1).exists {
        u =>
          val nt = H264Fixture.cavlcTc(d, mb, u) -
            H264Fixture.cavlcT1(d, mb, u)
          nt >= 2 && H264Fixture.cavlcLevelAbs(d, mb, u, 0) == 4
      })
    }
    assert(seqHit, "fixture space misses the 0→1→2 bump case")
  }
}
