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
    assert(H264Cavlc.RunBefore.keySet == Set(1, 2, 3))
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
  }
}
