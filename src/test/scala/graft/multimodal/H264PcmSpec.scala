package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** REAL H.264 PCM sample decode: round-trip against the independent
  * fixture writer, the guaranteed emulation-prevention exercise, and
  * loud-failure on out-of-scope or corrupted streams. */
class H264PcmSpec extends AnyFunSuite {

  test("decode recovers every PCM sample statistic exactly") {
    for (id <- Seq(0L, 1L, 7L, 42L, 499L)) {
      val (w, h) = H264Fixture.pcmDims(id)
      val Some((dw, dh, mbs)) =
        H264Pcm.decode(H264Fixture.annexBPcm(id))
      assert(dw == w && dh == h)
      assert(mbs.length == (w / 16) * (h / 16))
      mbs.foreach { m =>
        val luma = (0 until 256).map(H264Fixture.pcmLuma(id, m.mbI, _))
        val cbcr = for (c <- 0 until 2; k <- 0 until 64)
          yield H264Fixture.pcmChroma(id, m.mbI, c, k)
        assert(m.lumaSum == luma.map(_.toLong).sum)
        assert(m.lumaMin == luma.min)
        assert(m.lumaMax == luma.max)
        assert(m.cbcrSum == cbcr.map(_.toLong).sum)
      }
    }
  }

  test("every stream forces real emulation-prevention escaping") {
    for (id <- Seq(0L, 1L, 13L)) {
      val raw = H264Fixture.idrPcmSliceRbsp(id)
      val esc = H264Fixture.escapeRbsp(raw)
      assert(esc.length > raw.length,
        "the zero-run luma prefix must force at least one escape")
      // and the escaped stream still decodes (unescape is exercised)
      assert(H264Pcm.decode(H264Fixture.annexBPcm(id)).isDefined)
    }
  }

  test("corrupted or out-of-scope streams fail loudly (None)") {
    val ok = H264Fixture.annexBPcm(5L)
    // flip a bit inside the slice payload → sample walk desyncs or
    // the trailing stop bit / mb_type check fails, never a wrong
    // silent answer (statistics come from the SAME bytes that were
    // flipped, so decode either returns None or differing stats)
    val sliceStart = ok.length - 100
    val bad = ok.clone()
    bad(sliceStart) = (bad(sliceStart) ^ 0x40).toByte
    val orig = H264Pcm.decode(ok).get
    H264Pcm.decode(bad) match {
      case None => // loud failure: fine
      case Some((_, _, mbs)) =>
        // a decode that still succeeds must show the changed bytes
        assert(mbs.map(_.lumaSum).sum != orig._3.map(_.lumaSum).sum ||
          mbs.map(_.cbcrSum).sum != orig._3.map(_.cbcrSum).sum)
    }
    // truncated stream: None
    assert(H264Pcm.decode(ok.take(ok.length / 2)).isEmpty)
    // metadata-only stream (no coded slice): None
    assert(H264Pcm.decode(H264Fixture.annexB(5L)).isEmpty)
  }
}
