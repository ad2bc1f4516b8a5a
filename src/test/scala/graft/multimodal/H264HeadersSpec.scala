package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The H.264 SPS reader against HAND-ASSEMBLED bitstreams (bit
  * arithmetic worked out in comments, independent of both the
  * fixture encoder and the reader), plus encoder round-trips and
  * adversarial emulation-prevention cases. */
class H264HeadersSpec extends AnyFunSuite {

  /** Hand-assembled SPS for Baseline 66, level 30, 320x240
    * progressive, no cropping:
    * {{{
    * profile_idc      u(8)  = 66   01000010
    * constraints      u(8)  = 0    00000000
    * level_idc        u(8)  = 30   00011110
    * sps_id           ue(0)        1
    * log2_max_fn_m4   ue(0)        1
    * poc_type         ue(0)        1
    * log2_max_poc_m4  ue(0)        1
    * max_num_ref      ue(1)        010
    * gaps_flag        u(1)  = 0    0
    * pw_in_mbs_m1     ue(19)       000010100    (320/16 - 1)
    * ph_in_mu_m1      ue(14)       0001111      (240/16 - 1)
    * frame_mbs_only   u(1)  = 1    1
    * direct_8x8       u(1)  = 1    1
    * crop_flag        u(1)  = 0    0
    * vui_flag         u(1)  = 0    0
    * stop + align            1000
    * }}}
    * Bit string after the three bytes:
    * 1 1 1 1 010 0 000010100 0001111 1 1 0 0 1000 →
    * 11110100 00001010 00001111 11001000 = F4 0A 0F C8
    */
  private val handSps =
    Array(66, 0, 30, 0xF4, 0x0A, 0x0F, 0xC8).map(_.toByte)

  test("hand-assembled baseline SPS decodes to 320x240") {
    assert(H264Headers.parseSps(handSps).contains((66, 30, 320, 240)))
  }

  test("hand-assembled stream walk: AUD + SPS + PPS, 4-byte and " +
    "3-byte start codes") {
    val s = Array[Byte](0, 0, 0, 1, 0x09, 0x10) ++
      Array[Byte](0, 0, 1, 0x67) ++ handSps ++
      Array[Byte](0, 0, 0, 1, 0x68, 0xCE.toByte, 0x38, 0x80.toByte)
    assert(H264Headers.parse(s).contains((66, 30, 320, 240, 3)))
  }

  test("unescape strips 00 00 03 and keeps the guarded byte") {
    val esc = Array[Byte](0x40, 0, 0, 3, 1, 0x7F, 0, 0, 3, 0, 0x22)
    assert(H264Headers.unescapeRbsp(esc, 0, esc.length).toSeq ==
      Seq[Byte](0x40, 0, 0, 1, 0x7F, 0, 0, 0, 0x22))
    // ANY 03 after 00 00 is an escape byte (§7.4.1: a raw
    // 00 00 03 can never appear — it would itself be escaped as
    // 00 00 03 03), so the 03 drops regardless of what follows
    val always = Array[Byte](0, 0, 3, 0x44)
    assert(H264Headers.unescapeRbsp(always, 0, always.length).toSeq ==
      Seq[Byte](0, 0, 0x44))
  }

  test("escape/unescape round-trip on adversarial zero runs") {
    val raws = Seq(
      Array[Byte](0, 0, 0, 0, 0),
      Array[Byte](0, 0, 1),
      Array[Byte](0, 0, 2, 0, 0, 3),
      Array[Byte](1, 0, 0, 0, 1, 0, 0),
      Array.fill[Byte](64)(0))
    raws.foreach { raw =>
      val esc = H264Fixture.escapeRbsp(raw)
      // escaped form may not contain 00 00 {00,01,02} — 00 00 03
      // is the escape marker itself and legal
      (0 until esc.length - 2).foreach { i =>
        assert(!(esc(i) == 0 && esc(i + 1) == 0 && (esc(i + 2) & 0xff) < 3),
          s"unescaped alias at $i in ${esc.toSeq}")
      }
      assert(H264Headers.unescapeRbsp(esc, 0, esc.length).toSeq ==
        raw.toSeq)
    }
  }

  test("SEI zero payload would alias a start code unescaped — the " +
    "fixture stream still walks to the right SPS") {
    // doc 0: SEI carries 16 zero UUID bytes → raw 00 00 00 … would
    // contain 00-00-01-free zero runs only, but unescaped 00 00 00
    // still desynchronizes a naive walk via the NEXT nal's header
    (0L to 40L).foreach { id =>
      val p = H264Fixture.paramsOf(id)
      val got = H264Headers.parse(H264Fixture.annexB(id))
      assert(got.contains((p.profile, p.level, p.w, p.h, 4)),
        s"doc $id: got $got, want $p")
    }
  }

  test("encoder round-trip across the parameter space: profiles, " +
    "poc types, interlaced, cropping, high-profile chroma block") {
    // stride chosen coprime to the moduli so all branches are hit
    (0L until 3000L by 7L).foreach { id =>
      val p = H264Fixture.paramsOf(id)
      val got = H264Headers.parse(H264Fixture.annexB(id))
      assert(got.contains((p.profile, p.level, p.w, p.h, 4)),
        s"doc $id: got $got, want $p")
    }
  }

  test("interlaced map-unit doubling: frame_mbs_only=0 doubles the " +
    "height contribution and the crop unit") {
    // doc 5: frameMbsOnly = 0 (5 % 5 == 0)
    val p = H264Fixture.paramsOf(5L)
    assert(p.frameMbsOnly == 0)
    assert(H264Headers.parse(H264Fixture.annexB(5L))
      .exists(r => r._3 == p.w && r._4 == p.h))
  }

  test("4:2:2 and monochrome crop units (hand-built high-profile SPS)") {
    // high profile 122 (4:2:2): CropUnitX = 2, CropUnitY = 1 (prog.)
    def sps(chroma: Int, cropR: Int, cropB: Int): Array[Byte] = {
      val bw = new H264Fixture.BitWriter
      bw.u(8, 122); bw.u(8, 0); bw.u(8, 40)
      bw.ue(0) // sps_id
      bw.ue(chroma)
      if (chroma == 3) bw.bit(0) // separate_colour_plane
      bw.ue(0); bw.ue(0); bw.bit(0); bw.bit(0) // depths, qpprime, scaling
      bw.ue(0); bw.ue(2) // log2_max_fn, poc_type 2
      bw.ue(0); bw.bit(0) // max_ref, gaps
      bw.ue(9); bw.ue(9) // 160x160 mbs
      bw.bit(1) // frame_mbs_only
      bw.bit(1) // direct_8x8
      bw.bit(1); bw.ue(0); bw.ue(cropR); bw.ue(0); bw.ue(cropB)
      bw.bit(0) // vui
      bw.stopAlign()
      bw.bytes
    }
    // 4:2:2: width 160 - 2*3 = 154, height 160 - 1*5 = 155
    assert(H264Headers.parseSps(sps(2, 3, 5))
      .contains((122, 40, 154, 155)))
    // monochrome: both crop units 1 → 157 x 155
    assert(H264Headers.parseSps(sps(0, 3, 5))
      .contains((122, 40, 157, 155)))
  }

  test("out-of-scope and malformed → None, never a guess") {
    // scaling matrices present
    val bw = new H264Fixture.BitWriter
    bw.u(8, 100); bw.u(8, 0); bw.u(8, 40)
    bw.ue(0); bw.ue(1); bw.ue(0); bw.ue(0); bw.bit(0)
    bw.bit(1) // seq_scaling_matrix_present = 1
    bw.stopAlign()
    assert(H264Headers.parseSps(bw.bytes).isEmpty)
    // truncated mid-field
    assert(H264Headers.parseSps(handSps.take(4)).isEmpty)
    // no SPS in the stream
    assert(H264Headers.parse(
      Array[Byte](0, 0, 0, 1, 0x09, 0x10)).isEmpty)
    // garbage before the first start code
    assert(H264Headers.parse(
      Array[Byte](0x42, 0, 0, 1, 0x67) ++ handSps).isEmpty)
    // forbidden_zero_bit set on the SPS header → not an SPS
    assert(H264Headers.parse(
      Array[Byte](0, 0, 1, 0xE7.toByte) ++ handSps).isEmpty)
    assert(H264Headers.parse(null).isEmpty)
    assert(H264Headers.parse(Array.emptyByteArray).isEmpty)
  }
}
