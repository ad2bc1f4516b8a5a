package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Builds REAL H.264 Annex-B elementary streams for the
  * `mm_h264_sps` fixture — a from-scratch bit writer + RBSP
  * emulation-prevention escaper that shares NOTHING with
  * [[H264Headers]]' reader but the public ISO 14496-10 syntax: the
  * query encodes deterministic parameters per document, the native
  * expression decodes them back through the independent NAL walk /
  * Exp-Golomb reader, and the DuckDB oracle replays the parameter
  * derivation arithmetically — so `decode(encode(p)) = p` is proven
  * through two independent bit-level implementations against a
  * third, relational, spelling of the expected output (the
  * golden-Deflater pattern of `llm_compress_ratio`, at the bit
  * level).
  *
  * Each stream is four NAL units: an access-unit delimiter, an SEI
  * `user_data_unregistered` whose zero-run payload FORCES emulation
  * prevention (`00 00 00` → `00 00 03 00` — an unescaped stream
  * would alias a start code and desynchronize the walk), the SPS
  * under test, and a PPS. Start codes alternate 4- and 3-byte forms.
  */
object H264Fixture {

  /** MSB-first bit writer with Exp-Golomb codes. */
  final class BitWriter {
    private val buf = ArrayBuffer[Byte]()
    private var cur = 0
    private var nbits = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nbits += 1
      if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
    }
    def u(n: Int, v: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit((v >> i) & 1); i -= 1 }
    }
    /** Unsigned Exp-Golomb: (len-1) zeros + the len bits of v+1. */
    def ue(v: Int): Unit = {
      val k = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(k)
      u(len - 1, 0)
      u(len, k)
    }
    def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    /** rbsp_trailing_bits: stop bit + zero-pad to a byte boundary. */
    def stopAlign(): Unit = {
      bit(1)
      while (nbits != 0) bit(0)
    }
    /** pcm_alignment_zero_bit* — zero-pad (no stop bit) to a byte
      * boundary before byte-aligned PCM samples (§7.3.5). */
    def stopPcmAlign(): Unit =
      while (nbits != 0) bit(0)
    def bytes: Array[Byte] = buf.toArray
  }

  /** Insert emulation-prevention bytes: any `00 00` followed by a
    * byte ≤ 3 gets `03` interposed. */
  def escapeRbsp(raw: Array[Byte]): Array[Byte] = {
    val out = ArrayBuffer[Byte]()
    var zeros = 0
    raw.foreach { byte =>
      val v = byte & 0xff
      if (zeros >= 2 && v <= 3) {
        out += 3
        zeros = 0
      }
      out += byte
      zeros = if (v == 0) zeros + 1 else 0
    }
    out.toArray
  }

  /** The deterministic per-document SPS parameters. Mirrored
    * ARITHMETICALLY by the mm_h264_sps oracle SQL — keep the two in
    * lockstep. Width is any even value (CropUnitX = 2 for 4:2:0);
    * height is a multiple of 4 so interlaced docs (CropUnitY = 4)
    * crop exactly. */
  final case class Params(profile: Int, level: Int, w: Int, h: Int,
      frameMbsOnly: Int, pocType: Int, spsId: Int,
      log2MaxFrameNum4: Int, maxRef: Int)

  def paramsOf(docId: Long): Params = Params(
    profile = Array(66, 77, 100)((docId % 3).toInt),
    level = Array(10, 20, 31, 40, 51)((docId % 5).toInt),
    w = (2 * ((docId % 640) + 8)).toInt,
    h = (4 * (((docId * 13) % 180) + 4)).toInt,
    frameMbsOnly = if (docId % 5 == 0) 0 else 1,
    pocType = (docId % 3).toInt match {
      case 0 => 0
      case 1 => 2
      case _ => 1
    },
    spsId = (docId % 8).toInt,
    log2MaxFrameNum4 = (docId % 9).toInt,
    maxRef = (docId % 5).toInt)

  /** seq_parameter_set_rbsp per ISO 14496-10 §7.3.2.1, UNescaped. */
  def spsRbsp(p: Params): Array[Byte] = {
    val bw = new BitWriter
    bw.u(8, p.profile)
    bw.u(8, 0) // constraint flags + reserved
    bw.u(8, p.level)
    bw.ue(p.spsId)
    if (p.profile == 100) {
      bw.ue(1) // chroma_format_idc: 4:2:0
      bw.ue(0) // bit_depth_luma_minus8
      bw.ue(0) // bit_depth_chroma_minus8
      bw.bit(0) // qpprime_y_zero_transform_bypass
      bw.bit(0) // seq_scaling_matrix_present
    }
    bw.ue(p.log2MaxFrameNum4)
    bw.ue(p.pocType)
    if (p.pocType == 0) bw.ue(p.log2MaxFrameNum4 % 5)
    else if (p.pocType == 1) {
      bw.bit(1) // delta_pic_order_always_zero
      bw.se(-2) // offset_for_non_ref_pic
      bw.se(3) // offset_for_top_to_bottom_field
      val n = (p.spsId % 3)
      bw.ue(n)
      (1 to n).foreach(i => bw.se(if (i % 2 == 0) i else -i))
    }
    bw.ue(p.maxRef)
    bw.bit(0) // gaps_in_frame_num_value_allowed
    val mbsW = (p.w + 15) / 16
    val muH = if (p.frameMbsOnly == 1) (p.h + 15) / 16
    else (p.h + 31) / 32
    bw.ue(mbsW - 1)
    bw.ue(muH - 1)
    bw.bit(p.frameMbsOnly)
    if (p.frameMbsOnly == 0) bw.bit(0) // mb_adaptive_frame_field
    bw.bit(1) // direct_8x8_inference
    val cropR = (mbsW * 16 - p.w) / 2 // CropUnitX = 2 (4:2:0)
    val cropB = // CropUnitY = 2 * (2 - frame_mbs_only)
      if (p.frameMbsOnly == 1) (muH * 16 - p.h) / 2
      else (muH * 32 - p.h) / 4
    if (cropR > 0 || cropB > 0) {
      bw.bit(1)
      bw.ue(0); bw.ue(cropR); bw.ue(0); bw.ue(cropB)
    } else bw.bit(0)
    bw.bit(0) // vui_parameters_present
    bw.stopAlign()
    bw.bytes
  }

  /** SEI user_data_unregistered with an all-zero UUID + `extra`
    * zero payload bytes — guaranteed emulation-prevention work. */
  private def seiRbsp(extra: Int): Array[Byte] = {
    val bw = new BitWriter
    bw.u(8, 5) // last_payload_type: user_data_unregistered
    bw.u(8, 16 + extra) // last_payload_size
    (0 until 16 + extra).foreach(_ => bw.u(8, 0))
    bw.stopAlign()
    bw.bytes
  }

  private val Start4 = Array[Byte](0, 0, 0, 1)
  private val Start3 = Array[Byte](0, 0, 1)

  /** The complete four-NAL Annex-B stream for one document. */
  def annexB(docId: Long): Array[Byte] = {
    val p = paramsOf(docId)
    val sps = escapeRbsp(spsRbsp(p))
    val sei = escapeRbsp(seiRbsp((docId % 8).toInt))
    Array.concat(
      Start4, Array[Byte](0x09, 0x10), // AUD: primary_pic_type 0
      Start3, Array[Byte](0x06) ++ sei,
      Start3, Array[Byte](0x67) ++ sps, // nal_ref_idc 3, type 7
      Start4, Array[Byte](0x68, 0xCE.toByte, 0x38, 0x80.toByte)) // PPS
  }

  // ----------------------------------------------------------------
  // PCM-coded picture fixture (`mm_h264_pcm`): a CONFORMANT
  // baseline stream whose single IDR slice codes every macroblock as
  // I_PCM (mb_type 25, §7.3.5 / Table 7-11) — raw luma + chroma
  // samples carried bit-exactly in the bitstream behind the
  // variable-length slice header and emulation-prevention escaping.
  // ----------------------------------------------------------------

  /** Deterministic PCM geometry/sample rules, mirrored by the
    * mm_h264_pcm oracle SQL — keep in lockstep. Dimensions are
    * multiples of 16 (no cropping): 1 MB row, 1–2 MB columns. */
  def pcmDims(docId: Long): (Int, Int) =
    (16 * (1 + (docId % 2).toInt), 16)

  /** pcm_sample_luma k (raster order within MB `mb`). The first
    * three samples of every macroblock are 0 — a guaranteed
    * `00 00 00` byte run in the RBSP, so EVERY stream forces real
    * emulation-prevention escaping through the decoder's unescape
    * (the step-5 congruence of the remaining samples never repeats a
    * byte, which would otherwise make escapes vanishingly rare). */
  def pcmLuma(docId: Long, mb: Int, k: Int): Int =
    if (k < 3) 0 else ((docId * 7 + mb * 31 + k * 5) % 256).toInt

  /** pcm_sample_chroma: Cb (c = 0) then Cr (c = 1), 8×8 each. */
  def pcmChroma(docId: Long, mb: Int, c: Int, k: Int): Int =
    ((docId * 11 + mb * 17 + c * 29 + k * 3) % 256).toInt

  /** SPS for the PCM stream: baseline 66, frame MBs only, POC type
    * 0, 4-bit frame_num / poc_lsb, no cropping. */
  def pcmParams(docId: Long): Params = {
    val (w, h) = pcmDims(docId)
    Params(profile = 66, level = 10, w = w, h = h, frameMbsOnly = 1,
      pocType = 0, spsId = 0, log2MaxFrameNum4 = 0, maxRef = 0)
  }

  /** IDR slice RBSP (§7.3.3 header + §7.3.5 I_PCM macroblocks),
    * UNescaped. Header fields match the fixed PPS (entropy CAVLC,
    * no deblocking override, no field pics). */
  def idrPcmSliceRbsp(docId: Long): Array[Byte] = {
    val (w, h) = pcmDims(docId)
    val nMbs = (w / 16) * (h / 16)
    val bw = new BitWriter
    bw.ue(0) // first_mb_in_slice
    bw.ue(7) // slice_type: I (all slices of the picture)
    bw.ue(0) // pic_parameter_set_id
    bw.u(4, 0) // frame_num: u(log2_max_frame_num) = u(4)
    bw.ue((docId % 4).toInt) // idr_pic_id
    bw.u(4, 0) // pic_order_cnt_lsb: u(4), POC type 0
    bw.bit(0) // no_output_of_prior_pics_flag (IDR ref marking)
    bw.bit(0) // long_term_reference_flag
    bw.se(0) // slice_qp_delta
    var mb = 0
    while (mb < nMbs) {
      bw.ue(25) // mb_type: I_PCM
      bw.stopPcmAlign() // pcm_alignment_zero_bit*
      var k = 0
      while (k < 256) { bw.u(8, pcmLuma(docId, mb, k)); k += 1 }
      var c = 0
      while (c < 2) {
        k = 0
        while (k < 64) { bw.u(8, pcmChroma(docId, mb, c, k)); k += 1 }
        c += 1
      }
      mb += 1
    }
    bw.stopAlign() // rbsp_trailing_bits
    bw.bytes
  }

  // ---- chroma-DC CAVLC fixture (mm_h264_cavlc) ----
  // deterministic per-document residual parameters, the oracle's
  // closed-form basis ([[Mp3SideFixture]]'s discipline)

  def cavlcMbs(d: Long): Int = 1 + (d % 3).toInt
  /** SPS: baseline, cavlcMbs × 1 macroblocks, no cropping. */
  def cavlcParams(d: Long): Params =
    Params(profile = 66, level = 10, w = 16 * cavlcMbs(d), h = 16,
      frameMbsOnly = 1, pocType = 0, spsId = 0, log2MaxFrameNum4 = 0,
      maxRef = 0)
  /** I_16x16 prediction mode 0..3 → mb_type 5..8 (Table 7-11:
    * 1 + pred + 4·chromaCBP, chroma CBP 1, luma CBP 0). */
  def cavlcPred(d: Long, mb: Int): Int = ((d + mb) % 4).toInt
  def cavlcIcp(d: Long, mb: Int): Int = ((d + mb * 2) % 4).toInt
  def cavlcQpd(d: Long, mb: Int): Int = ((d + mb) % 5).toInt - 2
  /** TotalCoeff / TrailingOnes of chroma-DC block `u` (Cb 0, Cr 1). */
  def cavlcTc(d: Long, mb: Int, u: Int): Int =
    ((d + mb * 3 + u * 2) % 5).toInt
  def cavlcT1(d: Long, mb: Int, u: Int): Int =
    math.min(cavlcTc(d, mb, u), ((d + mb + u) % 4).toInt)
  /** 1 = negative trailing one j. */
  def cavlcTrailSign(d: Long, mb: Int, u: Int, j: Int): Int =
    ((d + mb + u + j) % 2).toInt
  /** |level| of non-trailing coefficient j — ≥ 2 (a ±1 outside the
    * trailing run would be non-conformant with T1 < 3's +2 shift). */
  def cavlcLevelAbs(d: Long, mb: Int, u: Int, j: Int): Int =
    2 + ((d + mb * 5 + u * 7 + j * 3) % 3).toInt
  def cavlcLevelNeg(d: Long, mb: Int, u: Int, j: Int): Int =
    ((d + u + j) % 2).toInt
  def cavlcTz(d: Long, mb: Int, u: Int): Int = {
    val tc = cavlcTc(d, mb, u)
    if (tc == 0 || tc == 4) 0 else ((d + mb + u) % (5 - tc)).toInt
  }
  /** run_before of coefficient i given the zeros still undistributed. */
  def cavlcRun(d: Long, mb: Int, u: Int, i: Int, zerosLeft: Int): Int =
    ((d + mb + u + i) % (zerosLeft + 1)).toInt

  private def writeVlc(bw: BitWriter, t: Mp3Headers.BvTable,
      x: Int, y: Int): Unit = {
    val e = (0 until t.code.length)
      .find(e => t.xs(e) == x && t.ys(e) == y).get
    bw.u(t.len(e), t.code(e))
  }

  /** Encode one §9.2 chroma-DC residual block — the exact inverse
    * the decoder must walk. */
  private def writeChromaDc(bw: BitWriter, d: Long, mb: Int,
      u: Int): Unit = {
    val tc = cavlcTc(d, mb, u); val t1 = cavlcT1(d, mb, u)
    writeVlc(bw, H264Cavlc.ChromaDcCoeffToken, tc, t1)
    for (j <- 0 until t1) bw.bit(cavlcTrailSign(d, mb, u, j))
    var sl = 0
    for (j <- 0 until tc - t1) {
      val abs = cavlcLevelAbs(d, mb, u, j)
      val neg = cavlcLevelNeg(d, mb, u, j)
      var levelCode = (abs - 1) * 2 + neg
      if (j == 0 && t1 < 3) levelCode -= 2
      val prefix = levelCode >> sl
      require(prefix < 14, "fixture level escaped the verified range")
      for (_ <- 0 until prefix) bw.bit(0)
      bw.bit(1)
      if (sl > 0) bw.u(sl, levelCode & ((1 << sl) - 1))
      // sequential, not else-if — mirrors H264Cavlc §9.2.2 exactly
      if (sl == 0) sl = 1
      if (abs > (3 << (sl - 1)) && sl < 6) sl += 1
    }
    if (tc > 0 && tc < 4)
      writeVlc(bw, H264Cavlc.TotalZerosChromaDc(tc),
        cavlcTz(d, mb, u), 0)
    var zerosLeft = cavlcTz(d, mb, u)
    var i = 0
    while (i < tc - 1 && zerosLeft > 0) {
      val run = cavlcRun(d, mb, u, i, zerosLeft)
      writeVlc(bw, H264Cavlc.RunBefore(zerosLeft), run, 0)
      zerosLeft -= run
      i += 1
    }
  }

  /** IDR slice RBSP whose macroblocks are I_16x16 with chroma CBP 1
    * / luma CBP 0: empty luma DC (the 1-bit TotalCoeff-0 codeword)
    * + two REAL chroma-DC CAVLC residual blocks each. */
  def cavlcSliceRbsp(d: Long): Array[Byte] = {
    val bw = new BitWriter
    bw.ue(0) // first_mb_in_slice
    bw.ue(7) // slice_type: I (all slices)
    bw.ue(0) // pic_parameter_set_id
    bw.u(4, 0) // frame_num
    bw.ue((d % 4).toInt) // idr_pic_id
    bw.u(4, 0) // pic_order_cnt_lsb
    bw.bit(0); bw.bit(0) // IDR ref marking flags
    bw.se(0) // slice_qp_delta
    for (mb <- 0 until cavlcMbs(d)) {
      bw.ue(5 + cavlcPred(d, mb)) // mb_type: I_16x16_<pred>_1_0
      bw.ue(cavlcIcp(d, mb)) // intra_chroma_pred_mode
      bw.se(cavlcQpd(d, mb)) // mb_qp_delta
      bw.bit(1) // Intra16x16DCLevel: TotalCoeff 0 under nC = 0
      writeChromaDc(bw, d, mb, 0)
      writeChromaDc(bw, d, mb, 1)
    }
    bw.stopAlign()
    bw.bytes
  }

  // ---- luma-DC CAVLC fixture (mm_h264_cavlc_luma) ----
  // chroma CBP 0 / luma CBP 0 I_16x16 macroblocks whose ONE residual
  // block is Intra16x16DCLevel with REAL coefficients: the full
  // 0 ≤ nC < 2 coeff_token column, level escapes (prefix 14 and 15),
  // 4x4-class total_zeros and the full run_before table all engage.
  // Same closed-form-parameter discipline as the chroma lane.

  def lumaMbs(d: Long): Int = 1 + (d % 3).toInt
  def lumaPred(d: Long, mb: Int): Int = ((d + mb) % 4).toInt
  def lumaIcp(d: Long, mb: Int): Int = ((d + mb * 2) % 4).toInt
  def lumaQpd(d: Long, mb: Int): Int = ((d + mb) % 5).toInt - 2
  /** TotalCoeff 0..16 — every coeff_token column entry class. */
  def lumaTc(d: Long, mb: Int): Int = ((d * 3 + mb * 7) % 17).toInt
  def lumaT1(d: Long, mb: Int): Int =
    math.min(lumaTc(d, mb), ((d + mb) % 4).toInt)
  def lumaTrailSign(d: Long, mb: Int, j: Int): Int =
    ((d + mb + j) % 2).toInt
  /** |level| 2..20 — crosses both escape thresholds (levelCode ≥ 28
    * hits the prefix-14 four-bit suffix at suffixLength 0,
    * ≥ 30 the prefix-15 twelve-bit one). */
  def lumaLevelAbs(d: Long, mb: Int, j: Int): Int =
    2 + ((d + mb * 5 + j * 3) % 19).toInt
  def lumaLevelNeg(d: Long, mb: Int, j: Int): Int =
    ((d + mb * 2 + j) % 2).toInt
  def lumaTz(d: Long, mb: Int): Int = {
    val tc = lumaTc(d, mb)
    if (tc == 0 || tc == 16) 0 else ((d + mb) % (17 - tc)).toInt
  }
  def lumaRun(d: Long, mb: Int, i: Int, zerosLeft: Int): Int =
    ((d + mb + i) % (zerosLeft + 1)).toInt

  /** §9.2.2.1 inverse: emit levelCode under suffixLength `sl` —
    * normal prefixes, the prefix-14 (sl = 0) four-bit escape, and
    * the prefix-15 twelve-bit escape. */
  private def writeLevel(bw: BitWriter, levelCode: Int, sl: Int): Unit = {
    def zerosThenOne(n: Int): Unit = {
      for (_ <- 0 until n) bw.bit(0); bw.bit(1)
    }
    if (sl > 0) {
      val prefix = levelCode >> sl
      if (prefix < 15) {
        zerosThenOne(prefix)
        bw.u(sl, levelCode & ((1 << sl) - 1))
      } else {
        val suffix = levelCode - (15 << sl)
        require(suffix >= 0 && suffix < 4096,
          "fixture level escaped the prefix-15 range")
        zerosThenOne(15)
        bw.u(12, suffix)
      }
    } else if (levelCode < 14) zerosThenOne(levelCode)
    else if (levelCode < 30) {
      zerosThenOne(14)
      bw.u(4, levelCode - 14)
    } else {
      val suffix = levelCode - 30
      require(suffix < 4096, "fixture level escaped the prefix-15 range")
      zerosThenOne(15)
      bw.u(12, suffix)
    }
  }

  /** Encode one Intra16x16DCLevel residual block (the 0 ≤ nC < 2
    * column) — the exact inverse of the decoder's generalized
    * residual walk. */
  private def writeLumaDc(bw: BitWriter, d: Long, mb: Int): Unit = {
    val tc = lumaTc(d, mb); val t1 = lumaT1(d, mb)
    writeVlc(bw, H264Cavlc.LumaCoeffToken01, tc, t1)
    for (j <- 0 until t1) bw.bit(lumaTrailSign(d, mb, j))
    var sl = if (tc > 10 && t1 < 3) 1 else 0
    for (j <- 0 until tc - t1) {
      val abs = lumaLevelAbs(d, mb, j)
      val neg = lumaLevelNeg(d, mb, j)
      var levelCode = (abs - 1) * 2 + neg
      if (j == 0 && t1 < 3) levelCode -= 2
      writeLevel(bw, levelCode, sl)
      // sequential, mirroring the decoder
      if (sl == 0) sl = 1
      if (abs > (3 << (sl - 1)) && sl < 6) sl += 1
    }
    if (tc > 0 && tc < 16)
      writeVlc(bw, H264Cavlc.TotalZeros4x4(tc), lumaTz(d, mb), 0)
    var zerosLeft = lumaTz(d, mb)
    var i = 0
    while (i < tc - 1 && zerosLeft > 0) {
      val run = lumaRun(d, mb, i, zerosLeft)
      writeVlc(bw, H264Cavlc.RunBefore(math.min(zerosLeft, 7)), run, 0)
      zerosLeft -= run
      i += 1
    }
  }

  /** IDR slice RBSP whose macroblocks are I_16x16 with chroma CBP 0
    * / luma CBP 0: ONE real luma-DC CAVLC residual block each. */
  def cavlcLumaSliceRbsp(d: Long): Array[Byte] = {
    val bw = new BitWriter
    bw.ue(0) // first_mb_in_slice
    bw.ue(7) // slice_type: I (all slices)
    bw.ue(0) // pic_parameter_set_id
    bw.u(4, 0) // frame_num
    bw.ue((d % 4).toInt) // idr_pic_id
    bw.u(4, 0) // pic_order_cnt_lsb
    bw.bit(0); bw.bit(0) // IDR ref marking flags
    bw.se(0) // slice_qp_delta
    for (mb <- 0 until lumaMbs(d)) {
      bw.ue(1 + lumaPred(d, mb)) // mb_type: I_16x16_<pred>_0_0
      bw.ue(lumaIcp(d, mb)) // intra_chroma_pred_mode
      bw.se(lumaQpd(d, mb)) // mb_qp_delta
      writeLumaDc(bw, d, mb)
    }
    bw.stopAlign()
    bw.bytes
  }

  /** SPS for the luma lane: one MB row (nC = 0 by geometry). */
  def cavlcLumaParams(d: Long): Params =
    Params(profile = 66, level = 10, w = 16 * lumaMbs(d), h = 16,
      frameMbsOnly = 1, pocType = 0, spsId = 0, log2MaxFrameNum4 = 0,
      maxRef = 0)

  /** Three-NAL luma-DC CAVLC stream: SPS, PPS, IDR slice. */
  def annexBCavlcLuma(d: Long): Array[Byte] = {
    val sps = escapeRbsp(spsRbsp(cavlcLumaParams(d)))
    val slice = escapeRbsp(cavlcLumaSliceRbsp(d))
    Array.concat(
      Start4, Array[Byte](0x67) ++ sps,
      Start4, Array[Byte](0x68, 0xCE.toByte, 0x38, 0x80.toByte),
      Start4, Array[Byte](0x65) ++ slice)
  }

  // ---- luma-AC CAVLC fixture (mm_h264_cavlc_ac) ----
  // I_16x16 macroblocks with luma CBP 15 / chroma CBP 0: a real
  // Intra16x16DCLevel block (the luma lane's parameter rules) then
  // SIXTEEN Intra16x16ACLevel blocks, each encoded through the
  // Table 9-5 column its forward-computed §9.2.1 nC selects. The
  // writer derives the neighbour relation from RASTER COORDINATES —
  // an independent spelling of the decoder's transcribed index
  // arrays; the oracle SQL holds a third, relational, one.

  def acMbs(d: Long): Int = 1 + (d % 3).toInt
  def acPred(d: Long, mb: Int): Int = ((d + mb) % 4).toInt
  def acIcp(d: Long, mb: Int): Int = ((d + mb * 2) % 4).toInt
  def acQpd(d: Long, mb: Int): Int = ((d + mb) % 5).toInt - 2
  /** AC TotalCoeff ∈ {0, 1, 2, 3, 15} — a set CLOSED under the
    * §9.2.1 nC formula: every nC any neighbour pair from this set
    * can produce lands in a SHIPPED coeff_token band
    * ([0, 4) ∪ [8, ∞)); the 15s push their right/bottom neighbours
    * into the 6-bit FLC column. (14 would not do: (0 + 14 + 1) >> 1
    * = 7 lands in the declared fail-closed band.) The selector
    * modulus is 7 — COPRIME with acMbs's d % 3, so block 5's TC
    * reaches 15 on multi-MB documents and the DC block genuinely
    * routes through the FLC column (a mod-6 selector provably never
    * gets there). */
  def acTc(d: Long, mb: Int, b: Int): Int =
    Array(0, 1, 2, 3, 15, 2, 1)(((d + mb * 3 + b * 5) % 7).toInt)
  def acT1(d: Long, mb: Int, b: Int): Int =
    math.min(acTc(d, mb, b), ((d + mb + b) % 4).toInt)
  def acTrailSign(d: Long, mb: Int, b: Int, j: Int): Int =
    ((d + mb + b + j) % 2).toInt
  def acLevelAbs(d: Long, mb: Int, b: Int, j: Int): Int =
    2 + ((d + mb * 5 + b * 7 + j * 3) % 19).toInt
  def acLevelNeg(d: Long, mb: Int, b: Int, j: Int): Int =
    ((d + mb * 2 + b + j) % 2).toInt
  def acTz(d: Long, mb: Int, b: Int): Int = {
    val tc = acTc(d, mb, b)
    // maxNumCoeff 15: at most 15 − tc zeros precede the coefficients
    if (tc == 0 || tc == 15) 0 else ((d + mb + b) % (16 - tc)).toInt
  }
  def acRun(d: Long, mb: Int, b: Int, i: Int, zerosLeft: Int): Int =
    ((d + mb + b + i) % (zerosLeft + 1)).toInt

  /** luma4x4BlkIdx → (xB, yB) in 4-sample units — §6.4.3's inverse
    * scan derived from the raster formula, NOT the decoder's
    * transcribed arrays. */
  private val acBlkXy: Array[(Int, Int)] = Array.tabulate(16) { i =>
    (2 * ((i >> 2) & 1) + (i & 1), 2 * ((i >> 3) & 1) + ((i >> 1) & 1))
  }
  private val acXyBlk: Map[(Int, Int), Int] =
    acBlkXy.zipWithIndex.toMap

  /** Forward §9.2.1 nC of AC block `b` of macroblock `mb`, replayed
    * from the closed-form TCs over the coordinate-derived
    * neighbours. Mirrored relationally by the mm_h264_cavlc_ac
    * oracle — keep the two in lockstep. */
  def acNc(d: Long, mb: Int, b: Int): Int = {
    val (x, y) = acBlkXy(b)
    val hasA = x > 0 || mb > 0
    val nA =
      if (x > 0) acTc(d, mb, acXyBlk((x - 1, y)))
      else if (mb > 0) acTc(d, mb - 1, acXyBlk((3, y)))
      else 0
    val hasB = y > 0
    val nB = if (hasB) acTc(d, mb, acXyBlk((x, y - 1))) else 0
    if (hasA && hasB) (nA + nB + 1) >> 1
    else if (hasA) nA
    else if (hasB) nB
    else 0
  }

  /** nC of macroblock `mb`'s Intra16x16DCLevel block — derived as
    * for block 0 (§9.2.1): the left MB's x = 12 / y = 0 block (index
    * 5), whose count is its AC TotalCoeff. */
  def acDcNc(d: Long, mb: Int): Int =
    if (mb == 0) 0 else acTc(d, mb - 1, 5)

  /** coeff_token routed by nC — the writer-side inverse of
    * [[H264Cavlc.residualBlockNc]]'s dispatch: the two transcribed
    * VLC columns, or the algebraic 6-bit FLC past nC 8. */
  private def writeTokenNc(bw: BitWriter, nC: Int, tc: Int,
      t1: Int): Unit =
    if (nC >= 8) bw.u(6, if (tc == 0) 3 else ((tc - 1) << 2) | t1)
    else {
      require(nC < 4, "fixture nC escaped the shipped columns")
      writeVlc(bw,
        if (nC < 2) H264Cavlc.LumaCoeffToken01
        else H264Cavlc.LumaCoeffToken23, tc, t1)
    }

  /** Encode one residual block of the AC lane (DC or AC class) —
    * the generalized inverse of the decoder's residual walk, routed
    * by the caller's forward-computed nC. */
  private def writeNcBlock(bw: BitWriter, nC: Int, tc: Int, t1: Int,
      sign: Int => Int, abs: Int => Int, neg: Int => Int, tzv: Int,
      run: (Int, Int) => Int, maxCoeff: Int): Unit = {
    writeTokenNc(bw, nC, tc, t1)
    for (j <- 0 until t1) bw.bit(sign(j))
    var sl = if (tc > 10 && t1 < 3) 1 else 0
    for (j <- 0 until tc - t1) {
      val a = abs(j)
      var levelCode = (a - 1) * 2 + neg(j)
      if (j == 0 && t1 < 3) levelCode -= 2
      writeLevel(bw, levelCode, sl)
      // sequential, mirroring the decoder
      if (sl == 0) sl = 1
      if (a > (3 << (sl - 1)) && sl < 6) sl += 1
    }
    if (tc > 0 && tc < maxCoeff)
      writeVlc(bw, H264Cavlc.TotalZeros4x4(tc), tzv, 0)
    var zerosLeft = tzv
    var i = 0
    while (i < tc - 1 && zerosLeft > 0) {
      val rv = run(i, zerosLeft)
      writeVlc(bw, H264Cavlc.RunBefore(math.min(zerosLeft, 7)), rv, 0)
      zerosLeft -= rv
      i += 1
    }
  }

  /** IDR slice RBSP whose macroblocks are I_16x16 with luma CBP 15
    * / chroma CBP 0: one real DC block then SIXTEEN real AC blocks
    * each, every block's coeff_token column selected by its
    * forward-replayed nC. */
  def cavlcAcSliceRbsp(d: Long): Array[Byte] = {
    val bw = new BitWriter
    bw.ue(0) // first_mb_in_slice
    bw.ue(7) // slice_type: I (all slices)
    bw.ue(0) // pic_parameter_set_id
    bw.u(4, 0) // frame_num
    bw.ue((d % 4).toInt) // idr_pic_id
    bw.u(4, 0) // pic_order_cnt_lsb
    bw.bit(0); bw.bit(0) // IDR ref marking flags
    bw.se(0) // slice_qp_delta
    for (mb <- 0 until acMbs(d)) {
      bw.ue(13 + acPred(d, mb)) // mb_type: I_16x16_<pred>_0_1
      bw.ue(acIcp(d, mb)) // intra_chroma_pred_mode
      bw.se(acQpd(d, mb)) // mb_qp_delta
      writeNcBlock(bw, acDcNc(d, mb), lumaTc(d, mb), lumaT1(d, mb),
        j => lumaTrailSign(d, mb, j), j => lumaLevelAbs(d, mb, j),
        j => lumaLevelNeg(d, mb, j), lumaTz(d, mb),
        (i, zl) => lumaRun(d, mb, i, zl), 16)
      for (b <- 0 until 16)
        writeNcBlock(bw, acNc(d, mb, b), acTc(d, mb, b),
          acT1(d, mb, b),
          j => acTrailSign(d, mb, b, j),
          j => acLevelAbs(d, mb, b, j),
          j => acLevelNeg(d, mb, b, j), acTz(d, mb, b),
          (i, zl) => acRun(d, mb, b, i, zl), 15)
    }
    bw.stopAlign()
    bw.bytes
  }

  /** SPS for the AC lane: one MB row (top neighbours = picture
    * edge). */
  def cavlcAcParams(d: Long): Params =
    Params(profile = 66, level = 10, w = 16 * acMbs(d), h = 16,
      frameMbsOnly = 1, pocType = 0, spsId = 0, log2MaxFrameNum4 = 0,
      maxRef = 0)

  /** Three-NAL luma-AC CAVLC stream: SPS, PPS, IDR slice. */
  def annexBCavlcAc(d: Long): Array[Byte] = {
    val sps = escapeRbsp(spsRbsp(cavlcAcParams(d)))
    val slice = escapeRbsp(cavlcAcSliceRbsp(d))
    Array.concat(
      Start4, Array[Byte](0x67) ++ sps,
      Start4, Array[Byte](0x68, 0xCE.toByte, 0x38, 0x80.toByte),
      Start4, Array[Byte](0x65) ++ slice)
  }

  // ---- complete-macroblock CAVLC fixture (mm_h264_cavlc_mb) ----
  // I_16x16 with chroma CBP 2 / luma CBP 15: EVERY residual class
  // of the picture family — luma DC (the luma lane's rules), sixteen
  // luma AC (the AC lane's), two chroma DC (the chroma lane's), and
  // eight chroma AC blocks with their own closed forms below.

  /** Chroma-AC TotalCoeff ∈ {0, 1, 2, 3, 15} — the same
    * nC-closure set as the luma AC rule, mod-7 selector. */
  def cacTc(d: Long, mb: Int, u: Int, c: Int): Int =
    Array(0, 1, 2, 3, 15, 2, 1)(((d + mb * 3 + u * 2 + c * 5) % 7)
      .toInt)
  def cacT1(d: Long, mb: Int, u: Int, c: Int): Int =
    math.min(cacTc(d, mb, u, c), ((d + mb + u + c) % 4).toInt)
  def cacTrailSign(d: Long, mb: Int, u: Int, c: Int, j: Int): Int =
    ((d + mb + u + c + j) % 2).toInt
  def cacLevelAbs(d: Long, mb: Int, u: Int, c: Int, j: Int): Int =
    2 + ((d + mb * 5 + u * 11 + c * 7 + j * 3) % 19).toInt
  def cacLevelNeg(d: Long, mb: Int, u: Int, c: Int, j: Int): Int =
    ((d + mb * 2 + u + c + j) % 2).toInt
  def cacTz(d: Long, mb: Int, u: Int, c: Int): Int = {
    val tc = cacTc(d, mb, u, c)
    if (tc == 0 || tc == 15) 0
    else ((d + mb + u + c) % (16 - tc)).toInt
  }
  def cacRun(d: Long, mb: Int, u: Int, c: Int, i: Int,
      zerosLeft: Int): Int =
    ((d + mb + u + c + i) % (zerosLeft + 1)).toInt

  /** Forward §9.2.1 nC of chroma AC block `c` of component `u` —
    * the 2×2 chroma grid spelled from coordinates (xb = c % 2,
    * yb = c / 2), independent of the decoder's transcribed arrays;
    * the oracle holds the relational third spelling. */
  def cacNc(d: Long, mb: Int, u: Int, c: Int): Int = {
    val x = c % 2; val y = c / 2
    val hasA = x > 0 || mb > 0
    val nA =
      if (x > 0) cacTc(d, mb, u, y * 2)
      else if (mb > 0) cacTc(d, mb - 1, u, y * 2 + 1)
      else 0
    val hasB = y > 0
    val nB = if (hasB) cacTc(d, mb, u, c - 2) else 0
    if (hasA && hasB) (nA + nB + 1) >> 1
    else if (hasA) nA
    else if (hasB) nB
    else 0
  }

  /** IDR slice RBSP whose macroblocks are I_16x16 with chroma CBP 2
    * / luma CBP 15 — the COMPLETE §7.3.5.3.3 residual sequence, all
    * four block classes real. */
  def cavlcMbSliceRbsp(d: Long): Array[Byte] = {
    val bw = new BitWriter
    bw.ue(0) // first_mb_in_slice
    bw.ue(7) // slice_type: I (all slices)
    bw.ue(0) // pic_parameter_set_id
    bw.u(4, 0) // frame_num
    bw.ue((d % 4).toInt) // idr_pic_id
    bw.u(4, 0) // pic_order_cnt_lsb
    bw.bit(0); bw.bit(0) // IDR ref marking flags
    bw.se(0) // slice_qp_delta
    for (mb <- 0 until acMbs(d)) {
      bw.ue(21 + acPred(d, mb)) // mb_type: I_16x16_<pred>_2_1
      bw.ue(acIcp(d, mb)) // intra_chroma_pred_mode
      bw.se(acQpd(d, mb)) // mb_qp_delta
      writeNcBlock(bw, acDcNc(d, mb), lumaTc(d, mb), lumaT1(d, mb),
        j => lumaTrailSign(d, mb, j), j => lumaLevelAbs(d, mb, j),
        j => lumaLevelNeg(d, mb, j), lumaTz(d, mb),
        (i, zl) => lumaRun(d, mb, i, zl), 16)
      for (b <- 0 until 16)
        writeNcBlock(bw, acNc(d, mb, b), acTc(d, mb, b),
          acT1(d, mb, b),
          j => acTrailSign(d, mb, b, j),
          j => acLevelAbs(d, mb, b, j),
          j => acLevelNeg(d, mb, b, j), acTz(d, mb, b),
          (i, zl) => acRun(d, mb, b, i, zl), 15)
      writeChromaDc(bw, d, mb, 0)
      writeChromaDc(bw, d, mb, 1)
      for (u <- 0 to 1; c <- 0 until 4)
        writeNcBlock(bw, cacNc(d, mb, u, c), cacTc(d, mb, u, c),
          cacT1(d, mb, u, c),
          j => cacTrailSign(d, mb, u, c, j),
          j => cacLevelAbs(d, mb, u, c, j),
          j => cacLevelNeg(d, mb, u, c, j), cacTz(d, mb, u, c),
          (i, zl) => cacRun(d, mb, u, c, i, zl), 15)
    }
    bw.stopAlign()
    bw.bytes
  }

  /** Three-NAL complete-macroblock CAVLC stream: SPS, PPS, IDR
    * slice. */
  def annexBCavlcMb(d: Long): Array[Byte] = {
    val sps = escapeRbsp(spsRbsp(cavlcAcParams(d)))
    val slice = escapeRbsp(cavlcMbSliceRbsp(d))
    Array.concat(
      Start4, Array[Byte](0x67) ++ sps,
      Start4, Array[Byte](0x68, 0xCE.toByte, 0x38, 0x80.toByte),
      Start4, Array[Byte](0x65) ++ slice)
  }

  /** IDR slice RBSP whose macroblocks carry BOTH residual classes:
    * a REAL luma-DC block (the luma lane's parameter rules) then
    * the two chroma-DC blocks (the chroma lane's) — mb_type
    * I_16x16_<pred>_1_0. */
  def cavlcFullSliceRbsp(d: Long): Array[Byte] = {
    val bw = new BitWriter
    bw.ue(0) // first_mb_in_slice
    bw.ue(7) // slice_type: I (all slices)
    bw.ue(0) // pic_parameter_set_id
    bw.u(4, 0) // frame_num
    bw.ue((d % 4).toInt) // idr_pic_id
    bw.u(4, 0) // pic_order_cnt_lsb
    bw.bit(0); bw.bit(0) // IDR ref marking flags
    bw.se(0) // slice_qp_delta
    for (mb <- 0 until cavlcMbs(d)) {
      bw.ue(5 + cavlcPred(d, mb)) // mb_type: I_16x16_<pred>_1_0
      bw.ue(cavlcIcp(d, mb)) // intra_chroma_pred_mode
      bw.se(cavlcQpd(d, mb)) // mb_qp_delta
      writeLumaDc(bw, d, mb)
      writeChromaDc(bw, d, mb, 0)
      writeChromaDc(bw, d, mb, 1)
    }
    bw.stopAlign()
    bw.bytes
  }

  /** Three-NAL combined-residual CAVLC stream: SPS, PPS, IDR
    * slice with real luma-DC AND chroma-DC blocks per macroblock. */
  def annexBCavlcFull(d: Long): Array[Byte] = {
    val sps = escapeRbsp(spsRbsp(cavlcParams(d)))
    val slice = escapeRbsp(cavlcFullSliceRbsp(d))
    Array.concat(
      Start4, Array[Byte](0x67) ++ sps,
      Start4, Array[Byte](0x68, 0xCE.toByte, 0x38, 0x80.toByte),
      Start4, Array[Byte](0x65) ++ slice)
  }

  /** Three-NAL chroma-DC CAVLC stream: SPS, PPS, IDR slice. */
  def annexBCavlc(d: Long): Array[Byte] = {
    val sps = escapeRbsp(spsRbsp(cavlcParams(d)))
    val slice = escapeRbsp(cavlcSliceRbsp(d))
    Array.concat(
      Start4, Array[Byte](0x67) ++ sps,
      Start4, Array[Byte](0x68, 0xCE.toByte, 0x38, 0x80.toByte),
      Start4, Array[Byte](0x65) ++ slice)
  }

  /** Three-NAL PCM stream: SPS, PPS, IDR slice — the sample-decode
    * fixture. */
  def annexBPcm(docId: Long): Array[Byte] = {
    val sps = escapeRbsp(spsRbsp(pcmParams(docId)))
    val slice = escapeRbsp(idrPcmSliceRbsp(docId))
    Array.concat(
      Start4, Array[Byte](0x67) ++ sps,
      Start4, Array[Byte](0x68, 0xCE.toByte, 0x38, 0x80.toByte),
      Start4, Array[Byte](0x65) ++ slice) // nal_ref_idc 3, type 5 IDR
  }
}
