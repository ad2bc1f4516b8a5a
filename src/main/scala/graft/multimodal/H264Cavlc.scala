package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow

/** REAL H.264 CAVLC residual decode for chroma-DC-coded pictures —
  * the entropy rung above [[H264Pcm]]'s raw-sample one: walk the
  * Annex-B stream to the coded slice (same SPS/PPS/slice-header
  * machinery), then decode every macroblock coded as
  * `I_16x16_<pred>_1_0` (Table 7-11: chroma CBP 1 = DC only, luma
  * CBP 0) — the §9.2 CAVLC residual walk over the two 2×2 chroma DC
  * blocks per macroblock: coeff_token, trailing-one sign bits, the
  * §9.2.2 level prefix/suffix ladder with its suffixLength
  * adaptation, total_zeros, and run_before. One mis-walked codeword,
  * sign bit or run desynchronizes every following field and fails
  * closed at the rbsp trailing check.
  *
  * Why chroma DC: its coeff_token class is FIXED (nC = −1 for
  * 4:2:0), so the only Table 9-5 column needed is the small
  * chroma-DC one — transcribable with the same Kraft/prefix
  * construction self-check the MP3 big-values tables carry
  * ([[Mp3Headers.BvTable]] discipline; no codec in this container to
  * pin the constants against, so the tables validate their own
  * completeness and the fixture oracle replays the census
  * positionally). The luma side stays structurally honest without
  * the big luma coeff_token columns: I_16x16 always codes its luma
  * DC block, and with every macroblock's luma TotalCoeff 0 the
  * neighbour-predicted nC stays 0, whose TotalCoeff-0 codeword is
  * the single bit `1` — the one entry of the 0 ≤ nC < 2 column this
  * walk admits (anything else fails closed as outside the verified
  * subset).
  *
  * Scope (declared, never a guess — None otherwise): baseline-class
  * CAVLC streams, frame MBs, a single I slice at macroblock 0,
  * every macroblock I_16x16 with chroma CBP 1 / luma CBP 0 / empty
  * luma DC, level_prefix < 14 (the ≥14 escape arithmetic stays
  * outside the verified subset). Everything else — Intra_4x4, luma
  * residual, chroma AC, the full Table 9-5 — remains behind the
  * declared stub.
  *
  * Reference: ISO/IEC 14496-10 §7.3.5 (macroblock_layer), §7.4.5
  * (Table 7-11 I_16x16 algebra), §9.2.1–9.2.4 (CAVLC parsing) —
  * public spec arithmetic reimplemented from scratch.
  */
object H264Cavlc {

  import H264Headers.{BitReader, unescapeRbsp}
  import Mp3Headers.BvTable // the (code, len, x, y) VLC container

  /** Chroma-DC coeff_token (Table 9-5, nC == −1 column): x =
    * TotalCoeff, y = TrailingOnes. Kraft/prefix-validated at load. */
  private[multimodal] val ChromaDcCoeffToken = new BvTable(0, Seq(
    (1, 2, 0, 0),
    (7, 6, 1, 0), (1, 1, 1, 1),
    (4, 6, 2, 0), (6, 6, 2, 1), (1, 3, 2, 2),
    (3, 6, 3, 0), (3, 7, 3, 1), (2, 7, 3, 2), (5, 6, 3, 3),
    (2, 6, 4, 0), (3, 8, 4, 1), (2, 8, 4, 2), (0, 7, 4, 3)))

  /** total_zeros for 2×2 chroma DC (Table 9-9(a)), by TotalCoeff
    * 1..3: x = total_zeros, y unused. */
  private[multimodal] val TotalZerosChromaDc: Map[Int, BvTable] = Map(
    1 -> new BvTable(0, Seq(
      (1, 1, 0, 0), (1, 2, 1, 0), (1, 3, 2, 0), (0, 3, 3, 0))),
    2 -> new BvTable(0, Seq(
      (1, 1, 0, 0), (1, 2, 1, 0), (0, 2, 2, 0))),
    3 -> new BvTable(0, Seq((1, 1, 0, 0), (0, 1, 1, 0))))

  /** run_before (Table 9-10), by zerosLeft 1..3 (a 2×2 block's
    * total_zeros never exceeds 3): x = run_before. */
  private[multimodal] val RunBefore: Map[Int, BvTable] = Map(
    1 -> new BvTable(0, Seq((1, 1, 0, 0), (0, 1, 1, 0))),
    2 -> new BvTable(0, Seq(
      (1, 1, 0, 0), (1, 2, 1, 0), (0, 2, 2, 0))),
    3 -> new BvTable(0, Seq(
      (3, 2, 0, 0), (2, 2, 1, 0), (1, 2, 2, 0), (0, 2, 3, 0))))

  /** Walk one VLC: accumulate bits until (code, len) matches. −1 on
    * no match within the table's longest code. */
  private def vlc(r: BitReader, t: BvTable): Int = {
    var acc = 0; var n = 0
    while (n < t.maxLen) {
      acc = (acc << 1) | r.u1(); n += 1
      var e = 0
      while (e < t.code.length) {
        if (t.len(e) == n && t.code(e) == acc) return e
        e += 1
      }
    }
    -1
  }

  /** Per-block census: (totalCoeff, trailingOnes, nNeg, sumLevels,
    * totalZeros). */
  private[multimodal] final class Block {
    var tc = 0; var t1 = 0; var nNeg = 0L; var sum = 0L; var tz = 0
  }

  /** §9.2 residual_block_cavlc for one 2×2 chroma DC block
    * (nC = −1, maxNumCoeff 4). Null on anything outside the
    * verified subset. */
  private[multimodal] def chromaDcBlock(r: BitReader): Block = {
    val e = vlc(r, ChromaDcCoeffToken)
    if (e < 0) return null
    val b = new Block
    b.tc = ChromaDcCoeffToken.xs(e)
    b.t1 = ChromaDcCoeffToken.ys(e)
    // trailing-one signs (§9.2.2: 1 = negative)
    var j = 0
    while (j < b.t1) {
      if (r.u1() == 1) { b.nNeg += 1; b.sum -= 1 } else b.sum += 1
      j += 1
    }
    // remaining levels through the prefix/suffix ladder
    var sl = 0 // suffixLength (TotalCoeff ≤ 10 here)
    j = 0
    while (j < b.tc - b.t1) {
      var prefix = 0
      while (r.u1() == 0) {
        prefix += 1
        if (prefix > 13) return null // escape arithmetic: out of scope
      }
      var levelCode = (prefix << sl) +
        (if (sl > 0) r.u(sl) else 0)
      if (j == 0 && b.t1 < 3) levelCode += 2
      val level =
        if (levelCode % 2 == 0) (levelCode + 2) >> 1
        else -((levelCode + 1) >> 1)
      if (level < 0) { b.nNeg += 1 }
      b.sum += level
      // §9.2.2 suffixLength adaptation — the two clauses apply
      // SEQUENTIALLY (JM: two independent ifs): a first level with
      // |level| > 3 bumps 0 → 1 → 2 before the next level reads
      if (sl == 0) sl = 1
      if (math.abs(level) > (3 << (sl - 1)) && sl < 6) sl += 1
      j += 1
    }
    // total_zeros (absent when the block is empty or full)
    if (b.tc > 0 && b.tc < 4) {
      val tzT = TotalZerosChromaDc(b.tc)
      val te = vlc(r, tzT)
      if (te < 0) return null
      b.tz = tzT.xs(te)
    }
    // run_before per coefficient (all but the last; zerosLeft 1..3)
    var zerosLeft = b.tz
    var i = 0
    while (i < b.tc - 1 && zerosLeft > 0) {
      val rt = RunBefore.getOrElse(zerosLeft, null)
      if (rt == null) return null
      val re = vlc(r, rt)
      if (re < 0) return null
      zerosLeft -= rt.xs(re)
      i += 1
    }
    if (zerosLeft < 0) return null
    b
  }

  /** Decode a chroma-DC-coded Annex-B stream →
    * (n_mbs, n_coeffs, n_t1, n_neg, sum_levels, sum_tz). */
  def decode(b: Array[Byte])
      : Option[(Long, Long, Long, Long, Long, Long)] = {
    if (b == null || b.length < 8) return None
    val n = b.length
    var starts = List.newBuilder[Int]
    var i = 0
    var zeros = 0
    while (i < n) {
      val v = b(i) & 0xff
      if (v == 1 && zeros >= 2) { starts += (i + 1); zeros = 0 }
      else if (v == 0) zeros += 1
      else zeros = 0
      i += 1
    }
    val ss = starts.result()
    if (ss.isEmpty) return None
    val bounds = ss.zip(ss.drop(1).map(_ - 3) :+ n)
    var sps: Option[(Int, Int, Int, Int, Int)] = None
    var pps: Option[(Boolean, Boolean, Boolean)] = None
    var slice: Option[(Int, Int, Array[Byte])] = None
    bounds.foreach { case (s, e) =>
      if (s < n) {
        val hdr = b(s) & 0xff
        if ((hdr & 0x80) == 0) (hdr & 0x1f) match {
          case 7 if sps.isEmpty =>
            sps = H264Pcm.spsForSlice(unescapeRbsp(b, s + 1, e))
          case 8 if pps.isEmpty =>
            pps = H264Pcm.ppsForSlice(unescapeRbsp(b, s + 1, e))
          case t @ (1 | 5) if slice.isEmpty =>
            slice = Some((t, (hdr >> 5) & 3, unescapeRbsp(b, s + 1, e)))
          case _ =>
        }
      }
    }
    (sps, pps, slice) match {
      case (Some((log2Fn, pocType, log2Poc, wMbs, hMbs)),
          Some((bottomField, deblocking, redundant)),
          Some((nalType, refIdc, rbsp))) =>
        try {
          val r = new BitReader(rbsp)
          if (r.ue() != 0) return None // first_mb_in_slice
          val sliceType = r.ue()
          if (sliceType != 2 && sliceType != 7) return None
          r.ue() // pic_parameter_set_id
          r.u(log2Fn) // frame_num
          val idr = nalType == 5
          if (idr) r.ue() // idr_pic_id
          if (pocType == 0) {
            r.u(log2Poc)
            if (bottomField) r.se()
          }
          if (redundant) r.ue()
          if (refIdc != 0) {
            if (idr) { r.u1(); r.u1() }
            else if (r.u1() == 1) return None
          }
          r.se() // slice_qp_delta
          if (deblocking) {
            val idc = r.ue()
            if (idc != 1) { r.se(); r.se() }
          }
          val nMbs = wMbs * hMbs
          var nCoeffs = 0L; var nT1 = 0L; var nNeg = 0L
          var sumLevels = 0L; var sumTz = 0L
          var mb = 0
          while (mb < nMbs) {
            val mbt = r.ue()
            // Table 7-11 I_16x16 algebra: mbt−1 = pred + 4·cbpC
            // (+12 when luma CBP is 15); admit chroma CBP 1 /
            // luma CBP 0 only
            if (mbt < 5 || mbt > 8) return None
            val icp = r.ue() // intra_chroma_pred_mode
            if (icp > 3) return None
            r.se() // mb_qp_delta (always present for I_16x16)
            // Intra16x16DCLevel under nC = 0: the verified subset is
            // the empty block, whose Table 9-5 codeword is `1`
            if (r.u1() != 1) return None
            var u = 0
            while (u < 2) { // Cb then Cr chroma DC blocks
              val blk = chromaDcBlock(r)
              if (blk == null) return None
              nCoeffs += blk.tc; nT1 += blk.t1; nNeg += blk.nNeg
              sumLevels += blk.sum; sumTz += blk.tz
              u += 1
            }
            mb += 1
          }
          if (r.u1() != 1) return None // rbsp_stop_one_bit
          Some((nMbs.toLong, nCoeffs, nT1, nNeg, sumLevels, sumTz))
        } catch { case _: IndexOutOfBoundsException => None }
      case _ => None
    }
  }

  /** [[decode]] as an `InternalRow` for the
    * [[graft.functions.H264CavlcExpr]] codegen path. Null = not a
    * chroma-DC-CAVLC-decodable stream. */
  def decodeRow(b: Array[Byte]): InternalRow = decode(b) match {
    case Some((nm, nc, t1, nn, sl, tz)) =>
      InternalRow(nm, nc, t1, nn, sl, tz)
    case None => null
  }
}
