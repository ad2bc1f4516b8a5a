package graft.multimodal

/** Builder of complete FLAC streams whose frames carry FIXED
  * (order 0–4) subframes with genuine Rice-coded residuals — the
  * `mm_flac_fixed` fixture: a real ENCODER (bit writer, fixed-
  * predictor residuals, zigzag + Rice quotient/remainder emission)
  * so the decode side ([[AudioHeaders.parseFlacPcm]]) is exercised
  * through actual compressed bits, the [[graft.functions.GzipMember]]
  * round-trip discipline. Everything derives from `doc_id` alone so
  * the oracle can replay the expected SAMPLES (and therefore the
  * meter) in closed form without touching the bitstream:
  *
  *  - rate    = [8000, 22050, 44100, 48000][doc_id % 4]
  *  - ch      = doc_id % 2 + 1
  *  - ns      = doc_id % 12 + 4       (one frame, 8-bit blocksize)
  *  - order   = doc_id % 5            (all five FIXED orders cycle)
  *  - sample(c, i) = (doc_id % 1000) + 3·i
  *                   + ((doc_id·7 + i·13 + c·11) % 5)
  *
  * The ramp + small-noise shape makes orders ≥ 1 genuinely
  * compress (residuals a few bits) while order 0 exercises long
  * unary quotients; Rice parameter 11 for order 0, 4 otherwise,
  * one partition (partition order 0), method 0 (4-bit params).
  * CRC bytes are zero — the decoder is a metering pass and does
  * not checksum (the Ogg discipline). */
object FlacFixture {

  /** MSB-first bit writer (FLAC's bit order). */
  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream(256)
    private var cur = 0
    private var nBits = 0
    def write(v: Long, n: Int): Unit = {
      var r = n - 1
      while (r >= 0) {
        cur = (cur << 1) | ((v >> r) & 1L).toInt
        nBits += 1
        if (nBits == 8) { buf.write(cur); cur = 0; nBits = 0 }
        r -= 1
      }
    }
    def writeUnary(q: Long): Unit = {
      var i = 0L
      while (i < q) { write(0, 1); i += 1 }
      write(1, 1)
    }
    def alignZero(): Unit = while (nBits != 0) write(0, 1)
    def bytes: Array[Byte] = { alignZero(); buf.toByteArray }
  }

  private[multimodal] def sample(docId: Long, c: Int, i: Int): Long =
    (docId % 1000) + 3L * i + ((docId * 7 + i * 13 + c * 11) % 5)

  def rateOf(docId: Long): Int =
    Array(8000, 22050, 44100, 48000)((docId % 4).toInt)
  def chOf(docId: Long): Int = (docId % 2).toInt + 1
  def nsOf(docId: Long): Int = (docId % 12).toInt + 4
  def orderOf(docId: Long): Int = (docId % 5).toInt

  /** STREAMINFO head: 16-bit, is-last set, geometry from the
    * derivations above. */
  private def head(rate: Int, ch: Int, total: Int): Array[Byte] = {
    val b = new Array[Byte](42)
    b(0) = 'f'; b(1) = 'L'; b(2) = 'a'; b(3) = 'C'
    b(4) = 0x80.toByte
    b(7) = 34
    b(18) = (rate >> 12).toByte
    b(19) = ((rate >> 4) & 0xff).toByte
    b(20) = (((rate & 0xf) << 4) | ((ch - 1) << 1) | ((16 - 1) >> 4))
      .toByte
    b(21) = ((((16 - 1) & 0xf) << 4) | 0).toByte
    b(22) = (total >> 24).toByte
    b(23) = ((total >> 16) & 0xff).toByte
    b(24) = ((total >> 8) & 0xff).toByte
    b(25) = (total & 0xff).toByte
    b
  }

  /** Order-`order` fixed-predictor residuals of `s` (§9.2.2
    * recurrences, inverted). */
  private def residuals(s: Array[Long], order: Int): Array[Long] = {
    val r = new Array[Long](s.length - order)
    var i = order
    while (i < s.length) {
      r(i - order) = order match {
        case 0 => s(i)
        case 1 => s(i) - s(i - 1)
        case 2 => s(i) - 2 * s(i - 1) + s(i - 2)
        case 3 => s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3)
        case 4 => s(i) - 4 * s(i - 1) + 6 * s(i - 2) -
          4 * s(i - 3) + s(i - 4)
      }
      i += 1
    }
    r
  }

  /** One FIXED subframe (header + warm-ups + method-0 single-
    * partition Rice residual) into `w`. `width` is the sample bit
    * width — 16 for plain channels, 17 for the SIDE channel of a
    * decorrelated pair (§9.1.3). */
  private def writeFixedSubframe(w: BitWriter, s: Array[Long],
      order: Int, param: Int, width: Int = 16,
      wasted: Int = 0): Unit = {
    w.write(0, 1) // pad
    w.write(8 + order, 6) // FIXED type
    if (wasted == 0) w.write(0, 1) // no wasted bits
    else { // flag, then k−1 zeros and a one (§9.2.1 unary form);
      // `s` must already be the right-shifted coded samples and
      // `width` the reduced coding width
      w.write(1, 1)
      var z = 0
      while (z < wasted - 1) { w.write(0, 1); z += 1 }
      w.write(1, 1)
    }
    var i = 0
    while (i < order) {
      w.write(s(i) & ((1L << width) - 1), width); i += 1
    }
    w.write(0, 2) // method 0: 4-bit Rice params
    w.write(0, 4) // partition order 0
    w.write(param, 4)
    residuals(s, order).foreach { r =>
      val u = if (r < 0) (-r << 1) - 1 else r << 1 // zigzag
      w.writeUnary(u >> param)
      if (param > 0) w.write(u & ((1L << param) - 1), param)
    }
  }

  // --- LPC fixture derivations (`mm_flac_lpc`): a second stream
  // family whose frames carry §9.2.4 LPC subframes. Samples stay
  // closed-form so the oracle replays the METER without touching
  // the bitstream; the LPC parameters shape only the bits — the
  // encoder INVERTS the quantized predictor to get residuals, so
  // any decode-side recurrence/shift/coefficient-sign bug lands as
  // a meter hash-mismatch.
  //  - sampleL(c, i) = (doc_id % 800) + 5·i + ((doc_id·11 + i·7 + c·13) % 9)
  //  - orderL  = doc_id % 4 + 1      (orders 1..4 cycle)
  //  - shiftL  = doc_id % 4 + 2      (2..5)
  //  - precL   = doc_id % 3 + 5      (5..7-bit coefficients)
  //  - coefL(j) = ((doc_id·(j+3) + 5) % 17) − 8   (∈ [−8, 8], signed)
  //  - Rice method = doc_id % 2      (0 and 1 both exercised)
  private[multimodal] def sampleL(docId: Long, c: Int, i: Int): Long =
    (docId % 800) + 5L * i + ((docId * 11 + i * 7 + c * 13) % 9)

  def orderLOf(docId: Long): Int = (docId % 4).toInt + 1
  def shiftLOf(docId: Long): Int = (docId % 4).toInt + 2
  def precLOf(docId: Long): Int = (docId % 3).toInt + 5
  def coefLOf(docId: Long, j: Int): Long =
    ((docId * (j + 3) + 5) % 17) - 8

  /** Quantized-LPC residuals of `s`: r(i) = s(i) − ((Σ c(j)·s(i−1−j))
    * >> shift) — the exact inverse of the decoder's recurrence. */
  private def lpcResiduals(s: Array[Long], coef: Array[Long],
      shift: Int): Array[Long] = {
    val order = coef.length
    val r = new Array[Long](s.length - order)
    var i = order
    while (i < s.length) {
      var acc = 0L
      var j = 0
      while (j < order) { acc += coef(j) * s(i - 1 - j); j += 1 }
      r(i - order) = s(i) - (acc >> shift)
      i += 1
    }
    r
  }

  /** One LPC subframe (type header + warm-ups + precision/shift/
    * coefficient walk + single-partition Rice residual, method 0 or
    * 1) into `w`. */
  private def writeLpcSubframe(w: BitWriter, s: Array[Long],
      coef: Array[Long], prec: Int, shift: Int, method: Int,
      param: Int): Unit = {
    val order = coef.length
    w.write(0, 1) // pad
    w.write(32 + (order - 1), 6) // LPC type: 1xxxxx, xxxxx=order-1
    w.write(0, 1) // no wasted bits
    var i = 0
    while (i < order) { w.write(s(i) & 0xffffL, 16); i += 1 }
    w.write(prec - 1, 4)
    w.write(shift, 5)
    i = 0
    while (i < order) {
      w.write(coef(i) & ((1L << prec) - 1), prec)
      i += 1
    }
    w.write(method, 2)
    w.write(0, 4) // partition order 0
    w.write(param, if (method == 0) 4 else 5)
    lpcResiduals(s, coef, shift).foreach { r =>
      val u = if (r < 0) (-r << 1) - 1 else r << 1 // zigzag
      w.writeUnary(u >> param)
      if (param > 0) w.write(u & ((1L << param) - 1), param)
    }
  }

  /** The complete LPC-subframe stream for one `doc_id` (geometry
    * derivations shared with the FIXED fixture). */
  def streamLpc(docId: Long): Array[Byte] = {
    val (rate, ch, ns) = (rateOf(docId), chOf(docId), nsOf(docId))
    val order = orderLOf(docId)
    val shift = shiftLOf(docId)
    val prec = precLOf(docId)
    val coef = Array.tabulate(order)(j => coefLOf(docId, j))
    val method = (docId % 2).toInt
    val w = new BitWriter
    w.write(0xff, 8); w.write(0xf8, 8); w.write(0x60, 8)
    w.write((ch - 1) << 4, 8)
    w.write(0, 8)
    w.write(ns - 1, 8)
    w.write(0, 8)
    var c = 0
    while (c < ch) {
      val s = Array.tabulate(ns)(i => sampleL(docId, c, i))
      writeLpcSubframe(w, s, coef, prec, shift, method, 11)
      c += 1
    }
    w.alignZero()
    w.write(0, 16) // zero CRC-16
    head(rate, ch, ns) ++ w.bytes
  }

  /** The complete STEREO-DECORRELATED stream for one `doc_id`
    * (`mm_flac_stereo`): always 2 channels, the channel assignment
    * cycling left/side / side/right / mid/side by doc_id % 3, each
    * derived channel FIXED-coded (the side subframe one bit wider
    * per §9.1.3) — the encode half inverts the decorrelation
    * (side = l − r, mid = (l + r) >> 1) so the oracle replays the
    * l/r meter in closed form while the engine must reconstruct
    * through actual decorrelated bits. */
  def streamStereo(docId: Long): Array[Byte] = {
    val (rate, ns) = (rateOf(docId), nsOf(docId))
    val order = orderOf(docId)
    val chAsgn = 8 + (docId % 3).toInt
    val l = Array.tabulate(ns)(i => sample(docId, 0, i))
    val r = Array.tabulate(ns)(i => sample(docId, 1, i))
    val side = Array.tabulate(ns)(i => l(i) - r(i))
    val mid = Array.tabulate(ns)(i => (l(i) + r(i)) >> 1)
    val w = new BitWriter
    w.write(0xff, 8); w.write(0xf8, 8); w.write(0x60, 8)
    w.write(chAsgn << 4, 8)
    w.write(0, 8)
    w.write(ns - 1, 8)
    w.write(0, 8)
    val param = if (order == 0) 11 else 4
    chAsgn match {
      case 8 => // left/side
        writeFixedSubframe(w, l, order, param)
        writeFixedSubframe(w, side, order, param, 17)
      case 9 => // side/right
        writeFixedSubframe(w, side, order, param, 17)
        writeFixedSubframe(w, r, order, param)
      case _ => // mid/side
        writeFixedSubframe(w, mid, order, param)
        writeFixedSubframe(w, side, order, param, 17)
    }
    w.alignZero()
    w.write(0, 16) // zero CRC-16
    head(rate, 2, ns) ++ w.bytes
  }

  /** Wasted-bit count for the `mm_flac_wasted` fixture: 1–3
    * trailing zero bits per sample. */
  def wastedOf(docId: Long): Int = (docId % 3).toInt + 1

  /** The complete WASTED-BITS stream for one `doc_id`
    * (`mm_flac_wasted`): the [[stream]] geometry, but every actual
    * sample is `sample(doc_id, c, i) << k` (k = [[wastedOf]]) and
    * each subframe codes the RIGHT-shifted base at width 16 − k
    * behind a §9.2.1 wasted-bits header — the encoder trick for
    * sources with constant trailing zero bits. The oracle replays
    * the shifted meter in closed form; a decoder that ignores the
    * flag, mis-reads the unary k, or shifts before the predictor
    * recurrence hash-mismatches. */
  def streamWasted(docId: Long): Array[Byte] = {
    val (rate, ch, ns, order) =
      (rateOf(docId), chOf(docId), nsOf(docId), orderOf(docId))
    val k = wastedOf(docId)
    val w = new BitWriter
    w.write(0xff, 8); w.write(0xf8, 8); w.write(0x60, 8)
    w.write((ch - 1) << 4, 8)
    w.write(0, 8)
    w.write(ns - 1, 8)
    w.write(0, 8)
    var c = 0
    while (c < ch) {
      val base = Array.tabulate(ns)(i => sample(docId, c, i))
      writeFixedSubframe(w, base, order, if (order == 0) 11 else 4,
        width = 16 - k, wasted = k)
      c += 1
    }
    w.alignZero()
    w.write(0, 16) // zero CRC-16
    head(rate, ch, ns) ++ w.bytes
  }

  /** The complete stream for one `doc_id`. */
  def stream(docId: Long): Array[Byte] = {
    val (rate, ch, ns, order) =
      (rateOf(docId), chOf(docId), nsOf(docId), orderOf(docId))
    val w = new BitWriter
    // frame header: sync+fixed, 8-bit blocksize code 6, rate from
    // STREAMINFO, independent channels, size from STREAMINFO,
    // frame number 0, blocksize-1, zero CRC-8
    w.write(0xff, 8); w.write(0xf8, 8); w.write(0x60, 8)
    w.write((ch - 1) << 4, 8)
    w.write(0, 8)
    w.write(ns - 1, 8)
    w.write(0, 8)
    var c = 0
    while (c < ch) {
      val s = Array.tabulate(ns)(i => sample(docId, c, i))
      writeFixedSubframe(w, s, order, if (order == 0) 11 else 4)
      c += 1
    }
    w.alignZero()
    w.write(0, 16) // zero CRC-16
    head(rate, ch, ns) ++ w.bytes
  }
}
