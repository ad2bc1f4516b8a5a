package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Real image-container header parsing — pure byte arithmetic, no
  * codec library. This replaces the multimodal decode stub for the
  * most common metadata ask (dimensions) on the two dominant image
  * containers:
  *
  *  - PNG: 8-byte signature, then the IHDR chunk is REQUIRED to be
  *    first (PNG spec §5.6) — width/height are the two big-endian
  *    u32s at byte offsets 16/20.
  *  - JPEG: SOI marker, then a marker-segment walk to the first
  *    start-of-frame (SOF0/1/2/…) segment, whose payload is
  *    [precision u8][height u16][width u16]. The walk skips APPn /
  *    DQT / DHT / COM segments by their declared big-endian lengths,
  *    tolerates marker fill bytes (0xFF padding, JPEG spec B.1.1.2),
  *    and stops at SOS/EOI (dimensions must precede scan data).
  *
  * Anything truncated, unsigned-overflowing, or not PNG/JPEG parses
  * to None — callers decide whether that's a filter or an error
  * column. Pixel decode (and audio/video containers) remain behind
  * the [[Multimodal.StubCodec]] seam.
  */
object ImageHeaders {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def u32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** (kind, width, height) of a PNG or JPEG payload, else None. */
  def parse(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b == null) None
    else if (isPng(b)) parsePng(b)
    else if (b.length >= 2 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8)
      parseJpeg(b)
    else None
  }

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(b, 0, 8), PngSig)

  private def parsePng(b: Array[Byte]): Option[(String, Int, Int)] = {
    // sig(8) + IHDR length(4) + type(4) + width(4) + height(4)
    if (b.length < 24) return None
    if (u32(b, 8) != 13L) return None // IHDR payload is exactly 13 bytes
    if (!(u8(b, 12) == 'I' && u8(b, 13) == 'H' &&
        u8(b, 14) == 'D' && u8(b, 15) == 'R')) return None
    val w = u32(b, 16); val h = u32(b, 20)
    // spec caps dims at 2^31-1; 0 is invalid
    if (w < 1 || h < 1 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some(("png", w.toInt, h.toInt))
  }

  private def parseJpeg(b: Array[Byte]): Option[(String, Int, Int)] = {
    val n = b.length
    var i = 2
    while (i + 1 < n) {
      if (u8(b, i) != 0xff) return None // lost marker sync
      var j = i
      while (j + 1 < n && u8(b, j + 1) == 0xff) j += 1 // fill bytes
      if (j + 1 >= n) return None
      val marker = u8(b, j + 1)
      i = j + 2
      marker match {
        case 0xd8 | 0x01 => // SOI / TEM: standalone, no length
        case m if m >= 0xd0 && m <= 0xd7 => // RSTn: standalone
        case 0xd9 => return None // EOI before any SOF
        case 0xda => return None // SOS before any SOF
        case m if (m >= 0xc0 && m <= 0xcf) &&
            m != 0xc4 && m != 0xc8 && m != 0xcc => // SOFn
          if (i + 6 >= n) return None
          val h = u16(b, i + 3); val w = u16(b, i + 5)
          return if (w < 1 || h < 1) None else Some(("jpeg", w, h))
        case _ => // APPn, DQT, DHT, COM, …: skip by declared length
          if (i + 1 >= n) return None
          val len = u16(b, i)
          if (len < 2) return None
          i += len
      }
    }
    None
  }

  /** [[parse]] as an `InternalRow` for the [[graft.functions.ImageDims]]
    * codegen path (called from generated Java — keep the signature
    * static-friendly). Null = not a parseable image. */
  def parseRow(b: Array[Byte]): InternalRow = parse(b) match {
    case Some((kind, w, h)) => InternalRow(UTF8String.fromString(kind), w, h)
    case None => null
  }

  private def u16le(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  /** REAL pixel-payload decode for the codec-free image format:
    * 24-bit uncompressed BMP (BI_RGB) rows are raw BGR bytes — no
    * entropy coding, just layout (bottom-up rows, each padded to a
    * 4-byte boundary). Per-file channel statistics over the pixels
    * ACTUALLY PRESENT (truncation-tolerant like
    * [[AudioHeaders.levels]]):
    * (width, height, n_px, sum_r, sum_g, sum_b) — exact integer
    * sums, so results hash bit-for-bit against a positional oracle
    * replay; mean channel values derive at the edge. None for
    * non-BMP, compressed (BI_RGB only), non-24bpp, or top-down
    * (negative height) payloads — compressed image formats stay
    * behind the declared stub. */
  def bmpLevels(b: Array[Byte]): Option[(Int, Int, Long, Long, Long, Long)] = {
    if (b == null || b.length < 54) return None
    if (u8(b, 0) != 'B' || u8(b, 1) != 'M') return None
    val dataOff = u32le(b, 10)
    if (u32le(b, 14) < 40) return None // BITMAPINFOHEADER at least
    val w = u32le(b, 18)
    val h = u32le(b, 22)
    // i32 fields; unsigned read > Int.MaxValue means negative
    // (top-down) or absurd — reject both
    if (w < 1 || h < 1 || w > (1L << 20) || h > (1L << 20)) return None
    if (u16le(b, 26) != 1) return None // planes
    if (u16le(b, 28) != 24) return None // 24bpp only
    if (u32le(b, 30) != 0) return None // BI_RGB (uncompressed) only
    val stride = ((3 * w + 3) / 4) * 4
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var n = 0L
    // walk only rows with at least one byte present: a ~60-byte
    // crafted header declaring 2^20 × 2^20 pixels must not spin
    // ~10^12 empty iterations on an executor (this is a registered
    // user-facing SQL function — malformed input is a given). The
    // byte-presence test per pixel is unchanged, so truncated
    // payloads sum exactly the same pixels as the unbounded walk.
    val rowsPresent =
      if (dataOff >= b.length) 0L
      else ((b.length - dataOff) + stride - 1) / stride
    var y = 0L
    while (y < math.min(h, rowsPresent)) {
      val row = dataOff + y * stride
      var x = 0L
      // pixel offsets grow monotonically within a row: past-the-end
      // once means past-the-end for the rest of the row
      while (x < w && row + x * 3 + 3 <= b.length) {
        val p = row + x * 3
        sumB += u8(b, p.toInt)
        sumG += u8(b, p.toInt + 1)
        sumR += u8(b, p.toInt + 2)
        n += 1
        x += 1
      }
      y += 1
    }
    Some((w.toInt, h.toInt, n, sumR, sumG, sumB))
  }

  /** [[bmpLevels]] as an `InternalRow` for the
    * [[graft.functions.ImageLevels]] codegen path. Null = not an
    * uncompressed 24-bit BMP. */
  def bmpLevelsRow(b: Array[Byte]): InternalRow = bmpLevels(b) match {
    case Some((w, h, n, r, g, bl)) => InternalRow(w, h, n, r, g, bl)
    case None => null
  }
}
