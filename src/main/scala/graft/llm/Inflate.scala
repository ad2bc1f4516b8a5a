package graft.llm

/** A from-scratch RFC 1951 DEFLATE decoder — the engine's proof
  * that TABLE-DRIVEN entropy decode is real machinery here, not a
  * JDK call: canonical Huffman construction (RFC 1951 §3.2.2's
  * next_code algorithm), the dynamic-block code-length meta-code
  * (symbols 16/17/18 with their repeat extra bits), the fixed
  * literal/length code (§3.2.6), LZ77 length/distance back-copies
  * with the full base+extra tables, and stored blocks — plus the
  * RFC 1950 zlib wrapper with a real Adler-32 check. PINNED against
  * the JDK's own Deflater across levels 0–9 and both wrappers in
  * InflateSpec (hundreds of deterministic payloads), and against
  * hand-assembled bitstreams so the decoder isn't just the JDK's
  * inverse by construction.
  *
  * Every parse is fail-closed: over-subscribed code sets, a walk
  * into an unassigned codeword, bad stored-block LEN/NLEN, a
  * back-copy past the start of output, trailing garbage after the
  * final block (zlib path), a wrong Adler-32, and an output larger
  * than the bomb cap all return None — the
  * [[Warc.gunzipMembers]] discipline.
  *
  * Bit order per RFC 1951 §3.1.1: bytes are consumed LSB-first;
  * Huffman codewords are packed most-significant-code-bit first, so
  * the decode walk appends each new bit as the new LSB of the
  * accumulated code. */
object Inflate {

  /** Hard output cap (decompression-bomb guard), matching the WARC
    * ingest cap. */
  val MaxOut: Int = 1 << 30

  // length symbols 257..285: (base, extra bits) — RFC 1951 §3.2.5
  private val lenBase = Array(
    3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31,
    35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
  private val lenExtra = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
    3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)

  // distance symbols 0..29: (base, extra bits)
  private val distBase = Array(
    1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193,
    257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
    8193, 12289, 16385, 24577)
  private val distExtra = Array(
    0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6,
    7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)

  // dynamic-block code-length-code symbol order — §3.2.7
  private val clOrder = Array(
    16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)

  /** A canonical Huffman code over symbols 0..n-1 in the §3.2.2
    * counts/offsets decode form (the classic "puff" walk):
    * `count(l)` = symbols of length l, `syms` = symbols sorted by
    * (length, symbol). */
  private final class Code(val count: Array[Int], val syms: Array[Int])

  /** Build the canonical code; None iff the lengths over-subscribe
    * the space. Incomplete codes are permitted at BUILD time (the
    * RFC's one-distance-code special case) — a decode that walks
    * into unassigned space still fails closed. */
  private def build(lengths: Array[Int]): Option[Code] = {
    val count = new Array[Int](16)
    var i = 0
    while (i < lengths.length) { count(lengths(i)) += 1; i += 1 }
    var left = 1
    var l = 1
    while (l <= 15) {
      left <<= 1
      left -= count(l)
      if (left < 0) return None // over-subscribed
      l += 1
    }
    val offs = new Array[Int](16)
    l = 1
    while (l < 15) { offs(l + 1) = offs(l) + count(l); l += 1 }
    val syms = new Array[Int](lengths.count(_ > 0))
    i = 0
    while (i < lengths.length) {
      if (lengths(i) != 0) { syms(offs(lengths(i))) = i; offs(lengths(i)) += 1 }
      i += 1
    }
    Some(new Code(count, syms))
  }

  private val fixedLit: Code = {
    val l = new Array[Int](288)
    var i = 0
    while (i < 288) {
      l(i) = if (i < 144) 8 else if (i < 256) 9 else if (i < 280) 7 else 8
      i += 1
    }
    build(l).get
  }
  private val fixedDist: Code = build(Array.fill(30)(5)).get

  private final class State(val in: Array[Byte], var pos: Int) {
    var bitBuf = 0
    var bitCnt = 0
    // the LZ77 window IS the output so far (bounded by MaxOut)
    var window: Array[Byte] = new Array[Byte](1 << 12)
    var outLen = 0

    def bits(n: Int): Int = { // -1 on exhaustion
      while (bitCnt < n) {
        if (pos >= in.length) return -1
        bitBuf |= (in(pos) & 0xff) << bitCnt
        pos += 1
        bitCnt += 8
      }
      val v = bitBuf & ((1 << n) - 1)
      bitBuf >>>= n
      bitCnt -= n
      v
    }

    def emit(b: Byte): Boolean = {
      if (outLen >= MaxOut) return false
      if (outLen == window.length) {
        val w = new Array[Byte](window.length << 1)
        System.arraycopy(window, 0, w, 0, outLen)
        window = w
      }
      window(outLen) = b
      outLen += 1
      true
    }

    /** §3.2.2 decode walk: one bit at a time, first-code/offset per
      * length. -1 = error (exhaustion or unassigned codeword). */
    def decode(c: Code): Int = {
      var code = 0
      var first = 0
      var index = 0
      var len = 1
      while (len <= 15) {
        val b = bits(1)
        if (b < 0) return -1
        code |= b
        val n = c.count(len)
        if (code - first < n) return c.syms(index + (code - first))
        index += n
        first = (first + n) << 1
        code <<= 1
        len += 1
      }
      -1
    }
  }

  /** Raw DEFLATE from `b(off until b.length)`. Returns
    * (inflated, bytesConsumed) — consumed includes any partial final
    * byte (rounded up), letting wrappers enforce exact framing. */
  def raw(b: Array[Byte], off: Int): Option[(Array[Byte], Int)] = {
    if (b == null || off < 0 || off > b.length) return None
    val s = new State(b, off)
    var fin = false
    while (!fin) {
      val bf = s.bits(1)
      if (bf < 0) return None
      fin = bf == 1
      s.bits(2) match {
        case 0 => // stored: align, LEN, ~LEN, copy
          s.bitBuf = 0; s.bitCnt = 0
          if (s.pos + 4 > s.in.length) return None
          val len = (s.in(s.pos) & 0xff) | ((s.in(s.pos + 1) & 0xff) << 8)
          val nlen = (s.in(s.pos + 2) & 0xff) | ((s.in(s.pos + 3) & 0xff) << 8)
          if ((len ^ 0xffff) != nlen) return None
          s.pos += 4
          if (s.pos + len > s.in.length) return None
          var i = 0
          while (i < len) {
            if (!s.emit(s.in(s.pos + i))) return None
            i += 1
          }
          s.pos += len
        case t @ (1 | 2) =>
          var lit = fixedLit
          var dist = fixedDist
          if (t == 2) { // dynamic: read the two code sets
            val hlit = s.bits(5); val hdist = s.bits(5); val hclen = s.bits(4)
            if (hclen < 0) return None
            val nlit = hlit + 257
            val ndist = hdist + 1
            val ncl = hclen + 4
            if (nlit > 286 || ndist > 30) return None
            val clLens = new Array[Int](19)
            var i = 0
            while (i < ncl) {
              val v = s.bits(3)
              if (v < 0) return None
              clLens(clOrder(i)) = v
              i += 1
            }
            val clCode = build(clLens).getOrElse(return None)
            val lens = new Array[Int](nlit + ndist)
            var k = 0
            while (k < lens.length) {
              val sym = s.decode(clCode)
              if (sym < 0) return None
              sym match {
                case x if x < 16 => lens(k) = x; k += 1
                case 16 =>
                  if (k == 0) return None
                  val r = s.bits(2); if (r < 0) return None
                  val prev = lens(k - 1)
                  var j = 0
                  while (j < r + 3) {
                    if (k >= lens.length) return None
                    lens(k) = prev; k += 1; j += 1
                  }
                case 17 =>
                  val r = s.bits(3); if (r < 0) return None
                  if (k + r + 3 > lens.length) return None
                  k += r + 3
                case _ =>
                  val r = s.bits(7); if (r < 0) return None
                  if (k + r + 11 > lens.length) return None
                  k += r + 11
              }
            }
            if (lens(256) == 0) return None // end-of-block must exist
            lit = build(java.util.Arrays.copyOfRange(lens, 0, nlit))
              .getOrElse(return None)
            dist = build(java.util.Arrays.copyOfRange(lens, nlit, lens.length))
              .getOrElse(return None)
          }
          var eob = false
          while (!eob) {
            val sym = s.decode(lit)
            if (sym < 0) return None
            if (sym < 256) {
              if (!s.emit(sym.toByte)) return None
            } else if (sym == 256) eob = true
            else {
              if (sym > 285) return None
              val li = sym - 257
              val le = s.bits(lenExtra(li)); if (le < 0) return None
              val length = lenBase(li) + le
              val dsym = s.decode(dist)
              if (dsym < 0 || dsym > 29) return None
              val de = s.bits(distExtra(dsym)); if (de < 0) return None
              val d = distBase(dsym) + de
              if (d > s.outLen) return None // copy from before output start
              var j = 0
              while (j < length) {
                if (!s.emit(s.window(s.outLen - d))) return None
                j += 1
              }
            }
          }
        case _ => return None // BTYPE 11 reserved (or exhaustion)
      }
    }
    val outArr = java.util.Arrays.copyOfRange(s.window, 0, s.outLen)
    Some((outArr, s.pos - off))
  }

  /** Reflected CRC-32 (poly 0xEDB88320) — the gzip/PNG checksum,
    * implemented here so the gzip walk is fully self-contained. */
  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i
      var k = 0
      while (k < 8) {
        r = if ((r & 1) != 0) (r >>> 1) ^ 0xedb88320 else r >>> 1
        k += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  def crc32(b: Array[Byte]): Long = crc32Range(b, 0, b.length)

  /** CRC-32 over b[from, until) — the header-CRC (FHCRC) check needs
    * the digest of a slice without copying it out. */
  def crc32Range(b: Array[Byte], from: Int, until: Int): Long = {
    var crc = 0xffffffff
    var i = from
    while (i < until) {
      crc = (crc >>> 8) ^ crcTable((crc ^ b(i)) & 0xff)
      i += 1
    }
    (crc ^ 0xffffffff).toLong & 0xffffffffL
  }

  /** RFC 1952 gzip, multi-member (the `.warc.gz` layout): each
    * member's header walked field by field (magic, CM, FLG with the
    * EXTRA / NAME / COMMENT / HCRC optional fields, reserved bits
    * rejected), the body inflated by [[raw]], CRC-32 and ISIZE
    * verified per member — and, unlike the JDK
    * walk ([[Warc.gunzipMembers]]'s documented tolerance), the
    * cursor must land EXACTLY at payload end, so trailing garbage
    * or a corrupt later member header rejects the whole payload
    * rather than silently dropping records. */
  def gzipMembers(b: Array[Byte]): Option[Array[Byte]] = {
    if (b == null || b.length < 18) return None
    val out = new java.io.ByteArrayOutputStream(b.length * 2)
    var i = 0
    while (i < b.length) {
      if (i + 10 > b.length) return None
      val hdrStart = i // FHCRC covers everything from the magic on
      if ((b(i) & 0xff) != 0x1f || (b(i + 1) & 0xff) != 0x8b) return None
      if ((b(i + 2) & 0xff) != 8) return None // CM must be deflate
      val flg = b(i + 3) & 0xff
      if ((flg & 0xe0) != 0) return None // reserved FLG bits
      i += 10 // MTIME/XFL/OS skipped (metadata)
      if ((flg & 0x04) != 0) { // FEXTRA
        if (i + 2 > b.length) return None
        val xlen = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
        i += 2 + xlen
        if (i > b.length) return None
      }
      var z = 0
      while (z < 2) { // FNAME, then FCOMMENT: zero-terminated
        if ((flg & (if (z == 0) 0x08 else 0x10)) != 0) {
          while (i < b.length && b(i) != 0) i += 1
          if (i >= b.length) return None
          i += 1
        }
        z += 1
      }
      if ((flg & 0x02) != 0) { // FHCRC: CRC-32 of the header so
        // far, low 16 bits, stored LE (RFC 1952 §2.3.1) — verified,
        // matching GZIPInputStream, not just skipped
        if (i + 2 > b.length) return None
        val stored16 = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
        if ((crc32Range(b, hdrStart, i) & 0xffffL) != stored16)
          return None
        i += 2
      }
      val (body, consumed) = raw(b, i).getOrElse(return None)
      i += consumed
      if (i + 8 > b.length) return None
      var stored = 0L
      var isize = 0L
      var k = 0
      while (k < 4) {
        stored |= (b(i + k) & 0xffL) << (8 * k)
        isize |= (b(i + 4 + k) & 0xffL) << (8 * k)
        k += 1
      }
      if (crc32(body) != stored) return None
      if ((body.length.toLong & 0xffffffffL) != isize) return None
      out.write(body, 0, body.length)
      if (out.size() > MaxOut) return None
      i += 8
    }
    Some(out.toByteArray) // loop exit ⇒ i == b.length: exact framing
  }

  /** RFC 1950 zlib stream: 2-byte header (CM 8, FCHECK, no FDICT),
    * raw DEFLATE body, Adler-32 trailer — verified, exact framing
    * (trailing garbage rejects). */
  def zlib(b: Array[Byte]): Option[Array[Byte]] = {
    if (b == null || b.length < 6) return None
    val cmf = b(0) & 0xff
    val flg = b(1) & 0xff
    if ((cmf & 0x0f) != 8) return None // CM must be deflate
    if ((cmf >> 4) > 7) return None // window size out of spec
    if ((flg & 0x20) != 0) return None // FDICT unsupported
    if ((cmf * 256 + flg) % 31 != 0) return None // FCHECK
    val (out, consumed) = raw(b, 2).getOrElse(return None)
    if (2 + consumed + 4 != b.length) return None // exact framing
    var a = 1L
    var s2 = 0L
    var i = 0
    while (i < out.length) {
      a = (a + (out(i) & 0xff)) % 65521
      s2 = (s2 + a) % 65521
      i += 1
    }
    val adler = (s2 << 16) | a
    var stored = 0L
    i = 0
    while (i < 4) { // big-endian trailer
      stored = (stored << 8) | (b(2 + consumed + i) & 0xff)
      i += 1
    }
    if (stored != adler) return None
    Some(out)
  }
}
