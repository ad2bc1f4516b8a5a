package graft.llm

import scala.collection.mutable

/** Zstandard COMPRESSED blocks (RFC 8878 §3.1.1): the FSE
  * (tANS) entropy layer under the frame walk in [[Zstd]] — from
  * scratch, no codec library, the [[Inflate]] playbook.
  *
  * Implemented, all per the RFC text:
  *  - FSE decode-table construction from normalized counts
  *    (§4.1.1: the "less than 1" top slots, the
  *    `(size>>1)+(size>>3)+3` spreading step, per-state
  *    nbBits/baseline from the symbol-next counters) — pinned in
  *    ZstdFseSpec on a hand-computed spread and on per-symbol
  *    range-tiling invariants;
  *  - the three PREDEFINED sequence distributions
  *    (§3.1.1.3.2.2: literal-length / match-length at accuracy 6,
  *    offset codes at accuracy 5) and the code→baseline/extra-bits
  *    value tables;
  *  - the FSE table DESCRIPTION codec (§4.1.1 bit-packed
  *    normalized counts, including the small-value encoding and
  *    the 2-bit zero-run flags) — both reader and writer, so
  *    explicitly-transmitted tables cross the oracle-checked
  *    roundtrip too;
  *  - the BACKWARD sequence bitstream (§3.1.1.4: sentinel bit,
  *    init states LL→OF→ML, per-sequence extra bits OF→ML→LL,
  *    state updates LL→ML→OF, last sequence updates nothing);
  *  - sequence EXECUTION with the three repeat offsets
  *    (§3.1.1.5: init (1,4,8) per frame, the litLength==0 index
  *    shift, Repeat_Offset_1 − 1, move-to-front updates) and
  *    overlapping byte-by-byte match copies;
  *  - literals sections in ALL FOUR classes — Raw, RLE (all size
  *    formats), Compressed (HUFFMAN-coded, §4.2: tree descriptions
  *    in both the direct 4-bit-weights and FSE-compressed-weights
  *    forms through the 2-state interleave, the implied last
  *    weight, canonical weight-ascending table fill, single- and
  *    four-stream payloads with the jump table) and Treeless
  *    (previous block's table);
  *  - sequence table modes Predefined / RLE / FSE_Compressed /
  *    Repeat (tables and the Huffman table persist across blocks
  *    within a frame, like the repeat offsets);
  *  - the frame content checksum (from-scratch [[Xxh64]], low 32
  *    bits verified, not skipped).
  *
  * No entropy layer remains undecoded: the walk inverts REAL
  * Zstandard output. The independent-implementation pin is
  * `llm_zstd_real` — zstd-jni (the reference implementation Spark
  * ships for parquet) compresses at levels 1–19 and this walk must
  * invert it, the `llm_inflate`/JDK-Deflater discipline — plus the
  * checksummed zstd-CLI frames and HAND-ASSEMBLED streams in
  * ZstdFseSpec (byte-by-byte RLE-literals + RLE-tables blocks,
  * repeat-offset walks), so the engine-side [[compress]] encoder
  * pair cannot be a private dialect's inverse. DICTIONARIES (§5)
  * decode too — [[parseDict]] loads the entropy tables / repeat
  * offsets / content prefix, [[decompressWithDict]] threads them
  * through the frame walk (matches reach into the dict content,
  * Dictionary_ID verified), pinned against zstd-jni-TRAINED
  * dictionaries in `llm_zstd_dict`. Out of scope by DESIGN, not by
  * gap: the pre-v0.8 legacy formats. */
object ZstdFse {

  // ----------------------------------------------------------------
  // FSE decode table (§4.1.1)
  // ----------------------------------------------------------------

  /** One decode table: per 0-based state, the emitted symbol, the
    * bit count to read, and the baseline the bits add to. */
  final class Table(
      val symbol: Array[Int],
      val nbBits: Array[Int],
      val base: Array[Int],
      val accuracyLog: Int) {
    def size: Int = symbol.length
  }

  private def highbit(x: Int): Int = 31 - Integer.numberOfLeadingZeros(x)

  /** Build the decode table from normalized counts (counts sum to
    * `1 << al`, counting each −1 "less than 1" symbol as 1). None
    * on any inconsistency — fail closed like every walk here. */
  def buildTable(norm: Array[Int], al: Int): Option[Table] = {
    if (al < 1 || al > 12) return None
    val tableSize = 1 << al
    val sym = new Array[Int](tableSize)
    var highThreshold = tableSize - 1
    val symbolNext = new Array[Int](norm.length)
    var total = 0
    var s = 0
    while (s < norm.length) {
      if (norm(s) == -1) {
        if (highThreshold < 0) return None
        sym(highThreshold) = s
        highThreshold -= 1
        symbolNext(s) = 1
        total += 1
      } else if (norm(s) < -1) return None
      else {
        symbolNext(s) = norm(s)
        total += norm(s)
      }
      s += 1
    }
    if (total != tableSize) return None
    // spread the positive-count symbols
    val step = (tableSize >> 1) + (tableSize >> 3) + 3
    val mask = tableSize - 1
    var pos = 0
    s = 0
    while (s < norm.length) {
      var k = 0
      while (k < norm(s)) {
        sym(pos) = s
        pos = (pos + step) & mask
        while (pos > highThreshold) pos = (pos + step) & mask
        k += 1
      }
      s += 1
    }
    if (pos != 0) return None // spread must land back at origin
    // per-state transitions
    val nb = new Array[Int](tableSize)
    val base = new Array[Int](tableSize)
    var st = 0
    while (st < tableSize) {
      val sy = sym(st)
      val nextState = symbolNext(sy)
      symbolNext(sy) += 1
      nb(st) = al - highbit(nextState)
      base(st) = (nextState << nb(st)) - tableSize
      st += 1
    }
    Some(new Table(sym, nb, base, al))
  }

  // ----------------------------------------------------------------
  // Predefined distributions + value tables (§3.1.1.3.2)
  // ----------------------------------------------------------------

  val LlDefaultNorm: Array[Int] = Array(
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
    -1, -1, -1, -1)
  val MlDefaultNorm: Array[Int] = Array(
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    -1, -1, -1, -1, -1, -1, -1)
  val OfDefaultNorm: Array[Int] = Array(
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)
  val LlDefaultAl = 6
  val MlDefaultAl = 6
  val OfDefaultAl = 5

  lazy val LlDefaultTable: Table = buildTable(LlDefaultNorm, LlDefaultAl).get
  lazy val MlDefaultTable: Table = buildTable(MlDefaultNorm, MlDefaultAl).get
  lazy val OfDefaultTable: Table = buildTable(OfDefaultNorm, OfDefaultAl).get

  /** Literal-length code → (baseline, extra bits). */
  val LlBase: Array[Int] = Array(
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536)
  val LlBits: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10,
    11, 12, 13, 14, 15, 16)

  /** Match-length code → (baseline, extra bits). */
  val MlBase: Array[Int] = Array(
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18,
    19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515,
    1027, 2051, 4099, 8195, 16387, 32771, 65539)
  val MlBits: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9,
    10, 11, 12, 13, 14, 15, 16)

  /** Value → code (largest code whose baseline ≤ value). */
  def llCodeOf(v: Int): Int = {
    var c = LlBase.length - 1
    while (LlBase(c) > v) c -= 1
    c
  }
  def mlCodeOf(v: Int): Int = {
    var c = MlBase.length - 1
    while (MlBase(c) > v) c -= 1
    c
  }

  // ----------------------------------------------------------------
  // Backward bitstream (§3.1.1.4): the encoder writes LSB-first;
  // the decoder enters at the sentinel (highest set bit of the
  // last byte) and reads fields in reverse write order — read(n)
  // consumes the TOP n remaining bits.
  // ----------------------------------------------------------------
  private final class BackBits(b: Array[Byte], from: Int, until: Int) {
    var ok: Boolean = true
    private var bitPos: Int = {
      // §3.1.1.4: the final byte carries the sentinel bit and MUST be
      // non-zero — a zero last byte is corruption, not padding to skip.
      val last = until - 1
      if (last < from || b(last) == 0) { ok = false; 0 }
      else (last - from) * 8 + highbit(b(last) & 0xff)
    }
    private def bit(i: Int): Int = (b(from + (i >> 3)) >> (i & 7)) & 1
    def read(n: Int): Int = {
      if (n == 0) return 0
      if (!ok || bitPos < n) { ok = false; return 0 }
      bitPos -= n
      var v = 0
      var k = 0
      while (k < n) { v |= bit(bitPos + k) << k; k += 1 }
      v
    }
    def remaining: Int = if (ok) bitPos else 0
    /** The next n bits WITHOUT consuming, first-read bit as the MSB;
      * positions past the stream start pad with zero (the Huffman
      * tail: the last codes may be shorter than tableLog). */
    def peekPad(n: Int): Int = {
      if (!ok) return 0
      var v = 0
      var k = 0
      while (k < n) {
        val i = bitPos - n + k
        if (i >= 0) v |= bit(i) << k
        k += 1
      }
      v
    }
    def consume(n: Int): Unit = {
      if (bitPos < n) ok = false else bitPos -= n
    }
    def exhausted: Boolean = ok && bitPos == 0
  }

  // ----------------------------------------------------------------
  // FSE table description (§4.1.1): forward LSB-first bit packing
  // of the accuracy log and normalized counts.
  // ----------------------------------------------------------------
  private final class FwdBits(b: Array[Byte], val from: Int, until: Int) {
    var ok: Boolean = true
    var bitPos: Int = 0
    private val nBits = (until - from) * 8
    def read(n: Int): Int = {
      if (!ok || bitPos + n > nBits) { ok = false; return 0 }
      var v = 0
      var k = 0
      while (k < n) {
        val i = bitPos + k
        v |= ((b(from + (i >> 3)) >> (i & 7)) & 1) << k
        k += 1
      }
      bitPos += n
      v
    }
    def peek(n: Int): Int = {
      val p = bitPos
      val v = read(n)
      if (ok) bitPos = p
      v
    }
    def bytesConsumed: Int = (bitPos + 7) >> 3
  }

  /** Parse a bit-packed normalized-count table description starting
    * at `off`. Returns (counts, accuracyLog, bytes consumed). */
  def readNCount(b: Array[Byte], off: Int, until: Int,
      maxSymbol: Int): Option[(Array[Int], Int, Int)] = {
    val in = new FwdBits(b, off, until)
    val al = in.read(4) + 5
    if (!in.ok || al > 9) return None
    val tableSize = 1 << al
    var remaining = tableSize + 1
    var threshold = tableSize
    var nbBits = al + 1
    val counts = mutable.ArrayBuffer.empty[Int]
    var previous0 = false
    while (remaining > 1 && counts.length <= maxSymbol) {
      if (previous0) {
        // zero-run flags: each 2-bit group appends that many zero
        // counts; 3 means "3 and read another group"
        var more = true
        while (more && in.ok) {
          val f = in.read(2)
          var k = 0
          while (k < f) { counts += 0; k += 1 }
          more = f == 3
          if (counts.length > maxSymbol) more = false
        }
        previous0 = false
      } else {
        // small-value optimization (§4.1.1): values below `max` use
        // one bit less; the wide range [threshold, 2·threshold) maps
        // back by subtracting max
        val max = (2 * threshold - 1) - remaining
        var count = 0
        if (in.peek(nbBits - 1) < max) {
          count = in.read(nbBits - 1)
        } else {
          val v = in.read(nbBits)
          count = if (v >= threshold) v - max else v
        }
        if (!in.ok) return None
        count -= 1 // stored +1; 0 means the −1 "less than 1" prob
        remaining -= (if (count < 0) -count else count)
        counts += count
        if (count == 0) previous0 = true
        while (remaining > 1 && remaining < threshold) {
          nbBits -= 1
          threshold >>= 1
        }
      }
    }
    if (!in.ok || remaining != 1) return None
    Some((counts.toArray, al, in.bytesConsumed))
  }

  /** The matching writer (FSE_writeNCount equivalent) — the encoder
    * side of explicitly-transmitted tables, and the reader's
    * roundtrip pin. `norm` must sum to `1 << al` (−1 counting 1). */
  def writeNCount(norm: Array[Int], al: Int): Array[Byte] = {
    val bits = mutable.ArrayBuffer.empty[(Int, Int)] // (value, width)
    bits += ((al - 5, 4))
    val tableSize = 1 << al
    var remaining = tableSize + 1
    var threshold = tableSize
    var nbBits = al + 1
    var s = 0
    while (remaining > 1 && s < norm.length) {
      val count = norm(s)
      val max = (2 * threshold - 1) - remaining
      val stored = count + 1 // −1 → 0
      if (stored < max) bits += ((stored, nbBits - 1))
      else if (stored < threshold) bits += ((stored, nbBits))
      else bits += ((stored + max, nbBits))
      remaining -= (if (count < 0) -count else count)
      while (remaining > 1 && remaining < threshold) {
        nbBits -= 1
        threshold >>= 1
      }
      s += 1
      if (count == 0 && remaining > 1) {
        // zero-run flags for the zeros FOLLOWING a zero count: 2-bit
        // groups, each appending its value; 3 means "and another
        // group follows" — so the final group is always < 3
        var run = 0
        while (s + run < norm.length && norm(s + run) == 0) run += 1
        var left = run
        while (left >= 3) { bits += ((3, 2)); left -= 3 }
        bits += ((left, 2))
        s += run
      }
    }
    require(remaining == 1, s"normalized counts do not sum to $tableSize")
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0
    var accBits = 0
    bits.foreach { case (v, w) =>
      acc |= (v & ((1 << w) - 1)) << accBits
      accBits += w
      while (accBits >= 8) {
        out.write(acc & 0xff)
        acc >>>= 8
        accBits -= 8
      }
    }
    if (accBits > 0) out.write(acc & 0xff)
    out.toByteArray
  }

  // ----------------------------------------------------------------
  // Huffman-coded literals (§4.2): tree description (direct 4-bit
  // weights or FSE-compressed through the 2-state interleave),
  // canonical table fill (weight-ascending regions, symbol order
  // within a weight), single- and four-stream payloads, treeless
  // reuse across blocks of a frame.
  // ----------------------------------------------------------------

  /** Huffman decode table: 2^tableLog entries of (symbol, nbBits). */
  final class HufTable(val symbol: Array[Int], val nbBits: Array[Int],
      val tableLog: Int)

  /** Build the canonical table from PRESENT weights (symbol →
    * weight, 0 = absent, the implied last already resolved): total
    * 2^(w−1) mass must be an exact power of two ≤ 2^11. */
  def buildHuf(weights: Array[Int]): Option[HufTable] = {
    var total = 0L
    var maxW = 0
    var s = 0
    while (s < weights.length) {
      val w = weights(s)
      if (w < 0 || w > 11) return None
      if (w > 0) { total += 1L << (w - 1); if (w > maxW) maxW = w }
      s += 1
    }
    if (total == 0 || (total & (total - 1)) != 0) return None
    val tableLog = highbit(total.toInt)
    if (tableLog > 11) return None
    val size = 1 << tableLog
    val sym = new Array[Int](size)
    val nb = new Array[Int](size)
    // regions grouped by weight ascending; symbols ascending within
    val rankStart = new Array[Int](maxW + 2)
    var w = 1
    var pos = 0
    while (w <= maxW) {
      rankStart(w) = pos
      s = 0
      while (s < weights.length) {
        if (weights(s) == w) pos += 1 << (w - 1)
        s += 1
      }
      w += 1
    }
    if (pos != size) return None
    s = 0
    while (s < weights.length) {
      val ws = weights(s)
      if (ws > 0) {
        val run = 1 << (ws - 1)
        var k = 0
        while (k < run) {
          sym(rankStart(ws) + k) = s
          nb(rankStart(ws) + k) = tableLog + 1 - ws
          k += 1
        }
        rankStart(ws) += run
      }
      s += 1
    }
    Some(new HufTable(sym, nb, tableLog))
  }

  /** 2-state interleaved FSE decode (§4.1.2, the Huffman-weights
    * layout): alternate states until the bitstream exhausts, then
    * each state flushes one final symbol. */
  private def fse2Decode(bits: BackBits, t: Table,
      maxOut: Int): Option[Array[Int]] = {
    var s1 = bits.read(t.accuracyLog)
    var s2 = bits.read(t.accuracyLog)
    if (!bits.ok) return None
    val out = mutable.ArrayBuffer.empty[Int]
    var done = false
    while (!done) {
      if (out.length > maxOut) return None
      out += t.symbol(s1)
      if (bits.remaining < t.nbBits(s1)) { out += t.symbol(s2); done = true }
      else {
        s1 = t.base(s1) + bits.read(t.nbBits(s1))
        if (out.length > maxOut || s1 >= t.size) return None
        out += t.symbol(s2)
        if (bits.remaining < t.nbBits(s2)) { out += t.symbol(s1); done = true }
        else {
          s2 = t.base(s2) + bits.read(t.nbBits(s2))
          if (s2 >= t.size) return None
        }
      }
    }
    if (out.length > maxOut) None else Some(out.toArray)
  }

  /** Parse a Huffman tree description at `off`: returns the table
    * and the bytes consumed. Direct (headerByte ≥ 128: 4-bit
    * weights, high nibble first) or FSE-compressed (headerByte =
    * the compressed span; NCount description + 2-state weight
    * bitstream). The LAST present symbol's weight is implied from
    * the power-of-two remainder. */
  def readHufDesc(b: Array[Byte], off: Int, end: Int)
      : Option[(HufTable, Int)] = {
    if (off >= end) return None
    val hb = b(off) & 0xff
    var listed: Array[Int] = null
    var consumed = 0
    if (hb >= 128) {
      val n = hb - 127
      val bytes = (n + 1) / 2
      if (off + 1 + bytes > end) return None
      listed = new Array[Int](n)
      var i = 0
      while (i < n) {
        val byte = b(off + 1 + i / 2) & 0xff
        listed(i) = if (i % 2 == 0) byte >> 4 else byte & 0xf
        i += 1
      }
      consumed = 1 + bytes
    } else {
      if (hb == 0 || off + 1 + hb > end) return None
      val (norm, al, used) =
        readNCount(b, off + 1, off + 1 + hb, 255).getOrElse(return None)
      if (al > 6) return None // §4.2.1.1: weights accuracy ≤ 6
      val t = buildTable(norm, al).getOrElse(return None)
      val bits = new BackBits(b, off + 1 + used, off + 1 + hb)
      listed = fse2Decode(bits, t, 255).getOrElse(return None)
      consumed = 1 + hb
    }
    // resolve the implied last weight
    var total = 0L
    var i = 0
    while (i < listed.length) {
      val w = listed(i)
      if (w > 11) return None
      if (w > 0) total += 1L << (w - 1)
      i += 1
    }
    if (total == 0) return None
    val tableLog = highbit(total.toInt) + 1
    if (tableLog > 11) return None
    val rest = (1L << tableLog) - total
    if (rest <= 0 || (rest & (rest - 1)) != 0) return None
    val lastWeight = highbit(rest.toInt) + 1
    val weights = new Array[Int](listed.length + 1)
    System.arraycopy(listed, 0, weights, 0, listed.length)
    weights(listed.length) = lastWeight
    buildHuf(weights).map(t => (t, consumed))
  }

  /** Decode exactly `n` literals from one backward Huffman stream
    * into `out(outOff …)`; the stream must exhaust exactly. */
  private def hufDecodeStream(b: Array[Byte], off: Int, end: Int,
      t: HufTable, n: Int, out: Array[Byte], outOff: Int): Boolean = {
    val bits = new BackBits(b, off, end)
    if (!bits.ok) return n == 0
    var i = 0
    while (i < n) {
      val idx = bits.peekPad(t.tableLog)
      val nb = t.nbBits(idx)
      bits.consume(nb)
      if (!bits.ok) return false
      out(outOff + i) = t.symbol(idx).toByte
      i += 1
    }
    bits.exhausted
  }

  // ----------------------------------------------------------------
  // Sequences section decode (§3.1.1.3) + execution (§3.1.1.5)
  // ----------------------------------------------------------------

  /** A parsed dictionary (RFC 8878 §5): entropy tables preloaded
    * for the frame's first Repeat/Treeless blocks, initial repeat
    * offsets, and the content prefix matches may reach into. A
    * buffer without the magic is a RAW CONTENT dictionary (content
    * only, id 0, defaults elsewhere) per §5's fallback rule. */
  final class Dict(val id: Long, val huf: HufTable,
      val llTable: Table, val ofTable: Table, val mlTable: Table,
      val rep0: Int, val rep1: Int, val rep2: Int,
      val content: Array[Byte])

  val DictMagic = 0xec30a437L

  /** Parse a dictionary buffer. Fail-closed on a malformed
    * entropy section or out-of-range repeat offsets; magic-less
    * buffers fall back to raw content. */
  def parseDict(b: Array[Byte]): Option[Dict] = {
    if (b == null || b.length == 0) return None
    def u32(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    if (b.length < 8 || u32(0) != DictMagic)
      return Some(new Dict(0L, null, null, null, null, 1, 4, 8, b))
    val id = u32(4)
    var p = 8
    // entropy tables: Huffman (literals), then FSE for offsets,
    // match lengths, literals lengths — the §5 load order
    val (huf, hufUsed) = readHufDesc(b, p, b.length).getOrElse(return None)
    p += hufUsed
    def fse(maxSym: Int, maxAl: Int): Option[Table] =
      readNCount(b, p, b.length, maxSym).flatMap { case (norm, al, used) =>
        if (al > maxAl) None
        else { p += used; buildTable(norm, al) }
      }
    val ofT = fse(31, 8).getOrElse(return None)
    val mlT = fse(52, 9).getOrElse(return None)
    val llT = fse(35, 9).getOrElse(return None)
    if (p + 12 > b.length) return None
    val r0 = u32(p).toInt; val r1 = u32(p + 4).toInt
    val r2 = u32(p + 8).toInt
    p += 12
    val content = java.util.Arrays.copyOfRange(b, p, b.length)
    if (r0 <= 0 || r1 <= 0 || r2 <= 0 ||
      r0 > content.length || r1 > content.length ||
      r2 > content.length) return None
    Some(new Dict(id, huf, llT, ofT, mlT, r0, r1, r2, content))
  }

  /** Per-frame decode context: repeat offsets, (for Repeat-mode
    * blocks) the previous block's FSE tables, and (for Treeless
    * literals) the previous block's Huffman table persist across
    * the blocks of a frame; a dictionary preloads all of them and
    * extends the match window into its content. */
  final class FrameCtx(dict: Dict = null) {
    var rep0: Int = if (dict != null) dict.rep0 else 1
    var rep1: Int = if (dict != null) dict.rep1 else 4
    var rep2: Int = if (dict != null) dict.rep2 else 8
    var llTable: Table = if (dict != null) dict.llTable else null
    var ofTable: Table = if (dict != null) dict.ofTable else null
    var mlTable: Table = if (dict != null) dict.mlTable else null
    var hufTable: HufTable = if (dict != null) dict.huf else null
    val dictContent: Array[Byte] =
      if (dict != null) dict.content else null
  }

  /** An RLE "table": one symbol, zero bits everywhere. */
  private def rleTable(symbol: Int): Table =
    new Table(Array(symbol), Array(0), Array(0), 0)

  /** Growable frame output with back-reference access. Matches may
    * reach anywhere within the CURRENT frame's output (the window)
    * but never across a frame boundary — `frameStart` marks it. */
  final class Out(cap: Int) {
    private var buf = new Array[Byte](math.min(cap, 1 << 16))
    var len: Int = 0
    var frameStart: Int = 0
    private def ensure(n: Int): Boolean = {
      if (len + n > cap) return false
      if (len + n > buf.length) {
        var sz = buf.length
        while (sz < len + n) sz <<= 1
        buf = java.util.Arrays.copyOf(buf, math.min(sz, cap))
      }
      true
    }
    def append(src: Array[Byte], from: Int, n: Int): Boolean = {
      if (!ensure(n)) return false
      System.arraycopy(src, from, buf, len, n)
      len += n
      true
    }
    def appendRle(v: Byte, n: Int): Boolean = {
      if (!ensure(n)) return false
      java.util.Arrays.fill(buf, len, len + n, v)
      len += n
      true
    }
    /** Overlapping LZ copy from `offset` back — byte by byte, the
      * spec's sequential semantics. With a dictionary, the window
      * extends past the frame start into the dict CONTENT (§5):
      * source positions below frameStart read from the content's
      * tail and roll forward into the frame's own output. */
    def copyMatch(offset: Int, n: Int,
        dict: Array[Byte] = null): Boolean = {
      val produced = len - frameStart
      val window = produced + (if (dict == null) 0 else dict.length)
      if (offset <= 0 || offset > window || !ensure(n)) return false
      var k = 0
      while (k < n) {
        val src = len + k - offset
        buf(len + k) =
          if (src >= frameStart) buf(src)
          else dict(dict.length + (src - frameStart))
        k += 1
      }
      len += n
      true
    }
    def bytes: Array[Byte] = java.util.Arrays.copyOf(buf, len)
    def sumFrom(start: Int): Long = {
      var s = 0L
      var k = start
      while (k < len) { s += buf(k) & 0xff; k += 1 }
      s
    }
    /** XXH64 (seed 0) of [start, len) — the frame content checksum
      * (RFC 8878 §3.1.1: stored low 32 bits, little-endian). */
    def xxh64From(start: Int): Long = Xxh64.hash(buf, start, len - start)
  }

  /** XXH64 — the public xxHash specification's 64-bit variant,
    * from scratch (primes, 31/27/11-rotate lanes, the avalanche),
    * used only to VERIFY frame content checksums. */
  object Xxh64 {
    private val P1 = 0x9e3779b185ebca87L
    private val P2 = 0xc2b2ae3d27d4eb4fL
    private val P3 = 0x165667b19e3779f9L
    private val P4 = 0x85ebca77c2b2ae63L
    private val P5 = 0x27d4eb2f165667c5L
    private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))
    private def u64(b: Array[Byte], i: Int): Long = {
      var v = 0L
      var k = 0
      while (k < 8) { v |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
      v
    }
    private def u32l(b: Array[Byte], i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    private def round(acc: Long, in: Long): Long =
      rotl(acc + in * P2, 31) * P1
    private def mergeRound(acc: Long, v: Long): Long =
      (acc ^ round(0L, v)) * P1 + P4
    def hash(b: Array[Byte], off: Int, len: Int): Long = {
      var i = off
      val end = off + len
      var h =
        if (len >= 32) {
          var v1 = P1 + P2
          var v2 = P2
          var v3 = 0L
          var v4 = -P1
          while (i + 32 <= end) {
            v1 = round(v1, u64(b, i))
            v2 = round(v2, u64(b, i + 8))
            v3 = round(v3, u64(b, i + 16))
            v4 = round(v4, u64(b, i + 24))
            i += 32
          }
          var acc = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) +
            rotl(v4, 18)
          acc = mergeRound(acc, v1)
          acc = mergeRound(acc, v2)
          acc = mergeRound(acc, v3)
          mergeRound(acc, v4)
        } else P5
      h += len
      while (i + 8 <= end) {
        h = rotl(h ^ round(0L, u64(b, i)), 27) * P1 + P4
        i += 8
      }
      if (i + 4 <= end) {
        h = rotl(h ^ (u32l(b, i) * P1), 23) * P2 + P3
        i += 4
      }
      while (i < end) {
        h = rotl(h ^ ((b(i) & 0xffL) * P5), 11) * P1
        i += 1
      }
      h ^= h >>> 33
      h *= P2
      h ^= h >>> 29
      h *= P3
      h ^ (h >>> 32)
    }
  }

  /** Decode ONE compressed block (`b[off, off+len)`) into `out`,
    * threading `ctx` (repeat offsets + Repeat-mode tables). False
    * on any malformation — the caller rejects the whole payload. */
  def decodeBlock(b: Array[Byte], off: Int, len: Int, out: Out,
      ctx: FrameCtx): Boolean = {
    val end = off + len
    if (len < 2 || end > b.length) return false
    // --- literals section (§3.1.1.1): all four classes — Raw, RLE,
    // Compressed (Huffman, §4.2) and Treeless (previous block's
    // Huffman table) ---
    val h0 = b(off) & 0xff
    val litType = h0 & 3
    val sizeFormat = (h0 >> 2) & 3
    var p = off
    var litLen = 0
    var lits: Array[Byte] = null
    if (litType <= 1) {
      sizeFormat match {
        case 0 | 2 =>
          litLen = h0 >> 3
          p += 1
        case 1 =>
          if (off + 2 > end) return false
          litLen = (h0 >> 4) | ((b(off + 1) & 0xff) << 4)
          p += 2
        case _ =>
          if (off + 3 > end) return false
          litLen = (h0 >> 4) | ((b(off + 1) & 0xff) << 4) |
            ((b(off + 2) & 0xff) << 12)
          p += 3
      }
      lits = new Array[Byte](litLen)
      if (litType == 0) { // Raw
        if (p + litLen > end) return false
        System.arraycopy(b, p, lits, 0, litLen)
        p += litLen
      } else { // RLE
        if (p >= end) return false
        java.util.Arrays.fill(lits, b(p))
        p += 1
      }
    } else {
      // Compressed / Treeless: (regen, compressed) sizes by format
      var comp = 0
      var fourStreams = true
      sizeFormat match {
        case 0 | 1 => // 3-byte header, 10+10 bits; format 0 = 1 stream
          if (off + 3 > end) return false
          fourStreams = sizeFormat == 1
          litLen = (h0 >> 4) | ((b(off + 1) & 0x3f) << 4)
          comp = ((b(off + 1) & 0xff) >> 6) | ((b(off + 2) & 0xff) << 2)
          p += 3
        case 2 => // 4-byte header, 14+14 bits
          if (off + 4 > end) return false
          litLen = (h0 >> 4) | ((b(off + 1) & 0xff) << 4) |
            ((b(off + 2) & 0x03) << 12)
          comp = ((b(off + 2) & 0xff) >> 2) | ((b(off + 3) & 0xff) << 6)
          p += 4
        case _ => // 5-byte header, 18+18 bits
          if (off + 5 > end) return false
          litLen = (h0 >> 4) | ((b(off + 1) & 0xff) << 4) |
            ((b(off + 2) & 0x3f) << 12)
          comp = ((b(off + 2) & 0xff) >> 6) | ((b(off + 3) & 0xff) << 2) |
            ((b(off + 4) & 0xff) << 10)
          p += 5
      }
      if (p + comp > end) return false
      val compEnd = p + comp
      val huf =
        if (litType == 2) {
          val (t, used) = readHufDesc(b, p, compEnd).getOrElse(return false)
          p += used
          ctx.hufTable = t
          t
        } else Option(ctx.hufTable).getOrElse(return false)
      lits = new Array[Byte](litLen)
      if (!fourStreams) {
        if (!hufDecodeStream(b, p, compEnd, huf, litLen, lits, 0))
          return false
      } else {
        // §3.1.1.1.6: 6-byte jump table (u16 LE sizes of streams
        // 1–3), stream 4 = the rest; streams 1–3 each regenerate
        // ceil(litLen/4), stream 4 the remainder
        if (p + 6 > compEnd) return false
        def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
        val s1 = u16(p); val s2 = u16(p + 2); val s3 = u16(p + 4)
        p += 6
        val n1 = (litLen + 3) / 4
        val n4 = litLen - 3 * n1
        if (n4 < 0) return false
        val o1 = p
        val o2 = o1 + s1
        val o3 = o2 + s2
        val o4 = o3 + s3
        if (o4 > compEnd) return false
        if (!hufDecodeStream(b, o1, o2, huf, n1, lits, 0)) return false
        if (!hufDecodeStream(b, o2, o3, huf, n1, lits, n1)) return false
        if (!hufDecodeStream(b, o3, o4, huf, n1, lits, 2 * n1)) return false
        if (!hufDecodeStream(b, o4, compEnd, huf, n4, lits, 3 * n1))
          return false
      }
      p = compEnd
    }
    // --- sequences section header (§3.1.1.3.1) ---
    if (p >= end) return false
    val b0 = b(p) & 0xff
    var nbSeq = 0
    if (b0 < 128) { nbSeq = b0; p += 1 }
    else if (b0 < 255) {
      if (p + 2 > end) return false
      nbSeq = ((b0 - 128) << 8) + (b(p + 1) & 0xff)
      p += 2
    } else {
      if (p + 3 > end) return false
      nbSeq = (b(p + 1) & 0xff) + ((b(p + 2) & 0xff) << 8) + 0x7f00
      p += 3
    }
    if (nbSeq == 0) {
      // no sequences: the block content is the literals verbatim
      return p == end && out.append(lits, 0, litLen)
    }
    if (p >= end) return false
    val modes = b(p) & 0xff
    p += 1
    if ((modes & 3) != 0) return false // reserved bits
    // table per code, in LL → OF → ML field order
    def tableFor(mode: Int, defaultT: Table, maxSym: Int, maxAl: Int,
        prev: Table): Option[Table] = mode match {
      case 0 => Some(defaultT)
      case 1 => // RLE: one byte, the symbol
        if (p >= end) None
        else {
          val sy = b(p) & 0xff
          p += 1
          if (sy > maxSym) None else Some(rleTable(sy))
        }
      case 2 => // FSE_Compressed: explicit table description.
        // §4.1.1 caps accuracy log PER FIELD (LL≤9, OF≤8, ML≤9) —
        // fail closed past the field cap, as parseDict already does.
        readNCount(b, p, end, maxSym).flatMap { case (norm, al, used) =>
          if (al > maxAl) None
          else {
            p += used
            buildTable(norm, al)
          }
        }
      case _ => Option(prev) // Repeat: previous table (None if first)
    }
    val llT = tableFor((modes >> 6) & 3, LlDefaultTable, 35, 9, ctx.llTable)
      .getOrElse(return false)
    val ofT = tableFor((modes >> 4) & 3, OfDefaultTable, 31, 8, ctx.ofTable)
      .getOrElse(return false)
    val mlT = tableFor((modes >> 2) & 3, MlDefaultTable, 52, 9, ctx.mlTable)
      .getOrElse(return false)
    ctx.llTable = llT; ctx.ofTable = ofT; ctx.mlTable = mlT
    // --- the backward bitstream is the REST of the block ---
    val bits = new BackBits(b, p, end)
    var llState = bits.read(llT.accuracyLog)
    var ofState = bits.read(ofT.accuracyLog)
    var mlState = bits.read(mlT.accuracyLog)
    if (!bits.ok) return false
    var litPos = 0
    var i = 0
    while (i < nbSeq) {
      val llCode = llT.symbol(llState)
      val ofCode = ofT.symbol(ofState)
      val mlCode = mlT.symbol(mlState)
      if (llCode > 35 || mlCode > 52 || ofCode > 30) return false
      // extra bits: offset, then match length, then literals length
      val ofExtra = bits.read(ofCode)
      val mlExtra = bits.read(MlBits(mlCode))
      val llExtra = bits.read(LlBits(llCode))
      if (!bits.ok) return false
      val ll = LlBase(llCode) + llExtra
      val ml = MlBase(mlCode) + mlExtra
      val offsetValue = (1 << ofCode) + ofExtra
      // §3.1.1.5 repeat offsets
      var offset = 0
      if (offsetValue > 3) {
        offset = offsetValue - 3
        ctx.rep2 = ctx.rep1; ctx.rep1 = ctx.rep0; ctx.rep0 = offset
      } else {
        val idx = offsetValue - 1 + (if (ll == 0) 1 else 0)
        idx match {
          case 0 => offset = ctx.rep0
          case 1 =>
            offset = ctx.rep1
            ctx.rep1 = ctx.rep0; ctx.rep0 = offset
          case 2 =>
            offset = ctx.rep2
            ctx.rep2 = ctx.rep1; ctx.rep1 = ctx.rep0; ctx.rep0 = offset
          case _ =>
            offset = ctx.rep0 - 1
            if (offset <= 0) return false
            ctx.rep2 = ctx.rep1; ctx.rep1 = ctx.rep0; ctx.rep0 = offset
        }
      }
      // execute: literals copy, then the match copy
      if (litPos + ll > litLen) return false
      if (!out.append(lits, litPos, ll)) return false
      litPos += ll
      if (!out.copyMatch(offset, ml, ctx.dictContent)) return false
      // state updates (all but the last sequence): LL, ML, OF
      if (i < nbSeq - 1) {
        llState = llT.base(llState) + bits.read(llT.nbBits(llState))
        mlState = mlT.base(mlState) + bits.read(mlT.nbBits(mlState))
        ofState = ofT.base(ofState) + bits.read(ofT.nbBits(ofState))
        if (!bits.ok || llState >= llT.size || mlState >= mlT.size ||
          ofState >= ofT.size) return false
      }
      i += 1
    }
    if (!bits.exhausted) return false // strict framing, as everywhere
    // trailing literals
    out.append(lits, litPos, litLen - litPos)
  }

  /** Decompress a full (possibly multi-frame) zstd payload using
    * [[Zstd]]'s frame walk with this object's compressed-block
    * decode. None fail-closed. */
  def decompress(b: Array[Byte]): Option[Array[Byte]] =
    Zstd.walk(b).map(_._6)

  /** [[decompress]] with a dictionary: the dict parses once, every
    * frame starts from its entropy tables / repeat offsets, and
    * matches may reach into its content. Frames carrying a nonzero
    * Dictionary_ID must match the dict's (fail-closed on a wrong
    * dict — the spec's corruption case, not a silent mis-decode). */
  def decompressWithDict(b: Array[Byte],
      dict: Array[Byte]): Option[Array[Byte]] =
    parseDict(dict).flatMap(d => Zstd.walk(b, d).map(_._6))

  /** Frame-boundary discovery WITHOUT decoding — the splittable-
    * ingest primitive for multi-frame `.zst` dumps (frames are
    * independent decode units, so a 100 TB file parallelizes at
    * these offsets): headers are walked and blocks SKIPPED by their
    * declared sizes (raw = size bytes, RLE = 1 byte, compressed =
    * size bytes — no entropy work), checksums skipped by flag.
    * Returns (offset, length, isSkippable) per frame, fail-closed
    * on any framing damage. */
  def frameBoundaries(b: Array[Byte]): Option[Seq[(Int, Int, Boolean)]] = {
    if (b == null || b.length < 4) return None
    def u32(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    val out = mutable.ArrayBuffer.empty[(Int, Int, Boolean)]
    var i = 0
    while (i < b.length) {
      val start = i
      if (i + 4 > b.length) return None
      val magic = u32(i)
      i += 4
      if ((magic & 0xfffffff0L) == Zstd.SkippableLo) {
        if (i + 4 > b.length) return None
        val n = u32(i)
        i += 4
        if (i + n > b.length) return None
        i += n.toInt
        out += ((start, i - start, true))
      } else if (magic == Zstd.Magic) {
        if (i >= b.length) return None
        val fhd = b(i) & 0xff
        i += 1
        if ((fhd & 0x08) != 0) return None
        val single = (fhd & 0x20) != 0
        if (!single) i += 1 // window descriptor
        i += Array(0, 1, 2, 4)(fhd & 0x03) // dictionary id
        val fcsFlag = fhd >> 6
        i += (if (fcsFlag == 0) { if (single) 1 else 0 }
          else Array(0, 2, 4, 8)(fcsFlag))
        var last = false
        while (!last) {
          if (i + 3 > b.length) return None
          val hdr = (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
            ((b(i + 2) & 0xffL) << 16)
          i += 3
          last = (hdr & 1) != 0
          val btype = ((hdr >> 1) & 3).toInt
          val size = (hdr >> 3).toInt
          btype match {
            case 0 | 2 => i += size // raw / compressed: size bytes
            case 1 => i += 1 // RLE: one byte regardless of size
            case _ => return None
          }
          if (i > b.length) return None
        }
        if ((fhd & 0x04) != 0) i += 4 // content checksum
        if (i > b.length) return None
        out += ((start, i - start, false))
      } else return None
    }
    Some(out.toSeq)
  }

  /** Split-and-reassemble decode: discover the frame boundaries
    * header-only, decode every NON-SKIPPABLE frame INDEPENDENTLY
    * (the parallel-ingest shape — each split decodes with no state
    * from its neighbors), concatenate in order. Equal to
    * [[decompress]] by construction; the roundtrip query proves
    * the split points land exactly on decodable units. */
  def splitDecode(b: Array[Byte]): Option[Array[Byte]] =
    frameBoundaries(b).flatMap { frames =>
      val out = new java.io.ByteArrayOutputStream(b.length * 2)
      frames.foreach { case (off, len, skip) =>
        if (!skip) {
          val one = java.util.Arrays.copyOfRange(b, off, off + len)
          decompress(one) match {
            case Some(d) => out.write(d, 0, d.length)
            case None => return None
          }
        }
      }
      Some(out.toByteArray)
    }

  // ----------------------------------------------------------------
  // Encoder — greedy-LZ + FSE over the same spec tables, for the
  // oracle-checked roundtrip fixtures.
  // ----------------------------------------------------------------

  private final case class Seq4(litLen: Int, offsetValue: Int, ml: Int)

  /** FSE-encode one code stream against `t`: choose the state chain
    * backward (for each symbol the unique state whose baseline range
    * contains the next state — the per-symbol ranges tile the state
    * space), return (initState, updates) where updates(i) feeds the
    * decoder's transition after sequence i. */
  private def chooseStates(codes: Array[Int], t: Table): (Int, Array[(Int, Int)]) = {
    def statesOf(sym: Int): Array[Int] =
      (0 until t.size).filter(t.symbol(_) == sym).toArray
    val n = codes.length
    val updates = new Array[(Int, Int)](math.max(0, n - 1))
    var st = statesOf(codes(n - 1)).head
    var i = n - 2
    while (i >= 0) {
      val target = st
      val cand = statesOf(codes(i)).find(c =>
        t.base(c) <= target && target < t.base(c) + (1 << t.nbBits(c))).get
      updates(i) = (target - t.base(cand), t.nbBits(cand))
      st = cand
      i -= 1
    }
    (st, updates)
  }

  /** Scale raw code counts to a power-of-two table (sum `1 << al`),
    * every present symbol ≥ 1 — the explicit-table path's
    * normalizer (largest-count absorbs the rounding slack). */
  def normalizeCounts(counts: Array[Int], al: Int): Array[Int] = {
    val total = counts.sum
    val tableSize = 1 << al
    require(total > 0)
    val norm = counts.map(c =>
      if (c == 0) 0 else math.max(1, (c.toLong * tableSize / total).toInt))
    var slack = tableSize - norm.sum
    val largest = norm.indices.maxBy(norm(_))
    norm(largest) += slack
    require(norm(largest) >= 1, "normalization underflow")
    norm
  }

  /** Compress `raw` into one zstd frame of compressed blocks.
    * `explicitTables = true` transmits per-block FSE table
    * descriptions (normalized from the block's own code histogram);
    * otherwise the predefined distributions are used. The LZ parse
    * is greedy over a 4-byte hash with offsets ≤ 2^16; repeat
    * offset 1 is emitted when it applies (so the repeat path
    * crosses the oracle too). */
  def compress(raw: Array[Byte], explicitTables: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    w32(Zstd.Magic)
    val n = raw.length
    if (n < 256) { out.write(0x20); out.write(n) }
    else if (n < 65536 + 256) {
      out.write(0x60)
      val v = n - 256
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
    } else { out.write(0xa0); w32(n) }
    // one block per ≤ 64 KiB chunk (block regen limit) — with the
    // real-encoder fallback: a "compressed" block may not be ≥ its
    // regenerated content (the reference decoder enforces it), so
    // incompressible chunks (and the empty frame) emit RAW blocks
    val enc = new EncCtx
    var cFrom = 0
    while (cFrom < n || (n == 0 && cFrom == 0)) {
      val cLen = math.min(1 << 16, n - cFrom)
      val last = cFrom + cLen >= n
      val (r0, r1, r2) = (enc.rep0, enc.rep1, enc.rep2)
      val body = compressBlock(raw, cFrom, cLen, explicitTables, enc)
      def hdr3(size: Int, btype: Int): Unit = {
        val h = (size.toLong << 3) | (btype.toLong << 1) |
          (if (last) 1L else 0L)
        out.write((h & 0xff).toInt)
        out.write(((h >> 8) & 0xff).toInt)
        out.write(((h >> 16) & 0xff).toInt)
      }
      if (body.length >= cLen) {
        // raw fallback — and the encoder's repeat-offset model must
        // roll back: the decoder never sees this block's sequences
        enc.rep0 = r0; enc.rep1 = r1; enc.rep2 = r2
        hdr3(cLen, 0)
        out.write(raw, cFrom, cLen)
      } else {
        hdr3(body.length, 2)
        out.write(body, 0, body.length)
      }
      cFrom += cLen
      if (n == 0) cFrom = 1 // emitted the one empty block
    }
    out.toByteArray
  }

  /** Encoder-side frame state: the repeat offsets, mirrored with
    * the decoder's §3.1.1.5 update rules. */
  private final class EncCtx {
    var rep0 = 1; var rep1 = 4; var rep2 = 8
  }

  private def compressBlock(raw: Array[Byte], from: Int, len: Int,
      explicitTables: Boolean, enc: EncCtx): Array[Byte] = {
    // --- greedy LZ parse (block-local candidates) ---
    val seqs = mutable.ArrayBuffer.empty[Seq4]
    val lits = new java.io.ByteArrayOutputStream(len)
    val posOf = new mutable.HashMap[Int, Int]
    def key(i: Int): Int =
      ((raw(i) & 0xff) << 24) | ((raw(i + 1) & 0xff) << 16) |
        ((raw(i + 2) & 0xff) << 8) | (raw(i + 3) & 0xff)
    var i = from
    var lit = from
    val end = from + len
    while (i + 4 <= end) {
      val k = key(i)
      val cand = posOf.get(k)
      posOf(k) = i
      cand match {
        case Some(c) if c < i && i - c <= (1 << 16) && raw(c) == raw(i) &&
            raw(c + 1) == raw(i + 1) && raw(c + 2) == raw(i + 2) &&
            raw(c + 3) == raw(i + 3) =>
          var ml = 4
          while (i + ml < end && raw(c + ml) == raw(i + ml)) ml += 1
          val offset = i - c
          val litLen = i - lit
          val offsetValue =
            if (offset == enc.rep0 && litLen > 0) 1 else offset + 3
          if (offsetValue != 1) {
            enc.rep2 = enc.rep1; enc.rep1 = enc.rep0; enc.rep0 = offset
          }
          seqs += Seq4(litLen, offsetValue, ml)
          lits.write(raw, lit, litLen)
          // index the skipped positions STRICTLY inside the match —
          // position i+ml is the next loop head and indexing it here
          // would make it its own zero-offset candidate
          var j = i + 1
          val stop = math.min(i + ml - 1, end - 4)
          while (j <= stop) { posOf(key(j)) = j; j += 1 }
          i += ml
          lit = i
        case _ => i += 1
      }
    }
    val lastLits = end - lit
    lits.write(raw, lit, lastLits)
    val litBytes = lits.toByteArray
    // --- literals section: Raw, smallest size format that fits ---
    val body = new java.io.ByteArrayOutputStream(len / 2 + 32)
    val ll = litBytes.length
    if (ll < 32) body.write((ll << 3) | 0)
    else if (ll < 4096) {
      body.write(((ll & 0xf) << 4) | (1 << 2) | 0)
      body.write((ll >> 4) & 0xff)
    } else {
      body.write(((ll & 0xf) << 4) | (3 << 2) | 0)
      body.write((ll >> 4) & 0xff)
      body.write((ll >> 12) & 0xff)
    }
    body.write(litBytes, 0, ll)
    // --- sequences section ---
    val nbSeq = seqs.length
    if (nbSeq < 128) body.write(nbSeq)
    else if (nbSeq < 0x7f00) {
      body.write((nbSeq >> 8) + 128); body.write(nbSeq & 0xff)
    } else {
      body.write(255)
      body.write((nbSeq - 0x7f00) & 0xff)
      body.write(((nbSeq - 0x7f00) >> 8) & 0xff)
    }
    if (nbSeq == 0) return body.toByteArray
    val llCodes = seqs.map(s => llCodeOf(s.litLen)).toArray
    val mlCodes = seqs.map(s => mlCodeOf(s.ml)).toArray
    val ofCodes = seqs.map(s => highbit(s.offsetValue)).toArray
    var llT = LlDefaultTable
    var mlT = MlDefaultTable
    var ofT = OfDefaultTable
    if (!explicitTables) body.write(0x00) // all Predefined
    else {
      body.write((2 << 6) | (2 << 4) | (2 << 2)) // all FSE_Compressed
      def explicit(codes: Array[Int], maxSym: Int, al: Int): Table = {
        val counts = new Array[Int](maxSym + 1)
        codes.foreach(counts(_) += 1)
        val norm = normalizeCounts(counts, al)
        val desc = writeNCount(norm, al)
        body.write(desc, 0, desc.length)
        buildTable(norm, al).get
      }
      llT = explicit(llCodes, 35, LlDefaultAl)
      ofT = explicit(ofCodes, 31, OfDefaultAl)
      mlT = explicit(mlCodes, 52, MlDefaultAl)
    }
    // --- backward bitstream: fields in decoder-read order, written
    // reversed ---
    val (llInit, llUpd) = chooseStates(llCodes, llT)
    val (ofInit, ofUpd) = chooseStates(ofCodes, ofT)
    val (mlInit, mlUpd) = chooseStates(mlCodes, mlT)
    val fields = mutable.ArrayBuffer.empty[(Int, Int)]
    fields += ((llInit, llT.accuracyLog))
    fields += ((ofInit, ofT.accuracyLog))
    fields += ((mlInit, mlT.accuracyLog))
    var q = 0
    while (q < nbSeq) {
      val s = seqs(q)
      fields += ((s.offsetValue - (1 << ofCodes(q)), ofCodes(q)))
      fields += ((s.ml - MlBase(mlCodes(q)), MlBits(mlCodes(q))))
      fields += ((s.litLen - LlBase(llCodes(q)), LlBits(llCodes(q))))
      if (q < nbSeq - 1) {
        fields += llUpd(q)
        fields += mlUpd(q)
        fields += ofUpd(q)
      }
      q += 1
    }
    var acc = 0L
    var accBits = 0
    val bs = new java.io.ByteArrayOutputStream(64)
    var fi = fields.length - 1
    while (fi >= -1) {
      val (v, w) = if (fi >= 0) fields(fi) else (1, 1) // sentinel bit
      acc |= (v.toLong & ((1L << w) - 1)) << accBits
      accBits += w
      while (accBits >= 8) {
        bs.write((acc & 0xff).toInt)
        acc >>>= 8
        accBits -= 8
      }
      fi -= 1
    }
    if (accBits > 0) bs.write((acc & 0xff).toInt)
    body.write(bs.toByteArray, 0, bs.size())
    body.toByteArray
  }
}
