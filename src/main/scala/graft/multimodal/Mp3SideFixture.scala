package graft.multimodal

/** Builds real MPEG-1 Layer III frames whose side-information block
  * and main-data scalefactor region carry genuine §2.4.1.7 /
  * §2.4.2.7 (ISO 11172-3) structure — the encode half of the
  * `mm_mp3_sideinfo` round-trip, the [[FlacFixture]] discipline: the
  * DuckDB oracle replays every expected FIELD in closed form from
  * `doc_id` while the engine must recover them through the actual
  * packed bits ([[Mp3Headers.sideInfo]]'s walk), so any
  * encode/decode disagreement about bit widths, branch layout, scfsi
  * copy semantics, or the slen tables lands as a hash mismatch.
  *
  * Stream layout per document: an ID3v2.4 tag on 3 of 4 docs (the
  * syncsafe skip), then ONE frame at 128–320 kbps (large enough to
  * hold the worst-case scalefactor region):
  *
  *  - side info: `main_data_begin` (9 bits — nonzero on docs
  *    divisible by 7, exercising the reader's reservoir refusal),
  *    private bits, per-channel `scfsi`, then per granule × channel:
  *    part2_3_length / big_values / global_gain / scalefac_compress,
  *    the window-switching branch (granule 1 on odd docs: block
  *    type 1–3, mixed flag, 2 table selects, 3 subblock gains;
  *    otherwise 3 table selects + region counts), and the
  *    preflag / scalefac_scale / count1table_select tail.
  *  - main data (reservoir-free, `main_data_begin` notwithstanding —
  *    bytes are always written so the refusal is the PARSER's
  *    choice): per granule × channel the transmitted scalefactors
  *    (long 21-band / short 36 / mixed 35 layouts; granule-1 long
  *    groups with their scfsi bit set are NOT transmitted — the
  *    decoder must copy granule 0's), then `filler` zero bits
  *    standing in for the Huffman part3 (sample decode stays the
  *    declared [[Multimodal.StubCodec]] fake), with
  *    `part2_3_length = transmitted scalefactor bits + filler` so a
  *    reader that mis-sums part2 desynchronizes the next channel.
  */
object Mp3SideFixture {

  /** §2.4.2.7 slen1/slen2 by scalefac_compress 0..15. */
  private[multimodal] val Slen1 =
    Array(0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4)
  private[multimodal] val Slen2 =
    Array(0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3)

  /** Long-block scfsi group sizes (bands 0–5, 6–10, 11–15, 16–20). */
  private[multimodal] val ScfsiGroupSize = Array(6, 5, 5, 5)

  // ---- deterministic per-document parameters (the oracle's basis) ----
  def srIdxOf(d: Long): Int = (d % 3).toInt
  def rateOf(d: Long): Int = Mp3Headers.SampleRateHz(srIdxOf(d))
  /** 128–320 kbps: every frame fits side info + worst-case part2. */
  def brIdxOf(d: Long): Int = 9 + (d % 6).toInt
  def padOf(d: Long): Int = (d % 2).toInt
  /** 1 = joint stereo on even docs, 3 = mono on odd (header mode). */
  def modeOf(d: Long): Int = if (d % 2 == 0) 1 else 3
  def nchOf(d: Long): Int = if (modeOf(d) == 3) 1 else 2
  def hasId3(d: Long): Boolean = d % 4 != 0
  def id3PadOf(d: Long): Int = (d % 64).toInt

  def mdbOf(d: Long): Int =
    if (d % 7 == 0) ((d % 511) + 1).toInt else 0
  /** Granule 1 window switching on odd docs; granule 0 always long. */
  def wsfOf(d: Long, g: Int): Int = if (g == 1) (d % 2).toInt else 0
  def btOf(d: Long): Int = ((d % 3) + 1).toInt
  def mixedOf(d: Long): Int = if (d % 4 == 1) 1 else 0
  /** scfsi must be 0 when granule 1 runs short blocks (§2.4.2.7). */
  def scfsiOf(d: Long, c: Int): Int =
    if (wsfOf(d, 1) == 1 && btOf(d) == 2) 0 else ((d + 7 * c) % 16).toInt
  def bigvOf(d: Long, g: Int, c: Int): Int =
    ((d * 7 + g * 5 + c * 3) % 289).toInt
  def gainOf(d: Long, g: Int, c: Int): Int =
    ((d * 9 + g * 17 + c * 23) % 256).toInt
  def sfcOf(d: Long, g: Int, c: Int): Int =
    ((d + g * 3 + c) % 16).toInt
  def tselOf(d: Long, g: Int, c: Int, t: Int): Int =
    ((d * 5 + g * 3 + c * 2 + t * 11) % 32).toInt
  def r0Of(d: Long, c: Int): Int = ((d + c) % 16).toInt
  def r1Of(d: Long, c: Int): Int = ((d * 3 + c) % 8).toInt
  def sbgOf(d: Long, c: Int, w: Int): Int = ((d + c + w) % 8).toInt
  def preOf(d: Long, g: Int, c: Int): Int = ((d + g + c) % 2).toInt
  def sfsOf(d: Long, g: Int, c: Int): Int = ((d / 2 + g) % 2).toInt
  def c1tOf(d: Long, g: Int, c: Int): Int = ((d / 4 + c) % 2).toInt
  /** Fake-Huffman part3 length in bits. */
  def fillerOf(d: Long, g: Int, c: Int): Int =
    ((d * 7 + g * 13 + c * 37) % 120).toInt
  /** Transmitted scalefactor value for transmission slot `j`. */
  def sfValOf(d: Long, g: Int, c: Int, j: Int, slen: Int): Int =
    if (slen == 0) 0
    else ((d + g * 11 + c * 5 + j * 3) % (1L << slen)).toInt

  /** (slen per transmission slot, transmitted?) for granule/channel —
    * the transmission-order scalefactor layout. Granule-1 long slots
    * in a group whose scfsi bit is set are present in the DECODED
    * band sequence but not transmitted. */
  private def sfLayout(d: Long, g: Int, c: Int,
      wsfF: Int => Int): IndexedSeq[(Int, Boolean)] = {
    val sfc = sfcOf(d, g, c)
    val s1 = Slen1(sfc); val s2 = Slen2(sfc)
    if (wsfF(g) == 1 && btOf(d) == 2) {
      if (mixedOf(d) == 1)
        (0 until 17).map(_ => (s1, true)) ++
          (0 until 18).map(_ => (s2, true))
      else
        (0 until 18).map(_ => (s1, true)) ++
          (0 until 18).map(_ => (s2, true))
    } else {
      val scfsi = scfsiOf(d, c)
      (0 until 4).flatMap { k =>
        val slen = if (k < 2) s1 else s2
        val copied = g == 1 && ((scfsi >> (3 - k)) & 1) == 1
        (0 until ScfsiGroupSize(k)).map(_ => (slen, !copied))
      }
    }
  }

  /** Transmitted part2 bit count for granule/channel. */
  def part2BitsOf(d: Long, g: Int, c: Int): Int =
    sfLayout(d, g, c, wsfOf(d, _))
      .collect { case (slen, true) => slen }.sum

  /** [[part2BitsOf]] under the all-long-blocks override the
    * big-values fixture runs (window switching forced off). */
  def part2BitsLongOf(d: Long, g: Int, c: Int): Int =
    sfLayout(d, g, c, _ => 0).collect { case (slen, true) => slen }.sum

  def p23Of(d: Long, g: Int, c: Int): Int =
    part2BitsOf(d, g, c) + fillerOf(d, g, c)

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream(512)
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
    def bitCount: Int = buf.size * 8 + nBits
    def bytes: Array[Byte] = { while (nBits != 0) write(0, 1); buf.toByteArray }
  }

  // ---- count1-region parameters (the mm_mp3_count1 fixture) ----
  def nqOf(d: Long, g: Int, c: Int): Int =
    ((d + g * 3 + c * 5) % 20).toInt
  /** Quadruple (v,w,x,y) as a 4-bit pattern, v the high bit. */
  def patOf(d: Long, g: Int, c: Int, q: Int): Int =
    ((d + q * 7 + g + c) % 16).toInt
  /** Sign of the value at position `k` of quadruple `q`
    * (1 = negative); only emitted when that position is nonzero. */
  def signOf(d: Long, q: Int, k: Int): Int = ((d + q + k) % 2).toInt
  def count1BitsOf(d: Long, g: Int, c: Int): Int =
    (0 until nqOf(d, g, c)).map(q =>
      4 + Integer.bitCount(patOf(d, g, c, q))).sum
  def p23Count1Of(d: Long, g: Int, c: Int): Int =
    part2BitsOf(d, g, c) + count1BitsOf(d, g, c)

  /** Shared frame assembly: side info from the per-doc formulas with
    * the given `mdb` / big_values / count1table_select / p23
    * overrides, then per (g, c) the transmitted scalefactors and the
    * caller's part3 region. */
  private def buildStream(d: Long, mdb: Int,
      bigvF: (Int, Int) => Int, c1tF: (Int, Int) => Int,
      p23F: (Int, Int) => Int,
      part3F: (BitWriter, Int, Int) => Unit,
      wsfF: Int => Int = null,
      tselF: (Int, Int, Int) => Int = null,
      r0F: Int => Int = null, r1F: Int => Int = null): Array[Byte] = {
    val wsfOfG: Int => Int = if (wsfF != null) wsfF else wsfOf(d, _)
    val tselOfGC: (Int, Int, Int) => Int =
      if (tselF != null) tselF else tselOf(d, _, _, _)
    val r0OfC: Int => Int = if (r0F != null) r0F else r0Of(d, _)
    val r1OfC: Int => Int = if (r1F != null) r1F else r1Of(d, _)
    val nch = nchOf(d)
    val rate = rateOf(d)
    val kbps = Mp3Headers.BitrateKbps(brIdxOf(d))
    val len = 144000 * kbps / rate + padOf(d)

    val w = new BitWriter
    // side info
    w.write(mdb.toLong, 9)
    w.write(0L, if (nch == 1) 5 else 3) // private bits
    for (c <- 0 until nch) w.write(scfsiOf(d, c).toLong, 4)
    for (g <- 0 to 1; c <- 0 until nch) {
      w.write(p23F(g, c).toLong, 12)
      w.write(bigvF(g, c).toLong, 9)
      w.write(gainOf(d, g, c).toLong, 8)
      w.write(sfcOf(d, g, c).toLong, 4)
      val wsf = wsfOfG(g)
      w.write(wsf.toLong, 1)
      if (wsf == 1) {
        w.write(btOf(d).toLong, 2)
        w.write(mixedOf(d).toLong, 1)
        for (t <- 0 to 1) w.write(tselOfGC(g, c, t).toLong, 5)
        for (sw <- 0 to 2) w.write(sbgOf(d, c, sw).toLong, 3)
      } else {
        for (t <- 0 to 2) w.write(tselOfGC(g, c, t).toLong, 5)
        w.write(r0OfC(c).toLong, 4)
        w.write(r1OfC(c).toLong, 3)
      }
      w.write(preOf(d, g, c).toLong, 1)
      w.write(sfsOf(d, g, c).toLong, 1)
      w.write(c1tF(g, c).toLong, 1)
    }
    require(w.bitCount == (if (nch == 1) 17 else 32) * 8,
      s"side info bit count ${w.bitCount} for doc $d")
    // main data: transmitted scalefactors + part3 per (g, c)
    for (g <- 0 to 1; c <- 0 until nch) {
      var j = 0
      sfLayout(d, g, c, wsfOfG).foreach { case (slen, transmitted) =>
        if (transmitted) w.write(sfValOf(d, g, c, j, slen).toLong, slen)
        j += 1
      }
      part3F(w, g, c)
    }
    val body = w.bytes
    require(4 + body.length <= len,
      s"fixture frame overflow for doc $d: ${4 + body.length} > $len")

    val frame = new Array[Byte](len)
    frame(0) = 0xff.toByte
    frame(1) = 0xfb.toByte // MPEG-1 Layer III, no CRC
    frame(2) = (brIdxOf(d) << 4 | srIdxOf(d) << 2 | padOf(d) << 1).toByte
    frame(3) = (modeOf(d) << 6 | 4).toByte // original flag set
    System.arraycopy(body, 0, frame, 4, body.length)

    if (!hasId3(d)) frame
    else {
      val pad = id3PadOf(d)
      val out = new Array[Byte](10 + pad + len)
      out(0) = 'I'; out(1) = 'D'; out(2) = '3'; out(3) = 4
      out(9) = pad.toByte // syncsafe: pad < 128 fits the last byte
      System.arraycopy(frame, 0, out, 10 + pad, len)
      out
    }
  }

  /** The `mm_mp3_sideinfo` fixture stream: per-doc side info,
    * scalefactors, zero-bit part3 filler. */
  def stream(docId: Long): Array[Byte] =
    buildStream(docId, mdbOf(docId), bigvOf(docId, _, _),
      c1tOf(docId, _, _), p23Of(docId, _, _),
      (w, g, c) => w.write(0L, fillerOf(docId, g, c)))

  /** The `mm_mp3_count1` fixture stream: `big_values` = 0 so the
    * count1 region starts right after the scalefactors,
    * `count1table_select` = 1 (the fixed 4-bit complement table),
    * `main_data_begin` = 0, and the part3 region carries REAL
    * table-1 quadruple codewords (bitwise complement of the
    * pattern) each followed by its nonzero positions' sign bits. */
  def streamCount1(docId: Long): Array[Byte] =
    buildStream(docId, 0, (_, _) => 0, (_, _) => 1,
      p23Count1Of(docId, _, _), { (w, g, c) =>
        for (q <- 0 until nqOf(docId, g, c)) {
          val pat = patOf(docId, g, c, q)
          w.write((~pat & 15).toLong, 4)
          for (k <- 0 to 3)
            if (((pat >> (3 - k)) & 1) == 1)
              w.write(signOf(docId, q, k).toLong, 1)
        }
      })

  /** Count1 TABLE-A bit count: hlen(pattern) + one sign per set
    * position (same quadruple/sign formulas as the table-1 lane, so
    * the oracle census is IDENTICAL — only the bit widths move). */
  def count1ABitsOf(d: Long, g: Int, c: Int): Int =
    (0 until nqOf(d, g, c)).map { q =>
      val pat = patOf(d, g, c, q)
      val e = (0 until 16)
        .find(e => Mp3Headers.Count1TableA.xs(e) == pat).get
      Mp3Headers.Count1TableA.len(e) + Integer.bitCount(pat)
    }.sum
  def p23Count1AOf(d: Long, g: Int, c: Int): Int =
    part2BitsOf(d, g, c) + count1ABitsOf(d, g, c)

  /** The `mm_mp3_count1a` fixture stream: the table-1 lane with
    * `count1table_select` = 0 — the part3 region carries TABLE-A
    * codewords (1–6 bits) for the SAME quadruple/sign sequence, so
    * a decoder that walks the tree wrongly desynchronizes
    * part2_3_length exactly as a complement-table slip would. */
  def streamCount1A(docId: Long): Array[Byte] =
    buildStream(docId, 0, (_, _) => 0, (_, _) => 0,
      p23Count1AOf(docId, _, _), { (w, g, c) =>
        for (q <- 0 until nqOf(docId, g, c)) {
          val pat = patOf(docId, g, c, q)
          val e = (0 until 16)
            .find(e => Mp3Headers.Count1TableA.xs(e) == pat).get
          w.write(Mp3Headers.Count1TableA.code(e).toLong,
            Mp3Headers.Count1TableA.len(e))
          for (k <- 0 to 3)
            if (((pat >> (3 - k)) & 1) == 1)
              w.write(signOf(docId, q, k).toLong, 1)
        }
      })

  // ---- big-values-region parameters (the mm_mp3_bigvalues fixture) --

  /** B.8's COMMON PREFIX (bands 0–8, identical for 44.1/48/32 kHz) —
    * the only boundaries the fixture's region counts can reach, so
    * the oracle replays them from one constant regardless of the
    * doc's sample rate. */
  val BandsCommon: Array[Int] = Array(0, 4, 8, 12, 16, 20, 24, 30, 36)

  /** Pairs per granule × channel (≤ 47; ≤ 94 spectral lines). */
  def npOf(d: Long, g: Int, c: Int): Int =
    ((d * 3 + g * 7 + c * 11) % 48).toInt
  /** region0_count ∈ 0..3, region1_count ∈ 0..2: boundaries stay in
    * [[BandsCommon]] (r0 + r1 + 2 ≤ 7). */
  def bvR0Of(d: Long): Int = (d % 4).toInt
  def bvR1Of(d: Long): Int = ((d + 1) % 3).toInt
  /** Region boundaries in PAIRS. */
  def bvB0Of(d: Long, g: Int, c: Int): Int =
    math.min(BandsCommon(bvR0Of(d) + 1) / 2, npOf(d, g, c))
  def bvB1Of(d: Long, g: Int, c: Int): Int =
    math.min(BandsCommon(bvR0Of(d) + bvR1Of(d) + 2) / 2, npOf(d, g, c))
  /** table_select per region ∈ {0,1,2,3,5} — 0 is the zero-bit
    * all-zero table, 1–3 and 5 the transcribed B.7 trees (4 is the
    * spec's unused slot). */
  def bvTselOf(d: Long, g: Int, c: Int, t: Int): Int =
    Array(0, 1, 2, 3, 5)(((d + g * 2 + c * 3 + t * 5) % 5).toInt)
  /** The table coding pair `i` of granule/channel. */
  def bvTblOf(d: Long, g: Int, c: Int, i: Int): Int =
    if (i < bvB0Of(d, g, c)) bvTselOf(d, g, c, 0)
    else if (i < bvB1Of(d, g, c)) bvTselOf(d, g, c, 1)
    else bvTselOf(d, g, c, 2)
  /** Pair values, bounded by the coding table's dimension. */
  private def bvDimOf(t: Int): Int =
    if (t == 1) 2 else if (t == 5) 4 else 3
  def bvXOf(d: Long, g: Int, c: Int, i: Int): Int = {
    val t = bvTblOf(d, g, c, i)
    if (t == 0) 0 else ((d + i * 3 + g + c) % bvDimOf(t)).toInt
  }
  def bvYOf(d: Long, g: Int, c: Int, i: Int): Int = {
    val t = bvTblOf(d, g, c, i)
    if (t == 0) 0
    else ((d / 2 + i * 5 + g * 2 + c) % bvDimOf(t)).toInt
  }
  /** Sign (1 = negative) of x / y at pair `i` — emitted only when
    * that value is nonzero. */
  def bvSxOf(d: Long, g: Int, c: Int, i: Int): Int = ((d + i + g) % 2).toInt
  def bvSyOf(d: Long, g: Int, c: Int, i: Int): Int = ((d + i + c) % 2).toInt

  private def bvCodeLen(t: Int, x: Int, y: Int): (Int, Int) = {
    val tab = Mp3Headers.BvTables(t)
    val e = (0 until tab.code.length)
      .find(e => tab.xs(e) == x && tab.ys(e) == y).get
    (tab.code(e), tab.len(e))
  }

  /** Huffman + sign bit count of granule/channel's region. */
  def bvBitsOf(d: Long, g: Int, c: Int): Int =
    (0 until npOf(d, g, c)).map { i =>
      val t = bvTblOf(d, g, c, i)
      if (t == 0) 0
      else {
        val x = bvXOf(d, g, c, i); val y = bvYOf(d, g, c, i)
        bvCodeLen(t, x, y)._2 +
          (if (x != 0) 1 else 0) + (if (y != 0) 1 else 0)
      }
    }.sum

  def p23BigvaluesOf(d: Long, g: Int, c: Int): Int =
    part2BitsLongOf(d, g, c) + bvBitsOf(d, g, c)

  /** The `mm_mp3_bigvalues` fixture stream: all-long-block granules
    * (window switching forced off), `main_data_begin` = 0,
    * region counts inside [[BandsCommon]], per-region table selects
    * from the verified B.7 subset, and a part3 carrying REAL
    * big-values (x, y) codewords + sign bits that exhaust
    * part2_3_length exactly (empty count1 region). The decoder
    * ([[Mp3Headers.bigvaluesInfo]]) must recover the census through
    * the actual packed bits. */
  def streamBigvalues(docId: Long): Array[Byte] =
    buildStream(docId, 0, npOf(docId, _, _), (_, _) => 1,
      p23BigvaluesOf(docId, _, _), { (w, g, c) =>
        for (i <- 0 until npOf(docId, g, c)) {
          val t = bvTblOf(docId, g, c, i)
          if (t != 0) {
            val x = bvXOf(docId, g, c, i)
            val y = bvYOf(docId, g, c, i)
            val (code, len) = bvCodeLen(t, x, y)
            w.write(code.toLong, len)
            if (x != 0) w.write(bvSxOf(docId, g, c, i).toLong, 1)
            if (y != 0) w.write(bvSyOf(docId, g, c, i).toLong, 1)
          }
        }
      },
      wsfF = _ => 0,
      tselF = bvTselOf(docId, _, _, _),
      r0F = _ => bvR0Of(docId), r1F = _ => bvR1Of(docId))

  // ---- combined part3 parameters (the mm_mp3_part3 fixture):
  // a big-values region FOLLOWED by a count1 region in one
  // part2_3_length — the real Layer-III region sequence. The pair
  // formulas are the bigvalues lane's verbatim (the per-pair table
  // and values don't depend on the pair-count cap, because i < np3
  // pins the same boundary comparisons); the quadruple formulas are
  // the count1 lane's.

  /** Pairs (≤ 23) and quadruples (≤ 11): 46 + 44 lines ≤ 576. */
  def np3Of(d: Long, g: Int, c: Int): Int = npOf(d, g, c) % 24
  def nq3Of(d: Long, g: Int, c: Int): Int = ((d + g * 3 + c * 5) % 12).toInt

  private def c1QuadBits(d: Long, g: Int, c: Int, q: Int): Int = {
    val pat = patOf(d, g, c, q)
    val hlen =
      if (c1tOf(d, g, c) == 1) 4
      else {
        val e = (0 until 16)
          .find(e => Mp3Headers.Count1TableA.xs(e) == pat).get
        Mp3Headers.Count1TableA.len(e)
      }
    hlen + Integer.bitCount(pat)
  }

  def p23Part3Of(d: Long, g: Int, c: Int): Int =
    part2BitsLongOf(d, g, c) +
      (0 until np3Of(d, g, c)).map { i =>
        val t = bvTblOf(d, g, c, i)
        if (t == 0) 0
        else {
          val x = bvXOf(d, g, c, i); val y = bvYOf(d, g, c, i)
          bvCodeLen(t, x, y)._2 +
            (if (x != 0) 1 else 0) + (if (y != 0) 1 else 0)
        }
      }.sum +
      (0 until nq3Of(d, g, c)).map(c1QuadBits(d, g, c, _)).sum

  /** The `mm_mp3_part3` fixture stream: all-long-block granules
    * whose part3 carries BOTH regions — big-values pairs through
    * the verified B.7 subset, then count1 quadruples through the
    * per-(g,c) selected count1 table (A on half the channels) —
    * exhausting part2_3_length exactly. */
  def streamPart3(docId: Long): Array[Byte] =
    buildStream(docId, 0, np3Of(docId, _, _), c1tOf(docId, _, _),
      p23Part3Of(docId, _, _), { (w, g, c) =>
        for (i <- 0 until np3Of(docId, g, c)) {
          val t = bvTblOf(docId, g, c, i)
          if (t != 0) {
            val x = bvXOf(docId, g, c, i)
            val y = bvYOf(docId, g, c, i)
            val (code, len) = bvCodeLen(t, x, y)
            w.write(code.toLong, len)
            if (x != 0) w.write(bvSxOf(docId, g, c, i).toLong, 1)
            if (y != 0) w.write(bvSyOf(docId, g, c, i).toLong, 1)
          }
        }
        for (q <- 0 until nq3Of(docId, g, c)) {
          val pat = patOf(docId, g, c, q)
          if (c1tOf(docId, g, c) == 1) w.write((~pat & 15).toLong, 4)
          else {
            val e = (0 until 16)
              .find(e => Mp3Headers.Count1TableA.xs(e) == pat).get
            w.write(Mp3Headers.Count1TableA.code(e).toLong,
              Mp3Headers.Count1TableA.len(e))
          }
          for (k <- 0 to 3)
            if (((pat >> (3 - k)) & 1) == 1)
              w.write(signOf(docId, q, k).toLong, 1)
        }
      },
      wsfF = _ => 0,
      tselF = bvTselOf(docId, _, _, _),
      r0F = _ => bvR0Of(docId), r1F = _ => bvR1Of(docId))
}
