package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Vorbis codebook entropy decode ([[Vorbis]]) pinned THREE
  * independent ways: the §3.2.1 canonical codeword assignment
  * against the spec's own worked example (the 8-entry sample
  * codebook), the LSB-first bitpacking + header walk against
  * HAND-ASSEMBLED bytes, and the tree walk against hand-packed
  * codeword streams — so the fixture encoder and the decoder can't
  * be inverse bugs of each other. Plus the encoder/decoder/
  * closed-form triangle over all three header paths, Ogg page CRC
  * self-consistency, and the fail-closed boundary (bad sync,
  * over-subscribed and incomplete trees, single-entry books,
  * non-scalar lookup types, truncation, continued packets). */
class VorbisSpec extends AnyFunSuite {

  test("§3.2.1 worked example: lengths [2,4,4,4,4,2,3,3] assign the " +
    "spec's codewords") {
    val Some((codes, complete)) =
      Vorbis.assignCodewords(Array(2, 4, 4, 4, 4, 2, 3, 3))
    assert(complete)
    assert(codes.toSeq == Seq(
      Integer.parseInt("00", 2).toLong,
      Integer.parseInt("0100", 2).toLong,
      Integer.parseInt("0101", 2).toLong,
      Integer.parseInt("0110", 2).toLong,
      Integer.parseInt("0111", 2).toLong,
      Integer.parseInt("10", 2).toLong,
      Integer.parseInt("110", 2).toLong,
      Integer.parseInt("111", 2).toLong))
  }

  test("assignment: over-subscribed lengths fail; incomplete trees " +
    "report complete = false; unused entries get -1") {
    assert(Vorbis.assignCodewords(Array(1, 1, 1)).isEmpty)
    val Some((c1, complete1)) = Vorbis.assignCodewords(Array(2, 2, 2))
    assert(!complete1 && c1.toSeq == Seq(0L, 1L, 2L))
    val Some((c2, complete2)) = Vorbis.assignCodewords(Array(1, 0, 1))
    assert(complete2 && c2.toSeq == Seq(0L, -1L, 1L))
  }

  // Hand-assembled codebook header: sync, dims=2, entries=4,
  // unordered dense, lengths [2,2,2,2], lookup 0. Bytes computed BY
  // HAND from the LSB-first packing convention (§2).
  private val handBook: Array[Byte] = Array(
    0x42, 0x43, 0x56, 0x02, 0x00, 0x04, 0x00, 0x00,
    0x84, 0x10, 0x02, 0x00).map(_.toByte)

  test("hand-assembled header bytes parse: LSB-first sync/dims/" +
    "entries, 5-bit lengths, canonical codes 00/01/10/11") {
    val r = new Vorbis.BitReaderLsb(handBook, 0, handBook.length)
    val Some(book) = Vorbis.readBook(r)
    assert(book.dims == 2 && book.entries == 4 && book.used == 4 &&
      book.maxLen == 2)
    // decode map: (len << 32) | code → entry
    for (e <- 0 until 4)
      assert(book.decode.get((2L << 32) | e) == e)
  }

  test("hand-packed symbol stream decodes root-first through the " +
    "canonical tree") {
    val r0 = new Vorbis.BitReaderLsb(handBook, 0, handBook.length)
    val Some(book) = Vorbis.readBook(r0)
    // bits: audio flag 0, u16 n=3, codewords 10 / 00 / 11 → bytes
    // 06 00 62 (hand-packed LSB-first)
    val sym = Array(0x06, 0x00, 0x62).map(_.toByte)
    val r = new Vorbis.BitReaderLsb(sym, 0, sym.length)
    assert(r.read(1).contains(0L))
    assert(r.read(16).contains(3L))
    assert(Vorbis.decodeOne(r, book).contains(2))
    assert(Vorbis.decodeOne(r, book).contains(0))
    assert(Vorbis.decodeOne(r, book).contains(3))
  }

  test("fail-closed: bad sync, non-scalar lookup, incomplete tree, " +
    "single-entry book, truncation") {
    def parse(b: Array[Byte]) =
      Vorbis.readBook(new Vorbis.BitReaderLsb(b, 0, b.length))
    val badSync = handBook.clone(); badSync(0) = 0x41
    assert(parse(badSync).isEmpty)
    assert(parse(handBook.dropRight(2)).isEmpty) // truncated lookup
    // lookup nibble lives at bit offset 86 = byte 10 bits 6..7 +
    // byte 11 bits 0..1; set its low bit (stream bit 22 → byte 10
    // bit 6) → lookup type 1
    val vq = handBook.clone(); vq(10) = (vq(10) | 0x40).toByte
    assert(parse(vq).isEmpty)
    // unordered dense, entries=3, lengths [2,2,2]: incomplete
    val w = new Vorbis.BitWriterLsb
    w.write(0x564342L, 24); w.write(1, 16); w.write(3, 24)
    w.write(0, 1); w.write(0, 1)
    for (_ <- 0 until 3) w.write(1, 5)
    w.write(0, 4)
    assert(parse(w.bytes).isEmpty)
    // single-entry book (entries=1): degenerate, rejected
    val w1 = new Vorbis.BitWriterLsb
    w1.write(0x564342L, 24); w1.write(1, 16); w1.write(1, 24)
    w1.write(0, 1); w1.write(0, 1); w1.write(0, 5); w1.write(0, 4)
    assert(parse(w1.bytes).isEmpty)
  }

  test("ordered-path round trip: non-decreasing runs survive the " +
    "run-length header walk") {
    // kind(docId, j) == 2 needs (docId + j) % 3 == 2; doc 2, book 0
    val doc = 2L
    assert(Vorbis.kindOf(doc, 0) == 2)
    val out = Vorbis.parseBooks(Vorbis.stream(doc))
    assert(out.isDefined)
  }

  test("encoder/decoder/closed-form triangle over docs 0..120 " +
    "(all header-path kinds, book counts, symbol cycles)") {
    for (doc <- 0L to 120L) {
      val Some((nb, ent, us, dm, ns, ss, sw)) =
        Vorbis.parseBooks(Vorbis.stream(doc))
      assert(nb == Vorbis.nBooksOf(doc), s"doc $doc books")
      val js = 0 until nb
      assert(ent == js.map(j => Vorbis.entriesOf(doc, j).toLong).sum)
      assert(us == js.map(j => Vorbis.usedOf(doc, j).toLong).sum)
      assert(dm == js.map(j => Vorbis.dimsOf(doc, j).toLong).sum)
      val n = Vorbis.nSymsOf(doc)
      assert(ns == n.toLong)
      val syms = (0 until n).map(k => Vorbis.symOf(doc, k).toLong)
      assert(ss == syms.sum, s"doc $doc sym_sum")
      assert(sw == syms.zipWithIndex.map { case (e, k) => (k + 1) * e }.sum,
        s"doc $doc sym_wsum")
    }
  }

  test("§3.2.2 lookup1_values: greatest v with v^dims <= entries") {
    assert(Vorbis.lookup1Values(16, 2) == 4)
    assert(Vorbis.lookup1Values(15, 2) == 3)
    assert(Vorbis.lookup1Values(8, 3) == 2)
    assert(Vorbis.lookup1Values(7, 3) == 1)
    assert(Vorbis.lookup1Values(5, 1) == 5)
  }

  test("VQ triangle over docs 0..120: lookup types, lookup1_values " +
    "counts, multiplicand sums, sequence flags all round-trip") {
    for (doc <- 0L to 120L) {
      val Some((nb, l1, l2, mc, ms, sq, ss)) =
        Vorbis.parseVq(Vorbis.streamVq(doc))
      assert(nb == Vorbis.nBooksOf(doc))
      val js = 0 until nb
      assert(l1 == js.count(j => Vorbis.lookupTypeOf(doc, j) == 1))
      assert(l2 == js.count(j => Vorbis.lookupTypeOf(doc, j) == 2))
      val expMc = js.map(j => Vorbis.mulCountOf(doc, j)).sum
      assert(mc == expMc, s"doc $doc mul_count")
      val expMs = js.map(j => (0L until Vorbis.mulCountOf(doc, j))
        .map(k => Vorbis.mulOf(doc, j, k)).sum).sum
      assert(ms == expMs, s"doc $doc mul_sum")
      assert(sq == js.count(j => Vorbis.lookupTypeOf(doc, j) != 0 &&
        Vorbis.seqPOf(doc, j) == 1))
      val n = Vorbis.nSymsOf(doc)
      assert(ss == (0 until n).map(k => Vorbis.symOf(doc, k).toLong).sum)
    }
  }

  test("fail-closed: reserved lookup type 3") {
    val w = new Vorbis.BitWriterLsb
    w.write(0x564342L, 24); w.write(1, 16); w.write(2, 24)
    w.write(0, 1); w.write(0, 1) // unordered dense
    w.write(0, 5); w.write(0, 5) // lengths [1, 1]
    w.write(3, 4) // reserved lookup type
    assert(Vorbis.readBook(
      new Vorbis.BitReaderLsb(w.bytes, 0, w.bytes.length)).isEmpty)
  }

  test("§7.2.4 render_point: integer line predictor, truncating " +
    "division, negative slope") {
    assert(Vorbis.renderPoint(0, 10, 64, 74, 32) == 42)
    assert(Vorbis.renderPoint(0, 100, 64, 36, 32) == 68)
    assert(Vorbis.renderPoint(0, 1, 4, 2, 3) == 1) // off truncates
    assert(Vorbis.renderPoint(0, 2, 4, 1, 3) == 2) // -slope truncates
  }

  test("floor1 triangle over docs 0..150: generic neighbor search " +
    "equals the static unroll (prediction, parity residuals, " +
    "room saturation, step2 flags)") {
    for (doc <- 0L to 150L) {
      val Some((nv, ys, yw, ns)) =
        Vorbis.parseFloor(Vorbis.streamFloor(doc))
      assert(nv == 5)
      val u = 4 + (doc % 13)
      val y0 = ((doc * 7) % 128).toInt
      val y1 = ((doc * 11) % 128).toInt
      val o = (doc % 20).toInt
      val xs = Array(0, 64, 1 + o, 22 + o, 43 + o)
      val vs = Array(0, 0, ((doc * 3) % u).toInt,
        ((doc * 3 + 7) % u).toInt, ((doc * 3 + 14) % u).toInt)
      // static unroll: post i predicts from (x_{i-1}, fy_{i-1}) and
      // (64, y1) for i >= 3; post 2 from (0, y0) and (64, y1)
      def merge(p: Int, v: Int): Int =
        if (v == 0) p
        else if (v >= 2 * math.min(128 - p, p)) {
          if (128 - p > p) v - p + p else p - v + (128 - p) - 1
        } else if ((v & 1) == 1) p - ((v + 1) / 2)
        else p + v / 2
      val fy2 = merge(Vorbis.renderPoint(0, y0, 64, y1, xs(2)), vs(2))
      val fy3 = merge(Vorbis.renderPoint(xs(2), fy2, 64, y1, xs(3)), vs(3))
      val fy4 = merge(Vorbis.renderPoint(xs(3), fy3, 64, y1, xs(4)), vs(4))
      assert(ys == y0.toLong + y1 + fy2 + fy3 + fy4, s"doc $doc")
      assert(yw == y0.toLong + 2 * y1 + 3 * fy2 + 4 * fy3 + 5 * fy4)
      val f2 = vs(2) != 0 || vs(3) != 0
      val f3 = vs(3) != 0 || vs(4) != 0
      val f4 = vs(4) != 0
      assert(ns == 2L + (if (f2) 1 else 0) + (if (f3) 1 else 0) +
        (if (f4) 1 else 0), s"doc $doc step2")
    }
  }

  test("floor1 fail-closed: duplicate X positions reject; an " +
    "unused (nonzero = 0) floor yields an empty post vector") {
    val w = new Vorbis.BitWriterLsb
    w.write(1, 5); w.write(0, 4) // one partition, class 0
    w.write(1, 3); w.write(0, 2); w.write(1, 8) // 2 dims, book 0
    w.write(1, 2); w.write(6, 4) // multiplier 2, rangebits 6
    w.write(17, 6); w.write(17, 6) // DUPLICATE X
    assert(Vorbis.readFloor1(
      new Vorbis.BitReaderLsb(w.bytes, 0, w.bytes.length)).isEmpty)
    // unused floor: nonzero bit 0
    val cfg = Vorbis.Floor1(Array(0), Array(2), Array(0), Array(-1),
      Array(Array(0)), 2, Array(0, 64, 17, 30))
    val pk = Array[Byte](0)
    val Some((fy, st)) = Vorbis.decodeFloor1(
      new Vorbis.BitReaderLsb(pk, 0, 1), cfg, Array.empty)
    assert(fy.isEmpty && st.isEmpty)
  }

  test("residue classification triangle over docs 0..150: config " +
    "walk, classword decode, divmod unpack order, ragged tails") {
    for (doc <- 0L to 150L) {
      val Some((np, ng, s, ws)) =
        Vorbis.parseResidue(Vorbis.streamResidue(doc))
      val n = Vorbis.resPartsOf(doc)
      val d = Vorbis.dimsOf(doc, 0)
      assert(np == n && ng == (n + d - 1) / d, s"doc $doc")
      val cls = (0 until n).map(j => Vorbis.resClassOf(doc, j).toLong)
      assert(s == cls.sum, s"doc $doc class_sum")
      assert(ws == cls.zipWithIndex.map { case (c, j) => (j + 1) * c }.sum,
        s"doc $doc class_wsum")
    }
  }

  test("residue hand-check: dims 2, 3 classifications, classwords " +
    "3 and 1 unpack last-slot-first to [1,0,0,1]") {
    // 4 partitions (end 16, psize 4), 2 classwords of 2 slots each
    val cfg = Vorbis.ResidueCfg(0, 16, 4, 3, 0, Array(0, 0, 0),
      Array.fill(3)(Array.fill(8)(-1)))
    val r0 = new Vorbis.BitReaderLsb(handBook, 0, handBook.length)
    val Some(book) = Vorbis.readBook(r0)
    // handBook: 4 entries, len-2 codes 00/01/10/11
    val w = new Vorbis.BitWriterLsb
    w.writeCode(3, 2); w.writeCode(1, 2)
    val Some(cls) = Vorbis.decodeResidueClasses(
      new Vorbis.BitReaderLsb(w.bytes, 0, w.bytes.length), cfg,
      Array(book))
    // entry 3: slot1 = 3 % 3 = 0, slot0 = 1; entry 1: slot1 = 1,
    // slot0 = 0 → classes [1, 0, 0, 1]
    assert(cls.toSeq == Seq(1, 0, 0, 1))
  }

  test("residue VALUE-pass hand-check: interleaved classword/value " +
    "order, lookup-2 multiplicand indexing, positional slot " +
    "placement, silent class consumes no bits") {
    // value book: dims 2, 4 entries, all len-2 codes, lookup 2,
    // value_bits 3, seq 0, muls [1,2,3,4,5,6,7,0]
    val wv = new Vorbis.BitWriterLsb
    wv.write(0x564342L, 24)
    wv.write(2, 16); wv.write(4, 24)
    wv.write(0, 1); wv.write(0, 1)
    for (_ <- 0 until 4) wv.write(1, 5) // len-1 = 1 → length 2
    wv.write(2, 4) // lookup type 2
    wv.write(0x43000000L, 32); wv.write(0x42000000L, 32)
    wv.write(2, 4) // value_bits − 1 = 2 → 3
    wv.write(0, 1) // sequence_p 0
    Seq(1, 2, 3, 4, 5, 6, 7, 0).foreach(m => wv.write(m.toLong, 3))
    val vbBytes = wv.bytes
    val Some(cbook) = Vorbis.readBook(
      new Vorbis.BitReaderLsb(handBook, 0, handBook.length))
    val Some(vbook) = Vorbis.readBook(
      new Vorbis.BitReaderLsb(vbBytes, 0, vbBytes.length))
    assert(vbook.muls.toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 0L))
    val pb = Array.fill(2)(Array.fill(8)(-1))
    pb(0)(0) = 1 // class 0, pass 0 → value book 1
    val cfg = Vorbis.ResidueCfg(0, 8, 4, 2, 0, Array(1, 0), pb)
    // packet: classword entry 1 (classes [0,1] by divmod), then
    // partition 0's two vectors (entries 3 then 0); partition 1 is
    // class 1 → silent
    val w = new Vorbis.BitWriterLsb
    w.writeCode(1, 2); w.writeCode(3, 2); w.writeCode(0, 2)
    val Some((out, nVecs)) = Vorbis.decodeResidueApply(
      new Vorbis.BitReaderLsb(w.bytes, 0, w.bytes.length), cfg,
      Array(cbook, vbook))
    // entry 3 → muls offsets 6,7 → 7,0; entry 0 → offsets 0,1 → 1,2
    assert(out.toSeq == Seq(7L, 0L, 1L, 2L, 0L, 0L, 0L, 0L))
    assert(nVecs == 2L)
    // a sequence_p book in the value pass fails closed
    val wseq = new Vorbis.BitWriterLsb
    wseq.write(0x564342L, 24)
    wseq.write(2, 16); wseq.write(4, 24)
    wseq.write(0, 1); wseq.write(0, 1)
    for (_ <- 0 until 4) wseq.write(1, 5)
    wseq.write(2, 4)
    wseq.write(0x43000000L, 32); wseq.write(0x42000000L, 32)
    wseq.write(2, 4)
    wseq.write(1, 1) // sequence_p 1: float-domain running sum
    Seq(1, 2, 3, 4, 5, 6, 7, 0).foreach(m => wseq.write(m.toLong, 3))
    val Some(sbook) = Vorbis.readBook(
      new Vorbis.BitReaderLsb(wseq.bytes, 0, wseq.bytes.length))
    assert(Vorbis.decodeResidueApply(
      new Vorbis.BitReaderLsb(w.bytes, 0, w.bytes.length), cfg,
      Array(cbook, sbook)).isEmpty)
  }

  test("float32_unpack integer-exact gate: exponent 788 = 2^0 " +
    "values round-trip, sign bit honored, mantissa 0 is exact zero " +
    "at any exponent, fractional/huge values fail closed") {
    assert(Vorbis.float32UnpackExact(Vorbis.packFloat32(0L)) ==
      Some(0L))
    assert(Vorbis.float32UnpackExact(Vorbis.packFloat32(17L)) ==
      Some(17L))
    assert(Vorbis.float32UnpackExact(Vorbis.packFloat32(-20L)) ==
      Some(-20L))
    // exponent 789 doubles the mantissa
    assert(Vorbis.float32UnpackExact((789L << 21) | 5L) == Some(10L))
    // mantissa 0 is 0.0 regardless of exponent
    assert(Vorbis.float32UnpackExact(536L << 21) == Some(0L))
    // fractional: exponent below the 2^0 bias with nonzero mantissa
    assert(Vorbis.float32UnpackExact((787L << 21) | 3L).isEmpty)
    assert(Vorbis.float32UnpackExact(0x43000000L + 5L).isEmpty)
    // overflow guard: exponent past the declared +20 window
    assert(Vorbis.float32UnpackExact((809L << 21) | 1L).isEmpty)
  }

  test("residue SCALE triangle over docs 0..150: " +
    "minimum + delta·multiplicand applied per element, absolute-" +
    "offset positional wsum; the apply lane's FRACTIONAL books " +
    "fail the integer gate") {
    for (doc <- 0L to 150L) {
      val Some((ns, nv, s, ws, nz)) =
        Vorbis.parseResidueScale(Vorbis.streamResidueScale(doc))
      val n = Vorbis.resPartsOf(doc)
      val psize = Vorbis.rzaPsizeOf(doc)
      assert(ns == n.toLong * psize, s"doc $doc n_slots")
      val slots = Array.fill(n * psize)(0L)
      var vecs = 0L
      for (p <- 0 until n) {
        val cls = Vorbis.rzaClassOf(doc, p)
        if (Vorbis.rzaCascadeOf(doc, cls) == 1) {
          val dv = Vorbis.rzaDimsOf(doc, cls)
          val lt = Vorbis.rzaLookupOf(doc, cls)
          val used = Vorbis.rzaUsedOf(doc, cls)
          val l1v = Vorbis.lookup1Values(used, dv)
          val mi = Vorbis.rzsMinOf(doc, cls)
          val de = Vorbis.rzsDeltaOf(doc, cls)
          for (k <- 0 until psize / dv) {
            vecs += 1
            val e = Vorbis.rzaEntryOf(doc, p, k)
            var divisor = 1L
            for (i <- 0 until dv) {
              val off =
                if (lt == 1) ((e / divisor) % l1v).toInt
                else e * dv + i
              slots(p * psize + k * dv + i) +=
                mi + de * Vorbis.rzaMulOf(doc, cls, off)
              divisor *= l1v
            }
          }
        }
      }
      assert(nv == vecs, s"doc $doc n_values")
      assert(s == slots.sum, s"doc $doc sc_sum")
      assert(ws == slots.zipWithIndex.map { case (v, i) =>
        (8L + i + 1L) * v }.sum, s"doc $doc sc_wsum (absolute offset)")
      assert(nz == slots.count(_ != 0L), s"doc $doc n_nonzero")
    }
    // the apply fixture's books carry fractional packed floats
    // (exponent 536): the scale decode must refuse them while the
    // raw-multiplicand apply decode accepts the same stream
    val applyStream = Vorbis.streamResidueApply(9L)
    assert(Vorbis.parseResidueApply(applyStream).isDefined)
    assert(Vorbis.parseResidueScale(applyStream).isEmpty,
      "fractional min/delta books must fail the integer gate")
  }

  test("residue decoders fail closed on hostile configs BEFORE " +
    "allocating: end < begin, psize non-divisor, oversized range") {
    val Some(book) = Vorbis.readBook(
      new Vorbis.BitReaderLsb(handBook, 0, handBook.length))
    val pb = Array.fill(2)(Array.fill(8)(-1))
    def rd() = new Vorbis.BitReaderLsb(handBook, 0, handBook.length)
    // end < begin: a naive (end-begin)/psize is negative →
    // NegativeArraySizeException without the guard
    val neg = Vorbis.ResidueCfg(16, 8, 4, 2, 0, Array(0, 0), pb)
    assert(Vorbis.decodeResidueClasses(rd(), neg, Array(book)).isEmpty)
    assert(Vorbis.decodeResidueApply(rd(), neg, Array(book)).isEmpty)
    // psize does not divide the span (outside the verified class)
    val ndiv = Vorbis.ResidueCfg(0, 10, 4, 2, 0, Array(0, 0), pb)
    assert(Vorbis.decodeResidueClasses(rd(), ndiv, Array(book)).isEmpty)
    assert(Vorbis.decodeResidueApply(rd(), ndiv, Array(book)).isEmpty)
    // a ~100-byte config demanding a multi-MB slot array: capped
    val huge = Vorbis.ResidueCfg(0, (1 << 23), 4, 2, 0, Array(0, 0), pb)
    assert(Vorbis.decodeResidueClasses(rd(), huge, Array(book)).isEmpty)
    assert(Vorbis.decodeResidueApply(rd(), huge, Array(book)).isEmpty)
    // psize 0 (a raw 24-bit field could not produce it, but the
    // decoders must not divide by it)
    val pz0 = Vorbis.ResidueCfg(0, 8, 0, 2, 0, Array(0, 0), pb)
    assert(Vorbis.decodeResidueClasses(rd(), pz0, Array(book)).isEmpty)
    assert(Vorbis.decodeResidueApply(rd(), pz0, Array(book)).isEmpty)
  }

  test("residue VALUE-pass triangle over docs 0..150: stream-parsed " +
    "value books, lookup-1/2 indexing, silent classes, positional " +
    "wsum") {
    for (doc <- 0L to 150L) {
      val Some((ns, nv, s, ws, nz)) =
        Vorbis.parseResidueApply(Vorbis.streamResidueApply(doc))
      val n = Vorbis.resPartsOf(doc)
      val psize = Vorbis.rzaPsizeOf(doc)
      assert(ns == n.toLong * psize, s"doc $doc n_slots")
      val slots = Array.fill(n * psize)(0L)
      var vecs = 0L
      for (p <- 0 until n) {
        val cls = Vorbis.rzaClassOf(doc, p)
        if (Vorbis.rzaCascadeOf(doc, cls) == 1) {
          val dv = Vorbis.rzaDimsOf(doc, cls)
          val uv = Vorbis.rzaUsedOf(doc, cls)
          val lt = Vorbis.rzaLookupOf(doc, cls)
          val l1v = Vorbis.lookup1Values(uv, dv)
          for (k <- 0 until psize / dv) {
            val e = Vorbis.rzaEntryOf(doc, p, k)
            vecs += 1
            var div = 1L
            for (i <- 0 until dv) {
              val off =
                if (lt == 1) ((e / div) % l1v).toInt else e * dv + i
              slots(p * psize + k * dv + i) +=
                Vorbis.rzaMulOf(doc, cls, off)
              div *= l1v
            }
          }
        }
      }
      assert(nv == vecs, s"doc $doc n_values")
      assert(s == slots.sum, s"doc $doc res_sum")
      assert(ws == slots.zipWithIndex
        .map { case (v, i) => (i + 1L) * v }.sum, s"doc $doc res_wsum")
      assert(nz == slots.count(_ != 0L).toLong, s"doc $doc n_nonzero")
    }
  }

  test("render_line hand-check: Bresenham error walk equals the " +
    "floored line, negative slope truncates toward zero") {
    // (0,0) → (5,7): base 1, ady' 2; y = floor(7x/5)
    val v = new Array[Int](5)
    Vorbis.renderLine(0, 0, 5, 7, v)
    assert(v.toSeq == Seq(0, 1, 2, 4, 5))
    // negative slope (0,10) → (4,3): dy −7, base −1 (trunc), y =
    // 10 − floor(7x/4)
    val w = new Array[Int](4)
    Vorbis.renderLine(0, 10, 4, 3, w)
    assert(w.toSeq == Seq(10, 9, 7, 5))
    // horizontal
    val h = new Array[Int](3)
    Vorbis.renderLine(0, 4, 3, 4, h)
    assert(h.toSeq == Seq(4, 4, 4))
  }

  test("synthesizeCurve: non-step2 posts are skipped and the tail " +
    "holds the last amplitude") {
    // xs [0, 8, 4], multiplier 2; post 2 (x=4) NOT step2-flagged →
    // one segment (0,2·1)→(8,2·5), then flat to n=12
    val f = Vorbis.Floor1(Array(0), Array(1), Array(0), Array(-1),
      Array(Array(0)), 2, Array(0, 8, 4))
    val fy = Array(1, 5, 9)
    val curve = Vorbis.synthesizeCurve(f, fy,
      Array(true, true, false), 12)
    // segment: y = 2 + floor(8x/8) = 2 + x for x in [0,8)
    assert(curve.slice(0, 8).toSeq == (0 until 8).map(2 + _))
    assert(curve.slice(8, 12).toSeq == Seq(10, 10, 10, 10))
    // with the mid post flagged, the curve bends through (4, 18)
    val bent = Vorbis.synthesizeCurve(f, fy,
      Array(true, true, true), 12)
    assert(bent(4) == 18 && bent(0) == 2 && bent(8) == 10)
  }

  test("floor1 masterbook path: subclass bits select per-dimension " +
    "books, -1 slots yield zero posts") {
    val r0 = new Vorbis.BitReaderLsb(handBook, 0, handBook.length)
    val Some(book) = Vorbis.readBook(r0)
    // class 0: dims 2, 1 subclass bit, masterbook 0, slots [0, -1]
    val cfg = Vorbis.Floor1(Array(0), Array(2), Array(1), Array(0),
      Array(Array(0, -1)), 2, Array(0, 64, 10, 30))
    val w = new Vorbis.BitWriterLsb
    w.write(1, 1) // nonzero
    w.write(20, 7) // Y0 (range 128 → ilog(127) = 7 bits)
    w.write(40, 7) // Y1
    w.writeCode(2, 2) // masterbook cval = entry 2 (bits 10)
    w.writeCode(3, 2) // dim 0's post via slot 0 = book 0: entry 3
    // dim 1: slot (cval >> 1) & 1 = 1 → book -1 → Y = 0, no bits
    val Some((fy, st)) = Vorbis.decodeFloor1(
      new Vorbis.BitReaderLsb(w.bytes, 0, w.bytes.length), cfg,
      Array(book))
    // i=2: pred = rp(0,20,64,40,10) = 23; v=3 odd → 23-2 = 21
    // i=3: lo=2 (x=10), pred = rp(10,21,64,40,30) = 21+380/54 = 28;
    //      v=0 → predicted, flag false
    assert(fy.toSeq == Seq(20, 40, 21, 28))
    assert(st.toSeq == Seq(true, true, true, false))
  }

  test("residue config: set cascade bits carry book-slot bytes the " +
    "walk must consume") {
    val w = new Vorbis.BitWriterLsb
    w.write(8, 24); w.write(40, 24); w.write(3, 24) // begin/end/psize-1
    w.write(1, 6) // 2 classifications
    w.write(0, 8) // classbook 0
    w.write(3, 3); w.write(0, 1) // class 0: cascade bits 0,1 set
    w.write(0x11, 8); w.write(0x22, 8) // two book slots
    w.write(0, 3); w.write(1, 1); w.write(2, 5) // class 1: high=2
    w.write(0x33, 8) // cascade 16 → one slot (bit 4)
    w.write(0xab, 8) // sentinel AFTER the config
    val r = new Vorbis.BitReaderLsb(w.bytes, 0, w.bytes.length)
    val Some(cfg) = Vorbis.readResidueCfg(r)
    assert(cfg.begin == 8 && cfg.end == 40 && cfg.psize == 4)
    assert(cfg.classifications == 2 && cfg.classbook == 0)
    assert(cfg.cascade.toSeq == Seq(3, 16))
    assert(r.read(8).contains(0xabL)) // cursor landed exactly here
  }

  test("fixture pages carry correct Ogg CRCs (direct 0x04c11db7, " +
    "CRC field zeroed during computation)") {
    val b = Vorbis.stream(7L)
    var i = 0
    var pages = 0
    while (i < b.length) {
      val nsegs = b(i + 26) & 0xff
      var payload = 0
      for (s <- 0 until nsegs) payload += b(i + 27 + s) & 0xff
      val end = i + 27 + nsegs + payload
      val page = java.util.Arrays.copyOfRange(b, i, end)
      var stored = 0L
      for (k <- 0 until 4)
        stored |= (page(22 + k) & 0xffL) << (8 * k)
      for (k <- 0 until 4) page(22 + k) = 0
      assert((Vorbis.oggCrc(page) & 0xffffffffL) == stored,
        s"page $pages crc")
      i = end
      pages += 1
    }
    assert(pages == 3)
  }

  test("fail-closed Ogg framing: continued-packet flag, truncated " +
    "page, garbage") {
    val b = Vorbis.stream(3L)
    val cont = b.clone(); cont(5) = (cont(5) | 0x01).toByte
    assert(Vorbis.parseBooks(cont).isEmpty)
    assert(Vorbis.parseBooks(b.dropRight(3)).isEmpty)
    assert(Vorbis.parseBooks("not an ogg".getBytes).isEmpty)
    assert(Vorbis.parseBooks(Array.empty[Byte]).isEmpty)
  }
}
