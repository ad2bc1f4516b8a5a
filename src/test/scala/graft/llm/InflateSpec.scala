package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** The from-scratch DEFLATE decoder ([[Inflate]]) pinned two
  * independent ways: against the JDK's Deflater across levels 0–9,
  * all three strategies, raw + zlib wrappers, and payload shapes
  * from empty through 200 KB repeat-heavy (long back-copies), and
  * against HAND-ASSEMBLED bitstreams (stored block, fixed-Huffman
  * literals, a fixed-Huffman LZ77 back-copy) whose bytes were
  * packed by hand from RFC 1951 §3.1.1's bit order — so the decoder
  * is not merely the JDK's inverse. Plus the fail-closed boundary. */
class InflateSpec extends AnyFunSuite {

  /** Deterministic pseudo-random bytes (no Math.random in tests). */
  private def lcgBytes(seed: Long, n: Int): Array[Byte] = {
    var x = seed * 6364136223846793005L + 1442695040888963407L
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 33).toByte
    }
  }

  private def deflate(b: Array[Byte], level: Int, nowrap: Boolean,
      strategy: Int = java.util.zip.Deflater.DEFAULT_STRATEGY)
      : Array[Byte] = {
    val d = new java.util.zip.Deflater(level, nowrap)
    d.setStrategy(strategy)
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def payloads: Seq[Array[Byte]] = Seq(
    Array.empty[Byte],
    "a".getBytes,
    "abcabcabcabc".getBytes,
    ("the quick brown fox jumps over the lazy dog. " * 40).getBytes,
    Array.fill[Byte](5000)(0),
    lcgBytes(7, 1000), // incompressible → stored even at level 9
    lcgBytes(11, 100) ++ lcgBytes(11, 100) ++ lcgBytes(11, 100),
    // long-distance back-copies: repeat a 40 KB unit (window-scale)
    { val u = lcgBytes(13, 40000); u ++ u ++ u ++ u ++ u })

  test("JDK pin: zlib wrapper, levels 0-9, all payload shapes") {
    for (p <- payloads; level <- 0 to 9) {
      val z = deflate(p, level, nowrap = false)
      val out = Inflate.zlib(z)
      assert(out.isDefined, s"level $level len ${p.length}")
      assert(java.util.Arrays.equals(out.get, p),
        s"level $level len ${p.length}")
    }
  }

  test("JDK pin: raw streams, exact consumption, all strategies") {
    import java.util.zip.Deflater._
    for (p <- payloads; level <- Seq(0, 1, 6, 9);
        strat <- Seq(DEFAULT_STRATEGY, FILTERED, HUFFMAN_ONLY)) {
      val r = deflate(p, level, nowrap = true, strat)
      val Some((out, consumed)) = Inflate.raw(r, 0)
      assert(java.util.Arrays.equals(out, p))
      assert(consumed == r.length, s"consumed $consumed != ${r.length}")
      // trailing bytes are not consumed by raw (wrappers enforce)
      val Some((out2, c2)) = Inflate.raw(r ++ Array[Byte](1, 2, 3), 0)
      assert(java.util.Arrays.equals(out2, p) && c2 == r.length)
    }
  }

  test("hand-assembled stored block") {
    val raw = Array[Byte](0x01, 0x03, 0x00, 0xfc.toByte, 0xff.toByte,
      'x', 'y', 'z')
    val Some((out, consumed)) = Inflate.raw(raw, 0)
    assert(new String(out, "US-ASCII") == "xyz" && consumed == 8)
  }

  test("hand-assembled fixed-Huffman literals: 'abc' is " +
    "4B 4C 4A 06 00 (bits packed by hand)") {
    val raw = Array[Byte](0x4b, 0x4c, 0x4a, 0x06, 0x00)
    val Some((out, consumed)) = Inflate.raw(raw, 0)
    assert(new String(out, "US-ASCII") == "abc" && consumed == 5)
    // double pin: the JDK agrees these hand bytes mean "abc"
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(raw)
    val buf = new Array[Byte](16)
    val n = inf.inflate(buf)
    assert(new String(buf, 0, n, "US-ASCII") == "abc")
    inf.end()
  }

  test("hand-assembled fixed-Huffman LZ77 back-copy: lit 'a' + " +
    "(len 3, dist 1) is 4B 04 02 00") {
    val raw = Array[Byte](0x4b, 0x04, 0x02, 0x00)
    val Some((out, _)) = Inflate.raw(raw, 0)
    assert(new String(out, "US-ASCII") == "aaaa")
  }

  test("fail-closed: reserved BTYPE, LEN/NLEN mismatch, distance " +
    "past output start, truncation") {
    // BFINAL=1, BTYPE=11 → first byte 0b00000111
    assert(Inflate.raw(Array[Byte](0x07, 0x00), 0).isEmpty)
    // stored with NLEN not ~LEN
    assert(Inflate.raw(Array[Byte](0x01, 0x03, 0x00, 0x00, 0x00,
      'x', 'y', 'z'), 0).isEmpty)
    // back-copy with no prior output: hdr + sym 257 + dist 0 + eob
    // bits: [1,1,0] 0000001 00000 0000000 → bytes 03 02 00
    assert(Inflate.raw(Array[Byte](0x03, 0x02, 0x00), 0).isEmpty)
    // truncated mid-codeword
    val good = deflate("hello hello hello".getBytes, 6, nowrap = true)
    assert(Inflate.raw(good.dropRight(2), 0).isEmpty)
    assert(Inflate.raw(null, 0).isEmpty)
  }

  test("fail-closed zlib wrapper: FCHECK, FDICT, Adler-32, " +
    "trailing garbage") {
    val p = "checksummed payload".getBytes
    val z = deflate(p, 6, nowrap = false)
    assert(Inflate.zlib(z).isDefined)
    val badCheck = z.clone(); badCheck(1) = (badCheck(1) ^ 0x01).toByte
    assert(Inflate.zlib(badCheck).isEmpty)
    val badAdler = z.clone()
    badAdler(z.length - 1) = (badAdler(z.length - 1) ^ 0x01).toByte
    assert(Inflate.zlib(badAdler).isEmpty)
    assert(Inflate.zlib(z ++ Array[Byte](0)).isEmpty)
    assert(Inflate.zlib(z.dropRight(1)).isEmpty)
    assert(Inflate.zlib(Array[Byte](0x78, 0x9c.toByte)).isEmpty)
  }

  test("own gzip walk: multi-member archives agree with the JDK " +
    "walk; CRC-32 matches the JDK's") {
    val recs = Seq("record one", "a second, longer record " * 8,
      "third").map(_.getBytes)
    val archive = recs.map(graft.functions.GzipMember.compress)
      .reduce(_ ++ _)
    val Some(ours) = Inflate.gzipMembers(archive)
    val Some(jdk) = Warc.gunzipMembers(archive)
    assert(java.util.Arrays.equals(ours, jdk))
    assert(java.util.Arrays.equals(ours, recs.reduce(_ ++ _)))
    for (p <- payloads)
      assert(Inflate.crc32(p) == { val c = new java.util.zip.CRC32()
        c.update(p); c.getValue })
  }

  test("own gzip walk is STRICTLY framed: trailing garbage and a " +
    "corrupt later member header reject the whole payload") {
    val m = graft.functions.GzipMember.compress("strict".getBytes)
    assert(Inflate.gzipMembers(m).isDefined)
    // trailing garbage after a complete member: rejected here
    assert(Inflate.gzipMembers(m ++ Array[Byte](9, 9, 9)).isEmpty)
    // corrupt second-member magic: rejected (no silent record loss)
    val two = m ++ m
    val bad = two.clone(); bad(m.length) = 0x00
    assert(Inflate.gzipMembers(bad).isEmpty)
    // wrong CRC: rejected
    val badCrc = m.clone()
    badCrc(m.length - 5) = (badCrc(m.length - 5) ^ 0x01).toByte
    assert(Inflate.gzipMembers(badCrc).isEmpty)
    // wrong ISIZE: rejected
    val badIsize = m.clone()
    badIsize(m.length - 1) = (badIsize(m.length - 1) ^ 0x01).toByte
    assert(Inflate.gzipMembers(badIsize).isEmpty)
    assert(Inflate.gzipMembers(m.dropRight(1)).isEmpty)
  }

  test("own gzip walk: FNAME / FEXTRA / FCOMMENT optional header " +
    "fields are walked, reserved FLG bits reject") {
    val m = graft.functions.GzipMember.compress("named".getBytes)
    // splice an FNAME field in: set FLG bit 3, insert "f.txt\0"
    def withField(flagBit: Int, field: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(m, 0, 3)
      out.write(m(3) | flagBit)
      out.write(m, 4, 6)
      out.write(field, 0, field.length)
      out.write(m, 10, m.length - 10)
      out.toByteArray
    }
    val named = withField(0x08, ("f.txt".getBytes ++ Array[Byte](0)))
    assert(Inflate.gzipMembers(named).exists(b =>
      new String(b, "US-ASCII") == "named"))
    val extra = withField(0x04, Array[Byte](3, 0, 1, 2, 3))
    assert(Inflate.gzipMembers(extra).exists(b =>
      new String(b, "US-ASCII") == "named"))
    val commented = withField(0x10, ("hi".getBytes ++ Array[Byte](0)))
    assert(Inflate.gzipMembers(commented).exists(b =>
      new String(b, "US-ASCII") == "named"))
    val reserved = withField(0x80, Array.empty[Byte])
    assert(Inflate.gzipMembers(reserved).isEmpty)
  }

  test("FHCRC header CRC16 is VERIFIED, not skipped, by both the " +
    "from-scratch walk and the Warc member walk") {
    val m = graft.functions.GzipMember.compress("hcrc".getBytes)
    // header with FLG bit 1 set: magic..OS (10 bytes) with FLG|0x02
    val hdr = m.take(10)
    hdr(3) = (hdr(3) | 0x02).toByte
    val c = new java.util.zip.CRC32
    c.update(hdr, 0, 10)
    val lo = (c.getValue & 0xff).toByte
    val hi = ((c.getValue >> 8) & 0xff).toByte
    val good = hdr ++ Array[Byte](lo, hi) ++ m.drop(10)
    assert(Inflate.gzipMembers(good).exists(b =>
      new String(b, "US-ASCII") == "hcrc"))
    assert(Warc.gunzipMembers(good).exists(b =>
      new String(b, "US-ASCII") == "hcrc"))
    // a corrupted stored CRC16 must reject (the JDK rejects it too)
    val bad = hdr ++ Array[Byte]((lo ^ 0x01).toByte, hi) ++ m.drop(10)
    assert(Inflate.gzipMembers(bad).isEmpty)
    assert(Warc.gunzipMembers(bad).isEmpty)
    // JDK parity on the good member
    val jdk = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(good)).readAllBytes()
    assert(new String(jdk, "US-ASCII") == "hcrc")
  }

  test("expression seam: InflateZlib.inflate inverts " +
    "DeflateZlib.compress at every level") {
    val p = ("expression-level roundtrip " * 10).getBytes
    for (level <- 0 to 9) {
      val z = graft.functions.DeflateZlib.compress(p, level)
      val u = graft.functions.InflateZlib.inflate(z)
      assert(u != null && java.util.Arrays.equals(u, p))
    }
    assert(graft.functions.InflateZlib.inflate("junk".getBytes) == null)
  }
}
