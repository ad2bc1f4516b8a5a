package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** The WARC record walk ([[Warc.parse]]): hand-built archives with
  * known record inventories, bodies that CONTAIN the magic (the case
  * a magic-scanner corrupts on and a length-driven walk must not),
  * both spec versions, and fail-closed adversaries. */
class WarcSpec extends AnyFunSuite {

  private def rec(ver: String, typ: String, uri: Option[String],
      body: String, declaredLen: Option[Int] = None,
      extra: Seq[String] = Nil): String = {
    val len = declaredLen.getOrElse(body.length)
    val headers = Seq(s"WARC-Type: $typ") ++
      uri.map(u => s"WARC-Target-URI: $u") ++ extra ++
      Seq(s"Content-Length: $len")
    s"$ver\r\n" + headers.map(_ + "\r\n").mkString +
      "\r\n" + body + "\r\n\r\n"
  }

  private def bytes(s: String): Array[Byte] = s.getBytes("US-ASCII")

  test("two records, both versions, uri optional, unknown headers " +
    "skipped") {
    val w = rec("WARC/1.0", "warcinfo", None, "software: graft",
        extra = Seq("WARC-Date: 2024-01-01T00:00:00Z")) +
      rec("WARC/1.1", "response", Some("http://ex.com/1"),
        "HTTP/1.1 200 OK\r\n\r\nhello")
    val got = Warc.parse(bytes(w)).get
    assert(got.map(r => (r.warcType, Option(r.uri), r.len)) == Seq(
      ("warcinfo", None, 15L),
      ("response", Some("http://ex.com/1"), 24L)))
    assert(got(1).body.endsWith("hello"))
  }

  test("a body containing 'WARC/1.0' does not desynchronize the " +
    "length-driven walk") {
    val trap = "see WARC/1.0\r\nContent-Length: 99\r\n\r\n inside"
    val w = rec("WARC/1.0", "resource", Some("http://ex.com/t"),
      trap) + rec("WARC/1.0", "response", Some("http://ex.com/2"), "ok")
    val got = Warc.parse(bytes(w)).get
    assert(got.length == 2 && got(0).body == trap &&
      got(1).body == "ok")
  }

  test("fail-closed: bad version / missing length / non-numeric " +
    "length / short block / broken separator / trailing garbage") {
    assert(Warc.parse(bytes(
      "WARC/2.0\r\nWARC-Type: x\r\nContent-Length: 1\r\n\r\na\r\n\r\n"))
      .isEmpty)
    assert(Warc.parse(bytes(
      "WARC/1.0\r\nWARC-Type: x\r\n\r\na\r\n\r\n")).isEmpty)
    assert(Warc.parse(bytes(
      "WARC/1.0\r\nWARC-Type: x\r\nContent-Length: 2x\r\n\r\nab\r\n\r\n"))
      .isEmpty)
    // declared 10, only 2 present
    assert(Warc.parse(bytes(rec("WARC/1.0", "x", None, "ab",
      declaredLen = Some(10)))).isEmpty)
    // separator mangled
    val ok = rec("WARC/1.0", "x", None, "ab")
    assert(Warc.parse(bytes(ok.dropRight(1) + "X")).isEmpty)
    // a record then garbage that is not a record
    assert(Warc.parse(bytes(ok + "junk")).isEmpty)
    // a 20-digit all-numeric length is malformed, not a crash
    assert(Warc.parse(bytes(
      "WARC/1.0\r\nWARC-Type: x\r\n" +
        "Content-Length: 99999999999999999999\r\n\r\n\r\n\r\n"))
      .isEmpty)
    // empty payload
    assert(Warc.parse(bytes("")).isEmpty)
  }

  test("empty body records are legal (Content-Length: 0)") {
    val got = Warc.parse(bytes(rec("WARC/1.0", "request",
      Some("http://ex.com/r"), ""))).get
    assert(got.head.len == 0L && got.head.body == "")
  }

  private def gz(b: Array[Byte]): Array[Byte] =
    graft.functions.GzipMember.compress(b)

  test("member-per-record .warc.gz (Common Crawl layout): " +
    "multi-member inflate recovers every record; parseAuto " +
    "dispatches on the magic") {
    val r1 = rec("WARC/1.0", "warcinfo", None, "software: graft")
    val r2 = rec("WARC/1.1", "response", Some("http://ex.com/9"),
      "HTTP/1.1 200 OK\r\n\r\nbody WARC/1.0 trap")
    val r3 = rec("WARC/1.0", "request", Some("http://ex.com/9"), "")
    // one gzip member PER record, concatenated — a range reader can
    // enter at any member boundary, and the inflate walk must cross
    // all of them
    val payload = gz(bytes(r1)) ++ gz(bytes(r2)) ++ gz(bytes(r3))
    assert(Warc.isGzip(payload))
    val got = Warc.parseAuto(payload).get
    assert(got.map(_.warcType) == Seq("warcinfo", "response",
      "request"))
    assert(got(1).body.endsWith("body WARC/1.0 trap"))
    // the same records parse identically uncompressed
    assert(Warc.parseAuto(bytes(r1 + r2 + r3)).get == got)
  }

  test("gz fail-closed: truncated member, corrupt deflate stream, " +
    "gzip wrapping non-WARC bytes") {
    val whole = gz(bytes(rec("WARC/1.0", "x", None, "ab")))
    assert(Warc.parseAuto(whole.dropRight(5)).isEmpty)
    val flipped = whole.clone()
    flipped(whole.length / 2) = (flipped(whole.length / 2) ^ 0x5a).toByte
    // a mid-stream bit flip either breaks DEFLATE/CRC (None from the
    // inflate) or corrupts the record text (None from the parser)
    assert(Warc.parseAuto(flipped).isEmpty)
    assert(Warc.parseAuto(gz(bytes("not a warc"))).isEmpty)
  }

  test("gz fail-closed: trailing garbage and a corrupted member-N " +
    "header reject the WHOLE payload (no silent record loss)") {
    val r1 = rec("WARC/1.0", "response", Some("http://ex.com/1"), "a")
    val r2 = rec("WARC/1.0", "response", Some("http://ex.com/2"), "b")
    val two = gz(bytes(r1)) ++ gz(bytes(r2))
    assert(Warc.parseAuto(two).get.size == 2)
    // JDK GZIPInputStream silently EOFs on unparseable post-member
    // bytes; the manual walk must instead reject
    assert(Warc.parseAuto(two ++ Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
      .isEmpty, "trailing garbage after the last member must reject")
    // corrupt the SECOND member's magic: under the JDK walk this
    // silently returned Some(Seq(r1)) — one record lost. Must be None.
    val m1 = gz(bytes(r1))
    val corrupted = m1 ++ gz(bytes(r2))
    corrupted(m1.length) = 0x00 // smash member-2's 0x1f magic byte
    assert(Warc.parseAuto(corrupted).isEmpty,
      "a broken member-2 header must reject, not drop records")
    // trailer checks: flip a CRC byte (deflate itself stays valid)
    val crcFlip = gz(bytes(r1))
    crcFlip(crcFlip.length - 6) =
      (crcFlip(crcFlip.length - 6) ^ 0x7f).toByte
    assert(Warc.parseAuto(crcFlip).isEmpty, "bad CRC32 must reject")
    val isizeFlip = gz(bytes(r1))
    isizeFlip(isizeFlip.length - 1) =
      (isizeFlip(isizeFlip.length - 1) ^ 0x7f).toByte
    assert(Warc.parseAuto(isizeFlip).isEmpty, "bad ISIZE must reject")
  }

  test("gz header optional fields (FNAME/FEXTRA/FCOMMENT/FHCRC) are " +
    "walked per RFC 1952") {
    val body = bytes(rec("WARC/1.0", "response",
      Some("http://ex.com/n"), "named"))
    val plain = gz(body)
    // splice FNAME ("f.warc\0") into the member: set FLG bit 3 and
    // insert the zero-terminated name after the 10-byte fixed header
    val name = "f.warc".getBytes("US-ASCII") :+ 0.toByte
    val withName = plain.take(10) ++ name ++ plain.drop(10)
    withName(3) = (withName(3) | 0x08).toByte
    assert(Warc.parseAuto(withName).get.head.body == "named")
    // FEXTRA: 4-byte extra field, little-endian XLEN
    val extra = Array[Byte](4, 0, 'x', 'y', 'z', 'w')
    val withExtra = plain.take(10) ++ extra ++ plain.drop(10)
    withExtra(3) = (withExtra(3) | 0x04).toByte
    assert(Warc.parseAuto(withExtra).get.head.body == "named")
    // a truncated FNAME (no terminator before payload end) rejects
    val truncName = plain.take(10) ++ "noterm".getBytes("US-ASCII")
    truncName(3) = (truncName(3) | 0x08).toByte
    assert(Warc.parseAuto(truncName).isEmpty)
  }
}
