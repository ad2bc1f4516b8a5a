package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The MP4 box-walk parser against byte-built containers plus
  * adversarial inputs: largesize/size-0 boxes, v1 headers, audio
  * tracks before the video track, truncation, and oversized child
  * boxes. */
class VideoHeadersSpec extends AnyFunSuite {

  private def be(v: Long, n: Int): Seq[Int] =
    (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xff).toInt)

  private def box(typ: String, payload: Seq[Int]): Seq[Int] =
    be(payload.length + 8L, 4) ++ typ.map(_.toInt) ++ payload

  private def mvhd0(ts: Long, dur: Long): Seq[Int] =
    box("mvhd", be(0, 4) ++ be(0, 4) ++ be(0, 4) ++ be(ts, 4) ++
      be(dur, 4) ++ Seq.fill(100 - 20)(0))

  private def mvhd1(ts: Long, dur: Long): Seq[Int] =
    box("mvhd", Seq(1, 0, 0, 0) ++ be(0, 8) ++ be(0, 8) ++ be(ts, 4) ++
      be(dur, 8) ++ Seq.fill(80)(0))

  private def tkhd0(w: Long, h: Long): Seq[Int] =
    box("tkhd", be(0, 4) ++ Seq.fill(72)(0) ++
      be(w << 16, 4) ++ be(h << 16, 4))

  private def tkhd1(w: Long, h: Long): Seq[Int] =
    box("tkhd", Seq(1, 0, 0, 0) ++ Seq.fill(84)(0) ++
      be(w << 16, 4) ++ be(h << 16, 4))

  private def file(parts: Seq[Int]*): Array[Byte] =
    (box("ftyp", "isom".map(_.toInt) ++ be(0, 4)) ++
      box("moov", parts.flatten)).map(_.toByte).toArray

  test("v0 moov with a skipped free box parses") {
    val b = file(box("free", Seq(1, 2, 3, 4)), mvhd0(90000, 450000),
      box("trak", tkhd0(1920, 1080)))
    assert(VideoHeaders.parse(b).contains((1920, 1080, 90000, 450000L)))
  }

  test("v1 mvhd/tkhd (64-bit times) parse with u64 duration") {
    val b = file(mvhd1(600, 0x1_0000_0000L),
      box("trak", tkhd1(640, 360)))
    assert(VideoHeaders.parse(b)
      .contains((640, 360, 600, 0x1_0000_0000L)))
  }

  test("an audio track (0x0 dims) before the video track is skipped") {
    val b = file(mvhd0(1000, 5000),
      box("trak", tkhd0(0, 0) ++ Seq()), // invalid dims track
      box("trak", tkhd0(320, 240)))
    // 0-dim tkhd parses to None for that trak; the next trak wins
    assert(VideoHeaders.parse(b).contains((320, 240, 1000, 5000L)))
  }

  test("largesize (size == 1) boxes advance correctly") {
    val inner = mvhd0(24000, 12000) ++ box("trak", tkhd0(100, 50))
    val moovLarge = be(1, 4) ++ "moov".map(_.toInt) ++
      be(inner.length + 16L, 8) ++ inner
    val b = (box("ftyp", "isom".map(_.toInt) ++ be(0, 4)) ++ moovLarge)
      .map(_.toByte).toArray
    assert(VideoHeaders.parse(b).contains((100, 50, 24000, 12000L)))
  }

  test("truncated, corrupt, and non-MP4 payloads parse to None") {
    val good = file(mvhd0(600, 600), box("trak", tkhd0(64, 64)))
    assert(VideoHeaders.parse(null).isEmpty)
    assert(VideoHeaders.parse(Array.emptyByteArray).isEmpty)
    assert(VideoHeaders.parse("not a video".getBytes).isEmpty)
    assert(VideoHeaders.parse(good.take(30)).isEmpty)
    // a child box whose declared size overruns its parent is rejected
    val overrun = file(mvhd0(600, 600),
      be(0xFFFF, 4) ++ "trak".map(_.toInt) ++ tkhd0(64, 64))
    assert(VideoHeaders.parse(overrun).isEmpty)
    // zero timescale is inconsistent
    assert(VideoHeaders.parse(
      file(mvhd0(0, 600), box("trak", tkhd0(64, 64)))).isEmpty)
  }

  test("the VideoHex fixture bytes parse to their build parameters " +
    "(expression + SQL registration)") {
    val s = graft.TestSpark.spark
    import s.implicits._
    val rows = Seq((7L, 123L, 45L, 90000L, 123456L))
      .toDF("doc_id", "w0", "h0", "ts0", "dur0")
      .selectExpr("doc_id",
        s"unhex(${VideoHex.mp4Hex("w0", "h0", "ts0", "dur0", "div")}) " +
          "AS payload")
      .selectExpr("doc_id", "video_meta(payload) AS m")
      .selectExpr("m.width", "m.height", "m.timescale", "m.duration")
      .collect()
    assert(rows.length == 1 && !rows.head.isNullAt(0))
    assert((rows.head.getInt(0), rows.head.getInt(1),
      rows.head.getInt(2), rows.head.getLong(3)) ==
      (123, 45, 90000, 123456L))
  }

  private def le32(v: Long): Seq[Int] =
    (0 until 4).map(i => ((v >> (8 * i)) & 0xff).toInt)

  /** An AVI head with an arbitrary pre-hdrl chunk (walk must skip)
    * built by INDEPENDENT arithmetic from the parser's reads. */
  private def aviBytes(w: Long, h: Long, usf: Long, nf: Long,
      junkLen: Int = 4, avihSize: Int = 56): Array[Byte] = {
    val avih = "avih".map(_.toInt) ++ le32(avihSize) ++
      le32(usf) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(nf) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ Seq.fill(16)(0)
    val junk = "JUNK".map(_.toInt) ++ le32(junkLen) ++
      Seq.fill(junkLen + (junkLen & 1))(0xAB)
    val list = "LIST".map(_.toInt) ++ le32(4 + avih.length) ++
      "hdrl".map(_.toInt) ++ avih
    val body = "AVI ".map(_.toInt) ++ junk ++ list
    ("RIFF".map(_.toInt) ++ le32(body.length) ++ body)
      .map(_.toByte).toArray
  }

  test("AVI: avih decode behind a JUNK skip (odd sizes padded), " +
    "microsecond clock mapping, fail-closed, parseRow dispatch") {
    assert(VideoHeaders.parseAvi(aviBytes(640, 480, 40000, 250))
      .contains((640, 480, 1000000, 10000000L)))
    // odd junk payload exercises the RIFF pad rule
    assert(VideoHeaders.parseAvi(
      aviBytes(1920, 1080, 33367, 7, junkLen = 5))
      .contains((1920, 1080, 1000000, 233569L)))
    // fail-closed: zero frame period / zero dims / truncated /
    // undersized avih / wrong magic
    assert(VideoHeaders.parseAvi(aviBytes(640, 480, 0, 10)).isEmpty)
    assert(VideoHeaders.parseAvi(aviBytes(0, 480, 40000, 10)).isEmpty)
    assert(VideoHeaders.parseAvi(
      aviBytes(640, 480, 40000, 10).take(60)).isEmpty)
    assert(VideoHeaders.parseAvi(
      aviBytes(640, 480, 40000, 10, avihSize = 40)).isEmpty)
    assert(VideoHeaders.parseAvi("RIFXxxxxAVI ".getBytes).isEmpty)
    // u32 x u32 duration overflow fails closed, never wraps negative
    assert(VideoHeaders.parseAvi(
      aviBytes(640, 480, 0xFFFFFFFFL, 0xFFFFFFFFL)).isEmpty)
    // one expression, two containers
    val viaRow = VideoHeaders.parseRow(aviBytes(33, 7, 20000, 3))
    assert(viaRow != null && viaRow.getInt(0) == 33 &&
      viaRow.getInt(1) == 7 && viaRow.getInt(2) == 1000000 &&
      viaRow.getLong(3) == 60000L)
  }
}
