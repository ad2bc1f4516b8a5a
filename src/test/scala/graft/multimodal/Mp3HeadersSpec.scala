package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The MP3 frame walk against hand-built MPEG-1 Layer III streams,
  * plus adversarial inputs for the ID3 skip and the derived-length
  * chain. */
class Mp3HeadersSpec extends AnyFunSuite {

  /** One frame with the given 1-based bitrate index, sample-rate
    * index, padding bit, and channel mode (body zero-filled to the
    * derived length). */
  private def frame(brIdx: Int, srIdx: Int, pad: Int,
      mode: Int): Array[Byte] = {
    val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
      192, 224, 256, 320)(brIdx)
    val rate = Array(44100, 48000, 32000)(srIdx)
    val len = 144000 * kbps / rate + pad
    val b = new Array[Byte](len)
    b(0) = 0xff.toByte
    b(1) = 0xfb.toByte
    b(2) = ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
    b(3) = ((mode << 6) | 4).toByte
    b
  }

  private def id3(pad: Int, footer: Boolean = false): Array[Byte] = {
    val flags = if (footer) 0x10 else 0
    val tail = if (footer) new Array[Byte](pad + 10)
    else new Array[Byte](pad)
    (Array('I', 'D', '3', 4, 0, flags, 0, 0, 0, pad)
      .map(_.toByte)) ++ tail
  }

  test("CBR stream without a tag") {
    val s = Array.concat(frame(9, 0, 0, 3), frame(9, 0, 0, 3),
      frame(9, 0, 0, 3))
    // 128 kbps @ 44100: 144000*128/44100 = 417 bytes
    assert(Mp3Headers.parse(s).contains((3, 44100, 1, 384L, 1251L, 1152)))
  }

  test("VBR stream behind an ID3v2 tag, padding varies") {
    val s = Array.concat(id3(37), frame(1, 1, 1, 1), frame(14, 1, 0, 1),
      frame(7, 1, 1, 1))
    // 32/320/96 kbps @ 48000 → 96+1, 960, 288+1 bytes
    assert(Mp3Headers.parse(s)
      .contains((3, 48000, 2, (32 + 320 + 96).toLong, 1346L, 1152)))
  }

  test("ID3 footer flag adds 10 bytes before frame 0") {
    val s = Array.concat(id3(5, footer = true), frame(2, 2, 0, 3))
    assert(Mp3Headers.parse(s).contains((1, 32000, 1, 40L, 180L, 1152)))
  }

  test("syncsafe size is decoded, not scanned: tag bytes containing " +
    "0xFF do not start the walk early") {
    val t = id3(8)
    // plant a plausible-looking sync INSIDE the tag payload
    t(10) = 0xff.toByte
    t(11) = 0xfb.toByte
    t(12) = 0x92.toByte
    val s = Array.concat(t, frame(9, 0, 0, 3))
    assert(Mp3Headers.parse(s).contains((1, 44100, 1, 128L, 417L, 1152)))
  }

  test("non-syncsafe ID3 size byte → None (malformed tag, no guessing)") {
    val t = id3(8)
    t(9) = 0x80.toByte // bit 7 set — illegal in syncsafe coding
    assert(Mp3Headers.parse(Array.concat(t, frame(9, 0, 0, 3))).isEmpty)
  }

  test("truncated trailing frame is not counted") {
    val f = frame(9, 0, 0, 3)
    val s = Array.concat(f, f.dropRight(1))
    assert(Mp3Headers.parse(s).contains((1, 44100, 1, 128L, 417L, 1152)))
  }

  test("trailing garbage ends the walk without poisoning the count") {
    val s = Array.concat(frame(9, 0, 0, 3), Array[Byte](0x41, 0x42))
    assert(Mp3Headers.parse(s).contains((1, 44100, 1, 128L, 417L, 1152)))
  }

  test("a mis-derived length would desynchronize: off-by-one filler " +
    "breaks the second frame") {
    val f0 = frame(9, 0, 1, 3) // padded: 418 bytes
    val s = Array.concat(f0.dropRight(1), frame(9, 0, 0, 3))
    // walk reads frame 0's DECLARED 418 bytes, landing 1 byte into
    // frame 1 → no sync there → only frame 0 counted (its declared
    // extent overlaps what is really frame 1's first byte)
    val r = Mp3Headers.parse(s)
    assert(r.contains((1, 44100, 1, 128L, 418L, 1152)))
  }

  test("sample-rate or mode change mid-stream ends the walk") {
    assert(Mp3Headers.parse(
      Array.concat(frame(9, 0, 0, 3), frame(9, 1, 0, 3)))
      .contains((1, 44100, 1, 128L, 417L, 1152)))
    assert(Mp3Headers.parse(
      Array.concat(frame(9, 0, 0, 3), frame(9, 0, 0, 1)))
      .contains((1, 44100, 1, 128L, 417L, 1152)))
  }

  test("unsupported variants → None: reserved version, Layer II, " +
    "free-format, invalid bitrate, reserved rate") {
    val f = frame(9, 0, 0, 3)
    def mut(i: Int, v: Int): Array[Byte] = {
      val c = f.clone(); c(i) = v.toByte; c
    }
    assert(Mp3Headers.parse(mut(1, 0xeb)).isEmpty) // version bits 01
    assert(Mp3Headers.parse(mut(1, 0xfd)).isEmpty) // Layer II
    assert(Mp3Headers.parse(mut(2, 0x02)).isEmpty) // free format
    assert(Mp3Headers.parse(mut(2, 0xf2)).isEmpty) // bitrate idx 15
    assert(Mp3Headers.parse(mut(2, 0x9e)).isEmpty) // rate idx 3
    assert(Mp3Headers.parse(null).isEmpty)
    assert(Mp3Headers.parse(Array.emptyByteArray).isEmpty)
    assert(Mp3Headers.parse(id3(4)).isEmpty) // tag only, no frames
  }

  /** One LSF frame (MPEG-2 or 2.5 by `v25`): the shared LSF bitrate
    * table, version-specific rates, the 72 coefficient. */
  private def frame2(brIdx: Int, srIdx: Int, pad: Int, mode: Int,
      v25: Boolean): Array[Byte] = {
    val kbps = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
      128, 144, 160)(brIdx)
    val rate =
      if (v25) Array(11025, 12000, 8000)(srIdx)
      else Array(22050, 24000, 16000)(srIdx)
    val len = 72000 * kbps / rate + pad
    val b = new Array[Byte](len)
    b(0) = 0xff.toByte
    b(1) = (if (v25) 0xe3 else 0xf3).toByte
    b(2) = ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
    b(3) = ((mode << 6) | 4).toByte
    b
  }

  test("MPEG-2 stream: the LSF bitrate table, half coefficient, " +
    "576 samples per frame") {
    // 64 kbps @ 24000: 72000*64/24000 = 192 bytes
    val s = Array.concat(frame2(8, 1, 0, 3, v25 = false),
      frame2(8, 1, 0, 3, v25 = false))
    assert(Mp3Headers.parse(s).contains((2, 24000, 1, 128L, 384L, 576)))
  }

  test("MPEG-2.5 stream behind an ID3 tag, VBR + padding") {
    // 8 kbps @ 8000 → 72+pad; 40 kbps @ 8000 → 360
    val s = Array.concat(id3(9), frame2(1, 2, 1, 1, v25 = true),
      frame2(5, 2, 0, 1, v25 = true))
    assert(Mp3Headers.parse(s)
      .contains((2, 8000, 2, 48L, (73 + 360).toLong, 576)))
  }

  test("version change mid-stream ends the walk (per-stream " +
    "constant, like rate and mode)") {
    val s = Array.concat(frame2(8, 1, 0, 3, v25 = false),
      frame2(8, 1, 0, 3, v25 = true))
    assert(Mp3Headers.parse(s)
      .contains((1, 24000, 1, 64L, 192L, 576)))
    // MPEG-1 then MPEG-2 likewise stops at frame 1
    val m = Array.concat(frame(9, 0, 0, 3),
      frame2(8, 1, 0, 3, v25 = false))
    assert(Mp3Headers.parse(m)
      .contains((1, 44100, 1, 128L, 417L, 1152)))
  }

  test("joint-stereo and mono channel mapping") {
    assert(Mp3Headers.parse(frame(5, 1, 0, 0)).exists(_._3 == 2))
    assert(Mp3Headers.parse(frame(5, 1, 0, 1)).exists(_._3 == 2))
    assert(Mp3Headers.parse(frame(5, 1, 0, 2)).exists(_._3 == 2))
    assert(Mp3Headers.parse(frame(5, 1, 0, 3)).exists(_._3 == 1))
  }

  /** Embed a Xing/Info block into a frame's filler at the side-info
    * offset. */
  private def withVbr(f: Array[Byte], magic: String, flags: Int,
      frames: Long, bytes: Long, mode: Int): Array[Byte] = {
    val side = if (mode == 3) 17 else 32
    val out = f.clone()
    var p = 4 + side
    magic.foreach { c => out(p) = c.toByte; p += 1 }
    def be32(v: Long): Unit = {
      out(p) = ((v >> 24) & 0xff).toByte
      out(p + 1) = ((v >> 16) & 0xff).toByte
      out(p + 2) = ((v >> 8) & 0xff).toByte
      out(p + 3) = (v & 0xff).toByte
      p += 4
    }
    be32(flags.toLong)
    if ((flags & 1) != 0) be32(frames)
    if ((flags & 2) != 0) be32(bytes)
    out
  }

  test("Xing block: both side-info offsets, both magics, flag subsets") {
    // stereo (mode 1): side info 32 bytes
    val st = withVbr(frame(5, 0, 0, 1), "Xing", 3, 4321L, 987654L, 1)
    assert(Mp3Headers.vbrInfo(st)
      .contains(("Xing", 44100, 4321L, 987654L, 4321L * 1152 * 1000 / 44100)))
    // mono (mode 3): side info 17 bytes
    val mo = withVbr(frame(5, 1, 0, 3), "Info", 3, 100L, 5000L, 3)
    assert(Mp3Headers.vbrInfo(mo)
      .contains(("Info", 48000, 100L, 5000L, 100L * 1152 * 1000 / 48000)))
    // frames-only flags: bytes reported as -1, est_ms still derived
    val fo = withVbr(frame(5, 0, 0, 1), "Xing", 1, 250L, 0L, 1)
    assert(Mp3Headers.vbrInfo(fo)
      .contains(("Xing", 44100, 250L, -1L, 250L * 1152 * 1000 / 44100)))
    // behind an ID3 tag
    val tagged = id3(20) ++ st
    assert(Mp3Headers.vbrInfo(tagged) === Mp3Headers.vbrInfo(st))
  }

  test("Xing block absent, wrong offset, or overrunning -> None") {
    // plain CBR frame: no magic
    assert(Mp3Headers.vbrInfo(frame(5, 0, 0, 1)).isEmpty)
    // magic placed at the MONO offset inside a STEREO frame is not
    // found (the parser derives the offset from the mode, not a scan)
    val wrong = frame(5, 0, 0, 1)
    "Xing".zipWithIndex.foreach { case (c, i) => wrong(4 + 17 + i) = c.toByte }
    assert(Mp3Headers.vbrInfo(wrong).isEmpty)
    // a declared-frames field cut by the buffer edge fails closed
    val st = withVbr(frame(5, 0, 0, 1), "Xing", 3, 4321L, 987654L, 1)
    assert(Mp3Headers.vbrInfo(st.take(4 + 32 + 10)).isEmpty)
  }

  /** An ID3v2 tag built by INDEPENDENT arithmetic: frames as
    * (id, encoding, bytes) triples, `padding` zero bytes appended
    * inside the declared size. */
  private def id3Tag(ver: Int, frames: Seq[(String, Int, Array[Byte])],
      padding: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val body = new java.io.ByteArrayOutputStream()
    frames.foreach { case (id, enc, txt) =>
      body.write(id.getBytes("US-ASCII"))
      val sz = 1 + txt.length
      if (ver == 4)
        (3 to 0 by -1).foreach(k => body.write((sz >> (7 * k)) & 0x7f))
      else
        (3 to 0 by -1).foreach(k => body.write((sz >> (8 * k)) & 0xff))
      body.write(0); body.write(0); body.write(enc); body.write(txt)
    }
    body.write(new Array[Byte](padding))
    val b = body.toByteArray
    out.write("ID3".getBytes); out.write(ver); out.write(0); out.write(0)
    (3 to 0 by -1).foreach(k => out.write((b.length >> (7 * k)) & 0x7f))
    out.write(b)
    out.toByteArray
  }

  test("ID3v2 text frames: v2.3 u32be vs v2.4 SYNCSAFE sizes " +
    "(multi-byte), encodings, NUL strip, padding stop, subsets") {
    // v2.4 with a 200-byte title: syncsafe size spans two bytes —
    // a u32be read of it would land mid-frame and corrupt TPE1
    val long = ("L" * 200).getBytes("UTF-8")
    assert(Mp3Headers.id3TextFrames(id3Tag(4, Seq(
      ("TIT2", 3, long), ("TPE1", 3, "Art".getBytes),
      ("TALB", 0, "Alb ".getBytes("ISO-8859-1")))))
      .contains(("L" * 200, "Art", "Alb", 4)))
    // v2.3 plain sizes; UTF-16 frame (enc 1) yields a null field
    assert(Mp3Headers.id3TextFrames(id3Tag(3, Seq(
      ("TIT2", 1, "ab".getBytes("UTF-16LE")),
      ("TPE1", 0, "Aé".getBytes("ISO-8859-1")))))
      .contains((null, "Aé", null, 3)))
    // padding after the frames stops the walk cleanly
    assert(Mp3Headers.id3TextFrames(id3Tag(4, Seq(
      ("TIT2", 3, "t".getBytes)), padding = 40))
      .contains(("t", null, null, 4)))
    // fail-closed: a frame whose SIZE FIELD overruns the declared
    // tag extent (declared size admits the header, not the body)
    val bad = id3Tag(3, Seq(("TIT2", 3, "abc".getBytes)))
    bad(17) = 100 // frame size u32be low byte: 4 -> 100
    assert(Mp3Headers.id3TextFrames(bad).isEmpty)
    // a v2.3 frame declaring a ~2^31 size must hit the bounds
    // guard, not wrap an Int past it into an AIOOBE
    val huge = id3Tag(3, Seq(("TIT2", 3, "abc".getBytes)))
    huge(14) = 0x7f.toByte; huge(15) = 0xff.toByte
    huge(16) = 0xff.toByte; huge(17) = 0xf0.toByte
    assert(Mp3Headers.id3TextFrames(huge).isEmpty)
    // the unsynchronisation flag is out of scope: fail closed
    val unsync = id3Tag(4, Seq(("TIT2", 3, "t".getBytes)))
    unsync(5) = 0x80.toByte
    assert(Mp3Headers.id3TextFrames(unsync).isEmpty)
    // no tag at all
    assert(Mp3Headers.id3TextFrames(frame(5, 0, 0, 1)).isEmpty)
  }

  /** Hand-built ID3v2.2 tag: 6-byte frame headers (3-char id +
    * u24be size), ISO-8859-1 texts. */
  private def id3v22Tag(frames: Seq[(String, Array[Byte])],
      padding: Int = 0): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    frames.foreach { case (id, txt) =>
      body.write(id.getBytes("US-ASCII"))
      val sz = 1 + txt.length
      body.write((sz >> 16) & 0xff); body.write((sz >> 8) & 0xff)
      body.write(sz & 0xff)
      body.write(0) // ISO-8859-1
      body.write(txt)
    }
    body.write(new Array[Byte](padding))
    val bb = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array('I', 'D', '3', 2, 0, 0).map(_.toByte))
    out.write((bb.length >> 21) & 0x7f); out.write((bb.length >> 14) & 0x7f)
    out.write((bb.length >> 7) & 0x7f); out.write(bb.length & 0x7f)
    out.write(bb)
    out.toByteArray
  }

  test("ID3v2.2: 3-char ids, 6-byte headers, u24be sizes — a " +
    "10-byte-header walk would land mid-frame") {
    assert(Mp3Headers.id3TextFrames(id3v22Tag(Seq(
      ("TT2", "Old Song".getBytes("ISO-8859-1")),
      ("TP1", "Aé".getBytes("ISO-8859-1")),
      ("TAL", "LP".getBytes("ISO-8859-1")))))
      .contains(("Old Song", "Aé", "LP", 2)))
    // subset + padding stop
    assert(Mp3Headers.id3TextFrames(id3v22Tag(Seq(
      ("TT2", "t".getBytes)), padding = 20))
      .contains(("t", null, null, 2)))
    // a v2.2 frame overrunning the tag extent fails closed
    val bad = id3v22Tag(Seq(("TT2", "abc".getBytes)))
    bad(15) = 90 // u24be size low byte
    assert(Mp3Headers.id3TextFrames(bad).isEmpty)
  }
}
