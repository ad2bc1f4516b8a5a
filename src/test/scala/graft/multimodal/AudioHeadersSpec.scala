package graft.multimodal

import java.io.ByteArrayOutputStream

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.scalatest.funsuite.AnyFunSuite

/** The WAV header parser against REAL encoder output: bytes produced
  * by the JDK's own WAVE writer (javax.sound.sampled), plus
  * adversarial inputs for the chunk walk. */
class AudioHeadersSpec extends AnyFunSuite {

  private def encoded(rate: Float, ch: Int, frames: Int): Array[Byte] = {
    val fmt = new AudioFormat(rate, 16, ch, true, false)
    val pcm = new Array[Byte](frames * ch * 2)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("real WAV bytes from the JDK encoder") {
    assert(AudioHeaders.parse(encoded(44100f, 2, 1000))
      .contains((2, 44100, 16, 1000L)))
    assert(AudioHeaders.parse(encoded(8000f, 1, 37))
      .contains((1, 8000, 16, 37L)))
  }

  test("IEEE-float WAV (format tag 3): JDK encoder bytes parse to " +
      "32-bit geometry; float bits other than 32/64 fail the walk") {
    val fmt = new AudioFormat(
      AudioFormat.Encoding.PCM_FLOAT, 48000f, 32, 2, 8, 48000f, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](50 * 8)),
      fmt, 50L)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    assert(AudioHeaders.parse(out.toByteArray)
      .contains((2, 48000, 32, 50L)))
    // float sample METERING stays out: not a 16-bit integer stream
    assert(AudioHeaders.levels(out.toByteArray).isEmpty)
    // a fmt-3 header declaring 16-bit floats is malformed
    val bad = out.toByteArray.clone()
    // locate the fmt chunk's bits field: JDK writes the canonical
    // 44-byte header (fmt payload at 20, bits at 34)
    bad(34) = 16; bad(35) = 0
    bad(32) = 4 // block align must stay consistent: ch*(bits/8)
    assert(AudioHeaders.parse(bad).isEmpty)
  }

  private def le(v: Long, n: Int): Seq[Int] =
    (0 until n).map(i => ((v >> (8 * i)) & 0xff).toInt)

  /** The wavHex layout with a variable-length LIST payload before
    * fmt (padded to even length per RIFF). */
  private def handBuilt(listPayload: String): Array[Byte] = {
    val pad = if (listPayload.length % 2 == 1) Seq(0) else Seq()
    ("RIFF".map(_.toInt) ++ le(56 + 10, 4) ++ "WAVE".map(_.toInt) ++
      "LIST".map(_.toInt) ++ le(listPayload.length.toLong, 4) ++
      listPayload.map(_.toInt) ++ pad ++
      "fmt ".map(_.toInt) ++ le(16, 4) ++
      le(1, 2) ++ le(1, 2) ++ le(22050, 4) ++ le(22050L * 2, 4) ++
      le(2, 2) ++ le(16, 2) ++
      "data".map(_.toInt) ++ le(10, 4)
      ).map(_.toByte).toArray
  }

  test("chunk walk skips a LIST chunk before fmt (the AudioHex layout)") {
    // byte-for-byte the layout wavHex builds: rate 22050, 1 channel,
    // 10 data bytes → 5 samples
    assert(AudioHeaders.parse(handBuilt("INFOIARTGFT0"))
      .contains((1, 22050, 16, 5L)))
  }

  test("odd-size chunk advances by size + pad byte") {
    // a 13-byte LIST payload gets one pad byte; without the
    // `size & 1` advance the walk lands one byte early, misses
    // 'fmt ', and parses to None
    assert(AudioHeaders.parse(handBuilt("INFOIARTGFT00"))
      .contains((1, 22050, 16, 5L)))
  }

  test("truncated, non-PCM, and inconsistent payloads parse to None") {
    val wav = encoded(16000f, 1, 100)
    assert(AudioHeaders.parse(wav.take(11)).isEmpty)
    assert(AudioHeaders.parse(wav.take(30)).isEmpty) // cut inside fmt
    assert(AudioHeaders.parse(null).isEmpty)
    assert(AudioHeaders.parse(Array.emptyByteArray).isEmpty)
    assert(AudioHeaders.parse("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(AudioHeaders.parse("not audio at all".getBytes).isEmpty)
    // flip format code to 3 (IEEE float): PCM-only contract rejects
    val nonPcm = wav.clone()
    val fmtAt = indexOfTag(nonPcm, "fmt ")
    nonPcm(fmtAt + 8) = 3
    assert(AudioHeaders.parse(nonPcm).isEmpty)
    // corrupt block_align: self-inconsistency rejects
    val badAlign = wav.clone()
    badAlign(fmtAt + 8 + 12) = 7
    assert(AudioHeaders.parse(badAlign).isEmpty)
  }

  private def indexOfTag(b: Array[Byte], tag: String): Int = {
    val t = tag.getBytes
    b.indices.find(i => i + 4 <= b.length &&
      b(i) == t(0) && b(i + 1) == t(1) &&
      b(i + 2) == t(2) && b(i + 3) == t(3)).get
  }

  /** JDK-encoded WAV whose PCM payload carries the given s16le
    * values. */
  private def encodedWith(rate: Float, ch: Int,
      values: Seq[Int]): Array[Byte] = {
    require(values.length % ch == 0)
    val fmt = new AudioFormat(rate, 16, ch, true, false)
    val pcm = new Array[Byte](values.length * 2)
    values.zipWithIndex.foreach { case (v, i) =>
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, values.length / ch)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("levels: exact sum-of-squares / peak / clip count over real " +
    "encoder output, full-scale negatives included") {
    val vals = Seq(0, 100, -100, 32767, -32768, 5, -32768, 1000)
    val got = AudioHeaders.levels(encodedWith(22050f, 2, vals))
    val sumSq = vals.map(v => v.toLong * v).sum
    // peak is |−32768| = 32768 (doesn't overflow to the positive max)
    assert(got.contains((2, 22050, 8L, sumSq, 32768, 3L)))
  }

  test("levels: truncated payload meters only the samples present") {
    val vals = Seq(10, -20, 30, -40, 50, -60)
    val full = encodedWith(8000f, 1, vals)
    val cut = full.take(full.length - 5) // 12-byte payload → 7 bytes
    val sumSq = vals.take(3).map(v => v.toLong * v).sum // 3 full samples
    assert(AudioHeaders.levels(cut).contains((1, 8000, 3L, sumSq, 30, 0L)))
  }

  test("levels: 8-bit PCM is UNSIGNED with a 128 bias — JDK encoder" +
    " bytes cross-check") {
    // JDK 8-bit WAVE is unsigned; raw payload bytes ARE the u8 codes
    val codes = Array[Byte](0, 127.toByte, 128.toByte, 255.toByte,
      200.toByte, 1)
    val fmt8 = new AudioFormat(8000f, 8, 1, false, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(codes), fmt8, codes.length.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    val signed = codes.map(c => (c & 0xff) - 128)
    val sumSq = signed.map(v => v.toLong * v).sum
    // rails: u=255 → +127 (clip), u=0 → −128 (clip)
    assert(AudioHeaders.levels(out.toByteArray)
      .contains((1, 8000, 6L, sumSq, 128, 2L)))
  }

  test("levels: 24-bit PCM signed little-endian with ±2^23 rails") {
    // hand-built: JDK coverage of 24-bit varies, the fixture doesn't
    val samples = Seq(0, 5, -5, 8388607, -8388608, 300000)
    val payload = samples.flatMap { v =>
      val u = if (v < 0) v + (1 << 24) else v
      Seq((u & 0xff).toByte, ((u >> 8) & 0xff).toByte,
        ((u >> 16) & 0xff).toByte)
    }.toArray
    val hdr = new ByteArrayOutputStream()
    def le(v: Int, n: Int): Unit =
      (0 until n).foreach(k => hdr.write((v >> (8 * k)) & 0xff))
    hdr.write("RIFF".getBytes); le(36 + payload.length, 4)
    hdr.write("WAVE".getBytes)
    hdr.write("fmt ".getBytes); le(16, 4)
    le(1, 2); le(1, 2); le(48000, 4); le(48000 * 3, 4); le(3, 2)
    le(24, 2)
    hdr.write("data".getBytes); le(payload.length, 4)
    hdr.write(payload)
    val sumSq = samples.map(v => v.toLong * v).sum
    assert(AudioHeaders.levels(hdr.toByteArray)
      .contains((1, 48000, 6L, sumSq, 8388608, 2L)))
  }

  test("levels: unsupported widths and non-audio return None (stays" +
    " behind the stub)") {
    // 32-bit integer PCM: not in the decoded set
    val payload = new Array[Byte](8)
    val hdr = new ByteArrayOutputStream()
    def le(v: Int, n: Int): Unit =
      (0 until n).foreach(k => hdr.write((v >> (8 * k)) & 0xff))
    hdr.write("RIFF".getBytes); le(36 + payload.length, 4)
    hdr.write("WAVE".getBytes)
    hdr.write("fmt ".getBytes); le(16, 4)
    le(1, 2); le(1, 2); le(8000, 4); le(8000 * 4, 4); le(4, 2)
    le(32, 2)
    hdr.write("data".getBytes); le(payload.length, 4)
    hdr.write(payload)
    assert(AudioHeaders.levels(hdr.toByteArray).isEmpty)
    assert(AudioHeaders.levels("not audio at all".getBytes).isEmpty)
    assert(AudioHeaders.levels(null).isEmpty)
  }

  test("audio_levels expression + SQL registration agree with the " +
    "plain-Scala decoder") {
    val s = graft.TestSpark.spark
    import s.implicits._
    val vals = Seq(7, -7, 32767, 12, -32768, 0)
    val rows = Seq(
      (1L, encodedWith(44100f, 1, vals)),
      (2L, "not audio at all".getBytes))
    val got = rows.toDF("id", "payload")
      .selectExpr("id", "audio_levels(payload) AS m")
      .selectExpr("id", "m.n_values AS nv", "m.sum_sq AS ssq",
        "m.peak AS pk", "m.n_clipped AS cl")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(1)) -1L else r.getLong(2),
        if (r.isNullAt(1)) -1 else r.getInt(3),
        if (r.isNullAt(1)) -1L else r.getLong(4))).toSet
    val sumSq = vals.map(v => v.toLong * v).sum
    assert(got == Set((1L, 6L, sumSq, 32768, 2L), (2L, -1L, -1L, -1, -1L)))
  }

  test("audio_meta expression + SQL registration agree with the parser") {
    val s = graft.TestSpark.spark
    import s.implicits._
    val rows = Seq(
      (1L, encoded(44100f, 2, 1000)),
      (2L, encoded(8000f, 1, 37)),
      (3L, "not audio at all".getBytes))
    val got = rows.toDF("id", "payload")
      .selectExpr("id", "audio_meta(payload) AS m")
      .selectExpr("id", "m.channels AS ch", "m.sample_rate AS sr",
        "m.n_samples AS n")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1 else r.getInt(1),
        if (r.isNullAt(1)) -1 else r.getInt(2),
        if (r.isNullAt(1)) -1L else r.getLong(3))).toSet
    assert(got == Set((1L, 2, 44100, 1000L), (2L, 1, 8000, 37L),
      (3L, -1, -1, -1L)))
  }

  test("fingerprint: energy-delta bits over real encoder output, " +
    "volume-invariant, refuses short clips") {
    // 3 frames of 4 values: energies 4·100², 4·200², 4·50²
    //  → bits: E1>E0 (1), E2>E1 (0) → fp = 1
    val vals = Seq(100, -100, 100, -100, 200, -200, 200, -200,
      50, -50, 50, -50)
    val got = AudioHeaders.fingerprint(encodedWith(16000f, 1, vals))
    assert(got.contains((16000, 3L, 1L)))
    // volume scaling preserves energy ORDER → same fingerprint
    val loud = AudioHeaders.fingerprint(
      encodedWith(16000f, 1, vals.map(_ * 3)))
    assert(loud.map(_._3) == got.map(_._3))
    // monotone ramp across 5 frames → all four bits set
    val ramp = (0 until 20).map(i => (i / 4 + 1) * 100)
    assert(AudioHeaders.fingerprint(encodedWith(8000f, 1, ramp))
      .contains((8000, 5L, 15L)))
    // one frame → nothing to compare; non-PCM refused
    assert(AudioHeaders.fingerprint(
      encodedWith(8000f, 1, Seq(1, 2, 3, 4))).isEmpty)
    assert(AudioHeaders.fingerprint("nope".getBytes).isEmpty)
    // the pack never exceeds 32 bits (sign-safe Hamming contract)
    val long = (0 until 200).map(i => ((i * 37) % 200) - 100)
    val fp = AudioHeaders.fingerprint(encodedWith(8000f, 1, long)).get
    assert(fp._2 == 50L && fp._3 >= 0 && fp._3 < (1L << 32))
  }

  /** A VORBIS_COMMENT block (BE framing, LE payload lengths) built
    * by independent arithmetic. */
  private def commentBlock(last: Boolean,
      fields: Seq[String]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val body = new ByteArrayOutputStream()
    def le32(v: Int): Unit =
      (0 until 4).foreach(k => body.write((v >> (8 * k)) & 0xff))
    val vendor = "test".getBytes("UTF-8")
    le32(vendor.length); body.write(vendor)
    le32(fields.length)
    fields.foreach { f =>
      val fb = f.getBytes("UTF-8"); le32(fb.length); body.write(fb)
    }
    val b = body.toByteArray
    out.write((if (last) 0x80 else 0) | 4)
    out.write(b.length >> 16); out.write((b.length >> 8) & 0xff)
    out.write(b.length & 0xff)
    out.write(b)
    out.toByteArray
  }

  test("FLAC VORBIS_COMMENT: LE payload inside BE framing, " +
    "case-insensitive keys, subsets, overrun fails closed") {
    val head = flacBytes(44100, 2, 16, 5L, pad = Some(0))
      .dropRight(4) // strip the padding block; re-append blocks
    val tagged = head ++ commentBlock(last = true,
      Seq("title=Low Key", "ARTIST=A", "comment=x", "Album=B"))
    assert(AudioHeaders.parseFlacTags(tagged)
      .contains(("Low Key", "A", "B")))
    // no comment block at all: all-null fields, not an error
    assert(AudioHeaders.parseFlacTags(flacBytes(44100, 2, 16, 5L))
      .contains((null, null, null)))
    // a declared comment length past the block end fails closed
    val cut = head ++ commentBlock(last = true, Seq("TITLE=x"))
    cut(cut.length - 9) = 99 // inflate the field's LE length
    assert(AudioHeaders.parseFlacTags(cut).isEmpty)
    assert(AudioHeaders.parseFlacTags("nope".getBytes).isEmpty)
  }

  /** A FLAC stream head with the STREAMINFO geometry bit-packed by
    * INDEPENDENT arithmetic (shift-compose here, masked reads in the
    * parser), optionally followed by a PADDING block. */
  private def flacBytes(rate: Int, ch: Int, bits: Int, total: Long,
      pad: Option[Int] = None, firstType: Int = 0,
      blockLen: Int = 34): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("fLaC".getBytes)
    out.write((if (pad.isEmpty) 0x80 else 0x00) | firstType)
    out.write(blockLen >> 16); out.write((blockLen >> 8) & 0xff)
    out.write(blockLen & 0xff)
    out.write(Array[Byte](0x10, 0, 0x10, 0, 0, 0, 0, 0, 0, 0))
    // the 64-bit pack: rate(20) | ch-1(3) | bits-1(5) | total(36)
    val packed = (rate.toLong << 44) | ((ch - 1).toLong << 41) |
      ((bits - 1).toLong << 36) | total
    (7 to 0 by -1).foreach(i => out.write(((packed >> (8 * i)) & 0xff).toInt))
    out.write(new Array[Byte](16)) // md5 unknown
    pad.foreach { n =>
      out.write(0x81); out.write(0); out.write(n >> 8)
      out.write(n & 0xff); out.write(new Array[Byte](n))
    }
    out.toByteArray
  }

  test("FLAC STREAMINFO: bit-pack decode, is-last variants, " +
    "36-bit totals, fail-closed adversaries, parseRow dispatch") {
    assert(AudioHeaders.parseFlac(flacBytes(44100, 2, 16, 1234567L))
      .contains((2, 44100, 16, 1234567L)))
    // padding follows: is-last clear on STREAMINFO, still parses
    assert(AudioHeaders.parseFlac(
      flacBytes(96000, 8, 24, 42L, pad = Some(11)))
      .contains((8, 96000, 24, 42L)))
    // a total above 2^32 exercises the 36-bit read
    assert(AudioHeaders.parseFlac(
      flacBytes(48000, 1, 16, (5L << 32) + 7))
      .contains((1, 48000, 16, (5L << 32) + 7)))
    // fail-closed: wrong magic / first block not STREAMINFO /
    // wrong declared body length / zero rate / sub-spec bits / short
    assert(AudioHeaders.parseFlac("flaC0000".getBytes ++
      new Array[Byte](40)).isEmpty)
    assert(AudioHeaders.parseFlac(
      flacBytes(44100, 2, 16, 1L, firstType = 4)).isEmpty)
    assert(AudioHeaders.parseFlac(
      flacBytes(44100, 2, 16, 1L, blockLen = 33)).isEmpty)
    assert(AudioHeaders.parseFlac(flacBytes(0, 2, 16, 1L)).isEmpty)
    assert(AudioHeaders.parseFlac(flacBytes(44100, 2, 3, 1L)).isEmpty)
    assert(AudioHeaders.parseFlac(
      flacBytes(44100, 2, 16, 1L).take(41)).isEmpty)
    // one expression, two containers: parseRow sniffs the magic
    val viaRow = AudioHeaders.parseRow(flacBytes(22050, 1, 8, 99L))
    assert(viaRow != null && viaRow.getInt(1) == 22050 &&
      viaRow.getInt(0) == 1 && viaRow.getInt(2) == 8 &&
      viaRow.getLong(3) == 99L)
    assert(AudioHeaders.parseRow(encoded(8000f, 1, 37)) != null)
  }

  /** One Ogg page with INDEPENDENT little-endian arithmetic; the
    * payload is split across `lacing` segment values. */
  private def oggPage(htype: Int, granule: Long,
      payload: Array[Byte], lacing: Seq[Int]): Array[Byte] = {
    assert(lacing.sum == payload.length)
    val out = new ByteArrayOutputStream()
    out.write("OggS".getBytes); out.write(0); out.write(htype)
    (0 until 8).foreach(k => out.write(((granule >> (8 * k)) & 0xff).toInt))
    out.write(Array[Byte](1, 0, 0, 0, 9, 0, 0, 0, 0, 0, 0, 0)) // serial/seq/crc
    out.write(lacing.length)
    lacing.foreach(out.write)
    out.write(payload)
    out.toByteArray
  }

  private def vorbisId(ch: Int, rate: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(1); out.write("vorbis".getBytes)
    out.write(Array[Byte](0, 0, 0, 0)); out.write(ch)
    (0 until 4).foreach(k => out.write((rate >> (8 * k)) & 0xff))
    out.write(new Array[Byte](12)); out.write(0xB8); out.write(1)
    out.toByteArray
  }

  test("Ogg/Vorbis: page walk by lacing arithmetic (multi-segment " +
    "pages, 'OggS' inside a payload), last-granule duration, " +
    "granule -1 skipped, fail-closed, parseRow dispatch") {
    val id = vorbisId(2, 44100)
    val trap = ("xxOggS" + "y" * 254).getBytes // contains the magic
    val good = oggPage(0x02, 0, id, Seq(30)) ++
      oggPage(0x00, -1L, trap, Seq(255, trap.length - 255)) ++
      oggPage(0x04, 123456789L, new Array[Byte](7), Seq(7))
    assert(AudioHeaders.parseOgg(good)
      .contains((2, 44100, 0, 123456789L)))
    // granule above 2^32 exercises the full u64le read
    val big = oggPage(0x02, 0, id, Seq(30)) ++
      oggPage(0x04, (7L << 40) + 5, new Array[Byte](3), Seq(3))
    assert(AudioHeaders.parseOgg(big)
      .contains((2, 44100, 0, (7L << 40) + 5)))
    // fail-closed: first page not BOS / not vorbis / truncated page
    assert(AudioHeaders.parseOgg(
      oggPage(0x00, 0, id, Seq(30))).isEmpty)
    val notV = id.clone(); notV(1) = 'x'.toByte
    assert(AudioHeaders.parseOgg(
      oggPage(0x02, 0, notV, Seq(30))).isEmpty)
    assert(AudioHeaders.parseOgg(good.dropRight(3)).isEmpty)
    // a u32 rate above Int.MaxValue fails closed, never truncates
    val hugeRate = vorbisId(2, 44100)
    hugeRate(12) = 0xf0.toByte; hugeRate(13) = 0xff.toByte
    hugeRate(14) = 0xff.toByte; hugeRate(15) = 0xff.toByte
    assert(AudioHeaders.parseOgg(
      oggPage(0x02, 0, hugeRate, Seq(30))).isEmpty)
    // dispatch: the same audio_meta row surface
    val viaRow = AudioHeaders.parseRow(good)
    assert(viaRow != null && viaRow.getInt(0) == 2 &&
      viaRow.getInt(1) == 44100 && viaRow.getInt(2) == 0 &&
      viaRow.getLong(3) == 123456789L)
  }
}
