package graft.multimodal

import java.io.ByteArrayOutputStream

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.scalatest.funsuite.AnyFunSuite

/** The G.711 µ-law expansion against REAL codec output: the JDK's
  * own ULAW codec (javax.sound.sampled) both as the decode reference
  * for every possible code and as an independent WAVE writer for the
  * format-tag-7 container the chunk walk must accept. */
class AudioUlawSpec extends AnyFunSuite {

  test("expansion matches the JDK µ-law codec for all 256 codes") {
    val codes = Array.tabulate[Byte](256)(i => i.toByte)
    val ulawFmt = new AudioFormat(
      AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false)
    val pcmFmt = new AudioFormat(
      AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(codes), ulawFmt, 256L)
    val pcm = AudioSystem.getAudioInputStream(pcmFmt, in)
    val out = pcm.readAllBytes()
    assert(out.length == 512)
    for (c <- 0 until 256) {
      val u = (out(2 * c) & 0xff) | (out(2 * c + 1) << 8)
      assert(u == AudioHeaders.ulawExpand(c),
        s"code $c: JDK $u vs engine ${AudioHeaders.ulawExpand(c)}")
    }
  }

  test("table anchors: rails and both zeros") {
    assert(AudioHeaders.ulawExpand(0x00) == -32124)
    assert(AudioHeaders.ulawExpand(0x80) == 32124)
    assert(AudioHeaders.ulawExpand(0xff) == 0)
    assert(AudioHeaders.ulawExpand(0x7f) == 0)
    assert(AudioHeaders.UlawFullScale == 32124)
  }

  /** A µ-law WAVE written by the JDK's own encoder from 16-bit PCM. */
  private def jdkUlawWav(rate: Float, ch: Int,
      pcm: Array[Byte]): Array[Byte] = {
    val pcmFmt = new AudioFormat(
      AudioFormat.Encoding.PCM_SIGNED, rate, 16, ch, 2 * ch, rate, false)
    val ulawFmt = new AudioFormat(
      AudioFormat.Encoding.ULAW, rate, 8, ch, ch, rate, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), pcmFmt,
      pcm.length / (2L * ch))
    val ulaw = AudioSystem.getAudioInputStream(ulawFmt, in)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ulaw, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("ulawLevels decodes a JDK-written format-tag-7 WAVE") {
    val frames = 100
    val pcm = new Array[Byte](frames * 2)
    var f = 0
    while (f < frames) { // a deterministic full-range-ish ramp
      val s = ((f * 1337) % 65536) - 32768
      pcm(2 * f) = (s & 0xff).toByte
      pcm(2 * f + 1) = ((s >> 8) & 0xff).toByte
      f += 1
    }
    val wav = jdkUlawWav(8000f, 1, pcm)
    val Some((ch, rate, nv, ssq, pk, _)) = AudioHeaders.ulawLevels(wav)
    assert(ch == 1 && rate == 8000 && nv == 100L)
    // re-derive the expected energy by expanding the codes the JDK
    // encoder actually wrote (payload = last nv bytes of the file)
    val codes = wav.takeRight(frames)
    val exp = codes.map(c => AudioHeaders.ulawExpand(c & 0xff).toLong)
    assert(ssq == exp.map(s => s * s).sum)
    assert(pk == exp.map(math.abs).max)
  }

  test("codec gating: PCM and µ-law decoders reject each other") {
    val wav = jdkUlawWav(8000f, 1, new Array[Byte](20))
    assert(AudioHeaders.levels(wav).isEmpty) // fmt 7 ≠ linear PCM
    assert(AudioHeaders.parse(wav).isEmpty)
    assert(AudioHeaders.fingerprint(wav).isEmpty)
    // and a PCM file is not µ-law
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](20)), fmt, 10L)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    assert(AudioHeaders.ulawLevels(out.toByteArray).isEmpty)
  }

  test("A-law expansion matches the JDK codec for all 256 codes") {
    val codes = Array.tabulate[Byte](256)(i => i.toByte)
    val alawFmt = new AudioFormat(
      AudioFormat.Encoding.ALAW, 8000f, 8, 1, 1, 8000f, false)
    val pcmFmt = new AudioFormat(
      AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(codes), alawFmt, 256L)
    val pcm = AudioSystem.getAudioInputStream(pcmFmt, in)
    val out = pcm.readAllBytes()
    assert(out.length == 512)
    for (c <- 0 until 256) {
      val u = (out(2 * c) & 0xff) | (out(2 * c + 1) << 8)
      assert(u == AudioHeaders.alawExpand(c),
        s"code $c: JDK $u vs engine ${AudioHeaders.alawExpand(c)}")
    }
  }

  test("A-law anchors: rails, quietest codes, no zero") {
    assert(AudioHeaders.alawExpand(0x2a) == -32256)
    assert(AudioHeaders.alawExpand(0xaa) == 32256)
    assert(AudioHeaders.alawExpand(0x55) == -8)
    assert(AudioHeaders.alawExpand(0xd5) == 8)
    assert((0 until 256).forall(c => AudioHeaders.alawExpand(c) != 0),
      "A-law has no zero code")
    assert(AudioHeaders.AlawFullScale == 32256)
  }

  test("A-law and µ-law decoders gate on their own format tag") {
    def le(v: Long, n: Int): Seq[Int] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xff).toInt)
    def built(fmt: Int): Array[Byte] =
      ("RIFF".map(_.toInt) ++ le(36 + 4, 4) ++ "WAVE".map(_.toInt) ++
        "fmt ".map(_.toInt) ++ le(16, 4) ++
        le(fmt, 2) ++ le(1, 2) ++ le(8000, 4) ++ le(8000, 4) ++
        le(1, 2) ++ le(8, 2) ++
        "data".map(_.toInt) ++ le(4, 4) ++ Seq(0x2a, 0xaa, 0x55, 0xd5)
        ).map(_.toByte).toArray
    assert(AudioHeaders.alawLevels(built(7)).isEmpty)
    assert(AudioHeaders.ulawLevels(built(6)).isEmpty)
    val Some((_, _, nv, _, pk, fs)) = AudioHeaders.alawLevels(built(6))
    assert(nv == 4L && pk == 32256 && fs == 2L)
  }

  test("µ-law fmt with bits != 8 fails the walk") {
    def le(v: Long, n: Int): Seq[Int] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xff).toInt)
    def built(bits: Int): Array[Byte] =
      ("RIFF".map(_.toInt) ++ le(36 + 4, 4) ++ "WAVE".map(_.toInt) ++
        "fmt ".map(_.toInt) ++ le(16, 4) ++
        le(7, 2) ++ le(1, 2) ++ le(8000, 4) ++
        le(8000L * (bits / 8), 4) ++
        le(bits / 8, 2) ++ le(bits, 2) ++
        "data".map(_.toInt) ++ le(4, 4) ++ Seq(0, 0x80, 0xff, 0x7f)
        ).map(_.toByte).toArray
    assert(AudioHeaders.ulawLevels(built(16)).isEmpty)
    val Some((_, _, nv, _, pk, fs)) = AudioHeaders.ulawLevels(built(8))
    assert(nv == 4L && pk == 32124 && fs == 2L) // both rails present
  }
}
