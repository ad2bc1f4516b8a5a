package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Ogg comment-packet tag decode ([[AudioHeaders.parseOggTags]])
  * pinned on hand-built page chains — packet REASSEMBLY across
  * lacing values and across pages (the 255-continuation rule), the
  * mandatory framing bit, tagless streams, and the FLAC dispatch
  * staying intact. */
class OggTagsSpec extends AnyFunSuite {

  private def u32le(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def page(htype: Int, seq: Int, lacings: Seq[Int],
      payload: Array[Byte]): Array[Byte] = {
    val h = new java.io.ByteArrayOutputStream()
    h.write("OggS".getBytes("US-ASCII"))
    h.write(0); h.write(htype)
    h.write(new Array[Byte](8)) // granule 0
    h.write(u32le(1)) // serial
    h.write(u32le(seq.toLong))
    h.write(new Array[Byte](4)) // crc
    h.write(lacings.length)
    lacings.foreach(h.write)
    h.write(payload)
    h.toByteArray
  }

  private val idPacket: Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write(1); o.write("vorbis".getBytes("US-ASCII"))
    o.write(u32le(0)) // version
    o.write(2) // channels
    o.write(u32le(44100))
    o.write(new Array[Byte](12)) // bitrates
    o.write(0xb8); o.write(1)
    o.toByteArray
  }

  private def commentPacket(title: String, framing: Int = 1)
      : Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write(3); o.write("vorbis".getBytes("US-ASCII"))
    val vendor = "graft".getBytes("UTF-8")
    o.write(u32le(vendor.length)); o.write(vendor)
    o.write(u32le(2))
    val c1 = s"TITLE=$title".getBytes("UTF-8")
    o.write(u32le(c1.length)); o.write(c1)
    val c2 = "ARTIST=Band".getBytes("UTF-8")
    o.write(u32le(c2.length)); o.write(c2)
    o.write(framing)
    o.toByteArray
  }

  private def bosPage: Array[Byte] =
    page(0x02, 0, Seq(idPacket.length), idPacket)
  private def eosPage: Array[Byte] =
    page(0x04, 9, Seq(3), Array[Byte](0, 0, 0))

  test("comment packet split across two lacing values on one page " +
    "reassembles") {
    val long = "T" * 300
    val pk = commentPacket(long)
    assert(pk.length > 255)
    val p2 = page(0, 1, Seq(255, pk.length - 255), pk)
    val Some((t, a, al)) =
      AudioHeaders.parseOggTags(bosPage ++ p2 ++ eosPage)
    assert(t == long && a == "Band" && al == null)
  }

  test("comment packet split ACROSS PAGES (255-continuation into a " +
    "continued page) reassembles") {
    val long = "U" * 280
    val pk = commentPacket(long)
    val p2 = page(0, 1, Seq(255), pk.take(255))
    val p3 = page(0x01, 2, Seq(pk.length - 255), pk.drop(255))
    val Some((t, a, _)) =
      AudioHeaders.parseOggTags(bosPage ++ p2 ++ p3 ++ eosPage)
    assert(t == long && a == "Band")
  }

  test("tagless stream yields all-null fields, not an error") {
    assert(AudioHeaders.parseOggTags(bosPage ++ eosPage) ==
      Some((null, null, null)))
  }

  test("missing or zero framing bit fails closed") {
    val pk = commentPacket("x", framing = 0)
    val p2 = page(0, 1, Seq(pk.length), pk)
    assert(AudioHeaders.parseOggTags(bosPage ++ p2 ++ eosPage)
      .isEmpty)
    val cut = commentPacket("x").dropRight(1) // framing byte gone
    val p2b = page(0, 1, Seq(cut.length), cut)
    assert(AudioHeaders.parseOggTags(bosPage ++ p2b ++ eosPage)
      .isEmpty)
  }

  test("non-BOS first page and non-Ogg bytes fail closed") {
    assert(AudioHeaders.parseOggTags(
      page(0, 0, Seq(idPacket.length), idPacket) ++ eosPage).isEmpty)
    assert(AudioHeaders.parseOggTags(Array.fill[Byte](64)(0x41))
      .isEmpty)
    assert(AudioHeaders.parseOggTags(null).isEmpty)
  }

  test("the magic dispatch leaves the FLAC tags path intact") {
    // flacTagsRow on an Ogg stream takes the page walk; a non-Ogg
    // non-FLAC payload still nulls out
    val pk = commentPacket("both")
    val ogg = bosPage ++ page(0, 1, Seq(pk.length), pk) ++ eosPage
    val row = AudioHeaders.flacTagsRow(ogg)
    assert(row != null && row.getUTF8String(0).toString == "both")
    assert(AudioHeaders.flacTagsRow(Array.fill[Byte](64)(7)) == null)
  }
}
