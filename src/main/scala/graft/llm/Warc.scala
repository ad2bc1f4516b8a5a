package graft.llm

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Real WARC (ISO 28500) record-stream parsing — the wire format of
  * web-scale training corpora (Common Crawl ships as WARC): a file
  * is back-to-back records, each
  *
  * {{{
  * WARC/1.0<CRLF>
  * Header-Name: value<CRLF>   (repeated; WARC-Type, Content-Length,
  * <CRLF>                      WARC-Target-URI, ...)
  * <Content-Length bytes of block>
  * <CRLF><CRLF>               (record separator)
  * }}}
  *
  * The walk is CONTENT-LENGTH DRIVEN — the block is opaque bytes
  * (may itself contain "WARC/1.0"), so a scanner that searches for
  * magic instead of honoring the declared length corrupts on
  * adversarial bodies; the spec's one reliable invariant is the
  * header's own arithmetic. Fail-closed: a record with no
  * Content-Length, a non-numeric length, a missing version line, a
  * truncated block, or a malformed separator rejects the WHOLE
  * payload (None) — ingest pipelines quarantine broken objects, they
  * don't guess at resync.
  *
  * Scale note: production WARC corpora are millions of ~1 GB
  * objects — file-granular parallelism is the intended 100 TB shape
  * (Common Crawl's own layout), so the per-payload walk here is the
  * right grain; a single-giant-file splitter would follow the
  * [[graft.rdf.TurtleChunked]] tiling pattern if ever needed.
  *
  * Gzip: Common Crawl actually ships `.warc.gz` — one gzip MEMBER
  * per record, members back-to-back, so a range fetch can start at
  * any member boundary. [[parseAuto]] detects the gzip magic
  * (`1f 8b`, which can never open a plain record — those start
  * "WARC/"), inflates ALL members with the JDK's multi-member
  * `GZIPInputStream` walk, and feeds the SAME length-driven record
  * parser. Fail-closed like everything else here: a truncated
  * member, bad CRC, or trailing garbage rejects the whole payload.
  */
object Warc {

  /** Inflate a (possibly multi-member) gzip payload, None on any
    * corruption — JDK `GZIPInputStream` walks member-to-member
    * (its trailer read probes for the next member's header), which
    * is exactly the member-per-record layout Common Crawl uses.
    * Bounded paranoia: output is capped at 1 GiB per payload (the
    * object grain) so a gzip bomb fails loudly instead of OOMing
    * an executor. */
  private[llm] def gunzipMembers(b: Array[Byte]): Option[Array[Byte]] = {
    val cap = 1 << 30
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b), 65536)
      val out = new java.io.ByteArrayOutputStream(
        math.min(b.length.toLong * 4, 1 << 20).toInt)
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        if (out.size > cap) return None
        n = in.read(buf)
      }
      in.close()
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }
  }

  /** True when the payload opens with the gzip magic — unambiguous
    * against plain WARC, whose first bytes are ASCII "WARC/". */
  private[llm] def isGzip(b: Array[Byte]): Boolean =
    b != null && b.length >= 2 && b(0) == 0x1f.toByte &&
      b(1) == 0x8b.toByte

  /** [[parse]] with transparent `.warc.gz` handling: gzip payloads
    * are member-walked and inflated first, plain payloads parse
    * directly. */
  def parseAuto(b: Array[Byte]): Option[Seq[Rec]] =
    if (isGzip(b)) gunzipMembers(b).flatMap(parse) else parse(b)

  /** One parsed record: (warcType, targetUri or null, declared
    * content length, block as string). */
  final case class Rec(warcType: String, uri: String, len: Long,
      body: String)

  private val Sep = "\r\n".getBytes("US-ASCII")

  /** Index of CRLF starting at or after `from`, or -1. */
  private def crlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** All records of a WARC payload, else None (fail-closed). */
  def parse(b: Array[Byte]): Option[Seq[Rec]] = {
    if (b == null || b.length == 0) return None
    val out = Seq.newBuilder[Rec]
    var i = 0
    while (i < b.length) {
      // version line
      val ve = crlf(b, i)
      if (ve < 0) return None
      val ver = new String(b, i, ve - i, "US-ASCII")
      if (ver != "WARC/1.0" && ver != "WARC/1.1") return None
      i = ve + 2
      // header lines until the empty line
      var wtype: String = null
      var uri: String = null
      var len = -1L
      var done = false
      while (!done) {
        val le = crlf(b, i)
        if (le < 0) return None
        if (le == i) { done = true; i += 2 }
        else {
          val line = new String(b, i, le - i, "US-ASCII")
          val c = line.indexOf(':')
          if (c <= 0) return None
          // Locale.ROOT: under a Turkish default locale 'URI'
          // lowercases to a dotless-i form and never matches
          val name = line.substring(0, c).trim
            .toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(c + 1).trim
          name match {
            case "warc-type" => wtype = value
            case "warc-target-uri" => uri = value
            case "content-length" =>
              // all-digits AND parseable: a 20-digit length is
              // malformed, not a NumberFormatException
              if (!value.forall(_.isDigit) || value.isEmpty ||
                value.length > 18) return None
              len = value.toLong
            case _ => () // other headers carried but unused
          }
          i = le + 2
        }
      }
      if (wtype == null || len < 0) return None
      if (i + len + 4 > b.length) return None // block + separator
      // Scope note: the block is decoded as UTF-8 TEXT — lossy for
      // binary blocks (images, gzip transfer bodies), which is fine
      // for the text/html-gated ingest chain this feeds; a binary
      // consumer would carry (offset, len) slices of `b` instead.
      val body = new String(b, i, len.toInt, "UTF-8")
      i += len.toInt
      // the mandatory two-CRLF record separator
      if (!(b(i) == Sep(0) && b(i + 1) == Sep(1) &&
        b(i + 2) == Sep(0) && b(i + 3) == Sep(1))) return None
      i += 4
      out += Rec(wtype, uri, len, body)
    }
    val recs = out.result()
    if (recs.isEmpty) None else Some(recs)
  }

  /** [[parseAuto]] as Catalyst ArrayData of
    * (rec_type, uri, content_length, body) rows for the
    * [[graft.functions.WarcRecords]] codegen path — transparently
    * handles both `.warc` and member-per-record `.warc.gz`; null =
    * malformed payload. */
  def parseArray(b: Array[Byte]): ArrayData = parseAuto(b) match {
    case Some(recs) =>
      new GenericArrayData(recs.map(r => InternalRow(
        UTF8String.fromString(r.warcType),
        if (r.uri == null) null else UTF8String.fromString(r.uri),
        r.len,
        UTF8String.fromString(r.body))).toArray[Any])
    case None => null
  }
}
