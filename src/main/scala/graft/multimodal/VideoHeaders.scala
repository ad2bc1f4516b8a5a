package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow

/** Real MP4/ISO-BMFF container metadata — pure byte arithmetic, no
  * codec library, the video sibling of [[ImageHeaders]] (BE) and
  * [[AudioHeaders]] (LE). This closes the last multimodal stub for
  * container METADATA; sample/pixel decode stays behind the
  * [[Multimodal.StubCodec]] seam.
  *
  * ISO 14496-12 box walk:
  *  - boxes are [size u32be][type 4B]; size == 1 switches to a u64
  *    `largesize` at +8; size == 0 means "to end of enclosing box" —
  *    all three handled, and every box must fit inside its parent or
  *    the parse is rejected (no unsigned wraparound walks).
  *  - `moov` holds the movie header `mvhd` (version 0: u32 timescale
  *    at payload+12, u32 duration at +16; version 1: u32 timescale at
  *    +20, u64 duration at +24 — the creation/modification times
  *    widen to u64) and one `trak` per track.
  *  - `trak`/`tkhd` ends in width/height as 16.16 fixed-point u32s
  *    (payload offsets 76/80 for v0, 88/92 for v1). Audio tracks
  *    carry 0×0 — the first trak with nonzero dimensions wins.
  *
  * Anything truncated, inconsistent, or not starting with a
  * plausible top-level box parses to None. */
object VideoHeaders {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def u64(b: Array[Byte], i: Int): Long =
    (u32(b, i) << 32) | u32(b, i + 4)

  private def boxType(b: Array[Byte], i: Int): String =
    new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** All boxes of `typ` directly inside [start, end): payload
    * (start, end) pairs, in order. Malformed sizing aborts the walk
    * (returns what was found before the corruption). */
  private def boxes(b: Array[Byte], start: Int, end: Int,
      typ: String): List[(Int, Int)] = {
    var off = start
    val found = List.newBuilder[(Int, Int)]
    while (off + 8 <= end) {
      val size = u32(b, off)
      val (hdr, boxEnd) =
        if (size == 0L) (8, end.toLong)
        else if (size == 1L) {
          if (off + 16 > end) return found.result()
          (16, off + u64(b, off + 8))
        } else (8, off + size)
      if (boxEnd < off + hdr || boxEnd > end) return found.result()
      if (boxType(b, off) == typ)
        found += ((off + hdr, boxEnd.toInt))
      off = boxEnd.toInt
    }
    found.result()
  }

  /** (width, height, timescale, duration) of an MP4 payload, else
    * None. Duration is in `timescale` units (ms = d·1000/timescale). */
  def parse(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (b == null || b.length < 16) return None
    for {
      (ms, me) <- boxes(b, 0, b.length, "moov").headOption
      (ts, dur) <- mvhd(b, ms, me)
      (w, h) <- firstVideoTrack(b, ms, me)
    } yield (w, h, ts, dur)
  }

  private def mvhd(b: Array[Byte], ms: Int, me: Int)
      : Option[(Int, Long)] =
    boxes(b, ms, me, "mvhd").headOption.flatMap { case (ps, pe) =>
      if (pe - ps < 4) None
      else u8(b, ps) match {
        case 0 if pe - ps >= 20 =>
          val ts = u32(b, ps + 12); val d = u32(b, ps + 16)
          if (ts > 0 && ts <= Int.MaxValue) Some((ts.toInt, d)) else None
        case 1 if pe - ps >= 32 =>
          val ts = u32(b, ps + 20); val d = u64(b, ps + 24)
          if (ts > 0 && ts <= Int.MaxValue && d >= 0)
            Some((ts.toInt, d))
          else None
        case _ => None
      }
    }

  private def firstVideoTrack(b: Array[Byte], ms: Int, me: Int)
      : Option[(Int, Int)] =
    boxes(b, ms, me, "trak").iterator.flatMap { case (ts, te) =>
      boxes(b, ts, te, "tkhd").headOption.flatMap { case (ps, pe) =>
        if (pe - ps < 4) None
        else {
          val wOff = u8(b, ps) match {
            case 0 => 76
            case 1 => 88
            case _ => -1
          }
          if (wOff < 0 || pe - ps < wOff + 8) None
          else {
            // 16.16 fixed point; video tracks carry integral dims
            val w = u32(b, ps + wOff) >> 16
            val h = u32(b, ps + wOff + 4) >> 16
            if (w > 0 && h > 0) Some((w.toInt, h.toInt)) else None
          }
        }
      }
    }.nextOption()

  /** The same parse as an InternalRow
    * (width:int, height:int, timescale:int, duration:long) or null —
    * shared by [[graft.functions.VideoMeta]]'s interpreted and
    * codegen paths. */
  def parseRow(b: Array[Byte]): InternalRow =
    parse(b) match {
      case Some((w, h, ts, d)) => InternalRow(w, h, ts, d)
      case None => null
    }
}
