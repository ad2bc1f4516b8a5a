package graft.multimodal

/** Engine-portable SQL fragments that BUILD a real minimal MP4
  * (ISO-BMFF) file as uppercase hex text — the big-endian video
  * sibling of [[ImageHex]]/[[AudioHex]], used by the `mm_video_meta`
  * fixture: the Spark query materializes the blob and parses it with
  * the native [[graft.functions.VideoMeta]] expression; the DuckDB
  * oracle round-trips the same hex through a real BLOB and extracts
  * the fields independently by offset arithmetic.
  *
  * Layout built by [[mp4Hex]] (244 bytes):
  *
  * {{{
  *   0 ftyp(16): size 'ftyp' 'isom' minor=0
  *  16 moov(228): size 'moov'
  *  24   free(12): size 'free' + 4 junk bytes      (walk must skip)
  *  36   mvhd(108) v0: ver/flags ctime mtime
  *         timescale@56  duration@60  rate volume …matrix… next_track
  * 144   trak(100): size 'trak'
  * 152     tkhd(92) v0: ver/flags ctime mtime track_id res duration
  *           …layer/volume/matrix…  width@236(16.16)  height@240(16.16)
  * }}}
  */
object VideoHex {

  import ImageHex.hexN

  private val unityMatrix =
    "'00010000000000000000000000000000000100000000000000000000" +
      "0000000040000000'"

  /** A minimal-but-valid MP4: `w`/`h`/`ts`/`dur` are integer SQL
    * expressions (dimensions integral pixels — stored 16.16). */
  def mp4Hex(w: String, h: String, ts: String, dur: String,
      intdiv: String): String =
    "concat(" +
      // ftyp
      "'0000001066747970 69736F6D 00000000', ".replace(" ", "") +
      // moov size 228 = 0xE4; free box with 4 junk payload bytes
      "'000000E46D6F6F76', '0000000C66726565 DEADBEEF', ".replace(" ", "") +
      // mvhd v0: size 108 = 0x6C
      "'0000006C6D766864', '00000000', '00000000', '00000000', " +
      s"${hexN(ts, 8, intdiv)}, ${hexN(dur, 8, intdiv)}, " +
      "'00010000', '0100', '0000', '0000000000000000', " +
      s"$unityMatrix, " +
      "'000000000000000000000000000000000000000000000000', '00000002', " +
      // trak size 100 = 0x64, tkhd v0 size 92 = 0x5C, flags 7
      "'000000647472616B', '0000005C746B6864', '00000007', " +
      "'00000000', '00000000', '00000001', '00000000', " +
      s"${hexN(dur, 8, intdiv)}, " +
      "'0000000000000000', '0000', '0000', '0000', '0000', " +
      s"$unityMatrix, " +
      s"${hexN(s"($w) * 65536", 8, intdiv)}, " +
      s"${hexN(s"($h) * 65536", 8, intdiv)})"

  /** 1-based hex positions of the extractable fields built above
    * (byte offset B → 2·B + 1). */
  val TimescalePos = 56 * 2 + 1 // 113
  val DurationPos = 60 * 2 + 1  // 121
  val WidthPos = 236 * 2 + 1    // 473
  val HeightPos = 240 * 2 + 1   // 481
}
