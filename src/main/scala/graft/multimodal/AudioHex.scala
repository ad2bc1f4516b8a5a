package graft.multimodal

/** Engine-portable SQL fragments that BUILD real PCM WAV headers as
  * uppercase hex text — the little-endian sibling of [[ImageHex]],
  * used by the `mm_audio_meta` fixture: the Spark query materializes
  * the blob and parses it with the native
  * [[graft.functions.AudioMeta]] expression; the DuckDB oracle
  * round-trips the same hex through a real BLOB and extracts the
  * fields independently by offset arithmetic.
  *
  * Layout built by [[wavHex]] (64 bytes, data payload deliberately
  * absent — declared-size semantics, see
  * [[AudioHeaders]]):
  *
  * {{{
  *  0 "RIFF"  4 riff_size(u32le)  8 "WAVE"
  * 12 "LIST" 16 size=12          20 "INFOIARTGFT0"   (walk must skip)
  * 32 "fmt " 36 size=16          40 fmt payload:
  *      40 format=1  42 channels  44 sample_rate  48 byte_rate
  *      52 block_align  54 bits=16
  * 56 "data" 60 data_size(u32le)
  * }}}
  */
object AudioHex {

  /** n-BYTE little-endian hex of non-negative integer SQL expression
    * `e` (each byte still prints its two digits high-nibble-first —
    * LE is byte order, not digit order). */
  def hexLE(e: String, nBytes: Int, intdiv: String): String =
    (0 until nBytes).map { i =>
      val p = 1L << (8 * i)
      ImageHex.hexN(s"(($e) $intdiv $p) % 256", 2, intdiv)
    }.mkString("concat(", ", ", ")")

  /** Integer from the n little-endian BYTES at 1-based hex position
    * `pos` of hex string expression `hs`. */
  def unhexLE(hs: String, pos: Int, nBytes: Int, posFn: String): String =
    (0 until nBytes).map { i =>
      val p = 1L << (8 * i)
      s"${ImageHex.unhexN(hs, pos + 2 * i, 2, posFn)} * $p"
    }.mkString("(", " + ", ")")

  /** A minimal-but-valid PCM WAV header (16-bit samples). `rate`,
    * `ch`, `dataBytes` are integer SQL expressions; riff_size is the
    * declared content size (4 + 20 + 24 + 8 + dataBytes). */
  def wavHex(rate: String, ch: String, dataBytes: String,
      intdiv: String): String =
    s"concat('52494646', ${hexLE(s"56 + ($dataBytes)", 4, intdiv)}, " +
      "'57415645', " +
      "'4C495354', '0C000000', '494E464F4941525447465430', " +
      "'666D7420', '10000000', '0100', " +
      s"${hexLE(ch, 2, intdiv)}, ${hexLE(rate, 4, intdiv)}, " +
      s"${hexLE(s"($rate) * ($ch) * 2", 4, intdiv)}, " +
      s"${hexLE(s"($ch) * 2", 2, intdiv)}, '1000', " +
      s"'64617461', ${hexLE(dataBytes, 4, intdiv)})"

  /** 1-based hex positions of the extractable fields built above. */
  val ChannelsPos = 42 * 2 + 1   // 85
  val SampleRatePos = 44 * 2 + 1 // 89
  val DataSizePos = 60 * 2 + 1   // 121
}
