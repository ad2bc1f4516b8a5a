package graft.multimodal

/** Engine-portable SQL fragments that BUILD real PNG/JPEG byte
  * streams as uppercase hex text (one `unhex`/`from_hex` from a
  * genuine binary payload). Used by the `mm_image_dims` fixture: the
  * Spark query materializes the blob and parses it with the native
  * [[graft.functions.ImageDims]] expression; the DuckDB oracle
  * round-trips the same hex through a real BLOB (`hex(from_hex(..))`)
  * and extracts the header fields independently by offset arithmetic.
  * Every fragment is plain ANSI-ish text parameterized only by the
  * integer-division spelling (`div` on Spark, `//` on DuckDB).
  */
object ImageHex {

  /** n-digit uppercase big-endian hex of non-negative integer SQL
    * expression `e`. */
  def hexN(e: String, n: Int, intdiv: String): String =
    (1 to n).map { j =>
      val p = 1L << (4 * (n - j))
      s"substring('0123456789ABCDEF', CAST((($e) $intdiv $p) % 16 AS INT) + 1, 1)"
    }.mkString("concat(", ", ", ")")

  /** Integer from the n uppercase hex digits at 1-based `pos` of hex
    * string expression `hs` (`posFn`: Spark "instr" / DuckDB
    * "strpos"). */
  def unhexN(hs: String, pos: Int, n: Int, posFn: String): String =
    (0 until n).map { j =>
      val p = 1L << (4 * (n - 1 - j))
      s"CAST($posFn('0123456789ABCDEF', substring($hs, ${pos + j}, 1)) - 1 AS BIGINT) * $p"
    }.mkString("(", " + ", ")")

  /** A minimal-but-valid PNG prefix: signature + IHDR chunk header
    * with width/height and the 8-bit RGBA IHDR tail. (No CRC/IDAT —
    * the header parser contract needs none.) Byte offsets: width@16,
    * height@20 → hex positions 33/41. */
  def pngHex(w: String, h: String, intdiv: String): String =
    s"concat('89504E470D0A1A0A0000000D49484452', " +
      s"${hexN(w, 8, intdiv)}, ${hexN(h, 8, intdiv)}, '0806000000')"

  /** A minimal-but-valid JPEG: SOI + a full 16-byte JFIF APP0 segment
    * (so the parser's marker walk actually has to skip something) +
    * SOF0 with precision 8, 3 components + EOI. Byte offsets:
    * height@25, width@27 → hex positions 51/55. */
  def jpegHex(w: String, h: String, intdiv: String): String =
    s"concat('FFD8FFE000104A46494600010100004800480000FFC0001108', " +
      s"${hexN(h, 4, intdiv)}, ${hexN(w, 4, intdiv)}, " +
      s"'03011100021101031101FFD9')"

  /** Hex positions of the dimension fields built above. */
  val PngWidthPos = 33
  val PngHeightPos = 41
  val JpegHeightPos = 51
  val JpegWidthPos = 55
}
