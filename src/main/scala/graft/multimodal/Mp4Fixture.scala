package graft.multimodal

/** Builder of complete nested-box MP4 (ISO 14496-12) streams whose
  * `stbl` carries real SAMPLE TABLES — the `mm_mp4_samples`
  * fixture: `moov { mvhd, trak { mdia { minf { stbl { stsz, stco
  * }}}}}` behind an `ftyp`, every parameter closed-form in
  * `doc_id` so the oracle replays the sample census without
  * touching the bytes:
  *
  *  - n_samples = doc_id % 50 + 1
  *  - uniform   = doc_id % 3 == 0 (stsz's constant-size form:
  *    sample_size != 0, NO per-sample table — the layout a naive
  *    parser mis-reads as an empty table)
  *  - uniform size = 100 + doc_id % 900
  *  - per-sample size(k) = 100 + (doc_id·3 + 7k) % 900
  *  - n_chunks  = doc_id % 8 + 1 (stco entry count)
  */
object Mp4Fixture {

  private def u32(v: Long): Array[Byte] = Array(
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.foldLeft(Array.empty[Byte])(_ ++ _)
    u32(body.length + 8L) ++
      typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ body
  }

  def nsOf(docId: Long): Int = (docId % 50).toInt + 1
  def uniformOf(docId: Long): Boolean = docId % 3 == 0
  def uniSizeOf(docId: Long): Long = 100 + docId % 900
  def sizeOf(docId: Long, k: Int): Long = 100 + (docId * 3 + 7L * k) % 900
  def chunksOf(docId: Long): Int = (docId % 8).toInt + 1

  def stream(docId: Long): Array[Byte] = {
    val ns = nsOf(docId)
    val stszBody =
      if (uniformOf(docId)) u32(0) ++ u32(uniSizeOf(docId)) ++ u32(ns)
      else u32(0) ++ u32(0) ++ u32(ns) ++
        (0 until ns).foldLeft(Array.empty[Byte])(
          (a, k) => a ++ u32(sizeOf(docId, k)))
    val nc = chunksOf(docId)
    val stcoBody = u32(0) ++ u32(nc) ++
      (0 until nc).foldLeft(Array.empty[Byte])(
        (a, c) => a ++ u32(1000L * c + 16))
    // minimal v0 mvhd (100-byte payload, timescale/duration at the
    // §8.2.2 offsets) so the stream also satisfies the metadata walk
    val mvhd = new Array[Byte](100)
    System.arraycopy(u32(1000), 0, mvhd, 12, 4)
    System.arraycopy(u32(60000 + docId % 1000), 0, mvhd, 16, 4)
    box("ftyp",
      "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      u32(0),
      "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII)) ++
      box("moov",
        box("mvhd", mvhd),
        box("trak",
          box("mdia",
            box("minf",
              box("stbl",
                box("stsz", stszBody),
                box("stco", stcoBody))))))
  }
}
