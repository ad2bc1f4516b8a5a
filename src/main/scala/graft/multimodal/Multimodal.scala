package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: media as opaque
  * `binary` payloads plus typed metadata, with decode / feature
  * extraction / frame sampling as partition-local transforms.
  *
  * ==== STUB NOTICE (narrowed to LOSSY-codec payloads only) ====
  * CONTAINER METADATA DECODE IS REAL for all three modalities:
  * [[StubCodec.decode]] first runs [[ImageHeaders]] (PNG IHDR / JPEG
  * SOF marker walk), [[AudioHeaders]] (PCM WAV RIFF chunk walk), and
  * [[VideoHeaders]] (MP4/ISO-BMFF box walk — mvhd
  * timescale/duration, tkhd 16.16 dimensions) — pure byte
  * arithmetic, no codec library — and returns genuine metadata for
  * any real PNG/JPEG/WAV/MP4 payload. PAYLOAD DECODE IS ALSO REAL
  * for both CODEC-FREE formats: 16-bit PCM WAV
  * ([[AudioHeaders.levels]] behind [[graft.functions.AudioLevels]] —
  * raw s16le samples; per-file energy/peak/clip metering,
  * `mm_audio_levels`) and 24-bit BI_RGB BMP
  * ([[ImageHeaders.bmpLevels]] behind
  * [[graft.functions.ImageLevels]] — raw padded BGR rows; per-file
  * channel sums, `mm_image_levels`). PNG PIXEL DECODE IS REAL TOO
  * ([[ImageHeaders.pngLevels]] behind
  * [[graft.functions.PngLevels]], `mm_png_levels`): IDAT is
  * zlib/DEFLATE and `java.util.zip.Inflater` is public JDK, so
  * decompression + §9 scanline un-filtering needs no codec library
  * — ALL FIVE 8-bit color
  * types (gray, truecolor, palette + PLTE, gray+alpha, RGBA) plus
  * bit-depth 16 and Adam7 interlace,
  * multi-IDAT, all five filter types (ImageIO-round-trip
  * spec-proven per color type). BASELINE JPEG luma is REAL too
  * ([[JpegDecode]] behind [[graft.functions.JpegLuma]],
  * `mm_jpeg_luma`): canonical Huffman + dequant + IDCT on the
  * public JDK, ImageIO-tolerance spec-proven. MP3 FRAME METADATA IS
  * REAL ([[Mp3Headers]] behind [[graft.functions.Mp3Meta]],
  * `mm_mp3_meta`): ID3v2 syncsafe skip + the MPEG-1 Layer III
  * derived-frame-length walk — frame count, sample rate, channel
  * mode, VBR bitrate sum, duration — plus the Xing/Info VBR block
  * ([[graft.functions.Mp3Vbr]], `mm_mp3_vbr`), the §2.4.1.7 side
  * information + §2.4.2.7 main-data scalefactor walk
  * ([[Mp3Headers.sideInfo]] behind [[graft.functions.Mp3SideInfo]],
  * `mm_mp3_sideinfo`), and the first real ENTROPY slice of the
  * Layer III sample path — the count1 region's table-1 quadruple
  * codes + sign bits ([[Mp3Headers.count1Info]] behind
  * [[graft.functions.Mp3Count1]], `mm_mp3_count1`; the MP3 analog
  * of H.264's I_PCM rung — big_values = 0 streams are fully
  * conformant). COMPANDED (lossy)
  * AUDIO DECODE IS REAL FOR BOTH G.711 HALVES
  * ([[AudioHeaders.ulawExpand]]/[[AudioHeaders.alawExpand]] behind
  * [[graft.functions.AudioUlawLevels]]/[[graft.functions.AudioAlawLevels]],
  * `mm_audio_ulaw`/`mm_audio_alaw`): the segment/mantissa expansion
  * verified against the JDK's own codecs on all 256 codes.
  * H.264 BITSTREAM METADATA IS
  * REAL ([[H264Headers]] behind [[graft.functions.H264Sps]],
  * `mm_h264_sps`): Annex-B NAL walk, RBSP emulation-prevention
  * unescape, and the full §7.3.2.1 Exp-Golomb SPS field chain to
  * the derived cropped dimensions + profile/level. H.264 SAMPLE
  * DECODE IS REAL FOR PCM-CODED PICTURES ([[H264Pcm]] behind
  * [[graft.functions.H264PcmMbs]], `mm_h264_pcm`): slice-header
  * Exp-Golomb walk + I_PCM macroblock raw-sample read — the
  * standard's lossless escape hatch, a fully conformant stream
  * class. FLAC SAMPLE DECODE IS REAL FOR ALL LOSSLESS SUBFRAME
  * CLASSES — CONSTANT, VERBATIM, FIXED AND LPC
  * ([[AudioHeaders.parseFlacPcm]] behind
  * [[graft.functions.FlacPcmLevels]], `mm_flac_pcm` /
  * `mm_flac_fixed` / `mm_flac_lpc`): the frame walk, the uncoded
  * subframe bit reads, and genuine COMPRESSED audio — order-0..4
  * fixed predictors AND §9.2.4 quantized-LPC predictors (any order
  * 1–32: coefficient precision/shift header walk, signed
  * coefficient reads, the all-integer prediction recurrence) over
  * Rice/Rice2-coded residuals (unary + binary + zigzag, escaped
  * partitions, multi-partition layouts), decodable without a codec
  * library because Rice coding is bit arithmetic, not table-driven
  * entropy coding — plus all three §9.1.3 STEREO DECORRELATION
  * modes (left/side, side/right, mid/side with the parity-restored
  * LSB; the 17-bit side channel — what real stereo FLAC actually
  * ships; `mm_flac_stereo`) and §9.2.1 WASTED BITS (reduced-width
  * coding restored by a post-reconstruction shift;
  * `mm_flac_wasted`). TABLE-DRIVEN ENTROPY DECODE IS REAL wherever
  * the tables are stream-embedded or spec-algorithmic: the engine
  * ships a from-scratch RFC 1951/1950/1952 DEFLATE decoder
  * (canonical Huffman construction, the dynamic code-length
  * meta-code, LZ77 back-copies — [[graft.llm.Inflate]], pinned
  * against the JDK codec and hand-assembled bitstreams,
  * `llm_inflate`) and the full Vorbis §3.2 codebook layer — Vorbis
  * ships its Huffman codebooks IN the setup header and defines
  * canonical assignment algorithmically, so the decode builds trees
  * from the stream with no memorized constants
  * ([[Vorbis]], `mm_vorbis_books`), including §3.2.2 VQ lookup
  * tables (`mm_vorbis_vq`) and the floor1 layer above them: config
  * walk, posts decode through the parsed books, §7.2.4's
  * all-integer amplitude synthesis to the final_Y vector
  * (`mm_vorbis_floor`), and §7.2.3 step 2's synthesized integer
  * curve — render_line rasterization over the blocksize/2 bins
  * (`mm_vorbis_floor_curve`), plus the MP3 BIG-VALUES walk under
  * the transcribed Table-B.7 subset {0,1,2,3,5} — the transcription
  * carries a Kraft/prefix construction self-check and hand-built
  * bitstream pins in place of the codec pin this container cannot
  * provide; selects 4–31 stay fail-closed
  * ([[Mp3Headers.bigvaluesInfo]], `mm_mp3_bigvalues`), and the
  * H.264 CAVLC residual walk for EVERY block class the I_16x16
  * picture family codes — chroma-DC blocks under the fixed nC = −1
  * table (`mm_h264_cavlc`), luma-DC blocks through the FULL
  * Table 9-5 0 ≤ nC < 2 coeff_token column with the complete
  * §9.2.2.1 escape arithmetic, Tables 9-7/9-8 total_zeros and the
  * full run_before table (`mm_h264_cavlc_luma`, sequenced with the
  * chroma class in `mm_h264_cavlc_full`), SIXTEEN Intra16x16ACLevel
  * blocks per macroblock with the REAL §9.2.1 neighbour-nC
  * machinery routing each block's coeff_token column — the 2 ≤ nC
  * < 4 column and the algorithmic nC ≥ 8 six-bit FLC joined the
  * transcribed set (`mm_h264_cavlc_ac`) — and the per-component
  * 2×2-grid ChromaACLevel class, closing the COMPLETE §7.3.5.3.3
  * residual sequence in one bitstream (`mm_h264_cavlc_mb`) —
  * under the same self-checked transcription discipline
  * ([[H264Cavlc]]). What
  * remains a clearly-marked DETERMINISTIC FAKE is decode whose
  * larger Huffman trees are memorized SPEC CONSTANTS with no
  * in-container pin (MP3 big-values tables 6–31 — above all the
  * linbits/ESC family 16–31 real encoders select, whose 256-entry
  * trees exceed what the Kraft gate can witness from recall alone;
  * a round-17 transcription attempt FAILED its own Kraft check and
  * was discarded rather than fudged — both count1 tables decode
  * (`mm_mp3_count1`, `mm_mp3_count1a`) — H.264's 4 ≤ nC < 8
  * Table 9-5 column, likewise discarded at its own consistency
  * check, Intra_4x4 prediction modes, CABAC) and the
  * float-domain synthesis past the entropy layer (MP3 IMDCT,
  * Vorbis's dB floor / MDCT and FRACTIONAL min/delta books above
  * the residue chain — which is now integer-exact through the
  * §3.2.2 value mapping itself, [[Vorbis.decodeResidueScale]],
  * `mm_vorbis_residue_scale`, for books whose packed-float
  * min/delta are exact integers — and H.264 reconstruction):
  * unparseable payloads get plausible dimensions derived from the
  * bytes. The
  * Spark-side plumbing — schema, binary columns, batch-shaped
  * `mapPartitions`, partitioning notes — is real, and swapping the
  * stub for a JNI/FFmpeg/ImageIO decode changes nothing structurally:
  * the codec is a `Array[Byte] => MediaMeta` function applied once
  * per row inside a partition iterator (so a real implementation can
  * amortize codec init per partition, the same pattern as a Pandas
  * UDF batch).
  *
  * Scale notes: media rows are large (KB–MB); keep
  * `spark.sql.files.maxPartitionBytes` at the default 128 MB so scan
  * partitions stay executor-sized, and never `collect()` payloads.
  * Feature extraction output (small fixed-width vectors/metadata)
  * should be written to a separate column family/table from the raw
  * bytes so downstream queries prune the heavy column away.
  */
object Multimodal {

  /** Decoded metadata for one media payload. */
  case class MediaMeta(kind: String, width: Int, height: Int,
      nFrames: Int, sampleRateHz: Int, ok: Boolean)

  /** A media record: opaque payload + envelope metadata. */
  case class MediaRecord(mediaId: Long, kind: String, payload: Array[Byte])

  object StubCodec {
    /** DETERMINISTIC STUB — stands in for a real image/audio/video
      * decoder (none available in this container). Dimensions are
      * derived from payload length + first bytes so tests are exact
      * and reproducible. */
    def decode(kind: String, payload: Array[Byte]): MediaMeta = {
      val n = payload.length
      val b0 = if (n > 0) payload(0) & 0xff else 0
      kind match {
        case "image" =>
          // REAL path first: PNG/JPEG header dims from the bytes
          ImageHeaders.parse(payload) match {
            case Some((_, w, h)) => MediaMeta(kind, w, h, 1, 0, ok = true)
            case None =>
              MediaMeta(kind, n % 640 + 1, (n * 31) % 480 + 1, 1, 0, n > 0)
          }
        case "video" =>
          // REAL paths first: MP4 box-walk dims + duration-seconds
          // as the frame proxy (frame COUNT needs the stsz sample
          // table, which metadata-only parsing deliberately skips),
          // then the Annex-B elementary-stream SPS walk
          VideoHeaders.parse(payload) match {
            case Some((w, h, ts, dur)) =>
              MediaMeta(kind, w, h,
                math.max(1L, dur / ts).min(Int.MaxValue).toInt, 0,
                ok = true)
            case None => H264Headers.parse(payload) match {
              case Some((_, _, w, h, _)) =>
                MediaMeta(kind, w, h, 1, 0, ok = true)
              case None =>
                MediaMeta(kind, n % 640 + 1, (n * 31) % 480 + 1,
                  n % 24 + 1, 0, n > 0)
            }
          }
        case "audio" =>
          // REAL paths first: PCM WAV RIFF walk, then the MP3
          // frame walk (frame count stands in the nFrames slot)
          AudioHeaders.parse(payload) match {
            case Some((_, rate, _, _)) =>
              MediaMeta(kind, 0, 0, 0, rate, ok = true)
            case None => Mp3Headers.parse(payload) match {
              case Some((nf, rate, _, _, _, _)) =>
                MediaMeta(kind, 0, 0, nf, rate, ok = true)
              case None =>
                MediaMeta(kind, 0, 0, 0, 8000 + (b0 % 5) * 8000, n > 0)
            }
          }
        case _ => MediaMeta(kind, 0, 0, 0, 0, ok = false)
      }
    }
  }

  /** Decode payloads into a metadata struct column. Partition-local:
    * one codec "session" per partition, rows streamed through it. */
  def decodeMeta(ds: Dataset[MediaRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // real codecs would initialize here, once per partition
      it.map { r =>
        val m = StubCodec.decode(r.kind, r.payload)
        (r.mediaId, r.kind, r.payload.length.toLong, m.width, m.height,
          m.nFrames, m.sampleRateHz, m.ok)
      }
    }.toDF("media_id", "kind", "n_bytes", "width", "height",
      "n_frames", "sample_rate_hz", "decode_ok")
  }

  /** Frame sampling: emit every `stride`-th frame index per video —
    * one-to-many, partition-local, no shuffle. A real implementation
    * decodes only the sampled frames (keyframe seek). */
  def sampleFrames(meta: DataFrame, stride: Int): DataFrame =
    meta.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))

  /** Resize planning: target dimensions fitting (maxW, maxH) with
    * aspect ratio preserved, never upscaling — pure integer column
    * math on the metadata (map-side, no shuffle, no decode). The
    * actual pixel resample belongs in the partition-local codec pass
    * (same seam as [[decodeMeta]]); planning dims first lets a real
    * pipeline group work by output size and skip no-op resizes. */
  def planResize(meta: DataFrame, maxW: Int, maxH: Int): DataFrame =
    // scale = min(maxW/w, maxH/h, 1) without floats: the binding
    // dimension is decided by cross-multiplied ratio comparison
    meta.filter(col("width") > 0 && col("height") > 0)
      .withColumn("out_w",
        when(col("width") <= maxW && col("height") <= maxH, col("width"))
          .when(col("width").cast("bigint") * maxH <=
            col("height").cast("bigint") * maxW,
            // greatest(1, _): extreme aspect ratios would otherwise
            // truncate to an invalid 0-pixel dimension
            greatest(lit(1),
              (col("width").cast("bigint") * maxH / col("height"))
                .cast("int")))
          .otherwise(lit(maxW)))
      .withColumn("out_h",
        when(col("width") <= maxW && col("height") <= maxH, col("height"))
          .when(col("width").cast("bigint") * maxH <=
            col("height").cast("bigint") * maxW, lit(maxH))
          .otherwise(greatest(lit(1),
            (col("height").cast("bigint") * maxW / col("width"))
              .cast("int"))))
      .withColumn("resize_needed",
        col("out_w") =!= col("width") || col("out_h") =!= col("height"))

  /** Feature vectors for the similarity operators in
    * [[graft.llm.LlmQueries]] — fixed-width `ArrayType(FloatType)`.
    *
    * REAL for decodable images: payloads [[ImageGrid.lumaGrid]] can
    * decode (PNG types 0/2, depth 8) get the 4×4 cell-mean luma
    * vector of [[ImageGrid.cellGrid]] — the same pixel-derived
    * features the oracle-checked `mm_image_features` /
    * `mm_feature_knn` queries compute through
    * [[graft.functions.LumaCells]], exact integers cast to float
    * (cell means ≤ 765, exactly representable). The 16-dim grid is
    * where a LEARNED embedding model would slot in — same seam, same
    * shape, same downstream consumers.
    *
    * STUB for everything else (lossy-codec payloads this container
    * cannot decode): 4 scaled byte moments, deterministic and
    * clearly fake, padded to the same 16-dim width so the two
    * populations stay one column. */
  def extractFeatures(ds: Dataset[MediaRecord]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    val g = ImageGrid.FeatureGrid
    ds.mapPartitions { it =>
      it.map { r =>
        val real = ImageGrid.lumaGrid(r.payload).flatMap {
          case (w, h, luma) => ImageGrid.cellGrid(w, h, luma)
        }.map { case (sum, cnt) =>
          Array.tabulate(g * g)(k => (sum(k) / cnt(k)).toFloat)
        }
        val features = real.getOrElse {
          val n = math.max(r.payload.length, 1)
          var s1 = 0L; var s2 = 0L
          r.payload.foreach { b =>
            val v = (b & 0xff).toLong; s1 += v; s2 += v * v
          }
          val mean = s1.toFloat / n
          Array(n.toFloat, mean, s2.toFloat / n - mean * mean,
            (r.payload.headOption.map(_ & 0xff).getOrElse(0)).toFloat) ++
            Array.fill(g * g - 4)(0f)
        }
        (r.mediaId, features, real.isDefined)
      }
    }.toDF("media_id", "features", "pixel_derived")
  }
}
