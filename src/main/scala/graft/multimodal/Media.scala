package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A decoded media asset (what a real codec would return). */
case class DecodedMedia(width: Int, height: Int, nFrames: Int, pixels: Array[Byte])

/** Header-level video-container metadata ([[RealCodec.probeMeta]]):
  * dimensions, duration, and the codec identifier (an MP4 sample-entry
  * fourcc like `avc1`, or a Matroska CodecID like `V_VP9`). Fields the
  * header genuinely lacks report −1 / null. */
case class ProbedMeta(format: String, width: Int, height: Int,
  durationMs: Long, codec: String)

/** Codec SPI for opaque media blobs. [[RealCodec]] decodes every still-image
  * format this JVM can (hand-rolled verified decoders for PPM/BMP/PNG, the
  * JDK's own `javax.imageio` for JPEG/GIF/TIFF and the exotic PNG/BMP
  * variants) and fails loudly on the rest (video/audio containers);
  * [[FakeCodec]] is the deterministic stand-in whose arithmetic the m-plane
  * ORACLES replay, keeping the Spark-side plumbing (schema, partitioning,
  * batch shape) hash-checked on every corpus row regardless of format.
  */
trait MediaCodec extends Serializable {
  def decode(blob: Array[Byte]): DecodedMedia
}

/** Image decoder with two tiers, both dependency-free on this JVM:
  *
  *  - **Hand-rolled, fully verified** (the default for the common cases):
  *    binary PPM (`P6`), uncompressed 24-bit BMP, and non-interlaced 8-bit
  *    PNG (gray / gray+alpha / RGB / RGBA — zlib via `java.util.zip
  *    .Inflater`, the five scanline filters undone here). These paths check
  *    every header field, CRC, and byte count themselves, and are
  *    property-tested bit-for-bit against an independent encoder AND the
  *    JDK tier below.
  *  - **JDK `javax.imageio`** (part of `java.desktop`, present in any stock
  *    JDK, headless-safe): JPEG, GIF (frame count reported in `nFrames`),
  *    TIFF, and the PNG/BMP variants the hand-rolled tier doesn't cover
  *    (palette / 16-bit / Adam7-interlaced PNG; palette / RLE / non-24-bit
  *    BMP). Routing is by verified header fields, never by trial-decode, so
  *    corruption can't silently switch tiers.
  *
  * Audio: RIFF/WAVE integer PCM (8/16-bit) decodes hand-rolled too — see
  * [[decodeWav]] for the audio mapping of [[DecodedMedia]]'s fields — and
  * is cross-checked against `javax.sound.sampled` in the spec. Video and
  * compressed-audio containers fail LOUDLY with the sniffed magic — those
  * genuinely need native codec libraries (a deployment binds
  * JavaCV/ffmpeg); a silent fallback would defeat the SPI's point.
  *
  * All formats normalize to ONE layout — top-down row-major RGB bytes —
  * so downstream kernels ([[Media.mediaFeatures]]'s stride means) see
  * format-independent pixels: BMP rows are stored bottom-up in BGR with
  * 4-byte row padding, PNG rows are filtered against their neighbors and
  * may carry alpha/gray channels, all undone here. Alpha is DROPPED
  * (metadata extraction, not compositing) in both tiers: the ImageIO tier
  * reads non-premultiplied ARGB and discards A, matching the hand-rolled
  * RGBA path. Malformed input (truncated data, bad chunk CRCs,
  * non-positive dimensions, PPM maxval > 255) fails loudly too, never a
  * partial decode. */
object RealCodec extends MediaCodec {
  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  // in-memory blobs need no disk-backed ImageInputStream cache; a temp-file
  // cache would add executor-local I/O and a /tmp dependency for zero gain
  javax.imageio.ImageIO.setUseCache(false)

  /** Decompression-bomb budget for the COMPRESSED formats (PNG zlib, the
    * ImageIO tier): a few-KB file can claim dimensions whose decode
    * buffers OOM the executor — an Error, outside the loud-failure
    * contract — so headers past this pixel count fail loudly BEFORE any
    * allocation. 2²⁷ px (e.g. 16384×8192) ⇒ ≤ 384 MB normalized RGB plus
    * the reader's own ~4 B/px working image: bounded. Uncompressed formats
    * (PPM, BMP) need no budget — their files physically carry the raster,
    * so the existing truncation gates bound allocation by blob size. */
  val MaxPixels: Long = 1L << 27

  def decode(blob: Array[Byte]): DecodedMedia = {
    if (blob.length >= 2 && blob(0) == 'P'.toByte && blob(1) == '6'.toByte)
      decodePpm(blob)
    else if (blob.length >= 2 && blob(0) == 'B'.toByte && blob(1) == 'M'.toByte)
      routeBmp(blob)
    else if (blob.length >= 8 && blob.take(8).sameElements(PngSig))
      routePng(blob)
    else if (blob.length >= 3 && (blob(0) & 0xff) == 0xff &&
        (blob(1) & 0xff) == 0xd8 && (blob(2) & 0xff) == 0xff)
      decodeImageIo(blob, "JPEG")
    else if (blob.length >= 6 && blob.take(3).sameElements("GIF".getBytes) &&
        (blob.slice(3, 6).sameElements("87a".getBytes) ||
          blob.slice(3, 6).sameElements("89a".getBytes)))
      decodeImageIo(blob, "GIF")
    else if (blob.length >= 4 &&
        (blob.take(4).sameElements(Array[Byte]('I', 'I', 42, 0)) ||
          blob.take(4).sameElements(Array[Byte]('M', 'M', 0, 42))))
      decodeImageIo(blob, "TIFF")
    else if (blob.length >= 12 && blob.take(4).sameElements("RIFF".getBytes) &&
        blob.slice(8, 12).sameElements("WAVE".getBytes))
      decodeWav(blob)
    else if (blob.length >= 12 && blob.take(4).sameElements("RIFF".getBytes) &&
        blob.slice(8, 12).sameElements("AVI ".getBytes))
      decodeAvi(blob)
    else {
      val magic = blob.take(4).map(b => f"${b & 0xff}%02x").mkString
      throw new UnsupportedOperationException(
        s"RealCodec: unsupported format (magic 0x$magic, ${blob.length} bytes)" +
          " — still images (PPM/BMP/PNG/JPEG/GIF/TIFF), PCM WAV, and" +
          " MJPEG/raw-DIB AVI decode on a bare JVM; bind a full codec" +
          " (JavaCV/ffmpeg) for other video and compressed-audio containers")
    }
  }

  /** RIFF/WAVE PCM audio, hand-rolled (chunk walk over `fmt `/`data`,
    * unknown chunks skipped with the spec's even-byte padding). The audio
    * mapping of [[DecodedMedia]]: `width` = channels, `height` = sample
    * rate, `nFrames` = sample FRAMES (one per channel set), `pixels` =
    * interleaved 16-bit little-endian signed PCM — 8-bit unsigned input
    * widens to 16-bit (`(v−128)·256`) so downstream kernels see one sample
    * layout. Only integer PCM (format code 1, 8/16-bit) decodes; float,
    * ADPCM, extensible, and other compressed codecs fail loudly with the
    * format code — those are the codec-library surface, and a silent
    * partial parse would hand the feature kernel garbage. */
  private def decodeWav(b: Array[Byte]): DecodedMedia = {
    def u16(off: Int): Int = {
      if (off + 2 > b.length) fail(s"WAV: truncated at byte $off")
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    }
    def u32(off: Int): Long = {
      if (off + 4 > b.length) fail(s"WAV: truncated at byte $off")
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    }
    var i = 12
    var channels = -1; var sampleRate = -1L; var bits = -1; var blockAlign = -1
    var dataOff = -1; var dataLen = -1
    while (i + 8 <= b.length && (dataOff < 0 || channels < 0)) {
      val typ = new String(b, i, 4, "US-ASCII")
      val len = u32(i + 4)
      if (len > Int.MaxValue - 8 || i + 8 + len > b.length)
        fail(s"WAV: truncated $typ chunk at byte $i (len $len)")
      typ match {
        case "fmt " =>
          if (len < 16) fail(s"WAV: fmt chunk too short ($len bytes)")
          val code = u16(i + 8)
          if (code != 1) fail(s"WAV: only integer PCM (format code 1)" +
            s" decodes; got format code $code — bind a full codec for" +
            " float/ADPCM/extensible audio")
          channels = u16(i + 10)
          sampleRate = u32(i + 12)
          bits = u16(i + 22)
          blockAlign = u16(i + 20)
          if (channels <= 0) fail(s"WAV: bad channel count $channels")
          if (sampleRate <= 0 || sampleRate > Int.MaxValue)
            fail(s"WAV: bad sample rate $sampleRate")
          if (bits != 8 && bits != 16)
            fail(s"WAV: only 8/16-bit PCM decodes, got $bits-bit")
          if (blockAlign != channels * (bits / 8))
            fail(s"WAV: block align $blockAlign inconsistent with" +
              s" $channels ch × $bits bit")
        case "data" =>
          dataOff = i + 8; dataLen = len.toInt
        case _ => () // LIST/fact/cue and friends carry no samples
      }
      // chunks are word-aligned: an odd payload is followed by a pad byte
      i += 8 + len.toInt + (len.toInt & 1)
    }
    if (channels < 0) fail("WAV: missing fmt chunk")
    if (dataOff < 0) fail("WAV: missing data chunk")
    if (dataLen % blockAlign != 0)
      fail(s"WAV: data length $dataLen not a whole number of" +
        s" $blockAlign-byte frames")
    val nFrames = dataLen / blockAlign
    val out =
      if (bits == 16) java.util.Arrays.copyOfRange(b, dataOff, dataOff + dataLen)
      else {
        // 8-bit WAV is UNSIGNED; center and widen to the 16-bit layout
        val o = new Array[Byte](dataLen * 2)
        var k = 0
        while (k < dataLen) {
          val v = ((b(dataOff + k) & 0xff) - 128) << 8
          o(k * 2) = (v & 0xff).toByte
          o(k * 2 + 1) = ((v >> 8) & 0xff).toByte
          k += 1
        }
        o
      }
    DecodedMedia(channels, sampleRate.toInt, nFrames, out)
  }

  /** RIFF/AVI video, hand-rolled — the ONE video container a bare JVM can
    * genuinely decode pixels from, because its two classic payloads need
    * no native codec: '''MJPEG''' (every frame chunk is a complete JPEG,
    * handed to the same ImageIO tier still images use) and '''raw DIB'''
    * (uncompressed bottom-up BGR24, the BMP raster without the file
    * header). The walk: RIFF(`AVI `) → LIST `hdrl` → `avih` (dimensions,
    * frame count) + the first LIST `strl` whose `strh` is `vids` (stream
    * index → its `##dc`/`##db` chunk ids; `strf` BITMAPINFOHEADER names
    * the compression) → LIST `movi` (frame chunks, `rec ` sub-LISTs
    * flattened, zero-length dropped-frame markers skipped). Output follows
    * the animated-GIF convention: `nFrames` counts the payload frames,
    * `pixels` is the FIRST frame's normalized top-down RGB. Every frame's
    * dimensions must match the header's; any OTHER biCompression (cvid,
    * xvid, h264-in-AVI, …) fails loudly with the fourcc — that is the
    * genuine native-codec surface, and [[probeMeta]] still reports its
    * header metadata. */
  private def decodeAvi(b: Array[Byte]): DecodedMedia = {
    def u16(off: Int): Int = {
      if (off + 2 > b.length) fail(s"AVI: truncated at byte $off")
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    }
    def u32(off: Int): Long = {
      if (off + 4 > b.length) fail(s"AVI: truncated at byte $off")
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    }
    def fourcc(off: Int): String = {
      if (off + 4 > b.length) fail(s"AVI: truncated at byte $off")
      new String(b, off, 4, "US-ASCII")
    }
    var width = -1; var height = -1
    var vidStream = -1; var nStreams = 0
    var handler: String = null; var compression: String = null
    var bitCount = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var inVideoStrl = false
    def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
      var i = start
      while (i + 8 <= end) {
        val id = fourcc(i)
        val sz = u32(i + 4)
        if (sz > Int.MaxValue - 8 || i + 8 + sz > end)
          fail(s"AVI: chunk $id at byte $i overruns its parent ($sz bytes)")
        val body = i + 8
        val szI = sz.toInt
        id match {
          case "LIST" =>
            val listType = fourcc(body)
            listType match {
              case "hdrl" | "odml" => walk(body + 4, body + szI, inMovi = false)
              case "strl" =>
                // stage: commit only if this strl's strh is the FIRST vids
                inVideoStrl = false
                walk(body + 4, body + szI, inMovi = false)
              case "movi" | "rec " => walk(body + 4, body + szI, inMovi = true)
              case _ => ()
            }
          case "avih" =>
            // a lying (short) chunk size would silently parse the next
            // sibling chunk's bytes as header fields — validate against the
            // chunk's own declared size, the parent-overrun convention
            if (szI < 40) fail(s"AVI: avih too short ($szI bytes)")
            width = u32(body + 32).toInt; height = u32(body + 36).toInt
          case "strh" =>
            val fccType = fourcc(body)
            if (fccType == "vids" && vidStream < 0) {
              vidStream = nStreams; inVideoStrl = true
              handler = fourcc(body + 4)
            }
            nStreams += 1
          case "strf" if inVideoStrl && compression == null =>
            if (szI < 20) fail(s"AVI: strf too short ($szI bytes)")
            bitCount = u16(body + 14)
            val comp = u32(body + 16)
            compression =
              if (comp == 0) "DIB" else fourcc(body + 16)
          case _ =>
            if (inMovi && vidStream >= 0 && szI > 0 &&
                (id == f"$vidStream%02ddc" || id == f"$vidStream%02ddb"))
              frames += ((body, szI))
        }
        i = body + szI + (szI & 1) // RIFF chunks pad to even byte
      }
    }
    walk(12, b.length, inMovi = false)
    if (width <= 0 || height <= 0) fail(s"AVI: bad dimensions ${width}x$height")
    if (width.toLong * height > MaxPixels)
      fail(s"AVI: frame too large (${width}x$height)")
    if (vidStream < 0) fail("AVI: no video (vids) stream")
    if (frames.isEmpty) fail("AVI: no video frame chunks in movi")
    val isMjpeg = compression == "MJPG" || compression == "mjpg" ||
      (compression == null && (handler == "MJPG" || handler == "mjpg"))
    val (off0, len0) = frames.head
    val first =
      if (isMjpeg) {
        val d = decodeImageIo(
          java.util.Arrays.copyOfRange(b, off0, off0 + len0), "AVI/MJPEG")
        if (d.width != width || d.height != height)
          fail(s"AVI: frame dimensions ${d.width}x${d.height} disagree with" +
            s" the header's ${width}x$height")
        d.pixels
      } else if (compression == "DIB" || handler == "DIB ") {
        if (bitCount != 24)
          fail(s"AVI: raw DIB bit depth $bitCount unsupported (24-bit only)")
        // the BMP raster: bottom-up BGR rows padded to 4-byte multiples
        val rowBytes = (width * 3 + 3) & ~3
        if (len0 < rowBytes * height)
          fail(s"AVI: raw frame truncated ($len0 of ${rowBytes * height} bytes)")
        val out = new Array[Byte](width * height * 3)
        var y = 0
        while (y < height) {
          val src = off0 + (height - 1 - y) * rowBytes
          var x = 0
          while (x < width) {
            out((y * width + x) * 3) = b(src + x * 3 + 2)
            out((y * width + x) * 3 + 1) = b(src + x * 3 + 1)
            out((y * width + x) * 3 + 2) = b(src + x * 3)
            x += 1
          }
          y += 1
        }
        out
      } else fail(s"AVI: compressed video codec '$compression' (handler " +
        s"'$handler') needs a native codec — only MJPEG and raw DIB decode" +
        " on a bare JVM")
    DecodedMedia(width, height, frames.size, first)
  }

  /** Header-level metadata of a VIDEO container — the pure-JVM walk a
    * scraped-corpus first pass needs (dimensions, duration, codec id)
    * without any native codec: pixel/sample decode for these formats stays
    * on [[decode]]'s loud-fail path, but M1's metadata plane only needs the
    * headers, and video is most of a crawl's bytes.
    *
    *  - '''MP4 / ISO BMFF''' (`ftyp` at byte 4): a box walk — `mvhd` gives
    *    (timescale, duration), the first `tkhd` with a nonzero 16.16 width
    *    gives the presentation dimensions, and that video track's `stsd`
    *    first sample-entry fourcc names the codec (`avc1`, `hvc1`, `av01`,
    *    …). 64-bit `largesize` boxes and version-1 (64-bit time) headers
    *    are handled; a box overrunning its parent fails loudly.
    *  - '''Matroska / WebM''' (EBML magic `1A45DFA3`): an EBML element walk
    *    — Segment→Info gives (TimestampScale, Duration), Segment→Tracks→
    *    TrackEntry with TrackType 1 gives CodecID (`V_VP9`, …) and its
    *    Video element PixelWidth/PixelHeight. Unknown-size elements extend
    *    to the parent's end (the streaming-Segment convention); a vint
    *    overrunning the buffer fails loudly.
    *
    * AVI, FLAC, MP3, OGG (Vorbis/Opus), WebP ([[probeWebp]]), ICO
    * ([[probeIco]]), and the three most common crawl STILL-image formats —
    * JPEG ([[probeJpeg]], SOF walk), PNG ([[probePng]], CRC-verified
    * IHDR), GIF ([[probeGif]], logical screen descriptor) — take their
    * own walks below. Returns (format, width, height, durationMs, codec);
    * fields a header genuinely lacks report −1 / null — absent metadata
    * is data, not an error (tolerated so a metadata-only `moov` fragment
    * still reports its duration), but a STRUCTURALLY malformed header
    * always fails loudly. Every other magic fails loudly: PPM/BMP/TIFF
    * stills and WAV carry their metadata through [[decode]]. */
  def probeMeta(blob: Array[Byte]): ProbedMeta = {
    if (blob.length >= 12 &&
        blob.slice(4, 8).sameElements("ftyp".getBytes("US-ASCII")))
      probeMp4(blob)
    else if (blob.length >= 4 && (blob(0) & 0xff) == 0x1a &&
        (blob(1) & 0xff) == 0x45 && (blob(2) & 0xff) == 0xdf &&
        (blob(3) & 0xff) == 0xa3)
      probeMkv(blob)
    else if (blob.length >= 12 && blob.take(4).sameElements("RIFF".getBytes) &&
        blob.slice(8, 12).sameElements("AVI ".getBytes))
      probeAvi(blob)
    else if (blob.length >= 12 && blob.take(4).sameElements("RIFF".getBytes) &&
        blob.slice(8, 12).sameElements("WEBP".getBytes))
      probeWebp(blob)
    else if (blob.length >= 4 && blob.take(4).sameElements("fLaC".getBytes))
      probeFlac(blob)
    else if (blob.length >= 4 && blob.take(4).sameElements("OggS".getBytes))
      probeOgg(blob)
    else if (blob.length >= 6 && blob(0) == 0 && blob(1) == 0 &&
        blob(2) == 1 && blob(3) == 0)
      probeIco(blob)
    else if (blob.length >= 8 && (blob(0) & 0xff) == 0x89 &&
        blob(1) == 'P' && blob(2) == 'N' && blob(3) == 'G' &&
        (blob(4) & 0xff) == 0x0d && (blob(5) & 0xff) == 0x0a &&
        (blob(6) & 0xff) == 0x1a && (blob(7) & 0xff) == 0x0a)
      probePng(blob)
    else if (blob.length >= 6 && {
        val sig = new String(blob, 0, 6, "US-ASCII")
        sig == "GIF87a" || sig == "GIF89a"
      })
      probeGif(blob)
    else if (blob.length >= 2 && (blob(0) & 0xff) == 0xff &&
        (blob(1) & 0xff) == 0xd8)
      probeJpeg(blob)
    else if (isMp3(blob))
      probeMp3(blob)
    else {
      val magic = blob.take(4).map(b => f"${b & 0xff}%02x").mkString
      throw new UnsupportedOperationException(
        s"RealCodec.probeMeta: not an MP4/MKV/AVI/WEBP/FLAC/MP3/OGG/ICO" +
          s"/JPEG/PNG/GIF container (magic 0x$magic) — PPM/BMP/TIFF stills" +
          " and WAV carry their metadata through decode()")
    }
  }

  /** WebP header probe (RIFF `WEBP` — ubiquitous in modern crawls): the
    * first chunk names the flavor, its payload carries the dimensions —
    * no entropy decode, the same bare-JVM surface as [[probeMp4]]:
    *
    *  - `VP8 ` (lossy): a key-frame tag (bit 0 = 0) whose start code
    *    `9D 01 2A` precedes 14-bit LE width/height;
    *  - `VP8L` (lossless): signature byte `2F`, then width−1 / height−1
    *    as consecutive 14-bit fields of one 32-bit LE word, whose 3-bit
    *    version field must be 0;
    *  - `VP8X` (extended): 24-bit LE canvas width−1 / height−1 after the
    *    4 feature-flag bytes (animation/alpha/EXIF ride as flags — the
    *    canvas IS the presentation size).
    *
    * Duration is −1 (a still image; animated WebP's per-frame delays live
    * in ANMF chunks pixel decoding would walk — absent metadata, not an
    * error). Pixel decode stays on [[decode]]'s loud-fail path: VP8
    * entropy decoding is native-codec territory. A truncated chunk, a
    * missing start code / signature, or an unknown first fourcc fails
    * loudly. */
  private def probeWebp(b: Array[Byte]): ProbedMeta = {
    def u16le(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    def u24le(off: Int): Int = u16le(off) | ((b(off + 2) & 0xff) << 16)
    def u32le(off: Int): Long =
      (u16le(off) & 0xffffL) | ((u16le(off + 2) & 0xffffL) << 16)
    if (b.length < 20) fail("WEBP: truncated RIFF header")
    val fourcc = new String(b, 12, 4, "US-ASCII")
    val len = u32le(16)
    if (20 + len > b.length)
      fail(s"WEBP: '$fourcc' chunk overruns the buffer ($len bytes)")
    fourcc match {
      case "VP8 " =>
        if (len < 10) fail("WEBP: VP8 payload too short for a frame header")
        if ((b(20) & 0x01) != 0)
          fail("WEBP: first VP8 frame is not a key frame")
        if (!((b(23) & 0xff) == 0x9d && (b(24) & 0xff) == 0x01 &&
            (b(25) & 0xff) == 0x2a))
          fail("WEBP: VP8 key frame start code missing")
        ProbedMeta("webp", u16le(26) & 0x3fff, u16le(28) & 0x3fff,
          -1L, "vp8")
      case "VP8L" =>
        if (len < 5) fail("WEBP: VP8L payload too short for a header")
        if ((b(20) & 0xff) != 0x2f)
          fail(f"WEBP: VP8L signature byte 0x${b(20) & 0xff}%02x != 0x2f")
        val bits = u32le(21)
        if (((bits >> 29) & 0x7L) != 0)
          fail(s"WEBP: VP8L version ${(bits >> 29) & 0x7L} != 0")
        ProbedMeta("webp", ((bits & 0x3fffL) + 1).toInt,
          (((bits >> 14) & 0x3fffL) + 1).toInt, -1L, "vp8l")
      case "VP8X" =>
        if (len < 10) fail("WEBP: VP8X payload too short for a header")
        ProbedMeta("webp", u24le(24) + 1, u24le(27) + 1, -1L, "vp8x")
      case other =>
        fail(s"WEBP: unknown first chunk fourcc '$other' — VP8 /VP8L/VP8X" +
          " headers parse on a bare JVM")
    }
  }

  /** ICO directory probe (reserved=0, type=1): report the LARGEST entry's
    * dimensions (the icon a renderer presents; a 0 width/height byte means
    * 256, the format's one quirk) and name the codec from that entry's
    * payload magic — `png` or `dib` (the uncompressed BITMAPINFOHEADER
    * case). Every directory entry's payload must lie inside the buffer —
    * a lying offset/size fails loudly. (CUR files — type=2, hotspot fields
    * repurposing the planes/bpp slots — never dispatch here: the magic
    * check upstream requires type=1, so they take the generic loud-fail.) */
  private def probeIco(b: Array[Byte]): ProbedMeta = {
    def u16le(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    def u32le(off: Int): Long =
      (u16le(off) & 0xffffL) | ((u16le(off + 2) & 0xffffL) << 16)
    val count = u16le(4)
    if (count < 1) fail("ICO: empty icon directory")
    if (6 + 16 * count > b.length)
      fail(s"ICO: directory of $count entries overruns the buffer")
    var best = -1; var bestW = -1; var bestH = -1
    var i = 0
    while (i < count) {
      val e = 6 + 16 * i
      val w = if ((b(e) & 0xff) == 0) 256 else b(e) & 0xff
      val h = if ((b(e + 1) & 0xff) == 0) 256 else b(e + 1) & 0xff
      val size = u32le(e + 8); val off = u32le(e + 12)
      if (off < 6 + 16L * count || off + size > b.length)
        fail(s"ICO: entry $i payload (offset $off, $size bytes) overruns" +
          " the buffer")
      if (w * h > bestW * bestH || best < 0) {
        best = e; bestW = w; bestH = h
      }
      i += 1
    }
    val off = u32le(best + 12).toInt
    val codec =
      if (off + 8 <= b.length && (b(off) & 0xff) == 0x89 &&
          b(off + 1) == 'P' && b(off + 2) == 'N' && b(off + 3) == 'G')
        "png"
      else if (off + 4 <= b.length && u32le(off) == 40L) // BITMAPINFOHEADER
        "dib"
      else fail(s"ICO: entry payload at $off is neither PNG nor a" +
        " BITMAPINFOHEADER DIB")
    ProbedMeta("ico", bestW, bestH, -1L, codec)
  }

  /** JPEG header probe (SOI + marker-segment walk to the frame header —
    * the single most common crawl image format): dimensions live in the
    * SOFn segment ([precision u8][height u16be][width u16be]), reached by
    * skipping length-prefixed segments from the SOI. SOF0 (baseline),
    * SOF1 (extended sequential), and SOF2 (progressive) name the codec;
    * any OTHER SOF flavor (lossless, arithmetic, hierarchical — rare and
    * rarely decodable anywhere) fails loudly rather than reporting
    * dimensions for a frame type downstream can't decode. Reaching SOS or
    * EOI without a SOF, a segment overrunning the buffer, or a dimension
    * of 0 all fail loudly. FF fill bytes between markers are legal padding
    * and skipped. Pixel decode stays on [[decode]]'s ImageIO tier. */
  private def probeJpeg(b: Array[Byte]): ProbedMeta = {
    def u16be(off: Int): Int = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    var off = 2
    while (off + 2 <= b.length) {
      if ((b(off) & 0xff) != 0xff)
        fail(f"JPEG: expected a marker at byte $off, got 0x${b(off) & 0xff}%02x")
      // FF fill bytes before a marker are legal padding
      while (off + 2 < b.length && (b(off + 1) & 0xff) == 0xff) off += 1
      val marker = b(off + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) ||
          marker == 0x01) {
        off += 2 // standalone marker, no length field
      } else if (marker == 0xd9) {
        fail("JPEG: reached EOI without a frame header")
      } else if (marker == 0xda) {
        fail("JPEG: reached SOS without a frame header")
      } else {
        if (off + 4 > b.length)
          fail("JPEG: truncated inside a segment header")
        val len = u16be(off + 2)
        if (len < 2 || off + 2 + len > b.length)
          fail(s"JPEG: segment 0x${marker.toHexString} at byte $off" +
            s" overruns the buffer (length $len)")
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          val codec = marker match {
            case 0xc0 => "jpeg-baseline"
            case 0xc1 => "jpeg-extended"
            case 0xc2 => "jpeg-progressive"
            case m => fail(f"JPEG: unsupported frame type SOF${m - 0xc0}" +
              " (lossless/arithmetic/hierarchical)")
          }
          if (len < 9) fail(s"JPEG: SOF segment too short ($len bytes)")
          val h = u16be(off + 5); val w = u16be(off + 7)
          // height 0 is legal in the wire format (deferred to a DNL
          // marker) but useless as metadata — loud, like every other
          // structurally-unusable header here
          if (w <= 0 || h <= 0) fail(s"JPEG: bad dimensions ${w}x$h")
          return ProbedMeta("jpeg", w, h, -1L, codec)
        }
        off += 2 + len
      }
    }
    fail("JPEG: truncated before a frame header")
  }

  /** PNG header probe: the same validate-IHDR-first walk as the decode
    * router ([[routePng]] — length-13 IHDR as the first chunk, CRC
    * checked BEFORE trusting any field, positive dimensions), reporting
    * the pixel layout as the codec (`gray8`, `rgb16`, `palette8`, …)
    * without inflating a single row. A truncated buffer, a bad CRC, or an
    * unknown color type fails loudly. */
  private def probePng(b: Array[Byte]): ProbedMeta = {
    if (b.length < 8 + 25) fail("PNG: truncated before IHDR")
    def u32(off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    if (u32(8) != 13 || new String(b, 12, 4, "US-ASCII") != "IHDR")
      fail("PNG: first chunk is not a 13-byte IHDR")
    val crc = new java.util.zip.CRC32()
    crc.update(b, 12, 17)
    if (crc.getValue != u32(29)) fail("PNG: bad CRC in IHDR chunk at byte 8")
    val w = u32(16).toInt; val h = u32(20).toInt
    if (w <= 0 || h <= 0) fail(s"PNG: bad dimensions ${w}x$h")
    val depth = b(24) & 0xff
    val layout = (b(25) & 0xff) match {
      case 0 => "gray"
      case 2 => "rgb"
      case 3 => "palette"
      case 4 => "gray-alpha"
      case 6 => "rgba"
      case ct => fail(s"PNG: unknown color type $ct")
    }
    ProbedMeta("png", w, h, -1L, s"$layout$depth")
  }

  /** GIF header probe: the logical screen descriptor directly follows the
    * 6-byte signature — canvas width/height as u16le at bytes 6/8 (the
    * presentation size; individual image descriptors may be sub-rects).
    * The signature version names the codec (`gif87a`/`gif89a`); any other
    * version byte pattern fails loudly upstream (the magic check requires
    * one of the two published versions). Duration is −1: per-frame delays
    * live in 89a Graphic Control Extensions a pixel decode would walk —
    * absent metadata, not an error. */
  private def probeGif(b: Array[Byte]): ProbedMeta = {
    if (b.length < 13) fail("GIF: truncated before the logical screen" +
      " descriptor")
    def u16le(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    val w = u16le(6); val h = u16le(8)
    if (w <= 0 || h <= 0) fail(s"GIF: bad canvas dimensions ${w}x$h")
    ProbedMeta("gif", w, h, -1L,
      new String(b, 0, 6, "US-ASCII").toLowerCase)
  }

  /** OGG page walk (Vorbis/Opus — the last mainstream scraped-audio
    * container with a feasible bare-JVM metadata plane): the first
    * BOS-flagged page's identification header gives channels and rate
    * (Vorbis: `\x01vorbis`, 8-bit channels + 32-bit LE rate; Opus:
    * `OpusHead`, 8-bit channels + 16-bit pre-skip — granules always tick
    * at 48 kHz for Opus, whatever the input rate field says), and the
    * LAST page of that logical stream carrying a real granule position
    * gives the exact duration (granule = PCM sample count; −1-granule
    * continuation pages are skipped; Opus subtracts pre-skip, the spec's
    * edit-list convention). Pages must tile the buffer — a capture-pattern
    * miss, truncated segment table, or overrunning payload fails loudly;
    * CRCs are NOT verified (this is a metadata probe, not an integrity
    * pass). A BOS page of any OTHER codec (Theora, Speex, FLAC-in-Ogg)
    * fails loudly with its magic — the honest native-codec surface.
    * Audio mapping mirrors [[probeFlac]]: `width` = channels, `height` =
    * sample rate. */
  private def probeOgg(b: Array[Byte]): ProbedMeta = {
    def u32le(off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    def u64le(off: Int): Long =
      u32le(off) | (u32le(off + 4) << 32)
    var off = 0
    var codec: String = null; var channels = -1; var rate = -1
    var serial = -1L; var lastGranule = -1L; var preSkip = 0L
    while (off < b.length) {
      if (off + 27 > b.length) fail(s"OGG: truncated page header at byte $off")
      if (!(b(off) == 'O' && b(off + 1) == 'g' && b(off + 2) == 'g' &&
          b(off + 3) == 'S'))
        fail(s"OGG: no page capture pattern at byte $off")
      if (b(off + 4) != 0)
        fail(s"OGG: unsupported stream structure version ${b(off + 4)}")
      val granule = u64le(off + 6)
      val pSerial = u32le(off + 14)
      val nSegs = b(off + 26) & 0xff
      if (off + 27 + nSegs > b.length)
        fail(s"OGG: truncated segment table at byte $off")
      var payLen = 0
      var i = 0
      while (i < nSegs) { payLen += b(off + 27 + i) & 0xff; i += 1 }
      val body = off + 27 + nSegs
      if (body + payLen > b.length)
        fail(s"OGG: page at byte $off overruns the buffer ($payLen bytes)")
      val bos = (b(off + 5) & 0x02) != 0
      if (bos && codec == null) {
        if (payLen >= 16 && b(body) == 1 &&
            new String(b, body + 1, 6, "US-ASCII") == "vorbis") {
          codec = "vorbis"
          channels = b(body + 11) & 0xff
          rate = u32le(body + 12).toInt
          serial = pSerial
        } else if (payLen >= 12 &&
            new String(b, body, 8, "US-ASCII") == "OpusHead") {
          codec = "opus"
          channels = b(body + 9) & 0xff
          preSkip = (b(body + 10) & 0xffL) | ((b(body + 11) & 0xffL) << 8)
          rate = 48000 // Opus granules tick at 48 kHz regardless of input
          serial = pSerial
        } else {
          val magic = b.slice(body, math.min(body + 8, b.length))
            .map(c => if (c >= 0x20 && c < 0x7f) c.toChar.toString
              else f"\\x${c & 0xff}%02x").mkString
          fail(s"OGG: BOS page carries an unsupported codec id '$magic' —" +
            " only Vorbis and Opus headers parse on a bare JVM")
        }
      }
      // -1 (all ones) is the spec's "no packet ends here" sentinel; any
      // OTHER negative u64 granule is a structural lie, not a skip (r16
      // review find — the overflow guard below could never fire for them)
      if (granule < -1L)
        fail(s"OGG: granule position overflows a signed 64-bit count" +
          s" at byte $off")
      if (codec != null && pSerial == serial && granule >= 0)
        lastGranule = granule
      off = body + payLen
    }
    if (codec == null) fail("OGG: no BOS identification page")
    if (channels <= 0) fail(s"OGG: bad channel count $channels")
    if (rate <= 0) fail(s"OGG: bad sample rate $rate")
    val samples = math.max(0L, lastGranule -
      (if (codec == "opus") preSkip else 0L))
    // granule is attacker-controlled u64: duration must fail like every
    // other structural lie, not overflow into garbage (the probeAvi guard)
    if (samples > Long.MaxValue / 1000)
      fail(s"OGG: granule position overflows a millisecond duration" +
        s" ($samples samples)")
    val durMs = if (lastGranule >= 0) samples * 1000 / rate else -1L
    ProbedMeta("ogg", channels, rate, durMs, codec)
  }

  /** MP3 detection: an ID3v2 tag, or a raw MPEG-1/2 Layer III frame sync
    * (11 set bits with a Layer III layer field) — checked strictly enough
    * that random binary rarely routes here. */
  private def isMp3(b: Array[Byte]): Boolean = {
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') true
    else b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0 &&
      ((b(1) >> 1) & 0x3) == 1 // layer bits 01 = Layer III
  }

  /** FLAC STREAMINFO walk (the mandatory first metadata block): sample
    * rate (20 bits), channels (3 bits + 1), and the 36-bit total-sample
    * count give the exact duration. The audio mapping of [[ProbedMeta]]
    * mirrors [[decodeWav]]'s layout: `width` = channels, `height` = sample
    * rate. A zero total-sample field (a live stream) reports duration −1. */
  private def probeFlac(b: Array[Byte]): ProbedMeta = {
    // block header: 1 last-flag bit + 7 type bits, 24-bit length
    if (b.length < 8 + 34) fail("FLAC: truncated before STREAMINFO")
    if ((b(4) & 0x7f) != 0) fail("FLAC: first metadata block is not STREAMINFO")
    val blockLen = ((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)
    if (blockLen < 34) fail(s"FLAC: STREAMINFO too short ($blockLen bytes)")
    val si = 8 // STREAMINFO body offset
    // bytes 10..17 of the body: 20-bit rate, 3-bit channels-1, 5-bit
    // bits-1, 36-bit total samples
    val rate = ((b(si + 10) & 0xff) << 12) | ((b(si + 11) & 0xff) << 4) |
      ((b(si + 12) & 0xf0) >> 4)
    val channels = ((b(si + 12) & 0x0e) >> 1) + 1
    val totalSamples = ((b(si + 13) & 0x0fL) << 32) |
      ((b(si + 14) & 0xffL) << 24) | ((b(si + 15) & 0xffL) << 16) |
      ((b(si + 16) & 0xffL) << 8) | (b(si + 17) & 0xffL)
    if (rate <= 0) fail(s"FLAC: bad sample rate $rate")
    val durMs = if (totalSamples > 0) totalSamples * 1000 / rate else -1L
    ProbedMeta("flac", channels, rate, durMs, "flac")
  }

  private val Mp3Bitrates = // MPEG-1 Layer III, kbit/s, index 1..14
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3Rates = Array(44100, 48000, 32000)

  /** MP3 walk: skip any ID3v2 tag (syncsafe size), parse the first
    * MPEG-1 Layer III frame header (bitrate/sample-rate/channel-mode
    * tables), then look for a Xing/Info VBR header inside that frame —
    * its frame count × 1152 samples gives the exact duration; without
    * one, duration is the CBR estimate audio_bytes×8/bitrate (how every
    * tag reader prices a plain CBR file). MPEG-2/2.5 and free-format
    * bitrates fail loudly — rarities a production probe should surface,
    * not misprice. */
  private def probeMp3(b: Array[Byte]): ProbedMeta = {
    var off = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      off = 10 + size
    }
    if (off + 4 > b.length) fail("MP3: truncated before the first frame")
    if ((b(off) & 0xff) != 0xff || (b(off + 1) & 0xe0) != 0xe0)
      fail(f"MP3: no frame sync at byte $off (0x${b(off) & 0xff}%02x)")
    val versionBits = (b(off + 1) >> 3) & 0x3
    val layerBits = (b(off + 1) >> 1) & 0x3
    if (versionBits != 3 || layerBits != 1)
      fail(s"MP3: only MPEG-1 Layer III is priced here (version bits" +
        s" $versionBits, layer bits $layerBits)")
    val brIdx = (b(off + 2) >> 4) & 0xf
    val srIdx = (b(off + 2) >> 2) & 0x3
    if (brIdx == 0 || brIdx == 15) fail(s"MP3: free/bad bitrate index $brIdx")
    if (srIdx == 3) fail("MP3: reserved sample-rate index")
    val bitrate = Mp3Bitrates(brIdx) * 1000
    val rate = Mp3Rates(srIdx)
    val channels = if (((b(off + 3) >> 6) & 0x3) == 3) 1 else 2
    // Xing/Info at the side-info offset: 36 bytes in for stereo, 21 mono
    val xingOff = off + (if (channels == 1) 21 else 36)
    val durMs =
      if (xingOff + 12 <= b.length &&
          (new String(b, xingOff, 4, "US-ASCII") == "Xing" ||
            new String(b, xingOff, 4, "US-ASCII") == "Info") &&
          ((b(xingOff + 7) & 0x1) == 1)) { // frames-present flag
        val frames = ((b(xingOff + 8) & 0xffL) << 24) |
          ((b(xingOff + 9) & 0xffL) << 16) |
          ((b(xingOff + 10) & 0xffL) << 8) | (b(xingOff + 11) & 0xffL)
        frames * 1152L * 1000 / rate
      } else (b.length - off).toLong * 8000 / bitrate
    ProbedMeta("mp3", channels, rate, durMs, "mp3")
  }

  /** RIFF/AVI header walk: `avih` gives dimensions and the per-frame
    * micro-second clock (duration = µs/frame × totalFrames), the first
    * `vids` stream's `strf` BITMAPINFOHEADER names the codec fourcc
    * ("DIB" when biCompression = 0). Unlike [[decodeAvi]] this accepts ANY
    * codec — metadata is exactly what the crawl's first pass wants for
    * the frames it cannot decode. */
  private def probeAvi(b: Array[Byte]): ProbedMeta = {
    def u32(off: Int): Long = {
      if (off + 4 > b.length) fail(s"AVI: truncated at byte $off")
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    }
    def fourcc(off: Int): String = {
      if (off + 4 > b.length) fail(s"AVI: truncated at byte $off")
      new String(b, off, 4, "US-ASCII")
    }
    var width = -1; var height = -1; var durMs = -1L
    var codec: String = null; var sawVids = false
    def walk(start: Int, end: Int): Unit = {
      var i = start
      while (i + 8 <= end) {
        val id = fourcc(i)
        val sz = u32(i + 4)
        if (sz > Int.MaxValue - 8 || i + 8 + sz > end)
          fail(s"AVI: chunk $id at byte $i overruns its parent ($sz bytes)")
        val body = i + 8
        val szI = sz.toInt
        id match {
          case "LIST" =>
            val lt = fourcc(body)
            if (lt == "hdrl" || lt == "strl") walk(body + 4, body + szI)
          case "avih" =>
            if (szI < 40) fail(s"AVI: avih too short ($szI bytes)")
            width = u32(body + 32).toInt; height = u32(body + 36).toInt
            val usPerFrame = u32(body); val totalFrames = u32(body + 16)
            if (usPerFrame > 0 && totalFrames > 0) {
              // both fields are u32-range, so the product can overflow Long
              // (≈1.8e19 max vs 9.2e18): a lying header must fail like every
              // other structural malformation, not report a negative duration
              if (totalFrames > Long.MaxValue / usPerFrame)
                fail(s"AVI: avih duration overflows ($usPerFrame µs/frame × " +
                  s"$totalFrames frames)")
              durMs = usPerFrame * totalFrames / 1000
            }
          case "strh" =>
            sawVids = fourcc(body) == "vids" && codec == null
          case "strf" if sawVids && codec == null =>
            if (szI < 20) fail(s"AVI: strf too short ($szI bytes)")
            codec = if (u32(body + 16) == 0) "DIB" else fourcc(body + 16)
          case _ => ()
        }
        i = body + szI + (szI & 1)
      }
    }
    walk(12, b.length)
    ProbedMeta("avi", width, height, durMs, codec)
  }

  private def probeMp4(b: Array[Byte]): ProbedMeta = {
    def u16(off: Long): Int = {
      val i = off.toInt
      if (i < 0 || i + 2 > b.length) fail(s"MP4: truncated at byte $off")
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    }
    def u32(off: Long): Long = {
      val i = off.toInt
      if (i < 0 || i + 4 > b.length) fail(s"MP4: truncated at byte $off")
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    }
    def u64(off: Long): Long = (u32(off) << 32) | u32(off + 4)
    def fourcc(off: Long): String = {
      val i = off.toInt
      if (i < 0 || i + 4 > b.length) fail(s"MP4: truncated at byte $off")
      new String(b, i, 4, "US-ASCII")
    }
    var timescale = 0L; var duration = -1L
    var width = -1; var height = -1; var codec: String = null
    // tkhd precedes mdia/…/stsd within its trak, so "current trak is the
    // video track" is a simple flag by the time the codec entry is read
    var curTrakVideo = false
    def walk(start: Long, end: Long): Unit = {
      var i = start
      while (i + 8 <= end) {
        val sz0 = u32(i)
        val typ = fourcc(i + 4)
        val (hdr, sz) =
          if (sz0 == 1L) (16L, u64(i + 8))
          else if (sz0 == 0L) (8L, end - i) // "to end of parent" (last box)
          else (8L, sz0)
        if (sz < hdr || i + sz > end)
          fail(s"MP4: box '$typ' at byte $i overruns its parent (size $sz)")
        val body = i + hdr
        typ match {
          case "moov" | "mdia" | "minf" | "stbl" => walk(body, i + sz)
          case "trak" => curTrakVideo = false; walk(body, i + sz)
          case "mvhd" =>
            val v = u32(body) >>> 24 // version byte of version+flags
            if (v == 1) { timescale = u32(body + 20); duration = u64(body + 24) }
            else {
              timescale = u32(body + 12)
              val d = u32(body + 16)
              duration = if (d == 0xffffffffL) -1L else d // unknown sentinel
            }
          case "tkhd" =>
            val v = u32(body) >>> 24
            val wOff = body + (if (v == 1) 88L else 76L)
            val w = (u32(wOff) >> 16).toInt // 16.16 fixed point
            val h = (u32(wOff + 4) >> 16).toInt
            if (w > 0 && h > 0) {
              curTrakVideo = true
              if (width < 0) { width = w; height = h }
            }
          case "stsd" if curTrakVideo && codec == null =>
            if (u32(body + 4) > 0) codec = fourcc(body + 12)
          case _ => () // mdat, ftyp, free, udta, …: skip
        }
        i += sz
      }
    }
    walk(0L, b.length.toLong)
    val durMs = if (duration >= 0 && timescale > 0)
      duration * 1000L / timescale else -1L
    ProbedMeta("mp4", width, height, durMs, codec)
  }

  private def probeMkv(b: Array[Byte]): ProbedMeta = {
    // EBML vint: the count of leading zero bits in the first byte is the
    // number of EXTRA bytes; ids keep the marker bit, sizes strip it
    def vintLen(off: Long): Int = {
      val i = off.toInt
      if (i < 0 || i >= b.length) fail(s"MKV: truncated vint at byte $off")
      val v = b(i) & 0xff
      if (v == 0) fail(s"MKV: invalid zero vint marker at byte $off")
      Integer.numberOfLeadingZeros(v) - 23
    }
    def readId(off: Long): (Long, Int) = {
      val n = vintLen(off)
      if (off.toInt + n > b.length) fail(s"MKV: truncated id at byte $off")
      var id = 0L
      (0 until n).foreach(k => id = (id << 8) | (b(off.toInt + k) & 0xffL))
      (id, n)
    }
    def readSize(off: Long): (Long, Int, Boolean) = {
      val n = vintLen(off)
      if (off.toInt + n > b.length) fail(s"MKV: truncated size at byte $off")
      var v = (b(off.toInt) & 0xffL) & ((1L << (8 - n)) - 1)
      (1 until n).foreach(k => v = (v << 8) | (b(off.toInt + k) & 0xffL))
      val allOnes = (1L << (7 * n)) - 1 // the "unknown size" sentinel
      (v, n, v == allOnes)
    }
    def uint(off: Long, len: Long): Long = {
      var v = 0L
      (0 until len.toInt).foreach(k => v = (v << 8) | (b(off.toInt + k) & 0xffL))
      v
    }
    def float(off: Long, len: Long): Double = len match {
      case 4 => java.lang.Float.intBitsToFloat(uint(off, 4).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(uint(off, 8))
      case n => fail(s"MKV: float element of width $n at byte $off")
    }
    var tsScaleNs = 1000000L // Matroska default: 1 ms
    var durTicks = -1.0
    var width = -1; var height = -1; var codec: String = null
    // per-TrackEntry staging, committed when TrackType == 1 (video)
    var teType = -1L; var teCodec: String = null; var teW = -1; var teH = -1
    def walk(start: Long, end: Long): Unit = {
      var i = start
      while (i < end) {
        val (id, idn) = readId(i)
        val (sz, szn, unknown) = readSize(i + idn)
        val body = i + idn + szn
        val bodyEnd = if (unknown) end else body + sz
        if (bodyEnd > end)
          fail(s"MKV: element 0x${id.toHexString} at byte $i overruns its parent")
        id match {
          case 0x18538067L | 0x1549a966L | 0x1654ae6bL | 0xe0L => // Segment/Info/Tracks/Video
            walk(body, bodyEnd)
          case 0xaeL => // TrackEntry: stage, walk, commit if video
            teType = -1; teCodec = null; teW = -1; teH = -1
            walk(body, bodyEnd)
            if (teType == 1L) {
              if (codec == null) codec = teCodec
              if (width < 0 && teW > 0) { width = teW; height = teH }
            }
          case 0x2ad7b1L => tsScaleNs = uint(body, sz)
          case 0x4489L => durTicks = float(body, sz)
          case 0x83L => teType = uint(body, sz)
          case 0x86L =>
            teCodec = new String(b, body.toInt, sz.toInt, "US-ASCII")
          case 0xb0L => teW = uint(body, sz).toInt
          case 0xbaL => teH = uint(body, sz).toInt
          case _ => () // EBML header, Cluster, SeekHead, Void, …: skip
        }
        i = bodyEnd
      }
    }
    walk(0L, b.length.toLong)
    val durMs = if (durTicks >= 0 && tsScaleNs > 0)
      math.round(durTicks * tsScaleNs / 1e6) else -1L
    ProbedMeta("mkv", width, height, durMs, codec)
  }

  /** BMP router: the verified hand-rolled decoder covers the dominant
    * uncompressed 24-bit BI_RGB layout; palette / RLE / 16- and 32-bit
    * variants go through the JDK's BMP reader. A header too short to carry
    * the depth/compression fields stays on the hand-rolled path, whose
    * bounds gates fail loudly. */
  private def routeBmp(b: Array[Byte]): DecodedMedia = {
    if (b.length < 34) decodeBmp(b) // loud "truncated header"
    else {
      val depth = (b(28) & 0xff) | ((b(29) & 0xff) << 8)
      val compression = (b(30) & 0xff) | ((b(31) & 0xff) << 8) |
        ((b(32) & 0xff) << 16) | ((b(33) & 0xff) << 24)
      if (depth == 24 && compression == 0) decodeBmp(b)
      else decodeImageIo(b, s"BMP (depth $depth, compression $compression)")
    }
  }

  /** PNG router: validate the IHDR chunk (length, CRC, dimensions) FIRST,
    * then send the verified-subset images (8-bit, color types 0/2/4/6,
    * non-interlaced) through the hand-rolled decoder and the rest (palette /
    * 16-bit / Adam7) through ImageIO. CRC-before-routing matters: a
    * corrupted color-type byte must fail loudly, not silently reroute. */
  private def routePng(b: Array[Byte]): DecodedMedia = {
    if (b.length < 8 + 25) fail("PNG: truncated before IHDR")
    def u32(off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    if (u32(8) != 13 || new String(b, 12, 4, "US-ASCII") != "IHDR")
      fail("PNG: first chunk is not a 13-byte IHDR")
    val crc = new java.util.zip.CRC32()
    crc.update(b, 12, 17)
    if (crc.getValue != u32(29)) fail("PNG: bad CRC in IHDR chunk at byte 8")
    val w = u32(16).toInt; val h = u32(20).toInt
    if (w <= 0 || h <= 0) fail(s"PNG: bad dimensions ${w}x$h")
    val depth = b(24) & 0xff; val colorType = b(25) & 0xff
    val interlace = b(28) & 0xff
    val handRolled = depth == 8 && interlace == 0 &&
      (colorType == 0 || colorType == 2 || colorType == 4 || colorType == 6)
    if (handRolled) decodePng(b)
    else decodeImageIo(b,
      s"PNG (depth $depth, color type $colorType, interlace $interlace)")
  }

  /** JDK-tier decode: first image normalized through the image's
    * `ColorModel` (`getRGB` — exact for palette/RGB, JDK-standard sRGB
    * conversion for gray/16-bit), alpha dropped; `nFrames` = the stream's
    * image count (animated-GIF frames, TIFF pages). Reader errors wrap into
    * this codec's loud-failure contract. */
  private def decodeImageIo(b: Array[Byte], what: String): DecodedMedia = {
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext)
        fail(s"$what: no JDK ImageIO reader recognizes the stream")
      val reader = readers.next()
      try {
        reader.setInput(in, false, true)
        // dimension gate from the HEADER, before read(0) allocates: a
        // crafted huge-dimension GIF/JPEG header would otherwise OOM inside
        // the reader's BufferedImage allocation — an Error, not the loud
        // IllegalArgumentException this codec contracts. MaxPixels bounds
        // the reader's ~4 B/px working image and the getRGB int[] too, not
        // just the Int arithmetic of our own 3 B/px output.
        val w = reader.getWidth(0); val h = reader.getHeight(0)
        if (w <= 0 || h <= 0) fail(s"$what: bad dimensions ${w}x$h")
        if (w.toLong * h > MaxPixels)
          fail(s"$what: image too large (${w}x$h)")
        // read BEFORE counting: getNumImages(true)'s forced full-stream scan
        // leaves the JDK GIF reader in a state where a subsequent read(0)
        // drops the image's final partial data block (observed empirically:
        // last row decodes black) — decode first, then count frames
        val img0 = reader.read(0)
        val k = reader.getNumImages(true)
        if (img0.getWidth != w || img0.getHeight != h)
          fail(s"$what: decoded dimensions ${img0.getWidth}x${img0.getHeight}" +
            s" disagree with the header's ${w}x$h")
        val argb = img0.getRGB(0, 0, w, h, null, 0, w)
        val out = new Array[Byte](w * h * 3)
        var i = 0
        while (i < argb.length) {
          val p = argb(i)
          out(i * 3) = (p >> 16).toByte
          out(i * 3 + 1) = (p >> 8).toByte
          out(i * 3 + 2) = p.toByte
          i += 1
        }
        DecodedMedia(w, h, math.max(k, 1), out)
      } catch {
        case e: java.io.IOException =>
          fail(s"$what: corrupt stream (${e.getMessage})")
        case e: RuntimeException if !e.isInstanceOf[IllegalArgumentException] =>
          // ImageIO readers surface corruption as NPE/AIOOBE/NegativeArray
          // on some malformed inputs; keep the loud-failure contract
          fail(s"$what: corrupt stream (${e.getClass.getSimpleName}: ${e.getMessage})")
      } finally reader.dispose()
    } finally in.close()
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"RealCodec: $msg")

  /** Binary PPM: `P6 <w> <h> <maxval>` header tokens separated by
    * whitespace, `#` comments allowed, one whitespace byte, then
    * `w*h*3` RGB bytes. */
  private def decodePpm(b: Array[Byte]): DecodedMedia = {
    var i = 2
    def isWs(c: Byte) = c == ' ' || c == '\t' || c == '\n' || c == '\r'
    def nextInt(): Int = {
      while (i < b.length && (isWs(b(i)) || b(i) == '#')) {
        if (b(i) == '#') while (i < b.length && b(i) != '\n') i += 1
        else i += 1
      }
      val start = i
      while (i < b.length && b(i) >= '0' && b(i) <= '9') i += 1
      if (i == start) fail(s"PPM header: expected integer at byte $start")
      new String(b, start, i - start, "US-ASCII").toInt
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    if (w <= 0 || h <= 0) fail(s"PPM: non-positive dimensions ${w}x$h")
    if (maxval <= 0 || maxval > 255) fail(s"PPM: unsupported maxval $maxval")
    // the spec requires EXACTLY one whitespace byte between maxval and the
    // raster — consuming whatever byte sits there would silently shift the
    // raster by one on malformed headers
    if (i >= b.length || !isWs(b(i)))
      fail("PPM: expected one whitespace byte after maxval")
    i += 1
    // Long arithmetic: a crafted 1431655766×1 header wraps w*h*3 to 2 in
    // Int, slipping a 2-byte "raster" past the truncation check
    val n = w.toLong * h * 3
    if ((b.length - i).toLong < n) fail(s"PPM: truncated pixel data " +
      s"(${b.length - i} of $n bytes)")
    val out = java.util.Arrays.copyOfRange(b, i, i + n.toInt)
    // samples are fractions of maxval: rescale to the 0..255 layout
    // (netpbm's round-half-up), so a maxval-1 white pixel is white, not black
    if (maxval != 255) {
      var k = 0
      while (k < out.length) {
        val v = out(k) & 0xff
        // a sample above maxval is spec-invalid; scaling it would wrap
        // through toByte into a silently wrong pixel
        if (v > maxval) fail(s"PPM: sample $v exceeds maxval $maxval")
        out(k) = ((v * 255 + maxval / 2) / maxval).toByte
        k += 1
      }
    }
    DecodedMedia(w, h, 1, out)
  }

  /** Uncompressed 24-bit BMP (BITMAPINFOHEADER): BGR bottom-up rows padded
    * to 4 bytes, normalized to top-down RGB. */
  private def decodeBmp(b: Array[Byte]): DecodedMedia = {
    def i32(off: Int): Int = {
      if (off + 4 > b.length) fail(s"BMP: truncated header at byte $off")
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    }
    def i16(off: Int): Int = {
      if (off + 2 > b.length) fail(s"BMP: truncated header at byte $off")
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    }
    val dataOffset = i32(10)
    // reject before arithmetic: a negative/absurd offset makes the Int
    // bounds sum wrap and the raster reads crash with a raw AIOOBE instead
    // of this loud gate
    if (dataOffset < 54 || dataOffset > b.length)
      fail(s"BMP: bad pixel-data offset $dataOffset")
    val w = i32(18)
    val hRaw = i32(22)
    // Int.MinValue is its own abs — it would sail through every gate below
    // as a negative "height" and end in a raw crash or empty decode
    if (w <= 0 || hRaw == 0 || hRaw == Int.MinValue)
      fail(s"BMP: bad dimensions ${w}x$hRaw")
    val h = math.abs(hRaw) // negative height = already top-down
    val topDown = hRaw < 0
    val depth = i16(28)
    if (depth != 24) fail(s"BMP: only 24-bit supported, got $depth")
    val compression = i32(30)
    if (compression != 0) fail(s"BMP: only uncompressed (BI_RGB) supported," +
      s" got compression $compression")
    val stride = ((w.toLong * 3 + 3) / 4) * 4
    // Long arithmetic: w=1, h=2^30 wraps stride*h to 0 in Int and a 60-byte
    // blob would pass, then the output allocation goes negative
    if (b.length.toLong < dataOffset + stride * h)
      fail("BMP: truncated pixel data")
    val strideI = stride.toInt // <= b.length after the bounds check
    val out = new Array[Byte](w * h * 3)
    var row = 0
    while (row < h) {
      val srcRow = if (topDown) row else h - 1 - row
      val src = dataOffset + srcRow * strideI
      var x = 0
      while (x < w) {
        val o = (row * w + x) * 3
        out(o) = b(src + x * 3 + 2)     // R from BGR
        out(o + 1) = b(src + x * 3 + 1) // G
        out(o + 2) = b(src + x * 3)     // B
        x += 1
      }
      row += 1
    }
    DecodedMedia(w, h, 1, out)
  }

  /** Non-interlaced 8-bit PNG (color types 0 gray, 2 RGB, 4 gray+alpha,
    * 6 RGBA): chunk walk with CRC verification, one zlib stream across the
    * IDAT chunks, per-row unfiltering (None/Sub/Up/Average/Paeth), then
    * channel mapping to the normalized RGB layout (gray replicated, alpha
    * dropped — metadata extraction, not compositing). Palette (type 3),
    * 16-bit, and Adam7 interlace are [[routePng]]'d to the ImageIO tier
    * before this method; the gates here are defense in depth, not the
    * routing decision. */
  private def decodePng(b: Array[Byte]): DecodedMedia = {
    def u32(off: Int): Long = {
      if (off + 4 > b.length) fail(s"PNG: truncated at byte $off")
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    }
    var i = 8
    var w = 0; var h = 0; var depth = -1; var colorType = -1
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      val len = u32(i)
      if (len > Int.MaxValue - 12 || i + 12 + len > b.length)
        fail(s"PNG: truncated chunk at byte $i (len $len)")
      val n = len.toInt
      val typ = new String(b, i + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(b, i + 4, 4 + n)
      if (crc.getValue != u32(i + 8 + n))
        fail(s"PNG: bad CRC in $typ chunk at byte $i")
      typ match {
        case "IHDR" =>
          if (n != 13) fail(s"PNG: IHDR length $n, expected 13")
          w = u32(i + 8).toInt; h = u32(i + 12).toInt
          depth = b(i + 16) & 0xff; colorType = b(i + 17) & 0xff
          if (w <= 0 || h <= 0) fail(s"PNG: bad dimensions ${w}x$h")
          if ((b(i + 18) & 0xff) != 0) fail("PNG: unknown compression method")
          if ((b(i + 19) & 0xff) != 0) fail("PNG: unknown filter method")
          if ((b(i + 20) & 0xff) != 0)
            fail("PNG: interlaced (Adam7) images unsupported")
          if (depth != 8) fail(s"PNG: only bit depth 8 supported, got $depth")
          if (colorType != 0 && colorType != 2 && colorType != 4 && colorType != 6)
            fail(s"PNG: unsupported color type $colorType" +
              (if (colorType == 3) " (palette)" else ""))
          seenIhdr = true
        case "IDAT" =>
          if (!seenIhdr) fail("PNG: IDAT before IHDR")
          idat.write(b, i + 8, n)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks (and a suggested PLTE) carry no pixels
      }
      i += 12 + n
    }
    if (!seenIhdr) fail("PNG: missing IHDR")
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 4 => 2; case _ => 4
    }
    // filtered stream: h rows of (1 filter byte + w*channels samples)
    val rowLen = w.toLong * channels
    val rawLen = (rowLen + 1) * h
    // gate the OUTPUT size too: for gray (1 channel) the RGB output is 3×
    // the filtered stream, so a decompression-bomb 30000×30000 gray PNG
    // passes the rawLen gate yet wraps w*h*3 in Int — the decodeBmp
    // negative-allocation hazard; MaxPixels bounds the allocation itself,
    // not just the Int arithmetic (a 25000×25000 header passes the
    // overflow check but still buys a ~2 GB buffer)
    if (rawLen > Int.MaxValue || w.toLong * h > MaxPixels)
      fail(s"PNG: image too large (${w}x$h)")
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inf.finished()) {
        val k = inf.inflate(raw, got, raw.length - got)
        if (k == 0 && inf.needsInput())
          fail(s"PNG: truncated pixel data ($got of ${raw.length} bytes)")
        got += k
      }
      if (got < raw.length)
        fail(s"PNG: truncated pixel data ($got of ${raw.length} bytes)")
    } catch {
      case e: java.util.zip.DataFormatException =>
        fail(s"PNG: corrupt zlib stream (${e.getMessage})")
    } finally inf.end()
    // unfilter in place, then map channels to RGB. a = left, b = up,
    // c = up-left; all mod-256 unsigned arithmetic per the spec
    val stride = rowLen.toInt
    val out = new Array[Byte](w * h * 3)
    var row = 0
    while (row < h) {
      val base = row * (stride + 1)
      val filter = raw(base) & 0xff
      var x = 0
      while (x < stride) {
        val cur = base + 1 + x
        val left = if (x >= channels) raw(cur - channels) & 0xff else 0
        val up = if (row > 0) raw(cur - stride - 1) & 0xff else 0
        val upLeft =
          if (row > 0 && x >= channels) raw(cur - stride - 1 - channels) & 0xff
          else 0
        val recon = filter match {
          case 0 => raw(cur) & 0xff
          case 1 => (raw(cur) & 0xff) + left
          case 2 => (raw(cur) & 0xff) + up
          case 3 => (raw(cur) & 0xff) + (left + up) / 2
          case 4 => // Paeth predictor
            val p = left + up - upLeft
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - upLeft)
            val pred = if (pa <= pb && pa <= pc) left
              else if (pb <= pc) up else upLeft
            (raw(cur) & 0xff) + pred
          case f => fail(s"PNG: unknown filter type $f in row $row")
        }
        raw(cur) = (recon & 0xff).toByte
        x += 1
      }
      var px = 0
      while (px < w) {
        val s = base + 1 + px * channels
        val o = (row * w + px) * 3
        if (channels >= 3) {
          out(o) = raw(s); out(o + 1) = raw(s + 1); out(o + 2) = raw(s + 2)
        } else {
          out(o) = raw(s); out(o + 1) = raw(s); out(o + 2) = raw(s)
        }
        px += 1
      }
      row += 1
    }
    DecodedMedia(w, h, 1, out)
  }
}

/** Deterministic fake decode: dimensions derived from the blob digest, "pixels" are
  * the blob bytes themselves. Matches the arithmetic the m1 oracle reproduces. */
object FakeCodec extends MediaCodec {
  def decode(blob: Array[Byte]): DecodedMedia = {
    val hex = java.security.MessageDigest.getInstance("MD5").digest(blob)
      .map("%02x".format(_)).mkString
    def nibble(i: Int): Int = Integer.parseInt(hex.substring(i, i + 1), 16)
    DecodedMedia(16 * (1 + nibble(0)), 16 * (1 + nibble(1)), 1 + nibble(2), blob)
  }
}

case class MediaFeature(doc_id: Long, n_frames: Int, n_pixels: Int, features: Array[Float])

/** Multimodal-column operators: image/audio/video as opaque BINARY plus typed
  * metadata. Pattern notes for 100 TB:
  *  - metadata extraction ([[mediaMeta]]) is pure column arithmetic — stays in
  *    whole-stage codegen, blobs never leave the scan projection that needs them;
  *  - feature extraction ([[mediaFeatures]]) is the imperative kernel: a
  *    `mapPartitions` that drains each partition in fixed-size batches (the JVM
  *    analog of `mapInPandas`' Arrow batches) so a vectorized decoder can amortize
  *    per-batch setup; batch boundaries must never change results (spec-enforced).
  */
object Media {

  /** Dress the documents table as a media-asset table: the text bytes play the
    * opaque blob. mime fans out by doc_id so all three modalities exercise. */
  def assets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("blob"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"))

  /** m1 — "decode" the typed metadata from the blob: byte size plus
    * digest-derived fake dimensions (FakeCodec's arithmetic, kept SQL-expressible:
    * conv(hex-nibble) here == strpos('0123456789abcdef', nibble)-1 in the oracle).
    * Frame sampling keeps min(n_frames, 4) frames. */
  def mediaMeta(docs: DataFrame): DataFrame = {
    val a = assets(docs).withColumn("hx", md5(col("blob")))
    def nib(i: Int) = conv(substring(col("hx"), i, 1), 16, 10).cast("int")
    a.select(col("doc_id"), col("mime"),
      octet_length(col("blob")).as("n_bytes"),
      (lit(16) * (nib(1) + 1)).as("width"),
      (lit(16) * (nib(2) + 1)).as("height"),
      (nib(3) + 1).as("n_frames"),
      least(nib(3) + 1, lit(4)).as("sampled_frames"))
  }

  /** m3 — deterministic frame sampling: up to `maxFrames` evenly-spaced frames
    * per asset, each addressing its byte range inside the opaque blob (the
    * Spark-side plumbing of a video frame sampler: a real pipeline hands
    * `(blob, frame_offset, frame_len)` to the decode kernel). All arithmetic is
    * integer `div`, so the oracle reproduces it exactly; one `explode` of at
    * most `maxFrames` indices per row, no shuffle, no UDF. */
  def frameSample(docs: DataFrame, maxFrames: Int = 4): DataFrame =
    mediaMeta(docs)
      .select(col("doc_id"), col("mime"), col("n_frames"), col("n_bytes"),
        col("sampled_frames"),
        explode(sequence(lit(0), col("sampled_frames") - 1)).as("sample_idx"))
      .withColumn("frame_no",
        expr("(sample_idx * n_frames) div sampled_frames"))
      .withColumn("frame_offset", expr("(frame_no * n_bytes) div n_frames"))
      .withColumn("frame_len",
        expr("((frame_no + 1) * n_bytes) div n_frames") - col("frame_offset"))
      .select(col("doc_id"), col("mime"), col("sample_idx"), col("frame_no"),
        col("frame_offset"), col("frame_len"))

  /** m4 — aspect-preserving resize planning: target dimensions for fitting each
    * asset inside `maxW`×`maxH` without upscaling. Pure integer
    * cross-multiplication (`div`), so the oracle reproduces every rounding
    * decision exactly; the actual pixel resample would run in the codec kernel
    * (m2's mapPartitions shape) — THIS op is the metadata plan a pipeline
    * computes first to budget the decode work. Narrow, codegen'd, no shuffle. */
  def resizePlan(docs: DataFrame, maxW: Int = 128, maxH: Int = 96): DataFrame =
    mediaMeta(docs)
      .withColumn("fits", col("width") <= maxW && col("height") <= maxH)
      // width-bound scaling keeps aspect iff the scaled height still fits
      .withColumn("by_w_h", expr(s"(height * $maxW) div width"))
      .withColumn("out_width",
        when(col("fits"), col("width"))
          .when(col("by_w_h") <= maxH, lit(maxW))
          .otherwise(expr(s"(width * $maxH) div height")))
      .withColumn("out_height",
        when(col("fits"), col("height"))
          .when(col("by_w_h") <= maxH, col("by_w_h"))
          .otherwise(lit(maxH)))
      .select(col("doc_id"), col("mime"), col("width"), col("height"),
        col("out_width"), col("out_height"),
        (col("out_width") * col("out_height")).as("out_pixels"))

  /** m2 — batched feature extraction through the codec SPI. Features: 8 floats,
    * each the mean of one stride-8 slice of the decoded bytes — deterministic,
    * cheap, and shaped like a real embedding head. */
  def mediaFeatures(spark: SparkSession, docs: DataFrame,
      codec: MediaCodec = FakeCodec, batchSize: Int = 64): Dataset[MediaFeature] = {
    import spark.implicits._
    // a NULL blob (NULL source text) is an undecodable asset: no features
    // row, rather than an NPE inside the codec kernel — the m2 oracle
    // mirrors with WHERE text IS NOT NULL. Filtered on the INPUT (blob is
    // NULL iff text is — encode is null-intolerant): a blob-side filter
    // would push the encode expression scan-side and re-evaluate it (the
    // winnowFingerprint lesson)
    assets(docs.filter(col("text").isNotNull))
      .select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one "vectorized" decode call-site per batch (mapInPandas analog)
          batch.map { case (id, blob) =>
            val d = codec.decode(blob)
            val px = d.pixels
            // one unboxed pass, Long accumulators: the 8-way boxed
            // `indices.collect` walked the array 8 times, and an Int sum
            // wraps negative past ~67 MB of high-valued bytes — a silently
            // corrupt "mean" from the kernel positioned as the batched
            // vectorized decode path
            val sums = new Array[Long](8)
            val ns = new Array[Long](8)
            var i = 0
            while (i < px.length) {
              val f = i % 8
              sums(f) += px(i) & 0xff
              ns(f) += 1
              i += 1
            }
            // same float-division sequence as before (sum.toFloat / n), so
            // in-range values stay bit-identical to the oracle's FLOAT math
            val feats = Array.tabulate(8) { f =>
              if (ns(f) == 0) 0f else sums(f).toFloat / ns(f)
            }
            MediaFeature(id, d.nFrames, px.length, feats)
          }
        }
      }
  }
}
