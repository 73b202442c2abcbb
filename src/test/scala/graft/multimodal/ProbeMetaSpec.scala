package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** [[RealCodec.probeMeta]] — the pure-JVM MP4 box walk / Matroska EBML walk
  * for video-container header metadata (dimensions, duration, codec id),
  * against hand-built synthetic headers. Pixel decode for these formats
  * stays on [[RealCodec.decode]]'s loud-fail path (spec'd there); this pins
  * the metadata plane M1 actually needs from a crawl's video bytes. */
class ProbeMetaSpec extends AnyFunSuite with Matchers {

  // ---- MP4 fixture builders -------------------------------------------

  private def be32(v: Long): Array[Byte] = Array(
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body
  }

  private def ftyp: Array[Byte] =
    box("ftyp", "isom".getBytes, be32(0), "isom".getBytes)

  private def mvhd(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", be32(0) /* v0 + flags */, be32(0), be32(0),
      be32(timescale), be32(duration),
      Array.fill[Byte](80)(0) /* rate..pre_defined */)

  private def tkhd(w: Int, h: Int): Array[Byte] =
    box("tkhd", be32(0), be32(0), be32(0), be32(1) /* track id */,
      be32(0), be32(0) /* duration */, Array.fill[Byte](8)(0),
      Array.fill[Byte](8)(0) /* layer/group/volume/reserved */,
      Array.fill[Byte](36)(0) /* matrix */,
      be32(w.toLong << 16), be32(h.toLong << 16))

  private def stsd(fourcc: String): Array[Byte] =
    box("stsd", be32(0), be32(1) /* entry_count */,
      box(fourcc, Array.fill[Byte](8)(0)))

  private def trak(w: Int, h: Int, fourcc: String): Array[Byte] =
    box("trak", tkhd(w, h), box("mdia", box("minf", box("stbl", stsd(fourcc)))))

  // ---- EBML fixture builders ------------------------------------------

  private def ebmlId(id: Long): Array[Byte] = {
    val n = if (id <= 0xff) 1 else if (id <= 0xffff) 2
      else if (id <= 0xffffff) 3 else 4
    (0 until n).reverse.map(k => ((id >> (8 * k)) & 0xff).toByte).toArray
  }

  private def ebmlSize(len: Int): Array[Byte] = {
    require(len <= 126, "fixture sizes stay 1-byte")
    Array((0x80 | len).toByte)
  }

  private def el(id: Long, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    ebmlId(id) ++ ebmlSize(body.length) ++ body
  }

  private def uintEl(id: Long, v: Long): Array[Byte] = {
    var n = 1
    while ((v >> (8 * n)) != 0) n += 1
    el(id, (0 until n).reverse.map(k => ((v >> (8 * k)) & 0xff).toByte).toArray)
  }

  private def floatEl(id: Long, v: Float): Array[Byte] =
    el(id, be32(java.lang.Float.floatToIntBits(v) & 0xffffffffL))

  private val ebmlHeader = el(0x1a45dfa3L, Array[Byte](0x42, 0x86.toByte,
    0x81.toByte, 1)) // EBMLVersion 1 — any payload works, the walk skips it

  // ---- tests -----------------------------------------------------------

  test("MP4: mvhd duration, first VIDEO track's tkhd dims and stsd fourcc " +
      "(an earlier audio track neither sizes nor names the codec)") {
    val b = ftyp ++ box("moov",
      mvhd(timescale = 1000, duration = 5000),
      trak(0, 0, "mp4a"), // audio: zero tkhd dims
      trak(640, 360, "avc1"))
    val m = RealCodec.probeMeta(b)
    m shouldBe ProbedMeta("mp4", 640, 360, 5000L, "avc1")
  }

  test("MP4: version-1 mvhd (64-bit times) and largesize boxes parse") {
    val mvhd1 = box("mvhd", be32(1L << 24) /* v1 */, Array.fill[Byte](16)(0),
      be32(90000) /* timescale */,
      be32(0) ++ be32(180000) /* 64-bit duration = 2 s */,
      Array.fill[Byte](80)(0))
    val moov = box("moov", mvhd1, trak(1920, 1080, "hvc1"))
    // rewrap moov as a largesize box: size=1 marker + 64-bit size
    val large = be32(1) ++ "moov".getBytes ++ be32(0) ++
      be32(moov.length + 8L) ++ moov.drop(8)
    val m = RealCodec.probeMeta(ftyp ++ large)
    m shouldBe ProbedMeta("mp4", 1920, 1080, 2000L, "hvc1")
  }

  test("MP4: metadata-free fragment reports -1/null, never invents fields") {
    val m = RealCodec.probeMeta(ftyp ++ box("moov"))
    m shouldBe ProbedMeta("mp4", -1, -1, -1L, null)
  }

  test("MP4: a box overrunning its parent fails loudly") {
    val bad = ftyp ++ box("moov", be32(9999), "trak".getBytes)
    val e = intercept[IllegalArgumentException](RealCodec.probeMeta(bad))
    e.getMessage should include("overruns")
  }

  test("MKV: TimestampScale x Duration -> ms; video TrackEntry wins over " +
      "audio; PixelWidth/PixelHeight from its Video element") {
    val b = ebmlHeader ++ el(0x18538067L, // Segment
      el(0x1549a966L, // Info
        uintEl(0x2ad7b1L, 1000000L), floatEl(0x4489L, 2500.0f)),
      el(0x1654ae6bL, // Tracks
        el(0xaeL, uintEl(0x83L, 2), el(0x86L, "A_OPUS".getBytes)),
        el(0xaeL, uintEl(0x83L, 1), el(0x86L, "V_VP9".getBytes),
          el(0xe0L, uintEl(0xb0L, 1280), uintEl(0xbaL, 720)))))
    val m = RealCodec.probeMeta(b)
    m shouldBe ProbedMeta("mkv", 1280, 720, 2500L, "V_VP9")
  }

  test("MKV: an unknown-size Segment (the streaming convention) extends to " +
      "the end of the buffer") {
    val body = el(0x1549a966L,
      uintEl(0x2ad7b1L, 1000000L), floatEl(0x4489L, 750.0f))
    val seg = ebmlId(0x18538067L) ++ Array(0xff.toByte) ++ body
    val m = RealCodec.probeMeta(ebmlHeader ++ seg)
    m.durationMs shouldBe 750L
  }

  test("MKV: an element overrunning its parent fails loudly") {
    val bad = ebmlHeader ++ ebmlId(0x18538067L) ++ ebmlSize(3) ++
      ebmlId(0x1549a966L) // id alone claims past the 3-byte segment
    val e = intercept[IllegalArgumentException](RealCodec.probeMeta(bad))
    e.getMessage should (include("overruns") or include("truncated"))
  }

  test("non-container magics fail loudly and point at decode()") {
    // PPM: a still format whose metadata plane stays on the decode tier
    val ppm = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array.fill[Byte](12)(7)
    val e = intercept[UnsupportedOperationException](RealCodec.probeMeta(ppm))
    e.getMessage should include("decode()")
  }

  // ---- still-image header probes (JPEG / PNG / GIF) --------------------

  private def jpegSeg(marker: Int, payload: Array[Byte]): Array[Byte] =
    Array(0xff.toByte, marker.toByte,
      ((payload.length + 2) >> 8).toByte, ((payload.length + 2) & 0xff).toByte
    ) ++ payload

  private def sof(marker: Int, w: Int, h: Int): Array[Byte] =
    jpegSeg(marker, Array[Byte](8 /* precision */,
      (h >> 8).toByte, (h & 0xff).toByte, (w >> 8).toByte, (w & 0xff).toByte,
      3 /* components */) ++ Array.fill[Byte](9)(0x11))

  test("JPEG: the SOF walk skips APPn/DQT/fill bytes and reads baseline, " +
      "extended, and progressive dimensions") {
    val soi = Array(0xff.toByte, 0xd8.toByte)
    val app0 = jpegSeg(0xe0, "JFIF".getBytes ++ Array.fill[Byte](10)(0))
    val dqt = jpegSeg(0xdb, Array.fill[Byte](65)(1))
    val fill = Array(0xff.toByte) // legal padding before the next marker
    val base = RealCodec.probeMeta(
      soi ++ app0 ++ dqt ++ fill ++ sof(0xc0, 640, 480))
    (base.format, base.width, base.height, base.durationMs, base.codec)
      .shouldBe(("jpeg", 640, 480, -1L, "jpeg-baseline"))
    RealCodec.probeMeta(soi ++ sof(0xc2, 31, 17)).codec shouldBe
      "jpeg-progressive"
    RealCodec.probeMeta(soi ++ sof(0xc1, 8, 8)).codec shouldBe
      "jpeg-extended"
  }

  test("JPEG structural lies fail loudly: EOI/SOS before any SOF, a " +
      "segment overrunning the buffer, an exotic SOF flavor, zero dims") {
    val soi = Array(0xff.toByte, 0xd8.toByte)
    val eoi = Array(0xff.toByte, 0xd9.toByte)
    val sos = jpegSeg(0xda, Array.fill[Byte](10)(0))
    intercept[IllegalArgumentException](RealCodec.probeMeta(soi ++ eoi))
      .getMessage should include("EOI")
    intercept[IllegalArgumentException](RealCodec.probeMeta(soi ++ sos))
      .getMessage should include("SOS")
    val overrun = soi ++ Array(0xff.toByte, 0xe0.toByte, 0x7f.toByte, 0xff.toByte)
    intercept[IllegalArgumentException](RealCodec.probeMeta(overrun))
      .getMessage should include("overruns")
    intercept[IllegalArgumentException](
      RealCodec.probeMeta(soi ++ sof(0xc3, 8, 8)))
      .getMessage should include("SOF3")
    intercept[IllegalArgumentException](
      RealCodec.probeMeta(soi ++ sof(0xc0, 0, 8)))
      .getMessage should include("dimensions")
    intercept[IllegalArgumentException](RealCodec.probeMeta(soi))
      .getMessage should include("truncated")
  }

  private def pngBytes(w: Int, h: Int, depth: Int, colorType: Int,
      corruptCrc: Boolean = false): Array[Byte] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val ihdr = be32(w.toLong) ++ be32(h.toLong) ++
      Array(depth.toByte, colorType.toByte, 0.toByte, 0.toByte, 0.toByte)
    val typed = "IHDR".getBytes("US-ASCII") ++ ihdr
    val crc = new java.util.zip.CRC32()
    crc.update(typed, 0, typed.length)
    val crcV = if (corruptCrc) crc.getValue ^ 0xdeadL else crc.getValue
    sig ++ be32(13L) ++ typed ++ be32(crcV) ++
      be32(0L) ++ "IEND".getBytes("US-ASCII") ++ be32(0L)
  }

  test("PNG: CRC-verified IHDR gives dimensions and the pixel layout as " +
      "codec; corruption and unknown color types fail loudly") {
    val p = RealCodec.probeMeta(pngBytes(320, 200, 8, 6))
    (p.format, p.width, p.height, p.durationMs, p.codec) shouldBe
      (("png", 320, 200, -1L, "rgba8"))
    RealCodec.probeMeta(pngBytes(9, 9, 16, 2)).codec shouldBe "rgb16"
    RealCodec.probeMeta(pngBytes(9, 9, 8, 3)).codec shouldBe "palette8"
    intercept[IllegalArgumentException](
      RealCodec.probeMeta(pngBytes(320, 200, 8, 6, corruptCrc = true)))
      .getMessage should include("CRC")
    intercept[IllegalArgumentException](
      RealCodec.probeMeta(pngBytes(9, 9, 8, 5)))
      .getMessage should include("color type")
    intercept[IllegalArgumentException](
      RealCodec.probeMeta(pngBytes(9, 9, 8, 6).take(20)))
      .getMessage should include("truncated")
  }

  test("GIF: the logical screen descriptor gives the canvas, the " +
      "signature version the codec; truncation and zero dims fail loudly") {
    def gif(ver: String, w: Int, h: Int): Array[Byte] =
      s"GIF$ver".getBytes("US-ASCII") ++ Array(
        (w & 0xff).toByte, (w >> 8).toByte,
        (h & 0xff).toByte, (h >> 8).toByte,
        0.toByte, 0.toByte, 0.toByte)
    val g = RealCodec.probeMeta(gif("89a", 1024, 768))
    (g.format, g.width, g.height, g.durationMs, g.codec) shouldBe
      (("gif", 1024, 768, -1L, "gif89a"))
    RealCodec.probeMeta(gif("87a", 2, 3)).codec shouldBe "gif87a"
    intercept[IllegalArgumentException](
      RealCodec.probeMeta(gif("89a", 5, 5).take(10)))
      .getMessage should include("truncated")
    intercept[IllegalArgumentException](
      RealCodec.probeMeta(gif("89a", 0, 5)))
      .getMessage should include("dimensions")
  }

  test("FLAC: STREAMINFO gives channels, rate, and exact duration; a " +
      "zero sample count (live stream) reports -1") {
    def flac(rate: Int, channels: Int, samples: Long): Array[Byte] = {
      val si = new Array[Byte](34)
      si(10) = ((rate >> 12) & 0xff).toByte
      si(11) = ((rate >> 4) & 0xff).toByte
      si(12) = (((rate & 0xf) << 4) | ((channels - 1) << 1)).toByte
      si(13) = ((samples >> 32) & 0x0f).toByte
      si(14) = ((samples >> 24) & 0xff).toByte
      si(15) = ((samples >> 16) & 0xff).toByte
      si(16) = ((samples >> 8) & 0xff).toByte
      si(17) = (samples & 0xff).toByte
      "fLaC".getBytes ++ Array[Byte](0x80.toByte, 0, 0, 34) ++ si
    }
    val m = RealCodec.probeMeta(flac(44100, 2, 44100L * 61))
    (m.format, m.width, m.height, m.codec) shouldBe (("flac", 2, 44100, "flac"))
    m.durationMs shouldBe 61000L
    RealCodec.probeMeta(flac(48000, 1, 0)).durationMs shouldBe -1L
    // first block not STREAMINFO -> loud
    val bad = "fLaC".getBytes ++ Array[Byte](4, 0, 0, 34) ++ new Array[Byte](34)
    an[IllegalArgumentException] should be thrownBy RealCodec.probeMeta(bad)
  }

  // ---- OGG fixture builder: one page (CRC left zero — the probe is a
  // metadata walk, not an integrity pass) ------------------------------
  private def oggPage(granule: Long, serial: Long, bos: Boolean,
      payload: Array[Byte]): Array[Byte] = {
    require(payload.length < 255 * 255, "fixture pages stay small")
    val segs = Array.fill(payload.length / 255)(255.toByte) :+
      (payload.length % 255).toByte
    def le32(v: Long): Array[Byte] = Array(
      v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le64(v: Long): Array[Byte] = le32(v & 0xffffffffL) ++ le32(v >>> 32)
    "OggS".getBytes ++ Array[Byte](0, if (bos) 0x02 else 0x00) ++
      le64(granule) ++ le32(serial) ++ le32(0) /* page seq */ ++
      le32(0) /* crc unchecked */ ++ Array(segs.length.toByte) ++
      segs ++ payload
  }

  private def vorbisId(channels: Int, rate: Int): Array[Byte] =
    Array[Byte](1) ++ "vorbis".getBytes ++ be32(0).reverse /* version LE */ ++
      Array(channels.toByte) ++ Array(
        rate.toByte, (rate >> 8).toByte, (rate >> 16).toByte,
        (rate >> 24).toByte) ++ new Array[Byte](13) // bitrates/blocksizes

  private def opusHead(channels: Int, preSkip: Int): Array[Byte] =
    "OpusHead".getBytes ++ Array[Byte](1) ++ Array(channels.toByte) ++
      Array(preSkip.toByte, (preSkip >> 8).toByte) ++
      new Array[Byte](7) // input rate + gain + mapping family

  test("OGG/Vorbis: BOS identification header gives channels/rate, the " +
      "last granule the exact duration; -1-granule continuation pages skip") {
    val blob =
      oggPage(-1L, 7L, bos = true, vorbisId(2, 44100)) ++
      oggPage(-1L, 7L, bos = false, new Array[Byte](40)) ++
      oggPage(44100L * 3, 7L, bos = false, new Array[Byte](10)) ++
      oggPage(44100L * 61, 7L, bos = false, new Array[Byte](10))
    val m = RealCodec.probeMeta(blob)
    (m.format, m.width, m.height, m.codec) shouldBe (("ogg", 2, 44100, "vorbis"))
    m.durationMs shouldBe 61000L
    // a header-only stream (no granule yet) reports -1, never invents one
    RealCodec.probeMeta(oggPage(-1L, 7L, bos = true, vorbisId(1, 8000)))
      .durationMs shouldBe -1L
  }

  test("OGG/Opus: granules tick at 48 kHz whatever the input-rate field " +
      "says, and pre-skip subtracts from the duration") {
    val blob =
      oggPage(-1L, 3L, bos = true, opusHead(1, 312)) ++
      oggPage(48000L * 2 + 312, 3L, bos = false, new Array[Byte](20))
    val m = RealCodec.probeMeta(blob)
    (m.format, m.width, m.height, m.codec) shouldBe (("ogg", 1, 48000, "opus"))
    m.durationMs shouldBe 2000L
    // a foreign stream's granule must not price this stream's duration
    val mixed = oggPage(-1L, 3L, bos = true, opusHead(1, 0)) ++
      oggPage(999999999L, 4L, bos = false, new Array[Byte](5)) ++
      oggPage(48000L, 3L, bos = false, new Array[Byte](5))
    RealCodec.probeMeta(mixed).durationMs shouldBe 1000L
  }

  test("OGG: structural lies fail loudly — a non-audio BOS codec, a " +
      "truncated segment table, an overrunning payload") {
    val theora = oggPage(-1L, 5L, bos = true,
      Array[Byte](0x80.toByte) ++ "theora".getBytes ++ new Array[Byte](9))
    val e = intercept[IllegalArgumentException](RealCodec.probeMeta(theora))
    e.getMessage should include("theora")
    val good = oggPage(-1L, 7L, bos = true, vorbisId(2, 44100))
    an[IllegalArgumentException] should be thrownBy
      RealCodec.probeMeta(good.take(good.length - 3)) // payload overrun
    an[IllegalArgumentException] should be thrownBy
      RealCodec.probeMeta(good.take(27)) // inside the segment table
    an[IllegalArgumentException] should be thrownBy
      RealCodec.probeMeta(good ++ "OggX".getBytes ++ new Array[Byte](23))
  }

  test("MP3: ID3 skip + frame header parse; Xing frame count gives exact " +
      "duration, plain CBR estimates from size x bitrate") {
    // MPEG-1 Layer III, 128 kbit (idx 9), 44100 (idx 0), stereo (mode 0)
    val hdr = Array(0xff, 0xfb, 0x90, 0x00).map(_.toByte)
    def id3(size: Int): Array[Byte] =
      "ID3".getBytes ++ Array[Byte](3, 0, 0) ++ Array(
        ((size >> 21) & 0x7f).toByte, ((size >> 14) & 0x7f).toByte,
        ((size >> 7) & 0x7f).toByte, (size & 0x7f).toByte) ++
        new Array[Byte](size)
    // Xing at 4 + 32 (stereo side info): "Xing", flags=1 (frames), count
    val frames = 1000L
    val xing = new Array[Byte](32) ++ "Xing".getBytes ++
      Array[Byte](0, 0, 0, 1) ++ Array(
        ((frames >> 24) & 0xff).toByte, ((frames >> 16) & 0xff).toByte,
        ((frames >> 8) & 0xff).toByte, (frames & 0xff).toByte)
    val vbr = RealCodec.probeMeta(id3(37) ++ hdr ++ xing)
    (vbr.format, vbr.width, vbr.height, vbr.codec) shouldBe
      (("mp3", 2, 44100, "mp3"))
    vbr.durationMs shouldBe frames * 1152L * 1000 / 44100
    // plain CBR: 16000 audio bytes at 128 kbit/s = 1000 ms
    val cbr = RealCodec.probeMeta(hdr ++ new Array[Byte](16000 - 4))
    cbr.durationMs shouldBe 1000L
    // MPEG-2 (version bits 10) is the loud-fail surface
    val v2 = Array(0xff, 0xf3, 0x90, 0x00).map(_.toByte)
    an[IllegalArgumentException] should be thrownBy RealCodec.probeMeta(v2)
  }

  // ---- WebP fixture builder -------------------------------------------

  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >> 8).toByte)
  private def le24(v: Int): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte)
  private def le32(v: Long): Array[Byte] = Array(
    v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  private def webp(fourcc: String, payload: Array[Byte]): Array[Byte] =
    "RIFF".getBytes ++ le32(payload.length + 12L) ++ "WEBP".getBytes ++
      fourcc.getBytes("US-ASCII") ++ le32(payload.length.toLong) ++ payload

  test("WEBP: VP8 key frame gives 14-bit dims; VP8L packs dims-1 in one " +
      "LE word; VP8X reports the 24-bit canvas") {
    // VP8: 3-byte frame tag (keyframe bit 0 = 0), start code, w, h
    val vp8 = webp("VP8 ", Array[Byte](0x30, 0, 0) ++
      Array(0x9d, 0x01, 0x2a).map(_.toByte) ++ le16(640) ++ le16(360))
    val m = RealCodec.probeMeta(vp8)
    (m.format, m.width, m.height, m.durationMs, m.codec) shouldBe
      (("webp", 640, 360, -1L, "vp8"))
    // VP8L: 0x2f, then (w-1) | (h-1)<<14 | alpha<<28 | version<<29
    val bits = (511L - 1) | ((256L - 1) << 14) | (1L << 28)
    val vp8l = webp("VP8L", Array[Byte](0x2f) ++ le32(bits))
    val l = RealCodec.probeMeta(vp8l)
    (l.format, l.width, l.height, l.codec) shouldBe (("webp", 511, 256, "vp8l"))
    // VP8X: 4 flag/reserved bytes, then canvas w-1 / h-1 as 24-bit LE
    val vp8x = webp("VP8X", Array[Byte](0x10, 0, 0, 0) ++
      le24(1920 - 1) ++ le24(1080 - 1))
    val x = RealCodec.probeMeta(vp8x)
    (x.format, x.width, x.height, x.codec) shouldBe (("webp", 1920, 1080, "vp8x"))
  }

  test("WEBP: structural lies fail loudly — missing start code, bad VP8L " +
      "signature/version, unknown first chunk, overrunning chunk") {
    val noStart = webp("VP8 ", Array[Byte](0x30, 0, 0, 0x11, 0x22, 0x33) ++
      le16(10) ++ le16(10))
    intercept[IllegalArgumentException](RealCodec.probeMeta(noStart))
      .getMessage should include("start code")
    val badSig = webp("VP8L", Array[Byte](0x30) ++ le32(0L))
    intercept[IllegalArgumentException](RealCodec.probeMeta(badSig))
      .getMessage should include("signature")
    val badVer = webp("VP8L", Array[Byte](0x2f) ++ le32(5L << 29))
    intercept[IllegalArgumentException](RealCodec.probeMeta(badVer))
      .getMessage should include("version")
    val anim = webp("ANIM", new Array[Byte](6))
    intercept[IllegalArgumentException](RealCodec.probeMeta(anim))
      .getMessage should include("ANIM")
    val short = webp("VP8 ", Array[Byte](0x30, 0, 0) ++
      Array(0x9d, 0x01, 0x2a).map(_.toByte) ++ le16(10) ++ le16(10))
    an[IllegalArgumentException] should be thrownBy
      RealCodec.probeMeta(short.take(short.length - 2)) // chunk overrun
  }

  // ---- ICO fixture builder --------------------------------------------

  private def ico(entries: Seq[(Int, Int, Array[Byte])]): Array[Byte] = {
    val dirLen = 6 + 16 * entries.length
    var off = dirLen
    val dir = entries.flatMap { case (w, h, payload) =>
      val e = Array[Byte](
        (if (w == 256) 0 else w).toByte, (if (h == 256) 0 else h).toByte,
        0, 0, 1, 0, 32, 0) ++ le32(payload.length.toLong) ++ le32(off.toLong)
      off += payload.length
      e
    }
    Array[Byte](0, 0, 1, 0) ++ le16(entries.length) ++ dir ++
      entries.flatMap(_._3)
  }

  test("ICO: the largest entry wins (0 byte = 256), codec from the " +
      "payload magic; lying offsets and empty dirs fail loudly") {
    val pngPayload = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte) ++ new Array[Byte](8)
    val dibPayload = le32(40L) ++ new Array[Byte](36) // BITMAPINFOHEADER
    val m = RealCodec.probeMeta(ico(Seq((16, 16, dibPayload),
      (256, 256, pngPayload), (48, 48, dibPayload))))
    (m.format, m.width, m.height, m.durationMs, m.codec) shouldBe
      (("ico", 256, 256, -1L, "png"))
    val d = RealCodec.probeMeta(ico(Seq((32, 32, dibPayload))))
    (d.width, d.height, d.codec) shouldBe ((32, 32, "dib"))
    // empty directory
    an[IllegalArgumentException] should be thrownBy
      RealCodec.probeMeta(Array[Byte](0, 0, 1, 0, 0, 0))
    // entry payload overruns the buffer
    val lying = ico(Seq((16, 16, dibPayload))).dropRight(4)
    an[IllegalArgumentException] should be thrownBy RealCodec.probeMeta(lying)
    // neither PNG nor DIB payload
    an[IllegalArgumentException] should be thrownBy
      RealCodec.probeMeta(ico(Seq((16, 16, new Array[Byte](16)))))
    // a CUR (type=2) never dispatches to the ICO walk: generic loud-fail
    val cur = Array[Byte](0, 0, 2, 0, 1, 0) ++ new Array[Byte](16)
    an[UnsupportedOperationException] should be thrownBy
      RealCodec.probeMeta(cur)
  }
}
