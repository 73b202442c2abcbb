package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** RealCodec decodes every still-image format this JVM can — hand-rolled
  * verified PPM/BMP/PNG plus the JDK ImageIO tier for JPEG/GIF/TIFF and the
  * exotic PNG/BMP variants — normalizes all of them to top-down RGB, fails
  * loudly on video/audio containers and corrupt streams, and drives
  * [[Media.mediaFeatures]]'s batched SPI end-to-end with a REAL decode (not
  * the FakeCodec stand-in). The hand-rolled PNG path is cross-checked
  * bit-for-bit against the JDK's independent PNG encoder. */
class RealCodecSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ppm(w: Int, h: Int, pixels: Array[Byte],
      comment: Boolean = false): Array[Byte] = {
    val header = s"P6\n${if (comment) "# synthetic\n" else ""}$w $h\n255\n"
    header.getBytes("US-ASCII") ++ pixels
  }

  test("binary PPM decodes: dimensions, single frame, raw RGB, comments ok") {
    val px = Array.tabulate[Byte](12)(_.toByte)
    val d = RealCodec.decode(ppm(2, 2, px, comment = true))
    (d.width, d.height, d.nFrames) shouldBe ((2, 2, 1))
    d.pixels.toSeq shouldBe px.toSeq
  }

  /** Minimal BITMAPINFOHEADER 24-bit BMP: bottom-up BGR rows, 4-byte row
    * padding. `rgb` is the logical TOP-DOWN row-major RGB image. */
  private def bmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](54 + stride * h)
    def put32(off: Int, v: Int): Unit = (0 until 4).foreach(k =>
      out(off + k) = ((v >> (8 * k)) & 0xff).toByte)
    out(0) = 'B'; out(1) = 'M'
    put32(2, out.length); put32(10, 54); put32(14, 40)
    put32(18, w); put32(22, h)
    out(26) = 1; out(28) = 24 // planes, depth
    for (row <- 0 until h; x <- 0 until w) {
      val src = (row * w + x) * 3
      val dst = 54 + (h - 1 - row) * stride + x * 3 // bottom-up
      out(dst) = rgb(src + 2)     // B
      out(dst + 1) = rgb(src + 1) // G
      out(dst + 2) = rgb(src)     // R
    }
    out
  }

  test("24-bit BMP decodes: padding stripped, rows flipped, BGR -> RGB") {
    val rgb = Array.tabulate[Byte](3 * 2 * 3)(i => (i * 7).toByte)
    val d = RealCodec.decode(bmp(3, 2, rgb))
    (d.width, d.height, d.nFrames) shouldBe ((3, 2, 1))
    d.pixels.toSeq shouldBe rgb.toSeq
  }

  test("negative-height BMP decodes as already-top-down") {
    val rgb = Array.tabulate[Byte](3 * 2 * 3)(i => (i * 7).toByte)
    val b = bmp(3, 2, rgb)
    // flip to a top-down file: height -2, rows already in logical order
    def put32(off: Int, v: Int): Unit = (0 until 4).foreach(k =>
      b(off + k) = ((v >> (8 * k)) & 0xff).toByte)
    put32(22, -2)
    val stride = 12
    val flipped = b.clone()
    for (row <- 0 until 2; k <- 0 until stride)
      flipped(54 + row * stride + k) = b(54 + (1 - row) * stride + k)
    val d = RealCodec.decode(flipped)
    (d.width, d.height) shouldBe ((3, 2))
    d.pixels.toSeq shouldBe rgb.toSeq
  }

  test("PPM samples rescale to the 0..255 layout for maxval < 255") {
    // per the spec, sample/maxval is the intensity: (1,1,1) at maxval 1 is
    // a WHITE pixel, and unscaled pass-through would read it as black
    val d = RealCodec.decode("P6\n1 1\n1\n".getBytes("US-ASCII") ++
      Array[Byte](1, 0, 1))
    d.pixels.toSeq shouldBe Seq(255.toByte, 0.toByte, 255.toByte)
  }

  test("unsupported and malformed inputs fail loudly, never partially") {
    val png = intercept[UnsupportedOperationException] {
      RealCodec.decode(Array[Byte](0x89.toByte, 'P', 'N', 'G'))
    }
    png.getMessage should include("magic 0x89504e47")
    intercept[IllegalArgumentException] { // truncated PPM pixel data
      RealCodec.decode(ppm(4, 4, Array[Byte](1, 2, 3)))
    }.getMessage should include("truncated")
    // crafted Int-overflow headers must hit the loud gates, not a silent
    // partial decode (PPM: 1431655766*3 wraps to 2) or a raw crash
    // (BMP: stride*2^30 wraps to 0, then a negative allocation)
    intercept[IllegalArgumentException] {
      RealCodec.decode("P6\n1431655766 1\n255\n".getBytes("US-ASCII") ++
        Array[Byte](1, 2))
    }.getMessage should include("truncated")
    intercept[IllegalArgumentException] {
      val b = bmp(1, 2, new Array[Byte](6)).padTo(70, 0.toByte)
      def put32(off: Int, v: Int): Unit = (0 until 4).foreach(k =>
        b(off + k) = ((v >> (8 * k)) & 0xff).toByte)
      put32(22, 1 << 30)
      RealCodec.decode(b)
    }.getMessage should include("truncated")
    intercept[IllegalArgumentException] { // negative pixel-data offset
      val b = bmp(2, 2, new Array[Byte](12))
      b(13) = 0x80.toByte
      RealCodec.decode(b)
    }.getMessage should include("offset")
    intercept[IllegalArgumentException] { // zero offset (< the 54-byte header)
      RealCodec.decode(("BM" + "\u0000" * 26).getBytes("ISO-8859-1"))
    }.getMessage should include("offset")
    intercept[IllegalArgumentException] { // header cut before the offset field
      RealCodec.decode(("BM" + "\u0000" * 9).getBytes("ISO-8859-1"))
    }.getMessage should include("truncated header")
    intercept[IllegalArgumentException] { // junk byte where the single
      // post-maxval whitespace belongs would silently shift the raster
      RealCodec.decode("P6\n2 2\n255~".getBytes("US-ASCII") ++
        new Array[Byte](13))
    }.getMessage should include("whitespace")
    intercept[IllegalArgumentException] { // Int.MinValue height: its own
      // abs — it would sail negative through every downstream gate
      val b = bmp(2, 2, new Array[Byte](12))
      def put32(off: Int, v: Int): Unit = (0 until 4).foreach(k =>
        b(off + k) = ((v >> (8 * k)) & 0xff).toByte)
      put32(22, Int.MinValue)
      RealCodec.decode(b)
    }.getMessage should include("bad dimensions")
    intercept[IllegalArgumentException] { // sample above maxval: scaling
      // would wrap through toByte into a silently wrong pixel
      RealCodec.decode("P6\n1 1\n200\n".getBytes("US-ASCII") ++
        Array[Byte](250.toByte, 0, 0))
    }.getMessage should include("exceeds maxval")
  }

  /** Independent PNG encoder (reference filter arithmetic written forward,
    * not shared with the decoder): per-row filter choice, one zlib stream,
    * CRC'd chunks. `pixels` is the raw channel stream (top-down row-major,
    * `channels` samples per pixel). */
  private def png(w: Int, h: Int, colorType: Int, pixels: Array[Byte],
      filterOf: Int => Int, splitIdat: Boolean = false): Array[Byte] = {
    val channels = Map(0 -> 1, 2 -> 3, 4 -> 2, 6 -> 4)(colorType)
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    for (row <- 0 until h) {
      val f = filterOf(row)
      raw(row * (stride + 1)) = f.toByte
      for (x <- 0 until stride) {
        val cur = pixels(row * stride + x) & 0xff
        val left = if (x >= channels) pixels(row * stride + x - channels) & 0xff else 0
        val up = if (row > 0) pixels((row - 1) * stride + x) & 0xff else 0
        val ul = if (row > 0 && x >= channels)
          pixels((row - 1) * stride + x - channels) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val (pa, pb, pc) = ((p - left).abs, (p - up).abs, (p - ul).abs)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        raw(row * (stride + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](raw.length + 128)
    while (!defl.finished()) bos.write(buf, 0, defl.deflate(buf))
    defl.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      bb.putInt(crc.getValue.toInt).array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val idat = bos.toByteArray
    val idatChunks =
      if (splitIdat && idat.length > 3) // zlib stream split across chunks
        chunk("IDAT", idat.take(3)) ++ chunk("IDAT", idat.drop(3))
      else chunk("IDAT", idat)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ idatChunks ++ chunk("IEND", Array.empty[Byte])
  }

  /** The decoder's normalized-RGB view of a raw channel stream. */
  private def toRgb(channels: Int, pixels: Array[Byte]): Seq[Byte] =
    pixels.grouped(channels).flatMap { px =>
      if (channels >= 3) px.take(3) else Array(px(0), px(0), px(0))
    }.toSeq

  test("PNG round-trips every color type through all five scanline filters") {
    val rnd = new scala.util.Random(20260814L)
    for (colorType <- Seq(0, 2, 4, 6); trial <- 0 until 3) {
      val channels = Map(0 -> 1, 2 -> 3, 4 -> 2, 6 -> 4)(colorType)
      val (w, h) = (1 + rnd.nextInt(9), 6 + rnd.nextInt(5)) // h >= 6: every filter used
      val px = Array.fill[Byte](w * h * channels)(rnd.nextInt(256).toByte)
      val d = RealCodec.decode(png(w, h, colorType, px, row => row % 5))
      withClue(s"colorType=$colorType trial=$trial ${w}x$h: ") {
        (d.width, d.height, d.nFrames) shouldBe ((w, h, 1))
        d.pixels.toSeq shouldBe toRgb(channels, px)
      }
    }
  }

  test("PNG: one zlib stream across split IDAT chunks; ancillary chunks skipped") {
    val rnd = new scala.util.Random(7L)
    val px = Array.fill[Byte](4 * 3 * 3)(rnd.nextInt(256).toByte)
    val whole = png(4, 3, 2, px, _ => 4, splitIdat = true)
    // splice an ancillary chunk (tEXt) between IHDR and the IDATs
    val data = "k\u0000v".getBytes("ISO-8859-1")
    val bb = java.nio.ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length).put("tEXt".getBytes("US-ASCII")).put(data)
    val crc = new java.util.zip.CRC32()
    crc.update("tEXt".getBytes("US-ASCII")); crc.update(data)
    val anc = bb.putInt(crc.getValue.toInt).array()
    val spliced = whole.take(8 + 25) ++ anc ++ whole.drop(8 + 25)
    val d = RealCodec.decode(spliced)
    (d.width, d.height) shouldBe ((4, 3))
    d.pixels.toSeq shouldBe px.toSeq
  }

  test("PNG: bad CRC and truncation fail loudly; mislabeled variants rewrap" +
      " the JDK reader's error, never a partial decode") {
    val px = Array.fill[Byte](2 * 2 * 3)(5.toByte)
    val good = png(2, 2, 2, px, _ => 0)
    def mut(off: Int, v: Byte): Array[Byte] = {
      val b = good.clone(); b(off) = v; b
    }
    // IHDR data starts at byte 16: w(4) h(4) depth colorType comp filt interlace
    // CRC breaks when a header byte changes — the CRC gate must fire BEFORE
    // variant routing: a corrupted color-type byte must not reroute tiers
    intercept[IllegalArgumentException] {
      RealCodec.decode(mut(25, 3)) // colorType byte, CRC now stale
    }.getMessage should include("CRC")
    // re-encode properly: variants whose headers LIE about the pixel data
    // route to the ImageIO tier and surface its reader error loudly
    def withIhdr(depth: Byte, colorType: Byte, interlace: Byte): Array[Byte] = {
      val ihdr = java.nio.ByteBuffer.allocate(13).putInt(2).putInt(2)
        .put(depth).put(colorType).put(0.toByte).put(0.toByte).put(interlace)
        .array()
      val bb = java.nio.ByteBuffer.allocate(12 + 13)
      bb.putInt(13).put("IHDR".getBytes("US-ASCII")).put(ihdr)
      val crc = new java.util.zip.CRC32()
      crc.update("IHDR".getBytes("US-ASCII")); crc.update(ihdr)
      val chunk = bb.putInt(crc.getValue.toInt).array()
      good.take(8) ++ chunk ++ good.drop(8 + 25)
    }
    intercept[IllegalArgumentException] { // claims palette, carries no PLTE
      RealCodec.decode(withIhdr(8, 3, 0))
    }.getMessage should include("corrupt stream")
    intercept[IllegalArgumentException] { // claims 16-bit, data is 8-bit-sized
      RealCodec.decode(withIhdr(16, 2, 0))
    }.getMessage should include("corrupt stream")
    intercept[IllegalArgumentException] { // IEND alone: pixel data missing
      RealCodec.decode(good.take(8 + 25) ++ good.takeRight(12))
    }.getMessage should include("truncated pixel data")
    // decompression-bomb gates: a few-KB file claiming huge dimensions must
    // fail loudly BEFORE any allocation or inflation — the MaxPixels budget
    // bounds real allocations, not just Int arithmetic (25000x25000 passes
    // every overflow check yet would buy multi-GB buffers)
    def bomb(w: Int, h: Int, colorType: Byte, interlace: Byte) = {
      val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
        .put(8.toByte).put(colorType)
        .put(0.toByte).put(0.toByte).put(interlace).array()
      val bb = java.nio.ByteBuffer.allocate(12 + 13)
      bb.putInt(13).put("IHDR".getBytes("US-ASCII")).put(ihdr)
      val crc = new java.util.zip.CRC32()
      crc.update("IHDR".getBytes("US-ASCII")); crc.update(ihdr)
      good.take(8) ++ bb.putInt(crc.getValue.toInt).array() ++
        good.drop(8 + 25)
    }
    intercept[IllegalArgumentException] { // gray: w*h*3 wraps Int
      RealCodec.decode(bomb(30000, 30000, 0, 0))
    }.getMessage should include("too large")
    intercept[IllegalArgumentException] { // passes overflow checks, not budget
      RealCodec.decode(bomb(25000, 25000, 0, 0))
    }.getMessage should include("too large")
    intercept[IllegalArgumentException] { // interlaced routes to the ImageIO
      // tier: its header gate must fire before the reader allocates
      RealCodec.decode(bomb(25000, 25000, 2, 1))
    }.getMessage should include("too large")
  }

  // --- JDK ImageIO tier (JPEG/GIF/TIFF + exotic PNG/BMP variants) ---

  private def awtImage(w: Int, h: Int, typ: Int)(
      px: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, typ)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    img
  }

  private def writeFmt(img: java.awt.image.BufferedImage,
      fmt: String): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, b) shouldBe true
    b.toByteArray
  }

  /** The normalized-RGB expectation: the image's own ColorModel view with
    * alpha dropped — exactly what both decoder tiers must produce. */
  private def rgbBytes(img: java.awt.image.BufferedImage): Seq[Byte] =
    (0 until img.getHeight).flatMap(y => (0 until img.getWidth).flatMap { x =>
      val p = img.getRGB(x, y)
      Seq((p >> 16).toByte, (p >> 8).toByte, p.toByte)
    })

  test("hand-rolled PNG decoder agrees bit-for-bit with the JDK's" +
      " independent PNG encoder") {
    val rnd = new scala.util.Random(14L)
    for (trial <- 0 until 4) {
      val (w, h) = (1 + rnd.nextInt(12), 1 + rnd.nextInt(12))
      val img = awtImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)(
        (_, _) => rnd.nextInt(0x1000000))
      val bytes = writeFmt(img, "png")
      // sanity: the JDK wrote the hand-rolled subset, so THIS decode is the
      // hand-rolled tier against an encoder it shares no code with
      (bytes(24) & 0xff, bytes(25) & 0xff, bytes(28) & 0xff) shouldBe ((8, 2, 0))
      val d = RealCodec.decode(bytes)
      withClue(s"trial=$trial ${w}x$h: ") {
        (d.width, d.height, d.nFrames) shouldBe ((w, h, 1))
        d.pixels.toSeq shouldBe rgbBytes(img)
      }
    }
  }

  test("palette and Adam7-interlaced PNG decode exactly through the JDK tier") {
    val idx = awtImage(5, 4, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)(
      (x, y) => if ((x + y) % 2 == 0) 0xFF0000 else 0x00FF00)
    val palette = writeFmt(idx, "png")
    (palette(25) & 0xff) shouldBe 3 // colorType: the variant the r14 hand-rolled tier rejects
    val d = RealCodec.decode(palette)
    (d.width, d.height, d.nFrames) shouldBe ((5, 4, 1))
    d.pixels.toSeq shouldBe rgbBytes(idx)

    val rnd = new scala.util.Random(7L)
    val rgb = awtImage(6, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)(
      (_, _) => rnd.nextInt(0x1000000))
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    writer.write(null, new javax.imageio.IIOImage(rgb, null, null), param)
    ios.close(); writer.dispose()
    val interlaced = bos.toByteArray
    (interlaced(28) & 0xff) shouldBe 1 // genuine Adam7
    val di = RealCodec.decode(interlaced)
    (di.width, di.height) shouldBe ((6, 5))
    di.pixels.toSeq shouldBe rgbBytes(rgb)
  }

  test("JPEG decodes through the JDK tier; corrupt JPEG fails loudly") {
    val solid = awtImage(32, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)(
      (_, _) => 0x806040)
    val d = RealCodec.decode(writeFmt(solid, "jpg"))
    (d.width, d.height, d.nFrames) shouldBe ((32, 24, 1))
    // lossy codec: a solid block must come back within quantization slack
    d.pixels.grouped(3).zipWithIndex.foreach { case (px, i) =>
      withClue(s"pixel $i: ") {
        math.abs((px(0) & 0xff) - 0x80) should be <= 4
        math.abs((px(1) & 0xff) - 0x60) should be <= 4
        math.abs((px(2) & 0xff) - 0x40) should be <= 4
      }
    }
    intercept[IllegalArgumentException] { // SOI marker, then garbage
      RealCodec.decode(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte,
        0xe0.toByte) ++ new Array[Byte](60))
    }.getMessage should include("corrupt stream")
  }

  test("GIF decodes exactly; animated GIF reports its frame count;" +
      " truncation fails loudly") {
    val idx = awtImage(4, 4, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)(
      (x, _) => if (x % 2 == 0) 0xFF0000 else 0x0000FF)
    val gifBytes = writeFmt(idx, "gif")
    val d = RealCodec.decode(gifBytes)
    (d.width, d.height, d.nFrames) shouldBe ((4, 4, 1))
    // referee = the JDK reader's own view of the bytes: the JDK GIF WRITER
    // truncates the image's final row on these small indexed images (decodes
    // black under every reader), so the source image is not a valid
    // expectation for writer output — the decode contract is reader fidelity
    d.pixels.toSeq shouldBe rgbBytes(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gifBytes)))
    // palette fidelity on the rows the writer DID emit: exact, not quantized
    d.pixels.take(36).toSeq shouldBe rgbBytes(idx).take(36)
    // animated: 3 frames through the sequence writer; frame 0 is the decode,
    // the count rides nFrames (the m-plane's frame-sampling contract)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    val colors = Seq(0xFF0000, 0x00FF00, 0x0000FF)
    colors.foreach { c =>
      val frame = awtImage(4, 4,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)((_, _) => c)
      writer.writeToSequence(new javax.imageio.IIOImage(frame, null, null), null)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    val animBytes = bos.toByteArray
    val anim = RealCodec.decode(animBytes)
    (anim.width, anim.height, anim.nFrames) shouldBe ((4, 4, 3))
    // decode = frame 0, by the JDK reader's account of it (same truncation
    // caveat as above); the red palette entry must survive exactly
    anim.pixels.toSeq shouldBe rgbBytes(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(animBytes)))
    anim.pixels.take(36).grouped(3).foreach(_.toSeq shouldBe
      Seq(0xFF.toByte, 0.toByte, 0.toByte))
    intercept[IllegalArgumentException] {
      RealCodec.decode("GIF89a".getBytes("US-ASCII"))
    }.getMessage should include("corrupt stream")
  }

  test("palette BMP and TIFF route to the JDK tier; a compressed-flag 24-bit" +
      " BMP survives via the JDK reader's tolerance") {
    val idx = awtImage(5, 4, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)(
      (x, y) => if ((x * y) % 3 == 0) 0xFF0000 else 0x00FFFF)
    val bmp8 = writeFmt(idx, "bmp")
    ((bmp8(28) & 0xff) | ((bmp8(29) & 0xff) << 8)) shouldBe 8 // 8-bit palette
    val d = RealCodec.decode(bmp8)
    (d.width, d.height) shouldBe ((5, 4))
    d.pixels.toSeq shouldBe rgbBytes(idx)

    val rnd = new scala.util.Random(21L)
    val rgbImg = awtImage(7, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)(
      (_, _) => rnd.nextInt(0x1000000))
    val dt = RealCodec.decode(writeFmt(rgbImg, "tiff"))
    (dt.width, dt.height, dt.nFrames) shouldBe ((7, 3, 1))
    dt.pixels.toSeq shouldBe rgbBytes(rgbImg)

    // a compression flag on a 24-bit BMP is spec-invalid (RLE is 4/8-bit
    // only); the router sends it to the JDK tier, which reads the raster
    // as-is — decoded, not loud-failed, and byte-identical to the honest file
    val rgb = Array.tabulate[Byte](3 * 2 * 3)(i => (i * 7).toByte)
    val flagged = bmp(3, 2, rgb); flagged(30) = 1
    RealCodec.decode(flagged).pixels.toSeq shouldBe rgb.toSeq
  }

  // --- audio: hand-rolled RIFF/WAVE PCM, javax.sound as the referee encoder ---

  private def wavBytes(pcm: Array[Byte], sampleRate: Float, bits: Int,
      channels: Int, nFrames: Long): Array[Byte] = {
    import javax.sound.sampled._
    // 8-bit WAV is unsigned, 16-bit signed little-endian — the format's rule
    val fmt = new AudioFormat(sampleRate, bits, channels, bits == 16, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("WAV: stereo 16-bit PCM decodes bit-identically; 8-bit widens to the" +
      " 16-bit layout; unknown chunks skip with odd-length padding") {
    val rnd = new scala.util.Random(11L)
    val pcm = Array.fill[Byte](50 * 2 * 2)(rnd.nextInt(256).toByte)
    val d = RealCodec.decode(wavBytes(pcm, 8000f, 16, 2, 50))
    // audio mapping: width=channels, height=sample rate, nFrames=sample frames
    (d.width, d.height, d.nFrames) shouldBe ((2, 8000, 50))
    d.pixels.toSeq shouldBe pcm.toSeq

    val mono8 = Array.tabulate[Byte](20)(i => (i * 13).toByte)
    val d8 = RealCodec.decode(wavBytes(mono8, 11025f, 8, 1, 20))
    (d8.width, d8.height, d8.nFrames) shouldBe ((1, 11025, 20))
    val widened = mono8.flatMap { v =>
      val s = ((v & 0xff) - 128) << 8
      Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)
    }
    d8.pixels.toSeq shouldBe widened.toSeq

    // splice an odd-length LIST chunk between "WAVE" and the fmt chunk: the
    // walk must skip it INCLUDING the spec's pad byte, or every later chunk
    // misaligns by one
    val clean = wavBytes(pcm.take(8), 8000f, 16, 2, 2)
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ "abc".getBytes("US-ASCII") ++ Array[Byte](0)
    val spliced = clean.take(12) ++ list ++ clean.drop(12)
    // RIFF size field is now stale, but the walk is bounds-driven, not
    // RIFF-size-driven — mirrors real-world files with sloppy RIFF sizes
    val ds = RealCodec.decode(spliced)
    (ds.width, ds.nFrames) shouldBe ((2, 2))
    ds.pixels.toSeq shouldBe pcm.take(8).toSeq
  }

  test("WAV: float/compressed formats, truncation, and frame misalignment" +
      " fail loudly") {
    val good = wavBytes(Array.tabulate[Byte](16)(_.toByte), 8000f, 16, 2, 4)
    val fmtOff = {
      // locate the fmt chunk (javax.sound writes it right after WAVE, but
      // find it structurally so the test doesn't bake in that layout)
      var i = 12
      while (!(good(i) == 'f' && good(i + 1) == 'm')) i += 1
      i
    }
    def mut(off: Int, v: Byte): Array[Byte] = {
      val b = good.clone(); b(off) = v; b
    }
    intercept[IllegalArgumentException] { // IEEE float format code 3
      RealCodec.decode(mut(fmtOff + 8, 3))
    }.getMessage should include("format code 3")
    intercept[IllegalArgumentException] { // 24-bit: not in the PCM subset
      RealCodec.decode(mut(fmtOff + 22, 24))
    }.getMessage should include("24-bit")
    intercept[IllegalArgumentException] { // data chunk cut mid-frame
      RealCodec.decode(good.dropRight(3))
    }.getMessage should include("truncated")
    intercept[IllegalArgumentException] { // header only: no chunks at all
      RealCodec.decode(good.take(12))
    }.getMessage should include("missing fmt")
    // data length not a whole number of frames: shrink the data chunk's
    // declared length by one and pad the byte off the end
    val dataOff = {
      var i = 12
      while (!(good(i) == 'd' && good(i + 1) == 'a' && good(i + 2) == 't')) i += 1
      i
    }
    intercept[IllegalArgumentException] {
      val b = good.dropRight(1)
      b(dataOff + 4) = 15
      RealCodec.decode(b)
    }.getMessage should include("whole number")
  }

  test("fuzz: corrupted media bytes never escape the loud-failure contract") {
    // a curation pipeline WILL meet bit-rotted and truncated blobs; whatever
    // the corruption, decode must either return a sane DecodedMedia or
    // throw this codec's documented exceptions — never NPE/AIOOBE/OOM from
    // inside a parser. Deterministic seed: no flakiness, same 560 corrupted
    // inputs every run.
    val rnd = new scala.util.Random(2026L)
    val rgbImg = awtImage(6, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)(
      (_, _) => rnd.nextInt(0x1000000))
    val seeds: Seq[(String, Array[Byte])] = Seq(
      "ppm" -> ppm(3, 3, Array.tabulate[Byte](27)(_.toByte)),
      "bmp" -> bmp(3, 2, Array.tabulate[Byte](18)(i => (i * 5).toByte)),
      "png" -> png(4, 4, 2,
        Array.fill[Byte](48)(rnd.nextInt(256).toByte), _ % 5),
      "jpg" -> writeFmt(rgbImg, "jpg"),
      "gif" -> writeFmt(rgbImg, "gif"),
      "tiff" -> writeFmt(rgbImg, "tiff"),
      "wav" -> wavBytes(Array.tabulate[Byte](32)(_.toByte), 8000f, 16, 2, 8))
    for (trial <- 0 until 560) {
      val (kind, base) = seeds(trial % seeds.size)
      val whole = base.clone()
      for (_ <- 0 to rnd.nextInt(8)) // 1..8 random byte mutations
        whole(rnd.nextInt(whole.length)) = rnd.nextInt(256).toByte
      // every third trial also truncates: mid-stream EOF is the other
      // corruption class (partial uploads, chopped objects)
      val b = if (trial % 3 == 0) whole.take(1 + rnd.nextInt(whole.length))
        else whole
      withClue(s"$kind trial=$trial (${b.length} bytes): ") {
        try {
          val d = RealCodec.decode(b)
          d.width should be > 0
          d.height should be > 0
          d.nFrames should be > 0
          d.pixels should not be null
        } catch {
          case _: IllegalArgumentException | _: UnsupportedOperationException =>
            () // the documented loud-failure surface
        }
      }
    }
  }

  test("mediaFeatures is streaming-ready: the batched codec kernel runs" +
      " unchanged on a live query, batch-equal") {
    // the M-plane's streaming twin: decode/feature-extract is ONE stateless
    // narrow mapPartitions (no watermark, no state), so index-maintenance
    // style ingest — featurize each arriving asset — is the SAME code path
    // as the batch run, pinned equal here through a MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val px = Array.tabulate[Byte](12)(i => (20 + i).toByte)
    val rows = Seq((3L, new String(ppm(2, 2, px), "US-ASCII")), (6L, null))
    val batch = Media.mediaFeatures(s, rows.toDF("doc_id", "text"), RealCodec)
      .collect().map(f => (f.doc_id, f.n_frames, f.n_pixels, f.features.toSeq))
    val input = MemoryStream[(Long, String)]
    val out = Media.mediaFeatures(s, input.toDF().toDF("doc_id", "text"),
      RealCodec)
    val sink = s"mediastream_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("mediastream").toString)
      .start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = s.table(sink).as[MediaFeature].collect()
        .map(f => (f.doc_id, f.n_frames, f.n_pixels, f.features.toSeq))
      streamed.toSeq shouldBe batch.toSeq
      streamed should have size 1 // the NULL-text asset drops in both modes
    } finally q.stop()
  }

  test("mediaFeatures runs the batched SPI with a REAL decode end-to-end") {
    import spark.implicits._
    // ASCII-safe pixel bytes (< 0x80) survive the assets() UTF-8 round trip,
    // so the documents-table harness carries a genuine decodable image
    val px = Array.tabulate[Byte](12)(i => (10 + i).toByte)
    val text = new String(ppm(2, 2, px), "US-ASCII")
    // an ASCII-safe WAV (every byte < 0x80 survives the UTF-8 round trip):
    // 8 frames of 8-bit mono PCM at rate 100 via the javax.sound encoder
    val wavPcm = Array.tabulate[Byte](8)(i => (i * 15).toByte)
    val wavText = {
      val bytes = wavBytes(wavPcm, 100f, 8, 1, 8)
      all(bytes.map(b => (b & 0xff) < 0x80)) shouldBe true
      new String(bytes, "US-ASCII")
    }
    val d = Seq((3L, text), (1L, wavText)) // doc_id 3 -> image, 1 -> audio mime
      .toDF("doc_id", "text")
    val out = Media.mediaFeatures(spark, d, RealCodec).collect()
      .sortBy(_.doc_id)
    out should have size 2
    val Array(a, f) = out
    (f.doc_id, f.n_frames, f.n_pixels) shouldBe ((3L, 1, 12))
    // stride-8 means over the DECODED pixels (not the blob): lanes 0..3
    // average two bytes, lanes 4..7 carry one
    val exp = Array.tabulate(8) { lane =>
      val vals = (lane until 12 by 8).map(i => px(i) & 0xff)
      vals.sum.toFloat / vals.size
    }
    f.features.toSeq shouldBe exp.toSeq
    // the audio asset decoded for real too: 8 frames, 16 widened PCM bytes
    (a.doc_id, a.n_frames, a.n_pixels) shouldBe ((1L, 8, 16))
    val widened = wavPcm.flatMap { v =>
      val s = ((v & 0xff) - 128) << 8
      Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)
    }
    val expA = Array.tabulate(8) { lane =>
      val vals = (lane until 16 by 8).map(i => widened(i) & 0xff)
      vals.sum.toFloat / vals.size
    }
    a.features.toSeq shouldBe expA.toSeq
  }
}
