package graft.multimodal

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** RealCodec decodes the two formats a bare JVM can (binary PPM, 24-bit
  * BMP), normalizes both to top-down RGB, fails loudly on everything else —
  * and drives [[Media.mediaFeatures]]'s batched SPI end-to-end with a REAL
  * decode (not the FakeCodec stand-in). */
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
    intercept[IllegalArgumentException] { // compressed BMP
      val b = bmp(2, 2, new Array[Byte](12)); b(30) = 1
      RealCodec.decode(b)
    }.getMessage should include("compression")
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
    val data = "k v".getBytes("ISO-8859-1")
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

  test("PNG: palette/16-bit/interlace/bad-CRC/truncation fail loudly") {
    val px = Array.fill[Byte](2 * 2 * 3)(5.toByte)
    val good = png(2, 2, 2, px, _ => 0)
    def mut(off: Int, v: Byte): Array[Byte] = {
      val b = good.clone(); b(off) = v; b
    }
    // IHDR data starts at byte 16: w(4) h(4) depth colorType comp filt interlace
    // CRC breaks when a header byte changes — assert the CRC gate fires first
    intercept[IllegalArgumentException] {
      RealCodec.decode(mut(25, 3)) // colorType byte, CRC now stale
    }.getMessage should include("CRC")
    // re-encode properly for semantic gates
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
    intercept[IllegalArgumentException] {
      RealCodec.decode(withIhdr(8, 3, 0))
    }.getMessage should include("palette")
    intercept[IllegalArgumentException] {
      RealCodec.decode(withIhdr(16, 2, 0))
    }.getMessage should include("bit depth")
    intercept[IllegalArgumentException] {
      RealCodec.decode(withIhdr(8, 2, 1))
    }.getMessage should include("interlaced")
    intercept[IllegalArgumentException] { // IEND alone: pixel data missing
      RealCodec.decode(good.take(8 + 25) ++ good.takeRight(12))
    }.getMessage should include("truncated pixel data")
  }

  test("mediaFeatures runs the batched SPI with a REAL decode end-to-end") {
    import spark.implicits._
    // ASCII-safe pixel bytes (< 0x80) survive the assets() UTF-8 round trip,
    // so the documents-table harness carries a genuine decodable image
    val px = Array.tabulate[Byte](12)(i => (10 + i).toByte)
    val text = new String(ppm(2, 2, px), "US-ASCII")
    val d = Seq((3L, text)).toDF("doc_id", "text") // doc_id 3 -> image mime
    val out = Media.mediaFeatures(spark, d, RealCodec).collect()
    out should have size 1
    val f = out.head
    (f.doc_id, f.n_frames, f.n_pixels) shouldBe ((3L, 1, 12))
    // stride-8 means over the DECODED pixels (not the blob): lanes 0..3
    // average two bytes, lanes 4..7 carry one
    val exp = Array.tabulate(8) { lane =>
      val vals = (lane until 12 by 8).map(i => px(i) & 0xff)
      vals.sum.toFloat / vals.size
    }
    f.features.toSeq shouldBe exp.toSeq
  }
}
