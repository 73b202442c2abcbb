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
