package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** PngCodec: roundtrip identity per filter type, spec'd failure modes,
  * and — the part that makes it REAL PNG rather than merely self-inverse —
  * cross-validation against `javax.imageio`, the JDK's independent PNG
  * implementation, in both directions. */
class PngSpec extends AnyFunSuite {

  /** Deterministic raster: byte i of a w×h image follows a fixed affine
    * sequence — exercises all 256 values and no filter-friendly runs. */
  private def raster(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i * 31 + 7) % 256).toByte)

  test("encode/decode roundtrip is identity for every filter type") {
    for (ft <- 0 to 4; (w, h) <- Seq((1, 1), (8, 5), (3, 17), (16, 16))) {
      val rgb = raster(w, h)
      val (w2, h2, back) = PngCodec.decode(PngCodec.encode(w, h, rgb, ft))
      assert((w2, h2) == (w, h), s"dims moved at filter $ft ${w}x$h")
      assert(java.util.Arrays.equals(back, rgb),
        s"pixels moved at filter $ft ${w}x$h")
    }
  }

  test("imageio reads our png with identical pixels") {
    val (w, h) = (8, 5)
    val rgb = raster(w, h)
    val png = PngCodec.encode(w, h, rgb)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null, "imageio could not parse our png at all")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val px = img.getRGB(x, y)
      val off = (y * w + x) * 3
      val want = ((rgb(off) & 0xff) << 16) | ((rgb(off + 1) & 0xff) << 8) |
        (rgb(off + 2) & 0xff)
      assert((px & 0xffffff) == want, s"pixel ($x,$y) differs vs imageio")
    }
  }

  test("we read imageio's png with identical pixels") {
    val (w, h) = (7, 9)
    val rgb = raster(w, h)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val off = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(off) & 0xff) << 16) |
        ((rgb(off + 1) & 0xff) << 8) | (rgb(off + 2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    // ImageIO emits 8-bit RGB non-interlaced for TYPE_3BYTE_BGR — our
    // decoder must handle its per-row adaptive filter choices
    val (w2, h2, back) = PngCodec.decode(bos.toByteArray)
    assert((w2, h2) == (w, h))
    assert(java.util.Arrays.equals(back, rgb), "pixels differ vs imageio png")
  }

  test("decode rejects damage through the documented failure mode") {
    val png = PngCodec.encode(4, 4, raster(4, 4))
    def bad(mutate: Array[Byte] => Array[Byte]) =
      intercept[IllegalArgumentException](PngCodec.decode(mutate(png.clone())))
    assert(bad(p => { p(0) = 'X'.toByte; p })
      .getMessage.contains("signature"))
    // flip one IDAT payload byte: CRC catches it before the inflater runs
    assert(bad(p => { p(45) = (p(45) ^ 0x40).toByte; p })
      .getMessage.contains("crc"))
    assert(bad(p => java.util.Arrays.copyOf(p, p.length - 6))
      .getMessage.toLowerCase.contains("truncated"))
    // 16-bit / palette PNGs are out of scope and must say so
    val depth16 = png.clone(); depth16(24) = 16
    val e = intercept[IllegalArgumentException](PngCodec.decode(depth16))
    assert(e.getMessage.contains("crc"), "IHDR edit must trip the CRC check")
  }

  test("encode rejects bad dims, raster mismatch and unknown filters") {
    intercept[IllegalArgumentException](PngCodec.encode(0, 4, Array[Byte]()))
    intercept[IllegalArgumentException](PngCodec.encode(2, 2, new Array[Byte](5)))
    intercept[IllegalArgumentException](
      PngCodec.encode(2, 2, new Array[Byte](12), filterType = 7))
  }
}
