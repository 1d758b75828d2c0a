package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** BmpCodec invariants: lossless round trip, the three container semantics
  * the oracle probes (bottom-up rows, BGR order, stride padding), top-down
  * payloads, ImageIO cross-validation in both directions, and explicit
  * rejection of profiles the codec does not implement. */
class BmpSpec extends AnyFunSuite {

  private def rgbOf(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i * 7 + 3) % 251).toByte)

  test("round trip: decode(encode(rgb)) is byte-identical, odd width") {
    for ((w, h) <- Seq((7, 5), (1, 1), (4, 3), (13, 16))) {
      val rgb = rgbOf(w, h)
      val (dw, dh, back) = BmpCodec.decode(BmpCodec.encode(w, h, rgb))
      assert((dw, dh) == (w, h))
      assert(back.sameElements(rgb), s"${w}x$h")
    }
  }

  test("stride: odd widths pad each row to a 4-byte boundary") {
    assert(BmpCodec.rowStride(7) == 24) // 21 -> 24
    assert(BmpCodec.rowStride(4) == 12) // already aligned
    assert(BmpCodec.rowStride(1) == 4)
    val payload = BmpCodec.encode(7, 2, rgbOf(7, 2))
    assert(payload.length == 54 + 24 * 2)
  }

  test("bottom-up: the first stored row is the LAST image row") {
    // 1x2 image: top pixel (1,2,3), bottom pixel (4,5,6)
    val rgb = Array[Byte](1, 2, 3, 4, 5, 6)
    val p = BmpCodec.encode(1, 2, rgb)
    // stored bottom-up + BGR: first stored row = bottom pixel = 6,5,4
    assert(p(54) == 6 && p(55) == 5 && p(56) == 4)
    assert(p(58) == 3 && p(59) == 2 && p(60) == 1)
  }

  test("top-down payloads (negative height) decode correctly") {
    val rgb = rgbOf(3, 4)
    val p = BmpCodec.encode(3, 4, rgb)
    // flip to top-down: negate height, reverse stored row order
    val stride = BmpCodec.rowStride(3)
    val flipped = p.clone()
    val negH = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-4).array()
    System.arraycopy(negH, 0, flipped, 22, 4)
    for (y <- 0 until 4)
      System.arraycopy(p, 54 + (3 - y) * stride, flipped, 54 + y * stride,
        stride)
    val (_, h, back) = BmpCodec.decode(flipped)
    assert(h == 4)
    assert(back.sameElements(rgb))
  }

  test("hostile headers are rejected cleanly, never via index/alloc errors") {
    def mutated(off: Int, v: Int): Array[Byte] = {
      val p = BmpCodec.encode(4, 3, rgbOf(4, 3))
      val le = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
      System.arraycopy(le, 0, p, off, 4)
      p
    }
    // each lie must die in a require() — Int-overflow paths previously let
    // these pass the size check and fail later inside the pixel loop
    val lies = Seq(
      mutated(18, 0x40000000),        // width: stride*height overflows Int
      mutated(18, 1 << 27),           // width over the plausibility cap
      mutated(22, 1 << 27),           // height over the plausibility cap
      mutated(22, Int.MinValue),      // abs(height) stays negative
      mutated(10, -4),                // negative pixel-data offset
      mutated(10, 12),                // offset inside the header
      mutated(10, 0x7ffffff0))        // offset past the payload
    lies.foreach { p =>
      intercept[IllegalArgumentException](BmpCodec.decode(p))
    }
  }

  test("ImageIO reads our payloads: pixel-exact both ways") {
    val (w, h) = (7, 5)
    val rgb = rgbOf(w, h)
    // our encoder -> ImageIO reader
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(BmpCodec.encode(w, h, rgb)))
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val px = img.getRGB(x, y)
      val base = (y * w + x) * 3
      assert(((px >> 16) & 0xff) == (rgb(base) & 0xff))
      assert(((px >> 8) & 0xff) == (rgb(base + 1) & 0xff))
      assert((px & 0xff) == (rgb(base + 2) & 0xff))
    }
    // ImageIO writer -> our decoder
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (y * w + x) * 3
      bi.setRGB(x, y, ((rgb(base) & 0xff) << 16) |
        ((rgb(base + 1) & 0xff) << 8) | (rgb(base + 2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "bmp", bos))
    val (dw, dh, back) = BmpCodec.decode(bos.toByteArray)
    assert((dw, dh) == (w, h))
    assert(back.sameElements(rgb))
  }

  test("rejection: wrong magic, other bpp/compression, truncated data") {
    val good = BmpCodec.encode(3, 3, rgbOf(3, 3))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assertThrows[IllegalArgumentException](BmpCodec.decode(badMagic))
    val bad8bpp = good.clone(); bad8bpp(28) = 8
    assertThrows[IllegalArgumentException](BmpCodec.decode(bad8bpp))
    val rle = good.clone(); rle(30) = 1 // BI_RLE8
    assertThrows[IllegalArgumentException](BmpCodec.decode(rle))
    assertThrows[IllegalArgumentException](
      BmpCodec.decode(good.take(good.length - 5)))
    assertThrows[IllegalArgumentException](BmpCodec.decode(good.take(40)))
  }
}
