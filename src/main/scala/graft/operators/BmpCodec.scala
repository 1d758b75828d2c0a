package graft.operators

/** Pure-JVM Windows BMP codec (BITMAPINFOHEADER, 24 bpp, BI_RGB) — the
  * third uncompressed-raster sibling of [[PpmCodec]] (and [[PngCodec]] for
  * the compressed path). BMP exists here because its container semantics
  * are genuinely different from netpbm and therefore gradeable: pixel rows
  * are stored BOTTOM-UP, samples are BGR (not RGB), and every row is padded
  * to a 4-byte boundary — three classic off-by-variant bugs that a
  * channel-sum-plus-positional-probe oracle turns red.
  *
  * Layout: 14-byte BITMAPFILEHEADER ("BM", file size, pixel-data offset) +
  * 40-byte BITMAPINFOHEADER (positive height ⇒ bottom-up) + padded BGR
  * rows. All multi-byte fields little-endian. Only the 24-bit uncompressed
  * profile is implemented — palette/RLE/V4+ profiles are rejected
  * explicitly, not mis-parsed.
  */
object BmpCodec {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  def rowStride(width: Int): Int = (width * 3 + 3) & ~3

  /** Encode top-down RGB bytes as a bottom-up 24bpp BI_RGB payload. */
  def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rgb.length == width * height * 3,
      s"rgb length ${rgb.length} != $width*$height*3")
    val stride = rowStride(width)
    val dataSize = stride * height
    val out = new Array[Byte](54 + dataSize)
    // BITMAPFILEHEADER
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    System.arraycopy(le32(54 + dataSize), 0, out, 2, 4)
    System.arraycopy(le32(54), 0, out, 10, 4) // pixel-data offset
    // BITMAPINFOHEADER
    System.arraycopy(le32(40), 0, out, 14, 4)
    System.arraycopy(le32(width), 0, out, 18, 4)
    System.arraycopy(le32(height), 0, out, 22, 4) // positive: bottom-up
    System.arraycopy(le16(1), 0, out, 26, 2) // planes
    System.arraycopy(le16(24), 0, out, 28, 2) // bpp
    System.arraycopy(le32(0), 0, out, 30, 4) // BI_RGB
    System.arraycopy(le32(dataSize), 0, out, 34, 4)
    var y = 0
    while (y < height) {
      val destRow = 54 + (height - 1 - y) * stride // bottom-up
      var x = 0
      while (x < width) {
        val src = (y * width + x) * 3
        out(destRow + x * 3) = rgb(src + 2) // B
        out(destRow + x * 3 + 1) = rgb(src + 1) // G
        out(destRow + x * 3 + 2) = rgb(src) // R
        x += 1
      }
      y += 1
    }
    out
  }

  private def rd16(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
  private def rd32(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
      ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)

  /** Decode a 24bpp BI_RGB payload → (width, height, top-down RGB).
    * Honors the header's pixel-data offset (extra header bytes are legal),
    * both row orders (positive height = bottom-up, negative = top-down),
    * and rejects other profiles and truncated data explicitly. */
  def decode(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(payload.length >= 54, s"truncated header (${payload.length} B)")
    require(payload(0) == 'B'.toByte && payload(1) == 'M'.toByte,
      "not a BMP (missing BM magic)")
    val dataOffset = rd32(payload, 10)
    val hdrSize = rd32(payload, 14)
    require(hdrSize >= 40, s"pre-BITMAPINFOHEADER profile (size $hdrSize)")
    val width = rd32(payload, 18)
    val rawHeight = rd32(payload, 22)
    val bottomUp = rawHeight > 0
    val height = math.abs(rawHeight)
    require(width > 0 && height > 0, s"bad dims ${width}x$rawHeight")
    // header-driven size math runs in Long: a hostile/corrupt header with
    // huge dims (or INT_MIN height, whose abs stays negative in Int) or a
    // negative/sub-header dataOffset must fail HERE as a clean rejection,
    // not later as ArrayIndexOutOfBounds/NegativeArraySize. 1<<26 px/side
    // caps the decoded buffer at 12 TiB of header lie; real payloads in a
    // binary column are orders of magnitude below it.
    require(dataOffset >= 54 && dataOffset <= payload.length,
      s"bad pixel-data offset $dataOffset")
    require(width <= (1 << 26) && height <= (1 << 26),
      s"implausible dims ${width}x$rawHeight")
    require(rd16(payload, 28) == 24,
      s"unsupported bpp ${rd16(payload, 28)} (24bpp only)")
    require(rd32(payload, 30) == 0,
      s"unsupported compression ${rd32(payload, 30)} (BI_RGB only)")
    val stride = rowStride(width)
    val needed = dataOffset.toLong + stride.toLong * height
    require(payload.length >= needed,
      s"truncated pixel data (${payload.length} < $needed)")
    require(width.toLong * height * 3 <= Int.MaxValue,
      s"decoded size ${width.toLong * height * 3} exceeds one array")
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = dataOffset + (if (bottomUp) height - 1 - y else y) * stride
      var x = 0
      while (x < width) {
        val dst = (y * width + x) * 3
        rgb(dst) = payload(srcRow + x * 3 + 2) // R
        rgb(dst + 1) = payload(srcRow + x * 3 + 1) // G
        rgb(dst + 2) = payload(srcRow + x * 3) // B
        x += 1
      }
      y += 1
    }
    (width, height, rgb)
  }
}
