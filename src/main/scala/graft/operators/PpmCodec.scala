package graft.operators

import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM PPM (netpbm P6) codec — the uncompressed raster format that
  * needs no media libraries, which is what makes the DECODE step
  * oracle-gradeable: DuckDB can recompute the identical pixel arithmetic
  * from the source bytes, so a header-parse or pixel-offset bug grades red
  * instead of hiding behind a stub.
  *
  * Format (netpbm spec): ASCII magic "P6", then whitespace-separated
  * width, height, maxval tokens ('#' starts a comment running to end of
  * line anywhere in the header), then EXACTLY ONE whitespace byte, then
  * width×height×3 raw RGB bytes. Only maxval 255 (8-bit) is supported —
  * 16-bit PPM is big-endian two-byte samples and out of scope here.
  *
  * For a COMPRESSED format, see [[PngCodec]] — real PNG (zlib + scanline
  * filters) from `java.util.zip` alone. JPEG/H.264/FLAC (DCT/entropy
  * coders) still require external libraries not present in this
  * container; they would slot into the same per-partition batch shape
  * (see [[Multimodal.decodeFeatures]]).
  */
object PpmCodec {

  /** Encode raw RGB bytes as a P6 payload. */
  def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rgb.length == width * height * 3,
      s"rgb length ${rgb.length} != $width*$height*3")
    val header = s"P6\n$width $height\n255\n".getBytes(US_ASCII)
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Decode a P6 payload → (width, height, rgb). Real parser: skips
    * header comments, enforces the single post-maxval whitespace byte,
    * rejects non-P6 magic, 16-bit maxval and truncated pixel data. */
  def decode(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    var pos = 0
    def isWs(b: Byte) =
      b == ' '.toByte || b == '\n'.toByte || b == '\r'.toByte ||
        b == '\t'.toByte || b == '\f'.toByte || b == 0x0b.toByte
    def token(): String = {
      while (pos < payload.length &&
             (isWs(payload(pos)) || payload(pos) == '#'.toByte)) {
        if (payload(pos) == '#'.toByte)
          while (pos < payload.length && payload(pos) != '\n'.toByte) pos += 1
        else pos += 1
      }
      val start = pos
      while (pos < payload.length && !isWs(payload(pos))) pos += 1
      new String(payload, start, pos - start, US_ASCII)
    }
    val magic = token()
    require(magic == "P6", s"not a P6 ppm (magic '$magic')")
    // header numbers parse through the codec's documented failure mode —
    // a malformed token (e.g. "P6 abc …") must surface as
    // IllegalArgumentException with context, not a bare NumberFormatException
    def intToken(what: String): Int = {
      val t = token()
      try t.toInt
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"requirement failed: bad $what token '$t' in ppm header")
      }
    }
    val w = intToken("width")
    val h = intToken("height")
    val maxval = intToken("maxval")
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    require(maxval == 255, s"only 8-bit ppm supported (maxval $maxval)")
    pos += 1 // the spec's single whitespace byte before the raster
    // raster size in Long: adversarial headers (e.g. 65536×65536) overflow
    // Int in w*h*3 and would otherwise dodge the truncation check
    val needL = w.toLong * h * 3
    require(needL <= payload.length.toLong - pos,
      s"truncated raster: need $needL, have ${payload.length - pos}")
    val need = needL.toInt
    (w, h, java.util.Arrays.copyOfRange(payload, pos, pos + need))
  }

  /** Nearest-neighbor resize: output pixel (x, y) samples source pixel
    * (x·w/rw, y·h/rh) — integer division, the standard NN mapping. */
  def resizeNearest(w: Int, h: Int, rgb: Array[Byte],
                    rw: Int, rh: Int): Array[Byte] = {
    require(rw > 0 && rh > 0, s"bad target dims ${rw}x$rh")
    val out = new Array[Byte](rw * rh * 3)
    var y = 0
    while (y < rh) {
      val sy = y * h / rh
      var x = 0
      while (x < rw) {
        val sx = x * w / rw
        val src = (sy * w + sx) * 3
        val dst = (y * rw + x) * 3
        out(dst) = rgb(src)
        out(dst + 1) = rgb(src + 1)
        out(dst + 2) = rgb(src + 2)
        x += 1
      }
      y += 1
    }
    out
  }
}
