package graft.operators

import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM RIFF/WAVE codec (16-bit PCM) — the audio sibling of
  * [[PpmCodec]]: an uncompressed container needing no media libraries, so
  * the DECODE step is oracle-gradeable (DuckDB recomputes the identical
  * sample arithmetic from the source bytes; a header-offset or
  * endianness bug moves a graded integer).
  *
  * Format (RIFF spec): "RIFF" + u32le(total-8) + "WAVE", then a chunk
  * walk — each chunk is a 4-byte ASCII id + u32le size + body, bodies
  * word-aligned (odd sizes take a pad byte). "fmt " carries
  * (audioFormat=1 PCM, channels, sampleRate, byteRate, blockAlign,
  * bitsPerSample); "data" carries interleaved int16 LITTLE-ENDIAN
  * samples. Unknown chunks (LIST, INFO, …) must be SKIPPED, not rejected
  * — real WAV files carry them, which is why [[decode]] walks chunks
  * instead of assuming fixed offsets (MultimodalSpec plants a LIST chunk
  * to prove it). Compressed audio (FLAC/MP3 — entropy coders) needs
  * libraries absent from this container; it would slot into the same
  * per-partition batch shape as the image codecs.
  */
object WavCodec {

  private def u32le(v: Int): Array[Byte] = Array(
    (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def u16le(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  /** Encode interleaved int16 samples as a PCM WAV payload; `extraChunk`
    * plants a LIST chunk between fmt and data (chunk-walk exercise). */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short],
             extraChunk: Option[Array[Byte]] = None): Array[Byte] = {
    require(sampleRate > 0 && channels >= 1, "bad rate/channels")
    require(samples.length % channels == 0,
      s"${samples.length} samples not divisible by $channels channels")
    val bits = 16
    val blockAlign = channels * bits / 8
    val fmt = "fmt ".getBytes(US_ASCII) ++ u32le(16) ++ u16le(1) ++
      u16le(channels) ++ u32le(sampleRate) ++
      u32le(sampleRate * blockAlign) ++ u16le(blockAlign) ++ u16le(bits)
    val extra = extraChunk.map { b =>
      val padded = if (b.length % 2 == 1) b :+ 0.toByte else b
      "LIST".getBytes(US_ASCII) ++ u32le(b.length) ++ padded
    }.getOrElse(Array.empty[Byte])
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(i * 2) = (samples(i) & 0xFF).toByte
      pcm(i * 2 + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val data = "data".getBytes(US_ASCII) ++ u32le(pcm.length) ++ pcm
    val body = "WAVE".getBytes(US_ASCII) ++ fmt ++ extra ++ data
    "RIFF".getBytes(US_ASCII) ++ u32le(body.length) ++ body
  }

  /** Decode a WAV payload → (sampleRate, channels, interleaved samples).
    * Real parser: validates RIFF framing, WALKS chunks (skipping unknown
    * ids, honoring word alignment), requires 16-bit PCM, rejects
    * truncated chunks, odd data sizes and data-before-fmt. */
  def decode(payload: Array[Byte]): (Int, Int, Array[Short]) = {
    def u32(o: Int): Int = (payload(o) & 0xFF) | ((payload(o + 1) & 0xFF) << 8) |
      ((payload(o + 2) & 0xFF) << 16) | ((payload(o + 3) & 0xFF) << 24)
    def u16(o: Int): Int = (payload(o) & 0xFF) | ((payload(o + 1) & 0xFF) << 8)
    def tag(o: Int): String = new String(payload, o, 4, US_ASCII)
    require(payload.length >= 12 && tag(0) == "RIFF" && tag(8) == "WAVE",
      "not a RIFF/WAVE payload")
    require(u32(4) == payload.length - 8,
      s"RIFF size ${u32(4)} != payload ${payload.length} - 8")
    var off = 12
    var rate = -1
    var ch = -1
    var samples: Array[Short] = null
    while (off + 8 <= payload.length) {
      val id = tag(off)
      val sz = u32(off + 4)
      val body = off + 8
      require(sz >= 0 && body + sz <= payload.length,
        s"chunk '$id' (size $sz at $off) overruns the payload")
      id match {
        case "fmt " =>
          require(sz >= 16, s"fmt chunk too short ($sz)")
          require(u16(body) == 1, s"only PCM supported, got ${u16(body)}")
          ch = u16(body + 2)
          rate = u32(body + 4)
          require(u16(body + 14) == 16,
            s"only 16-bit samples supported, got ${u16(body + 14)}")
        case "data" =>
          require(rate > 0 && ch > 0, "data chunk before fmt")
          require(sz % 2 == 0, s"odd data size $sz for 16-bit samples")
          samples = Array.tabulate(sz / 2)(i => u16(body + i * 2).toShort)
        case _ => () // LIST/INFO/…: skip — real files carry these
      }
      off = body + sz + (sz % 2) // word alignment
    }
    require(samples != null, "missing data chunk")
    require(samples.length % ch == 0,
      s"${samples.length} samples not divisible by $ch channels")
    (rate, ch, samples)
  }
}
