package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The multimodal plumbing (packing metadata, per-partition batch decode
  * shape, determinism) — driven by a test-double codec so the plumbing
  * tests cover arbitrary payloads, not just well-formed PPM — plus the
  * REAL [[PpmCodec]]: encode/decode round trip, header tolerance, resize
  * arithmetic, and failure modes. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Test-double codec (the retired stub): deterministic dims + feature
    * bytes from the payload — exercises the batch/schema/partition shape
    * on payloads no real codec would accept (empty, non-image). */
  private val fakeCodec: (Array[Byte], Int) => (Int, Int, Array[Float]) =
    (payload, dims) => {
      val n = payload.length
      val feature = Array.tabulate(dims) { i =>
        if (n == 0) 0.0f
        else java.lang.Byte.toUnsignedInt(payload(i % n)) / 255.0f
      }
      (1 + (n % 64), 1 + (n % 48), feature)
    }

  private def media = Multimodal.packBinary(
    Seq((1L, "hello world"), (2L, ""), (3L, "αβγ")).toDF("doc_id", "text"),
    "doc_id", "text", mime = "text/plain")

  test("packBinary carries byte-accurate metadata") {
    val rows = media.orderBy("media_id").collect()
    assert(rows.map(_.getAs[Long]("nbytes")).toSeq === Seq(11L, 0L, 6L))
    assert(rows(0).getAs[Array[Byte]]("payload").toSeq ===
      "hello world".getBytes("UTF-8").toSeq)
    assert(rows.forall(_.getAs[String]("mime") == "text/plain"))
  }

  test("decodeFeatures emits fixed-width vectors, empty payload safe") {
    val feats = Multimodal.decodeFeatures(media, dims = 4, codec = fakeCodec)
      .collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq === Seq(1L, 2L, 3L))
    assert(feats.forall(_.feature.length == 4))
    assert(feats(1).feature.forall(_ == 0.0f)) // empty payload
    assert(feats.forall(f => f.width >= 1 && f.height >= 1))
  }

  test("decode is deterministic across runs and partitionings") {
    val a = Multimodal.decodeFeatures(media.repartition(1), dims = 8,
      codec = fakeCodec)
      .collect().sortBy(_.media_id).map(_.feature.toSeq).toSeq
    val b = Multimodal.decodeFeatures(media.repartition(3), dims = 8,
      codec = fakeCodec)
      .collect().sortBy(_.media_id).map(_.feature.toSeq).toSeq
    assert(a === b)
  }

  test("PpmCodec round-trips, tolerates header comments, rejects junk") {
    val rgb = Array.tabulate(2 * 3 * 3)(i => (i * 7 % 256).toByte)
    val (w, h, out) = PpmCodec.decode(PpmCodec.encode(2, 3, rgb))
    assert((w, h) == (2, 3) && out.toSeq == rgb.toSeq)
    // comments anywhere in the header, CRLF whitespace
    val commented = ("P6 # magic\n# a comment line\n 2\t3 # dims\r\n255\n")
      .getBytes("US-ASCII") ++ rgb
    val (w2, h2, out2) = PpmCodec.decode(commented)
    assert((w2, h2) == (2, 3) && out2.toSeq == rgb.toSeq)
    intercept[IllegalArgumentException](PpmCodec.decode("P5\n1 1\n255\n?".getBytes))
    intercept[IllegalArgumentException](PpmCodec.decode(PpmCodec.encode(2, 3, rgb).dropRight(1)))
    intercept[IllegalArgumentException](PpmCodec.decode("P6\n1 1\n65535\n??????".getBytes))
    // malformed numeric header token: the documented failure mode, not a
    // bare NumberFormatException
    intercept[IllegalArgumentException](PpmCodec.decode("P6\nabc 1\n255\n???".getBytes))
    // adversarial dims whose w*h*3 overflows Int must still hit the
    // truncation check, not wrap around to a small positive need
    intercept[IllegalArgumentException](PpmCodec.decode("P6\n65536 65536\n255\n?".getBytes))
  }

  test("resizeNearest samples the integer-division grid") {
    // 4x2 image, pixel value = its linear index; resize to 2x1
    val rgb = Array.tabulate(4 * 2 * 3)(_.toByte)
    val half = PpmCodec.resizeNearest(4, 2, rgb, 2, 1)
    // expect pixels (0,0) and (2,0): byte offsets 0..2 and 6..8
    assert(half.toSeq == Seq(0, 1, 2, 6, 7, 8).map(_.toByte))
  }

  test("ppmFromText -> ppmStats: real encode/decode agree with direct byte math") {
    val docs = Seq((1L, "hello world"), (2L, ""), (3L, "abcdef"))
      .toDF("doc_id", "text")
    val stats = Multimodal.ppmStats(
      Multimodal.ppmFromText(docs, "doc_id", "text", width = 8))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!stats.contains(2L)) // empty text dropped
    // doc 3: "abcdef" (6 bytes), h = 1 + 6%16 = 7, raster 8*7*3 = 168 bytes
    val txt = "abcdef".getBytes
    val rgb = Array.tabulate(8 * 7 * 3)(i => txt(i % 6))
    val expR = rgb.indices.filter(_ % 3 == 0).map(i => rgb(i).toLong).sum
    val row = stats(3L)
    assert(row.getInt(1) == 8 && row.getInt(2) == 7)
    assert(row.getLong(3) == expR)
  }

  test("ppmResizeReencode round-trips: re-encoded payload decodes to the resized raster") {
    val docs = Seq((1L, "hello world"), (3L, "abcdef")).toDF("doc_id", "text")
    val mediaDs = Multimodal.ppmFromText(docs, "doc_id", "text", width = 8)
    val out = Multimodal.ppmResizeReencode(mediaDs)
      .collect().map(r => r.getLong(0) -> r).toMap
    mediaDs.collect().foreach { m =>
      val (w, h, rgb) = PpmCodec.decode(m.payload)
      val (rw, rh) = (math.max(w / 2, 1), math.max(h / 2, 1))
      val half = PpmCodec.resizeNearest(w, h, rgb, rw, rh)
      // encode then decode must return the identical resized raster
      val (w2, h2, rgb2) = PpmCodec.decode(PpmCodec.encode(rw, rh, half))
      assert((w2, h2) == (rw, rh))
      assert(java.util.Arrays.equals(rgb2, half))
      // and the graded row reports that payload's true dims and size
      val row = out(m.media_id)
      assert(row.getInt(1) == rw && row.getInt(2) == rh)
      assert(row.getLong(3) == PpmCodec.encode(rw, rh, half).length.toLong)
    }
  }

  test("resize truncates to the cap and recomputes metadata for the NEW bytes") {
    import spark.implicits._
    val m = Multimodal.packBinary(
      Seq((1L, "0123456789abcdef0123"), (2L, "short")).toDF("id", "t"),
      "id", "t")
    val out = Multimodal.resize(m, maxBytes = 8).collect().sortBy(_.media_id)
    assert(out(0).nbytes == 8 && new String(out(0).payload) == "01234567")
    assert(out(1).nbytes == 5 && new String(out(1).payload) == "short")
    // digest must describe the truncated payload, not the original
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest("01234567".getBytes).map("%02x".format(_)).mkString
    assert(out(0).digest == expect)
  }

  test("frameSample fans one payload into every-nth fixed-size frames") {
    import spark.implicits._
    val m = Multimodal.packBinary(
      Seq((7L, "AAAABBBBCCCCDDDDEE")).toDF("id", "t"), "id", "t")
    val frames = Multimodal.frameSample(m, frameBytes = 4, everyNth = 2)
      .collect().sortBy(_.frame_idx)
    // 18 bytes -> 4 whole frames (trailing 2 bytes dropped), every 2nd
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(frames.map(f => new String(f.frame)).toSeq == Seq("AAAA", "CCCC"))
    assert(frames.map(_.ts_ms).toSeq == Seq(0L, 80L))
  }
}
