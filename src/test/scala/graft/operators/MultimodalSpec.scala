package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The multimodal plumbing around the (declared-stub) codec: binary packing
  * metadata, per-partition batch decode shape, and determinism. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

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
    val feats = Multimodal.decodeFeatures(media, dims = 4)
      .collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq === Seq(1L, 2L, 3L))
    assert(feats.forall(_.feature.length == 4))
    assert(feats(1).feature.forall(_ == 0.0f)) // empty payload
    assert(feats.forall(f => f.width >= 1 && f.height >= 1))
  }

  test("decode is deterministic across runs and partitionings") {
    val a = Multimodal.decodeFeatures(media.repartition(1), dims = 8)
      .collect().sortBy(_.media_id).map(_.feature.toSeq).toSeq
    val b = Multimodal.decodeFeatures(media.repartition(3), dims = 8)
      .collect().sortBy(_.media_id).map(_.feature.toSeq).toSeq
    assert(a === b)
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
