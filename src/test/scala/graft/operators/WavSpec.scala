package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** RIFF/WAVE codec laws: lossless encode→decode roundtrip (sign and
  * endianness included), chunk-walk over planted LIST chunks (odd and even
  * sizes — word alignment), and hard rejection of malformed payloads. */
class WavSpec extends AnyFunSuite {

  private val samples: Array[Short] =
    Array(0, 1, -1, 32767, -32768, 255, -256, 12345, -12345, 2).map(_.toShort)

  test("encode/decode roundtrip preserves every sample, rate and channels") {
    val payload = WavCodec.encode(8000, 2, samples)
    val (rate, ch, got) = WavCodec.decode(payload)
    assert(rate == 8000 && ch == 2)
    assert(got.toSeq == samples.toSeq)
  }

  test("decoder walks unknown chunks, odd and even sizes alike") {
    for (extra <- Seq("abc", "abcd")) { // odd size exercises the pad byte
      val payload = WavCodec.encode(44100, 1,
        samples.take(6), Some(extra.getBytes("US-ASCII")))
      val (rate, ch, got) = WavCodec.decode(payload)
      assert(rate == 44100 && ch == 1)
      assert(got.toSeq == samples.take(6).toSeq, s"extra '$extra'")
    }
  }

  test("malformed payloads are rejected, not misread") {
    val ok = WavCodec.encode(8000, 2, samples)
    intercept[IllegalArgumentException] { // bad magic
      WavCodec.decode("JUNK".getBytes ++ ok.drop(4))
    }
    intercept[IllegalArgumentException] { // truncated payload
      WavCodec.decode(ok.dropRight(3))
    }
    intercept[IllegalArgumentException] { // RIFF size lies
      val bad = ok.clone(); bad(4) = (bad(4) ^ 1).toByte
      WavCodec.decode(bad)
    }
    intercept[IllegalArgumentException] { // samples not divisible by channels
      WavCodec.encode(8000, 3, samples)
    }
  }

  test("wavFromText media decodes back to text-derived samples") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val docs = Seq((2L, "hash table merge"), (3L, "scan")).toDF("doc_id", "text")
    val rows = Multimodal.wavStats(
      Multimodal.wavFromText(docs, "doc_id", "text"))
      .orderBy("media_id").collect()
    assert(rows.length == 2)
    // id=2 carries the planted LIST chunk; both must decode to the same
    // contract: m = len - len%2 frames over 2 channels
    assert(rows(0).getLong(3) == ("hash table merge".length / 2).toLong)
    assert(rows(1).getLong(3) == ("scan".length / 2).toLong)
    // hand-compute doc 3 ("scan", m=4): low=txt[i], high=(txt[(i+1)%4]*3+i)%256
    val txt = "scan".getBytes("US-ASCII")
    val vals = (0 until 4).map { i =>
      val v0 = (txt(i) & 0xFF) | ((((txt((i + 1) % 4) & 0xFF) * 3 + i) % 256) << 8)
      if (v0 >= 32768) v0 - 65536 else v0
    }
    assert(rows(1).getLong(4) == vals(0) + vals(2)) // sum_l
    assert(rows(1).getLong(5) == vals(1) + vals(3)) // sum_r
    assert(rows(1).getInt(6) == vals.map(math.abs).max)
  }

  test("wavSilence matches a brute-force window scan over rebuilt samples") {
    val spark = graft.TestSpark.spark
    import org.apache.spark.sql.functions._
    import graft.queries.Tables.t
    val dir = "/root/testdata/sf0.001"
    val out = Multimodal.wavSilence(
      Multimodal.wavFromText(t(spark, dir, "documents"), "doc_id", "text"))
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("silent_windows"),
          r.getAs[Long]("max_silent_run"), r.getAs[Long]("energy_l"))).toMap
    val docs = t(spark, dir, "documents")
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .filter(d => d._2 != null && d._2.getBytes("UTF-8").length >= 2)
    assert(out.nonEmpty && out.size == docs.length)
    docs.foreach { case (id, text) =>
      val txt = text.getBytes("UTF-8")
      val m = txt.length - (txt.length % 2)
      val left = (0 until m by 2).map { i =>
        val v0 = (txt(i) & 0xFF) |
          ((((txt((i + 1) % m) & 0xFF) * 3 + i) % 256) << 8)
        (if (v0 >= 32768) v0 - 65536 else v0).toLong
      }
      val energy = left.map(v => v * v).sum
      val wins = left.grouped(16).filter(_.length == 16)
        .map(w => w.map(v => v * v).sum < 4000000000L).toArray
      var run = 0L; var maxRun = 0L
      wins.foreach { s =>
        if (s) { run += 1; maxRun = math.max(maxRun, run) } else run = 0
      }
      val (nw, sw, mr, en) = out(id)
      assert(nw == wins.length.toLong, s"doc $id n_windows")
      assert(sw == wins.count(identity).toLong, s"doc $id silent")
      assert(mr == maxRun, s"doc $id max run")
      assert(en == energy, s"doc $id energy")
    }
  }
}
