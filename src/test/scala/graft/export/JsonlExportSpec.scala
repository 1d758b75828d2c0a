package graft.export

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** K8 — JSONL shard export: record-bounded shard files, lossless round
  * trip, and deterministic shard membership across re-exports. */
class JsonlExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jsonFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(_.getName.endsWith(".json"))

  private val docs = (0L until 97L).map { i =>
    // quotes, backslashes, newlines, unicode — the escape cases a lossy
    // JSONL writer corrupts
    (i, s"""line$i "quoted" back\\slash\nnewline é中$i""")
  }.toDF("doc_id", "text")

  test("shards are record-bounded and the round trip is lossless") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    JsonlExport.writeSharded(docs, "doc_id", dir,
      shards = 4, maxRecordsPerShard = 20)
    val files = jsonFiles(dir)
    assert(files.nonEmpty)
    files.foreach { f =>
      val lines = Files.readAllLines(f.toPath)
      assert(lines.size <= 20, s"${f.getName}: ${lines.size} records")
    }
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.count() === 97)
    // value-level equality, not just counts — escapes must round-trip
    assert(back.except(docs).isEmpty && docs.except(back).isEmpty)
  }

  test("shard membership is deterministic across re-exports") {
    val d1 = Files.createTempDirectory("graft_jsonl_a").toString
    val d2 = Files.createTempDirectory("graft_jsonl_b").toString
    JsonlExport.writeSharded(docs, "doc_id", d1, 4, 20)
    JsonlExport.writeSharded(docs, "doc_id", d2, 4, 20)
    def digests(dir: String): Seq[String] = jsonFiles(dir)
      .map(f => Files.readAllLines(f.toPath).toArray.mkString("\n"))
      .map(s => java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .sorted
    assert(digests(d1) === digests(d2),
      "hash-sharded export must produce identical shard contents per run")
  }
}
