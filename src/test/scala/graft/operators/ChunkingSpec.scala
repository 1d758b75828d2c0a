package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Chunking/packing laws against brute-force single-threaded references,
  * plus the shard-size invariance that proves the two-level prefix sum is
  * a real global prefix sum. */
class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e f g h i j"),   // 10 tokens
    (2L, ""),                      // split -> [""], 1 token
    (3L, "x"),                     // 1 token
    (4L, (1 to 6).map(i => s"t$i").mkString(" ")),  // exactly size
    (5L, (1 to 7).map(i => s"t$i").mkString(" ")),  // size + 1
    (9L, (1 to 23).map(i => s"w$i").mkString(" ")))
    .toDF("doc_id", "text")

  private def bruteChunks(text: String, size: Int, overlap: Int)
      : Seq[(Int, Int, String)] = {
    val w = text.split(" ", -1)
    val stride = size - overlap
    (1 to math.max(w.length, 1) by stride).zipWithIndex.map {
      case (start, idx) =>
        val chunk = w.slice(start - 1, start - 1 + size)
        (idx, chunk.length, chunk.mkString(" "))
    }
  }

  test("tokenChunks matches the brute-force slicing on edge shapes") {
    for ((size, overlap) <- Seq((6, 2), (4, 0), (3, 2))) {
      val got = Chunking.tokenChunks(docs, "doc_id", "text", size, overlap)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
        .sortBy(t => (t._1, t._2))
      val want = docs.collect().flatMap { r =>
        bruteChunks(r.getString(1), size, overlap)
          .map(c => (r.getLong(0), c._1, c._2, c._3))
      }.sortBy(t => (t._1, t._2)).toSeq
      assert(got.toSeq == want, s"size=$size overlap=$overlap")
    }
  }

  test("packAssignments matches a sequential concat-and-cut scan") {
    val cap = 8L
    val got = Chunking.packAssignments(docs, "doc_id", "text", cap, 4096)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).sortBy(_._1).toSeq
    var off = 0L
    val want = docs.collect().sortBy(_.getLong(0)).map { r =>
      val n = r.getString(1).split(" ", -1).length.toLong
      val row = (r.getLong(0), n, off, off / cap, off / cap != (off + n - 1) / cap)
      off += n
      row
    }.toSeq
    assert(got == want)
  }

  test("packing is shard-size invariant (the prefix sum is global)") {
    val a = Chunking.packAssignments(docs, "doc_id", "text", 8, 4096)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    for (shard <- Seq(1L, 3L, 7L)) {
      val b = Chunking.packAssignments(docs, "doc_id", "text", 8, shard)
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
      assert(a.toSeq == b.toSeq, s"shardSize=$shard")
    }
  }
}
