package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The production (xxhash64) hash mode must preserve every hash-agnostic
  * guarantee of the graded md5 mode — winnowing's shared-substring property,
  * banded MinHash collision behavior — and keep the cheap hash inside
  * codegen (no md5 in the plan). Values differ between modes by design;
  * the md5 twins stay the oracle-hash-matched entries.
  */
class HashModeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("xxhash winnowing keeps the shared-substring guarantee") {
    // k=8, w=4: any shared substring of length >= 11 must yield a common
    // fingerprint between the two documents, whatever the hash
    val shared = "ABCDEFGHIJKLMNOP" // length 16 >= 11
    val fp = TextAnalysis.winnowingFingerprints(
      docs(1L -> s"xxx$shared", 2L -> s"${shared}qqqqqq"),
      "doc_id", "text", k = 8, w = 4, mode = HashMode.XxHash64)
    val byDoc = fp.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty,
      "a >= w+k-1 shared substring must contribute a common fingerprint")
  }

  test("xxhash winnowing emits nothing for docs shorter than k") {
    val fp = TextAnalysis.winnowingFingerprints(
      docs(1L -> "short"), "doc_id", "text", k = 8, w = 4,
      mode = HashMode.XxHash64)
    assert(fp.count() === 0)
  }

  test("xxhash winnowing matches md5 winnowing's selection density shape") {
    // same text, both modes: fingerprint VALUES differ, but both are
    // (id, fp)-distinct and bounded by the number of full windows
    val text = ("the quick brown fox jumps over the lazy dog " * 5).trim
    val base = docs(1L -> text)
    val md = TextAnalysis.winnowingFingerprints(base, "doc_id", "text")
    val xx = TextAnalysis.winnowingFingerprints(base, "doc_id", "text",
      mode = HashMode.XxHash64)
    val fullWindows = text.length - 8 + 1 - 3
    assert(md.count() <= fullWindows && xx.count() <= fullWindows)
    assert(xx.count() > 0)
  }

  test("xxhash minhash: identical docs collide in every band, and band " +
    "signatures are independent hash functions") {
    val same = "alpha beta gamma delta epsilon zeta eta theta"
    val sh = Dedup.shingleSet(
      docs(1L -> same, 2L -> same, 3L -> "completely different words here now"),
      "doc_id", "text")
    val sig = Dedup.minhashSignatures(sh, "doc_id", bands = 4,
      mode = HashMode.XxHash64)
    val rows = sig.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    (0 until 4).foreach { b =>
      assert(rows((1L, b)) === rows((2L, b)), s"band $b must collide")
    }
    // seeded bands: the same doc's bands must not all carry one value
    assert((0 until 4).map(b => rows((1L, b))).distinct.size > 1,
      "band seeds must yield distinct hash functions")
    val cand = Dedup.lshCandidatePairs(sig, "doc_id").collect()
    assert(cand.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
  }

  test("xxhash minhash is not capped at four bands; md5 mode still is") {
    val sh = Dedup.shingleSet(
      docs(1L -> "one two three four five six"), "doc_id", "text")
    assert(Dedup.minhashSignatures(sh, "doc_id", bands = 8,
      mode = HashMode.XxHash64).count() === 8)
    assertThrows[IllegalArgumentException] {
      Dedup.minhashSignatures(sh, "doc_id", bands = 8)
    }
  }

  test("production plans run the codegen'd hash — no md5 digest remains") {
    // analyzed plan, not executed: a local fixture constant-folds into a
    // LocalTableScan and hides the projection expressions
    val base = docs(1L -> "a b c d e f g h i j")
    val winPlan = TextAnalysis.winnowingFingerprints(base, "doc_id", "text",
      mode = HashMode.XxHash64).queryExecution.analyzed.toString
    assert(winPlan.contains("xxhash64") && !winPlan.contains("md5("),
      "winnowing production mode must hash with xxhash64 only")
    val sigPlan = Dedup.minhashSignatures(
      Dedup.shingleSet(base, "doc_id", "text"), "doc_id", bands = 4,
      mode = HashMode.XxHash64).queryExecution.analyzed.toString
    assert(sigPlan.contains("xxhash64") && !sigPlan.contains("md5("),
      "minhash production mode must hash with xxhash64 only")
  }
}
