package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Structural laws of the dedup primitives: shingle shape, and the
  * pigeonhole recall guarantee of simhash byte-banding verified against a
  * brute-force all-pairs Hamming scan. */
class DedupProps extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the cat sat on the hat"),          // 1 token from doc 0
    (2L, "the cat sat on the mat"),          // exact dup of doc 0
    (3L, "completely different words here today friends"),
    (4L, "completely different words here today folks"),
    (5L, "one"),
    (6L, ""),
    (7L, "alpha beta gamma delta epsilon zeta eta theta"))
    .toDF("doc_id", "text")

  test("shingle count and arity laws") {
    val n = 3
    val rows = docs.select(col("doc_id"),
      size(split(col("text"), " ")).as("w"),
      Dedup.wordShingles(col("text"), n).as("sh")).collect()
    rows.foreach { r =>
      val words = r.getInt(1)
      val shingles = r.getSeq[String](2)
      assert(shingles.size == math.max(0, words - n + 1),
        s"doc ${r.getLong(0)}")
      shingles.foreach(s => assert(s.split(" ", -1).length == n))
    }
  }

  test("shingleSet equals distinct of shingleMultiset") {
    val a = Dedup.shingleSet(docs, "doc_id", "text").collect().toSet
    val b = Dedup.shingleMultiset(docs, "doc_id", "text").distinct()
      .collect().toSet
    assert(a == b)
  }

  test("crossSourceDupMatrix equals the brute-force pair count " +
    "(exact and prefix modes)") {
    // deterministic corpus with intra- and cross-source duplicate groups;
    // bodies differ more often than 2-token prefixes, so the two modes
    // produce different (both non-empty) matrices
    val rows = (0 until 60).map { i =>
      (i.toLong, s"pfx${i % 5} common body ${i % 7}", s"src${i % 3}")
    }
    val df = rows.toDF("doc_id", "text", "source")
    def brute(key: String => String) = (for {
      (ia, ta, sa) <- rows; (ib, tb, sb) <- rows
      if ia < ib && key(ta) == key(tb)
    } yield if (sa <= sb) (sa, sb) else (sb, sa))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    def got(prefix: Option[Int]) =
      Dedup.crossSourceDupMatrix(df, "doc_id", "text", "source", prefix)
        .collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val exact = got(None)
    val pfx2 = got(Some(2))
    assert(exact == brute(identity))
    assert(pfx2 == brute(_.split(" ").take(2).mkString(" ")))
    assert(exact.nonEmpty && pfx2.nonEmpty && exact != pfx2)
  }

  test("simhash byte-banding finds EVERY pair within Hamming distance 3 " +
    "(32- and 64-bit)") {
    Seq(32, 64).foreach { bits =>
      // brute force over all simhash pairs
      val sims = Dedup.simhash(docs, "doc_id", "text", bits).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = (for {
        a <- sims.keys; b <- sims.keys if a < b
        if java.lang.Long.bitCount(sims(a) ^ sims(b)) <= 3
      } yield (a, b)).toSet
      val got = Dedup.simhashNearDupPairs(docs, "doc_id", "text",
        maxHamming = 3, bits = bits)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want,
        s"$bits-bit banding missed ${want -- got}, invented ${got -- want}")
      // the exact dup pair must be there at distance 0
      assert(got.contains((0L, 2L)), s"$bits-bit")
    }
  }

  test("64-bit simhash separates random pairs the 32-bit space conflates") {
    // 60 short random-ish docs: in 32 bits some unrelated pairs land within
    // Hamming 3 (the saturation the scale sweep measured); 64 bits must not
    // conflate MORE pairs than 32 bits does
    import spark.implicits._
    val many = (0 until 60).map(i =>
      (i.toLong, s"w${i * 7 % 13} w${i * 11 % 17} w${i * 5 % 19} unique$i"))
      .toDF("doc_id", "text")
    def pairs(bits: Int) =
      Dedup.simhashNearDupPairs(many, "doc_id", "text",
        maxHamming = 3, bits = bits).count()
    assert(pairs(64) <= pairs(32),
      "wider hash must be at least as selective on unrelated docs")
  }

  test("duplicatedSpans reports maximal cross-doc spans, 0-based offsets") {
    import spark.implicits._
    val corpus = Seq(
      // 10 shared tokens at A offset 0 / B offset 3 — one maximal span
      // each, not seven single-shingle reports
      (0L, "a b c d e f g h i j uniqA1 uniqA2"),
      (1L, "x y z a b c d e f g h i j"),
      // self-repetition inside one doc counts (ExactSubstr semantics):
      // every 4-shingle of the period-4 text recurs, one whole-doc span
      (2L, "p q r s p q r s p q r s"),
      (3L, "entirely fresh tokens without any duplication present")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(corpus, "doc_id", "text",
      k = 4, minTokens = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(spans == Set((0L, 0, 10), (1L, 3, 10), (2L, 0, 12)),
      s"got $spans")
  }

  test("duplicatedSpans honors the min-length floor") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "a b c d e tailA1 tailA2 tailA3"),
      (1L, "a b c d e tailB1 tailB2 tailB3")
    ).toDF("doc_id", "text")
    // the shared run is 5 tokens; floor 6 drops it, floor 5 reports it
    assert(Dedup.duplicatedSpans(corpus, "doc_id", "text",
      k = 4, minTokens = 6).count() == 0)
    assert(Dedup.duplicatedSpans(corpus, "doc_id", "text",
      k = 4, minTokens = 5).count() == 2)
  }

  test("nearDupPairs never pairs a non-representative (exact dups collapse)") {
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.1)
      .collect()
    // doc 2 is an exact dup of doc 0 — only the min id may appear
    assert(pairs.forall(r => r.getLong(0) != 2L && r.getLong(1) != 2L))
  }

  test("nearDupPairsOnReps on an exact-deduped frame equals nearDupPairs " +
    "(the skipped collapse is the identity there)") {
    // collapse exactly as pipe6's exact stage does, then compare both forms
    val reps = Dedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.1)
    val exact = docs
      .withColumn("__h", Dedup.hash128(col("text")))
      .withColumn("__m", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("__h")))
      .filter(col("doc_id") === col("__m")).select("doc_id", "text")
    val onReps = Dedup.nearDupPairsOnReps(exact, "doc_id", "text",
      threshold = 0.1)
    def setOf(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(setOf(onReps) == setOf(reps))
  }

  test("documented unique-id precondition: a duplicated id yields " +
    "duplicated (id, shingle) rows — callers dedup ids first") {
    // shingleSet's zero-shuffle distinctness holds only for unique ids
    // (ADVICE r14): pin the duplicated-id behavior so a silent contract
    // change flags here instead of inflating verify counts downstream.
    val dup = docs.unionByName(docs.filter(col("doc_id") === 0L))
    val rows = Dedup.shingleSet(dup, "doc_id", "text")
      .filter(col("doc_id") === 0L)
    assert(rows.count() === 2 * rows.distinct().count(),
      "duplicate-id input must surface as duplicated shingle rows")
    // and the distinct-set law still holds on the unique-id corpus
    val a = Dedup.shingleSet(docs, "doc_id", "text").count()
    assert(a == Dedup.shingleSet(docs, "doc_id", "text").distinct().count())
  }

  test("hash128 keys: no within-fixture collisions, and equal text means " +
    "equal key (crossSourceDupMatrix/segmentDedup identity class)") {
    val keys = docs.filter(length(col("text")) > 0)
      .select(col("text"), Dedup.hash128(col("text")).as("k")).distinct()
    val nTexts = keys.select("text").distinct().count()
    assert(keys.select("k").distinct().count() == nTexts,
      "distinct texts must map to distinct 128-bit keys here")
    val perText = keys.groupBy("text").count().filter(col("count") > 1)
    assert(perText.count() == 0, "one key per text value")
  }
}
