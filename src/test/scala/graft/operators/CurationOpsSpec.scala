package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Laws for the round-7 curation additions that grade only through SQL
  * oracles elsewhere: temperature mixing (mixture shape + determinism),
  * the inverted index (posting completeness vs a brute-force scan), and
  * TF-IDF (sanity of the idf direction). */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = (1 to 400).map { i =>
    val src = if (i <= 300) "big" else "small"
    (i.toLong, src, s"tok$i shared common words the a of tok${i % 7}")
  }.toDF("doc_id", "source", "text")

  test("temperatureMix flattens the source distribution deterministically") {
    val out = Sampling.temperatureMix(docs, col("doc_id").cast("string"),
      col("source"), alpha = 0.5, targetTotal = 200)
    val kept = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // alpha=0.5 gives the small source a larger keep PROBABILITY:
    // p_small/n_small > p_big/n_big even though fewer rows survive overall
    val pBig = kept("big").toDouble / 300
    val pSmall = kept("small").toDouble / 100
    assert(pSmall > pBig,
      s"temperature should upsample the small source: $kept")
    // deterministic: same rows on re-run and under a different layout
    val again = Sampling.temperatureMix(docs.repartition(13),
      col("doc_id").cast("string"), col("source"), 0.5, 200)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("invertedIndex postings are complete, sorted, and df-consistent") {
    val idx = Indexing.invertedIndex(docs, "doc_id", "text",
      minDf = 2, shardSize = 50)
    val rows = idx.collect()
    // brute force: term -> set of docs containing it
    val truth = docs.collect().flatMap { r =>
      r.getString(2).split(" ", -1).distinct.map(tok => tok -> r.getLong(0))
    }.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    rows.groupBy(_.getString(0)).foreach { case (term, shards) =>
      val posted = shards.flatMap(_.getString(4).split(",").map(_.toLong))
      assert(posted.toSet == truth(term), s"term=$term postings differ")
      assert(shards.forall { s =>
        val p = s.getString(4).split(",").map(_.toLong)
        p.sameElements(p.sorted) && p.length == s.getLong(3)
      }, s"term=$term shard postings unsorted or miscounted")
      assert(shards.map(_.getLong(2)).distinct.length == 1 &&
        shards.head.getLong(2) == truth(term).size,
        s"term=$term df disagrees with the brute-force document count")
    }
    // the df gate keeps exactly the terms at or above the floor
    assert(rows.map(_.getString(0)).toSet ==
      truth.filter(_._2.size >= 2).keySet)
  }

  test("fingerprintMatchPairs equals the brute-force fingerprint " +
    "intersection under the df cap") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again ok"),
      (2L, "the quick brown fox jumps over the lazy dog again and again no"),
      (3L, "completely unrelated text with different characters entirely"),
      (4L, "the quick brown fox jumps over something else entirely today"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnowingFingerprints(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val df = fps.groupBy(_._2).map { case (f, xs) => f -> xs.length }
    val byDoc = fps.groupBy(_._1).map { case (d, xs) =>
      d -> xs.map(_._2).filter(df(_) <= 3).toSet }
    val want = (for {
      a <- byDoc.keys; b <- byDoc.keys if a < b
      shared = (byDoc(a) & byDoc(b)).size if shared >= 2
    } yield (a, b, shared.toLong)).toSet
    val got = TextAnalysis.fingerprintMatchPairs(corpus, "doc_id", "text",
      minShared = 2, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.exists(p => p._1 == 1L && p._2 == 2L),
      "near-identical docs must match")
  }

  test("tfidf ranks a doc-unique token above corpus-wide boilerplate") {
    val top = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 1)
      .filter(col("doc_id") === 42).collect()
    assert(top.length == 1)
    // 'tok42' appears in one doc; 'common'/'shared'/stopwords in all 400
    assert(top.head.getString(1) == "tok42", top.head.toString)
  }
}
