package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Semantics of the auto-widening filtered ANN (sim6c): the cutoff radius
  * is the SMALLEST one whose cumulative candidate count reaches k, the
  * result is top-k WITHIN that radius (not a global top-k over all probed
  * buckets), and the filter prunes before the probe. Verified against a
  * hand-planted bucket layout where those three properties give three
  * different answers. */
class FilteredAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 4-dim vectors; signBucket(bits=4) keys on the four signs, MSB first.
  // Query 0 sits in bucket 1111. Planted (all label 1 unless noted):
  //   radius 0 (1111): a1 ~ cos 1.0, a2 ~ cos 0.945
  //   radius 1 (1110): b1 ~ cos 0.836, b2 ~ cos -0.46  (the low scorer)
  //   radius 2 (1100): c1..c3 ~ cos 0.707  (above b2!)
  //   bucket 1111, label 9: d ~ cos 1.0    (must be filtered OUT)
  private val rows = Seq(
    (0L, Seq(1f, 1f, 1f, 1f), 1),
    (1L, Seq(0.9f, 0.9f, 0.9f, 0.9f), 1),     // a1
    (2L, Seq(1f, 2f, 1f, 1f), 1),             // a2
    (3L, Seq(1f, 1f, 1f, -0.1f), 1),          // b1
    (4L, Seq(0.1f, 0.1f, 0.1f, -5f), 1),      // b2 (low cosine)
    (5L, Seq(1f, 1f, -0.001f, -0.001f), 1),   // c1
    (6L, Seq(2f, 2f, -0.001f, -0.001f), 1),   // c2
    (7L, Seq(1f, 1f, -0.002f, -0.001f), 1),   // c3
    (8L, Seq(1f, 1f, 1f, 0.9f), 9))           // d: unfiltered, radius 0
  private def emb = rows.toDF("vec_id", "embedding", "label")

  test("cutoff is the smallest radius filling k; top-k stays inside it") {
    val out = Similarity.filteredBucketedTopKAutoWiden(emb, "vec_id",
      "embedding", queryId = 0L, k = 4, pred = col("label") === 1)
      .collect().map(_.getLong(0))
    // radius 0 holds {0, a1, a2} = 3 < 4; radius <= 1 holds 5 >= 4 ->
    // cutoff 1. Result must be the best 4 of {0, a1, a2, b1, b2} — b2
    // (cos -0.46) included, every c (cos 0.707) excluded, d excluded.
    assert(out.toSet == Set(0L, 1L, 2L, 3L),
      s"expected radius<=1 top-4, got ${out.toSeq}")
    val out5 = Similarity.filteredBucketedTopKAutoWiden(emb, "vec_id",
      "embedding", queryId = 0L, k = 5, pred = col("label") === 1)
      .collect().map(_.getLong(0))
    assert(out5.toSet == Set(0L, 1L, 2L, 3L, 4L),
      s"k=5 must include the low-scoring radius-1 candidate, not a radius-2 one: ${out5.toSeq}")
  }

  test("when probes exhaust below k, every filtered candidate returns") {
    val out = Similarity.filteredBucketedTopKAutoWiden(emb, "vec_id",
      "embedding", queryId = 0L, k = 100, pred = col("label") === 1)
      .collect().map(_.getLong(0))
    assert(out.toSet == Set(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("maxRadius caps the widening even when k is unmet") {
    val out = Similarity.filteredBucketedTopKAutoWiden(emb, "vec_id",
      "embedding", queryId = 0L, k = 100, pred = col("label") === 1,
      maxRadius = 1)
      .collect().map(_.getLong(0))
    assert(out.toSet == Set(0L, 1L, 2L, 3L, 4L))
  }
}
