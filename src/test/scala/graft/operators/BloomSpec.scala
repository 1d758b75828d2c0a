package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Bloom pre-filter economics + correctness-composition laws. The graded
  * dd18 entry proves the composed answer equals the anti-join's; this suite
  * pins the filter-level properties that make the acceleration sound. */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def keysDf(keys: Seq[Long]) = {
    import spark.implicits._
    keys.toDF("k")
  }

  test("no false negatives: every inserted key probes positive") {
    val keys = (1L to 500L).map(_ * 7919L)
    val bits = BloomDedup.buildBits(keysDf(keys), col("k"),
      numBits = 8192, numHashes = 5)
    keys.foreach { k =>
      assert(BloomDedup.mightContain(bits, 5, k), s"false negative for $k")
    }
  }

  test("false-positive rate tracks the sizing formula") {
    val keys = (1L to 500L).map(_ * 7919L)
    val bits = BloomDedup.buildBits(keysDf(keys), col("k"),
      numBits = 8192, numHashes = 5)
    // theoretical FP at n=500, m=8192, k=5 is ~0.13%; probe 20k absent
    // keys and allow a generous 8x margin over theory before failing
    val absent = (1L to 20000L).map(_ * 104729L + 3L).filterNot(keys.contains)
    val fp = absent.count(k => BloomDedup.mightContain(bits, 5, k))
    assert(fp.toDouble / absent.size < 0.13 * 0.08,
      s"FP rate ${fp.toDouble / absent.size} way over theory")
  }

  test("build is deterministic and merge-order invariant") {
    val keys = (1L to 2000L).map(_ * 31L)
    val a = BloomDedup.buildBits(keysDf(keys), col("k"), 4096, 4)
    val b = BloomDedup.buildBits(
      keysDf(scala.util.Random.shuffle(keys)).repartition(7), col("k"),
      4096, 4)
    assert(a.toSeq == b.toSeq,
      "bitset must not depend on row order or partitioning")
  }

  test("flagNew equals the plain anti-join answer, and the maybe set covers all dups") {
    import spark.implicits._
    val store = (1L to 300L).map(k => (k, s"text-$k")).toDF("id", "payload")
    // batch: 40 true dups of the store + 60 fresh rows
    val batch = ((261L to 300L) ++ (1001L to 1060L))
      .map(k => (k, s"text-$k")).toDF("id", "payload")
    val keyOf = conv(substring(md5(col("payload")), 1, 15), 16, 10)
      .cast("long")
    val out = BloomDedup.flagNew(store, batch, keyOf, numBits = 4096,
      numHashes = 4).collect()
    assert(out.length == 100)
    val newIds = out.filter(_.getAs[Boolean]("is_new"))
      .map(_.getAs[Long]("id")).toSet
    assert(newIds == (1001L to 1060L).toSet)
    // soundness of the fast path: every true dup must sit in the maybe set
    val maybeIds = out.filter(_.getAs[Boolean]("maybe"))
      .map(_.getAs[Long]("id")).toSet
    assert((261L to 300L).toSet.subsetOf(maybeIds))
  }
}
