package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Classifier (hashed-feature logistic regression): the objective must
  * improve with training, training must be partition-layout invariant
  * (the 2⁻²⁰-grid gradient claim), and a separable toy corpus must
  * actually be learned. */
class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = graft.queries.Tables.t(spark,
    "/root/testdata/sf0.001", "documents")
  private val lab = when(col("source") === "src0", 1.0).otherwise(0.0)

  test("gradient steps reduce the log-loss objective monotonically") {
    def loss(iters: Int) = Classifier.meanLogLoss(
      Classifier.logRegScores(docs, "doc_id", "text", lab, iters = iters))
    val (l0, l1, l3) = (loss(0), loss(1), loss(3))
    assert(l1 < l0, s"one step must improve: $l1 vs $l0")
    assert(l3 <= l1 + 1e-12, s"three steps vs one: $l3 vs $l1")
  }

  test("trained scores are partition-layout invariant") {
    def scores(d: org.apache.spark.sql.DataFrame) =
      Classifier.logRegScores(d, "doc_id", "text", lab, iters = 2)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(3))).toSeq
    assert(scores(docs.coalesce(1)) == scores(docs.repartition(13)),
      "grid-quantized gradient sums must not depend on partition layout")
  }

  test("a separable toy corpus is learned") {
    import spark.implicits._
    val toy = (0 until 40).map { i =>
      val pos = i % 2 == 0
      (i.toLong, if (pos) s"quality shines here sample$i"
                 else s"garbage noise there sample$i", pos)
    }.toDF("doc_id", "text", "is_pos")
    val out = Classifier.logRegScores(toy, "doc_id", "text",
      when(col("is_pos"), 1.0).otherwise(0.0), dims = 32, iters = 8,
      lr = 2.0)
    val byLabel = out.groupBy("label").agg(avg("prob").as("p"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(byLabel(1) > byLabel(0) + 0.2,
      s"positives must score clearly higher: $byLabel")
  }

  test("classifierGate keeps ~keepFraction and is threshold-consistent") {
    val kept = Classifier.classifierGate(docs, "doc_id", "text", lab,
      keepFraction = 0.25, lo = -64.0, hi = 0.0).collect()
    val n = docs.count().toDouble
    val thr = kept.head.getAs[Double]("thr")
    // every kept row clears the gate, and the kept mass is the target to
    // within histogram-bin granularity (the documented sort-free trade)
    assert(kept.forall(_.getAs[Double]("score") >= thr))
    assert(math.abs(kept.length / n - 0.25) < 0.05,
      s"kept ${kept.length} of $n at thr=$thr")
    // widening the keep budget can only lower the threshold: supersets
    val kept50 = Classifier.classifierGate(docs, "doc_id", "text", lab,
      keepFraction = 0.5, lo = -64.0, hi = 0.0).collect()
    val ids = kept.map(_.getLong(0)).toSet
    val ids50 = kept50.map(_.getLong(0)).toSet
    assert(ids.subsetOf(ids50),
      "a larger keep fraction must keep a superset")
  }

  test("iters=0 scores everything at the 0.5 prior") {
    val out = Classifier.logRegScores(docs, "doc_id", "text", lab,
      iters = 0)
    assert(out.filter(col("prob") =!= 0.5).count() == 0)
    intercept[IllegalArgumentException](
      Classifier.logRegScores(docs, "doc_id", "text", lab, dims = 0))
  }
}
