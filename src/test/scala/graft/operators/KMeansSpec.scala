package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.expressions.VecFns

/** Lloyd training for IVF centroids: distortion must not increase per
  * iteration, results must be partition-layout invariant (VecSumAgg merge),
  * and sim4's query path must accept trained centroids. */
class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def emb = graft.queries.Tables.t(spark, dir, "embeddings")

  test("training reduces (or keeps) the k-means objective") {
    def d(c: org.apache.spark.sql.DataFrame) =
      Similarity.distortion(emb, "vec_id", "embedding", c)
        .head().getDouble(0)
    val init = Similarity.trainCentroids(emb, "vec_id", "embedding",
      nlist = 8, iters = 0)
    val one = Similarity.trainCentroids(emb, "vec_id", "embedding",
      nlist = 8, iters = 1)
    val five = Similarity.trainCentroids(emb, "vec_id", "embedding",
      nlist = 8, iters = 5)
    val (d0, d1, d5) = (d(init), d(one), d(five))
    assert(d1 <= d0 + 1e-9, s"iter1 $d1 vs init $d0")
    assert(d5 <= d1 + 1e-9, s"iter5 $d5 vs iter1 $d1")
    assert(d5 < d0, "five Lloyd iterations should actually improve distortion")
  }

  test("trained centroids are partition-layout invariant") {
    val a = Similarity.trainCentroids(emb.coalesce(1), "vec_id", "embedding",
      nlist = 4, iters = 3).orderBy("cid").collect()
    val b = Similarity.trainCentroids(emb.repartition(7), "vec_id", "embedding",
      nlist = 4, iters = 3).orderBy("cid").collect()
    assert(a.map(_.getInt(0)).toSeq == b.map(_.getInt(0)).toSeq)
    a.zip(b).foreach { case (ra, rb) =>
      assert(ra.getSeq[Double](1) == rb.getSeq[Double](1),
        s"centroid ${ra.getInt(0)} differs across layouts")
    }
  }

  test("ivfTopK accepts trained centroids and still returns k neighbors") {
    val trained = Similarity.trainCentroids(emb, "vec_id", "embedding",
      nlist = 4, iters = 3)
    val out = Similarity.ivfTopK(emb, "vec_id", "embedding",
      queryId = 1, k = 5, centroidsOverride = Some(trained)).collect()
    assert(out.length == 5)
    // the query vector itself is its own nearest neighbor at score 1.0
    assert(out.map(_.getLong(0)).contains(1L))
  }

  test("vecSum poisons on ragged dimensions instead of truncating") {
    import spark.implicits._
    val ragged = Seq(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)).toDF("v")
      .select(col("v").cast("array<double>").as("v"))
    assert(ragged.agg(VecFns.vecSum(col("v"))).head().isNullAt(0))
    val ok = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)).toDF("v")
      .select(col("v").cast("array<double>").as("v"))
    assert(ok.agg(VecFns.vecSum(col("v"))).head()
      .getSeq[Double](0) == Seq(4.0, 6.0))
  }
}
