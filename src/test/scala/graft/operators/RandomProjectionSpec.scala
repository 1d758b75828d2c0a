package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Random projection: deterministic sign matrix, scan-side-only plan, and
  * the JL property the operator exists for — pairwise distances survive the
  * 64→16 compression within lemma-scale distortion. Plus the A-Res weighted
  * sampler: inclusion tracks weight, zero weight never samples. */
class RandomProjectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sign matrix is deterministic and mixes both signs per row") {
    val a = RandomProjection.signMatrix(16, 64)
    val b = RandomProjection.signMatrix(16, 64)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    a.foreach { row =>
      assert(row.forall(x => x == 1.0 || x == -1.0))
      assert(row.contains(1.0) && row.contains(-1.0))
    }
    // rows differ from each other (independent hash streams)
    assert(a.map(_.toSeq).distinct.length == 16)
  }

  test("projection is scan-side only — no exchange in the plan") {
    val emb = graft.queries.Tables.t(spark, "/root/testdata/sf0.001",
      "embeddings")
    val df = RandomProjection.project(emb, "vec_id", "embedding", 16, 64)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "a projection must not shuffle:\n" + plan)
  }

  test("pairwise distances survive 64->16 within JL-scale distortion") {
    val emb = graft.queries.Tables.t(spark, "/root/testdata/sf0.001",
      "embeddings")
    val orig = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
      .filter(col("vec_id") < 40).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val proj = RandomProjection.project(emb.filter(col("vec_id") < 40),
      "vec_id", "embedding", 16, 64).collect()
      .map(r => r.getLong(0) ->
        (1 until 17).map(r.getDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- orig.keys.toSeq.sorted; j <- orig.keys.toSeq.sorted if i < j
      dOrig = d2(orig(i), orig(j)) if dOrig > 1e-12
    } yield d2(proj(i), proj(j)) / dOrig
    // E[ratio] = 1; k = 16 gives wide but bounded per-pair spread
    assert(ratios.forall(r => r > 0.1 && r < 3.5),
      s"worst ratios: ${ratios.min} / ${ratios.max}")
    val mean = ratios.sum / ratios.size
    assert(mean > 0.75 && mean < 1.3, s"mean distance ratio $mean")
  }

  test("A-Res sampling tracks weight and excludes zero weight") {
    // 900 light rows (weight 1), 100 heavy (weight 40), 10 zero-weight.
    val rows = (0 until 900).map(i => (i.toLong, 1.0)) ++
      (900 until 1000).map(i => (i.toLong, 40.0)) ++
      (1000 until 1010).map(i => (i.toLong, 0.0))
    val df = rows.toDF("id", "w")
      .withColumn("k0", Sampling.aresKey(col("id").cast("string"), col("w")))
    val top = df.orderBy(desc("k0"), asc("id")).limit(100).collect()
    val heavy = top.count(r => r.getLong(0) >= 900 && r.getLong(0) < 1000)
    // heavy rows are 10% of the population but 40x the weight — they must
    // dominate the sample (E ≈ 78 of 100); loose bound avoids flakiness
    // (the hash is fixed, so this is deterministic anyway)
    assert(heavy > 55, s"only $heavy heavy rows in the top 100")
    assert(!top.exists(_.getLong(0) >= 1000), "zero weight must never sample")
  }
}
