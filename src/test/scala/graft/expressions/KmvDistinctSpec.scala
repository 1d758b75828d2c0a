package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.Sampling

/** KMV sketch laws: exact below k, close + deterministic above k, and
  * partition-layout invariance (the merge path must produce the identical
  * sketch no matter how the data is split). */
class KmvDistinctSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fracs(n: Int) =
    (1 to n).toDF("i")
      .select(Sampling.hashFraction(col("i").cast("string")).as("frac"))

  test("below k the sketch is the exact distinct count") {
    val got = fracs(10).agg(VecFns.kmvDistinct(col("frac"), 25))
      .head().getDouble(0)
    assert(got == 10.0)
  }

  test("above k the estimate lands near the truth") {
    val got = fracs(5000).agg(VecFns.kmvDistinct(col("frac"), 200))
      .head().getDouble(0)
    assert(math.abs(got - 5000) / 5000.0 < 0.2, s"estimate $got vs 5000")
  }

  test("estimate is invariant to partition layout (merge correctness)") {
    val one = fracs(3000).coalesce(1)
      .agg(VecFns.kmvDistinct(col("frac"), 64)).head().getDouble(0)
    val eight = fracs(3000).repartition(8)
      .agg(VecFns.kmvDistinct(col("frac"), 64)).head().getDouble(0)
    assert(one == eight)
  }

  test("duplicates do not inflate the sketch") {
    val dup = fracs(10).union(fracs(10)).union(fracs(10))
    val got = dup.agg(VecFns.kmvDistinct(col("frac"), 25)).head().getDouble(0)
    assert(got == 10.0)
  }

  test("SQL surface via GraftExtensions") {
    fracs(10).createOrReplaceTempView("kmv_in")
    val got = spark.sql("SELECT kmv_distinct(frac, 25) FROM kmv_in")
      .head().getDouble(0)
    assert(got == 10.0)
  }
}
