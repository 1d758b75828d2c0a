package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Histogram-quantile laws: the estimate is within one bin width of the
  * exact quantile, monotone in q, and invariant to how the data is
  * partitioned (the merge property that makes it the one-pass scale
  * path). */
class QuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private val values = Seq.fill(5000)(rnd.nextDouble() * 100.0)
  private val df = values.toDF("v")
  private val qs = Seq(0.1, 0.5, 0.9, 0.99)
  private val binWidth = 100.0 / 64

  private def run(data: org.apache.spark.sql.DataFrame): Map[Double, Double] =
    Quantiles.histQuantiles(data, "v", 0.0, 100.0, 64, qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap

  test("estimates land within one bin width of the exact quantile") {
    val sorted = values.sorted
    val got = run(df)
    qs.foreach { q =>
      val exact = sorted(math.min(sorted.size - 1,
        math.ceil(q * sorted.size).toInt - 1))
      assert(math.abs(got(q) - exact) <= binWidth + 1e-9,
        s"q=$q exact=$exact est=${got(q)}")
    }
  }

  test("estimates are monotone in q") {
    val got = run(df)
    qs.sliding(2).foreach { case Seq(a, b) =>
      assert(got(a) <= got(b) + 1e-12, s"$a -> $b")
    }
  }

  test("result is invariant to partition layout (mergeable)") {
    val a = run(df.repartition(1))
    val b = run(df.repartition(17))
    assert(a == b)
  }

  test("grouped form equals per-group global runs") {
    import org.apache.spark.sql.functions._
    val grouped = values.zipWithIndex
      .map { case (v, i) => (s"g${i % 3}", v) }.toDF("grp", "v")
    val got = Quantiles.groupedHistQuantiles(
      grouped, "grp", "v", 0.0, 100.0, 64, qs)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = run(grouped.filter(col("grp") === g).select("v"))
      qs.foreach { q =>
        assert(got((g, q)) == solo(q), s"group $g q=$q")
      }
    }
  }
}
