package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The injected optimizer rule must turn the declarative dot-product fold
  * into VecDot/VecNormSq — and leave near-miss patterns alone. */
class VecDotRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def foldDot(a: String, b: String) =
    aggregate(zip_with(col(a), col(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  // RDD-backed, not a LocalRelation: ConvertToLocalRelation would eagerly
  // evaluate a local projection and leave no expressions to inspect
  private lazy val df = spark.createDataFrame(spark.sparkContext.parallelize(
    Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.5, -1.5), Seq(2.0, 2.0))))).toDF("a", "b")

  private def optimizedContains(dfPlan: org.apache.spark.sql.DataFrame,
                                needle: String): Boolean =
    dfPlan.queryExecution.optimizedPlan.expressions
      .exists(_.find(e => e.getClass.getSimpleName == needle).isDefined)

  test("fold over two columns rewrites to VecDot, values unchanged") {
    val q = df.select(foldDot("a", "b").as("d"))
    assert(optimizedContains(q, "VecDot"))
    assert(q.as[Double].collect().toSeq == Seq(32.0, -2.0))
  }

  test("self fold rewrites to VecNormSq") {
    val q = df.select(
      aggregate(zip_with(col("a"), col("a"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("n"))
    assert(optimizedContains(q, "VecNormSq"))
    assert(q.as[Double].collect().toSeq == Seq(14.0, 2.5))
  }

  test("SQL text form is rewritten too") {
    df.createOrReplaceTempView("vecs")
    val q = spark.sql(
      "SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0d, " +
        "(acc, x) -> acc + x) AS d FROM vecs")
    assert(optimizedContains(q, "VecDot"))
    assert(q.as[Double].collect().toSeq == Seq(32.0, -2.0))
  }

  test("-0.0 seed is NOT rewritten (empty-array fold keeps its sign bit)") {
    val q = df.select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(-0.0), (acc, x) => acc + x).as("d"))
    assert(!optimizedContains(q, "VecDot"))
  }

  test("malformed SQL calls fail with a clear arity message, not an internal error") {
    df.createOrReplaceTempView("vecs_arity")
    val e1 = intercept[Exception](
      spark.sql("SELECT vec_dot(a) FROM vecs_arity").collect())
    assert(e1.getMessage.contains("vec_dot expects 2 argument"))
    val e2 = intercept[Exception](
      spark.sql("SELECT kmv_distinct(1.0, a[1]) FROM vecs_arity").collect())
    assert(e2.getMessage.contains("literal"))
  }

  test("near-miss patterns are left alone") {
    // wrong zero
    val q1 = df.select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(1.0), (acc, x) => acc + x).as("d"))
    assert(!optimizedContains(q1, "VecDot"))
    // wrong combine (subtract)
    val q2 = df.select(aggregate(zip_with(col("a"), col("b"), (x, y) => x - y),
      lit(0.0), (acc, x) => acc + x).as("d"))
    assert(!optimizedContains(q2, "VecDot"))
    // values of the near-misses still sane (rule did not corrupt them)
    assert(q1.as[Double].collect().toSeq == Seq(33.0, -1.0))
  }
}
