package graft.expressions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.TestSpark

/** The native VecDot/VecNormSq must be drop-in equal to the declarative
  * higher-order-function folds they replace — same values bit for bit, same
  * null semantics — in BOTH evaluation modes (whole-stage codegen and the
  * interpreted `eval` used under codegen fallback). */
class VecExprsSpec extends AnyFunSuite {

  private def forAllSampled[A](g: Gen[A], n: Int = 60)(f: A => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(n).foreach(f)

  private def forAllSampled2[A, B](ga: Gen[A], gb: Gen[B], n: Int)(f: (A, B) => Unit): Unit =
    Iterator.continually(for (a <- ga.sample; b <- gb.sample) yield (a, b))
      .flatten.take(n).foreach { case (a, b) => f(a, b) }
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def foldDot = (a: String, b: String) =>
    aggregate(zip_with(col(a), col(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  private val vecGen: Gen[Seq[Double]] =
    Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1e3, 1e3).map(_.toDouble)))

  test("vec_dot equals the zip_with/aggregate fold on random vectors") {
    forAllSampled2(vecGen, vecGen, 40) { (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val r = df.select(
        VecFns.dot(col("a"), col("b")).as("n"),
        foldDot("a", "b").as("f")).head()
      assert(r.get(0) == r.get(1), s"a=$a b=$b")
    }
  }

  test("vec_norm_sq equals dot(v, v)") {
    forAllSampled(vecGen, 40) { v =>
      val df = Seq(Tuple1(v)).toDF("v")
      val r = df.select(
        VecFns.normSq(col("v")).as("n"),
        foldDot("v", "v").as("f")).head()
      assert(r.get(0) == r.get(1))
    }
  }

  test("null semantics: null input, null element, length mismatch") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType), nullable = true),
      StructField("b", ArrayType(DoubleType), nullable = true)))
    val rows = Seq(
      Row(null, Seq(1.0, 2.0)),                  // null input
      Row(Seq(1.0, null), Seq(1.0, 2.0)),        // null element
      Row(Seq(1.0), Seq(1.0, 2.0)),              // length mismatch
      Row(Seq.empty[Double], Seq.empty[Double]), // empty -> 0.0
      Row(Seq(2.0, 3.0), Seq(4.0, 5.0)))         // plain -> 23.0
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map {
        case Row(a, b) => Row(
          if (a == null) null else a.asInstanceOf[Seq[Any]],
          b.asInstanceOf[Seq[Any]])
      }), schema)
    val got = df.select(VecFns.dot(col("a"), col("b"))).collect().map(_.get(0))
    assert(got.toSeq == Seq(null, null, null, 0.0, 23.0))
    // the fold agrees on every case
    val fold = df.select(foldDot("a", "b")).collect().map(_.get(0))
    assert(fold.toSeq == got.toSeq)
  }

  test("interpreted eval matches codegen results") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    def lit2(v: Seq[Double]) =
      Literal(ArrayData.toArrayData(v.toArray), ArrayType(DoubleType))
    assert(VecDot(lit2(Seq(2.0, 3.0)), lit2(Seq(4.0, 5.0))).eval(null) == 23.0)
    assert(VecDot(lit2(Seq.empty), lit2(Seq.empty)).eval(null) == 0.0)
    assert(VecDot(lit2(Seq(1.0)), lit2(Seq(1.0, 2.0))).eval(null) == null)
    assert(VecNormSq(lit2(Seq(3.0, 4.0))).eval(null) == 25.0)
  }

  test("SQL surface via GraftExtensions: vec_dot / vec_norm_sq resolve") {
    val r = spark.sql(
      "SELECT vec_dot(array(1d, 2d), array(3d, 4d)) AS d, " +
        "vec_norm_sq(array(3d, 4d)) AS n").head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 25.0)
  }
}
