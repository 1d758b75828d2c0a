package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.TestSpark

/** The native jaro_winkler must reproduce DuckDB's
  * `jaro_winkler_similarity` exactly — golden values below were produced by
  * DuckDB itself (and cross-checked against an independent reference
  * implementation during the 6k-pair fuzz described in the expression's
  * Scaladoc). */
class StringSimSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def simOf(a: String, b: String): Double =
    JaroWinklerImpl.sim(UTF8String.fromString(a), UTF8String.fromString(b))

  test("golden values match DuckDB") {
    val eps = 1e-12
    assert(math.abs(simOf("martha", "marhta") - 0.9611111111111111) < eps)
    assert(math.abs(simOf("dwayne", "duane") - 0.84) < eps)
    assert(math.abs(simOf("dixon", "dicksonx") - 0.8133333333333332) < eps)
    assert(simOf("abc", "abc") == 1.0)
    assert(simOf("abc", "xyz") == 0.0)
  }

  test("empty-string rule is DuckDB's: any empty side scores 0, even both") {
    assert(simOf("", "") == 0.0)
    assert(simOf("a", "") == 0.0)
    assert(simOf("", "a") == 0.0)
  }

  test("winkler boost applies only above 0.7 jaro (DuckDB goldens)") {
    // same jaro (0.8667) with/without a 4-byte common prefix: only the
    // prefixed pair gets the 0.1-scaled boost
    assert(math.abs(simOf("abcdX", "abcdY") - 0.92) < 1e-12)
    assert(math.abs(simOf("Xabcd", "Yabcd") - 0.8666666666666667) < 1e-12)
    // jaro <= 0.7 with a common prefix: NOT boosted (stays raw jaro)
    assert(math.abs(simOf("abcde", "avwxy") - 0.4666666666666666) < 1e-12)
    // window = max/2-1 = 0 for 2-byte strings: adjacent transposition
    // cannot match at all — DuckDB returns 0.0 here, not 0.833
    assert(simOf("ab", "ba") == 0.0)
  }

  test("multi-byte strings compare by UTF-8 bytes (DuckDB parity)") {
    // byte semantics: 'é' is 2 bytes, shifting the alignment — DuckDB
    // returns 0.84 for this pair (codepoint semantics would give 0.88)
    assert(math.abs(simOf("héllo", "hello") - 0.84) < 1e-12)
    // CJK near-match: byte semantics give 0.9555..., DuckDB-verified
    assert(math.abs(simOf("日本語", "日本誤") - 0.9555555555555556) < 1e-10)
  }

  test("codegen and interpreted eval agree, null semantics intolerant") {
    val df = Seq(("martha", "marhta"), ("dwayne", "duane"), (null, "x"),
      ("x", null)).toDF("a", "b")
    val viaCodegen = df.select(
      VecFns.jaroWinkler(col("a"), col("b")).as("jw")).collect()
    assert(math.abs(viaCodegen(0).getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(math.abs(viaCodegen(1).getDouble(0) - 0.84) < 1e-12)
    assert(viaCodegen(2).isNullAt(0) && viaCodegen(3).isNullAt(0))
  }

  test("SQL surface resolves via GraftExtensions") {
    val got = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta')").collect().head.getDouble(0)
    assert(math.abs(got - 0.9611111111111111) < 1e-12)
    val err = intercept[Exception] {
      spark.sql("SELECT jaro_winkler('a')").collect()
    }
    assert(err.getMessage.contains("jaro_winkler"))
  }
}
