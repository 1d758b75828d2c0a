package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** NormalizeNfc must implement Unicode canonical composition exactly
  * (agreeing with java.text.Normalizer as ground truth) in BOTH
  * evaluation modes, be idempotent, an identity on ASCII, null-safe, and
  * reachable from SQL via the session extensions. All non-ASCII test
  * data is spelled in \u escapes — raw literals could be silently
  * re-normalized by editors, which is the bug class under test. */
class TextExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Decomposed = "e\u0301"   // e + combining acute
  private val Composed = "\u00e9"      // é

  private def nfcOf(s: String): String =
    Seq(Tuple1(s)).toDF("s").select(VecFns.nfc(col("s"))).head().getString(0)

  test("combining sequences compose (codegen path)") {
    assert(nfcOf(Decomposed) == Composed)
    assert(nfcOf(s"caf$Decomposed au lait") == s"caf$Composed au lait")
    assert(nfcOf("A\u030a") == "\u00c5") // A + combining ring
    // already-composed and plain ASCII pass through unchanged
    assert(nfcOf(Composed) == Composed)
    assert(nfcOf("plain ascii") == "plain ascii")
  }

  test("agrees with java.text.Normalizer on mixed strings") {
    val cases = Seq("", "x",
      Decomposed * 3,
      "d\u0307\u0323",   // canonical reordering + partial compose
      s"mixed $Composed and $Decomposed and ö",
      "한가") // Hangul jamo -> precomposed syllables
    cases.foreach { s =>
      val want = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      assert(nfcOf(s) == want, s"input ${s.codePoints().toArray.toSeq}")
    }
  }

  test("interpreted eval matches codegen") {
    val in = s"$Decomposed plus $Composed"
    val got = NormalizeNfc(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(in)))
      .eval(null).toString
    assert(got == nfcOf(in))
  }

  test("idempotent and null-safe") {
    val once = nfcOf(Decomposed)
    assert(nfcOf(once) == once)
    val r = Seq(Tuple1(Option.empty[String])).toDF("s")
      .select(VecFns.nfc(col("s"))).head()
    assert(r.isNullAt(0))
  }

  test("SQL surface: nfc_normalize resolves via the extensions") {
    val got = spark.sql(s"SELECT nfc_normalize('$Decomposed') AS s")
      .head().getString(0)
    assert(got == Composed)
  }

  test("rejects non-string input at analysis time") {
    val err = intercept[Exception] {
      Seq(Tuple1(1)).toDF("i").select(VecFns.nfc(col("i"))).head()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }
}
