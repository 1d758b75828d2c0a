package graft.functions

import java.sql.Date

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** D1–D9 vs Postgres interval semantics — month arithmetic must clamp to
  * month end exactly like `date - interval '3 months'` does
  * (SURVEY §7.4 hard-part 3). */
class DateFnsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def evalDate(c: Column): Date =
    spark.range(1).select(c.as("v")).head().getDate(0)

  private def evalLong(c: Column): Long =
    spark.range(1).select(c.as("v")).head().getLong(0)

  private def d(s: String): Column = lit(s).cast("date")

  test("D1 end-of-month from (MM/YYYY) header, 1- and 2-digit months") {
    assert(evalDate(DateFns.endOfMonthFromHeader(lit("3/2025"))) ===
      Date.valueOf("2025-03-31"))
    assert(evalDate(DateFns.endOfMonthFromHeader(lit("02/2024"))) ===
      Date.valueOf("2024-02-29")) // leap year
    assert(evalDate(DateFns.endOfMonthFromHeader(lit(" 12/2023 "))) ===
      Date.valueOf("2023-12-31"))
  }

  test("D2 prior-year clamps Feb 29 like Postgres") {
    // postgres: date '2024-02-29' - interval '1 year' = 2023-02-28
    assert(evalDate(DateFns.priorYear(d("2024-02-29"))) ===
      Date.valueOf("2023-02-28"))
    assert(evalDate(DateFns.priorYear(d("2024-07-15"))) ===
      Date.valueOf("2023-07-15"))
  }

  test("D3a prior-quarter: date + 1 day - 3 months - 1 day") {
    // postgres: ('2024-05-31' + 1 day) - 3 months - 1 day = 2024-02-29
    assert(evalDate(DateFns.priorQuarter(d("2024-05-31"))) ===
      Date.valueOf("2024-02-29"))
    // quarter-end chain: Dec 31 -> Sep 30 (clamped through Oct 1 - 1)
    assert(evalDate(DateFns.priorQuarter(d("2024-12-31"))) ===
      Date.valueOf("2024-09-30"))
  }

  test("D3b next-quarter-end projects statement windows") {
    assert(evalDate(DateFns.nextQuarterEnd(d("2024-03-31"))) ===
      Date.valueOf("2024-06-30"))
    assert(evalDate(DateFns.nextQuarterEnd(d("2024-11-30"))) ===
      Date.valueOf("2025-02-28"))
  }

  test("D4 statement-header parse, both year widths") {
    assert(evalDate(DateFns.parseStatementDate(lit("3/15/2024"),
      twoDigitYear = false)) === Date.valueOf("2024-03-15"))
    assert(evalDate(DateFns.parseStatementDate(lit("9/30/15"),
      twoDigitYear = true)) === Date.valueOf("2015-09-30"))
  }

  test("D5 staleness guard is a strict 15-day boundary") {
    def stale(folder: String, recent: String): Boolean =
      spark.range(1).select(
        DateFns.isStale(d(folder), d(recent)).as("v")).head().getBoolean(0)
    assert(stale("2024-01-16", "2024-01-01"))   // 15 days -> stale
    assert(!stale("2024-01-17", "2024-01-01"))  // 16 days -> fresh
  }

  test("D6/D9 lookbacks") {
    assert(evalDate(DateFns.slideBackWindowStart(d("2024-03-08"))) ===
      Date.valueOf("2024-03-01"))
    assert(evalDate(DateFns.sixMonthsBack(d("2024-08-31"))) ===
      Date.valueOf("2024-02-29"))
  }

  test("D8 posix at 6am UTC") {
    assert(evalLong(DateFns.posixAt6am(d("1970-01-02"))) === 86400L + 21600L)
  }

  test("D10 next business day rolls weekend landings to Monday") {
    // 2024-01-04 Thu → Fri; Fri → Mon (skips Sat); Sat → Mon; Sun → Mon
    assert(evalDate(DateFns.nextBusinessDay(d("2024-01-04"))) ===
      Date.valueOf("2024-01-05"))
    assert(evalDate(DateFns.nextBusinessDay(d("2024-01-05"))) ===
      Date.valueOf("2024-01-08"))
    assert(evalDate(DateFns.nextBusinessDay(d("2024-01-06"))) ===
      Date.valueOf("2024-01-08"))
    assert(evalDate(DateFns.nextBusinessDay(d("2024-01-07"))) ===
      Date.valueOf("2024-01-08"))
    def bd(s: String): Boolean = spark.range(1).select(
      DateFns.isBusinessDay(d(s)).as("v")).head().getBoolean(0)
    assert(bd("2024-01-05") && !bd("2024-01-06") && !bd("2024-01-07"))
  }
}
