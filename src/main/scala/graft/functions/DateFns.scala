package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date/interval function layer (SURVEY §2.7 D1–D9).
  *
  * Month arithmetic must match Postgres clamping: `2024-05-31 - 3 months` =
  * `2024-02-29` (clamped to month end). Spark's `add_months` clamps the same
  * way; these wrappers centralize the compound expressions so that parity is
  * tested in one place (DateFnsSpec).
  */
object DateFns {

  /** D1 — period_end_date from a Zacks "(MM/YYYY)" column header:
    * `to_date('01/'+MM/YYYY) + 1 month - 1 day` ≡ last day of that month
    * (`estimate-transform-load.rkt:226,253`). */
  def endOfMonthFromHeader(mmYYYY: Column): Column =
    // pattern M (1-2 digits): Zacks headers print single-digit months
    // ("3/2025"); Postgres to_date('DD/MM/YYYY') is lenient the same way.
    last_day(to_date(concat(lit("01/"), trim(mmYYYY)), "dd/M/yyyy"))

  /** D2 — prior-year date `date - interval '1 year'`
    * (`income-statement-transform-load.rkt:160`). */
  def priorYear(d: Column): Column = add_months(d, -12)

  /** D3a — prior-quarter date `date + 1 day - 3 months - 1 day`
    * (`income-statement-transform-load.rkt:163`). */
  def priorQuarter(d: Column): Column =
    date_sub(add_months(date_add(d, 1), -3), 1)

  /** D3b — projected next quarter end `date + 1 day + 3 months - 1 day`
    * (`earnings-calendar-transform-load.rkt:128,139,147`). */
  def nextQuarterEnd(d: Column): Column =
    date_sub(add_months(date_add(d, 1), 3), 1)

  /** D4 — statement header parse; income statement uses 2-digit years
    * (`income-statement-transform-load.rkt:100-102` "M/dd/yy";
    * `balance-sheet-transform-load.rkt:123-125` "M/dd/yyyy"). */
  def parseStatementDate(s: Column, twoDigitYear: Boolean): Column =
    to_date(trim(s), if (twoDigitYear) "M/dd/yy" else "M/dd/yyyy")

  /** D5 — staleness guard predicate: folder date within `days` of the most
    * recent statement date means the document is suspect and skipped
    * (`income-statement-transform-load.rkt:99-105`, P6). */
  def isStale(folderDate: Column, mostRecent: Column, days: Int = 15): Column =
    datediff(folderDate, mostRecent) <= days

  /** D6 — 7-day slide-forward retraction window start
    * (`earnings-calendar-transform-load.rkt:84`). */
  def slideBackWindowStart(d: Column): Column = date_sub(d, 7)

  /** D8 — posix timestamp at 6am UTC of the given date — the calendar
    * request key (`earnings-calendar-extract.rkt:25`). Computed from the
    * day count since epoch so the result is UTC regardless of the session
    * time zone (a timestamp cast would give local midnight and desync from
    * [[graft.sources.Fetch.calendarTargets]]' UTC keys). */
  def posixAt6am(d: Column): Column =
    datediff(d, lit("1970-01-01").cast("date")).cast("long") * lit(86400L) +
      lit(6L * 3600)

  /** D9 — 6-month export lookback (`dump-dolt-estimates.rkt:212`). */
  def sixMonthsBack(d: Column): Column = add_months(d, -6)

  /** Weekday test — Spark's dayofweek is 1=Sunday … 7=Saturday. */
  def isBusinessDay(d: Column): Column =
    dayofweek(d) =!= 1 && dayofweek(d) =!= 7

  /** Next business day: the following calendar day, rolled forward off a
    * weekend (Fri→Mon, Sat→Mon, Sun→Mon) — the settlement/announcement
    * date arithmetic the calendar pipelines need. Pure scan-side codegen,
    * no calendar table. (Holiday rolls would compose a broadcast holiday
    * dim on top; out of scope for the synthetic data.) */
  def nextBusinessDay(d: Column): Column = {
    val n = date_add(d, 1)
    when(dayofweek(n) === 7, date_add(n, 2))   // lands Saturday → Monday
      .when(dayofweek(n) === 1, date_add(n, 1)) // lands Sunday → Monday
      .otherwise(n)
  }
}
