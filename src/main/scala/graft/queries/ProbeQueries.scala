package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Compare-stack version probes (round-13, VERDICT r12 directive #2).
  *
  * Round 12 ended with 12 driver hash-fails that were all hash-green under
  * the local harness (duckdb 1.0.0 / pandas 2.2.2) on byte-identical data —
  * the divergence lives in the DRIVER's engine versions, which the builder
  * cannot see. Forensics this round localized the class exactly: all 12 (and
  * only those 12) oracles emitted a HUGEINT OUTPUT column (DuckDB's integer
  * `sum()` returns HUGEINT), and the HUGEINT→pandas dtype mapping changed
  * across DuckDB releases (float64 in 1.0 → `object` of Python ints later),
  * which flips the compare's canonical rendering ("123" vs "123.0") while
  * rows and schema still match.
  *
  * Each probe below is a tiny fixed VALUES fixture (no table reads, no SF
  * dependence) that isolates ONE construct dimension, so a future
  * CORRECTNESS report grades the compare stack itself:
  *
  *   - pb1 RED + pb2 GREEN  → HUGEINT dtype-mapping drift confirmed (the
  *     r12 class); any residual red query needs a BIGINT cast, nothing else.
  *   - pb3 exercises the literal/no-aggregate output path. (Until r13 its
  *     oracle emitted a bare HUGEINT literal to split "sum() result type
  *     changed" from "HUGEINT mapping changed"; the r13 driver run answered
  *     that — pb1 and pb3 flipped together, confirming the mapping class —
  *     so per VERDICT r13 #2 its oracle is BIGINT-cast from r14 on and pb1
  *     remains the single intentional canary.)
  *   - pb4/pb5 are expected-green controls for the two constructs the r11
  *     forensics wrongly suspected (DATE-typed output columns; global
  *     ORDER BY … ROWS window sums) — green here exonerates them.
  *   - pb6 fingerprints floor-vs-trunc division drift on negatives
  *     (DuckDB `//` floors; Spark reproduces with floor() through doubles).
  *   - pb7 fingerprints epoch()/timestamp-literal drift.
  *   - pb8 fingerprints double round(x, 6) drift at a sub-canon boundary.
  *
  * Every probe is hash-green under duckdb 1.0.0 / pandas 2.2.2 by
  * construction; pb1 is the only one EXPECTED to flip on a harness with the
  * newer HUGEINT mapping, and its red is the measurement, not a defect.
  * COVERAGE.md "Probe family" maps each probe to the class it tests.
  */
object ProbeQueries {

  val all: Seq[Q] = Seq(

    // PB1 — the fingerprint: un-cast integer sum ⇒ DuckDB HUGEINT output.
    Q("pb1_hugeint_sum_probe", (s, _) => {
      import s.implicits._
      Seq((1L, 10L), (1L, 20L), (2L, 30L)).toDF("k", "v")
        .groupBy("k").agg(sum("v").as("s")).orderBy("k")
    }, Some("""
      SELECT k, sum(v) AS s
      FROM (VALUES (1, 10), (1, 20), (2, 30)) t(k, v)
      GROUP BY k ORDER BY k""")),

    // PB2 — control: the identical sum CAST AS BIGINT (version-stable).
    Q("pb2_bigint_sum_probe", (s, _) => {
      import s.implicits._
      Seq((1L, 10L), (1L, 20L), (2L, 30L)).toDF("k", "v")
        .groupBy("k").agg(sum("v").as("s")).orderBy("k")
    }, Some("""
      SELECT k, CAST(sum(v) AS BIGINT) AS s
      FROM (VALUES (1, 10), (1, 20), (2, 30)) t(k, v)
      GROUP BY k ORDER BY k""")),

    // PB3 — literal-path control, BIGINT-cast (r14: formerly a bare
    // HUGEINT literal that duplicated pb1's red signal — the r13 driver
    // bisect showed pb1+pb3 flip TOGETHER on the newer-DuckDB HUGEINT
    // mapping, so pb3 carried no independent information as a second
    // permanent red. Per VERDICT r13 #2 the oracle now casts, keeping pb1
    // as the single documented HUGEINT canary; pb3 still exercises the
    // literal/no-aggregate output path).
    Q("pb3_hugeint_literal_probe", (s, _) => {
      import s.implicits._
      Seq((1L, 7L)).toDF("k", "h")
    }, Some("SELECT 1 AS k, CAST(7 AS BIGINT) AS h")),

    // PB4 — DATE-typed output control (r11's suspected-then-exonerated
    // dimension): date literals straight through both engines' pandas path.
    Q("pb4_date_output_probe", (s, _) => {
      import s.implicits._
      Seq(("2024-02-29", 1L), ("1992-01-01", 2L)).toDF("ds", "k")
        .select(col("ds").cast("date").as("d"), col("k")).orderBy("k")
    }, Some("""
      SELECT d, k FROM (VALUES (DATE '2024-02-29', 1), (DATE '1992-01-01', 2))
        t(d, k) ORDER BY k""")),

    // PB5 — global ORDER BY … ROWS cumulative-sum control, BIGINT-cast
    // (the r12 reds' window shape minus the HUGEINT hazard).
    Q("pb5_window_cumsum_probe", (s, _) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      Seq((1L, 5L), (2L, 7L), (3L, 11L)).toDF("k", "v")
        .withColumn("cum", sum("v").over(Window.orderBy("k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("k")
    }, Some("""
      SELECT k, v, CAST(sum(v) OVER (ORDER BY k
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
      FROM (VALUES (1, 5), (2, 7), (3, 11)) t(k, v) ORDER BY k""")),

    // PB6 — integer-division semantics on negatives: measured on duckdb
    // 1.0.0, integer `//` TRUNCATES toward zero ((-7) // 2 = -3), exactly
    // like Spark's `div` — so this pair is green locally, and a driver red
    // here means the driver's DuckDB flipped `//` to flooring semantics.
    Q("pb6_floor_div_neg_probe", (s, _) => {
      import s.implicits._
      Seq((-7L, 2L, 1L), (7L, 2L, 2L), (-9L, 4L, 3L)).toDF("a", "b", "k")
        .select(col("k"), expr("a div b").as("q"))
        .orderBy("k")
    }, Some("""
      SELECT k, CAST(a // b AS BIGINT) AS q
      FROM (VALUES (-7, 2, 1), (7, 2, 2), (-9, 4, 3)) t(a, b, k)
      ORDER BY k""")),

    // PB7 — epoch()/timestamp-literal drift: fixed wall-clock instants to
    // integer epoch seconds (session TZ pinned UTC on the Spark side).
    Q("pb7_epoch_floor_probe", (s, _) => {
      import s.implicits._
      Seq(("2024-03-01 06:00:00", 1L), ("1999-12-31 23:59:59", 2L))
        .toDF("tss", "k")
        .select(col("k"), to_timestamp(col("tss")).cast("long").as("sec"))
        .orderBy("k")
    }, Some("""
      SELECT k, CAST(floor(epoch(CAST(tss AS TIMESTAMP))) AS BIGINT) AS sec
      FROM (VALUES ('2024-03-01 06:00:00', 1), ('1999-12-31 23:59:59', 2))
        t(tss, k) ORDER BY k""")),

    // PB8 — double round(x, 6) just below/above the canon grain: exact
    // IEEE inputs, so any red is the ENGINE's rounding mode drifting.
    Q("pb8_round6_probe", (s, _) => {
      import s.implicits._
      Seq((1L, 1.0, 3.0), (2L, 2.0, 7.0)).toDF("k", "num", "den")
        .select(col("k"), round(col("num") / col("den"), 6).as("r"))
        .orderBy("k")
    }, Some("""
      SELECT k, round(num / den, 6) AS r
      FROM (VALUES (1, 1.0e0, 3.0e0), (2, 2.0e0, 7.0e0)) t(k, num, den)
      ORDER BY k""")),

    // PB9 — TIMESTAMP-typed output control: the compare canon renders
    // datetime64 via strftime but `object` values via str(), which differ
    // for timestamps ("2024-03-01" vs "2024-03-01 06:00:00") — a red here
    // fingerprints a timestamp→pandas mapping drift that would hit every
    // TIMESTAMP-emitting query (j7, cs7, at1, …).
    Q("pb9_timestamp_output_probe", (s, _) => {
      import s.implicits._
      Seq(("2024-03-01 06:00:00", 1L), ("1999-12-31 23:59:59", 2L))
        .toDF("tss", "k")
        .select(col("k"), to_timestamp(col("tss")).as("ts"))
        .orderBy("k")
    }, Some("""
      SELECT k, CAST(tss AS TIMESTAMP) AS ts
      FROM (VALUES ('2024-03-01 06:00:00', 1), ('1999-12-31 23:59:59', 2))
        t(tss, k) ORDER BY k"""))
  )
}
