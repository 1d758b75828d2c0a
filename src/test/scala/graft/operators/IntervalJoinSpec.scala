package graft.operators

import java.sql.Date
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Interval-join laws: bucketed result == brute-force BETWEEN scan on
  * seeded random intervals, boundary days are inclusive, and the result is
  * invariant to the bucket width (the one tuning knob must never change
  * semantics). */
class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val day0 = 19000L // days since epoch, ~2022
  private def d(off: Long): Date = Date.valueOf(
    java.time.LocalDate.ofEpochDay(day0 + off))

  private val rnd = new scala.util.Random(7)
  private val intervals = (1 to 40).map { i =>
    val s = rnd.nextInt(200).toLong
    (i.toLong, d(s), d(s + rnd.nextInt(40).toLong))
  }.toDF("iv_id", "s", "e")
  private val probes = (1 to 300).map { p =>
    (p.toLong, d(rnd.nextInt(260).toLong))
  }.toDF("p_id", "pd")

  private def brute: Set[(Long, Long)] = {
    val iv = intervals.collect().map(r =>
      (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getDate(2).toLocalDate.toEpochDay))
    val pr = probes.collect().map(r =>
      (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
    (for {
      (ivId, s, e) <- iv; (pId, p) <- pr if p >= s && p <= e
    } yield (ivId, pId)).toSet
  }

  test("matches the brute-force BETWEEN scan for any bucket width") {
    val want = brute
    for (bucket <- Seq(1, 7, 30, 365)) {
      val got = IntervalJoin.bucketedIntervalJoin(
        intervals, "s", "e", probes, "pd", bucket)
        .select("iv_id", "p_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"bucketDays=$bucket")
      // no duplicate pairs from the bucket expansion
      val n = IntervalJoin.bucketedIntervalJoin(
        intervals, "s", "e", probes, "pd", bucket).count()
      assert(n == want.size, s"duplicate pairs at bucketDays=$bucket")
    }
  }

  test("boundary days are inclusive on both ends") {
    val iv = Seq((1L, d(10), d(12))).toDF("iv_id", "s", "e")
    val pr = Seq((1L, d(9)), (2L, d(10)), (3L, d(12)), (4L, d(13)))
      .toDF("p_id", "pd")
    val got = IntervalJoin.bucketedIntervalJoin(iv, "s", "e", pr, "pd", 7)
      .select("p_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L))
  }

  private val rightIvs = (1 to 40).map { i =>
    val s = rnd.nextInt(200).toLong
    (i.toLong + 100, d(s), d(s + rnd.nextInt(40).toLong))
  }.toDF("b_id", "bs", "be")

  private def bruteOverlap: Set[(Long, Long)] = {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getDate(2).toLocalDate.toEpochDay))
    (for {
      (a, as_, ae) <- rows(intervals.toDF("a_id", "s", "e"))
      (b, bs, be) <- rows(rightIvs)
      if as_ <= be && bs <= ae
    } yield (a, b)).toSet
  }

  test("overlap join matches brute force and emits each pair EXACTLY once " +
    "for any bucket width (the later-start-bucket dedup trick)") {
    val want = bruteOverlap
    for (bucket <- Seq(1, 7, 30, 365)) {
      val out = IntervalJoin.bucketedOverlapJoin(
        intervals.toDF("a_id", "s", "e"), "s", "e",
        rightIvs, "bs", "be", bucket)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(out.toSet == want, s"bucketDays=$bucket")
      // a long mutual overlap spans MANY buckets — still one output row
      assert(out.length == want.size, s"duplicate pairs at bucketDays=$bucket")
    }
  }

  test("inverted intervals (end < start) are dropped, not exploded — " +
    "Spark sequence(a, b) descends when a > b, so a malformed interval " +
    "would otherwise emit bucket rows and could pass the raw overlap " +
    "residual (r12 ADVICE)") {
    // a_id 2 is inverted but its RAW endpoints satisfy the overlap
    // predicate against b_id 1 (30 <= 40 && 15 <= 25) — kept, it would
    // emit a bogus pair; b_id 2 is inverted on the right side
    val a = Seq((1L, d(10), d(20)), (2L, d(30), d(25))).toDF("a_id", "s", "e")
    val b = Seq((1L, d(15), d(40)), (2L, d(28), d(26))).toDF("b_id", "bs", "be")
    val got = IntervalJoin.bucketedOverlapJoin(a, "s", "e", b, "bs", "be", 7)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L)))
  }

  test("overlap boundaries: touching endpoints overlap, disjoint do not") {
    val a = Seq((1L, d(10), d(20))).toDF("a_id", "s", "e")
    val b = Seq((1L, d(20), d(30)), (2L, d(21), d(30)), (3L, d(1), d(10)),
      (4L, d(1), d(9))).toDF("b_id", "bs", "be")
    val got = IntervalJoin.bucketedOverlapJoin(a, "s", "e", b, "bs", "be", 7)
      .select("b_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }
}
