package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** As-of join semantics: latest at-or-before (default), strict mode,
  * inner-vs-left on unmatched probes, and payload atomicity (all payload
  * columns come from the SAME fact row even when a newer fact carries
  * NULLs). */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private val probeSchema = StructType(Seq(
    StructField("k", StringType), StructField("pid", LongType),
    StructField("pt", TimestampType)))
  private val factSchema = StructType(Seq(
    StructField("k", StringType), StructField("ft", TimestampType),
    StructField("a", DoubleType), StructField("b", StringType)))

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

  private val probes = df(probeSchema,
    Row("x", 1L, ts("2024-01-01 10:00:00")),
    Row("x", 2L, ts("2024-01-01 12:00:00")),
    Row("y", 3L, ts("2024-01-01 09:00:00")))

  private val facts = df(factSchema,
    Row("x", ts("2024-01-01 09:30:00"), 1.0, "f1"),
    Row("x", ts("2024-01-01 12:00:00"), null, "f2"), // ties probe 2; null a
    Row("y", ts("2024-01-01 11:00:00"), 3.0, "f3")) // after y's probe

  test("latest at-or-before per key; equal timestamps match (>= semantics)") {
    val out = AsOfJoin.asOf(probes, facts, Seq("k"), "pt", "ft",
      Seq("a", "b")).orderBy("pid").collect()
    // probe 1 -> f1; probe 2 -> f2 (tie included); probe 3 -> no prior fact
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 2L))
    assert(out.map(_.getString(5)).toSeq === Seq("f1", "f2"))
  }

  test("payload columns all come from the matched row, not a NULL-skipping mix") {
    val out = AsOfJoin.asOf(probes, facts, Seq("k"), "pt", "ft",
      Seq("a", "b")).filter(col("pid") === 2L).head()
    // f2 carries a=NULL — a must be NULL here, not f1's 1.0
    assert(out.isNullAt(4) && out.getString(5) === "f2")
  }

  test("strict excludes the equal-timestamp fact") {
    val out = AsOfJoin.asOf(probes, facts, Seq("k"), "pt", "ft",
      Seq("a", "b"), strict = true).orderBy("pid").collect()
    assert(out.map(r => (r.getLong(1), r.getString(5))).toSeq ===
      Seq((1L, "f1"), (2L, "f1")))
  }

  test("inner drops unmatched probes; left keeps them with NULL payload") {
    val left = AsOfJoin.asOf(probes, facts, Seq("k"), "pt", "ft",
      Seq("a", "b"), inner = false).orderBy("pid").collect()
    assert(left.length === 3)
    val unmatched = left.find(_.getLong(1) == 3L).get
    assert(unmatched.isNullAt(3) && unmatched.isNullAt(4) &&
      unmatched.isNullAt(5))
  }

  test("plan shape: one shuffle on the key, no range join") {
    val out = AsOfJoin.asOf(probes, facts, Seq("k"), "pt", "ft", Seq("a"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("equal-(key, time) facts carry a deterministic payload across " +
    "partitionings: the greatest fact struct wins (r12 ADVICE)") {
    val t = ts("2024-01-01 08:00:00")
    val tied = df(factSchema,
      Row("x", t, 1.0, "pA"), Row("x", t, 2.0, "pB"),
      Row("x", t, 2.0, "pA")) // struct order: (ft, a, b) — pB is greatest
    val oneProbe = df(probeSchema, Row("x", 1L, ts("2024-01-01 10:00:00")))
    val got = (1 to 8).map { n =>
      AsOfJoin.asOf(oneProbe, tied.repartition(n), Seq("k"), "pt", "ft",
        Seq("a", "b")).head()
    }
    assert(got.forall(r => r.getDouble(4) == 2.0 && r.getString(5) == "pB"),
      s"nondeterministic tie payload: ${got.map(r => (r.getDouble(4), r.getString(5))).distinct}")
    // asOfNearest: same tie, same determinism through the numeric-time path
    val p2 = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("x", 1L, 100L))), StructType(Seq(StructField("k", StringType),
      StructField("pid", LongType), StructField("pt", LongType))))
    val f2 = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("x", 90L, 1.0), Row("x", 90L, 2.0))),
      StructType(Seq(StructField("k", StringType),
        StructField("ft", LongType), StructField("a", DoubleType))))
    val near = (1 to 8).map { n =>
      AsOfJoin.asOfNearest(p2, f2.repartition(n), Seq("k"), "pt", "ft",
        Seq("a")).head().getDouble(4)
    }
    assert(near.distinct == Seq(2.0), s"asOfNearest tie drifted: $near")
  }
}
