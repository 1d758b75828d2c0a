package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.AsOfJoin

/** The native AsOfJoinExec must agree row-for-row with the union+window
  * composition it replaces, and its plan must be the one it promises: the
  * custom exec node fed by one exchange + sort per side. */
class AsOfExecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic fixture: ~40 keys, interleaved probe/fact times incl.
  // exact ties, keys with no facts, keys with facts only after all probes
  private def fixture() = {
    val probes = (1 to 400).map { i =>
      (i.toLong % 40, i.toLong, (i * 7 % 100).toLong * 1000000L)
    }.toDF("k", "probe_id", "t")
    val facts = (1 to 300).map { i =>
      (i.toLong % 37, (i * 13 % 100).toLong * 1000000L, i * 1.5)
    }
      // drop duplicate (key, ts) fact rows — at equal fact times the
      // tie-winner is engine-internal in BOTH implementations
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      .toDF("k", "ft", "payload")
    (probes, facts)
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "probe_id", "t", "ft", "payload")
      .collect().map(_.toSeq).sortBy(_.toString)

  test("native exec matches the union+window composition (non-strict)") {
    val (probes, facts) = fixture()
    val comp = AsOfJoin.asOf(probes, facts, Seq("k"),
      probeTime = "t", factTime = "ft", factPayload = Seq("payload"))
    val native = AsOfJoinPlan.asOfNative(probes, facts, Seq("k"),
      probeTime = "t", factTime = "ft", factPayload = Seq("payload"))
    assert(canon(native).toSeq == canon(comp).toSeq)
    assert(native.count() > 0)
  }

  test("native exec matches the composition (strict)") {
    val (probes, facts) = fixture()
    val comp = AsOfJoin.asOf(probes, facts, Seq("k"),
      probeTime = "t", factTime = "ft", factPayload = Seq("payload"),
      strict = true)
    val native = AsOfJoinPlan.asOfNative(probes, facts, Seq("k"),
      probeTime = "t", factTime = "ft", factPayload = Seq("payload"),
      strict = true)
    assert(canon(native).toSeq == canon(comp).toSeq)
    // strict drops the exact-tie matches that non-strict keeps
    val nonStrict = AsOfJoinPlan.asOfNative(probes, facts, Seq("k"),
      probeTime = "t", factTime = "ft", factPayload = Seq("payload"))
    assert(native.count() <= nonStrict.count())
  }

  test("self-join (probes and facts from the same frame) resolves") {
    val ev = Seq((1L, 10L, "a", 1.0), (1L, 20L, "b", 2.0),
      (1L, 30L, "a", 3.0), (2L, 5L, "b", 4.0), (2L, 9L, "a", 5.0))
      .toDF("k", "t", "kind", "v")
    val probes = ev.filter($"kind" === "a").select("k", "t")
    val facts = ev.filter($"kind" === "b")
      .select($"k", $"t".as("ft"), $"v".as("payload"))
    val out = AsOfJoinPlan.asOfNative(probes, facts, Seq("k"),
      probeTime = "t", factTime = "ft", factPayload = Seq("payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._2)
    // k=1 t=10: no b before -> dropped (inner); t=30: b@20 matches;
    // k=2 t=9: b@5 matches
    assert(out.toSeq == Seq((2L, 9L, 5L, 4.0), (1L, 30L, 20L, 2.0)).sortBy(_._2))
  }

  test("timestamp columns and at-tie semantics: fact AT probe time matches") {
    val probes = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("k", "t")
    val facts = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 7.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 5.0))
      .toDF("k", "ft", "payload")
    val nonStrict = AsOfJoinPlan.asOfNative(probes, facts, Seq("k"),
      "t", "ft", Seq("payload")).collect()
    assert(nonStrict.length == 1 && nonStrict.head.getDouble(3) == 7.0)
    val strict = AsOfJoinPlan.asOfNative(probes, facts, Seq("k"),
      "t", "ft", Seq("payload"), strict = true).collect()
    assert(strict.length == 1 && strict.head.getDouble(3) == 5.0)
  }

  test("probes with no preceding fact are dropped; empty facts yield empty") {
    val probes = Seq((1L, 10L), (9L, 10L)).toDF("k", "t")
    val facts = Seq((1L, 20L, 1.0)).toDF("k", "ft", "payload")
    assert(AsOfJoinPlan.asOfNative(probes, facts, Seq("k"),
      "t", "ft", Seq("payload")).count() == 0)
    val none = facts.filter($"k" < 0)
    assert(AsOfJoinPlan.asOfNative(probes, none, Seq("k"),
      "t", "ft", Seq("payload")).count() == 0)
  }

  test("plan shape: AsOfJoinExec with one exchange+sort per side, no window") {
    val (probes, facts) = fixture()
    val native = AsOfJoinPlan.asOfNative(probes, facts, Seq("k"),
      probeTime = "t", factTime = "ft", factPayload = Seq("payload"))
    native.collect()
    val full = native.queryExecution.executedPlan.toString
    // AQE prints final + initial plan; grade the FINAL section only
    val plan = full.split("== Initial Plan ==").head
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), s"native as-of must not plan a window:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges:\n$plan")
  }
}
