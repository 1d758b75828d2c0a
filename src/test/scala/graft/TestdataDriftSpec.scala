package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, max, min, unix_micros, year}
import org.apache.spark.sql.types.TimestampType
import graft.queries.Tables

/** Canary for driver-side testdata regeneration. The physical type of
  * `events.ts` has already drifted once (TIMESTAMP(NANOS) → plain
  * `timestamp[us]`, r10), which killed 8 registry entries with opaque
  * analysis errors. This spec pins the *normalized* contract — whatever the
  * parquet era, `Tables.t` must surface a session-TZ TimestampType with
  * plausible wall-clock values — so the next drift fails one named assertion
  * instead.
  */
class TestdataDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"$sf: events.ts normalizes to TimestampType with sane year bounds") {
      val ev = Tables.t(spark, s"/root/testdata/$sf", "events")
      assert(ev.schema("ts").dataType == TimestampType,
        s"Tables.t must normalize events.ts to TimestampType, got ${ev.schema("ts").dataType}")
      val Array(row) = ev.agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi")).collect()
      val (lo, hi) = (row.getInt(0), row.getInt(1))
      assert(lo >= 1990 && hi <= 2100,
        s"events.ts year range [$lo, $hi] outside sane bounds — unit drift (s vs ms vs us vs ns)?")
    }
  }

  private val tableContract: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey", "r_name"),
    "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value",
      "props"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  test("every table still carries the columns the registry depends on") {
    // Names only — physical-type drift within a column is tolerated where
    // Tables.t normalizes it (the events.ts lesson); a DROPPED or RENAMED
    // column is what silently breaks dozens of queries at analysis time,
    // so that is what this pins, per sf dir, with one named assertion.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); (t, cols) <- tableContract) {
      val got = Tables.t(spark, s"/root/testdata/$sf", t).schema.fieldNames
      val missing = cols.filterNot(got.contains)
      assert(missing.isEmpty,
        s"$sf/$t dropped or renamed: ${missing.mkString(", ")} (has: ${got.mkString(", ")})")
    }
  }

  test("the nanos-era long path still rebuilds correct micros") {
    // Red-first guard for the legacy branch: synthesize a nanos-typed long
    // column and run it through the same rebuild expression Tables.t uses.
    import spark.implicits._
    val nanos = 1700000000123456789L // 2023-11-14T22:13:20.123456789Z
    val df = Seq(nanos).toDF("ts")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    assert(df.schema("ts").dataType == TimestampType)
    val micros = df.select(unix_micros($"ts")).head().getLong(0)
    assert(micros == nanos / 1000L,
      "integer div rebuild must preserve sub-second digits (double arith would not)")
  }
}
