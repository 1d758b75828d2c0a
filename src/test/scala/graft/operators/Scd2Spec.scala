package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Invariants for the type-2 dimension build (scd1), the winsorized
  * aggregate (ol1), and the quality deciles (tx17) — the properties that
  * must hold regardless of data scale, complementing the DuckDB hash
  * grade. */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("scd2 intervals: one open interval per customer, no same-status adjacency") {
    val rows = run("scd1_type2_history").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2), r.getDate(3),
        r.getBoolean(4)))
    val byCust = rows.groupBy(_._1)
    byCust.foreach { case (cust, rs) =>
      val sorted = rs.sortBy(r => (r._3.toString, r._2))
      // exactly one initial row and exactly one sentinel-open interval
      assert(sorted.count(_._5) == 1, s"cust $cust: initial rows != 1")
      assert(sorted.count(_._4.toString == "9999-12-31") == 1,
        s"cust $cust: open intervals != 1")
      // consecutive intervals never carry the same status (they'd have
      // been collapsed) and each valid_to chains to the next valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._2 != b._2, s"cust $cust: uncollapsed adjacent status")
          assert(a._4 == b._3, s"cust $cust: interval chain broken")
        case _ =>
      }
    }
  }

  test("winsorized sum is bounded by the raw sum and clamp bounds hold") {
    import org.apache.spark.sql.functions._
    val orders = graft.queries.Tables.t(spark, dir, "orders")
    val raw = orders.agg(sum("o_totalprice")).head.getDouble(0)
    val out = run("ol1_winsorize").collect()
    val wmin = out.map(_.getDouble(3)).min
    val wmax = out.map(_.getDouble(4)).max
    assert(wmin >= orders.agg(min("o_totalprice")).head.getDouble(0))
    assert(wmax <= orders.agg(max("o_totalprice")).head.getDouble(0))
    // clamping can only pull the heavy tail in, never push the sum past
    // raw + (what the low clamp adds): cheap sanity, not a tight bound
    assert(out.map(_.getDouble(2)).sum <= raw * 1.01)
  }

  test("deciles are near-equal population and monotone in score") {
    val out = run("tx17_quality_deciles").collect()
    assert(out.length == 10)
    val ns = out.map(_.getLong(1))
    assert(ns.max - ns.min <= 1, "ntile must balance within 1")
    // decile k's max never exceeds decile k+1's min (ties may equal)
    out.sortBy(_.getInt(0)).sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(3) <= b.getDouble(2) + 1e-9)
      case _ =>
    }
  }
}
