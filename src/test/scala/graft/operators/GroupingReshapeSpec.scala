package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Invariants + plan gates for the grouping-set / reshaping family
  * (a9 rollup, a10 cube, a11 pivot, a12 unpivot). Correctness is graded by
  * the DuckDB oracle; here we pin the algebraic identities that must hold
  * at any scale and the single-shuffle plan shapes the 100-TB story
  * depends on. */
class GroupingReshapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("rollup subtotals are consistent across levels") {
    val out = run("a9_rollup").collect()
    val detail = out.filter(_.getLong(0) == 0L)
    val byStatus = out.filter(_.getLong(0) == 1L)
    val grand = out.filter(_.getLong(0) == 3L)
    assert(grand.length == 1)
    assert(grand.head.getLong(3) == detail.map(_.getLong(3)).sum)
    // each per-status subtotal equals the sum of its detail rows
    byStatus.foreach { r =>
      val st = r.getString(1)
      assert(r.getLong(3) ==
        detail.filter(_.getString(1) == st).map(_.getLong(3)).sum)
    }
    // rollup must NOT contain the priority-only level (that's cube's job)
    assert(!out.exists(_.getLong(0) == 2L))
  }

  test("cube emits all four grouping levels and a correct grand total") {
    val out = run("a10_cube").collect()
    val levels = out.map(_.getLong(0)).distinct.sorted
    assert(levels.toSeq == Seq(0L, 1L, 2L, 3L))
    val grand = out.filter(_.getLong(0) == 3L)
    val total = graft.queries.Tables.t(spark, dir, "orders").count()
    assert(grand.length == 1 && grand.head.getLong(3) == total)
  }

  test("pivot row sums reconcile with the status counters") {
    val piv = run("a11_pivot_status").collect()
    val counters = run("a7_status_counters").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(piv.map(_.getLong(1)).sum == counters.getOrElse("F", 0L))
    assert(piv.map(_.getLong(3)).sum == counters.getOrElse("O", 0L))
    assert(piv.map(_.getLong(5)).sum == counters.getOrElse("P", 0L))
  }

  test("unpivot doubles the row count and round-trips back to wide") {
    val part = graft.queries.Tables.t(spark, dir, "part")
    val long = run("a12_unpivot_metrics")
    assert(long.count() == 2 * part.count())
    // melt → pivot back → the original (key, size, retail) triples
    val wide = long.groupBy("p_partkey").pivot("metric", Seq("size", "retail"))
      .agg(first("v"))
    val orig = part.select(col("p_partkey"),
      col("p_size").cast("double").as("size"),
      col("p_retailprice").as("retail"))
    assert(wide.select("p_partkey", "size", "retail")
      .except(orig).isEmpty && orig.except(
        wide.select("p_partkey", "size", "retail")).isEmpty)
  }

  test("rollup/cube are one Expand + one aggregate exchange, not per-level rescans") {
    for (name <- Seq("a9_rollup", "a10_cube")) {
      val plan = run(name).queryExecution.executedPlan.toString
      assert(plan.contains("Expand"), s"$name: expected a single Expand pass")
      val scans = "FileScan".r.findAllIn(plan).size
      assert(scans == 1, s"$name: expected 1 scan, saw $scans")
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(shuffles <= 1, s"$name: expected <=1 hash exchange, saw $shuffles")
    }
  }

  test("unpivot is scan-side Expand — no shuffle before the output sort") {
    val plan = run("a12_unpivot_metrics").queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
    assert(!plan.contains("Exchange hashpartitioning"),
      "melt must not shuffle — it is per-row work")
  }
}
