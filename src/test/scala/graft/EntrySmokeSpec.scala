package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke check, locally: the flagship entry must return rows
  * on sf0.001 under a plain session (no graft extensions required). */
class EntrySmokeSpec extends AnyFunSuite {
  test("SparkEntry.entry returns rows") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }
}
