package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke check, locally: the flagship entry must return rows
  * on sf0.001. (The shared test session carries GraftExtensions; `entry`
  * itself uses only Spark built-ins, so the driver's extension-less session
  * runs the same plan — keep it that way.) */
class EntrySmokeSpec extends AnyFunSuite {
  test("SparkEntry.entry returns rows") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }
}
