package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints the AQE-final physical plan of one or more
  * registered queries (all of them when no names given). Usage:
  *
  *   sbt "runMain graft.Explain <sfDir> [queryName ...]"
  *
  * Executes each query first (collect-free count) so the printed plan is the
  * adaptively re-optimized one actually run, not the initial estimate. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // path-based fixtures (s5/k2b/st3/k3b) materialize before any plan runs
    graft.queries.Fixtures.ensureAll(spark, sfDir)
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"== $name: not registered ==")
        case Some(fn) =>
          val df = fn(spark, sfDir)
          df.count()
          println(s"\n==== $name ====")
          println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
