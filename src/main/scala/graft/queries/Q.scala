package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-gradable query: a Spark DataFrame program over the TESTDATA
  * tables plus (when SQL-expressible) a semantically identical DuckDB oracle
  * over the same parquet files. Column names/aliases MUST match between the
  * two — the driver sorts columns by name before hashing values.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  /** Read one TESTDATA table from the given scale-factor dir. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
