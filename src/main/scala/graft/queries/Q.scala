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
  /** Read one TESTDATA table from the given scale-factor dir.
    *
    * `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * refuses by default (PARQUET_TYPE_ILLEGAL). We read it as a long via the
    * legacy conf and rebuild the timestamp with *integer* division — nanos
    * since epoch (~1.7e18) exceed a double's 53-bit mantissa, so `ts / 1000`
    * through double arithmetic would corrupt the low digits.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions
          .expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
