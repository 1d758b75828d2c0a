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
  import org.apache.spark.sql.functions.{col, expr}
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** Read one TESTDATA table from the given scale-factor dir.
    *
    * `events.parquet`'s `ts` physical type has drifted across testdata
    * generations, so we branch on the *read* schema instead of hardcoding one
    * era:
    *   - parquet TIMESTAMP(NANOS): Spark refuses it by default
    *     (PARQUET_TYPE_ILLEGAL); the legacy conf reads it as a LongType of
    *     nanos since epoch, and we rebuild with *integer* division — nanos
    *     (~1.7e18) exceed a double's 53-bit mantissa, so `ts / 1000` through
    *     double arithmetic would corrupt the low digits.
    *   - plain `timestamp[us]` (no isAdjustedToUTC): reads as TIMESTAMP_NTZ;
    *     cast to TimestampType so downstream time windows / datediff keep the
    *     session-TZ semantics every query was written against (session TZ is
    *     UTC, so the wall-clock values are unchanged and DuckDB hash parity
    *     holds).
    *   - TIMESTAMP (instant): pass through.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
        case TimestampType    => raw
        case other =>
          throw new IllegalStateException(
            s"events.ts drifted to unsupported type $other — extend Tables.t")
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
}
