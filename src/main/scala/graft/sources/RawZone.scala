package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ScalarFns

/** S5 — raw-zone scans over the date-partitioned document folders
  * (`<base>/<yyyy-MM-dd>/<SYMBOL>.<kind>.html`,
  * `estimate-transform-load.rkt:162-165`;
  * `<base>/<yyyy-MM-dd>/<event-date>.json`,
  * `earnings-calendar-transform-load.rkt:53-56`).
  *
  * `binaryFile` + `pathGlobFilter` keeps the suffix predicate inside the
  * file listing (no post-read filter), and symbol/event-date derive from
  * `input_file_name` — the distributed form of the reference's driver-side
  * directory walk. At 100 TB the per-date folder layout IS the partition
  * pruning: a loader only ever lists one date directory.
  */
object RawZone {

  /** HTML documents of one kind for one folder date. Columns:
    * act_symbol, html, folder_date. */
  def scanDocuments(spark: SparkSession, baseDir: String, folderDate: String,
                    kind: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", s"*.$kind.html")
      .load(s"$baseDir/$folderDate")
      .select(
        ScalarFns.symbolFromFilename(input_file_name(), kind)
          .as("act_symbol"),
        col("content").cast("string").as("html"),
        lit(folderDate).cast("date").as("folder_date"))

  /** Calendar JSON payloads for one folder date. Columns:
    * event_date, raw, folder_date. */
  def scanCalendarPayloads(spark: SparkSession, baseDir: String,
                           folderDate: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.json")
      .load(s"$baseDir/$folderDate")
      .select(
        regexp_extract(input_file_name(), "([^/]+)\\.json$", 1)
          .cast("date").as("event_date"),
        col("content").cast("string").as("raw"),
        lit(folderDate).cast("date").as("folder_date"))
}
