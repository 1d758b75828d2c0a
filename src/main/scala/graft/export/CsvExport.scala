package graft.export

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K2 — CSV snapshot exports (`dump-dolt-statements.rkt:46-96`,
  * `dump-dat.rkt:39-76`): every column rendered `coalesce(col::text, '')`,
  * header row, PK-ordered, one snapshot per date (the A3 distinct-date
  * loop, `dump-dolt-statements.rkt:81-93`).
  *
  * Two write paths:
  *  - [[writePerDate]] mirrors the reference's driver loop — one ordered
  *    single-file CSV per date (a Dolt-import-shaped artifact);
  *  - [[writePartitioned]] is the 100-TB path — one job, `partitionBy(date)`,
  *    no driver iteration; per-file ordering preserved via
  *    `sortWithinPartitions` after repartitioning by the date column.
  */
object CsvExport {

  /** P7 — `coalesce(cast(c AS string), '')` per column, preserving names. */
  def projectForCsv(df: DataFrame): DataFrame =
    df.select(df.columns.map(c =>
      coalesce(col(c).cast("string"), lit("")).as(c)).toSeq: _*)

  /** One PK-ordered, headered CSV file (reference writes CSV by hand with
    * no quoting, `dump-dolt-statements.rkt:51-52` — we emit standard quoted
    * CSV and document the divergence). */
  def writeSnapshot(df: DataFrame, pk: Seq[String], path: String): Unit =
    // sort on the TYPED columns before the all-string projection (string
    // order would put '10' before '2'); the projection and coalesce(1)
    // both preserve the global sort order
    projectForCsv(df.orderBy(pk.map(col): _*))
      .coalesce(1)
      .write.mode("overwrite").option("header", true)
      // bare empty for NULL, like the reference's coalesce(col::text, '')
      .option("emptyValue", "").csv(path)

  /** A3 + P2 — distinct dates drive one filtered export each; returns the
    * exported dates. The per-date filter prunes partitions when the source
    * is date-partitioned parquet. */
  def writePerDate(df: DataFrame, dateCol: String, pk: Seq[String],
                   baseDir: String): Seq[String] = {
    val dates = df.select(date_format(col(dateCol), "yyyy-MM-dd").as("d"))
      .distinct().orderBy("d").collect().map(_.getString(0)).toSeq
    dates.foreach { d =>
      writeSnapshot(df.filter(col(dateCol) === lit(d).cast("date")),
        pk, s"$baseDir/$d")
    }
    dates
  }

  /** Scale path: single job, hash-partitioned by date then sorted within
    * each partition — no driver-side date loop. */
  def writePartitioned(df: DataFrame, dateCol: String, pk: Seq[String],
                       baseDir: String): Unit =
    projectForCsv(df.repartition(col(dateCol))
      .sortWithinPartitions(pk.map(col): _*))
      .write.mode("overwrite").option("header", true)
      .option("emptyValue", "")
      .partitionBy(dateCol).csv(baseDir)
}
