package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** K3/K6 — the storage model replacing Dolt-versioned tables and Postgres
  * maintenance:
  *
  *  - tables persist as parquet partitioned by their date column (K3's
  *    "version per date" becomes a partition per date — time travel is a
  *    partition filter, and loaders rewrite only touched partitions);
  *  - K6's `vacuum full` / `reindex` becomes [[compact]]: rewrite a table's
  *    files at a target partition count (small-file compaction after many
  *    incremental appends). Postgres-side index maintenance has no Spark
  *    analogue — data files ARE the access path.
  */
object SnapshotStore {

  /** Write a table snapshot partitioned by `partitionCol` — the layout that
    * gives every per-date reader partition pruning for free. */
  def write(df: DataFrame, path: String,
            partitionCol: String = "date"): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** K6 — compaction rewrite: coalesce the accumulated small files of each
    * date partition. `filesPerPartition` bounds output files per date. */
  def compact(spark: SparkSession, path: String, partitionCol: String = "date",
              filesPerPartition: Int = 1): Unit = {
    val df = spark.read.parquet(path)
    val tmp = path.stripSuffix("/") + ".compact.tmp"
    df.repartition(filesPerPartition, col(partitionCol))
      .write.mode("overwrite").partitionBy(partitionCol).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
