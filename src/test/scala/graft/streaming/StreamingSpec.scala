package graft.streaming

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.LoadOps

/** SURVEY §2.8 stretch: daily folder arrival as a Structured Streaming file
  * source, with `foreachBatch` reusing the SAME batch load operators (K1
  * dedup-append + K4 future-overwrite) — the streaming form is the batch
  * form, which is the point. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("act_symbol", StringType),
    StructField("date", DateType),
    StructField("when", StringType)))

  test("file-source stream + foreachBatch drives K1/K4 incrementally") {
    val inDir = Files.createTempDirectory("graft_stream_in").toFile
    // state: the stored calendar snapshot, rewritten per micro-batch
    var store: DataFrame = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("AAPL", Date.valueOf("2024-01-10"), "Before market open"),
        Row("MSFT", Date.valueOf("2024-03-01"), null))), schema)

    val stream = spark.readStream.schema(schema).json(inDir.getAbsolutePath)
    val query = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // K4 semantics per arriving folder: retract the future slice at the
        // batch's min folder date, then K1 dedup-append the fresh rows
        val folderDate = Date.valueOf("2024-02-01")
        val afterK4 = LoadOps.overwriteFutureSlice(
          store, batch.select(store.columns.map(col).toSeq: _*),
          "date", folderDate)
        store = LoadOps.dedupAppend(
          afterK4.limit(0), afterK4, Seq("act_symbol", "date"))
          .localCheckpoint(eager = true)
        ()
      }
      .start()

    // first arrival: a future MSFT correction + a duplicate AAPL row
    Files.writeString(new java.io.File(inDir, "b1.json").toPath,
      """{"act_symbol":"MSFT","date":"2024-02-20","when":"After market close"}
        |{"act_symbol":"AAPL","date":"2024-01-10","when":"Before market open"}
        |""".stripMargin)
    query.processAllAvailable()
    // K4 dropped the stored 2024-03-01 future row; K1 collapsed the two
    // identical AAPL rows -> {AAPL 01-10, MSFT 02-20}
    assert(store.count() === 2)
    assert(store.filter(col("date") === lit("2024-03-01")).count() === 0)

    // second arrival: same file content again -> idempotent by PK dedup
    Files.writeString(new java.io.File(inDir, "b2.json").toPath,
      """{"act_symbol":"MSFT","date":"2024-02-20","when":"After market close"}
        |""".stripMargin)
    query.processAllAvailable()
    query.stop()
    assert(store.count() === 2)
    assert(store.filter(col("act_symbol") === "MSFT")
      .head().getDate(1) === Date.valueOf("2024-02-20"))
  }
}
