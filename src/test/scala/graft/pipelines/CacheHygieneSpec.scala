package graft.pipelines

import java.sql.Date

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.Dedup

/** The VERDICT r4 hygiene gate: internal multi-consumer materializations
  * must not pin cache-manager storage for the life of the session — a daily
  * loop over date folders would otherwise accumulate pinned blocks until
  * eviction thrash. The pipelines now use lazy localCheckpoints (RDD blocks,
  * ContextCleaner-freed when the plans are garbage-collected), so running a
  * pipeline any number of times must leave the cache manager exactly as it
  * found it. */
class CacheHygieneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def earnFixture(): (DataFrame, DataFrame, DataFrame) = {
    val calSchema = StructType(Seq(
      StructField("act_symbol", StringType),
      StructField("date", DateType),
      StructField("when", StringType)))
    val existing = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("AAPL", Date.valueOf("2024-01-08"), "Before market open"),
        Row("MSFT", Date.valueOf("2024-02-20"), null))), calSchema)
    val payloads = spark.range(1, 4).select(
      concat(lit("window.app_data = {\"data\": [[\"<b>S"), col("id"),
        lit("</b>\", \"x\", \"y\", \"amc\", \"z\"]]}")).as("raw"),
      lit("2024-01-20").cast("date").as("event_date"))
    val stmtDates = spark.range(1, 4).select(
      concat(lit("S"), col("id")).as("act_symbol"),
      lit("2023-10-15").cast("date").as("date"))
    (existing, payloads, stmtDates)
  }

  test("calendar pipelines + near-dup leave the cache manager empty") {
    val cm = spark.sharedState.cacheManager
    cm.clearCache()
    assert(cm.isEmpty)
    val (existing, payloads, stmtDates) = earnFixture()
    val divSchema = StructType(Seq(
      StructField("act_symbol", StringType),
      StructField("ex_date", DateType),
      StructField("amount", DecimalType(38, 4)),
      StructField("payable_date", DateType)))
    val divExisting = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], divSchema)
    val divPayloads = spark.range(1, 4).select(
      concat(lit("window.app_data = {\"data\": [[\"D"), col("id"),
        lit("\", \"a\", \"b\", \"$1.25\", \"c\", \"2024-01-20\", \"d\", "),
        lit("\"2024-12-15\"]]}")).as("raw"))
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words over here now")).toDF("doc_id", "text")
    // run everything twice — the second pass must not observe (or add)
    // pinned entries from the first
    (1 to 2).foreach { _ =>
      CalendarPipeline.runEarnings(existing, payloads,
        Date.valueOf("2024-01-15"), stmtDates).count()
      CalendarPipeline.runDividends(divExisting, divPayloads,
        Date.valueOf("2024-01-15")).count()
      Dedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.5).count()
      EstimatesPipeline.tables(spark.range(0, 2).select(
        concat(lit("P"), col("id")).as("act_symbol"),
        lit("<html><body id=home></body></html>").as("html"),
        lit("2025-01-01").cast("date").as("folder_date")))
        .values.foreach(_.count())
      assert(cm.isEmpty,
        "no pipeline may leave pinned storage in the cache manager")
    }
  }
}
