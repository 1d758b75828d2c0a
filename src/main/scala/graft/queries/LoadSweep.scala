package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{DateFns => D}
import graft.model.Schemas
import graft.pipelines.{CalendarPipeline, StatementsPipeline}

/** 1×-vs-10× scale sweep for the relational/LOAD layer — the statement
  * pipelines (parse → explode → J1 guard → K1 append) and the calendar
  * daily run (K4 → U8 → K5 → K1 → J2), i.e. the joins a 100× backfill
  * stresses. Counterpart of [[graft.ScaleSweep]]'s LLM-layer sweep
  * (`runMain graft.ScaleSweep <sfDir> load`); results recorded in SCALE.md.
  *
  * The 10× corpus shifts the key space (`pk + i·10⁷`), so every copy is a
  * DISTINCT symbol with DISTINCT fixture documents (cell text derives from
  * the key) — genuinely 10× more data, no key collisions. A wall ratio
  * ≫ 10× would flag a data-dependent super-linearity (e.g. a store-vs-batch
  * join that stopped scaling with the batch).
  */
object LoadSweep {

  private val buildIncomeYYUdf =
    udf((pk: Long) => ExtractQueries.buildIncomeDoc(pk, yy2 = true))
  private val buildBalanceUdf = udf(ExtractQueries.buildBalanceHtml _)
  private val buildCf2024Udf = udf(ExtractQueries.buildCashFlow2024Html _)
  private val buildCfLegacyNumUdf =
    udf(ExtractQueries.buildCashFlowLegacyNumHtml _)

  private def emptyTable(s: SparkSession, name: String): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[Row], Schemas.tables(name))

  private def stmtDocs(part: DataFrame,
                       build: org.apache.spark.sql.expressions
                         .UserDefinedFunction): DataFrame =
    part.select(
      concat(lit("P"), col("p_partkey")).as("act_symbol"),
      build(col("p_partkey")).as("html"),
      lit("2025-06-01").cast("date").as("folder_date"))

  /** The registered pipe5 composition over an arbitrary customer-key base
    * (see PipelineQueries for the fixture semantics). */
  private def calendarRun(s: SparkSession, cust: DataFrame): DataFrame = {
    val ck = col("c_custkey")
    val when1 = when(ck % 3 === 0, lit("amc"))
      .when(ck % 3 === 1, lit("bmo")).otherwise(lit("--"))
    val when2 = when((ck + 1) % 3 === 0, lit("amc"))
      .when((ck + 1) % 3 === 1, lit("bmo")).otherwise(lit("--"))
    val raw = concat(
      lit("window.app_data = {\"data\": [[\"<b>S"), ck,
      lit("</b>\", \"x\", \"y\", \""), when1,
      lit("\", \"z\"], [\"NFLX Quick QuoteS"), ck,
      lit("B\", \"x\", \"y\", \""), when2, lit("\", \"z\"]]}"))
    val eventDate = date_add(lit("2024-01-01").cast("date"),
      (ck % 28).cast("int"))
    val payloads = cust.select(ck, raw.as("raw"), eventDate.as("event_date"))
    val symA = concat(lit("S"), ck)
    val existing = cust.select(symA.as("act_symbol"),
        date_sub(eventDate, 3).as("date"),
        lit("Before market open").as("when"))
      .unionByName(cust.select(symA.as("act_symbol"),
        date_add(lit("2024-02-10").cast("date"), (ck % 7).cast("int"))
          .as("date"),
        lit("After market close").as("when")))
      .unionByName(cust.select(symA.as("act_symbol"),
        date_add(lit("2023-11-05").cast("date"), (ck % 10).cast("int"))
          .as("date"),
        lit(null).cast("string").as("when")))
    val stmtDates = cust.select(symA.as("act_symbol"))
      .unionByName(cust.select(concat(lit("S"), ck, lit("B"))
        .as("act_symbol")))
      .select(col("act_symbol"), lit("2023-10-15").cast("date").as("date"))
    CalendarPipeline.runEarnings(existing, payloads,
      java.sql.Date.valueOf("2024-01-15"), stmtDates)
  }

  def run(spark: SparkSession, sfDir: String): Unit = {
    val par = spark.sparkContext.defaultParallelism

    def x10(base: DataFrame, key: String): DataFrame =
      (0 until 10).map(i =>
        base.select((col(key) + lit(i * 10_000_000L)).as(key)))
        .reduce(_ unionByName _)
        .repartition(par).localCheckpoint(eager = true)

    val part1 = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey")).repartition(par).localCheckpoint(eager = true)
    val part10 = x10(part1, "p_partkey")
    val cust1 = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey")).repartition(par).localCheckpoint(eager = true)
    val cust10 = x10(cust1, "c_custkey")

    val ops: Seq[(String, DataFrame => DataFrame, DataFrame, DataFrame)] = Seq(
      ("pipe2_income_load", (d: DataFrame) =>
        StatementsPipeline.loadIncomeStatement(
          emptyTable(spark, "income_statement"),
          stmtDocs(d, buildIncomeYYUdf)),
        part1, part10),
      ("pipe3b_assets_load", (d: DataFrame) => {
        val fresh = StatementsPipeline
          .balanceSheet(stmtDocs(d, buildBalanceUdf), pin = false)(
            "balance_sheet_assets")
        StatementsPipeline.loadStatement(
          emptyTable(spark, "balance_sheet_assets"), fresh,
          "balance_sheet_assets")
      }, part1, part10),
      ("pipe4_cash_flow_load", (d: DataFrame) => {
        val fresh = StatementsPipeline
          .cashFlow(stmtDocs(d, buildCf2024Udf), layout2024 = true)
        StatementsPipeline.loadStatement(
          emptyTable(spark, "cash_flow_statement"), fresh,
          "cash_flow_statement")
      }, part1, part10),
      ("pipe4b_legacy_poisoned", (d: DataFrame) => {
        // the registered pipe4b shape: poisoned store of exact prior-year
        // copies for every third symbol → annual-only J1 guard + K1 append
        val fresh = StatementsPipeline
          .cashFlow(stmtDocs(d, buildCfLegacyNumUdf), layout2024 = false)
        val tableCols = Schemas.cashFlowStatement.fieldNames.toSeq
        val poison = fresh
          .filter(expr("CAST(substr(act_symbol, 2) AS BIGINT) % 3 = 0"))
          .withColumn("date", D.priorYear(col("date")))
          .select(tableCols.map(col): _*)
        StatementsPipeline.loadStatement(poison, fresh, "cash_flow_statement")
      }, part1, part10),
      ("pipe5_calendar_daily", (d: DataFrame) => calendarRun(spark, d),
        cust1, cust10))

    def time(fn: DataFrame => DataFrame, d: DataFrame): (Double, Long) = {
      var best = Double.MaxValue; var rows = 0L
      (1 to 2).foreach { _ =>
        val t0 = System.nanoTime()
        rows = fn(d).count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, rows)
    }

    println(f"${"op"}%-24s ${"t1x"}%8s ${"t10x"}%8s ${"ratio"}%6s  rows1x/rows10x")
    ops.foreach { case (name, fn, b1, b10) =>
      fn(b1).count() // warm codegen/JIT on the small corpus
      val (t1, r1) = time(fn, b1)
      val (t10, r10) = time(fn, b10)
      println(f"$name%-24s $t1%8.2f $t10%8.2f ${t10 / t1}%6.1f  $r1/$r10")
    }

    // ---- per-stage attribution: parse CPU vs guard+append joins ----
    // Each statement pipeline splits cleanly: `parse` is the html extract
    // + cell transform (scan-shaped UDF CPU), `load` is the J1 guard + K1
    // dedup-append joins run over a PRE-MATERIALIZED parse output (eager
    // localCheckpoint), so neither stage's clock includes the other's
    // work. This attributes the composed sweep's 10× wall between the
    // two, confirming the joins stay batch-proportional.
    val staged: Seq[(String, DataFrame => DataFrame,
        DataFrame => DataFrame, DataFrame, DataFrame)] = Seq(
      ("pipe2_income", (d: DataFrame) =>
        StatementsPipeline.incomeStatement(stmtDocs(d, buildIncomeYYUdf)),
        (p: DataFrame) => StatementsPipeline.loadIncomeRows(
          emptyTable(spark, "income_statement"), p),
        part1, part10),
      ("pipe3b_assets", (d: DataFrame) =>
        StatementsPipeline.balanceSheet(stmtDocs(d, buildBalanceUdf),
          pin = false)("balance_sheet_assets"),
        (p: DataFrame) => StatementsPipeline.loadStatement(
          emptyTable(spark, "balance_sheet_assets"), p,
          "balance_sheet_assets"),
        part1, part10),
      ("pipe4_cf2024", (d: DataFrame) =>
        StatementsPipeline.cashFlow(stmtDocs(d, buildCf2024Udf),
          layout2024 = true),
        (p: DataFrame) => StatementsPipeline.loadStatement(
          emptyTable(spark, "cash_flow_statement"), p,
          "cash_flow_statement"),
        part1, part10),
      ("pipe4b_legacy", (d: DataFrame) =>
        StatementsPipeline.cashFlow(stmtDocs(d, buildCfLegacyNumUdf),
          layout2024 = false),
        (p: DataFrame) => {
          // the poison-store derivation is a projection of the parsed
          // batch — store setup, clocked with the load arm it feeds
          val tableCols = Schemas.cashFlowStatement.fieldNames.toSeq
          val poison = p
            .filter(expr("CAST(substr(act_symbol, 2) AS BIGINT) % 3 = 0"))
            .withColumn("date", D.priorYear(col("date")))
            .select(tableCols.map(col): _*)
          StatementsPipeline.loadStatement(poison, p, "cash_flow_statement")
        },
        part1, part10))

    def best2(f: () => Unit): Double = {
      var best = Double.MaxValue
      (1 to 2).foreach { _ =>
        val t0 = System.nanoTime()
        f()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      best
    }

    println()
    println(f"${"op"}%-18s ${"stage"}%-6s ${"t1x"}%8s ${"t10x"}%8s ${"ratio"}%6s")
    staged.foreach { case (name, parse, load, b1, b10) =>
      load(parse(b1).localCheckpoint(eager = true)).count() // warm
      def stagePair(b: DataFrame): (Double, Double) = {
        val tp = best2(() => parse(b).localCheckpoint(eager = true))
        val p = parse(b).localCheckpoint(eager = true)
        val tl = best2(() => load(p).count())
        (tp, tl)
      }
      val (p1, l1) = stagePair(b1)
      val (p10, l10) = stagePair(b10)
      println(f"$name%-18s parse  $p1%8.2f $p10%8.2f ${p10 / p1}%6.1f")
      println(f"$name%-18s load   $l1%8.2f $l10%8.2f ${l10 / l1}%6.1f")
    }
  }
}
