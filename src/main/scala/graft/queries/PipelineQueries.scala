package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.export.CsvExport
import graft.functions.{DateFns => D}
import graft.model.Schemas
import graft.operators.LoadOps
import graft.pipelines.{EstimatesPipeline, StatementsPipeline}
import graft.sources.RawZone
import Tables.t

/** Pipeline-composition round trips: fixture documents → the REAL pipeline
  * (parse → sanitize → cast/scale → guard → dedup-append) → typed table
  * rows, oracle-checked against values recomputed from the fixture formulas.
  * Plus the K2 export projection, the S5 raw-zone scan (rows-only — DuckDB
  * cannot see the fixture folder), and D8.
  */
object PipelineQueries {


  private val buildFullEstimateUdf =
    udf(ExtractQueries.buildFullEstimateDoc _)
  private val buildIncomeYYUdf =
    udf((pk: Long) => ExtractQueries.buildIncomeDoc(pk, yy2 = true))

  private def emptyTable(s: SparkSession, name: String): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[Row], Schemas.tables(name))

  /** DuckDB: estimate-cell variant → F1-sanitized → DOUBLE (money graded as
    * double, see the pipe1 comment). */
  private def estMoney(idx: String): String =
    s"""TRY_CAST(CASE CAST(($idx) % 8 AS INTEGER)
        WHEN 0 THEN '1234.5' WHEN 1 THEN '12.3' WHEN 2 THEN 'NA'
        WHEN 3 THEN 'NA' WHEN 4 THEN '2.5e9' WHEN 5 THEN '1.2e12'
        WHEN 6 THEN '10.00e6' ELSE '42.75' END AS DOUBLE)"""

  /** DuckDB: statement-cell variant → F2-sanitized → ×1e6 (NULL when the
    * cast fails, e.g. the parenthesized variant). */
  private def stMoneyM(idx: String): String =
    s"""(TRY_CAST(CASE CAST(($idx) % 4 AS INTEGER)
        WHEN 0 THEN '1234.5' WHEN 1 THEN '567.8' WHEN 2 THEN 'NA'
        ELSE '(9.1)' END AS DOUBLE) * 1000000)"""

  private def stMoney(idx: String): String =
    s"""TRY_CAST(CASE CAST(($idx) % 4 AS INTEGER)
        WHEN 0 THEN '1234.5' WHEN 1 THEN '567.8' WHEN 2 THEN 'NA'
        ELSE '(9.1)' END AS DOUBLE)"""

  val all: Seq[Q] = Seq(

    // Estimates pipeline end to end into eps_estimate: doc-level enum
    // validity (only pk%5=4 docs carry scores inside the A-F vocabulary —
    // the rest are "rolled back" like the reference's failed transactions),
    // D1 period-end synthesis, NA→NULL casts, K1 dedup-append.
    Q("pipe1_estimates_eps_load", (s, dir) => {
      val docs = ExtractQueries.spread(s, t(s, dir, "part")).select(
        concat(lit("P"), col("p_partkey")).as("act_symbol"),
        buildFullEstimateUdf(col("p_partkey")).as("html"),
        lit("2025-01-01").cast("date").as("folder_date"))
      val fresh = EstimatesPipeline.tables(docs)("eps_estimate")
      val loaded = LoadOps.dedupAppend(emptyTable(s, "eps_estimate"), fresh,
        Schemas.primaryKeys("eps_estimate"))
      // money columns graded as double: the harness coerces DuckDB decimals
      // to float64, and exact Decimal-vs-float compares would false-negative
      loaded.select(col("act_symbol"), col("date"), col("period"),
        col("period_end_date"), col("consensus").cast("double").as("consensus"),
        col("count"), col("recent").cast("double").as("recent"),
        col("high").cast("double").as("high"),
        col("low").cast("double").as("low"),
        col("year_ago").cast("double").as("year_ago"))
        .orderBy("act_symbol", "period")
    }, Some(s"""
      WITH pp AS (
        SELECT * FROM (VALUES
          ('Current Quarter', 2), ('Next Quarter', 3),
          ('Current Year', 4), ('Next Year', 5)) AS v(period, c))
      SELECT 'P' || CAST(p_partkey AS VARCHAR) AS act_symbol,
             DATE '2025-01-01' AS date, period,
             last_day(make_date(2020 + CAST((p_partkey + 1 + c) % 6 AS INTEGER),
                                CAST((p_partkey + c) % 12 AS INTEGER) + 1, 1))
               AS period_end_date,
             ${estMoney("p_partkey*7 + 1*31 + 1*5 + c")} AS consensus,
             CAST(NULL AS SMALLINT) AS count,
             ${estMoney("p_partkey*7 + 1*31 + 3*5 + c")} AS recent,
             ${estMoney("p_partkey*7 + 1*31 + 4*5 + c")} AS high,
             ${estMoney("p_partkey*7 + 1*31 + 5*5 + c")} AS low,
             ${estMoney("p_partkey*7 + 1*31 + 6*5 + c")} AS year_ago
      FROM part CROSS JOIN pp
      WHERE p_partkey % 5 = 4
      ORDER BY act_symbol, period""")),

    // Income-statement pipeline end to end: M/dd/yy date parse, Year/Quarter
    // enum, ×1e6 scaling with per-share exemptions, quarterly D&A NULLs,
    // J1 guard + K1 append against an empty store.
    Q("pipe2_income_stmt_load", (s, dir) => {
      val docs = ExtractQueries.spread(s, t(s, dir, "part")).select(
        concat(lit("P"), col("p_partkey")).as("act_symbol"),
        buildIncomeYYUdf(col("p_partkey")).as("html"),
        lit("2025-06-01").cast("date").as("folder_date"))
      StatementsPipeline
        .loadIncomeStatement(emptyTable(s, "income_statement"), docs)
        .select(Seq(col("act_symbol"), col("date"), col("period")) ++
          Seq("sales", "net_income",
            "income_before_depreciation_and_amortization",
            "depreciation_and_amortization", "average_shares",
            "diluted_net_eps").map(c => col(c).cast("double").as(c)): _*)
        .orderBy("act_symbol", "period", "date")
    }, Some(s"""
      WITH pp AS (
        SELECT * FROM (VALUES ('Year', 0), ('Quarter', 1)) AS v(period, per)),
      dd AS (SELECT unnest(generate_series(1, 5)) AS di)
      SELECT 'P' || CAST(p_partkey AS VARCHAR) AS act_symbol,
             make_date(2015 + CAST((p_partkey + di + 1) % 8 AS INTEGER),
                       CAST((p_partkey + di + 1) % 12 AS INTEGER) + 1,
                       10 + CAST((p_partkey + per) % 15 AS INTEGER)) AS date,
             period,
             ${stMoneyM("p_partkey*11 + per*13 + 1*17 + 1*7 + di + 1")} AS sales,
             ${stMoneyM("p_partkey*11 + per*13 + 1*17 + 15*7 + di + 1")} AS net_income,
             CASE WHEN period = 'Year'
               THEN ${stMoneyM("p_partkey*11 + per*13 + 2*17 + 1*7 + di + 1")}
               ELSE NULL END AS income_before_depreciation_and_amortization,
             CASE WHEN period = 'Year'
               THEN ${stMoneyM("p_partkey*11 + per*13 + 2*17 + 2*7 + di + 1")}
               ELSE NULL END AS depreciation_and_amortization,
             ${stMoneyM("p_partkey*11 + per*13 + (CASE period WHEN 'Year' THEN 3 ELSE 2 END)*17 + 1*7 + di + 1")} AS average_shares,
             ${stMoney("p_partkey*11 + per*13 + (CASE period WHEN 'Year' THEN 3 ELSE 2 END)*17 + 3*7 + di + 1")} AS diluted_net_eps
      FROM part CROSS JOIN pp CROSS JOIN dd
      ORDER BY act_symbol, period, date""")),

    // K2 — the export projection: every column `coalesce(cast::string, '')`
    // with header+order handled by the writer (graded on the projection).
    Q("k2_csv_projection", (s, dir) => {
      val df = t(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_orderstatus") =!= "F", col("o_orderstatus"))
          .as("status_or_null"),
        to_date(col("o_orderdate")).as("d"),
        col("o_totalprice"))
      // order numerically BEFORE the all-string projection — '10' < '2'
      // lexicographically, and the oracle orders by the numeric key too
      CsvExport.projectForCsv(df)
        .orderBy(col("o_orderkey").cast("long"))
    }, Some("""
      SELECT coalesce(CAST(o_orderkey AS VARCHAR), '') AS o_orderkey,
             coalesce(CAST(NULLIF(o_orderstatus, 'F') AS VARCHAR), '')
               AS status_or_null,
             coalesce(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), '') AS d,
             coalesce(CAST(o_totalprice AS VARCHAR), '') AS o_totalprice
      FROM orders ORDER BY CAST(o_orderkey AS BIGINT)""")),

    // D8 — posix @ 6am request key (`earnings-calendar-extract.rkt:25`).
    Q("d8_posix_6am", (s, dir) =>
      t(s, dir, "orders").select(to_date(col("o_orderdate")).as("d"))
        .distinct()
        .select(col("d"), D.posixAt6am(col("d")).as("posix_6am"))
        .orderBy("d"),
      Some("""
      SELECT d, CAST(epoch(CAST(d AS TIMESTAMP)) AS BIGINT) + 21600
               AS posix_6am
      FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
      ORDER BY d""")),

    // Salted two-phase aggregation over skewed keys (3x2 distinct values
    // across 600k rows at sf0.1): identical answer to the plain GROUP BY,
    // but no single reducer owns a hot key.
    Q("a8_salted_skew_agg", (s, dir) => {
      val li = t(s, dir, "lineitem")
      graft.operators.SkewOps.saltedCountSum(li,
        Seq("l_returnflag", "l_linestatus"), col("l_quantity"), salts = 16)
        .select(col("l_returnflag"), col("l_linestatus"), col("n"),
          round(col("s"), 2).as("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    }, Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS n,
             round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Winnowing fingerprints: rolling k-gram hashes, min per w-window —
    // any shared substring of length >= w+k-1 yields a common fingerprint.
    Q("tx5_winnowing", (s, dir) =>
      graft.operators.TextAnalysis.winnowingFingerprints(
        t(s, dir, "documents"), "doc_id", "text", k = 8, w = 4)
        .orderBy("doc_id", "fp"),
      Some("""
      WITH grams AS (
        SELECT doc_id, p, length(text) AS len,
               substr(md5(substr(text, CAST(p AS INTEGER), 8)), 1, 8) AS h
        FROM documents,
             LATERAL (SELECT unnest(generate_series(1,
               greatest(length(text) - 7, 0))) AS p)),
      wins AS (
        SELECT doc_id, p, len,
               min(h) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        FROM grams)
      SELECT DISTINCT doc_id, fp FROM wins
      WHERE p <= len - 7 - 3
      ORDER BY doc_id, fp""")),

    // S5 — raw-zone scan: dated fixture folder + suffix glob + symbol from
    // filename. No DuckDB oracle (the fixture folder is outside its reach):
    // the driver records a rows-only check; PipelinesSpec asserts content.
    Q("s5_raw_zone_scan", (s, dir) => {
      val base = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_s5_fixture")
      val day = new java.io.File(base, "2024-01-15")
      day.mkdirs()
      def put(name: String, text: String): Unit = {
        val f = new java.io.File(day, name)
        if (!f.exists()) java.nio.file.Files.writeString(f.toPath, text)
      }
      put("AAPL.detailed-estimates.html", "<html><body id=home>a</body></html>")
      put("MSFT.detailed-estimates.html", "<html><body id=home>m</body></html>")
      put("NVDA.detailed-estimates.html", "<html><body id=home>n</body></html>")
      put("IGNORED.balance-sheet.html", "<html>not this kind</html>")
      RawZone.scanDocuments(s, base.getAbsolutePath, "2024-01-15",
        "detailed-estimates")
        .select(col("act_symbol"), length(col("html")).as("nchars"),
          col("folder_date"))
        .orderBy("act_symbol")
    }, None)
  )
}
