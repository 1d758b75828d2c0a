package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.StatementExtract
import graft.model.Schemas
import graft.operators.Dedup
import graft.pipelines.StatementsPipeline
import Tables.t

/** Ad-hoc stage profiler: times labelled sub-plans of the hot benchmark
  * queries so optimization targets the stage that actually burns the time
  * (parse vs explode vs join vs shuffle) instead of the whole query.
  * `runMain graft.queries.Profile [sfDir] [pipe2|dd2|pipe4|all]`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(df: => DataFrame): Unit = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    def emptyTable(name: String): DataFrame =
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        Schemas.tables(name))

    val which = args.drop(1).headOption.getOrElse("all")

    if (which == "q") {
      // profile registered queries by name (comma-separated), 3 passes each
      args(2).split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
        val fn = graft.SparkEntry.queries(name)
        (1 to 3).foreach(i => time(s"$name pass $i")(fn(spark, sfDir)))
      }
    }

    if (which == "all" || which == "pipe2") {
      val buildUdf = udf((pk: Long) =>
        ExtractQueries.buildIncomeDoc(pk, yy2 = true))
      val parseUdf = udf(StatementExtract.parseIncomeStatement _)
        .asNondeterministic()
      val part = t(spark, sfDir, "part")
      val docs = ExtractQueries.spread(spark, part).select(
        concat(lit("P"), col("p_partkey")).as("act_symbol"),
        buildUdf(col("p_partkey")).as("html"),
        lit("2025-06-01").cast("date").as("folder_date"))
      time("pipe2: build docs only")(docs.select(length(col("html")).as("l")))
      time("pipe2: build+parse")(
        docs.select(parseUdf(col("html")).as("p"))
          .select(size(col("p").getField("rows")).as("n")))
      time("pipe2: incomeStatement rows")(
        StatementsPipeline.incomeStatement(docs))
      time("pipe2: full load")(
        StatementsPipeline.loadIncomeStatement(
          emptyTable("income_statement"), docs))
    }

    if (which == "pipe1") {
      import graft.pipelines.EstimatesPipeline
      import graft.operators.LoadOps
      val buildUdf = udf(ExtractQueries.buildFullEstimateDoc _)
      val part = t(spark, sfDir, "part")
      val docs = ExtractQueries.spread(spark, part).select(
        concat(lit("P"), col("p_partkey")).as("act_symbol"),
        buildUdf(col("p_partkey")).as("html"),
        lit("2025-01-01").cast("date").as("folder_date"))
      time("pipe1: parsed() docs")(EstimatesPipeline.parsed(docs))
      time("pipe1: parsed() again")(EstimatesPipeline.parsed(docs))
      time("pipe1: eps table (w/ cache)")(
        EstimatesPipeline.tables(docs)("eps_estimate"))
      time("pipe1: eps table (no cache)")(
        EstimatesPipeline.tables(docs, pin = false)("eps_estimate"))
      time("pipe1: eps table (cache again)")(
        EstimatesPipeline.tables(docs)("eps_estimate"))
      time("pipe1: eps table (nocache again)")(
        EstimatesPipeline.tables(docs, pin = false)("eps_estimate"))
      time("pipe1: full query nocache") {
        val fresh = EstimatesPipeline.tables(docs, pin = false)("eps_estimate")
        LoadOps.dedupAppend(emptyTable("eps_estimate"), fresh,
          Schemas.primaryKeys("eps_estimate"))
      }
    }

    if (which == "pipe2b") {
      import org.apache.spark.sql.expressions.Window
      val buildUdf = udf((pk: Long) =>
        ExtractQueries.buildIncomeDoc(pk, yy2 = true))
      val part = t(spark, sfDir, "part")
      val docs = ExtractQueries.spread(spark, part).select(
        concat(lit("P"), col("p_partkey")).as("act_symbol"),
        buildUdf(col("p_partkey")).as("html"),
        lit("2025-06-01").cast("date").as("folder_date"))
      val existing = emptyTable("income_statement")
      val pk = Schemas.primaryKeys("income_statement")
      def incoming = StatementsPipeline.incomeStatement(docs)
      time("pipe2b: rows only")(incoming)
      time("pipe2b: rows+window dedup") {
        val cols = existing.columns.toSeq
        val w = Window.partitionBy(pk.map(col): _*)
          .orderBy(cols.filterNot(pk.contains).map(col): _*)
        incoming.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }
      time("pipe2b: rows+guard only") {
        val facts = Schemas.incomeStatement.fieldNames.toSeq
          .diff(Seq("act_symbol", "date", "period",
            "income_before_depreciation_and_amortization",
            "depreciation_and_amortization"))
        graft.operators.LoadOps.priorPeriodGuard(existing, incoming, facts,
          nullSafeFacts = Seq("income_before_depreciation_and_amortization",
            "depreciation_and_amortization"))
      }
      time("pipe2b: full load")(
        StatementsPipeline.loadIncomeStatement(existing, docs))
      time("pipe2b: full load again")(
        StatementsPipeline.loadIncomeStatement(existing, docs))
    }

    if (which == "all" || which == "dd2") {
      val d = t(spark, sfDir, "documents")
      for (pass <- 1 to 3)
        time(s"dd2 full pass $pass") {
          // lazy localCheckpoint, matching the registered dd2 plan — the
          // profiler must time the same materialization strategy it grades
          val sh = Dedup.shingleMultiset(d, "doc_id", "text")
          val sig = Dedup.minhashSignatures(sh, "doc_id", bands = 4)
            .localCheckpoint(eager = false)
          Dedup.lshCandidatePairs(sig, "doc_id").orderBy("doc_a", "doc_b")
        }
      // r15 (ADVICE r14): shingleSet IS shingleMultiset since r14's
      // doc-local dedup, so the old explode-vs-distinct rows timed two
      // identical plans. Price the CURRENT shape against the retired
      // corpus-wide distinct instead, so the exchange r14 deleted stays
      // visible in the profile.
      time("dd2: doc-distinct shingles (current)")(
        Dedup.shingleSet(d, "doc_id", "text"))
      time("dd2: + corpus-wide distinct (retired r13 shape)")(
        Dedup.shingleSet(d, "doc_id", "text").distinct())
      time("dd2: signatures (multiset)")(
        Dedup.minhashSignatures(
          Dedup.shingleMultiset(d, "doc_id", "text"), "doc_id"))
      time("dd2: signatures (distinct)")(
        Dedup.minhashSignatures(
          Dedup.shingleSet(d, "doc_id", "text"), "doc_id"))
      time("dd2: full (as benched)") {
        val sh = Dedup.shingleMultiset(d, "doc_id", "text")
        val sig = Dedup.minhashSignatures(sh, "doc_id", bands = 4)
          .localCheckpoint(eager = false)
        Dedup.lshCandidatePairs(sig, "doc_id")
      }
    }

    if (which == "all" || which == "pipe4") {
      val buildUdf = udf(ExtractQueries.buildCashFlow2024Html _)
      val part = t(spark, sfDir, "part")
      val docs = ExtractQueries.spread(spark, part).select(
        concat(lit("P"), col("p_partkey")).as("act_symbol"),
        buildUdf(col("p_partkey")).as("html"),
        lit("2025-06-01").cast("date").as("folder_date"))
      time("pipe4: build docs only")(docs.select(length(col("html")).as("l")))
      time("pipe4: cashFlow rows")(
        StatementsPipeline.cashFlow(docs, layout2024 = true))
      time("pipe4: full load")(
        StatementsPipeline.loadStatement(emptyTable("cash_flow_statement"),
          StatementsPipeline.cashFlow(docs, layout2024 = true),
          "cash_flow_statement"))
    }

    spark.stop()
  }
}
