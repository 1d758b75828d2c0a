package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.types._

/** True-streaming latency bench (SCALE.md): runs the streaming operators as
  * REAL micro-batch queries — a file-source drop directory fed one batch at
  * a time — and records per-batch end-to-end latency (file lands →
  * `processAllAvailable` returns) plus the engine's own `triggerExecution`
  * from the progress listener. st1/st2/st4 grade the BATCH forms; this is
  * the measurement of the streaming forms themselves.
  *
  * Two queries, chosen for the two state regimes:
  *  - `firstseen_dedup` (st4's streaming form, append mode): the design
  *    claim under test is O(batch) per trigger — per-key state lives in
  *    the state store, so trigger latency must stay FLAT as cumulative
  *    state grows across batches. Batches are fed in event_id order, so
  *    first-arrival dedup equals the batch min-event_id dedup and the
  *    final memory sink must EQUAL the graded st4 semantics (asserted).
  *  - `tumbling_hourly` (st1's streaming form, complete mode): the
  *    monitoring rollup; complete mode re-emits the whole result each
  *    trigger, so its latency grows with the window count — the measured
  *    argument for append+watermark finalization on unbounded streams.
  *    Fed in ts order; the final result must equal the batch
  *    `tumblingCounts` (asserted).
  *
  * Batch feeding stages each slice as JSON off the clock, then moves the
  * file into the watched dir (an atomic appear, as in production drop
  * folders). `runMain graft.StreamBench [sfDir] [nBatches]`.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val ev = graft.queries.Tables.t(spark, sfDir, "events")
      .select(col("event_id").cast("long").as("event_id"),
        col("user_id").cast("long").as("user_id"),
        col("event_type"), col("value").cast("double").as("value"),
        col("ts"))
      .localCheckpoint(eager = true)
    val total = ev.count()
    val per = (total + nBatches - 1) / nBatches

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("ts", TimestampType)))

    // per-query progress capture: (batchId, inputRows, triggerExecution ms)
    val progress =
      scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.numInputRows > 0) progress.synchronized {
          progress += ((p.batchId, p.numInputRows,
            p.durationMs.getOrDefault("triggerExecution", -1L)))
        }
      }
    })

    /** Feed `ev` in `orderCol` order as nBatches equal slices; time each. */
    def run(name: String, orderCol: String, outputMode: String,
            mkQuery: DataFrame => DataFrame): Unit = {
      val inDir = Files.createTempDirectory(s"graft_sb_${name}_in")
      val stage = Files.createTempDirectory(s"graft_sb_${name}_stage")
      // rank off the clock so slices are equal-size and arrival-ordered
      val ranked = ev.withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(orderCol)))
        .localCheckpoint(eager = true)
      progress.synchronized(progress.clear())
      val q = mkQuery(spark.readStream.schema(schema).json(inDir.toString))
        .writeStream.outputMode(outputMode)
        .format("memory").queryName(name).start()
      println(s"== $name ($outputMode mode, $nBatches batches of ~$per) ==")
      println(f"${"batch"}%6s ${"in_rows"}%8s ${"e2e_ms"}%8s ${"trigger_ms"}%10s")
      (0 until nBatches).foreach { i =>
        val lo = i * per + 1
        val hi = math.min((i + 1) * per, total)
        val sd = stage.resolve(s"b$i")
        ranked.filter(col("__rn").between(lo, hi)).drop("__rn")
          .coalesce(1).write.mode("overwrite").json(sd.toString)
        val part = new java.io.File(sd.toString).listFiles()
          .find(f => f.getName.startsWith("part-") &&
            f.getName.endsWith(".json")).get
        val t0 = System.nanoTime()
        Files.move(part.toPath, inDir.resolve(s"batch_$i.json"))
        q.processAllAvailable()
        val e2e = (System.nanoTime() - t0) / 1e6
        val (_, rows, trig) = progress.synchronized(
          progress.lastOption.getOrElse((-1L, 0L, -1L)))
        println(f"$i%6d $rows%8d $e2e%8.0f $trig%10d")
      }
      q.stop()
    }

    // --- st4's streaming form: stateful first-seen dedup, append mode ---
    run("sb_dedup", "event_id", "append", { src =>
      graft.streaming.StreamingLoad.firstSeenDedup(
        src.select(col("event_id").as("_1"), col("user_id").as("_2"),
            col("event_type").as("_3"), col("value").as("_4"))
          .as[(Long, Long, String, Double)]
          .groupByKey(r => (r._2, r._3)),
        pick = (a: (Long, Long, String, Double),
                b: (Long, Long, String, Double)) =>
          if (a._1 <= b._1) a else b)
        .toDF("event_id", "user_id", "event_type", "value")
    })
    // the streaming output must equal st4's graded batch semantics
    val batchDedup = graft.streaming.StreamingLoad.firstSeenDedup(
      ev.select(col("event_id").as("_1"), col("user_id").as("_2"),
          col("event_type").as("_3"), col("value").as("_4"))
        .as[(Long, Long, String, Double)]
        .groupByKey(r => (r._2, r._3)),
      pick = (a: (Long, Long, String, Double),
              b: (Long, Long, String, Double)) =>
        if (a._1 <= b._1) a else b)
      .toDF("event_id", "user_id", "event_type", "value")
    val streamDedup = spark.table("sb_dedup")
    val diff = streamDedup.exceptAll(batchDedup).count() +
      batchDedup.exceptAll(streamDedup).count()
    require(diff == 0,
      s"streaming dedup diverged from the graded batch form ($diff rows)")
    println(s"sb_dedup == batch st4 semantics: ${streamDedup.count()} rows")

    // --- st1's streaming form: tumbling hourly rollup, complete mode ---
    run("sb_tumble", "ts", "complete", { src =>
      graft.streaming.StreamingLoad.tumblingCounts(
        src, "ts", col("event_type"), valueCol = col("value"))
    })
    val batchTumble = graft.streaming.StreamingLoad.tumblingCounts(
      ev, "ts", col("event_type"), valueCol = col("value"))
    val streamTumble = spark.table("sb_tumble")
    val tdiff = streamTumble.exceptAll(batchTumble).count() +
      batchTumble.exceptAll(streamTumble).count()
    require(tdiff == 0,
      s"streaming tumbling diverged from the graded batch form ($tdiff rows)")
    println(s"sb_tumble == batch st1 semantics: ${streamTumble.count()} rows")

    spark.stop()
  }
}
