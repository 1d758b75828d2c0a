package graft.queries

import java.io.File

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.export.CsvExport
import graft.model.Schemas
import graft.operators.LoadOps

/** Fixture materialization for the registered queries whose inputs cannot
  * come from the driver's parquet tables: the S5 raw-zone folder, the K2b
  * emitted CSV export, and the ST3 streaming drop-directory round trip.
  *
  * The harness mains ([[graft.Verify]], [[graft.Bench]]) call [[ensureAll]]
  * once up front; every accessor is memoized per JVM, so the registered
  * query closures stay pure reads — they resolve a path the harness already
  * materialized and the guard no-ops. Spec contexts that touch a single
  * registry entry without going through a main get the same once-per-JVM
  * guarantee from the accessor itself.
  */
object Fixtures {

  private def tmp(name: String) = new File(sys.props("java.io.tmpdir"), name)

  /** Delete-then-rebuild keeps fixtures deterministic across JVMs — a stale
    * dir from an older code version must not leak into this run's grade. */
  private def rm(f: File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
  }

  /** S5 — raw-zone fixture: dated folder, three detailed-estimates documents
    * plus one wrong-suffix file the scan must ignore. */
  lazy val s5Base: String = synchronized {
    val base = tmp("graft_s5_fixture")
    rm(base)
    val day = new File(base, "2024-01-15")
    day.mkdirs()
    def put(name: String, text: String): Unit = {
      java.nio.file.Files.writeString(new File(day, name).toPath, text); ()
    }
    put("AAPL.detailed-estimates.html", "<html><body id=home>a</body></html>")
    put("MSFT.detailed-estimates.html", "<html><body id=home>m</body></html>")
    put("NVDA.detailed-estimates.html", "<html><body id=home>n</body></html>")
    put("IGNORED.balance-sheet.html", "<html>not this kind</html>")
    base.getAbsolutePath
  }

  /** K2b — run the per-date CSV dump job (the reference's per-date driver
    * loop, `dump-dolt-statements.rkt:81-93`) once per (JVM, sfDir). The
    * registered query grades the emitted file BYTES by reading them back;
    * the write itself is fixture materialization, not the graded read. */
  private val k2bDirs = scala.collection.concurrent.TrieMap[String, String]()
  def k2bExport(s: SparkSession, sfDir: String): String =
    k2bDirs.getOrElseUpdate(sfDir, {
      val src = Tables.t(s, sfDir, "orders").select(
        col("o_orderkey"),
        when(col("o_orderstatus") =!= "F", col("o_orderstatus"))
          .as("status_or_null"),
        to_date(col("o_orderdate")).as("date"),
        col("o_totalprice"))
        .filter(col("date") < lit("1995-01-05").cast("date"))
      // per-sfDir dir: two scale factors in one JVM must not share bytes
      val out = tmp(s"graft_k2b_export_${math.abs(sfDir.hashCode)}")
      rm(out)
      CsvExport.writePerDate(src, "date", Seq("o_orderkey"),
        out.getAbsolutePath)
      out.getAbsolutePath
    })

  /** ST3 — the streaming calendar round trip: a real file-source stream over
    * a drop directory, two micro-batches through foreachFolderBatch with the
    * SAME batch operators (K5 slide-forward + K1 dedup-append) rewriting the
    * snapshot per trigger. Runs once per JVM and parks the final snapshot as
    * parquet; the registered query is a pure read of that snapshot.
    * Expected store: AAPL 01-10 (day-2 re-arrival is a PK duplicate),
    * MSFT 01-14 (stored 01-12 slid forward and was retracted), NVDA 01-20,
    * AMZN 01-25 → 4 rows (StreamingSpec asserts the same composition value
    * by value). */
  @volatile private var st3Dir: Option[String] = None
  def st3Snapshot(s: SparkSession): String = synchronized {
    st3Dir.getOrElse {
      import org.apache.spark.sql.types.{DateType, StringType, StructField, StructType}
      val schema = StructType(Seq(
        StructField("act_symbol", StringType),
        StructField("date", DateType),
        StructField("when", StringType)))
      val empty = s.createDataFrame(s.sparkContext.emptyRDD[Row],
        Schemas.tables("earnings_calendar"))
      val drop = java.nio.file.Files.createTempDirectory("graft_st3_drop")
      val (q, snapshot) = graft.streaming.StreamingLoad.foreachFolderBatch(
        s, drop.toString, schema, empty,
        (store, batch) => {
          val typed = batch.select(store.columns.map(col).toSeq: _*)
          LoadOps.dedupAppend(
            LoadOps.slideForwardRetract(store, typed, "act_symbol", "date"),
            typed, Schemas.primaryKeys("earnings_calendar"))
        })
      try {
        java.nio.file.Files.writeString(
          drop.resolve("day1.json"),
          """{"act_symbol":"AAPL","date":"2024-01-10","when":"Before market open"}
            |{"act_symbol":"MSFT","date":"2024-01-12","when":"After market close"}
            |{"act_symbol":"NVDA","date":"2024-01-20","when":null}
            |""".stripMargin)
        q.processAllAvailable()
        java.nio.file.Files.writeString(
          drop.resolve("day2.json"),
          """{"act_symbol":"AAPL","date":"2024-01-10","when":"Before market open"}
            |{"act_symbol":"MSFT","date":"2024-01-14","when":"After market close"}
            |{"act_symbol":"AMZN","date":"2024-01-25","when":"Before market open"}
            |""".stripMargin)
        q.processAllAvailable()
      } finally q.stop()
      val out = tmp("graft_st3_snapshot")
      rm(out)
      snapshot().coalesce(1).write.mode("overwrite")
        .parquet(out.getAbsolutePath)
      st3Dir = Some(out.getAbsolutePath)
      out.getAbsolutePath
    }
  }

  /** K8 — JSONL shard export of the documents table (the training-data
    * loader format), once per (JVM, sfDir); the registered query grades the
    * round trip by reading the shards back against the source table. */
  private val k8Dirs = scala.collection.concurrent.TrieMap[String, String]()
  def k8JsonlExport(s: SparkSession, sfDir: String): String =
    k8Dirs.getOrElseUpdate(sfDir, {
      val out = tmp(s"graft_k8_jsonl_${math.abs(sfDir.hashCode)}")
      rm(out)
      graft.export.JsonlExport.writeSharded(
        Tables.t(s, sfDir, "documents"), "doc_id",
        out.getAbsolutePath, shards = 8, maxRecordsPerShard = 500)
      out.getAbsolutePath
    })

  /** K3b — two managed tables bucketed+sorted on custkey with the SAME
    * bucket count ([[graft.sinks.SnapshotStore.writeBucketed]]), for the
    * co-located join grade: a join on the bucket key then needs no exchange
    * on either side. At 100 TB the bucket count scales with the cluster
    * (thousands); 8 keeps the local fixture small while proving the same
    * no-shuffle plan property (PlanSpec gates it). */
  private val bucketedPairs =
    scala.collection.concurrent.TrieMap[String, (String, String)]()

  /** A managed-table location can survive from a previous JVM while the
    * in-memory catalog starts empty — `saveAsTable(Overwrite)` then refuses
    * with LOCATION_ALREADY_EXISTS. Drop both the catalog entry and the
    * leftover warehouse directory before rewriting. */
  private def dropManaged(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    rm(new File(wh, table))
  }

  def bucketedPair(s: SparkSession, sfDir: String): (String, String) =
    bucketedPairs.getOrElseUpdate(sfDir, {
      val sfx = math.abs(sfDir.hashCode).toString
      val (o, c) = (s"bk_orders_$sfx", s"bk_customer_$sfx")
      dropManaged(s, o)
      dropManaged(s, c)
      graft.sinks.SnapshotStore.writeBucketed(
        Tables.t(s, sfDir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice"),
        o, Seq("o_custkey"), numBuckets = 8)
      graft.sinks.SnapshotStore.writeBucketed(
        Tables.t(s, sfDir, "customer").select("c_custkey", "c_mktsegment"),
        c, Seq("c_custkey"), numBuckets = 8)
      (o, c)
    })

  /** K9 — ORC snapshot export, once per (JVM, sfDir): the columnar
    * interchange sink for ORC-reading engines (Hive/Trino warehouses).
    * The registered query grades the round trip — a type-mapping or
    * encoding bug in either direction breaks the hash. */
  private val k9Dirs = scala.collection.concurrent.TrieMap[String, String]()
  def k9OrcExport(s: SparkSession, sfDir: String): String =
    k9Dirs.getOrElseUpdate(sfDir, {
      val out = tmp(s"graft_k9_orc_${math.abs(sfDir.hashCode)}")
      rm(out)
      Tables.t(s, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), to_date(col("o_orderdate")).as("d"))
        .write.mode("overwrite").orc(out.getAbsolutePath)
      out.getAbsolutePath
    })

  /** K10 — date-partitioned parquet layout: `repartition(d)` then
    * `partitionBy(d)` so every date directory is exactly one file (the
    * hash-repartition puts each day in one task — without it, every one of
    * the N write tasks opens a file per day it happens to hold: N× small
    * files, the classic 100-TB layout bug). Reads with a date predicate
    * then scan only the matching directories (PlanSpec gates the
    * PartitionFilters). */
  private val k10Dirs = scala.collection.concurrent.TrieMap[String, String]()
  def k10PartitionedEvents(s: SparkSession, sfDir: String): String =
    k10Dirs.getOrElseUpdate(sfDir, {
      val out = tmp(s"graft_k10_part_${math.abs(sfDir.hashCode)}")
      rm(out)
      Tables.t(s, sfDir, "events")
        .withColumn("d", to_date(col("ts")))
        .repartition(col("d"))
        .write.mode("overwrite").partitionBy("d").parquet(out.getAbsolutePath)
      out.getAbsolutePath
    })

  /** K13 — schema-evolution layout: an early batch written WITHOUT the
    * event_type column next to a later batch WITH it — the add-a-column
    * migration every long-lived dataset hits. The graded query reads the
    * union with mergeSchema and the old rows surface the new column as
    * NULL. */
  private val k13Dirs = scala.collection.concurrent.TrieMap[String, String]()
  def k13EvolvedEvents(s: SparkSession, sfDir: String): String =
    k13Dirs.getOrElseUpdate(sfDir, {
      val out = tmp(s"graft_k13_evolve_${math.abs(sfDir.hashCode)}")
      rm(out)
      val ev = Tables.t(s, sfDir, "events")
      ev.filter(col("event_id") % 2 === 0)
        .select("event_id", "user_id", "value")
        .write.mode("overwrite").parquet(s"${out.getAbsolutePath}/batch=1")
      ev.filter(col("event_id") % 2 =!= 0)
        .select("event_id", "user_id", "value", "event_type")
        .write.mode("overwrite").parquet(s"${out.getAbsolutePath}/batch=2")
      out.getAbsolutePath
    })

  /** K12 — two deterministic snapshot versions of an orders projection for
    * the CDC diff grade: v1 holds keys %7≠0, v2 holds keys %5≠0 (so both
    * added and removed keys exist) and doubles the price where %50=0
    * (changed rows). */
  private val k12Dirs = scala.collection.concurrent.TrieMap[String, (String, String)]()
  def k12SnapshotPair(s: SparkSession, sfDir: String): (String, String) =
    k12Dirs.getOrElseUpdate(sfDir, {
      val base = tmp(s"graft_k12_versions_${math.abs(sfDir.hashCode)}")
      rm(base)
      val src = Tables.t(s, sfDir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val v1 = s"${base.getAbsolutePath}/v1"
      val v2 = s"${base.getAbsolutePath}/v2"
      src.filter(col("o_orderkey") % 7 =!= 0)
        .write.mode("overwrite").parquet(v1)
      src.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 50 === 0, col("o_totalprice") * 2)
            .otherwise(col("o_totalprice")))
        .write.mode("overwrite").parquet(v2)
      (v1, v2)
    })

  /** Harness entry point: materialize every fixture before the registry is
    * swept, so each registered query executes as a pure read. */
  def ensureAll(s: SparkSession, sfDir: String): Unit = {
    s5Base
    k2bExport(s, sfDir)
    st3Snapshot(s)
    bucketedPair(s, sfDir)
    k8JsonlExport(s, sfDir)
    k9OrcExport(s, sfDir)
    k10PartitionedEvents(s, sfDir)
    k13EvolvedEvents(s, sfDir)
    k12SnapshotPair(s, sfDir)
    ()
  }
}
