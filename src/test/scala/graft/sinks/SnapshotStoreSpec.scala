package graft.sinks

import java.nio.file.Files
import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** K3 (date-partitioned snapshot model) + K6 (compaction rewrite). */
class SnapshotStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("partitioned write round-trips and prunes by date") {
    val path = Files.createTempDirectory("graft_store").toString + "/t"
    val df = Seq(
      ("AAPL", Date.valueOf("2024-01-01"), 1.0),
      ("MSFT", Date.valueOf("2024-01-01"), 2.0),
      ("AAPL", Date.valueOf("2024-01-02"), 3.0))
      .toDF("act_symbol", "date", "v")
    SnapshotStore.write(df, path)
    assert(new java.io.File(path).listFiles()
      .exists(_.getName == "date=2024-01-01")) // partition dir per date
    val back = SnapshotStore.read(spark, path)
    assert(back.count() === 3)
    val pruned = back.filter($"date" === Date.valueOf("2024-01-02"))
    assert(pruned.count() === 1)
    // partition pruning visible in the plan: the date predicate must sit
    // INSIDE the PartitionFilters list ('PartitionFilters: []' with the
    // filter applied post-scan would be a full store scan)
    val plan = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*date".r.findFirstIn(plan).isDefined,
      "expected the date predicate inside PartitionFilters")
  }

  test("per-date loader reads prune the store scan — the 100-TB contract") {
    // LoadOps.dedupAppend's documented contract (LoadOps.scala:20-23):
    // callers pass only the date partitions the incoming batch touches.
    // This gate fails if that composition ever stops reaching the scan as
    // a partition filter — i.e. if a loader silently full-scans the store.
    val path = Files.createTempDirectory("graft_prune").toString + "/t"
    val store = Seq(
      ("AAPL", Date.valueOf("2024-01-01"), "Before market open"),
      ("MSFT", Date.valueOf("2024-01-02"), "After market close"),
      ("NVDA", Date.valueOf("2024-01-03"), "Before market open"))
      .toDF("act_symbol", "date", "when")
    SnapshotStore.write(store, path)
    val batchDate = Date.valueOf("2024-01-02")
    val incoming = Seq(("AMZN", batchDate, "After market close"))
      .toDF("act_symbol", "date", "when")
    val touched = SnapshotStore.read(spark, path)
      .filter($"date" === batchDate)
    val loaded = graft.operators.LoadOps.dedupAppend(
      touched, incoming, Seq("act_symbol", "date"))
    assert(loaded.count() === 2) // MSFT (stored) + AMZN (fresh)
    val plan = loaded.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*date".r.findFirstIn(plan).isDefined,
      "the loader's per-date read must prune the store scan, not filter " +
        "after a full scan")
  }

  test("bucketed tables co-locate a join: no exchange on either side") {
    val left = (1 to 200).map(i => (s"S${i % 40}", i.toDouble))
      .toDF("act_symbol", "a")
    val right = (1 to 100).map(i => (s"S${i % 40}", i * 2.0))
      .toDF("act_symbol", "b")
    SnapshotStore.writeBucketed(left, "bk_left", Seq("act_symbol"), 4)
    SnapshotStore.writeBucketed(right, "bk_right", Seq("act_symbol"), 4)
    // forbid broadcast so the test proves bucket co-location, not smallness
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bk_left")
        .join(spark.table("bk_right"), "act_symbol")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // bucket co-location: the join needs no shuffle of either input
      assert(!plan.contains("Exchange hashpartitioning"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("compact rewrites each date partition to the target file count") {
    val path = Files.createTempDirectory("graft_compact").toString + "/t"
    val df = (1 to 40).map(i =>
      (s"S$i", Date.valueOf("2024-01-01"), i.toDouble))
      .toDF("act_symbol", "date", "v")
    df.repartition(8).write.partitionBy("date").parquet(path)
    val before = new java.io.File(path + "/date=2024-01-01")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(before > 1)
    SnapshotStore.compact(spark, path)
    val after = new java.io.File(path + "/date=2024-01-01")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(after === 1)
    assert(SnapshotStore.read(spark, path).count() === 40)
  }

  test("diff classifies added/removed/changed and drops the unchanged majority") {
    val old = Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0),
      (4L, null.asInstanceOf[String], 40.0))
      .toDF("k", "s", "v")
    val neu = Seq((2L, "B", 20.0), (3L, "C", 99.0),
      (4L, "D", 40.0), (5L, "E", 50.0))
      .toDF("k", "s", "v")
    val out = SnapshotStore.diff(old, neu, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("change")).toMap
    // 1 only in old, 5 only in new, 3 payload-changed, 4 null→D changed
    // (null-safe compare), 2 identical → absent
    assert(out == Map(1L -> "removed", 5L -> "added",
      3L -> "changed", 4L -> "changed"))
  }
}
