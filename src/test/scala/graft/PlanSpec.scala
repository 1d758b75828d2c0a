package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression gates: the optimizations the engine's scale story
  * depends on must be visible in the physical plan, not assumed. Runs on
  * sf0.001 — plan shape, not timing. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("P2 date filter pushes down to the parquet scan") {
    val plan = planOf("p2_date_eq")
    // the predicate must sit INSIDE the pushed list — 'PushedFilters: []'
    // with the column merely in ReadSchema would be a pushdown regression
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(plan).isDefined,
      "expected the shipdate predicate inside PushedFilters")
    // column pruning: the scan must not read quantity-unrelated columns
    assert(!plan.contains("l_extendedprice"))
  }

  test("k10 date predicate becomes directory pruning, not a post-scan filter") {
    val df = SparkEntry.queries("k10_partition_pruned_read")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*d#".r.findFirstIn(plan).isDefined,
      "expected the date predicate inside PartitionFilters")
    // the pruned scan must touch only the 6 matching day directories
    // (sparkPlan, not executedPlan: AQE wraps the tree until execution)
    val scanned = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.partitionCount
    }.sum
    assert(scanned == 6, s"expected 6 day partitions scanned, saw $scanned")
  }

  test("k10 layout is one file per day directory (no small-file fan-out)") {
    val base = new java.io.File(
      graft.queries.Fixtures.k10PartitionedEvents(spark, dir))
    val dayDirs = base.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("d="))
    assert(dayDirs.nonEmpty)
    dayDirs.foreach { dd =>
      val files = dd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1,
        s"${dd.getName}: expected exactly 1 parquet file, saw ${files.length}")
    }
  }

  test("sim1 top-k is TakeOrderedAndProject, not a global sort") {
    val plan = planOf("sim1_cosine_topk")
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("dd2's signature self-join reuses one exchange, no cross join") {
    val plan = planOf("dd2_minhash_lsh")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "candidate generation must stay an equi-join")
  }

  test("j7 as-of join stays a union+window — no range or nested-loop join") {
    val plan = planOf("j7_asof_join")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("SortMergeJoin"),
      "as-of must not degrade to a join; the window pass IS the join")
    assert(plan.contains("Window"), "expected the carry-forward window")
  }

  test("sa1/sa2 sampling is scan-side only — no shuffle before the sort") {
    // split + stratified-keep are pure row-local expressions; the only
    // exchange allowed is the final presentation ORDER BY
    val plan = planOf("sa2_stratified_sample")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"sampling must not shuffle to decide rows, got $exchanges exchanges")
  }

  test("sim4 IVF assignment broadcasts centroids, never shuffles the corpus") {
    val plan = planOf("sim4_ivf_ann")
    assert(plan.contains("BroadcastExchange"),
      "centroid array + query row must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "cell probe must be a broadcast join, not a corpus shuffle")
  }

  test("similarity scoring runs the native vec_dot, not an interpreted fold") {
    val plan = planOf("sim1_cosine_topk")
    assert(plan.contains("vec_dot") || plan.contains("vec_norm_sq"),
      "cosine must compile to the codegen'd expressions")
    assert(!plan.contains("aggregate(zip_with"),
      "no higher-order-function fold may remain in the hot path")
  }

  test("tx7 contamination broadcasts the eval shingle set") {
    val plan = planOf("tx7_contamination")
    assert(plan.contains("BroadcastHashJoin"),
      "the corpus side must not shuffle for the eval join")
  }

  test("sa3 pushes the per-group k below the shuffle (partial WindowGroupLimit)") {
    val plan = planOf("sa3_group_sample")
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 2,
      "expected map-side (Partial) + reduce-side (Final) group limits")
  }

  test("tx5 winnowing is per-document array work — no window shuffle") {
    // the fingerprint selection must not exchange per character position;
    // the only allowed exchange is the presentation ORDER BY
    val plan = planOf("tx5_winnowing")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"only the final sort may exchange, got $exchanges")
    assert(!plan.contains("Window"), "no per-position window remains")
  }

  test("tx5b verified winnowing blocks then verifies with equi-joins only") {
    // tx5b is the block-then-verify GRADE of the xx winnowing mode (r12):
    // candidate pairs from shared fingerprints, verification from shared
    // 11-grams — every join is a hash equi-join, the per-position work
    // stays array-shaped (no Window), and nothing degenerates to a
    // cartesian/nested-loop pairing
    val plan = planOf("tx5b_winnowing_xxhash")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "pair generation must stay an equi-join on fp / gram hash")
    assert(!plan.contains("Window"), "no per-position window remains")
  }

  test("j4's FK anti-join carries no broadcast hint — AQE's call") {
    val df = SparkEntry.queries("j4_fk_orphans")(spark, dir)
    val logical = df.queryExecution.optimizedPlan.toString
    assert(!logical.contains("strategy=broadcast"),
      "fkViolations must not hint a broadcast — a fact-scale dim would OOM " +
        "the driver; AQE broadcasts the distinct key set when it fits")
    // sanity: executing still resolves to a broadcast for the bounded dim
    df.collect()
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"),
      "AQE should still pick a broadcast for the genuinely small key set")
  }

  test("no unconditional broadcast of fact-scale tables in j6") {
    val df = SparkEntry.queries("j6_star_join")(spark, dir)
    val logical = df.queryExecution.optimizedPlan.toString
    // exactly the two bounded dims (nation, region) carry broadcast hints;
    // a third hint means someone re-broadcast a fact-scale side (plans
    // print no table names, so count hints rather than grep for 'customer')
    val hints = "strategy=broadcast".r.findAllIn(logical).size
    assert(hints == 2, s"expected 2 broadcast hints (nation, region), got $hints")
  }

  test("tx9 pushes the per-group k below the shuffle (partial WindowGroupLimit)") {
    val plan = planOf("tx9_top_ngrams")
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      "top-k per group must forward <= k candidates per map task, not " +
        "shuffle every distinct (group, ngram) count")
  }

  test("j8 interval join is an equi-join on the time bucket, never a " +
    "nested loop") {
    // forbid broadcast so the gate holds at fact-scale on both sides: the
    // bucket key must make this a shuffled equi-join even when nothing fits
    // in a broadcast
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("j8_interval_bucket_join")(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        "the range predicate leaked into a nested-loop join")
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"),
        "expected a shuffled equi-join on the bucket key")
      assert(plan.contains("__bkt"), "bucket key missing from the plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("k3b bucketed join runs with zero hashpartitioning exchanges") {
    // forbid broadcast so the gate proves bucket co-location, not smallness
    // (at 100 TB neither fact side fits a broadcast); the only exchange left
    // must be the presentation ORDER BY's range partitioning
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("k3b_bucketed_join")(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), "expected a sort-merge join")
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join + same-key groupBy must reuse the bucket " +
          "partitioning — a hash exchange means co-location broke")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
