package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkEntry, TestSpark}

/** Invariants for the fourth-wave behavioral operators — association rules,
  * the KS test, Benford audit, RFM segmentation, ACF, Markov transitions,
  * and multi-source BFS — the properties that must hold at any scale,
  * complementing the DuckDB hash grade. */
class BehaviorOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  // ------------------------------------------------------------------
  // Basket.associationRules
  // ------------------------------------------------------------------

  test("basket: brute-force parity on a hand-built basket set") {
    val s = spark
    import s.implicits._
    // baskets: 1:{a,b,c} 2:{a,b} 3:{a,b} 4:{b,c} 5:{a} — plus a duplicate
    // (1,a) row that must collapse.
    val items = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (3L, "a"), (3L, "b"),
      (4L, "b"), (4L, "c"), (5L, "a")
    ).toDF("basket", "item")
    val out = Basket.associationRules(items, "basket", "item",
      minItemCount = 2, minPairCount = 2)
      .orderBy("p1", "p2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    // a: 4 baskets, b: 4, c: 2, N=5. pairs: (a,b) co=3, (a,c) co=1 (dropped
    // by minPairCount), (b,c) co=2.
    assert(out.toSeq == Seq(
      ("a", "b", 3L, 4L, 4L, 0.75, 5.0 * 3 / 16),
      ("b", "c", 2L, 4L, 2L, 0.5, 5.0 * 2 / 8)))
  }

  test("basket: the oversized-basket cap drops the hot basket's pairs") {
    val s = spark
    import s.implicits._
    val hot = (1 to 50).map(i => (99L, s"i$i"))
    val normal = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"))
    val items = (hot ++ normal).toDF("basket", "item")
    val out = Basket.associationRules(items, "basket", "item",
      minItemCount = 1, minPairCount = 1, maxBasketSize = 10)
      .collect()
    // only the (x,y) pair survives; none of the 50-item basket's 1225 pairs
    assert(out.length == 1)
    assert(out(0).getString(0) == "x" && out(0).getString(1) == "y")
    // and the basket total N excludes the dropped basket: lift = co·N/(c1·c2)
    // = 2·2/(2·2) = 1
    assert(out(0).getDouble(6) == 1.0)
  }

  // ------------------------------------------------------------------
  // KS test
  // ------------------------------------------------------------------

  test("ks: D = 0 on identical samples, 1 on disjoint supports") {
    val s = spark
    import s.implicits._
    def ks(df: org.apache.spark.sql.DataFrame): Double = {
      val binned = df.groupBy("v")
        .agg(sum("g").as("n1b"), sum(expr("1 - g")).as("n2b"))
      val totals = binned.agg(sum("n1b").as("t1"), sum("n2b").as("t2"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("v")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      binned
        .withColumn("c1", sum("n1b").over(w))
        .withColumn("c2", sum("n2b").over(w))
        .crossJoin(broadcast(totals))
        .select(abs(col("c1") / col("t1") - col("c2") / col("t2")).as("d"))
        .agg(max("d")).collect()(0).getDouble(0)
    }
    val same = (1 to 100).flatMap(i => Seq((i.toDouble, 1), (i.toDouble, 0)))
      .toDF("v", "g")
    assert(ks(same) == 0.0)
    val disjoint = ((1 to 50).map(i => (i.toDouble, 1)) ++
      (51 to 100).map(i => (i.toDouble, 0))).toDF("v", "g")
    assert(ks(disjoint) == 1.0)
  }

  test("ks: graded query emits one row with d in [0,1]") {
    val r = run("cs14_ks_test").collect()
    assert(r.length == 1)
    val d = r(0).getAs[Double]("d_stat")
    assert(d >= 0.0 && d <= 1.0)
  }

  // ------------------------------------------------------------------
  // Benford audit
  // ------------------------------------------------------------------

  test("benford: shares sum to ~1 and digits are 1-9") {
    val rows = run("cs15_benford_audit").collect()
    assert(rows.nonEmpty && rows.length <= 9)
    val digits = rows.map(_.getString(0)).toSet
    assert(digits.subsetOf((1 to 9).map(_.toString).toSet))
    val share = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(share - 1.0) < 1e-2) // 4-dp rounding slack × ≤9 rows
  }

  // ------------------------------------------------------------------
  // RFM segmentation
  // ------------------------------------------------------------------

  test("rfm: quartile digits are 1-4 and balanced within ntile bounds") {
    val rows = run("cs16_rfm_segments").collect()
    assert(rows.nonEmpty)
    val segs = rows.map(_.getAs[String]("rfm"))
    assert(segs.forall(s => s.length == 3 && s.forall(c => c >= '1' && c <= '4')))
    // each quartile of each dimension holds n/4 (±1) customers
    val n = rows.length
    (0 until 3).foreach { pos =>
      val byQ = segs.groupBy(_.charAt(pos)).view.mapValues(_.size)
      byQ.values.foreach(c => assert(math.abs(c - n / 4.0) <= 1.0))
    }
  }

  // ------------------------------------------------------------------
  // ACF
  // ------------------------------------------------------------------

  test("acf: an alternating series has strongly negative lag-1, positive lag-2") {
    val s = spark
    import s.implicits._
    // direct computation mirroring ts3's shape on a synthetic day table
    val days = (0 until 40)
      .map(i => (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(i)), if (i % 2 == 0) 10.0 else 20.0))
      .toDF("day", "x")
    val mean = days.agg(avg("x").as("mu"))
    val centered = days.crossJoin(broadcast(mean))
    val ss = centered
      .agg(sum((col("x") - col("mu")) * (col("x") - col("mu"))).as("ss"))
    val lags = Seq((1, 1), (2, 2)).toDF("k", "off")
    val acf = centered.crossJoin(broadcast(lags))
      .join(days.select(col("day").as("pday"), col("x").as("px")),
        expr("pday = date_sub(day, off)"))
      .groupBy("k")
      .agg(sum((col("x") - col("mu")) * (col("px") - col("mu"))).as("num"))
      .crossJoin(broadcast(ss))
      .select(col("k"), (col("num") / col("ss")).as("acf"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(acf(1) < -0.8)
    assert(acf(2) > 0.8)
  }

  // ------------------------------------------------------------------
  // Markov transitions
  // ------------------------------------------------------------------

  test("markov: per-prev probabilities sum to ~1") {
    val rows = run("ts4_markov_transitions").collect()
      .map(r => (r.getString(0), r.getAs[Double]("p")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, ps) =>
      assert(math.abs(ps.map(_._2).sum - 1.0) < 1e-2)
    }
  }

  // ------------------------------------------------------------------
  // Components.bfsLevels
  // ------------------------------------------------------------------

  test("bfs: hand graph distances, hop bound, unreachable exclusion") {
    val s = spark
    import s.implicits._
    // path 1-2-3-4-5, branch 2-6; island 10-11; sources {1}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 6L),
      (10L, 11L)).toDF("a", "b")
    val src = Seq(Tuple1(1L)).toDF("s")
    val out = Components.bfsLevels(edges, "a", "b", src, "s", maxRounds = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 2, 6L -> 2, 4L -> 3))
    // hop bound: node 5 (dist 4) and the 10-11 island are absent
  }

  test("bfs: multi-source takes the minimum distance over sources") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val src = Seq(Tuple1(1L), Tuple1(5L)).toDF("s")
    val out = Components.bfsLevels(edges, "a", "b", src, "s", maxRounds = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 0, 5L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
  }

  test("bfs: empty source set returns empty, terminates immediately") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L)).toDF("a", "b")
    val src = Seq.empty[Tuple1[Long]].toDF("s")
    assert(Components.bfsLevels(edges, "a", "b", src, "s", 5).isEmpty)
  }

  // ------------------------------------------------------------------
  // Fifth batch: JSON extract, sliding windows, CUSUM, attribution
  // ------------------------------------------------------------------

  test("json extract: every event's props parses to a k value") {
    val rows = run("f11_json_extract").collect()
    val parsed = rows.map(_.getAs[Long]("n_parsed")).sum
    val total = graft.queries.Tables.t(spark, dir, "events").count()
    assert(parsed == total)
  }

  test("sliding windows: every event lands in exactly two 2h/1h windows") {
    val winTotal = run("st7_sliding_windows").agg(sum("n"))
      .collect()(0).getLong(0)
    val events = graft.queries.Tables.t(spark, dir, "events").count()
    assert(winTotal == 2 * events)
  }

  test("cusum: a planted mean shift is found at the step boundary") {
    val s = spark
    import s.implicits._
    // 20 days at 10/day then 20 days at 30/day -> |CUSUM| peaks at the
    // last low day (index 19)
    val days = (0 until 40).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 3, 1).plusDays(i)),
        if (i < 20) 10.0 else 30.0)
    }.toDF("day", "x")
    val mean = days.agg(avg("x").as("mu"))
    val top = days.crossJoin(broadcast(mean))
      .withColumn("s", sum(col("x") - col("mu")).over(
        org.apache.spark.sql.expressions.Window.orderBy("day")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
      .orderBy(abs(col("s")).desc, col("day"))
      .limit(1).collect()(0)
    assert(top.getDate(0) ==
      java.sql.Date.valueOf(java.time.LocalDate.of(2024, 3, 20)))
    assert(top.getAs[Double]("s") < 0) // low-regime run pulls the cumsum negative
  }

  // ------------------------------------------------------------------
  // Sixth batch: k-core, Adamic-Adar, MoM, Gini, bootstrap
  // ------------------------------------------------------------------

  test("kcore: triangle survives k=2, the tail peels off") {
    val s = spark
    import s.implicits._
    // triangle 1-2-3 with a path tail 3-4-5
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val out = Components.kCore(edges, "a", "b", k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2, 2L -> 2, 3L -> 2))
  }

  test("kcore: k above max degree empties the graph") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    assert(Components.kCore(edges, "a", "b", k = 3, rounds = 2).isEmpty)
  }

  test("adamic-adar: hand-computed score on a shared-hub pair") {
    val rows = run("gr4_adamic_adar").collect()
    assert(rows.nonEmpty)
    // every scored pair has >= 2 common neighbors and a positive score
    rows.foreach { r =>
      assert(r.getAs[Long]("common") >= 2)
      assert(r.getAs[Double]("score") > 0)
    }
  }

  test("gini: degenerate distributions hit the closed-form bounds") {
    val s = spark
    import s.implicits._
    def gini(xs: Seq[Double]): Double = {
      val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
        .toDF("id", "x")
        .withColumn("i", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("x"), col("id")))
          .cast("double"))
      val r = df.agg(count(lit(1)).as("n"), sum(col("i") * col("x")).as("six"),
        sum("x").as("sx")).collect()(0)
      val n = r.getLong(0); val six = r.getDouble(1); val sx = r.getDouble(2)
      2.0 * six / (n * sx) - (n + 1.0) / n
    }
    assert(math.abs(gini(Seq.fill(100)(5.0))) < 1e-9) // perfect equality
    val oneHasAll = gini(Seq.fill(99)(0.0) :+ 100.0)
    assert(math.abs(oneHasAll - 0.99) < 1e-9) // 1 - 1/n
  }

  test("mom: deltas reconcile against the lagged revenue") {
    val rows = run("cs17_mom_contribution").collect()
      .map(r => (r.getDate(0).toString, r.getString(1),
        r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, ms) =>
      val sorted = ms.sortBy(_._1)
      assert(sorted.head._4.isEmpty) // first month has no delta
      sorted.sliding(2).foreach {
        case Array((_, _, prev, _), (_, _, cur, Some(d))) =>
          assert(math.abs(d - BigDecimal(cur - prev)
            .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) < 0.011)
        case _ => ()
      }
    }
  }

  test("bootstrap: resample mass ~ corpus size and means bracket the truth") {
    val rows = run("sa10_poisson_bootstrap").collect()
    assert(rows.length == 32)
    val docs = graft.queries.Tables.t(spark, dir, "documents")
    val n = docs.count().toDouble
    val truth = docs.agg(avg("n_chars")).collect()(0).getDouble(0)
    val means = rows.map(_.getAs[Double]("resample_mean"))
    rows.foreach(r => // Poisson(1): E[Σw] = n, sd ≈ √n
      assert(math.abs(r.getAs[Long]("n_eff") - n) < 6 * math.sqrt(n)))
    // the truth lies inside the resample range, and spread ~ se, not 0
    assert(means.min <= truth && truth <= means.max)
    assert(means.distinct.length > 1)
  }

  // ------------------------------------------------------------------
  // Seventh batch: CDC merge, PIT join, Holt, HLL union
  // ------------------------------------------------------------------

  test("cdc merge: three-verb hand fixture with latest-wins sequencing") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0))
      .toDF("pk", "st", "tp")
    val cdc = Seq(
      (1L, "U", 1L, "A1", 11.0), (1L, "U", 2L, "A2", 12.0), // seq 2 wins
      (2L, "D", 1L, "B", 20.0),
      (4L, "I", 1L, "N", 40.0)
    ).toDF("pk", "op", "seq", "st", "tp")
    val out = LoadOps.cdcMerge(base, cdc, "pk", "seq", "op", Seq("st", "tp"))
      .orderBy("pk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, "A2", 12.0), (3L, "C", 30.0),
      (4L, "N", 40.0)))
  }

  test("cdc merge: an op outside I/U/D fails the batch with a named error") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "A", 10.0)).toDF("pk", "st", "tp")
    val cdc = Seq((1L, "Z", 1L, "A1", 11.0)).toDF("pk", "op", "seq", "st", "tp")
    val e = intercept[Exception] {
      LoadOps.cdcMerge(base, cdc, "pk", "seq", "op", Seq("st", "tp")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("I/U/D") || m.contains("ASSERT")),
      s"expected the op validation to fire, got: ${msgs(e).mkString(" | ")}")
  }

  test("cdc merge: replaying the same batch is idempotent") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "A", 10.0), (2L, "B", 20.0)).toDF("pk", "st", "tp")
    val cdc = Seq((1L, "U", 1L, "A1", 11.0), (2L, "D", 1L, "B", 20.0))
      .toDF("pk", "op", "seq", "st", "tp")
    val once = LoadOps.cdcMerge(base, cdc, "pk", "seq", "op", Seq("st", "tp"))
    val twice = LoadOps.cdcMerge(once, cdc, "pk", "seq", "op", Seq("st", "tp"))
    assert(once.orderBy("pk").collect().toSeq ==
      twice.orderBy("pk").collect().toSeq)
  }

  test("pit join: the native exec and the union+window form agree row-for-row") {
    val a = run("j9_scd2_pit_join").collect().map(_.toString).sorted
    val b = run("j9b_scd2_pit_native").collect().map(_.toString).sorted
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("pit join: every event of a known user matches exactly one interval") {
    val out = run("j9_scd2_pit_join")
    val events = graft.queries.Tables.t(spark, dir, "events")
    // users present in orders (custkey range covers user_id at every SF)
    val expected = events.join(
      graft.queries.Tables.t(spark, dir, "orders")
        .select(col("o_custkey").as("user_id")).distinct(), "user_id")
      .count()
    assert(out.count() == expected)
    assert(out.groupBy("event_id").count()
      .filter(col("count") > 1).isEmpty) // one dimension row per event
  }

  test("holt: constant series has flat level and zero trend") {
    val s = spark
    import s.implicits._
    val days = (0 until 20).map(i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 5, 1).plusDays(i)),
        42.0)).toDF("day", "x")
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val out = days.withColumn("vals", collect_list(col("x")).over(w))
      .select(expr("""
        aggregate(vals, named_struct('l', 0.0d, 'b', 0.0d, 'i', 0),
          (acc, v) -> CASE WHEN acc.i = 0
            THEN named_struct('l', v, 'b', 0.0d, 'i', 1)
            ELSE named_struct('l', 0.5d * v + 0.5d * (acc.l + acc.b),
              'b', 0.125d * (v - acc.l) + 0.875d * acc.b,
              'i', acc.i + 1) END) AS st"""))
      .select(col("st.l"), col("st.b")).collect()
    out.foreach { r =>
      assert(math.abs(r.getDouble(0) - 42.0) < 1e-9)
      assert(math.abs(r.getDouble(1)) < 1e-9)
    }
  }

  test("join ivm: the four delta-joins partition the full join exactly") {
    val s = spark
    import s.implicits._
    // A/dA on the fact side, B/dB on the dim side, keys overlapping all
    // four quadrants
    val a = Seq((1L, 10L), (2L, 20L)).toDF("ok", "ck")
    val da = Seq((3L, 10L), (4L, 30L)).toDF("ok", "ck")
    val b = Seq((10L, "x")).toDF("ck", "seg")
    val db = Seq((20L, "y"), (30L, "z")).toDF("ck", "seg")
    def jn(x: org.apache.spark.sql.DataFrame,
           y: org.apache.spark.sql.DataFrame) =
      x.join(y, "ck").select("ok", "ck", "seg")
    val inc = jn(a, b).unionByName(jn(da, b)).unionByName(jn(a, db))
      .unionByName(jn(da, db)).orderBy("ok").collect().toSeq
    val full = jn(a.unionByName(da), b.unionByName(db))
      .orderBy("ok").collect().toSeq
    assert(inc == full)
    assert(inc.size == 4) // every quadrant contributed
  }

  test("session paths: frequent paths are short, typed, and truly repeated") {
    val rows = run("w10_session_paths").collect()
    assert(rows.nonEmpty)
    val types = Set("click", "view", "purchase", "signup", "error")
    rows.foreach { r =>
      val parts = r.getString(0).split(">")
      assert(parts.length <= 5 && parts.forall(types.contains))
      assert(r.getAs[Long]("n_sessions") >= 2)
    }
  }

  // ------------------------------------------------------------------
  // Ninth batch: date dim, seasonality strength, Hilbert layout
  // ------------------------------------------------------------------

  test("date dim: continuous span, java-verified weekday arithmetic") {
    val rows = run("d11_date_dim").collect()
    assert(rows.nonEmpty)
    val days = rows.map(_.getDate(0).toLocalDate)
    days.sliding(2).foreach {
      case Array(a, b) => assert(b == a.plusDays(1))
      case _ => ()
    }
    rows.take(400).foreach { r =>
      val d = r.getDate(0).toLocalDate
      assert(r.getAs[Int]("iso_dow") == d.getDayOfWeek.getValue)
      assert(r.getAs[Boolean]("is_weekday") == (d.getDayOfWeek.getValue <= 5))
      assert(r.getAs[Int]("days_in_month") == d.lengthOfMonth)
    }
  }

  test("seasonality strength: bounded above by 1, removing a real baseline helps") {
    val r = run("cs20_seasonality_strength").collect()
    assert(r.length == 1)
    val strength = r(0).getAs[Double]("strength")
    assert(strength <= 1.0 + 1e-9)
  }

  /** Reference xy2d (Wikipedia's Hilbert-curve bit walk). */
  private def xy2d(n: Int, x0: Int, y0: Int): Long = {
    var (x, y, d) = (x0, y0, 0L); var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("hilbert: the SQL fold matches the JVM reference, and is a bijection") {
    val s = spark
    import s.implicits._
    val pts = (for (x <- 0 until 256; y <- 0 until 256) yield (x, y))
      .toDF("x", "y")
    val got = pts.withColumn("h", ZOrder.hilbertKey("x", "y"))
    // spot parity on a deterministic sample
    got.filter(col("x") % 37 === 0 && col("y") % 41 === 0).collect()
      .foreach { r =>
        assert(r.getAs[Long]("h") ==
          xy2d(256, r.getAs[Int]("x"), r.getAs[Int]("y")))
      }
    // full-grid bijection onto [0, 65535]
    val stats = got.agg(countDistinct("h").as("d"), min("h").as("mn"),
      max("h").as("mx")).collect()(0)
    assert(stats.getLong(0) == 65536L)
    assert(stats.getLong(1) == 0L && stats.getLong(2) == 65535L)
  }

  test("hilbert: successive indices are always grid-adjacent (locality)") {
    val s = spark
    import s.implicits._
    val pts = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y))
      .toDF("x", "y")
    // invert on a 64-point stripe of the 256-curve: order by h, check
    // neighbors in curve order differ by exactly one grid step
    val ordered = pts.withColumn("h", ZOrder.hilbertKey("x", "y"))
      .orderBy("h").collect()
      .map(r => (r.getAs[Int]("x"), r.getAs[Int]("y"), r.getAs[Long]("h")))
    ordered.sliding(2).foreach {
      case Array((x1, y1, h1), (x2, y2, h2)) if h2 == h1 + 1 =>
        assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
          s"($x1,$y1)->($x2,$y2) not adjacent at h=$h1")
      case _ => () // curve leaves the 64x64 window: no adjacency claim
    }
  }

  test("knn: votes are bounded by k, flags agree, neighbors exclude probes") {
    val rows = run("ml5_knn_classifier").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val votes = r.getAs[Long]("votes")
      assert(votes >= 1 && votes <= 10)
      assert(r.getAs[Boolean]("correct") ==
        (r.getAs[Int]("predicted_label") == r.getAs[Int]("true_label")))
      assert(r.getAs[Long]("qid") % 50 == 0)
    }
  }

  test("triples: downward closure — every member pair of a frequent triple is frequent") {
    val triples = run("mb2_frequent_triples").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(triples.nonEmpty)
    // rebuild the frequent-pair set the way mb1 does
    val pairs = run("mb1_association_rules").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    triples.foreach { case (i1, i2, i3, co) =>
      assert(co >= 2 && i1 < i2 && i2 < i3)
      assert(pairs((i1, i2)) && pairs((i1, i3)) && pairs((i2, i3)))
    }
  }

  test("grouping sets: the grand total reconciles each single-column level") {
    val rows = run("a13_grouping_sets").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val total = rows.filter(_._1 == 3).map(_._4).sum
    val byPriority = rows.filter(_._1 == 1).map(_._4).sum
    val byStatus = rows.filter(_._1 == 2).map(_._4).sum
    assert(total > 0 && byPriority == total && byStatus == total)
  }

  test("modularity: the hub communities score as real structure") {
    val r = run("gr5_modularity").collect()
    assert(r.length == 1)
    val q = r(0).getAs[Double]("modularity")
    assert(q > 0.2 && q <= 1.0) // hub fixture has genuine communities
    assert(r(0).getAs[Long]("n_communities") > 1)
  }

  test("hll union: the sketch estimate lands inside the band") {
    val r = run("ks4_hll_union_audit").collect()
    assert(r.length == 1)
    assert(r(0).getAs[Boolean]("within_band"))
  }

  test("attribution: touches are strictly prior, marketing-typed, in-window") {
    val out = run("at1_last_touch_attribution")
    val ev = graft.queries.Tables.t(spark, dir, "events")
      .select(col("event_id").as("touch_id"), col("ts").as("touch_ts"),
        col("event_type").as("t_type"))
    val joined = out.filter(col("touch_id").isNotNull)
      .join(ev, "touch_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(Set("click", "view").contains(r.getAs[String]("t_type")))
      val pts = r.getAs[java.sql.Timestamp]("purchase_ts").getTime
      val tts = r.getAs[java.sql.Timestamp]("touch_ts").getTime
      assert(tts < pts || (tts == pts &&
        r.getAs[Long]("touch_id") < r.getAs[Long]("purchase_id")))
      assert(pts - tts <= 7L * 24 * 3600 * 1000)
    }
  }
}
