package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkEntry, TestSpark}

/** Invariants for the round-12 third wave — RANGE-frame rolling revenue,
  * rolling distinct actives, Theil–Sen slopes, moment profiling, basket
  * co-occurrence, neighbor Jaccard, and the exact prefix-filter join —
  * the properties that must hold at any scale, complementing the DuckDB
  * hash grade. */
class TrendOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  // ------------------------------------------------------------------
  // Dedup.prefixFilterJaccardJoin — the lossless-block theorem
  // ------------------------------------------------------------------

  test("prefixFilterJoin: exactly the brute-force pair set on a fixture") {
    val s = spark
    import s.implicits._
    // overlapping word sequences with controlled jaccard, plus noise docs
    val base = (0 until 12).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base),                                        // 10 shingles
      (2L, base + " w12"),                               // superset: jac 10/11
      (3L, (3 until 15).map(i => s"w$i").mkString(" ")), // shifted overlap
      (4L, "alpha beta gamma delta epsilon zeta"),
      (5L, "alpha beta gamma delta epsilon eta"),        // shares a 3-prefix
      (6L, "completely different words here entirely"),
      (7L, "one two"),                                   // below shingle size
      (8L, base)                                         // exact dup of 1
    ).toDF("doc_id", "text")
    val got = Dedup.prefixFilterJaccardJoin(docs, "doc_id", "text", 2, 5)
      .select("doc_a", "doc_b", "shared", "union_sz")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // brute force over ALL pairs (no blocking) at the same threshold
    val sh = Dedup.shingleSet(docs, "doc_id", "text")
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val ids = cnt.select(col("doc_id").as("doc_a"))
      .crossJoin(cnt.select(col("doc_id").as("doc_b")))
      .filter(col("doc_a") < col("doc_b"))
    val want = Dedup.verifiedPairs(ids, sh, "doc_id", "doc_a", "doc_b", 2, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    assert(want.contains((1L, 8L, 10L, 10L))) // the exact dup survives intact
    assert(want.exists { case (a, b, _, _) => a == 1L && b == 2L })
  }

  test("prefixFilterJoin: every emitted pair clears the threshold exactly") {
    val out = run("dd22_prefix_filter_join").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val shared = r.getAs[Long]("shared"); val u = r.getAs[Long]("union_sz")
      assert(shared * 5 >= u * 2, s"pair below threshold: $r")
      assert(shared <= u)
    }
  }

  // ------------------------------------------------------------------
  // ts9 — Theil–Sen
  // ------------------------------------------------------------------

  test("theil-sen: robust to an outlier that drags OLS") {
    val s = spark
    import s.implicits._
    // y = x on days 0..8, except day 8 spikes to 100 (an endpoint spike —
    // a center spike sits on the x-mean and leaves OLS slope untouched).
    // The pairwise-slope median stays exactly 1.0; OLS is pulled far off.
    val pts = (0 to 8).map(d => (d, if (d == 8) 100.0 else d.toDouble))
    val df = pts.toDF("d", "n")
    val a = df.select(col("d").as("d1"), col("n").as("n1"))
    val b = df.select(col("d").as("d2"), col("n").as("n2"))
    val slopes = a.crossJoin(b).filter(col("d1") < col("d2"))
      .select(((col("n2") - col("n1")) / (col("d2") - col("d1"))).as("s"))
      .collect().map(_.getDouble(0)).sorted
    val m = slopes.length
    val median = (slopes((m - 1) / 2) + slopes(m / 2)) / 2.0
    assert(median == 1.0)
    val ols = {
      val n = pts.length.toDouble
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }
    assert(math.abs(ols - 1.0) > 1.0) // the outlier wrecks OLS, not Theil–Sen
  }

  test("ts9: one row per event type, pair count = days*(days-1)/2") {
    val s = spark
    import graft.queries.Tables.t
    val days = t(s, dir, "events")
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .groupBy("event_type").agg(countDistinct("day").as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = run("ts9_theil_sen").collect()
    assert(out.length == days.size)
    out.foreach { r =>
      val nd = days(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_pairs") == nd * (nd - 1) / 2)
    }
  }

  // ------------------------------------------------------------------
  // w13 — RANGE frame
  // ------------------------------------------------------------------

  test("w13: RANGE frame honors calendar gaps (hand fixture)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // days 0, 1, 5: the 3-day range at day 5 must NOT see days 0/1,
    // where a 3-ROW frame would sum all three.
    val d = Seq((0, 10L), (1, 20L), (5, 40L)).toDF("day", "cents")
    val range = d.withColumn("rc", sum("cents").over(
        Window.orderBy("day").rangeBetween(-3, 0)))
      .orderBy("day").collect().map(_.getAs[Long]("rc")).toSeq
    assert(range == Seq(10L, 30L, 40L))
    val rows = d.withColumn("rc", sum("cents").over(
        Window.orderBy("day").rowsBetween(-3, 0)))
      .orderBy("day").collect().map(_.getAs[Long]("rc")).toSeq
    assert(rows == Seq(10L, 30L, 70L)) // proves the two frames differ here
  }

  test("w13: rolling revenue >= daily revenue, equality only at gaps") {
    val out = run("w13_range_rolling_revenue").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("roll_rev") >= r.getAs[Double]("rev") - 1e-9)
    }
  }

  // ------------------------------------------------------------------
  // w14 — rolling distinct
  // ------------------------------------------------------------------

  test("w14: wau7 bounds — at least dau, at most 7-day dau sum, exact on a fixture") {
    val s = spark
    import s.implicits._
    import java.sql.Timestamp
    val ts = (d: Int, u: Long) =>
      (1L, Timestamp.valueOf(f"2024-01-${d}%02d 10:00:00"), u)
    // u1 active days 1,8; u2 active days 1..3; u3 active day 8 only
    val ev = Seq(ts(1, 1), ts(8, 1), ts(1, 2), ts(2, 2), ts(3, 2), ts(8, 3))
      .toDF("event_id", "ts", "user_id")
    val ud = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val days = ud.select("day").distinct()
    val wau = ud.select(col("user_id"),
        explode(expr("sequence(day, date_add(day, 6))")).as("day"))
      .join(days, Seq("day"), "left_semi")
      .groupBy("day").agg(countDistinct("user_id").as("wau7"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // day 2: u1 (active day1) + u2 -> 2; day 8: u1(day8)+u2(days2,3 in window)+u3 -> 3
    assert(wau("2024-01-02") == 2L)
    assert(wau("2024-01-03") == 2L)
    assert(wau("2024-01-08") == 3L)
    val out = run("w14_rolling_distinct_users").collect()
    out.foreach(r =>
      assert(r.getAs[Long]("wau7") >= r.getAs[Long]("dau")))
  }

  // ------------------------------------------------------------------
  // cs22 — moments
  // ------------------------------------------------------------------

  test("cs22: symmetric fixture has zero skew and known kurtosis") {
    val s = spark
    import s.implicits._
    // integer-symmetric values around 30: skew exactly 0; for a two-point
    // distribution {10,50} kurtosis is -2 (excess)
    val df = Seq(10.0, 50.0, 10.0, 50.0).toDF("o_totalprice")
      .withColumn("o_orderpriority", lit("X"))
    val q = floor(col("o_totalprice")).cast("long")
    val r = df.groupBy("o_orderpriority").agg(
        count(lit(1)).as("n"), sum(q).cast("double").as("s1"),
        sum((q * q).cast("decimal(38,0)")).cast("double").as("s2"),
        sum((q * q * q).cast("decimal(38,0)")).cast("double").as("s3"),
        sum((q * q).cast("decimal(38,0)") * (q * q)).cast("double").as("s4"))
      .withColumn("mu", col("s1") / col("n"))
      .withColumn("m2", col("s2") / col("n") - col("mu") * col("mu"))
      .withColumn("m3", col("s3") / col("n")
        - lit(3.0) * col("mu") * (col("s2") / col("n"))
        + lit(2.0) * col("mu") * col("mu") * col("mu"))
      .withColumn("m4", col("s4") / col("n")
        - lit(4.0) * col("mu") * (col("s3") / col("n"))
        + lit(6.0) * col("mu") * col("mu") * (col("s2") / col("n"))
        - lit(3.0) * col("mu") * col("mu") * col("mu") * col("mu"))
      .select(
        (col("m3") / (col("m2") * sqrt(col("m2")))).as("skew"),
        (col("m4") / (col("m2") * col("m2")) - 3.0).as("kurt"))
      .collect().head
    assert(r.getDouble(0) == 0.0)
    assert(r.getDouble(1) == -2.0)
  }

  test("cs22: real data — every group profiled, m2 positive via finite skew") {
    val out = run("cs22_moment_skewness").collect()
    assert(out.length >= 2)
    out.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("skewness")))
      assert(!r.getAs[Double]("skewness").isNaN)
      assert(!r.getAs[Double]("excess_kurtosis").isNaN)
    }
  }

  // ------------------------------------------------------------------
  // mb3 — co-occurrence cosine
  // ------------------------------------------------------------------

  test("mb3: cosine in (0,1], support bounded by item counts") {
    val s = spark
    import graft.queries.Tables.t
    val b = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val ic = b.groupBy("p").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = run("mb3_item_cooccurrence").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val pa = r.getAs[Long]("pa"); val pb = r.getAs[Long]("pb")
      val cij = r.getAs[Long]("cij"); val cos = r.getAs[Double]("cosine")
      assert(cos > 0.0 && cos <= 1.0 + 1e-12)
      assert(cij <= math.min(ic(pa), ic(pb)))
      assert(pa < pb)
    }
  }

  // ------------------------------------------------------------------
  // gr9 — neighbor jaccard
  // ------------------------------------------------------------------

  test("gr9: scores in (0,1], pairs ordered, common >= 2") {
    val out = run("gr9_neighbor_jaccard").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("pa") < r.getAs[Long]("pb"))
      assert(r.getAs[Long]("common") >= 2)
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0)
    }
  }

  // ------------------------------------------------------------------
  // wave 4: w15 / ts10 / gr10 / dd23
  // ------------------------------------------------------------------

  test("trianglesPerNode: K4 credits every vertex with 3 triangles") {
    val s = spark
    import s.implicits._
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    val got = Triangles.trianglesPerNode(k4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // apex counting still sums to the global count: K4 has 4 triangles
    val apex = Triangles.trianglesPerApex(k4)
      .agg(sum("n_tri")).collect().head.getLong(0)
    assert(apex == 4L)
  }

  test("gr10: coefficients in [0,1]; triangle bound deg*(deg-1)/2") {
    val out = run("gr10_clustering_coefficient").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val cc = r.getAs[Double]("cc"); val d = r.getAs[Long]("deg")
      assert(cc >= 0.0 && cc <= 1.0 + 1e-9)
      assert(r.getAs[Long]("n_tri") <= d * (d - 1) / 2)
    }
  }

  test("w15: sketch stays in band at fixture scale (HLL exact on small sets)") {
    val out = run("w15_rolling_hll_wau").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Boolean]("within_band")))
  }

  test("ts10: an exactly 7-periodic series backtests to zero error") {
    val s = spark
    import s.implicits._
    val d = (0 until 28).map(i => ("a", i, (i % 7 + 1).toLong)).toDF("event_type", "d", "n")
    val f = d.select(col("event_type"), (col("d") + 7).as("d"), col("n").as("f"))
    val j = d.join(f, Seq("event_type", "d"))
      .agg(sum(abs(col("n") - col("f"))).as("sae"),
        sum(floor(lit(2.0e9) * abs(col("n") - col("f")) /
          (col("n") + col("f"))).cast("long")).as("sq"))
      .collect().head
    assert(j.getLong(0) == 0L && j.getLong(1) == 0L)
  }

  test("dd23: metrics bounded and consistent with their counts") {
    val out = run("dd23_blocking_quality").collect()
    assert(out.length == 1)
    val r = out.head
    val nt = r.getAs[Long]("n_true"); val nc = r.getAs[Long]("n_cand")
    val nf = r.getAs[Long]("n_found")
    assert(nf <= math.min(nt, nc))
    val pc = r.getAs[Double]("pair_completeness")
    val rr = r.getAs[Double]("reduction_ratio")
    assert(pc >= 0.0 && pc <= 1.0)
    assert(rr >= 0.0 && rr <= 1.0)
  }

  // ------------------------------------------------------------------
  // wave 5: gr11 / j12 / k17 / ix4
  // ------------------------------------------------------------------

  test("gr11: star graph is perfectly disassortative (r = -1)") {
    val s = spark
    import s.implicits._
    val raw = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("a", "b")
    val sym = raw.unionByName(raw.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("z")).agg(count(lit(1)).as("d"))
    val r = sym
      .join(deg.select(col("z").as("a"), col("d").as("x")), "a")
      .join(deg.select(col("z").as("b"), col("d").as("y")), "b")
      .agg(count(lit(1)).as("n"),
        sum("x").cast("double").as("sx"), sum("y").cast("double").as("sy"),
        sum(col("x") * col("y")).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("y") * col("y")).cast("double").as("syy"))
      .select(((col("n") * col("sxy") - col("sx") * col("sy")) /
        (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
         sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("r"))
      .collect().head.getDouble(0)
    assert(math.abs(r - (-1.0)) < 1e-12)
    val out = run("gr11_degree_assortativity").collect()
    assert(out.length == 1)
    val a = out.head.getAs[Double]("assortativity")
    assert(a >= -1.0 && a <= 1.0)
  }

  test("j12: conversion window semantics on a hand fixture") {
    val s = spark
    import s.implicits._
    import java.sql.Timestamp
    import org.apache.spark.sql.expressions.Window
    def row(id: Long, u: Long, d: Int, tp: String) =
      (id, u, Timestamp.valueOf(f"2024-01-${d}%02d 10:00:00"), tp)
    val ev = Seq(
      row(1, 1, 1, "view"), row(2, 1, 3, "purchase"),   // converts (2 days)
      row(3, 2, 1, "view"), row(4, 2, 20, "purchase"),  // outside 7 days
      row(5, 3, 5, "purchase"), row(6, 3, 6, "view"),   // purchase BEFORE view
      row(7, 4, 1, "view")                              // never purchases
    ).toDF("event_id", "user_id", "ts", "event_type")
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    val conv = ev
      .withColumn("np",
        min(when(col("event_type") === "purchase", col("ts"))).over(w))
      .filter(col("event_type") === "view")
      .select(col("user_id"),
        (col("np").isNotNull &&
          col("np") <= col("ts") + expr("INTERVAL 7 DAYS")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(conv == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
  }

  test("k17: incremental two-batch merge lands on the one-shot state") {
    val s = spark
    val inc = run("k17_cdc_merge_incremental")
    val one = run("k14_cdc_merge")
    assert(inc.count() == one.count())
    assert(inc.exceptAll(one).isEmpty && one.exceptAll(inc).isEmpty)
  }

  test("ix4: smoothing keeps every score finite; term presence outranks absence") {
    val out = run("ix4_lm_retrieval").collect()
    assert(out.length == 10)
    out.foreach(r => assert(!r.getAs[Double]("score").isNaN))
    // log-likelihoods of multi-term queries are negative by construction
    assert(out.forall(_.getAs[Double]("score") < 0.0))
  }

  // ------------------------------------------------------------------
  // wave 6: sa12 / ol3 / emb2 / w16
  // ------------------------------------------------------------------

  test("sa12: split partitions events; overlap bounded by both sides") {
    val s = spark
    import graft.queries.Tables.t
    val total = t(s, dir, "events").count()
    val r = run("sa12_temporal_split_embargo").collect().head
    assert(r.getAs[Long]("n_train_events") + r.getAs[Long]("n_test_events") +
      r.getAs[Long]("n_embargoed_events") == total)
    assert(r.getAs[Long]("n_overlap_users") <=
      math.min(r.getAs[Long]("n_train_users"), r.getAs[Long]("n_test_users")))
  }

  test("ol3: a planted spike is repaired to the window median") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // constant 10/day except a spike of 100 on day 5 of 0..9
    val d = (0 until 10).map(i => ("a", i, if (i == 5) 100L else 10L))
      .toDF("event_type", "day", "n")
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    val out = d.withColumn("win", sort_array(collect_list(col("n")).over(w)))
      .filter(size(col("win")) === 7)
      .withColumn("med", element_at(col("win"), 4))
      .withColumn("mad", element_at(sort_array(transform(col("win"),
        v => abs(v - element_at(col("win"), 4)))), 4))
      .withColumn("out", abs(col("n") - col("med")) * 10000 > col("mad") * 44478)
      .select(col("day"),
        when(col("out"), col("med")).otherwise(col("n")).as("rep"),
        col("out"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(5) == (10L, true))  // spike flagged, repaired to median
    assert(out(4) == (10L, false)) // neighbors untouched
    // MAD = 0 there: any deviation flags, which is correct for a constant series
  }

  test("emb2: bins bounded by cosine range; pair mass = 20*(n-1)") {
    val s = spark
    import graft.queries.Tables.t
    val n = t(s, dir, "embeddings").count()
    val out = run("emb2_cosine_histogram").collect()
    assert(out.map(_.getAs[Long]("n_pairs")).sum == 20 * (n - 1))
    out.foreach { r =>
      val b = r.getAs[Long]("bin")
      assert(b >= -20 && b <= 20)
    }
  }

  test("w16: deciles balanced within 1 and monotone in char range") {
    val out = run("w16_quantile_features").collect()
      .groupBy(_.getAs[String]("source"))
    out.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("decile"))
      assert(sorted.map(_.getAs[Long]("decile")).toSeq == (0L until sorted.length))
      val sizes = sorted.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1)
      // hi of decile k <= lo of decile k+1 never violated (total order)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("hi_chars") <= b.getAs[Long]("lo_chars"))
        case _ =>
      }
    }
  }

  // ------------------------------------------------------------------
  // wave 7: ml9 / k18 / pipe11
  // ------------------------------------------------------------------

  test("ml9: midrank AUC — perfect separation 1.0, reversed 0.0, ties 0.5") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    def auc(rows: Seq[(Long, Boolean)]): Double = {
      val g = rows.toDF("score", "pos")
        .groupBy("score").agg(count(lit(1)).as("c"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("cp"))
      val w = Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
      g.withColumn("cb", coalesce(sum(col("c")).over(w), lit(0L)))
        .agg(sum(col("cp")).as("np"), sum(col("c") - col("cp")).as("nn"),
          sum(col("cp") * (lit(2) * col("cb") + col("c") + 1)).as("r2"))
        .select(((col("r2") - col("np") * (col("np") + 1)) /
          (lit(2.0) * col("np") * col("nn"))).as("auc"))
        .collect().head.getDouble(0)
    }
    assert(auc(Seq((1L, false), (2L, false), (3L, true), (4L, true))) == 1.0)
    assert(auc(Seq((1L, true), (2L, true), (3L, false), (4L, false))) == 0.0)
    // every score tied -> midranks give exactly 0.5
    assert(auc(Seq((5L, true), (5L, false), (5L, true), (5L, false))) == 0.5)
    val r = run("ml9_rank_auc").collect().head
    val a = r.getAs[Double]("auc")
    assert(a >= 0.0 && a <= 1.0)
  }

  test("k18: snapshot counts reconcile; drifts bounded by 1") {
    val s = spark
    import graft.queries.Tables.t
    val total = t(s, dir, "orders").count()
    val out = run("k18_column_drift_audit").collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n_old") + r.getAs[Long]("n_new") == total)
      assert(r.getAs[Long]("distinct_old") <= r.getAs[Long]("n_old"))
      assert(r.getAs[Double]("null_rate_drift") <= 1.0)
      assert(r.getAs[Double]("cardinality_drift") <= 1.0)
    }
  }

  test("pipe11: encoding is a train-side convex blend — inside the train range") {
    val s = spark
    import graft.queries.Tables.t
    // the smoothed encoding must lie between the global train mean and the
    // per-category train mean (convexity of (s + m*prior)/(n + m))
    val o = t(s, dir, "orders").select(col("o_orderpriority"),
      to_date(col("o_orderdate")).as("d"),
      floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .filter(col("d") < lit("1998-01-01"))
    val prior = o.agg((sum("cents") / count(lit(1))).as("g"))
      .collect().head.getDouble(0) / 100.0
    val cat = o.groupBy("o_orderpriority")
      .agg((sum("cents") / count(lit(1))).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1) / 100.0).toMap
    val out = run("pipe11_temporal_target_encoding").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val enc = r.getAs[Double]("encoded_usd")
      val m = cat(r.getAs[String]("o_orderpriority"))
      val lo = math.min(m, prior) - 0.01; val hi = math.max(m, prior) + 0.01
      assert(enc >= lo && enc <= hi, s"encoding outside convex range: $r")
    }
  }

  // ------------------------------------------------------------------
  // wave 8: k19
  // ------------------------------------------------------------------

  test("k19: matches invariant across layouts; z-order prunes BOTH predicates") {
    // sf0.01: the x domain at sf0.001 is 15 values, too narrow for ANY
    // 16-file layout to carve disjoint x envelopes — pruning only becomes
    // observable once the domain outgrows the file count
    val out = SparkEntry.queries("k19_skipping_audit")(
      spark, "/root/testdata/sf0.01").collect()
    assert(out.length == 6)
    // ground truth (rows_matching) cannot depend on physical layout
    out.groupBy(_.getAs[String]("predicate")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rows_matching")).distinct.length == 1)
    }
    out.foreach { r =>
      assert(r.getAs[Long]("files_scanned") <= r.getAs[Long]("files_total"))
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matching"))
    }
    // the layout claim: the interleaved key prunes both dimensions
    val z = out.filter(_.getAs[String]("layout") == "3_zorder")
    z.foreach(r =>
      assert(r.getAs[Long]("files_scanned") < r.getAs[Long]("files_total")))
  }

  // ------------------------------------------------------------------
  // wave 9: sa13 / k20 / w17
  // ------------------------------------------------------------------

  test("sa13: folds partition users and events exactly") {
    val s = spark
    import graft.queries.Tables.t
    val ev = t(s, dir, "events")
    val out = run("sa13_group_kfold").collect()
    assert(out.map(_.getAs[Long]("n_events")).sum == ev.count())
    // group folding: a user sits in exactly one fold, so per-fold user
    // counts sum to the corpus-wide distinct count
    assert(out.map(_.getAs[Long]("n_users")).sum ==
      ev.select("user_id").distinct().count())
  }

  test("k20: per-file sketch merge is lossless for the global top-k") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val k = 8
    val vals = (1 to 200).map(i => ((i % 16).toLong, (i * 37 % 101).toLong))
      .toDF("file_id", "key").distinct()
      .withColumn("frac", Sampling.hashFraction(col("key").cast("string")))
    val global = vals.select("frac").distinct()
      .orderBy("frac").limit(k).collect().map(_.getDouble(0)).toSeq
    val perFile = vals.withColumn("rn", row_number().over(
        Window.partitionBy("file_id").orderBy(col("frac"), col("key"))))
      .filter(col("rn") <= k)
    val merged = perFile.select("frac").distinct()
      .orderBy("frac").limit(k).collect().map(_.getDouble(0)).toSeq
    assert(merged == global) // each global minimum survives its file's cut
  }

  test("w17: the later knowledge date sees at least as many corrections") {
    val out = run("w17_bitemporal_asof").collect()
      .map(r => r.getAs[String]("query_point") ->
        (r.getAs[Long]("n_keys"), r.getAs[Long]("n_corrected"),
          r.getAs[Long]("sum_cents"))).toMap
    val (k1, c1, s1) = out("1_known_1998-07-05")
    val (k2, c2, s2) = out("2_known_1998-12-31")
    assert(k1 == k2) // same effective date -> same key universe
    assert(c2 >= c1) // corrections only become visible, never invisible
    // every newly visible correction moves the checksum by exactly +1000
    assert(s2 - s1 == (c2 - c1) * 1000)
  }

  // ------------------------------------------------------------------
  // wave 10: ml10 / k21 / tx18
  // ------------------------------------------------------------------

  test("ml10: query's stump equals the brute-force best split") {
    val s = spark
    import graft.queries.Tables.t
    val per = t(s, dir, "documents")
      .select(floor(col("n_chars") / 50).cast("long").as("b"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
      .groupBy("b").agg(count(lit(1)).as("n"), sum("y").as("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val nt = per.map(_._2).sum; val pt = per.map(_._3).sum
    // brute-force: every prefix cut with a non-empty right side, ranked by
    // the query's integer-exact key floor(2e9·icost/(nl·nr)) — computed
    // here via direct BigInt division, which independently validates the
    // query's two-step q·K + (r·K) div D int64 formulation
    val best = (1 until per.length).map { k =>
      val pre = per.take(k)
      val nl = pre.map(_._2).sum; val pl = pre.map(_._3).sum
      val (nr, pr) = (nt - nl, pt - pl)
      val icost = BigInt(pl) * (nl - pl) * nr + BigInt(pr) * (nr - pr) * nl
      (icost * 2000000000L / (BigInt(nl) * nr), pre.last._1)
    }.minBy(identity)
    val got = run("ml10_decision_stump").collect().head
    assert(got.getAs[Long]("split_below_chars") == (best._2 + 1) * 50)
    assert(got.getAs[Long]("n_left") + got.getAs[Long]("n_right") == nt)
    assert(got.getAs[Long]("split_gini_e6") <= got.getAs[Long]("base_gini_e6"))
  }

  test("k21: risk bands partition the customer table exactly") {
    val s = spark
    import graft.queries.Tables.t
    val cust = t(s, dir, "customer")
    val out = run("k21_k_anonymity").collect()
    assert(out.map(_.getAs[Long]("n_rows")).sum == cust.count())
    val nClasses = cust.select(col("c_nationkey"), col("c_mktsegment"),
      floor(col("c_acctbal") / 1000)).distinct().count()
    assert(out.map(_.getAs[Long]("n_classes")).sum == nClasses)
    // a class in the size-s band contributes between s*1 and s*rows
    out.foreach { r =>
      assert(r.getAs[Long]("n_rows") >= r.getAs[Long]("n_classes"))
    }
  }

  test("tx18: top collocation's counts match direct recomputation") {
    val s = spark
    import s.implicits._
    import graft.queries.Tables.t
    val out = run("tx18_pmi_collocations").collect()
    assert(out.nonEmpty)
    // lift is non-increasing down the report
    val lifts = out.map(_.getAs[Long]("lift_e4")).toSeq
    assert(lifts == lifts.sorted.reverse)
    val top = out.head
    val (w1, w2) = (top.getAs[String]("w1"), top.getAs[String]("w2"))
    val toks = t(s, dir, "documents")
      .select(split(col("text"), " ").as("w")).cache()
    val c1 = toks.select(explode(col("w")).as("t"))
      .filter(col("t") === w1).count()
    val c12 = toks.select(explode(
      when(size(col("w")) >= 2, transform(sequence(lit(1), size(col("w")) - 1),
        i => concat_ws(" ", element_at(col("w"), i),
          element_at(col("w"), i + 1))))
        .otherwise(array().cast("array<string>"))).as("bg"))
      .filter(col("bg") === s"$w1 $w2").count()
    toks.unpersist()
    assert(top.getAs[Long]("c1") == c1)
    assert(top.getAs[Long]("c12") == c12 && c12 >= 5)
  }

  // ------------------------------------------------------------------
  // wave 11: att1 / k22 / k23
  // ------------------------------------------------------------------

  test("att1: channels partition purchases; revenue reconciles exactly") {
    val s = spark
    import graft.queries.Tables.t
    val ev = t(s, dir, "events")
    val out = run("att1_last_touch_attribution").collect()
    val purchases = ev.filter(col("event_type") === "purchase")
    assert(out.map(_.getAs[Long]("n_purchases")).sum == purchases.count())
    val cents = purchases
      .agg(sum(floor(col("value") * 100).cast("long"))).collect()(0).getLong(0)
    assert(out.map(_.getAs[Long]("revenue_cents")).sum == cents)
    // only touch types and 'direct' may ever be credited
    assert(out.map(_.getAs[String]("channel")).toSet
      .subsetOf(Set("view", "click", "direct")))
  }

  test("att1: hand fixture — recency, lookback expiry, and direct") {
    val s = spark
    import s.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    def at(daysBefore: Double) = new java.sql.Timestamp(
      base.getTime - (daysBefore * 86400000L).toLong)
    // u1: click then view then purchase -> view (most recent touch wins)
    // u2: touch 8 days before purchase -> expired -> direct
    // u3: purchase with no prior events -> direct
    val ev = Seq(
      (1L, at(2.0), 101L, "click", 0.0),
      (1L, at(1.0), 102L, "view", 0.0),
      (1L, at(0.0), 103L, "purchase", 10.0),
      (2L, at(8.0), 201L, "view", 0.0),
      (2L, at(0.0), 202L, "purchase", 20.0),
      (3L, at(0.0), 301L, "purchase", 40.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val ep = col("ts").cast("long")
    val touch = col("event_type").isin("view", "click")
    val packed = when(touch, concat_ws("|",
      lpad(ep.cast("string"), 10, "0"),
      lpad(col("event_id").cast("string"), 8, "0"), col("event_type")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val got = ev
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"), ep.as("ep"), packed.as("pk"))
      .withColumn("last_touch", max(col("pk")).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        when(col("last_touch").isNotNull &&
          col("ep") - substring(col("last_touch"), 1, 10).cast("long")
            <= 604800,
          substring(col("last_touch"), 21, 10)).otherwise("direct")
          .as("channel"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "view", 2L -> "direct", 3L -> "direct"))
  }

  test("k22: all four encodings reported; the 16 files have one winner each") {
    val out = run("k22_encoding_audit").collect()
    assert(out.map(_.getAs[String]("encoding")).toSet ==
      Set("plain", "dict", "rle", "delta"))
    // exactly 16 files, each with exactly one winner
    assert(out.map(_.getAs[Long]("files_best")).sum == 16L)
    out.foreach(r => assert(r.getAs[Long]("total_bits") > 0))
  }

  test("k23: planted deletions/updates are caught; clean buckets skipped") {
    val s = spark
    import graft.queries.Tables.t
    val r = run("k23_merkle_diff").collect().head
    val orders = t(s, dir, "orders")
    val n = orders.count()
    val planted = orders.filter(
      col("o_orderkey") % 97 === 0 || col("o_orderkey") % 101 === 0).count()
    assert(r.getAs[Long]("rows_total") == n)
    // every planted change dirties its bucket, so sync mass covers at
    // least the planted rows but far less than the table
    assert(r.getAs[Long]("n_differ") >= 1)
    assert(r.getAs[Long]("rows_to_sync") >= planted)
    assert(r.getAs[Long]("rows_to_sync") < n)
  }

  // ------------------------------------------------------------------
  // wave 12: ml11 / sa14 / cs23
  // ------------------------------------------------------------------

  test("ml11: collision accounting is internally consistent") {
    val s = spark
    import graft.queries.Tables.t
    val r = run("ml11_feature_hashing").collect().head
    val nFeatures = t(s, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment")).distinct().count()
    assert(r.getAs[Long]("n_features") == nFeatures)
    assert(r.getAs[Long]("n_buckets_used") <= 256)
    // collided features sit in collided buckets, at least two per bucket
    assert(r.getAs[Long]("n_features_collided") >=
      2 * r.getAs[Long]("n_buckets_collided"))
    assert(r.getAs[Long]("max_bucket_features") >= 1)
  }

  test("sa14: allocations respect the budget and favor big noisy strata") {
    val out = run("sa14_neyman_allocation").collect()
    assert(out.length == 5)
    val total = out.map(_.getAs[Long]("alloc")).sum
    // floors lose at most 4 of the 10000 budget across 5 strata
    assert(total <= 10000 && total > 10000 - 5)
    out.foreach { r =>
      assert(r.getAs[Long]("std_cents") > 0)
      assert(r.getAs[Long]("alloc") > 0)
    }
  }

  test("cs23: pooled numerator recomposes from exact group sums") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("cs23_simpsons_paradox").collect()
    assert(out.length == 5)
    // one pooled sign, repeated on every row
    assert(out.map(_.getAs[Long]("pooled_sign")).toSet.size == 1)
    // recompute the pooled numerator exactly in BigInt from raw rows
    val rows = t(s, dir, "orders")
      .select(datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
        .cast("long").as("x"),
        floor(col("o_totalprice") * 100).cast("long").as("y"))
      .collect().map(r => (BigInt(r.getLong(0)), BigInt(r.getLong(1))))
    val n = BigInt(rows.length)
    val sx = rows.map(_._1).sum; val sy = rows.map(_._2).sum
    val sxy = rows.map(p => p._1 * p._2).sum
    val expected = (n * sxy - sx * sy).signum.toLong
    assert(out.head.getAs[Long]("pooled_sign") == expected)
    // flips only ever claimed for groups with a definite sign
    out.foreach { r =>
      if (r.getAs[Boolean]("is_flip")) assert(r.getAs[Long]("group_sign") != 0)
    }
  }

  // ------------------------------------------------------------------
  // wave 13: gr12 / tx20 / ol4
  // ------------------------------------------------------------------

  test("gr12: double sweep at least matches the first eccentricity") {
    val r = run("gr12_diameter_probe").collect().head
    val ecc = r.getAs[Int]("ecc_first").toLong
    val diam = r.getAs[Int]("diameter_lb").toLong
    // sweep 2 starts from a farthest node, so its eccentricity (the
    // diameter lower bound) can only match or beat sweep 1's
    assert(diam >= ecc)
    assert(ecc >= 1)
    // both sweeps explore the same component
    assert(r.getAs[Long]("reached_first") == r.getAs[Long]("reached_second"))
  }

  test("gr12: path fixture — double sweep recovers the exact diameter") {
    val s = spark
    import s.implicits._
    // path 0-1-2-3-4: from node 0 ecc=4; farthest=4; sweep2 ecc=4=diameter
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
      .toDF("a", "b")
    val src = Seq(0L).toDF("doc_id")
    val lv1 = Components.bfsLevels(edges, "a", "b", src, "doc_id", 16)
    val far = lv1.orderBy(col("dist").desc, col("node")).limit(1)
      .select(col("node").as("doc_id"))
    val lv2 = Components.bfsLevels(edges, "a", "b", far, "doc_id", 16)
    assert(far.collect().head.getLong(0) == 4L)
    assert(lv2.agg(max("dist")).collect().head.getInt(0) == 4)
  }

  test("tx20: phrases are stopword-free and scores are consistent") {
    val out = run("tx20_rake_keyphrases").collect()
    assert(out.nonEmpty && out.length <= 15)
    val stop = TextAnalysis.langMarkers.flatMap(_._2).toSet
    out.foreach { r =>
      val words = r.getAs[String]("phrase").split(" ")
      assert(words.length >= 2 && words.length == r.getAs[Long]("n_words"))
      assert(!words.exists(stop.contains))
      assert(r.getAs[Long]("n_occ") >= 1)
      // deg >= freq per word, so the ratio-of-sums score is >= 1e4
      assert(r.getAs[Long]("score_e4") >= 10000L)
    }
    val scores = out.map(_.getAs[Long]("score_e4")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("ol4: a planted joint outlier is caught; clean data stays inside") {
    val s = spark
    import s.implicits._
    // 60 users on the x=y diagonal (jointly consistent), one user far off
    // the diagonal although marginally unremarkable
    val per = ((1 to 60).map(i => (i.toLong, (10 + i % 5).toLong,
      (1000 + (i % 5) * 100).toLong)) :+ (99L, 11L, 1400L))
      .toDF("user_id", "x", "y")
    val mom = per.agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val mx = col("sx").cast("double") / col("n")
    val my = col("sy").cast("double") / col("n")
    val cxx = col("sxx").cast("double") / col("n") - mx * mx
    val cxy = col("sxy").cast("double") / col("n") - mx * my
    val cyy = col("syy").cast("double") / col("n") - my * my
    val det = cxx * cyy - cxy * cxy
    val dx = col("x") - mx
    val dy = col("y") - my
    val d2 = (cyy * dx * dx - lit(2.0) * cxy * dx * dy + cxx * dy * dy) / det
    val rows = per.crossJoin(broadcast(mom)).withColumn("d2", d2)
      .select("user_id", "d2").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows(99L) > 9.0)
    assert(rows.count { case (_, v) => v > 9.0 } == 1)
  }

  // ------------------------------------------------------------------
  // wave 14: w18 / ts11 / k24
  // ------------------------------------------------------------------

  test("w18: seats sum exactly to the budget and respect floors") {
    val out = run("w18_hamilton_apportionment").collect()
    assert(out.map(_.getAs[Long]("seats")).sum == 1000L)
    out.foreach { r =>
      assert(r.getAs[Long]("extra") == 0L || r.getAs[Long]("extra") == 1L)
      assert(r.getAs[Long]("seats") >= r.getAs[Long]("floor_seats"))
    }
    // quota bound: every nation lands within 1 seat of exact proportion
    val ntot = out.map(_.getAs[Long]("n")).sum
    out.foreach { r =>
      val quota = 1000.0 * r.getAs[Long]("n") / ntot
      val seats = r.getAs[Long]("seats").toDouble
      assert(seats >= math.floor(quota) && seats <= math.ceil(quota))
    }
  }

  test("ts11: correlation bounded; lag 0 uses every matched day") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("ts11_cross_correlation").collect()
    assert(out.length == 7)
    out.foreach { r =>
      val c = r.getAs[Long]("corr_e6")
      assert(c >= -1000000L && c <= 1000000L)
      assert(r.getAs[Long]("n") > 0)
    }
    // lag 0 matches exactly the intersection of the two day sets
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("pri"),
        to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("n"))
    val urgent = daily.filter(col("pri") === "1-URGENT").select("d")
    val low = daily.filter(col("pri") === "5-LOW").select("d")
    val both = urgent.intersect(low).count()
    val lag0 = out.find(_.getAs[Long]("lag") == 0L).get
    assert(lag0.getAs[Long]("n") == both)
  }

  test("k24: amplification shrinks with finer granularity; matches invariant") {
    val out = run("k24_partition_planner").collect()
    assert(out.length == 9)
    // rows_matching is a property of the probe, not the layout
    out.groupBy(_.getAs[String]("probe")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rows_matching")).toSet.size == 1)
      // scanned always covers matched
      rs.foreach(r => assert(
        r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matching")))
      // date-grained facts make day partitioning scan-exact, so day is
      // a lower bound for every coarser grid (week vs month is NOT
      // monotone — a week grid crossing a month boundary can scan more)
      val byGran = rs.map(r =>
        r.getAs[String]("gran") -> r.getAs[Long]("rows_scanned")).toMap
      assert(byGran("day") <= byGran("week"))
      assert(byGran("day") <= byGran("month"))
      val dayRow = rs.find(_.getAs[String]("gran") == "day").get
      assert(dayRow.getAs[Long]("amp_e4") == 10000L)
    }
    // more partitions at finer grain
    val nParts = out.map(r =>
      r.getAs[String]("gran") -> r.getAs[Long]("n_partitions")).toMap
    assert(nParts("day") > nParts("week") && nParts("week") > nParts("month"))
  }

  test("gr9: hand graph — square plus diagonal candidate") {
    val s = spark
    import s.implicits._
    // square 1-2-3-4 (edges 12,23,34,41): non-adjacent pairs (1,3) and
    // (2,4) each share BOTH their neighbors -> jaccard = 2/(2+2-2) = 1.0
    val raw = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val sym = raw.unionByName(raw.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    val deg = sym.groupBy(col("a").as("z")).agg(count(lit(1)).as("d"))
    val l = sym.select(col("a").as("z"), col("b").as("pa"))
    val r = sym.select(col("a").as("z"), col("b").as("pb"))
    val jac = l.join(r, Seq("z")).filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("common"))
      .join(sym.select(col("a").as("pa"), col("b").as("pb")),
        Seq("pa", "pb"), "left_anti")
      .join(deg.select(col("z").as("pa"), col("d").as("da")), "pa")
      .join(deg.select(col("z").as("pb"), col("d").as("db")), "pb")
      .select(col("pa"), col("pb"),
        (col("common") / (col("da") + col("db") - col("common"))).as("j"))
      .collect().map(x => (x.getAs[Long]("pa"), x.getAs[Long]("pb")) -> x.getAs[Double]("j"))
      .toMap
    assert(jac == Map((1L, 3L) -> 1.0, (2L, 4L) -> 1.0))
  }

  test("looTargetEncode: NULL categories encode against the NULL group " +
    "instead of dropping from the output (r12 ADVICE — null-safe join)") {
    val s = spark
    import s.implicits._
    // NULL group: ys (1, 0) — leave-one-out for the y=1 row sees
    // (sum 0, n 1), so enc = (0 + m·prior) / (1 + m); prior = 3/6
    val df = Seq((Some("a"), 1L), (Some("a"), 0L), (Some("a"), 1L),
      (Option.empty[String], 1L), (Option.empty[String], 0L),
      (Some("b"), 0L)).toDF("cat", "y")
    val out = graft.operators.FeatureOps.looTargetEncode(
      df, col("cat"), col("y"), smoothing = 2.0)
    assert(out.count() == 6L, "a NULL category row was dropped")
    val nullRows = out.filter(col("cat").isNull)
      .select("y", "target_enc").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val prior = 3.0 / 6.0
    assert(math.abs(nullRows(1L) - (0 + 2.0 * prior) / (1 + 2.0)) < 1e-12)
    assert(math.abs(nullRows(0L) - (1 + 2.0 * prior) / (1 + 2.0)) < 1e-12)
  }
}
