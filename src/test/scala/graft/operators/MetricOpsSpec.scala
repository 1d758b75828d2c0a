package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkEntry, TestSpark}

/** Invariants for the round-12 fifth-session metric waves — equal-credit
  * attribution, Kendall tau-b, and concentration — the laws that must hold
  * at any scale, complementing the DuckDB hash grade. */
class MetricOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("att2: credited cents conserve the purchase mass exactly") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("att2_linear_attribution").collect()
    val channels = out.map(_.getAs[String]("channel")).toSet
    assert(channels.subsetOf(Set("view", "click", "direct")))
    val credited = out.map(_.getAs[Long]("credited_cents")).sum
    val purchaseCents = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .agg(sum(floor(col("value") * 100).cast("long")))
      .collect()(0).getLong(0)
    assert(credited == purchaseCents) // largest-remainder split loses nothing
  }

  test("att2: hand fixture — equal split, remainder to most recent, direct") {
    val s = spark
    import s.implicits._
    // user A: purchase 101c after 3 touches in-window → 34/34/33 with the
    // extra cents on the two MOST RECENT; user B: touch outside 7d → direct;
    // user C: no touches → direct.
    val rows = Seq(
      ("A", 1L, 1000L, "view", 0.0),
      ("A", 2L, 2000L, "click", 0.0),
      ("A", 3L, 3000L, "view", 0.0),
      ("A", 4L, 4000L, "purchase", 1.01),
      ("B", 5L, 1000L, "click", 0.0),
      ("B", 6L, 1000L + 604801L, "purchase", 0.50),
      ("C", 7L, 9000L, "purchase", 0.25))
      .toDF("user_id", "event_id", "ep", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("ep")))
    // run the registered query body against a substituted events table by
    // replicating its logic on the fixture via a temp view is overkill —
    // instead exercise the same plan through a parquet round-trip.
    val tmp = java.nio.file.Files.createTempDirectory("att2fix").toString
    rows.select("event_id", "user_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = SparkEntry.queries("att2_linear_attribution")(s, tmp)
      .collect().map(r => r.getAs[String]("channel") ->
        ((r.getAs[Long]("n_credits"), r.getAs[Long]("credited_cents")))).toMap
    // A's 101c over 3 touches: base 33, remainder 2 → touches at ep 3000
    // (view) and 2000 (click) get 34, ep 1000 (view) gets 33.
    assert(out("view") == (2L, 67L))   // 34 + 33
    assert(out("click") == (1L, 34L))
    assert(out("direct") == (2L, 75L)) // 50 + 25
  }

  test("cs24: tau matches a brute-force recomputation and is bounded") {
    val out = run("cs24_kendall_tau").collect()
    assert(out.length == 1)
    val r = out(0)
    val (nDays, nPairs) = (r.getAs[Long]("n_days"), r.getAs[Long]("n_pairs"))
    val (c, d) = (r.getAs[Long]("concordant"), r.getAs[Long]("discordant"))
    assert(nPairs == nDays * (nDays - 1) / 2)
    assert(c + d <= nPairs)
    val tau = r.getAs[Long]("tau_b_e6")
    assert(tau >= -1000000L && tau <= 1000000L)
    // brute-force from the aligned series
    val s = spark
    import graft.queries.Tables.t
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("pri"),
        datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
          .cast("long").as("d"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
    val x = daily.filter(col("pri") === "1-URGENT")
      .select("d", "cents").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val y = daily.filter(col("pri") === "5-LOW")
      .select("d", "cents").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val al = x.keySet.intersect(y.keySet).toSeq.sorted.map(d => (x(d), y(d)))
    var (bc, bd) = (0L, 0L)
    for (i <- al.indices; k <- (i + 1) until al.length) {
      val ((x1, y1), (x2, y2)) = (al(i), al(k))
      if ((x1 < x2 && y1 < y2) || (x1 > x2 && y1 > y2)) bc += 1
      else if ((x1 < x2 && y1 > y2) || (x1 > x2 && y1 < y2)) bd += 1
    }
    assert(nDays == al.length && c == bc && d == bd)
    val n0 = al.length.toLong * (al.length - 1) / 2
    val n1 = al.groupBy(_._1).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val n2 = al.groupBy(_._2).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val bt = math.floor(1.0e6 * (bc - bd).toDouble /
      math.sqrt((n0 - n1).toDouble * (n0 - n2).toDouble)).toLong
    assert(tau == bt)
  }

  test("cs25: HHI ≤ CR1 ≤ CR4 law; one nation recomputed brute-force") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("cs25_concentration").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (hhi, cr4) = (r.getAs[Long]("hhi_e6"), r.getAs[Long]("cr4_e6"))
      val n = r.getAs[Long]("n_suppliers")
      assert(hhi >= 0 && hhi <= 1000000L && cr4 >= 0 && cr4 <= 1000000L)
      assert(hhi <= cr4 + 1) // shares law, 1 ulp floor slack
      assert(hhi >= 1000000L / n - 1) // HHI ≥ 1/n
      if (n <= 4) assert(cr4 == 1000000L)
    }
    // brute-force the first nation alphabetically
    val target = out.head.getAs[String]("n_name")
    val natKey = t(s, dir, "nation").filter(col("n_name") === target)
      .collect()(0).getAs[Number]("n_nationkey").longValue
    val suppKeys = t(s, dir, "supplier")
      .filter(col("s_nationkey") === natKey)
      .select("s_suppkey").collect().map(_.getAs[Number](0).longValue).toSet
    val cents = t(s, dir, "lineitem")
      .groupBy("l_suppkey")
      .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).as("c"))
      .collect().map(r => r.getAs[Number]("l_suppkey").longValue -> r.getLong(1))
      .filter(p => suppKeys(p._1)).sortBy(p => (-p._2, p._1)).map(_._2)
    val tot = cents.sum
    val hhi = math.floor(1.0e6 * cents.map(c => BigInt(c) * BigInt(c)).sum.toDouble /
      (tot.toDouble * tot.toDouble)).toLong
    val cr4 = math.floor(1.0e6 * cents.take(4).sum.toDouble / tot.toDouble).toLong
    val row = out.head
    assert(row.getAs[Long]("n_suppliers") == cents.length)
    assert(row.getAs[Long]("total_cents") == tot)
    assert(row.getAs[Long]("hhi_e6") == hhi)
    assert(row.getAs[Long]("cr4_e6") == cr4)
  }

  // ------------------------------------------------------------------
  // wave 16: gr13 / ml13 / ol5
  // ------------------------------------------------------------------

  test("gr13: node parity partitions the reached set; path fixture is bipartite") {
    val out = run("gr13_bipartite_check").collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("n_even") + r.getAs[Long]("n_odd") ==
      r.getAs[Long]("n_reached"))
    assert(r.getAs[Long]("n_odd_edges") <= r.getAs[Long]("n_covered_edges"))
    assert(r.getAs[Long]("bipartite") ==
      (if (r.getAs[Long]("n_odd_edges") == 0) 1L else 0L))
    // hand fixture: an even cycle is bipartite, an odd cycle is not
    val s = spark
    import s.implicits._
    def verdict(n: Int): (Long, Long) = {
      val edges = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
        .toDF("a", "b")
      val lv = Components.bfsLevels(edges, "a", "b",
        Seq(0L).toDF("src"), "src", maxRounds = n)
      val und = edges.select(least($"a", $"b").as("u"),
        greatest($"a", $"b").as("v")).distinct()
      val odd = und
        .join(lv.select($"node".as("u"), $"dist".as("du")), "u")
        .join(lv.select($"node".as("v"), $"dist".as("dv")), "v")
        .filter(($"du" + $"dv") % 2 === 0).count()
      (lv.count(), odd)
    }
    assert(verdict(6) == (6L, 0L))  // even cycle: bipartite
    assert(verdict(5)._2 > 0L)      // odd cycle: parity-equal edge exists
  }

  test("ml13: counts reconcile and recall is monotone non-increasing") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("ml13_pr_sweep").collect().sortBy(_.getAs[Long]("thr"))
    assert(out.length == 10)
    val pAll = t(s, dir, "documents").filter(col("lang") === "en").count()
    val nAll = t(s, dir, "documents").count()
    out.foreach { r =>
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") == pAll)
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fp") <= nAll)
      assert(r.getAs[Long]("recall_e6") <= 1000000L)
      assert(r.getAs[Long]("precision_e6") <= 1000000L)
      // F1 is bounded by min(precision-ish, recall-ish): weaker integer law
      assert(r.getAs[Long]("f1_e6") <= 1000000L)
    }
    // threshold 0 predicts everything positive: recall 1, tp = P
    assert(out.head.getAs[Long]("tp") == pAll)
    assert(out.head.getAs[Long]("recall_e6") == 1000000L)
    // tp (and so recall) never increases as the threshold rises
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("tp") <= a.getAs[Long]("tp"))
      assert(b.getAs[Long]("recall_e6") <= a.getAs[Long]("recall_e6"))
    }
  }

  test("ol5: quartiles match a positional sort; fences classify exactly") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("ol5_iqr_fences").collect()
    assert(out.nonEmpty)
    val byPri = t(s, dir, "orders")
      .select(col("o_orderpriority").as("pri"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().groupBy(_.getAs[String]("pri"))
      .view.mapValues(_.map(_.getAs[Long]("cents")).sorted).toMap
    out.foreach { r =>
      val cents = byPri(r.getAs[String]("pri"))
      val n = cents.length
      assert(r.getAs[Long]("n") == n)
      val q1 = cents((n + 3) / 4 - 1)
      val q3 = cents((3 * n + 3) / 4 - 1)
      assert(r.getAs[Long]("q1_cents") == q1)
      assert(r.getAs[Long]("q3_cents") == q3)
      val iqr = q3 - q1
      assert(r.getAs[Long]("n_low") == cents.count(c => 2 * c < 2 * q1 - 3 * iqr))
      assert(r.getAs[Long]("n_high") == cents.count(c => 2 * c > 2 * q3 + 3 * iqr))
    }
  }

  // ------------------------------------------------------------------
  // wave 17: tok5 / ck4 / hq4
  // ------------------------------------------------------------------

  test("tok5: coverage is monotone in vocab size and matches brute force") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("tok5_vocab_coverage").collect().sortBy(_.getAs[Long]("vocab_k"))
    assert(out.length == 6)
    val toks = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .collect().map(_.getString(0))
    val counts = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ranked = counts.toSeq.sortBy { case (tk, c) => (-c, tk) }
    val total = toks.length.toLong
    out.foreach { r =>
      val k = r.getAs[Long]("vocab_k").toInt
      val cov = ranked.take(k).map(_._2).sum
      assert(r.getAs[Long]("covered_tokens") == cov)
      assert(r.getAs[Long]("covered_types") == math.min(k, ranked.length).toLong)
      assert(r.getAs[Long]("total_tokens") == total)
      assert(r.getAs[Long]("distinct_tokens") == ranked.length.toLong)
      assert(r.getAs[Long]("oov_e6") ==
        math.floor(1.0e6 * (total - cov) / total).toLong)
    }
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("covered_tokens") >= a.getAs[Long]("covered_tokens"))
      assert(b.getAs[Long]("oov_e6") <= a.getAs[Long]("oov_e6"))
    }
  }

  test("ck4: bucketed padding obeys the <64/seq law and matches brute force") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("ck4_bucketed_batching").collect()
    assert(out.nonEmpty)
    val tk = t(s, dir, "documents")
      .select(col("doc_id").cast("long"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byBucket = tk.groupBy(_._2 / 64)
    out.foreach { r =>
      val bucket = r.getAs[Long]("bucket")
      val seqs = byBucket(bucket).sortBy(_._1).map(_._2)
      val batches = seqs.grouped(32).toSeq
      val padded = batches.map(b => b.max * b.length - b.sum).sum
      assert(r.getAs[Long]("n_seqs") == seqs.length.toLong)
      assert(r.getAs[Long]("n_batches") == batches.length.toLong)
      assert(r.getAs[Long]("sum_tokens") == seqs.sum)
      assert(r.getAs[Long]("padded_tokens") == padded)
      assert(padded < 64L * seqs.length) // bucket-width cap
    }
    assert(out.map(_.getAs[Long]("n_seqs")).sum == tk.length.toLong)
  }

  test("hq4: estimates are mass-bounded and the truth is exact") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("hq4_selectivity_estimate").collect()
    assert(out.length == 3)
    val bins = t(s, dir, "orders")
      .select(expr("CAST(floor(o_totalprice) AS BIGINT) div 1000").as("bin"))
      .collect().map(_.getLong(0))
    val n = bins.length.toLong
    val probes = Map("p1_low" -> (0L, 50L), "p2_mid" -> (100L, 200L),
      "p3_wide" -> (50L, 400L))
    out.foreach { r =>
      val (a, b) = probes(r.getAs[String]("probe"))
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("actual") == bins.count(x => x >= a && x < b).toLong)
      // estimate can never exceed the table, and err is |est-actual|/n
      assert(r.getAs[Long]("est_e2") >= 0 && r.getAs[Long]("est_e2") <= 100 * n)
      assert(r.getAs[Long]("err_e4") <= 10000L)
    }
  }

  // ------------------------------------------------------------------
  // wave 18: w19 / j13 / ts12
  // ------------------------------------------------------------------

  test("w19: seats sum to the budget; divisor method is house-monotone") {
    val out = run("w19_dhondt_apportionment").collect()
    assert(out.map(_.getAs[Long]("seats")).sum == 1000L)
    // n_i > n_j ⇒ seats_i ≥ seats_j (true for every divisor method)
    for (a <- out; b <- out if a.getAs[Long]("n") > b.getAs[Long]("n"))
      assert(a.getAs[Long]("seats") >= b.getAs[Long]("seats"))
    // brute-force D'Hondt on the collected counts
    val counts = out.map(r => r.getAs[Long]("nat") -> r.getAs[Long]("n"))
    val quot = for ((nat, n) <- counts; d <- 1L to 1000L)
      yield (n.toDouble / d.toDouble, nat, d)
    val win = quot.sortBy { case (q, nat, d) => (-q, nat, d) }.take(1000)
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    out.foreach(r =>
      assert(r.getAs[Long]("seats") == win.getOrElse(r.getAs[Long]("nat"), 0L)))
  }

  test("j13: bloom has zero false negatives and candidates cover matches") {
    val out = run("j13_bloom_semi_join").collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("false_negatives") == 0L) // the bloom law
    assert(r.getAs[Long]("candidates") ==
      r.getAs[Long]("true_matches") + r.getAs[Long]("false_positives"))
    assert(r.getAs[Long]("bits_set") <= 8192L)
    assert(r.getAs[Long]("true_matches") > 0L)
    assert(r.getAs[Long]("n_fact_keys") >= r.getAs[Long]("candidates"))
  }

  test("ts12: DW matches brute force and sits in [0,4]") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("ts12_durbin_watson").collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("dw_e6") >= 0L && r.getAs[Long]("dw_e6") <= 4000000L)
    val daily = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
        .cast("long").as("d"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("y"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    val n = daily.length.toLong
    val sy = daily.map(_._2).sum
    val e = daily.map { case (_, y) => BigInt(n * y - sy) }
    val den = e.map(x => x * x).sum
    val num = e.zip(e.drop(1)).map { case (a, b) => (b - a) * (b - a) }.sum
    val dw = math.floor(1.0e6 * num.toDouble / den.toDouble).toLong
    assert(r.getAs[Long]("n_days") == n)
    assert(r.getAs[Long]("dw_e6") == dw)
  }

  // ------------------------------------------------------------------
  // wave 19: cs26 / cs27 / hq5
  // ------------------------------------------------------------------

  test("cs26: U matches brute-force midranks; U_a + U_b = n_a * n_b") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("cs26_mann_whitney").collect()
    assert(out.length == 1)
    val r = out(0)
    val rows = t(s, dir, "lineitem")
      .filter(col("l_returnflag").isin("R", "N"))
      .select(col("l_quantity").cast("long"), col("l_returnflag"))
      .collect().map(x => (x.getLong(0), x.getString(1)))
    val na = rows.count(_._2 == "R").toLong
    val nb = rows.length - na
    // brute-force midranks over the pooled sample
    val sorted = rows.map(_._1).sorted
    val mid2 = sorted.zipWithIndex.groupBy(_._1).map { case (v, g) =>
      v -> (2L * (g.map(_._2).min + 1) + g.length - 1) // 2*minrank + t - 1
    }
    val r2a = rows.filter(_._2 == "R").map(x => BigInt(mid2(x._1))).sum
    val u2a = r2a - BigInt(na) * (na + 1)
    assert(BigInt(r.getAs[Long]("u2_a")) == u2a)
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    // reflection law: U_a + U_b = n_a*n_b (doubled: u2_a + u2_b = 2*na*nb)
    val ties = sorted.groupBy(identity).values
      .map(g => BigInt(g.length).pow(3) - g.length).sum
    assert(BigInt(r.getAs[Long]("ties_sum")) == ties)
    assert(math.abs(r.getAs[Long]("z_e6")) < 100000000L) // |z| < 100
  }

  test("cs27: rho matches brute-force Pearson-on-midranks; |rho| <= 1") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("cs27_spearman").collect()
    assert(out.length == 1)
    val r = out(0)
    assert(math.abs(r.getAs[Long]("rho_e6")) <= 1000000L)
    val daily = t(s, dir, "orders")
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
        .cast("long").as("d"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("x"),
        count(lit(1)).as("y"))
      .collect().map(x => (x.getLong(1), x.getLong(2)))
    def mid2(vs: Array[Long]): Map[Long, Long] = {
      val sorted = vs.sorted
      sorted.zipWithIndex.groupBy(_._1).map { case (v, g) =>
        v -> (2L * (g.map(_._2).min + 1) + g.length - 1)
      }
    }
    val mx = mid2(daily.map(_._1)); val my = mid2(daily.map(_._2))
    val pts = daily.map { case (x, y) => (BigInt(mx(x)), BigInt(my(y))) }
    val n = BigInt(pts.length)
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val rho = math.floor(1.0e6 * (n * sxy - sx * sy).toDouble /
      math.sqrt(((n * sxx - sx * sx) * (n * syy - sy * sy)).toDouble)).toLong
    assert(r.getAs[Long]("rho_e6") == rho)
  }

  test("hq5: containment laws and exact integer selectivity algebra") {
    val out = run("hq5_conjunction_selectivity").collect()
    assert(out.length == 3)
    out.foreach { r =>
      val (n, na, nb, nab) = (r.getAs[Long]("n"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("n_ab"))
      assert(nab <= math.min(na, nb)) // conjunction ⊆ each conjunct
      assert(na <= n && nb <= n)
      assert(r.getAs[Long]("act_e6") == nab * 1000000L / n)
      assert(r.getAs[Long]("est_e6") == na * nb * 1000000L / (n * n))
      assert(r.getAs[Long]("err_e6") ==
        r.getAs[Long]("est_e6") - r.getAs[Long]("act_e6"))
      if (na > 0 && nb > 0)
        assert(r.getAs[Long]("lift_e6") == nab * n * 1000000L / (na * nb))
    }
  }

  // ------------------------------------------------------------------
  // wave 20: ts13 / k26 (mm8's spec lives in WavSpec)
  // ------------------------------------------------------------------

  test("ts13: S and var18 match brute force; z is continuity-corrected") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("ts13_mann_kendall").collect()
    assert(out.length == 1)
    val r = out(0)
    val monthly = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(((year(to_date(col("o_orderdate"))) - 1992) * 12 +
        month(to_date(col("o_orderdate"))) - 1).cast("long").as("m"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("x"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    val n = monthly.length.toLong
    var sStat = 0L
    for (i <- monthly.indices; j <- (i + 1) until monthly.length)
      sStat += java.lang.Long.signum(monthly(j)._2 - monthly(i)._2)
    val tieTerm = monthly.groupBy(_._2).values
      .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
    val var18 = n * (n - 1) * (2 * n + 5) - tieTerm
    assert(r.getAs[Long]("n_months") == n)
    assert(r.getAs[Long]("s_stat") == sStat)
    assert(r.getAs[Long]("var18") == var18)
    val zExp =
      if (sStat > 0) math.floor(1.0e6 * (sStat - 1) /
        math.sqrt(var18.toDouble / 18.0)).toLong
      else if (sStat < 0) math.floor(1.0e6 * (sStat + 1) /
        math.sqrt(var18.toDouble / 18.0)).toLong
      else 0L
    assert(r.getAs[Long]("z_e6") == zExp)
  }

  test("k26: container algebra — byte formulas, counts, and crossover law") {
    val out = run("k26_bitmap_container_census").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (cont, keys) = (r.getAs[Long]("containers"), r.getAs[Long]("keys"))
      assert(r.getAs[Long]("array_containers") +
        r.getAs[Long]("bitmap_containers") == cont)
      assert(keys >= cont) // every container holds ≥1 key
      assert(r.getAs[Long]("list_bytes") == 8L * keys)
      val roaring = r.getAs[Long]("roaring_bytes")
      // bounds: all-array lower bound 2/key; any container ≤ 512 bytes
      assert(roaring >= 2L * r.getAs[Long]("array_containers") &&
        roaring <= 512L * cont)
      assert(r.getAs[Long]("ratio_e6") == roaring * 1000000L / (8L * keys))
    }
  }

  // ------------------------------------------------------------------
  // wave 21: tx22 / cs28 / km1
  // ------------------------------------------------------------------

  test("tx22: counts match a JVM-regex recount; formulas are exact") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("tx22_readability").collect()
    assert(out.nonEmpty)
    val texts = t(s, dir, "documents")
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    out.foreach { r =>
      val text = texts(r.getAs[Long]("doc_id"))
      val sen = "[.!?]+".r.findAllIn(text).length + 1L
      val w = "[a-z0-9]+".r.findAllIn(text.toLowerCase).length.toLong
      val y = "[aeiouy]+".r.findAllIn(text.toLowerCase).length.toLong
      assert(r.getAs[Long]("sentences") == sen)
      assert(r.getAs[Long]("words") == w)
      assert(r.getAs[Long]("syllables") == y)
      assert(w > 0)
      val ease = math.floor(100.0 * (206.835 -
        1.015 * (w.toDouble / sen) - 84.6 * (y.toDouble / w))).toLong
      assert(r.getAs[Long]("ease_e2") == ease)
    }
  }

  test("cs28: SSB + SSW = SST (scaled); F matches a brute-force ANOVA") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("cs28_anova_f").collect()
    assert(out.length == 1)
    val r = out(0)
    val rows = t(s, dir, "orders")
      .select(col("o_orderpriority"),
        floor(col("o_totalprice")).cast("long"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val n = rows.length.toLong
    val k = rows.map(_._1).distinct.length.toLong
    def term(sv: BigInt, nv: Long) = sv * sv * 1000 / nv // BigInt floor div
    val groups = rows.groupBy(_._1).values.map(g =>
      (BigInt(g.map(_._2).sum), g.length.toLong)).toSeq
    val sAll = groups.map(_._1).sum
    val q = rows.map(x => BigInt(x._2) * x._2).sum
    val terms = groups.map { case (sv, nv) => term(sv, nv) }.sum
    val ssb = terms - term(sAll, n)
    val ssw = q * 1000 - terms
    assert(r.getAs[Long]("n") == n && r.getAs[Long]("k") == k)
    assert(BigInt(r.getAs[Long]("ssb_e3")) == ssb)
    assert(BigInt(r.getAs[Long]("ssw_e3")) == ssw)
    val f = math.floor(1.0e6 * (ssb.toDouble * (n - k)) /
      (ssw.toDouble * (k - 1))).toLong
    assert(r.getAs[Long]("f_e6") == f)
    assert(r.getAs[Long]("eta2_e6") ==
      math.floor(1.0e6 * ssb.toDouble / (ssb + ssw).toDouble).toLong)
  }

  test("km1: risk-set bookkeeping, monotone survival, exact risk table") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("km1_kaplan_meier").collect()
    assert(out.nonEmpty)
    // n_risk starts at the cohort size and decrements by (d+c) per row
    val cohort = t(s, dir, "orders").select("o_custkey").distinct().count()
    var expectRisk = cohort
    var prevSurv = 10000L
    var prevTw = -1L
    out.foreach { r =>
      assert(r.getAs[Long]("tw") > prevTw); prevTw = r.getAs[Long]("tw")
      assert(r.getAs[Long]("n_risk") == expectRisk)
      expectRisk -= r.getAs[Long]("d") + r.getAs[Long]("c")
      val surv = r.getAs[Long]("surv_e4")
      assert(surv <= prevSurv && surv >= 0L) // KM is non-increasing
      prevSurv = surv
    }
    assert(expectRisk == 0L) // every spell accounted for exactly once
  }

  // ------------------------------------------------------------------
  // wave 22: sa17 / k27 / ol6
  // ------------------------------------------------------------------

  test("sa17: deff >= 1e6, neff <= n, ratios are exact reciprocals") {
    val out = run("sa17_kish_deff").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, sw, sw2) = (r.getAs[Long]("n_units"), r.getAs[Long]("sum_w"),
        r.getAs[Long]("sum_w2"))
      assert(sw2 >= sw) // w ≥ 1 ⇒ Σw² ≥ Σw
      assert(r.getAs[Long]("deff_e6") >= 1000000L) // Cauchy–Schwarz
      assert(r.getAs[Long]("deff_e6") == n * sw2 * 1000000L / (sw * sw))
      assert(r.getAs[Long]("neff_ratio_e6") ==
        sw * sw * 1000000L / (n * sw2))
      assert(r.getAs[Long]("neff_units") == sw * sw / sw2)
      assert(r.getAs[Long]("neff_units") <= n)
    }
  }

  test("k27: totals conserve rows; hash balances, range on price skews") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("k27_partition_balance").collect()
    assert(out.length == 2)
    val total = t(s, dir, "orders").count()
    out.foreach { r =>
      assert(r.getAs[Long]("total") == total)
      assert(r.getAs[Long]("max_rows") >= r.getAs[Long]("min_rows"))
      assert(r.getAs[Long]("skew_e6") ==
        r.getAs[Long]("max_rows") * 32L * 1000000L / total)
      assert(r.getAs[Long]("skew_e6") >= 1000000L) // max ≥ mean always
    }
    // which scheme wins is data- and SF-dependent (at tiny SF binomial
    // noise dominates the hash; at scale the bell-shaped price column
    // loses) — the audit GRADES the census rather than presuming it
    assert(out.map(_.getAs[String]("scheme")).sorted.toSeq ==
      Seq("hash_md5", "range_price"))
    out.foreach(r => assert(r.getAs[Long]("buckets") <= 32L))
  }

  test("ol6: G matches brute force; peak day is the true argmax") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("ol6_grubbs").collect()
    assert(out.length == 1)
    val r = out(0)
    val daily = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
        .cast("long").as("d"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("y"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val n = daily.length.toLong
    val sy = daily.map(_._2).sum
    val e = daily.map { case (d, y) => (d, BigInt(n) * y - sy) }
    val peak = e.minBy { case (d, ev) => (-ev.abs, d) }
    val se2 = e.map(x => x._2 * x._2).sum
    assert(r.getAs[Long]("n_days") == n)
    assert(r.getAs[Long]("peak_d") == peak._1)
    assert(BigInt(r.getAs[Long]("max_abs_e")) == peak._2.abs)
    val g = math.floor(1.0e6 * peak._2.abs.toDouble /
      math.sqrt(se2.toDouble / (n - 1).toDouble)).toLong
    assert(r.getAs[Long]("g_e6") == g)
  }

  // ------------------------------------------------------------------
  // wave 23: att3 / ts14 / sa18
  // ------------------------------------------------------------------

  test("att3: cents conserve exactly; dyadic weights bound the channels") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("att3_time_decay_attribution").collect()
    val channels = out.map(_.getAs[String]("channel")).toSet
    assert(channels.subsetOf(Set("view", "click", "direct")))
    val credited = out.map(_.getAs[Long]("credited_cents")).sum
    val purchaseCents = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .agg(sum(floor(col("value") * 100).cast("long")))
      .collect()(0).getLong(0)
    assert(credited == purchaseCents) // weighted largest-remainder law
    // direct purchases carry zero touch weight by construction
    out.filter(_.getAs[String]("channel") == "direct")
      .foreach(r => assert(r.getAs[Long]("weight_sum") == 0L))
    out.filter(_.getAs[String]("channel") != "direct")
      .foreach(r => assert(r.getAs[Long]("weight_sum") >=
        r.getAs[Long]("n_credits"))) // every weight ≥ 1
  }

  test("att3: hand fixture — newer touches earn exponentially more") {
    val s = spark
    import s.implicits._
    // user A: 300c purchase, touches 3d and 1d before → weights 2^4, 2^6
    // → shares 300·16/80 = 60 and 300·64/80 = 240, no remainder.
    val day = 86400L
    val rows = Seq(
      ("A", 1L, 10L * day, "view", 0.0),
      ("A", 2L, 12L * day, "click", 0.0),
      ("A", 3L, 13L * day, "purchase", 3.00))
    val df = rows.toDF("user_id", "event_id", "ep", "event_type", "value")
      .withColumn("ts", col("ep").cast("timestamp")).drop("ep")
    val saved = df.localCheckpoint(true)
    val tmp = java.nio.file.Files.createTempDirectory("att3fix").toString
    saved.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = graft.SparkEntry.queries("att3_time_decay_attribution")(
      s, tmp).collect()
    val byCh = out.map(r => r.getAs[String]("channel") ->
      r.getAs[Long]("credited_cents")).toMap
    assert(byCh("view") == 60L)   // age 3d → 2^(7-3)=16 of Σ80
    assert(byCh("click") == 240L) // age 1d → 2^(7-1)=64 of Σ80
  }

  test("ts14: rs means positive and increasing in w; H in a sane band") {
    val out = run("ts14_hurst").collect()
    assert(out.length == 1)
    val r = out(0)
    val rs = Seq(r.getAs[Long]("rs8_e6"), r.getAs[Long]("rs16_e6"),
      r.getAs[Long]("rs32_e6"), r.getAs[Long]("rs64_e6"))
    rs.foreach(v => assert(v > 0L))
    // R/S grows with window for any positive-H series
    assert(rs == rs.sorted)
    val h = r.getAs[Long]("h_e4")
    assert(h > 0L && h < 15000L) // (0, 1.5): estimator noise band
  }

  test("ts14: w=8 block means match a brute-force R/S recompute") {
    val s = spark
    import graft.queries.Tables.t
    val daily = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
        .cast("long").as("d"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("y"))
      .orderBy("d").collect().map(_.getLong(1))
    val w = 8
    val rsVals = daily.grouped(w).filter(_.length == w).flatMap { blk =>
      val sv = BigInt(blk.sum)
      val qv = blk.map(v => BigInt(v) * v).sum
      val varTerm = qv * w - sv * sv
      if (varTerm <= 0) None else {
        val cums = blk.scanLeft(BigInt(0))(_ + _).tail
        val zs = cums.zipWithIndex.map { case (c, i) =>
          c * w - sv * (i + 1) }
        Some(math.floor(1.0e6 * (zs.max - zs.min).toDouble /
          math.sqrt(varTerm.toDouble)).toLong)
      }
    }.toSeq
    val expect = rsVals.sum / rsVals.length
    assert(run("ts14_hurst").collect()(0).getAs[Long]("rs8_e6") == expect)
  }

  test("sa18: SMD matches a brute-force recompute per pair") {
    val s = spark
    import graft.queries.Tables.t
    import graft.operators.Sampling
    val out = run("sa18_covariate_balance").collect()
    assert(out.length == 3)
    val split = t(s, dir, "orders")
      .select(Sampling.splitLabel(col("o_orderkey").cast("string"))
        .as("sp"), floor(col("o_totalprice")).cast("long").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def stats(name: String) = {
      val xs = split.filter(_._1 == name).map(_._2)
      (xs.length.toLong, BigInt(xs.sum), xs.map(v => BigInt(v) * v).sum)
    }
    def smd(a: (Long, BigInt, BigInt), b: (Long, BigInt, BigInt)) = {
      val va = (a._3 * a._1 - a._2 * a._2).toDouble /
        (a._1.toDouble * (a._1 - 1))
      val vb = (b._3 * b._1 - b._2 * b._2).toDouble /
        (b._1.toDouble * (b._1 - 1))
      math.floor(1.0e6 * ((a._2.toDouble / a._1 - b._2.toDouble / b._1) /
        math.sqrt((va + vb) / 2.0))).toLong
    }
    val (tr, va, te) = (stats("train"), stats("val"), stats("test"))
    val expect = Map("train_vs_test" -> smd(tr, te),
      "train_vs_val" -> smd(tr, va), "val_vs_test" -> smd(va, te))
    out.foreach { r =>
      assert(r.getAs[Long]("smd_e6") == expect(r.getAs[String]("pair")))
      // a hash split leaves the covariate balanced: |SMD| well under 0.1
      assert(math.abs(r.getAs[Long]("smd_e6")) < 100000L)
    }
  }

  // ------------------------------------------------------------------
  // wave 24: gr14 / cs30 / dd24
  // ------------------------------------------------------------------

  test("gr14: phi matches a brute-force rich-club recount at every k") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("gr14_rich_club").collect()
    assert(out.map(_.getAs[Long]("k")).toSeq == Seq(2L, 4L, 8L))
    val edges = graft.operators.Components
      .docGraph(t(s, dir, "documents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    out.foreach { r =>
      val k = r.getAs[Long]("k")
      val rich = deg.filter(_._2 > k).keySet
      val ek = edges.count(e => rich(e._1) && rich(e._2)).toLong
      assert(r.getAs[Long]("n_k") == rich.size.toLong)
      assert(r.getAs[Long]("e_k") == ek)
      val nk = rich.size.toLong
      val phi = if (nk > 1) ek * 1000000L / (nk * (nk - 1)) else 0L
      assert(r.getAs[Long]("phi_e6") == phi)
    }
    // rich-club density is non-decreasing in k while a club exists
    val live = out.filter(_.getAs[Long]("n_k") > 1)
      .map(_.getAs[Long]("phi_e6")).toSeq
    assert(live == live.sorted)
  }

  test("cs30: partial corr matches brute force and sits inside [-1, 1]") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("cs30_partial_corr").collect()
    assert(out.length == 1)
    val r = out(0)
    val rows = t(s, dir, "orders")
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
        .cast("long").as("d"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT",
          floor(col("o_totalprice") * 100).cast("long"))).as("x"),
        sum(when(col("o_orderpriority") === "5-LOW",
          floor(col("o_totalprice") * 100).cast("long"))).as("y"),
        count(lit(1)).as("z"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .collect().map(q => (q.getLong(1), q.getLong(2), q.getLong(3)))
    val n = rows.length
    def corr(a: Array[BigInt], b: Array[BigInt]): Double = {
      val (sa, sb) = (a.sum, b.sum)
      val sab = a.zip(b).map(p => p._1 * p._2).sum
      val saa = a.map(v => v * v).sum
      val sbb = b.map(v => v * v).sum
      (n * sab - sa * sb).toDouble /
        (math.sqrt((n * saa - sa * sa).toDouble) *
          math.sqrt((n * sbb - sb * sb).toDouble))
    }
    val xs = rows.map(q => BigInt(q._1))
    val ys = rows.map(q => BigInt(q._2))
    val zs = rows.map(q => BigInt(q._3))
    val (rxy, rxz, ryz) = (corr(xs, ys), corr(xs, zs), corr(ys, zs))
    val part = (rxy - rxz * ryz) /
      math.sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
    assert(r.getAs[Long]("n_days") == n.toLong)
    assert(r.getAs[Long]("rxy_e6") == math.floor(1.0e6 * rxy).toLong)
    assert(r.getAs[Long]("partial_e6") == math.floor(1.0e6 * part).toLong)
    assert(math.abs(r.getAs[Long]("partial_e6")) <= 1000000L)
  }

  test("dd24: purity laws — bounds, cluster floors, and F1 betweenness") {
    val out = run("dd24_cluster_purity").collect()
    assert(out.length == 1)
    val r = out(0)
    val (n, ncl, ntc) = (r.getAs[Long]("n_docs"),
      r.getAs[Long]("n_clusters"), r.getAs[Long]("n_classes"))
    val (p, i, f) = (r.getAs[Long]("purity_e6"),
      r.getAs[Long]("inverse_e6"), r.getAs[Long]("f1_e6"))
    assert(n > 0 && ncl > 0 && ntc > 0)
    assert(ncl <= n && ntc <= n)
    assert(p > 0 && p <= 1000000L && i > 0 && i <= 1000000L)
    // harmonic mean sits between its arguments
    assert(f >= math.min(p, i) - 1 && f <= math.max(p, i) + 1)
    // singleton-heavy truth: max-overlap sums are at least the group counts
    assert(p * n >= ncl * 1000000L - n) // pnum ≥ n_clusters (scaled)
  }

  // ------------------------------------------------------------------
  // wave 25: mb4 / tx23 / ml14
  // ------------------------------------------------------------------

  test("mb4: sequence counts match a brute-force per-user replay") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("mb4_sequence_rules").collect()
    val ev = t(s, dir, "events")
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime * 1000 + r.getTimestamp(2).getNanos / 1000 % 1000))
    val byUser = ev.groupBy(_._1)
    out.foreach { r =>
      val (a, b) = (r.getAs[String]("ant"), r.getAs[String]("cons"))
      assert(a != b)
      val both = byUser.count { case (_, es) =>
        es.exists(_._2 == a) && es.exists(_._2 == b) }
      val seq = byUser.count { case (_, es) =>
        val as = es.filter(_._2 == a).map(_._3)
        val bs = es.filter(_._2 == b).map(_._3)
        as.nonEmpty && bs.nonEmpty && as.min < bs.max }
      assert(r.getAs[Long]("both_users") == both.toLong)
      assert(r.getAs[Long]("seq_users") == seq.toLong)
      val na = byUser.count(_._2.exists(_._2 == a)).toLong
      assert(r.getAs[Long]("ant_users") == na)
      assert(r.getAs[Long]("conf_e6") ==
        r.getAs[Long]("seq_users") * 1000000L / na)
      assert(r.getAs[Long]("seq_users") <= r.getAs[Long]("both_users"))
    }
  }

  test("tx23: heaps curve is monotone and its endpoint is the full corpus") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("tx23_heaps_law").collect()
    assert(out.map(_.getAs[Long]("g")).toSeq == Seq(1L, 2L, 3L, 4L))
    val vocab = out.map(_.getAs[Long]("vocab")).toSeq
    val toks = out.map(_.getAs[Long]("n_tokens")).toSeq
    val docsN = out.map(_.getAs[Long]("n_docs")).toSeq
    assert(vocab == vocab.sorted && toks == toks.sorted &&
      docsN == docsN.sorted)
    out.foreach(r => assert(r.getAs[Long]("vocab") <=
      r.getAs[Long]("n_tokens")))
    // endpoint (cp = max doc_id) covers the whole corpus exactly
    val docs = t(s, dir, "documents").select("doc_id", "text").collect()
    val allToks = docs.flatMap(_.getString(1).split(" ", -1))
    assert(docsN.last == docs.length.toLong)
    assert(toks.last == allToks.length.toLong)
    assert(vocab.last == allToks.distinct.length.toLong)
    // prefix recount at the first checkpoint
    val cp1 = out(0).getAs[Long]("cp")
    val pre = docs.filter(_.getLong(0) <= cp1)
    assert(docsN.head == pre.length.toLong)
    assert(vocab.head ==
      pre.flatMap(_.getString(1).split(" ", -1)).distinct.length.toLong)
    // a growing corpus can't mint vocabulary faster than tokens arrive
    out.foreach { r =>
      val sl = r.getAs[Long]("slope_e6")
      assert(sl >= 0L && sl <= 1000000L)
    }
  }

  test("ml14: confusion cells and MCC/kappa match a brute-force recount") {
    val s = spark
    val sc = graft.operators.Classifier.logRegScores(
      graft.queries.Tables.t(s, dir, "documents"), "doc_id", "text",
      label = when(col("source") === "src0", 1.0).otherwise(0.0),
      dims = 32, iters = 3, lr = 0.5)
      .select("predicted", "label").collect()
      .map(r => (r.getBoolean(0), r.getInt(1)))
    val tp = sc.count(p => p._1 && p._2 == 1).toLong
    val fp = sc.count(p => p._1 && p._2 == 0).toLong
    val fn = sc.count(p => !p._1 && p._2 == 1).toLong
    val tn = sc.count(p => !p._1 && p._2 == 0).toLong
    val r = run("ml14_mcc_gate").collect()(0)
    assert(r.getAs[Long]("tp") == tp && r.getAs[Long]("fp") == fp &&
      r.getAs[Long]("fn") == fn && r.getAs[Long]("tn") == tn)
    val mcc = (tp * tn - fp * fn).toDouble /
      (math.sqrt((tp + fp).toDouble) * math.sqrt((tp + fn).toDouble) *
        math.sqrt((tn + fp).toDouble) * math.sqrt((tn + fn).toDouble))
    val kappa = (2 * (tp * tn - fp * fn)).toDouble /
      ((tp + fp) * (fp + tn) + (tp + fn) * (fn + tn)).toDouble
    assert(r.getAs[Long]("mcc_e6") == math.floor(1.0e6 * mcc).toLong)
    assert(r.getAs[Long]("kappa_e6") == math.floor(1.0e6 * kappa).toLong)
    assert(math.abs(r.getAs[Long]("mcc_e6")) <= 1000000L)
    val ba = r.getAs[Long]("bal_acc_e6")
    assert(ba >= 0L && ba <= 1000000L)
  }

  // ------------------------------------------------------------------
  // wave 26: cs34 / gr15 / ix5
  // ------------------------------------------------------------------

  test("cs34: entropy laws — 0 ≤ H(next|cur) ≤ H(next) ≤ ln|types|, MI ≥ 0") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("cs34_conditional_entropy").collect()
    assert(out.length == 1)
    val r = out(0)
    val (hn, hc, mi) = (r.getAs[Long]("h_next_e6"),
      r.getAs[Long]("h_cond_e6"), r.getAs[Long]("mi_e6"))
    val types = t(s, dir, "events").select("event_type").distinct().count()
    assert(hn >= 0 && hc >= 0)
    assert(hc <= hn) // conditioning never increases entropy
    assert(hn <= math.ceil(1.0e6 * math.log(types.toDouble)).toLong)
    assert(mi >= -1) // floor() of two separately-floored terms: ±1 ulp slack
    assert(mi <= hn - hc + 1)
    // n_transitions = events minus one per active user
    val ev = t(s, dir, "events")
    val expected = ev.count() -
      ev.select("user_id").distinct().count()
    assert(r.getAs[Long]("n_transitions") == expected)
  }

  test("gr15: katz scores match a brute-force integer iteration") {
    val s = spark
    import graft.queries.Tables.t
    val edges = graft.operators.Components
      .docGraph(t(s, dir, "documents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = t(s, dir, "documents").select("doc_id").collect()
      .map(_.getLong(0))
    var x = nodes.map(n => n -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val contrib = edges.groupBy(_._1).view
        .mapValues(_.map(e => x.getOrElse(e._2, 0L)).sum).toMap
      x = nodes.map(n => n -> (1000000L + contrib.getOrElse(n, 0L) / 8))
        .toMap
    }
    val expected = x.toSeq.sortBy(p => (-p._2, p._1)).take(10)
    val got = run("gr15_katz").collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("score"))).toSeq
    assert(got == expected)
  }

  test("ix5: min gap matches a brute-force position-pair scan") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("ix5_proximity_rank").collect()
    assert(out.length <= 15)
    val docs = t(s, dir, "documents").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val brute = docs.flatMap { case (id, ws) =>
      val pa = ws.zipWithIndex.filter(_._1 == "merge").map(_._2)
      val pb = ws.zipWithIndex.filter(_._1 == "sort").map(_._2)
      if (pa.isEmpty || pb.isEmpty) None
      else Some((id, pa.flatMap(a => pb.map(b => math.abs(a - b))).min.toLong,
        pa.length.toLong, pb.length.toLong))
    }
    val expected = brute.sortBy(t4 => (t4._2, t4._1)).take(15)
      .map(t4 => (t4._1, t4._3, t4._4, t4._2)).toSeq
    val got = out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("tf_a"),
      r.getAs[Long]("tf_b"), r.getAs[Long]("min_gap"))).toSeq
    assert(got == expected)
    out.foreach(r => assert(r.getAs[Long]("prox_e6") ==
      1000000L / r.getAs[Long]("min_gap")))
  }

  // ------------------------------------------------------------------
  // wave 27: tx24 / cs35 / ts15
  // ------------------------------------------------------------------

  test("tx24: fano factors match a brute-force zero-inclusive recount") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("tx24_burstiness").collect()
    assert(out.length == 12)
    val docs = t(s, dir, "documents").select("text").collect()
      .map(_.getString(0).split(" ", -1))
    val n = docs.length.toLong
    val byTerm = docs.zipWithIndex
      .flatMap { case (ws, i) => ws.map(w => (w, i)) }
      .groupBy(_._1).view
      .mapValues(_.groupBy(_._2).values.map(_.length.toLong).toSeq).toMap
    // df-ordered top-12 with the (df desc, term) tie-break
    val expTop = byTerm.toSeq
      .map { case (term, tfs) => (term, tfs.length.toLong) }
      .sortBy(p => (-p._2, p._1)).take(12).map(_._1)
    assert(out.map(_.getAs[String]("term")).toSeq == expTop)
    out.foreach { r =>
      val tfs = byTerm(r.getAs[String]("term"))
      val (df, sTf) = (tfs.length.toLong, tfs.sum)
      val ss = tfs.map(x => x * x).sum
      assert(r.getAs[Long]("df") == df)
      assert(r.getAs[Long]("total_tf") == sTf)
      assert(r.getAs[Long]("fano_e6") ==
        1000000L * (n * ss - sTf * sTf) / ((n - 1) * sTf))
      assert(r.getAs[Long]("mean_tf_e6") == sTf * 1000000L / n)
    }
  }

  test("cs35: mcnemar cells partition the corpus; chi2 identity holds") {
    val s = spark
    import graft.queries.Tables.t
    val r = run("cs35_mcnemar").collect()(0)
    val cells = Seq("n11", "n10", "n01", "n00").map(r.getAs[Long])
    assert(cells.sum == t(s, dir, "documents").count())
    val docs = t(s, dir, "documents").select("n_chars", "text").collect()
    val brute = docs.map { q =>
      (q.getLong(0) >= 150, q.getString(1).split(" ", -1).contains("the"))
    }
    assert(cells(0) == brute.count(p => p._1 && p._2).toLong)
    assert(cells(1) == brute.count(p => p._1 && !p._2).toLong)
    assert(cells(2) == brute.count(p => !p._1 && p._2).toLong)
    val (b, c) = (cells(1), cells(2))
    val chi2 = if (b + c == 0) 0L
      else (math.abs(b - c) - 1) * (math.abs(b - c) - 1) * 1000000L / (b + c)
    assert(r.getAs[Long]("chi2_e6") == chi2)
    assert(r.getAs[Long]("agree_e6") ==
      (cells(0) + cells(3)) * 1000000L / cells.sum)
  }

  test("ts15: phi matches a brute-force OLS over consecutive-day pairs") {
    val s = spark
    import graft.queries.Tables.t
    val daily = t(s, dir, "orders")
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
        .cast("long").as("d"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("y"))
      .collect().map(q => (q.getLong(0), q.getLong(1))).sortBy(_._1)
    val pairs = daily.sliding(2).collect {
      case Array((d1, y1), (d2, y2)) if d2 == d1 + 1 => (y1, y2)
    }.toSeq
    val n = pairs.length
    val sx = pairs.map(p => BigInt(p._1)).sum
    val sy = pairs.map(p => BigInt(p._2)).sum
    val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
    val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
    val phi = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val r = run("ts15_ar1_halflife").collect()(0)
    assert(r.getAs[Long]("n_pairs") == n.toLong)
    assert(r.getAs[Long]("phi_e6") == math.floor(1.0e6 * phi).toLong)
    val hl = r.getAs[Long]("halflife_e6")
    if (phi > 0.0 && phi < 1.0) {
      assert(hl ==
        math.floor(1.0e6 * (-math.log(2.0) / math.log(phi))).toLong)
      assert(hl > 0L)
    } else assert(hl == 0L)
  }

  // ------------------------------------------------------------------
  // wave 28: sa15 / cs36 / k25
  // ------------------------------------------------------------------

  test("sa15: interval brackets the point estimate and orders correctly") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("sa15_bootstrap_ci").collect()
    assert(out.length == 1)
    val r = out(0)
    val (lo, hi, pt) = (r.getAs[Long]("lo_e6"), r.getAs[Long]("hi_e6"),
      r.getAs[Long]("point_e6"))
    assert(lo <= hi)
    assert(r.getAs[Long]("width_e6") == hi - lo)
    // a ~94% bootstrap interval on the FULL sample must contain the
    // full-sample mean for any non-pathological resample fixture
    assert(lo <= pt && pt <= hi)
    val docs = t(s, dir, "documents")
    assert(r.getAs[Long]("n_docs") == docs.count())
    val sx = docs.agg(sum("n_chars")).collect()(0).getLong(0)
    assert(pt == sx * 1000000L / docs.count())
  }

  test("cs36: mde matches closed form and shrinks with sample size") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("cs36_power_mde").collect()
    val brute = t(s, dir, "documents").select("source", "lang").collect()
      .groupBy(_.getString(0)).view
      .mapValues(rs => (rs.length.toLong,
        rs.count(_.getString(1) == "en").toLong)).toMap
    assert(out.map(_.getAs[String]("source")).toSet == brute.keySet)
    out.foreach { r =>
      val (n, k) = brute(r.getAs[String]("source"))
      assert(r.getAs[Long]("n") == n && r.getAs[Long]("k") == k)
      assert(r.getAs[Long]("p_e6") == k * 1000000L / n)
      val p = k.toDouble / n
      val mde = 2.801585 * math.sqrt(2.0 * p * (1.0 - p) / n)
      assert(r.getAs[Long]("mde_e6") == math.floor(1.0e6 * mde).toLong)
    }
  }

  test("k25: hash layout reads deep, sorted layout reads depth 1") {
    val out = run("k25_overlap_depth").collect()
    assert(out.nonEmpty && out.length <= 8)
    out.foreach { r =>
      val (b, a) = (r.getAs[Long]("depth_before"),
        r.getAs[Long]("depth_after"))
      assert(b >= 1L && b <= 16L && a >= 1L && a <= 16L)
      // the re-layout never makes a point lookup WORSE
      assert(a <= b)
    }
    // hash-shuffled files each span ~the whole domain: mid-domain probes
    // must hit nearly every file, and the sorted layout must beat the
    // hashed one overall
    val mid = out.filter(r => r.getAs[Long]("g") >= 2 &&
      r.getAs[Long]("g") <= 7)
    assert(mid.forall(_.getAs[Long]("depth_before") >= 8L))
    assert(out.map(_.getAs[Long]("depth_after")).sum <
      out.map(_.getAs[Long]("depth_before")).sum)
  }

  // ------------------------------------------------------------------
  // wave 29: cs37 / dd25 / tx25
  // ------------------------------------------------------------------

  test("cs37: chi2 matches a brute-force cell recount with floored epochs") {
    val s = spark
    import graft.queries.Tables.t
    val r = run("cs37_activity_uniformity").collect()(0)
    val secs = t(s, dir, "events").selectExpr("CAST(ts AS LONG) AS sec")
      .collect().map(_.getLong(0))
    assert(r.getAs[Long]("n_events") == secs.length.toLong)
    val n = secs.length.toLong
    def chi2(cells: Map[Long, Long], k: Int): Long = {
      val so = cells.values.map(c => (k * c - n) * (k * c - n)).sum +
        (k - cells.size) * n * n
      math.floor(1.0e6 * so.toDouble / (k * n)).toLong
    }
    val dow = secs.groupBy(sc => (sc / 86400 + 4) % 7).view
      .mapValues(_.length.toLong).toMap
    val hour = secs.groupBy(sc => (sc / 3600) % 24).view
      .mapValues(_.length.toLong).toMap
    val cell = secs.groupBy(sc => ((sc / 86400 + 4) % 7, (sc / 3600) % 24))
      .view.mapValues(_.length.toLong).toMap
    assert(r.getAs[Long]("chi2_dow_e6") == chi2(dow, 7))
    assert(r.getAs[Long]("chi2_hour_e6") == chi2(hour, 24))
    assert(r.getAs[Long]("chi2_cell_e6") ==
      chi2(cell.map { case (kk, v) => (kk._1 * 24 + kk._2, v) }, 168))
    val peakD = dow.toSeq.sortBy(p => (-p._2, p._1)).head._1
    val peakH = hour.toSeq.sortBy(p => (-p._2, p._1)).head._1
    assert(r.getAs[Long]("peak_dow") == peakD)
    assert(r.getAs[Long]("peak_hour") == peakH)
  }

  test("dd25: waste masses match a brute-force dup recount per source") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("dd25_dup_inflation").collect()
    val docs = t(s, dir, "documents").select("source", "doc_id", "text")
      .collect().map(q => (q.getString(0), q.getLong(1), q.getString(2)))
    val keeper = docs.groupBy(_._3).view.mapValues(_.map(_._2).min).toMap
    val bySource = docs.groupBy(_._1)
    assert(out.map(_.getAs[String]("source")).toSet == bySource.keySet)
    out.foreach { r =>
      val rows = bySource(r.getAs[String]("source"))
      val toks = rows.map(q =>
        (q._2, q._3.split(" ", -1).length.toLong, keeper(q._3) != q._2))
      assert(r.getAs[Long]("n_docs") == rows.length.toLong)
      assert(r.getAs[Long]("dup_docs") == toks.count(_._3).toLong)
      assert(r.getAs[Long]("total_tokens") == toks.map(_._2).sum)
      val wasted = toks.filter(_._3).map(_._2).sum
      assert(r.getAs[Long]("wasted_tokens") == wasted)
      assert(r.getAs[Long]("waste_e6") ==
        wasted * 1000000L / toks.map(_._2).sum)
    }
  }

  test("tx25: efficiency ratios are consistent and fertility ≥ 1") {
    val out = run("tx25_token_efficiency").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (c, w, b) = (r.getAs[Long]("chars"), r.getAs[Long]("ws_tokens"),
        r.getAs[Long]("bpeish_tokens"))
      assert(c > 0 && w > 0 && b > 0)
      assert(r.getAs[Long]("chars_per_ws_e6") == c * 1000000L / w)
      assert(r.getAs[Long]("chars_per_bpeish_e6") == c * 1000000L / b)
      assert(r.getAs[Long]("fertility_e6") == b * 1000000L / w)
      // every whitespace token contains ≥1 BPE-ish token
      assert(b >= w)
      // BPE-ish tokens are never longer than the chars they cover
      assert(c >= b)
    }
  }

  // ------------------------------------------------------------------
  // wave 30: cs38 / w20 / gr16
  // ------------------------------------------------------------------

  test("cs38: runs count matches a brute-force sign-sequence replay") {
    val s = spark
    import graft.queries.Tables.t
    val r = run("cs38_runs_test").collect()(0)
    val daily = t(s, dir, "orders")
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
        .cast("long").as("d"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("y"))
      .collect().map(q => (q.getLong(0), q.getLong(1)))
    val n = daily.length
    val med = daily.map(p => (p._2, p._1)).sorted.apply((n + 1) / 2 - 1)._1
    val signs = daily.sortBy(_._1).filter(_._2 != med).map(_._2 > med)
    val n1 = signs.count(identity).toLong
    val n2 = signs.count(!_).toLong
    val runs = if (signs.isEmpty) 0L
      else 1L + signs.sliding(2).count(p => p(0) != p(1)).toLong
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    assert(r.getAs[Long]("runs") == runs)
    val mu = 1.0 + 2.0 * n1 * n2 / (n1 + n2)
    assert(r.getAs[Long]("mu_e6") == math.floor(1.0e6 * mu).toLong)
    // runs can never exceed 2·min(n1,n2)+1 or the sequence length
    assert(runs <= 2 * math.min(n1, n2) + 1 && runs <= n1 + n2)
  }

  test("w20: record days match a brute-force running-max replay") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("w20_record_days").collect()
    val orders = t(s, dir, "orders")
      .select(datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
        .cast("long").as("d"), col("o_orderkey"),
        floor(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().map(q => (q.getLong(0), q.getLong(1), q.getLong(2)))
    val daily = orders.groupBy(_._1).view.mapValues { os =>
      val mx = os.map(_._3).max
      (mx, os.filter(_._3 == mx).map(_._2).min)
    }.toMap
    var rec = 0L
    val expected = daily.toSeq.sortBy(_._1).flatMap { case (d, (mx, k)) =>
      val keep = mx > rec
      val prev = rec
      if (keep) rec = mx
      if (keep) Some((d, k, mx, prev)) else None
    }
    val got = out.map(r => (r.getAs[Long]("d"),
      r.getAs[Long]("record_orderkey"), r.getAs[Long]("record_cents"),
      r.getAs[Long]("prev_record_cents"))).toSeq
    assert(got == expected)
    // records strictly increase
    val cents = got.map(_._3)
    assert(cents == cents.sorted && cents.distinct == cents)
  }

  test("gr16: histogram masses are conserved and buckets are log2-exact") {
    val out = run("gr16_component_histogram").collect()
    assert(out.nonEmpty)
    val nComp = out(0).getAs[Long]("n_components")
    val giant = out(0).getAs[Long]("giant")
    assert(out.map(_.getAs[Long]("bucket_components")).sum == nComp)
    val nodes = out.map(_.getAs[Long]("bucket_nodes")).sum
    assert(out(0).getAs[Long]("giant_frac_e6") ==
      giant * 1000000L / nodes)
    // the giant component's bucket is the last one, and it's populated
    val lastBucket = out.map(_.getAs[Long]("bucket")).max
    assert(lastBucket == (63 - java.lang.Long.numberOfLeadingZeros(giant)))
    // singleton count sits in bucket 0
    val b0 = out.find(_.getAs[Long]("bucket") == 0L)
    val singles = out(0).getAs[Long]("singletons")
    assert(b0.forall(_.getAs[Long]("bucket_components") >= singles))
    if (singles > 0) assert(b0.isDefined)
  }

  // ------------------------------------------------------------------
  // wave 31: dd26 / ix6 / k28
  // ------------------------------------------------------------------

  test("dd26: vote histogram masses equal dd2's candidate-pair count") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("dd26_band_agreement").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val v = r.getAs[Long]("votes")
      assert(v >= 1L && v <= 4L)
    }
    val total = out(0).getAs[Long]("total_pairs")
    assert(out.map(_.getAs[Long]("n_pairs")).sum == total)
    // histogram total == |distinct LSH candidate pairs|
    val sh = graft.operators.Dedup.shingleMultiset(
      t(s, dir, "documents"), "doc_id", "text")
    val pairs = graft.operators.Dedup.lshCandidatePairs(
      graft.operators.Dedup.minhashSignatures(sh, "doc_id", bands = 4),
      "doc_id").count()
    assert(total == pairs)
  }

  test("ix6: symspell candidates are exactly the distance-≤1 vocab terms") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("ix6_symspell_suggest").collect()
    val vocab = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("term"))
      .collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      p <- Seq("mergee", "sor", "zzz")
      (v, f) <- vocab if lev(p, v) <= 1
    } yield (p, v, f, lev(p, v).toLong)).sortBy(t4 => (t4._1, t4._2))
    val got = out.map(r => (r.getAs[String]("probe"),
      r.getAs[String]("term"), r.getAs[Long]("freq"),
      r.getAs[Long]("dist"))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.forall(_._4 <= 1L))
    assert(!got.exists(_._1 == "zzz"))
  }

  test("k28: delete-vector plan conserves masses and flags correctly") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("k28_delete_vector_plan").collect()
    assert(out.nonEmpty && out.length <= 16)
    val docs = t(s, dir, "documents")
    assert(out.map(_.getAs[Long]("rows")).sum == docs.count())
    val totBytes = docs.agg(sum("n_chars")).collect()(0).getLong(0)
    assert(out.map(_.getAs[Long]("bytes")).sum == totBytes)
    out.foreach { r =>
      val (rows, dels) = (r.getAs[Long]("rows"), r.getAs[Long]("dels"))
      assert(dels >= 0 && dels <= rows)
      val live = (rows - dels) * 1000000L / rows
      assert(r.getAs[Long]("live_e6") == live)
      assert(r.getAs[Boolean]("rewrite") == (live < 900000L))
      if (live < 900000L)
        assert(r.getAs[Long]("rewrite_bytes") ==
          r.getAs[Long]("bytes") - r.getAs[Long]("dead_bytes"))
      else assert(r.getAs[Long]("rewrite_bytes") == 0L)
      assert(r.getAs[Long]("dead_bytes") <= r.getAs[Long]("bytes"))
    }
  }

  // ------------------------------------------------------------------
  // wave 32: att4 / hq6 / d12
  // ------------------------------------------------------------------

  test("att4: credited cents conserve the purchase mass exactly") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("att4_position_attribution").collect()
    assert(out.map(_.getAs[String]("channel")).toSet
      .subsetOf(Set("view", "click", "direct")))
    val credited = out.map(_.getAs[Long]("credited_cents")).sum
    val purchaseCents = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .agg(sum(floor(col("value") * 100).cast("long")))
      .collect()(0).getLong(0)
    assert(credited == purchaseCents)
  }

  test("att4: hand fixture — U-shape endpoints get 40%, middles split 20%") {
    val s = spark
    import s.implicits._
    // user A: purchase 1000c after 4 in-window touches → weights on
    // denominator 5(k−2)=10: oldest 4, newest 4, middles 1 each →
    // 400/100/100/400 exactly (no remainder)
    val rows = Seq(
      ("A", 1L, 1000L, "view", 0.0),
      ("A", 2L, 2000L, "click", 0.0),
      ("A", 3L, 3000L, "click", 0.0),
      ("A", 4L, 4000L, "view", 0.0),
      ("A", 5L, 5000L, "purchase", 10.0))
      .toDF("user_id", "event_id", "ep", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("ep")))
    val tmp = java.nio.file.Files.createTempDirectory("att4fix").toString
    rows.select("event_id", "user_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = graft.SparkEntry.queries("att4_position_attribution")(s, tmp)
      .collect().map(r => (r.getAs[String]("channel"),
        r.getAs[Long]("credited_cents"))).toMap
    // endpoints are views (t1 oldest, t4 newest): 400 + 400; middles are
    // clicks: 100 + 100
    assert(out("view") == 800L)
    assert(out("click") == 200L)
  }

  test("hq6: estimates match hand interpolation; exact counts are exact") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("hq6_histogram_estimator").collect()
    assert(out.map(_.getAs[Long]("g")).toSeq == Seq(1L, 2L, 3L, 4L))
    val cs = t(s, dir, "orders")
      .select(floor(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().map(_.getLong(0))
    val (mn, mx) = (cs.min, cs.max)
    val span = mx - mn + 1
    val hist = cs.groupBy(cv => math.min((cv - mn) * 16 / span, 15L))
      .view.mapValues(_.length.toLong).toMap
    out.foreach { r =>
      val (g, lo, hi) = (r.getAs[Long]("g"), r.getAs[Long]("lo"),
        r.getAs[Long]("hi"))
      assert(lo == mn + span * (g - 1) / 4 && hi == mn + span * g / 4)
      assert(r.getAs[Long]("act") ==
        cs.count(cv => cv >= lo && cv < hi).toLong)
      val est = (0L to 15L).map { b =>
        val (blo, bhi) = (mn + span * b / 16, mn + span * (b + 1) / 16)
        val ov = math.max(0L, math.min(hi, bhi) - math.max(lo, blo))
        ov * hist.getOrElse(b, 0L) / (bhi - blo)
      }.sum
      assert(r.getAs[Long]("est") == est)
    }
  }

  test("d12: fiscal periods have 4-4-5 week widths and conserve revenue") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("d12_fiscal_445").collect()
    // quarters map 3 periods each; period widths follow 4-4-5
    val widths = Map(1L -> 4L, 2L -> 4L, 3L -> 5L, 4L -> 4L, 5L -> 4L,
      6L -> 5L, 7L -> 4L, 8L -> 4L, 9L -> 5L, 10L -> 4L, 11L -> 4L,
      12L -> 5L)
    out.foreach { r =>
      val p = r.getAs[Long]("period")
      assert(p >= 1 && p <= 12)
      assert(r.getAs[Long]("quarter") == (p - 1) / 3 + 1)
      assert(widths(p) > 0) // period exists in the 4-4-5 pattern
    }
    val tot = t(s, dir, "orders")
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")),
        count(lit(1))).collect()(0)
    assert(out.map(_.getAs[Long]("revenue_cents")).sum == tot.getLong(0))
    assert(out.map(_.getAs[Long]("n_orders")).sum == tot.getLong(1))
    // brute-check one period assignment
    val d0 = t(s, dir, "orders").selectExpr(
      "CAST(datediff(to_date(o_orderdate), DATE '1991-12-30') AS LONG) AS d")
      .collect().map(_.getLong(0))
    val byP = d0.map { d =>
      val wiy = (d / 7) % 52
      ((d / 7) / 52,
        widths.keys.filter { p =>
          val bounds = Seq(0L, 4L, 8L, 13L, 17L, 21L, 26L, 30L, 34L, 39L,
            43L, 47L, 52L)
          wiy >= bounds(p.toInt - 1) && wiy < bounds(p.toInt)
        }.head)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_orders") ==
        byP((r.getAs[Long]("fy"), r.getAs[Long]("period"))))
    }
  }

  // ------------------------------------------------------------------
  // wave 33: cs39 / cs40 / w21
  // ------------------------------------------------------------------

  test("cs39: theil and atkinson match brute force and sit in range") {
    val s = spark
    import graft.queries.Tables.t
    val r = run("cs39_theil_index").collect()(0)
    val xs = t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("x"))
      .collect().map(q => (q.getLong(0), q.getLong(1)))
      .filter(_._2 > 0).sortBy(_._1)
    val n = xs.length
    val xt = xs.map(_._2).sum
    assert(r.getAs[Long]("n") == n.toLong)
    assert(r.getAs[Long]("total_cents") == xt)
    val ts = xs.map { case (_, x) =>
      (x * n / xt.toDouble) * math.log(x * n / xt.toDouble) }.sum
    val ls = xs.map(q => math.log(q._2.toDouble)).sum
    assert(r.getAs[Long]("theil_e6") ==
      math.floor(1.0e6 * (ts / n)).toLong)
    assert(r.getAs[Long]("atkinson_e6") ==
      math.floor(1.0e6 * (1.0 - math.exp(ls / n) / (xt.toDouble / n)))
        .toLong)
    assert(r.getAs[Long]("theil_e6") >= 0)
    val at = r.getAs[Long]("atkinson_e6")
    assert(at >= 0 && at <= 1000000L)
  }

  test("cs40: chi2 matches a brute-force full-grid recount") {
    val s = spark
    import graft.queries.Tables.t
    val r = run("cs40_cramers_v").collect()(0)
    val d = t(s, dir, "documents").select("source", "lang").collect()
      .map(q => (q.getString(0), q.getString(1)))
    val st = d.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cl = d.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val sl = d.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = d.length.toLong
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("r") == st.size.toLong)
    assert(r.getAs[Long]("c") == cl.size.toLong)
    assert(r.getAs[Long]("dof") ==
      (st.size - 1).toLong * (cl.size - 1).toLong)
    val chi2 = (for {
      (sk, rt) <- st.toSeq.sortBy(_._1)
      (lk, ct) <- cl.toSeq.sortBy(_._1)
    } yield {
      val e = rt * ct / n.toDouble
      val dev = sl.getOrElse((sk, lk), 0L).toDouble - e
      dev * dev / e
    }).sum
    assert(r.getAs[Long]("chi2_e6") == math.floor(1.0e6 * chi2).toLong)
    val v = r.getAs[Long]("v_e6")
    assert(v >= 0 && v <= 1000000L)
  }

  test("w21: deciles match a brute-force ranked-delay replay") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("w21_conversion_delay").collect()
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        col("ts").cast("long").as("sec"))
      .collect().map(q => (q.getLong(0), q.getString(1), q.getLong(2)))
    val v0 = ev.filter(_._2 == "view").groupBy(_._1).view
      .mapValues(_.map(_._3).min).toMap
    val p0 = ev.filter(_._2 == "purchase").groupBy(_._1).view
      .mapValues(_.map(_._3).min).toMap
    val delays = v0.keySet.intersect(p0.keySet).toSeq
      .map(u => (u, p0(u) - v0(u))).filter(_._2 >= 0)
      .sortBy(p => (p._2, p._1)).map(_._2)
    val n = delays.length.toLong
    assert(out.forall(_.getAs[Long]("n_converted") == n))
    out.foreach { r =>
      val k = r.getAs[Long]("k")
      val rank = (k * n + 9) / 10
      assert(r.getAs[Long]("rank") == rank)
      assert(r.getAs[Long]("delay_s") == delays((rank - 1).toInt))
    }
    // deciles are monotone
    val ds = out.sortBy(_.getAs[Long]("k")).map(_.getAs[Long]("delay_s"))
    assert(ds.toSeq == ds.toSeq.sorted)
  }

  // ------------------------------------------------------------------
  // wave 34: j14 / ts16 / cs41
  // ------------------------------------------------------------------

  test("j14: nearest pick matches a brute-force both-direction scan") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("j14_nearest_asof").collect()
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("long").as("sec"), round(col("value"), 4).as("v"))
      .collect().map(q => (q.getLong(0), q.getLong(1), q.getString(2),
        q.getLong(3), q.getDouble(4)))
    // dedupe views per (user, sec) keeping min event_id
    val views = ev.filter(_._3 == "view").groupBy(p => (p._1, p._4)).view
      .mapValues(_.minBy(_._2)).values.toSeq
    val byUser = views.groupBy(_._1)
    val purchases = ev.filter(_._3 == "purchase")
    val expected = purchases.flatMap { p =>
      byUser.get(p._1).map { vs =>
        // nearest by |Δ|, tie to the EARLIER view time
        val best = vs.minBy(v => (math.abs(v._4 - p._4), v._4))
        (p._2, best._4, best._5, math.abs(best._4 - p._4),
          if (best._4 <= p._4) "prev" else "next")
      }
    }.sortBy(_._1)
    val got = out.map(r => (r.getAs[Long]("event_id"),
      r.getAs[Long]("vt"), r.getAs[Double]("view_value"),
      r.getAs[Long]("dist_s"), r.getAs[String]("matched_dir"))).toSeq
    assert(got == expected.toSeq)
  }

  test("ts16: best split matches a brute-force SSE sweep") {
    val s = spark
    import graft.queries.Tables.t
    val r = run("ts16_binary_segmentation").collect()(0)
    val ys = t(s, dir, "orders")
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
        .cast("long").as("d"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("y"))
      .collect().map(q => (q.getLong(0), q.getLong(1))).sortBy(_._1)
    val n = ys.length
    val sn = ys.map(_._2).sum
    var sk = 0L
    val gains = (1 until n).map { k =>
      sk += ys(k - 1)._2
      (k.toLong, sk.toDouble * sk / k + (sn - sk).toDouble * (sn - sk) /
        (n - k) - sn.toDouble * sn / n)
    }
    val (bestK, bestGain) = gains.maxBy(g => (g._2, -g._1))
    assert(r.getAs[Long]("n_days") == n.toLong)
    assert(r.getAs[Long]("best_k") == bestK)
    assert(r.getAs[Long]("gain_cents2") == math.floor(bestGain).toLong)
    assert(r.getAs[Long]("split_d") == ys(bestK.toInt - 1)._1)
    assert(bestGain >= 0.0) // a split never increases SSE
  }

  test("cs41: decomposition identity T = T_between + Σ share·T_within") {
    val out = run("cs41_theil_decomposition").collect()
    assert(out.nonEmpty)
    val tb = out(0).getAs[Long]("theil_between_e6")
    val tt = out(0).getAs[Long]("theil_total_e6")
    assert(out.forall(_.getAs[Long]("theil_between_e6") == tb))
    // Σ share·within + between ≈ total (floored parts → small slack)
    val mix = out.map { r =>
      (r.getAs[Long]("spend_cents").toDouble /
        out.map(_.getAs[Long]("spend_cents")).sum) *
        r.getAs[Long]("theil_within_e6")
    }.sum + tb
    assert(math.abs(mix - tt) <= out.length + 2)
    // shares sum to ~1
    val shares = out.map(_.getAs[Long]("share_e6")).sum
    assert(shares >= 1000000L - out.length && shares <= 1000000L)
    out.foreach(r => assert(r.getAs[Long]("theil_within_e6") >= -1))
  }

  // ------------------------------------------------------------------
  // wave 35: gr17 / ml15 / w22
  // ------------------------------------------------------------------

  test("gr17: boruvka phase matches a brute-force min-edge pick") {
    val s = spark
    import graft.queries.Tables.t
    val r = run("gr17_boruvka_phase").collect()(0)
    val edges = graft.operators.Components
      .docGraph(t(s, dir, "documents"))
      .collect().map(q => (q.getLong(0), q.getLong(1)))
    def wt(u: Long, v: Long): Long = ((u + v) * 31 + u * v) % 997 + 1
    val pick = edges.groupBy(_._1).map { case (a, es) =>
      val (_, b) = es.map(e => (wt(e._1, e._2), e._2)).min
      (math.min(a, b), math.max(a, b), wt(a, b))
    }.toSet
    assert(r.getAs[Long]("n_picked_edges") == pick.size.toLong)
    assert(r.getAs[Long]("picked_weight") == pick.toSeq.map(_._3).sum)
    val nodes = edges.map(_._1).toSet
    assert(r.getAs[Long]("n_nodes") == nodes.size.toLong)
    // union-find over picked edges → component count
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n).toSeq: _*)
    def find(x: Long): Long = {
      var c = x; while (parent(c) != c) c = parent(c); c
    }
    pick.foreach { case (u, v, _) => parent(find(u)) = find(v) }
    val nc = nodes.map(find).size
    assert(r.getAs[Long]("n_components_after") == nc.toLong)
    // every node picked an edge, so each component has ≥ 2 nodes
    assert(nc.toLong * 2 <= r.getAs[Long]("n_nodes"))
  }

  test("ml15: KS matches a brute-force CDF sweep and bounds the gate") {
    val s = spark
    import graft.queries.Tables.t
    val r = run("ml15_score_ks").collect()(0)
    val sc = graft.operators.Classifier.logRegScores(
      t(s, dir, "documents"), "doc_id", "text",
      label = when(col("source") === "src0", 1.0).otherwise(0.0),
      dims = 32, iters = 3, lr = 0.5)
      .select("score", "label").collect()
      .map(q => (q.getDouble(0), q.getInt(1)))
    val np = sc.count(_._2 == 1).toLong
    val nq = sc.count(_._2 == 0).toLong
    val scores = sc.map(_._1).distinct.sorted
    var (cp, cq) = (0L, 0L)
    val best = scores.map { t0 =>
      cp += sc.count(p => p._1 == t0 && p._2 == 1)
      cq += sc.count(p => p._1 == t0 && p._2 == 0)
      (math.abs(cp * nq - cq * np), t0)
    }.maxBy(p => (p._1, -p._2))
    assert(r.getAs[Long]("n_pos") == np && r.getAs[Long]("n_neg") == nq)
    assert(r.getAs[Double]("ks_threshold") == best._2)
    assert(r.getAs[Long]("ks_e6") == best._1 * 1000000L / (np * nq))
    assert(r.getAs[Long]("ks_e6") >= 0L &&
      r.getAs[Long]("ks_e6") <= 1000000L)
  }

  test("w22: gap histogram matches a brute-force lag replay") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("w22_gap_histogram").collect()
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts").cast("long").as("sec"))
      .collect().map(q => (q.getLong(0), q.getString(1), q.getLong(2),
        q.getLong(3)))
    val brute = ev.groupBy(p => (p._1, p._2)).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._4, e._3)).toSeq.sliding(2).collect {
        case Seq(a, b) => (b._2, b._4 - a._4)
      }.toSeq
    }.map { case (et, gap) =>
      (et, if (gap <= 0) 0L
      else 63L - java.lang.Long.numberOfLeadingZeros(gap))
    }.groupBy(p => p).view.mapValues(_.length.toLong).toMap
    val got = out.map(r => ((r.getAs[String]("event_type"),
      r.getAs[Long]("bucket")), r.getAs[Long]("n_gaps"))).toMap
    assert(got == brute)
    // masses: every same-(user,type) consecutive pair contributes one gap
    val expTotal = ev.groupBy(p => (p._1, p._2)).values
      .map(_.size - 1).sum.toLong
    assert(out.map(_.getAs[Long]("n_gaps")).sum == expTotal)
  }

  // ------------------------------------------------------------------
  // wave 36: cs42 / ol7 / sa16
  // ------------------------------------------------------------------

  test("cs42: mood cells match a brute-force pooled-median recount") {
    val s = spark
    import graft.queries.Tables.t
    val r = run("cs42_mood_median").collect()(0)
    val rows = t(s, dir, "orders")
      .join(t(s, dir, "customer").select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment").as("seg")), "o_custkey")
      .select(col("seg"), col("o_orderkey"),
        floor(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().map(q => (q.getString(0), q.getLong(1), q.getLong(2)))
    val n = rows.length
    val med = rows.map(q => (q._3, q._2)).sorted.apply((n + 1) / 2 - 1)._1
    assert(r.getAs[Long]("n") == n.toLong)
    assert(r.getAs[Long]("n_above") == rows.count(_._3 > med).toLong)
    assert(r.getAs[Long]("n_groups") ==
      rows.map(_._1).distinct.length.toLong)
    assert(r.getAs[Long]("dof") == r.getAs[Long]("n_groups") - 1)
    assert(r.getAs[Long]("chi2_e6") >= 0L)
    // brute chi2
    val a = rows.count(_._3 > med).toLong
    val chi2 = rows.groupBy(_._1).values.map { g =>
      val (ng, ag) = (g.size.toLong, g.count(_._3 > med).toLong)
      val e = ng * a / n.toDouble
      (ag - e) * (ag - e) / (e * (1.0 - a / n.toDouble))
    }.sum
    assert(math.abs(r.getAs[Long]("chi2_e6") -
      math.floor(1.0e6 * chi2).toLong) <= 1) // fold order slack
  }

  test("ol7: masses conserve and clusters respect the core threshold") {
    val s = spark
    import graft.queries.Tables.t
    val r = run("ol7_grid_dbscan").collect()(0)
    val docs = t(s, dir, "documents")
      .selectExpr("n_chars div 50L AS cx",
        "CAST(size(split(text, ' ')) AS LONG) div 10L AS cy")
      .collect().map(q => (q.getLong(0), q.getLong(1)))
    val cells = docs.groupBy(p => p).view.mapValues(_.length.toLong).toMap
    assert(r.getAs[Long]("n_cells_total") == cells.size.toLong)
    val core = cells.filter(_._2 >= 5L)
    assert(r.getAs[Long]("n_core_cells") == core.size.toLong)
    val coreDocs = core.values.sum
    assert(r.getAs[Long]("noise_docs") == docs.length.toLong - coreDocs)
    if (core.nonEmpty) {
      // union-find over the 8-neighborhood
      val keys = core.keys.toSeq
      val parent = scala.collection.mutable.Map(keys.map(k => k -> k): _*)
      def find(x: (Long, Long)): (Long, Long) = {
        var c = x; while (parent(c) != c) c = parent(c); c
      }
      for (a <- keys; bq <- keys
           if a != bq && math.abs(a._1 - bq._1) <= 1 &&
             math.abs(a._2 - bq._2) <= 1)
        parent(find(a)) = find(bq)
      val comps = keys.groupBy(find)
      assert(r.getAs[Long]("n_clusters") == comps.size.toLong)
      assert(r.getAs[Long]("largest_cells") ==
        comps.values.map(_.size.toLong).max)
      assert(r.getAs[Long]("largest_docs") ==
        comps.values.map(_.map(core).sum).max)
      assert(r.getAs[Long]("core_frac_e6") ==
        coreDocs * 1000000L / docs.length)
    }
  }

  test("sa16: systematic sample matches a brute-force hash-rank replay") {
    val s = spark
    import graft.queries.Tables.t
    val r = run("sa16_systematic_sample").collect()(0)
    val d = t(s, dir, "documents")
      .selectExpr("doc_id", "n_chars",
        "md5(CAST(CAST(doc_id AS STRING) AS BINARY)) AS h")
      .collect().map(q => (q.getLong(0), q.getLong(1), q.getString(2)))
    val ranked = d.sortBy(q => (q._3, q._1))
    val samp = ranked.zipWithIndex.filter(_._2 % 16 == 0).map(_._1)
    assert(r.getAs[Long]("n_pop") == d.length.toLong)
    assert(r.getAs[Long]("n_sample") == samp.length.toLong)
    assert(r.getAs[Long]("sample_mean_e6") ==
      samp.map(_._2).sum * 1000000L / samp.length)
    assert(r.getAs[Long]("pop_mean_e6") ==
      d.map(_._2).sum * 1000000L / d.length)
    assert(r.getAs[Long]("bias_e6") ==
      r.getAs[Long]("sample_mean_e6") - r.getAs[Long]("pop_mean_e6"))
    // systematic interval: sample is ~1/16 of the population
    assert(samp.length == (d.length + 15) / 16)
  }

  // ------------------------------------------------------------------
  // wave 37: ts17 / cs44 / a15
  // ------------------------------------------------------------------

  test("ts17: rolling beta matches a brute-force windowed OLS") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("ts17_rolling_beta").collect()
    assert(out.nonEmpty)
    val daily = t(s, dir, "orders")
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
        .cast("long").as("d"))
      .agg(
        coalesce(sum(when(col("o_orderpriority") === "5-LOW",
          floor(col("o_totalprice") * 100).cast("long"))), lit(0L))
          .as("x"),
        coalesce(sum(when(col("o_orderpriority") === "1-URGENT",
          floor(col("o_totalprice") * 100).cast("long"))), lit(0L))
          .as("y"))
      .collect().map(q => (q.getLong(0), q.getLong(1), q.getLong(2)))
      .sortBy(_._1)
    out.foreach { r =>
      val d0 = r.getAs[Long]("d")
      val win = daily.filter(p => p._1 >= d0 - 29 && p._1 <= d0)
      assert(r.getAs[Long]("n") == win.length.toLong)
      val n = win.length
      val sx = win.map(p => BigInt(p._2)).sum
      val sy = win.map(p => BigInt(p._3)).sum
      val sxx = win.map(p => BigInt(p._2) * p._2).sum
      val sxy = win.map(p => BigInt(p._2) * p._3).sum
      if (n * sxx == sx * sx) assert(r.isNullAt(r.fieldIndex("beta_e6")))
      else {
        val beta = (n * sxy - sx * sy).toDouble /
          (n * sxx - sx * sx).toDouble
        assert(r.getAs[Long]("beta_e6") == math.floor(1.0e6 * beta).toLong)
      }
      assert(d0 % 30 == 0 && n >= 10)
    }
  }

  test("cs44: elasticity matches a brute-force log-log OLS") {
    val s = spark
    import graft.queries.Tables.t
    val r = run("cs44_price_elasticity").collect()(0)
    val wkly = t(s, dir, "lineitem")
      .join(t(s, dir, "part").filter(col("p_brand") === "Brand#13")
        .select(col("p_partkey").as("l_partkey")), "l_partkey")
      .groupBy(datediff(to_date(col("l_shipdate")), lit("1992-01-01"))
        .cast("long").divide(lit(7)).cast("long").as("wk"))
      .agg(sum(floor(col("l_quantity")).cast("long")).as("q"),
        sum(floor(col("l_extendedprice") * 100).cast("long")).as("p"))
      .collect().map(q => (q.getLong(0), q.getLong(1), q.getLong(2)))
      .filter(q => q._2 > 0 && q._3 > 0).sortBy(_._1)
    val n = wkly.length
    assert(r.getAs[Long]("n") == n.toLong)
    val lx = wkly.map(q => math.log(q._3 / q._2.toDouble))
    val ly = wkly.map(q => math.log(q._2.toDouble))
    val (sx, sy) = (lx.sum, ly.sum)
    val sxx = lx.map(v => v * v).sum
    val sxy = lx.zip(ly).map(p => p._1 * p._2).sum
    val el = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(r.getAs[Long]("elasticity_e6") == math.floor(1.0e6 * el).toLong)
  }

  test("a15: month-end balances carry forward and end at total revenue") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("a15_semi_additive_balance").collect()
      .sortBy(_.getAs[Long]("m"))
    assert(out.nonEmpty)
    // customers-known count is non-decreasing (first-activity onward)
    val ncs = out.map(_.getAs[Long]("n_customers")).toSeq
    assert(ncs == ncs.sorted)
    // total balance is non-decreasing (balances only accumulate)
    val tots = out.map(_.getAs[Long]("total_balance_cents")).toSeq
    assert(tots == tots.sorted)
    // final month: every customer's full history → Σ all order cents
    val totalRevenue = t(s, dir, "orders")
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")))
      .collect()(0).getLong(0)
    assert(tots.last == totalRevenue)
    val nCust = t(s, dir, "orders").select("o_custkey").distinct().count()
    assert(ncs.last == nCust)
  }

  // ------------------------------------------------------------------
  // wave 38: cs45 / w24 / gr19
  // ------------------------------------------------------------------

  test("cs45: shares sum to 1e6 per year and swings match a replay") {
    val out = run("cs45_share_shift").collect()
    assert(out.nonEmpty)
    val byYear = out.groupBy(_.getAs[Long]("yr"))
    byYear.foreach { case (_, rows) =>
      val tot = rows.map(_.getAs[Long]("share_e6")).sum
      // floored scaled shares: Σ within (1e6 − #nations, 1e6]
      assert(tot > 1000000L - rows.length && tot <= 1000000L)
    }
    out.groupBy(_.getAs[String]("nation")).foreach { case (_, rows) =>
      val seq = rows.sortBy(_.getAs[Long]("yr"))
      val swings = seq.sliding(2).collect { case Array(a, b) =>
        math.abs(b.getAs[Long]("share_e6") - a.getAs[Long]("share_e6"))
      }.toSeq
      seq.tail.zip(swings).foreach { case (r, sw) =>
        assert(r.getAs[Long]("swing_e6") == sw)
      }
      assert(seq.head.getAs[Long]("swing_e6") == -1L)
      if (swings.nonEmpty)
        assert(seq.map(_.getAs[Long]("max_swing_e6")).toSet ==
          Set(swings.max))
    }
  }

  test("w24: cutoffs match a brute-force cumulative-share scan") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("w24_pareto_cutoffs").collect()
    assert(out.map(_.getAs[Long]("pct")).toSeq == Seq(50L, 80L, 90L))
    val xs = t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("x"))
      .collect().map(q => (q.getLong(0), q.getLong(1)))
      .sortBy(p => (-p._2, p._1)).map(_._2)
    val total = xs.sum
    out.foreach { r =>
      val pct = r.getAs[Long]("pct")
      var cum = 0L
      val nTop = xs.indexWhere { v => cum += v; cum * 100 >= total * pct } + 1
      assert(r.getAs[Long]("n_top") == nTop.toLong)
      assert(r.getAs[Long]("n_customers") == xs.length.toLong)
      assert(r.getAs[Long]("top_frac_e6") ==
        nTop.toLong * 1000000L / xs.length)
    }
    // monotone: higher coverage needs at least as many customers
    val tops = out.sortBy(_.getAs[Long]("pct")).map(_.getAs[Long]("n_top"))
    assert(tops.toSeq == tops.toSeq.sorted)
  }

  test("gr19: layers match a brute-force bounded longest-path") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("gr19_dag_layers").collect()
    val ids = t(s, dir, "documents").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val memo = scala.collection.mutable.Map[Long, Long]()
    def depth(n: Long): Long = memo.getOrElseUpdate(n, {
      // children of n via edges n→n/2 (n≥2), n→n/3 (n≥3)
      val kids = Seq(
        if (n >= 2 && ids.contains(n / 2)) Some(n / 2) else None,
        if (n >= 3 && ids.contains(n / 3)) Some(n / 3) else None).flatten
      if (kids.isEmpty) 0L else kids.map(c => depth(c) + 1).max
    })
    val hist = ids.toSeq.map(n => math.min(depth(n), 10L))
      .groupBy(identity(_)).view.mapValues(_.size.toLong).toMap
    val got = out.map(r => (r.getAs[Long]("layer"),
      r.getAs[Long]("n_nodes"))).toMap
    assert(got == hist)
    assert(out.map(_.getAs[Long]("n_nodes")).sum == ids.size.toLong)
    assert(out.forall(_.getAs[Long]("height") == hist.keys.max))
  }

  // ------------------------------------------------------------------
  // wave 39: tx27 / w25 / ol8
  // ------------------------------------------------------------------

  test("tx27: bigram entropy matches brute force and bounds hold") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("tx27_char_bigram_entropy").collect()
    val docs = t(s, dir, "documents").select("source", "text").collect()
      .map(q => (q.getString(0), q.getString(1)))
    val bySource = docs.groupBy(_._1)
    assert(out.map(_.getAs[String]("source")).toSet == bySource.keySet)
    out.foreach { r =>
      val texts = bySource(r.getAs[String]("source")).map(_._2)
      val bigrams = texts.flatMap(tx => tx.sliding(2).filter(_.length == 2))
      val nt = bigrams.length.toLong
      assert(r.getAs[Long]("n_bigrams") == nt)
      val byPair = bigrams.groupBy(identity(_)).view
        .mapValues(_.length.toLong).toMap
      val byC = bigrams.groupBy(_.charAt(0)).view
        .mapValues(_.length.toLong).toMap
      val h = byPair.map { case (bg, n) =>
        -(n / nt.toDouble) * math.log(n / byC(bg.charAt(0)).toDouble)
      }.sum / math.log(2.0)
      // fold order differs from the Map sum → ±1 ulp slack at e6 scale
      assert(math.abs(r.getAs[Long]("h_bits_e6") -
        math.floor(1.0e6 * h).toLong) <= 1)
      assert(r.getAs[Long]("h_bits_e6") >= 0)
    }
  }

  test("w25: to-date totals match a brute-force calendar replay") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("w25_period_to_date").collect()
    assert(out.nonEmpty)
    val daily = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("dt"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("y"))
      .selectExpr("CAST(datediff(dt, DATE '1992-01-01') AS LONG) AS d",
        "CAST(year(dt) AS LONG) AS yr", "CAST(quarter(dt) AS LONG) AS q",
        "CAST(month(dt) AS LONG) AS mo", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    out.foreach { r =>
      val d0 = r.getAs[Long]("d")
      val me = daily.find(_._1 == d0).get
      assert(r.getAs[Long]("day_cents") == me._5)
      def td(f: ((Long, Long, Long, Long, Long)) => Boolean) =
        daily.filter(p => f(p) && p._1 <= d0).map(_._5).sum
      assert(r.getAs[Long]("mtd") ==
        td(p => p._2 == me._2 && p._4 == me._4))
      assert(r.getAs[Long]("qtd") ==
        td(p => p._2 == me._2 && p._3 == me._3))
      assert(r.getAs[Long]("ytd") == td(p => p._2 == me._2))
      // ordering law: MTD ≤ QTD ≤ YTD
      assert(r.getAs[Long]("mtd") <= r.getAs[Long]("qtd") &&
        r.getAs[Long]("qtd") <= r.getAs[Long]("ytd"))
    }
  }

  test("ol8: locations match brute force and order sensibly") {
    val s = spark
    import graft.queries.Tables.t
    val r = run("ol8_robust_locations").collect()(0)
    val cs = t(s, dir, "orders")
      .select(col("o_orderkey"), floor(col("o_totalprice") * 100)
        .cast("long").as("c"))
      .collect().map(q => (q.getLong(1), q.getLong(0)))
      .sorted.map(_._1)
    val n = cs.length
    val lo = n / 10
    val hi = n - n / 10
    assert(r.getAs[Long]("n") == n.toLong)
    assert(r.getAs[Long]("mean_e6") ==
      (cs.map(BigInt(_)).sum * 1000000 / n).toLong)
    val trimmed = cs.slice(lo, hi)
    assert(r.getAs[Long]("trimmed_e6") ==
      (trimmed.map(BigInt(_)).sum * 1000000 / trimmed.length).toLong)
    val win = cs.map(v => math.max(cs(lo), math.min(cs(hi - 1), v)))
    assert(r.getAs[Long]("winsorized_e6") ==
      (win.map(BigInt(_)).sum * 1000000 / n).toLong)
    assert(r.getAs[Long]("median_e6") == cs((n + 1) / 2 - 1) * 1000000L)
    // all four locations live inside the data range
    Seq("mean_e6", "trimmed_e6", "winsorized_e6", "median_e6").foreach {
      cname =>
        val v = r.getAs[Long](cname)
        assert(v >= cs.head * 1000000L && v <= cs.last * 1000000L)
    }
  }

  // ------------------------------------------------------------------
  // wave 40: f13 / cs46 / k32
  // ------------------------------------------------------------------

  test("f13: luhn validity matches a digit-by-digit recount") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("f13_luhn_audit").collect()
    assert(out.length == 10)
    def luhnSum(num: String): Int =
      num.reverse.zipWithIndex.map { case (ch, i) =>
        val d0 = ch - '0'
        if (i % 2 == 1) { val x = 2 * d0; if (x > 9) x - 9 else x }
        else d0
      }.sum
    val keys = t(s, dir, "orders").select("o_orderkey").collect()
      .map(_.getLong(0))
    val nums = keys.map(k => (k, f"$k%012d"))
    val nValid = nums.count(p => luhnSum(p._2) % 10 == 0).toLong
    out.foreach { r =>
      val num = r.getAs[String]("num")
      val ds = luhnSum(num)
      assert(r.getAs[Boolean]("luhn_valid") == (ds % 10 == 0))
      val wc = (10 - (ds - (num.charAt(11) - '0')) % 10) % 10
      assert(r.getAs[Long]("would_check") == wc.toLong)
      // replacing the last digit with would_check validates the number
      val fixed = num.take(11) + wc.toString
      assert(luhnSum(fixed) % 10 == 0)
      assert(r.getAs[Long]("n") == keys.length.toLong)
      assert(r.getAs[Long]("n_valid") == nValid)
    }
    assert(out.map(_.getAs[Long]("o_orderkey")).toSeq ==
      keys.sorted.take(10).toSeq)
  }

  test("cs46: dispersion matches a zero-inclusive calendar recount") {
    val s = spark
    import graft.queries.Tables.t
    val r = run("cs46_arrival_dispersion").collect()(0)
    val daily = t(s, dir, "orders")
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
        .cast("long").as("d"))
      .agg(count(lit(1)).as("c"))
      .collect().map(q => (q.getLong(0), q.getLong(1)))
    val nDays = daily.map(_._1).max - daily.map(_._1).min + 1
    val sSum = daily.map(_._2).sum
    val ss = daily.map(q => q._2 * q._2).sum
    assert(r.getAs[Long]("n_days") == nDays)
    assert(r.getAs[Long]("active_days") == daily.length.toLong)
    assert(r.getAs[Long]("n_orders") == sSum)
    assert(r.getAs[Long]("dispersion_e6") ==
      1000000L * (nDays * ss - sSum * sSum) / ((nDays - 1) * sSum))
    assert(r.getAs[Long]("mean_per_day_e6") == sSum * 1000000L / nDays)
  }

  test("k32: amplification masses agree with k28's file layout") {
    val out = run("k32_cow_vs_mor").collect()(0)
    val files = run("k28_delete_vector_plan").collect()
    assert(out.getAs[Long]("n_files") == files.length.toLong)
    assert(out.getAs[Long]("touched_files") ==
      files.count(_.getAs[Long]("dels") > 0).toLong)
    assert(out.getAs[Long]("total_bytes") ==
      files.map(_.getAs[Long]("bytes")).sum)
    assert(out.getAs[Long]("mor_dead_bytes") ==
      files.map(_.getAs[Long]("dead_bytes")).sum)
    assert(out.getAs[Long]("cow_write_bytes") ==
      files.filter(_.getAs[Long]("dels") > 0)
        .map(f => f.getAs[Long]("bytes") - f.getAs[Long]("dead_bytes"))
        .sum)
    // CoW moves live bytes of touched files; MoR scans only dead bytes —
    // both amplifications are shares of the same total
    assert(out.getAs[Long]("cow_amp_e6") <= 1000000L)
    assert(out.getAs[Long]("mor_amp_e6") <= 1000000L)
  }

  // ------------------------------------------------------------------
  // wave 41: d13 / ts18 / cs47
  // ------------------------------------------------------------------

  test("d13: business-day lags match a walk-the-calendar recount") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("d13_business_day_lag").collect()
    val li = t(s, dir, "lineitem")
      .join(t(s, dir, "orders").select(col("o_orderkey").as("l_orderkey"),
        to_date(col("o_orderdate")).as("od")), "l_orderkey")
      .selectExpr("CAST(datediff(od, DATE '1992-01-01') AS LONG) AS d0",
        "CAST(datediff(to_date(l_shipdate), DATE '1992-01-01') AS LONG) " +
          "AS d1")
      .collect().map(q => (q.getLong(0), q.getLong(1)))
      .filter(p => p._2 >= p._1)
    // literal day walk: count weekdays in [d0, d1)
    val brute = li.map { case (d0, d1) =>
      (d0 until d1).count(d => (d + 2) % 7 < 5).toLong
    }.groupBy(identity(_)).view.mapValues(_.length.toLong).toMap
    val got = out.map(r => (r.getAs[Long]("bdays"),
      r.getAs[Long]("n_lineitems"))).toMap
    assert(got == brute)
    assert(out.map(_.getAs[Long]("n_lineitems")).sum == li.length.toLong)
  }

  test("ts18: inflection count matches a brute-force diff replay") {
    val s = spark
    import graft.queries.Tables.t
    val r = run("ts18_revenue_inflections").collect()(0)
    val ys = t(s, dir, "orders")
      .groupBy(expr("(year(to_date(o_orderdate)) - 1992) * 12 + " +
        "month(to_date(o_orderdate)) - 1").cast("long").as("m"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("y"))
      .collect().map(q => (q.getLong(0), q.getLong(1))).sortBy(_._1)
    val vel = ys.sliding(2).map(p => p(1)._2 - p(0)._2).toSeq
    val acc = vel.sliding(2).map(p => p(1) - p(0)).toSeq
    val infl = acc.sliding(2).count(p => p(0) * p(1) < 0).toLong
    assert(r.getAs[Long]("n_months") == ys.length.toLong)
    assert(r.getAs[Long]("n_inflections") == infl)
    assert(r.getAs[Long]("n_up_months") == vel.count(_ > 0).toLong)
    assert(r.getAs[Long]("last_m") == ys.last._1)
    assert(r.getAs[Long]("last_trend") == vel.last.signum.toLong)
  }

  test("cs47: trimmed means and t match a brute-force recount") {
    val s = spark
    import graft.queries.Tables.t
    val r = run("cs47_yuen_trimmed_t").collect()(0)
    val rows = t(s, dir, "orders")
      .join(t(s, dir, "customer").select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment").as("seg")), "o_custkey")
      .filter(col("seg").isin("BUILDING", "MACHINERY"))
      .select(col("seg"), col("o_orderkey"),
        floor(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().map(q => (q.getString(0), q.getLong(1), q.getLong(2)))
    def segStats(name: String): (Long, Long, Long, Double) = {
      val cs = rows.filter(_._1 == name).map(q => (q._3, q._2))
        .sorted.map(_._1)
      val n = cs.length
      val (lo, hi) = (n / 10, n - n / 10)
      val tmean = cs.slice(lo, hi).map(BigInt(_)).sum * 1000000 /
        (hi - lo)
      val wc = cs.map(v => math.max(cs(lo), math.min(cs(hi - 1), v)))
      val ws = wc.map(BigInt(_)).sum
      val wss = wc.map(v => BigInt(v) * v).sum
      val wvar = (n * wss - ws * ws).toDouble / (n.toDouble * (n - 1))
      (n.toLong, (hi - lo).toLong, tmean.toLong, wvar)
    }
    val (na, ha, ta, va) = segStats("BUILDING")
    val (nb, hb, tb, vb) = segStats("MACHINERY")
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    assert(r.getAs[Long]("tmean_a_e6") == ta)
    assert(r.getAs[Long]("tmean_b_e6") == tb)
    val tstat = ((ta - tb).toDouble / 1.0e6) /
      math.sqrt((na - 1) * va / (ha.toDouble * (ha - 1)) +
        (nb - 1) * vb / (hb.toDouble * (hb - 1)))
    assert(r.getAs[Long]("t_e6") == math.floor(1.0e6 * tstat).toLong)
  }

  // ------------------------------------------------------------------
  // wave 42: w26 / cs48 / mb5
  // ------------------------------------------------------------------

  test("w26: control-chart stats match a brute-force replay") {
    val s = spark
    import graft.queries.Tables.t
    val r = run("w26_xmr_control_chart").collect()(0)
    val ys = t(s, dir, "orders")
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
        .cast("long").as("d"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("y"))
      .collect().map(q => (q.getLong(0), q.getLong(1))).sortBy(_._1)
      .map(_._2)
    val n = ys.length
    val center = ys.map(BigInt(_)).sum.toDouble / n
    val mrbar = ys.sliding(2).map(p => math.abs(p(1) - p(0)).toDouble)
      .sum / (n - 1)
    val (ucl, lcl) = (center + 2.66 * mrbar, center - 2.66 * mrbar)
    assert(r.getAs[Long]("n_days") == n.toLong)
    assert(r.getAs[Long]("n_above_ucl") == ys.count(_ > ucl).toLong)
    assert(r.getAs[Long]("n_below_lcl") == ys.count(_ < lcl).toLong)
    assert(r.getAs[Long]("center_cents") == math.floor(center).toLong)
    // longest run strictly above center
    var (best, cur) = (0L, 0L)
    ys.foreach { y =>
      if (y > center) { cur += 1; best = math.max(best, cur) }
      else cur = 0
    }
    assert(r.getAs[Long]("longest_run_above") == best)
    assert(r.getAs[Long]("lcl_cents") < r.getAs[Long]("center_cents") &&
      r.getAs[Long]("center_cents") < r.getAs[Long]("ucl_cents"))
  }

  test("cs48: hill estimator matches a brute-force top-k fold") {
    val s = spark
    import graft.queries.Tables.t
    val r = run("cs48_hill_tail_index").collect()(0)
    val cs = t(s, dir, "orders")
      .select(col("o_orderkey"), floor(col("o_totalprice") * 100)
        .cast("long").as("c"))
      .collect().map(q => (q.getLong(1), q.getLong(0)))
      .sortBy(p => (-p._1, p._2)).map(_._1)
    val k = 128
    val pivot = cs(k)
    assert(r.getAs[Long]("pivot_cents") == pivot)
    val hsum = cs.take(k).map(c => math.log(c / pivot.toDouble)).sum
    assert(r.getAs[Long]("hill_inv_e6") ==
      math.floor(1.0e6 * (hsum / k)).toLong)
    assert(r.getAs[Long]("alpha_e6") ==
      math.floor(1.0e6 * (k / hsum)).toLong)
    assert(r.getAs[Long]("alpha_e6") > 0)
  }

  test("mb5: ABC classes partition parts and respect cumulative bounds") {
    val s = spark
    import graft.queries.Tables.t
    val out = run("mb5_abc_classification").collect()
    val pr = t(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).as("r"))
      .collect().map(q => (q.getLong(0), q.getLong(1)))
      .sortBy(p => (-p._2, p._1))
    val tot = pr.map(_._2).sum
    var cum = 0L
    val brute = pr.map { case (_, rev) =>
      val before = cum; cum += rev
      if (before * 100 < tot * 80) "A"
      else if (before * 100 < tot * 95) "B" else "C"
    }.groupBy(identity(_)).view.mapValues(_.size.toLong).toMap
    val got = out.map(r => (r.getAs[String]("abc"),
      r.getAs[Long]("n_parts"))).toMap
    assert(got == brute)
    assert(out.map(_.getAs[Long]("n_parts")).sum == pr.length.toLong)
    assert(out.map(_.getAs[Long]("class_rev")).sum == tot)
    // A carries the largest share per construction
    val shares = out.map(r => r.getAs[String]("abc") ->
      r.getAs[Long]("rev_share_e6")).toMap
    assert(shares("A") >= shares.getOrElse("B", 0L))
  }

  // ------------------------------------------------------------------
  // wave 43: km2 / km3 / ts19
  // ------------------------------------------------------------------

  /** Brute-force spells (weeks to second order, right-censored) per
    * customer: (custkey, tw, event?).
    */
  private def bruteSpells(): Array[(Long, Long, Boolean)] = {
    val s = spark
    import graft.queries.Tables.t
    val rows = t(s, dir, "orders")
      .selectExpr("o_custkey", "o_orderkey", "CAST(o_orderdate AS DATE) d")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[java.sql.Date](2)))
    val hz = rows.map(_._3.toLocalDate).max
    rows.groupBy(_._1).map { case (ck, os) =>
      val sorted = os.sortBy(o => (o._3.toLocalDate.toEpochDay, o._2))
      val d1 = sorted(0)._3.toLocalDate
      if (sorted.length >= 2) {
        val d2 = sorted(1)._3.toLocalDate
        (ck, (d2.toEpochDay - d1.toEpochDay) / 7, true)
      } else (ck, (hz.toEpochDay - d1.toEpochDay) / 7, false)
    }.toArray
  }

  test("km2: Nelson-Aalen hazard matches a brute-force risk-table replay") {
    val out = run("km2_nelson_aalen").collect()
      .map(r => (r.getAs[Long]("tw"), r)).toMap
    val weekly = bruteSpells().groupBy(_._2).map { case (tw, sp) =>
      (tw, sp.count(_._3).toLong, sp.count(!_._3).toLong)
    }.toArray.sortBy(_._1)
    val total = weekly.map(w => w._2 + w._3).sum
    var before = 0L; var h = 0.0; var v = 0.0
    weekly.foreach { case (tw, d, c) =>
      val n = total - before; before += d + c
      h += d.toDouble / n; v += d.toDouble / (n * n)
      val r = out(tw)
      assert(r.getAs[Long]("n_risk") == n && r.getAs[Long]("d") == d &&
        r.getAs[Long]("c") == c)
      assert(r.getAs[Long]("h_e6") == math.floor(1.0e6 * h).toLong)
      assert(r.getAs[Long]("var_e9") == math.floor(1.0e9 * v).toLong)
    }
    assert(out.size == weekly.length)
  }

  test("km3: log-rank chi2 matches a brute-force hypergeometric replay") {
    val s = spark
    import graft.queries.Tables.t
    val grp = t(s, dir, "customer")
      .selectExpr("c_custkey", "c_mktsegment = 'BUILDING' g")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val weekly = bruteSpells().groupBy(_._2).map { case (tw, sp) =>
      (tw, sp.count(_._3).toLong,
        sp.count(x => x._3 && grp(x._1)).toLong,
        sp.count(!_._3).toLong,
        sp.count(x => !x._3 && grp(x._1)).toLong)
    }.toArray.sortBy(_._1)
    val tot = weekly.map(w => w._2 + w._4).sum
    val tot1 = weekly.map(w => w._3 + w._5).sum
    var (b, b1) = (0L, 0L)
    var (o1, se1, sv, nw) = (0L, 0.0, 0.0, 0L)
    weekly.foreach { case (tw, d, dg, c, cg) =>
      val n = tot - b; val n1 = tot1 - b1
      b += d + c; b1 += dg + cg
      if (d > 0 && n > 1) {
        nw += 1; o1 += dg
        se1 += d.toDouble * n1 / n
        sv += d.toDouble * n1 * (n - n1) * (n - d) /
          (n.toDouble * n * (n - 1))
      }
    }
    val r = run("km3_logrank_test").collect()(0)
    assert(r.getAs[Long]("n_event_weeks") == nw)
    assert(r.getAs[Long]("o1") == o1)
    assert(r.getAs[Long]("e1_e6") == math.floor(1.0e6 * se1).toLong)
    assert(r.getAs[Long]("v_e6") == math.floor(1.0e6 * sv).toLong)
    assert(r.getAs[Long]("chi2_e6") ==
      math.floor(1.0e6 * (o1 - se1) * (o1 - se1) / sv).toLong)
    assert(r.getAs[Long]("chi2_e6") >= 0L)
  }

  test("ts19: Ljung-Box Q matches an exact-integer ACF replay") {
    val s = spark
    import graft.queries.Tables.t
    val xs = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
      .orderBy("day").collect().map(_.getLong(1))
    val n = xs.length.toLong
    val sx = xs.sum
    val res = xs.map(x => n * x - sx)
    val ss = res.map(r => r * r).sum
    val out = run("ts19_ljung_box").collect()
    assert(out.length == 10)
    var q = 0.0
    (1 to 10).foreach { k =>
      val a = (k until xs.length).map(t => res(t) * res(t - k)).sum
      val rho = a.toDouble / ss
      q += rho * rho / (n - k)
      val row = out(k - 1)
      assert(row.getAs[Long]("k") == k.toLong)
      assert(row.getAs[Long]("n_pairs") == n - k)
      assert(row.getAs[Long]("rho_e6") == math.floor(1.0e6 * rho).toLong)
      assert(row.getAs[Long]("q_e6") ==
        math.floor(1.0e6 * n * (n + 2) * q).toLong)
    }
  }

  // ------------------------------------------------------------------
  // wave 44: w27 / cs49 / w28
  // ------------------------------------------------------------------

  /** Daily revenue cents keyed by day offset, sorted by day. */
  private def dailyCents(): Array[(Long, Long)] = {
    val s = spark
    import graft.queries.Tables.t
    t(s, dir, "orders")
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
        .cast("long").as("d"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
  }

  test("w27: max drawdown matches a brute-force equity replay") {
    val ys = dailyCents()
    val n = ys.length.toLong
    val sy = ys.map(_._2).sum
    var e = 0L; var peak = Long.MinValue
    var maxdd = 0L; var trough = -1L; var under = 0L
    ys.foreach { case (d, y) =>
      e += n * y - sy; peak = math.max(peak, e)
      val dd = peak - e
      if (dd > maxdd) { maxdd = dd; trough = d }
      if (dd > 0) under += 1
    }
    val r = run("w27_max_drawdown").collect()(0)
    assert(r.getAs[Long]("n_days") == n)
    assert(r.getAs[Long]("max_dd_n") == maxdd)
    assert(r.getAs[Long]("max_dd_cents") == maxdd / n)
    assert(r.getAs[Long]("trough_d") == trough)
    assert(r.getAs[Long]("n_underwater") == under)
  }

  test("cs49: peak concurrency matches a brute-force interval sweep") {
    val s = spark
    import graft.queries.Tables.t
    val ev = t(s, dir, "events")
      .selectExpr("user_id", "event_id", "CAST(ts AS LONG) t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sess = ev.groupBy(_._1).values.flatMap { rows =>
      val ts = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var (st, en) = (ts.head, ts.head)
      ts.tail.foreach { x =>
        if (x - en <= 1800) en = x
        else { out += ((st, en)); st = x; en = x }
      }
      out += ((st, en)); out
    }.toArray
    val deltas = sess.flatMap { case (a, b) =>
      Seq((a, 1L), (b + 1, -1L)) }.sortBy(p => (p._1, -p._2))
    var cur = 0L; var peak = 0L; var tPeak = -1L
    deltas.foreach { case (tt, dl) =>
      cur += dl
      if (cur > peak) { peak = cur; tPeak = tt }
    }
    val busy = sess.map { case (a, b) => b - a + 1 }.sum
    val span = sess.map(_._2).max + 1 - sess.map(_._1).min
    val r = run("cs49_peak_concurrency").collect()(0)
    assert(r.getAs[Long]("n_sessions") == sess.length.toLong)
    assert(r.getAs[Long]("busy_s") == busy)
    assert(r.getAs[Long]("span_s") == span)
    assert(r.getAs[Long]("avg_conc_e6") == busy * 1000000L / span)
    assert(r.getAs[Long]("peak_conc") == peak)
    assert(r.getAs[Long]("t_peak") == tPeak)
  }

  test("w28: VaR/CVaR/Sharpe match a brute-force P&L replay") {
    val ys = dailyCents()
    val pnl = ys.sliding(2).map(p => (p(1)._1, p(1)._2 - p(0)._2)).toArray
    val n = pnl.length.toLong
    val k = (n + 19) / 20
    val sortedTail = pnl.sortBy(p => (p._2, p._1)).take(k.toInt)
    val var95 = sortedTail.map(_._2).max
    val tailSum = sortedTail.map(_._2).sum
    var sp = 0.0; var sq = 0.0
    pnl.foreach { case (_, p) => sp += p.toDouble; sq += p.toDouble * p }
    val sharpe = (sp / n) / math.sqrt((sq - sp * sp / n) / (n - 1))
    val r = run("w28_tail_risk").collect()(0)
    assert(r.getAs[Long]("n_days") == n)
    assert(r.getAs[Long]("k_tail") == k)
    assert(r.getAs[Long]("var95_cents") == var95)
    assert(r.getAs[Long]("tail_sum") == tailSum)
    assert(r.getAs[Long]("cvar_e2") ==
      math.floor(1.0e2 * tailSum / k).toLong)
    assert(r.getAs[Long]("sharpe_e6") ==
      math.floor(1.0e6 * sharpe).toLong)
  }

  // ------------------------------------------------------------------
  // wave 45: ml16 / ml17 / ml18
  // ------------------------------------------------------------------

  /** (doc_id, n_chars, src0?) for every document. */
  private def docLabels(): Array[(Long, Long, Boolean)] = {
    val s = spark
    import graft.queries.Tables.t
    t(s, dir, "documents").selectExpr("doc_id", "n_chars",
      "source = 'src0' y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
  }

  test("ml16: WoE / IV match a brute-force bin replay") {
    val docs = docLabels()
    val byBin = docs.groupBy(d => math.min(d._2 / 64, 16L))
    val p = docs.count(_._3).toLong
    val q = docs.length - p
    val b = byBin.size
    var iv = 0.0
    val out = run("ml16_information_value").collect()
    assert(out.length == b)
    out.foreach { r =>
      val bin = r.getAs[Long]("bin")
      val rows = byBin(bin)
      val pos = rows.count(_._3).toLong
      val neg = rows.length - pos
      assert(r.getAs[Long]("n") == rows.length.toLong)
      assert(r.getAs[Long]("n_pos") == pos && r.getAs[Long]("n_neg") == neg)
      val dp = (pos + 0.5) / (p + 0.5 * b)
      val dn = (neg + 0.5) / (q + 0.5 * b)
      iv += (dp - dn) * math.log(dp / dn)
      assert(r.getAs[Long]("woe_e6") ==
        math.floor(1.0e6 * math.log(dp / dn)).toLong)
      assert(r.getAs[Long]("iv_cum_e6") == math.floor(1.0e6 * iv).toLong)
    }
  }

  test("ml17: gains table matches a brute-force decile replay") {
    val docs = docLabels()
    val ranked = docs.sortBy(d => (1000000000L - d._2, d._1))
    val nt = ranked.length.toLong
    val pt = ranked.count(_._3).toLong
    val byDec = ranked.zipWithIndex.groupBy { case (_, i) =>
      i.toLong * 10 / nt }
    val out = run("ml17_gains_table").collect()
    assert(out.map(_.getAs[Long]("n")).sum == nt)
    var cum = 0L
    out.sortBy(_.getAs[Long]("decile")).foreach { r =>
      val rows = byDec(r.getAs[Long]("decile"))
      val pos = rows.count(_._1._3).toLong
      cum += pos
      assert(r.getAs[Long]("n") == rows.length.toLong)
      assert(r.getAs[Long]("n_pos") == pos)
      assert(r.getAs[Long]("capture_e6") == cum * 1000000L / pt)
      assert(r.getAs[Long]("lift_e6") ==
        pos * nt * 1000000L / (rows.length * pt))
    }
  }

  test("ml18: Brier decomposition matches a brute-force replay and " +
    "obeys brier ~ rel - res + unc + within-bin variance") {
    val docs = docLabels()
    val ranked = docs.sortBy(d => (d._2, d._1))
    val n = ranked.length.toLong
    val pos = ranked.count(_._3).toLong
    val rows = ranked.zipWithIndex.map { case ((_, _, y), i) =>
      (i.toLong * 10 / n, i + 1L, if (y) 1L else 0L) }
    var sqt = 0L
    rows.foreach { case (_, rn, y) =>
      val d = rn - y * n; sqt += d * d }
    val bins = rows.groupBy(_._1).toSeq.sortBy(_._1)
    var (srel, sres) = (0.0, 0.0)
    bins.foreach { case (_, rs) =>
      val nk = rs.length.toLong
      val srn = rs.map(_._2).sum
      val syk = rs.map(_._3).sum
      srel += (srn - n * syk).toDouble * (srn - n * syk) / (n * n * nk)
      sres += (n * syk - pos * nk).toDouble * (n * syk - pos * nk) /
        (n * n * nk)
    }
    val r = run("ml18_brier_decomposition").collect()(0)
    assert(r.getAs[Long]("n") == n && r.getAs[Long]("pos") == pos)
    assert(r.getAs[Long]("brier_e6") ==
      math.floor(1.0e6 * sqt.toDouble / n / n / n).toLong)
    assert(r.getAs[Long]("rel_e6") ==
      math.floor(1.0e6 * srel / n).toLong)
    assert(r.getAs[Long]("res_e6") ==
      math.floor(1.0e6 * sres / n).toLong)
    val unc = pos.toDouble * (n - pos) / (n.toDouble * n)
    assert(r.getAs[Long]("unc_e6") == math.floor(1.0e6 * unc).toLong)
    // Murphy identity up to within-bin forecast variance (p varies
    // inside a bin): brier = rel - res + unc + wbv with wbv in [0, 1/12]
    val wbv = sqt.toDouble / n / n / n - (srel / n - sres / n + unc)
    assert(wbv >= 0.0 && wbv <= 1.0 / 12.0 + 1e-9)
  }

  // ------------------------------------------------------------------
  // wave 46: k33 / k34 / k35
  // ------------------------------------------------------------------

  test("k33: HRW minimal disruption — only the drained node's keys move") {
    val out = run("k33_rendezvous_routing").collect()
      .map(r => (r.getAs[Long]("node"), r)).toMap
    assert(out.keySet == (0L to 7L).toSet)
    val moved7 = out(7L).getAs[Long]("n_keys8")
    // node 7 loses everything, keeps nothing, and is the only mover
    assert(out(7L).getAs[Long]("n_moved") == moved7)
    assert(out(7L).getAs[Long]("n_keys7") == 0L)
    (0L to 6L).foreach { nd =>
      assert(out(nd).getAs[Long]("n_moved") == 0L)
      assert(out(nd).getAs[Long]("n_keys7") >=
        out(nd).getAs[Long]("n_keys8"))
    }
    // conservation under both layouts
    val nt = out.values.map(_.getAs[Long]("n_keys8")).sum
    assert(out.values.map(_.getAs[Long]("n_keys7")).sum == nt)
    // HRW balance: no node should carry more than 3x its fair share
    out.values.foreach(r => assert(r.getAs[Long]("load8_e6") < 3000000L))
  }

  test("k34/k35: diversity and closeness agree with a brute-force replay") {
    val s = spark
    import graft.queries.Tables.t
    val rows = t(s, dir, "customer")
      .selectExpr("CAST(c_nationkey AS LONG) nat",
        "CAST(floor(c_acctbal / 1000) AS LONG) bb", "c_mktsegment seg")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byClass = rows.groupBy(r => (r._1, r._2))
    // l-diversity histogram
    val lHist = byClass.values
      .groupBy(_.map(_._3).distinct.size.toLong)
      .map { case (l, cs) => (l, cs.size.toLong, cs.map(_.size).sum.toLong) }
    val k34 = run("k34_l_diversity").collect()
      .map(r => (r.getAs[Long]("l"), r.getAs[Long]("n_classes"),
        r.getAs[Long]("n_rows"))).toSet
    assert(k34 == lHist.toSet)
    // t-closeness: brute TVD per class, banded
    val ngAll = rows.length.toLong
    val g = rows.groupBy(_._3).map { case (k, v) => (k, v.size.toLong) }
    val brute = byClass.values.map { cls =>
      val ncC = cls.size.toLong
      val cnt = cls.groupBy(_._3).map { case (k, v) => (k, v.size.toLong) }
      val num = g.map { case (seg, gc) =>
        math.abs(cnt.getOrElse(seg, 0L) * ngAll - gc * ncC) }.sum
      val band =
        if (num * 5 <= ncC * ngAll * 2) "1_tvd_le_20"
        else if (num * 100 <= ncC * ngAll * 70) "2_tvd_le_35"
        else if (num <= ncC * ngAll) "3_tvd_le_50"
        else "4_tvd_gt_50"
      (band, ncC, math.floor(1.0e6 * num / (2.0 * ncC * ngAll)).toLong)
    }.toSeq
    val bruteBands = brute.groupBy(_._1).map { case (b, v) =>
      (b, v.size.toLong, v.map(_._2).sum, v.map(_._3).max) }.toSet
    val k35 = run("k35_t_closeness").collect()
      .map(r => (r.getAs[String]("band"), r.getAs[Long]("n_classes"),
        r.getAs[Long]("n_rows"), r.getAs[Long]("max_tvd_e6"))).toSet
    assert(k35 == bruteBands)
  }

  // ------------------------------------------------------------------
  // wave 47: ts20 / mb6 / w29
  // ------------------------------------------------------------------

  test("ts20: ordinal patterns match a brute-force Bandt-Pompe replay") {
    val ys = dailyCents().map(_._2)
    val codes = ys.sliding(3).filter(_.length == 3).map { v =>
      val r0 = (if (v(1) < v(0)) 1 else 0) + (if (v(2) < v(0)) 1 else 0)
      val r1 = (if (v(0) <= v(1)) 1 else 0) + (if (v(2) < v(1)) 1 else 0)
      val r2 = (if (v(0) <= v(2)) 1 else 0) + (if (v(1) <= v(2)) 1 else 0)
      (r0 * 9 + r1 * 3 + r2).toLong
    }.toArray
    val counts = codes.groupBy(identity(_)).view
      .mapValues(_.length.toLong).toMap
    val nt = codes.length.toLong
    val out = run("ts20_permutation_entropy").collect()
    assert(out.map(_.getAs[Long]("n")).sum == nt)
    var h = 0.0
    out.foreach { r =>
      val c = r.getAs[Long]("code")
      // ranks form a permutation: distinct {0,1,2}
      val (a, b, cc) = (c / 9, (c / 3) % 3, c % 3)
      assert(Set(a, b, cc) == Set(0L, 1L, 2L))
      assert(r.getAs[Long]("n") == counts(c))
      val p = counts(c).toDouble / nt
      h += p * -math.log(p)
      assert(r.getAs[Long]("p_e6") == counts(c) * 1000000L / nt)
      assert(r.getAs[Long]("h_cum_e6") == math.floor(1.0e6 * h).toLong)
    }
    assert(h <= math.log(6.0) + 1e-12)
  }

  test("mb6: critical fractile beats the mean policy in realized cost") {
    val s = spark
    import graft.queries.Tables.t
    val dem = t(s, dir, "lineitem")
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(floor(col("l_quantity")).cast("long")).as("dem"))
      .collect().map(r => (r.getAs[java.sql.Date](0), r.getLong(1)))
    val n = dem.length.toLong
    val sorted = dem.sortBy(p => (p._2, p._1.toLocalDate.toEpochDay))
      .map(_._2)
    val qStar = sorted(((n * 3 + 3) / 4 - 1).toInt)
    val qMean = dem.map(_._2).sum / n
    def cost(q: Long) = dem.map { case (_, d) =>
      math.max(d - q, 0L) * 3 + math.max(q - d, 0L) }.sum
    val r = run("mb6_newsvendor").collect()(0)
    assert(r.getAs[Long]("n_days") == n)
    assert(r.getAs[Long]("q_star") == qStar)
    assert(r.getAs[Long]("q_mean") == qMean)
    assert(r.getAs[Long]("cost_qstar") == cost(qStar))
    assert(r.getAs[Long]("cost_qmean") == cost(qMean))
    assert(r.getAs[Long]("saving") == cost(qMean) - cost(qStar))
    // with 3:1 asymmetry the fractile policy cannot lose
    assert(r.getAs[Long]("saving") >= 0L)
  }

  test("w29: breakout days match a brute-force integer band replay") {
    val s = spark
    import graft.queries.Tables.t
    val ys = t(s, dir, "orders")
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
        .cast("long").as("d"))
      .agg(sum(floor(col("o_totalprice")).cast("long")).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val brute = ys.indices.filter(_ >= 19).flatMap { i =>
      val win = (i - 19 to i).map(ys(_)._2)
      val (sw, qw) = (win.sum, win.map(v => v * v).sum)
      val dev = 20 * ys(i)._2 - sw
      if (dev * dev > 4 * (20 * qw - sw * sw))
        Some((ys(i)._1, ys(i)._2, if (dev > 0) "up" else "down",
          sw * 100 / 20))
      else None
    }
    val got = run("w29_bollinger_breakouts").collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[Long]("x"),
        r.getAs[String]("side"), r.getAs[Long]("ma_e2"))).toSeq
    assert(got == brute)
    assert(got.nonEmpty) // 2000+ trading days produce at least one
  }

  // ------------------------------------------------------------------
  // wave 48: sa19 / cs52 / tx26
  // ------------------------------------------------------------------

  test("sa19: HT estimator laws — full stratum exact, sampling exact") {
    val out = run("sa19_horvitz_thompson").collect()
      .map(r => (r.getAs[String]("seg"), r)).toMap
    assert(out.size == 5)
    out.values.foreach { r =>
      val (w, nPop, nS) = (r.getAs[Long]("w"), r.getAs[Long]("n_pop"),
        r.getAs[Long]("n_sampled"))
      assert(nS <= nPop && nS > 0)
      if (w == 1L) {
        // the certainty stratum: HT is exactly the truth
        assert(nS == nPop)
        assert(r.getAs[Long]("ht_cents") == r.getAs[Long]("true_cents"))
        assert(r.getAs[Long]("err_e6") == 0L)
      } else {
        // md5-fraction sampling should land near n/w
        assert(math.abs(nS - nPop.toDouble / w) < nPop.toDouble / w)
      }
      val err = math.floor(1.0e6 *
        (r.getAs[Long]("ht_cents") - r.getAs[Long]("true_cents")).toDouble
        / r.getAs[Long]("true_cents")).toLong
      assert(r.getAs[Long]("err_e6") == err)
    }
  }

  test("cs52: entropy rate matches a brute-force chain replay") {
    val s = spark
    import graft.queries.Tables.t
    val ev = t(s, dir, "events")
      .selectExpr("user_id", "event_id", "CAST(ts AS LONG) tl",
        "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val trans = ev.groupBy(_._1).values.flatMap { rows =>
      val seq = rows.sortBy(r => (r._3, r._2)).map(_._4)
      seq.sliding(2).filter(_.length == 2).map(p => (p(0), p(1)))
    }.toArray
    val byCell = trans.groupBy(identity(_)).view
      .mapValues(_.length.toLong).toMap
    val byPrev = trans.groupBy(_._1)
    val nt = trans.length.toLong
    val out = run("cs52_entropy_rate").collect()
    assert(out.map(_.getAs[Long]("ni")).sum == nt)
    var rate = 0.0
    out.sortBy(_.getAs[String]("prev")).foreach { r =>
      val prev = r.getAs[String]("prev")
      val ni = byPrev(prev).length.toLong
      assert(r.getAs[Long]("ni") == ni)
      val hi = byCell.filter(_._1._1 == prev).toSeq.sortBy(_._1._2)
        .map { case (_, c) =>
          (c.toDouble / ni) * -math.log(c.toDouble / ni) }.sum
      rate += (ni.toDouble / nt) * hi
      assert(r.getAs[Long]("hi_e6") == math.floor(1.0e6 * hi).toLong)
      assert(r.getAs[Long]("rate_cum_e6") ==
        math.floor(1.0e6 * rate).toLong)
    }
  }

  test("tx26: Simpson diversity matches a brute-force vocab replay") {
    val s = spark
    import graft.queries.Tables.t
    val toks = t(s, dir, "documents").selectExpr("source", "text")
      .collect().flatMap(r => r.getString(1).split(" ", -1)
        .map(tk => (r.getString(0), tk)))
    val out = run("tx26_vocab_simpson").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val src = r.getAs[String]("source")
      val counts = toks.filter(_._1 == src).groupBy(_._2).view
        .mapValues(_.length.toLong).toMap
      val n = counts.values.sum
      val rep = counts.values.map(c => c * (c - 1)).sum
      assert(r.getAs[Long]("n_tokens") == n)
      assert(r.getAs[Long]("n_terms") == counts.size.toLong)
      assert(r.getAs[Long]("rep_pairs") == rep)
      assert(r.getAs[Long]("simpson_e6") == math.floor(1.0e6 *
        (1.0 - rep.toDouble / (n.toDouble * (n - 1)))).toLong)
    }
  }

  // ------------------------------------------------------------------
  // wave 49: cs53 / att5 / k36
  // ------------------------------------------------------------------

  test("cs53: Kruskal-Wallis H matches a brute-force midrank replay") {
    val s = spark
    import graft.queries.Tables.t
    val days = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("x"))
      .withColumn("dow", dayofweek(col("day")).cast("long"))
      .collect().map(r => (r.getAs[Long]("dow"), r.getAs[Long]("x")))
    val n = days.length.toLong
    val sortedX = days.map(_._2).sorted
    val minRank = sortedX.zipWithIndex.reverse.toMap // first index per x
    val tieCnt = days.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val r2 = days.map { case (dow, x) =>
      (dow, 2L * (minRank(x) + 1) + tieCnt(x) - 1) }
    val grp = r2.groupBy(_._1).toSeq.sortBy(_._1)
    var sr2 = 0.0
    grp.foreach { case (_, rows) =>
      val r2i = rows.map(_._2).sum
      sr2 += r2i.toDouble * r2i / rows.length
    }
    val hraw = 3.0 * sr2 / (n.toDouble * (n + 1)) - 3.0 * (n + 1)
    val t3t = tieCnt.values.map(c => c * c * c - c).sum
    val hadj = hraw / (1.0 - t3t.toDouble / (n * n * n - n))
    val out = run("cs53_kruskal_wallis").collect()
    assert(out.length == grp.length)
    out.foreach { r =>
      val (dow, rows) = grp.find(_._1 == r.getAs[Long]("dow")).get
      assert(dow == r.getAs[Long]("dow"))
      assert(r.getAs[Long]("n_i") == rows.length.toLong)
      assert(r.getAs[Long]("r2_i") == rows.map(_._2).sum)
      assert(r.getAs[Long]("h_e6") == math.floor(1.0e6 * hraw).toLong)
      assert(r.getAs[Long]("h_adj_e6") == math.floor(1.0e6 * hadj).toLong)
    }
    assert(out(0).getAs[Long]("h_adj_e6") >= out(0).getAs[Long]("h_e6"))
  }

  test("att5: Shapley credits match a brute replay and obey efficiency") {
    val s = spark
    import graft.queries.Tables.t
    val ev = t(s, dir, "events")
      .selectExpr("user_id u", "event_id", "CAST(ts AS LONG) tl",
        "event_type et").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val touches = ev.filter(e => Set("view", "click", "signup")(e._4))
      .groupBy(_._1)
    val bit = Map("view" -> 1L, "click" -> 2L, "signup" -> 4L)
    val maskCnt = ev.filter(_._4 == "purchase").map { p =>
      touches.getOrElse(p._1, Array.empty[(Long, Long, Long, String)])
        .filter(tc => tc._3 < p._3 && tc._3 >= p._3 - 604800L)
        .map(tc => bit(tc._4)).foldLeft(0L)(_ | _)
    }.groupBy(identity(_)).view.mapValues(_.size.toLong).toMap
    def v(ss: Long) = maskCnt.filter { case (m, _) => (m & ss) == m }
      .values.sum
    val phi = Seq(1L, 2L, 4L).map { i =>
      val contributions = (0L to 7L).filter(ss => (ss & i) == 0).map {
        ss =>
          val w6 = java.lang.Long.bitCount(ss) match {
            case 0 => 2L; case 1 => 1L; case _ => 2L }
          w6 * (v(ss | i) - v(ss))
      }.sum
      i -> contributions
    }.toMap
    val out = run("att5_shapley_attribution").collect()
      .map(r => (r.getAs[String]("channel"), r.getAs[Long]("phi_x6")))
      .toMap
    assert(out == Map("view" -> phi(1L), "click" -> phi(2L),
      "signup" -> phi(4L)))
    // efficiency: credits exhaust v(grand) − v(empty)
    assert(out.values.sum == 6L * (v(7L) - v(0L)))
  }

  test("k36: bloom plan matches the closed form and hits the FPR target") {
    val s = spark
    import graft.queries.Tables.t
    val counts = t(s, dir, "customer")
      .groupBy(col("c_nationkey").cast("long").as("nat"))
      .agg(countDistinct("c_custkey").cast("long").as("nk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val out = run("k36_bloom_planner").collect()
    assert(out.length == counts.size)
    out.foreach { r =>
      val nk = counts(r.getAs[Long]("nat"))
      val m = math.ceil(-nk.toDouble * math.log(0.01) /
        (math.log(2.0) * math.log(2.0))).toLong
      val h = math.ceil(m.toDouble / nk * math.log(2.0)).toLong
      assert(r.getAs[Long]("n_keys") == nk)
      assert(r.getAs[Long]("m_bits") == m)
      assert(r.getAs[Long]("h_hashes") == h)
      val fpr = math.pow(1.0 - math.exp(-h.toDouble * nk / m), h.toDouble)
      assert(r.getAs[Long]("pred_fpr_e9") ==
        math.floor(1.0e9 * fpr).toLong)
      // the rounded plan still honors the 1% design target (small slack)
      assert(r.getAs[Long]("pred_fpr_e9") <= 10500000L)
    }
  }

  // ------------------------------------------------------------------
  // wave 50: gr18 / cs55 / ts21
  // ------------------------------------------------------------------

  test("gr18: reciprocity matches a brute-force edge-set replay") {
    val s = spark
    import graft.queries.Tables.t
    val nodes = t(s, dir, "documents").selectExpr("doc_id % 499 u")
      .collect().map(_.getLong(0)).distinct
    val edges = nodes.flatMap(u =>
      Seq((u, (7 * u + 1) % 499), (u, (3 * u + 2) % 499)))
      .filter(e => e._1 != e._2).distinct.toSet
    val nRecip = edges.count(e => edges((e._2, e._1))).toLong
    val r = run("gr18_reciprocity").collect()(0)
    assert(r.getAs[Long]("n_edges") == edges.size.toLong)
    assert(r.getAs[Long]("n_recip") == nRecip)
    assert(r.getAs[Long]("n_mutual_pairs") == nRecip / 2)
    assert(nRecip % 2 == 0) // mutual edges come in pairs
    assert(r.getAs[Long]("n_asym") == edges.size - nRecip)
    assert(r.getAs[Long]("recip_e6") ==
      nRecip * 1000000L / edges.size)
  }

  test("cs55: kappa matches a brute-force confusion replay and is " +
    "below raw accuracy") {
    val s = spark
    import graft.queries.Tables.t
    import graft.operators.TextAnalysis
    val pairs = t(s, dir, "documents")
      .select(col("lang"), TextAnalysis.langId(col("text")).as("pred"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val n = pairs.length.toLong
    val agree = pairs.count(p => p._1 == p._2).toLong
    val rm = pairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cm = pairs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val peNum = (rm.keySet ++ cm.keySet).toSeq.map(l =>
      rm.getOrElse(l, 0L) * cm.getOrElse(l, 0L)).sum
    val r = run("cs55_cohens_kappa").collect()(0)
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("n_agree") == agree)
    assert(r.getAs[Long]("pe_num") == peNum)
    assert(r.getAs[Long]("kappa_e6") == math.floor(1.0e6 *
      (n * agree - peNum).toDouble / (n * n - peNum)).toLong)
    // chance correction can only lower the score
    assert(r.getAs[Long]("kappa_e6") <= r.getAs[Long]("po_e6"))
  }

  test("ts21: variance ratios match a brute-force overlapping-sum replay") {
    val s = spark
    import graft.queries.Tables.t
    val ys = t(s, dir, "orders")
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
        .cast("long").as("d"))
      .agg(sum(floor(col("o_totalprice")).cast("long")).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val pnl = ys.sliding(2).map(p => p(1)._2 - p(0)._2).toArray
    def varOf(q: Int): (Long, Double) = {
      val sums = pnl.sliding(q).map(_.sum).toArray
      var sa = 0.0; var sq = 0.0
      sums.foreach { a => sa += a.toDouble; sq += a.toDouble * a }
      val m = sums.length
      (m.toLong, sq / m - (sa / m) * (sa / m))
    }
    val (_, v1) = varOf(1)
    val out = run("ts21_variance_ratio").collect()
      .map(r => (r.getAs[Long]("q"),
        (r.getAs[Long]("m"), r.getAs[Long]("vr_e6")))).toMap
    Seq(1, 5, 20).foreach { q =>
      val (m, v) = varOf(q)
      assert(out(q.toLong)._1 == m)
      assert(out(q.toLong)._2 ==
        math.floor(1.0e6 * v / (q * v1)).toLong)
    }
    assert(out(1L)._2 == 1000000L)
  }

  // ------------------------------------------------------------------
  // wave 51: ml19 / ts23 / cs56
  // ------------------------------------------------------------------

  test("ml19: nDCG@100 matches a brute-force discounted replay") {
    val docs = docLabels()
    val ranked = docs.sortBy(d => (1000000000L - d._2, d._1))
    def disc(i: Int) = 1.0 / (math.log(i + 1.0) / math.log(2.0))
    val k = 100
    val dcg = ranked.take(k).zipWithIndex
      .map { case (d, i) => (if (d._3) 1.0 else 0.0) * disc(i + 1) }.sum
    val nPos = ranked.count(_._3).toLong
    val idcg = (1 to math.min(nPos.toInt, k)).map(disc).sum
    val r = run("ml19_ndcg_at_k").collect()(0)
    assert(r.getAs[Long]("k_eff") == k.toLong)
    assert(r.getAs[Long]("n_pos") == nPos)
    assert(r.getAs[Long]("hits_at_k") ==
      ranked.take(k).count(_._3).toLong)
    assert(r.getAs[Long]("dcg_e6") == math.floor(1.0e6 * dcg).toLong)
    assert(r.getAs[Long]("idcg_e6") == math.floor(1.0e6 * idcg).toLong)
    assert(r.getAs[Long]("ndcg_e6") ==
      math.floor(1.0e6 * dcg / idcg).toLong)
    assert(r.getAs[Long]("ndcg_e6") <= 1000000L)
  }

  test("ts23: runs-up-and-down statistic matches a brute-force replay") {
    val ys = dailyCents().map(_._2)
    val ups = ys.sliding(2).map(p => if (p(1) > p(0)) 1L else 0L).toArray
    val nDiffs = ups.length.toLong
    var runs = 1L
    (1 until ups.length).foreach(i => if (ups(i) != ups(i - 1)) runs += 1)
    val n = nDiffs + 1
    val e = (2.0 * n - 1) / 3
    val z = (runs - e) / math.sqrt((16.0 * n - 29) / 90)
    val r = run("ts23_diffsign_runs").collect()(0)
    assert(r.getAs[Long]("n_diffs") == nDiffs)
    assert(r.getAs[Long]("n_up") == ups.sum)
    assert(r.getAs[Long]("n_runs") == runs)
    assert(r.getAs[Long]("e_runs_e6") == math.floor(1.0e6 * e).toLong)
    assert(r.getAs[Long]("z_e6") == math.floor(1.0e6 * z).toLong)
  }

  test("cs56: Hoover index matches a brute-force Lorenz-gap replay") {
    val s = spark
    import graft.queries.Tables.t
    val xs = t(s, dir, "orders").groupBy("o_custkey")
      .agg(count(lit(1)).as("x")).collect().map(_.getLong(1))
    val n = xs.length.toLong
    val sx = xs.sum
    val absdev = xs.map(x => math.abs(n * x - sx)).sum
    val r = run("cs56_hoover_index").collect()(0)
    assert(r.getAs[Long]("n_customers") == n)
    assert(r.getAs[Long]("n_orders") == sx)
    assert(r.getAs[Long]("absdev_n") == absdev)
    val hoover = absdev.toDouble / (2.0 * n * sx)
    assert(r.getAs[Long]("hoover_e6") ==
      math.floor(1.0e6 * hoover).toLong)
    assert(hoover >= 0.0 && hoover <= 1.0)
  }

  // ------------------------------------------------------------------
  // wave 52: ix7 / cs57 / mb7
  // ------------------------------------------------------------------

  test("ix7: RRF fusion laws — rank-1 coherence and fused-score shape") {
    val out = run("ix7_rrf_fusion").collect()
    assert(out.length == 10)
    val rrf = out.map(_.getAs[Long]("rrf_e9"))
    // returned in fused order, every score the exact reciprocal sum
    assert(rrf.sameElements(rrf.sorted.reverse))
    out.foreach { r =>
      val (ra, rb) = (r.getAs[Long]("ra"), r.getAs[Long]("rb"))
      assert(ra >= 1 && rb >= 1)
      assert(r.getAs[Long]("rrf_e9") == math.floor(1.0e9 *
        (1.0 / (60 + ra) + 1.0 / (60 + rb))).toLong)
    }
    // a doc ranked #1 by BOTH lists must head the fusion
    out.find(r => r.getAs[Long]("ra") == 1 && r.getAs[Long]("rb") == 1)
      .foreach(r => assert(r == out(0)))
  }

  test("cs57: pinball losses match a brute replay; each tau prefers " +
    "its own quantile") {
    val ys = dailyCents()
    val train = ys.filter(_._1 < 1460)
    val test = ys.filter(_._1 >= 1460).map(_._2)
    val m = train.length.toLong
    val sorted = train.sortBy(p => (p._2, p._1)).map(_._2)
    val q50 = sorted(((m + 1) / 2 - 1).toInt)
    val q90 = sorted(((m * 9 + 9) / 10 - 1).toInt)
    def loss10(q: Long, tau10: Long) = test.map(y =>
      math.max(y - q, 0L) * tau10 + math.max(q - y, 0L) * (10 - tau10))
      .sum
    val out = run("cs57_pinball_loss").collect()
      .map(r => (r.getAs[Long]("tau10"), r)).toMap
    assert(out(5L).getAs[Long]("qhat_cents") == q50)
    assert(out(9L).getAs[Long]("qhat_cents") == q90)
    assert(out(5L).getAs[Long]("loss_x10") == loss10(q50, 5))
    assert(out(9L).getAs[Long]("loss_x10") == loss10(q90, 9))
    assert(out(9L).getAs[Long]("n_test") == test.length.toLong)
    // proper scoring: the tau-matched forecast can't lose to the other
    assert(loss10(q90, 9) <= loss10(q50, 9))
    assert(loss10(q50, 5) <= loss10(q90, 5))
  }

  test("mb7: repeat curve matches brute force and is anti-monotone") {
    val s = spark
    import graft.queries.Tables.t
    val xs = t(s, dir, "orders").groupBy("o_custkey")
      .agg(count(lit(1)).as("x")).collect().map(_.getLong(1))
    val n = xs.length.toLong
    val so = xs.sum
    val out = run("mb7_repeat_curve").collect()
      .map(r => (r.getAs[Long]("k"), r)).toMap
    var prev = Long.MaxValue
    (1L to 10L).filter(out.contains).foreach { k =>
      val cohort = xs.filter(_ >= k)
      val r = out(k)
      assert(r.getAs[Long]("n_ge_k") == cohort.length.toLong)
      assert(r.getAs[Long]("orders_ge_k") == cohort.sum)
      assert(r.getAs[Long]("share_e6") ==
        cohort.length * 1000000L / n)
      assert(r.getAs[Long]("order_share_e6") ==
        cohort.sum * 1000000L / so)
      assert(r.getAs[Long]("n_ge_k") <= prev)
      prev = r.getAs[Long]("n_ge_k")
    }
    assert(out(1L).getAs[Long]("n_ge_k") == n)
    assert(out(1L).getAs[Long]("order_share_e6") == 1000000L)
  }

  // ------------------------------------------------------------------
  // wave 53: emb3 / w30 / gr20
  // ------------------------------------------------------------------

  test("emb3: dim variances match a brute-force quantized replay") {
    val s = spark
    import graft.queries.Tables.t
    val vecs = t(s, dir, "embeddings").select("embedding")
      .collect().map(_.getSeq[Float](0))
    val dims = vecs.head.length
    val stats = (1 to dims).map { d =>
      val qs = vecs.map(v => math.floor(v(d - 1).toDouble * 1.0e4).toLong)
      val n = qs.length.toLong
      val sq = qs.sum
      val sqq = qs.map(q => q * q).sum
      (d.toLong, n, n * sqq - sq * sq)
    }
    val top5 = stats.sortBy(t3 => (-t3._3, t3._1)).take(5)
    val out = run("emb3_dim_variance").collect()
    assert(out.length == 5)
    out.zip(top5).foreach { case (r, (d, n, num)) =>
      assert(r.getAs[Long]("dim") == d)
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("var_num") == num)
      assert(r.getAs[Long]("var_e9") == math.floor(1.0e9 *
        num / (n.toDouble * n) / 1.0e8).toLong)
    }
  }

  test("w30: underwater spells match a brute-force islands replay") {
    val ys = dailyCents()
    val n = ys.length.toLong
    val sy = ys.map(_._2).sum
    var e = 0L; var peak = Long.MinValue
    val under = ys.map { case (d, y) =>
      e += n * y - sy; peak = math.max(peak, e)
      (d, peak - e)
    }
    // brute islands of dd > 0
    val spells = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    var len = 0L; var start = -1L; var depth = 0L
    under.foreach { case (d, dd) =>
      if (dd > 0) {
        if (len == 0) { start = d; depth = 0 }
        len += 1; depth = math.max(depth, dd)
      } else if (len > 0) { spells += ((len, start, depth)); len = 0 }
    }
    if (len > 0) spells += ((len, start, depth))
    val longest = spells.sortBy(sp => (-sp._1, sp._2)).head
    val r = run("w30_underwater_spells").collect()(0)
    assert(r.getAs[Long]("n_spells") == spells.length.toLong)
    assert(r.getAs[Long]("longest_days") == longest._1)
    assert(r.getAs[Long]("longest_start_d") == longest._2)
    assert(r.getAs[Long]("longest_depth_n") == longest._3)
  }

  test("gr20: degree tail matches a brute-force binned replay") {
    val s = spark
    import graft.queries.Tables.t
    val nodes = t(s, dir, "documents").selectExpr("doc_id % 499 u")
      .collect().map(_.getLong(0)).distinct
    val edges = nodes.flatMap(u =>
      Seq((u, (7 * u + 1) % 499), (u, (3 * u + 2) % 499)))
      .filter(e => e._1 != e._2).distinct
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity(_)).view.mapValues(_.size.toLong).toMap
    val binned = deg.values.groupBy(d =>
      (63 - java.lang.Long.numberOfLeadingZeros(d)).toLong)
    val nt = deg.size.toLong
    val out = run("gr20_degree_tail").collect()
    assert(out.map(_.getAs[Long]("n_nodes")).sum == nt)
    var cum = 0L
    out.sortBy(_.getAs[Long]("bin")).foreach { r =>
      val ds = binned(r.getAs[Long]("bin"))
      assert(r.getAs[Long]("n_nodes") == ds.size.toLong)
      assert(r.getAs[Long]("deg_mass") == ds.sum)
      assert(r.getAs[Long]("ccdf_e6") == (nt - cum) * 1000000L / nt)
      cum += ds.size
    }
    // CCDF starts at exactly 1
    assert(out.minBy(_.getAs[Long]("bin")).getAs[Long]("ccdf_e6")
      == 1000000L)
  }

  // ------------------------------------------------------------------
  // wave 54: cs59 / ts24 / k38
  // ------------------------------------------------------------------

  test("cs59: Wilson intervals match brute force and bracket p-hat") {
    val s = spark
    import graft.queries.Tables.t
    val rows = t(s, dir, "events")
      .selectExpr("event_type", "value >= 100.0 hit")
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    val out = run("cs59_wilson_ci").collect()
    out.foreach { r =>
      val grp = rows.filter(_._1 == r.getAs[String]("event_type"))
      val n = grp.length.toLong
      val x = grp.count(_._2).toLong
      val px = x.toDouble / n
      def bound(sign: Double) = (px + 3.8416 / (2 * n) + sign * 1.96 *
        math.sqrt(px * (1 - px) / n + 3.8416 / (4.0 * n * n))) /
        (1.0 + 3.8416 / n)
      assert(r.getAs[Long]("n") == n && r.getAs[Long]("x") == x)
      assert(r.getAs[Long]("lo_e6") ==
        math.floor(1.0e6 * bound(-1)).toLong)
      assert(r.getAs[Long]("hi_e6") ==
        math.floor(1.0e6 * bound(1)).toLong)
      // the interval brackets the point estimate
      assert(r.getAs[Long]("lo_e6") <= r.getAs[Long]("p_e6"))
      assert(r.getAs[Long]("hi_e6") >= r.getAs[Long]("p_e6"))
    }
  }

  test("ts24: crossover backtest matches a brute-force signal replay") {
    val ys = dailyCents().map(_._2)
    var (nEval, nLong, nTrades, strat) = (0L, 0L, 0L, 0L)
    var prevLong = 0L
    var (firstY, lastY) = (0L, 0L)
    ys.indices.foreach { i =>
      val lng =
        if (i >= 49) {
          val s20 = (i - 19 to i).map(ys(_)).sum
          val s50 = (i - 49 to i).map(ys(_)).sum
          if (s20 * 5 > s50 * 2) 1L else 0L
        } else 0L
      if (i >= 49) {
        if (nEval == 0) firstY = ys(i)
        lastY = ys(i)
        nEval += 1; nLong += lng
        if (lng == 1 && prevLong == 0) nTrades += 1
        if (prevLong == 1) strat += ys(i) - ys(i - 1)
      }
      prevLong = lng
    }
    val r = run("ts24_sma_crossover").collect()(0)
    assert(r.getAs[Long]("n_days_eval") == nEval)
    assert(r.getAs[Long]("n_long_days") == nLong)
    assert(r.getAs[Long]("n_trades") == nTrades)
    assert(r.getAs[Long]("strat_pnl_cents") == strat)
    assert(r.getAs[Long]("buyhold_pnl_cents") == lastY - firstY)
    assert(nTrades > 0) // 2000+ days produce at least one crossover
  }

  test("k38: TTL audit matches a brute-force cutoff replay") {
    val s = spark
    import graft.queries.Tables.t
    val ev = t(s, dir, "events")
      .selectExpr("event_type", "CAST(ts AS LONG) et",
        "length(props) pb")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getInt(2).toLong))
    val hz = ev.map(_._2).max
    val out = run("k38_ttl_audit").collect()
    assert(out.map(_.getAs[Long]("n_total")).sum == ev.length.toLong)
    out.foreach { r =>
      val grp = ev.filter(_._1 == r.getAs[String]("event_type"))
      val exp = grp.filter(_._2 < hz - 15552000L)
      assert(r.getAs[Long]("n_total") == grp.length.toLong)
      assert(r.getAs[Long]("n_expired") == exp.length.toLong)
      assert(r.getAs[Long]("expired_share_e6") ==
        exp.length * 1000000L / grp.length)
      assert(r.getAs[Long]("reclaim_bytes") ==
        exp.map(_._3 + 16L).sum)
    }
  }

  // ------------------------------------------------------------------
  // wave 55: sa20 / f12 / ix8
  // ------------------------------------------------------------------

  test("sa20: CUPED moments match brute force; reduction = corr^2") {
    val s = spark
    import graft.queries.Tables.t
    val raw = t(s, dir, "events")
      .selectExpr("user_id", "CAST(ts AS LONG) et",
        "CAST(floor(value * 100) AS LONG) cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cut = (raw.map(_._2).min + raw.map(_._2).max) / 2
    val pu = raw.groupBy(_._1).values.map { rows =>
      (rows.filter(_._2 < cut).map(_._3).sum,
        rows.filter(_._2 >= cut).map(_._3).sum)
    }.toArray
    val n = pu.length.toLong
    val (sx, sy) = (pu.map(_._1).sum, pu.map(_._2).sum)
    val sxx = pu.map(p => p._1 * p._1).sum
    val syy = pu.map(p => p._2 * p._2).sum
    val sxy = pu.map(p => p._1 * p._2).sum
    val (vx, vy, cxy) = (n * sxx - sx * sx, n * syy - sy * sy,
      n * sxy - sx * sy)
    val r = run("sa20_cuped").collect()(0)
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("vx") == vx && r.getAs[Long]("vy") == vy)
    assert(r.getAs[Long]("cxy") == cxy)
    assert(r.getAs[Long]("theta_e6") ==
      math.floor(1.0e6 * cxy.toDouble / vx).toLong)
    val red = cxy.toDouble * cxy / (vx.toDouble * vy)
    assert(r.getAs[Long]("var_reduction_e6") ==
      math.floor(1.0e6 * red).toLong)
    // corr² lives in [0, 1]
    assert(r.getAs[Long]("var_reduction_e6") >= 0L &&
      r.getAs[Long]("var_reduction_e6") <= 1000000L)
  }

  private val dammM = Array(
    Array(0, 3, 1, 7, 5, 9, 8, 6, 4, 2), Array(7, 0, 9, 2, 1, 5, 4, 8, 6, 3),
    Array(4, 2, 0, 6, 8, 7, 1, 3, 5, 9), Array(1, 7, 5, 0, 9, 8, 3, 4, 2, 6),
    Array(6, 1, 2, 3, 0, 4, 5, 9, 7, 8), Array(3, 6, 7, 4, 2, 0, 9, 5, 8, 1),
    Array(5, 8, 6, 9, 7, 2, 0, 1, 3, 4), Array(8, 9, 4, 5, 3, 6, 2, 0, 1, 7),
    Array(9, 4, 3, 8, 6, 1, 7, 2, 0, 5), Array(2, 5, 8, 1, 4, 3, 6, 7, 9, 0))

  test("f12: Damm census matches brute force; appending the check " +
    "digit always folds to state 0") {
    val s = spark
    import graft.queries.Tables.t
    val keys = t(s, dir, "orders").selectExpr("o_orderkey")
      .collect().map(_.getLong(0))
    def damm(num: String): Int =
      num.foldLeft(0)((st, c) => dammM(st)(c - '0'))
    val brute = keys.map(k => damm(k.toString).toLong)
      .groupBy(identity(_)).view.mapValues(_.size.toLong).toMap
    val out = run("f12_damm_checksum").collect()
    assert(out.map(_.getAs[Long]("n_keys")).sum == keys.length.toLong)
    out.foreach { r =>
      assert(r.getAs[Long]("n_keys") ==
        brute(r.getAs[Long]("check_digit")))
      assert(r.getAs[Long]("share_e6") ==
        brute(r.getAs[Long]("check_digit")) * 1000000L / keys.length)
    }
    // the defining property: number + its check digit validates to 0
    keys.take(200).foreach { k =>
      val c = damm(k.toString)
      assert(damm(k.toString + c.toString) == 0)
    }
  }

  test("ix8: MRR matches a brute-force first-relevant replay") {
    val s = spark
    import graft.queries.Tables.t
    val docs = t(s, dir, "documents")
      .selectExpr("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val terms = Seq("data", "filter", "spark") // term order = output order
    var mrr = 0.0
    val out = run("ix8_mrr").collect()
      .map(r => (r.getAs[String]("term"), r)).toMap
    terms.foreach { term =>
      val cand = docs.map { case (id, src, text) =>
        (id, src, text.split(" ", -1).count(_ == term).toLong) }
        .filter(_._3 > 0)
        .sortBy(c => (-c._3, c._1))
      val firstRel = cand.zipWithIndex.find(_._1._2 == "src0")
        .map(_._2 + 1L)
      val r = out(term)
      assert(r.getAs[Long]("n_candidates") == cand.length.toLong)
      assert(Option(r.getAs[Any]("first_rel_rank"))
        .map(_.asInstanceOf[Long]) == firstRel)
      mrr += firstRel.map(1.0 / _).getOrElse(0.0)
      assert(r.getAs[Long]("mrr_cum_e6") ==
        math.floor(1.0e6 / 3.0 * mrr).toLong)
    }
  }

  // ------------------------------------------------------------------
  // wave 56: k39 / ml20 / cs60
  // ------------------------------------------------------------------

  test("k39: dict planner matches exact NDV and ceil-log2 widths") {
    val s = spark
    import graft.queries.Tables.t
    val rows = t(s, dir, "customer")
      .selectExpr("c_mktsegment", "CAST(c_nationkey AS LONG)",
        "CAST(floor(c_acctbal) AS LONG)").collect()
    val ndvs = Map(
      "mktsegment" -> rows.map(_.getString(0)).distinct.length.toLong,
      "nationkey" -> rows.map(_.getLong(1)).distinct.length.toLong,
      "acctbal_dollars" -> rows.map(_.getLong(2)).distinct.length.toLong)
    val out = run("k39_dict_encoding_planner").collect()
    assert(out.length == 3)
    out.foreach { r =>
      val ndv = ndvs(r.getAs[String]("col_name"))
      val bits = 64 - java.lang.Long.numberOfLeadingZeros(
        math.max(ndv - 1, 1))
      assert(r.getAs[Long]("n") == rows.length.toLong)
      assert(r.getAs[Long]("ndv") == ndv)
      assert(r.getAs[Long]("dict_bits") == bits.toLong)
      assert(r.getAs[Long]("saved_e6") == (64 - bits) * 1000000L / 64)
    }
  }

  test("ml20: average precision matches a brute-force PR replay") {
    val docs = docLabels()
    val top = docs.sortBy(d => (1000000000L - d._2, d._1)).take(100)
    var cum = 0L; var psum = 0.0; var hits10 = 0L
    top.zipWithIndex.foreach { case (d, i) =>
      if (d._3) { cum += 1; psum += cum.toDouble / (i + 1) }
      if (i < 10) hits10 = cum
    }
    val r = run("ml20_average_precision").collect()(0)
    assert(r.getAs[Long]("k_eff") == 100L)
    assert(r.getAs[Long]("hits_at_k") == cum)
    assert(r.getAs[Long]("hits_at_10") == hits10)
    assert(r.getAs[Long]("p_at_10_e6") == hits10 * 1000000L / 10)
    assert(r.getAs[Long]("ap_e6") ==
      math.floor(1.0e6 * psum / cum).toLong)
    // AP can't exceed precision@k=1
    assert(r.getAs[Long]("ap_e6") <= 1000000L)
  }

  test("cs60: turning points match brute force; complements ts23") {
    val ys = dailyCents().map(_._2)
    val interior = ys.sliding(3).filter(_.length == 3).toArray
    val peaks = interior.count(w => w(1) > w(0) && w(1) > w(2)).toLong
    val troughs = interior.count(w => w(1) < w(0) && w(1) < w(2)).toLong
    val ni = interior.length.toLong
    val r = run("cs60_turning_points").collect()(0)
    assert(r.getAs[Long]("n_interior") == ni)
    assert(r.getAs[Long]("n_peaks") == peaks)
    assert(r.getAs[Long]("n_troughs") == troughs)
    assert(r.getAs[Long]("n_turns") == peaks + troughs)
    assert(r.getAs[Long]("e_turns_e6") ==
      math.floor(1.0e6 * 2.0 * ni / 3).toLong)
    val z = (peaks + troughs - 2.0 * ni / 3) /
      math.sqrt((16.0 * (ni + 2) - 29) / 90)
    assert(r.getAs[Long]("z_e6") == math.floor(1.0e6 * z).toLong)
    // peaks and troughs alternate: counts differ by at most one
    assert(math.abs(peaks - troughs) <= 1)
  }

  // ------------------------------------------------------------------
  // wave 57: cs61 / ts25 / emb4
  // ------------------------------------------------------------------

  test("cs61: Brown-Forsythe F matches a brute-force robust-ANOVA replay") {
    val s = spark
    import graft.queries.Tables.t
    val days = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(expr("sum(CAST(floor(o_totalprice) AS BIGINT)) div 10")
        .as("x"))
      .selectExpr("day", "x", "CAST(dayofweek(day) AS LONG) dow")
      .collect()
      .map(r => (r.getAs[Long]("dow"), r.getAs[java.sql.Date]("day"),
        r.getAs[Long]("x")))
    val byDow = days.groupBy(_._1).toSeq.sortBy(_._1)
    var (ssw, ssbr) = (0.0, 0.0)
    var (n, szt) = (0L, 0L)
    val k = byDow.length.toLong
    byDow.foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2.toLocalDate.toEpochDay))
      val medv = sorted(((rows.length + 1) / 2 - 1)).  _3
      val zs = rows.map(r => math.abs(r._3 - medv))
      val (nj, sz, qz) = (zs.length.toLong, zs.sum,
        zs.map(z => z * z).sum)
      n += nj; szt += sz
      ssw += (nj * qz - sz * sz).toDouble / nj
      ssbr += sz.toDouble * sz / nj
    }
    val ssb = ssbr - szt.toDouble * szt / n
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    val r = run("cs61_brown_forsythe").collect()(0)
    assert(r.getAs[Long]("k") == k && r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("ssb_e3") == math.floor(1.0e3 * ssb).toLong)
    assert(r.getAs[Long]("ssw_e3") == math.floor(1.0e3 * ssw).toLong)
    assert(r.getAs[Long]("f_e6") == math.floor(1.0e6 * f).toLong)
  }

  test("ts25: MASE matches a brute-force lag replay") {
    val ys = dailyCents().map(_._2)
    val e7 = (7 until ys.length).map(i => math.abs(ys(i) - ys(i - 7)))
    val e1 = (1 until ys.length).map(i => math.abs(ys(i) - ys(i - 1)))
    val r = run("ts25_mase").collect()(0)
    assert(r.getAs[Long]("n7") == e7.length.toLong)
    assert(r.getAs[Long]("sae7") == e7.sum)
    assert(r.getAs[Long]("n1") == e1.length.toLong)
    assert(r.getAs[Long]("sae1") == e1.sum)
    val mase = (e7.sum.toDouble / e7.length) / (e1.sum.toDouble / e1.length)
    assert(r.getAs[Long]("mase_e6") == math.floor(1.0e6 * mase).toLong)
  }

  test("emb4: class separation matches a brute-force centroid replay") {
    val s = spark
    import graft.queries.Tables.t
    val vecs = t(s, dir, "embeddings").selectExpr("CAST(label AS LONG)",
      "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val dims = vecs.head._2.length
    val q = vecs.map { case (l, v) =>
      (l, v.map(x => math.floor(x.toDouble * 1.0e4).toLong)) }
    val ng = q.length.toLong
    val sg = (0 until dims).map(d => q.map(_._2(d)).sum)
    val out = run("emb4_class_separation").collect()
    assert(out.map(_.getAs[Long]("n_vecs")).sum == ng)
    out.foreach { r =>
      val grp = q.filter(_._1 == r.getAs[Long]("lbl"))
      val nl = grp.length.toLong
      var d2 = 0.0
      (0 until dims).foreach { d =>
        val sl = grp.map(_._2(d)).sum
        val diff = ng * sl - nl * sg(d)
        d2 += diff.toDouble * diff / (nl.toDouble * nl * ng * ng)
      }
      assert(r.getAs[Long]("n_vecs") == nl)
      assert(r.getAs[Long]("d2g_e9") ==
        math.floor(1.0e9 * d2 / 1.0e8).toLong)
    }
  }

  // ------------------------------------------------------------------
  // wave 58: w31 / sa21 / ts26
  // ------------------------------------------------------------------

  test("w31: hour-of-week heatmap matches a brute census") {
    val s = spark
    import graft.queries.Tables.t
    val cells = t(s, dir, "events")
      .selectExpr("CAST(dayofweek(CAST(ts AS DATE)) AS LONG) dow",
        "CAST(hour(ts) AS LONG) hr")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity(_)).view.mapValues(_.size.toLong).toMap
    val nt = cells.values.sum
    val out = run("w31_hourly_heatmap").collect()
    assert(out.map(_.getAs[Long]("n")).sum == nt)
    assert(out.map(_.getAs[Long]("is_peak")).sum ==
      out.map(_.getAs[Long]("dow")).distinct.length.toLong)
    out.foreach { r =>
      val key = (r.getAs[Long]("dow"), r.getAs[Long]("hr"))
      assert(r.getAs[Long]("n") == cells(key))
      assert(r.getAs[Long]("share_e6") == cells(key) * 1000000L / nt)
      val peers = cells.filter(_._1._1 == key._1)
      val peak = peers.toSeq.sortBy(c => (-c._2, c._1._2)).head._1
      assert(r.getAs[Long]("is_peak") == (if (key == peak) 1L else 0L))
    }
  }

  test("sa21: SPRT walk matches a brute replay and crosses a boundary") {
    val s = spark
    import graft.queries.Tables.t
    val daily = t(s, dir, "events")
      .selectExpr("CAST(datediff(CAST(ts AS DATE), '2024-01-01') " +
        "AS LONG) d", "event_type = 'purchase' p")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (d, rows) =>
        (d, rows.length.toLong, rows.count(_._2).toLong) }
    var cum = 0.0; var decision = -1L; var verdict = ""
    val b = math.log(19.0)
    daily.foreach { case (d, n, x) =>
      cum += x * (math.log(0.08) - math.log(0.05)) +
        (n - x) * (math.log(0.92) - math.log(0.95))
      if (decision == -1L && math.abs(cum) >= b) {
        decision = d; verdict = if (cum > 0) "accept_h1" else "accept_h0"
      }
    }
    val r = run("sa21_sprt").collect()(0)
    assert(r.getAs[Long]("n_days") == daily.length.toLong)
    assert(r.getAs[Long]("decision_d") == decision)
    assert(r.getAs[String]("verdict") == verdict)
    assert(r.getAs[Long]("final_llr_e6") ==
      math.floor(1.0e6 * cum).toLong)
    assert(decision >= 0) // the 20% purchase share crosses fast
  }

  test("ts26: integrated autocorrelation time matches a brute replay") {
    val s = spark
    import graft.queries.Tables.t
    val xs = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
      .orderBy("day").collect().map(_.getLong(1))
    val n = xs.length.toLong
    val sx = xs.sum
    val res = xs.map(x => n * x - sx)
    val ss = res.map(v => v * v).sum
    val as = (1 to 20).map(k =>
      (k.toLong, (k until xs.length).map(t => res(t) * res(t - k)).sum))
    val kneg = as.find(_._2 < 0).map(_._1).getOrElse(21L)
    val rsum = as.filter(_._1 < kneg).map(_._2.toDouble / ss).sum
    val tau = 1.0 + 2.0 * rsum
    val r = run("ts26_autocorr_time").collect()(0)
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("kneg") == kneg)
    assert(r.getAs[Long]("k_used") == kneg - 1)
    assert(r.getAs[Long]("tau_e6") == math.floor(1.0e6 * tau).toLong)
    assert(r.getAs[Long]("ess_days") == math.floor(n / tau).toLong)
  }

  // ------------------------------------------------------------------
  // wave 59: mb8 / d15 / w32
  // ------------------------------------------------------------------

  test("mb8: price endings match a brute census, top-10 deterministic") {
    val s = spark
    import graft.queries.Tables.t
    val endings = t(s, dir, "lineitem")
      .selectExpr("CAST(floor(l_extendedprice * 100) AS LONG) % 100 e")
      .collect().map(_.getLong(0))
      .groupBy(identity(_)).view.mapValues(_.size.toLong).toMap
    val nt = endings.values.sum
    val top = endings.toSeq.sortBy(e => (-e._2, e._1)).take(10)
    val out = run("mb8_price_endings").collect()
    assert(out.length == 10)
    out.zip(top).foreach { case (r, (e, n)) =>
      assert(r.getAs[Long]("ending") == e)
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("share_e6") == n * 1000000L / nt)
    }
  }

  test("d15: month-end split matches a brute last_day replay") {
    val s = spark
    import graft.queries.Tables.t
    val days = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("y"))
      .collect().map(r => (r.getAs[java.sql.Date](0).toLocalDate,
        r.getLong(1)))
    val (l3, rest) = days.partition { case (d, _) =>
      d.lengthOfMonth - d.getDayOfMonth < 3 }
    val r = run("d15_month_end_effect").collect()(0)
    assert(r.getAs[Long]("d_l3") == l3.length.toLong)
    assert(r.getAs[Long]("rev_l3") == l3.map(_._2).sum)
    assert(r.getAs[Long]("d_rest") == rest.length.toLong)
    assert(r.getAs[Long]("rev_rest") == rest.map(_._2).sum)
    val ratio = (l3.map(_._2).sum.toDouble / l3.length) /
      (rest.map(_._2).sum.toDouble / rest.length)
    assert(r.getAs[Long]("rate_ratio_e6") ==
      math.floor(1.0e6 * ratio).toLong)
  }

  test("w32: tenure curve matches a brute first-order replay") {
    val s = spark
    import graft.queries.Tables.t
    val orders = t(s, dir, "orders")
      .selectExpr("o_custkey", "CAST(o_orderdate AS DATE) day",
        "CAST(floor(o_totalprice * 100) AS LONG) cents")
      .collect().map(r => (r.getLong(0),
        r.getAs[java.sql.Date](1).toLocalDate.toEpochDay, r.getLong(2)))
    val firstDay = orders.groupBy(_._1).view
      .mapValues(_.map(_._2).min).toMap
    val byAge = orders.groupBy(o => (o._2 - firstDay(o._1)) / 30)
    val out = run("w32_tenure_revenue").collect()
    assert(out.map(_.getAs[Long]("n_orders")).sum == orders.length.toLong)
    out.foreach { r =>
      val grp = byAge(r.getAs[Long]("age_m"))
      assert(r.getAs[Long]("n_orders") == grp.length.toLong)
      assert(r.getAs[Long]("n_customers") ==
        grp.map(_._1).distinct.length.toLong)
      assert(r.getAs[Long]("rev_cents") == grp.map(_._3).sum)
      assert(r.getAs[Long]("avg_order_cents") ==
        grp.map(_._3).sum / grp.length)
    }
    // month 0 contains every customer's first order
    assert(out.find(_.getAs[Long]("age_m") == 0L).get
      .getAs[Long]("n_customers") == firstDay.size.toLong)
  }

  // ------------------------------------------------------------------
  // wave 60: cs62 / ts27 / gr21
  // ------------------------------------------------------------------

  test("cs62: Cochran's Q matches a brute-force threshold replay") {
    val s = spark
    import graft.queries.Tables.t
    val pu = t(s, dir, "events").selectExpr("user_id", "value")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).values.map { rows =>
        val mx = rows.map(_._2).max
        (if (mx >= 150.0) 1L else 0L, if (mx >= 100.0) 1L else 0L,
          if (mx >= 50.0) 1L else 0L)
      }.toArray
    val (th, tm, tl) = (pu.map(_._1).sum, pu.map(_._2).sum,
      pu.map(_._3).sum)
    val nn = th + tm + tl
    val su2 = pu.map(u => {
      val s3 = u._1 + u._2 + u._3; s3 * s3 }).sum
    val r = run("cs62_cochran_q").collect()(0)
    assert(r.getAs[Long]("n_users") == pu.length.toLong)
    assert(r.getAs[Long]("t_hi") == th)
    assert(r.getAs[Long]("t_mid") == tm)
    assert(r.getAs[Long]("t_lo") == tl)
    if (3 * nn - su2 == 0) {
      // fully concordant fixture: Q is undefined by construction
      assert(r.isNullAt(r.fieldIndex("q_e6")))
    } else {
      val q = 2.0 * (3 * (th * th + tm * tm + tl * tl) - nn * nn) /
        (3 * nn - su2)
      assert(r.getAs[Long]("q_e6") == math.floor(1.0e6 * q).toLong)
      assert(r.getAs[Long]("q_e6") >= 0L)
    }
    // nesting law: pass counts are monotone in the threshold
    assert(th <= tm && tm <= tl)
  }

  test("ts27: monthly PSI matches a brute replay; base month reads 0") {
    val s = spark
    import graft.queries.Tables.t
    val rows = t(s, dir, "events")
      .selectExpr("CAST((year(ts) - 2024) * 12 + month(ts) - 1 AS LONG)",
        "least(CAST(floor(value / 25) AS LONG), 10L)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val months = rows.map(_._1).distinct.sorted
    val counts = rows.groupBy(identity(_)).view
      .mapValues(_.size.toLong).toMap
    def cOf(m: Long, b: Long) = counts.getOrElse((m, b), 0L)
    def nOf(m: Long) = (0L to 10L).map(cOf(m, _)).sum
    val mk0 = months.min
    val out = run("ts27_monthly_psi").collect()
      .map(r => (r.getAs[Long]("mk"), r)).toMap
    assert(out.keySet == months.toSet)
    months.foreach { m =>
      var psi = 0.0
      (0L to 10L).foreach { b =>
        val pm = (cOf(m, b) + 0.5) / (nOf(m) + 5.5)
        val pb = (cOf(mk0, b) + 0.5) / (nOf(mk0) + 5.5)
        psi += (pm - pb) * math.log(pm / pb)
      }
      assert(out(m).getAs[Long]("n_events") == nOf(m))
      assert(out(m).getAs[Long]("psi_e6") ==
        math.floor(1.0e6 * psi).toLong)
    }
    assert(out(mk0).getAs[Long]("psi_e6") == 0L)
  }

  test("gr21: partition locality matches brute force at every P") {
    val s = spark
    import graft.queries.Tables.t
    val nodes = t(s, dir, "documents").selectExpr("doc_id % 499 u")
      .collect().map(_.getLong(0)).distinct
    val edges = nodes.flatMap(u =>
      Seq((u, (7 * u + 1) % 499), (u, (3 * u + 2) % 499)))
      .filter(e => e._1 != e._2).distinct
    val out = run("gr21_partition_locality").collect()
      .map(r => (r.getAs[Long]("p"), r)).toMap
    assert(out.keySet == Set(8L, 16L, 32L))
    out.foreach { case (p, r) =>
      val local = edges.count(e => e._1 % p == e._2 % p).toLong
      assert(r.getAs[Long]("n_edges") == edges.length.toLong)
      assert(r.getAs[Long]("n_local") == local)
      assert(r.getAs[Long]("local_share_e6") ==
        local * 1000000L / edges.length)
      assert(r.getAs[Long]("uniform_share_e6") == 1000000L / p)
    }
  }

  // ------------------------------------------------------------------
  // wave 61: w33 / ts28 / d16
  // ------------------------------------------------------------------

  test("w33: value migration matches a brute quartile replay") {
    val s = spark
    import graft.queries.Tables.t
    val spend = t(s, dir, "orders")
      .selectExpr("o_custkey", "CAST(o_orderdate AS DATE) day",
        "CAST(floor(o_totalprice * 100) AS LONG) cents")
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1).toLocalDate,
        r.getLong(2)))
      .groupBy(_._1).map { case (ck, rows) =>
        val cut = java.time.LocalDate.parse("1995-07-01")
        (ck, rows.filter(_._2.isBefore(cut)).map(_._3).sum,
          rows.filter(!_._2.isBefore(cut)).map(_._3).sum)
      }.toArray
    def bands(vals: Array[(Long, Long)]): Map[Long, String] = {
      val act = vals.filter(_._2 > 0).sortBy(v => (v._2, v._1))
      val n = act.length.toLong
      act.zipWithIndex.map { case ((ck, _), i) =>
        ck -> s"q${i.toLong * 4 / n + 1}" }.toMap
    }
    val b1 = bands(spend.map(p => (p._1, p._2)))
    val b2 = bands(spend.map(p => (p._1, p._3)))
    val brute = spend.map(p => (b1.getOrElse(p._1, "none"),
      b2.getOrElse(p._1, "none")))
      .groupBy(identity(_)).view.mapValues(_.size.toLong).toMap
    val got = run("w33_value_migration").collect()
      .map(r => ((r.getAs[String]("band1"), r.getAs[String]("band2")),
        r.getAs[Long]("n_customers"))).toMap
    assert(got == brute)
    assert(got.values.sum == spend.length.toLong)
  }

  test("ts28: ARCH-effect Q matches a brute squared-P&L ACF replay") {
    val s = spark
    import graft.queries.Tables.t
    val ys = t(s, dir, "orders")
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
        .cast("long").as("d"))
      .agg(sum(floor(col("o_totalprice")).cast("long")).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      .map(_._2)
    val s2 = ys.sliding(2).map(p => {
      val d = p(1) - p(0); d * d }).toArray
    val n = s2.length.toLong
    val ss2 = s2.sum
    val res = s2.map(v => n * v - ss2)
    var ss = 0.0
    res.foreach(v => ss += v.toDouble * v)
    val out = run("ts28_arch_effect").collect()
    assert(out.length == 5)
    var q = 0.0
    (1 to 5).foreach { k =>
      var a = 0.0
      (k until res.length).foreach(t => a += res(t).toDouble * res(t - k))
      val rho = a / ss
      q += rho * rho / (n - k)
      val row = out(k - 1)
      assert(row.getAs[Long]("n_pairs") == n - k)
      assert(row.getAs[Long]("rho_e6") == math.floor(1.0e6 * rho).toLong)
      assert(row.getAs[Long]("q_e6") ==
        math.floor(1.0e6 * n * (n + 2) * q).toLong)
    }
  }

  test("d16: calendar gaps match a brute spine replay") {
    val s = spark
    import graft.queries.Tables.t
    val act = t(s, dir, "orders").filter(col("o_custkey") % 97 === 0)
      .selectExpr("CAST(o_orderdate AS DATE) day").distinct()
      .collect().map(_.getAs[java.sql.Date](0).toLocalDate.toEpochDay)
      .sorted
    val all = (act.min to act.max).toSet
    val missing = (all -- act.toSet).toSeq.sorted
    var gaps = 0L; var longest = 0L; var cur = 0L; var prev = Long.MinValue
    missing.foreach { e =>
      if (e == prev + 1) cur += 1 else { gaps += 1; cur = 1 }
      longest = math.max(longest, cur); prev = e
    }
    val r = run("d16_calendar_gaps").collect()(0)
    assert(r.getAs[Long]("n_active") == act.length.toLong)
    assert(r.getAs[Long]("n_missing") == missing.length.toLong)
    assert(r.getAs[Long]("n_gaps") == gaps)
    assert(r.getAs[Long]("longest_gap") == longest)
    assert(r.getAs[Long]("missing_share_e6") ==
      missing.length.toLong * 1000000L / (act.length + missing.length))
  }

  // ------------------------------------------------------------------
  // wave 62: cs63 / sa22 / w34
  // ------------------------------------------------------------------

  test("cs63: collision audit matches brute truncated-md5 counts") {
    val s = spark
    import graft.queries.Tables.t
    val hs = t(s, dir, "documents").selectExpr("md5(text) h")
      .collect().map(_.getString(0))
    val out = run("cs63_hash_collision_audit").collect()
      .map(r => (r.getAs[Long]("bits"), r)).toMap
    assert(out.keySet == Set(16L, 24L, 32L))
    Seq((4, 16L), (6, 24L), (8, 32L)).foreach { case (hex, bits) =>
      val ndv = hs.map(_.take(hex)).distinct.length.toLong
      val n = hs.length.toLong
      val r = out(bits)
      assert(r.getAs[Long]("n") == n && r.getAs[Long]("ndv") == ndv)
      assert(r.getAs[Long]("observed") == n - ndv)
      val exp = n.toDouble * (n - 1) / math.pow(2.0, bits + 1.0)
      assert(r.getAs[Long]("expected_e6") ==
        math.floor(1.0e6 * exp).toLong)
    }
    // narrower hashes can only collide more
    assert(out(16L).getAs[Long]("observed") >=
      out(32L).getAs[Long]("observed"))
  }

  test("sa22: sample-size planner matches the closed form") {
    val s = spark
    import graft.queries.Tables.t
    val rows = t(s, dir, "events")
      .selectExpr("event_type", "value >= 100.0 hit")
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    val out = run("sa22_proportion_n").collect()
    out.foreach { r =>
      val grp = rows.filter(_._1 == r.getAs[String]("event_type"))
      val n = grp.length.toLong
      val x = grp.count(_._2).toLong
      val px = x.toDouble / n
      val nStar = math.ceil(3.8416 * px * (1 - px) / (0.02 * 0.02)).toLong
      assert(r.getAs[Long]("n") == n && r.getAs[Long]("x") == x)
      assert(r.getAs[Long]("n_star") == nStar)
      assert(r.getAs[Long]("sufficient") == (if (n >= nStar) 1L else 0L))
    }
  }

  test("w34: up-streak histogram matches a brute islands replay") {
    val ys = dailyCents().map(_._2)
    val ups = ys.sliding(2).map(p => p(1) > p(0)).toArray
    val lens = scala.collection.mutable.ArrayBuffer[Long]()
    var cur = 0L
    ups.foreach { u =>
      if (u) cur += 1 else { if (cur > 0) lens += cur; cur = 0 } }
    if (cur > 0) lens += cur
    val hist = lens.groupBy(identity(_)).view
      .mapValues(_.size.toLong).toMap
    val nt = hist.values.sum
    val out = run("w34_upstreak_histogram").collect()
    assert(out.map(_.getAs[Long]("n_runs")).sum == nt)
    out.foreach { r =>
      val len = r.getAs[Long]("len")
      assert(r.getAs[Long]("n_runs") == hist(len))
      assert(r.getAs[Long]("expected_e6") == math.floor(
        1.0e6 * nt / math.pow(2.0, len.toDouble)).toLong)
    }
    // total streak days equals total up days
    assert(lens.sum == ups.count(identity(_)).toLong)
  }

  // ------------------------------------------------------------------
  // wave 63: cs64 / w35 / gr22
  // ------------------------------------------------------------------

  test("cs64: G statistic matches a brute replay and tracks chi2") {
    val s = spark
    import graft.queries.Tables.t
    val dows = t(s, dir, "orders")
      .selectExpr("CAST(dayofweek(CAST(o_orderdate AS DATE)) AS LONG) w")
      .collect().map(_.getLong(0))
    val counts = dows.groupBy(identity(_)).view
      .mapValues(_.length.toLong).toMap
    val n = dows.length.toLong
    val out = run("cs64_g_test").collect()
    var g = 0.0
    out.sortBy(_.getAs[Long]("dow")).foreach { r =>
      val o = counts(r.getAs[Long]("dow"))
      val term = 2.0 * o * math.log(7.0 * o / n)
      g += term
      assert(r.getAs[Long]("o") == o)
      assert(r.getAs[Long]("term_e6") == math.floor(1.0e6 * term).toLong)
      assert(r.getAs[Long]("g_cum_e6") == math.floor(1.0e6 * g).toLong)
    }
    assert(g >= 0.0 - 1e-9) // G is nonnegative at the MLE
  }

  test("w35: ACF argmax is decided on exact integers") {
    val s = spark
    import graft.queries.Tables.t
    val xs = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
      .orderBy("day").collect().map(_.getLong(1))
    val n = xs.length.toLong
    val sx = xs.sum
    val res = xs.map(x => n * x - sx)
    val ss = res.map(v => v * v).sum
    val as = (2 to 14).map(k =>
      (k.toLong, (k until xs.length).map(t => res(t) * res(t - k)).sum))
    val (bestLag, aBest) = as.sortBy(p => (-p._2, p._1)).head
    val a7 = as.find(_._1 == 7L).get._2
    val r = run("w35_acf_peak_lag").collect()(0)
    assert(r.getAs[Long]("best_lag") == bestLag)
    assert(r.getAs[Long]("rho_best_e6") ==
      math.floor(1.0e6 * (aBest.toDouble / ss)).toLong)
    assert(r.getAs[Long]("rho_lag7_e6") ==
      math.floor(1.0e6 * (a7.toDouble / ss)).toLong)
    assert(r.getAs[Long]("rho_best_e6") >= r.getAs[Long]("rho_lag7_e6"))
  }

  test("gr22: two-hop reach matches a brute neighborhood replay") {
    val s = spark
    import graft.queries.Tables.t
    val nodes = t(s, dir, "documents").selectExpr("doc_id % 499 u")
      .collect().map(_.getLong(0)).distinct
    val edges = nodes.flatMap(u =>
      Seq((u, (7 * u + 1) % 499), (u, (3 * u + 2) % 499)))
      .filter(e => e._1 != e._2).distinct
    val adj = (edges ++ edges.map(_.swap)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val reach = adj.map { case (u, n1) =>
      val n2 = n1 ++ n1.flatMap(adj.getOrElse(_, Set.empty[Long]))
      (n2 - u).size.toLong
    }
    val brute = reach.groupBy(identity(_)).view
      .mapValues(_.size.toLong).toMap
    val got = run("gr22_two_hop_reach").collect()
      .map(r => (r.getAs[Long]("reach2"), r.getAs[Long]("n_nodes")))
      .toMap
    assert(got == brute)
    assert(got.values.sum == adj.size.toLong)
  }

  // ------------------------------------------------------------------
  // wave 64: ml21 / sa23 / j15
  // ------------------------------------------------------------------

  test("ml21: Youden sweep matches brute force with an integer argmax") {
    val docs = docLabels()
    val p = docs.count(_._3).toLong
    val q = docs.length - p
    val sweep = (1 to 10).map { i =>
      val thr = i * 64L
      val tp = docs.count(d => d._2 >= thr && d._3).toLong
      val fp = docs.count(d => d._2 >= thr && !d._3).toLong
      (thr, tp, fp, tp * q - fp * p)
    }
    val bestThr = sweep.sortBy(s4 => (-s4._4, s4._1)).head._1
    val out = run("ml21_youden_threshold").collect()
    assert(out.length == 10)
    out.zip(sweep).foreach { case (r, (thr, tp, fp, jn)) =>
      assert(r.getAs[Long]("thr") == thr)
      assert(r.getAs[Long]("tp") == tp && r.getAs[Long]("fp") == fp)
      assert(r.getAs[Long]("j_num") == jn)
      assert(r.getAs[Long]("j_e6") ==
        math.floor(1.0e6 * jn.toDouble / (p.toDouble * q)).toLong)
      assert(r.getAs[Long]("is_best") == (if (thr == bestThr) 1L else 0L))
    }
    assert(out.map(_.getAs[Long]("is_best")).sum == 1L)
  }

  test("sa23: FPC standard errors match a brute stratified replay") {
    val s = spark
    import graft.queries.Tables.t
    import graft.operators.Sampling
    val rows = t(s, dir, "customer")
      .select(col("c_nationkey").cast("long").as("nat"),
        floor(col("c_acctbal") * 100).cast("long").as("cents"),
        (Sampling.hashFraction(col("c_custkey").cast("string")) < 0.2)
          .as("ins"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val out = run("sa23_fpc_se").collect()
    out.foreach { r =>
      val grp = rows.filter(_._1 == r.getAs[Long]("nat"))
      val samp = grp.filter(_._3).map(_._2)
      val (nPop, n) = (grp.length.toLong, samp.length.toLong)
      assert(r.getAs[Long]("n_pop") == nPop && r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("fpc_e6") == (nPop - n) * 1000000L / nPop)
      if (n < 2) assert(r.isNullAt(r.fieldIndex("se_cents_e2")))
      else {
        val (sx, sxx) = (samp.sum, samp.map(x => x * x).sum)
        val se = math.sqrt((1.0 - n.toDouble / nPop) *
          (n.toDouble * sxx - sx.toDouble * sx) /
          (n.toDouble * n * (n - 1)))
        assert(r.getAs[Long]("se_cents_e2") ==
          math.floor(1.0e2 * se).toLong)
      }
    }
  }

  test("j15: exact join sizes from histograms; estimates graded") {
    val s = spark
    import graft.queries.Tables.t
    val od = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("k"))
      .agg(count(lit(1)).as("a")).collect()
      .map(r => (r.getAs[java.sql.Date](0).toLocalDate, r.getLong(1)))
      .toMap
    val ld = t(s, dir, "lineitem")
      .groupBy(to_date(col("l_shipdate")).as("k"))
      .agg(count(lit(1)).as("b")).collect()
      .map(r => (r.getAs[java.sql.Date](0).toLocalDate, r.getLong(1)))
      .toMap
    val out = run("j15_join_cardinality_estimate").collect()
      .map(r => (r.getAs[String]("join_name"), r)).toMap
    val selfExact = od.values.map(a => a * a).sum
    val selfEst = od.values.sum * od.values.sum / od.size
    val rSelf = out("orders_self_date")
    assert(rSelf.getAs[Long]("exact_rows") == selfExact)
    assert(rSelf.getAs[Long]("est_rows") == selfEst)
    val olExact = od.keySet.intersect(ld.keySet).toSeq
      .map(k => od(k) * ld(k)).sum
    val olEst = od.values.sum * ld.values.sum /
      math.max(od.size, ld.size)
    val rOl = out("orders_lineitem_date")
    assert(rOl.getAs[Long]("exact_rows") == olExact)
    assert(rOl.getAs[Long]("est_rows") == olEst)
    assert(rOl.getAs[Long]("rel_err_e6") == math.floor(1.0e6 *
      (olEst.toDouble - olExact) / olExact).toLong)
  }
}
