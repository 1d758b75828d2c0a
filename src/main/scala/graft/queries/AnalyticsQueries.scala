package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Intervals, Sampling, Triangles, ZOrder}
import Tables.t

/** Round-11 third wave: warehouse analytics / layout / graph operators that
  * round out the engine beyond SURVEY §2 — interval coalescing, sketch-vs-
  * exact audits, data-quality expectations, split-fairness statistics,
  * Z-order layout, and degree-oriented triangle counting. Every entry is
  * DuckDB-oracle graded; scale notes live on the operator objects.
  */
object AnalyticsQueries {

  private def dt(c: Column): Column = to_date(c)

  val all: Seq[Q] = Seq(

    // W7 — gaps-and-islands: merge each user's half-open activity intervals
    // [ts, ts+30min) into maximal islands (`operators/Intervals.scala`; the
    // overlap-sessionization twin of st2's gap-based session windows). One
    // shuffle on user_id; the groupBy reuses the window's partitioning.
    Q("w7_gap_islands", (s, dir) => {
      val iv = t(s, dir, "events").select(
        col("user_id"), col("event_id"),
        col("ts").as("st"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("en"))
      Intervals.coalesceIntervals(iv, "user_id", "st", "en", "event_id")
        .select(col("user_id"), col("island_id").cast("long").as("island_id"),
          col("island_start"), col("island_end"), col("n_rows"))
        .orderBy("user_id", "island_id")
    }, Some("""
      WITH iv AS (
        SELECT user_id, event_id, ts AS st,
               ts + INTERVAL 30 MINUTE AS en
        FROM events),
      m AS (
        SELECT *, max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        FROM iv),
      o AS (
        SELECT *, CASE WHEN pme IS NULL OR st > pme THEN 1 ELSE 0 END AS opens
        FROM m),
      i AS (
        SELECT *, sum(opens) OVER (PARTITION BY user_id ORDER BY st, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
        FROM o)
      SELECT user_id, CAST(island_id AS BIGINT) AS island_id,
             min(st) AS island_start, max(en) AS island_end,
             count(*) AS n_rows
      FROM i GROUP BY 1, 2 ORDER BY 1, 2""")),

    // HQ3 — approx_percentile accuracy audit (the hll1 pattern applied to
    // quantiles): Spark's t-digest-style sketch estimate must land inside
    // the exact p40–p60 band; the graded columns are the exact median and
    // the band verdict, both engine-reproducible. At 100 TB the sketch IS
    // the plan (mergeable, one pass); this audit is what certifies it.
    Q("hq3_approx_percentile_audit", (s, dir) =>
      t(s, dir, "orders").groupBy("o_orderpriority")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("exact_p50"),
          expr("approx_percentile(o_totalprice, 0.5, 1000)").as("__ap"),
          expr("percentile(o_totalprice, 0.4)").as("__lo"),
          expr("percentile(o_totalprice, 0.6)").as("__hi"))
        .select(col("o_orderpriority"), col("exact_p50"),
          (col("__ap") >= col("__lo") && col("__ap") <= col("__hi"))
            .as("within_band"))
        .orderBy("o_orderpriority"),
      Some("""
      SELECT o_orderpriority,
             round(quantile_cont(o_totalprice, 0.5), 4) AS exact_p50,
             TRUE AS within_band
      FROM orders GROUP BY 1 ORDER BY 1""")),

    // CS10 — one-pass constraint audit (the dbt-style expectation suite a
    // loader runs before publishing a drop): PK uniqueness, FK non-null,
    // enum domain, value range, date bounds — ALL from a single aggregate
    // (one scan, one 1-row shuffle), melted to a (check, passed, observed)
    // report via stack. The reference encodes these as Postgres constraints
    // (`schema.sql`: PRIMARY KEY / NOT NULL / CHECK); this is their
    // scan-time equivalent when the sink has no constraint engine.
    Q("cs10_constraint_audit", (s, dir) =>
      t(s, dir, "orders").agg(
        count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("d_pk"),
        count(col("o_custkey")).as("c_fk"),
        sum(when(col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0))
          .as("c_dom"),
        round(min("o_totalprice"), 2).as("mn_tp"),
        min(dt(col("o_orderdate"))).as("mn_d"),
        max(dt(col("o_orderdate"))).as("mx_d"))
        .select(expr("""stack(5,
          'pk_unique',          d_pk = n,        CAST(d_pk AS DOUBLE),
          'fk_custkey_nonnull', c_fk = n,        CAST(c_fk AS DOUBLE),
          'status_in_domain',   c_dom = n,       CAST(c_dom AS DOUBLE),
          'totalprice_positive', mn_tp > 0.0,    mn_tp,
          'orderdate_in_range',
            mn_d >= DATE '1992-01-01' AND mx_d <= DATE '1998-12-31',
            CAST(datediff(mx_d, mn_d) AS DOUBLE))
          AS (check_name, passed, observed)"""))
        .orderBy("check_name"),
      Some("""
      WITH a AS (
        SELECT count(*) AS n,
               count(DISTINCT o_orderkey) AS d_pk,
               count(o_custkey) AS c_fk,
               sum(CASE WHEN o_orderstatus IN ('F','O','P') THEN 1 ELSE 0 END) AS c_dom,
               round(min(o_totalprice), 2) AS mn_tp,
               min(CAST(o_orderdate AS DATE)) AS mn_d,
               max(CAST(o_orderdate AS DATE)) AS mx_d
        FROM orders)
      SELECT * FROM (
        SELECT 'pk_unique' AS check_name, d_pk = n AS passed,
               CAST(d_pk AS DOUBLE) AS observed FROM a
        UNION ALL
        SELECT 'fk_custkey_nonnull', c_fk = n, CAST(c_fk AS DOUBLE) FROM a
        UNION ALL
        SELECT 'status_in_domain', c_dom = n, CAST(c_dom AS DOUBLE) FROM a
        UNION ALL
        SELECT 'totalprice_positive', mn_tp > 0.0, mn_tp FROM a
        UNION ALL
        SELECT 'orderdate_in_range',
               mn_d >= DATE '1992-01-01' AND mx_d <= DATE '1998-12-31',
               CAST(mx_d - mn_d AS DOUBLE) FROM a)
      ORDER BY check_name""")),

    // SA9 — split-fairness chi-square: is the language distribution
    // independent of the sa1 train/val/test assignment? Pearson chi² over
    // the full splits×langs contingency table (absent cells count as 0 —
    // the cross join materializes them), expected counts from the marginal
    // products. A skewed hash would trip this long before a model does.
    // All shuffles are on the tiny contingency table; the only corpus-sized
    // work is the one groupBy building it.
    Q("sa9_split_chisq", (s, dir) => {
      val docs = t(s, dir, "documents").select(col("lang"),
        Sampling.splitLabel(col("doc_id").cast("string")).as("split"))
      val cells = docs.groupBy("split", "lang").agg(count(lit(1)).as("n"))
      val full = cells.select("split").distinct()
        .crossJoin(cells.select("lang").distinct())
        .join(cells, Seq("split", "lang"), "left")
        .na.fill(0, Seq("n"))
      val rs = full.groupBy("split").agg(sum("n").as("rs"))
      val cs = full.groupBy("lang").agg(sum("n").as("cs"))
      val tot = full.agg(sum("n").as("tot"))
      full.join(rs, "split").join(cs, "lang").crossJoin(broadcast(tot))
        .withColumn("e", col("rs") * col("cs") / col("tot"))
        .agg(
          round(sum(pow(col("n") - col("e"), 2) / col("e")), 4).as("chi2"),
          ((countDistinct("split") - 1) * (countDistinct("lang") - 1))
            .cast("long").as("df"))
    }, Some("""
      WITH f AS (
        SELECT doc_id, lang,
               list_sum(list_transform(generate_series(1, 8), i ->
                 (strpos('0123456789abcdef',
                         substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)
                 * (16.0 ** (8 - i)))) / 4294967296.0 AS frac
        FROM documents),
      d AS (
        SELECT lang, CASE WHEN frac < 0.8 THEN 'train'
                          WHEN frac < 0.9 THEN 'val'
                          ELSE 'test' END AS split FROM f),
      cells AS (SELECT split, lang, count(*) AS n FROM d GROUP BY 1, 2),
      fl AS (
        SELECT s.split, l.lang, coalesce(c.n, 0) AS n
        FROM (SELECT DISTINCT split FROM cells) s
        CROSS JOIN (SELECT DISTINCT lang FROM cells) l
        LEFT JOIN cells c ON c.split = s.split AND c.lang = l.lang),
      m AS (
        SELECT split, lang, n,
               sum(n) OVER (PARTITION BY split) AS rs,
               sum(n) OVER (PARTITION BY lang) AS cs,
               sum(n) OVER () AS tot
        FROM fl)
      SELECT round(sum((n - rs * cs / tot) ** 2 / (rs * cs / tot)), 4) AS chi2,
             CAST((count(DISTINCT split) - 1) * (count(DISTINCT lang) - 1)
                  AS BIGINT) AS df
      FROM m""")),

    // ZO1 — Z-order layout audit (`operators/ZOrder.scala`): events keyed
    // by (user_id mod 1024, day-of-year), Morton-interleaved, range-split
    // into 16 "files"; the graded report is each file's min/max envelope in
    // BOTH dimensions — the zone-map a scan would prune against. The write
    // path at scale is `repartitionByRange(zkey)` + sortWithinPartitions;
    // ntile here stands in for the range split so the file boundaries are
    // engine-reproducible.
    Q("zo1_zorder_layout", (s, dir) => {
      val keyed = t(s, dir, "events").select(
        col("event_id"),
        (col("user_id") % 1024).cast("int").as("x"),
        dayofyear(col("ts")).as("y"))
        .withColumn("zkey", ZOrder.mortonKey(col("x"), col("y")))
      keyed
        .withColumn("file_id",
          ntile(16).over(Window.orderBy(col("zkey"), col("event_id"))))
        .groupBy("file_id")
        .agg(min("x").as("min_x"), max("x").as("max_x"),
          min("y").as("min_y"), max("y").as("max_y"),
          count(lit(1)).as("n"))
        .orderBy("file_id")
    }, Some(s"""
      WITH keyed AS (
        SELECT event_id,
               CAST(user_id % 1024 AS INT) AS x,
               CAST(date_part('doy', ts) AS INT) AS y
        FROM events),
      z AS (
        SELECT *, ${ZOrder.mortonKeySql("x", "y")} AS zkey FROM keyed),
      f AS (
        SELECT *, ntile(16) OVER (ORDER BY zkey, event_id) AS file_id FROM z)
      SELECT file_id, min(x) AS min_x, max(x) AS max_x,
             min(y) AS min_y, max(y) AS max_y, count(*) AS n
      FROM f GROUP BY 1 ORDER BY 1""")),

    // GR1 — degree-oriented triangle counting (`operators/Triangles.scala`)
    // over the part-co-occurrence graph of one shipping year (parts are
    // connected when the same order ships both). The orientation bounds
    // every node's wedge fan-out at O(√E) — the hub-killer that makes the
    // count feasible when the co-occurrence graph is power-law at 100 TB.
    Q("gr1_triangle_count", (s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(dt(col("l_shipdate"))
          .between(lit("1995-01-01"), lit("1995-12-31")))
        .select(col("l_orderkey").as("okey"), col("l_partkey").as("node"))
        .distinct()
      val edges = li.as("l1").join(li.as("l2"), "okey")
        .filter(col("l1.node") < col("l2.node"))
        .select(col("l1.node").as("u"), col("l2.node").as("v"))
      Triangles.trianglesPerApex(edges).orderBy("apex")
    }, Some("""
      WITH li AS (
        SELECT DISTINCT l_orderkey AS okey, l_partkey AS node
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE)
              BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'),
      und AS (
        SELECT DISTINCT a.node AS a, b.node AS b
        FROM li a JOIN li b USING (okey) WHERE a.node < b.node),
      deg AS (
        SELECT node, count(*) AS deg FROM (
          SELECT a AS node FROM und UNION ALL SELECT b FROM und)
        GROUP BY 1),
      ori AS (
        SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
                    THEN u.a ELSE u.b END AS src,
               CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
                    THEN u.b ELSE u.a END AS dst
        FROM und u JOIN deg da ON u.a = da.node JOIN deg db ON u.b = db.node),
      wed AS (
        SELECT e1.src, e1.dst AS x, e2.dst AS y
        FROM ori e1 JOIN ori e2 USING (src) WHERE e1.dst < e2.dst),
      clo AS (SELECT least(src, dst) AS x, greatest(src, dst) AS y FROM ori)
      SELECT w.src AS apex, count(*) AS n_tri
      FROM wed w JOIN clo USING (x, y)
      GROUP BY 1 ORDER BY 1""")),

    // RL1 — record-linkage verification: Jaro-Winkler similarity (native
    // codegen'd expression, `expressions/StringSimExprs.scala`) over
    // BLOCKED part-name candidate pairs — the blocking equi-join on
    // (brand, size) bounds pair count the way every verifier in this repo
    // does; JW never runs all-pairs. The threshold filters on the ROUNDED
    // score so the cut is reproducible across engines; DuckDB's
    // jaro_winkler_similarity is the oracle (byte-level semantics,
    // fuzz-verified — see the expression's Scaladoc).
    Q("rl1_jaro_winkler_block", (s, dir) => {
      val p = t(s, dir, "part")
        .select("p_partkey", "p_name", "p_brand", "p_size")
      p.as("x").join(p.as("y"),
        col("x.p_brand") === col("y.p_brand") &&
          col("x.p_size") === col("y.p_size") &&
          col("x.p_partkey") < col("y.p_partkey"))
        .select(col("x.p_partkey").as("k1"), col("y.p_partkey").as("k2"),
          round(graft.expressions.VecFns.jaroWinkler(
            col("x.p_name"), col("y.p_name")), 4).as("jw"))
        .filter(col("jw") >= 0.8)
        .orderBy("k1", "k2")
    }, Some("""
      SELECT x.p_partkey AS k1, y.p_partkey AS k2,
             round(jaro_winkler_similarity(x.p_name, y.p_name), 4) AS jw
      FROM part x JOIN part y
        ON x.p_brand = y.p_brand AND x.p_size = y.p_size
       AND x.p_partkey < y.p_partkey
      WHERE round(jaro_winkler_similarity(x.p_name, y.p_name), 4) >= 0.8
      ORDER BY 1, 2""")),

    // RL2 — entity resolution end-to-end: the rl1 match pairs (tightened to
    // jw >= 0.9) become edges, transitive closure via the alternating-star
    // connected components gives each part an entity id (min member key).
    // Ground truth is DuckDB's recursive-CTE reachability over the SAME
    // jaro_winkler-derived edges — the cc1 grading pattern applied to
    // similarity edges instead of a synthetic fixture.
    Q("rl2_entity_clusters", (s, dir) => {
      val p = t(s, dir, "part")
        .select("p_partkey", "p_name", "p_brand", "p_size")
      val pairs = p.as("x").join(p.as("y"),
        col("x.p_brand") === col("y.p_brand") &&
          col("x.p_size") === col("y.p_size") &&
          col("x.p_partkey") < col("y.p_partkey"))
        .filter(round(graft.expressions.VecFns.jaroWinkler(
          col("x.p_name"), col("y.p_name")), 4) >= 0.9)
        .select(col("x.p_partkey").as("k1"), col("y.p_partkey").as("k2"))
      val cc = graft.operators.Components
        .connectedComponents(pairs, "k1", "k2")
      val keys = p.select("p_partkey")
      keys.join(cc, keys("p_partkey") === cc("node"), "left")
        .select(keys("p_partkey"),
          coalesce(col("component"), keys("p_partkey")).as("entity"))
        .orderBy("p_partkey")
    }, Some("""
      WITH RECURSIVE
      pairs AS (
        SELECT x.p_partkey AS u, y.p_partkey AS v
        FROM part x JOIN part y
          ON x.p_brand = y.p_brand AND x.p_size = y.p_size
         AND x.p_partkey < y.p_partkey
        WHERE round(jaro_winkler_similarity(x.p_name, y.p_name), 4) >= 0.9),
      edges AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
      reach(u, v) AS (
        SELECT p_partkey, p_partkey FROM part
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
      SELECT u AS p_partkey, min(v) AS entity FROM reach GROUP BY u
      ORDER BY p_partkey""")),

    // SIM12 — sparse TF-IDF cosine pairs via inverted-index join
    // (`TextAnalysis.sparseCosinePairs`): the sparse twin of the dense ANN
    // family, over 3-word shingle terms (the unigram vocabulary of this
    // corpus is ~31 terms — all stop terms; shingles keep df low). The df
    // cap (= dd10's stop-term move) is what bounds the postings self-join
    // at Σdf² ≤ maxDf·|postings|; the threshold filters on the ROUNDED
    // cosine for an engine-portable cut.
    Q("sim12_sparse_cosine", (s, dir) =>
      graft.operators.TextAnalysis
        .sparseCosinePairs(t(s, dir, "documents"), "doc_id", "text", maxDf = 50)
        .filter(col("cosine") >= 0.5)
        .orderBy("d1", "d2"),
      Some("""
      WITH ws AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      toks AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(w) - 2),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tok
        FROM ws WHERE len(w) >= 3),
      tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
      dfreq AS (
        SELECT tok, count(*) AS df
        FROM (SELECT DISTINCT doc_id, tok FROM toks)
        GROUP BY tok HAVING count(*) BETWEEN 2 AND 50),
      n AS (SELECT count(*) AS n FROM documents),
      w AS (
        SELECT t.doc_id, t.tok, t.tf * ln(CAST(n.n AS DOUBLE) / d.df) AS w
        FROM tf t JOIN dfreq d USING (tok), n),
      nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
      dots AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, sum(a.w * b.w) AS dot
        FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT d1, d2, round(dot / (x.nrm * y.nrm), 6) AS cosine
      FROM dots JOIN nrm x ON d1 = x.doc_id JOIN nrm y ON d2 = y.doc_id
      WHERE round(dot / (x.nrm * y.nrm), 6) >= 0.5
      ORDER BY 1, 2""")),

    // TS1 — seasonal-residual anomaly detection on the daily event count:
    // day-of-week means are the seasonal baseline, residuals beyond
    // 2×stddev_pop flag as anomalies. All comparisons run on ROUNDED
    // values so the boundary verdicts are engine-portable. The corpus-
    // sized work is one groupBy(day); everything after runs on the tiny
    // day table.
    Q("ts1_seasonal_residuals", (s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("n"))
      val wDow = Window.partitionBy(dayofweek(col("d")))
      val wAll = Window.partitionBy()
      daily
        .withColumn("baseline", avg(col("n")).over(wDow))
        .withColumn("resid", col("n") - col("baseline"))
        .withColumn("thr", lit(2.0) * stddev_pop(col("resid")).over(wAll))
        .select(col("d"), col("n"),
          round(col("baseline"), 4).as("baseline"),
          round(col("resid"), 4).as("resid"),
          (abs(round(col("resid"), 4)) > round(col("thr"), 4)).as("anomaly"))
        .orderBy("d")
    }, Some("""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, count(*) AS n
        FROM events GROUP BY 1),
      b AS (
        SELECT d, n,
               avg(n) OVER (PARTITION BY date_part('dow', d)) AS baseline
        FROM daily),
      r AS (SELECT *, n - baseline AS resid FROM b),
      s AS (SELECT *, 2.0 * stddev_pop(resid) OVER () AS thr FROM r)
      SELECT d, n, round(baseline, 4) AS baseline, round(resid, 4) AS resid,
             abs(round(resid, 4)) > round(thr, 4) AS anomaly
      FROM s ORDER BY d""")),

    // LP1 — synchronous label propagation, 2 fixed rounds, over the cc1/pr1
    // deterministic fixture graph (chains + decade hubs from doc_id
    // arithmetic). Each round every node adopts its neighbors' most
    // frequent label, min label on ties — deterministic, so the oracle
    // unrolls the identical two rounds in SQL (the pr1 grading pattern).
    Q("lp1_label_propagation", (s, dir) => {
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val chain = ids.filter(col("doc_id") % 100 =!= 0)
        .select(col("doc_id").as("a"), (col("doc_id") - 1).as("b"))
      val hub = ids.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id").as("a"),
          (col("doc_id") - col("doc_id") % 10).as("b"))
      graft.operators.Components
        .labelPropagation(chain.unionByName(hub), "a", "b", rounds = 2)
        .orderBy("node")
    }, Some("""
      WITH fixture AS (
        SELECT doc_id AS u, doc_id - 1 AS v FROM documents
        WHERE doc_id % 100 <> 0
        UNION ALL
        SELECT doc_id, doc_id - doc_id % 10 FROM documents
        WHERE doc_id % 10 <> 0),
      e AS (SELECT u, v FROM fixture UNION SELECT v, u FROM fixture),
      nodes AS (SELECT DISTINCT u AS node FROM e),
      l0 AS (SELECT node, node AS label FROM nodes),
      r1c AS (
        SELECT e.u AS node, l.label, count(*) AS cnt
        FROM e JOIN l0 l ON e.v = l.node GROUP BY 1, 2),
      r1 AS (
        SELECT node, label FROM (
          SELECT node, label, row_number() OVER (
            PARTITION BY node ORDER BY cnt DESC, label) AS rn
          FROM r1c) WHERE rn = 1),
      l1 AS (
        SELECT n.node, coalesce(r.label, n.node) AS label
        FROM nodes n LEFT JOIN r1 r USING (node)),
      r2c AS (
        SELECT e.u AS node, l.label, count(*) AS cnt
        FROM e JOIN l1 l ON e.v = l.node GROUP BY 1, 2),
      r2 AS (
        SELECT node, label FROM (
          SELECT node, label, row_number() OVER (
            PARTITION BY node ORDER BY cnt DESC, label) AS rn
          FROM r2c) WHERE rn = 1)
      SELECT n.node, coalesce(r.label, n.node) AS label
      FROM nodes n LEFT JOIN r2 r USING (node)
      ORDER BY node""")),

    // J7b — the as-of join through the CUSTOM PHYSICAL OPERATOR
    // (`plans/AsOfJoinPlan.scala`: LogicalPlan → Strategy → AsOfJoinExec,
    // injected via GraftExtensions): same semantics and same DuckDB ASOF
    // oracle as j7, but planned as one key-aligned merge pass per
    // partition instead of union+window — half the sorted bytes, no
    // combined-stream materialization, no post-filter. AsOfExecSpec gates
    // row-equality with the composition and the exchange/sort plan shape.
    Q("j7b_asof_native", (s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"),
          round(col("value"), 4).as("view_value"))
      graft.plans.AsOfJoinPlan.asOfNative(purchases, views, Seq("user_id"),
        probeTime = "ts", factTime = "view_ts",
        factPayload = Seq("view_value"))
        .orderBy("event_id")
    }, Some("""
      SELECT p.user_id, p.event_id, p.ts, v.view_ts, v.view_value
      FROM (SELECT user_id, event_id, ts FROM events
            WHERE event_type = 'purchase') p
      ASOF JOIN (SELECT user_id, ts AS view_ts, round(value, 4) AS view_value
                 FROM events WHERE event_type = 'view') v
        ON p.user_id = v.user_id AND p.ts >= v.view_ts
      ORDER BY event_id""")),

    // ST6 — stream-static enrichment join, batch form
    // (`StreamingLoad.streamStaticEnrich`; the streaming form — a live
    // file stream against the same static dim — is exercised in
    // StreamingSpec): events enriched with the customer dim, dim
    // broadcast so the fact side never exchanges. Inner keep drops
    // FK orphans (the J4 policy at the streaming door).
    Q("st6_stream_static_enrich", (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
      val dim = t(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_nationkey"),
          col("c_mktsegment"))
      graft.streaming.StreamingLoad.streamStaticEnrich(ev, dim, "user_id")
        .orderBy("event_id")
    }, Some("""
      SELECT e.event_id, e.user_id, e.event_type,
             c.c_nationkey, c.c_mktsegment
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      ORDER BY e.event_id""")),

    // W8 — EWMA rolling feature: per user, the exponentially-weighted mean
    // of the last 8 event values (alpha 0.7, weights renormalized over the
    // visible frame — the standard warm-up convention). The frame's values
    // are collected per row and folded with position weights — the only
    // way to weight BY OFFSET WITHIN the frame in either engine — so state
    // is the 8-row frame, one shuffle on user_id. Rounded to 6 for the
    // cross-engine hash.
    Q("w8_ewma_features", (s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id")).rowsBetween(-7, 0)
      t(s, dir, "events")
        .withColumn("vals", collect_list(round(col("value"), 4)).over(w))
        .select(col("event_id"), col("user_id"),
          round(expr("""
            aggregate(vals, named_struct('num', 0.0d, 'den', 0.0d),
              (acc, v) -> named_struct(
                'num', acc.num * 0.3d + v * 0.7d,
                'den', acc.den * 0.3d + 0.7d),
              acc -> acc.num / acc.den)"""), 6).as("ewma"))
        .orderBy("event_id")
    }, Some("""
      WITH f AS (
        SELECT event_id, user_id,
               list(round(value, 4)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS vals
        FROM events),
      r AS (
        SELECT event_id, user_id,
               list_reduce(
                 list_prepend(
                   {'num': CAST(0.0 AS DOUBLE), 'den': CAST(0.0 AS DOUBLE),
                    'v': CAST(0.0 AS DOUBLE)},
                   list_transform(vals, v ->
                     {'num': CAST(0.0 AS DOUBLE), 'den': CAST(0.0 AS DOUBLE),
                      'v': CAST(v AS DOUBLE)})),
                 (a, x) -> {'num': a.num * CAST(0.3 AS DOUBLE)
                                     + x.v * CAST(0.7 AS DOUBLE),
                            'den': a.den * CAST(0.3 AS DOUBLE)
                                     + CAST(0.7 AS DOUBLE),
                            'v': CAST(0.0 AS DOUBLE)}) AS acc
        FROM f)
      SELECT event_id, user_id, round(acc.num / acc.den, 6) AS ewma
      FROM r ORDER BY event_id""")),

    // W9 — forward fill (LOCF): a deterministically-nulled metric (view
    // events hide their value) is repaired per user by carrying the last
    // non-null observation forward — `last(_, ignoreNulls)` over the
    // unbounded-preceding frame, the standard sensor/tick repair. One
    // shuffle on user_id; rows before any observation stay NULL.
    Q("w9_forward_fill", (s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("gapped",
          when(col("event_type") === "view", lit(null).cast("double"))
            .otherwise(round(col("value"), 4)))
        .select(col("event_id"), col("user_id"), col("gapped"),
          last(col("gapped"), ignoreNulls = true).over(w).as("filled"))
        .orderBy("event_id")
    }, Some("""
      SELECT event_id, user_id, gapped,
             last_value(gapped IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      FROM (SELECT event_id, user_id, ts,
                   CASE WHEN event_type = 'view' THEN NULL
                        ELSE round(value, 4) END AS gapped
            FROM events)
      ORDER BY event_id""")),

    // TS2 — resample to a daily grid + linear interpolation: each user's
    // sparse daily means become a dense [min_day, max_day] series, missing
    // days linearly interpolated between the bracketing observations (the
    // classic tick/sensor regularization before any rolling feature). Grid
    // = sequence() explode per user (rows ∝ users × span, never a cross
    // join); interpolation = two LOCF-style windows (last/next observed
    // day+value), so the whole repair is one user_id shuffle + two sorted
    // window passes. Edges before the first / after the last observation
    // hold (no extrapolation).
    Q("ts2_resample_interpolate", (s, dir) => {
      // daily means carried as 1e4-SCALED INTEGERS: the interpolation
      // below is then exact integer arithmetic + ONE identical float
      // division per row in either engine — midpoint values can't land
      // astride a decimal rounding boundary (they did when interpolating
      // rounded doubles: (a+b)/2 of 4-decimal values has an exact 5 in
      // the 5th place 10% of the time)
      val daily = t(s, dir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("d"))
        .agg(round(avg(col("value")) * 10000).cast("long").as("vs"))
      val grid = daily.groupBy("user_id")
        .agg(min("d").as("__mn"), max("d").as("__mx"))
        .select(col("user_id"),
          explode(expr("sequence(__mn, __mx, interval 1 day)")).as("d"))
      val wPrev = Window.partitionBy("user_id").orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy("user_id").orderBy("d")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      grid.join(daily, Seq("user_id", "d"), "left")
        .withColumn("pv", last(col("vs"), ignoreNulls = true).over(wPrev))
        .withColumn("pd", last(when(col("vs").isNotNull, col("d")),
          ignoreNulls = true).over(wPrev))
        .withColumn("nv", first(col("vs"), ignoreNulls = true).over(wNext))
        .withColumn("nd", first(when(col("vs").isNotNull, col("d")),
          ignoreNulls = true).over(wNext))
        .select(col("user_id"), col("d"),
          when(col("vs").isNotNull, col("vs") / lit(10000.0))
            .when(col("pv").isNull, col("nv") / lit(10000.0))
            .when(col("nv").isNull, col("pv") / lit(10000.0))
            .otherwise(
              (col("pv") * datediff(col("nd"), col("d")) +
                col("nv") * datediff(col("d"), col("pd"))) /
                (datediff(col("nd"), col("pd")) * lit(10000.0))).as("v"),
          col("vs").isNotNull.as("observed"))
        .orderBy("user_id", "d")
    }, Some("""
      WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(round(avg(value) * 10000) AS BIGINT) AS vs
        FROM events GROUP BY 1, 2),
      grid AS (
        SELECT user_id,
               CAST(unnest(generate_series(CAST(mn AS TIMESTAMP),
                 CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
        FROM (SELECT user_id, min(d) AS mn, max(d) AS mx
              FROM daily GROUP BY 1)),
      j AS (
        SELECT g.user_id, g.d, daily.vs FROM grid g
        LEFT JOIN daily ON daily.user_id = g.user_id AND daily.d = g.d),
      w AS (
        SELECT *,
          last_value(vs IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
          last_value(CASE WHEN vs IS NOT NULL THEN d END IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
          first_value(vs IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY d
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
          first_value(CASE WHEN vs IS NOT NULL THEN d END IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY d
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
        FROM j)
      SELECT user_id, d,
             CASE WHEN vs IS NOT NULL THEN vs / 10000.0
                  WHEN pv IS NULL THEN nv / 10000.0
                  WHEN nv IS NULL THEN pv / 10000.0
                  ELSE (pv * (nd - d) + nv * (d - pd))
                       / ((nd - pd) * 10000.0)
             END AS v,
             vs IS NOT NULL AS observed
      FROM w ORDER BY user_id, d""")),

    // CS11 — key-skew diagnostic report: the top-10 heaviest join/agg keys
    // with their share and cumulative share of the table — the report that
    // decides between a plain shuffle, a salted aggregate (a8) and an AQE
    // skew join. One groupBy sizes the keys; everything after runs on the
    // key-cardinality table.
    Q("cs11_skew_report", (s, dir) => {
      val sizes = t(s, dir, "lineitem")
        .groupBy(col("l_suppkey").as("key")).agg(count(lit(1)).as("n"))
      val tot = sizes.agg(sum("n").as("tot"))
      val w = Window.orderBy(col("n").desc, col("key"))
      sizes.crossJoin(broadcast(tot))
        .withColumn("rnk", row_number().over(w))
        .withColumn("cum", sum("n").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("rnk") <= 10)
        .select(col("rnk"), col("key"), col("n"),
          round(col("n") / col("tot"), 6).as("share"),
          round(col("cum") / col("tot"), 6).as("cum_share"))
        .orderBy("rnk")
    }, Some("""
      WITH sizes AS (
        SELECT l_suppkey AS key, count(*) AS n FROM lineitem GROUP BY 1),
      t AS (SELECT sum(n) AS tot FROM sizes),
      r AS (
        SELECT key, n,
               row_number() OVER (ORDER BY n DESC, key) AS rnk,
               sum(n) OVER (ORDER BY n DESC, key
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM sizes)
      SELECT rnk, key, n, round(n / tot, 6) AS share,
             round(cum / tot, 6) AS cum_share
      FROM r, t WHERE rnk <= 10 ORDER BY rnk""")),

    // CS12 — one-pass correlation matrix over lineitem's numeric columns:
    // all six Pearson pairs from a single aggregate (each corr is three
    // running sums — one scan, one 1-row shuffle), melted long. The
    // feature-selection / drift primer at corpus scale.
    Q("cs12_corr_matrix", (s, dir) =>
      t(s, dir, "lineitem").agg(
        round(corr("l_quantity", "l_extendedprice"), 6).as("c_qty_price"),
        round(corr("l_quantity", "l_discount"), 6).as("c_qty_disc"),
        round(corr("l_quantity", "l_tax"), 6).as("c_qty_tax"),
        round(corr("l_extendedprice", "l_discount"), 6).as("c_price_disc"),
        round(corr("l_extendedprice", "l_tax"), 6).as("c_price_tax"),
        round(corr("l_discount", "l_tax"), 6).as("c_disc_tax"))
        .select(expr("""stack(6,
          'quantity~extendedprice', c_qty_price,
          'quantity~discount',      c_qty_disc,
          'quantity~tax',           c_qty_tax,
          'extendedprice~discount', c_price_disc,
          'extendedprice~tax',      c_price_tax,
          'discount~tax',           c_disc_tax)
          AS (pair, pearson)"""))
        .orderBy("pair"),
      Some("""
      SELECT * FROM (
        SELECT 'quantity~extendedprice' AS pair,
               round(corr(l_quantity, l_extendedprice), 6) AS pearson
        FROM lineitem
        UNION ALL SELECT 'quantity~discount',
               round(corr(l_quantity, l_discount), 6) FROM lineitem
        UNION ALL SELECT 'quantity~tax',
               round(corr(l_quantity, l_tax), 6) FROM lineitem
        UNION ALL SELECT 'extendedprice~discount',
               round(corr(l_extendedprice, l_discount), 6) FROM lineitem
        UNION ALL SELECT 'extendedprice~tax',
               round(corr(l_extendedprice, l_tax), 6) FROM lineitem
        UNION ALL SELECT 'discount~tax',
               round(corr(l_discount, l_tax), 6) FROM lineitem)
      ORDER BY pair""")),

    // ML4 — group-wise closed-form linear regression (totalprice over
    // order-date epoch day, per priority): slope = cov/var from the same
    // one-pass aggregates the corr plan uses, intercept from the means —
    // a regression per group with zero iterations and one shuffle. The
    // "is this metric drifting over time, per segment" primitive.
    Q("ml4_groupwise_linreg", (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderpriority"),
          datediff(to_date(col("o_orderdate")),
            lit("1992-01-01").cast("date")).cast("double").as("x"),
          col("o_totalprice").as("y"))
        .groupBy("o_orderpriority")
        .agg(covar_pop(col("x"), col("y")).as("__cxy"),
          var_pop(col("x")).as("__vx"),
          avg(col("x")).as("__mx"), avg(col("y")).as("__my"),
          count(lit(1)).as("n"))
        .select(col("o_orderpriority"), col("n"),
          round(col("__cxy") / col("__vx"), 4).as("slope"),
          round(col("__my") - col("__cxy") / col("__vx") * col("__mx"), 2)
            .as("intercept"))
        .orderBy("o_orderpriority"),
      Some("""
      SELECT o_orderpriority, count(*) AS n,
             round(covar_pop(x, y) / var_pop(x), 4) AS slope,
             round(avg(y) - covar_pop(x, y) / var_pop(x) * avg(x), 2)
               AS intercept
      FROM (SELECT o_orderpriority,
                   CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01'
                        AS DOUBLE) AS x,
                   o_totalprice AS y
            FROM orders)
      GROUP BY 1 ORDER BY 1""")),

    // CS13 — A/B z-test: users hash-split into two arms (sa1's md5
    // fraction, so assignment is engine-reproducible), Welch z on the
    // per-arm means of the event value. The experiment-analysis shape:
    // corpus work is one groupBy(arm); the verdict math runs on 2 rows.
    Q("cs13_ab_ztest", (s, dir) => {
      val armed = t(s, dir, "events").select(
        when(Sampling.hashFraction(col("user_id").cast("string")) < 0.5, "A")
          .otherwise("B").as("arm"),
        col("value"))
      val stats = armed.groupBy("arm")
        .agg(count(lit(1)).as("n"), avg("value").as("m"),
          var_samp(col("value")).as("v"))
      val a = stats.filter(col("arm") === "A")
        .select(col("n").as("n_a"), col("m").as("m_a"), col("v").as("v_a"))
      val b = stats.filter(col("arm") === "B")
        .select(col("n").as("n_b"), col("m").as("m_b"), col("v").as("v_b"))
      a.crossJoin(broadcast(b))
        .select(col("n_a"), col("n_b"),
          round(col("m_a") - col("m_b"), 6).as("mean_diff"),
          round((col("m_a") - col("m_b")) /
            sqrt(col("v_a") / col("n_a") + col("v_b") / col("n_b")), 4)
            .as("z"))
    }, Some("""
      WITH f AS (
        SELECT CASE WHEN
                 list_sum(list_transform(generate_series(1, 8), i ->
                   (strpos('0123456789abcdef',
                           substr(md5(CAST(user_id AS VARCHAR)), i, 1)) - 1)
                   * (16.0 ** (8 - i)))) / 4294967296.0 < 0.5
               THEN 'A' ELSE 'B' END AS arm, value
        FROM events),
      s AS (
        SELECT arm, count(*) AS n, avg(value) AS m, var_samp(value) AS v
        FROM f GROUP BY 1),
      a AS (SELECT n AS n_a, m AS m_a, v AS v_a FROM s WHERE arm = 'A'),
      b AS (SELECT n AS n_b, m AS m_b, v AS v_b FROM s WHERE arm = 'B')
      SELECT n_a, n_b, round(m_a - m_b, 6) AS mean_diff,
             round((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b), 4) AS z
      FROM a, b""")),

    // ML6 — smoothed leave-one-out target encoding (the high-cardinality
    // categorical → numeric transform; leaving the row's own target out
    // prevents the classic mean-encoding leak). Integer 0/1 target keeps
    // every sum integer-exact, so the emitted doubles are single
    // correctly-rounded expressions on both engines. One category
    // aggregate broadcast back + one 1-row global — the fact table never
    // shuffles.
    Q("ml6_target_encoding", (s, dir) =>
      graft.operators.FeatureOps.looTargetEncode(
        t(s, dir, "orders"),
        col("o_orderpriority"),
        (col("o_totalprice") > 100000.0).cast("int"),
        smoothing = 20.0)
        .select(col("o_orderkey"), col("o_orderpriority"),
          round(col("target_enc"), 6).as("target_enc"))
        .orderBy("o_orderkey"),
      Some("""
      WITH g AS (SELECT sum(CASE WHEN o_totalprice > 100000.0
                                 THEN 1 ELSE 0 END) AS ts,
                        count(*) AS tn FROM orders),
      c AS (SELECT o_orderpriority AS cat,
                   sum(CASE WHEN o_totalprice > 100000.0
                            THEN 1 ELSE 0 END) AS cs,
                   count(*) AS cn
            FROM orders GROUP BY 1)
      SELECT o.o_orderkey, o.o_orderpriority,
             round((c.cs - (CASE WHEN o.o_totalprice > 100000.0
                                 THEN 1 ELSE 0 END)
                    + 20.0 * (CAST(g.ts AS DOUBLE) / g.tn))
                   / (c.cn - 1 + 20.0), 6) AS target_enc
      FROM orders o JOIN c ON c.cat = o.o_orderpriority, g
      ORDER BY o.o_orderkey"""))
  )
}
