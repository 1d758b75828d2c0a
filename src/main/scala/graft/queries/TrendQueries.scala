package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import Tables.t

/** Round-12 third wave: calendar-aware RANGE-frame windows, rolling
  * distinct actives, robust Theil–Sen trend estimation, one-pass
  * higher-moment profiling, basket co-occurrence similarity, hub-pruned
  * neighbor-Jaccard link prediction, and the EXACT prefix-filter
  * set-similarity join. Every entry is DuckDB-oracle hash-graded;
  * operator invariants live in `TrendOpsSpec`.
  */
object TrendQueries {

  val all: Seq[Q] = Seq(

    // W13 — calendar-aware rolling revenue: per-priority daily revenue with
    // a RANGE frame over the integer epoch-day key (3 calendar days back,
    // NOT 3 rows back — at ~1.2 orders per (priority, day) the day grid has
    // gaps, so ROWS and RANGE genuinely differ and the frame must be
    // value-based). Revenue is summed in integer cents (floor(price*100) —
    // floor, never round: round() halfway behavior differs across engines)
    // so the window sum is exact; the /100.0 display division is one
    // identical float op. Scale shape: one day-grain aggregate over the
    // fact table, then a per-priority window over the bounded
    // (priority × day) table.
    Q("w13_range_rolling_revenue", (s, dir) => {
      val d = t(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
          datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
            .as("day"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("__cents"))
      val w = Window.partitionBy("o_orderpriority").orderBy("day")
        .rangeBetween(-3, 0)
      d.withColumn("__rc", sum(col("__cents")).over(w))
        .select(col("o_orderpriority"),
          expr("date_add(DATE '1970-01-01', day)").as("day_d"),
          (col("__cents") / 100.0).as("rev"),
          (col("__rc") / 100.0).as("roll_rev"))
        .orderBy("o_orderpriority", "day_d")
    }, Some("""
      WITH d AS (
        SELECT o_orderpriority,
               CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day,
               sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY 1, 2),
      r AS (
        SELECT *, sum(cents) OVER (PARTITION BY o_orderpriority ORDER BY day
                   RANGE BETWEEN 3 PRECEDING AND CURRENT ROW) AS rc
        FROM d)
      SELECT o_orderpriority, DATE '1970-01-01' + CAST(day AS INTEGER) AS day_d,
             cents / 100.0 AS rev, rc / 100.0 AS roll_rev
      FROM r ORDER BY 1, 2""")),

    // W14 — rolling 7-day distinct actives (DAU + WAU per day): exact
    // sliding-window COUNT DISTINCT, which no window frame can express
    // directly. The scalable form: dedupe to the bounded (user, day) table
    // FIRST, then each (user, day) contributes to the 7 window-end days it
    // covers via a constant-factor explode — shuffle is 7×|user-days|, and
    // the raw events never enter a window or a range join (the oracle's
    // BETWEEN join is the semantic spec, the explode is the plan).
    Q("w14_rolling_distinct_users", (s, dir) => {
      val ud = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        .localCheckpoint(eager = false) // feeds days, dau, and the explode
      val days = ud.select("day").distinct()
      val dau = ud.groupBy("day").agg(countDistinct("user_id").as("dau"))
      val wau = ud
        .select(col("user_id"),
          explode(expr("sequence(day, date_add(day, 6))")).as("day"))
        .join(days, Seq("day"), "left_semi")
        .groupBy("day").agg(countDistinct("user_id").as("wau7"))
      dau.join(wau, "day").orderBy("day")
    }, Some("""
      WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      days AS (SELECT DISTINCT day FROM ud),
      dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1),
      wau AS (
        SELECT d.day, count(DISTINCT u.user_id) AS wau7
        FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
        GROUP BY 1)
      SELECT day, dau.dau, wau.wau7
      FROM days JOIN dau USING (day) JOIN wau USING (day)
      ORDER BY day""")),

    // TS9 — Theil–Sen robust trend slope per event type: the median of all
    // pairwise slopes over the daily-count series — a single outlier day
    // that drags OLS barely moves this (invariant proven in TrendOpsSpec).
    // Engine parity: slopes are one integer-ratio division each (identical
    // IEEE doubles), and the median is picked POSITIONALLY (row_number to
    // the two middle ranks, averaged) — never percentile_cont, whose
    // interpolation conventions differ across engines. Scale shape: the
    // O(days²) pair join runs on the bounded (type × day) table, never on
    // raw events; n days → n(n-1)/2 pairs per type is a constant of the
    // calendar span, not the corpus.
    Q("ts9_theil_sen", (s, dir) => {
      val d = t(s, dir, "events")
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), to_date(lit("1970-01-01"))).as("d"))
        .agg(count(lit(1)).as("n"))
      val a = d.select(col("event_type"), col("d").as("d1"), col("n").as("n1"))
      val b = d.select(col("event_type"), col("d").as("d2"), col("n").as("n2"))
      val slopes = a.join(b, Seq("event_type")).filter(col("d1") < col("d2"))
        .select(col("event_type"),
          ((col("n2") - col("n1")).cast("double") /
            (col("d2") - col("d1")).cast("double")).as("slope"))
      val w = Window.partitionBy("event_type").orderBy("slope")
      slopes
        .withColumn("__rn", row_number().over(w))
        .withColumn("__m", count(lit(1)).over(
          Window.partitionBy("event_type")))
        .filter(col("__rn") === expr("(__m + 1) div 2") ||
          col("__rn") === expr("(__m + 2) div 2"))
        .groupBy("event_type")
        .agg(max(col("__m")).as("n_pairs"),
          round(avg(col("slope")), 6).as("ts_slope"))
        .orderBy("event_type")
    }, Some("""
      WITH d AS (
        SELECT event_type, CAST(ts AS DATE) - DATE '1970-01-01' AS d,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2),
      sl AS (
        SELECT a.event_type,
               CAST(b.n - a.n AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope
        FROM d a JOIN d b ON a.event_type = b.event_type AND a.d < b.d),
      r AS (
        SELECT event_type, slope,
               row_number() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
               count(*) OVER (PARTITION BY event_type) AS m
        FROM sl)
      SELECT event_type, max(m) AS n_pairs,
             round(avg(slope), 6) AS ts_slope
      FROM r
      WHERE rn = (m + 1) // 2 OR rn = (m + 2) // 2
      GROUP BY event_type ORDER BY event_type""")),

    // CS22 — one-pass higher-moment profile (skewness + excess kurtosis):
    // the mergeable power-sum form (Σq, Σq², Σq³, Σq⁴ in ONE aggregate) —
    // at 100 TB this replaces any sort- or percentile-based shape measure.
    // Engine parity discipline: values quantized to integer dollars
    // (floor), power sums kept EXACT past 2⁶³ (decimal(38,0) in Spark,
    // HUGEINT in DuckDB — q⁴ alone reaches ~1e23), each sum converted to
    // double ONCE, and the moment formulas written textually identically
    // on both sides; sqrt-based powers only (pow() is not
    // correctly-rounded and may differ across libm implementations).
    Q("cs22_moment_skewness", (s, dir) => {
      val q = floor(col("o_totalprice")).cast("long")
      t(s, dir, "orders").groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(q).cast("double").as("__s1"),
          sum((q * q).cast("decimal(38,0)")).cast("double").as("__s2"),
          sum((q * q * q).cast("decimal(38,0)")).cast("double").as("__s3"),
          sum((q * q).cast("decimal(38,0)") * (q * q)).cast("double")
            .as("__s4"))
        .withColumn("__mu", col("__s1") / col("n"))
        .withColumn("__m2",
          col("__s2") / col("n") - col("__mu") * col("__mu"))
        .withColumn("__m3",
          col("__s3") / col("n") - lit(3.0) * col("__mu") * (col("__s2") / col("n"))
            + lit(2.0) * col("__mu") * col("__mu") * col("__mu"))
        .withColumn("__m4",
          col("__s4") / col("n") - lit(4.0) * col("__mu") * (col("__s3") / col("n"))
            + lit(6.0) * col("__mu") * col("__mu") * (col("__s2") / col("n"))
            - lit(3.0) * col("__mu") * col("__mu") * col("__mu") * col("__mu"))
        .select(col("o_orderpriority"), col("n"),
          round(col("__mu"), 4).as("mean_usd"),
          round(col("__m3") / (col("__m2") * sqrt(col("__m2"))), 6)
            .as("skewness"),
          round(col("__m4") / (col("__m2") * col("__m2")) - 3.0, 6)
            .as("excess_kurtosis"))
        .orderBy("o_orderpriority")
    }, Some("""
      WITH a AS (
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(q) AS DOUBLE) AS s1,
               CAST(sum((q::HUGEINT) * q) AS DOUBLE) AS s2,
               CAST(sum((q::HUGEINT) * q * q) AS DOUBLE) AS s3,
               CAST(sum((q::HUGEINT) * q * q * q) AS DOUBLE) AS s4
        FROM (SELECT o_orderpriority,
                     CAST(floor(o_totalprice) AS BIGINT) AS q FROM orders)
        GROUP BY 1),
      m AS (
        SELECT o_orderpriority, n, s1 / n AS mu,
               s2 / n - (s1 / n) * (s1 / n) AS m2,
               s3 / n - 3.0 * (s1 / n) * (s2 / n)
                 + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
               s4 / n - 4.0 * (s1 / n) * (s3 / n)
                 + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
                 - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
        FROM a)
      SELECT o_orderpriority, n, round(mu, 4) AS mean_usd,
             round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
             round(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis
      FROM m ORDER BY o_orderpriority""")),

    // MB3 — item-item co-occurrence cosine (the classic "bought together"
    // similarity): support counts from distinct (order, part) baskets,
    // cosine = c_ij / sqrt(c_i * c_j) as one float division over exact
    // integers. Scale shape: the pair join is keyed on the BASKET id, so
    // fan-out is Σ basket_size² (baskets are small by construction — ≤ 13
    // parts here, bounded by order size anywhere), never |items|².
    Q("mb3_item_cooccurrence", (s, dir) => {
      val b = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
        .localCheckpoint(eager = false) // feeds item counts AND the pair join
      val ic = b.groupBy("p").agg(count(lit(1)).as("c"))
      val pairs = b.select(col("o"), col("p").as("pa"))
        .join(b.select(col("o"), col("p").as("pb")), "o")
        .filter(col("pa") < col("pb"))
        .groupBy("pa", "pb").agg(count(lit(1)).as("cij"))
        .filter(col("cij") >= 2)
      pairs
        .join(ic.select(col("p").as("pa"), col("c").as("ca")), "pa")
        .join(ic.select(col("p").as("pb"), col("c").as("cb")), "pb")
        .select(col("pa"), col("pb"), col("cij"),
          round(col("cij") / sqrt(col("ca") * col("cb")), 6).as("cosine"))
        .orderBy("pa", "pb")
    }, Some("""
      WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      ic AS (SELECT p, count(*) AS c FROM b GROUP BY p),
      pairs AS (
        SELECT x.p AS pa, y.p AS pb, count(*) AS cij
        FROM b x JOIN b y ON x.o = y.o AND x.p < y.p
        GROUP BY 1, 2 HAVING count(*) >= 2)
      SELECT pa, pb, cij,
             round(cij / sqrt(ca.c * cb.c), 6) AS cosine
      FROM pairs JOIN ic ca ON ca.p = pa JOIN ic cb ON cb.p = pb
      ORDER BY pa, pb""")),

    // GR9 — neighbor-Jaccard link prediction on the hub-pruned subgraph
    // (gr4's synthetic doc graph and hub discipline, with the normalized
    // score Adamic–Adar lacks): nodes with degree outside [2, 64] are
    // removed FIRST, degrees and wedges are then self-consistent on the
    // core subgraph, and jaccard = common / (deg_a + deg_b - common) for
    // non-adjacent pairs with >= 2 common neighbors. The cap bounds the
    // wedge join at deg² per node BEFORE it runs — the same guard that
    // keeps gr4/dd10 off the skew cliff.
    Q("gr9_neighbor_jaccard", (s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val cyc = docs.select(col("doc_id").as("a"),
        ((col("doc_id") * 7) % 499).as("b"))
      val halves = docs.filter(col("doc_id") % 2 === 0 && col("doc_id") > 0)
        .select(col("doc_id").as("a"), (col("doc_id") / 2).cast("long").as("b"))
      val thirds = docs.filter(col("doc_id") % 3 === 0 && col("doc_id") > 0)
        .select(col("doc_id").as("a"), (col("doc_id") / 3).cast("long").as("b"))
      val raw = cyc.unionByName(halves).unionByName(thirds)
        .filter(col("a") =!= col("b"))
      val sym = raw.unionByName(raw.select(col("b").as("a"), col("a").as("b")))
        .distinct()
      val core = sym.groupBy(col("a").as("z")).agg(count(lit(1)).as("d0"))
        .filter(col("d0") >= 2 && col("d0") <= 64).select("z")
      val edges = sym
        .join(core.select(col("z").as("a")), Seq("a"), "left_semi")
        .join(core.select(col("z").as("b")), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint(eager = false) // feeds degrees, wedges, adjacency
      val deg = edges.groupBy(col("a").as("z")).agg(count(lit(1)).as("d"))
      val l = edges.select(col("a").as("z"), col("b").as("pa"))
      val r = edges.select(col("a").as("z"), col("b").as("pb"))
      l.join(r, Seq("z")).filter(col("pa") < col("pb"))
        .groupBy("pa", "pb").agg(count(lit(1)).as("common"))
        .filter(col("common") >= 2)
        .join(edges.select(col("a").as("pa"), col("b").as("pb")),
          Seq("pa", "pb"), "left_anti")
        .join(deg.select(col("z").as("pa"), col("d").as("__da")), "pa")
        .join(deg.select(col("z").as("pb"), col("d").as("__db")), "pb")
        .select(col("pa"), col("pb"), col("common"),
          round(col("common") /
            (col("__da") + col("__db") - col("common")).cast("double"), 6)
            .as("jaccard"))
        .orderBy("pa", "pb")
    }, Some("""
      WITH cyc AS (SELECT doc_id AS u, (doc_id * 7) % 499 AS v FROM documents),
      divi AS (
        SELECT doc_id AS u, doc_id // 2 AS v FROM documents
        WHERE doc_id % 2 = 0 AND doc_id > 0
        UNION ALL
        SELECT doc_id, doc_id // 3 FROM documents
        WHERE doc_id % 3 = 0 AND doc_id > 0),
      raw AS (SELECT u, v FROM cyc UNION ALL SELECT u, v FROM divi),
      sym AS (SELECT DISTINCT u, v FROM
        (SELECT u, v FROM raw UNION ALL SELECT v, u FROM raw) WHERE u <> v),
      core AS (SELECT u AS z FROM sym GROUP BY u
               HAVING count(*) >= 2 AND count(*) <= 64),
      edges AS (
        SELECT u, v FROM sym
        WHERE u IN (SELECT z FROM core) AND v IN (SELECT z FROM core)),
      deg AS (SELECT u AS z, count(*) AS d FROM edges GROUP BY u),
      wedge AS (
        SELECT a.v AS pa, b.v AS pb, count(*) AS common
        FROM edges a JOIN edges b ON a.u = b.u AND a.v < b.v
        GROUP BY 1, 2 HAVING count(*) >= 2),
      nonadj AS (
        SELECT w.* FROM wedge w
        LEFT JOIN edges e ON e.u = w.pa AND e.v = w.pb
        WHERE e.u IS NULL)
      SELECT pa, pb, common,
             round(common / CAST(da.d + db.d - common AS DOUBLE), 6) AS jaccard
      FROM nonadj JOIN deg da ON da.z = pa JOIN deg db ON db.z = pb
      ORDER BY pa, pb""")),

    // DD22 — EXACT prefix-filter set-similarity join (AllPairs/PPJoin):
    // every pair with shingle Jaccard >= 2/5, found through the lossless
    // rare-first prefix block (`Dedup.prefixFilterJaccardJoin`). The oracle
    // is the FULL brute-force pair set above the threshold — this grade is
    // a recall THEOREM check on the blocker, not a spot check: one missed
    // pair and the hash goes red. Output carries the exact integers
    // (shared, union_sz) only, so no engine-rounded float is graded.
    Q("dd22_prefix_filter_join", (s, dir) =>
      Dedup.prefixFilterJaccardJoin(t(s, dir, "documents"),
        "doc_id", "text", minNum = 2, minDen = 5)
        .orderBy("doc_a", "doc_b"),
      Some(s"""
      WITH ${LlmQueries.ShingleCte},
      cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT i.doc_a, i.doc_b, shared,
             ca.n + cb.n - shared AS union_sz
      FROM inter i JOIN cnt ca ON ca.doc_id = i.doc_a
                   JOIN cnt cb ON cb.doc_id = i.doc_b
      WHERE shared * 5 >= (ca.n + cb.n - shared) * 2
      ORDER BY doc_a, doc_b"""))
  )
}
