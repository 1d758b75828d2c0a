package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{DateFns => D, ScalarFns => F}
import graft.operators.LoadOps
import Tables.t

/** SURVEY §2 relational operator inventory, each exercised over the TESTDATA
  * tables with a DuckDB oracle. The Spark side goes through the library
  * layers (`ScalarFns`/`DateFns`/`LoadOps`) so the graded queries exercise
  * the same code the zacks pipelines use.
  *
  * Determinism: every query ends in an ORDER BY over a unique key (mirrored
  * in the oracle), and float aggregates are rounded, so row/hash compares are
  * stable across engines.
  */
object RelationalQueries {

  private def dt(c: Column): Column = to_date(c)

  val all: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // §2.3 projections / filters
    // ------------------------------------------------------------------

    // P1 — universe predicate shape (`estimate-extract.rkt:57-85`): rlike
    // chain + implication + scalar-subquery "latest generation" filter.
    Q("p1_universe_filter", (s, dir) => {
      val part = t(s, dir, "part")
      val maxSize = part.agg(max("p_size").as("__max_size"))
      part.crossJoin(broadcast(maxSize))
        .filter(col("p_size") === col("__max_size"))
        .filter(!col("p_name").rlike("green") &&
          !col("p_type").rlike("^PROMO") &&
          (!col("p_brand").rlike("Brand#4") || !col("p_type").rlike("BRASS")))
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
        .orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part
      WHERE p_size = (SELECT max(p_size) FROM part)
        AND NOT regexp_matches(p_name, 'green')
        AND NOT regexp_matches(p_type, '^PROMO')
        AND (NOT regexp_matches(p_brand, 'Brand#4')
             OR NOT regexp_matches(p_type, 'BRASS'))
      ORDER BY p_partkey""")),

    // P2 — per-date equality filter (partition-pruning shape).
    Q("p2_date_eq", (s, dir) =>
      t(s, dir, "lineitem")
        .filter(dt(col("l_shipdate")) === lit("1998-03-15").cast("date"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""
      SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE CAST(l_shipdate AS DATE) = DATE '1998-03-15'
      ORDER BY l_orderkey, l_linenumber""")),

    // P3 — date-range filter.
    Q("p3_date_range", (s, dir) =>
      t(s, dir, "orders")
        .filter(dt(col("o_orderdate"))
          .between(lit("1996-06-01").cast("date"), lit("1996-06-30").cast("date")))
        .select(col("o_orderkey"), col("o_custkey"),
          dt(col("o_orderdate")).as("d"))
        .orderBy("o_orderkey"),
      Some("""
      SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders
      WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1996-06-01' AND DATE '1996-06-30'
      ORDER BY o_orderkey""")),

    // P4 — all-columns-non-null projection filter (`dump-dat.rkt:66-71`).
    Q("p4_nonnull_all", (s, dir) =>
      t(s, dir, "events")
        .filter(col("value").isNotNull && col("props").isNotNull &&
          col("event_type").isNotNull)
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id"),
      Some("""
      SELECT event_id, user_id, event_type FROM events
      WHERE value IS NOT NULL AND props IS NOT NULL AND event_type IS NOT NULL
      ORDER BY event_id""")),

    // P5 — suffix predicate (`pathGlobFilter` shape).
    Q("p5_suffix_filter", (s, dir) =>
      t(s, dir, "part").filter(col("p_type").endsWith("BRASS"))
        .select("p_partkey", "p_type").orderBy("p_partkey"),
      Some("""
      SELECT p_partkey, p_type FROM part WHERE p_type LIKE '%BRASS'
      ORDER BY p_partkey""")),

    // P6 — 15-day staleness guard (`income-statement-transform-load.rkt:99-105`).
    Q("p6_staleness_guard", (s, dir) =>
      t(s, dir, "orders")
        .filter(!D.isStale(lit("2001-08-01").cast("date"), dt(col("o_orderdate"))))
        .select(col("o_orderkey"), dt(col("o_orderdate")).as("d"))
        .orderBy("o_orderkey"),
      Some("""
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders
      WHERE date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-08-01') > 15
      ORDER BY o_orderkey""")),

    // P7 — text projection with '' null encoding (`dump-dolt-statements.rkt:58-70`).
    Q("p7_null_encoding", (s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          coalesce(when(col("event_type") =!= "error", col("event_type"))
            .cast("string"), lit("")).as("et"))
        .orderBy("event_id"),
      Some("""
      SELECT event_id,
             coalesce(CAST(NULLIF(event_type, 'error') AS VARCHAR), '') AS et
      FROM events ORDER BY event_id""")),

    // P8 — positional row-shape projection after split (calendar JSON shape,
    // `earnings-calendar-transform-load.rkt:103-105`).
    Q("p8_positional_fields", (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          element_at(split(col("p_name"), " "), 1).as("w1"),
          element_at(split(col("p_name"), " "), 2).as("w2"))
        .orderBy("p_partkey"),
      Some("""
      SELECT p_partkey, string_split(p_name, ' ')[1] AS w1,
             string_split(p_name, ' ')[2] AS w2
      FROM part ORDER BY p_partkey""")),

    // ------------------------------------------------------------------
    // §2.4 joins
    // ------------------------------------------------------------------

    // J1 — prior-period poison guard via LoadOps.priorPeriodGuard: drop rows
    // whose facts are identical one year back (fiscal-copy bug,
    // `income-statement-transform-load.rkt:116-227`).
    Q("j1_fiscal_copy_guard", (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"), dt(col("o_orderdate")))
        .orderBy("o_orderkey")
      val mapped = t(s, dir, "orders")
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("o_custkey").cast("string").as("act_symbol"),
          dt(col("o_orderdate")).as("date"), lit("Year").as("period"),
          col("o_totalprice").as("f1"), col("o_orderstatus").as("f2"))
      LoadOps.priorPeriodGuard(mapped, mapped, Seq("f1", "f2"))
        .orderBy("act_symbol", "date")
    }, Some("""
      WITH t AS (
        SELECT CAST(o_custkey AS VARCHAR) AS act_symbol,
               CAST(o_orderdate AS DATE) AS date, 'Year' AS period,
               o_totalprice AS f1, o_orderstatus AS f2
        FROM orders
        QUALIFY row_number() OVER (PARTITION BY o_custkey, CAST(o_orderdate AS DATE)
                                   ORDER BY o_orderkey) = 1)
      SELECT i.act_symbol, i.date, i.period, i.f1, i.f2
      FROM t i LEFT JOIN t p
        ON i.act_symbol = p.act_symbol AND i.period = p.period
       AND p.date = CAST(i.date - INTERVAL 1 YEAR AS DATE)
      WHERE p.date IS NULL OR NOT coalesce(i.f1 = p.f1 AND i.f2 = p.f2, FALSE)
      ORDER BY i.act_symbol, i.date""")),

    // J2+J3 — range-join keep-max supersedence cleanup via
    // LoadOps.supersededCleanup (`earnings-calendar-transform-load.rkt:109-148`).
    Q("j2_superseded_cleanup", (s, dir) => {
      val orders = t(s, dir, "orders")
      val cal = orders.select(col("o_custkey").cast("string").as("act_symbol"),
        dt(col("o_orderdate")).as("date")).distinct()
      val stmt = orders.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").cast("string").as("act_symbol"),
          dt(col("o_orderdate")).as("date")).distinct()
      LoadOps.supersededCleanup(cal, stmt).orderBy("act_symbol", "date")
    }, Some("""
      WITH cal AS (
        SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS act_symbol,
               CAST(o_orderdate AS DATE) AS date FROM orders),
      stmt AS (
        SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS act_symbol,
               CAST(o_orderdate AS DATE) AS date
        FROM orders WHERE o_orderstatus = 'F'),
      wins0 AS (
        SELECT act_symbol, date FROM stmt
        UNION
        SELECT act_symbol,
               CAST(max(date) + INTERVAL 1 DAY + INTERVAL 3 MONTH - INTERVAL 1 DAY AS DATE)
        FROM stmt GROUP BY act_symbol),
      wins AS (
        SELECT act_symbol AS wsym, date AS wstart,
               CAST(date + INTERVAL 1 DAY + INTERVAL 3 MONTH - INTERVAL 1 DAY AS DATE) AS wend
        FROM wins0),
      joined AS (
        SELECT c.act_symbol, c.date,
               row_number() OVER (PARTITION BY w.wsym, w.wstart
                                  ORDER BY c.date DESC) AS rn
        FROM cal c JOIN wins w
          ON c.act_symbol = w.wsym AND c.date > w.wstart AND c.date <= w.wend),
      victims AS (SELECT DISTINCT act_symbol, date FROM joined WHERE rn > 1)
      SELECT c.act_symbol, c.date FROM cal c
      WHERE NOT EXISTS (SELECT 1 FROM victims v
                        WHERE v.act_symbol = c.act_symbol AND v.date = c.date)
      ORDER BY act_symbol, date""")),

    // J3 — UNION-distinct derived input (`earnings-calendar-transform-load.rkt:125`).
    Q("j3_union_distinct", (s, dir) =>
      t(s, dir, "orders").select(col("o_custkey").as("k"))
        .union(t(s, dir, "customer").select(col("c_custkey").as("k")))
        .distinct().orderBy("k"),
      Some("""
      SELECT DISTINCT k FROM (
        SELECT o_custkey AS k FROM orders
        UNION ALL SELECT c_custkey AS k FROM customer) ORDER BY k""")),

    // J4 — FK-violation anti join (`schema.sql:37-40` as a QC check).
    Q("j4_fk_orphans", (s, dir) => {
      val dim = t(s, dir, "customer").filter(col("c_acctbal") >= 0)
        .select(col("c_custkey"))
      LoadOps.fkViolations(
        t(s, dir, "orders").select("o_orderkey", "o_custkey"),
        dim.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey, o_custkey FROM orders
      WHERE NOT EXISTS (SELECT 1 FROM customer
                        WHERE c_custkey = o_custkey AND c_acctbal >= 0)
      ORDER BY o_orderkey""")),

    // J5 — scalar-subquery join (`estimate-extract.rkt:72`).
    Q("j5_scalar_subquery", (s, dir) => {
      val cust = t(s, dir, "customer")
      val cutoff = cust.agg((max("c_acctbal") - lit(1000.0)).as("__cut"))
      cust.crossJoin(broadcast(cutoff)).filter(col("c_acctbal") > col("__cut"))
        .select("c_custkey", "c_name", "c_acctbal").orderBy("c_custkey")
    }, Some("""
      SELECT c_custkey, c_name, c_acctbal FROM customer
      WHERE c_acctbal > (SELECT max(c_acctbal) - 1000.0 FROM customer)
      ORDER BY c_custkey""")),

    // Star join with broadcast dims — revenue per (region, nation).
    Q("j6_star_join", (s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      // customer grows with the fact tables — let AQE choose its join;
      // nation/region are bounded dims, broadcast unconditionally.
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("n"))
        .orderBy("r_name", "n_name")
    }, Some("""
      SELECT r_name, n_name,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             count(*) AS n
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // K3b — bucketed co-located join: both sides bucketed+sorted on custkey
    // with the same bucket count (SnapshotStore.writeBucketed, harness-
    // materialized in Fixtures), so the join needs NO exchange on either
    // side — at 100 TB this removes the dominant fact-to-fact shuffle from
    // every join on a shared PK prefix. The groupBy on the join key then
    // reuses the same bucket partitioning; PlanSpec gates zero
    // hashpartitioning exchanges end to end.
    Q("k3b_bucketed_join", (s, dir) => {
      val (o, c) = Fixtures.bucketedPair(s, dir)
      s.table(o).join(s.table(c), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey")
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_price"))
        .orderBy("c_custkey")
    }, Some("""
      SELECT c_custkey, count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS total_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey ORDER BY c_custkey""")),

    // ------------------------------------------------------------------
    // §2.5 aggregations
    // ------------------------------------------------------------------

    // A1 — bool_and all-equal reduction.
    Q("a1_bool_and", (s, dir) =>
      t(s, dir, "orders").groupBy("o_custkey")
        .agg(bool_and(col("o_totalprice") > 150000.0).as("all_big"))
        .orderBy("o_custkey"),
      Some("""
      SELECT o_custkey, bool_and(o_totalprice > 150000.0) AS all_big
      FROM orders GROUP BY o_custkey ORDER BY o_custkey""")),

    // A2 — scalar max.
    Q("a2_scalar_max", (s, dir) =>
      t(s, dir, "lineitem").agg(max(dt(col("l_shipdate"))).as("max_ship")),
      Some("SELECT max(CAST(l_shipdate AS DATE)) AS max_ship FROM lineitem")),

    // A3 — distinct ordered date list (export driver loop).
    Q("a3_distinct_dates", (s, dir) =>
      t(s, dir, "orders").select(dt(col("o_orderdate")).as("d"))
        .distinct().orderBy("d"),
      Some("SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders ORDER BY d")),

    // A4 — max per (key, window).
    Q("a4_group_window_max", (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"),
          date_trunc("month", col("o_orderdate")).cast("date").as("m"))
        .agg(max(dt(col("o_orderdate"))).as("mx"))
        .orderBy("o_custkey", "m"),
      Some("""
      SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
             max(CAST(o_orderdate AS DATE)) AS mx
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2""")),

    // A5 — distinct key pairs.
    Q("a5_distinct_pairs", (s, dir) =>
      t(s, dir, "orders").select("o_custkey", "o_orderstatus").distinct()
        .orderBy("o_custkey", "o_orderstatus"),
      Some("""
      SELECT DISTINCT o_custkey, o_orderstatus FROM orders
      ORDER BY o_custkey, o_orderstatus""")),

    // A6 — groupBy max + quarter-end projection
    // (`earnings-calendar-transform-load.rkt:126-132`).
    Q("a6_next_quarter_projection", (s, dir) =>
      t(s, dir, "orders").groupBy("o_custkey")
        .agg(max(dt(col("o_orderdate"))).as("__mx"))
        .select(col("o_custkey"), D.nextQuarterEnd(col("__mx")).as("next_q_end"))
        .orderBy("o_custkey"),
      Some("""
      SELECT o_custkey,
             CAST(max(CAST(o_orderdate AS DATE)) + INTERVAL 1 DAY
                  + INTERVAL 3 MONTH - INTERVAL 1 DAY AS DATE) AS next_q_end
      FROM orders GROUP BY o_custkey ORDER BY o_custkey""")),

    // A7 — load status counters.
    Q("a7_status_counters", (s, dir) =>
      t(s, dir, "orders").groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n")).orderBy("o_orderstatus"),
      Some("""
      SELECT o_orderstatus, count(*) AS n FROM orders
      GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ------------------------------------------------------------------
    // Grouping-set / reshaping aggregations — the OLAP subtotal and
    // wide↔long shapes a reporting layer over the loaded statements needs.
    // All single-shuffle plans: ROLLUP/CUBE expand grouping sets inside one
    // Expand+HashAggregate (no per-level rescans), pivot is one hash
    // aggregate with conditional accumulators, unpivot is a scan-side
    // Expand (zero shuffles before the output sort).
    // ------------------------------------------------------------------

    // A9 — ROLLUP subtotal hierarchy over (status, priority), subtotal rows
    // disambiguated by grouping_id. Grouped keys are coalesced to a
    // sentinel so the cross-engine ORDER BY never depends on NULL
    // placement (Spark sorts NULLS FIRST, DuckDB NULLS LAST by default).
    Q("a9_rollup", (s, dir) =>
      t(s, dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("total"))
        .select(col("gid"),
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("n"), col("total"))
        .orderBy("gid", "status", "priority"),
      Some("""
      SELECT CAST(2 * GROUPING(o_orderstatus) + GROUPING(o_orderpriority)
                  AS BIGINT) AS gid,
             coalesce(o_orderstatus, '(all)') AS status,
             coalesce(o_orderpriority, '(all)') AS priority,
             count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      ORDER BY gid, status, priority""")),

    // A10 — CUBE over (status, order-year): every subtotal combination in
    // one Expand pass. The year key gets a -1 sentinel for its subtotal
    // rows (same NULL-placement rationale as a9).
    Q("a10_cube", (s, dir) =>
      t(s, dir, "orders")
        .withColumn("y", year(dt(col("o_orderdate"))))
        .cube("o_orderstatus", "y")
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          round(avg("o_totalprice"), 4).as("mean_price"))
        .select(col("gid"),
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("y"), lit(-1)).as("y"),
          col("n"), col("mean_price"))
        .orderBy("gid", "status", "y"),
      Some("""
      SELECT CAST(2 * GROUPING(o_orderstatus) + GROUPING(y) AS BIGINT) AS gid,
             coalesce(o_orderstatus, '(all)') AS status,
             coalesce(y, -1) AS y,
             count(*) AS n, round(avg(o_totalprice), 4) AS mean_price
      FROM (SELECT o_orderstatus, o_totalprice,
                   CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS y
            FROM orders)
      GROUP BY CUBE(o_orderstatus, y)
      ORDER BY gid, status, y""")),

    // A11 — pivot long→wide: per-priority counts and rounded totals with
    // one column per order status. Explicit value list (F/O/P) so the plan
    // is a single hash aggregate — no distinct-scan to discover columns,
    // which is the 100-TB-safe form (an implicit pivot adds a full
    // pre-scan and an unbounded column budget).
    Q("a11_pivot_status", (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("total"))
        .na.fill(0, Seq("F_n", "O_n", "P_n"))
        .select(col("o_orderpriority"),
          col("F_n").as("n_f"), col("F_total").as("total_f"),
          col("O_n").as("n_o"), col("O_total").as("total_o"),
          col("P_n").as("n_p"), col("P_total").as("total_p"))
        .orderBy("o_orderpriority"),
      Some("""
      SELECT o_orderpriority,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
             round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS total_f,
             count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
             round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS total_o,
             count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
             round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 2) AS total_p
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // A12 — unpivot wide→long (melt): part's numeric measures to
    // (key, metric, value) rows via Dataset.unpivot — a scan-side Expand,
    // no shuffle, output 2× rows regardless of metric count added later.
    Q("a12_unpivot_metrics", (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retail"))
        .unpivot(Array(col("p_partkey")), Array(col("size"), col("retail")),
          "metric", "v")
        .orderBy("p_partkey", "metric"),
      Some("""
      SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS v FROM part
      UNION ALL
      SELECT p_partkey, 'retail' AS metric, p_retailprice AS v FROM part
      ORDER BY p_partkey, metric""")),

    // ------------------------------------------------------------------
    // §2.6 windows / sorts / set ops
    // ------------------------------------------------------------------

    // W1 — lag-compare bulk form of J1.
    Q("w1_lag_compare", (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("same_as_prior",
          coalesce(lag(col("o_totalprice"), 1).over(w) === col("o_totalprice") &&
            lag(col("o_orderstatus"), 1).over(w) === col("o_orderstatus"),
            lit(false)))
        .select(col("o_custkey"), col("o_orderkey"),
          dt(col("o_orderdate")).as("d"), col("same_as_prior"))
        .orderBy("o_custkey", "d", "o_orderkey")
    }, Some("""
      SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
             coalesce(lag(o_totalprice) OVER w = o_totalprice
                      AND lag(o_orderstatus) OVER w = o_orderstatus,
                      FALSE) AS same_as_prior
      FROM orders WINDOW w AS (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, d, o_orderkey""")),

    // W2 — row_number keep-max-per-group.
    Q("w2_keep_latest", (s, dir) => {
      val w = Window.partitionBy("l_orderkey")
        .orderBy(col("l_shipdate").desc, col("l_linenumber").desc)
      t(s, dir, "lineitem")
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("l_orderkey"), col("l_linenumber"),
          dt(col("l_shipdate")).as("ship"))
        .orderBy("l_orderkey")
    }, Some("""
      SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship
      FROM lineitem
      QUALIFY row_number() OVER (PARTITION BY l_orderkey
                                 ORDER BY l_shipdate DESC, l_linenumber DESC) = 1
      ORDER BY l_orderkey""")),

    // O1 — PK-ordered total sort (export shape, `dump-dolt-statements.rkt:75-76`).
    Q("o1_pk_sort", (s, dir) =>
      t(s, dir, "supplier").select("s_nationkey", "s_suppkey", "s_name")
        .orderBy("s_nationkey", "s_suppkey"),
      Some("""
      SELECT s_nationkey, s_suppkey, s_name FROM supplier
      ORDER BY s_nationkey, s_suppkey""")),

    // J10 — INTERSECT / EXCEPT set semantics: the 1995∩1996 and 1995∖1996
    // customer cohorts in one tagged output. Spark plans both as hash
    // semi/anti joins over the distinct key sets — same shuffle economics
    // as j4's FK anti-join, never a sort-based set difference.
    Q("j10_intersect_except", (s, dir) => {
      val orders = t(s, dir, "orders")
      def cohort(y: Int) = orders
        .filter(year(dt(col("o_orderdate"))) === y)
        .select("o_custkey").distinct()
      cohort(1995).intersect(cohort(1996))
        .withColumn("tag", lit("both"))
        .unionByName(cohort(1995).except(cohort(1996))
          .withColumn("tag", lit("only_1995")))
        .orderBy("tag", "o_custkey")
    }, Some("""
      WITH c95 AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE year(CAST(o_orderdate AS DATE)) = 1995),
      c96 AS (SELECT DISTINCT o_custkey FROM orders
              WHERE year(CAST(o_orderdate AS DATE)) = 1996)
      SELECT o_custkey, 'both' AS tag
      FROM (SELECT o_custkey FROM c95 INTERSECT SELECT o_custkey FROM c96)
      UNION ALL
      SELECT o_custkey, 'only_1995' AS tag
      FROM (SELECT o_custkey FROM c95 EXCEPT SELECT o_custkey FROM c96)
      ORDER BY tag, o_custkey""")),

    // W5 — the analytic-rank family (percent_rank / cume_dist /
    // dense_rank) per priority over the price ordering: ties collapse
    // identically in both engines, so the values are cross-engine exact;
    // the output sort is on the unique PK.
    Q("w5_rank_family", (s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          dense_rank().over(w).as("dr"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey, o_orderpriority,
             round(percent_rank() OVER w, 6) AS pr,
             round(cume_dist() OVER w, 6) AS cd,
             CAST(dense_rank() OVER w AS INT) AS dr
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC)
      ORDER BY o_orderkey""")),

    // HLL1 — approx_count_distinct (HyperLogLog++) audited against the
    // exact distinct per priority: the estimate itself is engine-internal
    // (deterministic — sketch insertion is order-independent — but not
    // reproducible in DuckDB), so the graded columns are the exact count
    // and the within-tolerance verdict. rsd=0.05 is a STANDARD DEVIATION,
    // not a bound — the audit gates at 3σ (15%), which a healthy sketch
    // clears at every SF while a broken one (collapsed registers, bad
    // merge) still fails the hash honestly. This is the cardinality path
    // that replaces cs6's exact countDistinct at 100 TB: fixed sketch
    // state, no Expand.
    Q("hll1_approx_distinct_audit", (s, dir) =>
      t(s, dir, "orders").groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("exact"),
          approx_count_distinct(col("o_custkey"), 0.05).as("__est"))
        .select(col("o_orderpriority"), col("exact"),
          (abs(col("__est") - col("exact")) <=
            col("exact") * 0.15).as("within_3sigma"))
        .orderBy("o_orderpriority"),
      Some("""
      SELECT o_orderpriority, count(DISTINCT o_custkey) AS exact,
             TRUE AS within_3sigma
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // W4/SCD — collapse a change log into a type-2 slowly-changing
    // dimension: per customer, consecutive equal statuses merge into one
    // validity interval [valid_from, valid_to), open intervals closed with
    // a 9999-12-31 sentinel. Two windows over the SAME
    // (o_custkey)×(d, o_orderkey) partitioning/ordering, so the plan pays
    // one shuffle + one sort and runs both window passes on it — the
    // standard warehouse dimension-build, scale-safe because state never
    // leaves the per-key window.
    Q("scd1_type2_history", (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("d"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          dt(col("o_orderdate")).as("d"), col("o_orderstatus"))
        .withColumn("__prev", lag(col("o_orderstatus"), 1).over(w))
        .filter(col("__prev").isNull || col("__prev") =!= col("o_orderstatus"))
        .withColumn("valid_to",
          coalesce(lead(col("d"), 1).over(w), lit("9999-12-31").cast("date")))
        .select(col("o_custkey"), col("o_orderstatus").as("status"),
          col("d").as("valid_from"), col("valid_to"),
          col("__prev").isNull.as("is_initial"))
        .orderBy("o_custkey", "valid_from", "status")
    }, Some("""
      WITH chg AS (
        SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
               o_orderstatus,
               lag(o_orderstatus) OVER w AS prev
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE),
                     o_orderkey)),
      collapsed AS (SELECT * FROM chg
                    WHERE prev IS NULL OR prev <> o_orderstatus)
      SELECT o_custkey, o_orderstatus AS status, d AS valid_from,
             coalesce(lead(d) OVER w2, DATE '9999-12-31') AS valid_to,
             prev IS NULL AS is_initial
      FROM collapsed
      WINDOW w2 AS (PARTITION BY o_custkey ORDER BY d, o_orderkey)
      ORDER BY o_custkey, valid_from, status""")),

    // OL1 — winsorized aggregation: clamp the value column at the exact
    // interpolated p01/p99 before summing, the standard outlier-robust
    // metric. The two global percentiles are one 1-row aggregate
    // broadcast back onto the scan (scalar-subquery shape) — the clamp
    // itself is per-row, so the plan is scan → broadcast-join → one hash
    // aggregate, no global sort of the fact table.
    Q("ol1_winsorize", (s, dir) => {
      val orders = t(s, dir, "orders")
      val pcts = orders.agg(
        percentile(col("o_totalprice"), lit(0.01)).as("__p01"),
        percentile(col("o_totalprice"), lit(0.99)).as("__p99"))
      orders.crossJoin(broadcast(pcts))
        .withColumn("__clamped",
          least(greatest(col("o_totalprice"), col("__p01")), col("__p99")))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum("__clamped"), 2).as("wsum"),
          round(min("__clamped"), 2).as("wmin"),
          round(max("__clamped"), 2).as("wmax"))
        .orderBy("o_orderpriority")
    }, Some("""
      WITH p AS (SELECT quantile_cont(o_totalprice, 0.01) AS p01,
                        quantile_cont(o_totalprice, 0.99) AS p99
                 FROM orders)
      SELECT o_orderpriority, count(*) AS n,
             round(sum(least(greatest(o_totalprice, p01), p99)), 2) AS wsum,
             round(min(least(greatest(o_totalprice, p01), p99)), 2) AS wmin,
             round(max(least(greatest(o_totalprice, p01), p99)), 2) AS wmax
      FROM orders, p GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // CS7 — event funnel (view → click-after-view → purchase-after-click):
    // each stage is a keyed min-aggregate equi-joined to the prior stage's
    // timestamp, so the whole funnel is three hash aggregates + two
    // user-keyed joins — no window over the full event stream, no
    // sessionize-then-scan. At 100 TB every shuffle here is on user_id;
    // pre-bucketing events by user makes the chain exchange-free.
    Q("cs7_event_funnel", (s, dir) => {
      val ev = t(s, dir, "events")
      val tv = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t_view"))
      val tc = ev.filter(col("event_type") === "click")
        .join(tv, "user_id").filter(col("ts") >= col("t_view"))
        .groupBy("user_id").agg(min("ts").as("t_click"))
      val tp = ev.filter(col("event_type") === "purchase")
        .join(tc, "user_id").filter(col("ts") >= col("t_click"))
        .groupBy("user_id").agg(min("ts").as("t_purchase"))
      tv.join(tc, Seq("user_id"), "left").join(tp, Seq("user_id"), "left")
        .orderBy("user_id")
    }, Some("""
      WITH tv AS (SELECT user_id, min(ts) AS t_view FROM events
                  WHERE event_type = 'view' GROUP BY 1),
      tc AS (SELECT e.user_id, min(e.ts) AS t_click
             FROM events e JOIN tv USING (user_id)
             WHERE e.event_type = 'click' AND e.ts >= tv.t_view GROUP BY 1),
      tp AS (SELECT e.user_id, min(e.ts) AS t_purchase
             FROM events e JOIN tc USING (user_id)
             WHERE e.event_type = 'purchase' AND e.ts >= tc.t_click
             GROUP BY 1)
      SELECT tv.user_id, tv.t_view, tc.t_click, tp.t_purchase
      FROM tv LEFT JOIN tc USING (user_id) LEFT JOIN tp USING (user_id)
      ORDER BY user_id""")),

    // CS8 — daily actives / new users / cumulative reach: the growth
    // report. n_new comes from each user's first-seen date (one keyed
    // aggregate), cum_users is a running sum over the 30-row daily frame —
    // the global window runs on post-aggregation rows (days), never on
    // the event stream. The day key is an explicit INTEGER epoch-day
    // (days since 1970-01-01) on both engines, not a DATE. r11+r12 driver
    // reds were root-caused in r13: DuckDB's integer sum() returns
    // HUGEINT, whose duckdb->pandas dtype mapping differs across DuckDB
    // versions (float64 locally, object on the driver) — so every
    // HUGEINT OUTPUT column is CAST AS BIGINT (values are nowhere near
    // 2^63; intermediates may stay HUGEINT).
    Q("cs8_daily_actives", (s, dir) => {
      val ev = t(s, dir, "events")
        .select(datediff(to_date(col("ts")), lit("1970-01-01"))
          .cast("long").as("d"), col("user_id"))
      val daily = ev.groupBy("d").agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_active"))
      val firstSeen = ev.groupBy("user_id").agg(min("d").as("d"))
        .groupBy("d").agg(count(lit(1)).as("n_new"))
      val w = Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.join(firstSeen, Seq("d"), "left")
        .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
        .withColumn("cum_users", sum("n_new").over(w))
        .orderBy("d")
    }, Some("""
      WITH ev AS (SELECT CAST(datediff('day', DATE '1970-01-01',
                       CAST(ts AS DATE)) AS BIGINT) AS d, user_id
                  FROM events),
      daily AS (SELECT d, count(*) AS n_events,
                       count(DISTINCT user_id) AS n_active
                FROM ev GROUP BY d),
      fs AS (SELECT d, count(*) AS n_new
             FROM (SELECT user_id, min(d) AS d FROM ev GROUP BY user_id)
             GROUP BY d)
      SELECT d, n_events, n_active, coalesce(n_new, 0) AS n_new,
             CAST(sum(coalesce(n_new, 0)) OVER (ORDER BY d
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
      FROM daily LEFT JOIN fs USING (d)
      ORDER BY d""")),

    // OL2 — robust outlier detection via MAD (median absolute deviation):
    // flag |0.6745·(x−med)/MAD| > 3.5 over the heavy-tailed event values.
    // Unlike ol1's winsorize, the center AND spread are both medians, so
    // one contaminated tail can't drag the threshold. Two 1-row exact-
    // percentile broadcasts (scalar-subquery shape); the same plumbing
    // takes hq1's mergeable-histogram medians at 100 TB.
    Q("ol2_mad_outliers", (s, dir) => {
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
      val med = ev.agg(percentile(col("value"), lit(0.5)).as("__med"))
      val wm = ev.crossJoin(broadcast(med))
      val mad = wm.agg(
        percentile(abs(col("value") - col("__med")), lit(0.5)).as("__mad"))
      wm.crossJoin(broadcast(mad))
        .withColumn("z", round(
          lit(0.6745) * (col("value") - col("__med")) / col("__mad"), 4))
        .filter(abs(col("z")) > 3.5)
        .select(col("event_id"), col("value"), col("z"))
        .orderBy("event_id")
    }, Some("""
      WITH m AS (SELECT quantile_cont(value, 0.5) AS med
                 FROM events WHERE value IS NOT NULL),
      mad AS (SELECT quantile_cont(abs(value - med), 0.5) AS mad
              FROM events, m WHERE value IS NOT NULL)
      SELECT event_id, value, z FROM (
        SELECT event_id, value,
               round(0.6745 * (value - med) / mad, 4) AS z
        FROM events, m, mad WHERE value IS NOT NULL)
      WHERE abs(z) > 3.5 ORDER BY event_id""")),

    // CS9 — weekly cohort retention triangle: users grouped by first-seen
    // week, counted again at each later week offset — the classic
    // retention report. Three keyed aggregates (user-week activity,
    // per-user cohort, cohort×offset rollup), all shuffles on user_id or
    // the tiny cohort grid.
    Q("cs9_cohort_retention", (s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"),
        floor(datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
          / 7).cast("int").as("wk"))
      val activity = ev.distinct()
      val cohort = activity.groupBy("user_id").agg(min("wk").as("cohort_wk"))
      activity.join(cohort, "user_id")
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_wk", "offset")
    }, Some("""
      WITH a AS (
        SELECT DISTINCT user_id,
               CAST((CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS INT) AS wk
        FROM events),
      c AS (SELECT user_id, min(wk) AS cohort_wk FROM a GROUP BY user_id)
      SELECT c.cohort_wk, a.wk - c.cohort_wk AS offset,
             count(DISTINCT a.user_id) AS n_users
      FROM a JOIN c USING (user_id)
      GROUP BY 1, 2 ORDER BY 1, 2""")),

    // W6 — framed first/last/nth over the full per-customer history: the
    // "first order vs latest order vs second order" enrichment columns.
    // Unbounded-both-ways frame on a unique (date, key) ordering keeps
    // last_value/nth_value cross-engine deterministic.
    Q("w6_first_last_nth", (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first("o_totalprice").over(w).as("first_price"),
          last("o_totalprice").over(w).as("last_price"),
          nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
        .orderBy("o_custkey", "o_orderkey")
    }, Some("""
      SELECT o_custkey, o_orderkey,
             first_value(o_totalprice) OVER w AS first_price,
             last_value(o_totalprice) OVER w AS last_price,
             nth_value(o_totalprice, 2) OVER w AS second_price
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey""")),

    // CS6 — single-pass column profile (the data-quality report a loader
    // runs before trusting a new drop): per column, null count, EXACT
    // distinct count, and numeric min/max. One agg computes all five
    // columns' stats in one scan (the multi-countDistinct expands inside a
    // single aggregate, one shuffle), then a 1-row stack melts it to the
    // long report. Exact distincts are the grade; at 100 TB the same
    // report runs on the KMV sketch (ks1) — this is its exact twin.
    Q("cs6_column_profile", (s, dir) => {
      val o = t(s, dir, "orders")
      o.agg(
        count(lit(1)).as("n"),
        count(col("o_orderkey")).as("c_ok"),
        countDistinct(col("o_orderkey")).as("d_ok"),
        min("o_orderkey").cast("double").as("mn_ok"),
        max("o_orderkey").cast("double").as("mx_ok"),
        count(col("o_custkey")).as("c_ck"),
        countDistinct(col("o_custkey")).as("d_ck"),
        min("o_custkey").cast("double").as("mn_ck"),
        max("o_custkey").cast("double").as("mx_ck"),
        count(col("o_orderstatus")).as("c_st"),
        countDistinct(col("o_orderstatus")).as("d_st"),
        count(col("o_totalprice")).as("c_tp"),
        countDistinct(col("o_totalprice")).as("d_tp"),
        round(min("o_totalprice"), 4).as("mn_tp"),
        round(max("o_totalprice"), 4).as("mx_tp"),
        count(col("o_orderpriority")).as("c_pr"),
        countDistinct(col("o_orderpriority")).as("d_pr"))
        .select(expr("""stack(5,
          'o_orderkey',      n - c_ok, d_ok, mn_ok, mx_ok,
          'o_custkey',       n - c_ck, d_ck, mn_ck, mx_ck,
          'o_orderstatus',   n - c_st, d_st, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
          'o_totalprice',    n - c_tp, d_tp, mn_tp, mx_tp,
          'o_orderpriority', n - c_pr, d_pr, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE))
          AS (col_name, n_null, n_distinct, min_num, max_num)"""))
        .orderBy("col_name")
    }, Some("""
      SELECT 'o_orderkey' AS col_name,
             count(*) - count(o_orderkey) AS n_null,
             count(DISTINCT o_orderkey) AS n_distinct,
             CAST(min(o_orderkey) AS DOUBLE) AS min_num,
             CAST(max(o_orderkey) AS DOUBLE) AS max_num FROM orders
      UNION ALL
      SELECT 'o_custkey', count(*) - count(o_custkey),
             count(DISTINCT o_custkey),
             CAST(min(o_custkey) AS DOUBLE),
             CAST(max(o_custkey) AS DOUBLE) FROM orders
      UNION ALL
      SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
             count(DISTINCT o_orderstatus), NULL, NULL FROM orders
      UNION ALL
      SELECT 'o_totalprice', count(*) - count(o_totalprice),
             count(DISTINCT o_totalprice),
             round(min(o_totalprice), 4), round(max(o_totalprice), 4)
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
             count(DISTINCT o_orderpriority), NULL, NULL FROM orders
      ORDER BY col_name""")),

    // ------------------------------------------------------------------
    // §2.2 sinks as DataFrame rewrites
    // ------------------------------------------------------------------

    // K1 — PK-dedup append: existing wins, fresh keys appended.
    Q("k1_dedup_append", (s, dir) => {
      val orders = t(s, dir, "orders")
      val existing = orders.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val incoming = orders.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
        .select(orders.columns.map(col).toSeq: _*)
      LoadOps.dedupAppend(existing, incoming, Seq("o_orderkey"))
        .orderBy("o_orderkey")
    }, Some("""
      WITH existing AS (
        SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'),
      incoming AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice + 1.0 AS o_totalprice, o_orderdate, o_orderpriority
        FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01')
      SELECT * FROM (
        SELECT * FROM existing
        UNION ALL
        SELECT i.* FROM incoming i
        WHERE NOT EXISTS (SELECT 1 FROM existing e
                          WHERE e.o_orderkey = i.o_orderkey))
      ORDER BY o_orderkey""")),

    // K4 — delete-future-then-reload slice overwrite.
    Q("k4_future_overwrite", (s, dir) => {
      val orders = t(s, dir, "orders")
      val fresh = orders
        .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
        .withColumn("o_orderstatus", lit("R"))
        .select(orders.columns.map(col).toSeq: _*)
      LoadOps.overwriteFutureSlice(orders, fresh, "o_orderdate",
        java.sql.Date.valueOf("1998-01-01")).orderBy("o_orderkey")
    }, Some("""
      SELECT * FROM (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
        UNION ALL
        SELECT o_orderkey, o_custkey, 'R' AS o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01')
      ORDER BY o_orderkey""")),

    // K5 — 7-day slide-forward retraction.
    Q("k5_slide_forward", (s, dir) => {
      val ec = t(s, dir, "orders")
        .select(col("o_custkey").cast("string").as("act_symbol"),
          dt(col("o_orderdate")).as("date")).distinct()
      val inc = ec.groupBy("act_symbol").agg(max("date").as("__mx"))
        .select(col("act_symbol"), date_add(col("__mx"), 2).as("date"))
      LoadOps.slideForward(ec, inc, "act_symbol", "date")
        .orderBy("act_symbol", "date")
    }, Some("""
      WITH ec AS (
        SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS act_symbol,
               CAST(o_orderdate AS DATE) AS date FROM orders),
      inc AS (
        SELECT act_symbol, CAST(max(date) + INTERVAL 2 DAY AS DATE) AS date
        FROM ec GROUP BY act_symbol)
      SELECT * FROM (
        SELECT e.act_symbol, e.date FROM ec e
        WHERE NOT EXISTS (
          SELECT 1 FROM inc i WHERE i.act_symbol = e.act_symbol
            AND e.date >= CAST(i.date - INTERVAL 7 DAY AS DATE)
            AND e.date < i.date)
        UNION ALL SELECT act_symbol, date FROM inc)
      ORDER BY act_symbol, date""")),

    // ------------------------------------------------------------------
    // §2.7 scalar functions — strings
    // ------------------------------------------------------------------

    // F1(+F3) — Zacks numeric-text sanitizer over all edge shapes.
    Q("f1_sanitize_numeric", (s, dir) => {
      val raw = when(col("p_partkey") % 8 === 0, lit("1,234.5"))
        .when(col("p_partkey") % 8 === 1, lit(" (12.3) "))
        .when(col("p_partkey") % 8 === 2, lit("NA"))
        .when(col("p_partkey") % 8 === 3, lit("M"))
        .when(col("p_partkey") % 8 === 4, lit("2.5B"))
        .when(col("p_partkey") % 8 === 5, lit("1.2T"))
        .when(col("p_partkey") % 8 === 6, lit("10.00M"))
        .otherwise(col("p_size").cast("string"))
      t(s, dir, "part").select(col("p_partkey"), raw.as("raw"),
        F.sanitizeToDouble(raw).as("val")).orderBy("p_partkey")
    }, Some("""
      WITH t AS (
        SELECT p_partkey,
               CASE CAST(p_partkey % 8 AS INTEGER)
                 WHEN 0 THEN '1,234.5' WHEN 1 THEN ' (12.3) '
                 WHEN 2 THEN 'NA' WHEN 3 THEN 'M' WHEN 4 THEN '2.5B'
                 WHEN 5 THEN '1.2T' WHEN 6 THEN '10.00M'
                 ELSE CAST(p_size AS VARCHAR) END AS raw
        FROM part),
      s AS (
        SELECT p_partkey, raw,
               replace(replace(trim(raw), 'T', 'e12'), 'B', 'e9') AS s1
        FROM t),
      s2 AS (
        SELECT p_partkey, raw,
               replace(replace(replace(replace(
                 CASE WHEN s1 = 'M' THEN 'NA' ELSE s1 END,
                 'M', 'e6'), '(', ''), ')', ''), ',', '') AS s4
        FROM s)
      SELECT p_partkey, raw,
             CASE WHEN s4 = 'NA' OR s4 = '' THEN NULL
                  ELSE CAST(s4 AS DOUBLE) END AS val
      FROM s2 ORDER BY p_partkey""")),

    // F2 — trim + strip commas.
    Q("f2_trim_commas", (s, dir) => {
      val raw = concat(lit("  "), col("p_partkey").cast("string"), lit(","),
        col("p_size").cast("string"), lit("  "))
      t(s, dir, "part").select(col("p_partkey"),
        F.trimCommas(raw).as("clean")).orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey,
             replace(trim('  ' || CAST(p_partkey AS VARCHAR) || ',' ||
                          CAST(p_size AS VARCHAR) || '  '), ',', '') AS clean
      FROM part ORDER BY p_partkey""")),

    // F3 — 'NA' → NULL + cast.
    Q("f3_na_to_null", (s, dir) => {
      val raw = when(col("p_size") % 3 === 0, lit("NA"))
        .otherwise(col("p_size").cast("string"))
      t(s, dir, "part").select(col("p_partkey"),
        F.naToNull(raw).cast("double").as("val")).orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey,
             CASE WHEN CAST(p_size % 3 AS INTEGER) = 0 THEN NULL
                  ELSE CAST(CAST(p_size AS VARCHAR) AS DOUBLE) END AS val
      FROM part ORDER BY p_partkey""")),

    // F4 — ×1e6 unit scaling.
    Q("f4_scale_millions", (s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
        F.scaleMillions(col("o_totalprice")).as("scaled"))
        .orderBy("o_orderkey"),
      Some("""
      SELECT o_orderkey, o_totalprice * 1000000 AS scaled FROM orders
      ORDER BY o_orderkey""")),

    // F5+F10 — rank substring + enum ordinal.
    Q("f5_rank_text", (s, dir) => {
      val raw = when(col("p_size") % 5 === 0, lit("1-Strong Buy"))
        .when(col("p_size") % 5 === 1, lit("2-Buy"))
        .when(col("p_size") % 5 === 2, lit("3-Hold"))
        .when(col("p_size") % 5 === 3, lit("4-Sell"))
        .otherwise(lit("5-Strong Sell"))
      t(s, dir, "part").select(col("p_partkey"),
        F.rankText(raw).as("rank"),
        F.toIntegerRank(F.rankText(raw)).as("rank_ord"))
        .orderBy("p_partkey")
    }, Some("""
      WITH t AS (
        SELECT p_partkey,
               substr(CASE CAST(p_size % 5 AS INTEGER)
                 WHEN 0 THEN '1-Strong Buy' WHEN 1 THEN '2-Buy'
                 WHEN 2 THEN '3-Hold' WHEN 3 THEN '4-Sell'
                 ELSE '5-Strong Sell' END, 3) AS rank
        FROM part)
      SELECT p_partkey, rank,
             CASE rank WHEN 'Strong Buy' THEN 1 WHEN 'Buy' THEN 2
                       WHEN 'Hold' THEN 3 WHEN 'Sell' THEN 4
                       WHEN 'Strong Sell' THEN 5 END AS rank_ord
      FROM t ORDER BY p_partkey""")),

    // F6 — $ strip (`dividend-calendar-transform-load.rkt:106`).
    Q("f6_dollar_strip", (s, dir) => {
      val raw = concat(lit("$"), col("p_size").cast("string"), lit(".25"))
      t(s, dir, "part").select(col("p_partkey"),
        F.stripDollar(raw).cast("double").as("amount")).orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey,
             CAST(replace('$' || CAST(p_size AS VARCHAR) || '.25', '$', '')
                  AS DOUBLE) AS amount
      FROM part ORDER BY p_partkey""")),

    // F7 — calendar JSON noise strip.
    Q("f7_noise_strip", (s, dir) => {
      val raw = concat(lit("window.app_data = {\"d\": \"<b>"), col("p_brand"),
        lit("</b> AAPL Quick Quote ok\"}"))
      t(s, dir, "part").select(col("p_partkey"),
        F.stripCalendarNoise(raw).as("clean")).orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey,
             regexp_replace(regexp_replace(regexp_replace(
               'window.app_data = {"d": "<b>' || p_brand ||
               '</b> AAPL Quick Quote ok"}',
               '^\s*window\.app_data\s*=\s*', '', 'g'),
               '<.*?>', '', 'g'),
               '[A-Z\.]+ Quick Quote', '', 'g') AS clean
      FROM part ORDER BY p_partkey""")),

    // F8 — symbol-from-filename regex.
    Q("f8_symbol_from_path", (s, dir) => {
      val path = concat(lit("/var/tmp/zacks/2024-01-15/"), col("p_brand"),
        lit(".detailed-estimates.html"))
      t(s, dir, "part").select(col("p_partkey"),
        F.symbolFromFilename(path, "detailed-estimates").as("sym"))
        .orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey,
             regexp_extract('/var/tmp/zacks/2024-01-15/' || p_brand ||
                            '.detailed-estimates.html',
                            '([^/]+)\.detailed-estimates\.html$', 1) AS sym
      FROM part ORDER BY p_partkey""")),

    // F9 — rlike / !rlike predicates.
    Q("f9_regex_predicates", (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_name").rlike("red|green") && !col("p_name").rlike("dark"))
        .select("p_partkey", "p_name").orderBy("p_partkey"),
      Some("""
      SELECT p_partkey, p_name FROM part
      WHERE regexp_matches(p_name, 'red|green')
        AND NOT regexp_matches(p_name, 'dark')
      ORDER BY p_partkey""")),

    // F10 — enum ordinal over a real enum-ish column.
    Q("f10_enum_ordinal", (s, dir) =>
      t(s, dir, "orders").select(col("o_orderpriority")).distinct()
        .withColumn("ord", F.enumOrdinal(col("o_orderpriority"),
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")))
        .orderBy("o_orderpriority"),
      Some("""
      SELECT o_orderpriority,
             CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
               WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
               WHEN '5-LOW' THEN 5 END AS ord
      FROM (SELECT DISTINCT o_orderpriority FROM orders)
      ORDER BY o_orderpriority""")),

    // ------------------------------------------------------------------
    // §2.7 scalar functions — dates
    // ------------------------------------------------------------------

    // D1 — end-of-month from "(MM/YYYY)" headers.
    Q("d1_end_of_month", (s, dir) =>
      t(s, dir, "orders")
        .select(date_format(col("o_orderdate"), "MM/yyyy").as("header"))
        .distinct()
        .withColumn("eom", D.endOfMonthFromHeader(col("header")))
        .orderBy("eom"),
      Some("""
      SELECT header, last_day(CAST(strptime('01/' || header, '%d/%m/%Y') AS DATE)) AS eom
      FROM (SELECT DISTINCT strftime(o_orderdate, '%m/%Y') AS header FROM orders)
      ORDER BY eom""")),

    // D2+D3 — prior-year / prior-quarter / next-quarter-end arithmetic with
    // Postgres-compatible month-end clamping.
    Q("d2_d3_interval_arith", (s, dir) =>
      t(s, dir, "orders").select(dt(col("o_orderdate")).as("d")).distinct()
        .select(col("d"),
          D.priorYear(col("d")).as("prior_year"),
          D.priorQuarter(col("d")).as("prior_quarter"),
          D.nextQuarterEnd(col("d")).as("next_q_end"))
        .orderBy("d"),
      Some("""
      SELECT d, CAST(d - INTERVAL 1 YEAR AS DATE) AS prior_year,
             CAST(d + INTERVAL 1 DAY - INTERVAL 3 MONTH - INTERVAL 1 DAY AS DATE) AS prior_quarter,
             CAST(d + INTERVAL 1 DAY + INTERVAL 3 MONTH - INTERVAL 1 DAY AS DATE) AS next_q_end
      FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
      ORDER BY d""")),

    // D4 — statement-header date parse "M/dd/yyyy".
    Q("d4_header_parse", (s, dir) =>
      t(s, dir, "orders").select(dt(col("o_orderdate")).as("d")).distinct()
        .select(concat(month(col("d")).cast("string"), lit("/"),
          date_format(col("d"), "dd/yyyy")).as("header"))
        .withColumn("parsed", D.parseStatementDate(col("header"),
          twoDigitYear = false))
        .orderBy("parsed"),
      Some("""
      WITH t AS (
        SELECT CAST(month(d) AS VARCHAR) || '/' || strftime(d, '%d/%Y') AS header
        FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders))
      SELECT header,
             CAST(strptime(lpad(split_part(header, '/', 1), 2, '0') || '/' ||
                           split_part(header, '/', 2) || '/' ||
                           split_part(header, '/', 3), '%m/%d/%Y') AS DATE) AS parsed
      FROM t ORDER BY parsed""")),

    // D5 — datediff projection.
    Q("d5_datediff", (s, dir) =>
      t(s, dir, "events").select(col("event_id"),
        datediff(lit("2024-02-01").cast("date"), dt(col("ts")))
          .as("days_to_cutoff"))
        .orderBy("event_id"),
      Some("""
      SELECT event_id,
             CAST(date_diff('day', CAST(ts AS DATE), DATE '2024-02-01') AS INTEGER)
               AS days_to_cutoff
      FROM events ORDER BY event_id""")),

    // D6+D9 — fixed-offset lookbacks.
    Q("d6_d9_lookbacks", (s, dir) =>
      t(s, dir, "orders").select(dt(col("o_orderdate")).as("d")).distinct()
        .select(col("d"), D.slideBackWindowStart(col("d")).as("back7"),
          D.sixMonthsBack(col("d")).as("back6mo"))
        .orderBy("d"),
      Some("""
      SELECT d, CAST(d - INTERVAL 7 DAY AS DATE) AS back7,
             CAST(d - INTERVAL 6 MONTH AS DATE) AS back6mo
      FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
      ORDER BY d""")),

    // D7 — yyyy-MM-dd format + parse round trip.
    Q("d7_format_roundtrip", (s, dir) =>
      t(s, dir, "orders").select(dt(col("o_orderdate")).as("d")).distinct()
        .select(date_format(col("d"), "yyyy-MM-dd").as("s"))
        .withColumn("d", to_date(col("s"), "yyyy-MM-dd"))
        .orderBy("d"),
      Some("""
      SELECT s, CAST(strptime(s, '%Y-%m-%d') AS DATE) AS d
      FROM (SELECT DISTINCT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS s
            FROM orders)
      ORDER BY d""")),

    // D10 — next-business-day arithmetic over the distinct date spine:
    // weekend landings roll to Monday (Spark dayofweek 1=Sun…7=Sat vs
    // DuckDB 0=Sun…6=Sat — the oracle mirrors the roll, not the encoding).
    Q("d10_business_day", (s, dir) =>
      t(s, dir, "orders").select(dt(col("o_orderdate")).as("d")).distinct()
        .select(col("d"), D.isBusinessDay(col("d")).as("is_bd"),
          D.nextBusinessDay(col("d")).as("next_bd"))
        .orderBy("d"),
      Some("""
      SELECT d, dayofweek(d) NOT IN (0, 6) AS is_bd,
             CASE WHEN dayofweek(d + 1) = 6 THEN CAST(d + 3 AS DATE)
                  WHEN dayofweek(d + 1) = 0 THEN CAST(d + 2 AS DATE)
                  ELSE CAST(d + 1 AS DATE) END AS next_bd
      FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
      ORDER BY d""")),

    // K11 — incremental aggregate maintenance: a running per-(status,
    // priority) summary merged with a fresh slice's PARTIAL aggregate —
    // counters add, sums add — and graded against the full recompute.
    // This is the foreachBatch summary-table pattern: at 100 TB the
    // "old" side is a tiny stored summary (|groups| rows), so each
    // refresh costs one aggregation of the delta slice plus a
    // groups-sized merge, never a rescan of history.
    Q("k11_incremental_agg", (s, dir) => {
      val orders = t(s, dir, "orders")
      val cut = lit("1997-01-01").cast("date")
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"), sum("o_totalprice").as("sp"))
      val stored = partial(orders.filter(dt(col("o_orderdate")) < cut))
      val delta = partial(orders.filter(dt(col("o_orderdate")) >= cut))
      stored.unionByName(delta)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(sum("n").as("n"), round(sum("sp"), 2).as("total"))
        .orderBy("o_orderstatus", "o_orderpriority")
    }, Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ------------------------------------------------------------------
    // §2.8 streaming-shaped: tumbling-window aggregation via the streaming
    // module's batch form (the Structured Streaming form — same function on
    // a streaming frame plus foreachBatch loaders — is exercised in
    // StreamingSpec).
    // ------------------------------------------------------------------
    Q("st1_tumbling_hourly", (s, dir) =>
      graft.streaming.StreamingLoad.tumblingCounts(
        t(s, dir, "events"), "ts", col("event_type"),
        valueCol = col("value"))
        .orderBy("ws", "event_type"),
      Some("""
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, event_type,
             count(*) AS n, round(sum(value), 2) AS sv
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // w3 — RANGE-interval sliding window over event time: per event, the
    // count and mean of the SAME USER's events in the trailing hour —
    // the rate-limiter / rolling-feature window shape. RangeFrame over
    // unix micros (Spark's rangeBetween needs a numeric sort key), frame
    // membership by time distance, so ts ties all join the frame in both
    // engines.
    Q("w3_range_window", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("tsm"))
        .rangeBetween(-3600L * 1000000L, 0L)
      t(s, dir, "events")
        .withColumn("tsm", unix_micros(col("ts")))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_1h"),
          round(avg(col("value")).over(w), 6).as("mean_1h"))
        .orderBy("event_id")
    }, Some("""
      SELECT event_id, user_id,
             CAST(count(*) OVER w AS BIGINT) AS n_1h,
             round(avg(value) OVER w, 6) AS mean_1h
      FROM (SELECT event_id, user_id, value, epoch_us(ts) AS tsm
            FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY tsm
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY event_id""")),

    // st5 — stream-stream interval join, batch form: views attributed to
    // same-user purchases within 30 minutes (the streaming form — two
    // watermarked file streams through the SAME intervalEventJoin — is
    // exercised in StreamingSpec; in streaming the range predicate is what
    // bounds the join state). Batch plan: equi-join on user_id with the
    // time range as a residual — never a nested loop.
    Q("st5_interval_event_join", (s, dir) => {
      val ev = t(s, dir, "events")
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("vts"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("pts"))
      graft.streaming.StreamingLoad.intervalEventJoin(
        views, buys, "user_id", "vts", "pts", maxGap = "30 minutes")
        .select(col("user_id"), col("view_id"), col("purchase_id"),
          (unix_micros(col("pts")) - unix_micros(col("vts"))).as("lag_us"))
        .orderBy("view_id", "purchase_id")
    }, Some("""
      SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
             epoch_us(p.ts) - epoch_us(v.ts) AS lag_us
      FROM events v JOIN events p
        ON v.user_id = p.user_id
       AND v.event_type = 'view' AND p.event_type = 'purchase'
       AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
      ORDER BY view_id, purchase_id""")),

    // st2 — session windows per user (gap-merged), batch form of the
    // streaming `session_window` aggregation (streaming form in
    // StreamingSpec). Oracle: classic lag→gap-flag→cumsum sessionization.
    Q("st2_session_windows", (s, dir) =>
      graft.streaming.StreamingLoad.sessionAggs(
        t(s, dir, "events"), "ts", col("user_id"),
        gap = "4 hours", valueCol = col("value"))
        .orderBy("user_id", "session_start"),
      Some("""
      WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w >= INTERVAL 4 HOUR
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sessions AS (
        SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged)
      SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
             round(sum(value), 4) AS sum_value
      FROM sessions GROUP BY user_id, sid
      ORDER BY user_id, session_start""")),

    // st4 — the stateful streaming dedup graded end to end: batch-mode
    // flatMapGroupsWithState hands each key's full iterator to the SAME
    // state function the stream runs per micro-batch, and with the
    // commutative-associative min-by-event_id pick the kept row per key is
    // deterministic — so K1-as-stream-state grades against a plain
    // min-per-key SQL oracle instead of rows-only.
    Q("st4_stateful_dedup", (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select(col("event_id").cast("long").as("_1"),
          col("user_id").cast("long").as("_2"),
          col("event_type").as("_3"), col("value").as("_4"))
        .as[(Long, Long, String, Double)]
      graft.streaming.StreamingLoad.firstSeenDedup(
        ev.groupByKey(r => (r._2, r._3)),
        pick = (a: (Long, Long, String, Double),
                b: (Long, Long, String, Double)) =>
          if (a._1 <= b._1) a else b)
        .toDF("event_id", "user_id", "event_type", "value")
        .orderBy("user_id", "event_type")
    }, Some("""
      SELECT event_id, user_id, event_type, value FROM (
        SELECT event_id, user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id, event_type
                 ORDER BY event_id) AS rn
        FROM events) WHERE rn = 1
      ORDER BY user_id, event_type""")),

    // Deterministic fixed-bin histogram quantiles over the event stream —
    // the mergeable one-pass scale path beside cs1's exact percentile
    // (which needs the values ordered). Fixed binning makes the estimate
    // itself engine-reproducible, so it hash-grades, unlike a t-digest.
    Q("hq1_hist_quantiles", (s, dir) =>
      graft.operators.Quantiles.histQuantiles(
        t(s, dir, "events"), "value", lo = 0.0, hi = 500.0, nBins = 50,
        qs = Seq(0.5, 0.9, 0.99))
        .orderBy("q"),
      Some("""
      WITH b AS (
        SELECT CAST(least(greatest(floor((value - 0.0) / 10.0), 0), 49)
          AS BIGINT) AS bin
        FROM events),
      c AS (SELECT bin, count(*) AS cnt FROM b GROUP BY bin),
      cc AS (
        SELECT bin, cnt,
               CAST(sum(cnt) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
               CAST(sum(cnt) OVER () AS BIGINT) AS n
        FROM c),
      probes AS (SELECT unnest([0.5e0, 0.9e0, 0.99e0]) AS q)
      SELECT q,
             arg_min(round(0.0 + 10.0 * (bin + (q * n - (cum - cnt)) / cnt),
               6), bin) AS est
      FROM cc, probes WHERE cum >= q * n
      GROUP BY q ORDER BY q""")),

    // hq1's grouped form: per-language token-count p50/p95 over the
    // documents corpus — the per-source distribution monitor, same
    // mergeable histogram with every window partitioned by the group key.
    Q("hq2_grouped_quantiles", (s, dir) =>
      graft.operators.Quantiles.groupedHistQuantiles(
        t(s, dir, "documents")
          .select(col("lang"),
            graft.operators.TextAnalysis.tokenCount(col("text"))
              .cast("double").as("nt")),
        "lang", "nt", lo = 0.0, hi = 128.0, nBins = 32,
        qs = Seq(0.5, 0.95))
        .withColumnRenamed("grp", "lang")
        .orderBy("lang", "q"),
      Some("""
      WITH b AS (
        SELECT lang,
               CAST(least(greatest(floor(
                 CAST(len(string_split(text, ' ')) AS DOUBLE) / 4.0), 0), 31)
                 AS BIGINT) AS bin
        FROM documents),
      c AS (SELECT lang, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
      cc AS (
        SELECT lang, bin, cnt,
               CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum,
               CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
        FROM c),
      probes AS (SELECT unnest([0.5e0, 0.95e0]) AS q)
      SELECT lang, q,
             arg_min(round(0.0 + 4.0 * (bin + (q * n - (cum - cnt)) / cnt),
               6), bin) AS est
      FROM cc, probes WHERE cum >= q * n
      GROUP BY lang, q ORDER BY lang, q""")),

    // ------------------------------------------------------------------
    // §2.4 bonus — as-of join (point-in-time enrichment): for each purchase
    // the user's latest view at-or-before it. Spark side is AsOfJoin's
    // union + one-window merge plan; the oracle is DuckDB's native ASOF.
    // ------------------------------------------------------------------
    Q("j7_asof_join", (s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("view_ts"),
          round(col("value"), 4).as("view_value"))
      graft.operators.AsOfJoin.asOf(purchases, views, Seq("user_id"),
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

    // ------------------------------------------------------------------
    // §2.4 bonus — bucketed interval (range) join: orders probed against
    // per-lineitem ship windows as a hash equi-join on 7-day time buckets
    // plus an exact residual filter — a raw BETWEEN predicate would plan a
    // BroadcastNestedLoopJoin (O(intervals × probes) compares). The oracle
    // IS the naive BETWEEN join, so the bucketing must reproduce it
    // exactly: a dropped boundary day or double-counted bucket grades red.
    // ------------------------------------------------------------------
    Q("j8_interval_bucket_join", (s, dir) => {
      val iv = t(s, dir, "lineitem").filter(col("l_suppkey") === 1)
        .select(col("l_orderkey"), col("l_linenumber"),
          to_date(col("l_shipdate")).as("iv_start"),
          date_add(to_date(col("l_shipdate")),
            (col("l_quantity").cast("int") % 30) + 1).as("iv_end"))
      val pr = t(s, dir, "orders")
        .select(to_date(col("o_orderdate")).as("o_date"),
          col("o_totalprice"))
      graft.operators.IntervalJoin.bucketedIntervalJoin(
        iv, "iv_start", "iv_end", pr, "o_date", bucketDays = 7)
        .groupBy("l_orderkey", "l_linenumber", "iv_start", "iv_end")
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy("l_orderkey", "l_linenumber")
    }, Some("""
      WITH iv AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_shipdate AS DATE) AS iv_start,
               CAST(l_shipdate
                 + INTERVAL ((CAST(l_quantity AS INT) % 30) + 1) DAY
                 AS DATE) AS iv_end
        FROM lineitem WHERE l_suppkey = 1)
      SELECT iv.l_orderkey, iv.l_linenumber, iv.iv_start, iv.iv_end,
             count(*) AS n_orders, round(sum(o.o_totalprice), 2) AS sum_price
      FROM iv JOIN orders o
        ON CAST(o.o_orderdate AS DATE) BETWEEN iv.iv_start AND iv.iv_end
      GROUP BY 1, 2, 3, 4
      ORDER BY 1, 2""")),

    // J11 — interval-OVERLAP join (both sides are ranges: downtime ×
    // incident correlation). Same bucket-equi-join discipline as j8, plus
    // the exactly-once trick: a pair overlaps in EVERY shared bucket, so
    // it is kept only at the bucket of the LATER start — no post-join
    // distinct. Graded aggregate: per left interval, how many supplier-2
    // intervals overlap and for how many total days.
    Q("j11_interval_overlap_join", (s, dir) => {
      def ivs(suppkey: Int, p: String) =
        t(s, dir, "lineitem").filter(col("l_suppkey") === suppkey)
          .select(col("l_orderkey").as(s"${p}_okey"),
            col("l_linenumber").as(s"${p}_line"),
            to_date(col("l_shipdate")).as(s"${p}_start"),
            date_add(to_date(col("l_shipdate")),
              (col("l_quantity").cast("int") % 30) + 1).as(s"${p}_end"))
      graft.operators.IntervalJoin.bucketedOverlapJoin(
        ivs(1, "a"), "a_start", "a_end",
        ivs(2, "b"), "b_start", "b_end", bucketDays = 7)
        .groupBy("a_okey", "a_line", "a_start", "a_end")
        .agg(count(lit(1)).as("n_overlaps"),
          sum(datediff(least(col("a_end"), col("b_end")),
            greatest(col("a_start"), col("b_start"))) + 1)
            .as("overlap_days"))
        .orderBy("a_okey", "a_line")
    }, Some("""
      WITH a AS (
        SELECT l_orderkey AS a_okey, l_linenumber AS a_line,
               CAST(l_shipdate AS DATE) AS a_start,
               CAST(l_shipdate
                 + INTERVAL ((CAST(l_quantity AS INT) % 30) + 1) DAY
                 AS DATE) AS a_end
        FROM lineitem WHERE l_suppkey = 1),
      b AS (
        SELECT CAST(l_shipdate AS DATE) AS b_start,
               CAST(l_shipdate
                 + INTERVAL ((CAST(l_quantity AS INT) % 30) + 1) DAY
                 AS DATE) AS b_end
        FROM lineitem WHERE l_suppkey = 2)
      SELECT a_okey, a_line, a_start, a_end,
             count(*) AS n_overlaps,
             CAST(sum(date_diff('day', greatest(a_start, b_start),
                           least(a_end, b_end)) + 1) AS BIGINT)
               AS overlap_days
      FROM a JOIN b ON a_start <= b_end AND b_start <= a_end
      GROUP BY 1, 2, 3, 4
      ORDER BY 1, 2""")),

    // ST8 — watermark late-data audit (batch replay of streaming
    // semantics): against the watermark a withWatermark(600s) stream
    // would have held at each row's ARRIVAL (event_id = ingest sequence),
    // how many rows per tumbling hour would a streaming aggregate have
    // dropped? The capacity-planning readout run over history before
    // committing an allowed-lateness to production. The global
    // prefix-max over arrival order runs as a TWO-LEVEL scan (per-bucket
    // maxima + bounded bucket-table prefix), never a single-partition
    // window — the oracle's naive global window is the semantics spec,
    // not the plan.
    Q("st8_late_data_audit", (s, dir) =>
      graft.streaming.StreamingLoad.lateDataAudit(
        t(s, dir, "events"), "event_id", "ts",
        delaySec = 600, windowSec = 3600)
        .orderBy("win"),
    Some("""
      WITH e AS (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      w AS (
        SELECT sec,
               max(sec) OVER (ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - 600
                 AS wm
        FROM e)
      SELECT CAST(floor(sec / 3600) AS BIGINT) AS win,
             count(*) AS n_events,
             CAST(sum(CASE WHEN wm IS NOT NULL AND sec < wm
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
             CAST(count(*) - sum(CASE WHEN wm IS NOT NULL AND sec < wm
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_ontime
      FROM w GROUP BY 1 ORDER BY win""")),

    // J14 — nearest-in-time as-of join (pandas merge_asof
    // direction='nearest'): each purchase picks the view CLOSEST in time
    // either way, ties to the earlier view — the enrichment mode j7's
    // backward-only as-of can't express (a sensor reading just AFTER the
    // probe is often the right match). Same single-shuffle union+window
    // plan as j7 with one extra frame pass for the forward direction —
    // never a range join. Views are pre-deduped per (user, second) with
    // a min-event-id winner so equal-time payloads are deterministic on
    // both engines; times ride floored epoch seconds.
    Q("j14_nearest_asof", (s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          col("ts").cast("long").as("pt"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("vid"),
          col("ts").cast("long").as("vt"),
          round(col("value"), 4).as("view_value"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id", "vt").orderBy("vid")))
        .filter(col("rn") === 1).drop("rn", "vid")
      graft.operators.AsOfJoin.asOfNearest(purchases, views,
          Seq("user_id"), probeTime = "pt", factTime = "vt",
          factPayload = Seq("view_value"))
        .selectExpr("user_id", "event_id", "pt", "vt", "view_value",
          "matched_dir", "abs(pt - vt) AS dist_s")
        .orderBy("event_id")
    }, Some("""
      WITH p AS (
        SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS pt
        FROM events WHERE event_type = 'purchase'),
      v0 AS (
        SELECT user_id, event_id AS vid,
               CAST(floor(epoch(ts)) AS BIGINT) AS vt,
               round(value, 4) AS view_value
        FROM events WHERE event_type = 'view'),
      v AS (
        SELECT user_id, vt, view_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id, vt
                      ORDER BY vid) AS rn
          FROM v0)
        WHERE rn = 1),
      back AS (
        SELECT p.user_id, p.event_id, p.pt, v.vt AS bvt,
               v.view_value AS bval
        FROM p ASOF LEFT JOIN v
          ON p.user_id = v.user_id AND p.pt >= v.vt),
      fwd AS (
        SELECT p.event_id, v.vt AS fvt, v.view_value AS fval
        FROM p ASOF LEFT JOIN v
          ON p.user_id = v.user_id AND p.pt < v.vt),
      j AS (
        SELECT b.user_id, b.event_id, b.pt, b.bvt, b.bval, f.fvt, f.fval
        FROM back b JOIN fwd f ON f.event_id = b.event_id),
      pick AS (
        SELECT user_id, event_id, pt,
               CASE WHEN fvt IS NULL OR (bvt IS NOT NULL AND
                      pt - bvt <= fvt - pt) THEN bvt ELSE fvt END AS vt,
               CASE WHEN fvt IS NULL OR (bvt IS NOT NULL AND
                      pt - bvt <= fvt - pt) THEN bval ELSE fval END
                 AS view_value,
               CASE WHEN fvt IS NULL OR (bvt IS NOT NULL AND
                      pt - bvt <= fvt - pt) THEN 'prev' ELSE 'next' END
                 AS matched_dir
        FROM j)
      SELECT user_id, event_id, pt, vt, view_value, matched_dir,
             abs(pt - vt) AS dist_s
      FROM pick WHERE vt IS NOT NULL ORDER BY event_id"""))
  )
}
