package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.t

/** Round-12 fifth-session waves: exact-integer business metrics —
  * equal-credit attribution with largest-remainder cent conservation,
  * Kendall tau-b rank correlation on the bounded day grid, and market
  * concentration (HHI + CR4). Every entry is DuckDB-oracle hash-graded;
  * operator invariants live in `MetricOpsSpec`.
  */
object MetricQueries {

  val all: Seq[Q] = Seq(

    // ATT2 — linear (equal-credit) attribution: each purchase's cents are
    // split EQUALLY across every preceding view/click by the same user
    // within the 7-day lookback; purchases with no touch stay 'direct'.
    // The split is exact integer money — cents div k per touch plus one
    // extra cent to the (cents mod k) most RECENT touches (w18's
    // largest-remainder move applied to money), so Σ credited ≡ Σ purchase
    // cents is a law of the query, not a rounding hope. Recency and
    // strict "before" both ride the fixed-width epoch|event_id packed key
    // (att1's trick — bytewise order IS event order on both engines).
    // Scale shape: the touch↔purchase join and both windows are keyed by
    // user — one user-hash shuffle, per-user fan-out bounded by a user's
    // 7-day activity, never corpus×corpus.
    Q("att2_linear_attribution", (s, dir) => {
      val key = concat_ws("|",
        lpad(col("ts").cast("long").cast("string"), 10, "0"),
        lpad(col("event_id").cast("string"), 8, "0"))
      val ev = t(s, dir, "events")
      val touches = ev.filter(col("event_type").isin("view", "click"))
        .select(col("user_id").as("t_user"), col("event_type").as("t_type"),
          col("ts").cast("long").as("t_ep"), key.as("t_key"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"),
          floor(col("value") * 100).cast("long").as("cents"),
          col("ts").cast("long").as("p_ep"), key.as("p_key"))
      val j = purchases.join(touches,
        col("t_user") === col("p_user") && col("t_key") < col("p_key") &&
          col("p_ep") - col("t_ep") <= 604800, "left")
      val wP = Window.partitionBy("p_user", "p_key")
      val wR = Window.partitionBy("p_user", "p_key")
        .orderBy(col("t_key").desc)
      j.withColumn("k", count(col("t_key")).over(wP))
        .withColumn("rn", row_number().over(wR))
        .select(
          when(col("k") === 0, lit("direct")).otherwise(col("t_type"))
            .as("channel"),
          when(col("k") === 0, col("cents"))
            .otherwise(expr("cents div k") +
              when(col("rn") <= col("cents") % col("k"), 1L).otherwise(0L))
            .as("credit"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_credits"),
          sum("credit").as("credited_cents"))
        .orderBy("channel")
    }, Some("""
      WITH ev AS (
        SELECT user_id, event_type, value,
               CAST(floor(epoch(ts)) AS BIGINT) AS ep,
               lpad(CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR),
                    10, '0')
                 || '|' || lpad(CAST(event_id AS VARCHAR), 8, '0') AS key
        FROM events),
      tt AS (
        SELECT user_id AS t_user, event_type AS t_type, ep AS t_ep,
               key AS t_key
        FROM ev WHERE event_type IN ('view', 'click')),
      p AS (
        SELECT user_id AS p_user, CAST(floor(value * 100) AS BIGINT) AS cents,
               ep AS p_ep, key AS p_key
        FROM ev WHERE event_type = 'purchase'),
      j AS (
        SELECT p.*, tt.t_type, tt.t_key
        FROM p LEFT JOIN tt ON t_user = p_user AND t_key < p_key
                            AND p_ep - t_ep <= 604800),
      r AS (
        SELECT *,
               count(t_key) OVER (PARTITION BY p_user, p_key) AS k,
               row_number() OVER (PARTITION BY p_user, p_key
                 ORDER BY t_key DESC) AS rn
        FROM j)
      SELECT CASE WHEN k = 0 THEN 'direct' ELSE t_type END AS channel,
             count(*) AS n_credits,
             CAST(sum(CASE WHEN k = 0 THEN cents
                      ELSE cents // k +
                           CASE WHEN rn <= cents % k THEN 1 ELSE 0 END
                      END) AS BIGINT) AS credited_cents
      FROM r GROUP BY 1 ORDER BY 1""")),

    // CS24 — Kendall tau-b between the URGENT and LOW daily-revenue
    // series: rank correlation from EXACT pair counts — concordance is
    // decided by integer comparisons only (never a sign() of a float
    // product, which overflows cents² long before the counts do), and the
    // tie corrections n1/n2 come from value-group counts, so every input
    // to the final tau is an exact integer. The O(days²) pair join runs on
    // the bounded aligned-day table (ts9's argument: pairs are a constant
    // of the calendar span, not the corpus); the assembly is three 1-row
    // broadcasts. tau_b = (C−D)/sqrt((n0−n1)(n0−n2)) composed once in
    // doubles, floor-scaled to 1e6.
    Q("cs24_kendall_tau", (s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("pri"),
          datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
            .cast("long").as("d"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      val x = daily.filter(col("pri") === "1-URGENT")
        .select(col("d"), col("cents").as("x"))
      val y = daily.filter(col("pri") === "5-LOW")
        .select(col("d").as("dy"), col("cents").as("y"))
      val al = x.join(y, col("d") === col("dy"))
        .select(col("d"), col("x"), col("y"))
        .localCheckpoint(eager = false) // feeds pairs, ties, and the count
      val a = al.select(col("d").as("d1"), col("x").as("x1"),
        col("y").as("y1"))
      val b = al.select(col("d").as("d2"), col("x").as("x2"),
        col("y").as("y2"))
      val pairs = a.join(b, col("d1") < col("d2"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when((col("x1") < col("x2") && col("y1") < col("y2")) ||
            (col("x1") > col("x2") && col("y1") > col("y2")), 1L)
            .otherwise(0L)).as("concordant"),
          sum(when((col("x1") < col("x2") && col("y1") > col("y2")) ||
            (col("x1") > col("x2") && col("y1") < col("y2")), 1L)
            .otherwise(0L)).as("discordant"))
      val nRow = al.agg(count(lit(1)).as("n_days"))
      val tx = al.groupBy("x").agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)).as("n1"))
      val ty = al.groupBy("y").agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)).as("n2"))
      pairs.crossJoin(nRow).crossJoin(tx).crossJoin(ty)
        .withColumn("n0", expr("n_days * (n_days - 1) div 2"))
        .select(col("n_days"), col("n_pairs"), col("concordant"),
          col("discordant"),
          floor(lit(1.0e6) *
            (col("concordant") - col("discordant")).cast("double") /
            sqrt((col("n0") - col("n1")).cast("double") *
              (col("n0") - col("n2")).cast("double")))
            .cast("long").as("tau_b_e6"))
    }, Some("""
      WITH daily AS (
        SELECT o_orderpriority AS pri,
               CAST(datediff('day', DATE '1992-01-01',
                 CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
               sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY 1, 2),
      al AS (
        SELECT x.d, x.cents AS x, y.cents AS y
        FROM (SELECT d, cents FROM daily WHERE pri = '1-URGENT') x
        JOIN (SELECT d, cents FROM daily WHERE pri = '5-LOW') y USING (d)),
      pairs AS (
        SELECT count(*) AS n_pairs,
               sum(CASE WHEN (a.x < b.x AND a.y < b.y)
                          OR (a.x > b.x AND a.y > b.y)
                   THEN 1 ELSE 0 END) AS concordant,
               sum(CASE WHEN (a.x < b.x AND a.y > b.y)
                          OR (a.x > b.x AND a.y < b.y)
                   THEN 1 ELSE 0 END) AS discordant
        FROM al a JOIN al b ON a.d < b.d),
      n AS (SELECT count(*) AS n_days FROM al),
      t1 AS (SELECT coalesce(sum(c * (c - 1) // 2), 0) AS n1
             FROM (SELECT count(*) AS c FROM al GROUP BY x)),
      t2 AS (SELECT coalesce(sum(c * (c - 1) // 2), 0) AS n2
             FROM (SELECT count(*) AS c FROM al GROUP BY y))
      SELECT n_days, n_pairs,
             CAST(concordant AS BIGINT) AS concordant,
             CAST(discordant AS BIGINT) AS discordant,
             CAST(floor(1.0e6 *
               CAST(concordant - discordant AS DOUBLE) /
               sqrt(CAST(n_days * (n_days - 1) // 2 - n1 AS DOUBLE) *
                    CAST(n_days * (n_days - 1) // 2 - n2 AS DOUBLE)))
               AS BIGINT) AS tau_b_e6
      FROM pairs, n, t1, t2""")),

    // CS25 — market-concentration audit: per-nation supplier HHI and CR4
    // over lineitem revenue. Per-supplier cents are one fact-grain
    // aggregate; the nation rollup carries Σc in BIGINT and Σc² in
    // DECIMAL/HUGEINT (cents² crosses int64 at corpus scale, and a float
    // Σc² is association-ordered), converts each sum to double ONCE, and
    // the top-4 mass is a deterministic row_number cut (ties on suppkey).
    // HHI ≤ CR1 ≤ CR4 is a law of shares — the spec asserts it within
    // floor slack. Shuffles: suppkey agg, suppkey join, nation window —
    // all key-hash, no corpus×corpus anywhere.
    Q("cs25_concentration", (s, dir) => {
      val perSupp = t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long"))
          .as("cents"))
      val supp = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val wN = Window.partitionBy("s_nationkey")
        .orderBy(col("cents").desc, col("l_suppkey"))
      val byNation = perSupp
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .withColumn("rn", row_number().over(wN))
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_suppliers"),
          sum("cents").as("total_cents"),
          sum(col("cents").cast("decimal(38,0)") * col("cents"))
            .cast("double").as("__ss"),
          sum(when(col("rn") <= 4, col("cents")).otherwise(0L))
            .as("__top4"))
      byNation
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("n_suppliers"), col("total_cents"),
          floor(lit(1.0e6) * col("__ss") /
            (col("total_cents").cast("double") *
              col("total_cents").cast("double")))
            .cast("long").as("hhi_e6"),
          floor(lit(1.0e6) * col("__top4").cast("double") /
            col("total_cents").cast("double"))
            .cast("long").as("cr4_e6"))
        .orderBy("n_name")
    }, Some("""
      WITH per AS (
        SELECT l_suppkey,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem GROUP BY 1),
      r AS (
        SELECT s_nationkey, cents,
               row_number() OVER (PARTITION BY s_nationkey
                 ORDER BY cents DESC, l_suppkey) AS rn
        FROM per JOIN supplier ON l_suppkey = s_suppkey),
      agg AS (
        SELECT s_nationkey, count(*) AS n_suppliers,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               CAST(sum(CAST(cents AS HUGEINT) * cents) AS DOUBLE) AS ss,
               CAST(sum(CASE WHEN rn <= 4 THEN cents ELSE 0 END)
                    AS BIGINT) AS top4
        FROM r GROUP BY 1)
      SELECT n_name, n_suppliers, total_cents,
             CAST(floor(1.0e6 * ss /
               (CAST(total_cents AS DOUBLE) * CAST(total_cents AS DOUBLE)))
               AS BIGINT) AS hhi_e6,
             CAST(floor(1.0e6 * CAST(top4 AS DOUBLE) /
               CAST(total_cents AS DOUBLE)) AS BIGINT) AS cr4_e6
      FROM agg JOIN nation ON s_nationkey = n_nationkey
      ORDER BY n_name"""))
  )
}
