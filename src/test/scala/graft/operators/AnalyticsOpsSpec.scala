package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkEntry, TestSpark}

/** Invariants for the third-wave analytics operators — gaps-and-islands
  * coalescing, the Z-order layout, and degree-oriented triangle counting —
  * the properties that must hold at any scale, complementing the DuckDB
  * hash grade. */
class AnalyticsOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  // ------------------------------------------------------------------
  // Intervals.coalesceIntervals
  // ------------------------------------------------------------------

  test("islands: hand-built overlap/touch/gap cases merge exactly") {
    val s = spark
    import s.implicits._
    // key 1: [0,10) [5,15) overlap -> one island [0,15)
    //        [15,20) touches (start == prior end) -> merges into [0,20)
    //        [25,30) gap -> second island
    // key 2: single interval
    val df = Seq(
      (1L, 1L, 0L, 10L), (1L, 2L, 5L, 15L), (1L, 3L, 15L, 20L),
      (1L, 4L, 25L, 30L),
      (2L, 5L, 3L, 4L)
    ).toDF("k", "id", "st", "en")
    val out = Intervals.coalesceIntervals(df, "k", "st", "en", "id")
      .orderBy("k", "island_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 1L, 0L, 20L, 3L),
      (1L, 2L, 25L, 30L, 1L),
      (2L, 1L, 3L, 4L, 1L)))
  }

  test("islands: per-key islands are disjoint, ordered, and cover all rows") {
    val rows = run("w7_gap_islands").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime, r.getTimestamp(3).getTime, r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, isl) =>
      val sorted = isl.sortBy(_._2)
      // island ids are 1..n dense
      assert(sorted.map(_._2).toSeq == (1L to sorted.length.toLong),
        s"user $user: island ids not dense")
      // strictly separated: next start > prior end (else they'd merge)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 > a._4,
          s"user $user: islands ${a._2},${b._2} touch or overlap")
        case _ =>
      }
      // every island spans at least its 30-minute seed
      sorted.foreach { i =>
        assert(i._4 - i._3 >= 30 * 60 * 1000L, s"user $user: island under 30m")
      }
    }
    // row conservation: sum of n_rows == events rows
    val total = rows.map(_._5).sum
    val events = graft.queries.Tables.t(spark, dir, "events").count()
    assert(total == events)
  }

  // ------------------------------------------------------------------
  // ZOrder
  // ------------------------------------------------------------------

  test("morton key: interleave is exact on known bit patterns") {
    val s = spark
    import s.implicits._
    val df = Seq((0, 0), (1, 0), (0, 1), (0xFFFF, 0), (0, 0xFFFF),
      (0xFFFF, 0xFFFF), (5, 3)).toDF("a", "b")
    val got = df.select(ZOrder.mortonKey(col("a"), col("b"))).as[Long]
      .collect().toSeq
    def spread(x: Int): Long =
      (0 until 16).map(i => ((x >> i) & 1).toLong << (2 * i)).sum
    val want = Seq((0, 0), (1, 0), (0, 1), (0xFFFF, 0), (0, 0xFFFF),
      (0xFFFF, 0xFFFF), (5, 3))
      .map { case (a, b) => spread(a) | (spread(b) << 1) }
    assert(got == want)
    // full-ones sanity: interleave(0xFFFF, 0xFFFF) = 0xFFFFFFFF
    assert(got.last != 0L && want(5) == 0xFFFFFFFFL)
  }

  test("morton key is monotone under quadrant refinement (locality)") {
    val s = spark
    import s.implicits._
    // all points in the low quadrant [0,256)^2 sort before any point in
    // the high quadrant [256,512)^2 — the property zone-map pruning uses
    val lo = Seq.tabulate(64)(i => (i % 8 * 13, i / 8 * 17))
    val hi = Seq.tabulate(64)(i => (256 + i % 8 * 13, 256 + i / 8 * 17))
    val keys = (lo ++ hi).toDF("a", "b")
      .select(ZOrder.mortonKey(col("a"), col("b")).as("z")).as[Long].collect()
    val (lk, hk) = keys.splitAt(64)
    assert(lk.max < hk.min)
  }

  test("zo1 layout: files partition the table and tighten both envelopes") {
    val rows = run("zo1_zorder_layout").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getLong(5)))
    assert(rows.length == 16)
    val n = rows.map(_._6).sum
    val events = graft.queries.Tables.t(spark, dir, "events").count()
    assert(n == events)
    // z-ordered files must beat the global-range envelope on average in BOTH
    // dims: mean per-file span strictly below the global span
    val gx = rows.map(_._3).max - rows.map(_._2).min
    val gy = rows.map(_._5).max - rows.map(_._4).min
    val mx = rows.map(r => r._3 - r._2).sum.toDouble / rows.length
    val my = rows.map(r => r._5 - r._4).sum.toDouble / rows.length
    assert(mx < gx && my < gy,
      s"z-order gave no multi-dim locality: mean spans ($mx,$my) vs global ($gx,$gy)")
  }

  // ------------------------------------------------------------------
  // Triangles
  // ------------------------------------------------------------------

  test("triangles: counts known small graphs exactly") {
    val s = spark
    import s.implicits._
    // K4 has 4 triangles; plus a disjoint path (0 triangles); plus dup
    // edges and a self-loop that must be ignored
    val k4 = for {a <- 1 to 4; b <- 1 to 4 if a < b} yield (a.toLong, b.toLong)
    val path = Seq((10L, 11L), (11L, 12L))
    val noise = Seq((1L, 2L), (2L, 1L), (7L, 7L))
    val edges = (k4 ++ path ++ noise).toDF("u", "v")
    val total = Triangles.trianglesPerApex(edges)
      .agg(sum("n_tri")).as[Long].collect().head
    assert(total == 4L)
  }

  test("triangles: apex totals equal per-vertex triangle membership / 3") {
    val s = spark
    import s.implicits._
    // random-ish deterministic graph on 30 nodes
    val edges = (for {
      a <- 1 to 30; b <- 1 to 30
      if a < b && (a * 31 + b * 17) % 5 == 0
    } yield (a.toLong, b.toLong)).toDF("u", "v")
    val apexTotal = Triangles.trianglesPerApex(edges)
      .agg(sum("n_tri")).as[Long].collect().head
    // brute-force count
    val es = edges.as[(Long, Long)].collect()
      .map { case (u, v) => (math.min(u, v), math.max(u, v)) }.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    var brute = 0L
    for {
      i <- nodes.indices; j <- i + 1 until nodes.length
      k <- j + 1 until nodes.length
      a = nodes(i); b = nodes(j); c = nodes(k)
      if es((a, b)) && es((b, c)) && es((a, c))
    } brute += 1
    assert(apexTotal == brute)
  }

  test("gr1: every apex has a positive count") {
    val rows = run("gr1_triangle_count").collect()
    assert(rows.forall(_.getLong(1) > 0))
  }

  // ------------------------------------------------------------------
  // Components.labelPropagation
  // ------------------------------------------------------------------

  test("label propagation: two cliques with one bridge settle to clique minima") {
    val s = spark
    import s.implicits._
    def clique(ids: Seq[Long]) =
      for { a <- ids; b <- ids if a < b } yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L, 5L)) ++
      clique(Seq(10L, 11L, 12L, 13L, 14L)) ++ Seq((5L, 10L))).toDF("a", "b")
    val labels = Components.labelPropagation(edges, "a", "b", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // each clique's interior converges to the clique's min id; the mode/
    // min tie-break keeps the bridge from merging the two communities
    assert(Seq(2L, 3L, 4L).forall(labels(_) == 1L))
    assert(Seq(11L, 12L, 13L, 14L).forall(labels(_) == 10L))
    assert(labels(1L) != labels(14L), "bridge merged distinct communities")
  }

  test("label propagation: deterministic min tie-break on a triangle") {
    val s = spark
    import s.implicits._
    val tri = Seq((7L, 8L), (8L, 9L), (7L, 9L)).toDF("a", "b")
    // round 1: each node sees two labels once each -> min of the two
    val labels = Components.labelPropagation(tri, "a", "b", rounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels == Map(7L -> 8L, 8L -> 7L, 9L -> 7L))
  }

  // ------------------------------------------------------------------
  // TextAnalysis.sparseCosinePairs
  // ------------------------------------------------------------------

  test("sparse cosine: identical docs score 1.0, disjoint docs never pair") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "red fox jumps over the dog"),
      (2L, "red fox jumps over the dog"),
      (3L, "entirely different words here now"),
      (4L, "red fox jumps over the cat")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.sparseCosinePairs(docs, "doc_id", "text", maxDf = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out((1L, 2L)) == 1.0)
    // 1 and 4 share shingles "red fox jumps", "fox jumps over" -> partial
    assert(out.contains((1L, 4L)) && out((1L, 4L)) > 0 && out((1L, 4L)) < 1)
    // doc 3 shares no shingle with anyone: absent from every pair
    assert(!out.keys.exists(k => k._1 == 3L || k._2 == 3L))
  }

  test("sparse cosine: df cap removes stop-shingle-only pairs") {
    val s = spark
    import s.implicits._
    // the shingle "a b c" appears in ALL four docs (df=4); with maxDf=3 it
    // is a stop term, so docs sharing ONLY it never pair
    val docs = Seq(
      (1L, "a b c x1 y1 z1"), (2L, "a b c x2 y2 z2"),
      (3L, "a b c q r t"), (4L, "a b c q r t")
    ).toDF("doc_id", "text")
    val capped = TextAnalysis.sparseCosinePairs(docs, "doc_id", "text", maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((3L, 4L)), s"got $capped")
  }
}
