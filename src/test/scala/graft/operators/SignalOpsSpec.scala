package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkEntry, TestSpark}

/** Invariants for the round-12 signal wave — weighted SSSP, HITS,
  * content-defined chunking, rolling z-scores, growth accounting, JS
  * divergence, and the compaction planner — the properties that must hold
  * at any scale, complementing the DuckDB hash grade. */
class SignalOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  // ------------------------------------------------------------------
  // Components.weightedSssp
  // ------------------------------------------------------------------

  test("weightedSssp: hand-computed distances on a known graph") {
    val s = spark
    import s.implicits._
    // 0→1 (w5), 0→2 (w1), 2→1 (w1), 1→3 (w2), 3→4 (w1)
    // shortest: d(1)=2 via 0→2→1, d(3)=4, d(4)=5
    val e = Seq((0L, 1L, 5L), (0L, 2L, 1L), (2L, 1L, 1L), (1L, 3L, 2L),
      (3L, 4L, 1L)).toDF("u", "v", "w")
    val src = Seq(0L).toDF("id")
    val d = Components.weightedSssp(e, "u", "v", "w", src, "id", maxRounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(0L -> 0L, 1L -> 2L, 2L -> 1L, 3L -> 4L, 4L -> 5L))
  }

  test("weightedSssp: more rounds never increase any distance") {
    val s = spark
    import s.implicits._
    val e = Seq((0L, 1L, 9L), (0L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
      .toDF("u", "v", "w")
    val src = Seq(0L).toDF("id")
    val d2 = Components.weightedSssp(e, "u", "v", "w", src, "id", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d4 = Components.weightedSssp(e, "u", "v", "w", src, "id", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hop-bounded: at 2 rounds the cheap 3-hop path to node 1 is invisible
    assert(d2(1L) == 9L && d4(1L) == 3L)
    d2.foreach { case (n, d) => assert(d4(n) <= d) }
    assert(d2.keySet.subsetOf(d4.keySet))
  }

  // ------------------------------------------------------------------
  // Components.hits
  // ------------------------------------------------------------------

  test("hits: star graph — the center is the unique top authority") {
    val s = spark
    import s.implicits._
    // 1..5 all point at 0; 0 points at 9 (so 0 also has hub mass)
    val e = ((1L to 5L).map(i => (i, 0L)) :+ (0L, 9L)).toDF("u", "v")
    val out = Components.hits(e, "u", "v", iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val auth = out.map(t => t._1 -> t._3).toMap
    assert(auth(0L) == auth.values.max && auth(0L) > auth(9L))
    // spokes have no in-edges: authority exactly 0
    (1L to 5L).foreach(i => assert(auth(i) == 0L))
  }

  test("hits: first-iteration authority equals in-degree") {
    val s = spark
    import s.implicits._
    val e = Seq((1L, 3L), (2L, 3L), (4L, 3L), (1L, 2L)).toDF("u", "v")
    val a = Components.hits(e, "u", "v", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a(3L) == 3L && a(2L) == 1L && a(1L) == 0L && a(4L) == 0L)
  }

  // ------------------------------------------------------------------
  // Components.personalizedPageRank
  // ------------------------------------------------------------------

  test("personalizedPageRank: mass flows only out of the seed set; unreachable nodes stay 0") {
    val s = spark
    import s.implicits._
    // 0→1→2 with seed {0}; node 9 isolated (no in/out edges to the seed)
    val e = Seq((0L, 1L), (1L, 2L), (9L, 8L)).toDF("u", "v")
    val nodes = Seq(0L, 1L, 2L, 8L, 9L).toDF("id")
    val seeds = Seq(0L).toDF("id")
    val r = Components.personalizedPageRank(e, "u", "v", nodes, "id",
      seeds, "id", iters = 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // hand-rolled: r0=(1,0,0); r1=(0.15, 0.85, 0); r2=(0.15, 0.1275, 0.7225)
    assert(math.abs(r(0L) - 0.15) < 1e-12)
    assert(math.abs(r(1L) - 0.85 * 0.15) < 1e-12)
    assert(math.abs(r(2L) - 0.85 * 0.85) < 1e-12)
    assert(r(8L) == 0.0 && r(9L) == 0.0,
      "nodes unreachable from the seed set must score exactly 0")
  }

  // ------------------------------------------------------------------
  // Chunking.cdcChunks
  // ------------------------------------------------------------------

  test("cdcChunks: chunks tile the document exactly") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "The quick brown fox jumps over the lazy dog. " * 8),
      (2L, "abc"), (3L, "x" * 7)).toDF("doc_id", "text")
    val ch = Chunking.cdcChunks(docs, "doc_id", "text")
      .groupBy("doc_id").agg(sum("chunk_len").as("tot"),
        count(lit(1)).as("k"), min(col("chunk_len")).cast("long").as("mn"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(ch(1L)._1 == 45L * 8) // lengths sum to the doc length
    assert(ch(2L) == ((3L, 1L, 3L))) // below-window doc = one chunk
    assert(ch(3L)._1 == 7L)
    ch.values.foreach { case (_, _, mn) => assert(mn >= 1L) }
  }

  // deterministic high-entropy text: a template corpus can miss the 1/64
  // boundary mask entirely by repetition (few distinct 4-char windows)
  private def entropyText(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  }

  test("cdcChunks: boundaries are content-local — a prefix edit leaves the shared tail chunked identically") {
    val s = spark
    import s.implicits._
    val base = entropyText(42, 1500)
    val docs = Seq((1L, base), (2L, "EDITED-PREFIX " + base))
      .toDF("doc_id", "text")
    val ch = Chunking.cdcChunks(docs, "doc_id", "text")
      .select("doc_id", "chunk_hash").collect()
      .groupBy(_.getLong(0)).map { case (k, v) =>
        // r15: chunk_hash is a two-seed 128-bit struct<h1, h2>
        k -> v.map { r =>
          val h = r.getStruct(1); (h.getLong(0), h.getLong(1)) }.toSeq }
    val h1 = ch(1L); val h2 = ch(2L)
    // the edit shifts at most the first chunk's content: everything after
    // the first boundary of the ORIGINAL doc re-synchronizes, so the two
    // docs share all chunk hashes except a bounded prefix
    assert(h1.size > 5, s"fixture too coarse: ${h1.size} chunks")
    assert(h1.last == h2.last)
    val shared = h1.toSet.intersect(h2.toSet).size
    assert(shared >= h1.size - 2,
      s"only $shared of ${h1.size} chunks survived a prefix edit")
  }

  test("cdcChunks: fixed-width blocking loses alignment where CDC keeps it") {
    val s = spark
    import s.implicits._
    val base = entropyText(42, 1500)
    val docs = Seq((1L, base), (2L, "EDITED-PREFIX " + base))
      .toDF("doc_id", "text")
    // fixed 64-char blocks: ONE char of insertion desynchronizes every
    // later block — the motivating contrast for CDC
    val fixed = docs.select(col("doc_id"),
        posexplode(expr(
          """transform(sequence(1, length(text), 64),
               i -> md5(substring(text, i, 64)))""")).as(Seq("i", "h")))
      .select("doc_id", "h").collect()
      .groupBy(_.getLong(0)).map { case (k, v) =>
        k -> v.map(_.getString(1)).toSet }
    val sharedFixed = fixed(1L).intersect(fixed(2L)).size
    assert(sharedFixed <= 1, s"fixed blocking unexpectedly aligned: $sharedFixed")
  }

  // ------------------------------------------------------------------
  // registry-level invariants (sf0.001 fixtures)
  // ------------------------------------------------------------------

  test("ts8: z-scores only where a full 7-day history exists; anomalies imply |z| > 2") {
    val rows = run("ts8_rolling_zscore").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z = Option(r.getAs[java.lang.Double]("z"))
      val anom = r.getAs[Boolean]("is_anomaly")
      if (anom) assert(z.exists(v => math.abs(v) > 2.0))
    }
  }

  test("w12: active = new + returning, and cum_users ends at total distinct users") {
    val rows = run("w12_growth_accounting").orderBy("day").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") ==
        r.getAs[Long]("n_new") + r.getAs[Long]("n_returning"))
    }
    val total = graft.queries.Tables.t(spark, dir, "events")
      .select(countDistinct("user_id")).head().getLong(0)
    assert(rows.last.getAs[Long]("cum_users") == total)
  }

  test("cs21: JSD is within [0, ln 2] for every source") {
    run("cs21_source_jsd").collect().foreach { r =>
      val j = r.getAs[Double]("jsd")
      assert(j >= -1e-9 && j <= math.log(2.0) + 1e-9, s"jsd out of band: $j")
    }
  }

  test("k16: plan groups partition the files and respect id order") {
    val rows = run("k16_compaction_plan").collect()
    val nFiles = rows.map(_.getAs[Long]("n_files")).sum
    val nDocs = graft.queries.Tables.t(spark, dir, "documents").count()
    assert(nFiles == nDocs)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getAs[Long]("grp"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
        case _ =>
      }
    }
  }
}
