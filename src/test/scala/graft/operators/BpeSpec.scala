package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Byte-level BPE: the replace-chain merge application must equal a direct
  * JVM greedy reference (including adversarial repeated-byte runs at the
  * MergePasses bound), training must be deterministic across layouts, and
  * tokenization must be a lossless partition of the word's bytes. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Direct greedy reference: one left-to-right pass merging (l, r) — the
    * fixpoint for a single rule, since a merge of (l, r) cannot create a
    * new (l, r) adjacency (lr ≠ l and lr ≠ r for non-empty symbols). */
  private def refApply(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def sparkApply(syms: Vector[String], l: String, r: String): Vector[String] = {
    val s = syms.mkString(" ", " ", " ")
    val got = Seq(s).toDF("s")
      .select(BpeTokenizer.applyMerge(col("s"), l, r).as("s"))
      .head().getString(0)
    got.trim.split(" ").toVector.filter(_.nonEmpty)
  }

  test("lookahead merge application equals the greedy JVM reference") {
    // 300 seeded-random cases in ONE Spark pass: per-row (l, r) via the
    // Column form of the same lookahead pattern, plus the literal-form
    // applyMerge on a sample. The alphabet forces l = r collisions and
    // merged-symbol near-misses ("6161" vs adjacent " 61 61 ").
    val rnd = new scala.util.Random(42)
    val alpha = Vector("61", "62", "63", "6161", "6162")
    val cases = Vector.fill(300) {
      val w = Vector.fill(1 + rnd.nextInt(24))(alpha(rnd.nextInt(alpha.size)))
      (w.mkString(" ", " ", " "), alpha(rnd.nextInt(alpha.size)),
        alpha(rnd.nextInt(alpha.size)), w)
    }
    val df = cases.map { case (s, l, r, _) => (s, l, r) }.toDF("s", "l", "r")
    val applied = regexp_replace(col("s"),
      concat(lit(" "), col("l"), lit(" "), col("r"), lit("(?= )")),
      concat(lit(" "), col("l"), col("r")))
    val got = df.select(applied.as("out")).collect().map(_.getString(0))
    cases.zip(got).foreach { case ((_, l, r, w), out) =>
      val gotSyms = out.trim.split(" ").toVector.filter(_.nonEmpty)
      assert(gotSyms == refApply(w, l, r), s"word $w merge ($l,$r)")
    }
    cases.take(5).foreach { case (_, l, r, w) =>
      assert(sparkApply(w, l, r) == refApply(w, l, r))
    }
  }

  test("adversarial repeated-byte run pairs greedily from the left") {
    // 301 identical symbols: every adjacent pair is a boundary-sharing
    // match — canonical BPE pairs them (1,2),(3,4),… leaving one tail
    // symbol; the naive " l r "→" lr " replace chain gets this WRONG
    // (it pairs (1,2),(4,5),…), which is why applyMerge uses the
    // lookahead form.
    val w = Vector.fill(301)("41")
    assert(sparkApply(w, "41", "41") == refApply(w, "41", "41"))
    assert(sparkApply(w, "41", "41") ==
      Vector.fill(150)("4141") :+ "41")
  }

  test("training on a hand corpus finds the hand-computed merges") {
    // "ab ab b": pairs weighted by word count — ab appears twice.
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val m = BpeTokenizer.trainMerges(docs, "text", ranks = 1).collect()
    assert(m.length == 1)
    // word table: "ab"×2 => pair (61, 62) count 2; no other pair.
    assert(m(0).getString(1) == "61" && m(0).getString(2) == "62")
    assert(m(0).getString(3) == "6162" && m(0).getLong(4) == 2L)
  }

  test("trained merge table is partition-layout invariant") {
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val a = BpeTokenizer.trainMerges(docs.coalesce(1), "text", 4)
      .orderBy("merge_rank").collect().map(_.toSeq).toSeq
    val b = BpeTokenizer.trainMerges(docs.repartition(7), "text", 4)
      .orderBy("merge_rank").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("tokenization is a lossless partition of each word's bytes") {
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val merges = BpeTokenizer.trainMerges(docs, "text", 4)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // Rebuild each word's hex from its tokens: concatenating the symbol
    // strings (spaces stripped) must equal hex(word bytes) — merges only
    // regroup the byte stream, never alter it.
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct()
    val applied = words.select(col("w"),
      merges.foldLeft(BpeTokenizer.symbolize(col("w"))) {
        case (acc, (l, r)) => BpeTokenizer.applyMerge(acc, l, r)
      }.as("s"))
    val bad = applied
      .filter(replace(col("s"), lit(" "), lit("")) =!= hex(encode(col("w"), "UTF-8")))
      .count()
    assert(bad == 0L)
  }

  test("batched trainer at batch=1 equals the sequential trainer") {
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val seq = BpeTokenizer.trainMerges(docs, "text", 4)
      .orderBy("merge_rank").collect().map(_.toSeq).toSeq
    val bat = BpeTokenizer.trainMergesBatched(docs, "text", 4, batch = 1)
      .orderBy("merge_rank").collect().map(_.toSeq).toSeq
    assert(bat == seq, "a 1-wide batch IS sequential training")
  }

  test("batched picks are symbol-disjoint within each pass") {
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val m = BpeTokenizer.trainMergesBatched(docs, "text", ranks = 6, batch = 2)
      .orderBy("merge_rank").collect()
    assert(m.length == 6)
    m.grouped(2).zipWithIndex.foreach { case (pass, i) =>
      val syms = pass.flatMap(r => Seq(r.getString(1), r.getString(2)))
      assert(syms.distinct.length == syms.length,
        s"pass $i shares a symbol across its batch: ${syms.mkString(",")}")
    }
    // ranks are still 1..6 in order and counts are positive evidence
    assert(m.map(_.getInt(0)).toSeq == (1 to 6))
    assert(m.forall(_.getLong(4) > 0))
  }

  test("batched trainer enforces the driver-round-trip cap") {
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      BpeTokenizer.trainMergesBatched(docs, "text",
        ranks = BpeTokenizer.MaxDriverLoopRanks * 2 + 2, batch = 1)
    }
    intercept[IllegalArgumentException] {
      BpeTokenizer.trainMerges(docs, "text",
        ranks = BpeTokenizer.MaxDriverLoopRanks + 1)
    }
  }

  test("tokenizeDigest counts shrink once merges apply") {
    val docs = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val merges = BpeTokenizer.trainMerges(docs, "text", 4)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val none = BpeTokenizer.tokenizeDigest(docs, "doc_id", "text", Seq.empty)
      .agg(sum("n_tokens")).head().getLong(0)
    val four = BpeTokenizer.tokenizeDigest(docs, "doc_id", "text", merges)
      .agg(sum("n_tokens")).head().getLong(0)
    assert(four < none, s"merged $four vs raw $none")
  }
}
