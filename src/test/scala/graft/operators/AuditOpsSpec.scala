package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Laws for the round-8 audit/curation operators, beyond their oracle
  * grades: identities that must hold on ANY corpus (reassembly identity,
  * canonicalization idempotence, zero-error self-coding, non-negative
  * divergence, filter containment, exact-recall degenerate cases). */
class AuditOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = graft.queries.Tables.t(spark, dir, "embeddings")

  test("segmentDedup: unique corpus reassembles to the original text") {
    // all tokens globally unique -> nothing drops, and clean_md5 must be
    // md5(original): the reassembly order and separators are the identity
    val docs = Seq(
      (1L, (1 to 45).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 7).map(i => s"b$i").mkString(" ")),
      (3L, "c1")).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, "doc_id", "text", segTokens = 20)
      .join(docs.select(col("doc_id"),
        md5(col("text").cast("binary")).as("orig_md5")), "doc_id")
      .collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("kept_segs") == r.getAs[Int]("n_segs").toLong)
      assert(r.getAs[String]("clean_md5") == r.getAs[String]("orig_md5"))
    }
  }

  test("segmentDedup: an exact-duplicate doc loses every segment") {
    val txt = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, txt), (2L, txt)).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, "doc_id", "text", segTokens = 20)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("kept_segs") == 2L)
    assert(out(2L).getAs[Long]("kept_segs") == 0L)
    val emptyMd5 = spark.sql("SELECT md5(CAST('' AS BINARY))").head.getString(0)
    assert(out(2L).getAs[String]("clean_md5") == emptyMd5)
  }

  test("canonicalizeUrl: normalizes and is idempotent") {
    val urls = Seq(
      "HTTPS://WWW.Ex.COM/a/b/?utm_source=x&z=1&a=2#frag",
      "https://ex.com/a/b?a=2&z=1",
      "http://ex.com/",
      "https://ex.com/p?utm_a=1&utm_b=2")
      .toDF("url")
    val once = urls.select(TextAnalysis.canonicalizeUrl(col("url")).as("c"))
    val got = once.as[String].collect().toSeq
    assert(got == Seq(
      "https://ex.com/a/b?a=2&z=1",
      "https://ex.com/a/b?a=2&z=1", // already-canonical form is a fixpoint
      "http://ex.com",
      "https://ex.com/p"))
    val twice = once.select(TextAnalysis.canonicalizeUrl(col("c")).as("c"))
      .as[String].collect().toSeq
    assert(twice == got, "canonicalization must be idempotent")
  }

  test("productQuantizationError: codebook vectors code themselves exactly") {
    val out = Similarity.productQuantizationError(emb, "vec_id", "embedding",
      subspaces = 8, ncodes = 8)
      .filter(col("vec_id") < 8).collect()
    assert(out.length == 8)
    out.foreach { r =>
      assert(r.getAs[Double]("mse_e6") == 0.0,
        s"vec ${r.getLong(0)} should reconstruct exactly")
      assert(r.getAs[String]("code") ==
        Array.fill(8)(r.getLong(0).toString).mkString(","))
    }
  }

  test("filteredBucketedTopK: results honor the filter and the ordering") {
    val res = Similarity.filteredBucketedTopK(emb, "vec_id", "embedding",
      queryId = 0L, k = 10, pred = col("label") === 3)
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
      .orderBy(col("score").desc, col("vec_id"))
      .collect()
    assert(res.nonEmpty)
    assert(res.forall(_.getAs[Int]("label") == 3))
    val scores = res.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("annRecallAtK: ivf with a single cell degenerates to exact recall") {
    // nlist=1 -> every vector in the query's (only) cell -> ivf IS brute
    // force and its recall must be exactly 1.0
    val r = Similarity.annRecallAtK(emb, "vec_id", "embedding",
      nQueries = 5, k = 5, bits = 4, nlist = 1)
      .collect().map(x => x.getString(0) -> x.getAs[Double]("recall_at_k"))
      .toMap
    assert(r("ivf") == 1.0, s"got $r")
  }

  test("segmentDedup matches a brute-force reference on random corpora") {
    // reference: global keep-first over (doc, seg_idx)-ordered segments
    def brute(docs: Seq[(Long, String)], segTokens: Int)
        : Map[Long, (Int, Long, String)] = {
      val segs = docs.sortBy(_._1).flatMap { case (id, text) =>
        val w = text.split(" ", -1)
        val n = math.max(math.ceil(w.length / segTokens.toDouble).toInt, 1)
        (0 until n).map(i =>
          (id, i, w.slice(i * segTokens, (i + 1) * segTokens).mkString(" ")))
      }
      val seen = scala.collection.mutable.Set[String]()
      val kept = segs.filter { case (_, _, s) => seen.add(s) }
      docs.map { case (id, text) =>
        val w = text.split(" ", -1)
        val n = math.max(math.ceil(w.length / segTokens.toDouble).toInt, 1)
        val mine = kept.filter(_._1 == id).sortBy(_._2)
        id -> ((n, mine.size.toLong, mine.map(_._3).mkString(" ")))
      }.toMap
    }
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      // small vocab + short docs force heavy cross-doc segment collisions
      val corpus = (0L until 30L).map { id =>
        val len = 1 + rnd.nextInt(12)
        id -> Seq.fill(len)(s"t${rnd.nextInt(4)}").mkString(" ")
      }
      val exp = brute(corpus, segTokens = 3)
      val got = Dedup.segmentDedup(corpus.toDF("doc_id", "text"),
        "doc_id", "text", segTokens = 3).collect()
        .map(r => r.getLong(0) ->
          ((r.getInt(1), r.getLong(2), r.getString(3)))).toMap
      assert(got.keySet == exp.keySet, s"trial $trial")
      got.foreach { case (id, (n, k, md5got)) =>
        val (en, ek, etext) = exp(id)
        assert((n, k) == ((en, ek)), s"trial $trial doc $id counts")
        val emd5 = java.security.MessageDigest.getInstance("MD5")
          .digest(etext.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(md5got == emd5, s"trial $trial doc $id reassembly")
      }
    }
  }

  test("canonicalizeUrl: param order and tracking junk never split a group") {
    // same logical URL under shuffled params / added utm junk / case noise
    // must canonicalize identically
    val variants = Seq(
      "https://ex.com/p?a=1&b=2",
      "HTTPS://ex.com/p?b=2&a=1",
      "https://WWW.ex.com/p?b=2&utm_x=9&a=1#f",
      "https://ex.com/p/?utm_y=0&a=1&b=2").toDF("url")
    val canon = variants
      .select(TextAnalysis.canonicalizeUrl(col("url")).as("c"))
      .distinct().as[String].collect().toSeq
    assert(canon == Seq("https://ex.com/p?a=1&b=2"))
  }

  test("ivfPqTopK: the query self-codes to asymmetric distance zero") {
    // vec 0 is both the query and a codebook vector: its PQ reconstruction
    // is exact, so its ADC distance to itself must be exactly 0 and it must
    // rank first in its own cell
    val top = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      queryId = 0L, k = 10).collect()
    assert(top.head.getLong(0) == 0L)
    assert(top.head.getAs[Double]("adc_dist") == 0.0)
    val dists = top.map(_.getAs[Double]("adc_dist")).toSeq
    assert(dists == dists.sorted, "ADC ranking must be ascending")
  }

  test("sourceDriftPsi: PSI is non-negative, zero for a single source") {
    // (p-q)·ln(p/q) >= 0 termwise, so every PSI is >= 0 on any corpus
    val docs = graft.queries.Tables.t(spark, dir, "documents")
    val psi = TextAnalysis.sourceDriftPsi(docs, "source", "text")
      .collect().map(_.getAs[Double]("psi"))
    assert(psi.nonEmpty && psi.forall(_ >= 0.0))
    // a lone source IS the corpus: p == q in every bin, PSI exactly 0
    val lone = TextAnalysis.sourceDriftPsi(
      docs.withColumn("source", lit("only")), "source", "text")
      .collect()
    assert(lone.length == 1 && lone.head.getAs[Double]("psi") == 0.0)
  }

  test("binaryRerankRecall: re-ranking the whole corpus IS brute force") {
    // rerank >= corpus size -> the coarse stage prunes nothing and the
    // exact re-rank reproduces the truth arm: recall exactly 1.0
    val out = Similarity.binaryRerankRecallAtK(emb, "vec_id", "embedding",
      nQueries = 5, k = 5, rerank = 500)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("recall_at_k"))
      .toMap
    assert(out("binary_rerank") == 1.0)
  }

  test("binaryRerankRecall: exact re-rank never loses to raw Hamming") {
    // the Hamming top-k is a subset of the re-rank candidate set, and the
    // re-rank keeps every candidate that belongs to the true top-k (their
    // exact scores dominate all non-members), so hits can only go up
    val out = Similarity.binaryRerankRecallAtK(emb, "vec_id", "embedding",
      nQueries = 10, k = 10, rerank = 40)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("hits")).toMap
    assert(out("binary_rerank") >= out("binary_hamming"))
  }
}
