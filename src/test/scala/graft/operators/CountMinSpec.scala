package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Count-min sketch laws: never undercounts (for EVERY word, not just the
  * audited heavy hitters), merges by elementwise sum across corpus splits,
  * and is partition-layout invariant. */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs =
    graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "documents")

  test("estimate >= true count for every word in the corpus") {
    val words = docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("true_cnt"))
    val cells = CountMin.sketchCells(docs, "text", d = 4, width = 512)
    val est = words
      .select(col("word"), col("true_cnt"),
        posexplode(array((0 until 4).map(j =>
          CountMin.bucket(col("word"), j, 512)): _*)).as(Seq("j", "bucket")))
      .join(broadcast(cells), Seq("j", "bucket"))
      .groupBy("word", "true_cnt").agg(min("cell_count").as("est_cnt"))
    val under = est.filter(col("est_cnt") < col("true_cnt")).count()
    assert(under == 0L, "CMS must never undercount")
  }

  test("sketch of the union is the elementwise sum of the halves") {
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val whole = CountMin.sketchCells(docs, "text").orderBy("j", "bucket")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val merged = CountMin.sketchCells(a, "text")
      .unionAll(CountMin.sketchCells(b, "text"))
      .groupBy("j", "bucket").agg(sum("cell_count").as("cell_count"))
      .orderBy("j", "bucket")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(whole.sameElements(merged))
  }

  test("heavy-hitter audit is layout invariant and overcount-nonnegative") {
    val one = CountMin.heavyHitterAudit(docs.coalesce(1), "text")
      .orderBy("word").collect().map(_.toSeq).toSeq
    val many = CountMin.heavyHitterAudit(docs.repartition(7), "text")
      .orderBy("word").collect().map(_.toSeq).toSeq
    assert(one == many)
    assert(one.nonEmpty && one.forall(r =>
      r(3).asInstanceOf[Long] >= 0L))
  }
}
