package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sharded inverted index over the whitespace-token vocabulary: for each
  * term with corpus document frequency ≥ minDf, the posting list of doc
  * ids, stored at (term, doc-range shard) grain.
  *
  * Scale design: the shard key caps every output row at `shardSize`
  * postings, so a stop-word-grade hot term becomes many bounded rows
  * instead of one unboundedly long list — the classic skew killer for
  * collect_list-style index builds; a term lookup is still one term-key
  * scan. The df gate is a window sum over the term's shard rows (one hash
  * shuffle on the term key, no second corpus scan).
  */
object Indexing {

  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    minDf: Long = 5, shardSize: Long = 100): DataFrame = {
    val posting = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(Dedup.tokens(col(textCol))).as("term"))
      .distinct()
      .withColumn("shard", expr(s"doc_id div $shardSize"))
    posting.groupBy("term", "shard")
      .agg(count(lit(1)).as("n_docs"),
        array_join(transform(array_sort(collect_list(col("doc_id"))),
          _.cast("string")), ",").as("postings"))
      .withColumn("df", sum(col("n_docs")).over(Window.partitionBy("term")))
      .filter(col("df") >= minDf)
      .select("term", "shard", "df", "n_docs", "postings")
  }

  /** Positional-index phrase search — the serve path [[invertedIndex]]'s
    * structure promises: (term, doc, pos) postings, each phrase word's
    * posting list filtered out scan-side (the selective index access),
    * then consecutive positions intersected by equi-join on
    * (doc, pos − offset). Shuffle is ∝ the matched postings, never the
    * corpus. Returns (doc_id, n_hits) per document containing the
    * phrase. */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "a 1-word phrase is a plain posting lookup")
    val pos = docs.select(col(idCol).cast("long").as("doc_id"),
      posexplode(Dedup.tokens(col(textCol))).as(Seq("pos", "term")))
    val first = pos.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val matched = phrase.zipWithIndex.tail.foldLeft(first) {
      case (acc, (w, i)) =>
        acc.join(pos.filter(col("term") === w)
          .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
    }
    matched.groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }
}
