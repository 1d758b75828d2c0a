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
}
