package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window shaping for LLM training data: fixed-size token chunks
  * with overlap, and GPT-style sequence packing (concatenate the corpus in
  * id order, cut every `capacity` tokens).
  */
object Chunking {

  /** Overlapping fixed-size token chunks per document. Chunks start every
    * `size - overlap` tokens (1-based); the last chunk may be short. Pure
    * per-row array arithmetic — the token array is materialized once per
    * document and sliced per chunk, no shuffle at all until a consumer
    * adds one.
    */
  def tokenChunks(docs: DataFrame, idCol: String, textCol: String,
                  size: Int = 64, overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && overlap < size, "need 0 <= overlap < size")
    val stride = size - overlap
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w"))
      .select(col("doc_id"), col("w"),
        posexplode(sequence(lit(1), greatest(org.apache.spark.sql.functions
          .size(col("w")), lit(1)), lit(stride))).as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("chunk_idx"),
        org.apache.spark.sql.functions.size(
          slice(col("w"), col("start"), lit(size))).as("n_tokens"),
        concat_ws(" ", slice(col("w"), col("start"), lit(size)))
          .as("chunk_text"))
  }

  /** Sequence packing, concat-and-cut: lay the corpus out as one token
    * stream in `doc_id` order and cut a pack every `capacity` tokens. Each
    * document gets its global token `start_off`, its `pack_id`
    * (the context window its first token lands in), and whether it spans a
    * pack boundary (would be truncated or split by the trainer).
    *
    * Scale design: the global exclusive prefix sum is computed in two
    * levels, like a GPU scan — a within-shard running sum (window
    * partitioned by an order-preserving `doc_id` range shard), plus an
    * exclusive prefix over the per-shard totals. Only the shard-total list
    * (corpus / shardSize rows, bounded) passes through a single-partition
    * window and a broadcast; document rows never leave their hash
    * partitions. A naive `Window.orderBy(doc_id)` with no partition would
    * drag the whole corpus through one task — the exact single-node
    * bottleneck this layout avoids. ChunkingSpec proves the result is
    * shard-size invariant.
    */
  def packAssignments(docs: DataFrame, idCol: String, textCol: String,
                      capacity: Long = 2048, shardSize: Long = 4096)
      : DataFrame = {
    require(capacity > 0 && shardSize > 0)
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      org.apache.spark.sql.functions.size(split(col(textCol), " "))
        .cast("long").as("n_tokens"))
      .withColumn("shard", expr(s"doc_id div $shardSize"))
    val inShard = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = base.withColumn("local_off",
      coalesce(sum(col("n_tokens")).over(inShard), lit(0L)))
    val overShards = Window.orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val shardOffs = base.groupBy("shard").agg(sum("n_tokens").as("tot"))
      .withColumn("shard_off", coalesce(sum(col("tot")).over(overShards),
        lit(0L)))
      .select("shard", "shard_off")
    local.join(broadcast(shardOffs), "shard")
      .withColumn("start_off", col("local_off") + col("shard_off"))
      .withColumn("pack_id", expr(s"start_off div $capacity"))
      .withColumn("spans_boundary",
        expr(s"start_off div $capacity") =!=
          expr(s"(start_off + n_tokens - 1) div $capacity"))
      .select("doc_id", "n_tokens", "start_off", "pack_id", "spans_boundary")
  }
}
