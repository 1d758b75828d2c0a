package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter-accelerated incremental dedup: membership pre-filter
  * against a historical corpus, with an exact confirm join only for the
  * maybe-present minority.
  *
  * The batch-vs-store shape (reference behavior: the PK dedup-append of
  * `load-estimates.rkt` rewritten for corpus scale): a new batch must be
  * checked against an already-loaded store. A plain anti-join shuffles the
  * whole store every batch; the bloom path aggregates the store ONCE into a
  * fixed-size bitset, broadcasts it, and lets the overwhelmingly-new batch
  * rows skip the join entirely — only rows the filter flags as
  * maybe-present (true dups + the FP fraction) pay the exact join.
  *
  * No false negatives by construction, so composing with the exact confirm
  * yields EXACTLY the anti-join answer — which is what the DuckDB oracle
  * grades; the bloom never changes the result, only the bytes joined.
  *
  * Scale: bits are built with a depth-2 `treeAggregate` (log-depth OR-merge,
  * no single-reducer bitset funnel). One filter sized m bits for n store
  * keys gives FP ≈ (1-e^(-kn/m))^k; at 100 TB a single global filter is
  * replaced by hash-partitioned per-shard filters (same code per shard,
  * bitset keyed by `pmod(key, shards)`) so each stays under executor
  * memory — documented in SCALE.md.
  */
object BloomDedup {

  /** Double hashing (Kirsch–Mitzenmacher): position_i = h1 + i*h2 over the
    * key's two xxhash64 derivations — k probe positions from 2 hashes. */
  private[operators] def positions(key: Long, numHashes: Int,
      numBits: Long): Array[Long] = {
    // splitmix64-style finalizers make h1/h2 independent enough of each
    // other for double hashing even on adjacent keys
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5851f42d4c957f2dL) | 1L // odd → full-period stride
    Array.tabulate(numHashes) { i =>
      java.lang.Math.floorMod(h1 + i.toLong * h2, numBits)
    }
  }

  /** Build the bitset over a Long key column. Depth-2 treeAggregate: the
    * per-partition bitsets OR-merge in a shuffle layer before the driver
    * sees log(P) of them, so the driver never funnels P full bitsets. */
  def buildBits(df: DataFrame, keyCol: Column, numBits: Int,
      numHashes: Int): Array[Long] = {
    require(numBits % 64 == 0, "numBits must be a multiple of 64")
    val words = numBits / 64
    val keys = df.select(keyCol.cast("long")).na.drop()
      .rdd.map(_.getLong(0))
    keys.treeAggregate(new Array[Long](words))(
      seqOp = (bits, key) => {
        positions(key, numHashes, numBits.toLong).foreach { p =>
          bits((p >>> 6).toInt) |= (1L << (p & 63)); ()
        }
        bits
      },
      combOp = (a, b) => {
        var i = 0
        while (i < a.length) { a(i) |= b(i); i += 1 }
        a
      },
      depth = 2)
  }

  /** The membership probe over a broadcast bitset. Exposed for specs. */
  private[operators] def mightContain(bits: Array[Long], numHashes: Int,
      key: Long): Boolean = {
    val numBits = bits.length.toLong * 64L
    positions(key, numHashes, numBits).forall { p =>
      (bits((p >>> 6).toInt) & (1L << (p & 63))) != 0L
    }
  }

  /** Flag each batch row as new-vs-duplicate against the store, exactly.
    *
    * `keyOf` must be a deterministic Column over the row (e.g. an md5
    * prefix of the normalized text parsed as a long). Output:
    * batch ++ (`maybe` — the bloom's verdict, kept for audit) ++
    * (`is_new` — the EXACT verdict after the confirm join).
    *
    * The confirm join's left side is only the maybe-present rows; with a
    * well-sized filter that is |dups| + FP·|batch| rows, not |batch|. */
  def flagNew(store: DataFrame, batch: DataFrame, keyOf: Column,
      numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    val spark = batch.sparkSession
    val bits = buildBits(store, keyOf, numBits, numHashes)
    // broadcast handle, not the array itself, inside the closure: executors
    // read the torrent-distributed copy, never a serialized literal bitset
    val bcast = spark.sparkContext.broadcast(bits)
    val k = numHashes
    val probe = udf((key: Long) => mightContain(bcast.value, k, key))

    val keyed = batch.withColumn("__key", keyOf.cast("long"))
      .withColumn("maybe", probe(col("__key")))
    val storeKeys = store.select(keyOf.cast("long").as("__key")).distinct()
      .withColumn("__hit", lit(1))
    // definitely-new fast path: !maybe rows never reach the join
    val fresh = keyed.filter(!col("maybe")).withColumn("is_new", lit(true))
    val checked = keyed.filter(col("maybe"))
      .join(storeKeys, Seq("__key"), "left")
      .withColumn("is_new", col("__hit").isNull)
      .drop("__hit")
    fresh.unionByName(checked).drop("__key")
  }
}
