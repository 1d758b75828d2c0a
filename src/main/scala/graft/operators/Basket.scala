package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules: for every pair of items that co-occur
  * in enough baskets, the classic support / confidence / lift triple — the
  * co-purchase, co-click, and related-document primitive.
  *
  * Scale design: pair generation is the quadratic hazard (a basket of k
  * items emits k·(k−1)/2 pairs), so two guards run BEFORE the self-join:
  *   1. a frequent-item gate (`minItemCount`) — Apriori's first level:
  *      a pair can only be frequent if both items are, so infrequent items
  *      are dropped from the pair join entirely;
  *   2. an oversized-basket cap (`maxBasketSize`) — a degenerate hot basket
  *      (a crawler session touching 100k items) would alone emit 5·10⁹
  *      pairs; such baskets are statistically meaningless for rules and are
  *      dropped, bounding per-basket work at maxBasketSize².
  * The pair join itself is an equi-join on the basket id (shuffle keyed on
  * basket), the item-count joins are dim-sized, and the basket total is a
  * 1-row broadcast — no all-pairs stage anywhere.
  */
object Basket {

  /** `items`: one row per (basket, item) occurrence (duplicates collapse).
    * Returns one row per ordered pair `p1 < p2` with `co >= minPairCount`:
    * (p1, p2, co, c1, c2, confidence = co/c1, lift = co·N/(c1·c2)), where
    * N is the number of distinct baskets surviving the size cap. */
  def associationRules(items: DataFrame, basketCol: String, itemCol: String,
                       minItemCount: Long, minPairCount: Long,
                       maxBasketSize: Int = 1000): DataFrame = {
    val b = items
      .select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .filter(col("basket").isNotNull && col("item").isNotNull)
      .distinct()
    val sized = b
      .withColumn("__bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("basket")))
      .filter(col("__bsz") <= maxBasketSize)
      .drop("__bsz")
      .localCheckpoint(eager = false) // feeds N, item counts, and the pair join
    val nBaskets = sized.select(countDistinct(col("basket")).as("n_baskets"))
    val itemCounts = sized.groupBy("item").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minItemCount)
    val frequent = sized.join(itemCounts, "item")
      .select(col("basket"), col("item"), col("cnt"))
    val l = frequent.select(col("basket"), col("item").as("p1"),
      col("cnt").as("c1"))
    val r = frequent.select(col("basket"), col("item").as("p2"),
      col("cnt").as("c2"))
    l.join(r, Seq("basket")).filter(col("p1") < col("p2"))
      .groupBy("p1", "p2", "c1", "c2").agg(count(lit(1)).as("co"))
      .filter(col("co") >= minPairCount)
      .crossJoin(broadcast(nBaskets))
      .select(col("p1"), col("p2"), col("co"), col("c1"), col("c2"),
        round(col("co") / col("c1"), 4).as("confidence"),
        round((col("co") * col("n_baskets")) / (col("c1") * col("c2")), 4)
          .as("lift"))
  }
}
