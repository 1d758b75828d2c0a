package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting by degree orientation.
  *
  * Triangles on a co-occurrence graph (parts bought together, users sharing
  * sessions, documents sharing fingerprints) are the basic cohesion signal
  * behind community detection and recommendation neighborhoods. The naive
  * plan — join the edge list to itself on one endpoint, then probe the
  * closing edge — explodes on hubs: a degree-d node contributes d² wedges,
  * and real co-occurrence graphs are power-law.
  *
  * The standard MapReduce-era fix (Suri & Vassilvitskii, "Counting Triangles
  * and the Curse of the Last Reducer", WWW'11) orients every undirected edge
  * from its lower-(degree, id) endpoint to its higher one. Every node's
  * OUT-degree is then bounded by O(√E) regardless of its raw degree, so the
  * wedge join does O(E^1.5) work in the worst case and each triangle is
  * counted exactly once (at its lowest-ranked vertex). All three steps are
  * shuffles on edge endpoints — no driver state, no iteration.
  */
object Triangles {

  /** Count triangles in the undirected simple graph given by `edges`
    * (columns `u`, `v`; may contain duplicates or self-loops — both are
    * cleaned here). Returns one row per triangle apex (the lowest-ranked
    * vertex), with its triangle count; `sum(n_tri)` is the global count.
    */
  def trianglesPerApex(edges: DataFrame): DataFrame =
    triangles(edges)
      .groupBy(col("src").as("apex"))
      .agg(count(lit(1)).as("n_tri"))

  /** Triangle count per VERTEX — each triangle credited to all three
    * corners (vs once at the apex above). This is the numerator of the
    * local clustering coefficient; the only work beyond the oriented
    * wedge join is a 3-way explode whose size IS the triangle count. */
  def trianglesPerNode(edges: DataFrame): DataFrame =
    triangles(edges)
      .select(explode(array(col("src"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))

  /** One row per triangle, as (src, x, y) with src the lowest-ranked
    * (degree, id) vertex and x < y — the degree-oriented enumeration both
    * aggregations above share. */
  private def triangles(edges: DataFrame): DataFrame = {
    // canonical undirected simple edges: a < b, no loops, no dups
    val und = edges
      .selectExpr("least(u, v) AS a", "greatest(u, v) AS b")
      .filter(col("a") =!= col("b"))
      .distinct()

    // degree of every endpoint — one groupBy over the exploded endpoints
    val deg = und.selectExpr("a AS node").unionAll(und.selectExpr("b AS node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))

    // orient low → high by (degree, id); ties broken by id keep it total
    val withDeg = und
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("src"),
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("b"))
        .otherwise(col("a")).as("dst"))

    // wedges at each src: pairs of out-neighbors; the closing edge must
    // itself be oriented, and its direction among (x, y) follows the same
    // total order — join both orientations to probe it without re-deriving
    // degrees (x→y or y→x, exactly one exists if the edge does).
    val e1 = oriented.select(col("src"), col("dst").as("x"))
    val e2 = oriented.select(col("src"), col("dst").as("y"))
    val wedges = e1.join(e2, "src").filter(col("x") < col("y"))
    val closing = oriented.select(
      least(col("src"), col("dst")).as("x"),
      greatest(col("src"), col("dst")).as("y"))
    wedges.join(closing, Seq("x", "y"))
      .select("src", "x", "y")
  }
}
