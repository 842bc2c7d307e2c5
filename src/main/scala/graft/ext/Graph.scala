package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph statistics over similarity-pair edge lists (the near-dup
  * graph the X2 tier produces). Extracted from the round-12 inline
  * form so the exact and LSH-fed triangle queries share one kernel.
  */
object Graph {

  /** One-row (n_edges, n_wedges, n_triangles) summary of an undirected
    * edge list (`id_a` < `id_b`, one row per edge).
    *
    * Triangle counting uses the DEGREE-ORDERED orientation: every edge
    * points from its lower-degree endpoint (ties by id), making the
    * edge relation a DAG where each triangle appears as exactly one
    * wedge at its minimum-degree apex plus one closing edge. That
    * orientation is the standard distributed-triangle trick — per-node
    * out-degree is O(√m), so the wedge self-join does O(m^{3/2}) work
    * instead of Σdeg² (a hub's quadratic wedge blow-up lands on the
    * node that can least afford it otherwise). All equi-joins: wedges
    * shuffle on the apex, closure on the (u,v) pair.
    */
  def triangleStats(pairsIn: DataFrame): DataFrame = {
    // three consumers (degrees, wedges via two edge copies, closure) —
    // cache so an expensive edge generator runs once
    val pairs = graft.core.CacheScope.cached(pairsIn.select("id_a", "id_b"))
    val deg = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val orientAB = // lower-degree endpoint first, id as tie-break
      col("da") < col("db") || (col("da") === col("db") && col("id_a") < col("id_b"))
    val e = pairs
      .join(deg.select(col("id").as("id_a"), col("deg").as("da")), "id_a")
      .join(deg.select(col("id").as("id_b"), col("deg").as("db")), "id_b")
      .select(when(orientAB, col("id_a")).otherwise(col("id_b")).as("src"),
        when(orientAB, col("id_b")).otherwise(col("id_a")).as("dst"))
    val wedges = e.select(col("src"), col("dst").as("u"))
      .join(e.select(col("src"), col("dst").as("v")), "src")
      .filter(col("u") < col("v"))
    val triangles = wedges.join(pairs,
      col("u") === col("id_a") && col("v") === col("id_b"))
    pairs.agg(count(lit(1)).as("n_edges"))
      .join(deg.agg(sum((col("deg") * (col("deg") - 1) / 2).cast("long"))
        .as("n_wedges")))
      .join(triangles.agg(count(lit(1)).as("n_triangles")))
  }
}
