package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge frames (the crawl link graph's shape):
  * exact triangle counting via the canonical ordered two-path join.
  */
object Graph {

  /** Per-node triangle participation counts, exact.
    *
    * Edges are canonicalized to undirected `a < b` form (self-loops
    * and duplicates dropped), so each triangle `a < b < c` is built
    * exactly once: two-paths a-b-c from joining the edge list with
    * itself on the shared middle vertex, closed by the (a, c) edge.
    * The a<b<c ordering is what bounds the join — every triangle has
    * exactly one vertex ordering, so no post-hoc dedup of 3! copies
    * and no degree-ordering preprocessing is needed for correctness
    * (at extreme skew, orienting edges by degree instead of id is the
    * classic refinement; id-ordering keeps the oracle expressible).
    * Output: (node, n_triangles), nodes in no triangle absent.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"),
        col("e2.b").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
