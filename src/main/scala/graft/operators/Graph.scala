package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge frames (the crawl link graph's shape):
  * exact triangle counting via the canonical ordered two-path join, and
  * fixed-iteration PageRank for crawl prioritization.
  */
object Graph {

  /** PageRank after `iters` synchronous iterations, every node starting
    * at rank 1.0 and updating to `(1-damping) + damping * sum(in-edge
    * contributions)` — the un-normalized convention (ranks sum to ~N,
    * not 1), chosen because it is exactly expressible as chained SQL
    * CTEs for the oracle. Dangling nodes keep receiving the base
    * `(1-damping)` and contribute nothing, self-loops and duplicate
    * edges are dropped.
    *
    * Scale shape: the edge relation is joined on `src` every round, so
    * it is hash-repartitioned by `src` ONCE and persisted — each
    * iteration then reuses that layout and only the (node, rank) frame
    * (one row per node, far smaller than the edges) moves through the
    * two per-round shuffles (join on src, re-agg on dst). Driver state
    * is O(1); with small fixed `iters` the lineage stays shallow, so no
    * checkpoint is needed (crawl-prioritization reruns use 3-5 rounds,
    * not convergence loops).
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    val e = edges
      .select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
    val spark = edges.sparkSession
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val withDeg = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("outd")), "src")
      .repartition(shufflePartitions, col("src"))
      .persist()
    var ranks = nodes.withColumn("rank", lit(1.0))
    (1 to iters).foreach { _ =>
      val contribs = withDeg
        .join(ranks, withDeg("src") === ranks("node"))
        .select(col("dst").as("node"), (col("rank") / col("outd")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(1 - damping) + lit(damping) * coalesce(col("s"), lit(0.0)))
            .as("rank"))
    }
    ranks
  }

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
