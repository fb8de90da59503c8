package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BFS frontier expansion — the crawler's recursion
  * (`/root/reference/crawler/crawler_core.py:237-271`, X4/J1-J3) as a
  * driver-side loop over DataFrames: each round expands the frontier
  * through the edge relation, anti-joins the visited state, and unions
  * the survivors in.
  *
  * Spark has no native recursion; the loop runs on the driver but every
  * round is a distributed plan. `localCheckpoint` truncates the growing
  * lineage each round (depth is bounded — the reference caps at 10).
  * State (`visited`) is a DataFrame, never a driver-side collection, so
  * the same loop runs at 100 TB frontier sizes.
  */
object Frontier {

  /** All nodes reachable from `seeds` within `maxDepth` hops, each with
    * its first-reach depth. `edges`: (src, dst); `seeds`: (node).
    */
  def bfs(edges: DataFrame, seeds: DataFrame, maxDepth: Int): DataFrame = {
    var visited = seeds.select(col("node")).distinct()
      .withColumn("depth", lit(0)).localCheckpoint(true)
    var frontier = visited
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      val next = frontier
        .join(edges, frontier("node") === edges("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("depth", lit(depth))
        .localCheckpoint(true)
      visited = visited.unionByName(next).localCheckpoint(true)
      frontier = next
    }
    visited
  }
}
