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
  * round is a distributed plan. Each round RELIABLY checkpoints the new
  * state (truncating the growing lineage): `localCheckpoint` would pin
  * blocks to executors and lose them on executor death, which at
  * cluster scale makes a deep crawl unrecoverable. The checkpoint dir
  * defaults to a session-scoped temp dir when unset (on a cluster,
  * point `spark.checkpoint.dir` at durable storage).
  */
object Frontier {

  private def ensureCheckpointDir(df: DataFrame): Unit =
    graft.Checkpoints.ensure(df.sparkSession)

  /** All nodes reachable from `seeds` within `maxDepth` hops, each with
    * its first-reach depth. `edges`: (src, dst); `seeds`: (node).
    */
  def bfs(edges: DataFrame, seeds: DataFrame, maxDepth: Int): DataFrame = {
    ensureCheckpointDir(seeds)
    // Only each round's DELTA (the new frontier) is materialized; the
    // visited set stays a lazy union over those already-materialized
    // files (one branch per round, bounded by maxDepth), so a k-round
    // BFS writes every node exactly once — not the growing union every
    // round. The loop-exit count rides the checkpoint write as an
    // observed metric (no per-round count job).
    val acc = new graft.Checkpoints.Accumulating(seeds.sparkSession)
    var (frontier, n) = acc.checkpointCounted(
      seeds.select(col("node")).distinct().withColumn("depth", lit(0)))
    var visited = frontier
    var depth = 0
    while (depth < maxDepth && n > 0) {
      depth += 1
      val (next, m) = acc.checkpointCounted(frontier
        .join(edges, frontier("node") === edges("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("depth", lit(depth)))
      visited = visited.unionByName(next)
      frontier = next
      n = m
    }
    visited
  }
}
