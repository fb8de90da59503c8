package graft.operators

import graft.SparkSpec

/** Fixed-iteration PageRank on hand-computed graphs. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: one iteration matches hand computation, dirty edges") {
    // 1->2, 1->3, 2->3; 3 dangling. Duplicates and a self-loop must be
    // absorbed by canonicalization.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 2L), (3L, 3L))
      .toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 1)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - 0.15) < 1e-12)            // no in-edges
    assert(math.abs(got(2L) - (0.15 + 0.85 * 0.5)) < 1e-12)
    assert(math.abs(got(3L) - (0.15 + 0.85 * 1.5)) < 1e-12)
  }

  test("pageRank: symmetric 2-cycle stays uniform at any depth") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 4)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - 1.0) < 1e-12)
    assert(math.abs(got(2L) - 1.0) < 1e-12)
  }

  test("pageRank: dangling node keeps the base rank, contributes nothing") {
    // 1->2 only: 2 is dangling. After 2 iters: r1 = 0.15 (nothing in),
    // r2 = 0.15 + 0.85 * r1(prev) = 0.15 + 0.85 * 0.15.
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 2)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - 0.15) < 1e-12)
    assert(math.abs(got(2L) - (0.15 + 0.85 * 0.15)) < 1e-12)
  }
}
