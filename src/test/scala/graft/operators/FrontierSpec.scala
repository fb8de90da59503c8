package graft.operators

import graft.SparkSpec

class FrontierSpec extends SparkSpec {
  import spark.implicits._

  test("bfs assigns first-reach depth and stops at maxDepth") {
    // 0 -> 1 -> 2 -> 3 -> 4, plus shortcut 0 -> 2.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 2L))
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val got = Frontier.bfs(edges, seeds, 2)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 1, 3L -> 2))
  }

  test("bfs on a cycle terminates and keeps min depth") {
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val got = Frontier.bfs(edges, Seq(0L).toDF("node"), 5)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(0L -> 0, 1L -> 1))
  }
}
