package graft.operators

import graft.SparkSpec

/** Exact triangle counting on hand-built graphs. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank rejects iteration counts past the lineage budget") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      Graph.pageRank(edges, iters = 21)
    }
    assert(e.getMessage.contains("fixed-iteration"))
    // The guard must not reject the intended 3-5 round usage.
    assert(Graph.pageRank(edges, iters = 3).count() == 3)
  }

  test("triangleCounts: square with one diagonal, dirty edge list") {
    // 1-2-3-4-1 plus diagonal 1-3 -> triangles (1,2,3) and (1,3,4).
    // Edge list carries duplicates, reversed copies and a self-loop —
    // canonicalization must absorb all three.
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      (2L, 1L), (3L, 1L), (2L, 2L), (1L, 2L))
      .toDF("src", "dst")
    val got = Graph.triangleCounts(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
    // No triangles -> empty output, not zero rows per node.
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    assert(Graph.triangleCounts(path).count() == 0)
  }

  test("degree-oriented form matches id-ordered on a hub graph") {
    // Star hub 0 connected to 1..20, plus rim edges i-(i+1) for odd i —
    // triangles (0, i, i+1). The hub is exactly the shape that blows up
    // the id-ordered two-path join; counts must match regardless.
    val rim = (1 to 19 by 2).map(i => (i.toLong, (i + 1).toLong))
    val star = (1 to 20).map(i => (0L, i.toLong))
    val edges = (star ++ rim).toDF("src", "dst")
    val a = Graph.triangleCounts(edges)
      .as[(Long, Long)].collect().toMap
    val b = Graph.triangleCountsDegreeOriented(edges)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a(0L) == 10L)               // hub is in every rim triangle
    assert((1 to 20).forall(i => a(i.toLong) == 1L))
  }

  test("hits separates hubs from authorities with exact integer scores") {
    // 1 -> 3, 2 -> 3, 3 -> 4. Hand-unrolled two rounds:
    //   auth1 = indegree = (3: 2, 4: 1); hub1 = (1: 2, 2: 2, 3: 1);
    //   auth2 = (3: hub1(1)+hub1(2) = 4, 4: hub1(3) = 1);
    //   hub2  = (1: 4, 2: 4, 3: 1, 4: 0).
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L), (3L, 4L), (4L, 4L))
      .toDF("src", "dst")  // dup edge + self-loop must drop
    val got = Graph.hits(edges, iters = 2)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      1L -> ((4L, 0L)), 2L -> ((4L, 0L)),
      3L -> ((1L, 4L)), 4L -> ((0L, 1L))))
  }

  test("labelPropagation: after k rounds a node holds the min id " +
      "within distance k; components stay separate") {
    // Chain 1-2-3-4-5 plus isolated pair 10-11. After 3 rounds,
    // label(v) = min id within graph distance 3.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L),
      (2L, 2L), (3L, 2L))  // self-loop + reverse dup must not matter
      .toDF("src", "dst")
    val got = Graph.labelPropagation(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 2L, 10L -> 10L, 11L -> 10L), s"got $got")
    // One more round reaches the whole chain = connected components.
    val conv = Graph.labelPropagation(edges, iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(conv(5L) == 1L)
  }

  test("ssspBounded: min-cost path within hop bound, parallel-edge min, " +
      "unreached nodes absent") {
    // 1 -(5)-> 2 -(1)-> 3 -(1)-> 4 -(1)-> 5; direct 1 -(4)-> 3 and a
    // heavier parallel duplicate 1 -(9)-> 3 (min wins); seed = 1.
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 1L), (3L, 4L, 1L),
      (4L, 5L, 1L), (1L, 3L, 4L), (1L, 3L, 9L), (2L, 2L, 7L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("node")
    val got = Graph.ssspBounded(edges, seeds, rounds = 3)
      .as[(Long, Long)].collect().toMap
    // 3 hops from node 1: d(2)=5, d(3)=min(4, 6)=4, d(4)=5, d(5) needs
    // 4 hops via the cheap path -> only the 1-3-4-5 route (4+1+1=6)
    // fits in 3 hops.
    assert(got == Map(1L -> 0L, 2L -> 5L, 3L -> 4L, 4L -> 5L, 5L -> 6L),
      s"got $got")
    // With 2 rounds node 5 is unreachable and must be ABSENT, not inf.
    val got2 = Graph.ssspBounded(edges, seeds, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(!got2.contains(5L) && got2(4L) == 5L, s"got $got2")
  }

  test("commonNeighborPairs: hub cap excludes, capped-set Jaccard, " +
      "minCommon floor") {
    // 1 and 2 share rare neighbors 10, 11; 3 shares only 10 with them.
    // EVERYONE links hub 99 (in-degree 4 > cap 3) -> hub evidence
    // ignored everywhere (pairs, degrees, Jaccard).
    val edges = Seq(
      (1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 10L), (3L, 12L),
      (1L, 99L), (2L, 99L), (3L, 99L), (4L, 99L))
      .toDF("src", "dst")
    val got = Graph.commonNeighborPairs(edges, inDegCap = 3,
        minCommon = 2L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // Capped degrees: d(1)=2, d(2)=2, d(3)=2. Only (1,2) reaches
    // common >= 2: jaccard = 2*1000 div (2+2-2) = 1000.
    assert(got == Map((1L, 2L) -> ((2L, 1000L))), s"got $got")
  }
}
