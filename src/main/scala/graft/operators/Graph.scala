package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge frames (the crawl link graph's shape):
  * exact triangle counting via the canonical ordered two-path join, and
  * fixed-iteration PageRank for crawl prioritization.
  */
object Graph {

  /** LABEL PROPAGATION community detection after `iters` synchronous
    * min-label rounds on the UNDIRECTED graph: every node starts
    * labeled with its own id, and each round takes the min of its own
    * label and its neighbors' — after k rounds, nodes within graph
    * distance k of a component's minimum share its label (fixed-round
    * label propagation; run to diameter it IS connected components,
    * and the dedup family's pointer-jumping `connectedComponents` is
    * the convergence-loop form). Exact integer labels, so the oracle
    * unrolls the rounds as join+min CTEs with no float ambiguity.
    * Self-loops and duplicate edges are dropped.
    *
    * Scale shape: like [[pageRank]] — the symmetrized edge relation is
    * hash-partitioned on `src` once and persisted; each round moves
    * only the (node, label) frame through one join + one min-aggregate.
    */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 12,
      s"labelPropagation expects 1..12 fixed rounds, got $iters")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    val sym = e.unionByName(e.select(col("dst").as("src"),
        col("src").as("dst")))
      .distinct()
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = sym.select(col("src").as("node")).distinct()
    var labels = nodes.select(col("node"), col("node").as("label"))
    try {
      for (_ <- 1 to iters) {
        val fromNeighbors = sym
          .join(labels.withColumnRenamed("node", "src"), Seq("src"))
          .select(col("dst").as("node"), col("label"))
        labels = labels.unionByName(fromNeighbors)
          .groupBy(col("node"))
          .agg(min(col("label")).as("label"))
      }
      // Materialize (one row per node) so the cached symmetrized edge
      // layout can drop here — same pattern as pageRank.
      graft.Checkpoints.pinned(
        labels.select(col("node"), col("label").as("community")))
    } finally sym.unpersist()
  }

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
    // Lineage grows by two joins per round and nothing checkpoints it —
    // fine for the 3-5 rounds this is for, pathological at 50. Fail
    // loudly instead of letting a caller discover plan blow-up live;
    // convergence-style runs belong on a checkpointed loop like
    // Dedup.connectedComponents'.
    require(iters >= 1 && iters <= 20,
      s"pageRank: iters=$iters out of range [1, 20] — this is a " +
        "fixed-iteration kernel with uncheckpointed lineage")
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
    try {
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
      // Materialize the final (node, rank) frame — one row per node,
      // tiny next to the edges — so the cached degree-joined edge frame
      // can be dropped HERE instead of lingering in the session until
      // the periodic-GC ContextCleaner happens to reclaim it.
      graft.Checkpoints.pinned(ranks)
    } finally withDeg.unpersist()
  }

  /** LINK PREDICTION by common out-neighbors: node pairs sharing
    * >= `minCommon` out-neighbors, with the neighbor-set Jaccard in
    * exact milli units — the "these two pages cite the same things"
    * similarity a crawl/graph layer feeds recommendation and
    * mirror-detection from.
    *
    * Scale shape: the pair join meets on the SHARED NEIGHBOR key, and
    * only neighbors with in-degree <= `inDegCap` participate — the
    * blocked-Jaccard df-cap applied to graphs (a hub every node links
    * to would otherwise pair everyone with everyone, while conveying
    * no similarity; common RARE neighbors carry the evidence). All
    * counts (common, degrees, the Jaccard) are computed over the SAME
    * capped edge set, so the output is self-consistent and a SQL
    * oracle re-derives it exactly.
    */
  def commonNeighborPairs(edges: DataFrame, inDegCap: Int,
      minCommon: Long): DataFrame = {
    require(inDegCap >= 1 && minCommon >= 1,
      s"need inDegCap >= 1 and minCommon >= 1, got $inDegCap, $minCommon")
    val raw = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val rare = raw.groupBy(col("dst")).agg(count(lit(1)).as("__ind"))
      .filter(col("__ind") <= inDegCap).select(col("dst"))
    val e = raw.join(rare, Seq("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("__d"))
    val pairs = e.select(col("dst"), col("src").as("a"))
      .join(e.select(col("dst"), col("src").as("b")), Seq("dst"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
    pairs
      .join(deg.select(col("src").as("a"), col("__d").as("__da")), Seq("a"))
      .join(deg.select(col("src").as("b"), col("__d").as("__db")), Seq("b"))
      .select(col("a"), col("b"), col("common"),
        expr("common * 1000 div (__da + __db - common)").as("jaccard_milli"))
  }

  /** Bounded-hop single/multi-source shortest paths: `rounds`
    * synchronous Bellman-Ford relaxations from the `seeds` node set
    * over weighted edges (src, dst, w) — after k rounds every node
    * holds its exact min-cost path of <= k hops from the nearest seed
    * (the "distance to a trusted hub" crawl signal; run to diameter it
    * is full SSSP). Weights and distances stay exact BIGINTs so a SQL
    * oracle unrolls the rounds as union+min CTEs with no float
    * ambiguity.
    *
    * Scale shape mirrors [[pageRank]]: the edge relation is
    * hash-partitioned on `src` once and persisted; each round moves
    * only the (node, dist) frontier frame through one join + one
    * min-aggregate, and the small fixed `rounds` keeps the
    * uncheckpointed lineage shallow (a convergence-style run belongs
    * on a checkpointed delta-frontier loop like Frontier's).
    */
  def ssspBounded(edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 12,
      s"ssspBounded expects 1..12 fixed rounds, got $rounds")
    val spark = edges.sparkSession
    val shufflePartitions =
      spark.conf.get("spark.sql.shuffle.partitions").toInt
    val e = edges
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
      .repartition(shufflePartitions, col("src"))
      .persist()
    var dist = seeds
      .select(col("node").cast("long").as("node")).distinct()
      .withColumn("dist", lit(0L))
    try {
      (1 to rounds).foreach { _ =>
        val relaxed = e
          .join(dist, e("src") === dist("node"))
          .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
        dist = dist.unionByName(relaxed)
          .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      }
      graft.Checkpoints.pinned(dist)
    } finally e.unpersist()
  }

  /** HITS hubs-and-authorities after `iters` synchronous rounds — the
    * other classic link-analysis signal a crawl ranking layer feeds on
    * (PageRank scores endorsement, HITS separates directories/link
    * hubs from endorsed content). UN-NORMALIZED integer convention:
    * hubs start at 1, each round sets `auth(i) = sum of hub over
    * in-neighbors` then `hub(i) = sum of auth over out-neighbors` —
    * every score stays an exact BIGINT (HITS is consumed for its
    * ordering; the usual per-round normalization only rescales it and
    * would put a float global-sum race between the engine and the SQL
    * oracle). Self-loops and duplicate edges drop.
    *
    * Scale shape mirrors [[pageRank]]: the edge relation persists
    * once, each round moves only the (node, score) frames through two
    * join+agg shuffles, driver state is O(1), and small fixed `iters`
    * keeps the uncheckpointed lineage shallow. With the e^4-style
    * growth of un-normalized scores, `iters` is capped where BIGINT
    * overflow could start on hub-heavy graphs.
    */
  def hits(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 8,
      s"hits: iters=$iters out of range [1, 8] — un-normalized integer " +
        "scores grow with degree^(2*iters)")
    val e = edges
      .select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
    val spark = edges.sparkSession
    val shufflePartitions = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val es = e.repartition(shufflePartitions, col("src")).persist()
    try {
      var hub = nodes.withColumn("hub", lit(1L))
      var auth = nodes.withColumn("auth", lit(0L))
      (1 to iters).foreach { _ =>
        val a = es.join(hub, es("src") === hub("node"))
          .groupBy(col("dst")).agg(sum(col("hub")).as("s"))
          .select(col("dst").as("node"), col("s"))
        auth = nodes.join(a, Seq("node"), "left")
          .select(col("node"), coalesce(col("s"), lit(0L)).as("auth"))
        val h = es.join(auth, es("dst") === auth("node"))
          .groupBy(es("src")).agg(sum(col("auth")).as("s"))
          .select(col("src").as("node"), col("s"))
        hub = nodes.join(h, Seq("node"), "left")
          .select(col("node"), coalesce(col("s"), lit(0L)).as("hub"))
      }
      graft.Checkpoints.pinned(hub.join(auth, Seq("node")))
    } finally es.unpersist()
  }

  /** Per-node triangle participation counts, exact.
    *
    * Edges are canonicalized to undirected `a < b` form (self-loops
    * and duplicates dropped), so each triangle `a < b < c` is built
    * exactly once: two-paths a-b-c from joining the edge list with
    * itself on the shared middle vertex, closed by the (a, c) edge.
    * The a<b<c ordering is what bounds the join — every triangle has
    * exactly one vertex ordering, so no post-hoc dedup of 3! copies.
    * Pure equi-joins, the cheapest plan on near-regular graphs; for
    * hub-heavy (power-law) graphs where one vertex's in x out product
    * explodes, use [[triangleCountsDegreeOriented]].
    * Output: (node, n_triangles), nodes in no triangle absent.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = canonical(edges)
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"),
        col("e2.b").as("z"))
    participationCounts(tri)
  }

  private def canonical(edges: DataFrame): DataFrame =
    edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()

  private def participationCounts(tri: DataFrame): DataFrame =
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))

  /** [[triangleCounts]] with DEGREE ORIENTATION — the skew-safe form
    * for power-law graphs (the real web link graph's shape).
    *
    * Canonical edges are ORIENTED low-degree -> high-degree (ties by
    * id): the orientation is a total order, so every triangle has
    * exactly one "apex" with two out-edges and is built exactly once —
    * two out-edges of the apex closed by the oriented third edge.
    * Under this orientation every out-degree is bounded by ~sqrt(2m),
    * so the two-path join is O(m^1.5) even when one hub vertex would
    * make the id-ordered join's in x out product quadratic. The RESULT
    * is orientation-invariant (identical per-node counts — the spec
    * pins equality), so callers pick purely by graph shape: id-ordered
    * for near-regular graphs (two joins cheaper), degree-oriented when
    * a heavy hub exists.
    */
  def triangleCountsDegreeOriented(edges: DataFrame): DataFrame = {
    val e = canonical(edges)
    val deg = e.select(col("a").as("n"))
      .unionByName(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // Orient each edge from the (degree, id)-smaller endpoint; carry
    // the head's (degree, id) so the out-neighbor pair below can be
    // ordered without re-joining degrees.
    val o = e
      .join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("src"), col("b").as("dst"),
            col("db").as("dd")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst"),
            col("da").as("dd"))).as("s"))
      .select(col("s.src"), col("s.dst"), col("s.dd"))
    // Apex out-neighbor pairs in orientation order, closed by the
    // (necessarily same-oriented) third edge.
    val tri = o.as("o1")
      .join(o.as("o2"),
        col("o1.src") === col("o2.src") &&
          (col("o1.dd") < col("o2.dd") ||
            (col("o1.dd") === col("o2.dd") && col("o1.dst") < col("o2.dst"))))
      .join(o.as("o3"),
        col("o3.src") === col("o1.dst") && col("o3.dst") === col("o2.dst"),
        "left_semi")
      .select(col("o1.src").as("x"), col("o1.dst").as("y"),
        col("o2.dst").as("z"))
    participationCounts(tri)
  }
}
