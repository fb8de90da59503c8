package graft.operators

import graft.functions.{HashFunctions, VectorFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  * Two paths:
  *   - `bruteForceTopK`: exact cosine top-k. The query set is broadcast;
  *     the corpus streams through one codegen'd projection — no shuffle
  *     of the corpus at all. Ranking is two-stage: a partition-local
  *     top-k (window over (qid, partition)) bounds what reaches the
  *     global per-query window, so small query sets never funnel the
  *     whole scored stream into a handful of reducers.
  *   - `hyperplaneBuckets` / `lshTopK`: random-hyperplane LSH. Each
  *     vector gets a small integer bucket from the signs of `planes`
  *     deterministic hyperplane projections, computed IN-ROW against
  *     broadcast weight literals (`zip_with` dot products — no explode,
  *     no join, no shuffle). Only same-bucket pairs are compared; at
  *     100 TB the bucket id becomes the shuffle/partition key, turning
  *     an O(N*Q) scan into a per-bucket join.
  *
  * Hyperplane weights are +/-1 derived from `stableHash64("hp:p:i")` —
  * fully deterministic, no RNG state, reproducible in SQL oracles.
  */
object Similarity {

  /** Rounded cosine scores of every (query, candidate) pair.
    * `queries`/`corpus`: (id, vec: array<float>).
    */
  private def scored(queries: DataFrame, corpus: DataFrame, decimals: Int): DataFrame = {
    val q = queries.select(col("id").as("qid"),
      VectorFunctions.toDoubleArray(col("vec")).as("qv"))
    val c = corpus.select(col("id").as("cid"),
      VectorFunctions.toDoubleArray(col("vec")).as("cv"))
    c.join(broadcast(q), col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        round(VectorFunctions.cosine(col("qv"), col("cv")), decimals).as("score"))
  }

  /** Per-query top-k of a (qid, cid, score) stream: prune to the top k
    * within each (qid, input partition) first — a shuffle over
    * |qids| x |partitions| keys — then rank the surviving
    * |qids| x |partitions| x k rows globally. The local top-k is a
    * superset of the global one under the same (score desc, cid)
    * order, so results are identical to a single global window.
    */
  private def topKPerQuery(scores: DataFrame, k: Int): DataFrame = {
    val local = Window.partitionBy(col("qid"), col("pid"))
      .orderBy(col("score").desc, col("cid"))
    val global = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("cid"))
    scores
      .withColumn("pid", spark_partition_id())
      .withColumn("lrnk", row_number().over(local))
      .filter(col("lrnk") <= k)
      .drop("pid", "lrnk")
      .withColumn("rnk", row_number().over(global))
      .filter(col("rnk") <= k)
  }

  /** Exact top-k neighbors per query by cosine (desc), id tie-break. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      decimals: Int = 6): DataFrame =
    topKPerQuery(scored(queries, corpus, decimals), k)

  /** Deterministic +/-1 weights of hyperplane `plane` over `dims`
    * dimensions (1-based, matching SQL `generate_subscripts`).
    */
  def hyperplaneWeightArray(plane: Int, dims: Int): Seq[Double] =
    (1 to dims).map(i =>
      if (HashFunctions.stableHash64Local(s"hp:$plane:$i") % 2 == 1) 1.0 else -1.0)

  /** Sign-of-projection LSH bucket per vector: bucket = sum over planes
    * of (proj_p > 0) << p, with proj_p a `zip_with` dot product against
    * the plane's literal weight array — one codegen'd projection, no
    * shuffle. `vecs`: (id, vec: array<float>); `dims` must match the
    * embedding width (a driver-side scan to infer it would be an eager
    * job at plan-construction time).
    */
  def hyperplaneBuckets(vecs: DataFrame, planes: Int, dims: Int): DataFrame = {
    val v = VectorFunctions.toDoubleArray(col("vec"))
    val bucket = (0 until planes).map { p =>
      val w = array(hyperplaneWeightArray(p, dims).map(lit): _*)
      when(VectorFunctions.dot(v, w) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    vecs.select(col("id"), bucket.as("bucket"))
  }

  /** Approximate top-k: brute-force cosine restricted to same-bucket
    * candidates (the scale path — bucket is the join/partition key).
    */
  def lshTopK(vecs: DataFrame, queryIds: DataFrame, planes: Int, dims: Int,
      k: Int, decimals: Int = 6): DataFrame = {
    val all = vecs.join(hyperplaneBuckets(vecs, planes, dims), Seq("id"))
    val q = all.join(broadcast(queryIds), Seq("id"))
      .select(col("id").as("qid"),
        VectorFunctions.toDoubleArray(col("vec")).as("qv"), col("bucket"))
    val c = all.select(col("id").as("cid"),
      VectorFunctions.toDoubleArray(col("vec")).as("cv"), col("bucket"))
    val scores = c.join(broadcast(q), Seq("bucket"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        round(VectorFunctions.cosine(col("qv"), col("cv")), decimals).as("score"))
    topKPerQuery(scores, k)
  }
}
