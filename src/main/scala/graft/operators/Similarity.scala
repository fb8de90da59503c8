package graft.operators

import graft.functions.{HashFunctions, VectorFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  * Two paths:
  *   - `bruteForceTopK`: exact cosine top-k. The query set is broadcast;
  *     the corpus streams through one codegen'd projection — no shuffle
  *     of the corpus at all. Per-query ranking is a window over the
  *     (|queries| x k)-bounded candidate stream. This is the correctness
  *     baseline and is also the right plan when |queries| is small.
  *   - `hyperplaneBuckets` / `lshTopK`: random-hyperplane LSH. Each
  *     vector gets a small integer bucket from the signs of `planes`
  *     deterministic hyperplane projections; only same-bucket pairs are
  *     compared. At 100 TB the bucket id becomes the shuffle/partition
  *     key, turning an O(N*Q) scan into a per-bucket join.
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

  /** Exact top-k neighbors per query by cosine (desc), id tie-break. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      decimals: Int = 6): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("cid"))
    scored(queries, corpus, decimals)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Deterministic +/-1 hyperplane weight table: (plane, dim, w). */
  def hyperplaneWeights(spark: org.apache.spark.sql.SparkSession,
      planes: Int, dims: Int): DataFrame = {
    spark.range(planes).select(col("id").as("plane"))
      .crossJoin(spark.range(1, dims + 1).select(col("id").as("dim")))
      .withColumn("w",
        when(HashFunctions.stableHash64(
          concat(lit("hp:"), col("plane"), lit(":"), col("dim"))) % 2 === 1,
          lit(1.0)).otherwise(lit(-1.0)))
  }

  /** Sign-of-projection LSH bucket per vector: bucket = sum over planes
    * of (proj_p > 0) << p. `vecs`: (id, vec: array<float>); dims are
    * 1-based to match SQL `generate_subscripts`.
    */
  def hyperplaneBuckets(vecs: DataFrame, planes: Int): DataFrame = {
    val spark = vecs.sparkSession
    val dims = vecs.select(size(col("vec"))).head().getInt(0)
    val weights = hyperplaneWeights(spark, planes, dims)
    val comps = vecs.select(col("id"),
      posexplode(VectorFunctions.toDoubleArray(col("vec"))).as(Seq("pos", "x")))
      .withColumn("dim", col("pos") + 1)
    comps.join(broadcast(weights), Seq("dim"))
      .groupBy(col("id"), col("plane"))
      .agg(sum(col("x") * col("w")).as("proj"))
      .groupBy(col("id"))
      .agg(sum(expr("CASE WHEN proj > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(plane AS INT)) ELSE CAST(0 AS BIGINT) END"))
        .as("bucket"))
  }

  /** Approximate top-k: brute-force cosine restricted to same-bucket
    * candidates (the scale path — bucket is the join/partition key).
    */
  def lshTopK(vecs: DataFrame, queryIds: DataFrame, planes: Int, k: Int,
      decimals: Int = 6): DataFrame = {
    val buckets = hyperplaneBuckets(vecs, planes)
    val all = vecs.join(buckets, Seq("id"))
    val q = all.join(broadcast(queryIds), Seq("id"))
      .select(col("id").as("qid"),
        VectorFunctions.toDoubleArray(col("vec")).as("qv"), col("bucket"))
    val c = all.select(col("id").as("cid"),
      VectorFunctions.toDoubleArray(col("vec")).as("cv"), col("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("cid"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        round(VectorFunctions.cosine(col("qv"), col("cv")), decimals).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }
}
